"""Acceleration-stack tests (VERDICT r1 item 3): the XLA cluster walk and
the Pallas work-list kernel (interpret mode on CPU) must agree with the
dense scan, and a full render with accel/pallas forced must match the
default dense render.

These run on the CPU backend (conftest forces it); the Pallas kernel runs
via ``interpret=True``, which exercises the identical kernel program and
work-list prologue the TPU runs (tools/validate_accel.py is the on-hardware
twin of this file).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rustray_tpu.config import EngineConfig
from rustray_tpu.models.procedural import bench_scene
from rustray_tpu.ops import rays as rays_ops
from rustray_tpu.ops.cluster_trace import (select_closest_clusters,
                                           world_cluster_aabbs)
from rustray_tpu.ops.intersect import INF, closest_tri, prepare_triangles
from rustray_tpu.ops.pallas_trace import (_work_list, pack_cluster_tris,
                                          trace_tris_pallas)


@pytest.fixture(scope="module")
def accel_scene():
    scene = bench_scene(grid=2, lat=10, lon=14, width=96, height=64,
                        monte_carlo=False, samples=1)
    sa, static = scene.compile()
    prep = prepare_triangles(sa)
    prep = prep.replace(pallas_pack=pack_cluster_tris(
        prep, sa.tri_valid, static.n_clusters, static.cluster_size,
        int(sa.cl_lo.shape[0])))
    w_lo, w_hi = world_cluster_aabbs(sa)
    tri_ok = jnp.asarray(sa.tri_valid & sa.inst_visible[sa.tri_inst])
    cl_ok = jnp.asarray(sa.cl_valid & sa.inst_visible[sa.cl_inst])
    return scene, sa, static, prep, w_lo, w_hi, tri_ok, cl_ok


def _batches(sa, n, seed=3):
    rng = np.random.default_rng(seed)
    px = jnp.asarray(rng.integers(0, 96, n), jnp.int32)
    py = jnp.asarray(rng.integers(0, 64, n), jnp.int32)
    o_cam, d_cam = rays_ops.primary_rays(sa.camera, 96, 64, px, py,
                                         jnp.int32(0), jnp.int32(0), 1,
                                         1.0, 1.0, 1)
    o_rnd = jnp.asarray(rng.uniform(-6, 6, (n, 3)), jnp.float32)
    d_rnd = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    d_rnd = d_rnd / jnp.linalg.norm(d_rnd, axis=1, keepdims=True)
    alive = jnp.asarray(rng.uniform(size=n) < 0.7)
    return [("camera", o_cam, d_cam, jnp.ones((n,), bool)),
            ("random", o_rnd, d_rnd, alive)]


def _tri_t(prep, o, d, idx):
    n = np.asarray(prep.n)[idx]
    an = np.asarray(prep.an)[idx]
    dn = (np.asarray(d) * n).sum(1)
    dn = np.where(np.abs(dn) > 1e-30, dn, 1.0)
    return (an - (np.asarray(o) * n).sum(1)) / dn


def test_cluster_walk_matches_dense(accel_scene):
    _, sa, static, prep, w_lo, w_hi, tri_ok, cl_ok = accel_scene
    for name, o, d, alive in _batches(sa, 1024):
        t_d, i_d = closest_tri(o, d, prep, tri_ok, 1024)
        f_x, i_x = select_closest_clusters(
            o, d, prep, tri_ok, w_lo, w_hi, cl_ok, static.cluster_size,
            block=256, gather=8)
        found_d = np.asarray(t_d) < float(INF)
        f_x = np.asarray(f_x)
        assert (f_x == found_d).mean() >= 0.999, name
        both = f_x & found_d
        np.testing.assert_allclose(_tri_t(prep, o, d, np.asarray(i_x))[both],
                                   _tri_t(prep, o, d, np.asarray(i_d))[both],
                                   rtol=1e-4, atol=1e-5)


def test_pallas_kernel_matches_dense_interpret(accel_scene):
    _, sa, static, prep, w_lo, w_hi, tri_ok, cl_ok = accel_scene
    for name, o, d, alive in _batches(sa, 1024):
        t_d, i_d = closest_tri(o, d, prep, tri_ok, 1024)
        f_p, i_p, trunc = trace_tris_pallas(
            o, d, alive, prep, w_lo, w_hi, cl_ok, static.cluster_size,
            block_n=256, percap=64, avg_visits=48, interpret=True)
        assert not bool(trunc), name
        found_d = (np.asarray(t_d) < float(INF)) & np.asarray(alive)
        f_p = np.asarray(f_p) & np.asarray(alive)
        assert (f_p == found_d).mean() >= 0.999, name
        both = f_p & found_d
        np.testing.assert_allclose(_tri_t(prep, o, d, np.asarray(i_p))[both],
                                   _tri_t(prep, o, d, np.asarray(i_d))[both],
                                   rtol=1e-4, atol=1e-5)


def test_work_list_budget_and_truncation(accel_scene):
    _, sa, static, prep, w_lo, w_hi, tri_ok, cl_ok = accel_scene
    name, o, d, alive = _batches(sa, 1024)[0]
    # tiny budget must flag truncation, never crash or mis-size the grid
    f_p, i_p, trunc = trace_tris_pallas(
        o, d, alive, prep, w_lo, w_hi, cl_ok, static.cluster_size,
        block_n=256, percap=4, avg_visits=2, interpret=True)
    assert bool(trunc)
    # zero-visit blocks (all-dead rays) still produce initialized outputs
    dead = jnp.zeros((256,), bool)
    f0, i0, tr0 = trace_tris_pallas(
        o[:256], d[:256], dead, prep, w_lo, w_hi, cl_ok,
        static.cluster_size, block_n=256, percap=64, avg_visits=8,
        interpret=True)
    assert not np.asarray(f0).any()
    assert not bool(tr0)


def test_work_list_pads_pool_to_grid():
    # regression: W > NB*percap used to leave the prefetch tables short of
    # the grid, corrupting arbitrary output blocks
    order = jnp.tile(jnp.arange(8, dtype=jnp.int32)[None], (2, 1))
    count = jnp.asarray([3, 8], jnp.int32)
    bw, cw, first, dov, trunc = _work_list(order, count, 2, 8, 64)
    assert bw.shape == (64,) and cw.shape == (64,)
    bw = np.asarray(bw)
    assert (bw[:11] != 2).all() and (bw[11:] == 2).all()
    assert np.asarray(first)[[0, 3]].tolist() == [1, 1]
    assert not bool(trunc)


def test_render_with_accel_matches_dense(accel_scene):
    scene, sa, static, prep, w_lo, w_hi, tri_ok, cl_ok = accel_scene
    from rustray_tpu.render.wavefront import render
    cfg = scene.raytracing_config
    base = render(sa, static, cfg, EngineConfig(accel="off", pallas="off",
                                                chunk_pixels=4096))
    acc = render(sa, static, cfg, EngineConfig(accel="on", pallas="off",
                                               accel_block=256, accel_gather=8,
                                               chunk_pixels=4096))
    pal = render(sa, static, cfg, EngineConfig(accel="on", pallas="on",
                                               pallas_interpret=True,
                                               pallas_block=256,
                                               pallas_percap=64, pallas_avg=48,
                                               chunk_pixels=4096))
    for out in (acc, pal):
        frac = np.isclose(out["color"], base["color"],
                          rtol=2e-3, atol=2e-3).mean()
        assert frac >= 0.995, frac
        assert (out["object_id"] == base["object_id"]).mean() >= 0.995
