"""Cross-validate the acceleration stack: dense scan vs XLA cluster walk vs
the Pallas per-block kernel, on coherent (camera) and incoherent (random)
rays.

Usage:  python tools/validate_accel.py [grid] [n_rays]
On CPU the Pallas kernel runs in interpret mode automatically.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(grid=3, n=4096, block_n=512, seed=0):
    from rustray_tpu.models.procedural import bench_scene
    from rustray_tpu.ops.intersect import closest_tri, prepare_triangles, INF
    from rustray_tpu.ops.cluster_trace import (select_closest_clusters,
                                               world_cluster_aabbs)
    from rustray_tpu.ops.block_trace import pack_cluster_tris, trace_tris_blocks
    from rustray_tpu.ops import rays as rays_ops

    scene = bench_scene(grid=grid, width=160, height=90)
    sa, static = scene.compile()
    prep = prepare_triangles(sa)
    prep = prep.replace(pallas_pack=pack_cluster_tris(
        prep, sa.tri_valid, static.n_clusters, static.cluster_size,
        int(sa.cl_lo.shape[0])))
    w_lo, w_hi = world_cluster_aabbs(sa)
    tri_ok = jnp.asarray(sa.tri_valid & sa.inst_visible[sa.tri_inst])
    cl_ok = jnp.asarray(sa.cl_valid & sa.inst_visible[sa.cl_inst])
    interp = jax.default_backend() not in ("tpu", "axon")
    print(f"tris={static.n_tris} clusters={static.n_clusters} "
          f"backend={jax.default_backend()} interpret={interp}")

    rng = np.random.default_rng(seed)

    def batch(kind):
        if kind == "camera":
            px = jnp.asarray(rng.integers(0, 160, n), jnp.int32)
            py = jnp.asarray(rng.integers(0, 90, n), jnp.int32)
            o, d = rays_ops.primary_rays(sa.camera, 160, 90, px, py,
                                         jnp.int32(0), jnp.int32(0), 1,
                                         1.0, 1.0, 1)
            alive = jnp.ones((n,), bool)
        elif kind == "random":
            o = jnp.asarray(rng.uniform(-8, 8, (n, 3)), jnp.float32)
            d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
            d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
            alive = jnp.ones((n,), bool)
        else:  # half-dead shadow-like batch
            o = jnp.asarray(rng.uniform(-8, 8, (n, 3)), jnp.float32)
            d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
            d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
            alive = jnp.asarray(rng.uniform(size=n) < 0.5)
        return o, d, alive

    @jax.jit
    def run_dense(o, d):
        return closest_tri(o, d, prep, tri_ok, 2048)

    @jax.jit
    def run_xla(o, d):
        return select_closest_clusters(
            o, d, prep, tri_ok, w_lo, w_hi, cl_ok, static.cluster_size,
            block=block_n, gather=32)

    @jax.jit
    def run_pallas(o, d, alive):
        return trace_tris_blocks(
            o, d, alive, None, prep, w_lo, w_hi, cl_ok, static.cluster_size,
            block_n=block_n, interpret=interp)

    ok_all = True
    for kind in ("camera", "random", "halfdead"):
        o, d, alive = batch(kind)
        t_d, i_d = jax.device_get(run_dense(o, d))
        print(f"  {kind}: dense done", flush=True)
        f_x, i_x, _ = jax.device_get(run_xla(o, d))
        print(f"  {kind}: xla done", flush=True)
        f_p, i_p, _ = jax.device_get(run_pallas(o, d, alive))
        print(f"  {kind}: pallas done", flush=True)
        found_d = t_d < np.float32(INF)
        live = np.asarray(alive)

        def cmp(name, f, i):
            same_found = (f == found_d) | ~live
            # winners may differ on exact-t ties; compare recomputed t
            n_ = np.asarray(prep.n)
            an_ = np.asarray(prep.an)
            o_, d_ = np.asarray(o), np.asarray(d)
            def t_of(idx):
                idx = np.clip(idx, 0, n_.shape[0] - 1)
                dn = (d_ * n_[idx]).sum(1)
                dn = np.where(np.abs(dn) > 1e-30, dn, 1.0)
                return (an_[idx] - (o_ * n_[idx]).sum(1)) / dn
            both = f & found_d & live
            t_ref = t_of(i_d)
            t_got = t_of(i)
            dif = np.abs(t_got[both] - t_ref[both])
            rel = dif / np.maximum(np.abs(t_ref[both]), 1e-6)
            close = bool((rel < 1e-4).all()) if both.any() else True
            nbad = int((rel >= 1e-4).sum()) if both.any() else 0
            # found-ness may differ on f32 slab-test boundary grazes (the
            # dense path has no AABB culling at all; the reference's culled
            # walk has the same artifact) — allow ≤0.1% of rays
            good = bool(same_found.mean() >= 0.999 and close)
            print(f"  {kind:9s} {name:6s}: found-match={same_found.mean():.4f} "
                  f"t-close={close} bad={nbad} "
                  f"maxrel={float(rel.max()) if both.any() else 0:.2e}")
            return good

        ok_all &= cmp("xla", f_x, i_x)
        ok_all &= cmp("pallas", f_p, i_p)
    print("ALL OK" if ok_all else "MISMATCH")
    return 0 if ok_all else 1


if __name__ == "__main__":
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    sys.exit(main(grid, n))
