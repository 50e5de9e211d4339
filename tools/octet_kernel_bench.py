"""Isolate per-octet kernel cost components on the TPU.

Variants of ops/octet_trace's kernel over the captured L3 wavefront:
- V1 slab-only: per-octet (8, C) slab test, no walk       -> prologue+grid
- V2 fixed16-seq: 16 iterations, cluster = loop index,
  no argmin, no SMEM                                      -> +slab read+intersect
- V3 fixed16-argmin: + vector argmin/mask, c still = jg    -> +argmin cost
- V4 fixed16-smem: + SMEM round trip for c                 -> +scalar transfer
- V0 production kernel                                     -> everything + while

Usage: python tools/octet_kernel_bench.py
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.0e38
_BIG = 3.0e37


def make_kernel(cpad, K, variant):
    def kernel(nlive_ref, rays_ref, aabb_ref, tris_ref, t_ref, idx_ref,
               e_ref, bt_ref, bi_ref, c_sm, go_sm):
        r = pl.program_id(0)

        @pl.when(r == 0)
        def _():
            t_ref[...] = jnp.full(t_ref.shape, _INF, jnp.float32)
            idx_ref[...] = jnp.zeros(idx_ref.shape, jnp.int32)

        @pl.when(r < nlive_ref[0])
        def _():
            r8 = rays_ref[pl.ds(r * 8, 8), :]
            o3, d3, tmax = r8[:, 0:3], r8[:, 3:6], r8[:, 6:7]
            eps = jnp.float32(1e-30)
            sd = jnp.where(jnp.abs(d3) > eps, d3,
                           jnp.where(d3 >= 0, eps, -eps))
            inv = 1.0 / sd
            oinv = o3 * inv
            tn = jnp.full((8, cpad), jnp.float32(-_BIG))
            tf = jnp.full((8, cpad), jnp.float32(_BIG))
            for a in range(3):
                la = aabb_ref[a:a + 1, :]
                ha = aabb_ref[3 + a:4 + a, :]
                ia, oa = inv[:, a:a + 1], oinv[:, a:a + 1]
                t0 = la * ia - oa
                t1 = ha * ia - oa
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
            entry = jnp.maximum(tn, 0.0)
            ok = (tf >= entry) & (entry <= tmax)
            e_ref[...] = jnp.min(jnp.where(ok, entry, _INF), axis=0,
                                 keepdims=True)
            bt_ref[...] = jnp.full((8, 1), _INF, jnp.float32)
            bi_ref[...] = jnp.zeros((8, 1), jnp.int32)
            if variant == "v1":
                t_ref[pl.ds(r * 8, 8), :] = bt_ref[...]
                idx_ref[pl.ds(r * 8, 8), :] = bi_ref[...]
                return

            o0, o1, o2 = o3[:, 0:1], o3[:, 1:2], o3[:, 2:3]
            dx, dy, dz = d3[:, 0:1], d3[:, 1:2], d3[:, 2:3]
            lane_c = jax.lax.broadcasted_iota(jnp.int32, (1, cpad), 1)
            lane_k = jax.lax.broadcasted_iota(jnp.int32, (8, K), 1)

            def intersect(c):
                trs = tris_ref[c]
                n0, n1, n2, an = trs[0:1], trs[1:2], trs[2:3], trs[3:4]
                g10, g11, g12, c1 = trs[4:5], trs[5:6], trs[6:7], trs[7:8]
                g20, g21, g22, c2 = trs[8:9], trs[9:10], trs[10:11], trs[11:12]
                d_n = dx * n0 + dy * n1 + dz * n2
                o_n = o0 * n0 + o1 * n1 + o2 * n2
                den_ok = jnp.abs(d_n) > jnp.float32(1e-30)
                t = (an - o_n) / jnp.where(den_ok, d_n, 1.0)
                px, py, pz = o0 + t * dx, o1 + t * dy, o2 + t * dz
                u = px * g10 + py * g11 + pz * g12 + c1
                v = px * g20 + py * g21 + pz * g22 + c2
                hit = (den_ok & (t >= 0.0) & (u >= 0.0) & (v >= 0.0)
                       & (u + v <= 1.0) & (t <= tmax))
                t_m = jnp.where(hit, t, _INF)
                tmin = jnp.min(t_m, axis=1, keepdims=True)
                within = jnp.min(jnp.where(t_m == tmin, lane_k, K),
                                 axis=1, keepdims=True)
                gidx = c * K + jnp.minimum(within, K - 1)
                cur = bt_ref[...]
                better = tmin < cur
                bt_ref[...] = jnp.where(better, tmin, cur)
                bi_ref[...] = jnp.where(better, gidx, bi_ref[...])

            if variant == "v2":
                def body(jg, _):
                    intersect(jg)
                    return 0
                jax.lax.fori_loop(0, 16, body, 0)
            elif variant == "v2u":
                # all 16 visits unrolled in one iteration — no loop
                # machinery between pairs
                for k in range(16):
                    intersect(k)
            elif variant == "v2u8":
                # 8 visits unrolled x 2 fori iterations
                def body(jg, _):
                    for k in range(8):
                        intersect(jg * 8 + k)
                    return 0
                jax.lax.fori_loop(0, 2, body, 0)
            elif variant == "v3":
                def body(jg, _):
                    e = e_ref[0]
                    m = jnp.min(e)
                    cv = jnp.min(jnp.where(e == m, lane_c[0], cpad))
                    e_ref[...] = jnp.where(lane_c == cv, _INF, e_ref[...])
                    intersect(jg)
                    return 0
                jax.lax.fori_loop(0, 16, body, 0)
            elif variant == "v4":
                def body(jg, _):
                    e = e_ref[0]
                    m = jnp.min(e)
                    c_sm[0, 0] = jnp.min(jnp.where(e == m, lane_c[0], cpad))
                    c = jnp.minimum(c_sm[0, 0], cpad - 1)
                    e_ref[...] = jnp.where(lane_c == c, _INF, e_ref[...])
                    intersect(c)
                    return 0
                jax.lax.fori_loop(0, 16, body, 0)

            t_ref[pl.ds(r * 8, 8), :] = bt_ref[...]
            idx_ref[pl.ds(r * 8, 8), :] = bi_ref[...]

    return kernel


@functools.lru_cache(maxsize=None)
def build(no, n_rows, C, cpad, K, variant):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(no,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec((n_rows, 1), lambda r, c: (0, 0))] * 2,
        scratch_shapes=[
            pltpu.VMEM((1, cpad), jnp.float32),
            pltpu.VMEM((8, 1), jnp.float32),
            pltpu.VMEM((8, 1), jnp.int32),
            pltpu.SMEM((1, 1), jnp.int32),
            pltpu.SMEM((1, 1), jnp.int32),
        ])
    return pl.pallas_call(
        make_kernel(cpad, K, variant), grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_rows, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n_rows, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=C * 16 * K * 4 + 16 * 1024 * 1024))


def main():
    from rustray_tpu.models.procedural import ensure_bench_assets
    from rustray_tpu.scene.scene import Scene
    from rustray_tpu.ops.block_trace import (DEAD_ORIGIN, coherence_key,
                                             pack_cluster_tris)
    from rustray_tpu.ops.cluster_trace import world_cluster_aabbs
    from rustray_tpu.ops.intersect import INF, prepare_triangles
    # (the (8, C_pad) cluster-AABB table the per-octet kernel variants use;
    # inlined — the production octet path no longer needs it)
    def build_cluster_aabb_table(w_lo, w_hi, cl_ok):
        C = w_lo.shape[0]
        cpad = -(-C // 128) * 128
        lo = jnp.where(cl_ok[:, None], w_lo, jnp.float32(_BIG))
        hi = jnp.where(cl_ok[:, None], w_hi, jnp.float32(-_BIG))
        tab = jnp.concatenate([lo.T, hi.T, jnp.zeros((2, C))], axis=0)
        return jnp.pad(tab, ((0, 0), (0, cpad - C)),
                       constant_values=_BIG)[:, :cpad].at[3:6, C:].set(-_BIG)
    from tools.devbench import device_time

    json_path = ensure_bench_assets(os.path.join("data", "bench"), grid=6,
                                    lat=52, lon=68, width=1280, height=720,
                                    samples=1, monte_carlo=True)
    scene = Scene()
    scene.load(json_path)
    scene.cam.init(1280, 720)
    scene.init()
    scene.update()
    sa, static = scene.compile()
    sa = jax.device_put(sa)
    prep = prepare_triangles(sa)
    pack = jax.jit(pack_cluster_tris, static_argnums=(2, 3, 4))(
        prep, sa.tri_valid, static.n_clusters, static.cluster_size,
        int(sa.cl_lo.shape[0]))
    w_lo, w_hi = world_cluster_aabbs(sa)
    cl_ok = jnp.asarray(sa.cl_valid & sa.inst_visible[sa.cl_inst])
    aabb = build_cluster_aabb_table(w_lo, w_hi, cl_ok)
    z = np.load("/tmp/waves.npz")
    o = jnp.asarray(z["closest_3_o"])
    d = jnp.asarray(z["closest_3_d"])
    alive = jnp.asarray(z["closest_3_alive"])
    lo = jnp.min(jnp.where(cl_ok[:, None], w_lo, INF), axis=0)
    hi = jnp.max(jnp.where(cl_ok[:, None], w_hi, -INF), axis=0)
    perm = jnp.argsort(coherence_key(o, d, alive, lo, hi))
    o, d, alive = o[perm], d[perm], alive[perm]
    o = jnp.where(alive[:, None], o, DEAD_ORIGIN)
    d = jnp.where(alive[:, None], d, 1.0)
    tmax = jnp.where(alive, jnp.float32(INF), -1.0)
    rays = jnp.pad(jnp.concatenate([o, d, tmax[:, None]], axis=1),
                   ((0, 0), (0, 1)))
    n = o.shape[0]
    nlive = jnp.asarray(
        [int(np.ceil((np.nonzero(np.asarray(alive))[0].max() + 1) / 8))],
        jnp.int32)
    print("live octets:", int(nlive[0]))
    cpad = aabb.shape[1]
    for v in ("v1", "v2", "v2u", "v2u8", "v3", "v4"):
        call = build(n // 8, n, pack.shape[0], cpad, 128, v)
        f = jax.jit(lambda nl, r, a, p, call=call: call(nl, r, a, p))
        jax.block_until_ready(f(nlive, rays, aabb, pack))
        ms = device_time(f, nlive, rays, aabb, pack, iters=5)
        print(f"{v}: {ms:.2f} ms")


if __name__ == "__main__":
    main()
