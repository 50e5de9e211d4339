"""Pallas TPU closest-hit kernel — block-coherent cluster traversal in VMEM.

Why this exists: the XLA dense scan (ops/intersect.closest_tri) and the XLA
cluster walk (ops/cluster_trace) both materialize (rays × triangles)
intermediates in HBM, so a single 32k-ray trace is HBM-bandwidth-bound
(~1.4 Mrays/s measured).  This kernel keeps every (ray-block × tri-tile)
intermediate in VMEM and streams only the 8 KB cluster slabs it actually
visits, in front-to-back order with per-ray early exit.

Structure (replaces the reference's per-ray BVH walk,
src/scene.rs:1715-1722 + parry's per-mesh BVH, src/shape/mesh.rs:67):

1. Host/XLA side: per ray *block* (``block_n`` rays), compute a
   conservative entry-distance lower bound to every cluster AABB with
   interval arithmetic over the block's origin/direction bounds — an
   (NB, C) problem, tiny.  Sort clusters front-to-back per block; count the
   possibly-hit ones.
2. Pallas grid (NB, C): program (i, j) visits block i's j-th *nearest*
   cluster (scalar-prefetched order), slab-tests the block's rays against
   its AABB in registers, and — only if some ray's entry beats its current
   best — intersects the block against the cluster's contiguous
   ``K``-triangle slab (Baldwin–Weber constants, one fused VPU pass) and
   min-updates the per-ray best (t, triangle id).
3. Exhausted blocks clamp their BlockSpec index to the last visited slab,
   so the pipeline issues no further DMAs for them (revisiting the same
   block skips the copy).

Selection only: inputs are stop_gradient'ed and only integer winners leave;
callers recompute the winner's ray parameter differentiably
(ops/cluster_trace.recompute_t), so gradients flow through exactly one
triangle per ray.

Tie semantics: within a slab the lowest triangle index wins (same as the
dense path); across clusters the *nearer-entry* cluster wins exact-t ties
(the dense path uses pool order) — measure-zero difference, documented.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import INF, TrianglePrep

_BIG = jnp.float32(3.0e37)


def pack_cluster_tris(prep: TrianglePrep, n_clusters: int, cluster_size: int,
                      out_rows: int = None):
    """Pack per-triangle Baldwin–Weber constants into (C, 16, K) slabs.

    Component rows: 0..2 plane normal n, 3 a·n, 4..6 g1, 7 c1, 8..10 g2,
    11 c2, 12..15 zero padding (keeps the sublane dim a multiple of 8).
    ``out_rows`` pads the cluster axis (the SceneArrays cluster tables are
    padded past ``n_clusters``; padded ids are never visited but must be
    addressable by the kernel's BlockSpec).
    """
    n_clusters = min(n_clusters, prep.an.shape[0] // cluster_size)
    pool = n_clusters * cluster_size
    comps = jnp.stack([
        prep.n[:pool, 0], prep.n[:pool, 1], prep.n[:pool, 2], prep.an[:pool],
        prep.g1[:pool, 0], prep.g1[:pool, 1], prep.g1[:pool, 2], prep.c1[:pool],
        prep.g2[:pool, 0], prep.g2[:pool, 1], prep.g2[:pool, 2], prep.c2[:pool],
    ], axis=1)                                            # (pool, 12)
    comps = jnp.pad(comps, ((0, 0), (0, 4)))              # (pool, 16)
    comps = comps.reshape(n_clusters, cluster_size, 16)
    pack = jnp.transpose(comps, (0, 2, 1))                # (C, 16, K)
    if out_rows is not None and out_rows > n_clusters:
        pack = jnp.pad(pack, ((0, out_rows - n_clusters), (0, 0), (0, 0)))
    return pack


def _block_order(o, d, w_lo, w_hi, cl_ok, nb, block):
    """Conservative front-to-back cluster order per ray block.

    Interval arithmetic over the block's origin/direction bounding boxes
    gives a lower bound on any ray's slab entry distance — safe for both
    ordering and (in-kernel) pruning.  Axes whose direction interval spans
    zero contribute (-inf, +inf) and are skipped.
    Returns (order (NB, C) int32, count (NB,) int32).
    """
    o_b = o.reshape(nb, block, 3)
    d_b = d.reshape(nb, block, 3)
    olo, ohi = o_b.min(axis=1), o_b.max(axis=1)           # (NB, 3)
    dlo, dhi = d_b.min(axis=1), d_b.max(axis=1)
    ax_ok = (dlo > 1e-12) | (dhi < -1e-12)                # single-sign axis
    i1 = 1.0 / jnp.where(ax_ok, dlo, 1.0)
    i2 = 1.0 / jnp.where(ax_ok, dhi, 1.0)
    ilo, ihi = jnp.minimum(i1, i2), jnp.maximum(i1, i2)

    def plane_t(s):  # s (C, 3) → interval of (s - o)·inv, (NB, C, 3)
        a = s[None] - ohi[:, None]
        b = s[None] - olo[:, None]
        c0, c1 = a * ilo[:, None], a * ihi[:, None]
        c2, c3 = b * ilo[:, None], b * ihi[:, None]
        lb = jnp.minimum(jnp.minimum(c0, c1), jnp.minimum(c2, c3))
        ub = jnp.maximum(jnp.maximum(c0, c1), jnp.maximum(c2, c3))
        return lb, ub

    lo_lb, lo_ub = plane_t(w_lo)
    hi_lb, hi_ub = plane_t(w_hi)
    near_lb = jnp.minimum(lo_lb, hi_lb)    # LB of per-ray near plane
    far_ub = jnp.maximum(lo_ub, hi_ub)     # UB of per-ray far plane
    near_lb = jnp.where(ax_ok[:, None], near_lb, -_BIG)
    far_ub = jnp.where(ax_ok[:, None], far_ub, _BIG)
    entry_lb = near_lb.max(axis=-1)                        # (NB, C)
    exit_ub = far_ub.min(axis=-1)
    possible = (exit_ub >= jnp.maximum(entry_lb, 0.0)) & cl_ok[None]
    key = jnp.where(possible, entry_lb, INF)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    count = jnp.sum(possible, axis=1).astype(jnp.int32)
    return order, count


def _make_kernel(block_n: int, K: int):
    inf = 3.0e38  # python float: jnp module constants would be captured consts

    def kernel(order_ref, count_ref, rays_ref, box_ref, tris_ref, ok_ref,
               t_ref, idx_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            t_ref[0] = jnp.full((block_n, 1), inf, jnp.float32)
            idx_ref[0] = jnp.zeros((block_n, 1), jnp.int32)

        m = count_ref[i]

        @pl.when(j < m)
        def _visit():
            r = rays_ref[0]                          # (BN, 8)
            ox, oy, oz = r[:, 0:1], r[:, 1:2], r[:, 2:3]
            dx, dy, dz = r[:, 3:4], r[:, 4:5], r[:, 5:6]
            b = box_ref[:]                            # (1, 8)
            eps = jnp.float32(1e-30)

            def axis(dc, oc, lo_c, hi_c):
                safe = jnp.where(jnp.abs(dc) > eps, dc,
                                 jnp.where(dc >= 0, eps, -eps))
                inv = 1.0 / safe
                t0 = (b[:, lo_c:lo_c + 1] - oc) * inv
                t1 = (b[:, hi_c:hi_c + 1] - oc) * inv
                return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

            tnx, tfx = axis(dx, ox, 0, 3)
            tny, tfy = axis(dy, oy, 1, 4)
            tnz, tfz = axis(dz, oz, 2, 5)
            tn = jnp.maximum(jnp.maximum(tnx, tny), tnz)   # (BN, 1)
            tf = jnp.minimum(jnp.minimum(tfx, tfy), tfz)
            cur = t_ref[0]                                 # (BN, 1)
            active = (tf >= jnp.maximum(tn, 0.0)) & (tn <= cur)

            @pl.when(jnp.any(active))
            def _intersect():
                trs = tris_ref[0]                          # (16, K)
                n0, n1, n2, an = trs[0:1], trs[1:2], trs[2:3], trs[3:4]
                g10, g11, g12, c1 = trs[4:5], trs[5:6], trs[6:7], trs[7:8]
                g20, g21, g22, c2 = trs[8:9], trs[9:10], trs[10:11], trs[11:12]
                okv = ok_ref[:]                            # (1, K)

                d_n = dx * n0 + dy * n1 + dz * n2          # (BN, K)
                o_n = ox * n0 + oy * n1 + oz * n2
                denom_ok = jnp.abs(d_n) > eps
                t = (an - o_n) / jnp.where(denom_ok, d_n, 1.0)
                px, py, pz = ox + t * dx, oy + t * dy, oz + t * dz
                u = px * g10 + py * g11 + pz * g12 + c1
                v = px * g20 + py * g21 + pz * g22 + c2
                hit = (denom_ok & (t >= 0.0) & (u >= 0.0) & (v >= 0.0)
                       & (u + v <= 1.0) & (okv > 0.5) & active)
                t_m = jnp.where(hit, t, inf)
                tile_min = jnp.min(t_m, axis=1, keepdims=True)      # (BN, 1)
                lane = jax.lax.broadcasted_iota(jnp.int32, (block_n, K), 1)
                within = jnp.min(jnp.where(t_m == tile_min, lane, K),
                                 axis=1, keepdims=True)
                cid = order_ref[i, jnp.maximum(jnp.minimum(j, m - 1), 0)]
                gidx = cid * K + within
                better = tile_min < cur
                t_ref[0] = jnp.where(better, tile_min, cur)
                idx_ref[0] = jnp.where(better, gidx, idx_ref[0])

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(nb: int, block_n: int, n_clusters: int, K: int):
    def clamp(j, cnt_i):
        return jnp.maximum(jnp.minimum(j, cnt_i - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, n_clusters),
        in_specs=[
            pl.BlockSpec((1, block_n, 8), lambda i, j, o, c: (i, 0, 0)),
            pl.BlockSpec((1, 8), lambda i, j, o, c: (o[i, clamp(j, c[i])], 0)),
            pl.BlockSpec((1, 16, K), lambda i, j, o, c: (o[i, clamp(j, c[i])], 0, 0)),
            pl.BlockSpec((1, K), lambda i, j, o, c: (o[i, clamp(j, c[i])], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_n, 1), lambda i, j, o, c: (i, 0, 0)),
            pl.BlockSpec((1, block_n, 1), lambda i, j, o, c: (i, 0, 0)),
        ],
    )
    return pl.pallas_call(
        _make_kernel(block_n, K),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, block_n, 1), jnp.float32),
            jax.ShapeDtypeStruct((nb, block_n, 1), jnp.int32),
        ],
    )


def trace_tris_pallas(o, d, prep: TrianglePrep, tri_ok, w_lo, w_hi, cl_ok,
                      cluster_size: int, block_n: int = 512):
    """Closest mesh hit over the clustered pool.  Returns
    (found (N,) bool, best_tri (N,) int32).  Selection-only (see module
    docstring); recompute t with ops/cluster_trace.recompute_t."""
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    prep = jax.tree_util.tree_map(jax.lax.stop_gradient, prep)
    w_lo = jax.lax.stop_gradient(w_lo)
    w_hi = jax.lax.stop_gradient(w_hi)

    K = cluster_size
    C = w_lo.shape[0]
    n = o.shape[0]
    nb = -(-n // block_n)
    pad = nb * block_n - n
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])

    order, count = _block_order(o, d, w_lo, w_hi, cl_ok, nb, block_n)

    rays = jnp.concatenate([o, d], axis=1)                  # (Np, 6)
    rays = jnp.pad(rays, ((0, 0), (0, 2))).reshape(nb, block_n, 8)
    boxes = jnp.concatenate(
        [w_lo, w_hi, jnp.zeros((C, 2), jnp.float32)], axis=1)   # (C, 8)
    pack = prep.pallas_pack
    if pack is None:
        pack = pack_cluster_tris(prep, C, K, out_rows=C)
    okf = tri_ok.astype(jnp.float32)
    if okf.shape[0] < C * K:
        okf = jnp.pad(okf, (0, C * K - okf.shape[0]))
    ok_arr = okf[:C * K].reshape(C, K)

    t_out, idx_out = _build_call(nb, block_n, C, K)(
        order, count, rays, boxes, pack, ok_arr)
    t = t_out.reshape(-1)[:n]
    idx = idx_out.reshape(-1)[:n]
    return t < INF, idx
