"""Pallas TPU closest-hit kernel — work-list cluster traversal in VMEM.

Why this exists: the XLA dense scan (ops/intersect.closest_tri) intersects
every ray against every triangle, and the XLA cluster walk
(ops/cluster_trace) intersects every ray block against a fixed
``gather×K``-triangle slab per round with all blocks in vmap lockstep — both
waste most of their arithmetic on triangles the rays cannot hit.  This
kernel makes the device work proportional to the *actual* number of
(ray-block × cluster) visits:

1. XLA prologue (:func:`_block_order`): per ray *block* (``block_n`` rays),
   compute a conservative entry-distance lower bound to every cluster AABB
   with interval arithmetic over the block's (alive-masked) origin/direction
   bounds — an (NB, C) problem, tiny.  Sort clusters front-to-back per
   block and count the possibly-hit ones.
2. XLA prologue (:func:`_work_list`): flatten the per-block visit lists into
   ONE block-major work list of at most ``W`` (block, cluster) items.  The
   global budget means coherent blocks' slack funds incoherent stragglers.
3. Pallas grid (W,): step ``w`` visits work item ``w``.  BlockSpec index
   maps driven by the scalar-prefetched work list fetch the ray block and
   the cluster's contiguous ``K``-triangle slab (Mosaic pipelines the HBM→
   VMEM DMAs automatically; consecutive steps of the same ray block keep it
   resident).  The kernel slab-tests the block against the cluster AABB in
   registers and — only if some ray's entry beats its current best —
   intersects the block against the slab (Baldwin–Weber constants, one
   fused VPU pass) and min-updates the per-ray best (t, triangle id).
4. If any block's visit list was truncated (per-block cap or global
   budget), the caller falls back to the exact XLA cluster walk via
   ``lax.cond`` — correctness never depends on the caps.

Replaces the reference's per-ray BVH walk (src/scene.rs:1715-1722 + parry's
per-mesh BVH, src/shape/mesh.rs:67).

Selection only: inputs are stop_gradient'ed and only integer winners leave;
callers recompute the winner's ray parameter differentiably
(ops/cluster_trace.recompute_t), so gradients flow through exactly one
triangle per ray.

Tie semantics: within a slab the lowest triangle index wins (same as the
dense path); across clusters the *nearer-entry* cluster wins exact-t ties
(the dense path uses pool order) — measure-zero difference, documented.
Rays that graze a cluster AABB face within f32 rounding may additionally
miss a triangle the cull-free dense scan hits (~1e-4 of random-direction
rays, none observed on camera rays); the reference's own AABB-culled walk
(src/raytracing.rs:446-466) has the identical boundary artifact.

NOTE on manual DMA: ``pltpu.make_async_copy`` + DMA semaphores deadlock on
the tunneled TPU runtime this targets (probed empirically), so the kernel
deliberately uses only BlockSpec-driven automatic pipelining.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import INF, TrianglePrep

_BIG = jnp.float32(3.0e37)
# sentinel origin for dead/padding rays: far outside any scene, pointing
# away — misses every AABB slab test (see trace_tris_pallas)
DEAD_ORIGIN = 2.0e37
_KEY_BIG = jnp.int32(2_000_000_000)


def pack_cluster_tris(prep: TrianglePrep, tri_valid, n_clusters: int,
                      cluster_size: int, out_rows: int = None):
    """Pack per-triangle Baldwin–Weber constants into (C, 16, K) slabs.

    Component rows: 0..2 plane normal n, 3 a·n, 4..6 g1, 7 c1, 8..10 g2,
    11 c2, 12..15 zero padding (keeps the sublane dim a multiple of 8).

    ``tri_valid`` (pool,) folds the cluster-padding mask into the pack by
    zeroing the normal rows of invalid slots (d·n = 0 ⇒ guaranteed miss),
    so the kernel needs no separate validity operand.  Per-*instance*
    dynamic masks are uniform across a cluster (clusters never span
    instances) and are handled by ``cl_ok`` in the prologue.

    ``out_rows`` pads the cluster axis (the SceneArrays cluster tables are
    padded past ``n_clusters``; padded ids are never visited but must be
    addressable by the kernel's BlockSpec).
    """
    n_clusters = min(n_clusters, prep.an.shape[0] // cluster_size)
    pool = n_clusters * cluster_size
    ok = tri_valid[:pool].astype(jnp.float32)
    comps = jnp.stack([
        prep.n[:pool, 0] * ok, prep.n[:pool, 1] * ok, prep.n[:pool, 2] * ok,
        prep.an[:pool],
        prep.g1[:pool, 0], prep.g1[:pool, 1], prep.g1[:pool, 2], prep.c1[:pool],
        prep.g2[:pool, 0], prep.g2[:pool, 1], prep.g2[:pool, 2], prep.c2[:pool],
    ], axis=1)                                            # (pool, 12)
    comps = jnp.pad(comps, ((0, 0), (0, 4)))              # (pool, 16)
    comps = comps.reshape(n_clusters, cluster_size, 16)
    pack = jnp.transpose(comps, (0, 2, 1))                # (C, 16, K)
    if out_rows is not None and out_rows > n_clusters:
        pack = jnp.pad(pack, ((0, out_rows - n_clusters), (0, 0), (0, 0)))
    return pack


def _block_order(o, d, alive, w_lo, w_hi, cl_ok, nb, block):
    """Conservative front-to-back cluster order per ray block.

    Interval arithmetic over the block's (alive-masked) origin/direction
    bounding boxes gives a lower bound on any live ray's slab entry
    distance — safe for both ordering and pruning.  Axes whose direction
    interval spans zero contribute (-inf, +inf) and are skipped.
    Returns (order (NB, C) int32, count (NB,) int32).
    """
    o_b = o.reshape(nb, block, 3)
    d_b = d.reshape(nb, block, 3)
    a_b = alive.reshape(nb, block, 1)
    olo = jnp.where(a_b, o_b, _BIG).min(axis=1)           # (NB, 3)
    ohi = jnp.where(a_b, o_b, -_BIG).max(axis=1)
    dlo = jnp.where(a_b, d_b, _BIG).min(axis=1)
    dhi = jnp.where(a_b, d_b, -_BIG).max(axis=1)
    any_alive = jnp.any(a_b[..., 0], axis=1)              # (NB,)
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
    possible = ((exit_ub >= jnp.maximum(entry_lb, 0.0)) & cl_ok[None]
                & any_alive[:, None])
    key = jnp.where(possible, entry_lb, INF)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    count = jnp.sum(possible, axis=1).astype(jnp.int32)
    return order, count


def _work_list(order, count, nb, percap, W):
    """Flatten per-block front-to-back visit lists into one block-major work
    list of exactly ``W`` items.

    Returns (bw, cw, first, do_visit, truncated):
    - bw (W,) int32: ray-block row per item (``nb`` = dump row for padding)
    - cw (W,) int32: cluster id per item
    - first (W,) int32: 1 on the first item of each output block (kernel
      initializes the block's accumulators there) — every real block gets
      at least one item, so every output row is initialized
    - do_visit (W,) int32: 1 when the item is a real cluster visit
    - truncated (): bool — some visit did not fit (per-block ``percap`` or
      global ``W``); caller must fall back to the exact path
    """
    do_n = jnp.minimum(count, percap)                     # (NB,)
    visits = jnp.maximum(do_n, 1)                         # ≥1 → init item
    r = jnp.arange(percap, dtype=jnp.int32)[None, :]      # (1, PER)
    b = jnp.arange(nb, dtype=jnp.int32)[:, None]          # (NB, 1)
    valid_item = r < visits[:, None]                      # (NB, PER)
    key = jnp.where(valid_item, b * percap + r, _KEY_BIG).reshape(-1)
    if key.shape[0] < W:
        # the item pool must cover the whole grid — short prefetch arrays
        # would let the kernel index past them (undefined behavior)
        key = jnp.pad(key, (0, W - key.shape[0]),
                      constant_values=int(_KEY_BIG))
    perm = jnp.argsort(key)[:W]                           # block-major prefix
    emitted = key[perm] < _KEY_BIG                        # (W,)
    bw_raw = jnp.minimum((perm // percap).astype(jnp.int32), nb - 1)
    rw = jnp.minimum((perm % percap).astype(jnp.int32), percap - 1)
    bw = jnp.where(emitted, bw_raw, nb)
    cw = jnp.where(emitted, order[bw_raw, rw], 0)
    do_visit = emitted & (rw < do_n[bw_raw])
    pad = ~emitted
    pad_first = pad & (jnp.cumsum(pad.astype(jnp.int32)) == 1)
    first = jnp.where(emitted, rw == 0, pad_first)
    n_items = jnp.sum(visits)
    truncated = (n_items > W) | jnp.any(count > percap)
    return (bw, cw, first.astype(jnp.int32), do_visit.astype(jnp.int32),
            truncated)


def _make_kernel(block_n: int, K: int):
    inf = 3.0e38  # python float: jnp module constants would be captured consts

    def kernel(bw_ref, cw_ref, first_ref, visit_ref,
               rays_ref, box_ref, tris_ref, t_ref, idx_ref):
        w = pl.program_id(0)

        @pl.when(first_ref[w] == 1)
        def _init():
            t_ref[0] = jnp.full((block_n, 1), inf, jnp.float32)
            idx_ref[0] = jnp.zeros((block_n, 1), jnp.int32)

        @pl.when(visit_ref[w] == 1)
        def _visit():
            r = rays_ref[0]                          # (BN, 8)
            ox, oy, oz = r[:, 0:1], r[:, 1:2], r[:, 2:3]
            dx, dy, dz = r[:, 3:4], r[:, 4:5], r[:, 5:6]
            b = box_ref[0]                            # (1, 8)
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

                d_n = dx * n0 + dy * n1 + dz * n2          # (BN, K)
                o_n = ox * n0 + oy * n1 + oz * n2
                denom_ok = jnp.abs(d_n) > eps
                t = (an - o_n) / jnp.where(denom_ok, d_n, 1.0)
                px, py, pz = ox + t * dx, oy + t * dy, oz + t * dz
                u = px * g10 + py * g11 + pz * g12 + c1
                v = px * g20 + py * g21 + pz * g22 + c2
                hit = (denom_ok & (t >= 0.0) & (u >= 0.0) & (v >= 0.0)
                       & (u + v <= 1.0) & active)
                t_m = jnp.where(hit, t, inf)
                tile_min = jnp.min(t_m, axis=1, keepdims=True)      # (BN, 1)
                lane = jax.lax.broadcasted_iota(jnp.int32, (block_n, K), 1)
                within = jnp.min(jnp.where(t_m == tile_min, lane, K),
                                 axis=1, keepdims=True)
                cid = cw_ref[w]
                gidx = cid * K + within
                better = tile_min < cur
                t_ref[0] = jnp.where(better, tile_min, cur)
                idx_ref[0] = jnp.where(better, gidx, idx_ref[0])

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(nb: int, block_n: int, C: int, K: int, W: int,
                interpret: bool = False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(W,),
        in_specs=[
            pl.BlockSpec((1, block_n, 8),
                         lambda w, bw, cw, f, v: (bw[w], 0, 0)),
            pl.BlockSpec((1, 1, 8), lambda w, bw, cw, f, v: (cw[w], 0, 0)),
            pl.BlockSpec((1, 16, K), lambda w, bw, cw, f, v: (cw[w], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_n, 1), lambda w, bw, cw, f, v: (bw[w], 0, 0)),
            pl.BlockSpec((1, block_n, 1), lambda w, bw, cw, f, v: (bw[w], 0, 0)),
        ],
    )
    return pl.pallas_call(
        _make_kernel(block_n, K),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb + 1, block_n, 1), jnp.float32),
            jax.ShapeDtypeStruct((nb + 1, block_n, 1), jnp.int32),
        ],
        interpret=interpret,
    )


def trace_tris_pallas(o, d, alive, prep: TrianglePrep, w_lo, w_hi, cl_ok,
                      cluster_size: int, block_n: int = 512,
                      percap: int = 64, avg_visits: int = 24,
                      interpret: bool = False):
    """Closest mesh hit over the clustered pool.

    Returns (found (N,) bool, best_tri (N,) int32, truncated () bool).
    When ``truncated`` is True the (found, best_tri) values are incomplete
    and the caller must use the exact fallback (``lax.cond`` in
    ops/traverse.trace_closest).  Selection-only (see module docstring);
    recompute t with ops/cluster_trace.recompute_t.
    """
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    prep = jax.tree_util.tree_map(jax.lax.stop_gradient, prep)
    w_lo = jax.lax.stop_gradient(w_lo)
    w_hi = jax.lax.stop_gradient(w_hi)

    K = cluster_size
    C = w_lo.shape[0]
    percap = min(percap, C)
    n = o.shape[0]
    nb = -(-n // block_n)
    pad = nb * block_n - n
    if alive is None:
        alive = jnp.ones((n,), bool)
    # dead/padding rays: origin far outside the scene, pointing further away
    # → every slab test misses, so they never enter block bounds or visits
    o = jnp.where(alive[:, None], o, DEAD_ORIGIN)
    d = jnp.where(alive[:, None], d, 1.0)
    if pad:
        o = jnp.concatenate([o, jnp.full((pad, 3), DEAD_ORIGIN, o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        alive = jnp.concatenate([alive, jnp.zeros((pad,), bool)])

    order, count = _block_order(o, d, alive, w_lo, w_hi, cl_ok, nb, block_n)
    W = nb * avg_visits
    bw, cw, first, do_visit, truncated = _work_list(order, count, nb,
                                                    percap, W)

    rays = jnp.concatenate([o, d], axis=1)                  # (Np, 6)
    rays = jnp.pad(rays, ((0, 0), (0, 2))).reshape(nb, block_n, 8)
    rays = jnp.pad(rays, ((0, 1), (0, 0), (0, 0)))          # dump row
    boxes = jnp.concatenate(
        [w_lo, w_hi, jnp.zeros((C, 2), jnp.float32)], axis=1)  # (C, 8)
    boxes = boxes.reshape(C, 1, 8)
    pack = prep.pallas_pack
    if pack is None:
        raise ValueError(
            "trace_tris_pallas requires prep.pallas_pack — build it with "
            "pack_cluster_tris (wavefront._prepare does this when the "
            "pallas path is enabled)")

    call = _build_call(nb, block_n, C, K, W, interpret)
    t_out, idx_out = call(bw, cw, first, do_visit, rays, boxes, pack)
    t = t_out[:nb].reshape(-1)[:n]
    idx = idx_out[:nb].reshape(-1)[:n]
    return t < INF, idx, truncated
