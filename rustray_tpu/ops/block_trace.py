"""Per-ray-block Pallas TPU traversal — the production closest/any-hit kernel.

This is the TPU-native replacement for the reference's per-ray BVH walk
(``Raytracing::trace``, /root/reference/src/raytracing.rs:429-490, over the
scene BVH /root/reference/src/scene.rs:1715-1722 and parry3d's per-mesh BVH,
/root/reference/src/shape/mesh.rs:67).  Design:

1.  Rays are pre-sorted by a coherence key (:func:`coherence_key` — direction
    octant + origin Morton code) so each ``block_n``-ray block is spatially
    and directionally tight; dead rays sort last, so dead blocks visit
    nothing.
2.  An XLA prologue (:func:`_block_lists`) slab-tests every block's interval
    bounds against all cluster AABBs (conservative — safe for culling),
    prunes by the block's max ``t_max`` (shadow rays stop at the light), and
    emits a complete front-to-back (cluster id, entry distance) list per
    block.  Completeness means the kernel never truncates and there is no
    fallback path to double-pay (the round-2 design lost 20x to exactly
    that).
3.  The kernel runs one grid step per ray block (rays stay resident in
    VMEM).  It DMAs the block's list into SMEM, then walks it front-to-back
    intersecting the whole block against each cluster's contiguous
    ``(16, K)`` triangle-constant slab in one fused VPU pass (Baldwin-Weber
    constants, identical operation order to
    ops/intersect.intersect_tri_tile).  Two slab sources:
    - **VMEM-resident** (production for packs <= _VMEM_PACK_BUDGET): the
      whole (C, 16, K) pack lives in VMEM for the entire grid — a visit is
      a plain dynamic read, no DMAs/semaphores (PERF_r04 step 5);
    - double-buffered HBM->VMEM DMA streaming for larger scenes.
    The walk TERMINATES (while_loop) at the first cluster whose entry
    distance exceeds every lane's ``min(best_t, t_max)`` — the vector
    analogue of the reference's sorted-candidate early-exit
    (src/raytracing.rs:466-489).
4.  ``mode="any"`` freezes a lane at its first confirmed hit and stops the
    block once every live lane is occluded — the reference's
    ``stop_on_first_hit`` shadow semantics (src/raytracing.rs:483-487).

Selection only: inputs are stop_gradient'ed and only integer winners, the
found mask and the winner's (stop-gradient) ray parameter leave; callers
route gradients through ops/traverse.selected_t, whose backward
differentiates the analytic t through exactly one triangle per ray.

Tie semantics: within a slab the lowest triangle index wins (same as the
dense path); across clusters the nearer-entry cluster wins exact-t ties —
measure-zero difference from the dense path's pool order, documented.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import INF, TrianglePrep

_BIG = jnp.float32(3.0e37)
_INF_PY = 3.0e38
# sentinel origin for dead/padding rays: far outside any scene — keeps them
# out of the prologue's block bounds; their t_max of -1 vetoes any hit
DEAD_ORIGIN = 2.0e37

# dev instrumentation sink (RUSTRAY_TRACE_STATS=1): (mode, nb, sum, max, mean)
_TRACE_STATS = []


# --------------------------------------------------------------------------
# Triangle-constant packing (cluster-major slabs, DMA unit of the kernel)
# --------------------------------------------------------------------------

def pack_cluster_tris(prep: TrianglePrep, tri_valid, n_clusters: int,
                      cluster_size: int, out_rows: int = None):
    """Pack per-triangle Baldwin-Weber constants into (C, 16, K) slabs.

    Component rows: 0..2 plane normal n, 3 a.n, 4..6 g1, 7 c1, 8..10 g2,
    11 c2, 12..15 zero padding (keeps the sublane dim a multiple of 8).

    ``tri_valid`` (pool,) folds the cluster-padding mask into the pack by
    zeroing the normal rows of invalid slots (d.n = 0 => guaranteed miss),
    so the kernel needs no separate validity operand.  Per-*instance*
    dynamic masks are uniform across a cluster (clusters never span
    instances) and are handled by ``cl_ok`` in the prologue.

    ``out_rows`` pads the cluster axis (the SceneArrays cluster tables are
    padded past ``n_clusters``; padded ids are never visited but must be
    addressable by the kernel's DMA).
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
    # always at least one all-zero padding row: the octet round-trace uses
    # the last row as its guaranteed-miss dummy cluster (empty stream
    # slots intersect it branch-free)
    out_rows = max(out_rows if out_rows is not None else n_clusters,
                   n_clusters + 1)
    if out_rows > n_clusters:
        pack = jnp.pad(pack, ((0, out_rows - n_clusters), (0, 0), (0, 0)))
    return pack


# --------------------------------------------------------------------------
# Ray coherence sorting
# --------------------------------------------------------------------------

def _spread3(x):
    """Spread the low 10 bits of ``x`` so bit i lands at position 3i."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def coherence_key(o, d, alive, lo, hi):
    """Sort key restoring block coherence for incoherent wavefronts.

    Bits [23:21] direction octant, [20:0] 7-bit-per-axis Morton code of the
    origin within the scene bounds.  Blocks of octant-pure rays have
    single-sign direction intervals on every axis, which is exactly what the
    prologue's interval arithmetic needs to produce tight entry bounds —
    unsorted secondary/shadow wavefronts were the round-2 catastrophe.
    Dead rays get INT32_MAX and sort last (their blocks visit nothing, so
    sorting subsumes wavefront compaction).
    """
    ext = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip((o - lo) / ext * 128.0, 0.0, 127.0).astype(jnp.int32)
    m = (_spread3(q[:, 0]) | (_spread3(q[:, 1]) << 1)
         | (_spread3(q[:, 2]) << 2))
    octant = ((d[:, 0] >= 0).astype(jnp.int32) * 4
              + (d[:, 1] >= 0).astype(jnp.int32) * 2
              + (d[:, 2] >= 0).astype(jnp.int32))
    key = (octant << 21) | m
    return jnp.where(alive, key, jnp.int32(0x7FFFFFFF))


# --------------------------------------------------------------------------
# Prologue: per-block front-to-back cluster lists
# --------------------------------------------------------------------------

def _block_lists(o, d, alive, tmax, w_lo, w_hi, cl_ok, nb, block, cpad,
                 refine: int = 4):
    """Complete conservative front-to-back cluster list per ray block.

    Interval arithmetic over (alive-masked) origin/direction bounding boxes
    lower-bounds any live ray's slab entry distance — safe for both
    ordering and pruning.  Axes whose direction interval spans zero
    contribute (-inf, +inf) and are skipped (octant-sorted blocks have
    none).  Each block is tested as ``refine`` sub-blocks whose results are
    unioned: sub-bounds are much tighter on incoherent wavefronts, so the
    merged visit list shrinks at no kernel cost.  Returns (order (NB, 1,
    cpad) int32, entry (NB, 1, cpad) f32 sorted ascending, count (NB,)
    int32).
    """
    S = refine if block % refine == 0 else 1
    sub = block // S
    nbs = nb * S
    o_b = o.reshape(nbs, sub, 3)
    d_b = d.reshape(nbs, sub, 3)
    a_b = alive.reshape(nbs, sub, 1)
    olo = jnp.where(a_b, o_b, _BIG).min(axis=1).reshape(nb, S, 3)
    ohi = jnp.where(a_b, o_b, -_BIG).max(axis=1).reshape(nb, S, 3)
    dlo = jnp.where(a_b, d_b, _BIG).min(axis=1).reshape(nb, S, 3)
    dhi = jnp.where(a_b, d_b, -_BIG).max(axis=1).reshape(nb, S, 3)
    sub_alive = jnp.any(a_b[..., 0], axis=1).reshape(nb, S)
    sub_tmax = jnp.max(jnp.where(a_b[..., 0], tmax.reshape(nbs, sub),
                                 -_BIG), axis=1).reshape(nb, S)

    C = w_lo.shape[0]
    possible = jnp.zeros((nb, C), bool)
    entry_min = jnp.full((nb, C), jnp.float32(_INF_PY))
    qbits = jnp.zeros((nb, C), jnp.int32)
    for s in range(S):   # sequential: caps the (NB, C, 3) intermediates
        ax_ok = (dlo[:, s] > 1e-12) | (dhi[:, s] < -1e-12)
        i1 = 1.0 / jnp.where(ax_ok, dlo[:, s], 1.0)
        i2 = 1.0 / jnp.where(ax_ok, dhi[:, s], 1.0)
        ilo, ihi = jnp.minimum(i1, i2), jnp.maximum(i1, i2)

        # per-axis rank-2 accumulation: XLA materializes the (NB, C, 3)
        # broadcast form ~4x slower (measured on octet_entries, round 5)
        entry_lb = None
        exit_ub = None
        for a in range(3):
            ia_lo, ia_hi = ilo[:, a:a + 1], ihi[:, a:a + 1]    # (NB, 1)
            oh, ol = ohi[:, s, a][:, None], olo[:, s, a][:, None]
            lo_a = w_lo[None, :, a]                            # (1, C)
            hi_a = w_hi[None, :, a]
            a1, b1 = lo_a - oh, lo_a - ol
            a2, b2 = hi_a - oh, hi_a - ol
            lo_lb = jnp.minimum(jnp.minimum(a1 * ia_lo, a1 * ia_hi),
                                jnp.minimum(b1 * ia_lo, b1 * ia_hi))
            lo_ub = jnp.maximum(jnp.maximum(a1 * ia_lo, a1 * ia_hi),
                                jnp.maximum(b1 * ia_lo, b1 * ia_hi))
            hi_lb = jnp.minimum(jnp.minimum(a2 * ia_lo, a2 * ia_hi),
                                jnp.minimum(b2 * ia_lo, b2 * ia_hi))
            hi_ub = jnp.maximum(jnp.maximum(a2 * ia_lo, a2 * ia_hi),
                                jnp.maximum(b2 * ia_lo, b2 * ia_hi))
            near_a = jnp.minimum(lo_lb, hi_lb)   # LB of per-ray near plane
            far_a = jnp.maximum(lo_ub, hi_ub)    # UB of per-ray far plane
            axm = ax_ok[:, a:a + 1]
            near_a = jnp.where(axm, near_a, -_BIG)
            far_a = jnp.where(axm, far_a, _BIG)
            entry_lb = near_a if entry_lb is None \
                else jnp.maximum(entry_lb, near_a)
            exit_ub = far_a if exit_ub is None \
                else jnp.minimum(exit_ub, far_a)
        entry_lb = jnp.maximum(entry_lb, 0.0)                  # (NB, C)
        poss_s = ((exit_ub >= entry_lb)
                  & (entry_lb <= sub_tmax[:, s][:, None])
                  & cl_ok[None] & sub_alive[:, s][:, None])
        possible = possible | poss_s
        entry_min = jnp.minimum(entry_min,
                                jnp.where(poss_s, entry_lb,
                                          jnp.float32(_INF_PY)))
        qbits = qbits | (poss_s.astype(jnp.int32) << s)
    key = jnp.where(possible, entry_min, jnp.float32(_INF_PY))
    # descriptor: cluster id in the low 16 bits, per-sub-block (quad) need
    # mask in bits 16..16+S — the kernel intersects ONLY the sub-blocks
    # whose interval test passed this cluster (quad-gated visits; the
    # full-block visit wasted >90% of its ray lanes at secondary levels,
    # tools/traversal_lab.py).  S != 4 (non-quad refine) marks all quads.
    if S != 4:
        qbits = jnp.where(possible, 15, 0)
    cid = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[None], key.shape)
    cid = cid | (qbits << 16)
    entry_s, order = jax.lax.sort((key, cid), dimension=1, num_keys=1)
    count = jnp.sum(possible, axis=1).astype(jnp.int32)
    if cpad > C:
        entry_s = jnp.pad(entry_s, ((0, 0), (0, cpad - C)),
                          constant_values=_INF_PY)
        order = jnp.pad(order, ((0, 0), (0, cpad - C)))
    return (order.reshape(nb, 1, cpad), entry_s.reshape(nb, 1, cpad), count)


# --------------------------------------------------------------------------
# Kernel
# --------------------------------------------------------------------------

# slab pipeline: per-visit compute (~0.3 us) is far shorter than HBM DMA
# latency, so a 1-deep double buffer stalls every iteration on the latency
# (measured 3-8 us/visit).  Keep PREFETCH copies in flight across SLOTS
# buffers (SLOTS > PREFETCH so the slab being consumed is never the one
# being overwritten).
_SLAB_SLOTS = 4
_SLAB_PREFETCH = 3
# clusters intersected per loop iteration: the per-iteration fixed cost
# (scalar control, semaphore ops, the early-exit scalar round trip) was
# measured at ~2.8 us — 10x the (BN, K) vector compute — so each iteration
# processes a GROUP of consecutive front-to-back list entries as one
# (BN, GROUP*K) fused intersection, amortizing the overhead 4x
_GROUP = 8


# VMEM-resident variant: when the whole (C, 16, K) slab pack fits on-chip
# (v5e VMEM is ~128 MB; the 250k-tri bench pack is 21 MB) the kernel keeps
# it resident across the entire grid and reads each visit's slab with a
# plain dynamic index — no per-visit DMAs, no semaphores, no double
# buffering.  Measured: a dynamic (16, 128) VMEM slab read is ~20 ns vs the
# DMA path's ~2.8 us/group fixed cost, which made the DMA kernel ~10 s of
# the round-3 frame (invisible to the xplane op trace — tools/kernel_probe).
_VMEM_PACK_BUDGET = 64 * 1024 * 1024   # pack bytes; beyond this, DMA path
# visits per early-exit check in the VMEM kernel: measured flat across
# {4, 8, 16} on the captured wavefronts (24.7/24.3/24.6 ms — the while
# machinery is amortized by 4 already); 8 balances exit granularity
# (up to G-1 visits of overshoot per block) against iteration overhead
_VMEM_GROUP = 8


def _make_kernel_vmem(block_n: int, K: int, cpad: int, mode: str):
    inf = _INF_PY
    G = _VMEM_GROUP

    def kernel(cnt_ref, rays_ref, order_hbm, entry_hbm, tris_vmem,
               t_ref, idx_ref, idx_sm, ent_sm, need_sm, lsems):
        b = pl.program_id(0)
        n = cnt_ref[b]
        ng = pl.cdiv(n, G)
        ld_i = pltpu.make_async_copy(order_hbm.at[b], idx_sm, lsems.at[0])
        ld_e = pltpu.make_async_copy(entry_hbm.at[b], ent_sm, lsems.at[1])

        @pl.when(n > 0)
        def _():
            ld_i.start()
            ld_e.start()

        t_ref[0] = jnp.full((block_n, 1), inf, jnp.float32)
        idx_ref[0] = jnp.zeros((block_n, 1), jnp.int32)
        r = rays_ref[0]                          # (BN, 8)
        ox, oy, oz = r[:, 0:1], r[:, 1:2], r[:, 2:3]
        dx, dy, dz = r[:, 3:4], r[:, 4:5], r[:, 5:6]
        tmax = r[:, 6:7]
        need_sm[0, 0] = jnp.max(tmax)

        @pl.when(n > 0)
        def _():
            ld_i.wait()
            ld_e.wait()

        bn4 = block_n // 4
        lane_q = jax.lax.broadcasted_iota(jnp.int32, (bn4, K), 1)

        # early-TERMINATING walk: lists are front-to-back, so the first
        # group whose entry distance exceeds every lane's need ends the
        # block — a while_loop, not a fori_loop over the whole list (60-75%
        # of list entries at secondary levels lie past the exit point and a
        # dead fori iteration still pays its scalar check, PERF_r04).  The
        # loop condition reads only CARRIED values (the tunnel once hung on
        # a while-cond reading DMA'd SMEM — .claude/skills/verify).
        def cond(state):
            jg, stop = state
            return (jg < ng) & (stop == 0)

        def body(state):
            jg, _ = state
            # a group runs only while its first (= nearest) entry distance
            # can still beat some lane's need
            go = ent_sm[0, jnp.minimum(jg * G, cpad - 1)] <= need_sm[0, 0]

            @pl.when(go)
            def _():
                for g in range(G):
                    item = jg * G + g
                    desc = idx_sm[0, jnp.minimum(item, cpad - 1)]
                    cid = desc & 0xFFFF
                    qm = desc >> 16
                    trs = tris_vmem[cid]          # (16, K) VMEM read
                    n0, n1, n2, an = trs[0:1], trs[1:2], trs[2:3], trs[3:4]
                    g10, g11, g12 = trs[4:5], trs[5:6], trs[6:7]
                    c1 = trs[7:8]
                    g20, g21, g22 = trs[8:9], trs[9:10], trs[10:11]
                    c2 = trs[11:12]

                    # quad-gated: intersect only the 32-ray sub-blocks
                    # whose interval test listed this cluster (~1.6 of 4
                    # at secondary levels) — scalar-branch gating costs
                    # ~10 ns vs ~60 ns per skipped quad intersection
                    for q in range(4):
                        @pl.when((((qm >> q) & 1) == 1) & (item < n))
                        def _(q=q, cid=cid, n0=n0, n1=n1, n2=n2, an=an,
                              g10=g10, g11=g11, g12=g12, c1=c1, g20=g20,
                              g21=g21, g22=g22, c2=c2):
                            r0, r1 = q * bn4, (q + 1) * bn4
                            dxq, dyq, dzq = dx[r0:r1], dy[r0:r1], dz[r0:r1]
                            oxq, oyq, ozq = ox[r0:r1], oy[r0:r1], oz[r0:r1]
                            tmq = tmax[r0:r1]
                            d_n = dxq * n0 + dyq * n1 + dzq * n2  # (bn4, K)
                            o_n = oxq * n0 + oyq * n1 + ozq * n2
                            den = jnp.abs(d_n) > jnp.float32(1e-30)
                            t = (an - o_n) / jnp.where(den, d_n, 1.0)
                            px = oxq + t * dxq
                            py = oyq + t * dyq
                            pz = ozq + t * dzq
                            u = px * g10 + py * g11 + pz * g12 + c1
                            v = px * g20 + py * g21 + pz * g22 + c2
                            hit = (den & (t >= 0.0) & (u >= 0.0)
                                   & (v >= 0.0) & (u + v <= 1.0)
                                   & (t <= tmq))
                            t_m = jnp.where(hit, t, inf)
                            tile_min = jnp.min(t_m, axis=1, keepdims=True)
                            within = jnp.min(
                                jnp.where(t_m == tile_min, lane_q, K),
                                axis=1, keepdims=True)
                            gidx = cid * K + jnp.minimum(within, K - 1)
                            cur = t_ref[0, r0:r1]
                            if mode == "any":
                                better = (tile_min < inf) & (cur >= inf)
                            else:
                                better = tile_min < cur
                            t_ref[0, r0:r1] = jnp.where(better, tile_min,
                                                        cur)
                            idx_ref[0, r0:r1] = jnp.where(
                                better, gidx, idx_ref[0, r0:r1])
                cur = t_ref[0]
                if mode == "any":
                    need_sm[0, 0] = jnp.max(
                        jnp.where(cur < inf, jnp.float32(-_INF_PY), tmax))
                else:
                    need_sm[0, 0] = jnp.max(jnp.minimum(cur, tmax))

            return (jg + 1, 1 - go.astype(jnp.int32))

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call_vmem(nb: int, block_n: int, C: int, K: int, cpad: int,
                     mode: str, interpret: bool = False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, block_n, 8), lambda b, c: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # order (NB, 1, cpad)
            pl.BlockSpec(memory_space=pl.ANY),   # entry (NB, 1, cpad)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tris resident (C,16,K)
        ],
        out_specs=[
            pl.BlockSpec((1, block_n, 1), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((1, block_n, 1), lambda b, c: (b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.SMEM((1, cpad), jnp.int32),
            pltpu.SMEM((1, cpad), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    pack_bytes = C * 16 * K * 4
    return pl.pallas_call(
        _make_kernel_vmem(block_n, K, cpad, mode),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, block_n, 1), jnp.float32),
            jax.ShapeDtypeStruct((nb, block_n, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=pack_bytes + 8 * 1024 * 1024),
        interpret=interpret,
    )


def _make_kernel(block_n: int, K: int, cpad: int, mode: str):
    inf = _INF_PY  # python float: jnp module constants would be captured
    SLOTS = _SLAB_SLOTS
    PREFETCH = _SLAB_PREFETCH

    G = _GROUP

    def kernel(cnt_ref, rays_ref, order_hbm, entry_hbm, tris_hbm,
               t_ref, idx_ref, idx_sm, ent_sm, need_sm, slab, sems, lsems):
        b = pl.program_id(0)
        n = cnt_ref[b]
        ng = pl.cdiv(n, G)                       # visit groups
        ld_i = pltpu.make_async_copy(order_hbm.at[b], idx_sm, lsems.at[0])
        ld_e = pltpu.make_async_copy(entry_hbm.at[b], ent_sm, lsems.at[1])

        @pl.when(n > 0)
        def _():
            ld_i.start()
            ld_e.start()

        t_ref[0] = jnp.full((block_n, 1), inf, jnp.float32)
        idx_ref[0] = jnp.zeros((block_n, 1), jnp.int32)
        r = rays_ref[0]                          # (BN, 8)
        ox, oy, oz = r[:, 0:1], r[:, 1:2], r[:, 2:3]
        dx, dy, dz = r[:, 3:4], r[:, 4:5], r[:, 5:6]
        tmax = r[:, 6:7]
        # before any visit every lane still wants up to its t_max
        need_sm[0, 0] = jnp.max(tmax)

        def item_cid(j):
            # descriptor low bits = cluster id (high bits: quad mask, used
            # only by the VMEM kernel's gated visits)
            return idx_sm[0, jnp.minimum(j, cpad - 1)] & 0xFFFF

        def group_dma(slot, jg, g):
            # one (16, K) cluster slab into lane window g of the slot
            return pltpu.make_async_copy(
                tris_hbm.at[item_cid(jg * G + g)],
                slab.at[slot, :, pl.ds(g * K, K)],
                sems.at[slot, g])

        def start_group(slot, jg):
            for g in range(G):
                @pl.when(jg * G + g < n)
                def _(g=g):
                    group_dma(slot, jg, g).start()

        def wait_group(slot, jg):
            for g in range(G):
                @pl.when(jg * G + g < n)
                def _(g=g):
                    group_dma(slot, jg, g).wait()

        @pl.when(n > 0)
        def _():
            ld_i.wait()
            ld_e.wait()
            for w in range(PREFETCH):
                @pl.when(w < ng)
                def _(w=w):
                    start_group(w % SLOTS, w)

        lane = jax.lax.broadcasted_iota(jnp.int32, (block_n, G * K), 1)
        gband = lane // K                        # which group element

        def body(jg, jp):
            # jp = groups processed so far; the walk is "done" once jp < jg.
            # A group runs only while its first (= nearest, lists are
            # front-to-back) entry distance can still beat some lane's
            # need; skipped groups' in-flight DMAs drain after the loop.
            go = (jg == jp) & (ent_sm[0, jnp.minimum(jg * G, cpad - 1)]
                               <= need_sm[0, 0])

            @pl.when(go)
            def _():
                @pl.when(jg + PREFETCH < ng)
                def _():
                    start_group((jg + PREFETCH) % SLOTS, jg + PREFETCH)

                wait_group(jg % SLOTS, jg)
                trs = slab[jg % SLOTS]           # (16, G*K)
                n0, n1, n2, an = trs[0:1], trs[1:2], trs[2:3], trs[3:4]
                g10, g11, g12 = trs[4:5], trs[5:6], trs[6:7]
                c1 = trs[7:8]
                g20, g21, g22 = trs[8:9], trs[9:10], trs[10:11]
                c2 = trs[11:12]

                d_n = dx * n0 + dy * n1 + dz * n2        # (BN, G*K)
                o_n = ox * n0 + oy * n1 + oz * n2
                denom_ok = jnp.abs(d_n) > jnp.float32(1e-30)
                t = (an - o_n) / jnp.where(denom_ok, d_n, 1.0)
                px, py, pz = ox + t * dx, oy + t * dy, oz + t * dz
                u = px * g10 + py * g11 + pz * g12 + c1
                v = px * g20 + py * g21 + pz * g22 + c2
                # stale lane windows (item beyond n, or a slot reused from
                # an earlier group with no fresh DMA) must not hit
                valid = (jg * G + gband) < n
                hit = (denom_ok & (t >= 0.0) & (u >= 0.0) & (v >= 0.0)
                       & (u + v <= 1.0) & (t <= tmax) & valid)
                t_m = jnp.where(hit, t, inf)
                tile_min = jnp.min(t_m, axis=1, keepdims=True)   # (BN, 1)
                within = jnp.min(jnp.where(t_m == tile_min, lane, G * K),
                                 axis=1, keepdims=True)
                # global tri id of the winner: cid of its group element
                cid_w = jnp.int32(0)
                for g in range(G):
                    cid_w = jnp.where(within // K == g, item_cid(jg * G + g),
                                      cid_w)
                gidx = cid_w * K + (within % K)
                cur = t_ref[0]
                if mode == "any":
                    # first confirmed hit freezes the lane (the reference's
                    # stop_on_first_hit, src/raytracing.rs:483-487)
                    better = (tile_min < inf) & (cur >= inf)
                else:
                    better = tile_min < cur
                newt = jnp.where(better, tile_min, cur)
                t_ref[0] = newt
                idx_ref[0] = jnp.where(better, gidx, idx_ref[0])
                if mode == "any":
                    need_sm[0, 0] = jnp.max(
                        jnp.where(newt < inf, jnp.float32(-_INF_PY), tmax))
                else:
                    need_sm[0, 0] = jnp.max(jnp.minimum(newt, tmax))

            return jp + go.astype(jnp.int32)

        jp = jax.lax.fori_loop(0, ng, body, jnp.int32(0))
        # drain: groups [jp, min(jp + PREFETCH, ng)) are still in flight
        # (warmed up or prefetched by processed groups, never waited)
        for k in range(PREFETCH):
            @pl.when(jp + k < jnp.minimum(jp + PREFETCH, ng))
            def _(k=k):
                wait_group((jp + k) % SLOTS, jp + k)

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(nb: int, block_n: int, C: int, K: int, cpad: int,
                mode: str, interpret: bool = False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, block_n, 8), lambda b, c: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # order (NB, 1, cpad)
            pl.BlockSpec(memory_space=pl.ANY),   # entry (NB, 1, cpad)
            pl.BlockSpec(memory_space=pl.ANY),   # tris  (C, 16, K)
        ],
        out_specs=[
            pl.BlockSpec((1, block_n, 1), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((1, block_n, 1), lambda b, c: (b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.SMEM((1, cpad), jnp.int32),
            pltpu.SMEM((1, cpad), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.VMEM((_SLAB_SLOTS, 16, _GROUP * K), jnp.float32),
            pltpu.SemaphoreType.DMA((_SLAB_SLOTS, _GROUP)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _make_kernel(block_n, K, cpad, mode),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, block_n, 1), jnp.float32),
            jax.ShapeDtypeStruct((nb, block_n, 1), jnp.int32),
        ],
        interpret=interpret,
    )


def trace_tris_blocks(o, d, alive, t_max, prep: TrianglePrep, w_lo, w_hi,
                      cl_ok, cluster_size: int, block_n: int = 512,
                      mode: str = "closest", interpret: bool = False):
    """Closest (or any) mesh hit over the clustered pool.

    o, d: (N, 3) world rays (d normalized, callers pre-sort by
    :func:`coherence_key` for performance — never required for
    correctness).  ``t_max`` (N,) caps accepted hits (shadow rays pass the
    light distance); None means unbounded.  ``alive`` masks lanes whose
    result is unused.  Returns (found (N,) bool, best_tri (N,) int32,
    best_t (N,) f32 — INF on miss).  Selection-only (best_t is
    stop-gradient'ed); callers route gradients through
    ops/traverse.selected_t, whose backward recomputes t analytically.
    """
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    prep = jax.tree_util.tree_map(jax.lax.stop_gradient, prep)
    w_lo = jax.lax.stop_gradient(w_lo)
    w_hi = jax.lax.stop_gradient(w_hi)

    K = cluster_size
    C = w_lo.shape[0]
    if C > 65536:
        raise ValueError("cluster pool exceeds the 16-bit descriptor "
                         "packing (>8.4M triangles); split the pool")
    if block_n % 4:
        raise ValueError("block_n must be a multiple of 4 (quad gating)")
    cpad = -(-C // 128) * 128
    n = o.shape[0]
    nb = -(-n // block_n)
    pad = nb * block_n - n
    if alive is None:
        alive = jnp.ones((n,), bool)
    if t_max is None:
        t_max = jnp.full((n,), INF)
    t_max = jax.lax.stop_gradient(t_max)
    # dead lanes: t_max = -1 vetoes any hit (t >= 0 always); the sentinel
    # origin keeps them out of the prologue's interval bounds
    o = jnp.where(alive[:, None], o, DEAD_ORIGIN)
    d = jnp.where(alive[:, None], d, 1.0)
    t_max = jnp.where(alive, t_max, -1.0)
    if pad:
        o = jnp.concatenate([o, jnp.full((pad, 3), DEAD_ORIGIN, o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -1.0, t_max.dtype)])
        alive = jnp.concatenate([alive, jnp.zeros((pad,), bool)])

    order, entry, count = _block_lists(o, d, alive, t_max, w_lo, w_hi,
                                       cl_ok, nb, block_n, cpad)
    if os.environ.get("RUSTRAY_TRACE_STATS"):
        # dev instrumentation: visit-list population per trace call (upper
        # bound on kernel visits; the early exit only shrinks it).  CPU
        # backend only — the axon TPU plugin does not support host
        # callbacks (UNIMPLEMENTED at run time).
        jax.debug.callback(
            lambda s, mx, a: _TRACE_STATS.append(
                (mode, int(nb), int(s), int(mx), float(a))),
            jnp.sum(count), jnp.max(count), jnp.mean(count.astype(jnp.float32)),
            ordered=False)

    rays = jnp.concatenate([o, d, t_max[:, None]], axis=1)     # (Np, 7)
    rays = jnp.pad(rays, ((0, 0), (0, 1))).reshape(nb, block_n, 8)
    pack = prep.pallas_pack
    if pack is None:
        raise ValueError(
            "trace_tris_blocks requires prep.pallas_pack — build it with "
            "pack_cluster_tris (wavefront._prepare does this when the "
            "pallas path is enabled)")

    pack_rows = pack.shape[0]
    if pack_rows * 16 * K * 4 <= _VMEM_PACK_BUDGET:
        call = _build_call_vmem(nb, block_n, pack_rows, K, cpad, mode,
                                interpret)
    else:
        call = _build_call(nb, block_n, C, K, cpad, mode, interpret)
    t_out, idx_out = call(count, rays, order, entry, pack)
    t = t_out.reshape(-1)[:n]
    idx = idx_out.reshape(-1)[:n]
    return t < INF, idx, t
