"""Octet round-trace — the round-5 production traversal path.

TPU-native replacement for the per-128-ray-block cluster walk
(ops/block_trace) on the same contract.  Design chosen from measured
constants on real wavefronts (tools/octet_lab.py, tools/octet_kernel_bench.py,
tmp kernel dissections, all on the tunneled v5e):

- a 128-ray block at secondary levels lists ~600 cluster visits of which
  any given ray exactly needs ~3.5; with a per-ray-need walk the whole
  chunk-sample's traversal is ~43K (octet, cluster) intersections vs ~240K
  full-block visits (<1% lane utilization);
- an UNROLLED dynamic slab read + (8 rays x 128 tris) intersect costs
  ~29 ns, but any in-kernel serial control is death: a fori/while
  iteration costs ~430 ns, a vector->SMEM->scalar round trip ~264 ns and a
  ``pl.when`` branch ~70 ns — so selection must happen OUTSIDE the kernel,
  and the kernel must be a branch-free unrolled stream processor;
- XLA cannot compact either (jnp.nonzero ~95 ms, lax.sort ~25 ms, top_k
  ~6 ms at (4096, 2593)) — but REGULAR argmin/mask passes over a
  materialized per-octet entry matrix cost ~0.1 ms each.

Pipeline per trace call (rays pre-sorted by coherence_key, dead last):

1.  XLA: exact per-ray slab entries vs every cluster AABB, folded to a
    per-octet (N/8, C) entry matrix ``e`` (min over the 8 rays; INF when
    no ray enters before its t_max) — replaces the reference's per-ray
    BVH walk (src/raytracing.rs:429-490) with one dense vectorized pass.
2.  Round 0: per-octet argmin of ``e`` = the nearest cluster; a Pallas
    stream kernel intersects each octet against it (slot stream, no
    branches — empty slots intersect a guaranteed-miss dummy cluster).
3.  XLA: per-ray need = min(best_t, t_max) (any-hit mode: -INF once
    occluded), maxed over each octet; clusters with entry > need can be
    discarded EXACTLY (entry lower-bounds any contained hit t — the same
    argument as the reference's sorted-candidate early exit,
    src/raytracing.rs:466-489).  Round 1 extracts up to 4 more clusters
    per octet from the filtered matrix and runs the stream kernel again.
4.  Octets still unfinished after round 1 (>4 filtered clusters remain —
    rare) fall back to the always-complete block walk for exactly those
    rays, under a lax.cond so the cost is paid only when triggered.
    Exactness is never lost, only speed.

Ties: rounds extract clusters in (entry, cluster-id) order and the lowest
lane wins within a slab, so equal-t winners resolve to the lowest global
triangle index — the dense scan's tie rule.  The rare fallback-merge keeps
the round result on exact-t ties (measure-zero, like the block walk's
cluster-order tie, documented there).

Selection only: inputs are stop-gradient'ed; callers route gradients
through ops/traverse.selected_t.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import INF

_INF_PY = 3.0e38
_BIG = 3.0e37
_SLICE = 32768         # rays per independent pipeline slice
_R1_SLOTS = 4          # clusters per octet in round 1


# --------------------------------------------------------------------------
# XLA prologue: exact per-octet entry matrix
# --------------------------------------------------------------------------

def octet_entries(o, d, tmax, w_lo, w_hi, cl_ok, c_chunk: int = 512):
    """(N/8, C) f32: min over each octet's rays of the exact slab entry
    distance into cluster c (INF when no ray enters before its t_max).

    o/d are dead-masked (DEAD_ORIGIN / t_max=-1).  Chunked over clusters
    so XLA fuses the per-ray reductions without giant intermediates."""
    n = o.shape[0]
    no = n // 8
    eps = jnp.float32(1e-30)
    sd = jnp.where(jnp.abs(d) > eps, d, jnp.where(d >= 0, eps, -eps))
    inv = 1.0 / sd
    oinv = o * inv
    C = w_lo.shape[0]
    outs = []
    for c0 in range(0, C, c_chunk):
        c1 = min(c0 + c_chunk, C)
        # per-axis accumulation in rank-2: XLA materializes rank-3
        # (N, cc, 3) broadcasts poorly (measured 4x slower)
        tn = None
        tf = None
        for a in range(3):
            t0 = w_lo[None, c0:c1, a] * inv[:, a:a + 1] - oinv[:, a:a + 1]
            t1 = w_hi[None, c0:c1, a] * inv[:, a:a + 1] - oinv[:, a:a + 1]
            lo_a = jnp.minimum(t0, t1)
            hi_a = jnp.maximum(t0, t1)
            tn = lo_a if tn is None else jnp.maximum(tn, lo_a)
            tf = hi_a if tf is None else jnp.minimum(tf, hi_a)
        entry = jnp.maximum(tn, 0.0)
        ok = (tf >= entry) & (entry <= tmax[:, None]) & cl_ok[None, c0:c1]
        e = jnp.where(ok, entry, jnp.float32(_INF_PY))
        outs.append(jnp.min(e.reshape(no, 8, c1 - c0), axis=1))
    return jnp.concatenate(outs, axis=1)                      # (N/8, C)


# --------------------------------------------------------------------------
# Stream kernel: branch-free (octet, cluster)-slot intersector
# --------------------------------------------------------------------------

def _make_kernel(slots: int, K: int, n_rows: int):
    """Per grid step: one (1, 128) descriptor row = 128/slots octets x
    ``slots`` cluster ids each.  Unrolled: per octet read its 8 rays, per
    slot read the cluster slab and intersect (8, K); fold slot winners in
    registers; write the octet's (8, 1) best rows.  No branches — empty
    slots carry a dummy all-zero cluster (guaranteed miss)."""
    inf = _INF_PY
    opr = 128 // slots                # octets per grid step

    def kernel(flags_ref, rays_ref, desc_hbm, tris_ref, t_ref, idx_ref,
               desc_sm, sems):
        s = pl.program_id(0)
        slot = jax.lax.rem(s, 2)
        nxt = jax.lax.rem(s + 1, 2)
        n_steps = pl.num_programs(0)

        def dma(which, step):
            return pltpu.make_async_copy(desc_hbm.at[step],
                                         desc_sm.at[which],
                                         sems.at[which])

        @pl.when(s == 0)
        def _():
            t_ref[...] = jnp.full(t_ref.shape, inf, jnp.float32)
            idx_ref[...] = jnp.zeros(idx_ref.shape, jnp.int32)
            dma(0, 0).start()

        @pl.when(s + 1 < n_steps)
        def _():
            dma(nxt, s + 1).start()

        dma(slot, s).wait()

        @pl.when(flags_ref[s] > 0)
        def _():
            lane_k = jax.lax.broadcasted_iota(jnp.int32, (8, K), 1)
            for j in range(opr):
                oct_ = s * opr + j
                r8 = rays_ref[pl.ds(oct_ * 8, 8), :]          # (8, 8)
                ox, oy, oz = r8[:, 0:1], r8[:, 1:2], r8[:, 2:3]
                dx, dy, dz = r8[:, 3:4], r8[:, 4:5], r8[:, 5:6]
                tmax = r8[:, 6:7]
                bt = jnp.full((8, 1), inf, jnp.float32)
                bi = jnp.zeros((8, 1), jnp.int32)
                for k in range(slots):
                    c = desc_sm[slot, j * slots + k]
                    trs = tris_ref[c]                         # (16, K)
                    n0, n1, n2 = trs[0:1], trs[1:2], trs[2:3]
                    an, c1, c2 = trs[3:4], trs[7:8], trs[11:12]
                    g10, g11, g12 = trs[4:5], trs[5:6], trs[6:7]
                    g20, g21, g22 = trs[8:9], trs[9:10], trs[10:11]
                    d_n = dx * n0 + dy * n1 + dz * n2         # (8, K)
                    o_n = ox * n0 + oy * n1 + oz * n2
                    den = jnp.abs(d_n) > jnp.float32(1e-30)
                    t = (an - o_n) / jnp.where(den, d_n, 1.0)
                    px, py, pz = ox + t * dx, oy + t * dy, oz + t * dz
                    u = px * g10 + py * g11 + pz * g12 + c1
                    v = px * g20 + py * g21 + pz * g22 + c2
                    hit = (den & (t >= 0.0) & (u >= 0.0) & (v >= 0.0)
                           & (u + v <= 1.0) & (t <= tmax))
                    t_m = jnp.where(hit, t, inf)
                    tmin = jnp.min(t_m, axis=1, keepdims=True)
                    within = jnp.min(jnp.where(t_m == tmin, lane_k, K),
                                     axis=1, keepdims=True)
                    gidx = c * K + jnp.minimum(within, K - 1)
                    better = tmin < bt
                    bt = jnp.where(better, tmin, bt)
                    bi = jnp.where(better, gidx, bi)
                t_ref[pl.ds(oct_ * 8, 8), :] = bt
                idx_ref[pl.ds(oct_ * 8, 8), :] = bi

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(n_steps: int, n_rows: int, C: int, K: int, slots: int,
                interpret: bool = False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                   # per-step activity flags
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rays (n_rows, 8)
            pl.BlockSpec(memory_space=pl.ANY),       # desc (n_steps, 128)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tris (C, 16, K)
        ],
        out_specs=[
            pl.BlockSpec((n_rows, 1), lambda s, f: (0, 0)),
            pl.BlockSpec((n_rows, 1), lambda s, f: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.SMEM((2, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _make_kernel(slots, K, n_rows),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=C * 16 * K * 4 + 48 * 1024 * 1024),
        interpret=interpret,
    )


def _run_round(rays, pack, desc, slots, K, dummy, interpret):
    """desc (No, slots) int32 cluster ids (dummy = miss) -> per-ray
    (t (n,), idx (n,)) for this round's slots."""
    no = desc.shape[0]
    n = no * 8
    flat = desc.reshape(no * slots)
    steps = -(-no * slots // 128)
    flat = jnp.pad(flat, (0, steps * 128 - no * slots),
                   constant_values=dummy)
    desc_rows = flat.reshape(steps, 128)
    flags = jnp.any(desc_rows != dummy, axis=1).astype(jnp.int32)
    # the kernel derives octet ids from slot position, so the padded tail
    # of the last step addresses octets past `no` — give them real (dead)
    # ray rows to read and output rows to clobber
    n_rows = steps * (128 // slots) * 8
    if n_rows > n:
        rays = jnp.pad(rays, ((0, n_rows - n), (0, 0)))
    call = _build_call(steps, n_rows, pack.shape[0], K, slots, interpret)
    t_out, i_out = call(flags, rays, desc_rows, pack)
    return t_out[:n, 0], i_out[:n, 0]


# --------------------------------------------------------------------------
# Entry point
# --------------------------------------------------------------------------

def _trace_slice(o, d, alive, t_max, prep, w_lo, w_hi, cl_ok, K, mode,
                 block_n, interpret):
    from .block_trace import trace_tris_blocks

    n = o.shape[0]
    no = n // 8
    pack = prep.pallas_pack
    C = w_lo.shape[0]
    # the pack's last row is a guaranteed all-zero padding row
    # (pack_cluster_tris always appends one) and is never a real cluster
    # id, so empty slots both miss and never collide with live ones
    dummy = pack.shape[0] - 1
    lane = jnp.arange(C, dtype=jnp.int32)[None]

    e = octet_entries(o, d, t_max, w_lo, w_hi, cl_ok)         # (No, C)
    rays = jnp.pad(jnp.concatenate([o, d, t_max[:, None]], axis=1),
                   ((0, 0), (0, 1)))                          # (n, 8)

    # ---- round 0: nearest cluster per octet ----
    m0 = jnp.min(e, axis=1)
    c0 = jnp.argmin(e, axis=1).astype(jnp.int32)
    desc0 = jnp.where(m0 < INF, c0, dummy)[:, None]           # (No, 1)
    t, idx = _run_round(rays, pack, desc0, 1, K, dummy, interpret)

    # ---- need filter (exact: entry lower-bounds any hit t in a cluster;
    # margin covers f32 disagreement between entry and hit t) ----
    if mode == "any":
        need_r = jnp.where(t < INF, jnp.float32(-_BIG), t_max)
    else:
        need_r = jnp.minimum(t, t_max)
    need_o = jnp.max(need_r.reshape(no, 8), axis=1)
    need_o = need_o * 1.0001 + 1e-3
    e = jnp.where(lane == c0[:, None], jnp.float32(_INF_PY), e)
    e = jnp.where(e <= need_o[:, None], e, jnp.float32(_INF_PY))
    remaining = jnp.sum(e < INF, axis=1)

    # ---- round 1: up to _R1_SLOTS more clusters per octet ----
    descs = []
    for _ in range(_R1_SLOTS):
        mk = jnp.min(e, axis=1)
        ck = jnp.argmin(e, axis=1).astype(jnp.int32)
        descs.append(jnp.where(mk < INF, ck, dummy))
        e = jnp.where(lane == ck[:, None], jnp.float32(_INF_PY), e)
    desc1 = jnp.stack(descs, axis=1)                          # (No, 4)
    t1, i1 = _run_round(rays, pack, desc1, _R1_SLOTS, K, dummy, interpret)
    better = t1 < t
    t = jnp.where(better, t1, t)
    idx = jnp.where(better, i1, idx)

    # ---- fallback: octets with >_R1_SLOTS filtered clusters remaining
    # re-trace through the always-complete block walk (rare; exactness
    # is preserved no matter how deep the filtered lists run) ----
    over_o = remaining > _R1_SLOTS
    over_r = jnp.repeat(over_o, 8) & alive

    def fb():
        return trace_tris_blocks(o, d, over_r, t_max, prep, w_lo, w_hi,
                                 cl_ok, K, block_n=block_n, mode=mode,
                                 interpret=interpret)

    def no_fb():
        return (jnp.zeros((n,), bool), jnp.zeros((n,), jnp.int32),
                jnp.full((n,), INF))

    fb_f, fb_i, fb_t = jax.lax.cond(jnp.any(over_r), fb, no_fb)
    better = fb_t < t
    t = jnp.where(better, fb_t, t)
    idx = jnp.where(better, fb_i, idx)
    return t < INF, idx, t


def trace_tris_octets(o, d, alive, t_max, prep, w_lo, w_hi, cl_ok,
                      cluster_size: int, mode: str = "closest",
                      block_n: int = 128, interpret: bool = False):
    """Closest (or any) mesh hit over the clustered pool via octet rounds.

    Same contract as block_trace.trace_tris_blocks: o, d (N, 3) world rays
    (callers pre-sort by coherence_key — performance only, never
    correctness), ``t_max`` (N,) caps accepted hits (exit caps / shadow
    light distance), ``alive`` masks unused lanes.  Returns (found (N,)
    bool, best_tri (N,) int32, best_t (N,) f32).

    mode="any" returns the closest hit — a deterministic valid witness for
    the reference's stop_on_first_hit occlusion (src/raytracing.rs:483-487)
    — and uses occlusion to collapse the round-1 need filter.
    """
    from .block_trace import DEAD_ORIGIN

    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    prep = jax.tree_util.tree_map(jax.lax.stop_gradient, prep)
    w_lo = jax.lax.stop_gradient(w_lo)
    w_hi = jax.lax.stop_gradient(w_hi)
    if prep.pallas_pack is None:
        raise ValueError("trace_tris_octets requires prep.pallas_pack")

    n = o.shape[0]
    if alive is None:
        alive = jnp.ones((n,), bool)
    if t_max is None:
        t_max = jnp.full((n,), INF)
    t_max = jax.lax.stop_gradient(t_max)
    o = jnp.where(alive[:, None], o, DEAD_ORIGIN)
    d = jnp.where(alive[:, None], d, 1.0)
    t_max = jnp.where(alive, t_max, -1.0)

    sl = min(_SLICE, -(-n // 8) * 8)
    pad = -(-n // sl) * sl - n
    if pad:
        o = jnp.concatenate([o, jnp.full((pad, 3), DEAD_ORIGIN, o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -1.0,
                                                 t_max.dtype)])
        alive = jnp.concatenate([alive, jnp.zeros((pad,), bool)])

    founds, idxs, ts = [], [], []
    for s0 in range(0, n + pad, sl):
        s1 = s0 + sl
        a_sl = alive[s0:s1]
        f, i, t = jax.lax.cond(
            jnp.any(a_sl),
            lambda s0=s0, s1=s1, a_sl=a_sl: _trace_slice(
                o[s0:s1], d[s0:s1], a_sl, t_max[s0:s1], prep, w_lo, w_hi,
                cl_ok, cluster_size, mode, block_n, interpret),
            lambda: (jnp.zeros((sl,), bool), jnp.zeros((sl,), jnp.int32),
                     jnp.full((sl,), INF)))
        founds.append(f)
        idxs.append(i)
        ts.append(t)
    return (jnp.concatenate(founds)[:n], jnp.concatenate(idxs)[:n],
            jnp.concatenate(ts)[:n])
