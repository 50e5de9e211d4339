"""Per-octet Pallas traversal — the round-5 production trace kernel.

TPU-native replacement for the per-128-ray-block cluster walk
(ops/block_trace) on the same contract, designed from measured list
statistics on real wavefronts (tools/octet_lab.py over captures from
tools/capture_waves.py):

- a 128-ray block at secondary levels lists ~600 cluster visits of which
  any given ray needs ~3.5 (exact slab test) — the block walk's
  (128 x 128) visits run at <1% lane utilization;
- folding exact per-ray tests to *octets* (8 consecutive coherence-sorted
  rays = one VPU sublane group) and walking clusters front-to-back with a
  per-octet early exit needs only ~43K (octet, cluster) intersections per
  bench chunk-sample versus ~240K 128-lane block visits.

The whole traversal is ONE kernel (XLA-side pair extraction was measured
at 5-95 ms per call — jnp.nonzero / lax.sort / cumsum are all pathological
at (4096, 2593) on TPU, so no stream is ever materialized):

grid = one step per octet (live octets are a prefix after the caller's
coherence sort; trailing steps skip).  Per octet:

1.  slab-test its 8 rays against ALL cluster AABBs, held in VMEM as an
    (8, C) table — a ~0.2 us fully-vectorized pass replacing the block
    path's conservative interval prologue with the exact test;
2.  fold to a per-octet entry vector e (1, C) = min over the 8 rays of
    each cluster's entry distance (INF when no ray enters);
3.  iterative argmin walk: repeatedly extract the nearest un-visited
    cluster (vector argmin -> SMEM scalar round trip), intersect the
    octet against its VMEM-resident (16, K) Baldwin-Weber slab, fold
    winners into (8, 1) accumulators, and mask the cluster out of e.
    The walk TERMINATES when the nearest remaining entry exceeds every
    ray's need (min(best_t, t_max); for any-hit mode an occluded ray's
    need collapses to -INF) — entry lower-bounds any hit t inside a
    cluster, so stopping is exact, the same argument as the reference's
    sorted-candidate early-exit (src/raytracing.rs:466-489).

Ties: equal-entry clusters extract lowest-id first and the lowest lane
wins within a slab, so the lowest global triangle index wins — the dense
scan's exact tie rule (better parity than the block walk).

Selection only (like the block kernel): stop-gradient inputs; callers
route gradients through ops/traverse.selected_t.
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


def build_cluster_aabb_table(w_lo, w_hi, cl_ok):
    """(8, C_pad) f32 cluster-AABB table for the kernel: rows 0-2 lo xyz,
    rows 3-5 hi xyz, rows 6-7 zero.  Disabled/padding clusters become
    empty boxes (lo=+BIG, hi=-BIG) that fail every slab test."""
    C = w_lo.shape[0]
    cpad = -(-C // 128) * 128
    lo = jnp.where(cl_ok[:, None], w_lo, jnp.float32(_BIG))
    hi = jnp.where(cl_ok[:, None], w_hi, jnp.float32(-_BIG))
    tab = jnp.concatenate([lo.T, hi.T, jnp.zeros((2, C))], axis=0)
    return jnp.pad(tab, ((0, 0), (0, cpad - C)),
                   constant_values=_BIG)[:, :cpad].at[3:6, C:].set(-_BIG)


def _make_kernel(cpad: int, K: int, mode: str):
    inf = _INF_PY

    def kernel(nlive_ref, rays_ref, aabb_ref, tris_ref, t_ref, idx_ref,
               e_ref, bt_ref, bi_ref, c_sm, go_sm):
        r = pl.program_id(0)

        @pl.when(r == 0)
        def _():
            t_ref[...] = jnp.full(t_ref.shape, inf, jnp.float32)
            idx_ref[...] = jnp.zeros(idx_ref.shape, jnp.int32)

        @pl.when(r < nlive_ref[0])
        def _():
            r8 = rays_ref[pl.ds(r * 8, 8), :]                 # (8, 8)
            o3 = r8[:, 0:3]
            d3 = r8[:, 3:6]
            tmax = r8[:, 6:7]                                 # (8, 1)

            # ---- exact slab test of 8 rays vs all clusters ----
            eps = jnp.float32(1e-30)
            sd = jnp.where(jnp.abs(d3) > eps, d3,
                           jnp.where(d3 >= 0, eps, -eps))
            inv = 1.0 / sd                                    # (8, 3)
            oinv = o3 * inv
            tn = jnp.full((8, cpad), jnp.float32(-_BIG))
            tf = jnp.full((8, cpad), jnp.float32(_BIG))
            for a in range(3):
                la = aabb_ref[a:a + 1, :]                     # (1, cpad)
                ha = aabb_ref[3 + a:4 + a, :]
                ia = inv[:, a:a + 1]                          # (8, 1)
                oa = oinv[:, a:a + 1]
                t0 = la * ia - oa                             # (8, cpad)
                t1 = ha * ia - oa
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
            entry = jnp.maximum(tn, 0.0)
            ok = (tf >= entry) & (entry <= tmax)
            e_ref[...] = jnp.min(jnp.where(ok, entry, inf), axis=0,
                                 keepdims=True)               # (1, cpad)

            bt_ref[...] = jnp.full((8, 1), inf, jnp.float32)
            bi_ref[...] = jnp.zeros((8, 1), jnp.int32)

            o0, o1, o2 = o3[:, 0:1], o3[:, 1:2], o3[:, 2:3]
            dx, dy, dz = d3[:, 0:1], d3[:, 1:2], d3[:, 2:3]
            lane_c = jax.lax.broadcasted_iota(jnp.int32, (1, cpad), 1)
            lane_k = jax.lax.broadcasted_iota(jnp.int32, (8, K), 1)

            # ---- front-to-back walk: nearest unvisited cluster each
            # iteration, stop when it cannot beat any ray's need ----
            def cond(state):
                jg, go = state
                return (jg < cpad) & (go == 1)

            def body(state):
                jg, _ = state
                e = e_ref[0]                                  # (cpad,)
                m = jnp.min(e)
                c_sm[0, 0] = jnp.min(jnp.where(e == m, lane_c[0], cpad))
                best = bt_ref[...]                            # (8, 1)
                if mode == "any":
                    need_v = jnp.where(best < inf,
                                       jnp.float32(-_INF_PY), tmax)
                else:
                    need_v = jnp.minimum(best, tmax)
                go_sm[0, 0] = ((m <= jnp.max(need_v)) & (m < inf)
                               ).astype(jnp.int32)
                c = c_sm[0, 0]
                go = go_sm[0, 0]

                @pl.when(go == 1)
                def _():
                    trs = tris_ref[c]                         # (16, K)
                    n0, n1, n2 = trs[0:1], trs[1:2], trs[2:3]
                    an = trs[3:4]
                    g10, g11, g12 = trs[4:5], trs[5:6], trs[6:7]
                    c1 = trs[7:8]
                    g20, g21, g22 = trs[8:9], trs[9:10], trs[10:11]
                    c2 = trs[11:12]
                    d_n = dx * n0 + dy * n1 + dz * n2         # (8, K)
                    o_n = o0 * n0 + o1 * n1 + o2 * n2
                    den_ok = jnp.abs(d_n) > jnp.float32(1e-30)
                    t = (an - o_n) / jnp.where(den_ok, d_n, 1.0)
                    px = o0 + t * dx
                    py = o1 + t * dy
                    pz = o2 + t * dz
                    u = px * g10 + py * g11 + pz * g12 + c1
                    v = px * g20 + py * g21 + pz * g22 + c2
                    hit = (den_ok & (t >= 0.0) & (u >= 0.0) & (v >= 0.0)
                           & (u + v <= 1.0) & (t <= tmax))
                    t_m = jnp.where(hit, t, inf)
                    tmin = jnp.min(t_m, axis=1, keepdims=True)     # (8, 1)
                    within = jnp.min(jnp.where(t_m == tmin, lane_k, K),
                                     axis=1, keepdims=True)
                    gidx = c * K + jnp.minimum(within, K - 1)
                    cur_t = bt_ref[...]
                    better = tmin < cur_t
                    bt_ref[...] = jnp.where(better, tmin, cur_t)
                    bi_ref[...] = jnp.where(better, gidx, bi_ref[...])
                    # mask the visited cluster out of the entry vector
                    e_ref[...] = jnp.where(lane_c == c, inf,
                                           e_ref[...])

                return (jg + 1, go)

            jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))

            t_ref[pl.ds(r * 8, 8), :] = bt_ref[...]
            idx_ref[pl.ds(r * 8, 8), :] = bi_ref[...]

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(no: int, n_rows: int, C: int, cpad: int, K: int, mode: str,
                interpret: bool = False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                   # n_live_octets (1,)
        grid=(no,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rays (n_rows, 8)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # aabb (8, cpad)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tris (C, 16, K)
        ],
        out_specs=[
            pl.BlockSpec((n_rows, 1), lambda r, c: (0, 0)),
            pl.BlockSpec((n_rows, 1), lambda r, c: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, cpad), jnp.float32),      # per-octet entries
            pltpu.VMEM((8, 1), jnp.float32),         # running best t
            pltpu.VMEM((8, 1), jnp.int32),           # running best idx
            pltpu.SMEM((1, 1), jnp.int32),           # selected cluster
            pltpu.SMEM((1, 1), jnp.int32),           # continue flag
        ],
    )
    pack_bytes = C * 16 * K * 4
    return pl.pallas_call(
        _make_kernel(cpad, K, mode),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=pack_bytes + 16 * 1024 * 1024),
        interpret=interpret,
    )


def trace_tris_octets(o, d, alive, t_max, prep, w_lo, w_hi, cl_ok,
                      cluster_size: int, mode: str = "closest",
                      interpret: bool = False):
    """Closest (or any) mesh hit over the clustered pool, per-octet walk.

    Same contract as block_trace.trace_tris_blocks: o, d (N, 3) world rays
    (callers pre-sort by coherence_key with dead rays last — required for
    PERFORMANCE since live octets are assumed... computed exactly from the
    last live index, so arbitrary alive masks stay correct), ``t_max``
    (N,) caps accepted hits, ``alive`` masks unused lanes.  Returns
    (found (N,) bool, best_tri (N,) int32, best_t (N,) f32).
    """
    from .block_trace import DEAD_ORIGIN

    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    prep = jax.tree_util.tree_map(jax.lax.stop_gradient, prep)
    if prep.pallas_pack is None:
        raise ValueError("trace_tris_octets requires prep.pallas_pack")
    aabb = build_cluster_aabb_table(jax.lax.stop_gradient(w_lo),
                                    jax.lax.stop_gradient(w_hi), cl_ok)
    cpad = aabb.shape[1]

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

    rays_all = jnp.concatenate([o, d, t_max[:, None]], axis=1)   # (np, 7)
    rays_all = jnp.pad(rays_all, ((0, 0), (0, 1)))               # (np, 8)
    pos = jnp.arange(n + pad, dtype=jnp.int32)
    last_live = jnp.max(jnp.where(alive, pos + 1, 0))

    founds, idxs, ts = [], [], []
    for s0 in range(0, n + pad, sl):
        a_sl = alive[s0:s0 + sl]
        # octets past the last live ray in this slice skip entirely
        n_live = jnp.clip((last_live - s0 + 7) // 8, 0, sl // 8)

        def run(s0=s0, n_live=n_live):
            call = _build_call(sl // 8, sl, prep.pallas_pack.shape[0],
                               cpad, cluster_size, mode, interpret)
            t_out, i_out = call(n_live[None], rays_all[s0:s0 + sl], aabb,
                                prep.pallas_pack)
            t = t_out[:, 0]
            return t < INF, i_out[:, 0], t

        f, i, t = jax.lax.cond(
            jnp.any(a_sl), run,
            lambda: (jnp.zeros((sl,), bool), jnp.zeros((sl,), jnp.int32),
                     jnp.full((sl,), INF)))
        founds.append(f)
        idxs.append(i)
        ts.append(t)
    found = jnp.concatenate(founds)[:n]
    idx = jnp.concatenate(idxs)[:n]
    t = jnp.concatenate(ts)[:n]
    return found, idx, t
