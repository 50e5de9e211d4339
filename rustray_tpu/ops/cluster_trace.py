"""Block-coherent cluster traversal — the TPU-native BVH walk.

The reference walks a pointer-based BVH per ray on a CPU thread
(src/scene.rs:1715-1722 scene BVH; parry3d per-mesh BVH,
src/shape/mesh.rs:67).  Per-ray stack traversal is hostile to a vector
machine, so here traversal is restructured around *ray blocks*:

1. rays are processed in blocks of ``block`` (primary rays are screen-
   coherent; secondary/shadow wavefronts remain mostly coherent);
2. every block is slab-tested against all cluster AABBs at once — a dense
   (B, C) VPU problem with no divergence;
3. the block's surviving clusters are visited front-to-back by a
   ``lax.while_loop``; each visit intersects the whole block against one
   contiguous K-triangle slab (dense MXU/VPU tile, ``intersect_tri_tile``);
4. the loop exits early once every ray's current best hit is closer than
   the entry distance of the next cluster (or the ray has exited all the
   boxes it overlapped).

Differentiation contract: traversal is *selection only* — all inputs are
stop_gradient'ed and only integer winner indices (plus a found mask) leave
the loop.  Callers recompute the winner's ray parameter differentiably from
the per-triangle constants (``recompute_t``), so scene-parameter gradients
flow through exactly one triangle per ray, as in the dense path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .intersect import INF, TrianglePrep, dot, intersect_tri_tile


def world_cluster_aabbs(sa):
    """Per-frame world-space cluster AABBs: transform the 8 corners of each
    object-space leaf box by its owner instance matrix (conservative under
    affine maps).  Selection-only — gradients are cut here."""
    lo = jax.lax.stop_gradient(sa.cl_lo)
    hi = jax.lax.stop_gradient(sa.cl_hi)
    m = jax.lax.stop_gradient(sa.inst_trans[sa.cl_inst])  # (C, 4, 4)
    # (C, 8, 3) corners
    sel = jnp.array([[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
                     [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]], jnp.float32)
    corners = lo[:, None, :] * (1.0 - sel)[None] + hi[:, None, :] * sel[None]
    wc = (jnp.einsum("cij,ckj->cki", m[:, :3, :3], corners)
          + m[:, None, :3, 3])
    return wc.min(axis=1), wc.max(axis=1)


def _slab_test(o, d, w_lo, w_hi, cl_ok):
    """Rays (B,3) vs boxes (C,3).  Returns (hit (B,C), t_enter (B,C),
    t_exit (B,C))."""
    eps = 1e-30
    safe_d = jnp.where(jnp.abs(d) > eps, d, jnp.where(d >= 0, eps, -eps))
    inv = 1.0 / safe_d                                    # (B, 3)
    t0 = (w_lo[None] - o[:, None]) * inv[:, None]         # (B, C, 3)
    t1 = (w_hi[None] - o[:, None]) * inv[:, None]
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tf >= jnp.maximum(tn, 0.0)) & cl_ok[None]
    return hit, tn, tf


def _intersect_gathered(o, d, tmax, an, n0, n1, n2, g10, g11, g12, c1,
                        g20, g21, g22, c2, ok):
    """Rays (B,3) × a gathered slab of G triangles (component arrays (G,)).

    Pure broadcast/elementwise math (no inner-dim-3 matmuls — those map to
    a 2%-utilized MXU; this fuses into one VPU pass with the min-reduce).
    ``tmax`` (B,) caps accepted hits.  Returns (best_t (B,), best_arg (B,)
    int32 index into the G slab).
    """
    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    d_n = dx * n0[None] + dy * n1[None] + dz * n2[None]      # (B, G)
    o_n = ox * n0[None] + oy * n1[None] + oz * n2[None]
    denom_ok = jnp.abs(d_n) > 1e-30
    t = (an[None] - o_n) / jnp.where(denom_ok, d_n, 1.0)
    u = (ox + t * dx) * g10[None] + (oy + t * dy) * g11[None] \
        + (oz + t * dz) * g12[None] + c1[None]
    v = (ox + t * dx) * g20[None] + (oy + t * dy) * g21[None] \
        + (oz + t * dz) * g22[None] + c2[None]
    hit = (denom_ok & (t >= 0.0) & (u >= 0.0) & (v >= 0.0)
           & (u + v <= 1.0) & ok[None] & (t <= tmax[:, None]))
    t = jnp.where(hit, t, INF)
    return jnp.min(t, axis=1), jnp.argmin(t, axis=1).astype(jnp.int32)


def select_closest_clusters(o, d, prep: TrianglePrep, tri_ok,
                            w_lo, w_hi, cl_ok, cluster_size: int,
                            block: int = 1024, gather: int = 32,
                            t_max=None):
    """Closest-hit winner selection over the clustered triangle pool.

    o, d: (N, 3) world rays (d normalized).  Returns (found (N,) bool,
    best_tri (N,) int32, best_t (N,) f32 — INF on miss).  NOT
    differentiable by design (stop_gradient inside); route gradients
    through ops/traverse.selected_t (or :func:`recompute_t`).

    Per block: slab-test against all clusters, sort survivors front-to-
    back, then visit them in *rounds of ``gather`` clusters*: one round
    gathers ``gather×K`` triangles' constants and intersects the whole
    block against them as a single dense fused op.  Most coherent blocks
    finish in one round; a while-loop adds rounds only for stragglers, with
    a global early-exit once every ray's best hit precedes the next
    round's entry distance.
    """
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    prep = jax.tree_util.tree_map(jax.lax.stop_gradient, prep)
    w_lo = jax.lax.stop_gradient(w_lo)
    w_hi = jax.lax.stop_gradient(w_hi)
    K = cluster_size
    C = w_lo.shape[0]
    M = min(gather, C)

    n = o.shape[0]
    if t_max is None:
        t_max = jnp.full((n,), INF)
    t_max = jax.lax.stop_gradient(t_max)
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -1.0, t_max.dtype)])

    an = prep.an
    n0, n1, n2 = prep.n[:, 0], prep.n[:, 1], prep.n[:, 2]
    g10, g11, g12 = prep.g1[:, 0], prep.g1[:, 1], prep.g1[:, 2]
    g20, g21, g22 = prep.g2[:, 0], prep.g2[:, 1], prep.g2[:, 2]
    c1, c2 = prep.c1, prep.c2
    okf = tri_ok

    def per_block(o_b, d_b, tmax_b):
        hit, tn, tf = _slab_test(o_b, d_b, w_lo, w_hi, cl_ok)
        hit = hit & (tn <= tmax_b[:, None])
        any_hit = jnp.any(hit, axis=0)                    # (C,)
        enter = jnp.min(jnp.where(hit, jnp.maximum(tn, 0.0), INF), axis=0)
        key = jnp.where(any_hit, enter, INF)
        order = jnp.argsort(key).astype(jnp.int32)        # front-to-back
        sorted_key = key[order]
        m = jnp.sum(any_hit)
        # farthest distance at which each ray can still be resolved: its
        # current best, capped by the last box exit it overlaps at all
        # (and by its t_max — shadow rays stop at the light)
        ray_cap = jnp.max(jnp.where(hit, tf, -INF), axis=1)   # (B,)
        ray_cap = jnp.minimum(ray_cap, tmax_b)
        n_rounds = -(-C // M)

        def round_fn(r, best_t, best_i):
            ranks = r * M + jnp.arange(M, dtype=jnp.int32)        # (M,)
            cids = order[jnp.minimum(ranks, C - 1)]
            live = ranks < m
            idx = (cids[:, None] * K
                   + jnp.arange(K, dtype=jnp.int32)[None]).reshape(-1)
            ok_g = okf[idx] & jnp.repeat(live, K)
            t_r, a_r = _intersect_gathered(
                o_b, d_b, tmax_b, an[idx], n0[idx], n1[idx], n2[idx],
                g10[idx], g11[idx], g12[idx], c1[idx],
                g20[idx], g21[idx], g22[idx], c2[idx], ok_g)
            better = t_r < best_t
            return (jnp.where(better, t_r, best_t),
                    jnp.where(better, idx[a_r], best_i))

        init = (jnp.full((block,), INF), jnp.zeros((block,), jnp.int32))
        if n_rounds == 1:
            best_t, best_i = round_fn(jnp.int32(0), *init)
        else:
            def cond(st):
                r, best_t, _ = st
                need = jnp.max(jnp.minimum(best_t, ray_cap))
                nxt = jnp.minimum(r * M, C - 1)
                return (r * M < m) & (sorted_key[nxt] <= need)

            def body(st):
                r, best_t, best_i = st
                best_t, best_i = round_fn(r, best_t, best_i)
                return (r + 1, best_t, best_i)

            _, best_t, best_i = jax.lax.while_loop(
                cond, body, (jnp.int32(0),) + init)
        return best_t, best_i

    o_blk = o.reshape(nb, block, 3)
    d_blk = d.reshape(nb, block, 3)
    t_blk = t_max.reshape(nb, block)
    best_t, best_i = jax.vmap(per_block)(o_blk, d_blk, t_blk)
    best_t = best_t.reshape(-1)[:n]
    best_i = best_i.reshape(-1)[:n]
    return best_t < INF, best_i, best_t


def recompute_t(o, d, prep: TrianglePrep, tri_idx, found):
    """Differentiable ray parameter of the selected winner triangle —
    the same plane equation the dense tile evaluates
    (t = (a·n − o·n)/(d·n)), gathered for one triangle per ray."""
    n = prep.n[tri_idx]
    an = prep.an[tri_idx]
    d_n = dot(d, n)
    denom = jnp.where(jnp.abs(d_n) > 1e-30, d_n, 1.0)
    t = (an - dot(o, n)) / denom
    return jnp.where(found, t, INF)
