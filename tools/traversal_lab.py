"""Traversal-design lab: list statistics on captured real wavefronts.

Input: the .npz from tools/capture_waves.py (real per-level trace batches of
one bench chunk).  For each batch this computes, after production coherence
sorting and exit-capping:

- listed cluster visits at block granularities 128 / 32 / 16 / 8 / 1
  (1 = exact per-ray slab test, the floor for any list-driven traversal);
- lockstep-banded iteration counts (a 128-ray tile of B-ray bands advances
  each band independently; iterations = max over the tile's bands);
- TRUE effective per-ray pairs: clusters whose exact entry distance is
  <= the ray's dense-scan best_t (the work floor for a per-ray
  front-to-back walk with perfect early exit).

These numbers pick the round-5 traversal structure (banded blocks vs
cluster-major pair binning — VERDICT r4 #1).

Usage: python tools/traversal_lab.py [waves.npz]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rustray_tpu.models.procedural import ensure_bench_assets
    from rustray_tpu.ops.block_trace import DEAD_ORIGIN, coherence_key
    from rustray_tpu.ops.intersect import INF, closest_tri
    from rustray_tpu.ops.cluster_trace import world_cluster_aabbs
    from rustray_tpu.ops.traverse import instance_mask
    from rustray_tpu.render import wavefront
    from rustray_tpu.scene.scene import Scene

    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/waves.npz"
    z = np.load(path)

    width, height = 1280, 720
    json_path = ensure_bench_assets(os.path.join("data", "bench"),
                                    grid=6, lat=52, lon=68, width=width,
                                    height=height, samples=1,
                                    monte_carlo=True)
    scene = Scene()
    scene.load(json_path)
    scene.cam.init(width, height)
    scene.init()
    scene.update()
    sa, static = scene.compile()
    sa = jax.device_put(sa)
    prep, wvn = wavefront._prepare(sa)
    w_lo, w_hi = world_cluster_aabbs(sa)
    tri_ok_base = sa.tri_valid

    # ---- exact/interval slab test over ray groups of size `block` ----
    def group_counts(o, d, alive, tmax, cl_ok, block):
        """Listed-visit count per block-of-`block`-rays (interval test,
        refine=1 at this granularity).  Returns (nb,) counts."""
        n = o.shape[0]
        nb = n // block
        o_b = o.reshape(nb, block, 3)
        d_b = d.reshape(nb, block, 3)
        a_b = alive.reshape(nb, block, 1)
        BIG = jnp.float32(3e37)
        olo = jnp.where(a_b, o_b, BIG).min(axis=1)
        ohi = jnp.where(a_b, o_b, -BIG).max(axis=1)
        dlo = jnp.where(a_b, d_b, BIG).min(axis=1)
        dhi = jnp.where(a_b, d_b, -BIG).max(axis=1)
        g_alive = jnp.any(a_b[..., 0], axis=1)
        g_tmax = jnp.max(jnp.where(a_b[..., 0], tmax.reshape(nb, block),
                                   -BIG), axis=1)
        ax_ok = (dlo > 1e-12) | (dhi < -1e-12)
        i1 = 1.0 / jnp.where(ax_ok, dlo, 1.0)
        i2 = 1.0 / jnp.where(ax_ok, dhi, 1.0)
        ilo, ihi = jnp.minimum(i1, i2), jnp.maximum(i1, i2)

        def plane_t(sb):
            a = sb[None] - ohi[:, None]
            b = sb[None] - olo[:, None]
            c0, c1 = a * ilo[:, None], a * ihi[:, None]
            c2, c3 = b * ilo[:, None], b * ihi[:, None]
            lb = jnp.minimum(jnp.minimum(c0, c1), jnp.minimum(c2, c3))
            ub = jnp.maximum(jnp.maximum(c0, c1), jnp.maximum(c2, c3))
            return lb, ub

        lo_lb, lo_ub = plane_t(w_lo)
        hi_lb, hi_ub = plane_t(w_hi)
        near_lb = jnp.minimum(lo_lb, hi_lb)
        far_ub = jnp.maximum(lo_ub, hi_ub)
        near_lb = jnp.where(ax_ok[:, None], near_lb, -BIG)
        far_ub = jnp.where(ax_ok[:, None], far_ub, BIG)
        entry = jnp.maximum(near_lb.max(axis=-1), 0.0)
        exit_ = far_ub.min(axis=-1)
        poss = ((exit_ >= entry) & (entry <= g_tmax[:, None])
                & cl_ok[None] & g_alive[:, None])
        return jnp.sum(poss, axis=1).astype(jnp.int32), \
            jnp.where(poss, entry, jnp.float32(INF))

    gc = jax.jit(group_counts, static_argnums=(5,))

    def batched_counts(o, d, alive, tmax, cl_ok, block, rows_per_call=512):
        n = o.shape[0]
        nb = n // block
        outc = []
        step = max(1, rows_per_call)
        for b0 in range(0, nb, step):
            b1 = min(b0 + step, nb)
            c, _ = gc(o[b0 * block:b1 * block], d[b0 * block:b1 * block],
                      alive[b0 * block:b1 * block],
                      tmax[b0 * block:b1 * block], cl_ok, block)
            outc.append(np.asarray(c))
        return np.concatenate(outc)

    # dense best_t for the effective-pair floor
    def dense_best(o, d, alive, tmax, tri_ok):
        od = jnp.where(alive[:, None], o, DEAD_ORIGIN)
        dd = jnp.where(alive[:, None], d, 1.0)
        t, _ = closest_tri(od, dd, prep, tri_ok, 4096)
        return jnp.minimum(t, tmax)

    db = jax.jit(dense_best)

    def effective_pairs(o, d, alive, tmax, cl_ok, best_t):
        """Per-ray count of clusters with exact entry <= min(best_t, tmax)."""
        outs = []
        step = 2048
        n = o.shape[0]
        cap = jnp.minimum(best_t * 1.0001 + 1e-3, tmax)
        for r0 in range(0, n, step):
            r1 = min(r0 + step, n)
            _, entry = gc(o[r0:r1], d[r0:r1], alive[r0:r1], cap[r0:r1],
                          cl_ok, 1)
            outs.append(np.asarray(jnp.sum(entry <= cap[r0:r1, None],
                                           axis=1)))
        return np.concatenate(outs)

    names = sorted({k.rsplit("_", 1)[0] for k in z.files})
    order = sorted(names, key=lambda s: (int(s.split("_")[1]),
                                         s.startswith("shadow")))
    print(f"{'batch':>10} {'alive':>6} | listed visits by granularity "
          f"(sum over groups)")
    print(f"{'':>10} {'':>6} | {'b128':>8} {'b32':>8} {'b16':>8} {'b8':>8} "
          f"{'perray':>9} {'eff-ray':>9} | {'it128':>6} {'band32':>7} "
          f"{'band16':>7}")
    for name in order:
        o = jnp.asarray(z[name + "_o"])
        d = jnp.asarray(z[name + "_d"])
        alive = jnp.asarray(z[name + "_alive"])
        tmax = jnp.asarray(z[name + "_tmax"])
        n_alive = int(np.asarray(alive).sum())
        if n_alive == 0:
            continue
        for_shadow = name.startswith("shadow")
        lvl = int(name.split("_")[1])
        allow_ro = lvl > 1
        inst_ok = instance_mask(sa, for_shadow, allow_ro)
        cl_ok = sa.cl_valid & inst_ok[sa.cl_inst]
        tri_ok = tri_ok_base & inst_ok[sa.tri_inst]

        # production preamble: coherence sort + global-bounds exit cap
        lo = jnp.min(jnp.where(cl_ok[:, None], w_lo, INF), axis=0)
        hi = jnp.max(jnp.where(cl_ok[:, None], w_hi, -INF), axis=0)
        key = coherence_key(o, d, alive, lo, hi)
        perm = jnp.argsort(key)
        o, d, alive, tmax = o[perm], d[perm], alive[perm], tmax[perm]
        o = jnp.where(alive[:, None], o, DEAD_ORIGIN)
        d = jnp.where(alive[:, None], d, 1.0)
        tmax = jnp.where(alive, tmax, -1.0)
        eps = jnp.float32(1e-30)
        sd = jnp.where(jnp.abs(d) > eps, d, jnp.where(d >= 0, eps, -eps))
        t0 = (lo[None] - o) / sd
        t1 = (hi[None] - o) / sd
        tn = jnp.max(jnp.minimum(t0, t1), axis=1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=1)
        cap = jnp.where(tf >= jnp.maximum(tn, 0.0), tf * 1.0001 + 1e-3, -1.0)
        tmax = jnp.minimum(tmax, cap)

        counts = {}
        for blk in (128, 32, 16, 8):
            counts[blk] = batched_counts(o, d, alive, tmax, cl_ok, blk,
                                         rows_per_call=max(1, 2**16 // blk))
        per_ray = batched_counts(o, d, alive, tmax, cl_ok, 1,
                                 rows_per_call=2048)
        best_t = db(o, d, alive, tmax, tri_ok)
        eff = effective_pairs(o, d, alive, tmax, cl_ok, best_t)

        # lockstep iteration counts for banded 128-tiles
        it128 = counts[128].sum()
        band32 = counts[32].reshape(-1, 4).max(axis=1).sum()
        band16 = counts[16].reshape(-1, 8).max(axis=1).sum()
        print(f"{name:>10} {n_alive:>6} | {counts[128].sum():>8} "
              f"{counts[32].sum():>8} {counts[16].sum():>8} "
              f"{counts[8].sum():>8} {per_ray.sum():>9} {eff.sum():>9} | "
              f"{it128:>6} {band32:>7} {band16:>7}")


if __name__ == "__main__":
    main()
