"""Simulate ray-ordering strategies for the block walk on captured waves.

Question (round-5 design): if rays are sorted by their NEAREST listed
cluster (instead of direction-octant+Morton), do 128-ray blocks share their
first clusters well enough that the existing early-terminating block walk
approaches the per-ray work floor (tools/traversal_lab.py measured ~1.1
effective clusters/ray at secondary levels vs ~600 listed visits/block)?

For each captured trace batch and each ordering this reports:
- listed b128 visits (prologue volume: what the kernel's lists contain);
- approx effective visits: per block, listed entries with entry <= the
  block's FINAL need (max over lanes of min(true best_t, t_max)) — a lower
  bound on walk iterations that is tight when hits land in the first
  visited clusters (the measured regime).

Orderings: "morton" = production coherence_key; "firstcl" = per-ray argmin
cluster entry (exact slab test), ties by coherence_key.

Usage: python tools/binning_lab.py [waves.npz]
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

    def ray_entries(o, d, tmax, cl_ok):
        """Exact per-ray cluster slab entries; INF where not hit/past tmax.
        o,d already dead-masked.  Returns (n, C) f32."""
        eps = jnp.float32(1e-30)
        sd = jnp.where(jnp.abs(d) > eps, d, jnp.where(d >= 0, eps, -eps))
        inv = 1.0 / sd
        t0 = (w_lo[None] - o[:, None]) * inv[:, None]
        t1 = (w_hi[None] - o[:, None]) * inv[:, None]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        entry = jnp.maximum(tn, 0.0)
        ok = (tf >= entry) & (entry <= tmax[:, None]) & cl_ok[None]
        return jnp.where(ok, entry, jnp.float32(INF))

    re_j = jax.jit(ray_entries)

    def block_stats(o, d, alive, tmax, cl_ok, need):
        """(listed, eff) visit counts per 128-block, interval test
        refine=4 like production.  ``need`` (n,) per-lane final need."""
        n = o.shape[0]
        nb = n // 128
        S, sub = 4, 32
        nbs = nb * S
        BIG = jnp.float32(3e37)
        o_b = o.reshape(nbs, sub, 3)
        d_b = d.reshape(nbs, sub, 3)
        a_b = alive.reshape(nbs, sub, 1)
        olo = jnp.where(a_b, o_b, BIG).min(axis=1).reshape(nb, S, 3)
        ohi = jnp.where(a_b, o_b, -BIG).max(axis=1).reshape(nb, S, 3)
        dlo = jnp.where(a_b, d_b, BIG).min(axis=1).reshape(nb, S, 3)
        dhi = jnp.where(a_b, d_b, -BIG).max(axis=1).reshape(nb, S, 3)
        s_alive = jnp.any(a_b[..., 0], axis=1).reshape(nb, S)
        s_tmax = jnp.max(jnp.where(a_b[..., 0], tmax.reshape(nbs, sub),
                                   -BIG), axis=1).reshape(nb, S)
        C = w_lo.shape[0]
        possible = jnp.zeros((nb, C), bool)
        entry_min = jnp.full((nb, C), jnp.float32(INF))
        for s in range(S):
            ax_ok = (dlo[:, s] > 1e-12) | (dhi[:, s] < -1e-12)
            i1 = 1.0 / jnp.where(ax_ok, dlo[:, s], 1.0)
            i2 = 1.0 / jnp.where(ax_ok, dhi[:, s], 1.0)
            ilo, ihi = jnp.minimum(i1, i2), jnp.maximum(i1, i2)

            def plane_t(sb):
                a = sb[None] - ohi[:, s][:, None]
                b = sb[None] - olo[:, s][:, None]
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
            entry_lb = jnp.maximum(near_lb.max(axis=-1), 0.0)
            exit_ub = far_ub.min(axis=-1)
            poss = ((exit_ub >= entry_lb) & (entry_lb <= s_tmax[:, s][:, None])
                    & cl_ok[None] & s_alive[:, s][:, None])
            possible = possible | poss
            entry_min = jnp.minimum(
                entry_min, jnp.where(poss, entry_lb, jnp.float32(INF)))
        listed = jnp.sum(possible, axis=1)
        block_need = jnp.max(jnp.where(alive.reshape(nb, 128), need.reshape(nb, 128),
                                       -BIG), axis=1)
        eff = jnp.sum(possible & (entry_min <= block_need[:, None]), axis=1)
        return jnp.sum(listed), jnp.sum(eff)

    bs_j = jax.jit(block_stats)

    names = sorted({k.rsplit("_", 1)[0] for k in z.files})
    order = sorted(names, key=lambda s: (int(s.split("_")[1]),
                                         s.startswith("shadow")))
    print(f"{'batch':>10} {'alive':>6} | {'morton listed/eff':>20} | "
          f"{'firstcl listed/eff':>20}")
    for name in order:
        o0 = jnp.asarray(z[name + "_o"])
        d0 = jnp.asarray(z[name + "_d"])
        alive0 = jnp.asarray(z[name + "_alive"])
        tmax0 = jnp.asarray(z[name + "_tmax"])
        n_alive = int(np.asarray(alive0).sum())
        if n_alive == 0:
            continue
        for_shadow = name.startswith("shadow")
        lvl = int(name.split("_")[1])
        inst_ok = instance_mask(sa, for_shadow, lvl > 1)
        cl_ok = sa.cl_valid & inst_ok[sa.cl_inst]
        tri_ok = sa.tri_valid & inst_ok[sa.tri_inst]
        lo = jnp.min(jnp.where(cl_ok[:, None], w_lo, INF), axis=0)
        hi = jnp.max(jnp.where(cl_ok[:, None], w_hi, -INF), axis=0)

        key = coherence_key(o0, d0, alive0, lo, hi)

        o_m = jnp.where(alive0[:, None], o0, DEAD_ORIGIN)
        d_m = jnp.where(alive0[:, None], d0, 1.0)
        eps = jnp.float32(1e-30)
        sd = jnp.where(jnp.abs(d_m) > eps, d_m,
                       jnp.where(d_m >= 0, eps, -eps))
        t0 = (lo[None] - o_m) / sd
        t1 = (hi[None] - o_m) / sd
        tn = jnp.max(jnp.minimum(t0, t1), axis=1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=1)
        cap = jnp.where(tf >= jnp.maximum(tn, 0.0), tf * 1.0001 + 1e-3, -1.0)
        tmax_c = jnp.minimum(jnp.where(alive0, tmax0, -1.0), cap)

        # exact per-ray first cluster + true best_t (dense scan)
        fc = []
        for r0 in range(0, o0.shape[0], 4096):
            r1 = min(r0 + 4096, o0.shape[0])
            ent = re_j(o_m[r0:r1], d_m[r0:r1], tmax_c[r0:r1], cl_ok)
            fc.append(np.asarray(jnp.argmin(ent, axis=1)))
        fc = jnp.asarray(np.concatenate(fc), jnp.int32)
        t_best, _ = jax.jit(closest_tri, static_argnums=(4,))(
            o_m, d_m, prep, tri_ok, 4096)
        if for_shadow:
            # any-hit: a lane's need collapses once any hit exists
            need = jnp.where(t_best <= tmax_c, jnp.float32(-3e37), tmax_c)
        else:
            need = jnp.minimum(t_best, tmax_c)

        rows = []
        for tag, k in (("morton", key),
                       ("firstcl", fc * jnp.int32(1 << 8)
                        + (key & jnp.int32(0x7F000000)) // (1 << 24)
                        + jnp.where(alive0, 0, jnp.int32(0x7FFFFFFF)))):
            perm = jnp.argsort(k)
            l, e = bs_j(o_m[perm], d_m[perm], alive0[perm], tmax_c[perm],
                        cl_ok, need[perm])
            rows.append((int(l), int(e)))
        print(f"{name:>10} {n_alive:>6} | {rows[0][0]:>9}/{rows[0][1]:>9} | "
              f"{rows[1][0]:>9}/{rows[1][1]:>9}")


if __name__ == "__main__":
    main()
