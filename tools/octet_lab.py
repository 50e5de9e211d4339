"""Octet-granularity pair statistics — sizing the round-5 pair-stream path.

Design under test (see VERDICT r4 #1, cluster-major pair binning made
regular): rays coherence-sorted; per-RAY exact cluster slab tests OR-folded
to OCTETS (8 consecutive rays = one VPU sublane group); the kernel
processes a compacted (octet, cluster) pair stream at (8 rays x 128 tris)
per pair.  Phase 1 = each octet's nearest-entry cluster only; phase 2 =
remaining pairs with entry <= the octet's post-phase-1 need.

Reports per captured batch:
- exact per-ray pairs (floor), exact-octet listed pairs (no early exit),
- phase-2 pairs with true-best-t pruning per RAY folded to octets
  (the real workload: phase1 + phase2),
- overflow-relevant max pairs/octet.

Usage: python tools/octet_lab.py [waves.npz]
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

    json_path = ensure_bench_assets(os.path.join("data", "bench"),
                                    grid=6, lat=52, lon=68, width=1280,
                                    height=720, samples=1, monte_carlo=True)
    scene = Scene()
    scene.load(json_path)
    scene.cam.init(1280, 720)
    scene.init()
    scene.update()
    sa, static = scene.compile()
    sa = jax.device_put(sa)
    prep, wvn = wavefront._prepare(sa)
    w_lo, w_hi = world_cluster_aabbs(sa)

    def octet_stats(o, d, alive, tmax, cl_ok, need):
        """Per 4096-ray slice: (per-ray pairs, octet listed, octet phase2,
        max octet pairs).  need (n,) = per-ray min(true best_t, tmax)."""
        eps = jnp.float32(1e-30)
        sd = jnp.where(jnp.abs(d) > eps, d, jnp.where(d >= 0, eps, -eps))
        inv = 1.0 / sd
        t0 = (w_lo[None] - o[:, None]) * inv[:, None]
        t1 = (w_hi[None] - o[:, None]) * inv[:, None]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        entry = jnp.maximum(tn, 0.0)
        ok = (tf >= entry) & (entry <= tmax[:, None]) & cl_ok[None] \
            & alive[:, None]
        n = o.shape[0]
        no = n // 8
        ok_o = ok.reshape(no, 8, -1)
        entry_o = jnp.where(ok, entry, INF).reshape(no, 8, -1)
        listed_o = jnp.any(ok_o, axis=1)                    # (no, C)
        per_ray = jnp.sum(ok)
        # phase 1: per-octet argmin entry cluster
        emin = jnp.min(entry_o, axis=1)                     # (no, C)
        first = jnp.argmin(emin, axis=1)                    # (no,)
        # per-ray effective (entry <= own need), folded to octets
        eff_r = ok & (entry <= need[:, None] * 1.0001 + 1e-3)
        eff_o = jnp.any(eff_r.reshape(no, 8, -1), axis=1)   # (no, C)
        # phase2 = effective minus the phase-1 cluster
        is_first = jax.nn.one_hot(first, emin.shape[1], dtype=bool)
        p2 = eff_o & ~is_first
        cnt_o = jnp.sum(listed_o, axis=1)
        return (per_ray, jnp.sum(listed_o), jnp.sum(p2),
                jnp.sum(jnp.any(listed_o, axis=1)), jnp.max(cnt_o),
                jnp.sum(jnp.sum(p2, axis=1) > 0))

    os_j = jax.jit(octet_stats)

    names = sorted({k.rsplit("_", 1)[0] for k in z.files})
    order = sorted(names, key=lambda s: (int(s.split("_")[1]),
                                         s.startswith("shadow")))
    print(f"{'batch':>10} {'alive':>6} | {'perray':>8} {'oct_list':>9} "
          f"{'oct_p2':>8} {'liveoct':>7} {'maxoct':>6} {'p2oct':>6}")
    tot = np.zeros(3, np.int64)
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
        perm = jnp.argsort(key)
        o, d = o0[perm], d0[perm]
        alive, tmax = alive0[perm], tmax0[perm]
        o = jnp.where(alive[:, None], o, DEAD_ORIGIN)
        d = jnp.where(alive[:, None], d, 1.0)
        eps = jnp.float32(1e-30)
        sd = jnp.where(jnp.abs(d) > eps, d, jnp.where(d >= 0, eps, -eps))
        t0 = (lo[None] - o) / sd
        t1 = (hi[None] - o) / sd
        tn = jnp.max(jnp.minimum(t0, t1), axis=1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=1)
        cap = jnp.where(tf >= jnp.maximum(tn, 0.0), tf * 1.0001 + 1e-3, -1.0)
        tmax = jnp.minimum(jnp.where(alive, tmax, -1.0), cap)
        t_best, _ = jax.jit(closest_tri, static_argnums=(4,))(
            o, d, prep, tri_ok, 4096)
        if for_shadow:
            need = jnp.where(t_best <= tmax, jnp.float32(-3e37), tmax)
        else:
            need = jnp.minimum(t_best, tmax)

        acc = np.zeros(6, np.int64)
        n = o.shape[0]
        for r0 in range(0, n, 4096):
            r1 = min(r0 + 4096, n)
            out = os_j(o[r0:r1], d[r0:r1], alive[r0:r1], tmax[r0:r1],
                       cl_ok, need[r0:r1])
            vals = [int(np.asarray(v)) for v in out]
            acc[:4] += vals[:4]
            acc[4] = max(acc[4], vals[4])
            acc[5] += vals[5]
        print(f"{name:>10} {n_alive:>6} | {acc[0]:>8} {acc[1]:>9} "
              f"{acc[2]:>8} {acc[3]:>7} {acc[4]:>6} {acc[5]:>6}")
        tot += [acc[0], acc[1], acc[3] + acc[2]]
    print(f"\ntotals: per-ray {tot[0]}, octet-listed {tot[1]}, "
          f"phase1+2 workload {tot[2]}")


if __name__ == "__main__":
    main()
