"""Capture real per-level wavefront ray batches from one bench chunk.

Round-5 traversal-restructure lab input: saves every trace_closest call's
(o, d, alive, t_max, for_shadow) for one chunk-sample of the bench scene to
an .npz, so prologue/kernel design variants can be evaluated offline against
the exact ray populations the production renderer traces (PERF_r04 showed
secondary-level lane utilization is the whole remaining story — design
decisions need these distributions, not synthetic rays).

Usage: python tools/capture_waves.py [out.npz] [chunk_pixels] [start_chunk]

Implementation: mirrors wavefront.render_sample's level loop (minus the
dead-level lax.cond and the sample scan — both would trap the captured
tracers inside a sub-jaxpr) with wavefront.trace_closest monkeypatched to
record its argument tracers; the jitted capture function returns them all.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rustray_tpu.config import EngineConfig
    from rustray_tpu.models.procedural import ensure_bench_assets
    from rustray_tpu.ops import rays as rays_ops
    from rustray_tpu.ops.cluster_trace import world_cluster_aabbs
    from rustray_tpu.render import wavefront
    from rustray_tpu.scene.scene import Scene
    from rustray_tpu.utils.mathutil import sample_pattern, sample_cell_size

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/waves.npz"
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    start_chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    width, height = 1280, 720
    json_path = ensure_bench_assets(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "data", "bench"),
        grid=6, lat=52, lon=68, width=width, height=height,
        samples=1, monte_carlo=True)
    scene = Scene()
    scene.load(json_path)
    scene.cam.init(width, height)
    scene.init()
    scene.update()
    sa, static = scene.compile()
    cfg = scene.raytracing_config
    cfg.samples = 1

    engine = EngineConfig(queue_factor=1.0, chunk_pixels=chunk)
    sa = jax.device_put(sa)
    prep, wvn = _prep(sa, static, engine, wavefront)
    n_levels = 1 + cfg.max_recursion

    captured = []   # list of (tag, o, d, alive, t_max) tracer tuples
    real_trace = wavefront.trace_closest

    def recording_trace(sa_, static_, prep_, o, d, for_shadow, **kw):
        alive = kw.get("alive")
        t_max = kw.get("t_max")
        n = o.shape[0]
        captured.append((
            "shadow" if for_shadow else "closest",
            o, d,
            alive if alive is not None else jnp.ones((n,), bool),
            t_max if t_max is not None else jnp.full((n,), np.float32(3e38)),
        ))
        return real_trace(sa_, static_, prep_, o, d, for_shadow, **kw)

    cell_size = sample_cell_size(cfg.samples)
    cells = jnp.asarray(sample_pattern(cfg.samples, engine.seed)[:1])

    def capture_fn(sa, prep, px, py, valid, key):
        boxes = world_cluster_aabbs(sa)
        n = px.shape[0]
        cap = int(max(n, round(n * engine.queue_factor)))
        o, d = rays_ops.primary_rays(
            sa.camera, static.width, static.height, px, py,
            cells[0][0], cells[0][1], cell_size,
            cfg.aperture_size, cfg.focal_length, cfg.samples)
        weight = jnp.ones((n, 3), jnp.float32)
        alive = valid
        for depth in range(1, n_levels + 1):
            lkey = jax.random.fold_in(key, depth)
            emission, aov, ch = wavefront._shade_level(
                sa, static, prep, cfg, o, d, weight, alive, depth, lkey,
                boxes=boxes, engine=engine, accel_impl="pallas")
            if depth == n_levels:
                break
            o = jnp.concatenate([ch["refl_o"], ch["refr_o"]])
            d = jnp.concatenate([ch["refl_d"], ch["refr_d"]])
            weight = jnp.concatenate([ch["w_refl"], ch["w_refr"]])
            alive_c = jnp.concatenate([alive & ch["spawn_refl"],
                                       alive & ch["spawn_refr"]])
            if alive_c.shape[0] > cap:
                wmax = jnp.max(weight, axis=-1)
                perm = jnp.argsort(jnp.where(alive_c, -wmax, 1.0))[:cap]
                o, d, weight = o[perm], d[perm], weight[perm]
                alive = alive_c[perm]
            else:
                alive = alive_c
        return tuple(x for c in captured for x in c[1:])

    idxs = np.arange(start_chunk * chunk, (start_chunk + 1) * chunk)
    idxs = np.minimum(idxs, width * height - 1)
    px = jnp.asarray(idxs % width, jnp.int32)
    py = jnp.asarray(idxs // width, jnp.int32)

    wavefront.trace_closest = recording_trace
    try:
        fn = jax.jit(capture_fn)
        outs = fn(sa, prep, px, py, jnp.ones((chunk,), bool),
                  jax.random.PRNGKey(0))
        outs = jax.device_get(outs)
    finally:
        wavefront.trace_closest = real_trace

    save = {}
    tags = [c[0] for c in captured]
    for i, tag in enumerate(tags):
        o, d, alive, t_max = outs[4 * i:4 * i + 4]
        # level = count of same-kind calls so far (closest+shadow alternate)
        lvl = tags[:i + 1].count(tag)
        base = f"{tag}_{lvl}"
        save[base + "_o"] = o
        save[base + "_d"] = d
        save[base + "_alive"] = alive
        save[base + "_tmax"] = t_max
        print(f"{base}: n={o.shape[0]} alive={int(alive.sum())}")
    np.savez_compressed(out_path, **save)
    print(f"saved {len(tags)} trace batches to {out_path}")


def _prep(sa, static, engine, wavefront):
    import jax
    prep, wvn = wavefront._prepare(sa)
    if engine.use_pallas(static):
        from rustray_tpu.ops.block_trace import pack_cluster_tris
        pack = jax.jit(pack_cluster_tris, static_argnums=(2, 3, 4))(
            prep, sa.tri_valid, static.n_clusters, static.cluster_size,
            int(sa.cl_lo.shape[0]))
        prep = prep.replace(pallas_pack=pack)
    return prep, wvn


if __name__ == "__main__":
    main()
