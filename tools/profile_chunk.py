"""Full per-source device-time breakdown of one bench chunk (all rows).

Usage: python tools/profile_chunk.py [chunk_pixels] [samples]
Prints every source line's device ms (one chunk, N samples) plus the
unattributed remainder — the artifact behind PERF_r04.md.
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
    from rustray_tpu.render.wavefront import _prepare, make_chunk_renderer
    from rustray_tpu.scene.scene import Scene
    from rustray_tpu.utils.mathutil import sample_pattern
    from tools.devbench import device_time

    width, height, samples = 1280, 720, int(sys.argv[2]) if len(sys.argv) > 2 else 1
    json_path = ensure_bench_assets(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "data", "bench"),
        grid=6, lat=52, lon=68, width=width, height=height,
        samples=samples, monte_carlo=True)
    scene = Scene()
    scene.load(json_path)
    scene.cam.init(width, height)
    scene.init()
    scene.update()
    sa, static = scene.compile()
    cfg = scene.raytracing_config
    cfg.samples = samples

    engine = EngineConfig(queue_factor=2.0, chunk_pixels=98304)
    if len(sys.argv) > 1 and sys.argv[1] != "-":
        engine.chunk_pixels = int(sys.argv[1])
    chunk = min(engine.chunk_pixels, width * height)

    sa = jax.device_put(sa)
    prep, wvn = _prepare(sa)
    if engine.use_pallas(static):
        from rustray_tpu.ops.block_trace import pack_cluster_tris
        prep = prep.replace(pallas_pack=jax.jit(
            pack_cluster_tris, static_argnums=(2, 3, 4))(
            prep, sa.tri_valid, static.n_clusters, static.cluster_size,
            int(sa.cl_lo.shape[0])))
    n_levels = 1 + cfg.max_recursion
    renderer = make_chunk_renderer(static, cfg, engine, n_levels)
    cells = jnp.asarray(sample_pattern(cfg.samples, engine.seed)[:samples])
    idxs = np.arange(chunk)
    px = jnp.asarray(idxs % width, jnp.int32)
    py = jnp.asarray(idxs // width, jnp.int32)
    args = (sa, prep, wvn, px, py, jnp.ones((chunk,), bool), cells,
            jnp.arange(samples, dtype=jnp.int32), jnp.ones((samples,), bool),
            jax.random.PRNGKey(0))
    ms, by_src = device_time(lambda *a: renderer(*a), *args, iters=3,
                             by_source=True)
    print(f"chunk={chunk}px samples={samples}: {ms:.1f} ms device total")
    shown = 0.0
    for src, v in by_src.items():
        if v < 0.5:
            break
        shown += v
        print(f"  {v:8.2f} ms  {src}")
    print(f"  {ms - shown:8.2f} ms  (long tail < 0.5 ms/line)")


if __name__ == "__main__":
    main()
