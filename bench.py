"""Benchmark harness: prints ONE JSON line with the headline metric.

Workload: a sponza-class GLB (≈250k triangles, 37 textured PBR meshes,
3 lights, monte-carlo materials) generated once into data/bench/ and loaded
end-to-end through the real JSON→GLTF loader stack — the same path the
reference uses for sponza (/root/reference/scene/sponza.json,
src/scene.rs:722-1124) — then rendered at 1280×720 with the wavefront
renderer on the current default JAX backend (TPU when available).

Default config IS the north-star workload (BASELINE.json): 1280×720
monte_carlo samples=128, MEASURED (not extrapolated — VERDICT r4 #3).
The frame is timed over the production sample-grouped dispatches after a
one-group warmup that compiles the exact program every group reuses.

Metric: primary-ray throughput in Mrays/s (W·H·samples / wall-clock).
The frame additionally traces ~3 shadow rays per hit per level and the
reflection/refraction tree, so device-ray throughput is a multiple of
this number.  ``vs_baseline`` is the ratio against the 100 Mrays/s/chip
north star from BASELINE.json.

Flags (env):
  BENCH_WIDTH/BENCH_HEIGHT/BENCH_SAMPLES/BENCH_GRID/BENCH_LAT/BENCH_LON
  BENCH_IMPL=auto|dense|xla|pallas — trace implementation (default auto)
  BENCH_SMALL=1 — tiny smoke configuration (CI / CPU)
  BENCH_CHUNK/BENCH_BLOCK/BENCH_QF — engine overrides
  BENCH_BREAKDOWN=1 — print per-source device-time breakdown to stderr
"""
import json
import os
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rustray_tpu.config import EngineConfig
    from rustray_tpu.models.procedural import ensure_bench_assets
    from rustray_tpu.render import wavefront as wf
    from rustray_tpu.scene.scene import Scene
    from rustray_tpu.utils.mathutil import sample_pattern

    small = os.environ.get("BENCH_SMALL") == "1"
    width = int(os.environ.get("BENCH_WIDTH", 160 if small else 1280))
    height = int(os.environ.get("BENCH_HEIGHT", 90 if small else 720))
    samples = int(os.environ.get("BENCH_SAMPLES", 1 if small else 128))
    grid = int(os.environ.get("BENCH_GRID", 2 if small else 6))
    lat = int(os.environ.get("BENCH_LAT", 12 if small else 52))
    lon = int(os.environ.get("BENCH_LON", 18 if small else 68))
    impl = os.environ.get("BENCH_IMPL", "auto")
    chunk_env = int(os.environ.get("BENCH_CHUNK", 0))
    block_env = int(os.environ.get("BENCH_BLOCK", 0))
    variant = os.environ.get("BENCH_VARIANT", "uniform")

    json_path = ensure_bench_assets(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "data", "bench"),
        grid=grid, lat=lat, lon=lon, width=width, height=height,
        samples=samples, monte_carlo=not small, variant=variant)
    scene = Scene()
    scene.load(json_path)
    scene.cam.init(width, height)
    scene.init()
    scene.update()
    sa, static = scene.compile()
    cfg = scene.raytracing_config
    cfg.samples = samples

    # 32768-pixel chunks measured best (r4 sweep: 24k 10.47s / 32k 10.25s /
    # 49k 10.46s / 98k 11.6-12.4s / 196k 13.5s at 4 spp; re-confirmed r5 at
    # 131k 12.2s / 262k 13.9s): tighter Morton blocks give smaller
    # per-block visit lists, and the device-side chunk scan makes per-chunk
    # fixed costs negligible.
    # queue_factor 1.0: every wavefront level runs at chunk width — the
    # bench scene's live child counts never exceed it (measured ~34% at the
    # deepest live level), and render() auto-raises + re-renders if a scene
    # ever drops rays, so this is a pure 2x lane-count saving, not an
    # accuracy trade.
    engine = EngineConfig(queue_factor=float(os.environ.get("BENCH_QF", 1.0)),
                          chunk_pixels=32768 if not small else 16384)
    if chunk_env:
        engine.chunk_pixels = chunk_env
    if block_env:
        engine.pallas_block = block_env
    if impl == "dense":
        engine.accel = "off"
        engine.pallas = "off"
    elif impl == "xla":
        engine.accel = "on"
        engine.pallas = "off"
    elif impl == "pallas":
        engine.accel = "on"
        engine.pallas = "on"
        if jax.default_backend() not in ("tpu", "axon"):
            engine.pallas_interpret = True

    backend = jax.default_backend()

    # ---- measured frame over the production sample-grouped dispatch path
    # (the exact device-loop render() runs; warmup = one sample group,
    # which compiles the identical program every group reuses) ----
    W, H = width, height
    n_pix = W * H
    chunk = min(engine.chunk_pixels, n_pix)
    n_chunks = -(-n_pix // chunk)
    n_levels = wf.frame_levels(sa, cfg)
    sa = jax.device_put(sa)
    prep, wvn = wf._prepare(sa)
    if engine.use_pallas(static):
        from rustray_tpu.ops.block_trace import pack_cluster_tris
        prep = prep.replace(pallas_pack=jax.jit(
            pack_cluster_tris, static_argnums=(2, 3, 4))(
            prep, sa.tri_valid, static.n_clusters, static.cluster_size,
            int(sa.cl_lo.shape[0])))
    frame = wf.make_frame_renderer(static, cfg, engine, n_levels, chunk,
                                   n_chunks)
    cells = jnp.asarray(sample_pattern(cfg.samples, engine.seed), jnp.int32)
    cell_idx = jnp.arange(cells.shape[0], dtype=jnp.int32)
    cell_valid = jnp.ones((cells.shape[0],), bool)
    key = jax.random.PRNGKey(engine.seed)
    n_cells = int(cells.shape[0])
    per = max(1, int(engine.samples_per_dispatch))

    def group(g0):
        g1 = min(g0 + per, n_cells)
        return frame(sa, prep, wvn, cells[g0:g1], cell_idx[g0:g1],
                     cell_valid[g0:g1], key)

    jax.block_until_ready(group(0))          # warmup: compile
    t0 = time.time()
    outs = [group(g0) for g0 in range(0, n_cells, per)]
    jax.block_until_ready(outs)
    elapsed = time.time() - t0
    device_rays = int(sum(int(np.asarray(o[5]).sum()) for o in outs))
    dropped = int(sum(int(np.asarray(o[4]).sum()) for o in outs))
    if dropped:
        print(f"[bench] warning: {dropped} dropped rays (render() would "
              f"auto-raise and re-render these chunks)", file=sys.stderr)

    if os.environ.get("BENCH_BREAKDOWN") == "1":
        _breakdown(sa, static, cfg, engine, prep, wvn)

    n_primary = width * height * samples
    mrays = n_primary / elapsed / 1e6
    dev_mrays = device_rays / elapsed / 1e6
    # scale to the 128-spp north-star config when a different sample count
    # was forced via BENCH_SAMPLES (per-sample cost is constant: the sample
    # loop is a scan of identical programs); at the default samples=128 the
    # north-star numbers ARE the measured ones.
    ns_seconds = elapsed / samples * 128.0
    ns_mrays = width * height * 128.0 / ns_seconds / 1e6
    print(json.dumps({
        "metric": "primary_mrays_per_sec",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 4),
        "detail": {
            "backend": backend, "impl": impl, "width": width,
            "height": height, "samples": samples,
            "chunk_pixels": engine.chunk_pixels,
            "pallas_block": engine.pallas_block,
            "queue_factor": engine.queue_factor,
            "tris": int(static.n_tris),
            "clusters": int(static.n_clusters),
            "scene": f"gltf-loaded sponza-class (data/bench, {variant})",
            "variant": variant,
            "scene_note": ("procedurally generated stand-in for sponza "
                           "(the real GLB is download-at-load and this "
                           "environment is airgapped): 250k tris, 37 "
                           "textured PBR meshes via the real GLB parser; "
                           "its cluster statistics are more uniform than "
                           "real sponza's skewed geometry, so traversal "
                           "costs may differ on the real asset"),
            "seconds_per_frame": round(elapsed, 3),
            "dropped_rays": dropped,
            "device_rays_traced": device_rays,
            "device_mrays_per_sec": round(dev_mrays, 3),
            "north_star_128spp_seconds": round(ns_seconds, 1),
            "north_star_128spp_primary_mrays": round(ns_mrays, 3),
            "north_star_measured": samples == 128,
        },
    }))


def _breakdown(sa, static, cfg, engine, prep, wvn):
    """Per-source device-time breakdown of one chunk (stderr)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rustray_tpu.render.wavefront import make_chunk_renderer
    from rustray_tpu.utils.mathutil import sample_pattern
    from tools.devbench import device_time

    W, H = static.width, static.height
    chunk = min(engine.chunk_pixels, W * H)
    n_levels = 1 + cfg.max_recursion
    renderer = make_chunk_renderer(static, cfg, engine, n_levels)
    cells = jnp.asarray(sample_pattern(cfg.samples, engine.seed)[:1])
    idxs = np.arange(chunk)
    px = jnp.asarray(idxs % W, jnp.int32)
    py = jnp.asarray(idxs // W, jnp.int32)
    args = (sa, prep, wvn, px, py, jnp.ones((chunk,), bool), cells,
            jnp.zeros((1,), jnp.int32), jnp.ones((1,), bool),
            jax.random.PRNGKey(0))
    ms, by_src = device_time(lambda *a: renderer(*a), *args, iters=3,
                             by_source=True)
    print(f"[breakdown] chunk={chunk}px 1 sample: {ms:.1f} ms device",
          file=sys.stderr)
    for src, v in list(by_src.items())[:14]:
        print(f"[breakdown]   {v:8.2f} ms  {src}", file=sys.stderr)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
