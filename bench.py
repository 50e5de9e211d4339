"""Benchmark harness: prints ONE JSON line with the headline metric.

Workload: sponza-class procedural scene (BASELINE.md parity config —
1280x720, monte_carlo, multi-bounce, textures, soft shadows) on the current
default JAX backend (TPU when available).

Metric: primary-ray throughput in Mrays/s (W*H*samples / wall-clock of the
steady-state frame, first frame discarded for compile).  ``vs_baseline`` is
the ratio against the 100 Mrays/s/chip north star from BASELINE.json.

Flags (env):
  BENCH_WIDTH/BENCH_HEIGHT/BENCH_SAMPLES/BENCH_GRID — workload overrides
  BENCH_SMALL=1 — tiny smoke configuration (CI / CPU)
"""
import json
import os
import sys
import time


def main():
    import jax
    import numpy as np
    from rustray_tpu.config import EngineConfig
    from rustray_tpu.models.procedural import bench_scene
    from rustray_tpu.render.wavefront import render

    small = os.environ.get("BENCH_SMALL") == "1"
    width = int(os.environ.get("BENCH_WIDTH", 160 if small else 1280))
    height = int(os.environ.get("BENCH_HEIGHT", 90 if small else 720))
    samples = int(os.environ.get("BENCH_SAMPLES", 1 if small else 4))
    grid = int(os.environ.get("BENCH_GRID", 2 if small else 4))

    scene = bench_scene(grid=grid, width=width, height=height,
                        monte_carlo=not small, samples=samples)
    scene.raytracing_config.max_recursion = 4
    sa, static = scene.compile()
    cfg = scene.raytracing_config
    engine = EngineConfig(queue_factor=2.0,
                          chunk_pixels=32768 if not small else 16384)

    n_tris = static.n_tris
    backend = jax.default_backend()

    # warmup (compile)
    render(sa, static, cfg, engine)
    t0 = time.time()
    render(sa, static, cfg, engine)
    elapsed = time.time() - t0

    n_primary = width * height * samples
    mrays = n_primary / elapsed / 1e6
    print(json.dumps({
        "metric": "primary_mrays_per_sec",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 4),
        "detail": {
            "backend": backend, "width": width, "height": height,
            "samples": samples, "tris": int(n_tris),
            "seconds_per_frame": round(elapsed, 3),
        },
    }))


if __name__ == "__main__":
    main()
