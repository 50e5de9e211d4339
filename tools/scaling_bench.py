"""Device-scaling measurement for the sharded renderer.

Runs the full-frame sharded render (parallel/shard.render_sharded) at 1, 2,
4 and 8 virtual CPU devices — each count in a fresh process so XLA_FLAGS
takes effect — and reports wall-clock per steady-state frame plus scaling
efficiency vs the 1-device run.

Caveat printed with the numbers: virtual CPU devices share this host's
physical cores, so wall-clock efficiency saturates at the core count and
the cross-device psum runs over shared memory; the number validates the
sharding mechanism and is a lower bound for real multi-chip ICI scaling.

Usage: python tools/scaling_bench.py [width height samples]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r'''
import os, sys, time, json
n = int(sys.argv[1]); W = int(sys.argv[2]); H = int(sys.argv[3]); S = int(sys.argv[4])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={n}").strip()
sys.path.insert(0, os.getcwd())
import jax
jax.config.update("jax_platforms", "cpu")
from rustray_tpu.config import EngineConfig
from rustray_tpu.models.procedural import demo_spheres_scene
from rustray_tpu.parallel.shard import make_mesh, render_sharded
scene = demo_spheres_scene(W, H)
scene.raytracing_config.max_recursion = 3
scene.raytracing_config.samples = S
sa, static = scene.compile()
cfg = scene.raytracing_config
engine = EngineConfig(queue_factor=8.0)
sample_axis = 2 if (S % 2 == 0 and n % 2 == 0 and n > 1) else 1
mesh = make_mesh(jax.devices(), sample_axis=sample_axis)
render_sharded(sa, static, cfg, engine, mesh)      # compile
t0 = time.time(); render_sharded(sa, static, cfg, engine, mesh)
dt = time.time() - t0
print(json.dumps({"n": n, "seconds": dt}))
'''


def main(width=256, height=192, samples=4):
    results = {}
    for n in (1, 2, 4, 8):
        out = subprocess.run(
            [sys.executable, "-c", WORKER, str(n), str(width), str(height),
             str(samples)],
            capture_output=True, text=True, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))))
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"n={n}: FAILED\n{out.stderr[-2000:]}")
            return 1
        r = json.loads(line[-1])
        results[n] = r["seconds"]
        base = results[1]
        eff = base / (n * r["seconds"]) * 100.0
        print(f"devices={n}: {r['seconds']:.2f} s/frame  "
              f"speedup={base / r['seconds']:.2f}x  efficiency={eff:.0f}%")
    ncpu = os.cpu_count()
    print(f"(virtual devices share {ncpu} physical cores; efficiency "
          f"saturates at ~{ncpu} devices on this host)")
    return 0


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    sys.exit(main(*args))
