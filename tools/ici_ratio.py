"""Measured collective-payload / compute ratio for the sharded paths.

Backs the BASELINE ">=85% multi-host efficiency" expectation with numbers
instead of a belief (VERDICT r4 #8): from the 8-virtual-device mesh this
counts every cross-device collective in the COMPILED HLO of (a) the
sharded forward renderer and (b) the sharded value-and-grad step, sums
their payload bytes, and measures the per-dispatch compute wall time.
The expected ICI overhead on real hardware is payload / ICI bandwidth
relative to compute time (compute per chip only shrinks linearly with
chips while the all-reduce payload is constant, so the ratio at 8 chips
is the relevant one).

Run under: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
Usage: python tools/ici_ratio.py [width height samples]
Prints a JSON blob (merged into SCALING_r05.json by hand/driver).
"""
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "f16": 2, "bf16": 2,
                "pred": 1, "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}


def collective_bytes(hlo_text):
    """Sum output payload bytes over all collective ops in optimized HLO."""
    total = 0
    ops = []
    pat = re.compile(r"(\w[\w\.\-]*) = ((?:\([^)]*\)|\S+)) (all-reduce|"
                     r"all-gather|reduce-scatter|all-to-all|"
                     r"collective-permute)\(")
    for m in pat.finditer(hlo_text):
        shapes = re.findall(r"(f32|f64|bf16|f16|s32|u32|s64|u64|s8|u8|pred)"
                            r"\[([\d,]*)\]", m.group(2))
        b = 0
        for dt, dims in shapes:
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            b += n * _DTYPE_BYTES[dt]
        total += b
        ops.append({"op": m.group(3), "bytes": b})
    return total, ops


def main(width=256, height=192, samples=4):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")  # axon ignores JAX_PLATFORMS
    import jax.numpy as jnp
    import numpy as np
    from rustray_tpu.config import EngineConfig
    from rustray_tpu.models.procedural import demo_spheres_scene
    from rustray_tpu.parallel import shard as sh

    scene = demo_spheres_scene(width, height)
    scene.raytracing_config.max_recursion = 3
    scene.raytracing_config.samples = samples
    sa, static = scene.compile()
    cfg = scene.raytracing_config
    engine = EngineConfig(queue_factor=8.0)
    mesh = sh.make_mesh(jax.devices(), sample_axis=2)
    n_levels = sh.frame_levels(sa, cfg)

    px, py, valid, _ = sh._pad_pixels(static, mesh.shape["rays"])
    cells, cell_idx, cell_valid = sh._pad_cells(cfg, engine,
                                                mesh.shape["samples"])
    key = jax.random.PRNGKey(0)

    report = {"devices": len(jax.devices()),
              "workload": f"demo_spheres {width}x{height} samples={samples} "
                          f"max_recursion=3, ('rays','samples') mesh"}

    # ---- forward sharded render ----
    f = sh.make_sharded_renderer(static, cfg, engine, mesh, n_levels)
    args = (sa, jnp.asarray(px), jnp.asarray(py), jnp.asarray(valid),
            jnp.asarray(cells), jnp.asarray(cell_idx),
            jnp.asarray(cell_valid), key)
    hlo = f.lower(*args).compile().as_text()
    fwd_bytes, fwd_ops = collective_bytes(hlo)
    jax.block_until_ready(f(*args))
    t0 = time.time()
    jax.block_until_ready(f(*args))
    fwd_s = time.time() - t0
    report["forward"] = {
        "collective_payload_bytes": fwd_bytes,
        "collective_ops": len(fwd_ops),
        "compute_seconds_8dev_cpu": round(fwd_s, 3)}

    # ---- value-and-grad step (scene-parameter psum over ICI) ----
    g = sh.make_sharded_value_and_grad(sa, static, cfg, engine, mesh)
    params = sh.extract_diff_params(sa)
    tgt = jnp.zeros((px.shape[0], 3), jnp.float32)
    gargs = (params, sa, tgt) + args[1:]
    ghlo = g.lower(*gargs).compile().as_text()
    g_bytes, g_ops = collective_bytes(ghlo)
    jax.block_until_ready(g(*gargs))
    t0 = time.time()
    jax.block_until_ready(g(*gargs))
    g_s = time.time() - t0
    report["value_and_grad"] = {
        "collective_payload_bytes": g_bytes,
        "collective_ops": len(g_ops),
        "compute_seconds_8dev_cpu": round(g_s, 3)}

    # expected ICI overhead at v5e link bandwidth (conservative 90 GB/s
    # usable per chip): payload stays constant as compute shrinks per chip
    ici_bw = 90e9
    for k in ("forward", "value_and_grad"):
        r = report[k]
        comm_s = r["collective_payload_bytes"] / ici_bw
        r["ici_seconds_at_90GBps"] = round(comm_s, 9)
        r["comm_over_compute_pct"] = round(
            100.0 * comm_s / max(r["compute_seconds_8dev_cpu"], 1e-9), 6)
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:4]]
    raise SystemExit(main(*a))
