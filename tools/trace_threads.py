"""Dump per-thread device-time totals from a profiler trace of one chunk —
verifies what devbench's 'XLA Ops' filter misses (e.g. Mosaic kernels)."""
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

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
    engine = EngineConfig(queue_factor=2.0, chunk_pixels=98304)
    chunk = engine.chunk_pixels
    sa = jax.device_put(sa)
    prep, wvn = _prepare(sa)
    from rustray_tpu.ops.block_trace import pack_cluster_tris
    prep = prep.replace(pallas_pack=jax.jit(
        pack_cluster_tris, static_argnums=(2, 3, 4))(
        prep, sa.tri_valid, static.n_clusters, static.cluster_size,
        int(sa.cl_lo.shape[0])))
    rend = make_chunk_renderer(static, cfg, engine, 1 + cfg.max_recursion)
    cells = jnp.asarray(sample_pattern(1, 0)[:1])
    idxs = np.arange(chunk)
    args = (sa, prep, wvn, jnp.asarray(idxs % width, jnp.int32),
            jnp.asarray(idxs // width, jnp.int32), jnp.ones((chunk,), bool),
            cells, jnp.zeros((1,), jnp.int32), jnp.ones((1,), bool),
            jax.random.PRNGKey(0))
    out = rend(*args)
    jax.block_until_ready(out)

    tmp = tempfile.mkdtemp(prefix="tt")
    jax.profiler.start_trace(tmp)
    out = rend(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    files = glob.glob(os.path.join(tmp, "**", "*.trace.json.gz"), recursive=True)
    with gzip.open(files[0]) as f:
        data = json.load(f)
    pids = {e["pid"]: e["args"]["name"] for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {(e["pid"], e["tid"]): e["args"]["name"] for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    per_thread = collections.Counter()
    names = collections.Counter()
    for e in data["traceEvents"]:
        if e.get("ph") != "X":
            continue
        p = pids.get(e.get("pid"), "?")
        t = tids.get((e["pid"], e["tid"]), "?")
        per_thread[(p, t)] += e.get("dur", 0)
        if "TPU" in p and t != "XLA Ops":
            names[(t, e.get("name", "?")[:60])] += e.get("dur", 0)
    print("=== per (process, thread) total ms ===")
    for (p, t), v in per_thread.most_common(20):
        print(f"  {v/1000.0:9.1f} ms  {p} / {t}")
    print("=== non-'XLA Ops' TPU events ===")
    for (t, n), v in names.most_common(20):
        print(f"  {v/1000.0:9.1f} ms  [{t}] {n}")


if __name__ == "__main__":
    main()
