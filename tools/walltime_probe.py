"""Where does frame wall-clock go? Times dispatch vs fetch vs transfer
through the (tunneled) TPU for the bench chunk configuration."""
import os
import sys
import time

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

    width, height, samples = 1280, 720, 4
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
    chunk = engine.chunk_pixels

    sa = jax.device_put(sa)
    prep, wvn = _prepare(sa)
    from rustray_tpu.ops.block_trace import pack_cluster_tris
    prep = prep.replace(pallas_pack=jax.jit(
        pack_cluster_tris, static_argnums=(2, 3, 4))(
        prep, sa.tri_valid, static.n_clusters, static.cluster_size,
        int(sa.cl_lo.shape[0])))
    prep = jax.block_until_ready(prep)
    n_levels = 1 + cfg.max_recursion
    rend = make_chunk_renderer(static, cfg, engine, n_levels)
    cells = jnp.asarray(sample_pattern(cfg.samples, engine.seed), jnp.int32)
    cell_idx = jnp.arange(cells.shape[0], dtype=jnp.int32)
    cell_valid = jnp.ones((cells.shape[0],), bool)
    key = jax.random.PRNGKey(0)
    n_pix = width * height

    def args_for(start):
        idx = np.arange(start, start + chunk)
        valid = idx < n_pix
        idx_c = np.minimum(idx, n_pix - 1)
        px = jnp.asarray(idx_c % width, jnp.int32)
        py = jnp.asarray(idx_c // width, jnp.int32)
        return (sa, prep, wvn, px, py, jnp.asarray(valid), cells, cell_idx,
                cell_valid, jax.random.fold_in(key, start))

    # warmup / compile
    out = rend(*args_for(0))
    jax.block_until_ready(out)

    starts = list(range(0, n_pix, chunk))
    t0 = time.time()
    argsets = [args_for(s) for s in starts]
    t1 = time.time()
    outs = [rend(*a) for a in argsets]
    t2 = time.time()
    jax.block_until_ready(outs)
    t3 = time.time()
    host = [[np.asarray(x) for x in o] for o in outs]
    t4 = time.time()
    print(f"chunks: {len(starts)}")
    print(f"arg build+transfer : {t1-t0:7.3f} s")
    print(f"dispatch (async)   : {t2-t1:7.3f} s")
    print(f"device completion  : {t3-t2:7.3f} s")
    print(f"fetch to host      : {t4-t3:7.3f} s")
    print(f"total              : {t4-t0:7.3f} s")

    # single-arg-transfer timing detail
    t5 = time.time()
    a = args_for(0)
    jax.block_until_ready([x for x in a if hasattr(x, 'block_until_ready')])
    t6 = time.time()
    print(f"one argset build+put (blocked): {t6-t5:.3f} s")


if __name__ == "__main__":
    main()
