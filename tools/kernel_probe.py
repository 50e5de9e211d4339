"""Wall-clock vs xplane time for the Pallas trace kernel alone."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rustray_tpu.models.procedural import ensure_bench_assets
    from rustray_tpu.ops.block_trace import pack_cluster_tris, trace_tris_blocks
    from rustray_tpu.ops.cluster_trace import world_cluster_aabbs
    from rustray_tpu.ops import rays as rays_ops
    from rustray_tpu.ops.intersect import prepare_triangles
    from rustray_tpu.scene.scene import Scene
    from tools.devbench import device_time

    json_path = ensure_bench_assets(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "data", "bench"),
        grid=6, lat=52, lon=68, width=1280, height=720, samples=4,
        monte_carlo=True)
    scene = Scene()
    scene.load(json_path)
    scene.cam.init(1280, 720)
    scene.init()
    scene.update()
    sa, static = scene.compile()
    sa = jax.device_put(sa)
    prep = prepare_triangles(sa)
    prep = prep.replace(pallas_pack=jax.jit(
        pack_cluster_tris, static_argnums=(2, 3, 4))(
        prep, sa.tri_valid, static.n_clusters, static.cluster_size,
        int(sa.cl_lo.shape[0])))
    w_lo, w_hi = jax.jit(world_cluster_aabbs)(sa)
    cl_ok = jnp.asarray(sa.cl_valid)
    n = 98304
    idxs = np.arange(n)
    px = jnp.asarray(idxs % 1280, jnp.int32)
    py = jnp.asarray(idxs // 1280, jnp.int32)
    o, d = jax.jit(lambda c, px, py: rays_ops.primary_rays(
        c, 1280, 720, px, py, jnp.int32(0), jnp.int32(0), 1, 1.0, 1.0, 1))(
        sa.camera, px, py)
    from rustray_tpu.ops.intersect import safe_normalize
    d = jax.jit(safe_normalize)(d)
    alive = jnp.ones((n,), bool)

    for bn in (128, 256, 512):
        f = jax.jit(lambda o, d, alive, bn=bn: trace_tris_blocks(
            o, d, alive, None, prep, w_lo, w_hi, cl_ok,
            static.cluster_size, block_n=bn))
        r = f(o, d, alive)
        jax.block_until_ready(r)
        t0 = time.time()
        iters = 3
        for _ in range(iters):
            r = f(o, d, alive)
        jax.block_until_ready(r)
        wall = (time.time() - t0) / iters * 1000
        dev = device_time(f, o, d, alive, iters=3)
        print(f"block_n={bn}: wall {wall:8.1f} ms   xplane 'XLA Ops' {dev:8.1f} ms")


if __name__ == "__main__":
    main()
