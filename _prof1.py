import os, time
import numpy as np, jax, jax.numpy as jnp
from rustray_tpu.config import EngineConfig
from rustray_tpu.models.procedural import bench_scene
from rustray_tpu.ops.intersect import prepare_triangles
from rustray_tpu.ops.traverse import trace_closest
from rustray_tpu.ops.cluster_trace import world_cluster_aabbs

scene = bench_scene(grid=4, width=1280, height=720, monte_carlo=True, samples=4)
scene.raytracing_config.max_recursion = 4
sa, static = scene.compile()
print("tris", static.n_tris, "clusters", static.n_clusters, "spheres", static.n_spheres, "lights", sa.lights.pos.shape[0])

N = 32768
key = jax.random.PRNGKey(0)
o = jax.random.normal(key, (N,3)) * 0.1 + jnp.array([0.,2.,8.])
d = -o / jnp.linalg.norm(o, axis=-1, keepdims=True)

prep = jax.jit(prepare_triangles)(sa)
boxes = jax.jit(world_cluster_aabbs)(sa)

def bench(fn, *args, n=3):
    r = fn(*args); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.time()-t0)/n

f_dense = jax.jit(lambda sa,prep,o,d: trace_closest(sa, static, prep, o, d, for_shadow=False, allow_reflection_only=True, accel_boxes=None))
f_accel = jax.jit(lambda sa,prep,o,d,boxes: trace_closest(sa, static, prep, o, d, for_shadow=False, allow_reflection_only=True, accel_boxes=boxes, accel_block=1024, accel_gather=32))
t_dense = bench(f_dense, sa, prep, o, d)
print("dense trace 32768 rays: %.4f s -> %.2f Mrays/s" % (t_dense, N/t_dense/1e6))
t_accel = bench(f_accel, sa, prep, o, d, boxes)
print("accel trace 32768 rays: %.4f s -> %.2f Mrays/s" % (t_accel, N/t_accel/1e6))
