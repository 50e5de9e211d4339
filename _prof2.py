import time
import numpy as np, jax, jax.numpy as jnp
from rustray_tpu.models.procedural import bench_scene
from rustray_tpu.ops.intersect import prepare_triangles, closest_tri, INF
from rustray_tpu.ops.traverse import instance_mask
from rustray_tpu.ops.cluster_trace import world_cluster_aabbs, recompute_t
from rustray_tpu.ops.pallas_trace import trace_tris_pallas

scene = bench_scene(grid=4, width=1280, height=720, monte_carlo=True, samples=4)
sa, static = scene.compile()
print("tris", static.n_tris, "clusters", static.n_clusters, "K", static.cluster_size)

N = 32768
key = jax.random.PRNGKey(0)
# mix of coherent-ish rays: origins near camera, directions toward scene
o = jax.random.normal(key, (N,3)) * 0.3 + jnp.array([0.,2.,8.])
tgt = jax.random.normal(jax.random.fold_in(key,1), (N,3)) * 2.0
d = tgt - o; d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

prep = jax.jit(prepare_triangles)(sa)
boxes = jax.jit(world_cluster_aabbs)(sa)

inst_ok = instance_mask(sa, False, True)
tri_ok = sa.tri_valid & inst_ok[sa.tri_inst]
cl_ok = sa.cl_valid & inst_ok[sa.cl_inst]

f_dense = jax.jit(lambda o,d: closest_tri(o, d, prep, tri_ok, 2048))
f_pl = jax.jit(lambda o,d: trace_tris_pallas(o, d, prep, tri_ok, boxes[0], boxes[1], cl_ok, static.cluster_size, block_n=512))

t_d, i_d = f_dense(o, d)
found_p, i_p = f_pl(o, d)
t_p = jax.jit(lambda o,d,i,f: recompute_t(o,d,prep,i,f))(o, d, i_p, found_p)

t_d, i_d, t_p, i_p, found_p = map(np.asarray, (t_d, i_d, t_p, i_p, found_p))
hit_d = t_d < 3e38
print("hits dense", hit_d.sum(), "pallas", found_p.sum(), "agree", (hit_d==found_p).mean())
both = hit_d & found_p
print("t allclose:", np.allclose(t_d[both], t_p[both], rtol=1e-5, atol=1e-6))
dt = np.abs(t_d[both]-t_p[both])
print("max |dt|", dt.max() if both.any() else 0, "idx match", (i_d[both]==i_p[both]).mean())

def bench(fn, *a, n=5):
    r = fn(*a); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(n): r = fn(*a)
    jax.block_until_ready(r)
    return (time.time()-t0)/n
td = bench(f_dense, o, d)
tp = bench(f_pl, o, d)
print("dense  %.4fs  %.2f Mrays/s" % (td, N/td/1e6))
print("pallas %.4fs  %.2f Mrays/s" % (tp, N/tp/1e6))
