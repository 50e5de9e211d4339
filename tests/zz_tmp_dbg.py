import numpy as np
from rustray_tpu.config import EngineConfig
from rustray_tpu.render.wavefront import render, make_chunk_renderer, _prepare
from rustray_tpu.scene.material import Material
from rustray_tpu.scene.scene import Scene
from rustray_tpu.scene.shapes import Sphere
from rustray_tpu.scene.light import LightType
import jax, jax.numpy as jnp

def test_dbg():
    print("devices:", jax.devices())
    scene = Scene()
    m = Material(id=scene.get_next_id(), name="glass")
    m.base_color = np.array([0.4, 0.7, 0.9], np.float32)
    m.reflectivity = 0.5; m.alpha = 0.5; m.refraction_index = 1.5
    s = Sphere("big", m, 0.0, 0.0, -5.0, 3.0)
    s.basic.id = scene.get_next_id()
    scene.items.append(s); scene.materials.append(m)
    scene.add_light("key", (-4.0, 8.0, 2.0), (0,-1,0), (1,1,1), 200.0,
                    np.pi/2, LightType.Point)
    scene.cam.init(32, 24)
    scene.raytracing_config.max_recursion = 3
    scene.init(); scene.update()
    sa, static = scene.compile()
    cfg = scene.raytracing_config
    eng = EngineConfig(queue_factor=1.0, chunk_pixels=4096)
    prep, wvn = _prepare(sa)
    rend = make_chunk_renderer(static, cfg, eng, 4)
    n = 32*24
    px = jnp.asarray(np.arange(n) % 32, jnp.int32)
    py = jnp.asarray(np.arange(n) // 32, jnp.int32)
    out = rend(sa, prep, wvn, px, py, jnp.ones((n,), bool),
               jnp.zeros((1,2), jnp.int32), jnp.zeros((1,), jnp.int32),
               jnp.ones((1,), bool), jax.random.PRNGKey(0))
    print("n_out:", len(out), "dropped:", int(out[-1]))
