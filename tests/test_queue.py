"""Queue-capacity semantics (VERDICT r1 item 5): live secondary rays beyond
the per-level cap are dropped lowest-weight-first and COUNTED, and
``render()`` auto-raises the cap so the default config reproduces the
reference's full Whitted tree (src/raytracing.rs:938-975)."""
import numpy as np

from rustray_tpu.config import EngineConfig
from rustray_tpu.models.procedural import demo_spheres_scene
from rustray_tpu.render.wavefront import render


def test_default_config_matches_full_tree(capsys):
    scene = demo_spheres_scene(48, 36)
    scene.raytracing_config.max_recursion = 6
    sa, static = scene.compile()
    cfg = scene.raytracing_config

    full = render(sa, static, cfg, EngineConfig(queue_factor=64.0,
                                                chunk_pixels=2048))
    dflt = render(sa, static, cfg, EngineConfig(chunk_pixels=2048))
    np.testing.assert_allclose(dflt["color"], full["color"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(dflt["object_id"], full["object_id"])


def test_low_queue_auto_raises(capsys):
    # a view-filling glass sphere: every hit spawns reflection AND
    # refraction, so queue_factor=1.0 must drop → auto-raise → exact result
    from rustray_tpu.scene.light import LightType
    from rustray_tpu.scene.material import Material
    from rustray_tpu.scene.scene import Scene
    from rustray_tpu.scene.shapes import Sphere

    scene = Scene()
    m = Material(id=scene.get_next_id(), name="glass")
    m.base_color = np.array([0.4, 0.7, 0.9], np.float32)
    m.reflectivity = 0.5
    m.alpha = 0.5
    m.refraction_index = 1.5
    # radius 4.8 at z=-5 with the default 90-degree fov: the sphere covers
    # every pixel, so level 1 spawns 2 live children per primary ray and
    # queue_factor=1.0 must drop half of them
    s = Sphere("big", m, 0.0, 0.0, -5.0, 4.8)
    s.basic.id = scene.get_next_id()
    scene.items.append(s)
    scene.materials.append(m)
    scene.add_light("key", (-4.0, 8.0, 2.0), (0, -1, 0), (1, 1, 1), 200.0,
                    np.pi / 2, LightType.Point)
    scene.cam.init(32, 24)
    scene.raytracing_config.max_recursion = 3
    scene.init()
    scene.update()
    sa, static = scene.compile()
    cfg = scene.raytracing_config

    full = render(sa, static, cfg, EngineConfig(queue_factor=8.0,
                                                chunk_pixels=4096))
    low = render(sa, static, cfg, EngineConfig(queue_factor=1.0,
                                               chunk_pixels=4096))
    out = capsys.readouterr().out
    assert "re-rendering chunk" in out
    np.testing.assert_allclose(low["color"], full["color"],
                               rtol=1e-5, atol=1e-6)
