"""Multi-device tests on the 8-virtual-CPU mesh (conftest sets
--xla_force_host_platform_device_count=8): sharded render parity vs the
single-device path, and sharded scene-parameter gradients."""
import jax
import numpy as np
import pytest

import rustray_tpu as rt
from rustray_tpu.models.procedural import demo_spheres_scene
from rustray_tpu.parallel.shard import (apply_diff_params, extract_diff_params,
                                        make_mesh, render_loss_and_grad,
                                        render_sharded)

from conftest import assert_images_close


@pytest.fixture(scope="module")
def small_scene():
    scene = demo_spheres_scene(16, 12)
    scene.raytracing_config.max_recursion = 2
    scene.raytracing_config.samples = 2
    sa, static = scene.compile()
    return scene, sa, static


def test_devices_available():
    assert len(jax.devices()) == 8
    assert jax.default_backend() == "cpu"


def test_sharded_render_matches_single_device(small_scene):
    scene, sa, static = small_scene
    cfg = scene.raytracing_config
    engine = rt.EngineConfig(queue_factor=8.0)
    ref = rt.render(sa, static, cfg, engine)

    mesh = make_mesh(jax.devices(), sample_axis=2)
    out = render_sharded(sa, static, cfg, engine, mesh)
    assert_images_close(out["color"], ref["color"], atol=1e-5, frac=1.0,
                        name="sharded color")
    np.testing.assert_allclose(out["depth"], ref["depth"], atol=1e-4)
    np.testing.assert_array_equal(out["object_id"], ref["object_id"])


def test_sharded_render_rays_only_mesh(small_scene):
    scene, sa, static = small_scene
    cfg = scene.raytracing_config
    engine = rt.EngineConfig(queue_factor=8.0)
    ref = rt.render(sa, static, cfg, engine)
    mesh = make_mesh(jax.devices()[:4], sample_axis=1)
    out = render_sharded(sa, static, cfg, engine, mesh)
    assert_images_close(out["color"], ref["color"], atol=1e-5, frac=1.0,
                        name="rays-mesh color")


def test_sharded_gradients_finite_and_reduce(small_scene):
    scene, sa, static = small_scene
    cfg = scene.raytracing_config
    engine = rt.EngineConfig(queue_factor=8.0)
    mesh = make_mesh(jax.devices(), sample_axis=2)
    target = np.zeros((static.height, static.width, 3), np.float32)
    loss, grads = render_loss_and_grad(sa, static, cfg, target, engine, mesh)
    assert np.isfinite(float(loss)) and float(loss) > 0.0
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # base-color gradient must be nonzero (image depends on it)
    g_base = np.asarray(grads["materials"]["base_color"])
    assert np.abs(g_base).max() > 0.0


def test_gradient_matches_finite_difference(small_scene):
    """Pixel-gradient parity: autodiff vs central finite differences on a
    material parameter (BASELINE.md correctness criterion)."""
    scene, sa, static = small_scene
    cfg = scene.raytracing_config
    engine = rt.EngineConfig(queue_factor=8.0)
    mesh = make_mesh(jax.devices()[:1], sample_axis=1)
    target = np.zeros((static.height, static.width, 3), np.float32)

    loss0, grads = render_loss_and_grad(sa, static, cfg, target, engine, mesh)
    g = float(np.asarray(grads["materials"]["reflectivity"])[0])

    eps = 1e-3
    def loss_at(delta):
        refl = np.asarray(sa.materials.reflectivity).copy()
        refl[0] += delta
        sa2 = sa.replace(materials=sa.materials.replace(
            reflectivity=jax.numpy.asarray(refl)))
        l, _ = render_loss_and_grad(sa2, static, cfg, target, engine, mesh)
        return float(l)

    fd = (loss_at(eps) - loss_at(-eps)) / (2 * eps)
    assert np.isclose(g, fd, rtol=5e-2, atol=1e-4), (g, fd)


def test_param_update_changes_render(small_scene):
    scene, sa, static = small_scene
    cfg = scene.raytracing_config
    engine = rt.EngineConfig(queue_factor=8.0)
    params = extract_diff_params(sa)
    params["materials"]["base_color"] = params["materials"]["base_color"] * 0.5
    sa2 = apply_diff_params(sa, params)
    a = rt.render(sa, static, cfg, engine)
    b = rt.render(sa2, static, cfg, engine)
    assert np.abs(a["color"] - b["color"]).max() > 1e-3


def test_sharded_low_queue_auto_raises(capsys):
    """Sharded drop handling must match render(): auto-raise + re-render
    until the full Whitted tree fits (VERDICT r3 item 6)."""
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

    mesh = make_mesh(jax.devices()[:4], sample_axis=1)
    full = render_sharded(sa, static, cfg,
                          rt.EngineConfig(queue_factor=8.0), mesh)
    low = render_sharded(sa, static, cfg,
                         rt.EngineConfig(queue_factor=1.0), mesh)
    out = capsys.readouterr().out
    assert "re-rendering sharded chunk" in out
    np.testing.assert_allclose(low["color"], full["color"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(low["object_id"], full["object_id"])


def test_sharded_chunked_720p_smoke(small_scene):
    """A realistic-resolution sharded render must fit memory by chunking
    (VERDICT r3 item 9): 1280x720 at 4 samples over the 8-device mesh with
    chunk_pixels small enough to force multiple sharded dispatches."""
    scene = demo_spheres_scene(1280, 720)
    # max_recursion 0 keeps the CPU cost of 3.7M samples tractable; the
    # chunked dispatch, psum reduction and drop accounting paths are
    # identical at any depth
    scene.raytracing_config.max_recursion = 0
    scene.raytracing_config.samples = 4
    sa, static = scene.compile()
    cfg = scene.raytracing_config
    mesh = make_mesh(jax.devices(), sample_axis=2)   # 4 ray shards
    engine = rt.EngineConfig(queue_factor=4.0, chunk_pixels=65536)
    out = render_sharded(sa, static, cfg, engine, mesh)   # 4 chunks
    assert out["color"].shape == (720, 1280, 3)
    assert np.isfinite(out["color"]).all()
    assert (out["color"].sum(-1) > 0).mean() > 0.2
    assert out["device_rays"] > 1280 * 720 * 4


def test_sharded_deep_tree_midres_exact(capsys):
    """Mid-resolution sharded render with a DEEP Whitted tree and forced
    drops (VERDICT r4 #7): 320x180, depth >= 3, queue factor low enough to
    trigger the auto-raise, chunked into multiple sharded dispatches —
    must match the single-chip image exactly."""
    from rustray_tpu.scene.light import LightType
    from rustray_tpu.scene.material import Material
    from rustray_tpu.scene.scene import Scene
    from rustray_tpu.scene.shapes import Sphere

    # a frame-filling glass sphere branches 2x per bounce (reflection +
    # refraction), so queue_factor=1 must drop and auto-raise
    scene = Scene()
    m = Material(id=scene.get_next_id(), name="glass")
    m.base_color = np.array([0.4, 0.7, 0.9], np.float32)
    m.reflectivity = 0.5
    m.alpha = 0.5
    m.refraction_index = 1.5
    s = Sphere("big", m, 0.0, 0.0, -5.0, 4.8)
    s.basic.id = scene.get_next_id()
    scene.items.append(s)
    scene.materials.append(m)
    scene.add_light("key", (-4.0, 8.0, 2.0), (0, -1, 0), (1, 1, 1), 200.0,
                    np.pi / 2, LightType.Point)
    scene.cam.init(320, 180)
    scene.raytracing_config.max_recursion = 3
    scene.raytracing_config.samples = 2
    scene.init()
    scene.update()
    sa, static = scene.compile()
    cfg = scene.raytracing_config

    ref = rt.render(sa, static, cfg, rt.EngineConfig(queue_factor=8.0))

    mesh = make_mesh(jax.devices(), sample_axis=2)   # 4 ray shards
    engine = rt.EngineConfig(queue_factor=1.0, chunk_pixels=8192)  # 2 chunks
    out = render_sharded(sa, static, cfg, engine, mesh)
    printed = capsys.readouterr().out
    assert "re-rendering sharded chunk" in printed
    assert_images_close(out["color"], ref["color"], atol=1e-5, frac=1.0,
                        name="deep sharded color")
    np.testing.assert_allclose(out["depth"], ref["depth"], atol=1e-4)
    np.testing.assert_array_equal(out["object_id"], ref["object_id"])
