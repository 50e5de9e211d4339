"""Golden parity: wavefront TPU renderer vs the independent CPU oracle.

Small resolutions keep oracle cost low; max_recursion is trimmed where the
scene doesn't need depth 6 so device compile stays fast on the CI CPU.
"""
import os

import numpy as np
import pytest

import rustray_tpu as rt
from rustray_tpu.oracle import Oracle

from conftest import assert_images_close


def _setup(reference_scenes, name, w, h, max_recursion=None):
    scene = rt.Scene()
    scene.load(os.path.join(reference_scenes, name))
    if max_recursion is not None:
        scene.raytracing_config.max_recursion = max_recursion
    scene.cam.init(w, h)
    scene.find_and_set_default_env_if_needed()
    return scene


def _compare(scene, w, h, atol=1e-2, frac=0.995, queue_factor=16.0):
    sa, static = scene.compile()
    out = rt.render(sa, static, scene.raytracing_config,
                    rt.EngineConfig(queue_factor=queue_factor))
    orc = Oracle(scene, w, h).render_image()
    assert_images_close(out["color"], orc["color"], atol=atol, frac=frac,
                        name="color")
    assert_images_close(out["depth"], orc["depth"], atol=1e-3 * max(1.0, orc["depth"].max()),
                        frac=frac, name="depth")
    mism = (out["object_id"] != orc["object_id"]).mean()
    assert mism <= 1 - frac, f"object ids differ on {mism*100:.2f}% of pixels"
    return out, orc


def test_spheres_whitted_parity(reference_scenes):
    """Whitted: reflection, refraction, fresnel, solid casts, textures."""
    scene = _setup(reference_scenes, "spheres.json", 32, 24, max_recursion=2)
    _compare(scene, 32, 24)


def test_floor_textured_plane_parity(reference_scenes):
    """Plane mesh, base texture (bilinear), directional + point lights,
    reflectivity blend."""
    scene = _setup(reference_scenes, "floor.json", 32, 24, max_recursion=2)
    _compare(scene, 32, 24)


def test_fog_and_gamma(reference_scenes):
    scene = _setup(reference_scenes, "spheres.json", 16, 12, max_recursion=1)
    scene.raytracing_config.fog_density = 0.05
    scene.raytracing_config.gamma_correction = True
    out, orc = _compare(scene, 16, 12)
    np.testing.assert_array_equal(out["image"], orc["image"])


def test_monkey_mesh_smooth_shading_parity(reference_scenes):
    """OBJ mesh: smooth shading via loaded normals, alpha refraction,
    reflectivity, nested-scene transform."""
    scene = _setup(reference_scenes, "monkey.json", 24, 18, max_recursion=2)
    _compare(scene, 24, 18, frac=0.99)
