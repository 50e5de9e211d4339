import json
import os
import struct

import numpy as np
import pytest

import rustray_tpu as rt
from rustray_tpu.scene.light import LightType
from rustray_tpu.scene.material import TextureType
from rustray_tpu.scene.shapes import Mesh, Sphere


def test_spheres_json(reference_scenes):
    scene = rt.Scene()
    ids = scene.load(os.path.join(reference_scenes, "spheres.json"))
    assert len(scene.items) == 8
    assert all(isinstance(i, Sphere) for i in scene.items)
    assert len(ids) == 8
    # camera section applied
    assert np.isclose(scene.cam.fov, np.radians(90))
    assert np.isclose(scene.cam.clipping_near, 0.1)
    # material parsing: sphere_mirror fully reflective
    mirror = scene.get_by_name("sphere_mirror")
    assert mirror is not None
    assert np.isclose(mirror.get_material().reflectivity, 1.0)
    # specular factor shortcut: specular = base * 0.8
    np.testing.assert_allclose(mirror.get_material().specular_color,
                               mirror.get_material().base_color * 0.8)
    # visible flag
    assert not scene.get_by_name("sphere_front").basic.visible
    # texture loaded on sphere_texture
    st = scene.get_by_name("sphere_texture")
    assert st.get_material().has_texture(TextureType.Base)


def test_floor_json_plane_and_lights(reference_scenes):
    scene = rt.Scene()
    scene.load(os.path.join(reference_scenes, "floor.json"))
    assert len(scene.items) == 1
    assert isinstance(scene.items[0], Mesh)
    assert scene.items[0].indices.shape == (2, 3)
    assert len(scene.lights) == 4
    kinds = [l.light_type for l in scene.lights]
    assert kinds.count(LightType.Directional) == 1
    assert kinds.count(LightType.Point) == 3
    # light color default + intensity
    assert scene.lights[0].intensity == 1.0


def test_environment_json_reflection_only(reference_scenes):
    scene = rt.Scene()
    scene.load(os.path.join(reference_scenes, "environment.json"))
    env = scene.get_by_name("environment")
    m = env.get_material()
    assert m.reflection_only
    assert not m.backface_culling  # via the reference's typo key
    assert m.has_texture(TextureType.AmbientEmissive)
    np.testing.assert_allclose(m.ambient_color, [1, 1, 1])


def test_monkey_obj(reference_scenes):
    scene = rt.Scene()
    scene.load(os.path.join(reference_scenes, "monkey.json"))
    meshes = [i for i in scene.items if isinstance(i, Mesh)]
    assert len(meshes) == 1
    m = meshes[0]
    assert m.indices.shape[0] > 900  # monkey has ~968 tris
    assert m.normals.shape[0] > 0
    # nested-scene overlay applied the parent's material diff + transform
    mat = m.get_material()
    assert np.isclose(mat.reflectivity, 0.5)
    assert np.isclose(mat.alpha, 0.5)
    assert np.isclose(mat.refraction_index, 1.5)
    assert not np.allclose(m.basic.trans, np.eye(4))


def test_kbert_obj_with_mtl(reference_scenes):
    scene = rt.Scene()
    scene.load(os.path.join(reference_scenes, "kbert.json"))
    meshes = [i for i in scene.items if isinstance(i, Mesh)]
    assert len(meshes) >= 1
    assert len(scene.lights) == 1
    assert scene.lights[0].light_type == LightType.Spot
    assert np.isclose(scene.lights[0].max_angle, np.radians(22.5))
    # MTL ambient override: ambient = base * 0.01 (src/scene.rs:1284)
    for m in meshes:
        mat = m.get_material()
        if mat.name:
            np.testing.assert_allclose(mat.ambient_color, mat.base_color * 0.01,
                                       atol=1e-6)


def _tiny_glb(tmp_path):
    """Build a minimal GLB: one triangle with normals+uvs, a point light."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (3, 1))
    uv = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    blob = pos.tobytes() + nrm.tobytes() + uv.tobytes() + idx.tobytes() + b"\x00\x00"
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"mesh": 0, "translation": [1.0, 0.0, 0.0]},
            {"extensions": {"KHR_lights_punctual": {"light": 0}},
             "translation": [0.0, 5.0, 0.0]},
        ],
        "extensions": {"KHR_lights_punctual": {"lights": [
            {"type": "point", "intensity": 50.0, "color": [1, 1, 1]}]}},
        "meshes": [{"name": "tri", "primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3, "material": 0}]}],
        "materials": [{"name": "mat", "pbrMetallicRoughness": {
            "baseColorFactor": [0.5, 0.25, 1.0, 0.75],
            "metallicFactor": 0.4, "roughnessFactor": 0.6}}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 3, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 24},
            {"buffer": 0, "byteOffset": 96, "byteLength": 6},
        ],
        "buffers": [{"byteLength": len(blob)}],
    }
    js = json.dumps(doc).encode()
    js += b" " * ((4 - len(js) % 4) % 4)
    total = 12 + 8 + len(js) + 8 + len(blob)
    glb = struct.pack("<4sII", b"glTF", 2, total)
    glb += struct.pack("<II", len(js), 0x4E4F534A) + js
    glb += struct.pack("<II", len(blob), 0x004E4942) + blob
    p = tmp_path / "tiny.glb"
    p.write_bytes(glb)
    return str(p)


def test_gltf_loader_tiny_glb(tmp_path):
    path = _tiny_glb(tmp_path)
    scene = rt.Scene()
    ids = scene.load(path)
    assert len(scene.items) == 1
    mesh = scene.items[0]
    assert isinstance(mesh, Mesh)
    assert mesh.indices.shape == (1, 3)
    # node translation baked into vertices
    np.testing.assert_allclose(mesh.vertices[0], [1, 0, 0], atol=1e-6)
    # uv v flipped at load
    np.testing.assert_allclose(mesh.uvs[0], [0, 1], atol=1e-6)
    # PBR→Phong mapping (src/scene.rs:909-915)
    m = mesh.get_material()
    np.testing.assert_allclose(m.base_color, [0.5, 0.25, 1.0])
    np.testing.assert_allclose(m.specular_color, np.array([0.5, 0.25, 1.0]) * 0.8)
    assert np.isclose(m.alpha, 0.75)
    assert np.isclose(m.reflectivity, 0.4 * 0.5)
    assert np.isclose(m.roughness, (1 / np.pi / 2) * 0.6)
    # point light with intensity/10
    assert len(scene.lights) == 1
    assert scene.lights[0].light_type == LightType.Point
    assert np.isclose(scene.lights[0].intensity, 5.0)
    np.testing.assert_allclose(scene.lights[0].pos, [0, 5, 0])


def test_config_and_animation_sections(reference_scenes):
    scene = rt.Scene()
    scene.load(os.path.join(reference_scenes, "helmet.json"))
    # config section (download of the GLB fails in airgap; config still loads)
    assert scene.raytracing_config.samples == 32
    assert np.isclose(scene.raytracing_config.focal_length, 20.0)
    assert scene.animation.enabled
    assert scene.animation.fps == 25
    assert len(scene.animation.keyframes) == 2
    assert scene.animation.keyframes[1].time == 6000
    # 25 fps * 6 s = 150 frames
    assert scene.animation.get_frames_amount_to_render() == 150


def test_glb_writer_roundtrip(tmp_path):
    """gltf_writer GLB → gltf_loader: geometry, PBR→Phong mapping, lights,
    camera all survive the round trip."""
    import numpy as np
    from rustray_tpu.scene.gltf_writer import write_glb
    from rustray_tpu.scene.scene import Scene

    tex = np.zeros((8, 8, 4), np.uint8)
    tex[..., 0] = 200
    tex[..., 3] = 255
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    tris = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    uvs = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    path = str(tmp_path / "rt.glb")
    write_glb(
        path,
        [dict(name="quad", positions=verts, indices=tris, normals=nrm,
              uvs=uvs, translation=(1.0, 2.0, 3.0),
              material=dict(name="m0", base_color=(0.5, 0.25, 1.0, 1.0),
                            metallic=0.6, roughness=0.4,
                            base_color_texture=tex))],
        lights=[dict(type="point", position=(1, 2, 3), color=(1, 1, 0),
                     intensity=100.0, name="pl"),
                dict(type="directional", direction=(0, -1, 0),
                     color=(1, 1, 1), intensity=2.0, name="sun")],
        camera=dict(eye=(0, 0, 5), dir=(0, 0, -1), up=(0, 1, 0),
                    yfov=1.2, znear=0.01, zfar=500.0))

    scene = Scene()
    ids = scene.load(path)
    assert ids
    meshes = [it for it in scene.items if hasattr(it, "indices")]
    assert len(meshes) == 1
    m = meshes[0]
    # loader emits a triangle soup (vertices duplicated per triangle) with
    # node transforms baked in
    assert m.indices.shape[0] == 2
    assert np.allclose(sorted(m.vertices[:, 2].tolist()), [3.0] * 6)
    mat = m.get_material()
    # PBR→Phong constants (src/scene.rs:909-915)
    assert np.allclose(mat.base_color, [0.5, 0.25, 1.0], atol=1e-5)
    assert np.allclose(mat.specular_color, np.array([0.5, 0.25, 1.0]) * 0.8,
                       atol=1e-5)
    assert abs(mat.reflectivity - 0.6 * 0.5) < 1e-5
    assert abs(mat.roughness - 0.4 / (2 * np.pi)) < 1e-5
    from rustray_tpu.scene.material import TextureType
    base_tex = mat.get_texture(TextureType.Base)
    assert base_tex is not None and base_tex[..., 0].max() == 200
    # lights: point intensity / 10 (src/scene.rs:747)
    kinds = {(l.name): l for l in scene.lights}
    assert abs(kinds["pl"].intensity - 10.0) < 1e-5
    assert np.allclose(kinds["pl"].pos, [1, 2, 3])
    assert abs(kinds["sun"].intensity - 2.0) < 1e-5
    assert np.allclose(kinds["sun"].dir, [0, -1, 0], atol=1e-5)
    # camera
    assert np.allclose(scene.cam.eye_pos, [0, 0, 5], atol=1e-5)
    assert np.allclose(scene.cam.dir, [0, 0, -1], atol=1e-5)
    assert abs(scene.cam.fov - 1.2) < 1e-5
