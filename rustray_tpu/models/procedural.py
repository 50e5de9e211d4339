"""Procedural scene generators (no file/network dependencies).

Used by benchmarks, the graft entry point, and sharding tests.  The bench
scene is sized to the sponza-class workload from BASELINE.md (hundreds of
thousands of triangles, textures, multiple lights, Monte-Carlo materials)
but fully self-contained since the reference's GLB assets are downloaded at
load time and unavailable in airgapped environments.
"""
from __future__ import annotations

import numpy as np

from ..config import RaytracingConfig
from ..scene.light import LightType
from ..scene.material import Material, TextureType
from ..scene.scene import Scene
from ..scene.shapes import Mesh, Sphere


def checkerboard_texture(size: int = 64, cells: int = 8) -> np.ndarray:
    y, x = np.mgrid[0:size, 0:size]
    c = (((x * cells // size) + (y * cells // size)) % 2).astype(np.uint8)
    img = np.zeros((size, size, 4), np.uint8)
    img[..., 0] = img[..., 1] = img[..., 2] = 64 + c * 160
    img[..., 3] = 255
    return img


def uv_sphere_mesh(name: str, material: Material, radius: float = 1.0,
                   lat: int = 16, lon: int = 24) -> Mesh:
    """UV-sphere triangle mesh with smooth normals and spherical UVs."""
    phis = np.linspace(0, np.pi, lat + 1)
    thetas = np.linspace(0, 2 * np.pi, lon + 1)
    verts, normals, uvs = [], [], []
    for i, phi in enumerate(phis):
        for j, theta in enumerate(thetas):
            n = np.array([np.sin(phi) * np.cos(theta), np.cos(phi),
                          np.sin(phi) * np.sin(theta)])
            verts.append(n * radius)
            normals.append(n)
            uvs.append([theta / (2 * np.pi), phi / np.pi])
    verts = np.asarray(verts, np.float32)
    normals = np.asarray(normals, np.float32)
    uvs = np.asarray(uvs, np.float32)
    tris = []
    w = lon + 1
    for i in range(lat):
        for j in range(lon):
            a, b = i * w + j, i * w + j + 1
            c, d = (i + 1) * w + j, (i + 1) * w + j + 1
            if i > 0:
                tris.append([a, c, b])
            if i < lat - 1:
                tris.append([b, c, d])
    tris = np.asarray(tris, np.int32)
    return Mesh(name, material, verts, tris, uvs, tris.copy(), normals, tris.copy())


def demo_spheres_scene(width: int = 64, height: int = 48) -> Scene:
    """Small analytic-sphere scene (flagship single-chip demo)."""
    scene = Scene()
    specs = [
        ((0.0, 0.0, -6.0), 1.5, (1.0, 0.2, 0.2), 0.3, 1.0),
        ((-3.0, 0.5, -8.0), 1.5, (0.2, 1.0, 0.2), 0.5, 0.8),
        ((3.0, -0.5, -7.0), 1.2, (0.2, 0.2, 1.0), 0.1, 0.6),
        ((0.0, 2.5, -9.0), 1.0, (1.0, 1.0, 1.0), 1.0, 1.0),
    ]
    for i, (pos, r, color, refl, alpha) in enumerate(specs):
        m = Material(id=scene.get_next_id(), name=f"mat{i}")
        m.base_color = np.asarray(color, np.float32)
        m.specular_color = m.base_color * np.float32(0.8)
        m.reflectivity = refl
        m.alpha = alpha
        m.refraction_index = 1.5
        s = Sphere(f"sphere{i}", m, *pos, r)
        s.basic.id = scene.get_next_id()
        scene.items.append(s)
        scene.materials.append(m)

    floor_mat = Material(id=scene.get_next_id(), name="floor")
    floor_mat.base_color = np.array([0.6, 0.6, 0.9], np.float32)
    floor_mat.reflectivity = 0.2
    floor_mat.set_texture(TextureType.Base, checkerboard_texture())
    floor = Mesh.new_plane("floor", floor_mat,
                           (-12, -2.5, 2), (12, -2.5, 2), (12, -2.5, -20), (-12, -2.5, -20))
    floor.basic.id = scene.get_next_id()
    scene.items.append(floor)
    scene.materials.append(floor_mat)

    scene.add_light("key", (-4.0, 8.0, 2.0), (0, -1, 0), (1, 1, 1), 300.0,
                    np.pi / 2, LightType.Point)
    scene.add_light("sun", (0, 0, 0), (1.0, -1.0, -0.5), (1, 1, 1), 0.6,
                    np.pi / 2, LightType.Directional)
    scene.cam.init(width, height)
    scene.init()
    scene.update()
    return scene


def uv_sphere_arrays(radius: float = 1.0, lat: int = 16, lon: int = 24):
    """Raw (verts, normals, uvs, tris) arrays of a UV sphere."""
    phis = np.linspace(0, np.pi, lat + 1)
    thetas = np.linspace(0, 2 * np.pi, lon + 1)
    pp, tt = np.meshgrid(phis, thetas, indexing="ij")
    normals = np.stack([np.sin(pp) * np.cos(tt), np.cos(pp),
                        np.sin(pp) * np.sin(tt)], axis=-1).reshape(-1, 3)
    verts = (normals * radius).astype(np.float32)
    uvs = np.stack([tt / (2 * np.pi), pp / np.pi], -1).reshape(-1, 2)
    tris = []
    w = lon + 1
    for i in range(lat):
        base = i * w + np.arange(lon)
        a, b_, c, d = base, base + 1, base + w, base + w + 1
        if i > 0:
            tris.append(np.stack([a, c, b_], 1))
        if i < lat - 1:
            tris.append(np.stack([b_, c, d], 1))
    tris = np.concatenate(tris).astype(np.int32)
    return verts, normals.astype(np.float32), uvs.astype(np.float32), tris


def ensure_bench_assets(out_dir: str, grid: int = 6, lat: int = 52,
                        lon: int = 68, width: int = 1280, height: int = 720,
                        samples: int = 4, monte_carlo: bool = True,
                        variant: str = "uniform") -> str:
    """Write (once) a sponza-class GLB (grid² dense UV-sphere meshes +
    floor, ≥200k triangles, textured PBR materials, KHR lights + camera)
    plus a scene JSON that references it — the same JSON→GLTF load path the
    reference uses for sponza (src/scene.rs:722-1124,
    /root/reference/scene/sponza.json).  Returns the JSON path.

    ``variant="skewed"`` (VERDICT r4 #6) de-risks the uniform stand-in's
    too-even cluster statistics: power-law mesh tessellations (a few huge
    meshes, many tiny ones), mixed triangle scales (radii 0.25-3.5) and
    large empty spans (meshes packed into two clumps), at a comparable
    total triangle count."""
    import json as _json
    import os

    os.makedirs(out_dir, exist_ok=True)
    tag = "" if variant == "uniform" else f"_{variant}"
    glb_path = os.path.join(out_dir,
                            f"sponza_class_g{grid}_{lat}x{lon}{tag}.glb")
    json_path = os.path.join(out_dir,
                             f"sponza_class_g{grid}_{lat}x{lon}{tag}.json")
    if not os.path.exists(glb_path):
        from ..scene.gltf_writer import write_glb
        rng = np.random.default_rng(7)
        tex = checkerboard_texture(128, 16)
        verts, normals, uvs, tris = uv_sphere_arrays(1.0, lat, lon)
        meshes = []
        n_balls = grid * grid
        if variant == "skewed":
            # power-law tessellation scale per mesh, normalized so the
            # total triangle count matches the uniform variant's
            u = rng.uniform(size=n_balls)
            scale = 0.15 + 3.0 * u ** 4
            scale *= np.sqrt(n_balls / np.sum(scale ** 2))
            radii = 0.25 + 3.25 * rng.uniform(size=n_balls) ** 2.5
            # two clumps separated by a large empty span
            centers = np.where(rng.uniform(size=(n_balls, 1)) < 0.7,
                               np.array([[-5.0, 0.0, -8.0]]),
                               np.array([[9.0, 0.0, -26.0]]))
            pos = centers + rng.normal(scale=2.2, size=(n_balls, 3)) \
                * np.array([1.0, 0.35, 1.0])
            pos[:, 1] = np.maximum(pos[:, 1], radii - 1.2)
        for b in range(n_balls):
            gx, gz = b // grid, b % grid
            if variant == "skewed":
                li = max(4, int(round(lat * scale[b])))
                lo_ = max(6, int(round(lon * scale[b])))
                v_b, n_b, uv_b, t_b = uv_sphere_arrays(
                    float(radii[b]), li, lo_)
                translation = tuple(float(x) for x in pos[b])
            else:
                v_b, n_b, uv_b, t_b = verts, normals, uvs, tris
                translation = (2.6 * (gx - (grid - 1) / 2), 0.0,
                               -6.0 - 2.6 * gz)
            meshes.append(dict(
                name=f"ball{gx}_{gz}", positions=v_b, indices=t_b,
                normals=n_b, uvs=uv_b,
                translation=translation,
                material=dict(
                    name=f"m{gx}_{gz}",
                    base_color=tuple(rng.uniform(0.3, 1.0, 3)) + (1.0,),
                    # loader maps reflectivity = metallic*0.5,
                    # roughness = rough_factor/(2π)  (src/scene.rs:909-915)
                    metallic=float(rng.uniform(0.0, 0.8)),
                    roughness=float(rng.uniform(0.0, 0.5)),
                    base_color_texture=tex)))
        fv = np.array([[-40, -1.2, 10], [40, -1.2, 10], [40, -1.2, -60],
                       [-40, -1.2, -60]], np.float32)
        meshes.append(dict(
            name="floor", positions=fv,
            indices=np.array([[0, 2, 1], [0, 3, 2]], np.int32),
            normals=np.tile(np.array([[0, 1, 0]], np.float32), (4, 1)),
            uvs=np.array([[0, 0], [8, 0], [8, 8], [0, 8]], np.float32),
            material=dict(name="floor", base_color=(0.7, 0.7, 0.7, 1.0),
                          metallic=0.6, roughness=0.0,
                          base_color_texture=tex)))
        # loader divides point intensity by 10 (src/scene.rs:747)
        lights = [
            dict(type="point", position=(-6.0, 12.0, 0.0), color=(1, 1, 1),
                 intensity=5000.0, name="key"),
            dict(type="point", position=(8.0, 6.0, -4.0),
                 color=(1.0, 0.9, 0.8), intensity=2000.0, name="fill"),
            dict(type="directional", direction=(0.5, -1.0, -0.3),
                 color=(1, 1, 1), intensity=0.5, name="sun"),
        ]
        camera = dict(eye=(0.0, 3.0, 4.0), dir=(0.0, -0.25, -1.0),
                      up=(0, 1, 0), yfov=np.pi / 2, znear=0.001, zfar=1000.0)
        write_glb(glb_path, meshes, lights, camera)
    spec = {
        "name": "SponzaClass",
        "config": {"monte_carlo": monte_carlo, "samples": samples,
                   "max_recursion": 4},
        "objects": [{"name": "sponza_class", "type": "gltf",
                     "path": glb_path}],
    }
    with open(json_path, "w") as f:
        _json.dump(spec, f, indent=1)
    return json_path


def bench_scene(grid: int = 4, lat: int = 12, lon: int = 18,
                width: int = 1280, height: int = 720,
                monte_carlo: bool = True, samples: int = 4) -> Scene:
    """Sponza-class procedural benchmark scene: grid² textured UV-sphere
    meshes over a reflective textured floor, 3 lights, MC roughness."""
    scene = Scene()
    tex = checkerboard_texture(128, 16)
    rng = np.random.default_rng(7)
    for gx in range(grid):
        for gz in range(grid):
            m = Material(id=scene.get_next_id(), name=f"m{gx}_{gz}")
            m.base_color = rng.uniform(0.3, 1.0, 3).astype(np.float32)
            m.specular_color = m.base_color * np.float32(0.8)
            m.reflectivity = float(rng.uniform(0.0, 0.4))
            m.roughness = float(rng.uniform(0.0, 0.08))
            m.set_texture(TextureType.Base, tex)
            mesh = uv_sphere_mesh(f"ball{gx}_{gz}", m, 1.0, lat, lon)
            mesh.basic.id = scene.get_next_id()
            mesh.basic.apply_transformation(
                (2.6 * (gx - (grid - 1) / 2), 0.0, -6.0 - 2.6 * gz),
                (1.0, 1.0, 1.0), (0.0, 0.0, 0.0))
            scene.items.append(mesh)
            scene.materials.append(m)

    floor_mat = Material(id=scene.get_next_id(), name="floor")
    floor_mat.base_color = np.array([0.7, 0.7, 0.7], np.float32)
    floor_mat.reflectivity = 0.3
    floor_mat.set_texture(TextureType.Base, tex)
    floor = Mesh.new_plane("floor", floor_mat,
                           (-40, -1.2, 10), (40, -1.2, 10), (40, -1.2, -60), (-40, -1.2, -60))
    floor.basic.id = scene.get_next_id()
    scene.items.append(floor)
    scene.materials.append(floor_mat)

    scene.add_light("key", (-6.0, 12.0, 0.0), (0, -1, 0), (1, 1, 1), 500.0,
                    np.pi / 2, LightType.Point)
    scene.add_light("fill", (8.0, 6.0, -4.0), (0, -1, 0), (1.0, 0.9, 0.8), 200.0,
                    np.pi / 2, LightType.Point)
    scene.add_light("sun", (0, 0, 0), (0.5, -1.0, -0.3), (1, 1, 1), 0.5,
                    np.pi / 2, LightType.Directional)
    scene.cam.eye_pos = np.array([0.0, 3.0, 4.0], np.float32)
    scene.cam.dir = np.array([0.0, -0.25, -1.0], np.float32)
    scene.cam.init(width, height)
    scene.raytracing_config.monte_carlo = monte_carlo
    scene.raytracing_config.samples = samples
    scene.init()
    scene.update()
    return scene
