"""Wavefront OBJ/MTL loader replicating src/scene.rs:1126-1367.

Follows tobj's ``LoadOptions { triangulate: true, single_index: true }``
semantics: polygon faces are fan-triangulated and every unique
(position, texcoord, normal) triple becomes one vertex, leaving a single
index buffer shared by all attributes (the reference then reuses the
position indices for UVs/normals, src/scene.rs:1346-1355).

MTL → Material mapping (src/scene.rs:1246-1334):
- ``Ns``→shininess, ``Ka``→ambient, ``Ks``→specular, ``Kd``→base,
  ``Ni``→refraction_index, ``d``→alpha,
- then ambient is *overwritten* with base*0.01 (src/scene.rs:1284),
- ``illum > 2`` → reflectivity 0.5,
- texture maps: map_Kd→Base, map_Bump/bump→Normal, map_Ka→AmbientEmissive,
  map_Ks→Specular, map_d→Alpha (paths relative to the MTL/OBJ directory,
  src/scene.rs:1650-1664).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from .material import Material, TextureType
from .shapes import Mesh


class _ObjMaterial:
    def __init__(self, name: str):
        self.name = name
        self.shininess: Optional[float] = None
        self.ambient: Optional[Tuple[float, float, float]] = None
        self.specular: Optional[Tuple[float, float, float]] = None
        self.diffuse: Optional[Tuple[float, float, float]] = None
        self.optical_density: Optional[float] = None
        self.dissolve: Optional[float] = None
        self.illumination_model: Optional[int] = None
        self.diffuse_texture: Optional[str] = None
        self.normal_texture: Optional[str] = None
        self.ambient_texture: Optional[str] = None
        self.specular_texture: Optional[str] = None
        self.dissolve_texture: Optional[str] = None


def _parse_mtl(path: str) -> Dict[str, _ObjMaterial]:
    mats: Dict[str, _ObjMaterial] = {}
    cur: Optional[_ObjMaterial] = None
    try:
        f = open(path, "r", errors="replace")
    except OSError:
        return mats
    with f:
        for line in f:
            parts = line.strip().split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            lkey = key.lower()
            if lkey == "newmtl":
                cur = _ObjMaterial(" ".join(parts[1:]))
                mats[cur.name] = cur
            elif cur is None:
                continue
            elif lkey == "ns":
                cur.shininess = float(parts[1])
            elif lkey == "ka":
                cur.ambient = tuple(float(x) for x in parts[1:4])
            elif lkey == "ks":
                cur.specular = tuple(float(x) for x in parts[1:4])
            elif lkey == "kd":
                cur.diffuse = tuple(float(x) for x in parts[1:4])
            elif lkey == "ni":
                cur.optical_density = float(parts[1])
            elif lkey == "d":
                cur.dissolve = float(parts[1])
            elif lkey == "tr":
                cur.dissolve = 1.0 - float(parts[1])
            elif lkey == "illum":
                cur.illumination_model = int(parts[1])
            elif lkey == "map_kd":
                cur.diffuse_texture = " ".join(parts[1:])
            elif lkey in ("map_bump", "bump", "norm", "map_kn"):
                cur.normal_texture = " ".join(parts[1:])
            elif lkey == "map_ka":
                cur.ambient_texture = " ".join(parts[1:])
            elif lkey == "map_ks":
                cur.specular_texture = " ".join(parts[1:])
            elif lkey == "map_d":
                cur.dissolve_texture = " ".join(parts[1:])
    return mats


def _texture_path(tex_path: str, obj_path: str) -> str:
    # src/scene.rs:1650-1664: relative texture paths resolve next to the OBJ/MTL.
    if os.path.isabs(tex_path):
        return tex_path
    return os.path.join(os.path.dirname(obj_path), tex_path)


class _ObjModel:
    def __init__(self, name: str, material_name: Optional[str]):
        self.name = name
        self.material_name = material_name
        self.positions: List[Tuple[float, float, float]] = []
        self.texcoords: List[Tuple[float, float]] = []
        self.normals: List[Tuple[float, float, float]] = []
        self.indices: List[int] = []
        self._dedup: Dict[Tuple[int, int, int], int] = {}


def _parse_obj(path: str):
    """Parse OBJ into models split on o/g/usemtl boundaries, single-indexed."""
    positions: List[Tuple[float, float, float]] = []
    texcoords: List[Tuple[float, float]] = []
    normals: List[Tuple[float, float, float]] = []
    models: List[_ObjModel] = []
    materials: Dict[str, _ObjMaterial] = {}
    cur_name = "unnamed_object"
    cur_mat: Optional[str] = None
    cur: Optional[_ObjModel] = None

    def model() -> _ObjModel:
        nonlocal cur
        if cur is None:
            cur = _ObjModel(cur_name, cur_mat)
            models.append(cur)
        return cur

    def resolve(idx: str, n: int) -> int:
        i = int(idx)
        return i - 1 if i > 0 else n + i

    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.strip().split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "v":
                positions.append(tuple(float(x) for x in parts[1:4]))
            elif key == "vt":
                texcoords.append(tuple(float(x) for x in parts[1:3]))
            elif key == "vn":
                normals.append(tuple(float(x) for x in parts[1:4]))
            elif key in ("o", "g"):
                cur_name = " ".join(parts[1:]) or cur_name
                cur = None
            elif key == "usemtl":
                cur_mat = " ".join(parts[1:])
                cur = None
            elif key == "mtllib":
                mtl = os.path.join(os.path.dirname(path), " ".join(parts[1:]))
                materials.update(_parse_mtl(mtl))
            elif key == "f":
                m = model()
                verts = []
                for spec in parts[1:]:
                    comps = spec.split("/")
                    vi = resolve(comps[0], len(positions))
                    vti = resolve(comps[1], len(texcoords)) if len(comps) > 1 and comps[1] else -1
                    vni = resolve(comps[2], len(normals)) if len(comps) > 2 and comps[2] else -1
                    dkey = (vi, vti, vni)
                    if dkey in m._dedup:
                        verts.append(m._dedup[dkey])
                    else:
                        new = len(m.positions)
                        m.positions.append(positions[vi])
                        if vti >= 0:
                            m.texcoords.append(texcoords[vti])
                        if vni >= 0:
                            m.normals.append(normals[vni])
                        m._dedup[dkey] = new
                        verts.append(new)
                for i in range(1, len(verts) - 1):  # fan triangulation
                    m.indices.extend((verts[0], verts[i], verts[i + 1]))
    return models, materials


def load_wavefront(scene, path: str) -> List[int]:
    loaded_ids: List[int] = []
    models, obj_materials = _parse_obj(path)
    double_check: Dict[str, int] = {}  # material name → our material id

    for m in models:
        if not m.positions:
            continue
        verts = np.asarray(m.positions, np.float32)
        indices = np.asarray(m.indices, np.int32).reshape(-1, 3)
        uvs = np.asarray(m.texcoords, np.float32) if m.texcoords else None
        normals = np.asarray(m.normals, np.float32) if m.normals else None

        if m.material_name is not None and m.material_name in obj_materials:
            if m.material_name in double_check:
                material = scene.get_material_by_id(double_check[m.material_name])
            else:
                material = Material(id=scene.get_next_id(), name=m.material_name)
                src = obj_materials[m.material_name]
                if src.shininess is not None:
                    material.shininess = src.shininess
                if src.ambient is not None:
                    material.ambient_color = np.asarray(src.ambient, np.float32)
                if src.specular is not None:
                    material.specular_color = np.asarray(src.specular, np.float32)
                if src.diffuse is not None:
                    material.base_color = np.asarray(src.diffuse, np.float32)
                if src.optical_density is not None:
                    material.refraction_index = src.optical_density
                if src.dissolve is not None:
                    material.alpha = src.dissolve
                material.ambient_color = material.base_color * np.float32(0.01)  # src/scene.rs:1284
                if src.illumination_model is not None and src.illumination_model > 2:
                    material.reflectivity = 0.5  # src/scene.rs:1286-1292
                for tex, tt in ((src.diffuse_texture, TextureType.Base),
                                (src.normal_texture, TextureType.Normal),
                                (src.ambient_texture, TextureType.AmbientEmissive),
                                (src.specular_texture, TextureType.Specular),
                                (src.dissolve_texture, TextureType.Alpha)):
                    if tex is not None:
                        material.load_texture(_texture_path(tex, path), tt)
                scene.materials.append(material)
                double_check[m.material_name] = material.id
        else:
            material = Material(id=scene.get_next_id(), name="")

        # single_index: one index buffer shared by all attributes
        # (src/scene.rs:1346-1355)
        uv_indices = indices.copy() if uvs is not None and len(uvs) else None
        normal_indices = indices.copy() if normals is not None and len(normals) else None

        item = Mesh(m.name, material, verts, indices, uvs, uv_indices, normals, normal_indices)
        item.basic.id = scene.get_next_id()
        loaded_ids.append(item.basic.id)
        scene.items.append(item)

    return loaded_ids
