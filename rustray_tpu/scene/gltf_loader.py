"""GLTF 2.0 / GLB loader replicating src/scene.rs:722-1124 (easy-gltf path).

Self-contained parser (no external gltf library): handles the GLB binary
container, .gltf JSON with external/data-URI buffers, node-hierarchy baking,
indexed accessors (with byteStride), KHR_lights_punctual, and the first
camera.

Reference semantics preserved:
- every mesh primitive becomes a *triangle soup* model: vertices are
  duplicated per triangle with sequential indices (src/scene.rs:853-892),
  node transforms baked into positions/normals (easy-gltf behavior).
- texcoord v flipped at load: (u, 1-v) (src/scene.rs:871).
- PBR → Phong mapping (src/scene.rs:909-915): specular = base*0.8,
  alpha = baseColorFactor.w, reflectivity = metallic_factor*0.5,
  roughness = (1/2π)*roughness_factor.
- metallic/roughness textures split from the combined metallicRoughness
  image: B channel → Reflectivity, G channel → Roughness (easy-gltf's
  GrayImage split; reference reads pixel[0] of those, src/scene.rs:1026-1092).
- occlusion texture: R channel × occlusion strength (src/scene.rs:1049-1069).
- emissive texture rgb + factor → ambient color (src/scene.rs:940-948).
- point light intensity divided by 10 (src/scene.rs:747); spot uses
  outer_cone_angle, inner ignored (src/scene.rs:768-784).
- materials deduplicated per gltf material index (src/scene.rs:843-851).
"""
from __future__ import annotations

import base64
import io
import json
import os
import struct
from typing import Dict, List, Optional

import numpy as np

from .light import Light, LightType
from .material import Material, TextureType
from .shapes import Mesh

_COMPONENT_DTYPES = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16,
    5123: np.uint16, 5125: np.uint32, 5126: np.float32,
}
_TYPE_COUNTS = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4, "MAT4": 16}


class _Gltf:
    def __init__(self, doc: dict, buffers: List[bytes], base_dir: str):
        self.doc = doc
        self.buffers = buffers
        self.base_dir = base_dir
        self._image_cache: Dict[int, np.ndarray] = {}

    def accessor(self, idx: int) -> np.ndarray:
        acc = self.doc["accessors"][idx]
        n = acc["count"]
        ncomp = _TYPE_COUNTS[acc["type"]]
        dtype = _COMPONENT_DTYPES[acc["componentType"]]
        itemsize = np.dtype(dtype).itemsize * ncomp
        if "bufferView" not in acc:
            out = np.zeros((n, ncomp), dtype)
        else:
            bv = self.doc["bufferViews"][acc["bufferView"]]
            buf = self.buffers[bv.get("buffer", 0)]
            offset = bv.get("byteOffset", 0) + acc.get("byteOffset", 0)
            stride = bv.get("byteStride") or itemsize
            if stride == itemsize:
                out = np.frombuffer(buf, dtype, count=n * ncomp, offset=offset).reshape(n, ncomp)
            else:
                raw = np.frombuffer(buf, np.uint8)
                idxs = offset + stride * np.arange(n)[:, None] + np.arange(itemsize)[None, :]
                out = raw[idxs].copy().view(dtype).reshape(n, ncomp)
        if acc.get("normalized") and dtype != np.float32:
            info = np.iinfo(dtype)
            out = out.astype(np.float32) / float(info.max)
        return out

    def image_rgba(self, image_idx: int) -> Optional[np.ndarray]:
        if image_idx in self._image_cache:
            return self._image_cache[image_idx]
        from PIL import Image
        img_def = self.doc["images"][image_idx]
        data: Optional[bytes] = None
        uri = img_def.get("uri")
        if uri is not None:
            if uri.startswith("data:"):
                data = base64.b64decode(uri.split(",", 1)[1])
            else:
                try:
                    with open(os.path.join(self.base_dir, uri), "rb") as f:
                        data = f.read()
                except OSError:
                    return None
        elif "bufferView" in img_def:
            bv = self.doc["bufferViews"][img_def["bufferView"]]
            buf = self.buffers[bv.get("buffer", 0)]
            off = bv.get("byteOffset", 0)
            data = buf[off:off + bv["byteLength"]]
        if data is None:
            return None
        with Image.open(io.BytesIO(data)) as im:
            arr = np.asarray(im.convert("RGBA"), np.uint8)
        self._image_cache[image_idx] = arr
        return arr

    def texture_rgba(self, tex_idx: int) -> Optional[np.ndarray]:
        tex = self.doc["textures"][tex_idx]
        src = tex.get("source")
        return None if src is None else self.image_rgba(src)


def _parse_container(path: str) -> _Gltf:
    base_dir = os.path.dirname(path)
    with open(path, "rb") as f:
        head = f.read(4)
        f.seek(0)
        if head == b"glTF":
            magic, version, length = struct.unpack("<III", f.read(12))
            doc = None
            bin_chunk = b""
            while f.tell() < length:
                chunk_len, chunk_type = struct.unpack("<II", f.read(8))
                chunk = f.read(chunk_len)
                if chunk_type == 0x4E4F534A:  # JSON
                    doc = json.loads(chunk.decode("utf-8"))
                elif chunk_type == 0x004E4942:  # BIN
                    bin_chunk = chunk
            assert doc is not None, "GLB without JSON chunk"
            buffers = []
            for b in doc.get("buffers", []):
                uri = b.get("uri")
                if uri is None:
                    buffers.append(bin_chunk)
                elif uri.startswith("data:"):
                    buffers.append(base64.b64decode(uri.split(",", 1)[1]))
                else:
                    with open(os.path.join(base_dir, uri), "rb") as bf:
                        buffers.append(bf.read())
            return _Gltf(doc, buffers, base_dir)
        else:
            doc = json.load(io.TextIOWrapper(f, encoding="utf-8"))
            buffers = []
            for b in doc.get("buffers", []):
                uri = b.get("uri", "")
                if uri.startswith("data:"):
                    buffers.append(base64.b64decode(uri.split(",", 1)[1]))
                else:
                    with open(os.path.join(base_dir, uri), "rb") as bf:
                        buffers.append(bf.read())
            return _Gltf(doc, buffers, base_dir)


def _node_matrix(node: dict) -> np.ndarray:
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float32).reshape(4, 4).T
    m = np.eye(4, dtype=np.float32)
    t = node.get("translation")
    r = node.get("rotation")  # xyzw quaternion
    s = node.get("scale")
    if t is not None:
        tm = np.eye(4, dtype=np.float32)
        tm[:3, 3] = t
        m = m @ tm
    if r is not None:
        x, y, z, w = r
        rm = np.eye(4, dtype=np.float32)
        rm[:3, :3] = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]], np.float32)
        m = m @ rm
    if s is not None:
        sm = np.diag(np.array([s[0], s[1], s[2], 1.0], np.float32))
        m = m @ sm
    return m


def _gray_channel_tex(img: Optional[np.ndarray], channel: int, factor: float = 1.0) -> Optional[np.ndarray]:
    """easy-gltf GrayImage split: take one channel, replicate to rgba."""
    if img is None:
        return None
    c = img[..., channel].astype(np.float32) * factor
    c = np.clip(c, 0, 255).astype(np.uint8)
    return np.stack([c, c, c, c], axis=-1)


def load_gltf(scene, path: str) -> List[int]:
    loaded_ids: List[int] = []
    try:
        g = _parse_container(path)
    except (OSError, AssertionError, json.JSONDecodeError) as e:
        print(f"error can not load gltf {path}: {e}")
        return loaded_ids
    doc = g.doc

    # gather flattened (node, world_matrix) pairs from the default scene
    nodes = doc.get("nodes", [])
    scene_idx = doc.get("scene", 0)
    roots = doc.get("scenes", [{}])[scene_idx].get("nodes", []) if doc.get("scenes") else []
    flat: List[tuple] = []

    def visit(idx: int, parent: np.ndarray):
        node = nodes[idx]
        world = parent @ _node_matrix(node)
        flat.append((node, world))
        for c in node.get("children", []):
            visit(c, world)

    for r in roots:
        visit(r, np.eye(4, dtype=np.float32))

    # ********** lights (KHR_lights_punctual; src/scene.rs:731-787) **********
    light_defs = doc.get("extensions", {}).get("KHR_lights_punctual", {}).get("lights", [])
    for node, world in flat:
        lref = node.get("extensions", {}).get("KHR_lights_punctual", {}).get("light")
        if lref is None:
            continue
        ld = light_defs[lref]
        pos = world[:3, 3]
        direction = (world[:3, :3] @ np.array([0.0, 0.0, -1.0], np.float32))
        color = np.asarray(ld.get("color", [1.0, 1.0, 1.0]), np.float32)
        intensity = float(ld.get("intensity", 1.0))
        name = ld.get("name", "light")
        kind = ld.get("type", "point")
        if kind == "point":
            scene.lights.append(Light(True, scene.get_next_id(), name, pos.copy(),
                                      np.array([0.0, -1.0, 0.0], np.float32), color,
                                      intensity / 10.0, float(np.pi / 2), LightType.Point))
        elif kind == "directional":
            scene.lights.append(Light(True, scene.get_next_id(), name,
                                      np.zeros(3, np.float32), direction, color,
                                      intensity, float(np.pi / 2), LightType.Directional))
        elif kind == "spot":
            outer = float(ld.get("spot", {}).get("outerConeAngle", np.pi / 4))
            scene.lights.append(Light(True, scene.get_next_id(), name, pos.copy(),
                                      direction, color, intensity, outer, LightType.Spot))

    # ********** camera (first one; src/scene.rs:789-821) **********
    cams = [(node, world) for node, world in flat if "camera" in node]
    if cams:
        node, world = cams[0]
        cam_def = doc["cameras"][node["camera"]]
        if cam_def.get("type") == "perspective":
            p = cam_def.get("perspective", {})
            forward = world[:3, :3] @ np.array([0.0, 0.0, -1.0], np.float32)
            up = world[:3, :3] @ np.array([0.0, 1.0, 0.0], np.float32)
            scene.cam.eye_pos = world[:3, 3].copy()
            # reference: dir = -forward (src/scene.rs:804) where easy-gltf's
            # forward() is the +z camera axis; with our -z forward this is
            # simply the view direction.
            scene.cam.dir = (forward / np.linalg.norm(forward)).astype(np.float32)
            scene.cam.up = (up / np.linalg.norm(up)).astype(np.float32)
            if "yfov" in p:
                scene.cam.fov = float(p["yfov"])
            scene.cam.clipping_near = float(p.get("znear", scene.cam.clipping_near))
            if "zfar" in p:
                scene.cam.clipping_far = float(p["zfar"])

    # ********** models (src/scene.rs:823-974) **********
    materials_by_index: Dict[int, int] = {}  # gltf material idx → our material id

    for node, world in flat:
        if "mesh" not in node:
            continue
        mesh_def = doc["meshes"][node["mesh"]]
        normal_mat = world[:3, :3]
        try:
            normal_mat = np.linalg.inv(world[:3, :3]).T
        except np.linalg.LinAlgError:
            pass
        for prim in mesh_def.get("primitives", []):
            attrs = prim.get("attributes", {})
            if "POSITION" not in attrs:
                continue
            pos = g.accessor(attrs["POSITION"]).astype(np.float32)
            idx = (g.accessor(prim["indices"]).reshape(-1).astype(np.int64)
                   if "indices" in prim else np.arange(len(pos), dtype=np.int64))
            nrm = (g.accessor(attrs["NORMAL"]).astype(np.float32)
                   if "NORMAL" in attrs else None)
            uv = (g.accessor(attrs["TEXCOORD_0"]).astype(np.float32)
                  if "TEXCOORD_0" in attrs else None)

            # bake node transform (easy-gltf models are world-space)
            pos_w = pos @ world[:3, :3].T + world[:3, 3]
            nrm_w = None
            if nrm is not None:
                nrm_w = nrm @ normal_mat.T

            # triangle soup: duplicate vertices per-triangle with sequential
            # indices (src/scene.rs:853-892)
            tri_count = len(idx) // 3
            order = idx[: tri_count * 3]
            verts = pos_w[order]
            indices = np.arange(tri_count * 3, dtype=np.int32).reshape(-1, 3)
            normals = nrm_w[order] if nrm_w is not None else None
            normal_indices = indices.copy() if normals is not None else None
            uvs = None
            uv_indices = None
            if uv is not None:
                uvs = uv[order].copy()
                uvs[:, 1] = 1.0 - uvs[:, 1]  # flip v (src/scene.rs:871)
                uv_indices = indices.copy()

            object_id = scene.get_next_id()

            # ---- material ----
            mat_idx = prim.get("material")
            if mat_idx is not None and mat_idx in materials_by_index:
                material = scene.get_material_by_id(materials_by_index[mat_idx])
            else:
                gm = (doc.get("materials", [])[mat_idx] if mat_idx is not None else {})
                material = Material(id=scene.get_next_id(),
                                    name=gm.get("name", "default"))
                pbr = gm.get("pbrMetallicRoughness", {})
                base = np.asarray(pbr.get("baseColorFactor", [1, 1, 1, 1]), np.float32)
                material.base_color = base[:3].copy()
                material.specular_color = material.base_color * np.float32(0.8)
                material.alpha = float(base[3])
                material.reflectivity = float(pbr.get("metallicFactor", 1.0)) * 0.5
                material.roughness = float((1.0 / np.pi / 2.0) * pbr.get("roughnessFactor", 1.0))

                if "baseColorTexture" in pbr:
                    img = g.texture_rgba(pbr["baseColorTexture"]["index"])
                    if img is not None:
                        material.set_texture(TextureType.Base, img)
                if "normalTexture" in gm:
                    img = g.texture_rgba(gm["normalTexture"]["index"])
                    if img is not None:
                        rgb = img.copy()
                        rgb[..., 3] = 255  # src/scene.rs:1019
                        material.set_texture(TextureType.Normal, rgb)
                if "metallicRoughnessTexture" in pbr:
                    img = g.texture_rgba(pbr["metallicRoughnessTexture"]["index"])
                    # B channel → metallic/Reflectivity, G → Roughness
                    material.set_texture(TextureType.Reflectivity, _gray_channel_tex(img, 2))
                    material.set_texture(TextureType.Roughness, _gray_channel_tex(img, 1))
                if "emissiveTexture" in gm:
                    img = g.texture_rgba(gm["emissiveTexture"]["index"])
                    if img is not None:
                        rgb = img.copy()
                        rgb[..., 3] = 255
                        material.set_texture(TextureType.AmbientEmissive, rgb)
                        ef = gm.get("emissiveFactor", [0.0, 0.0, 0.0])
                        material.ambient_color = np.asarray(ef, np.float32)
                if "occlusionTexture" in gm:
                    occ = gm["occlusionTexture"]
                    img = g.texture_rgba(occ["index"])
                    material.set_texture(
                        TextureType.AmbientOcclusion,
                        _gray_channel_tex(img, 0, float(occ.get("strength", 1.0))))
                scene.materials.append(material)
                if mat_idx is not None:
                    materials_by_index[mat_idx] = material.id

            name = mesh_def.get("name", "unknown")
            item = Mesh(name, material, verts, indices, uvs, uv_indices, normals, normal_indices)
            item.basic.id = object_id
            loaded_ids.append(object_id)
            scene.items.append(item)

    return loaded_ids
