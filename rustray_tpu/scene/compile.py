"""Scene compiler: host scene graph → flattened SoA device arrays.

This is the TPU-native replacement for the reference's pointer-based scene
(``Vec<Box<dyn Shape>>`` + per-shape parry structures, src/scene.rs:69-104):
instances, triangles, materials, lights and textures become padded,
statically-shaped arrays that the wavefront renderer consumes.

All leaf arrays are differentiable pytree leaves (materials, lights, camera,
instance transforms), enabling gradient-based scene optimization — a
capability the reference does not have but which falls out of the design.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np
from flax import struct

from .material import Material, TextureType
from .scene import Scene
from .shapes import Mesh, Shape, Sphere
from .textures import TextureAtlas


def _pad_to(arr: np.ndarray, n: int, fill=0) -> np.ndarray:
    if arr.shape[0] >= n:
        return arr
    pad_shape = (n - arr.shape[0],) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, arr.dtype)])


@struct.dataclass
class MaterialsSoA:
    ambient_color: np.ndarray   # (M, 3)
    base_color: np.ndarray      # (M, 3)
    specular_color: np.ndarray  # (M, 3)
    alpha: np.ndarray           # (M,)
    shininess: np.ndarray
    reflectivity: np.ndarray
    refraction_index: np.ndarray
    normal_map_strength: np.ndarray
    shadow_softness: np.ndarray
    roughness: np.ndarray
    cast_shadow: np.ndarray     # bool
    receive_shadow: np.ndarray
    monte_carlo: np.ndarray
    smooth_shading: np.ndarray
    reflection_only: np.ndarray
    backface_culling: np.ndarray
    tex_nearest: np.ndarray
    tex_offset: np.ndarray      # (M, 8) int32 — per TextureType slot
    tex_w: np.ndarray           # (M, 8) int32 (0 = no texture)
    tex_h: np.ndarray           # (M, 8) int32


@struct.dataclass
class LightsSoA:
    enabled: np.ndarray    # (L,) bool
    pos: np.ndarray        # (L, 3)
    dir: np.ndarray        # (L, 3)
    color: np.ndarray      # (L, 3)
    intensity: np.ndarray  # (L,)
    max_angle: np.ndarray  # (L,)
    kind: np.ndarray       # (L,) int32 LightType


@struct.dataclass
class CameraArrays:
    proj_inv: np.ndarray  # (4, 4)
    view_inv: np.ndarray  # (4, 4)


@struct.dataclass
class SceneArrays:
    # instances
    inst_trans: np.ndarray     # (I, 4, 4)
    inst_inv: np.ndarray       # (I, 4, 4)
    inst_det_sign: np.ndarray  # (I,) sign of det(trans3x3) for backface tests
    inst_kind: np.ndarray      # (I,) int32: 0=sphere, 1=mesh
    inst_radius: np.ndarray    # (I,)
    inst_mat: np.ndarray       # (I,) int32 material slot
    inst_visible: np.ndarray   # (I,) bool
    inst_flip: np.ndarray      # (I,) bool flip_normals
    inst_obj_id: np.ndarray    # (I,) int32 reference object id (AOV/picking)
    # sphere shortcut list
    sphere_idx: np.ndarray     # (S,) int32 instance indices
    sphere_valid: np.ndarray   # (S,) bool
    # triangle pool (object space, cluster-major: cluster c owns the slab
    # [c*cluster_size, (c+1)*cluster_size), padded with invalid tris)
    verts: np.ndarray          # (V, 3)
    tris: np.ndarray           # (T, 3) int32
    tri_inst: np.ndarray       # (T,) int32
    tri_valid: np.ndarray      # (T,) bool
    tri_uv_idx: np.ndarray     # (T, 3) int32 (-1 = none)
    uvs: np.ndarray            # (U, 2)
    tri_n_idx: np.ndarray      # (T, 3) int32 (-1 = none)
    vnormals: np.ndarray       # (Vn, 3) object-space loaded normals
    vn_inst: np.ndarray        # (Vn,) int32 owner instance
    # cluster-BVH leaves (object-space AABBs; world AABBs derived in-jit)
    cl_lo: np.ndarray          # (C, 3) object-space AABB min
    cl_hi: np.ndarray          # (C, 3)
    cl_inst: np.ndarray        # (C,) int32 owner instance
    cl_valid: np.ndarray       # (C,) bool
    # materials / lights / camera / textures
    materials: MaterialsSoA
    lights: LightsSoA
    camera: CameraArrays
    tex_texels: np.ndarray     # (NT,) int32 packed rgba
    tex_pairs: np.ndarray      # (NT, 2) int32: [texel i, texel i+1] — one
                               # row gather yields a horizontal texel pair,
                               # halving bilinear fetches (PERF_r04 step 2:
                               # gather cost is per ROW, not per byte)


@dataclass(frozen=True)
class SceneStatic:
    n_instances: int
    n_spheres: int
    n_tris: int
    n_materials: int
    n_lights: int
    width: int
    height: int
    has_any_texture: bool
    has_normal_tex: bool
    has_mesh: bool
    n_clusters: int = 0
    cluster_size: int = 128
    has_alpha_tex: bool = False
    # which TextureType slots any material actually uses — shading skips
    # the atlas gather for absent channels (tuple: hashable for jit keys)
    tex_channels: tuple = (False,) * 8
    # which filter modes any textured material uses — shading compiles only
    # the needed sampler (nearest = 1 texel gather, bilinear = 4)
    any_nearest: bool = False
    any_bilinear: bool = True


def compile_scene(scene: Scene, width: int = 0, height: int = 0,
                  tri_pad: int = 128, cluster_size: int = 128):
    """Flatten a scene into (SceneArrays, SceneStatic).

    Mesh triangles are laid out *cluster-major*: each mesh's triangles are
    permuted into cluster-BVH leaf order (rustray_tpu.accel.builder) and
    each leaf is padded to exactly ``cluster_size`` slots, so cluster ``c``
    is the contiguous slab [c*cluster_size, (c+1)*cluster_size) of the pool
    — the unit of DMA/culling for the device traversal."""
    if width and height:
        scene.cam.init(width, height)

    items: List[Shape] = scene.items

    # ----- materials (unique by object identity; items share Material refs)
    mat_objs: List[Material] = []
    mat_slot = {}
    for item in items:
        m = item.get_material()
        if id(m) not in mat_slot:
            mat_slot[id(m)] = len(mat_objs)
            mat_objs.append(m)
    M = max(1, len(mat_objs))

    atlas = TextureAtlas()
    tex_offset = np.zeros((M, 8), np.int32)
    tex_w = np.zeros((M, 8), np.int32)
    tex_h = np.zeros((M, 8), np.int32)
    for mi, m in enumerate(mat_objs):
        for t in TextureType:
            off, w, h = atlas.add(m.get_texture(t))
            tex_offset[mi, int(t)] = off
            tex_w[mi, int(t)] = w
            tex_h[mi, int(t)] = h

    def mat_field(name, default=0.0):
        if not mat_objs:
            return np.zeros((M,), np.float32)
        return np.array([getattr(m, name) for m in mat_objs], np.float32)

    def mat_bool(name):
        if not mat_objs:
            return np.zeros((M,), bool)
        return np.array([getattr(m, name) for m in mat_objs], bool)

    def mat_color(name):
        if not mat_objs:
            return np.zeros((M, 3), np.float32)
        return np.stack([np.asarray(getattr(m, name), np.float32) for m in mat_objs])

    materials = MaterialsSoA(
        ambient_color=mat_color("ambient_color"),
        base_color=mat_color("base_color"),
        specular_color=mat_color("specular_color"),
        alpha=mat_field("alpha"), shininess=mat_field("shininess"),
        reflectivity=mat_field("reflectivity"),
        refraction_index=mat_field("refraction_index"),
        normal_map_strength=mat_field("normal_map_strength"),
        shadow_softness=mat_field("shadow_softness"),
        roughness=mat_field("roughness"),
        cast_shadow=mat_bool("cast_shadow"), receive_shadow=mat_bool("receive_shadow"),
        monte_carlo=mat_bool("monte_carlo"), smooth_shading=mat_bool("smooth_shading"),
        reflection_only=mat_bool("reflection_only"),
        backface_culling=mat_bool("backface_culling"),
        tex_nearest=mat_bool("texture_filtering_nearest"),
        tex_offset=tex_offset, tex_w=tex_w, tex_h=tex_h,
    )

    # ----- instances + triangle pool
    I = max(1, len(items))
    inst_trans = np.tile(np.eye(4, dtype=np.float32), (I, 1, 1))
    inst_inv = inst_trans.copy()
    inst_kind = np.zeros((I,), np.int32)
    inst_radius = np.zeros((I,), np.float32)
    inst_mat = np.zeros((I,), np.int32)
    inst_visible = np.zeros((I,), bool)
    inst_flip = np.zeros((I,), bool)
    inst_obj_id = np.zeros((I,), np.int32)

    verts_list, tris_list, tri_inst_list, tri_valid_list = [], [], [], []
    uv_list, tri_uv_list = [], []
    vn_list, tri_n_list, vn_inst_list = [], [], []
    cl_lo_list, cl_hi_list, cl_inst_list = [], [], []
    v_base = u_base = n_base = 0
    sphere_indices = []
    K = cluster_size

    from ..accel.builder import build_clusters

    for ii, item in enumerate(items):
        b = item.basic
        inst_trans[ii] = b.trans
        inst_inv[ii] = b.trans_inverse
        inst_mat[ii] = mat_slot[id(item.get_material())]
        inst_visible[ii] = b.visible
        inst_flip[ii] = b.flip_normals
        inst_obj_id[ii] = b.id
        if isinstance(item, Sphere):
            inst_kind[ii] = 0
            inst_radius[ii] = item.radius
            sphere_indices.append(ii)
        elif isinstance(item, Mesh):
            inst_kind[ii] = 1
            nt = item.indices.shape[0]
            m_tris = np.asarray(item.indices, np.int32) + v_base
            if item.uvs.shape[0] and item.uv_indices.shape[0] == nt:
                m_uv = np.asarray(item.uv_indices, np.int32) + u_base
                uv_list.append(item.uvs)
                u_base += item.uvs.shape[0]
            else:
                m_uv = np.full((nt, 3), -1, np.int32)
            if item.normals.shape[0] and item.normal_indices.shape[0] == nt:
                m_n = np.asarray(item.normal_indices, np.int32) + n_base
                vn_list.append(item.normals)
                vn_inst_list.append(np.full((item.normals.shape[0],), ii, np.int32))
                n_base += item.normals.shape[0]
            else:
                m_n = np.full((nt, 3), -1, np.int32)

            # cluster-BVH leaf order + per-cluster padding to K slots
            perm, counts, boxes = build_clusters(item.vertices, item.indices, K)
            n_cl = counts.shape[0]
            padded = n_cl * K
            cum = np.cumsum(counts) - counts
            pos = (np.repeat(np.arange(n_cl) * K, counts)
                   + np.arange(nt) - np.repeat(cum, counts))
            dst_tris = np.zeros((padded, 3), np.int32)
            dst_tris[pos] = m_tris[perm]
            dst_uv = np.full((padded, 3), -1, np.int32)
            dst_uv[pos] = m_uv[perm]
            dst_n = np.full((padded, 3), -1, np.int32)
            dst_n[pos] = m_n[perm]
            dst_valid = np.zeros((padded,), bool)
            dst_valid[pos] = True

            verts_list.append(item.vertices)
            tris_list.append(dst_tris)
            tri_inst_list.append(np.full((padded,), ii, np.int32))
            tri_valid_list.append(dst_valid)
            tri_uv_list.append(dst_uv)
            tri_n_list.append(dst_n)
            cl_lo_list.append(boxes[:, :3])
            cl_hi_list.append(boxes[:, 3:])
            cl_inst_list.append(np.full((n_cl,), ii, np.int32))
            v_base += item.vertices.shape[0]

    det = np.linalg.det(inst_trans[:, :3, :3].astype(np.float64))
    inst_det_sign = np.where(det >= 0, 1.0, -1.0).astype(np.float32)

    verts = np.concatenate(verts_list) if verts_list else np.zeros((1, 3), np.float32)
    tris = np.concatenate(tris_list) if tris_list else np.zeros((1, 3), np.int32)
    tri_inst = np.concatenate(tri_inst_list) if tri_inst_list else np.zeros((1,), np.int32)
    tri_valid_arr = (np.concatenate(tri_valid_list) if tri_valid_list
                     else np.zeros((1,), bool))
    tri_uv_idx = np.concatenate(tri_uv_list) if tri_uv_list else np.full((1, 3), -1, np.int32)
    tri_n_idx = np.concatenate(tri_n_list) if tri_n_list else np.full((1, 3), -1, np.int32)
    uvs = np.concatenate(uv_list) if uv_list else np.zeros((1, 2), np.float32)
    vnormals = np.concatenate(vn_list) if vn_list else np.zeros((1, 3), np.float32)
    vn_inst = np.concatenate(vn_inst_list) if vn_inst_list else np.zeros((1,), np.int32)

    n_tris_real = int(tri_valid_arr.sum())
    T = max(tri_pad, -(-max(1, tris.shape[0]) // tri_pad) * tri_pad)
    tri_valid = _pad_to(tri_valid_arr, T, False)
    tris = _pad_to(tris, T)
    tri_inst = _pad_to(tri_inst, T)
    tri_uv_idx = _pad_to(tri_uv_idx, T, -1)
    tri_n_idx = _pad_to(tri_n_idx, T, -1)

    # ----- clusters (global index c = pool slab [c*K, (c+1)*K))
    n_clusters = sum(a.shape[0] for a in cl_inst_list)
    C = max(1, -(-max(1, n_clusters) // 8) * 8)
    cl_lo = _pad_to(np.concatenate(cl_lo_list).astype(np.float32)
                    if cl_lo_list else np.zeros((1, 3), np.float32), C)
    cl_hi = _pad_to(np.concatenate(cl_hi_list).astype(np.float32)
                    if cl_hi_list else np.zeros((1, 3), np.float32), C)
    cl_inst = _pad_to(np.concatenate(cl_inst_list)
                      if cl_inst_list else np.zeros((1,), np.int32), C)
    cl_valid = _pad_to(np.ones((n_clusters,), bool) if cl_inst_list
                       else np.zeros((1,), bool), C, False)

    S = max(1, len(sphere_indices))
    sphere_idx = _pad_to(np.asarray(sphere_indices, np.int32) if sphere_indices
                         else np.zeros((1,), np.int32), S)
    sphere_valid = _pad_to(np.ones((len(sphere_indices),), bool) if sphere_indices
                           else np.zeros((1,), bool), S, False)

    # ----- lights
    L = max(1, len(scene.lights))
    lights = LightsSoA(
        enabled=_pad_to(np.array([l.enabled for l in scene.lights], bool)
                        if scene.lights else np.zeros((1,), bool), L, False),
        pos=_pad_to(np.stack([l.pos for l in scene.lights]).astype(np.float32)
                    if scene.lights else np.zeros((1, 3), np.float32), L),
        dir=_pad_to(np.stack([l.dir for l in scene.lights]).astype(np.float32)
                    if scene.lights else np.zeros((1, 3), np.float32), L),
        color=_pad_to(np.stack([l.color for l in scene.lights]).astype(np.float32)
                      if scene.lights else np.zeros((1, 3), np.float32), L),
        intensity=_pad_to(np.array([l.intensity for l in scene.lights], np.float32)
                          if scene.lights else np.zeros((1,), np.float32), L),
        max_angle=_pad_to(np.array([l.max_angle for l in scene.lights], np.float32)
                          if scene.lights else np.zeros((1,), np.float32), L),
        kind=_pad_to(np.array([int(l.light_type) for l in scene.lights], np.int32)
                     if scene.lights else np.zeros((1,), np.int32), L),
    )

    camera = CameraArrays(proj_inv=scene.cam.projection_inverse.astype(np.float32),
                          view_inv=scene.cam.view_inverse.astype(np.float32))

    arrays = SceneArrays(
        inst_trans=inst_trans, inst_inv=inst_inv, inst_det_sign=inst_det_sign,
        inst_kind=inst_kind, inst_radius=inst_radius, inst_mat=inst_mat,
        inst_visible=inst_visible, inst_flip=inst_flip, inst_obj_id=inst_obj_id,
        sphere_idx=sphere_idx, sphere_valid=sphere_valid,
        verts=verts, tris=tris, tri_inst=tri_inst, tri_valid=tri_valid,
        tri_uv_idx=tri_uv_idx, uvs=uvs, tri_n_idx=tri_n_idx,
        vnormals=vnormals, vn_inst=vn_inst,
        cl_lo=cl_lo, cl_hi=cl_hi, cl_inst=cl_inst, cl_valid=cl_valid,
        materials=materials, lights=lights, camera=camera,
        tex_texels=(_texels := atlas.finalize()),
        tex_pairs=np.stack([_texels, np.append(_texels[1:], _texels[-1])],
                           axis=1),
    )
    static = SceneStatic(
        n_instances=len(items), n_spheres=len(sphere_indices), n_tris=n_tris_real,
        n_materials=len(mat_objs), n_lights=len(scene.lights),
        width=scene.cam.width, height=scene.cam.height,
        has_any_texture=any(m.has_any_texture() for m in mat_objs),
        has_normal_tex=any(m.has_texture(TextureType.Normal) for m in mat_objs),
        has_mesh=bool(verts_list),
        n_clusters=n_clusters, cluster_size=K,
        has_alpha_tex=any(m.has_texture(TextureType.Alpha) for m in mat_objs),
        tex_channels=tuple(any(m.has_texture(t) for m in mat_objs)
                           for t in TextureType),
        any_nearest=any(m.has_any_texture() and m.texture_filtering_nearest
                        for m in mat_objs),
        any_bilinear=any(m.has_any_texture()
                         and not m.texture_filtering_nearest
                         for m in mat_objs),
    )
    return arrays, static
