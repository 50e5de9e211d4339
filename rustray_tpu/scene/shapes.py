"""Host-side shape objects: Sphere and TriMesh instances.

Reference: ``ShapeBasics``/``Shape`` trait (src/shape/mod.rs:19-46, 661-778),
``Sphere`` (src/shape/sphere.rs) and ``Mesh`` (src/shape/mesh.rs).

These are *scene-graph* objects only; all intersection math happens on device
(rustray_tpu.ops) against the compiled SoA arrays.  Per-instance transforms
keep a cached inverse like the reference (src/shape/mod.rs:763-767).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..utils.mathutil import compose_trs, inverse, translation
from .material import Material


@dataclass
class ShapeBasics:
    id: int = 0
    name: str = ""
    visible: bool = True
    flip_normals: bool = False
    trans: np.ndarray = field(default_factory=lambda: np.eye(4, dtype=np.float32))
    trans_inverse: np.ndarray = field(default_factory=lambda: np.eye(4, dtype=np.float32))
    material: Material = field(default_factory=Material)
    trans_initial: np.ndarray = field(default_factory=lambda: np.eye(4, dtype=np.float32))

    def calc_inverse(self) -> None:
        self.trans_inverse = inverse(self.trans)

    def apply_transformation(self, translate, scale, rotation) -> None:
        # src/shape/mod.rs:731-736: trans = trans * T * Rz * Ry * Rx * S
        self.trans = compose_trs(self.trans, translate, scale, rotation)
        self.calc_inverse()

    def apply_translation(self, translate) -> None:
        self.apply_transformation(translate, (1.0, 1.0, 1.0), (0.0, 0.0, 0.0))

    def apply_mat(self, trans: np.ndarray) -> None:
        self.trans = np.asarray(trans, np.float32).copy()
        self.calc_inverse()

    def init_animation_data(self) -> None:
        self.trans_initial = self.trans.copy()


class Shape:
    basic: ShapeBasics

    def get_basic(self) -> ShapeBasics:
        return self.basic

    def get_material(self) -> Material:
        return self.basic.material

    def local_bbox(self) -> np.ndarray:
        raise NotImplementedError

    def init(self) -> None:
        self.basic.calc_inverse()
        self.basic.init_animation_data()

    def update(self) -> None:
        self.basic.calc_inverse()


class Sphere(Shape):
    """Unit-center sphere of given radius in object space; placement via the
    instance transform (src/shape/sphere.rs:104-118: trans = translate(pos),
    radius lives in the parry ``Ball``)."""

    def __init__(self, name: str, material: Material, x: float, y: float, z: float, r: float):
        self.basic = ShapeBasics(name=name, material=material)
        self.radius = float(r)
        self.basic.trans = translation((x, y, z))
        self.basic.calc_inverse()

    def local_bbox(self) -> np.ndarray:
        r = self.radius
        return np.array([[-r, -r, -r], [r, r, r]], np.float32)


class Mesh(Shape):
    """Indexed triangle mesh with separate UV / normal index topology
    (src/shape/mesh.rs:10-21)."""

    def __init__(self, name: str, material: Material,
                 vertices: np.ndarray, indices: np.ndarray,
                 uvs: Optional[np.ndarray] = None, uv_indices: Optional[np.ndarray] = None,
                 normals: Optional[np.ndarray] = None, normal_indices: Optional[np.ndarray] = None):
        self.basic = ShapeBasics(name=name, material=material)
        self.vertices = np.asarray(vertices, np.float32).reshape(-1, 3)
        self.indices = np.asarray(indices, np.int32).reshape(-1, 3)
        self.uvs = (np.asarray(uvs, np.float32).reshape(-1, 2)
                    if uvs is not None and len(uvs) else np.zeros((0, 2), np.float32))
        self.uv_indices = (np.asarray(uv_indices, np.int32).reshape(-1, 3)
                           if uv_indices is not None and len(uv_indices) else np.zeros((0, 3), np.int32))
        self.normals = (np.asarray(normals, np.float32).reshape(-1, 3)
                        if normals is not None and len(normals) else np.zeros((0, 3), np.float32))
        self.normal_indices = (np.asarray(normal_indices, np.int32).reshape(-1, 3)
                               if normal_indices is not None and len(normal_indices) else np.zeros((0, 3), np.int32))

    @staticmethod
    def new_plane(name: str, material: Material, x0, x1, x2, x3) -> "Mesh":
        # src/shape/mesh.rs:186-202: two-triangle quad with fixed UVs.
        verts = np.array([x0, x1, x2, x3], np.float32)
        uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        return Mesh(name, material, verts, idx, uvs, idx.copy())

    def local_bbox(self) -> np.ndarray:
        if self.vertices.shape[0] == 0:
            return np.zeros((2, 3), np.float32)
        return np.stack([self.vertices.min(axis=0), self.vertices.max(axis=0)])
