"""Perspective camera replicating the reference's nalgebra conventions.

Reference: src/camera.rs.  Matrices: ``Perspective3::new(aspect, fovy, near,
far)`` and ``Isometry3::look_at_rh(eye, eye+dir, up)``; the renderer consumes
the cached *inverses* (src/camera.rs:88-89) to generate rays.
"""
from __future__ import annotations

import numpy as np
from dataclasses import dataclass, field

from ..utils.mathutil import approx_equal, inverse, look_at_rh, perspective

DEFAULT_CAM_POS = (0.0, 0.0, 0.0)
DEFAULT_CAM_UP = (0.0, 1.0, 0.0)
DEFAULT_CAM_DIR = (0.0, 0.0, -1.0)
DEFAULT_FOV_DEG = 90.0
DEFAULT_CLIPPING_NEAR = 0.001
DEFAULT_CLIPPING_FAR = 1000.0


@dataclass
class Camera:
    width: int = 0
    height: int = 0
    aspect_ratio: float = 0.0
    fov: float = float(np.radians(DEFAULT_FOV_DEG))  # radians, y-fov
    eye_pos: np.ndarray = field(default_factory=lambda: np.array(DEFAULT_CAM_POS, np.float32))
    up: np.ndarray = field(default_factory=lambda: np.array(DEFAULT_CAM_UP, np.float32))
    dir: np.ndarray = field(default_factory=lambda: np.array(DEFAULT_CAM_DIR, np.float32))
    clipping_near: float = DEFAULT_CLIPPING_NEAR
    clipping_far: float = DEFAULT_CLIPPING_FAR

    projection: np.ndarray = field(default_factory=lambda: np.eye(4, dtype=np.float32))
    view: np.ndarray = field(default_factory=lambda: np.eye(4, dtype=np.float32))
    projection_inverse: np.ndarray = field(default_factory=lambda: np.eye(4, dtype=np.float32))
    view_inverse: np.ndarray = field(default_factory=lambda: np.eye(4, dtype=np.float32))

    def init(self, width: int, height: int) -> None:  # src/camera.rs:69-77
        self.width = int(width)
        self.height = int(height)
        self.aspect_ratio = float(width) / float(height)
        self.init_matrices()

    def init_matrices(self) -> None:  # src/camera.rs:79-90
        self.projection = perspective(self.aspect_ratio, self.fov,
                                      self.clipping_near, self.clipping_far)
        target = np.asarray(self.eye_pos, np.float64) + np.asarray(self.dir, np.float64)
        self.view = look_at_rh(self.eye_pos, target, self.up)
        self.projection_inverse = inverse(self.projection)
        self.view_inverse = inverse(self.view)

    def is_default_cam(self) -> bool:  # src/camera.rs:92-123
        return (
            all(approx_equal(a, b) for a, b in zip(self.eye_pos, DEFAULT_CAM_POS))
            and all(approx_equal(a, b) for a, b in zip(self.dir, DEFAULT_CAM_DIR))
            and all(approx_equal(a, b) for a, b in zip(self.up, DEFAULT_CAM_UP))
            and approx_equal(self.fov, np.radians(DEFAULT_FOV_DEG))
            and approx_equal(self.clipping_near, DEFAULT_CLIPPING_NEAR)
            and approx_equal(self.clipping_far, DEFAULT_CLIPPING_FAR)
        )

    def set_cam_position(self, eye_pos, dir) -> None:  # src/camera.rs:125-131
        self.eye_pos = np.asarray(eye_pos, np.float32)
        self.dir = np.asarray(dir, np.float32)
        self.init_matrices()

    def is_point_in_frustum(self, point) -> bool:  # src/camera.rs:133-140
        # degenerate candidate cameras (auto-search may aim dir along up,
        # giving a NaN view matrix) must simply report "not in frustum" —
        # NaN comparisons already do, so only the warning needs silencing
        with np.errstate(invalid="ignore"):
            pv = self.projection.astype(np.float64) @ self.view.astype(np.float64)
            p = np.append(np.asarray(point, np.float64), 1.0)
            clip = pv @ p
            w = clip[3]
            return bool(abs(clip[0]) <= w and abs(clip[1]) <= w
                        and abs(clip[2]) <= w)

    def print(self) -> None:  # src/camera.rs:142-160
        print(f"width: {self.width}\nheight: {self.height}\naspect_ratio: {self.aspect_ratio}")
        print(f"fov: {self.fov}\neye_pos: {self.eye_pos}\nup: {self.up}\ndir: {self.dir}")
        print(f"clipping_near: {self.clipping_near}\nclipping_far: {self.clipping_far}")
