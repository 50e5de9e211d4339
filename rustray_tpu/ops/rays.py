"""Camera ray generation (AA + DOF) — src/raytracing.rs:275-396.

All math follows the reference exactly:
- sensor coords: ((x+0.5)/w)*2-1, 1-((y+0.5)/h)*2, z = -1 (clip-plane dist).
- the AA translation is *uncentered* (shifts right/up within the pixel) and
  only recentred by half a pixel step when DOF is active with samples > 1
  (src/raytracing.rs:325-334).
- DOF: aperture offsets scale with width/800; the focal point lies along the
  *center* ray at 1/(dist/(dist+focal_length)) (src/raytracing.rs:337-376).
"""
from __future__ import annotations

import jax.numpy as jnp

CAM_CLIPPING_PLANE_DIST = 1.0
APERTURE_BASE_RESOLUTION = 800.0


def _mat4_point(m, v3):
    """m @ [v3, 1] → (…, 4)."""
    return (v3[..., 0:1] * m[:, 0] + v3[..., 1:2] * m[:, 1]
            + v3[..., 2:3] * m[:, 2] + m[:, 3])


def _mat4_vec(m, v4):
    return v4 @ m.T


def primary_rays(cam, width, height, px, py, x_i, y_i, cell_size,
                 aperture_size, focal_length, samples):
    """Generate one AA sample's rays for pixel coords (px, py).

    cam: CameraArrays; px/py (N,) int32; x_i/y_i scalar int cell indices.
    Returns (origin (N,3), dir (N,3) unnormalized — normalized by the caller
    like src/raytracing.rs:723).
    """
    w = jnp.float32(width)
    h = jnp.float32(height)
    x_f = px.astype(jnp.float32)
    y_f = py.astype(jnp.float32)
    x_step = 2.0 / w
    y_step = 2.0 / h

    dof = (aperture_size > 1.0) and (focal_length > 1.0)

    x_trans = x_step * jnp.asarray(x_i).astype(jnp.float32) * (1.0 / jnp.float32(cell_size))
    y_trans = y_step * jnp.asarray(y_i).astype(jnp.float32) * (1.0 / jnp.float32(cell_size))
    if dof and samples > 1:
        x_trans = x_trans - x_step / 2.0
        y_trans = y_trans - y_step / 2.0

    proj_inv = cam.proj_inv
    view_inv = cam.view_inv

    if dof:
        aperture_scale = w / APERTURE_BASE_RESOLUTION
        x_trans = x_trans * jnp.float32(aperture_size) * aperture_scale
        y_trans = y_trans * jnp.float32(aperture_size) * aperture_scale

        # center pixel ray (src/raytracing.rs:344-358)
        center_x = ((x_f + 0.5) / w) * 2.0 - 1.0
        center_y = 1.0 - ((y_f + 0.5) / h) * 2.0
        cpp = _mat4_point(proj_inv, jnp.stack(
            [center_x, center_y, jnp.full_like(center_x, -CAM_CLIPPING_PLANE_DIST)], -1))
        cpp = cpp.at[..., 3].set(1.0)
        ray_dir_view = cpp - jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)
        ray_dir_view = ray_dir_view.at[..., 3].set(0.0)
        origin = _mat4_vec(view_inv, jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32))
        dirw = _mat4_vec(view_inv, ray_dir_view)
        dirw = dirw / jnp.linalg.norm(dirw[..., :3], axis=-1, keepdims=True)
        dist = jnp.linalg.norm(ray_dir_view[..., :3], axis=-1)

        # focal point (src/raytracing.rs:360-362)
        scale = CAM_CLIPPING_PLANE_DIST / (dist / (dist + jnp.float32(focal_length)))
        p = origin + scale[..., None] * dirw

        # offset ray (src/raytracing.rs:364-376)
        sx = (((x_f + 0.5) / w) * 2.0 - 1.0) + x_trans
        sy = (1.0 - ((y_f + 0.5) / h) * 2.0) + y_trans
        pp = _mat4_point(proj_inv, jnp.stack(
            [sx, sy, jnp.full_like(sx, -CAM_CLIPPING_PLANE_DIST)], -1))
        pp = pp.at[..., 3].set(1.0)
        ray_origin = _mat4_vec(view_inv, pp)
        ray_dir = p - ray_origin
        return ray_origin[..., :3], ray_dir[..., :3]
    else:
        sx = (((x_f + 0.5) / w) * 2.0 - 1.0) + x_trans
        sy = (1.0 - ((y_f + 0.5) / h) * 2.0) + y_trans
        pp = _mat4_point(proj_inv, jnp.stack(
            [sx, sy, jnp.full_like(sx, -CAM_CLIPPING_PLANE_DIST)], -1))
        pp = pp.at[..., 3].set(1.0)
        ray_dir = pp - jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)
        ray_dir = ray_dir.at[..., 3].set(0.0)
        origin = _mat4_vec(view_inv, pp)
        dirw = _mat4_vec(view_inv, ray_dir)
        return origin[..., :3], dirw[..., :3]


def pick_ray(cam, width, height, x, y):
    """Single center ray for picking — src/raytracing.rs:237-262."""
    import numpy as np
    px = jnp.asarray([x], jnp.int32)
    py = jnp.asarray([y], jnp.int32)
    o, d = primary_rays(cam, width, height, px, py, 0, 0, 1, 1.0, 1.0, 1)
    return o, d
