"""Image-space post-processing: cavity + outline — src/post_processing.rs.

Operates on the color image and the normal / object-id AOVs exactly like the
reference's Blender-workbench-derived passes:
- cavity: curvature from 4-neighbor normal cross-differences with the
  soft-clamp (ridge 1.15 / valley 1.0), multiplying rgb by (curvature + 1)
  (src/post_processing.rs:25-95,163-169).
- outline: white where any 4-neighbor object id disagrees, weighted by the
  fraction of disagreeing neighbors (src/post_processing.rs:97-121,151-161).

Out-of-bounds texel fetches return zeros, replicating the reference's
flat-index bounds check (src/post_processing.rs:35-63) — note that check
wraps horizontally at row ends (a flat y*w+x index), which we reproduce.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PostProcessingConfig


def _fetch_flat(arr_flat, x, y, w, n):
    """Reference texel fetch: flat index y*w+x, zero when outside [0, n)."""
    idx = y * w + x
    ok = (idx >= 0) & (idx < n)
    safe = jnp.clip(idx, 0, n - 1)
    val = arr_flat[safe]
    return jnp.where(ok[..., None] if arr_flat.ndim == 2 else ok, val, 0)


def curvature_soft_clamp(curvature, control):
    return jnp.where(curvature < 0.5 / control,
                     curvature * (1.0 - curvature * control),
                     0.25 / control)


def run_post_processing(config: PostProcessingConfig, image: np.ndarray,
                        normals: np.ndarray, depth: np.ndarray,
                        object_ids: np.ndarray) -> np.ndarray:
    """image: (H, W, 3) uint8; normals: (H, W, 3); object_ids: (H, W) int32.
    Returns the processed (H, W, 3) uint8 image."""
    h, w = image.shape[:2]
    img = jnp.asarray(image, jnp.float32)
    n_flat = jnp.asarray(normals, jnp.float32).reshape(-1, 3)
    id_flat = jnp.asarray(object_ids, jnp.int32).reshape(-1)
    n = h * w

    xs = jnp.arange(w)[None, :] * jnp.ones((h, 1), jnp.int32)
    ys = jnp.arange(h)[:, None] * jnp.ones((1, w), jnp.int32)

    r = img[..., 0]
    g = img[..., 1]
    b = img[..., 2]

    if config.outline:
        center = _fetch_flat(id_flat, xs, ys, w, n)
        up = _fetch_flat(id_flat, xs, ys + 1, w, n)
        down = _fetch_flat(id_flat, xs, ys - 1, w, n)
        right = _fetch_flat(id_flat, xs - 1, ys, w, n)
        left = _fetch_flat(id_flat, xs + 1, ys, w, n)
        eq = (jnp.stack([up, down, right, left]) == center[None]).astype(jnp.float32)
        outline = 1.0 - jnp.sum(eq * 0.25, axis=0)
        mask = outline > 0.0
        r = jnp.where(mask, outline * 255.0, r)
        g = jnp.where(mask, outline * 255.0, g)
        b = jnp.where(mask, outline * 255.0, b)

    if config.cavity:
        ridge, valley = 1.15, 1.0
        n_up = _fetch_flat(n_flat, xs, ys + 1, w, n)
        n_down = _fetch_flat(n_flat, xs, ys - 1, w, n)
        n_left = _fetch_flat(n_flat, xs - 1, ys, w, n)
        n_right = _fetch_flat(n_flat, xs + 1, ys, w, n)
        # .xz() swizzle: x component of left/right, z component of up/down
        normal_diff = ((n_up[..., 2] - n_down[..., 2])
                       + (n_right[..., 0] - n_left[..., 0]))
        curv = jnp.where(normal_diff < 0.0,
                         -2.0 * curvature_soft_clamp(-normal_diff, valley),
                         2.0 * curvature_soft_clamp(normal_diff, ridge))
        r = r * (curv + 1.0)
        g = g * (curv + 1.0)
        b = b * (curv + 1.0)

    out = jnp.stack([r, g, b], axis=-1)
    out = jnp.clip(out, 0.0, 255.0)
    return np.asarray(out).astype(np.uint8)
