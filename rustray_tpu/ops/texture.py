"""Texture-atlas sampling replicating the reference's fetch paths.

- nearest + wrap: src/raytracing.rs:629-642 (truncating modulo wrap) via
  ``get_texture_pixel`` (src/shape/mod.rs:510-540).
- bilinear: src/shape/mod.rs:542-629 — note its quirks are preserved exactly:
  negative coords get +size once, floor/ceil texels are clamped to the edge
  *before* the fractional weight is taken against the clamped x0, so
  out-of-range UVs extrapolate at borders exactly like the reference.
"""
from __future__ import annotations

import jax.numpy as jnp



def _fetch(texels, offset, w, x, y):
    """Gather packed-rgba texels → (…, 4) float in [0, 1]."""
    idx = offset + y * w + x
    packed = texels[jnp.clip(idx, 0, texels.shape[0] - 1)]
    packed = packed.astype(jnp.uint32)
    r = (packed & 0xFF).astype(jnp.float32)
    g = ((packed >> 8) & 0xFF).astype(jnp.float32)
    b = ((packed >> 16) & 0xFF).astype(jnp.float32)
    a = ((packed >> 24) & 0xFF).astype(jnp.float32)
    return jnp.stack([r, g, b, a], axis=-1) / 255.0


def _wrap(val, bound):
    """Rust wrap (src/raytracing.rs:629-642): trunc(val*bound) % bound,
    shifted positive.  ``bound`` int32 > 0."""
    f = val * bound.astype(jnp.float32)
    w = jnp.trunc(f).astype(jnp.int32) % bound
    return jnp.where(w < 0, w + bound, w)


def sample_nearest(texels, offset, w, h, u, v):
    x = _wrap(u, w)
    y = _wrap(v, h)
    return _fetch(texels, offset, w, x, y)


def sample_bilinear(texels, offset, w, h, u, v):
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    x = u * wf
    y = v * hf
    x = jnp.where(x < 0.0, x + wf, x)
    y = jnp.where(y < 0.0, y + hf, y)

    # floor/ceil as-u32 cast saturates at 0 for negatives (Rust `as u32`)
    x0 = jnp.clip(jnp.floor(x), 0.0, None).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil(x), 0.0, None).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0.0, None).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil(y), 0.0, None).astype(jnp.int32)
    x0 = jnp.minimum(x0, w - 1)
    x1 = jnp.minimum(x1, w - 1)
    y0 = jnp.minimum(y0, h - 1)
    y1 = jnp.minimum(y1, h - 1)

    xf = x - x0.astype(jnp.float32)
    yf = y - y0.astype(jnp.float32)

    p0 = _fetch(texels, offset, w, x0, y0)
    p1 = _fetch(texels, offset, w, x1, y0)
    p2 = _fetch(texels, offset, w, x0, y1)
    p3 = _fetch(texels, offset, w, x1, y1)

    top = p0 + xf[..., None] * (p1 - p0)
    bot = p2 + xf[..., None] * (p3 - p2)
    return top + yf[..., None] * (bot - top)


def get_tex_color(sa, mat_idx, tex_type: int, uv):
    """Per-ray texture fetch.  Returns (rgba (N,4), has (N,) bool).

    Matches ``Raytracing::get_tex_color`` (src/raytracing.rs:651-675):
    nearest-vs-bilinear is a per-material flag; ``has`` is False when the
    material has no texture in this slot (caller falls back to defaults).
    """
    offset = sa.materials.tex_offset[mat_idx, tex_type]
    w = sa.materials.tex_w[mat_idx, tex_type]
    h = sa.materials.tex_h[mat_idx, tex_type]
    nearest = sa.materials.tex_nearest[mat_idx]
    return _sample_channel(sa.tex_texels, offset, w, h, nearest, uv,
                           True, True)


def _sample_channel(texels, offset, w, h, nearest, uv,
                    any_nearest: bool, any_bilinear: bool):
    """Shared fetch core over pre-gathered (offset, w, h, nearest) arrays.

    ``any_nearest`` / ``any_bilinear`` are compile-time flags: a filter mode
    no material in the scene uses is skipped entirely (each mode is 1 resp.
    4 texel-pool gathers — a top device cost, see tools/gather_bench.py)."""
    has = w > 0
    w_safe = jnp.maximum(w, 1)
    h_safe = jnp.maximum(h, 1)
    u, v = uv[..., 0], uv[..., 1]
    if any_nearest and any_bilinear:
        rgba_n = sample_nearest(texels, offset, w_safe, h_safe, u, v)
        rgba_b = sample_bilinear(texels, offset, w_safe, h_safe, u, v)
        rgba = jnp.where((nearest != 0)[..., None], rgba_n, rgba_b)
    elif any_nearest:
        rgba = sample_nearest(texels, offset, w_safe, h_safe, u, v)
    else:
        rgba = sample_bilinear(texels, offset, w_safe, h_safe, u, v)
    default = jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)
    rgba = jnp.where(has[..., None], rgba, default)
    return rgba, has


def _unpack(packed):
    packed = packed.astype(jnp.uint32)
    r = (packed & 0xFF).astype(jnp.float32)
    g = ((packed >> 8) & 0xFF).astype(jnp.float32)
    b = ((packed >> 16) & 0xFF).astype(jnp.float32)
    a = ((packed >> 24) & 0xFF).astype(jnp.float32)
    return jnp.stack([r, g, b, a], axis=-1) / 255.0


def _sample_bilinear_pairs(pairs, offset, w, h, u, v):
    """Bilinear fetch via the (NT, 2) horizontal-pair table: 2 row gathers
    instead of 4 scalar gathers (identical values to sample_bilinear —
    pair[i] = [texel i, texel i+1], and x1 is always x0 or x0+1)."""
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    x = u * wf
    y = v * hf
    x = jnp.where(x < 0.0, x + wf, x)
    y = jnp.where(y < 0.0, y + hf, y)
    x0 = jnp.clip(jnp.floor(x), 0.0, None).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil(x), 0.0, None).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0.0, None).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil(y), 0.0, None).astype(jnp.int32)
    x0 = jnp.minimum(x0, w - 1)
    x1 = jnp.minimum(x1, w - 1)
    y0 = jnp.minimum(y0, h - 1)
    y1 = jnp.minimum(y1, h - 1)
    xf = x - x0.astype(jnp.float32)
    yf = y - y0.astype(jnp.float32)

    nt = pairs.shape[0]
    r0 = pairs[jnp.clip(offset + y0 * w + x0, 0, nt - 1)]     # (N, 2)
    r1 = pairs[jnp.clip(offset + y1 * w + x0, 0, nt - 1)]
    right = (x1 > x0)[..., None]
    p0 = _unpack(r0[..., 0])
    p1 = jnp.where(right, _unpack(r0[..., 1]), p0)
    p2 = _unpack(r1[..., 0])
    p3 = jnp.where(right, _unpack(r1[..., 1]), p2)

    top = p0 + xf[..., None] * (p1 - p0)
    bot = p2 + xf[..., None] * (p3 - p2)
    return top + yf[..., None] * (bot - top)


def get_tex_color_rows(sa, mat_i, tex_type: int, uv, static):
    """Texture fetch from pre-gathered packed material rows (the hot path).

    ``mat_i`` is the (N, MATI_W) row gather of ops/traverse.build_mat_packs;
    offset/w/h/nearest are slices of it — no per-channel material-table
    gathers.  Bilinear fetches go through the horizontal-pair table
    (2 gathers instead of 4).  Semantics identical to :func:`get_tex_color`.
    """
    from .traverse import MI_NEAREST, MI_TEX_H, MI_TEX_OFF, MI_TEX_W
    offset = mat_i[..., MI_TEX_OFF + tex_type]
    w = mat_i[..., MI_TEX_W + tex_type]
    h = mat_i[..., MI_TEX_H + tex_type]
    nearest = mat_i[..., MI_NEAREST]
    has = w > 0
    w_safe = jnp.maximum(w, 1)
    h_safe = jnp.maximum(h, 1)
    u, v = uv[..., 0], uv[..., 1]
    if static.any_nearest and static.any_bilinear:
        rgba_n = sample_nearest(sa.tex_texels, offset, w_safe, h_safe, u, v)
        rgba_b = _sample_bilinear_pairs(sa.tex_pairs, offset, w_safe, h_safe,
                                        u, v)
        rgba = jnp.where((nearest != 0)[..., None], rgba_n, rgba_b)
    elif static.any_nearest:
        rgba = sample_nearest(sa.tex_texels, offset, w_safe, h_safe, u, v)
    else:
        rgba = _sample_bilinear_pairs(sa.tex_pairs, offset, w_safe, h_safe,
                                      u, v)
    default = jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)
    rgba = jnp.where(has[..., None], rgba, default)
    return rgba, has
