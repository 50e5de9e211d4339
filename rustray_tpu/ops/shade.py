"""Shading math: Lambert/Phong lights, shadows, fresnel, refraction, jitter.

Quirk-exact replication of src/raytracing.rs:492-626 and :720-998 — see
SURVEY.md §2.1.  Notable reproduced quirks:
- point/spot falloff is I/(4π·distance), *not* distance²
  (src/raytracing.rs:845-858: the variable named r2 holds ``.norm()``).
- fresnel uses cos_i = |cos_t| (src/raytracing.rs:557-561), collapsing r_s
  and r_p to constants unless total internal reflection.
- reflection adds ``reflection_color * reflectivity`` (the fresnel-weighted
  variant is commented out, src/raytracing.rs:943-944).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .intersect import dot, safe_normalize

SHADOW_BIAS = 1e-3
PI = jnp.pi


def safe_sqrt(x, eps=1e-12):
    """sqrt with a clamped argument: identical forward values away from 0
    (and within ~1e-6 at 0) but a finite gradient at the boundary — sqrt(0)
    has an infinite VJP which poisons scene-parameter gradients."""
    return jnp.sqrt(jnp.maximum(x, eps))


def reflect(i, n):
    """GLSL-style reflect — src/raytracing.rs:714-718."""
    return i - 2.0 * dot(n, i)[..., None] * n


def create_reflection(normal, incident, point):
    """src/raytracing.rs:492-498."""
    origin = point + normal * SHADOW_BIAS
    direction = incident - 2.0 * dot(incident, normal)[..., None] * normal
    return origin, direction


def create_transmission(normal, incident, point, index):
    """Snell refraction — src/raytracing.rs:500-533.

    Returns (origin, dir, valid); valid is False on total internal
    reflection (k < 0), in which case the reference spawns no ray.
    """
    i_dot_n = dot(incident, normal)
    outside = i_dot_n < 0.0
    ref_n = jnp.where(outside[..., None], normal, -normal)
    eta_i = jnp.where(outside, 1.0, index)
    eta_t = jnp.where(outside, index, 1.0)
    idn = jnp.abs(i_dot_n)
    eta = eta_i / jnp.maximum(eta_t, 1e-30)
    k = 1.0 - eta * eta * (1.0 - idn * idn)
    valid = k >= 0.0
    origin = point + ref_n * (-SHADOW_BIAS)
    direction = (incident + idn[..., None] * ref_n) * eta[..., None] \
        - ref_n * safe_sqrt(k)[..., None]
    return origin, direction, valid


def fresnel(incident, normal, index):
    """src/raytracing.rs:535-563 — replicated exactly, including the
    reference's ``cos_i = cos_t.abs()`` quirk."""
    i_dot_n = dot(incident, normal)
    flip = i_dot_n > 0.0
    eta_i = jnp.where(flip, index, 1.0)
    eta_t = jnp.where(flip, 1.0, index)
    sin_t = eta_i / jnp.maximum(eta_t, 1e-30) * safe_sqrt(
        1.0 - i_dot_n * i_dot_n)
    tir = sin_t > 1.0
    cos_t = safe_sqrt(1.0 - sin_t * sin_t)
    cos_i = jnp.abs(cos_t)
    r_s = ((eta_t * cos_i) - (eta_i * cos_t)) / jnp.maximum(
        (eta_t * cos_i) + (eta_i * cos_t), 1e-30)
    r_p = ((eta_i * cos_i) - (eta_t * cos_t)) / jnp.maximum(
        (eta_i * cos_i) + (eta_t * cos_t), 1e-30)
    kr = (r_s * r_s + r_p * r_p) / 2.0
    return jnp.where(tir, 1.0, kr)


def jitter(key, direction, spread):
    """Cone jitter around ``direction`` — src/raytracing.rs:565-626.

    z ~ U[cos(spread·π), 1), θ ~ U[-π, π); basis from the axis test
    |b3.x| < 0.5.  The reference draws from ``thread_rng``; we use a counted
    threefry stream so Monte-Carlo renders are deterministic and replayable
    (path-replay differentiability).  spread <= 0 or an empty z-range returns
    the direction unchanged.
    """
    b3 = safe_normalize(direction)
    use_x = jnp.abs(b3[..., 0]) < 0.5
    diff = jnp.where(use_x[..., None],
                     jnp.array([1.0, 0.0, 0.0], jnp.float32),
                     jnp.array([0.0, 1.0, 0.0], jnp.float32))
    b1 = safe_normalize(jnp.cross(b3, diff))
    b2 = jnp.cross(b1, b3)

    z_lo = jnp.cos(spread * PI)
    u = jax.random.uniform(key, direction.shape[:-1] + (2,), jnp.float32)
    u1 = u[..., 0]
    u2 = u[..., 1]
    z = z_lo + (1.0 - z_lo) * u1
    r = safe_sqrt(1.0 - z * z)
    theta = -PI + 2.0 * PI * u2
    x = r * jnp.cos(theta)
    y = r * jnp.sin(theta)
    new_dir = safe_normalize(x[..., None] * b1 + y[..., None] * b2 + z[..., None] * b3)

    empty = z_lo >= 1.0
    keep = (spread <= 0.0) | empty
    return jnp.where(keep[..., None], direction, new_dir)


def gamma_encode(linear):
    """src/raytracing.rs:231-235."""
    return jnp.power(jnp.maximum(linear, 0.0), 1.0 / 2.2)
