"""Device intersection kernels (jnp), replicating parry3d cast semantics.

Sphere: parry ``Ball::cast_local_ray_and_get_normal`` with the reference's
"solid" flag logic (src/shape/sphere.rs:45-67) — a solid cast from inside
returns toi=0 with the inside-normal negated; a non-solid cast returns the
far intersection.

Triangles: world-space intersection.  The reference transforms the ray into
object space and casts against a parry ``TriMesh`` (src/shape/mesh.rs:61-103);
because the map is affine, the ray parameter t and the barycentrics are
identical when intersecting the *world-transformed* triangle directly, which
lets us precompute per-triangle constants (Baldwin–Weber style) so the hot
loop is six ``(N,3)@(3,K)`` matmuls — MXU work — plus elementwise masking.

Backface convention (parry): the returned triangle normal opposes the ray;
``FeatureId`` marks backfaces (``TriMesh::is_backface``).  We carry an
explicit ``backface`` flag = sign(d·n_world)·sign(det(M)) > 0, equal to the
object-space test the reference relies on.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

INF = jnp.float32(3.0e38)


def dot(a, b, axis=-1):
    return jnp.sum(a * b, axis=axis)


def cross(a, b):
    return jnp.cross(a, b)


def safe_normalize(v, axis=-1, eps=1e-15):
    # max() inside the sqrt keeps the zero-vector gradient finite; eps² must
    # stay representable in f32 (no subnormal underflow back to sqrt(0))
    n = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=axis, keepdims=True), eps * eps))
    return v / n


def transform_point(mat, p):
    """(…,4,4) × (…,3) point transform (homogeneous w=1)."""
    return jnp.einsum("...ij,...j->...i", mat[..., :3, :3], p) + mat[..., :3, 3]


def transform_dir(mat, d):
    return jnp.einsum("...ij,...j->...i", mat[..., :3, :3], d)


# --------------------------------------------------------------------------
# Per-frame precomputation (differentiable through instance transforms)
# --------------------------------------------------------------------------

@struct.dataclass
class TrianglePrep:
    """World-space triangle data + Baldwin–Weber constants.

    u = p·g1 + c1, v = p·g2 + c2 for points p on the triangle plane, with
    u the weight of vertex b and v the weight of vertex c (Möller–Trumbore
    convention; equals the area barycentrics of src/shape/mesh.rs:145-152).
    """
    a: jnp.ndarray        # (T, 3) world vertex a
    n: jnp.ndarray        # (T, 3) raw world geometric normal (e1 × e2)
    an: jnp.ndarray       # (T,) a·n
    g1: jnp.ndarray       # (T, 3)
    c1: jnp.ndarray       # (T,)
    g2: jnp.ndarray       # (T, 3)
    c2: jnp.ndarray       # (T,)
    flat_n: jnp.ndarray   # (T, 3) normalize(M · normalize(local cross)) — the
                          # reference's model-matrix-transformed flat normal
                          # (src/shape/mesh.rs:92; quirk: not inverse-transpose)
    backface_sign: jnp.ndarray  # (T,) det-sign of owner instance
    # optional (C, 16, K) cluster-slab packing of the constants above for the
    # Pallas trace kernel (ops/block_trace.pack_cluster_tris); None when the
    # kernel is unused.  Selection-only — consumers stop_gradient it.
    pallas_pack: object = None
    # Per-winner shading packs (ops/traverse.build_shade_packs).  TPU gathers
    # cost ~6 ns/row regardless of row width up to 16 floats (measured,
    # tools/gather_bench.py), so all per-triangle data a winning hit needs is
    # packed into two (T, 16) tables — ONE gather each instead of ~12
    # separate per-component gathers (the round-3 frame spent >60% of device
    # time in exactly those gathers).
    #
    # shade_pack (T, 16): 0-2 n·bsign, 3 an·bsign, 4-6 g1, 7 c1, 8-10 g2,
    #   11 c2, 12-14 flat_n, 15 owner instance (exact small int as f32).
    #   Folding backface_sign into (n, an) keeps t = (an - o·n)/(d·n)
    #   bit-identical (sign flips cancel) while making the backface test a
    #   plain d·n' > 0.
    # corner_pack (T, 16): 0-8 world vertex normals of the 3 corners,
    #   9 has_loaded_normals, 10-15 UV coords of the 3 corners (zeros when
    #   the mesh has no UV topology — reproducing the (0, 0) fallback of
    #   src/shape/mesh.rs:105-161).
    shade_pack: object = None
    corner_pack: object = None
    # packed material tables (ops/traverse.build_mat_packs) built once per
    # frame alongside the shade packs: hit_attributes runs once per level
    # for primaries AND shadow occluders, and rebuilding the concatenates
    # there relied on XLA CSE to dedupe (ADVICE r4)
    mat_pack_f: object = None
    mat_pack_i: object = None


def prepare_triangles(sa) -> TrianglePrep:
    """Build world-space triangle constants from SceneArrays (per frame)."""
    va = sa.verts[sa.tris[:, 0]]
    vb = sa.verts[sa.tris[:, 1]]
    vc = sa.verts[sa.tris[:, 2]]
    m = sa.inst_trans[sa.tri_inst]  # (T, 4, 4)
    wa = transform_point(m, va)
    wb = transform_point(m, vb)
    wc = transform_point(m, vc)

    e1 = wb - wa
    e2 = wc - wa
    n = cross(e1, e2)
    nn = jnp.maximum(dot(n, n), 1e-30)
    g1 = cross(e2, n) / nn[:, None]
    g2 = cross(n, e1) / nn[:, None]

    local_n = cross(vb - va, vc - va)
    flat_n = safe_normalize(transform_dir(m, safe_normalize(local_n)))

    return TrianglePrep(
        a=wa, n=n, an=dot(wa, n),
        g1=g1, c1=-dot(wa, g1), g2=g2, c2=-dot(wa, g2),
        flat_n=flat_n, backface_sign=sa.inst_det_sign[sa.tri_inst],
    )


# --------------------------------------------------------------------------
# Sphere cast (parry Ball semantics)
# --------------------------------------------------------------------------

def sphere_cast(local_o, local_d, radius, solid):
    """parry3d ``ray_toi_with_ball`` (object space, ball at origin).

    Args are broadcastable; ``local_d`` may be non-unit (the inverse-mapped
    world ray).  Returns (hit, t, inside):
    - outside & entering: t = near root
    - inside & solid: t = 0
    - inside & not solid: t = far root
    """
    a = dot(local_d, local_d)
    b = dot(local_o, local_d)
    c = dot(local_o, local_o) - radius * radius
    delta = b * b - a * c
    # clamp away from 0: sqrt'(0) is infinite and NaN-poisons gradients of
    # miss lanes (0 cotangent × inf); forward values unchanged beyond ~1e-15
    sq = jnp.sqrt(jnp.maximum(delta, 1e-30))
    a_safe = jnp.maximum(a, 1e-30)
    t_near = (-b - sq) / a_safe
    t_far = (-b + sq) / a_safe

    miss = ((c > 0.0) & (b > 0.0)) | (delta < 0.0)
    inside = (~miss) & (t_near <= 0.0)
    t = jnp.where(inside, jnp.where(solid, 0.0, t_far), t_near)
    hit = ~miss
    return hit, t, inside


def sphere_hit_normal(local_o, local_d, t, inside, trans):
    """World normal at a ball hit: local (p - center)/|..| then transformed by
    the *model matrix* (reference quirk, src/shape/sphere.rs:63), negated when
    the cast started inside."""
    local_p = local_o + t[..., None] * local_d
    n_local = safe_normalize(local_p)
    n_local = jnp.where(inside[..., None], -n_local, n_local)
    return safe_normalize(transform_dir(trans, n_local))


# --------------------------------------------------------------------------
# Dense ray × triangle-tile intersection (MXU path)
# --------------------------------------------------------------------------

def intersect_tri_tile(o, d, a_dot_n, n, g1, c1, g2, c2, tri_ok):
    """Intersect N rays against a K-triangle tile.

    o, d: (N, 3); n, g1, g2: (K, 3); a_dot_n, c1, c2, tri_ok: (K,).
    Returns (t, hit) of shape (N, K); t = INF where missed.

    Deliberately elementwise (VPU), NOT ``(N,3)@(3,K)`` matmuls: a K=3
    contraction runs the 128×128 MXU at ~2% utilization, and — measured on
    TPU — XLA's default f32 matmul precision (bf16 passes) perturbs t by up
    to ~20% on edge-grazing rays.  The operation order matches the gathered
    path (ops/cluster_trace._intersect_gathered) and the Pallas kernel
    exactly, so all three paths agree to ULP-level.
    """
    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    n0, n1, n2 = n[:, 0][None], n[:, 1][None], n[:, 2][None]
    g10, g11, g12 = g1[:, 0][None], g1[:, 1][None], g1[:, 2][None]
    g20, g21, g22 = g2[:, 0][None], g2[:, 1][None], g2[:, 2][None]

    d_n = dx * n0 + dy * n1 + dz * n2        # (N, K)
    o_n = ox * n0 + oy * n1 + oz * n2
    denom_ok = jnp.abs(d_n) > 1e-30
    t = (a_dot_n[None, :] - o_n) / jnp.where(denom_ok, d_n, 1.0)
    px, py, pz = ox + t * dx, oy + t * dy, oz + t * dz
    u = px * g10 + py * g11 + pz * g12 + c1[None, :]
    v = px * g20 + py * g21 + pz * g22 + c2[None, :]

    hit = (denom_ok & (t >= 0.0) & (u >= 0.0) & (v >= 0.0)
           & (u + v <= 1.0) & tri_ok[None, :])
    return jnp.where(hit, t, INF), hit


def closest_tri(o, d, prep: TrianglePrep, tri_ok, tile: int):
    """Scan triangle tiles, keeping the closest hit per ray.

    tri_ok: (T,) bool — per-trace candidate mask (visibility/shadow/etc.).
    Returns (best_t (N,), best_tri (N,) int32); best_t = INF on miss.
    """
    n_rays = o.shape[0]
    n_tris = prep.a.shape[0]
    n_tiles = n_tris // tile if n_tris % tile == 0 else n_tris // tile + 1
    pad = n_tiles * tile

    def pad_to(x, fill=0.0):
        if x.shape[0] == pad:
            return x
        return jnp.concatenate(
            [x, jnp.full((pad - x.shape[0],) + x.shape[1:], fill, x.dtype)])

    an = pad_to(prep.an)
    nrm = pad_to(prep.n)
    g1 = pad_to(prep.g1)
    c1 = pad_to(prep.c1)
    g2 = pad_to(prep.g2)
    c2 = pad_to(prep.c2)
    ok = pad_to(tri_ok, False)

    def body(i, carry):
        best_t, best_i = carry
        s = i * tile
        t_tile, _ = intersect_tri_tile(
            o, d,
            jax.lax.dynamic_slice_in_dim(an, s, tile),
            jax.lax.dynamic_slice_in_dim(nrm, s, tile),
            jax.lax.dynamic_slice_in_dim(g1, s, tile),
            jax.lax.dynamic_slice_in_dim(c1, s, tile),
            jax.lax.dynamic_slice_in_dim(g2, s, tile),
            jax.lax.dynamic_slice_in_dim(c2, s, tile),
            jax.lax.dynamic_slice_in_dim(ok, s, tile))
        tile_t = jnp.min(t_tile, axis=1)
        tile_arg = jnp.argmin(t_tile, axis=1).astype(jnp.int32) + s
        better = tile_t < best_t
        return (jnp.where(better, tile_t, best_t),
                jnp.where(better, tile_arg, best_i))

    init = (jnp.full((n_rays,), INF), jnp.zeros((n_rays,), jnp.int32))
    if n_tiles == 1:
        return body(0, init)
    return jax.lax.fori_loop(0, n_tiles, body, init)


def tri_barycentrics(o, d, t, tri_idx, prep: TrianglePrep):
    """Recompute (u, v) and d·n for winning triangles (per-ray gather)."""
    g1 = prep.g1[tri_idx]
    c1 = prep.c1[tri_idx]
    g2 = prep.g2[tri_idx]
    c2 = prep.c2[tri_idx]
    n = prep.n[tri_idx]
    p = o + t[:, None] * d
    u = dot(p, g1) + c1
    v = dot(p, g2) + c2
    d_n = dot(d, n)
    return u, v, d_n
