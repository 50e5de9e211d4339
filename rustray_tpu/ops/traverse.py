"""Closest-hit tracing over the compiled scene.

Replaces the reference's per-ray two-phase search
(``Raytracing::trace``, src/raytracing.rs:429-490): candidate filtering
(visible, alpha>0, cast_shadow for shadow rays, reflection_only only for
depth>1 — src/raytracing.rs:454) followed by exact intersection, taking the
minimum t.  The reference's bbox-sort is pure culling and cannot change the
winner, so the vectorized version simply takes the global argmin.

Mesh traversal has three interchangeable implementations:
- dense linear scan (ops/intersect.closest_tri) — small scenes, oracle;
- XLA block-coherent cluster walk (ops/cluster_trace) — CPU/GPU backends;
- Pallas per-block kernel (ops/block_trace) — the TPU production path.
The accelerated paths consume rays *sorted by coherence key* (direction
octant + origin Morton, ops/block_trace.coherence_key) so that secondary
and shadow wavefronts keep block bounds tight; results are scattered back
to the caller's order.

Gather discipline (the round-4 rule): XLA gathers on TPU cost ~6 ns *per
row* regardless of row width up to 16 floats (tools/gather_bench.py), and
scatters cost ~13x more — so per-winner data lives in two packed (T, 16)
tables (``build_shade_packs``) fetched with ONE gather each, the winner's
ray parameter comes straight out of the traversal (``selected_t`` defers
the analytic recomputation to the backward pass), and per-material scalars
live in two packed (M, ·) tables (``build_mat_packs``) fetched once per
shade.

Shadow semantics: shadow rays carry ``t_max`` = distance to the light
(clusters and hits beyond it are culled — the reference compares the hit
distance against the light distance, src/raytracing.rs:871-914) and the
Pallas path stops at the first confirmed hit per lane, the reference's
``stop_on_first_hit`` (src/raytracing.rs:483-487).  The dense/XLA paths
return the nearest hit instead; the occluder identity can differ only when
cluster boxes overlap, which affects only the alpha-texture attenuation of
that occluder (visually immaterial, deterministic per path).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .intersect import (INF, TrianglePrep, closest_tri, dot, safe_normalize,
                        sphere_cast, sphere_hit_normal, transform_dir,
                        transform_point)


@struct.dataclass
class Hit:
    t: jnp.ndarray        # (N,) world distance (dir normalized); INF on miss
    hit: jnp.ndarray      # (N,) bool
    is_mesh: jnp.ndarray  # (N,) bool
    inst: jnp.ndarray     # (N,) int32 instance index — valid for sphere hits
                          # always; for mesh hits only on the dense path
                          # (accel paths defer to shade_pack, resolved by
                          # hit_attributes)
    tri: jnp.ndarray      # (N,) int32 global triangle index (mesh hits)


@struct.dataclass
class HitAttrs:
    normal: jnp.ndarray    # (N, 3) shading normal pre-normal-mapping
    uv: jnp.ndarray        # (N, 2) reference get_uv (v negated)
    mat: jnp.ndarray       # (N,) int32 material slot
    obj_id: jnp.ndarray    # (N,) int32 reference object id
    point: jnp.ndarray     # (N, 3) world hit point
    mat_f: jnp.ndarray     # (N, MATF_W) gathered per-material float row
    mat_i: jnp.ndarray     # (N, MATI_W) gathered per-material int row


# --------------------------------------------------------------------------
# Packed per-material tables (one gather per shade instead of ~25)
# --------------------------------------------------------------------------
# mat_pack_f columns
MF_BASE = 0        # 0-2 base_color
MF_SPEC = 3        # 3-5 specular_color
MF_AMBIENT = 6     # 6-8 ambient_color
MF_ALPHA = 9
MF_SHININESS = 10
MF_REFLECTIVITY = 11
MF_REFR_INDEX = 12
MF_NM_STRENGTH = 13
MF_ROUGHNESS = 14
MF_SHADOW_SOFT = 15
MATF_W = 16
# mat_pack_i columns
MI_TEX_OFF = 0     # 0-7 tex_offset per TextureType
MI_TEX_W = 8       # 8-15
MI_TEX_H = 16      # 16-23
MI_NEAREST = 24
MI_RECV_SHADOW = 25
MI_MONTE_CARLO = 26
MI_SMOOTH = 27
MI_BACKFACE_CULL = 28
MATI_W = 32


def build_mat_packs(mats):
    """(M, 16) float + (M, 32) int packed material tables (differentiable
    through the float pack — gradients flow to the MaterialsSoA leaves)."""
    mf = jnp.concatenate([
        mats.base_color, mats.specular_color, mats.ambient_color,
        mats.alpha[:, None], mats.shininess[:, None],
        mats.reflectivity[:, None], mats.refraction_index[:, None],
        mats.normal_map_strength[:, None], mats.roughness[:, None],
        mats.shadow_softness[:, None],
    ], axis=1)
    M = mats.alpha.shape[0]
    mi = jnp.concatenate([
        mats.tex_offset, mats.tex_w, mats.tex_h,
        mats.tex_nearest[:, None].astype(jnp.int32),
        mats.receive_shadow[:, None].astype(jnp.int32),
        mats.monte_carlo[:, None].astype(jnp.int32),
        mats.smooth_shading[:, None].astype(jnp.int32),
        mats.backface_culling[:, None].astype(jnp.int32),
        jnp.zeros((M, MATI_W - 29), jnp.int32),
    ], axis=1)
    return mf, mi


# --------------------------------------------------------------------------
# Packed per-triangle tables (see TrianglePrep docstring for the layout)
# --------------------------------------------------------------------------

def build_shade_packs(sa, prep: TrianglePrep, wvn) -> TrianglePrep:
    """Attach shade_pack/corner_pack to ``prep`` (once per frame)."""
    bs = prep.backface_sign[:, None]
    shade = jnp.concatenate([
        prep.n * bs, (prep.an * prep.backface_sign)[:, None],
        prep.g1, prep.c1[:, None], prep.g2, prep.c2[:, None],
        prep.flat_n, sa.tri_inst.astype(jnp.float32)[:, None],
    ], axis=1)                                            # (T, 16)
    n_idx = sa.tri_n_idx
    has_n = (n_idx[:, 0] >= 0)
    safe_n = jnp.maximum(n_idx, 0)
    vnc = jnp.concatenate([wvn[safe_n[:, 0]], wvn[safe_n[:, 1]],
                           wvn[safe_n[:, 2]]], axis=1)    # (T, 9)
    uv_idx = sa.tri_uv_idx
    has_uv = uv_idx[:, 0] >= 0
    safe_uv = jnp.maximum(uv_idx, 0)
    uvc = jnp.concatenate([sa.uvs[safe_uv[:, 0]], sa.uvs[safe_uv[:, 1]],
                           sa.uvs[safe_uv[:, 2]]], axis=1)  # (T, 6)
    # zeroing missing-UV rows reproduces the (0, 0) fallback after
    # interpolation (src/shape/mesh.rs:105-161)
    uvc = jnp.where(has_uv[:, None], uvc, 0.0)
    corner = jnp.concatenate([vnc, has_n[:, None].astype(jnp.float32), uvc],
                             axis=1)                      # (T, 16)
    mat_f, mat_i = build_mat_packs(sa.materials)
    return prep.replace(shade_pack=shade, corner_pack=corner,
                        mat_pack_f=mat_f, mat_pack_i=mat_i)


# --------------------------------------------------------------------------
# Winner ray parameter with deferred analytic gradient
# --------------------------------------------------------------------------

@jax.custom_vjp
def selected_t(o, d, shade_pack, tri_idx, found, t_sel):
    """Forward: the traversal's own winner t (no gather).  Backward: the
    analytic t = (an - o·n)/(d·n) differentiated through one gathered
    triangle per ray — the gather (and a scatter-add into the pack
    cotangent) only exists in gradient traces, keeping the forward render
    free of the round-3 recompute_t gathers."""
    del o, d, shade_pack, tri_idx
    return jnp.where(found, t_sel, INF)


def _selected_t_fwd(o, d, shade_pack, tri_idx, found, t_sel):
    return selected_t(o, d, shade_pack, tri_idx, found, t_sel), \
        (o, d, shade_pack, tri_idx, found)


def _selected_t_bwd(res, g):
    o, d, pack, tri_idx, found = res
    row = pack[tri_idx]
    n = row[:, 0:3]
    an = row[:, 3]
    d_n = dot(d, n)
    denom = jnp.where(jnp.abs(d_n) > 1e-30, d_n, 1.0)
    t = (an - dot(o, n)) / denom
    g = jnp.where(found, g, 0.0)
    gd = (g / denom)[:, None]
    d_o = -gd * n
    d_d = -gd * t[:, None] * n
    d_an = g / denom
    d_nv = gd * (-o - t[:, None] * d)
    d_row = jnp.zeros_like(row)
    d_row = d_row.at[:, 0:3].set(d_nv).at[:, 3].set(d_an)
    d_pack = jnp.zeros_like(pack).at[tri_idx].add(
        jnp.where(found[:, None], d_row, 0.0))
    f0 = jax.dtypes.float0
    z_tri = np.zeros(tri_idx.shape, f0)
    z_found = np.zeros(found.shape, f0)
    return d_o, d_d, d_pack, z_tri, z_found, jnp.zeros_like(t)


selected_t.defvjp(_selected_t_fwd, _selected_t_bwd)


def instance_mask(sa, for_shadow: bool, allow_reflection_only: bool):
    """Candidate filter per instance — src/raytracing.rs:454."""
    m = sa.inst_mat
    mask = sa.inst_visible & (sa.materials.alpha[m] > 0.0)
    if for_shadow:
        mask = mask & sa.materials.cast_shadow[m]
    if not allow_reflection_only:
        mask = mask & ~sa.materials.reflection_only[m]
    return mask


def _sphere_solid(sa, for_shadow: bool):
    """src/shape/sphere.rs:50: solid iff fully opaque, no alpha texture,
    backface culling on, and not a shadow cast."""
    if for_shadow:
        return jnp.zeros_like(sa.sphere_valid)
    inst = sa.sphere_idx
    m = sa.inst_mat[inst]
    from ..scene.material import TextureType
    has_alpha_tex = sa.materials.tex_w[m, int(TextureType.Alpha)] > 0
    return (~((sa.materials.alpha[m] < 1.0) | has_alpha_tex)
            & sa.materials.backface_culling[m])


def _sorted_mesh_trace(sa, static, prep, o, d, alive, t_max, tri_ok, cl_ok,
                       accel_boxes, accel_impl, accel_block, accel_gather,
                       block_n, pallas_interpret, for_shadow,
                       pallas_algo="octet"):
    """Coherence-sort rays, run the accelerated mesh trace, scatter back.

    Returns (found, tri, t) in the caller's ray order; t is the traversal's
    selected winner distance (stop-gradient — see :func:`selected_t`)."""
    from .block_trace import (DEAD_ORIGIN, coherence_key, trace_tris_blocks)
    from .cluster_trace import select_closest_clusters

    w_lo, w_hi = accel_boxes
    n = o.shape[0]
    lo = jax.lax.stop_gradient(
        jnp.min(jnp.where(cl_ok[:, None], w_lo, jnp.float32(INF)), axis=0))
    hi = jax.lax.stop_gradient(
        jnp.max(jnp.where(cl_ok[:, None], w_hi, -jnp.float32(INF)), axis=0))
    key = coherence_key(jax.lax.stop_gradient(o), jax.lax.stop_gradient(d),
                        alive, lo, hi)
    perm = jnp.argsort(key)
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
    o_s, d_s = o[perm], d[perm]
    alive_s = alive[perm]
    tmax_s = None if t_max is None else t_max[perm]

    # per-lane cap at the ray's exit from the global cluster bounds: no
    # triangle lies beyond it, so sky/miss lanes stop holding the block's
    # early-exit ``need`` at infinity (the closest-walk's measured weak
    # spot — PERF_r04 round-5 input).  The 1e-4 relative + 1e-3 absolute
    # margin dominates any f32 disagreement between the slab exit and a
    # triangle t on the box boundary; rays missing the box get cap -1
    # (they cannot hit anything — alive stays, results unchanged).
    os_ = jax.lax.stop_gradient(o_s)
    ds_ = jax.lax.stop_gradient(d_s)
    eps = jnp.float32(1e-30)
    sd = jnp.where(jnp.abs(ds_) > eps, ds_, jnp.where(ds_ >= 0, eps, -eps))
    t0 = (lo[None] - os_) / sd
    t1 = (hi[None] - os_) / sd
    tn_box = jnp.max(jnp.minimum(t0, t1), axis=1)
    tf_box = jnp.min(jnp.maximum(t0, t1), axis=1)
    exit_cap = jnp.where(tf_box >= jnp.maximum(tn_box, 0.0),
                         tf_box * 1.0001 + 1e-3, -1.0)
    tmax_s = exit_cap if tmax_s is None else jnp.minimum(tmax_s, exit_cap)

    if accel_impl == "pallas":
        if pallas_algo == "octet":
            from .octet_trace import trace_tris_octets
            found_s, tri_s, t_s = trace_tris_octets(
                o_s, d_s, alive_s, tmax_s, prep, w_lo, w_hi, cl_ok,
                static.cluster_size, mode="any" if for_shadow else "closest",
                interpret=pallas_interpret)
        else:
            found_s, tri_s, t_s = trace_tris_blocks(
                o_s, d_s, alive_s, tmax_s, prep, w_lo, w_hi, cl_ok,
                static.cluster_size, block_n=block_n,
                mode="any" if for_shadow else "closest",
                interpret=pallas_interpret)
    else:
        o_t = jnp.where(alive_s[:, None], o_s, DEAD_ORIGIN)
        d_t = jnp.where(alive_s[:, None], d_s, 1.0)
        found_s, tri_s, t_s = select_closest_clusters(
            o_t, d_t, prep, tri_ok, w_lo, w_hi, cl_ok,
            static.cluster_size, accel_block, accel_gather, t_max=tmax_s)
    return found_s[inv], tri_s[inv], t_s[inv]


def trace_closest(sa, static, prep: TrianglePrep, o, d,
                  for_shadow: bool, allow_reflection_only: bool,
                  tri_tile: int = 1024, accel_boxes=None,
                  accel_block: int = 1024, accel_gather: int = 32,
                  accel_impl: str = "xla", alive=None, t_max=None,
                  block_n: int = 512, pallas_interpret: bool = False,
                  pallas_algo: str = "octet") -> Hit:
    """o (N,3), d (N,3) normalized.  Static flags select compile-time paths.

    ``accel_boxes``: optional (w_lo, w_hi) world cluster AABBs from
    :func:`rustray_tpu.ops.cluster_trace.world_cluster_aabbs`; when given,
    mesh intersection uses coherence-sorted cluster traversal instead of
    the dense linear scan (same winners, bounded work).

    ``alive``: optional (N,) bool — rays whose result is unused (their
    outputs are arbitrary and must be masked by the caller, which all
    callers do).  ``t_max``: optional (N,) — hits beyond it are ignored
    (shadow rays pass the light distance).

    Instance-level culling note (the reference's scene BVH,
    src/scene.rs:1681-1722): clusters never span instances, so the per-block
    cluster AABB test subsumes an instance-AABB pre-pass for meshes — a
    culled instance contributes no visited clusters.  Spheres are scanned
    densely (cheap for the instance counts of the bundled scenes)."""
    n = o.shape[0]
    inst_ok = instance_mask(sa, for_shadow, allow_reflection_only)

    best_t = jnp.full((n,), INF)
    best_inst = jnp.zeros((n,), jnp.int32)
    best_tri = jnp.zeros((n,), jnp.int32)
    best_is_mesh = jnp.zeros((n,), bool)

    if static.has_mesh:
        tri_ok = sa.tri_valid & inst_ok[sa.tri_inst]
        if accel_boxes is not None:
            cl_ok = sa.cl_valid & inst_ok[sa.cl_inst]
            alive_f = alive if alive is not None else jnp.ones((n,), bool)
            # deep wavefront levels are often entirely dead (no live
            # reflection/refraction children); skip the traversal outright
            found, tri_idx, t_sel = jax.lax.cond(
                jnp.any(alive_f),
                lambda: _sorted_mesh_trace(
                    sa, static, prep, o, d, alive_f, t_max, tri_ok, cl_ok,
                    accel_boxes, accel_impl, accel_block, accel_gather,
                    block_n, pallas_interpret, for_shadow,
                    pallas_algo=pallas_algo),
                lambda: (jnp.zeros((n,), bool), jnp.zeros((n,), jnp.int32),
                         jnp.full((n,), INF)))
            if prep.shade_pack is not None:
                t_tri = selected_t(o, d, prep.shade_pack, tri_idx, found,
                                   t_sel)
            else:
                from .cluster_trace import recompute_t
                t_tri = recompute_t(o, d, prep, tri_idx, found)
            better = t_tri < best_t
            # mesh instance resolution deferred to hit_attributes (one
            # packed gather there instead of a tri_inst gather here);
            # Hit.inst is set to -1 for accel-path mesh hits so a consumer
            # that skips hit_attributes fails loudly instead of silently
            # reading instance 0 (ADVICE r4) — hit_attributes overwrites
            # every is_mesh row from shade_pack before any use
            best_inst = jnp.where(better, -1, best_inst)
        else:
            t_tri, tri_idx = closest_tri(o, d, prep, tri_ok, tri_tile)
            if t_max is not None:
                t_tri = jnp.where(t_tri <= t_max, t_tri, INF)
            better = t_tri < best_t
            best_inst = jnp.where(better, sa.tri_inst[tri_idx], best_inst)
        best_t = jnp.where(better, t_tri, best_t)
        best_tri = jnp.where(better, tri_idx, best_tri)
        best_is_mesh = better

    if static.n_spheres > 0:
        s_inst = sa.sphere_idx                       # (S,)
        inv = sa.inst_inv[s_inst]                    # (S, 4, 4)
        lo = (jnp.einsum("sij,nj->nsi", inv[:, :3, :3], o)
              + inv[:, :3, 3][None])                 # (N, S, 3)
        ld = jnp.einsum("sij,nj->nsi", inv[:, :3, :3], d)
        radius = sa.inst_radius[s_inst][None]        # (1, S)
        solid = _sphere_solid(sa, for_shadow)[None]  # (1, S)
        s_hit, s_t, _ = sphere_cast(lo, ld, radius, solid)
        s_ok = sa.sphere_valid[None] & inst_ok[s_inst][None] & s_hit
        if t_max is not None:
            s_ok = s_ok & (s_t <= t_max[:, None])
        s_t = jnp.where(s_ok, s_t, INF)
        s_min = jnp.min(s_t, axis=1)
        s_arg = jnp.argmin(s_t, axis=1).astype(jnp.int32)
        better = s_min < best_t
        best_t = jnp.where(better, s_min, best_t)
        best_inst = jnp.where(better, s_inst[s_arg], best_inst)
        best_is_mesh = best_is_mesh & ~better

    return Hit(t=best_t, hit=best_t < INF, is_mesh=best_is_mesh,
               inst=best_inst, tri=best_tri)


def hit_attributes(sa, static, prep: TrianglePrep, o, d, hit: Hit) -> HitAttrs:
    """Shading normal + UV + material (+ packed material rows) for winners.

    Normal semantics replicate the reference exactly:
    - sphere: parry ball normal transformed by the *model matrix*
      (src/shape/sphere.rs:63), negated when cast started inside.
    - mesh flat: model-matrix-transformed geometric normal, oriented to
      oppose the ray (parry convention, src/shape/mesh.rs:92).
    - mesh smooth (material.smooth_shading && loaded normals present):
      barycentric interpolation of loaded normals transformed by the model
      matrix, negated on backface hits (src/shape/mesh.rs:79-89).
    - flip_normals negates the result (src/shape/mesh.rs:95-98).

    UV replicates ``get_uv`` (v negated; spherical for spheres,
    src/shape/sphere.rs:69-99; barycentric for meshes with (0,0) fallback
    when UV topology is missing, src/shape/mesh.rs:105-161).

    All per-triangle data comes from two packed-row gathers
    (prep.shade_pack / prep.corner_pack — required; build with
    :func:`build_shade_packs`); per-material data from two packed-row
    gathers of :func:`build_mat_packs` tables, returned for reuse.
    """
    n_rays = o.shape[0]
    # INF miss distances must not enter any differentiable expression: a
    # zero cotangent times an infinite primal is NaN, which would poison
    # scene-parameter gradients (lights/camera/materials) through the
    # backward pass even though forward values are where-masked.
    t_safe = jnp.where(hit.hit, hit.t, 0.0)
    point = o + t_safe[:, None] * d

    normal = jnp.zeros((n_rays, 3))
    uv = jnp.zeros((n_rays, 2))
    inst = hit.inst

    if static.has_mesh:
        tri = hit.tri
        row = prep.shade_pack[tri]                      # (N, 16) gather 1
        crow = prep.corner_pack[tri]                    # (N, 16) gather 2
        mesh_inst = row[:, 15].astype(jnp.int32)
        inst = jnp.where(hit.is_mesh, mesh_inst, inst)

    mat = jnp.where(hit.hit, sa.inst_mat[inst], 0)
    obj_id = jnp.where(hit.hit, sa.inst_obj_id[inst], 0)
    if prep.mat_pack_f is not None:
        mat_pack_f, mat_pack_i = prep.mat_pack_f, prep.mat_pack_i
    else:
        mat_pack_f, mat_pack_i = build_mat_packs(sa.materials)
    mat_f = mat_pack_f[mat]                             # (N, 16) gather 3
    mat_i = mat_pack_i[mat]                             # (N, 32) gather 4

    if static.has_mesh:
        g1, c1 = row[:, 4:7], row[:, 7]
        g2, c2 = row[:, 8:11], row[:, 11]
        u = dot(point, g1) + c1
        v = dot(point, g2) + c2
        w0 = 1.0 - u - v
        # d·(n·bsign) > 0 — sign-folded, bit-identical to the reference's
        # object-space backface test (±1 multiplies are exact)
        backface = dot(d, row[:, 0:3]) > 0.0
        orient = jnp.where(backface, -1.0, 1.0)

        flat_n = row[:, 12:15] * orient[:, None]

        has_n = crow[:, 9] > 0.5
        n_interp = (w0[:, None] * crow[:, 0:3]
                    + u[:, None] * crow[:, 3:6]
                    + v[:, None] * crow[:, 6:9])
        smooth_n = safe_normalize(n_interp) * orient[:, None]

        uv_interp = (w0[:, None] * crow[:, 10:12]
                     + u[:, None] * crow[:, 12:14]
                     + v[:, None] * crow[:, 14:16])
        mesh_uv = jnp.stack([uv_interp[:, 0], -uv_interp[:, 1]], -1)

        smooth_flag = (mat_i[:, MI_SMOOTH] > 0) & has_n
        mesh_n = jnp.where(smooth_flag[:, None], smooth_n, flat_n)
        mesh_n = jnp.where(sa.inst_flip[inst][:, None], -mesh_n, mesh_n)

        normal = jnp.where(hit.is_mesh[:, None], mesh_n, normal)
        uv = jnp.where(hit.is_mesh[:, None], mesh_uv, uv)

    if static.n_spheres > 0:
        from ..scene.material import TextureType
        inv = sa.inst_inv[inst]
        trans = sa.inst_trans[inst]
        lo = transform_point(inv, o)
        ld = transform_dir(inv, d)
        radius = sa.inst_radius[inst]
        # recompute inside flag with the same solid rule as the original cast
        has_alpha_tex = mat_i[:, MI_TEX_W + int(TextureType.Alpha)] > 0
        solid = (~((mat_f[:, MF_ALPHA] < 1.0) | has_alpha_tex)
                 & (mat_i[:, MI_BACKFACE_CULL] > 0))
        _, _, inside = sphere_cast(lo, ld, radius, solid)
        sph_n = sphere_hit_normal(lo, ld, t_safe, inside, trans)
        sph_n = jnp.where(sa.inst_flip[inst][:, None], -sph_n, sph_n)

        lp = lo + t_safe[:, None] * ld
        theta = jnp.arctan2(-lp[:, 2], lp[:, 0])
        su = (theta + jnp.pi) / (2.0 * jnp.pi)
        cosphi = jnp.clip(-lp[:, 1] / jnp.maximum(radius, 1e-30),
                          -1.0 + 1e-7, 1.0 - 1e-7)
        sv = jnp.arccos(cosphi) / jnp.pi
        sph_uv = jnp.stack([su, -sv], -1)

        is_sphere = hit.hit & ~hit.is_mesh
        normal = jnp.where(is_sphere[:, None], sph_n, normal)
        uv = jnp.where(is_sphere[:, None], sph_uv, uv)

    return HitAttrs(normal=normal, uv=uv, mat=mat, obj_id=obj_id,
                    point=point, mat_f=mat_f, mat_i=mat_i)


def prepare_vertex_normals(sa):
    """World-space loaded vertex normals: model matrix x normal (reference
    transforms the interpolated normal by ``trans``; linearity lets us
    pre-transform per entry)."""
    m = sa.inst_trans[sa.vn_inst]
    return transform_dir(m, sa.vnormals)
