"""CPU reference oracle: a direct NumPy re-implementation of the reference
renderer's recursive per-pixel algorithm (src/raytracing.rs:275-998).

This module intentionally shares *no* device code with the wavefront
renderer: intersections run in object space (inverse-transformed rays, like
src/shape/{sphere,mesh}.rs), shading recurses, textures are fetched with an
independent sampler.  Tests assert allclose between this oracle and the TPU
wavefront engine, validating the recursion→wavefront and object→world-space
transformations.

The oracle mirrors the reference's behavioral quirks (SURVEY.md §2.1) and the
framework's two documented deviations: shadow rays use the nearest hit, and
shadow alpha textures are sampled with the *occluder's* UVs.
"""
from __future__ import annotations

import numpy as np

from .config import RaytracingConfig
from .scene.material import Material, TextureType
from .scene.scene import Scene
from .scene.shapes import Mesh, Shape, Sphere
from .utils.mathutil import sample_cell_size, sample_pattern

SHADOW_BIAS = 1e-3


def _norm(v):
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


class _Hit:
    __slots__ = ("t", "normal", "item", "face_id")

    def __init__(self, t, normal, item, face_id):
        self.t = t
        self.normal = normal
        self.item = item
        self.face_id = face_id


def _tex_fetch(tex: np.ndarray, x: int, y: int) -> np.ndarray:
    return tex[y, x].astype(np.float64) / 255.0


def _wrap(val: float, bound: int) -> int:
    w = int(np.trunc(val * bound)) % bound
    return w + bound if w < 0 else w


def _sample_bilinear(tex: np.ndarray, u: float, v: float) -> np.ndarray:
    h, w = tex.shape[:2]
    x = u * w
    y = v * h
    if x < 0:
        x += w
    if y < 0:
        y += h
    x0 = min(max(int(np.floor(x)), 0), w - 1)
    x1 = min(max(int(np.ceil(x)), 0), w - 1)
    y0 = min(max(int(np.floor(y)), 0), h - 1)
    y1 = min(max(int(np.ceil(y)), 0), h - 1)
    xf = x - x0
    yf = y - y0
    p0 = _tex_fetch(tex, x0, y0)
    p1 = _tex_fetch(tex, x1, y0)
    p2 = _tex_fetch(tex, x0, y1)
    p3 = _tex_fetch(tex, x1, y1)
    top = p0 + xf * (p1 - p0)
    bot = p2 + xf * (p3 - p2)
    return top + yf * (bot - top)


class Oracle:
    def __init__(self, scene: Scene, width: int, height: int,
                 config: RaytracingConfig = None, seed: int = 0):
        self.scene = scene
        self.config = config or scene.raytracing_config
        scene.cam.init(width, height)
        self.cam = scene.cam
        self.width = width
        self.height = height
        self.rng = np.random.Generator(np.random.PCG64(seed))

    # ----- texture helpers (src/raytracing.rs:629-712) -----

    def get_tex_color(self, mat: Material, uv, tex_type: TextureType):
        if uv is None or not mat.has_texture(tex_type):
            return None
        tex = mat.get_texture(tex_type)
        if mat.texture_filtering_nearest:
            h, w = tex.shape[:2]
            return _tex_fetch(tex, _wrap(uv[0], w), _wrap(uv[1], h))
        return _sample_bilinear(tex, uv[0], uv[1])

    def get_item_color(self, mat: Material, uv, which: str):
        if which == "ambient":
            col, tt = mat.ambient_color, TextureType.AmbientEmissive
        elif which == "base":
            col, tt = mat.base_color, TextureType.Base
        else:
            col, tt = mat.specular_color, TextureType.Specular
        out = np.array([col[0], col[1], col[2], 1.0], np.float64)
        tex = self.get_tex_color(mat, uv, tt)
        if tex is not None:
            out *= tex
        return out

    # ----- intersection (object space, like the reference) -----

    def _intersect_sphere(self, item: Sphere, o, d, force_not_solid):
        inv = item.basic.trans_inverse.astype(np.float64)
        lo = inv[:3, :3] @ o + inv[:3, 3]
        ld = inv[:3, :3] @ d
        mat = item.get_material()
        solid = (not (mat.alpha < 1.0 or mat.has_texture(TextureType.Alpha))
                 and mat.backface_culling and not force_not_solid)
        r = item.radius
        a = ld @ ld
        b = lo @ ld
        c = lo @ lo - r * r
        if c > 0.0 and b > 0.0:
            return None
        delta = b * b - a * c
        if delta < 0.0:
            return None
        sq = np.sqrt(delta)
        t = (-b - sq) / a
        inside = False
        if t <= 0.0:
            inside = True
            t = 0.0 if solid else (-b + sq) / a
        lp = lo + t * ld
        n_local = _norm(lp)
        if inside:
            n_local = -n_local
        trans = item.basic.trans.astype(np.float64)
        n = _norm(trans[:3, :3] @ n_local)
        if item.basic.flip_normals:
            n = -n
        return _Hit(t, n, item, 0)

    def _intersect_mesh(self, item: Mesh, o, d, force_not_solid):
        inv = item.basic.trans_inverse.astype(np.float64)
        lo = inv[:3, :3] @ o + inv[:3, 3]
        ld = inv[:3, :3] @ d
        verts = item.vertices.astype(np.float64)
        tris = item.indices
        a = verts[tris[:, 0]]
        e1 = verts[tris[:, 1]] - a
        e2 = verts[tris[:, 2]] - a
        n = np.cross(e1, e2)
        dn = n @ ld
        ok = np.abs(dn) > 1e-30
        t = np.where(ok, np.einsum("ij,ij->i", a - lo, n) / np.where(ok, dn, 1.0), np.inf)
        p = lo + t[:, None] * ld
        ap = p - a
        # barycentric via projection constants
        nn = np.maximum(np.einsum("ij,ij->i", n, n), 1e-300)
        u = np.einsum("ij,ij->i", np.cross(ap, e2), n) / nn
        v = np.einsum("ij,ij->i", np.cross(e1, ap), n) / nn
        hit = ok & (t >= 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        t = np.where(hit, t, np.inf)
        if not np.any(np.isfinite(t)):
            return None
        fi = int(np.argmin(t))
        ti = float(t[fi])
        backface = dn[fi] > 0.0
        mat = item.get_material()
        trans = item.basic.trans.astype(np.float64)
        if (mat.smooth_shading and item.normals.shape[0] > 0
                and item.normal_indices.shape[0] > 0):
            ni = item.normal_indices[fi]
            w0 = 1.0 - u[fi] - v[fi]
            n_interp = (w0 * item.normals[ni[0]] + u[fi] * item.normals[ni[1]]
                        + v[fi] * item.normals[ni[2]]).astype(np.float64)
            normal = _norm(trans[:3, :3] @ n_interp)
            if backface:
                normal = -normal
        else:
            oriented = n[fi] if not backface else -n[fi]
            normal = _norm(trans[:3, :3] @ _norm(oriented))
        if item.basic.flip_normals:
            normal = -normal
        return _Hit(ti, normal, item, fi)

    def _get_uv(self, item: Shape, hit_point, face_id):
        inv = item.basic.trans_inverse.astype(np.float64)
        lp = inv[:3, :3] @ hit_point + inv[:3, 3]
        if isinstance(item, Sphere):
            theta = np.arctan2(-lp[2], lp[0])
            u = (theta + np.pi) / (2 * np.pi)
            phi = np.arccos(np.clip(-lp[1] / item.radius, -1.0, 1.0))
            v = phi / np.pi
            return np.array([u, -v])
        assert isinstance(item, Mesh)
        if item.uv_indices.shape[0] <= face_id or item.indices.shape[0] <= face_id:
            return np.array([0.0, 0.0])
        tri = item.indices[face_id]
        uvf = item.uv_indices[face_id]
        a = item.vertices[tri[0]].astype(np.float64)
        b = item.vertices[tri[1]].astype(np.float64)
        c = item.vertices[tri[2]].astype(np.float64)
        f1, f2, f3 = a - lp, b - lp, c - lp
        area = np.linalg.norm(np.cross(a - b, a - c))
        a1 = np.linalg.norm(np.cross(f2, f3)) / area
        a2 = np.linalg.norm(np.cross(f3, f1)) / area
        a3 = np.linalg.norm(np.cross(f1, f2)) / area
        uv = (item.uvs[uvf[0]] * a1 + item.uvs[uvf[1]] * a2 + item.uvs[uvf[2]] * a3)
        return np.array([uv[0], -uv[1]])

    def trace(self, o, d, stop_on_first_hit, for_shadow, depth):
        """Nearest-hit search with the reference's candidate filter
        (src/raytracing.rs:429-490; nearest-hit deviation for shadows)."""
        best = None
        for item in self.scene.items:
            mat = item.get_material()
            if not (item.basic.visible and mat.alpha > 0.0
                    and (not for_shadow or mat.cast_shadow)
                    and (not mat.reflection_only or depth > 1)):
                continue
            if isinstance(item, Sphere):
                h = self._intersect_sphere(item, o, d, for_shadow)
            else:
                h = self._intersect_mesh(item, o, d, for_shadow)
            if h is not None and (best is None or h.t < best.t):
                best = h
        return best

    # ----- recursive shading (src/raytracing.rs:720-998) -----

    def jitter(self, direction, spread):
        if spread <= 0.0:
            return direction
        b3 = _norm(direction)
        diff = np.array([1.0, 0.0, 0.0]) if abs(b3[0]) < 0.5 else np.array([0.0, 1.0, 0.0])
        b1 = _norm(np.cross(b3, diff))
        b2 = np.cross(b1, b3)
        z_lo = np.cos(spread * np.pi)
        if z_lo >= 1.0:
            return direction
        z = self.rng.uniform(z_lo, 1.0)
        r = np.sqrt(max(1.0 - z * z, 0.0))
        theta = self.rng.uniform(-np.pi, np.pi)
        return _norm(r * np.cos(theta) * b1 + r * np.sin(theta) * b2 + z * b3)

    def fresnel(self, incident, normal, index):
        i_dot_n = incident @ normal
        eta_i, eta_t = 1.0, index
        if i_dot_n > 0.0:
            eta_i, eta_t = index, 1.0
        sin_t = eta_i / eta_t * np.sqrt(max(1.0 - i_dot_n * i_dot_n, 0.0))
        if sin_t > 1.0:
            return 1.0
        cos_t = np.sqrt(max(1.0 - sin_t * sin_t, 0.0))
        cos_i = abs(cos_t)  # reference quirk (src/raytracing.rs:558)
        r_s = ((eta_t * cos_i) - (eta_i * cos_t)) / ((eta_t * cos_i) + (eta_i * cos_t))
        r_p = ((eta_i * cos_i) - (eta_t * cos_t)) / ((eta_i * cos_i) + (eta_t * cos_t))
        return (r_s * r_s + r_p * r_p) / 2.0

    def get_color(self, o, d, depth):
        d = _norm(d)
        hit = self.trace(o, d, False, False, depth)
        color = np.zeros(3)
        out_depth, out_normal, out_id = 0.0, np.zeros(3), 0
        if hit is None:
            return color, out_depth, out_normal, out_id
        cfg = self.config
        item = hit.item
        mat = item.get_material()
        out_depth = hit.t
        out_normal = hit.normal.copy()
        out_id = item.basic.id
        hit_point = o + d * hit.t
        surface_normal = hit.normal

        uv = None
        if mat.has_any_texture():
            uv = self._get_uv(item, hit_point, hit.face_id)

        # normal mapping
        ntex = self.get_tex_color(mat, uv, TextureType.Normal)
        if ntex is not None:
            tangent = np.cross(surface_normal, np.array([0.0, 1.0, 0.0]))
            if np.linalg.norm(tangent) <= 1e-4:
                tangent = np.cross(surface_normal, np.array([0.0, 0.0, 1.0]))
            tangent = _norm(tangent)
            bitangent = _norm(np.cross(surface_normal, tangent))
            nm = ntex[:3] * 2.0 - 1.0
            nm[0] *= mat.normal_map_strength
            nm[1] *= mat.normal_map_strength
            nm = _norm(nm)
            surface_normal = _norm(nm[0] * tangent + nm[1] * bitangent
                                   + nm[2] * surface_normal)

        rtex = self.get_tex_color(mat, uv, TextureType.Roughness)
        if cfg.monte_carlo and mat.monte_carlo and (mat.roughness > 0.0 or rtex is not None):
            rough = mat.roughness
            if rtex is not None:
                rough = (1.0 / np.pi / 2.0) * rtex[0]
            surface_normal = self.jitter(surface_normal, rough)

        ambient_color = self.get_item_color(mat, uv, "ambient")
        base_color = self.get_item_color(mat, uv, "base")
        specular_color = self.get_item_color(mat, uv, "specular")

        alpha = mat.alpha * base_color[3]
        atex = self.get_tex_color(mat, uv, TextureType.Alpha)
        if atex is not None:
            alpha *= atex[0]

        for light in self.scene.lights:
            if not light.enabled:
                continue
            lt = int(light.light_type)
            if lt == 0:  # directional
                dtl = _norm(-light.dir.astype(np.float64))
            else:
                dtl = _norm(light.pos.astype(np.float64) - hit_point)
            dot_light = max(surface_normal @ dtl, 0.0)
            base = base_color * dot_light
            reflect_dir = -dtl - 2.0 * (surface_normal @ -dtl) * surface_normal
            view_dir = _norm(-d)
            spec_dot = max(reflect_dir @ view_dir, 0.0)
            light_power = spec_dot ** mat.shininess
            specular = specular_color * light_power

            if lt == 0:
                intensity = light.intensity
            else:
                r2 = np.linalg.norm(light.pos.astype(np.float64) - hit_point)
                intensity = light.intensity / (4.0 * np.pi * r2)
                if lt == 2:
                    ldir = _norm(light.dir.astype(np.float64))
                    ang = np.arccos(np.clip(-dtl @ ldir, -1.0, 1.0))
                    if ang > light.max_angle:
                        intensity = 0.0

            if mat.receive_shadow:
                so = hit_point + surface_normal * SHADOW_BIAS
                sd = dtl
                if cfg.monte_carlo and mat.monte_carlo:
                    sd = self.jitter(sd, mat.shadow_softness)
                sh = self.trace(so, _norm(sd), True, True, depth)
                in_light = sh is None
                if not in_light and lt in (1, 2):
                    in_light = sh.t > np.linalg.norm(light.pos.astype(np.float64) - hit_point)
                if not in_light:
                    shadow_alpha = mat.alpha
                    occ_mat = sh.item.get_material()
                    if occ_mat.has_any_texture():
                        occ_uv = self._get_uv(sh.item, so + _norm(sd) * sh.t, sh.face_id)
                        occ_tex = self.get_tex_color(occ_mat, occ_uv, TextureType.Alpha)
                        if occ_tex is not None:
                            shadow_alpha *= occ_tex[0]
                    intensity *= (1.0 - shadow_alpha)

            color += light.color.astype(np.float64) * (specular[:3] + base[:3]) * intensity

        refraction_index = mat.refraction_index
        kr = self.fresnel(d, surface_normal, refraction_index)

        reflectivity = mat.reflectivity
        reft = self.get_tex_color(mat, uv, TextureType.Reflectivity)
        if reft is not None:
            reflectivity = reft[0]

        color = color * (1.0 - reflectivity)

        if reflectivity > 0.0 and depth <= cfg.max_recursion:
            ro = hit_point + surface_normal * SHADOW_BIAS
            rd = d - 2.0 * (d @ surface_normal) * surface_normal
            refl_color = self.get_color(ro, rd, depth + 1)[0]
            color = color + refl_color * reflectivity

        if alpha < 1.0 and depth <= cfg.max_recursion:
            # create_transmission (src/raytracing.rs:500-533)
            ref_n = surface_normal
            eta_t, eta_i = refraction_index, 1.0
            i_dot_n = d @ surface_normal
            if i_dot_n < 0.0:
                i_dot_n = -i_dot_n
            else:
                ref_n = -surface_normal
                eta_t, eta_i = 1.0, refraction_index
            eta = eta_i / eta_t
            k = 1.0 - eta * eta * (1.0 - i_dot_n * i_dot_n)
            if k >= 0.0:
                to = hit_point + ref_n * (-SHADOW_BIAS)
                td = (d + i_dot_n * ref_n) * eta - ref_n * np.sqrt(k)
                tres = self.get_color(to, td, depth + 1)
                refr_color = tres[0]
                if kr < 1.0:
                    color = color * alpha + refr_color * (1.0 - kr) * (1.0 - alpha)
                else:
                    color = color * alpha + refr_color * (1.0 - alpha)
                if np.trunc(abs(alpha) * 1e6) == 0.0:
                    out_id = tres[3]
        elif alpha < 1.0:
            color = color * alpha

        fog_amount = min(cfg.fog_density * hit.t, 1.0)
        color = (1.0 - fog_amount) * color + np.asarray(cfg.fog_color) * fog_amount

        ao = self.get_tex_color(mat, uv, TextureType.AmbientOcclusion)
        if ao is not None:
            color = color * ao[0]

        color = color + ambient_color[:3]
        return color, out_depth, out_normal, out_id

    # ----- per-pixel render (src/raytracing.rs:275-427) -----

    def render_pixel(self, x, y):
        cfg = self.config
        cam = self.cam
        w, h = float(self.width), float(self.height)
        x_f, y_f = float(x), float(y)
        x_step, y_step = 2.0 / w, 2.0 / h
        cells = sample_pattern(cfg.samples)
        cell_size = sample_cell_size(cfg.samples)
        dof = cfg.aperture_size > 1.0 and cfg.focal_length > 1.0

        color = np.zeros(3)
        depth = 0.0
        normal = np.zeros(3)
        obj = 0
        pi = cam.projection_inverse.astype(np.float64)
        vi = cam.view_inverse.astype(np.float64)
        for (x_i, y_i) in cells:
            x_t = x_step * x_i * (1.0 / cell_size)
            y_t = y_step * y_i * (1.0 / cell_size)
            if dof and cfg.samples > 1:
                x_t -= x_step / 2.0
                y_t -= y_step / 2.0
            if dof:
                ap_scale = w / 800.0
                x_t *= cfg.aperture_size * ap_scale
                y_t *= cfg.aperture_size * ap_scale
                cx = ((x_f + 0.5) / w) * 2.0 - 1.0
                cy = 1.0 - ((y_f + 0.5) / h) * 2.0
                cpp = pi @ np.array([cx, cy, -1.0, 1.0])
                cpp[3] = 1.0
                rdv = cpp - np.array([0.0, 0.0, 0.0, 1.0])
                rdv[3] = 0.0
                origin = vi @ np.array([0.0, 0.0, 0.0, 1.0])
                dirw = vi @ rdv
                dirw = dirw / np.linalg.norm(dirw)
                dist = np.linalg.norm(rdv[:3])
                p = origin + (1.0 / (dist / (dist + cfg.focal_length))) * dirw
                sx = (((x_f + 0.5) / w) * 2.0 - 1.0) + x_t
                sy = (1.0 - ((y_f + 0.5) / h) * 2.0) + y_t
                pp = pi @ np.array([sx, sy, -1.0, 1.0])
                pp[3] = 1.0
                ro = vi @ pp
                rd = p - ro
                o, d = ro[:3], rd[:3]
            else:
                sx = (((x_f + 0.5) / w) * 2.0 - 1.0) + x_t
                sy = (1.0 - ((y_f + 0.5) / h) * 2.0) + y_t
                pp = pi @ np.array([sx, sy, -1.0, 1.0])
                pp[3] = 1.0
                rdv = pp - np.array([0.0, 0.0, 0.0, 1.0])
                rdv[3] = 0.0
                o = (vi @ pp)[:3]
                d = (vi @ rdv)[:3]
            c, dep, nrm, oid = self.get_color(o, d, 1)
            color += c
            depth += dep
            normal += nrm
            obj = oid
        n = len(cells)
        color /= n
        depth /= n
        normal /= n
        color = np.minimum(color, 1.0)
        return color, depth, normal, obj

    def render_image(self):
        cfg = self.config
        H, W = self.height, self.width
        color = np.zeros((H, W, 3))
        depth = np.zeros((H, W))
        normal = np.zeros((H, W, 3))
        obj = np.zeros((H, W), np.int32)
        for y in range(H):
            for x in range(W):
                c, dep, nrm, oid = self.render_pixel(x, y)
                color[y, x] = c
                depth[y, x] = dep
                nl = np.linalg.norm(nrm)
                normal[y, x] = nrm / nl if nl > 0 else 0.0
                obj[y, x] = oid
        if cfg.gamma_correction:
            quant = np.power(np.maximum(color, 0.0), 1.0 / 2.2)
        else:
            quant = color
        image = np.trunc(quant * 255.0).astype(np.uint8)
        return dict(color=color, image=image, depth=depth, normal=normal,
                    object_id=obj)
