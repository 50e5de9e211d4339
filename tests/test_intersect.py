import jax.numpy as jnp
import numpy as np

from rustray_tpu.ops.intersect import (closest_tri, prepare_triangles,
                                       sphere_cast, TrianglePrep)


def _cast(o, d, r, solid):
    hit, t, inside = sphere_cast(jnp.asarray(o, jnp.float32),
                                 jnp.asarray(d, jnp.float32),
                                 jnp.float32(r), solid)
    return bool(hit), float(t), bool(inside)


class TestSphereCastParrySemantics:
    """parry3d ``ray_toi_with_ball`` behavior (src/shape/sphere.rs:60)."""

    def test_outside_entering(self):
        hit, t, inside = _cast([0, 0, 5], [0, 0, -1], 1.0, True)
        assert hit and not inside
        assert np.isclose(t, 4.0, atol=1e-5)

    def test_outside_leaving_misses(self):
        hit, _, _ = _cast([0, 0, 5], [0, 0, 1], 1.0, True)
        assert not hit

    def test_inside_solid_is_zero(self):
        hit, t, inside = _cast([0, 0, 0.5], [0, 0, -1], 1.0, True)
        assert hit and inside and t == 0.0

    def test_inside_not_solid_far_hit(self):
        hit, t, inside = _cast([0, 0, 0.5], [0, 0, -1], 1.0, False)
        assert hit and inside
        assert np.isclose(t, 1.5, atol=1e-5)

    def test_non_unit_direction_scales_t(self):
        hit, t, _ = _cast([0, 0, 5], [0, 0, -2], 1.0, True)
        assert hit and np.isclose(t, 2.0, atol=1e-5)

    def test_tangent_miss(self):
        hit, _, _ = _cast([2, 0, 5], [0, 0, -1], 1.0, True)
        assert not hit


class TestTriangleIntersect:
    def _prep_single(self, a, b, c):
        a, b, c = (np.asarray(v, np.float32) for v in (a, b, c))
        e1, e2 = b - a, c - a
        n = np.cross(e1, e2)
        nn = max(float(n @ n), 1e-30)
        g1 = np.cross(e2, n) / nn
        g2 = np.cross(n, e1) / nn
        return TrianglePrep(
            a=jnp.asarray(a[None]), n=jnp.asarray(n[None]),
            an=jnp.asarray([a @ n]),
            g1=jnp.asarray(g1[None]), c1=jnp.asarray([-a @ g1]),
            g2=jnp.asarray(g2[None]), c2=jnp.asarray([-a @ g2]),
            flat_n=jnp.asarray((n / np.linalg.norm(n))[None]),
            backface_sign=jnp.ones((1,)))

    def test_simple_hit_and_miss(self):
        prep = self._prep_single([0, 0, 0], [1, 0, 0], [0, 1, 0])
        o = jnp.asarray([[0.2, 0.2, 1.0], [0.9, 0.9, 1.0]], jnp.float32)
        d = jnp.asarray([[0, 0, -1.0], [0, 0, -1.0]], jnp.float32)
        t, idx = closest_tri(o, d, prep, jnp.ones((1,), bool), tile=1)
        assert np.isclose(float(t[0]), 1.0, atol=1e-5)
        assert float(t[1]) > 1e30  # outside the triangle

    def test_backface_hit_allowed(self):
        prep = self._prep_single([0, 0, 0], [1, 0, 0], [0, 1, 0])
        o = jnp.asarray([[0.2, 0.2, -1.0]], jnp.float32)
        d = jnp.asarray([[0, 0, 1.0]], jnp.float32)
        t, _ = closest_tri(o, d, prep, jnp.ones((1,), bool), tile=1)
        assert np.isclose(float(t[0]), 1.0, atol=1e-5)

    def test_behind_origin_misses(self):
        prep = self._prep_single([0, 0, 0], [1, 0, 0], [0, 1, 0])
        o = jnp.asarray([[0.2, 0.2, -1.0]], jnp.float32)
        d = jnp.asarray([[0, 0, -1.0]], jnp.float32)
        t, _ = closest_tri(o, d, prep, jnp.ones((1,), bool), tile=1)
        assert float(t[0]) > 1e30

    def test_random_rays_match_moller_trumbore(self):
        rng = np.random.default_rng(0)
        a, b, c = rng.normal(size=(3, 3)).astype(np.float32)
        prep = self._prep_single(a, b, c)
        o = rng.normal(size=(64, 3)).astype(np.float32) * 3
        d = rng.normal(size=(64, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        t, _ = closest_tri(jnp.asarray(o), jnp.asarray(d), prep,
                           jnp.ones((1,), bool), tile=1)
        t = np.asarray(t)
        # NumPy Möller–Trumbore reference
        e1, e2 = b - a, c - a
        p = np.cross(d, e2)
        det = (p * e1).sum(1)
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        s = o - a
        u = (s * p).sum(1) * inv
        q = np.cross(s, e1)
        v = (d * q).sum(1) * inv
        t_ref = (e2 * q).sum(1) * inv
        hit_ref = ok & (u >= -1e-6) & (v >= -1e-6) & (u + v <= 1 + 1e-6) & (t_ref >= 0)
        for i in range(64):
            if hit_ref[i] and (u[i] > 1e-4 and v[i] > 1e-4 and u[i] + v[i] < 1 - 1e-4):
                assert np.isclose(t[i], t_ref[i], rtol=1e-3), i
            if not hit_ref[i] and min(abs(u[i]), abs(v[i]), abs(1 - u[i] - v[i])) > 1e-3:
                assert t[i] > 1e30 or t_ref[i] < 0, i
