import numpy as np
import jax.numpy as jnp

from rustray_tpu.oracle import _sample_bilinear, _tex_fetch, _wrap
from rustray_tpu.ops.texture import sample_bilinear, sample_nearest
from rustray_tpu.scene.textures import TextureAtlas, pack_rgba


def _random_tex(rng, w, h):
    return rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)


def test_pack_rgba_roundtrip():
    rng = np.random.default_rng(1)
    tex = _random_tex(rng, 5, 3)
    packed = pack_rgba(tex)
    r = packed & 0xFF
    a = (packed.astype(np.uint32) >> 24) & 0xFF
    np.testing.assert_array_equal(r.reshape(3, 5), tex[..., 0])
    np.testing.assert_array_equal(a.reshape(3, 5), tex[..., 3])


def test_atlas_dedup():
    atlas = TextureAtlas()
    rng = np.random.default_rng(2)
    t1 = _random_tex(rng, 4, 4)
    e1 = atlas.add(t1)
    e2 = atlas.add(t1)
    assert e1 == e2
    assert atlas.add(None) == (0, 0, 0)


def test_nearest_matches_oracle_wrap():
    rng = np.random.default_rng(3)
    tex = _random_tex(rng, 7, 5)
    texels = jnp.asarray(pack_rgba(tex))
    uvs = rng.uniform(-2.5, 2.5, size=(200, 2)).astype(np.float32)
    got = np.asarray(sample_nearest(
        texels, jnp.int32(0), jnp.int32(7), jnp.int32(5),
        jnp.asarray(uvs[:, 0]), jnp.asarray(uvs[:, 1])))
    for i, (u, v) in enumerate(uvs):
        want = _tex_fetch(tex, _wrap(float(u), 7), _wrap(float(v), 5))
        np.testing.assert_allclose(got[i], want, atol=1e-6)


def test_bilinear_matches_oracle_including_quirks():
    rng = np.random.default_rng(4)
    tex = _random_tex(rng, 9, 6)
    texels = jnp.asarray(pack_rgba(tex))
    # include negative and >1 UVs to exercise the edge-extrapolation quirks
    uvs = rng.uniform(-1.5, 1.8, size=(200, 2)).astype(np.float32)
    got = np.asarray(sample_bilinear(
        texels, jnp.int32(0), jnp.int32(9), jnp.int32(6),
        jnp.asarray(uvs[:, 0]), jnp.asarray(uvs[:, 1])))
    for i, (u, v) in enumerate(uvs):
        want = _sample_bilinear(tex, float(u), float(v))
        np.testing.assert_allclose(got[i], want, atol=2e-5, err_msg=f"uv={u},{v}")


def test_pair_table_bilinear_matches_legacy():
    """The horizontal texel-pair sampler (2 row gathers) must reproduce
    sample_bilinear (4 scalar gathers) exactly, including the border
    extrapolation quirks."""
    import jax.numpy as jnp
    import numpy as np
    from rustray_tpu.ops.texture import _sample_bilinear_pairs, sample_bilinear

    rng = np.random.default_rng(7)
    w, h = 13, 9
    tex = rng.integers(0, 2**31 - 1, w * h, dtype=np.int32)
    pairs = np.stack([tex, np.append(tex[1:], tex[-1])], axis=1)
    n = 512
    u = jnp.asarray(rng.uniform(-1.5, 2.5, n), jnp.float32)
    v = jnp.asarray(rng.uniform(-1.5, 2.5, n), jnp.float32)
    off = jnp.zeros((n,), jnp.int32)
    wv = jnp.full((n,), w, jnp.int32)
    hv = jnp.full((n,), h, jnp.int32)
    a = sample_bilinear(jnp.asarray(tex), off, wv, hv, u, v)
    b = _sample_bilinear_pairs(jnp.asarray(pairs), off, wv, hv, u, v)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
