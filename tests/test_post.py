import numpy as np

from rustray_tpu.config import PostProcessingConfig
from rustray_tpu.render.post import run_post_processing


def _np_reference(config, image, normals, object_ids):
    """Literal NumPy transcription of src/post_processing.rs:123-181."""
    h, w = image.shape[:2]
    out = np.zeros_like(image)
    n_flat = normals.reshape(-1, 3)
    id_flat = object_ids.reshape(-1)
    n = h * w

    def fetch3(x, y):
        idx = y * w + x
        if idx < 0 or idx >= n:
            return np.zeros(3)
        return n_flat[idx]

    def fetchu(x, y):
        idx = y * w + x
        if idx < 0 or idx >= n:
            return 0
        return id_flat[idx]

    def soft_clamp(c, control):
        if c < 0.5 / control:
            return c * (1.0 - c * control)
        return 0.25 / control

    for y in range(h):
        for x in range(w):
            r, g, b = (float(v) for v in image[y, x])
            if config.outline:
                center = fetchu(x, y)
                adj = [fetchu(x, y + 1), fetchu(x, y - 1),
                       fetchu(x - 1, y), fetchu(x + 1, y)]
                eq = sum(0.25 for a in adj if a == center)
                outline = 1.0 - eq
                if outline > 0.0:
                    r = g = b = outline * 255.0
            if config.cavity:
                up = fetch3(x, y + 1)[2]
                down = fetch3(x, y - 1)[2]
                left = fetch3(x - 1, y)[0]
                right = fetch3(x + 1, y)[0]
                nd = (up - down) + (right - left)
                if nd < 0:
                    curv = -2.0 * soft_clamp(-nd, 1.0)
                else:
                    curv = 2.0 * soft_clamp(nd, 1.15)
                r *= curv + 1.0
                g *= curv + 1.0
                b *= curv + 1.0
            out[y, x] = [np.clip(r, 0, 255), np.clip(g, 0, 255), np.clip(b, 0, 255)]
    return out.astype(np.uint8)


def _random_aovs(rng, h=8, w=10):
    image = rng.integers(0, 255, (h, w, 3), np.uint8)
    normals = rng.normal(size=(h, w, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    ids = rng.integers(0, 4, (h, w)).astype(np.int32)
    depth = rng.uniform(0, 10, (h, w)).astype(np.float32)
    return image, normals, depth, ids


def test_outline_matches_reference():
    rng = np.random.default_rng(0)
    image, normals, depth, ids = _random_aovs(rng)
    cfg = PostProcessingConfig(outline=True)
    got = run_post_processing(cfg, image, normals, depth, ids)
    want = _np_reference(cfg, image, normals, ids)
    np.testing.assert_array_equal(got, want)


def test_cavity_matches_reference():
    rng = np.random.default_rng(1)
    image, normals, depth, ids = _random_aovs(rng)
    cfg = PostProcessingConfig(cavity=True)
    got = run_post_processing(cfg, image, normals, depth, ids)
    want = _np_reference(cfg, image, normals, ids)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1  # fp rounding


def test_both_passes():
    rng = np.random.default_rng(2)
    image, normals, depth, ids = _random_aovs(rng)
    cfg = PostProcessingConfig(cavity=True, outline=True)
    got = run_post_processing(cfg, image, normals, depth, ids)
    want = _np_reference(cfg, image, normals, ids)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_uniform_ids_no_outline():
    rng = np.random.default_rng(3)
    image, normals, depth, _ = _random_aovs(rng)
    ids = np.ones(image.shape[:2], np.int32)
    cfg = PostProcessingConfig(outline=True)
    got = run_post_processing(cfg, image, normals, depth, ids)
    # interior pixels unchanged (border pixels outline against OOB zeros)
    np.testing.assert_array_equal(got[1:-1, 1:-1], image[1:-1, 1:-1])
