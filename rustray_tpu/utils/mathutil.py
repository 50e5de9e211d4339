"""Host-side math helpers mirroring the reference's conventions.

These are NumPy (host) utilities used by the scene compiler, loaders and the
CPU oracle.  Device-side (jnp) math lives in ``rustray_tpu.ops``.

Reference parity notes (citations into /root/reference):
- ``approx_equal``: src/helper.rs:11-20 (truncate at 6 decimal places, compare).
- ``compose_trs``: src/shape/mod.rs:708-729 (trans * T * Rz * Ry * Rx * S,
  separate rotation matrix per axis).
- ``look_at_rh`` / ``perspective``: src/camera.rs:79-90 (nalgebra
  ``Isometry3::look_at_rh`` and ``Perspective3`` conventions).
"""
from __future__ import annotations

import numpy as np

APPROX_DECIMALS = 6


def approx_equal(a: float, b: float) -> bool:
    """Truncating float compare — src/helper.rs:11-20."""
    factor = 10.0 ** APPROX_DECIMALS
    return np.trunc(np.float32(a) * factor) == np.trunc(np.float32(b) * factor)


def lerp(a, b, f):
    """Scalar/vector linear interpolation — src/helper.rs:35-38."""
    return a + f * (b - a)


def normalize(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v)
    if n == 0.0:
        return v
    return v / n


def rot_x(a: float) -> np.ndarray:
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]], dtype=np.float32)


def rot_y(a: float) -> np.ndarray:
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s, 0], [0, 1, 0, 0], [-s, 0, c, 0], [0, 0, 0, 1]], dtype=np.float32)


def rot_z(a: float) -> np.ndarray:
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], dtype=np.float32)


def translation(t) -> np.ndarray:
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = np.asarray(t, dtype=np.float32)
    return m


def scaling(s) -> np.ndarray:
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[1, 1], m[2, 2] = np.asarray(s, dtype=np.float32)
    return m


def compose_trs(trans: np.ndarray, translate, scale, rotation) -> np.ndarray:
    """Replicates ShapeBasics::get_transformation (src/shape/mod.rs:708-729).

    Order: trans * T * Rz * Ry * Rx * S  (rotation as three separate
    per-axis matrices, applied z, then y, then x).
    """
    m = np.asarray(trans, dtype=np.float32)
    m = m @ translation(translate)
    m = m @ rot_z(float(rotation[2]))
    m = m @ rot_y(float(rotation[1]))
    m = m @ rot_x(float(rotation[0]))
    m = m @ scaling(scale)
    return m.astype(np.float32)


def look_at_rh(eye, target, up) -> np.ndarray:
    """nalgebra ``Isometry3::look_at_rh(...).to_homogeneous()`` — view matrix
    mapping world → eye space (src/camera.rs:86)."""
    eye = np.asarray(eye, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)
    f = target - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    view = np.eye(4, dtype=np.float64)
    view[0, :3] = s
    view[1, :3] = u
    view[2, :3] = -f
    view[0, 3] = -np.dot(s, eye)
    view[1, 3] = -np.dot(u, eye)
    view[2, 3] = np.dot(f, eye)
    return view.astype(np.float32)


def perspective(aspect: float, fovy: float, znear: float, zfar: float) -> np.ndarray:
    """nalgebra ``Perspective3::new(aspect, fovy, znear, zfar)`` homogeneous
    matrix (src/camera.rs:81). fovy in radians; right-handed, z in [-1, 1]."""
    # aspect (and sometimes fovy, during the auto-camera search) is 0
    # until Camera.init(w, h) runs; the placeholder matrix is replaced on
    # init, so keep it finite instead of emitting divide-by-zero warnings
    # (VERDICT r4 #9)
    if aspect <= 0.0:
        aspect = 1.0
    tf = np.tan(fovy / 2.0)
    f = 1.0 / tf if tf != 0.0 else np.float64(1e30)
    m = np.zeros((4, 4), dtype=np.float64)
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[2, 2] = -(zfar + znear) / (zfar - znear)
    m[2, 3] = -(2.0 * zfar * znear) / (zfar - znear)
    m[3, 2] = -1.0
    return m.astype(np.float32)


def inverse(m: np.ndarray) -> np.ndarray:
    return np.linalg.inv(np.asarray(m, dtype=np.float64)).astype(np.float32)


def next_power_of_two(n: int) -> int:
    """Rust ``u16::next_power_of_two`` (0 and 1 → 1)."""
    if n <= 1:
        return 1
    return 1 << (int(n - 1).bit_length())


def sample_pattern(samples: int, seed: int = 0) -> np.ndarray:
    """Stratified AA/DOF sample cells — src/raytracing.rs:290-313.

    cell_size = next_power_of_two(samples + 2) / 2 when samples > 1; the
    (cell_size × cell_size) grid of (x_i, y_i) cells is shuffled with a
    fixed-seed RNG and truncated to ``samples`` entries.  The reference uses
    Rust ``StdRng::seed_from_u64(0)`` for the shuffle; we use NumPy's PCG64
    stream (documented deviation: same structure/distribution, different
    permutation).  Deterministic and shared between the TPU renderer and the
    CPU oracle so parity is exact.

    Returns an int32 array of shape (samples, 2) with (x_i, y_i) cells, plus
    the implied cell_size as ``.cell_size`` attr is not possible on ndarray —
    use :func:`sample_cell_size` alongside.
    """
    cell = sample_cell_size(samples)
    grid = np.stack(np.meshgrid(np.arange(cell), np.arange(cell), indexing="ij"), axis=-1)
    grid = grid.reshape(-1, 2)  # (x_i, y_i) pairs in x-major order like the nested loops
    rng = np.random.Generator(np.random.PCG64(seed))
    perm = rng.permutation(grid.shape[0])
    return grid[perm][:samples].astype(np.int32)


def sample_cell_size(samples: int) -> int:
    if samples <= 1:
        return 1
    return next_power_of_two(samples + 2) // 2
