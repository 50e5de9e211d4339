import numpy as np

from rustray_tpu.utils.mathutil import (approx_equal, compose_trs, inverse,
                                        look_at_rh, next_power_of_two,
                                        perspective, sample_cell_size,
                                        sample_pattern)


def test_approx_equal_truncates_at_6_decimals():
    assert approx_equal(1.0000001, 1.0000002)
    assert not approx_equal(1.000001, 1.000002)
    assert approx_equal(0.0, 0.0)
    assert not approx_equal(0.001, 0.0011)


def test_next_power_of_two():
    assert next_power_of_two(1) == 1
    assert next_power_of_two(2) == 2
    assert next_power_of_two(3) == 4
    assert next_power_of_two(6) == 8
    assert next_power_of_two(514) == 1024


def test_sample_cell_size_matches_reference_rule():
    # cell = next_pow2(samples + 2) / 2 for samples > 1 (src/raytracing.rs:292-298)
    assert sample_cell_size(1) == 1
    assert sample_cell_size(2) == 2
    assert sample_cell_size(4) == 4
    assert sample_cell_size(16) == 16
    assert sample_cell_size(64) == 64
    assert sample_cell_size(128) == 128


def test_sample_pattern_deterministic_and_unique():
    p1 = sample_pattern(16)
    p2 = sample_pattern(16)
    np.testing.assert_array_equal(p1, p2)
    assert p1.shape == (16, 2)
    assert len({tuple(r) for r in p1}) == 16
    cell = sample_cell_size(16)
    assert p1.min() >= 0 and p1.max() < cell


def test_compose_trs_order():
    # trans * T * Rz * Ry * Rx * S (src/shape/mod.rs:708-729): a point at the
    # origin lands at the translation regardless of rotation/scale.
    m = compose_trs(np.eye(4), (1, 2, 3), (2, 2, 2), (0.3, 0.7, 0.1))
    p = m @ np.array([0, 0, 0, 1.0])
    np.testing.assert_allclose(p[:3], [1, 2, 3], atol=1e-6)
    # scale applies before rotation: unit x scaled to 2 then rotated
    m2 = compose_trs(np.eye(4), (0, 0, 0), (2, 1, 1), (0, 0, np.pi / 2))
    p2 = m2 @ np.array([1, 0, 0, 1.0])
    np.testing.assert_allclose(p2[:3], [0, 2, 0], atol=1e-6)


def test_perspective_matches_nalgebra_convention():
    m = perspective(4 / 3, np.radians(90.0), 0.1, 100.0)
    f = 1.0 / np.tan(np.radians(45.0))
    assert np.isclose(m[0, 0], f / (4 / 3))
    assert np.isclose(m[1, 1], f)
    assert np.isclose(m[3, 2], -1.0)
    assert np.isclose(m[2, 2], -(100.0 + 0.1) / (100.0 - 0.1))
    inv = inverse(m)
    np.testing.assert_allclose(inv @ m, np.eye(4), atol=1e-5)


def test_look_at_rh_view_matrix():
    eye = np.array([1.0, 2.0, 3.0])
    view = look_at_rh(eye, eye + np.array([0, 0, -1.0]), (0, 1, 0))
    # eye maps to origin
    np.testing.assert_allclose((view @ np.append(eye, 1.0))[:3], 0.0, atol=1e-6)
    # forward maps to -z
    p = view @ np.append(eye + np.array([0, 0, -5.0]), 1.0)
    np.testing.assert_allclose(p[:3], [0, 0, -5], atol=1e-5)
