"""TRS transform parity with the reference conventions
(``src/utilities.cpp:70-77``: degrees, T @ Rx @ Ry @ Rz @ S)."""

import numpy as np
import pytest

from pathtracer_tpu.ops.transforms import (
    build_transform,
    transform_dir,
    transform_normal,
    transform_point,
)


def _np_trs(t, r_deg, s):
    """Independent numpy oracle for T @ Rx @ Ry @ Rz @ S."""
    rx, ry, rz = np.deg2rad(r_deg)

    def rot_x(a):
        c, si = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -si], [0, si, c]])

    def rot_y(a):
        c, si = np.cos(a), np.sin(a)
        return np.array([[c, 0, si], [0, 1, 0], [-si, 0, c]])

    def rot_z(a):
        c, si = np.cos(a), np.sin(a)
        return np.array([[c, -si, 0], [si, c, 0], [0, 0, 1]])

    m = np.eye(4)
    m[:3, :3] = rot_x(rx) @ rot_y(ry) @ rot_z(rz) @ np.diag(s)
    m[:3, 3] = t
    return m


@pytest.mark.parametrize(
    "t,r,s",
    [
        ([0, 0, 0], [0, 0, 0], [1, 1, 1]),
        ([1, -2, 3], [30, 45, 60], [2, 0.5, 1.5]),
        ([0, 5, -5], [0, 90, 0], [0.01, 10, 10]),  # cornell wall
        ([0, 10, 0], [0, 0, 90], [0.3, 3, 3]),  # cornell light
        ([-2, 5, -2], [0, 180, 0], [3, 3, 3]),
    ],
)
def test_matches_numpy_oracle(t, r, s):
    m, minv = build_transform(np.array(t), np.array(r), np.array(s))
    expected = _np_trs(np.array(t, float), np.array(r, float), np.array(s, float))
    np.testing.assert_allclose(np.asarray(m), expected, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(minv) @ expected, np.eye(4), atol=1e-4
    )


def test_batched_build():
    t = np.random.default_rng(0).normal(size=(7, 3)).astype(np.float32)
    r = np.random.default_rng(1).uniform(-180, 180, size=(7, 3)).astype(np.float32)
    s = np.random.default_rng(2).uniform(0.1, 3, size=(7, 3)).astype(np.float32)
    m, minv = build_transform(t, r, s)
    assert m.shape == (7, 4, 4)
    prod = np.einsum("gij,gjk->gik", np.asarray(m), np.asarray(minv))
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), (7, 4, 4)), atol=1e-4)


def test_point_dir_normal_application():
    m, minv = build_transform([1.0, 2.0, 3.0], [0.0, 90.0, 0.0], [2.0, 2.0, 2.0])
    p = transform_point(m, np.array([1.0, 0.0, 0.0], np.float32))
    # Ry(90): x->(0,0,-1); scaled by 2; translated
    np.testing.assert_allclose(np.asarray(p), [1, 2, 1], atol=1e-5)
    d = transform_dir(m, np.array([1.0, 0.0, 0.0], np.float32))
    np.testing.assert_allclose(np.asarray(d), [0, 0, -2], atol=1e-5)


def test_normal_nonuniform_scale():
    # a plane scaled (0.01, 10, 10): its +x face normal must stay +x after
    # the inverse-transpose transform and be unit length
    m, minv = build_transform([0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.01, 10.0, 10.0])
    n = transform_normal(minv, np.array([1.0, 0.0, 0.0], np.float32))
    np.testing.assert_allclose(np.asarray(n), [1, 0, 0], atol=1e-6)

    # rotated: normal rotates with the object
    m, minv = build_transform([0.0, 0.0, 0.0], [0.0, 0.0, 90.0], [0.01, 10.0, 10.0])
    n = np.asarray(transform_normal(minv, np.array([1.0, 0.0, 0.0], np.float32)))
    np.testing.assert_allclose(n, [0, 1, 0], atol=1e-6)
    assert abs(np.linalg.norm(n) - 1) < 1e-6
