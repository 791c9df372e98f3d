"""Geometry property tests: pose math and ray generation.

Golden values are re-derived with independent numpy implementations of the
reference's conventions (proj_helpers.py:34-76, helpers.py:156-190), not
copied outputs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_for_angiography_tpu.geometry import (
    get_depth_values,
    get_ray_values,
    get_rotation,
    linspace_depths,
    query_points,
    segment_lengths,
    source_matrix,
    stratify_depths,
)


def np_rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]])


def np_rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s, 0], [0, 1, 0, 0], [-s, 0, c, 0], [0, 0, 0, 1]])


def np_rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]])


def np_source_matrix(src_pt, theta, phi, larm=0.0, translation=(0, 0, 0)):
    R = np.linalg.inv(
        np_rot_z(np.deg2rad(larm)) @ np_rot_x(np.deg2rad(theta)) @ np_rot_y(np.deg2rad(phi))
    )
    m3 = np.eye(4)
    m3[:3, 3] = np.asarray(src_pt)[:3]
    m4 = np.eye(4)
    m4[:3, 3] = np.asarray(translation)[:3]
    return m4 @ (R @ m3)


@pytest.mark.parametrize(
    "theta,phi,larm",
    [(0, 0, 0), (90, 0, 0), (0, 90, 0), (135, 135, 0), (-50, 30, 10), (30.5, -171.25, 0)],
)
def test_rotation_matches_reference_convention(theta, phi, larm):
    got = np.asarray(get_rotation(theta, phi, larm))
    want = np.linalg.inv(
        np_rot_z(np.deg2rad(larm)) @ np_rot_x(np.deg2rad(theta)) @ np_rot_y(np.deg2rad(phi))
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rotation_is_orthonormal():
    R = np.asarray(get_rotation(33.0, -71.0, 5.0))[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert abs(np.linalg.det(R) - 1.0) < 1e-5


@pytest.mark.parametrize("theta,phi", [(0, 0), (90, 0), (135, 135), (-20, 45)])
def test_source_matrix_matches_reference(theta, phi):
    src_pt = np.array([0.0, 0.0, 1500.0])
    got = np.asarray(source_matrix(src_pt, theta, phi, 0.0, (3.0, -4.0, 5.0)))
    want = np_source_matrix(src_pt, theta, phi, 0.0, (3.0, -4.0, 5.0))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_identity_pose_rays():
    """At theta=phi=0 the camera sits at +z looking down -z."""
    origins, directions, c2w = get_ray_values(
        0.0, 0.0, 0.0, np.array([0.0, 0.0, 1500.0]), 4, 4, 1300.0
    )
    np.testing.assert_allclose(np.asarray(c2w[:3, :3]), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(origins[0, 0]), [0, 0, 1500.0], atol=1e-4)
    # center-most ray points (almost) straight down -z
    d = np.asarray(directions)[2, 2]
    assert d[2] == pytest.approx(-1.0, abs=1e-6)
    # pixel (i=2, j=2) in a 4x4 image: x-offset = (2-2)/f = 0, y-offset = 0
    assert d[0] == pytest.approx(0.0, abs=1e-6)
    assert d[1] == pytest.approx(0.0, abs=1e-6)


def test_ray_directions_match_manual_pinhole():
    W, H, f = 5, 3, 100.0
    origins, directions, c2w = get_ray_values(47.0, -13.0, 2.0, [0, 0, 900.0], W, H, f)
    R = np.asarray(c2w)[:3, :3]
    dirs = np.asarray(directions)
    for j in range(H):
        for i in range(W):
            d_cam = np.array([(i - W / 2) / f, -(j - H / 2) / f, -1.0])
            np.testing.assert_allclose(dirs[j, i], R @ d_cam, atol=1e-5)


def test_origin_is_rotated_source_point():
    src_pt = np.array([0.0, 0.0, 1500.0])
    origins, _, c2w = get_ray_values(90.0, 0.0, 0.0, src_pt, 2, 2, 1300.0)
    want = np_source_matrix(src_pt, 90.0, 0.0)[:3, 3]
    np.testing.assert_allclose(np.asarray(origins[0, 0]), want, atol=1e-3)


def test_linspace_depths_endpoints():
    z = np.asarray(linspace_depths(1400.0, 1600.0, 11))
    assert z[0] == pytest.approx(1400.0)
    assert z[-1] == pytest.approx(1600.0)
    np.testing.assert_allclose(np.diff(z), 20.0, atol=1e-3)


def test_stratified_depths_stay_in_bins(rng):
    z = linspace_depths(0.0, 1.0, 33)
    zs = np.asarray(stratify_depths(z, rng))
    zl = np.asarray(z)
    mids = 0.5 * (zl[1:] + zl[:-1])
    lower = np.concatenate([zl[:1], mids])
    upper = np.concatenate([mids, zl[-1:]])
    assert np.all(zs >= lower - 1e-6) and np.all(zs <= upper + 1e-6)
    # deterministic given the key
    zs2 = np.asarray(stratify_depths(z, rng))
    np.testing.assert_array_equal(zs, zs2)


def test_get_depth_values_requires_key_when_stratified():
    with pytest.raises(ValueError):
        get_depth_values(0.0, 1.0, 8, key=None, stratified=True)


def test_query_points_shape_and_values():
    o = jnp.array([[0.0, 0.0, 10.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    z = jnp.array([1.0, 2.0, 3.0])
    pts = np.asarray(query_points(o, d, z))
    assert pts.shape == (1, 3, 3)
    np.testing.assert_allclose(pts[0, :, 2], [9.0, 8.0, 7.0], atol=1e-6)


def test_segment_lengths_matches_reference_semantics():
    z = jnp.array([0.0, 1.0, 3.0, 6.0])
    d = np.asarray(segment_lengths(z))
    np.testing.assert_allclose(d[:-1], [1.0, 2.0, 3.0])
    assert d[-1] == pytest.approx(1e10)


def test_everything_jits():
    f = jax.jit(
        lambda: get_ray_values(135.0, 135.0, 0.0, jnp.array([0.0, 0.0, 1500.0]), 8, 8, 1300.0)
    )
    o, d, m = f()
    assert o.shape == (8, 8, 3) and d.shape == (8, 8, 3) and m.shape == (4, 4)
