"""Golden-value tests for core geometry (oracles derived from the reference formulas)."""

import numpy as np

from emlight_tpu.core import geometry as G


def test_sphere_points_golden():
    # Independent recomputation of the golden-spiral formula
    # (RegressionNetwork/util.py:286-299).
    n = 96
    pts = G.sphere_points(n)
    assert pts.shape == (n, 3)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0, atol=1e-12)
    ga = np.pi * (3 - np.sqrt(5))
    assert pts[0, 2] == 1 - 1.0 / n
    np.testing.assert_allclose(pts[1, 0], np.sqrt(1 - pts[1, 2] ** 2) * np.cos(ga), atol=1e-12)
    np.testing.assert_allclose(pts[-1, 2], 1.0 / n - 1)


def test_sphere_points_returns_copy():
    a = G.sphere_points(16)
    a[:] = 0
    assert not np.allclose(G.sphere_points(16), 0)


def test_steradian_map():
    h, w = 128, 256
    s = G.steradian_map(h, w, multiply=False)
    assert s.shape == (h, w)
    # row weights are sin((i+0.5)/h * pi), constant along rows
    i = 37
    np.testing.assert_allclose(s[i], np.sin((i + 0.5) / h * np.pi), rtol=1e-6)
    s2 = G.steradian_map(h, w, multiply=True)
    np.testing.assert_allclose(s2, s * (2 * np.pi / w) * (np.pi / h), rtol=1e-6)


def test_solid_angle_map_sums_to_sphere():
    # Exact cos-difference solid angles integrate to 4*pi (Needlets/utils.py:35-50).
    sa = G.solid_angle_map(256)
    assert sa.shape == (128, 256)
    np.testing.assert_allclose(sa.sum(), 4 * np.pi, rtol=1e-10)


def test_steradian_area_approximates_solid_angle():
    st = G.steradian_map(128, 256, multiply=True).astype(np.float64)
    sa = G.solid_angle_map(256)
    # sin(theta)*dtheta*dphi is the midpoint approximation of the exact formula
    assert np.abs(st - sa).max() < 1e-4


def test_polar_cartesian_roundtrip():
    rng = np.random.default_rng(0)
    phi = rng.uniform(-np.pi, np.pi, 100)
    theta = rng.uniform(0.01, np.pi - 0.01, 100)
    xyz = G.polar_to_cartesian(phi, theta)
    np.testing.assert_allclose(np.linalg.norm(xyz, axis=-1), 1.0, atol=1e-12)
    phi2, theta2 = G.cartesian_to_polar(xyz)
    np.testing.assert_allclose(phi2, phi, atol=1e-9)
    np.testing.assert_allclose(theta2, theta, atol=1e-9)


def test_equirect_grids():
    splat = G.equirect_xyz_splat(128, 256)
    gt = G.equirect_xyz_gt(128, 256)
    assert splat.shape == gt.shape == (128, 256, 3)
    np.testing.assert_allclose(np.linalg.norm(splat, axis=-1), 1.0, atol=1e-12)
    # splat grid: pixel centers — z = cos((i+0.5)*pi/h)
    np.testing.assert_allclose(splat[0, :, 2], np.cos(0.5 * np.pi / 128), atol=1e-12)
    # gt grid: endpoint-inclusive linspace — top row is exactly the pole
    np.testing.assert_allclose(gt[0, :, 2], 1.0, atol=1e-12)
    np.testing.assert_allclose(gt[-1, :, 2], -1.0, atol=1e-12)


def test_nearest_anchor_index_matches_reference_construction():
    # Reproduce the reference's dense argsort construction
    # (distribution_representation.py:74-87) and compare with our argmin.
    h, w, ln = 32, 64, 24
    theta = np.linspace(0, np.pi, num=h)
    phi = np.linspace(0, 2 * np.pi, num=w)
    P, T = np.meshgrid(phi, theta)
    xyz = G.polar_to_cartesian(P.reshape(-1), T.reshape(-1)).reshape(h, w, 1, 3)
    anchors = G.sphere_points(ln)
    dis = np.linalg.norm(xyz - anchors, axis=-1)
    ref_idx = np.argsort(dis, axis=-1)[:, :, 0]
    np.testing.assert_array_equal(G.nearest_anchor_index(h, w, ln), ref_idx)


def test_icosphere_counts_and_unit_norm():
    v1, f1 = G.icosphere(1)
    assert v1.shape == (42, 3) and f1.shape == (80, 3)
    v2, f2 = G.icosphere(2)
    assert v2.shape == (162, 3) and f2.shape == (320, 3)
    np.testing.assert_allclose(np.linalg.norm(v2, axis=1), 1.0, atol=1e-12)


def test_rgb_to_intensity_weights():
    rgb = np.array([[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(G.rgb_to_intensity(rgb), 0.3 + 2 * 0.59 + 3 * 0.11)
