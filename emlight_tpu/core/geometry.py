"""Sphere / equirectangular geometry primitives.

Pure functions over NumPy (host-side precompute) and jax.numpy (device),
fully vmappable / jittable. This is layer L0 of the framework — every other
stage builds on these.

Reference behavior reproduced from (all paths under /root/reference/):
- golden-spiral anchors:    RegressionNetwork/util.py:286-299
- polar<->cartesian:        RegressionNetwork/util.py:206-220
- steradian map:            RegressionNetwork/util.py:108-116
- solid-angle map:          Needlets/utils.py:35-50
- GT-extraction grid:       RegressionNetwork/representation/distribution_representation.py:74-87
- splat grid:               RegressionNetwork/util.py:222-233
- icosahedron subdivision:  RegressionNetwork/util.py:257-282 (VTK; rebuilt VTK-free here)
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = [
    "sphere_points",
    "polar_to_cartesian",
    "cartesian_to_polar",
    "equirect_xyz_splat",
    "equirect_xyz_gt",
    "steradian_map",
    "solid_angle_map",
    "nearest_anchor_index",
    "icosphere",
    "rgb_to_intensity",
    "INTENSITY_WEIGHTS_GT",
    "INTENSITY_WEIGHTS_REC709_BUGGED",
]

# Luma weights used by GT extraction / light-mask construction
# (distribution_representation.py:16-17,93; GenProjector/data.py:75).
INTENSITY_WEIGHTS_GT = (0.3, 0.59, 0.11)
# The reference's PanoramaHandler.rgb_to_intenisty (util.py:74-76) uses Rec.709
# coefficients but applies the blue weight to the *red* channel (a bug kept
# available for bit-parity with prepare_gt_panorama).
INTENSITY_WEIGHTS_REC709_BUGGED = (0.2126, 0.7152, 0.0722)


def rgb_to_intensity(rgb, weights=INTENSITY_WEIGHTS_GT, xp=np):
    """Luma of an (..., 3) RGB array. Works for numpy and jax.numpy (pass xp=jnp)."""
    wr, wg, wb = weights
    return wr * rgb[..., 0] + wg * rgb[..., 1] + wb * rgb[..., 2]


@functools.lru_cache(maxsize=None)
def _sphere_points_cached(n: int) -> np.ndarray:
    golden_angle = np.pi * (3.0 - np.sqrt(5.0))
    theta = golden_angle * np.arange(n)
    z = np.linspace(1 - 1.0 / n, 1.0 / n - 1, n)
    radius = np.sqrt(1 - z * z)
    points = np.zeros((n, 3))
    points[:, 0] = radius * np.cos(theta)
    points[:, 1] = radius * np.sin(theta)
    points[:, 2] = z
    return points


def sphere_points(n: int = 128) -> np.ndarray:
    """N golden-spiral (Fibonacci) points on the unit sphere, (n, 3) float64.

    Exact port of RegressionNetwork/util.py:286-299. Cached per n; returns a copy.
    """
    return _sphere_points_cached(int(n)).copy()


def geometric_points(n: int, anchor_depth) -> np.ndarray:
    """GMLight variant: golden-spiral directions pushed to per-anchor depths.

    Port of RegressionNetwork/gmloss/utils.py:63-73 — note the reference scales
    only x/y by the depth and leaves z on the unit profile; reproduced as-is.
    """
    golden_angle = np.pi * (3.0 - np.sqrt(5.0))
    theta = golden_angle * np.arange(n)
    z = np.linspace(1 - 1.0 / n, 1.0 / n - 1, n)
    radius = np.asarray(anchor_depth)
    points = np.zeros((n, 3))
    points[:, 0] = radius * np.cos(theta)
    points[:, 1] = radius * np.sin(theta)
    points[:, 2] = z
    return points


def polar_to_cartesian(phi, theta, xp=np):
    """(phi, theta) -> xyz with theta the polar angle from +z. util.py:212-220."""
    x = xp.sin(theta) * xp.cos(phi)
    y = xp.sin(theta) * xp.sin(phi)
    z = xp.cos(theta)
    return xp.stack((x, y, z), axis=-1)


def cartesian_to_polar(xyz, xp=np):
    """xyz -> (phi, theta). util.py:206-209."""
    theta = xp.arccos(xp.clip(xyz[..., 2], -1.0, 1.0))
    phi = xp.arctan2(xyz[..., 1], xyz[..., 0])
    return phi, theta


@functools.lru_cache(maxsize=None)
def _equirect_xyz_splat_cached(h: int, w: int) -> np.ndarray:
    # Pixel-center grid of convert_to_panorama (util.py:223-233):
    # lat = (i+0.5) * pi/h, lon = (j+0.5) * 2*pi/w   (ref hardcodes pi/128 with w=2h)
    lat = (np.arange(h, dtype=np.float64) + 0.5) * (np.pi / h)
    lon = (np.arange(w, dtype=np.float64) + 0.5) * (2.0 * np.pi / w)
    lat, lon = np.meshgrid(lat, lon, indexing="ij")
    x = np.sin(lat) * np.cos(lon)
    y = np.sin(lat) * np.sin(lon)
    z = np.cos(lat)
    return np.stack((x, y, z), axis=-1)  # (h, w, 3)


def equirect_xyz_splat(h: int = 128, w: int = 256) -> np.ndarray:
    """Unit-vector grid used by the Gaussian-splat rasterizer, (h, w, 3)."""
    return _equirect_xyz_splat_cached(int(h), int(w))


@functools.lru_cache(maxsize=None)
def _equirect_xyz_gt_cached(h: int, w: int) -> np.ndarray:
    # GT-extraction grid (distribution_representation.py:74-81): endpoint-inclusive
    # linspace over [0, pi] x [0, 2*pi] — deliberately different from the splat grid.
    theta = np.linspace(0.0, np.pi, num=h)
    phi = np.linspace(0.0, 2.0 * np.pi, num=w)
    phi, theta = np.meshgrid(phi, theta)  # (h, w)
    return polar_to_cartesian(phi, theta)  # (h, w, 3)


def equirect_xyz_gt(h: int = 128, w: int = 256) -> np.ndarray:
    """Unit-vector grid used by anchor GT extraction, (h, w, 3)."""
    return _equirect_xyz_gt_cached(int(h), int(w))


def steradian_map(height: int, width: int, multiply: bool = True) -> np.ndarray:
    """sin(theta) row weights, optionally scaled by per-pixel area. util.py:108-116."""
    s = np.linspace(0, height, num=height, endpoint=False) + 0.5
    s = np.sin(s / height * np.pi)
    s = np.repeat(s[:, None], width, axis=1)
    if multiply:
        s = s * (((2 * np.pi) / width) * (np.pi / height))
    return s.astype(np.float32)


def solid_angle_map(width: int) -> np.ndarray:
    """Exact per-pixel solid angles for a (width/2, width) panorama.

    Port of Needlets/utils.py:35-50 (cos-difference formula).
    """
    height = width // 2
    y = np.arange(0, height, dtype=np.float64)
    theta = (1.0 - ((y + 0.5) / height)) * np.pi
    pi2_over_w = (np.pi * 2) / width
    pi_over_h = np.pi / height
    sa = pi2_over_w * (np.cos(theta - pi_over_h / 2.0) - np.cos(theta + pi_over_h / 2.0))
    return np.repeat(sa[:, None], width, axis=1)


@functools.lru_cache(maxsize=None)
def _nearest_anchor_index_cached(h: int, w: int, n: int) -> np.ndarray:
    xyz = equirect_xyz_gt(h, w).reshape(-1, 3)  # (h*w, 3)
    anchors = sphere_points(n)  # (n, 3)
    # argmin of euclidean distance == argmax of dot product on the unit sphere,
    # but the reference argsorts the distance matrix; ties resolve identically
    # because argsort/argmin are both stable-first-minimum in NumPy.
    d2 = (
        (xyz * xyz).sum(-1)[:, None]
        - 2.0 * xyz @ anchors.T
        + (anchors * anchors).sum(-1)[None, :]
    )
    return d2.argmin(axis=-1).astype(np.int32).reshape(h, w)


def nearest_anchor_index(h: int, w: int, n: int) -> np.ndarray:
    """Per-pixel nearest-anchor index map, (h, w) int32.

    Replaces the 32768xN dense distance matrix + argsort of
    distribution_representation.py:86-87 with an argmin (same result).
    """
    return _nearest_anchor_index_cached(int(h), int(w), int(n))


# --------------------------------------------------------------------------- #
# Icosphere: VTK-free replacement for RegressionNetwork/util.py:257-282.
# --------------------------------------------------------------------------- #

def _icosahedron():
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        dtype=np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        dtype=np.int64,
    )
    return verts, faces


def icosphere(subdivide: int = 1):
    """Loop-subdivided icosahedron projected to the unit sphere.

    VTK-free equivalent of `polyhedron` (util.py:257-282): subdivide=1 gives the
    42-vertex mesh the legacy anchor set used, subdivide=2 gives 162 vertices.
    Returns (verts (V,3), faces (F,3)).
    """
    verts, faces = _icosahedron()
    for _ in range(int(subdivide)):
        edge_mid: dict[tuple[int, int], int] = {}
        new_faces = []
        vlist = [v for v in verts]

        def midpoint(a: int, b: int) -> int:
            key = (a, b) if a < b else (b, a)
            idx = edge_mid.get(key)
            if idx is None:
                m = vlist[a] + vlist[b]
                m = m / np.linalg.norm(m)
                vlist.append(m)
                idx = len(vlist) - 1
                edge_mid[key] = idx
            return idx

        for f in faces:
            a, b, c = (int(f[0]), int(f[1]), int(f[2]))
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.asarray(vlist)
        verts = verts / np.linalg.norm(verts, axis=1, keepdims=True)
        faces = np.asarray(new_faces, dtype=np.int64)
    return verts, faces
