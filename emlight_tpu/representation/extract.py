"""Anchor GT extraction: HDR panorama -> spherical light-distribution parameters.

Replaces extract_mesh (RegressionNetwork/representation/
distribution_representation.py:65-120), whose hot loop is an O(N*H*W) Python
loop of masked sums per anchor. TPU-native design: the per-pixel
nearest-anchor assignment becomes a precomputed one-hot matrix, and the
per-anchor energy sums become ONE (B*3, H*W) x (H*W, N) matmul on the MXU —
batched, jitted, vmapped. This is the ">=10x panoramas/sec" target of
BASELINE.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry import (
    INTENSITY_WEIGHTS_GT,
    icosphere,
    nearest_anchor_index,
    polar_to_cartesian,
    rgb_to_intensity,
    steradian_map,
)

__all__ = [
    "extract_anchors",
    "extract_anchors_batch",
    "extract_light_info_legacy",
    "AnchorExtractor",
]


@functools.lru_cache(maxsize=None)
def _assignment_matrix(h: int, w: int, n: int) -> np.ndarray:
    """One-hot (H*W, N) pixel->anchor assignment, f32 (host-cached constant)."""
    idx = nearest_anchor_index(h, w, n).reshape(-1)
    m = np.zeros((h * w, n), dtype=np.float32)
    m[np.arange(h * w), idx] = 1.0
    return m


def _extract(hdr, assign, steradian, light_threshold):
    """Single-panorama extraction body; hdr (H, W, 3) -> param dict.

    Mirrors extract_mesh.compute (distribution_representation.py:90-120):
    steradian weight -> 5%-of-max light mask -> ambient from the remainder ->
    per-anchor energy sums -> distribution / intensity / rgb_ratio.
    """
    h, w, _ = hdr.shape
    hdr = hdr * steradian[..., None]
    intensity = rgb_to_intensity(hdr, INTENSITY_WEIGHTS_GT, xp=jnp)
    mask = (intensity > intensity.max() * light_threshold).astype(hdr.dtype)[..., None]
    light = hdr * mask
    remain = hdr * (1.0 - mask)

    ambient = remain.sum(axis=(0, 1))
    # per-anchor sums: (3, P) @ (P, N) — MXU instead of N masked reductions
    anchors = jnp.einsum(
        "pc,pn->nc",
        light.reshape(h * w, 3),
        assign,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    energy = rgb_to_intensity(anchors, INTENSITY_WEIGHTS_GT, xp=jnp)
    distribution = energy / energy.sum()
    anchors_rgb = anchors.sum(axis=0)
    total = jnp.linalg.norm(anchors_rgb)
    rgb_ratio = anchors_rgb / total
    return {
        "distribution": distribution,
        "intensity": total,
        "rgb_ratio": rgb_ratio,
        "ambient": ambient,
        "map": mask[..., 0],
    }


@functools.partial(jax.jit, static_argnames=("n", "light_threshold"))
def extract_anchors(hdr: jax.Array, n: int = 128, light_threshold: float = 0.05):
    """Extract anchor parameters from one (H, W, 3) HDR panorama."""
    h, w, _ = hdr.shape
    assign = jnp.asarray(_assignment_matrix(h, w, n))
    ster = jnp.asarray(steradian_map(h, w, multiply=False))
    return _extract(hdr, assign, ster, light_threshold)


@functools.partial(jax.jit, static_argnames=("n", "light_threshold"))
def extract_anchors_batch(hdrs: jax.Array, n: int = 128, light_threshold: float = 0.05):
    """Vmapped extraction over a (B, H, W, 3) batch of panoramas."""
    _, h, w, _ = hdrs.shape
    assign = jnp.asarray(_assignment_matrix(h, w, n))
    ster = jnp.asarray(steradian_map(h, w, multiply=False))
    return jax.vmap(lambda x: _extract(x, assign, ster, light_threshold))(hdrs)


@functools.lru_cache(maxsize=None)
def _legacy_assignment_matrix(h: int, w: int) -> np.ndarray:
    """One-hot pixel->anchor map for the 42-vertex icosahedron anchors.

    The legacy tool (intensity_modify.py:84-100) uses UNSHIFTED lattice
    coordinates (phi = j/w*2pi, theta = i/h*pi — no half-pixel offset, unlike
    extract_mesh) and icosahedron(subdivide=1) vertices. Vertex ORDER follows
    core.geometry.icosphere, not VTK's internal subdivision order; the set of
    directions is identical.
    """
    verts, _ = icosphere(1)  # 42 vertices (util.py:257-282)
    i, j = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    xyz = polar_to_cartesian(
        (j / w * 2 * np.pi).reshape(-1), (i / h * np.pi).reshape(-1)
    )
    d2 = ((xyz[:, None, :] - verts[None]) ** 2).sum(-1)
    idx = d2.argmin(-1)
    m = np.zeros((h * w, len(verts)), np.float32)
    m[np.arange(h * w), idx] = 1.0
    return m


@jax.jit
def extract_light_info_legacy(hdr: jax.Array) -> dict:
    """Legacy 42-anchor icosahedron extraction (intensity_modify.py:70-120).

    Semantics differ from extract_anchors: no light/ambient split (every
    pixel contributes), rgb_ratio SUMS to 1 (not unit-norm), and
    intensity = total_luma / luma(rgb_ratio). Vectorized into one MXU matmul
    like the main extractor.
    """
    h, w, _ = hdr.shape
    assign = jnp.asarray(_legacy_assignment_matrix(h, w))
    ster = jnp.asarray(steradian_map(h, w, multiply=False))
    whdr = hdr * ster[..., None]
    rgbs = (
        jnp.einsum(
            "pc,pn->nc",
            whdr.reshape(h * w, 3),
            assign,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        + 1e-9  # intensity_modify.py:105
    )
    tmp = rgbs.sum(axis=0)
    rgb_ratio = tmp / tmp.sum()
    total_energy = rgb_to_intensity(tmp, INTENSITY_WEIGHTS_GT, xp=jnp)
    anchors_energy = rgb_to_intensity(rgbs, INTENSITY_WEIGHTS_GT, xp=jnp)
    return {
        "distribution": anchors_energy / total_energy,
        "rgb_ratio": rgb_ratio,
        "intensity": total_energy / rgb_to_intensity(rgb_ratio, INTENSITY_WEIGHTS_GT, xp=jnp),
    }


class AnchorExtractor:
    """Stateful convenience wrapper mirroring the reference's extract_mesh class.

    extractor = AnchorExtractor(ln=128); params = extractor.compute(hdr)
    returns numpy arrays shaped like the reference pickles.
    """

    def __init__(self, h: int = 128, w: int = 256, ln: int = 128, light_threshold: float = 0.05):
        self.h, self.w, self.ln = h, w, ln
        self.light_threshold = light_threshold

    def compute(self, hdr: np.ndarray):
        out = extract_anchors(
            jnp.asarray(hdr, dtype=jnp.float32), n=self.ln, light_threshold=self.light_threshold
        )
        out = jax.device_get(out)
        params = {
            "distribution": out["distribution"],
            "intensity": np.asarray(out["intensity"]),
            "rgb_ratio": out["rgb_ratio"],
            "ambient": out["ambient"],
        }
        return params, out["map"]

    def compute_batch(self, hdrs: np.ndarray):
        out = extract_anchors_batch(
            jnp.asarray(hdrs, dtype=jnp.float32), n=self.ln, light_threshold=self.light_threshold
        )
        return jax.device_get(out)
