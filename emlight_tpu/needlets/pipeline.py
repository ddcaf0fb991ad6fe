"""Needlet GT-generation / reconstruction pipeline (batched, jitted).

Replaces the per-image NumPy coefficient loops of Needlets/gt_gen_j2.py:29-77,
gt_gen_j3.py and mat_gen2.py:35-64 with single MXU matmuls:

    analysis:   coeffs = (img ⊙ solidAngle)ᵀ @ SN        (P x C)
    synthesis:  rec    = SN @ coeffs

plus the per-band top-energy sparsification of gt_gen_j2.py:47-66.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import NeedletsConfig
from ..core.geometry import solid_angle_map
from .needlets import band_slices, needlet_basis_matrix

__all__ = ["NeedletPipeline", "gt_grid_angles"]


def gt_grid_angles(h: int, w: int):
    """The reference's endpoint-inclusive equirect grid (mat_gen2.py:22-25)."""
    theta = np.linspace(0, 1, h) * np.pi
    phi = np.linspace(0, 2, w) * np.pi
    P, T = np.meshgrid(phi, theta)
    return T.reshape(-1), P.reshape(-1)


@functools.lru_cache(maxsize=None)
def _basis(h: int, w: int, jmax: int, b: float) -> np.ndarray:
    theta, phi = gt_grid_angles(h, w)
    return needlet_basis_matrix(theta, phi, jmax, b).astype(np.float32)


class NeedletPipeline:
    """project / sparsify / reconstruct over (B, H, W, 3) panorama batches."""

    def __init__(self, cfg: NeedletsConfig = NeedletsConfig()):
        self.cfg = cfg
        self.sn = jnp.asarray(_basis(cfg.env_h, cfg.env_w, cfg.jmax, cfg.b))
        self.solid = jnp.asarray(
            solid_angle_map(cfg.env_w).reshape(-1, 1).astype(np.float32)
        )
        self.slices = band_slices(cfg.jmax, cfg.b)
        self.n_coeffs = self.sn.shape[1]

    @functools.partial(jax.jit, static_argnames=("self",))
    def project(self, imgs: jax.Array) -> jax.Array:
        """(B, H, W, 3) -> (B, C, 3) needlet coefficients."""
        b = imgs.shape[0]
        flat = imgs.reshape(b, -1, 3) * self.solid[None]
        return jnp.einsum(
            "bpc,pk->bkc", flat, self.sn,
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )

    @functools.partial(jax.jit, static_argnames=("self",))
    def sparsify(self, coeffs: jax.Array) -> jax.Array:
        """Per-band top-energy masking (gt_gen_j2.py:47-66): keep coefficients
        whose |rgb|-sum energy exceeds the band's percentile threshold."""
        out = coeffs
        for sl, pct in zip(self.slices, self.cfg.sparsity_percentiles):
            band = out[:, sl, :]
            energy = jnp.abs(band).sum(-1)  # (B, K)
            thre = jnp.percentile(energy, pct, axis=1, keepdims=True)
            mask = (energy > thre)[..., None].astype(band.dtype)
            out = out.at[:, sl, :].set(band * mask)
        return out

    @functools.partial(jax.jit, static_argnames=("self",))
    def reconstruct(self, coeffs: jax.Array) -> jax.Array:
        """(B, C, 3) -> (B, H, W, 3) tight-frame synthesis (mat_gen2.py:55)."""
        b = coeffs.shape[0]
        rec = jnp.einsum(
            "pk,bkc->bpc", self.sn, coeffs,
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
        return rec.reshape(b, self.cfg.env_h, self.cfg.env_w, 3)

    def __hash__(self):
        return hash((self.cfg, self.sn.shape))

    def __eq__(self, other):
        return isinstance(other, NeedletPipeline) and self.cfg == other.cfg
