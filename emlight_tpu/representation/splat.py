"""Gaussian-splat environment-map rasterizer — the shared differentiable renderer.

The reference implements this as a per-light Python loop over torch ops with a
hardcoded .cuda() (RegressionNetwork/util.py:222-245, copied 5x across the
repo; see SURVEY.md §2.5). Here it is ONE batched einsum pair that maps
directly onto the TPU MXU:

    logits[b, n, p] = (dirs[b, n, :] . grid[:, p] - 1) / sizes[b, n]   (matmul 1)
    env[b, p, c]    = sum_n colors[b, n, c] * exp(logits[b, n, p])     (matmul 2)

Both matmuls are large, static-shaped, and fuse with the exp under XLA.
Layout is NHWC (TPU-native); use `to_nchw` for reference-layout parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry import equirect_xyz_splat, sphere_points

__all__ = ["render_sg", "render_anchor_params", "to_nchw", "DEFAULT_SPLAT_SIZE"]

# The splat size constant used everywhere in the reference
# (RegressionNetwork/train.py:115, GenProjector/data.py:97, test.py:63).
DEFAULT_SPLAT_SIZE = 0.0025


def to_nchw(x: jax.Array) -> jax.Array:
    return jnp.transpose(x, (0, 3, 1, 2))


@functools.partial(jax.jit, static_argnames=("h", "w"))
def render_sg(dirs: jax.Array, sizes: jax.Array, colors: jax.Array, h: int = 128, w: int = 256):
    """Render B environment maps from N spherical Gaussians each.

    Args:
      dirs:   (B, N, 3) unit directions (or (B, N*3), reference flat layout).
      sizes:  (B, N) bandwidths.
      colors: (B, N, 3) RGB amplitudes (or (B, N*3)).
      h, w:   output resolution.

    Returns (B, h, w, 3) float32. Matches convert_to_panorama
    (RegressionNetwork/util.py:222-245) up to layout.
    """
    b = dirs.shape[0]
    dirs = dirs.reshape(b, -1, 3)
    colors = colors.reshape(b, -1, 3)
    grid = jnp.asarray(equirect_xyz_splat(h, w).reshape(-1, 3).T, dtype=dirs.dtype)  # (3, P)
    # (B, N, P) on the MXU. The dot product feeds an exp() scaled by 1/size
    # (~400x), so bf16 matmul error would blow up the exponent — force full
    # f32 accumulation (HIGHEST) for the direction matmul; the color matmul is
    # a plain weighted sum and also stays f32 for parity with the reference.
    logits = jnp.einsum(
        "bnd,dp->bnp", dirs, grid,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    weights = jnp.exp((logits - 1.0) / sizes[..., None])
    env = jnp.einsum(
        "bnc,bnp->bpc", colors, weights,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    return env.reshape(b, h, w, 3)


@functools.partial(jax.jit, static_argnames=("n", "h", "w", "intensity_scale"))
def render_anchor_params(
    distribution: jax.Array,
    intensity: jax.Array,
    rgb_ratio: jax.Array,
    ambient: jax.Array | None = None,
    *,
    n: int = 128,
    h: int = 128,
    w: int = 256,
    size: float = DEFAULT_SPLAT_SIZE,
    intensity_scale: float = 1.0,
):
    """Anchor parameters -> environment map, the composition used everywhere.

    colors_i = distribution_i * intensity * rgb_ratio (train.py:117-121,
    GenProjector/data.py:91-99); env = splat(+ambient per-pixel if given,
    GenProjector/data.py:100-101).

    Args:
      distribution: (B, N) anchor energy distribution.
      intensity:    (B,) or (B, 1) scalar light intensity.
      rgb_ratio:    (B, 3).
      ambient:      optional (B, 3) added uniformly to every pixel.
      intensity_scale: reference multiplies intensity by 500 for viz
        (train.py:117,128) and by 100 implicitly in GenProjector
        (data.py:87: *0.01 after the /500-scaled GT... pass explicitly).

    Returns (B, h, w, 3).
    """
    b = distribution.shape[0]
    anchors = jnp.asarray(sphere_points(n), dtype=distribution.dtype)
    dirs = jnp.broadcast_to(anchors[None], (b, n, 3))
    sizes = jnp.full((b, n), size, dtype=distribution.dtype)
    colors = (
        distribution[:, :, None]
        * intensity.reshape(b, 1, 1)
        * intensity_scale
        * rgb_ratio.reshape(b, 1, 3)
    )
    env = render_sg(dirs, sizes, colors, h=h, w=w)
    if ambient is not None:
        env = env + ambient.reshape(b, 1, 1, 3)
    return env
