"""Shared NN building blocks: spectral norm, instance norm, torch-parity
resizing, and count-exclude average pooling.

These reproduce the torch primitives the GenProjector stack depends on
(torch.nn.utils.spectral_norm, nn.InstanceNorm2d(affine=False),
F.interpolate nearest/bilinear align_corners=False, F.avg_pool2d
count_include_pad=False) as pure-JAX functions/Flax helpers.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "spectral_normalize",
    "instance_norm",
    "resize_nearest",
    "resize_bilinear",
    "avg_pool_3x3s2",
]


def spectral_normalize(module: nn.Module, kernel: jax.Array, update: bool,
                       n_power_iterations: int = 1, eps: float = 1e-12) -> jax.Array:
    """Spectral-norm a kernel whose LAST axis is the output-channel axis.

    Torch semantics (torch.nn.utils.spectral_norm defaults):
    - training: power-iterate v then u without gradient, persist both, compute
      sigma = u^T W v with the fresh (detached) vectors;
    - eval: sigma from the STORED u AND v verbatim, no iteration — checkpoints
      in the wild carry unconverged u/v, so recomputing v would change sigma.
    Gradients flow through W only. `u`/`v` live in the "spectral" collection
    (imported 1:1 from torch weight_u / permuted weight_v).
    """
    out = kernel.shape[-1]
    kmat = kernel.reshape(-1, out).T  # (out, rest); row space matches torch's W_mat
    sg = jax.lax.stop_gradient
    km = sg(kmat)
    u_var = module.variable(
        "spectral", "u",
        lambda: _l2_normalize(jax.random.normal(module.make_rng("params"), (out,)), eps),
    )
    v_var = module.variable(
        "spectral", "v", lambda: _l2_normalize(km.T @ u_var.value, eps)
    )
    u, v = u_var.value, v_var.value
    if update:
        for _ in range(n_power_iterations):
            v = _l2_normalize(km.T @ u, eps)
            u = _l2_normalize(km @ v, eps)
        if not module.is_initializing():
            u_var.value = sg(u)
            v_var.value = sg(v)
    sigma = sg(u) @ kmat @ sg(v)
    return kernel / sigma


def _l2_normalize(x, eps):
    return x / (jnp.linalg.norm(x) + eps)


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Per-sample, per-channel normalization over H, W (affine=False).

    nn.InstanceNorm2d default: biased variance, no running stats.
    """
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def resize_nearest(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """torch F.interpolate(mode='nearest'): src = floor(dst * in/out)."""
    b, h, w, c = x.shape
    ho, wo = size
    if (h, w) == (ho, wo):
        return x
    ri = jnp.floor(jnp.arange(ho) * (h / ho)).astype(jnp.int32)
    ci = jnp.floor(jnp.arange(wo) * (w / wo)).astype(jnp.int32)
    return x[:, ri][:, :, ci]


def resize_bilinear(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """torch F.interpolate(mode='bilinear', align_corners=False):
    half-pixel centers, clamped edges."""
    b, h, w, c = x.shape
    ho, wo = size
    if (h, w) == (ho, wo):
        return x

    def axis_weights(n_in, n_out):
        pos = (jnp.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        pos = jnp.clip(pos, 0.0, n_in - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        frac = pos - lo
        return lo, hi, frac

    r0, r1, fr = axis_weights(h, ho)
    c0, c1, fc = axis_weights(w, wo)
    top = x[:, r0]
    bot = x[:, r1]
    rows = top * (1 - fr)[None, :, None, None] + bot * fr[None, :, None, None]
    left = rows[:, :, c0]
    right = rows[:, :, c1]
    return left * (1 - fc)[None, None, :, None] + right * fc[None, None, :, None]


def avg_pool_3x3s2(x: jax.Array) -> jax.Array:
    """F.avg_pool2d(kernel=3, stride=2, padding=1, count_include_pad=False)
    — the multiscale-D downsampler (discriminator.py:48-51)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )
    return s / cnt
