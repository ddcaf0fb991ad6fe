"""GAN objectives for the GenProjector stage.

Parity with GenProjector/models/networks/loss.py:16-120 and
models/pix2pix_model.py:92-141:
- hinge / ls / original / wgan GAN losses over multiscale outputs
- light-mask-weighted multiscale feature matching (non-light pixels x50,
  pix2pix_model.py:111-116), with the mask re-interpolated sequentially from
  the previous scale exactly as the reference's loop mutates `map`
- per-pixel cosine-similarity loss (pix2pix_model.py:95,122)
- VAE KL divergence (loss.py:118-120) — dead surface upstream (only reachable
  via SPADE's --use_vae, which EMLight never sets), kept for API parity
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.layers import resize_nearest

__all__ = ["gan_loss", "feature_matching_loss", "cosine_loss", "kld_loss"]


def _single_gan_loss(x, target_is_real: bool, for_discriminator: bool, mode: str):
    if mode == "hinge":
        if for_discriminator:
            if target_is_real:
                return -jnp.mean(jnp.minimum(x - 1, 0.0))
            return -jnp.mean(jnp.minimum(-x - 1, 0.0))
        assert target_is_real, "generator hinge loss aims for real"
        return -jnp.mean(x)
    if mode == "ls":
        t = 1.0 if target_is_real else 0.0
        return jnp.mean((x - t) ** 2)
    if mode == "original":
        t = 1.0 if target_is_real else 0.0
        return jnp.mean(
            jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
        )  # BCE-with-logits
    if mode == "w":
        return -jnp.mean(x) if target_is_real else jnp.mean(x)
    raise ValueError(f"unknown gan mode {mode}")


def gan_loss(pred, target_is_real: bool, for_discriminator: bool, mode: str = "hinge"):
    """pred: list (per discriminator) of lists of activations; the last entry
    of each inner list is the logit map (loss.py:84-98)."""
    total = 0.0
    for per_d in pred:
        logits = per_d[-1] if isinstance(per_d, (list, tuple)) else per_d
        total = total + _single_gan_loss(logits, target_is_real, for_discriminator, mode)
    return total / len(pred)


def feature_matching_loss(pred_fake, pred_real, light_map, ambient_weight: float = 50.0):
    """L1 between mask-weighted intermediate D features (pix2pix_model.py:101-117).

    light_map: (B, H, W, 1) binary light mask; non-light pixels weighted
    ambient_weight x. The mask is resized sequentially scale-to-scale, matching
    the reference's in-place `map = F.interpolate(map, ...)` loop.
    """
    num_d = len(pred_fake)
    total = 0.0
    m = light_map
    for i in range(num_d):
        for j in range(len(pred_fake[i]) - 1):  # exclude the logit map
            f, r = pred_fake[i][j], pred_real[i][j]
            m = resize_nearest(m, f.shape[1:3])
            wf = f * m + f * (1 - m) * ambient_weight
            wr = r * m + r * (1 - m) * ambient_weight
            total = total + jnp.mean(jnp.abs(wf - jax.lax.stop_gradient(wr))) / num_d
    return total


def cosine_loss(fake, real, eps: float = 1e-20):
    """(1 - cosine_similarity over channels).mean() (pix2pix_model.py:95,122).

    Norms are computed as sqrt(sumsq + 1e-30) rather than jnp.linalg.norm:
    value-identical at pixel scale, but the GRADIENT at an exactly-zero pixel
    is 0 instead of norm's 0/0 = NaN. The generator's (tanh+1)*25 head
    saturates to exact zeros under adversarial pressure (measured: 1803
    zero-norm fake pixels at the divergence step; primal stayed finite, the
    cotangent did not) — torch survives the same state because torch.norm's
    backward returns a zero subgradient at 0."""
    num = (fake * real).sum(-1)
    prod = (fake * fake).sum(-1) * (real * real).sum(-1)
    safe = prod > 0
    # double-where: sqrt never sees 0 (its cotangent there is inf) and the
    # unsafe lanes contribute cos = 0 with a zero gradient. torch's primal is
    # also exactly 0 there (num = 0 over the clamped denominator), but its
    # subgradient is real/eps ~ 1e21 — survivable only by saturating Adam's
    # second moment; an exact zero is the same fixed point without the inf.
    den = jnp.sqrt(jnp.where(safe, prod, 1.0))
    cos = jnp.where(safe, num / jnp.maximum(den, eps), 0.0)
    return jnp.mean(1.0 - cos)


def kld_loss(mu, logvar):
    """VAE KL divergence -0.5 * sum(1 + logvar - mu^2 - exp(logvar)).

    Reference: GenProjector/models/networks/loss.py:118-120. Dead code
    upstream (applied only under SPADE's --use_vae flag, which EMLight's
    fork never sets; the ConvEncoder runs deterministically), implemented
    for API parity.
    """
    return -0.5 * jnp.sum(1.0 + logvar - jnp.square(mu) - jnp.exp(logvar))
