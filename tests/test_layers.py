"""layers.py primitives vs their torch counterparts + GAN loss mode checks."""

import numpy as np
import torch
import torch.nn.functional as TF
import jax.numpy as jnp

from emlight_tpu.losses.gan import gan_loss
from emlight_tpu.nn.layers import (
    avg_pool_3x3s2,
    instance_norm,
    resize_bilinear,
    resize_nearest,
)


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def _to_nhwc(t):
    return np.transpose(t.numpy(), (0, 2, 3, 1))


def test_resize_nearest_matches_torch():
    x = np.random.default_rng(0).random((2, 7, 13, 3)).astype(np.float32)
    for size in [(14, 26), (3, 5), (7, 13), (1, 2), (21, 39)]:
        ours = np.asarray(resize_nearest(jnp.asarray(x), size))
        ref = _to_nhwc(TF.interpolate(_nchw(x), size=size, mode="nearest"))
        np.testing.assert_array_equal(ours, ref)


def test_resize_bilinear_matches_torch():
    x = np.random.default_rng(1).random((2, 9, 17, 4)).astype(np.float32)
    for size in [(18, 34), (128, 128), (4, 8), (9, 17)]:
        ours = np.asarray(resize_bilinear(jnp.asarray(x), size))
        ref = _to_nhwc(
            TF.interpolate(_nchw(x), size=size, mode="bilinear", align_corners=False)
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_avg_pool_count_exclude_matches_torch():
    x = np.random.default_rng(2).random((2, 11, 22, 3)).astype(np.float32)
    ours = np.asarray(avg_pool_3x3s2(jnp.asarray(x)))
    ref = _to_nhwc(TF.avg_pool2d(_nchw(x), 3, stride=2, padding=1, count_include_pad=False))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_instance_norm_matches_torch():
    x = np.random.default_rng(3).random((2, 8, 16, 5)).astype(np.float32) * 3 + 1
    ours = np.asarray(instance_norm(jnp.asarray(x)))
    ref = _to_nhwc(TF.instance_norm(_nchw(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_gan_loss_modes_match_torch_formulas():
    rng = np.random.default_rng(4)
    logits = rng.normal(0, 2, (3, 4, 6, 1)).astype(np.float32)
    pred = [[jnp.asarray(logits)]]
    t = torch.from_numpy(logits)

    # hinge (loss.py:65-76)
    np.testing.assert_allclose(
        float(gan_loss(pred, True, True, "hinge")),
        float(-torch.mean(torch.min(t - 1, torch.zeros_like(t)))), rtol=1e-6)
    np.testing.assert_allclose(
        float(gan_loss(pred, False, True, "hinge")),
        float(-torch.mean(torch.min(-t - 1, torch.zeros_like(t)))), rtol=1e-6)
    np.testing.assert_allclose(
        float(gan_loss(pred, True, False, "hinge")), float(-t.mean()), rtol=1e-6)
    # ls == mse vs target
    np.testing.assert_allclose(
        float(gan_loss(pred, True, True, "ls")), float(((t - 1) ** 2).mean()), rtol=1e-6)
    # original == bce-with-logits
    np.testing.assert_allclose(
        float(gan_loss(pred, False, True, "original")),
        float(TF.binary_cross_entropy_with_logits(t, torch.zeros_like(t))), rtol=1e-5)
    # wgan
    np.testing.assert_allclose(
        float(gan_loss(pred, True, True, "w")), float(-t.mean()), rtol=1e-6)


def test_cosine_loss_matches_torch_and_survives_zero_pixels():
    """Value parity vs torch CosineSimilarity (pix2pix_model.py:95,122) AND
    finite gradient when fake pixels are exactly zero — the generator's
    (tanh+1)*25 head saturates to exact zeros under adversarial pressure, and
    jnp.linalg.norm's 0/0 cotangent was the measured cause of training
    divergence (BASELINE.md round-2 notes)."""
    import jax
    import torch

    from emlight_tpu.losses.gan import cosine_loss

    rng = np.random.default_rng(0)
    fake = rng.uniform(0, 50, (2, 8, 16, 3)).astype(np.float32)
    fake[0, :4] = 0.0  # saturated pixels
    real = rng.uniform(0, 50, (2, 8, 16, 3)).astype(np.float32)

    got = float(cosine_loss(jnp.asarray(fake), jnp.asarray(real)))
    tf = torch.from_numpy(fake).permute(0, 3, 1, 2)
    tr = torch.from_numpy(real).permute(0, 3, 1, 2)
    want = float((1 - torch.nn.CosineSimilarity(dim=1, eps=1e-20)(tf, tr)).mean())
    np.testing.assert_allclose(got, want, rtol=1e-5)

    g = jax.grad(lambda f: cosine_loss(f, jnp.asarray(real)))(jnp.asarray(fake))
    assert bool(jnp.isfinite(g).all())
    np.testing.assert_array_equal(np.asarray(g)[0, :4], 0.0)  # zero subgradient
