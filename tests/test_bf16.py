"""Mixed-precision (bfloat16) conv compute path.

conv_compute_dtype(jnp.bfloat16) casts the gathers/matmuls of every sphere
conv (gather + Pallas paths) and SNConv to bf16 while accumulating in f32 —
the TPU MXU's native regime. These tests pin the semantics on CPU:
 - outputs stay float32 and track the f32 path within bf16 tolerance
 - the Pallas (interpret) forward agrees with the gather path under bf16
 - gradients of the custom-VJP path track the f32 gather autodiff
 - a full tiny GAN train step runs under cfg.dtype='bfloat16' with finite,
   f32-consistent losses
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from emlight_tpu.nn.sphere_conv import conv_compute_dtype, sphere_conv_apply
from emlight_tpu.nn.sphere_conv_pallas import sphere_conv_pallas
from emlight_tpu.nn.sphere_conv_vjp import sphere_conv_trainable


def _rand_conv(stride=1, seed=0, b=2, h=16, w=32, cin=8, cout=8):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random((b, h, w, cin), dtype=np.float32))
    k = jnp.asarray(rng.normal(0, 0.2, (3, 3, cin, cout)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, cout).astype(np.float32))
    return x, k, bias


@pytest.mark.parametrize("stride", (1, 2))
def test_gather_bf16_tracks_f32(stride):
    x, k, bias = _rand_conv(stride)
    ref = sphere_conv_apply(x, k, bias, stride)
    with conv_compute_dtype(jnp.bfloat16):
        out = sphere_conv_apply(x, k, bias, stride)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0.05, atol=0.05)
    # and it genuinely differs from the f32 path (the cast happened)
    assert not np.array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("stride", (1, 2))
def test_pallas_bf16_matches_gather_bf16(stride):
    x, k, bias = _rand_conv(stride, seed=1)
    with conv_compute_dtype(jnp.bfloat16):
        gather = sphere_conv_apply(x, k, bias, stride)
        fused = sphere_conv_pallas(x, k, bias, stride, interpret=True)
    # same bf16 products, same f32 accumulation structure
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(gather), rtol=0.02, atol=0.02
    )


def test_vjp_bf16_grads_track_f32():
    x, k, bias = _rand_conv(seed=2)
    tgt = jnp.asarray(
        np.random.default_rng(3).random((2, 16, 32, 8), dtype=np.float32)
    )

    def loss(fn):
        return lambda x, k, b: jnp.sum((fn(x, k, b, 1) - tgt) ** 2)

    g_ref = jax.grad(loss(sphere_conv_apply), argnums=(0, 1, 2))(x, k, bias)
    with conv_compute_dtype(jnp.bfloat16):
        g_bf16 = jax.grad(loss(sphere_conv_trainable), argnums=(0, 1, 2))(x, k, bias)
    for a, b_, name in zip(g_bf16, g_ref, ("dx", "dk", "dbias")):
        ref = np.asarray(b_)
        np.testing.assert_allclose(
            np.asarray(a), ref, rtol=0.05, atol=0.05 * np.abs(ref).max(),
            err_msg=name,
        )


def test_snconv_bf16():
    from emlight_tpu.nn.spade import SNConv

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((2, 8, 8, 4), dtype=np.float32))
    mod = SNConv(features=8)
    variables = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(variables, x)
    with conv_compute_dtype(jnp.bfloat16):
        out = mod.apply(variables, x)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0.05, atol=0.05)


def _tiny_cfg(dtype):
    from emlight_tpu.config import AnchorConfig, ProjectorConfig

    return dataclasses.replace(
        ProjectorConfig(),
        crop_size=64, ngf=4, ndf=4, batch_size=2, num_d=1, n_layers_d=2,
        anchors=AnchorConfig(n_anchors=8, env_h=32, env_w=64),
        use_vgg_loss=False, dtype=dtype,
    )


def test_gan_step_bf16_runs_and_tracks_f32():
    from emlight_tpu.train import projector as P
    from emlight_tpu.train.data import synthetic_projector_batch

    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_projector_batch(
            2, n_anchors=8, crop_size=32, env_hw=(32, 64)
        ).items()
        if not isinstance(v, list)
    }
    results = {}
    for dtype in ("float32", "bfloat16"):
        cfg = _tiny_cfg(dtype)
        state = P.create_state(jax.random.PRNGKey(0), cfg)
        state, gm, _ = P.generator_step(state, batch, cfg)
        state, dm = P.discriminator_step(state, batch, cfg)
        assert np.isfinite(float(gm["loss_G"])) and np.isfinite(float(dm["loss_D"]))
        results[dtype] = (float(gm["loss_G"]), float(dm["loss_D"]))
    for a, b in zip(results["float32"], results["bfloat16"]):
        np.testing.assert_allclose(b, a, rtol=0.05)
