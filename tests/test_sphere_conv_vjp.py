"""Pallas sphere-conv custom VJP vs jax.grad of the gather formulation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from emlight_tpu.nn.sphere_conv import sphere_conv_apply
from emlight_tpu.nn.sphere_conv_vjp import inverse_tables, sphere_conv_trainable


@pytest.mark.parametrize("stride", (1, 2))
def test_inverse_tables_cover_all_triples(stride):
    from emlight_tpu.nn.sphere_conv_pallas import structured_tables

    h, w = 16, 32
    rows_c, _, wcol = structured_tables(h, w, stride)
    out_rows, taps, shifts, w0, jdev, fanin = inverse_tables(h, w, stride)
    # every nonzero forward triple appears exactly once in the inverse tables
    n_fwd = sum(
        1
        for i in range(h // stride)
        for t in range(9)
        for k in range(4)
        if wcol[i, t, k].any()
    )
    n_inv = int((w0 > 0).sum())
    assert n_fwd == n_inv
    assert fanin <= 64
    # the scalar decomposition reconstructs the dense per-column weights
    wo = wcol.shape[3]
    cols = np.arange(wo)
    for r in range(h):
        for m in range(fanin):
            i, t = out_rows[r, m], taps[r, m]
            kset = [
                k for k in range(4)
                if wcol[i, t, k].any()
                and np.allclose(
                    np.where(cols == jdev[r, m], 0.0, w0[r, m]), wcol[i, t, k, :, 0]
                )
            ]
            assert w0[r, m] == 0 or kset, (r, m)


@pytest.mark.parametrize("stride", (1, 2))
def test_vjp_matches_gather_autodiff(stride):
    rng = np.random.default_rng(0)
    b, h, w, cin, cout = 2, 16, 32, 8, 8
    x = jnp.asarray(rng.random((b, h, w, cin), dtype=np.float32))
    k = jnp.asarray(rng.normal(0, 0.2, (3, 3, cin, cout)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, cout).astype(np.float32))
    tgt = jnp.asarray(
        rng.random((b, h // stride, w // stride, cout), dtype=np.float32)
    )

    def loss_ref(x, k, bias):
        return jnp.sum((sphere_conv_apply(x, k, bias, stride) - tgt) ** 2)

    def loss_new(x, k, bias):
        return jnp.sum((sphere_conv_trainable(x, k, bias, stride) - tgt) ** 2)

    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(x, k, bias)
    v_new, g_new = jax.value_and_grad(loss_new, argnums=(0, 1, 2))(x, k, bias)
    np.testing.assert_allclose(float(v_new), float(v_ref), rtol=1e-5)
    for a, b_, name in zip(g_new, g_ref, ("dx", "dk", "dbias")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4, err_msg=name
        )


def test_vjp_no_bias():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 8, 16, 4), dtype=np.float32))
    k = jnp.asarray(rng.normal(0, 0.2, (3, 3, 4, 8)).astype(np.float32))

    def f(x, k):
        return jnp.sum(sphere_conv_trainable(x, k, None, 1) ** 2)

    gx, gk = jax.grad(f, argnums=(0, 1))(x, k)

    def f_ref(x, k):
        return jnp.sum(sphere_conv_apply(x, k, None, 1) ** 2)

    gx_r, gk_r = jax.grad(f_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_r), rtol=1e-4, atol=1e-4)


def test_dx_umajor_kernel_matches_gather(monkeypatch):
    """The U-major dx variant (dispatched at >=128x256 on hardware) is
    grad-exact vs gather autodiff; threshold patched low so the small
    interpret-mode shape exercises the U-major kernel body."""
    from emlight_tpu.nn import sphere_conv_vjp as V

    monkeypatch.setattr(V, "_UMAJOR_MIN_PIXELS", 1)
    rng = np.random.default_rng(3)
    b, h, w, cin, cout = 2, 16, 32, 8, 8
    x = jnp.asarray(rng.random((b, h, w, cin), dtype=np.float32))
    k = jnp.asarray(rng.normal(0, 0.2, (3, 3, cin, cout)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, cout).astype(np.float32))
    tgt = jnp.asarray(rng.random((b, h, w, cout), dtype=np.float32))

    v_ref, g_ref = jax.value_and_grad(
        lambda *a: jnp.sum((sphere_conv_apply(*a, 1) - tgt) ** 2), argnums=(0, 1, 2)
    )(x, k, bias)
    v_new, g_new = jax.value_and_grad(
        lambda *a: jnp.sum((sphere_conv_trainable(*a, 1) - tgt) ** 2), argnums=(0, 1, 2)
    )(x, k, bias)
    np.testing.assert_allclose(float(v_new), float(v_ref), rtol=1e-5)
    for a, b_, name in zip(g_new, g_ref, ("dx", "dk", "dbias")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4, err_msg=name
        )


@pytest.mark.parametrize("cin,cout", [(3, 5), (8, 16), (130, 12)])
def test_dk_pallas_matches_gather(cin, cout):
    """The fused dk kernel (forward-mirrored staging, grid-accumulated
    output) vs the XLA gather formulation, incl. lane-padding edge cases:
    cin<128 zero-pads (padded rows must come back zero and be sliced off),
    cout<8 pads the cotangent, cin>128 runs unpadded."""
    from emlight_tpu.nn.sphere_conv_vjp import _dk_gather, _dk_pallas

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 32, cin), dtype=np.float32))
    g = jnp.asarray(rng.standard_normal((2, 16, 32, cout), dtype=np.float32))
    ref = np.asarray(_dk_gather(x, g, cout, 1))
    got = np.asarray(_dk_pallas(x, g, 1))
    assert got.shape == (3, 3, cin, cout)
    # different f32 reduction orders (einsum vs grid-accumulated matmuls)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_dk_pallas_bf16_accumulates_f32():
    from emlight_tpu.nn.sphere_conv import conv_compute_dtype
    from emlight_tpu.nn.sphere_conv_vjp import _dk_gather, _dk_pallas

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 32, 8), dtype=np.float32))
    g = jnp.asarray(rng.standard_normal((2, 16, 32, 16), dtype=np.float32))
    with conv_compute_dtype(jnp.bfloat16):
        got = _dk_pallas(x, g, 1)
        ref = np.asarray(_dk_gather(x, g, 16, 1))  # same bf16 sampling dtype
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), ref, rtol=0.02, atol=0.05)
    # and the bf16 result tracks the f32 one (f32 accumulation did its job)
    ref32 = np.asarray(_dk_gather(x, g, 16, 1))
    np.testing.assert_allclose(np.asarray(got), ref32, rtol=0.05, atol=0.5)
