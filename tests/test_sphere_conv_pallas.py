"""Pallas sphere-conv kernel vs the XLA gather reference (oracle pattern)."""

import numpy as np
import jax.numpy as jnp
import pytest

from emlight_tpu.nn.sphere_conv import sphere_conv_apply
from emlight_tpu.nn.sphere_conv_pallas import sphere_conv_pallas, structured_tables


@pytest.mark.parametrize("shape,stride", [
    ((2, 16, 32, 8), 1),
    ((2, 16, 32, 8), 2),
    ((1, 32, 64, 16), 1),
    ((2, 8, 16, 128), 1),   # wide channels
    ((1, 16, 32, 3), 1),    # 3-channel input (first layer)
    ((1, 32, 64, 8), 2),
])
def test_pallas_matches_gather(shape, stride):
    rng = np.random.default_rng(0)
    b, h, w, cin = shape
    cout = 8
    x = jnp.asarray(rng.random(shape, dtype=np.float32))
    k = jnp.asarray(rng.normal(0, 0.2, (3, 3, cin, cout)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, cout).astype(np.float32))
    ref = np.asarray(sphere_conv_apply(x, k, bias, stride))
    out = np.asarray(sphere_conv_pallas(x, k, bias, stride, block_rows=8, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_cout_blocking():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 16, 32, 8), dtype=np.float32))
    k = jnp.asarray(rng.normal(0, 0.2, (3, 3, 8, 32)).astype(np.float32))
    ref = np.asarray(sphere_conv_apply(x, k, None, 1))
    out = np.asarray(sphere_conv_pallas(x, k, None, 1, cout_block=16, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_structured_tables_cover_all_resolutions():
    # every resolution the SPADE stack touches decomposes exactly
    for h, w in [(4, 8), (8, 16), (16, 32), (32, 64), (64, 128), (128, 256)]:
        structured_tables(h, w, 1)
    for h, w in [(32, 64), (64, 128), (128, 256)]:
        structured_tables(h, w, 2)


def test_auto_block_rows():
    from emlight_tpu.nn.sphere_conv_pallas import auto_block_rows

    # br=8 everywhere: with the weight tables in SMEM scalars, Mosaic's SMEM
    # budget at br=16 overflows the 1MB cap, and br=8 with scalar weights
    # measures faster than the old br=16 + wcol-window config anyway
    for dt in (jnp.float32, jnp.bfloat16):
        assert auto_block_rows(128, 256, 1, dt) == 8
        assert auto_block_rows(64, 128, 1, dt) == 8
        assert auto_block_rows(128, 256, 2, dt) == 8
