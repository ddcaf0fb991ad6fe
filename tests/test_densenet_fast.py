"""Concat-free eval forward == DenseNet.apply on the same variables."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emlight_tpu.nn.densenet import DenseNet
from emlight_tpu.nn.densenet_fast import buffer_apply, fast_apply


def _setup(dtype, block_config=(4, 4, 4), n_anchors=24, hw=(48, 64), group=4):
    model = DenseNet(
        block_config=block_config, n_anchors=n_anchors, dtype=dtype
    )
    x = jnp.asarray(
        np.random.default_rng(0).random((2, *hw, 3), dtype=np.float32)
    )
    # pure numerics parity — compile at XLA opt level 0 (conftest.jit0):
    # default-pipeline compiles of two full DenseNet graphs per
    # parametrization dominated the suite (132 s for the flagship topology
    # alone on the 1-vCPU VM; opt0 is ~20x faster, same outputs)
    from conftest import jit0

    v = jit0(lambda xx: model.init(jax.random.PRNGKey(0), xx, train=True))(x)
    ref = jit0(lambda vv, xx: model.apply(vv, xx, train=False))(v, x)
    fast = jit0(
        lambda p, s, xx: fast_apply(
            p, s, xx, block_config=block_config, dtype=dtype, group=group
        )
    )(v["params"], v["batch_stats"], x)
    return ref, fast


@pytest.mark.parametrize("group", [1, 3, 4])
def test_fast_apply_matches_f32(group):
    # group 3 leaves a pending (uncompacted) tail at block end; 4 divides
    ref, fast = _setup(jnp.float32, group=group)
    for k in ref:
        np.testing.assert_allclose(fast[k], ref[k], rtol=1e-4, atol=1e-4)


def test_fast_apply_matches_bf16():
    # bf16: same math modulo reassociation + where the affine rounds; heads
    # are f32-cast bf16 features, so agreement is at bf16 resolution relative
    # to each head's scale (near-zero logits carry only absolute error)
    ref, fast = _setup(jnp.bfloat16)
    for k in ref:
        r, f = np.asarray(ref[k]), np.asarray(fast[k])
        err = np.max(np.abs(f - r)) / np.max(np.abs(r))
        assert err < 0.02, (k, err)


def test_buffer_apply_matches_f32():
    from conftest import jit0

    model = DenseNet(block_config=(4, 4, 4), n_anchors=24, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).random((2, 48, 64, 3), dtype=np.float32))
    v = jit0(lambda xx: model.init(jax.random.PRNGKey(0), xx, train=True))(x)
    ref = jit0(lambda vv, xx: model.apply(vv, xx, train=False))(v, x)
    fast = jit0(
        lambda p, s, xx: buffer_apply(
            p, s, xx, block_config=(4, 4, 4), dtype=jnp.float32
        )
    )(v["params"], v["batch_stats"], x)
    for k in ref:
        np.testing.assert_allclose(fast[k], ref[k], rtol=1e-4, atol=1e-4)


def test_fast_apply_flagship_shape():
    # flagship topology at tiny spatial size: exercises all 48 layers' slicing
    ref, fast = _setup(jnp.float32, block_config=(16, 16, 16), hw=(32, 32))
    for k in ref:
        np.testing.assert_allclose(fast[k], ref[k], rtol=3e-4, atol=3e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
