"""Eval-mode BN folding (nn/densenet.py::fold_eval_variables) is exact.

The fold absorbs each dense layer's norm2 affine (no nonlinearity before
conv2, the reference layer order at RegressionNetwork/DenseNet.py:30-46) into
conv2's kernel plus a new bias — outputs must match the unfolded model up to
f32 reassociation.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from emlight_tpu.config import AnchorConfig, RegressionConfig
from emlight_tpu.train import regression as R


def _small_cfg():
    return dataclasses.replace(
        RegressionConfig(),
        anchors=AnchorConfig(regression_anchors=16),
        block_config=(2, 2),
        crop_h=32,
        crop_w=32,
    )


def test_fold_bn_matches_unfolded():
    cfg = _small_cfg()
    state = R.create_state(jax.random.PRNGKey(0), cfg)
    # non-trivial running stats (fresh init has mean 0 / var 1: folding would
    # be exact even with a broken scale path — perturb them)
    stats = jax.tree.map(
        lambda a: a + 0.3 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size,
        state.batch_stats,
    )
    rng = np.random.default_rng(0)
    crop = jnp.asarray(rng.random((2, cfg.crop_h, cfg.crop_w, 3), dtype=np.float32))

    ref = R.predict(state.apply_fn, state.params, stats, crop)
    apply_fn, p, s = R.fold_for_inference(cfg, state.params, stats)
    got = R.predict(apply_fn, p, s, crop)

    for k in ref:
        a, b = np.asarray(ref[k]), np.asarray(got[k])
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5, err_msg=k)
    # folded params actually dropped every dense layer's norm2 (the head's
    # last_norm2 is not a dense-layer BN and stays)
    assert not any("norm2" in p[name] for name in p if "_denselayer" in name)
    assert any("conv2_pad" in p[name] for name in p if "_denselayer" in name)
