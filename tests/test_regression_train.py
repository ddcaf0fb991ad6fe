"""End-to-end regression slice: model shapes, jitted train step, overfit
signal, checkpoint roundtrip."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from emlight_tpu.config import RegressionConfig
from emlight_tpu.nn.densenet import DenseNet
from emlight_tpu.train import checkpoint as ckpt
from emlight_tpu.train import regression as R
from emlight_tpu.train.data import synthetic_regression_batch

# small crops keep CPU runtime sane; Dense layers infer the flattened dim.
# Every knob matches what tests/test_cli.py's train_regression CLI builds
# (anchors 96, block 2,2, crop 64x64, default sinkhorn): identical static
# configs share the jitted train_step compile across files — the suite is
# compile-bound (conftest jit0 note)
SMALL = dataclasses.replace(
    RegressionConfig(),
    crop_h=64,
    crop_w=64,
    batch_size=2,
    block_config=(2, 2),
)


def _batch(cfg, seed=0):
    b = synthetic_regression_batch(
        cfg.batch_size, cfg.anchors.regression_anchors, (cfg.crop_h, cfg.crop_w), seed
    )
    return {k: jnp.asarray(v) for k, v in b.items()}


def test_densenet_output_shapes_and_param_count():
    model = DenseNet(n_anchors=96)
    x = jnp.zeros((1, 192, 256, 3))
    # shapes + param count only: eval_shape skips the flagship-size compile
    variables = jax.eval_shape(
        lambda k: model.init(k, x, train=False), jax.random.PRNGKey(0)
    )
    out = jax.eval_shape(lambda v: model.apply(v, x, train=False), variables)
    assert out["distribution"].shape == (1, 96)
    assert out["intensity"].shape == (1, 1)
    assert out["rgb_ratio"].shape == (1, 3)
    assert out["ambient"].shape == (1, 3)
    # fc input must be the reference's 8208 (171 ch x 6 x 8) at 192x256
    assert variables["params"]["fc"]["kernel"].shape == (8208, 1024)
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    # reference prints ~9.x M params; dense blocks dominate — sanity window
    assert 5e6 < n_params < 15e6


def test_train_step_decreases_loss():
    state = R.create_state(jax.random.PRNGKey(0), SMALL)
    batch = _batch(SMALL)
    _, m0 = R.train_step(state, batch, SMALL)
    s = state
    for _ in range(8):
        s, m = R.train_step(s, batch, SMALL)
    assert float(m["loss"]) < float(m0["loss"])
    assert int(s.step) == 8
    for v in m.values():
        assert np.isfinite(float(v))


def test_eval_step_and_predict():
    state = R.create_state(jax.random.PRNGKey(1), SMALL)
    batch = _batch(SMALL, seed=3)
    metrics, pred = R.eval_step(state, batch, SMALL)
    assert pred["distribution"].shape == (SMALL.batch_size, 96)
    out = R.predict(state.apply_fn, state.params, state.batch_stats, batch["crop"])
    np.testing.assert_allclose(
        np.asarray(out["distribution"]), np.asarray(pred["distribution"]), atol=1e-6
    )


def test_checkpoint_roundtrip(tmp_path):
    state = R.create_state(jax.random.PRNGKey(2), SMALL)
    batch = _batch(SMALL, seed=4)
    state, _ = R.train_step(state, batch, SMALL)
    path = ckpt.save_checkpoint(str(tmp_path), state, name="latest")
    template = R.create_state(jax.random.PRNGKey(3), SMALL)
    restored = ckpt.restore_checkpoint(path, template)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed training continues bit-identically
    s1, m1 = R.train_step(state, batch, SMALL)
    s2, m2 = R.train_step(restored, batch, SMALL)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


def test_batch_stats_update_only_in_train_mode():
    state = R.create_state(jax.random.PRNGKey(4), SMALL)
    batch = _batch(SMALL, seed=5)
    before = jax.tree.map(lambda x: np.asarray(x).copy(), state.batch_stats)
    R.eval_step(state, batch, SMALL)
    after_eval = state.batch_stats
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after_eval)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    new_state, _ = R.train_step(state, batch, SMALL)
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(new_state.batch_stats))
    )
    assert changed


def test_log_grad_norms_metrics():
    """log_grad_norms surfaces the reference's check_grad probes
    (RegressionNetwork/panorama.py:41-64) as finite metrics: a global grad
    norm plus one per prediction head, without touching the update itself."""
    cfg = dataclasses.replace(SMALL, log_grad_norms=True)
    state = R.create_state(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    s_probe, m = R.train_step(state, batch, cfg)
    assert float(m["grad_norm"]) > 0
    heads = [k for k in m if k.startswith("grad_norm_fc_")]
    assert {"grad_norm_fc_dist", "grad_norm_fc_intensity",
            "grad_norm_fc_rgb_ratio", "grad_norm_fc_ambient"} <= set(m)
    for k in heads:
        assert np.isfinite(float(m[k])) and float(m[k]) >= 0
    # probes are read-only: params after one step match the unprobed run
    s_plain, _ = R.train_step(
        R.create_state(jax.random.PRNGKey(0), SMALL), batch, SMALL
    )
    for a, b in zip(jax.tree.leaves(s_probe.params), jax.tree.leaves(s_plain.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_clip_grad_norm_bounds_update_and_roundtrips(tmp_path):
    """clip_grad_norm > 0 chains global-norm clipping ahead of Adam: the first
    pre-Adam update has global norm <= clip, loss still falls, and the changed
    opt-state structure checkpoints/restores into a matching template."""
    import optax

    clip = 0.5
    clip_cfg = dataclasses.replace(SMALL, clip_grad_norm=clip)
    state = R.create_state(jax.random.PRNGKey(0), clip_cfg)
    batch = _batch(clip_cfg)

    # oracle: chain(clip_by_global_norm, adam) == adam applied to pre-scaled
    # grads g * min(1, clip/||g||)
    grads = jax.tree.map(jnp.ones_like, state.params)
    gnorm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, clip / gnorm)
    upd_chain, _ = state.tx.update(grads, state.opt_state, state.params)
    plain = optax.adam(SMALL.lr, b1=SMALL.betas[0], b2=SMALL.betas[1])
    upd_plain, _ = plain.update(
        jax.tree.map(lambda g: g * scale, grads),
        plain.init(state.params),
        state.params,
    )
    for a, b in zip(jax.tree.leaves(upd_chain), jax.tree.leaves(upd_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8)

    # training still converges with a practical clip value
    loose = dataclasses.replace(SMALL, clip_grad_norm=10.0)
    s = R.create_state(jax.random.PRNGKey(1), loose)
    _, m0 = R.train_step(s, batch, loose)
    for _ in range(6):
        s, m = R.train_step(s, batch, loose)
    assert float(m["loss"]) < float(m0["loss"])

    # checkpoint roundtrip with the chained opt-state structure
    path = ckpt.save_checkpoint(str(tmp_path), s, name="latest")
    restored = ckpt.restore_checkpoint(path, R.create_state(jax.random.PRNGKey(2), loose))
    s1, m1 = R.train_step(s, batch, loose)
    s2, m2 = R.train_step(restored, batch, loose)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
