"""Multi-device (8 virtual CPU devices) data-parallel training tests.

The TPU-native replacement for the reference's DataParallel+SyncBN
(SURVEY.md §4 point 4): global-batch BN statistics and pmean'd gradients must
reproduce single-device training on the same global batch.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# runs in a fresh interpreter via test_gspmd_isolated.py (XLA:CPU collectives
# can abort/deadlock a long-lived multi-module process — see conftest.py);
# run directly with EMLIGHT_GSPMD_CHILD=1 pytest tests/test_dist.py
pytestmark = pytest.mark.skipif(
    os.environ.get("EMLIGHT_GSPMD_CHILD") != "1",
    reason="driven out-of-process by test_gspmd_isolated.py",
)

from emlight_tpu.config import AnchorConfig, ProjectorConfig, RegressionConfig, SinkhornConfig
from emlight_tpu.dist import make_mesh, make_parallel_projector_steps, make_parallel_regression_step, shard_batch, replicate
from emlight_tpu.dist.mesh import DATA_AXIS
from emlight_tpu.train import projector as P_
from emlight_tpu.train import regression as R
from emlight_tpu.train.data import synthetic_projector_batch, synthetic_regression_batch

CFG = dataclasses.replace(
    RegressionConfig(),
    crop_h=32, crop_w=32, batch_size=8, block_config=(2,),
    sinkhorn=SinkhornConfig(n_iters=6),
)


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_parallel_regression_matches_single_device():
    mesh = make_mesh(8)
    state_p = R.create_state(jax.random.PRNGKey(0), CFG, axis_name=DATA_AXIS)
    state_s = R.create_state(jax.random.PRNGKey(0), CFG)  # same rng -> same params

    batch = synthetic_regression_batch(8, 96, (32, 32), seed=1)
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}

    pstep = make_parallel_regression_step(CFG, mesh)
    state_p = replicate(state_p, mesh)
    sp, mp = pstep(state_p, shard_batch(batch_j, mesh))
    ss, ms = R.train_step(state_s, batch_j, CFG)

    # global-batch BN + pmean grads == single-device on the same batch
    np.testing.assert_allclose(float(mp["loss"]), float(ms["loss"]), rtol=1e-4)
    # Param bound: one Adam step moves every element by ~±lr (m̂/√v̂ ≈ ±1 at
    # step 1), so an element whose GRADIENT is pure f32 reassociation noise
    # (per-shard moments + pmean vs one full-batch reduce associate
    # differently; the rsqrt BN chain amplifies the difference) can flip sign
    # and land 2·lr apart. Everything above the noise floor matches at rtol;
    # atol admits exactly that sign-flip bound.
    atol = 2.0 * CFG.lr * 1.1
    for a, b in zip(jax.tree.leaves(sp.params), jax.tree.leaves(ss.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=atol)
    for a, b in zip(jax.tree.leaves(sp.batch_stats), jax.tree.leaves(ss.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_parallel_regression_multiple_steps_stay_replicated():
    mesh = make_mesh(8)
    state = replicate(R.create_state(jax.random.PRNGKey(1), CFG, axis_name=DATA_AXIS), mesh)
    pstep = make_parallel_regression_step(CFG, mesh)
    for seed in range(3):
        batch = {
            k: jnp.asarray(v)
            for k, v in synthetic_regression_batch(8, 96, (32, 32), seed=seed).items()
        }
        state, metrics = pstep(state, shard_batch(batch, mesh))
        assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 3


TINY_PROJ = dataclasses.replace(
    ProjectorConfig(),
    crop_size=64, ngf=8, ndf=8, batch_size=8,
    anchors=AnchorConfig(n_anchors=16, env_h=32, env_w=64),
    use_vgg_loss=False,
)


def test_parallel_projector_steps_run():
    mesh = make_mesh(8)
    state = replicate(
        P_.create_state(jax.random.PRNGKey(2), TINY_PROJ, axis_name=DATA_AXIS), mesh
    )
    g_step, d_step = make_parallel_projector_steps(TINY_PROJ, mesh)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_projector_batch(
            8, n_anchors=16, crop_size=32, env_hw=(32, 64), seed=0
        ).items()
        if not isinstance(v, list)
    }
    sbatch = shard_batch(batch, mesh)
    state, g_metrics, fake = g_step(state, sbatch)
    state, d_metrics = d_step(state, sbatch)
    assert fake.shape == (8, 32, 64, 3)
    for v in {**g_metrics, **d_metrics}.values():
        assert np.isfinite(float(v))


def test_parallel_fused_step_matches_single():
    """shard_mapped fused step == single-device fused step on the same global
    batch (loss equality is the cross-replica drift guard, as in the VGG
    single-vs-parallel test)."""
    from emlight_tpu.dist import make_parallel_fused_step

    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_projector_batch(
            8, n_anchors=16, crop_size=32, env_hw=(32, 64), seed=7
        ).items()
        if not isinstance(v, list)
    }
    state_s = P_.create_state(jax.random.PRNGKey(5), TINY_PROJ)
    ss, ms, _ = P_.fused_gan_step(state_s, batch, TINY_PROJ)

    mesh = make_mesh(8)
    state_p = replicate(
        P_.create_state(jax.random.PRNGKey(5), TINY_PROJ, axis_name=DATA_AXIS), mesh
    )
    fused = make_parallel_fused_step(TINY_PROJ, mesh)
    sp, mp, fake = fused(state_p, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(mp["loss_G"]), float(ms["loss_G"]), rtol=1e-4)
    np.testing.assert_allclose(float(mp["loss_D"]), float(ms["loss_D"]), rtol=1e-4)
    assert fake.shape == (8, 32, 64, 3)
    assert int(sp.step) == 1
    for a, b in zip(
        jax.tree.leaves(sp.g_stats["batch_stats"]),
        jax.tree.leaves(ss.g_stats["batch_stats"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_parallel_predict_matches_single_device():
    from emlight_tpu.dist import make_parallel_predict, pad_leading

    mesh = make_mesh(8)
    state = R.create_state(jax.random.PRNGKey(3), CFG)
    batch = synthetic_regression_batch(11, 96, (32, 32), seed=4)  # ragged: 11 % 8 != 0
    crop = jnp.asarray(batch["crop"])

    single = R.predict(state.apply_fn, state.params, state.batch_stats, crop)

    run = make_parallel_predict(CFG, mesh)
    padded, n = pad_leading({"crop": np.asarray(crop)}, 8)
    assert n == 11 and padded["crop"].shape[0] == 16
    state_r = replicate(state, mesh)
    pred = run(state_r, shard_batch(jnp.asarray(padded["crop"]), mesh))
    for k in single:
        np.testing.assert_allclose(
            np.asarray(pred[k])[:n], np.asarray(single[k]), rtol=1e-5, atol=1e-5
        )


def test_parallel_inference_matches_single_device():
    from emlight_tpu.dist import make_parallel_inference

    mesh = make_mesh(8)
    state = P_.create_state(jax.random.PRNGKey(5), TINY_PROJ)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_projector_batch(
            8, n_anchors=16, crop_size=32, env_hw=(32, 64), seed=6
        ).items()
    }
    single = P_.inference(state, batch, TINY_PROJ)

    run = make_parallel_inference(TINY_PROJ, mesh)
    fake = run(replicate(state, mesh), shard_batch(batch, mesh))
    np.testing.assert_allclose(np.asarray(fake), np.asarray(single), rtol=1e-5, atol=1e-5)
