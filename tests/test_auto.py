"""GSPMD auto-sharded execution tests (8 virtual CPU devices, dp×tp meshes).

The single-device step math, jitted over a 2-D (data, model) mesh with
shape-based parameter PartitionSpecs, must reproduce single-device results —
XLA inserts the batch-stat reductions (SyncBN), gradient reductions, and the
tensor-parallel collectives implied by channel-sharded conv kernels
(dist/auto.py). Equality vs the single-device step is the whole contract.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# runs in a fresh interpreter via test_gspmd_isolated.py (XLA:CPU collectives
# can abort/deadlock a long-lived multi-module process — see conftest.py);
# run directly with EMLIGHT_GSPMD_CHILD=1 pytest tests/test_auto.py
pytestmark = pytest.mark.skipif(
    os.environ.get("EMLIGHT_GSPMD_CHILD") != "1",
    reason="driven out-of-process by test_gspmd_isolated.py",
)

from emlight_tpu.config import AnchorConfig, ProjectorConfig, RegressionConfig, SinkhornConfig
from emlight_tpu.dist import (
    auto_shard_batch,
    auto_shard_state,
    make_auto_inference,
    make_auto_pipeline,
    make_auto_projector_steps,
    make_auto_regression_step,
    make_mesh,
)
from emlight_tpu.dist.mesh import MODEL_AXIS
from emlight_tpu.train import projector as P_
from emlight_tpu.train import regression as R
from emlight_tpu.train.data import synthetic_projector_batch, synthetic_regression_batch

CFG = dataclasses.replace(
    RegressionConfig(),
    crop_h=32, crop_w=32, batch_size=8, block_config=(2,),
    sinkhorn=SinkhornConfig(n_iters=6),
)

TINY_PROJ = dataclasses.replace(
    ProjectorConfig(),
    crop_size=64, ngf=8, ndf=8, batch_size=8,
    anchors=AnchorConfig(n_anchors=16, env_h=32, env_w=64),
    use_vgg_loss=False,
)


def _proj_batch(seed=0):
    return {
        k: jnp.asarray(v)
        for k, v in synthetic_projector_batch(
            8, n_anchors=16, crop_size=32, env_hw=(32, 64), seed=seed
        ).items()
        if not isinstance(v, list)
    }


@pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
def test_auto_regression_step_matches_single(shape):
    dp, tp = shape
    mesh = make_mesh(8, model_parallel=tp)
    assert mesh.shape[MODEL_AXIS] == tp

    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_regression_batch(8, 96, (32, 32), seed=1).items()
    }
    state_s = R.create_state(jax.random.PRNGKey(0), CFG)
    ss, ms = R.train_step(state_s, batch, CFG)

    state_a = auto_shard_state(R.create_state(jax.random.PRNGKey(0), CFG), mesh)
    step = make_auto_regression_step(CFG, mesh)
    sa, ma = step(state_a, auto_shard_batch(batch, mesh))

    np.testing.assert_allclose(float(ma["loss"]), float(ms["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(ss.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-6)
    for a, b in zip(jax.tree.leaves(sa.batch_stats), jax.tree.leaves(ss.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_auto_fused_gan_step_matches_single():
    batch = _proj_batch(seed=7)
    state_s = P_.create_state(jax.random.PRNGKey(5), TINY_PROJ)
    ss, ms, _ = P_.fused_gan_step(state_s, batch, TINY_PROJ)

    mesh = make_mesh(8, model_parallel=4)
    state_a = auto_shard_state(P_.create_state(jax.random.PRNGKey(5), TINY_PROJ), mesh)
    _, _, fused = make_auto_projector_steps(TINY_PROJ, mesh)
    sa, ma, fake = fused(state_a, auto_shard_batch(batch, mesh))

    np.testing.assert_allclose(float(ma["loss_G"]), float(ms["loss_G"]), rtol=1e-4)
    np.testing.assert_allclose(float(ma["loss_D"]), float(ms["loss_D"]), rtol=1e-4)
    assert fake.shape == (8, 32, 64, 3)
    # params are NOT compared: Adam with beta1=0 makes the first-step update
    # ~sign(grad)*lr, so any reduction-order noise in near-zero grads flips
    # signs (same reason test_dist.py's fused test compares stats, not params)
    for a, b in zip(
        jax.tree.leaves(sa.g_stats["batch_stats"]),
        jax.tree.leaves(ss.g_stats["batch_stats"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_auto_alternating_steps_run_and_stay_finite():
    mesh = make_mesh(8, model_parallel=2)
    state = auto_shard_state(P_.create_state(jax.random.PRNGKey(2), TINY_PROJ), mesh)
    g_step, d_step, _ = make_auto_projector_steps(TINY_PROJ, mesh)
    batch = auto_shard_batch(_proj_batch(seed=0), mesh)
    state, g_metrics, fake = g_step(state, batch)
    state, d_metrics = d_step(state, batch)
    assert fake.shape == (8, 32, 64, 3)
    for v in {**g_metrics, **d_metrics}.values():
        assert np.isfinite(float(v))
    assert int(state.step) == 1  # g then d = one iteration


def test_auto_inference_matches_single_and_splits_channels():
    batch = _proj_batch(seed=6)
    state = P_.create_state(jax.random.PRNGKey(5), TINY_PROJ)
    single = P_.inference(state, batch, TINY_PROJ)

    mesh = make_mesh(8, model_parallel=4)
    run = make_auto_inference(TINY_PROJ, mesh)
    state_a = auto_shard_state(state, mesh)
    batch_a = auto_shard_batch(batch, mesh)
    fake = run(state_a, batch_a)
    np.testing.assert_allclose(np.asarray(fake), np.asarray(single), rtol=1e-5, atol=1e-5)

    # the compiled program must actually communicate (tensor-parallel
    # collectives), not silently replicate the whole model per device
    hlo = run.lower(state_a, batch_a).compile().as_text()
    assert "all-reduce" in hlo or "reduce-scatter" in hlo or "all-gather" in hlo


def test_auto_pipeline_matches_serial():
    from emlight_tpu.train.pipeline import pipeline_inference

    reg_cfg = dataclasses.replace(
        RegressionConfig(),
        anchors=AnchorConfig(regression_anchors=16),
        crop_h=48, crop_w=64, block_config=(2,),
    )
    proj_cfg = dataclasses.replace(
        ProjectorConfig(),
        crop_size=64, ngf=4, ndf=4,
        anchors=AnchorConfig(n_anchors=16, env_h=32, env_w=64),
    )
    reg_state = R.create_state(jax.random.PRNGKey(0), reg_cfg)
    proj_state = P_.create_state(jax.random.PRNGKey(1), proj_cfg)
    rng = np.random.default_rng(5)
    crop_reg = jnp.asarray(rng.random((8, 48, 64, 3), dtype=np.float32))
    crop_proj = jnp.asarray(rng.random((8, 32, 32, 3), dtype=np.float32))

    env, pred = pipeline_inference(
        reg_state, proj_state, crop_reg, crop_proj, reg_cfg, proj_cfg
    )

    mesh = make_mesh(8, model_parallel=2)
    run = make_auto_pipeline(reg_cfg, proj_cfg, mesh)
    env_a, pred_a = run(
        auto_shard_state(reg_state, mesh), auto_shard_state(proj_state, mesh),
        auto_shard_batch(crop_reg, mesh), auto_shard_batch(crop_proj, mesh),
    )
    np.testing.assert_allclose(np.asarray(env_a), np.asarray(env), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pred_a["distribution"]), np.asarray(pred["distribution"]),
        rtol=1e-5, atol=1e-6,
    )
