"""Fused end-to-end inference pipeline (crop -> regression -> guide -> generator).

Validates that pipeline_inference is exactly the composition of its stages
(regression predict, alpha-cancelled guide rasterization, eval-mode generator)
and that the parallel (shard_map) variant and the infer CLI reproduce it.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emlight_tpu.config import AnchorConfig, ProjectorConfig, RegressionConfig
from emlight_tpu.train import projector as P
from emlight_tpu.train import regression as R
from emlight_tpu.train.pipeline import (
    END_TO_END_INTENSITY_SCALE,
    pipeline_inference,
    predicted_guide,
)

N_ANCHORS = 16
CROP_SIZE = 64  # generator output (32, 64), encoder input 32x32
REG_HW = (48, 64)


@pytest.fixture(scope="module")
def cfgs():
    reg_cfg = dataclasses.replace(
        RegressionConfig(),
        anchors=AnchorConfig(regression_anchors=N_ANCHORS),
        crop_h=REG_HW[0], crop_w=REG_HW[1], block_config=(2,),
    )
    proj_cfg = dataclasses.replace(
        ProjectorConfig(),
        crop_size=CROP_SIZE, ngf=4, ndf=4,
        anchors=AnchorConfig(n_anchors=N_ANCHORS, env_h=CROP_SIZE // 2, env_w=CROP_SIZE),
    )
    return reg_cfg, proj_cfg


@pytest.fixture(scope="module")
def states(cfgs):
    reg_cfg, proj_cfg = cfgs
    return (
        R.create_state(jax.random.PRNGKey(0), reg_cfg),
        P.create_state(jax.random.PRNGKey(1), proj_cfg),
    )


def _crops(batch, seed=0):
    rng = np.random.default_rng(seed)
    crop_reg = rng.random((batch, *REG_HW, 3), dtype=np.float32)
    crop_proj = rng.random((batch, CROP_SIZE // 2, CROP_SIZE // 2, 3), dtype=np.float32)
    return jnp.asarray(crop_reg), jnp.asarray(crop_proj)


def test_pipeline_matches_stage_composition(cfgs, states):
    reg_cfg, proj_cfg = cfgs
    reg_state, proj_state = states
    crop_reg, crop_proj = _crops(2)

    env, pred = pipeline_inference(
        reg_state, proj_state, crop_reg, crop_proj, reg_cfg, proj_cfg
    )
    assert env.shape == (2, CROP_SIZE // 2, CROP_SIZE, 3)
    assert pred["distribution"].shape == (2, N_ANCHORS)

    # stage-by-stage composition
    # The fused program fuses across stage boundaries, so XLA may reorder
    # float accumulations vs the stage-by-stage run — tight allclose, not
    # bit-exact.
    pred_ref = R.predict(
        reg_state.apply_fn, reg_state.params, reg_state.batch_stats, crop_reg
    )
    for k in pred_ref:
        np.testing.assert_allclose(
            np.asarray(pred[k]), np.asarray(pred_ref[k]), rtol=1e-6, atol=1e-7
        )
    guide = predicted_guide(
        pred_ref, CROP_SIZE // 2, CROP_SIZE, proj_cfg.anchors.splat_size
    )
    variables = {"params": proj_state.g_params, **proj_state.g_stats}
    env_ref = proj_state.g_apply(variables, guide, crop_proj, train=False)
    np.testing.assert_allclose(
        np.asarray(env), np.asarray(env_ref), rtol=1e-5, atol=1e-5
    )


def test_guide_scale_is_alpha_cancelled_training_guide(cfgs, states):
    """The e2e guide must equal the guide the projector saw in TRAINING when
    the regression predictions are exact: guide_train(raw GT scaled the
    ProjectorDataset way, x alpha) == guide_e2e(regression-target-scaled
    predictions, no alpha)."""
    reg_cfg, proj_cfg = cfgs
    rng = np.random.default_rng(3)
    b = 2
    dist = rng.gamma(0.3, 1.0, (b, N_ANCHORS)).astype(np.float32)
    dist /= dist.sum(1, keepdims=True)
    raw_int = rng.uniform(100, 5000, b).astype(np.float32)
    rgb = rng.uniform(0.3, 0.8, (b, 3)).astype(np.float32)
    raw_amb = rng.uniform(0, 2000, (b, 3)).astype(np.float32)
    alpha = rng.uniform(0.5, 2.0, b).astype(np.float32)

    # training path: ProjectorDataset scales (data.py) + make_guide (x alpha)
    train_batch = {
        "distribution": jnp.asarray(dist),
        "intensity": jnp.asarray(raw_int * 0.01),
        "rgb_ratio": jnp.asarray(rgb),
        "ambient": jnp.asarray(raw_amb / (128 * 256)),
        "alpha": jnp.asarray(alpha),
    }
    guide_train = P.make_guide(train_batch, proj_cfg)

    # e2e path: exact predictions in regression-target units, no alpha
    pred = {
        "distribution": jnp.asarray(dist),
        "intensity": jnp.asarray((raw_int * alpha / 500.0)[:, None]),
        "rgb_ratio": jnp.asarray(rgb),
        "ambient": jnp.asarray(raw_amb * alpha[:, None] / (128 * 256)),
    }
    guide_e2e = predicted_guide(
        pred, proj_cfg.crop_size // 2, proj_cfg.crop_size, proj_cfg.anchors.splat_size
    )
    np.testing.assert_allclose(
        np.asarray(guide_e2e), np.asarray(guide_train), rtol=2e-5, atol=1e-5
    )
    assert END_TO_END_INTENSITY_SCALE == 5.0


def test_parallel_pipeline_matches_serial(cfgs, states):
    from emlight_tpu.dist import make_mesh, make_parallel_pipeline, replicate, shard_batch

    reg_cfg, proj_cfg = cfgs
    reg_state, proj_state = states
    n_dev = jax.device_count()
    crop_reg, crop_proj = _crops(n_dev, seed=5)

    env, pred = pipeline_inference(
        reg_state, proj_state, crop_reg, crop_proj, reg_cfg, proj_cfg
    )
    mesh = make_mesh()
    run = make_parallel_pipeline(reg_cfg, proj_cfg, mesh)
    env_p, pred_p = run(
        replicate(reg_state, mesh), replicate(proj_state, mesh),
        shard_batch(crop_reg, mesh), shard_batch(crop_proj, mesh),
    )
    np.testing.assert_allclose(np.asarray(env_p), np.asarray(env), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pred_p["distribution"]), np.asarray(pred["distribution"]),
        rtol=1e-5, atol=1e-6,
    )


def test_infer_cli(cfgs, states, tmp_path):
    """infer CLI: checkpoints + crop dir -> .exr/.jpg/.pickle per crop, with
    shape flags pulled from the run-config snapshots."""
    import json

    from emlight_tpu.cli.infer import main
    from emlight_tpu.core.exr import read_exr, write_exr
    from emlight_tpu.train import checkpoint as ckpt_mod

    reg_cfg, proj_cfg = cfgs
    reg_state, proj_state = states
    reg_dir, proj_dir = tmp_path / "reg_run", tmp_path / "proj_run"
    reg_ckpt = ckpt_mod.save_checkpoint(str(reg_dir / "checkpoints"), reg_state)
    proj_ckpt = ckpt_mod.save_checkpoint(str(proj_dir / "checkpoints"), proj_state)
    (reg_dir / "opt.json").write_text(json.dumps({
        "anchors": N_ANCHORS, "block_config": "2",
        "crop": f"{REG_HW[0]},{REG_HW[1]}", "clip_grad_norm": 0.0,
    }))
    (proj_dir / "opt.json").write_text(json.dumps({
        "crop_size": CROP_SIZE, "ngf": 4, "ndf": 4,
        "dtype": "float32", "clip_grad_norm": 0.0,
    }))

    crops = tmp_path / "crop"
    crops.mkdir()
    rng = np.random.default_rng(7)
    for i in range(3):
        write_exr(str(crops / f"c{i}.exr"),
                  rng.random((REG_HW[0], REG_HW[1], 3)).astype(np.float32))

    out = tmp_path / "e2e"
    main([
        "--reg_ckpt", reg_ckpt, "--proj_ckpt", proj_ckpt,
        "--reg_config", str(reg_dir), "--proj_config", str(proj_dir),
        "--crops", str(crops), "--out_dir", str(out),
        "--batch", "2", "--save_pickles",
    ])
    assert sorted(p.name for p in out.glob("*.exr")) == ["c0.exr", "c1.exr", "c2.exr"]
    assert len(list(out.glob("*.jpg"))) == 3
    assert len(list(out.glob("*.pickle"))) == 3
    env = read_exr(str(out / "c0.exr"))
    assert env.shape == (CROP_SIZE // 2, CROP_SIZE, 3)
    assert np.isfinite(env).all()

    # --parallel writes the same env maps (padded ragged batch over the mesh)
    out_p = tmp_path / "e2e_parallel"
    main([
        "--reg_ckpt", reg_ckpt, "--proj_ckpt", proj_ckpt,
        "--reg_config", str(reg_dir), "--proj_config", str(proj_dir),
        "--crops", str(crops), "--out_dir", str(out_p),
        "--batch", "4", "--parallel",
    ])
    for nm in ("c0.exr", "c1.exr", "c2.exr"):
        np.testing.assert_allclose(
            read_exr(str(out_p / nm)), read_exr(str(out / nm)), rtol=1e-4, atol=1e-5
        )
