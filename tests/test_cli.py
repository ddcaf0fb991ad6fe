"""End-to-end CLI smoke test on a synthetic Laval-layout dataset:
extract GT -> train regression -> predict -> needlet GT -> previews."""

import os
import pickle

import numpy as np
import pytest

from emlight_tpu.core.exr import write_exr


@pytest.fixture(scope="module")
def laval_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("laval")
    (root / "warped").mkdir()
    (root / "crop").mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        pano = rng.random((128, 256, 3)).astype(np.float32) * 0.2
        pano[40:44, 60 + 20 * i : 66 + 20 * i] = 300.0  # a light
        write_exr(str(root / "warped" / f"s{i}.exr"), pano)
        crop = rng.random((192, 256, 3)).astype(np.float32)
        write_exr(str(root / "crop" / f"s{i}.exr"), crop)
    return root


def test_extract_distribution_cli(laval_root):
    from emlight_tpu.cli.extract_distribution import main

    out = laval_root / "pkl"
    main([
        "--hdr_dir", str(laval_root / "warped"), "--out_dir", str(out),
        "--anchors", "96", "--batch", "2",
    ])
    files = sorted(os.listdir(out))
    assert len(files) == 4
    with open(out / files[0], "rb") as f:
        para = pickle.load(f)
    assert para["distribution"].shape == (96,)
    np.testing.assert_allclose(para["distribution"].sum(), 1.0, rtol=1e-5)
    assert {"intensity", "rgb_ratio", "ambient"} <= set(para)


def test_train_and_test_regression_cli(laval_root, tmp_path):
    from emlight_tpu.cli.test_regression import main as test_main
    from emlight_tpu.cli.train_regression import main as train_main

    # GT must exist (created by the extract test, but don't depend on order)
    if not (laval_root / "pkl").exists():
        test_extract_distribution_cli(laval_root)

    out = tmp_path / "run"
    train_main([
        "--data_root", str(laval_root), "--out_dir", str(out),
        "--epochs", "2", "--batch_size", "2", "--anchors", "96",
        "--block_config", "2", "--crop", "64,64",
        "--summary_every", "2", "--save_every", "2",
    ])
    ckpt = out / "checkpoints" / "latest.msgpack"
    assert ckpt.exists()
    assert (out / "metrics.csv").exists()
    assert any((out / "summary").iterdir())

    res = tmp_path / "results"
    test_main([
        "--ckpt", str(ckpt), "--data_root", str(laval_root),
        "--out_dir", str(res), "--anchors", "96",
        "--block_config", "2", "--crop", "64,64", "--render",
    ])
    pickles = [f for f in os.listdir(res) if f.endswith(".pickle")]
    assert len(pickles) == 4
    with open(res / pickles[0], "rb") as f:
        pred = pickle.load(f)
    assert pred["distribution"].shape == (96,)
    assert any(f.endswith("_env.png") for f in os.listdir(res))

    # --parallel: same predictions through the sharded path (batch 4 padded
    # to the 8-device mesh)
    res_p = tmp_path / "results_parallel"
    test_main([
        "--ckpt", str(ckpt), "--data_root", str(laval_root),
        "--out_dir", str(res_p), "--anchors", "96",
        "--block_config", "2", "--crop", "64,64", "--parallel",
    ])
    import numpy as np

    for nm in pickles:
        with open(res / nm, "rb") as f:
            serial = pickle.load(f)
        with open(res_p / nm, "rb") as f:
            par = pickle.load(f)
        np.testing.assert_allclose(
            par["distribution"], serial["distribution"], rtol=1e-5, atol=1e-5
        )


def test_train_and_test_projector_cli(laval_root, tmp_path):
    """GAN stage end-to-end: train -> checkpoint -> resume (config snapshot
    reloaded automatically) -> inference writes .exr + .jpg (the reference's
    GenProjector/train.py:26-69 + test.py:17-40 surface)."""
    import json

    from emlight_tpu.cli.test_projector import main as test_main
    from emlight_tpu.cli.train_projector import main as train_main

    if not (laval_root / "pkl").exists():
        test_extract_distribution_cli(laval_root)

    out = tmp_path / "gan"
    train_main([
        "--data_root", str(laval_root), "--out_dir", str(out),
        "--batch_size", "2", "--ngf", "8", "--ndf", "8",
        "--crop_size", "64", "--anchors", "96",
        "--display_every", "1", "--save_every", "2", "--epochs", "1",
    ])
    ckpt = out / "checkpoints" / "latest.msgpack"
    assert ckpt.exists()
    assert (out / "metrics.csv").exists()
    assert any((out / "web").iterdir())  # tonemapped real|fake dumps
    # config snapshot (reference's opt.txt/opt.pkl, base_options.py:122-146)
    opt = json.loads((out / "opt.json").read_text())
    assert opt["ngf"] == 8 and opt["crop_size"] == 64
    assert (out / "opt.txt").exists()

    # resume WITHOUT re-passing shape flags: opt.json supplies them, so a
    # template mismatch is impossible by default
    train_main(["--out_dir", str(out), "--resume", "--epochs", "2"])
    with open(out / "iter.json") as f:
        assert json.load(f)["step"] >= 4  # 2 steps/epoch x 2 epochs

    res = tmp_path / "res_projector"
    test_main([
        "--ckpt", str(ckpt), "--data_root", str(laval_root),
        "--out_dir", str(res), "--load_config", str(out), "--batch", "2",
    ])
    assert len(list(res.glob("*.exr"))) == 4
    assert len(list(res.glob("*.jpg"))) == 4

    # --parallel synthesis over the 8-device mesh writes the same set
    res_p = tmp_path / "res_projector_parallel"
    test_main([
        "--ckpt", str(ckpt), "--data_root", str(laval_root),
        "--out_dir", str(res_p), "--load_config", str(out), "--batch", "2",
        "--parallel",
    ])
    assert sorted(p.name for p in res_p.glob("*.exr")) == sorted(
        p.name for p in res.glob("*.exr")
    )

    # projector-stage quality eval (the reference's test.py computes nothing):
    # one JSON line of generated-env RMSE / si-RMSE / angular errors
    from emlight_tpu.cli.eval_projector import main as evalp_main

    ev = tmp_path / "proj_metrics.json"
    evalp_main([
        "--ckpt", str(ckpt), "--data_root", str(laval_root),
        "--load_config", str(out), "--batch", "2", "--out", str(ev),
    ])
    m = json.loads(ev.read_text())
    assert m["n_samples"] == 4
    for k in ("env_rmse", "env_sirmse", "angular_err_mean_dir_deg",
              "angular_err_peak_vs_gt_anchor_deg"):
        assert np.isfinite(m[k]["mean"]), (k, m[k])
    assert m["angular_err_mean_dir_deg"]["mean"] <= 180.0
    assert m["env_sirmse"]["mean"] <= m["env_rmse"]["mean"] + 1e-6


def test_train_projector_cli_parallel(tmp_path):
    """--parallel on the virtual 8-device mesh (synthetic data)."""
    from emlight_tpu.cli.train_projector import main as train_main

    out = tmp_path / "gan_par"
    train_main([
        "--synthetic", "8", "--out_dir", str(out), "--parallel",
        "--batch_size", "8", "--ngf", "4", "--ndf", "4",
        "--crop_size", "64", "--anchors", "16",
        "--display_every", "0", "--save_every", "0", "--epochs", "1",
    ])
    assert (out / "checkpoints" / "latest.msgpack").exists()
    assert (out / "metrics.csv").exists()


def test_needlets_gt_cli(laval_root, tmp_path):
    from emlight_tpu.cli.needlets_gt import main

    out = tmp_path / "needlets"
    main([
        "--hdr_dir", str(laval_root / "warped"), "--out_dir", str(out),
        "--jmax", "2", "--batch", "2", "--check",
    ])
    files = [f for f in os.listdir(out) if f.endswith(".npy")]
    assert len(files) == 4
    c = np.load(out / files[0])
    assert c.shape == (253, 3)
    # sparsified: many j2 coefficients zeroed
    assert (np.abs(c[61:253]).sum(axis=1) == 0).mean() > 0.5


def test_preview_cli(laval_root, tmp_path):
    from emlight_tpu.cli.preview import main

    out = tmp_path / "previews"
    main(["--hdr_dir", str(laval_root / "warped"), "--out_dir", str(out)])
    assert len(list(out.glob("*.jpg"))) == 4


def test_eval_metrics_cli(laval_root, tmp_path):
    """Self-consistency: evaluating a checkpoint against GT pickles built from
    its OWN predictions (alpha-unscaled so the dataset's scaling reproduces
    them exactly) must report ~zero errors everywhere."""
    import json

    import jax

    from emlight_tpu.cli.eval_metrics import main as eval_main
    from emlight_tpu.config import AnchorConfig, RegressionConfig
    from emlight_tpu.core.hdr import TONEMAP_INPUT, read_hdr, resize_panorama
    from emlight_tpu.train import checkpoint as ckpt_mod
    from emlight_tpu.train import regression as R

    import dataclasses

    cfg = dataclasses.replace(
        RegressionConfig(),
        anchors=AnchorConfig(regression_anchors=96),
        crop_h=64, crop_w=64, block_config=(2,),
    )
    state = R.create_state(jax.random.PRNGKey(0), cfg)
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    ckpt_mod.save_checkpoint(str(ckpt_dir), state, "latest")
    ckpt = ckpt_dir / "latest.msgpack"

    # predictions on the dataset's crops, through the SAME tonemap+resize
    root = tmp_path / "selfdata"
    (root / "crop").mkdir(parents=True)
    (root / "pkl").mkdir()
    apply_fn = R.make_eval_apply(cfg)
    import shutil

    import jax.numpy as jnp
    for i in range(3):
        src = laval_root / "crop" / f"s{i}.exr"
        shutil.copy(src, root / "crop" / f"s{i}.exr")
        img = read_hdr(str(src))
        toned, alpha = TONEMAP_INPUT(img)
        toned = resize_panorama(toned, (64, 64))
        pred = R.predict(apply_fn, state.params, state.batch_stats,
                         jnp.asarray(toned[None]))
        # invert the dataset's alpha plumbing (RegressionNetwork/data.py:71-73)
        para = {
            "distribution": np.asarray(pred["distribution"][0]),
            "intensity": float(pred["intensity"][0, 0]) * 500.0 / alpha,
            "rgb_ratio": np.asarray(pred["rgb_ratio"][0]),
            "ambient": np.asarray(pred["ambient"][0]) * (128 * 256) / alpha,
        }
        with open(root / "pkl" / f"s{i}.pickle", "wb") as f:
            pickle.dump(para, f)

    out_json = tmp_path / "metrics.json"
    eval_main([
        "--ckpt", str(ckpt), "--data_root", str(root), "--out", str(out_json),
        "--anchors", "96", "--block_config", "2", "--crop", "64,64",
        "--batch", "2",
    ])
    m = json.loads(out_json.read_text())
    assert m["n_samples"] == 3
    for k in ("dist_rmse", "env_rmse", "env_sirmse", "angular_err_deg",
              "angular_err_mean_dir_deg", "intensity_rel_err"):
        assert m[k]["mean"] < 1e-2, (k, m[k])
    assert m["angular_err_deg"]["mean"] == 0.0
