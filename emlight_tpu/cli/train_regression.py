"""Regression training CLI (replaces RegressionNetwork/train.py + run.sh).

Trains the DenseNet anchor regressor with the reference's loss recipe
(Sinkhorn EMD x1000 + L2 terms, Adam 1e-4, bs 16 — train.py:55-98), with
checkpoint/resume (full optimizer state), CSV metrics, NaN guard, periodic
summary renders, and optional multi-device data parallelism.

Usage:
  python -m emlight_tpu.cli.train_regression --data_root /data/LavalIndoor \
      --out_dir runs/regression [--epochs 500] [--parallel]
  python -m emlight_tpu.cli.train_regression --synthetic 128 --epochs 2 ...
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_root", default=None, help="Laval layout: {root}/pkl + {root}/crop")
    ap.add_argument("--synthetic", type=int, default=0, help="train on N synthetic samples")
    ap.add_argument("--out_dir", default="runs/regression")
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--anchors", type=int, default=96)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--parallel", action="store_true", help="data-parallel over all devices")
    ap.add_argument("--summary_every", type=int, default=100)
    ap.add_argument("--save_every", type=int, default=500)
    ap.add_argument("--sinkhorn_backend", choices=("auto", "jnp"), default="auto",
                    help="XLA scanned loop (a fused Pallas loop was tried and "
                         "removed: slower at every measured shape)")
    ap.add_argument("--profile_dir", default=None)
    ap.add_argument("--block_config", default="16,16,16",
                    help="DenseNet blocks, e.g. '2,2' for smoke runs")
    ap.add_argument("--crop", default="192,256", help="input H,W")
    ap.add_argument("--dtype", default="float32", choices=("float32", "bfloat16"))
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize dense layers; with --dtype bfloat16 "
                         "enables full-size bs16 training on one 16GB chip")
    ap.add_argument("--clip_grad_norm", type=float, default=0.0,
                    help="global-norm gradient clip; 0 = off (reference parity). "
                         "Changes optimizer-state structure — keep consistent "
                         "across train/resume")
    ap.add_argument("--log_grad_norms", action="store_true",
                    help="log per-head + global gradient norms (the "
                         "reference's check_grad probes as metrics)")
    ap.add_argument("--load_config", default=None,
                    help="opt.json (or run dir) whose flags become defaults; "
                         "--resume picks up {out_dir}/opt.json automatically")

    from ..train.config_io import apply_saved_defaults, report_overrides, save_run_config

    saved = apply_saved_defaults(ap, argv)
    args = ap.parse_args(argv)
    report_overrides(saved, args)
    save_run_config(args.out_dir, args)

    import jax

    from ..config import AnchorConfig, RegressionConfig, SinkhornConfig
    from ..train import checkpoint as ckpt
    from ..train import regression as R
    from ..train.data import (
        RegressionDataset,
        batched,
        device_prefetch,
        prefetch,
        synthetic_regression_batch,
    )
    from ..train.loop import IterationTimer, MetricsLogger, NaNGuard, profile_trace, render_summary

    crop_h, crop_w = (int(x) for x in args.crop.split(","))
    cfg = dataclasses.replace(
        RegressionConfig(),
        anchors=AnchorConfig(regression_anchors=args.anchors),
        sinkhorn=SinkhornConfig(backend=args.sinkhorn_backend),
        batch_size=args.batch_size,
        lr=args.lr,
        crop_h=crop_h,
        crop_w=crop_w,
        block_config=tuple(int(x) for x in args.block_config.split(",")),
        dtype=args.dtype,
        remat=args.remat,
        clip_grad_norm=args.clip_grad_norm,
        log_grad_norms=args.log_grad_norms,
    )

    if args.parallel:
        from ..dist import make_mesh, make_parallel_regression_step, replicate
        from ..dist.mesh import DATA_AXIS

        mesh = make_mesh()
        state = R.create_state(jax.random.PRNGKey(0), cfg, axis_name=DATA_AXIS)
        step_fn = make_parallel_regression_step(cfg, mesh)
    else:
        mesh = None
        state = R.create_state(jax.random.PRNGKey(0), cfg)
        step_fn = lambda s, b: R.train_step(s, b, cfg)

    ckpt_dir = os.path.join(args.out_dir, "checkpoints")
    if args.resume and ckpt.latest_checkpoint(ckpt_dir):
        state = ckpt.restore_checkpoint(ckpt.latest_checkpoint(ckpt_dir), state)
        print(f"restored checkpoint at step {int(state.step)}")
    if args.parallel:
        state = replicate(state, mesh)

    if args.synthetic:
        def epochs():
            rng = np.random.default_rng(0)
            while True:
                for s in range(args.synthetic // args.batch_size):
                    yield synthetic_regression_batch(
                        args.batch_size, args.anchors, (cfg.crop_h, cfg.crop_w),
                        seed=int(rng.integers(1 << 31)),
                    )
        batches = epochs()
        steps_per_epoch = max(args.synthetic // args.batch_size, 1)
    else:
        assert args.data_root, "--data_root or --synthetic required"
        ds = RegressionDataset(args.data_root, crop_hw=(cfg.crop_h, cfg.crop_w))
        print(f"dataset: {len(ds)} pairs")
        batches = prefetch(batched(ds, args.batch_size, epochs=args.epochs), depth=4)
        steps_per_epoch = len(ds) // args.batch_size

    logger = MetricsLogger(args.out_dir)
    timer = IterationTimer(args.out_dir, args.batch_size).resume()
    guard = NaNGuard()
    total_steps = args.epochs * steps_per_epoch

    if args.parallel:
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
    else:
        sharding = None

    with profile_trace(args.profile_dir):
        # device_prefetch overlaps the host->device transfer of batch i+1
        # with the step on batch i
        for jb, _rest in device_prefetch(batches, sharding):
            if timer.step >= total_steps:
                break
            with timer:
                state, metrics = step_fn(state, jb)
            guard.check(timer.step, metrics)
            logger.log(timer.step, metrics, timer.stats())

            if args.summary_every and timer.step % args.summary_every == 0:
                _, pred = R.eval_step(state, jb, cfg) if not args.parallel else (None, None)
                if pred is not None:
                    render_summary(
                        np.asarray(jb["crop"][0]), np.asarray(pred["distribution"][0]),
                        np.asarray(jb["distribution"][0]), float(pred["intensity"][0, 0]),
                        float(jb["intensity"][0]), np.asarray(pred["rgb_ratio"][0]),
                        np.asarray(jb["rgb_ratio"][0]), cfg.anchors.regression_anchors,
                        os.path.join(args.out_dir, "summary", f"{timer.step}.jpg"),
                        intensity_scale=cfg.anchors.intensity_scale,
                    )
            if args.save_every and timer.step % args.save_every == 0:
                ckpt.save_checkpoint(ckpt_dir, state, "latest")
                timer.record()

    ckpt.save_checkpoint(ckpt_dir, state, "latest")
    epoch_tag = timer.step // max(steps_per_epoch, 1)
    ckpt.save_checkpoint(ckpt_dir, state, f"{epoch_tag}_net")
    timer.record()
    print(f"done at step {timer.step}; stats {timer.stats()}")


if __name__ == "__main__":
    main()
