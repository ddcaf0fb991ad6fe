"""Quantitative quality evaluation for a regression checkpoint.

The papers report env-map RMSE / si-RMSE and dominant-light angular error on
Laval Indoor, but the reference repo computes none of them — its test script
dumps pickles and stops (RegressionNetwork/test.py). This CLI closes that
gap: given a checkpoint and a data dir (crop/ + pkl/ GT, the training
layout), it reports

  - parameter errors: distribution RMSE, intensity relative error,
    rgb_ratio RMSE, ambient RMSE (vs the alpha-scaled training targets,
    RegressionNetwork/data.py:71-73)
  - env-map RMSE and si-RMSE (scale-invariant: pred rescaled by the optimal
    per-sample scalar before the RMSE), both on the 128x256 HDR render of
    pred vs GT parameters (the train.py:110-145 summary composition,
    intensity x500)
  - dominant-light angular error (degrees): argmax-anchor direction, and the
    energy-weighted mean-direction variant for spread distributions

Prints a table plus ONE JSON line; --out writes the JSON to a file.

Usage:
  python -m emlight_tpu.cli.eval_metrics --ckpt runs/reg/checkpoints/latest.msgpack \
      --data_root /data/LavalIndoor [--load_config runs/reg] [--limit 100]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help=".msgpack state or torch .pth")
    ap.add_argument("--data_root", required=True, help="dir with crop/ + pkl/")
    ap.add_argument("--out", default=None, help="write the JSON line here too")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--env_hw", default="128,256", help="render resolution H,W")
    ap.add_argument("--anchors", type=int, default=96)
    ap.add_argument("--block_config", default="16,16,16")
    ap.add_argument("--crop", default="192,256")
    ap.add_argument("--clip_grad_norm", type=float, default=0.0)
    ap.add_argument("--eval_apply", choices=("fast", "standard"), default="fast")
    ap.add_argument("--load_config", default=None,
                    help="a train run's opt.json (or run dir): model-shape "
                         "flags become defaults so the checkpoint fits")

    from ..train.config_io import apply_saved_defaults

    apply_saved_defaults(ap, argv, exclude=("out",))
    args = ap.parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..config import AnchorConfig, RegressionConfig
    from ..core.geometry import sphere_points
    from ..representation import render_anchor_params
    from ..train import checkpoint as ckpt_mod
    from ..train import regression as R
    from ..train.data import RegressionDataset

    crop_h, crop_w = (int(x) for x in str(args.crop).split(","))
    env_h, env_w = (int(x) for x in str(args.env_hw).split(","))
    cfg = dataclasses.replace(
        RegressionConfig(),
        anchors=AnchorConfig(regression_anchors=args.anchors),
        crop_h=crop_h,
        crop_w=crop_w,
        block_config=tuple(int(x) for x in str(args.block_config).split(",")),
        clip_grad_norm=args.clip_grad_norm,
    )
    state = R.create_state(jax.random.PRNGKey(0), cfg)
    if args.ckpt.endswith(".pth"):
        from ..train.torch_import import import_densenet_state_dict

        params, stats = import_densenet_state_dict(args.ckpt)
        state = state.replace(params=params, batch_stats=stats)
    else:
        state = ckpt_mod.restore_checkpoint(args.ckpt, state)
    apply_fn = R.make_eval_apply(cfg) if args.eval_apply == "fast" else state.apply_fn

    n = args.anchors
    dirs = jnp.asarray(sphere_points(n))  # (N, 3) unit anchors

    @jax.jit
    def batch_metrics(params, batch_stats, crop, gt):
        pred = apply_fn({"params": params, "batch_stats": batch_stats}, crop,
                        train=False)
        p_dist, g_dist = pred["distribution"], gt["distribution"]
        p_int, g_int = pred["intensity"][:, 0], gt["intensity"]
        p_rgb, g_rgb = pred["rgb_ratio"], gt["rgb_ratio"]
        p_amb, g_amb = pred["ambient"], gt["ambient"]

        # --- parameter errors
        dist_rmse = jnp.sqrt(jnp.mean((p_dist - g_dist) ** 2, axis=1))
        int_rel = jnp.abs(p_int - g_int) / jnp.maximum(jnp.abs(g_int), 1e-8)
        rgb_rmse = jnp.sqrt(jnp.mean((p_rgb - g_rgb) ** 2, axis=1))
        amb_rmse = jnp.sqrt(jnp.mean((p_amb - g_amb) ** 2, axis=1))

        # --- env-map render (train.py summary composition, intensity x500)
        render = lambda d, i, r, a: render_anchor_params(
            d, i, r, a, n=n, h=env_h, w=env_w, intensity_scale=500.0,
        )
        env_p = render(p_dist, p_int, p_rgb, p_amb)
        env_g = render(g_dist, g_int, g_rgb, g_amb)
        diff2 = jnp.mean((env_p - env_g) ** 2, axis=(1, 2, 3))
        env_rmse = jnp.sqrt(diff2)
        # si-RMSE: rescale pred by the per-sample least-squares alpha first
        num = jnp.sum(env_p * env_g, axis=(1, 2, 3))
        den = jnp.maximum(jnp.sum(env_p * env_p, axis=(1, 2, 3)), 1e-12)
        alpha = num / den
        si = env_p * alpha[:, None, None, None] - env_g
        env_sirmse = jnp.sqrt(jnp.mean(si * si, axis=(1, 2, 3)))

        # --- dominant-light angular error (degrees)
        ang = lambda a, b: jnp.degrees(
            jnp.arccos(jnp.clip(jnp.sum(a * b, axis=-1), -1.0, 1.0))
        )
        top = lambda d: dirs[jnp.argmax(d, axis=1)]
        ang_top = ang(top(p_dist), top(g_dist))

        def wmean(d):  # energy-weighted mean direction, unit-normalized
            v = (jnp.maximum(d, 0.0) + 1e-12) @ dirs
            return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

        ang_mean = ang(wmean(p_dist), wmean(g_dist))

        return {
            "dist_rmse": dist_rmse,
            "intensity_rel_err": int_rel,
            "rgb_rmse": rgb_rmse,
            "ambient_rmse": amb_rmse,
            "env_rmse": env_rmse,
            "env_sirmse": env_sirmse,
            "angular_err_deg": ang_top,
            "angular_err_mean_dir_deg": ang_mean,
        }

    ds = RegressionDataset(args.data_root, crop_hw=(crop_h, crop_w))
    count = len(ds) if not args.limit else min(args.limit, len(ds))
    if count == 0:
        raise SystemExit(f"no (crop, pkl) pairs under {args.data_root}")
    acc: dict[str, list] = {}
    for s in range(0, count, args.batch):
        items = [ds[i] for i in range(s, min(s + args.batch, count))]
        crop = jnp.asarray(np.stack([it["crop"] for it in items]))
        gt = {
            k: jnp.asarray(np.stack([it[k] for it in items]))
            for k in ("distribution", "intensity", "rgb_ratio", "ambient")
        }
        out = batch_metrics(state.params, state.batch_stats, crop, gt)
        for k, v in out.items():
            acc.setdefault(k, []).append(np.asarray(v))
        print(f"{min(s + args.batch, count)}/{count}", flush=True)

    summary = {"n_samples": count}
    print(f"\n{'metric':<28} {'mean':>10} {'median':>10} {'p90':>10}")
    for k, chunks in acc.items():
        v = np.concatenate(chunks)
        summary[k] = {
            "mean": float(v.mean()),
            "median": float(np.median(v)),
            "p90": float(np.percentile(v, 90)),
        }
        print(f"{k:<28} {v.mean():>10.4f} {np.median(v):>10.4f} "
              f"{np.percentile(v, 90):>10.4f}")
    line = json.dumps(summary)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
