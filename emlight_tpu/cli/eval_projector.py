"""Quantitative quality evaluation for a GenProjector checkpoint.

The papers report generated-environment RMSE / si-RMSE on Laval Indoor, but
the reference's test script dumps images and computes nothing
(GenProjector/test.py:17-40). This CLI closes that gap: given a projector
checkpoint and a data dir (pkl/ + warped/ + crop/, the training layout), it
synthesizes the environment map for every sample and reports, vs the GT
warped panorama:

  - env RMSE and si-RMSE (scale-invariant: generated env rescaled by the
    per-sample least-squares scalar first), in the alpha-scaled HDR domain
    the GAN trains in (train/data.py ProjectorDataset)
  - luminance-weighted mean-direction angular error (degrees) between the
    generated and GT envs (solid-angle weighted — equirect rows near the
    poles cover less sphere)
  - dominant-light angular error vs the GT ANCHOR distribution where GT
    pickles carry it: brightest-anchor direction vs the generated env's
    peak-luminance direction

Prints a table plus ONE JSON line; --out writes the JSON to a file.

Usage:
  python -m emlight_tpu.cli.eval_projector --ckpt runs/proj/checkpoints/latest.msgpack \
      --data_root /data/LavalIndoor --load_config runs/proj [--limit 100]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help=".msgpack projector state")
    ap.add_argument("--data_root", required=True, help="dir with pkl/ + warped/ + crop/")
    ap.add_argument("--out", default=None, help="write the JSON line here too")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--crop_size", type=int, default=256)
    ap.add_argument("--ngf", type=int, default=64)
    ap.add_argument("--ndf", type=int, default=64,
                    help="must match training (the checkpoint holds D too)")
    ap.add_argument("--anchors", type=int, default=128)
    ap.add_argument("--dtype", default="float32", choices=("float32", "bfloat16"))
    ap.add_argument("--clip_grad_norm", type=float, default=0.0)
    ap.add_argument("--load_config", default=None,
                    help="the train run's opt.json (or run dir): model-shape "
                         "flags become defaults so the checkpoint fits")

    from ..train.config_io import apply_saved_defaults

    apply_saved_defaults(ap, argv, exclude=("out",))
    args = ap.parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..config import AnchorConfig, ProjectorConfig
    from ..core.geometry import equirect_xyz_splat, sphere_points, steradian_map
    from ..train import checkpoint as ckpt_mod
    from ..train import projector as P
    from ..train.data import ProjectorDataset

    env_h, env_w = args.crop_size // 2, args.crop_size
    cfg = dataclasses.replace(
        ProjectorConfig(),
        crop_size=args.crop_size, ngf=args.ngf, ndf=args.ndf, dtype=args.dtype,
        clip_grad_norm=args.clip_grad_norm,
        anchors=AnchorConfig(n_anchors=args.anchors, env_h=env_h, env_w=env_w),
    )
    state = P.create_state(jax.random.PRNGKey(0), cfg)
    state = ckpt_mod.restore_checkpoint(args.ckpt, state)
    use_pallas = jax.default_backend() == "tpu"

    pix_dirs = jnp.asarray(equirect_xyz_splat(env_h, env_w))          # (H, W, 3)
    pix_sr = jnp.asarray(steradian_map(env_h, env_w, multiply=False))  # (H, W)
    anchor_dirs = jnp.asarray(sphere_points(args.anchors))             # (N, 3)

    @jax.jit
    def batch_metrics(state, batch):
        fake = P.inference(state, batch, cfg, use_pallas=use_pallas)
        fake = fake.astype(jnp.float32)
        gt = batch["warped"].astype(jnp.float32)

        diff2 = jnp.mean((fake - gt) ** 2, axis=(1, 2, 3))
        env_rmse = jnp.sqrt(diff2)
        num = jnp.sum(fake * gt, axis=(1, 2, 3))
        den = jnp.maximum(jnp.sum(fake * fake, axis=(1, 2, 3)), 1e-12)
        alpha = num / den
        si = fake * alpha[:, None, None, None] - gt
        env_sirmse = jnp.sqrt(jnp.mean(si * si, axis=(1, 2, 3)))

        ang = lambda a, b: jnp.degrees(
            jnp.arccos(jnp.clip(jnp.sum(a * b, axis=-1), -1.0, 1.0))
        )

        def lum(env):  # solid-angle-weighted luminance (B, H, W)
            return (0.3 * env[..., 0] + 0.59 * env[..., 1] + 0.11 * env[..., 2]) * pix_sr

        def mean_dir(env):
            w = jnp.maximum(lum(env), 0.0) + 1e-12
            v = jnp.einsum("bhw,hwc->bc", w, pix_dirs)
            return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

        ang_mean = ang(mean_dir(fake), mean_dir(gt))

        # generated peak-luminance direction vs the GT dominant anchor
        flat = lum(fake).reshape(fake.shape[0], -1)
        peak_dir = pix_dirs.reshape(-1, 3)[jnp.argmax(flat, axis=1)]
        gt_anchor = anchor_dirs[jnp.argmax(batch["distribution"], axis=1)]
        ang_peak = ang(peak_dir, gt_anchor)

        return {
            "env_rmse": env_rmse,
            "env_sirmse": env_sirmse,
            "angular_err_mean_dir_deg": ang_mean,
            "angular_err_peak_vs_gt_anchor_deg": ang_peak,
        }

    ds = ProjectorDataset(args.data_root, crop_size=args.crop_size // 2)
    count = len(ds) if not args.limit else min(args.limit, len(ds))
    if count == 0:
        raise SystemExit(f"no (pkl, warped, crop) triples under {args.data_root}")
    acc: dict[str, list] = {}
    for s in range(0, count, args.batch):
        samples = [ds[i] for i in range(s, min(s + args.batch, count))]
        batch = {
            k: jnp.asarray(np.stack([smp[k] for smp in samples]))
            for k in samples[0] if k != "name"
        }
        out = batch_metrics(state, batch)
        for k, v in out.items():
            acc.setdefault(k, []).append(np.asarray(v))
        print(f"{min(s + args.batch, count)}/{count}", flush=True)

    summary = {"n_samples": count}
    print(f"\n{'metric':<36} {'mean':>10} {'median':>10} {'p90':>10}")
    for k, chunks in acc.items():
        v = np.concatenate(chunks)
        summary[k] = {
            "mean": float(v.mean()),
            "median": float(np.median(v)),
            "p90": float(np.percentile(v, 90)),
        }
        print(f"{k:<36} {v.mean():>10.4f} {np.median(v):>10.4f} "
              f"{np.percentile(v, 90):>10.4f}")
    line = json.dumps(summary)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
