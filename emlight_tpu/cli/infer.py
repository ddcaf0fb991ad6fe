"""End-to-end lighting estimation: crop .exr -> full HDR environment map.

A single entry point that runs both stages in one jitted device program —
DenseNet anchor regression, on-device Gaussian-splat rasterization of the
predicted guide, and SPADE generator synthesis. The reference requires
chaining RegressionNetwork/test.py's predicted pickles through GenProjector's
dataset into GenProjector/test.py by hand (and composes their scale
conventions incorrectly when you do; see train/pipeline.py for the
alpha-cancellation derivation this CLI uses instead).

Usage:
  python -m emlight_tpu.cli.infer \
      --reg_ckpt runs/regression/checkpoints/latest.msgpack \
      --proj_ckpt runs/projector/checkpoints/latest.msgpack \
      --reg_config runs/regression --proj_config runs/projector \
      --data_root /data/LavalIndoor --out_dir results_e2e [--parallel]

Model-shape flags default from the two training runs' opt.json snapshots
(--reg_config / --proj_config) so the checkpoints always fit their templates.
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def _apply_snapshot_defaults(ap: argparse.ArgumentParser, argv):
    """Install each train run's saved config as defaults for its stage's flags."""
    from ..train.config_io import load_run_config

    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--reg_config", default=None)
    pre.add_argument("--proj_config", default=None)
    known, _ = pre.parse_known_args(argv)
    if known.reg_config:
        saved = load_run_config(known.reg_config)
        ap.set_defaults(**{
            k: saved[k]
            for k in ("anchors", "block_config", "crop")
            if k in saved
        })
        if "clip_grad_norm" in saved:
            ap.set_defaults(reg_clip_grad_norm=saved["clip_grad_norm"])
        print(f"regression config loaded from {known.reg_config}")
    if known.proj_config:
        saved = load_run_config(known.proj_config)
        ap.set_defaults(**{
            k: saved[k] for k in ("crop_size", "ngf", "ndf", "dtype") if k in saved
        })
        if "clip_grad_norm" in saved:
            ap.set_defaults(proj_clip_grad_norm=saved["clip_grad_norm"])
        print(f"projector config loaded from {known.proj_config}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reg_ckpt", required=True, help=".msgpack state or torch .pth")
    ap.add_argument("--proj_ckpt", required=True, help=".msgpack projector state")
    ap.add_argument("--reg_config", default=None,
                    help="regression run's opt.json (or run dir): shape flags")
    ap.add_argument("--proj_config", default=None,
                    help="projector run's opt.json (or run dir): shape flags")
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--crops", default=None, help="directory of crop .exr files")
    ap.add_argument("--out_dir", default="results_e2e")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--save_pickles", action="store_true",
                    help="also dump the intermediate predicted anchor pickles")
    ap.add_argument("--parallel", action="store_true",
                    help="shard each batch over all devices")
    # regression stage shape (defaults overridden by --reg_config)
    ap.add_argument("--anchors", type=int, default=96)
    ap.add_argument("--block_config", default="16,16,16")
    ap.add_argument("--crop", default="192,256", help="regressor input H,W")
    ap.add_argument("--reg_clip_grad_norm", type=float, default=0.0)
    # projector stage shape (defaults overridden by --proj_config)
    ap.add_argument("--crop_size", type=int, default=256, help="2x env height")
    ap.add_argument("--ngf", type=int, default=64)
    ap.add_argument("--ndf", type=int, default=64)
    ap.add_argument("--dtype", default="float32", choices=("float32", "bfloat16"))
    ap.add_argument("--proj_clip_grad_norm", type=float, default=0.0)

    _apply_snapshot_defaults(ap, argv)
    args = ap.parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..config import AnchorConfig, ProjectorConfig, RegressionConfig
    from ..core.exr import write_exr
    from ..core.hdr import TONEMAP_INPUT, TONEMAP_VIZ, read_hdr, resize_panorama
    from ..train import checkpoint as ckpt_mod
    from ..train import projector as P
    from ..train import regression as R
    from ..train.pipeline import pipeline_inference

    crop_h, crop_w = (int(x) for x in str(args.crop).split(","))
    reg_cfg = dataclasses.replace(
        RegressionConfig(),
        anchors=AnchorConfig(regression_anchors=args.anchors),
        crop_h=crop_h,
        crop_w=crop_w,
        block_config=tuple(int(x) for x in str(args.block_config).split(",")),
        clip_grad_norm=args.reg_clip_grad_norm,
    )
    env_h, env_w = args.crop_size // 2, args.crop_size
    proj_cfg = dataclasses.replace(
        ProjectorConfig(),
        crop_size=args.crop_size, ngf=args.ngf, ndf=args.ndf, dtype=args.dtype,
        clip_grad_norm=args.proj_clip_grad_norm,
        anchors=AnchorConfig(n_anchors=args.anchors, env_h=env_h, env_w=env_w),
    )

    reg_state = R.create_state(jax.random.PRNGKey(0), reg_cfg)
    if args.reg_ckpt.endswith(".pth"):
        from ..train.torch_import import import_densenet_state_dict

        params, stats = import_densenet_state_dict(args.reg_ckpt)
        reg_state = reg_state.replace(params=params, batch_stats=stats)
    else:
        reg_state = ckpt_mod.restore_checkpoint(args.reg_ckpt, reg_state)
    proj_state = ckpt_mod.restore_checkpoint(
        args.proj_ckpt, P.create_state(jax.random.PRNGKey(1), proj_cfg)
    )

    crop_dir = args.crops or os.path.join(args.data_root, "crop")
    names = sorted(n for n in os.listdir(crop_dir) if n.endswith(".exr"))
    if args.limit:
        names = names[: args.limit]
    os.makedirs(args.out_dir, exist_ok=True)
    from PIL import Image

    use_pallas = jax.default_backend() == "tpu"
    proj_in = args.crop_size // 2
    if args.parallel:
        from ..dist import make_mesh, make_parallel_pipeline, pad_leading, replicate, shard_batch
        from ..dist.mesh import DATA_AXIS

        mesh = make_mesh()
        n_data = mesh.shape[DATA_AXIS]
        run_parallel = make_parallel_pipeline(reg_cfg, proj_cfg, mesh, use_pallas=use_pallas)
        reg_state = replicate(reg_state, mesh)
        proj_state = replicate(proj_state, mesh)

    for s in range(0, len(names), args.batch):
        chunk = names[s : s + args.batch]
        regs, projs = [], []
        for nm in chunk:
            img = read_hdr(os.path.join(crop_dir, nm))
            img, _ = TONEMAP_INPUT(img)  # alpha cancels end-to-end (pipeline.py)
            reg_in = img
            if reg_in.shape[:2] != (crop_h, crop_w):
                reg_in = resize_panorama(img, (crop_w, crop_h))
            regs.append(reg_in)
            projs.append(resize_panorama(img, (proj_in, proj_in)))
        crop_reg, crop_proj = np.stack(regs), np.stack(projs)
        if args.parallel:
            (crop_reg, n_real), (crop_proj, _) = (
                pad_leading(crop_reg, n_data), pad_leading(crop_proj, n_data),
            )
            env, pred = run_parallel(
                reg_state, proj_state,
                shard_batch(jnp.asarray(crop_reg), mesh),
                shard_batch(jnp.asarray(crop_proj), mesh),
            )
            env = np.asarray(env)[:n_real]
            pred = {k: np.asarray(v)[:n_real] for k, v in pred.items()}
        else:
            env, pred = pipeline_inference(
                reg_state, proj_state, jnp.asarray(crop_reg), jnp.asarray(crop_proj),
                reg_cfg, proj_cfg, use_pallas=use_pallas,
            )
            env = np.asarray(env)
            pred = {k: np.asarray(v) for k, v in pred.items()}
        for i, nm in enumerate(chunk):
            stem = nm[: -len(".exr")]
            write_exr(os.path.join(args.out_dir, f"{stem}.exr"), env[i])
            tone, _ = TONEMAP_VIZ(env[i])
            Image.fromarray((tone * 255).astype(np.uint8)).save(
                os.path.join(args.out_dir, f"{stem}.jpg")
            )
            if args.save_pickles:
                para = {
                    "distribution": pred["distribution"][i],
                    "intensity": pred["intensity"][i, 0],
                    "rgb_ratio": pred["rgb_ratio"][i],
                    "ambient": pred["ambient"][i],
                }
                with open(os.path.join(args.out_dir, f"{stem}.pickle"), "wb") as f:
                    pickle.dump(para, f, protocol=pickle.HIGHEST_PROTOCOL)
        print(f"{min(s + args.batch, len(names))}/{len(names)}")


if __name__ == "__main__":
    main()
