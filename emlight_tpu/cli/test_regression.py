"""Regression inference CLI (replaces the bit-rotted RegressionNetwork/test.py).

Loads a checkpoint (native .msgpack or an imported torch .pth), predicts
anchor parameters for every crop in --data_root/crop (or --crops dir), dumps
{distribution, intensity, rgb_ratio, ambient} pickles to --out_dir — the
exact format GenProjector's dataset consumes for end-to-end inference.

Usage:
  python -m emlight_tpu.cli.test_regression --ckpt runs/regression/checkpoints/latest.msgpack \
      --data_root /data/LavalIndoor --out_dir results/ [--render]
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help=".msgpack state or torch .pth")
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--crops", default=None, help="directory of crop .exr files")
    ap.add_argument("--out_dir", default="results")
    ap.add_argument("--anchors", type=int, default=96)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--render", action="store_true", help="also dump env-map previews")
    ap.add_argument("--parallel", action="store_true",
                    help="shard each crop batch over all devices (data-parallel "
                         "inference; ragged batches are padded)")
    ap.add_argument("--eval_apply", choices=("fast", "standard"), default="fast",
                    help="eval forward: 'fast' (default) is the concat-free "
                         "NCHW buffer forward (nn/densenet_fast.buffer_apply, "
                         "1.36x on a v5e at bs 128 bf16; same checkpoint, same "
                         "math modulo float reassociation); 'standard' is the "
                         "reference-shaped DenseNet.apply. Demoted variants "
                         "(BN folding, slab grouping) live in scripts/ — "
                         "measured slower on chip, see BASELINE.md")
    ap.add_argument("--block_config", default="16,16,16")
    ap.add_argument("--crop", default="192,256")
    ap.add_argument("--clip_grad_norm", type=float, default=0.0,
                    help="must match training (clipping changes the "
                         "checkpointed optimizer-state structure); "
                         "--load_config sets it automatically")
    ap.add_argument("--load_config", default=None,
                    help="a train run's opt.json (or run dir): model-shape "
                         "flags become defaults so the checkpoint fits")

    from ..train.config_io import apply_saved_defaults

    apply_saved_defaults(ap, argv, exclude=("out_dir",))
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config import AnchorConfig, RegressionConfig
    from ..core.hdr import TONEMAP_INPUT, TONEMAP_TEST, read_hdr, resize_panorama
    from ..representation import render_anchor_params
    from ..train import checkpoint as ckpt_mod
    from ..train import regression as R

    import dataclasses

    crop_h, crop_w = (int(x) for x in args.crop.split(","))
    cfg = dataclasses.replace(
        RegressionConfig(),
        anchors=AnchorConfig(regression_anchors=args.anchors),
        crop_h=crop_h,
        crop_w=crop_w,
        block_config=tuple(int(x) for x in args.block_config.split(",")),
        clip_grad_norm=args.clip_grad_norm,
    )
    state = R.create_state(jax.random.PRNGKey(0), cfg)
    if args.ckpt.endswith(".pth"):
        from ..train.torch_import import import_densenet_state_dict

        params, stats = import_densenet_state_dict(args.ckpt)
        state = state.replace(params=params, batch_stats=stats)
    else:
        state = ckpt_mod.restore_checkpoint(args.ckpt, state)

    apply_fn, pred_params, pred_stats = state.apply_fn, state.params, state.batch_stats
    baked_infer = None
    if args.eval_apply == "fast":
        # checkpoint is fixed for the whole run: bake the weights into the
        # compiled program (XLA folds BN affines + pre-lays-out kernels;
        # 1.5x at bs 128 on a v5e — train/regression.py::make_baked_infer)
        baked_infer = R.make_baked_infer(cfg, pred_params, pred_stats)

    crop_dir = args.crops or os.path.join(args.data_root, "crop")
    names = sorted(n for n in os.listdir(crop_dir) if n.endswith(".exr"))
    if args.limit:
        names = names[: args.limit]
    os.makedirs(args.out_dir, exist_ok=True)

    if args.parallel:
        from ..dist import make_mesh, make_parallel_predict, pad_leading, replicate, shard_batch
        from ..dist.mesh import DATA_AXIS

        mesh = make_mesh()
        n_data = mesh.shape[DATA_AXIS]
        run_parallel = make_parallel_predict(
            cfg, mesh,
            apply_fn=None if args.eval_apply == "fast" else state.apply_fn,
        )
        state = replicate(state, mesh)

    for s in range(0, len(names), args.batch):
        chunk = names[s : s + args.batch]
        crops = []
        for nm in chunk:
            img = read_hdr(os.path.join(crop_dir, nm))
            img, _ = TONEMAP_INPUT(img)
            if img.shape[:2] != (cfg.crop_h, cfg.crop_w):
                img = resize_panorama(img, (cfg.crop_w, cfg.crop_h))
            crops.append(img)
        if args.parallel:
            padded, n_real = pad_leading(np.stack(crops), n_data)
            pred = run_parallel(state, shard_batch(jnp.asarray(padded), mesh))
            pred = {k: np.asarray(v)[:n_real] for k, v in pred.items()}
        elif baked_infer is not None:
            pred = baked_infer(jnp.asarray(np.stack(crops)))
            pred = {k: np.asarray(v) for k, v in pred.items()}
        else:
            pred = R.predict(apply_fn, pred_params, pred_stats,
                             jnp.asarray(np.stack(crops)))
            pred = {k: np.asarray(v) for k, v in pred.items()}
        for i, nm in enumerate(chunk):
            para = {
                "distribution": pred["distribution"][i],
                "intensity": pred["intensity"][i, 0],
                "rgb_ratio": pred["rgb_ratio"][i],
                "ambient": pred["ambient"][i],
            }
            with open(os.path.join(args.out_dir, nm.replace(".exr", ".pickle")), "wb") as f:
                pickle.dump(para, f, protocol=pickle.HIGHEST_PROTOCOL)
            if args.render:
                from PIL import Image

                env = render_anchor_params(
                    jnp.asarray(jax.nn.softmax(pred["distribution"][i])[None]),
                    jnp.asarray([pred["intensity"][i, 0]]),
                    jnp.asarray(pred["rgb_ratio"][i][None]),
                    n=args.anchors, intensity_scale=cfg.anchors.intensity_scale,
                )
                tone, _ = TONEMAP_TEST(np.maximum(np.asarray(env)[0], 0.0))
                Image.fromarray((tone * 255).astype(np.uint8)).save(
                    os.path.join(args.out_dir, nm.replace(".exr", "_env.png"))
                )
        print(f"{min(s + args.batch, len(names))}/{len(names)}")


if __name__ == "__main__":
    main()
