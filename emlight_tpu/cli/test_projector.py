"""GenProjector inference CLI (replaces GenProjector/test.py + test.sh).

Generates full HDR environment maps from anchor-GT pickles (or the pickles
predicted by cli.test_regression for true end-to-end inference) plus crops,
writing tonemapped .jpg + HDR .exr per sample (util.py:468-503 semantics).

Usage:
  python -m emlight_tpu.cli.test_projector --ckpt runs/projector/checkpoints/latest.msgpack \
      --data_root /data/LavalIndoor --out_dir results_projector [--limit 100]
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--out_dir", default="results_projector")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--crop_size", type=int, default=256)
    ap.add_argument("--ngf", type=int, default=64)
    ap.add_argument("--ndf", type=int, default=64,
                    help="must match training (the checkpoint holds D too)")
    ap.add_argument("--anchors", type=int, default=128)
    ap.add_argument("--dtype", default="float32", choices=("float32", "bfloat16"),
                    help="bfloat16: conv compute in bf16 (f32 accumulation)")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--parallel", action="store_true",
                    help="shard each batch over all devices (data-parallel "
                         "synthesis; ragged batches are padded)")
    ap.add_argument("--clip_grad_norm", type=float, default=0.0,
                    help="must match training (clipping changes the "
                         "checkpointed optimizer-state structure); "
                         "--load_config sets it automatically")
    ap.add_argument("--load_config", default=None,
                    help="the train run's opt.json (or run dir): model-shape "
                         "flags become defaults so the checkpoint fits")

    from ..train.config_io import apply_saved_defaults

    apply_saved_defaults(ap, argv, exclude=("out_dir",))
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config import AnchorConfig, ProjectorConfig
    from ..core.exr import write_exr
    from ..core.hdr import TONEMAP_VIZ
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

    ds = ProjectorDataset(args.data_root, crop_size=args.crop_size // 2)
    n = min(len(ds), args.limit) if args.limit else len(ds)
    os.makedirs(args.out_dir, exist_ok=True)
    from PIL import Image

    use_pallas = jax.default_backend() == "tpu"
    if args.parallel:
        from ..dist import make_mesh, make_parallel_inference, pad_leading, replicate, shard_batch
        from ..dist.mesh import DATA_AXIS

        mesh = make_mesh()
        n_data = mesh.shape[DATA_AXIS]
        run_parallel = make_parallel_inference(cfg, mesh, use_pallas=use_pallas)
        state = replicate(state, mesh)

    for s in range(0, n, args.batch):
        idx = range(s, min(s + args.batch, n))
        samples = [ds[i] for i in idx]
        batch = {
            k: np.stack([smp[k] for smp in samples])
            for k in samples[0]
            if k != "name"
        }
        if args.parallel:
            padded, n_real = pad_leading(batch, n_data)
            padded = {k: jnp.asarray(v) for k, v in padded.items()}
            fake = np.asarray(run_parallel(state, shard_batch(padded, mesh)))[:n_real]
        else:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            fake = np.asarray(P.inference(state, batch, cfg, use_pallas=use_pallas))
        for i, smp in enumerate(samples):
            nm = smp["name"]
            write_exr(os.path.join(args.out_dir, f"{nm}.exr"), fake[i])
            tone, _ = TONEMAP_VIZ(fake[i])
            Image.fromarray((tone * 255).astype(np.uint8)).save(
                os.path.join(args.out_dir, f"{nm}.jpg")
            )
        print(f"{min(s + args.batch, n)}/{n}")


if __name__ == "__main__":
    main()
