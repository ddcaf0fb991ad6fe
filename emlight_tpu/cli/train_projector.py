"""GenProjector adversarial training CLI (replaces GenProjector/train.py +
model_trainer.py + train_laval.sh).

TTUR hinge GAN with mask-weighted feature matching and optional VGG
perceptual loss (weights via --vgg_npz / $EMLIGHT_VGG19_NPZ); alternating
G/D steps with --d_steps_per_g cadence (train.py:29-37); periodic tonemapped
image dumps and full-state checkpointing; optional data parallelism.

Usage:
  python -m emlight_tpu.cli.train_projector --data_root /data/LavalIndoor \
      --out_dir runs/projector [--epochs 200] [--parallel]
  python -m emlight_tpu.cli.train_projector --synthetic 64 --epochs 2 --ngf 8 ...
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--out_dir", default="runs/projector")
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--ngf", type=int, default=64)
    ap.add_argument("--ndf", type=int, default=64)
    ap.add_argument("--crop_size", type=int, default=256, help="2x env height")
    ap.add_argument("--anchors", type=int, default=128)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--gan_mode", default="hinge", choices=("hinge", "ls", "original", "w"))
    ap.add_argument("--d_steps_per_g", type=int, default=1)
    ap.add_argument("--dtype", default="float32", choices=("float32", "bfloat16"),
                    help="bfloat16: conv compute in bf16 (f32 accumulation/params)")
    ap.add_argument("--vgg_npz", default=None)
    ap.add_argument("--vgg_random", action="store_true",
                    help="enable the VGG x5 perceptual term with random-init "
                         "weights when no pretrained npz exists (full "
                         "reference loss graph/cost; random-feature L1 is a "
                         "weaker perceptual proxy than pretrained)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--parallel", action="store_true")
    ap.add_argument("--display_every", type=int, default=100)
    ap.add_argument("--save_every", type=int, default=500)
    ap.add_argument("--clip_grad_norm", type=float, default=0.0,
                    help="global-norm gradient clip for G and D; 0 = off "
                         "(reference parity — but the unclipped recipe can NaN "
                         "on harsh lights). Keep consistent across train/resume")
    ap.add_argument("--fused", action="store_true",
                    help="fused G+D step sharing one generator forward (~1.26x "
                         "per iteration; Jacobi updates instead of the "
                         "reference's alternating ones; needs d_steps_per_g=1; "
                         "composes with --parallel)")
    ap.add_argument("--scan_steps", type=int, default=0,
                    help="run N fused G+D iterations per device dispatch under "
                         "lax.scan (measured 3.1x wall-clock on 120 full-size "
                         "iters vs alternating); implies the fused step's "
                         "Jacobi updates; needs d_steps_per_g=1, single-chip")
    ap.add_argument("--load_config", default=None,
                    help="opt.json (or run dir) whose flags become defaults; "
                         "--resume picks up {out_dir}/opt.json automatically")

    from ..train.config_io import apply_saved_defaults, report_overrides, save_run_config

    saved = apply_saved_defaults(ap, argv)
    args = ap.parse_args(argv)
    report_overrides(saved, args)
    save_run_config(args.out_dir, args)

    import jax

    from ..config import AnchorConfig, ProjectorConfig
    from ..core.hdr import TONEMAP_VIZ
    from ..nn.vgg import VGG19Features, load_vgg19_params
    from ..train import checkpoint as ckpt
    from ..train import projector as P
    from ..train.data import (
        ProjectorDataset,
        batched,
        device_prefetch,
        prefetch,
        synthetic_projector_batch,
    )
    from ..train.loop import IterationTimer, MetricsLogger, NaNGuard

    env_h, env_w = args.crop_size // 2, args.crop_size
    cfg = dataclasses.replace(
        ProjectorConfig(),
        crop_size=args.crop_size, ngf=args.ngf, ndf=args.ndf,
        batch_size=args.batch_size, lr=args.lr, gan_mode=args.gan_mode,
        d_steps_per_g=args.d_steps_per_g, dtype=args.dtype,
        clip_grad_norm=args.clip_grad_norm,
        anchors=AnchorConfig(n_anchors=args.anchors, env_h=env_h, env_w=env_w),
    )

    vgg_variables = load_vgg19_params(args.vgg_npz)
    vgg_apply = None
    if vgg_variables is not None:
        vgg_apply = VGG19Features().apply
        print("VGG19 perceptual loss enabled (pretrained npz)")
    elif args.vgg_random:
        from ..nn.vgg import random_vgg19_params

        vgg_variables = random_vgg19_params()
        vgg_apply = VGG19Features().apply
        print("VGG19 perceptual loss enabled (random-init weights)")
    else:
        print("VGG19 weights unavailable -> perceptual term disabled (see nn/vgg.py)")

    if args.synthetic:
        steps_per_epoch = max(args.synthetic // args.batch_size, 1)
    else:
        assert args.data_root, "--data_root or --synthetic required"
        ds = ProjectorDataset(args.data_root, crop_size=args.crop_size // 2)
        print(f"dataset: {len(ds)} samples")
        steps_per_epoch = max(len(ds) // args.batch_size, 1)

    if args.parallel:
        from ..dist import (
            make_mesh, make_parallel_fused_step, make_parallel_projector_steps,
            replicate,
        )
        from ..dist.mesh import DATA_AXIS

        mesh = make_mesh()
        state = P.create_state(jax.random.PRNGKey(0), cfg, axis_name=DATA_AXIS,
                               steps_per_epoch=steps_per_epoch)
        g_step, d_step = make_parallel_projector_steps(
            cfg, mesh, vgg_apply, vgg_variables,
            use_pallas=jax.default_backend() == "tpu",
        )
        g_fn = lambda s, b: g_step(s, b)
        d_fn = lambda s, b: d_step(s, b)
        fused_fn = make_parallel_fused_step(
            cfg, mesh, vgg_apply, vgg_variables,
            use_pallas=jax.default_backend() == "tpu",
        )
    else:
        mesh = None
        state = P.create_state(jax.random.PRNGKey(0), cfg, steps_per_epoch=steps_per_epoch)
        use_pallas = jax.default_backend() == "tpu"
        g_fn = lambda s, b: P.generator_step(s, b, cfg, vgg_apply, vgg_variables, use_pallas)
        d_fn = lambda s, b: P.discriminator_step(s, b, cfg, use_pallas)
        fused_fn = lambda s, b: P.fused_gan_step(s, b, cfg, vgg_apply, vgg_variables, use_pallas)

    if (args.fused or args.scan_steps > 1) and cfg.d_steps_per_g != 1:
        raise SystemExit("--fused/--scan_steps require d_steps_per_g=1 (the "
                         "fused step takes one G and one D update per iteration)")
    if args.scan_steps > 1 and args.parallel:
        raise SystemExit("--scan_steps runs single-chip; drop --parallel "
                         "(or use --fused, which composes with it)")

    ckpt_dir = os.path.join(args.out_dir, "checkpoints")
    if args.resume and ckpt.latest_checkpoint(ckpt_dir):
        state = ckpt.restore_checkpoint(ckpt.latest_checkpoint(ckpt_dir), state)
        print(f"restored checkpoint at step {int(state.step)}")
    if args.parallel:
        state = replicate(state, mesh)

    if args.synthetic:
        def gen():
            rng = np.random.default_rng(0)
            while True:
                for _ in range(steps_per_epoch):
                    b = synthetic_projector_batch(
                        args.batch_size, args.anchors, args.crop_size // 2,
                        (env_h, env_w), seed=int(rng.integers(1 << 31)),
                    )
                    yield {k: v for k, v in b.items() if not isinstance(v, list)}
        batches = gen()
    else:
        batches = prefetch(batched(ds, args.batch_size, epochs=args.epochs), depth=4)

    logger = MetricsLogger(args.out_dir)
    timer = IterationTimer(args.out_dir, args.batch_size).resume()
    guard = NaNGuard()
    total_steps = args.epochs * steps_per_epoch

    if args.parallel:
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
    else:
        sharding = None

    if args.scan_steps > 1:
        _run_scanned(args, cfg, state, batches, total_steps, timer, logger, guard,
                     ckpt, ckpt_dir, vgg_apply, vgg_variables)
        return

    for jb, _rest in device_prefetch(batches, sharding):
        if timer.step >= total_steps:
            break
        with timer:
            if args.fused:
                state, metrics, fake = fused_fn(state, jb)
            else:
                metrics = {}
                # G every d_steps_per_g iterations, D every iteration (train.py:29-37)
                if timer.step % cfg.d_steps_per_g == 0:
                    state, g_metrics, fake = g_fn(state, jb)
                    metrics.update(g_metrics)
                state, d_metrics = d_fn(state, jb)
                metrics.update(d_metrics)
        guard.check(timer.step, metrics)
        logger.log(timer.step, metrics, timer.stats())

        if args.display_every and timer.step % args.display_every == 0 and "loss_G" in metrics:
            from PIL import Image

            f = np.asarray(fake[0])
            r = np.asarray(jb["warped"][0])
            tone_f, _ = TONEMAP_VIZ(f)
            tone_r, _ = TONEMAP_VIZ(r)
            img = np.hstack([tone_r, tone_f])
            os.makedirs(os.path.join(args.out_dir, "web"), exist_ok=True)
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(args.out_dir, "web", f"{timer.step}.jpg")
            )
        if args.save_every and timer.step % args.save_every == 0:
            ckpt.save_checkpoint(ckpt_dir, state, "latest")
            timer.record()

    ckpt.save_checkpoint(ckpt_dir, state, "latest")
    timer.record()
    print(f"done at step {timer.step}; stats {timer.stats()}")


def _run_scanned(args, cfg, state, batches, total_steps, timer, logger, guard,
                 ckpt, ckpt_dir, vgg_apply, vgg_variables):
    """--scan_steps N loop: chunk the host batch stream, stack each chunk on a
    leading scan axis, run one scanned_fused_steps dispatch per chunk, then
    unpack the stacked metrics into per-step log rows. Display/save cadence is
    honored at chunk boundaries (a boundary crossed inside a chunk fires once
    after it)."""
    import itertools
    import time

    import jax

    from ..core.hdr import TONEMAP_VIZ
    from ..train import projector as P

    use_pallas = jax.default_backend() == "tpu"
    it = iter(batches)
    n = args.scan_steps
    while timer.step < total_steps:
        chunk = list(itertools.islice(it, min(n, total_steps - timer.step)))
        if not chunk:
            break
        base = timer.step
        t0 = time.perf_counter()
        if len(chunk) < n:
            # ragged tail: a shorter lax.scan is a different program shape and
            # would recompile the whole scanned fused step (~200 s generator
            # compile, BASELINE.md) for a few steps — run the remainder
            # through the per-step fused path instead (smaller program, and
            # the one every non-scanned run already compiles)
            rows = []
            for c in chunk:
                jb = {k: v for k, v in c.items() if not isinstance(v, list)}
                state, row, fake = P.fused_gan_step(
                    state, jb, cfg, vgg_apply, vgg_variables, use_pallas
                )
                rows.append(row)
            metrics = {
                k: np.stack([np.asarray(r[k]) for r in rows]) for k in rows[0]
            }
        else:
            stacked = {
                k: np.stack([np.asarray(c[k]) for c in chunk])
                for k in chunk[0]
                if not isinstance(chunk[0][k], list)
            }
            state, metrics, fake = P.scanned_fused_steps(
                state, stacked, cfg, vgg_apply, vgg_variables, use_pallas
            )
            metrics = {k: np.asarray(v) for k, v in metrics.items()}
        timer.add(len(chunk), time.perf_counter() - t0)
        for i in range(len(chunk)):
            row = {k: v[i] for k, v in metrics.items()}
            guard.check(base + i + 1, row)
            logger.log(base + i + 1, row, timer.stats())

        crossed = lambda every: every and (timer.step // every) > (base // every)
        if crossed(args.display_every):
            from PIL import Image

            tone_f, _ = TONEMAP_VIZ(np.asarray(fake[0]))
            tone_r, _ = TONEMAP_VIZ(np.asarray(chunk[-1]["warped"][0]))
            os.makedirs(os.path.join(args.out_dir, "web"), exist_ok=True)
            Image.fromarray(
                (np.hstack([tone_r, tone_f]) * 255).astype(np.uint8)
            ).save(os.path.join(args.out_dir, "web", f"{timer.step}.jpg"))
        if crossed(args.save_every):
            ckpt.save_checkpoint(ckpt_dir, state, "latest")
            timer.record()

    ckpt.save_checkpoint(ckpt_dir, state, "latest")
    timer.record()
    print(f"done at step {timer.step}; stats {timer.stats()}")


if __name__ == "__main__":
    main()
