"""Full-size GSPMD dp x tp capability check.

Compiles and executes ONE fused G+D training step at the flagship
configuration (crop_size 256 -> 128x256 env maps, ngf=ndf=64, the
train_laval.sh architecture) under tensor + data parallelism on a virtual
8-device CPU mesh, and reports compile time, step time, and the losses.

This turns `dist/auto.py` from a toy-shape seam into a demonstrated
capability: the SAME step math the single-chip trainers run, partitioned by
GSPMD over a Mesh((data, model)) with channel-sharded kernels, compiles and
produces finite losses at full size. (Multi-chip TPU hardware is not
available in this image; the virtual CPU mesh proves partitioning
correctness, not speed — the printed step time is a CPU number.)

    python -m emlight_tpu.dist.fullsize_check            # spawns sanitized child
    python -m emlight_tpu.dist.fullsize_check --json out.json

Reference scale ceiling this replaces: 2-GPU DataParallel
(GenProjector/train_laval.sh:8, model_trainer.py:20-24).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import subprocess
import sys
import time


def run_child(n_devices: int = 8, tp: int = 2, batch: int = 8,
              crop_size: int = 256, ngf: int = 64) -> dict:
    """Build the full-size fused step on the virtual mesh; return metrics."""
    import jax
    import jax.numpy as jnp

    from ..config import AnchorConfig, ProjectorConfig
    from ..dist import auto_shard_batch, auto_shard_state, make_auto_projector_steps
    from ..dist.mesh import make_mesh
    from ..train import projector as P
    from ..train.data import synthetic_projector_batch

    mesh = make_mesh(n_devices, model_parallel=tp)
    cfg = dataclasses.replace(
        ProjectorConfig(),
        crop_size=crop_size, ngf=ngf, ndf=ngf, batch_size=batch,
        anchors=AnchorConfig(n_anchors=128, env_h=crop_size // 2, env_w=crop_size),
        use_vgg_loss=False,
    )
    t0 = time.monotonic()
    state = auto_shard_state(P.create_state(jax.random.PRNGKey(0), cfg), mesh)
    init_s = time.monotonic() - t0

    _, _, fused = make_auto_projector_steps(cfg, mesh)
    batch_np = synthetic_projector_batch(
        batch, n_anchors=128, crop_size=crop_size // 2,
        env_hw=(crop_size // 2, crop_size),
    )
    sharded = auto_shard_batch(
        {k: jnp.asarray(v) for k, v in batch_np.items() if not isinstance(v, list)},
        mesh,
    )

    t0 = time.monotonic()
    compiled = fused.lower(state, sharded).compile()
    compile_s = time.monotonic() - t0

    t0 = time.monotonic()
    _, metrics, _ = compiled(state, sharded)
    loss_g = float(metrics["loss_G"])
    loss_d = float(metrics["loss_D"])
    step_s = time.monotonic() - t0

    assert jnp.isfinite(loss_g) and jnp.isfinite(loss_d), metrics
    return {
        "mesh": f"dp{n_devices // tp} x tp{tp}",
        "platform": jax.devices()[0].platform,
        "crop_size": crop_size,
        "ngf": ngf,
        "batch": batch,
        "init_s": round(init_s, 1),
        "compile_s": round(compile_s, 1),
        "step_s": round(step_s, 1),
        "loss_G": round(loss_g, 4),
        "loss_D": round(loss_d, 4),
    }


def run(n_devices: int = 8, tp: int = 2, timeout: int = 1800, **kw) -> dict:
    """Spawn the check in a sanitized CPU child (same trick as the dryrun:
    drop the axon PYTHONPATH hook, force n virtual CPU devices)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags + [
        f"--xla_force_host_platform_device_count={n_devices}",
        # the timeouts must exceed the WHOLE step (755 s measured on the
        # 1-vCPU host): the 8 virtual device threads time-share one core, so
        # a thread can legitimately take most of the step's wall time to
        # reach a collective the others are already parked at — 600 s aborted
        # the run mid-step twice in round 5
        "--xla_cpu_collective_call_terminate_timeout_seconds=1500",
        "--xla_cpu_collective_timeout_seconds=1500",
    ])
    env["EMLIGHT_FULLSIZE_CHILD"] = "1"
    cmd = [sys.executable, "-m", "emlight_tpu.dist.fullsize_check",
           "--devices", str(n_devices), "--tp", str(tp)]
    for k, v in kw.items():
        cmd += [f"--{k}", str(v)]
    # one bounded retry: XLA:CPU's collectives rendezvous intermittently
    # aborts the child mid-execution on small/contended hosts (the dryrun and
    # tests/conftest.py carry the same insurance); the retry reruns against
    # the warm persistent compile cache
    last = None
    for _ in range(2):
        proc = subprocess.run(
            cmd, env=env, capture_output=True, text=True, timeout=timeout,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        )
        if proc.returncode == 0:
            return json.loads(proc.stdout.strip().splitlines()[-1])
        last = proc
    raise RuntimeError(
        f"fullsize_check child failed rc={last.returncode}:\n{last.stderr[-3000:]}"
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--crop_size", type=int, default=256)
    ap.add_argument("--ngf", type=int, default=64)
    ap.add_argument("--json", default=None, help="also write the result here")
    args = ap.parse_args(argv)
    if os.environ.get("EMLIGHT_FULLSIZE_CHILD") == "1":
        result = run_child(args.devices, args.tp, args.batch, args.crop_size, args.ngf)
    else:
        result = run(args.devices, args.tp,
                     batch=args.batch, crop_size=args.crop_size, ngf=args.ngf)
    print(json.dumps(result))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
