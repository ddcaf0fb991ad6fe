"""Layer-level dispatch sweep for the fused sphere-conv kernels (round 4).

The full-width channel blocks + double-buffered prefetch (sphere_conv_pallas
/ sphere_conv_vjp) flipped every per-shape crossover to the fused kernels
(scripts/bench_kernels.py --shapes thresholds), so the LAYER-level gates are
stale: `min_pixels=8192` keeps 32x64 SPADE layers on gather, `strides=(1,)`
keeps the discriminator's stride-2 front on gather. Re-measure the full GAN
fused step + synthesis under each gate combination on the chip:

    python scripts/exp_dispatch_sweep.py [--batch 8] [--steps 6]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/emlight_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from emlight_tpu.config import ProjectorConfig
from emlight_tpu.nn.sphere_conv import conv_compute_dtype, pallas_sphere_convs
from emlight_tpu.train import projector as P
from emlight_tpu.train.data import synthetic_projector_batch
from emlight_tpu.train.projector import make_guide


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=6)
    args = ap.parse_args()

    cfg = dataclasses.replace(
        ProjectorConfig(), batch_size=args.batch, use_vgg_loss=False,
        dtype="bfloat16",
    )
    state = P.create_state(jax.random.PRNGKey(0), cfg)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_projector_batch(
            args.batch, n_anchors=cfg.anchors.n_anchors,
            crop_size=cfg.crop_size // 2,
            env_hw=(cfg.crop_size // 2, cfg.crop_size),
        ).items()
    }
    steps = args.steps

    def measure(name, run, fetch):
        try:
            compiled = jax.jit(run).lower(state, batch).compile()
            out = compiled(state, batch)
            float(fetch(out))
            t0 = time.perf_counter()
            out = compiled(state, batch)
            float(fetch(out))
            ms = (time.perf_counter() - t0) / steps * 1000
            print(f"{name:<52} {ms:8.1f} ms/step", flush=True)
            return ms
        except Exception as e:
            print(f"{name:<52} FAILED: {e!r:.120}", flush=True)
            return None

    def make_fused(strides, mp):
        def run(st_, b):
            with pallas_sphere_convs(True, strides=strides, min_pixels=mp), \
                    conv_compute_dtype(jnp.bfloat16):
                def sbody(carry, _):
                    st2, metrics, _ = P._fused_gan_step_body(
                        carry, b, cfg, None, None)
                    return st2, metrics["loss_G"]
                return jax.lax.scan(sbody, st_, None, length=steps)
        return run

    def make_synth(strides, mp):
        # state must be a jit ARG (closing over it bakes the params into the
        # HLO as constants -> the remote compile service rejects the body)
        def run(st_, b):
            with pallas_sphere_convs(True, strides=strides, min_pixels=mp), \
                    conv_compute_dtype(jnp.bfloat16):
                variables = {"params": st_.g_params, **st_.g_stats}

                def sbody(acc, _):
                    fake = st_.g_apply(
                        variables, make_guide(b, cfg) + acc * 1e-30,
                        b["crop"], train=False)
                    return acc + jnp.sum(fake), jnp.sum(fake)
                return jax.lax.scan(sbody, jnp.float32(0.0), None, length=steps)
        return run

    for strides, mp, tag in [
        ((1,), 8192, "baseline (s1, mp8192)"),
        ((1,), 2048, "s1, mp2048 (32x64 layers fused)"),
        ((1, 2), 8192, "s1+s2 (D front fused)"),
        ((1, 2), 2048, "s1+s2, mp2048"),
    ]:
        measure(f"fused G+D [{tag}]", make_fused(strides, mp),
                lambda o: jax.tree.leaves(o[1])[0][-1])
        measure(f"synthesis [{tag}]", make_synth(strides, mp),
                lambda o: o[1][-1])


if __name__ == "__main__":
    main()
