"""Inference-throughput experiments on the real chip (round-3 item: raise
flagship-inference MFU). Measures the bench.py flagship loop under candidate
optimizations, printing one line per variant. Not part of the shipped bench.

    python scripts/exp_infer_opt.py [--batch 128] [--iters 30]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/emlight_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from emlight_tpu.config import AnchorConfig, RegressionConfig
from emlight_tpu.nn.densenet import fold_eval_variables
from emlight_tpu.representation import render_anchor_params
from emlight_tpu.train import regression as R


def measure(name, apply_fn, variables, crop, iters, with_env=True, n=128,
            intensity_scale=500.0):
    def fn(v, c):
        pred = apply_fn(v, c, train=False)
        if with_env:
            dist = jax.nn.softmax(pred["distribution"], axis=-1)
            env = render_anchor_params(
                dist, pred["intensity"][:, 0], pred["rgb_ratio"], pred["ambient"],
                n=n, intensity_scale=intensity_scale,
            )
            return jnp.sum(env)
        return sum(jnp.sum(x) for x in pred.values())

    @jax.jit
    def run_n(v, c):
        def body(acc, _):
            s = fn(v, c + acc * 1e-30)
            return acc + s, None
        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return total

    float(run_n(variables, crop))
    float(run_n(variables, crop))  # second warmup: steadier clocks
    t0 = time.perf_counter()
    float(run_n(variables, crop))
    dt = time.perf_counter() - t0
    rate = crop.shape[0] * iters / dt
    print(f"{name:<40} {rate:9.1f} img/s   ({dt / iters * 1000:6.2f} ms/batch)",
          flush=True)
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    cfg = dataclasses.replace(
        RegressionConfig(),
        anchors=AnchorConfig(regression_anchors=128),
        dtype="bfloat16",
    )
    state = R.create_state(jax.random.PRNGKey(0), cfg)
    model = R.make_model(cfg)
    rng = np.random.default_rng(0)
    crop = jnp.asarray(rng.random((args.batch, cfg.crop_h, cfg.crop_w, 3), dtype=np.float32))

    base_vars = {"params": state.params, "batch_stats": state.batch_stats}
    measure("baseline bf16-compute f32-params", model.apply, base_vars, crop, args.iters)
    measure("baseline, no env render", model.apply, base_vars, crop, args.iters,
            with_env=False)

    fp, fs = fold_eval_variables(state.params, state.batch_stats)
    folded = dataclasses.replace(model, fold_bn=True)
    measure("fold_bn (norm2 into conv2)", folded.apply,
            {"params": fp, "batch_stats": fs}, crop, args.iters)

    bf16 = lambda t: jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                                  if a.dtype == jnp.float32 else a, t)
    measure("fold_bn + bf16 params", folded.apply,
            {"params": bf16(fp), "batch_stats": bf16(fs)}, crop, args.iters)

    crop256 = jnp.concatenate([crop, crop], 0)
    measure("fold_bn bs x2", folded.apply,
            {"params": fp, "batch_stats": fs}, crop256, max(args.iters // 2, 4))


if __name__ == "__main__":
    main()
