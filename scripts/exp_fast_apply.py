"""On-chip throughput of the concat-free eval forward (nn/densenet_fast.py)
vs the standard DenseNet.apply, at the flagship bench config (bs 128, bf16,
128 anchors, env render on). One line per variant.

    python scripts/exp_fast_apply.py [--batch 128] [--iters 30]
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
from emlight_tpu.nn.densenet_fast import buffer_apply, fast_apply
from emlight_tpu.representation import render_anchor_params
from emlight_tpu.train import regression as R


def measure(name, pred_fn, variables, crop, iters, with_env=True, n=128):
    def fn(v, c):
        pred = pred_fn(v, c)
        if with_env:
            dist = jax.nn.softmax(pred["distribution"], axis=-1)
            env = render_anchor_params(
                dist, pred["intensity"][:, 0], pred["rgb_ratio"], pred["ambient"],
                n=n, intensity_scale=500.0,
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
    float(run_n(variables, crop))
    t0 = time.perf_counter()
    float(run_n(variables, crop))
    dt = time.perf_counter() - t0
    rate = crop.shape[0] * iters / dt
    print(f"{name:<44} {rate:9.1f} img/s   ({dt / iters * 1000:6.2f} ms/batch)",
          flush=True)
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--slabs", action="store_true",
                    help="also re-measure the slab-grouped einsum variants")
    args = ap.parse_args()

    cfg = dataclasses.replace(
        RegressionConfig(),
        anchors=AnchorConfig(regression_anchors=128),
        dtype="bfloat16",
    )
    state = R.create_state(jax.random.PRNGKey(0), cfg)
    model = R.make_model(cfg)
    rng = np.random.default_rng(0)
    crop = jnp.asarray(
        rng.random((args.batch, cfg.crop_h, cfg.crop_w, 3), dtype=np.float32)
    )
    base_vars = {"params": state.params, "batch_stats": state.batch_stats}
    ps = (state.params, state.batch_stats)

    measure("baseline DenseNet.apply",
            lambda v, c: model.apply(v, c, train=False), base_vars, crop,
            args.iters)
    measure("buffer_apply (NCHW in-place DUS)",
            lambda v, c: buffer_apply(v[0], v[1], c), ps, crop, args.iters)
    measure("buffer_apply, no env render",
            lambda v, c: buffer_apply(v[0], v[1], c), ps, crop, args.iters,
            with_env=False)
    if args.slabs:
        for g in (4, 8, 2):
            measure(f"fast_apply slab group={g}",
                    lambda v, c, g=g: fast_apply(v[0], v[1], c, group=g), ps,
                    crop, args.iters)


if __name__ == "__main__":
    main()
