"""Locate where the regression TRAIN step spends its 259 ms (bs 16, 192x256,
bf16 + remat — the bench config). Times the full step, the remat on/off pair,
forward-only vs forward+backward, the loss terms in isolation, and per-block
fwd+bwd prefixes. One line per measurement. Not part of the shipped bench.

    python scripts/exp_train_profile.py
"""

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
from emlight_tpu.train import regression as R
from emlight_tpu.train.data import synthetic_regression_batch

B = 16
ITERS = 10


def timed(name, fn, *args, scalar=False):
    @jax.jit
    def run_n(*a):
        def body(acc, _):
            out = fn(*(x if i else jax.tree.map(lambda t: t + acc * 1e-30, x)
                       for i, x in enumerate(a)))
            leaf = jax.tree.leaves(out)[0]
            return acc + jnp.sum(leaf).astype(jnp.float32), None
        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return total

    c = run_n.lower(*args).compile()
    float(c(*args))
    float(c(*args))
    t0 = time.perf_counter()
    float(c(*args))
    ms = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:<58} {ms:8.2f} ms", flush=True)
    return ms


def make(remat: bool, dtype: str = "bfloat16"):
    cfg = dataclasses.replace(
        RegressionConfig(),
        anchors=AnchorConfig(regression_anchors=128),
        batch_size=B, dtype=dtype, remat=remat,
    )
    state = R.create_state(jax.random.PRNGKey(0), cfg)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_regression_batch(
            B, cfg.anchors.regression_anchors, (cfg.crop_h, cfg.crop_w)
        ).items()
    }
    return cfg, state, batch


def main():
    cfg, state, batch = make(remat=True)
    cfg_nr, state_nr, _ = make(remat=False)

    # 1. the bench row, reproduced
    def full_step(b, st):
        st2, m = R.train_step(st, b, cfg)
        return m["loss"]
    timed("train_step (bf16, remat)  [bench row]", full_step, batch, state)

    # 2. remat off
    def full_step_nr(b, st):
        st2, m = R.train_step(st, b, cfg_nr)
        return m["loss"]
    try:
        timed("train_step (bf16, NO remat)", full_step_nr, batch, state_nr)
    except Exception as e:
        print(f"train_step (bf16, NO remat) FAILED: {type(e).__name__}: {e}")

    # 3. forward only (train mode, batch stats mutated)
    def fwd_only(b, st):
        pred, mut = st.apply_fn(
            {"params": st.params, "batch_stats": st.batch_stats},
            b["crop"], train=True, mutable=["batch_stats"],
        )
        return pred["distribution"]
    timed("forward only (train=True, remat)", fwd_only, batch, state)
    timed("forward only (train=True, NO remat)", fwd_only, batch, state_nr)

    def fwd_eval(b, st):
        return st.apply_fn(
            {"params": st.params, "batch_stats": st.batch_stats},
            b["crop"], train=False,
        )["distribution"]
    timed("forward only (train=False = eval, NO remat)", fwd_eval, batch, state_nr)

    # 4. fwd+bwd of the backbone alone (no loss machinery): d sum(heads)/d params
    def bb_grad(b, st):
        def f(p):
            pred, _ = st.apply_fn(
                {"params": p, "batch_stats": st.batch_stats},
                b["crop"], train=True, mutable=["batch_stats"],
            )
            return sum(jnp.sum(v.astype(jnp.float32)) for v in pred.values())
        return jax.grad(f)(st.params)
    timed("backbone fwd+bwd (sum-of-heads grad, remat)", bb_grad, batch, state)
    timed("backbone fwd+bwd (sum-of-heads grad, NO remat)", bb_grad, batch, state_nr)

    # 5. full loss fwd+bwd (no optimizer)
    def loss_grad(b, st):
        g = jax.grad(
            lambda p: R.loss_fn(p, st.batch_stats, st.apply_fn, b, cfg, True)[0]
        )(st.params)
        return g
    timed("loss fwd+bwd (incl. sinkhorn, remat, no Adam)", loss_grad, batch, state)

    # 6. Adam update alone
    grads = jax.jit(
        lambda st, b: jax.grad(
            lambda p: R.loss_fn(p, st.batch_stats, st.apply_fn, b, cfg, True)[0]
        )(st.params)
    )(state, batch)

    def adam_only(g, st):
        upd, _ = st.tx.update(g, st.opt_state, st.params)
        return jax.tree.leaves(upd)[0]
    timed("Adam update alone", adam_only, grads, state)


if __name__ == "__main__":
    main()
