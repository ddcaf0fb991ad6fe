"""Locate where the flagship-inference DenseNet forward spends its 428 ms
(bs 128, bf16). Times (a) prefixes of the network — conv0, +block1, +block2,
+block3, full — and (b) isolated per-layer ops at each block's shapes.
One line per measurement. Not part of the shipped bench.

    python scripts/exp_densenet_profile.py
"""

import dataclasses
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/emlight_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp

from emlight_tpu.config import AnchorConfig, RegressionConfig
from emlight_tpu.train import regression as R

B = 128
ITERS = 20


def timed(name, fn, *args):
    @jax.jit
    def run_n(*a):
        def body(acc, _):
            out = fn(*(x + acc * 1e-30 if i == len(a) - 1 else x
                       for i, x in enumerate(a)))
            return acc + jnp.sum(out).astype(jnp.float32), None
        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return total

    float(run_n(*args))
    float(run_n(*args))
    t0 = time.perf_counter()
    float(run_n(*args))
    ms = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:<52} {ms:8.2f} ms", flush=True)
    return ms


class Prefix(nn.Module):
    """First `n_blocks` dense blocks of the flagship DenseNet (eval mode)."""
    n_blocks: int
    n_layers: int = 16  # layers taken from the LAST included block

    @nn.compact
    def __call__(self, x):
        from emlight_tpu.nn.densenet import _DenseLayer, _Transition
        dt = jnp.bfloat16
        x = x.astype(dt)
        x = nn.Conv(24, (3, 3), padding=1, use_bias=False, dtype=dt, name="conv0")(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                         dtype=dt, name="norm0")(x)
        x = nn.relu(x)
        feats = 24
        for i in range(self.n_blocks):
            layers = self.n_layers if i == self.n_blocks - 1 else 16
            for j in range(layers):
                x = _DenseLayer(12, 4, 0.0, dtype=dt,
                                name=f"b{i}_l{j}")(x, train=False)
            feats = (feats + 16 * 12) // 2
            x = _Transition(feats, dtype=dt, name=f"t{i}")(x, train=False)
        return jnp.sum(x)


def run_prefix(name, n_blocks, n_layers=16):
    m = Prefix(n_blocks, n_layers)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, 192, 256, 3), dtype=np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    return timed(name, lambda xx: m.apply(v, xx), x)


def main():
    print(f"batch {B}, bf16 compute", flush=True)

    # (a) network prefixes
    t0b = run_prefix("prefix: conv0 only", 0)
    t1 = run_prefix("prefix: conv0 + block1 (+trans)", 1)
    t1h = run_prefix("prefix: conv0 + block1[:8]", 1, 8)
    t2 = run_prefix("prefix: + block2", 2)
    t3 = run_prefix("prefix: + block3 (full backbone)", 3)

    # full model for reference
    cfg = dataclasses.replace(RegressionConfig(),
                              anchors=AnchorConfig(regression_anchors=128),
                              dtype="bfloat16")
    state = R.create_state(jax.random.PRNGKey(0), cfg)
    model = R.make_model(cfg)
    rng = np.random.default_rng(0)
    crop = jnp.asarray(rng.random((B, cfg.crop_h, cfg.crop_w, 3), dtype=np.float32))
    bv = {"params": state.params, "batch_stats": state.batch_stats}
    timed("full model (heads incl.)",
          lambda xx: sum(jnp.sum(v) for v in model.apply(bv, xx, train=False).values()),
          crop)
    print(f"# deltas: block1={t1 - t0b:.1f}  block2={t2 - t1:.1f}  "
          f"block3={t3 - t2:.1f}", flush=True)

    # (b) isolated ops at block-1 shapes (192x256), mid-block cin=114
    dt = jnp.bfloat16
    rng = np.random.default_rng(1)
    for (h, w, cin) in ((192, 256, 120), (96, 128, 200), (48, 64, 250)):
        x = jnp.asarray(rng.random((B, h, w, cin), dtype=np.float32), dtype=dt)
        k1 = jnp.asarray(rng.normal(0, 0.05, (1, 1, cin, 48)), dtype=dt)
        k2 = jnp.asarray(rng.normal(0, 0.05, (3, 3, 48, 12)), dtype=dt)
        h48 = jnp.asarray(rng.random((B, h, w, 48), dtype=np.float32), dtype=dt)
        h12 = jnp.asarray(rng.random((B, h, w, 12), dtype=np.float32), dtype=dt)
        sc = jnp.ones((cin,), dt)

        dn = lambda: None  # noqa
        conv = lambda xx, kk, pad: jax.lax.conv_general_dilated(
            xx, kk, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        print(f"-- shapes {h}x{w} cin={cin} (batch {B})", flush=True)
        timed(f"  bn+relu ({cin}ch)", lambda xx: nn.relu(xx * sc + sc), x)
        timed(f"  conv1 1x1 {cin}->48", lambda xx: conv(xx, k1, "VALID"), x)
        timed(f"  conv2 3x3 48->12", lambda xx: conv(xx, k2, "SAME"), h48)
        timed(f"  concat {cin}+12", lambda xx: jnp.concatenate([xx, h12], -1), x)
        timed(f"  dense layer end-to-end ({cin}->+12)",
              lambda xx: jnp.concatenate(
                  [xx, conv(nn.relu(xx * sc + sc) @ k1[0, 0], k2, "SAME")], -1), x)


if __name__ == "__main__":
    main()
