"""Isolated-op costs inside a block-1 dense layer at flagship inference shapes
(bs 128, 192x256, bf16), plus candidate-optimization variants:

  - conv1 on the physical concat vs per-slice matmul-sum (concat-free)
  - concat rebuild vs dynamic_update_slice into a preallocated buffer
  - conv2 (3x3 48->12) in NHWC vs NCHW (pixels-in-lanes) layout

    python scripts/exp_dense_ops.py
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/emlight_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = 128
ITERS = 20
DT = jnp.bfloat16


def timed(name, fn, *args):
    @jax.jit
    def run_n(*a):
        def body(acc, _):
            eps = (acc * 1e-8).astype(a[-1].dtype)
            out = fn(*a[:-1], a[-1] + eps)
            return acc + jnp.sum(out).astype(jnp.float32), None
        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return total

    float(run_n(*args))
    float(run_n(*args))
    t0 = time.perf_counter()
    float(run_n(*args))
    ms = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:<58} {ms:8.2f} ms", flush=True)
    return ms


def conv(xx, kk, pad, dn=("NHWC", "HWIO", "NHWC")):
    return jax.lax.conv_general_dilated(xx, kk, (1, 1), pad, dimension_numbers=dn)


def main():
    print(f"batch {B}, bf16, ops at block-1 shapes", flush=True)
    rng = np.random.default_rng(1)
    for (h, w, cin) in ((192, 256, 120), (192, 256, 204), (96, 128, 288)):
        x = jnp.asarray(rng.random((B, h, w, cin), dtype=np.float32), dtype=DT)
        k1 = jnp.asarray(rng.normal(0, 0.05, (1, 1, cin, 48)), dtype=DT)
        k2 = jnp.asarray(rng.normal(0, 0.05, (3, 3, 48, 12)), dtype=DT)
        h48 = jnp.asarray(rng.random((B, h, w, 48), dtype=np.float32), dtype=DT)
        h12 = jnp.asarray(rng.random((B, h, w, 12), dtype=np.float32), dtype=DT)
        sc = jnp.asarray(rng.random(cin, dtype=np.float32), dtype=DT)

        print(f"-- {h}x{w} cin={cin}", flush=True)
        timed("  bn+relu", lambda xx: jax.nn.relu(xx * sc + sc), x)
        timed("  conv1 1x1 cin->48 (concat input)",
              lambda xx: conv(xx, k1, "VALID"), x)
        timed("  conv2 3x3 48->12 NHWC", lambda xx: conv(xx, k2, "SAME"), h48)
        # NCHW: pixels in lanes, cout in sublanes — dodges the 12/128 lane pad
        h48c = jnp.transpose(h48, (0, 3, 1, 2))
        k2c = jnp.transpose(k2, (3, 2, 0, 1))  # OIHW
        timed("  conv2 3x3 48->12 NCHW",
              lambda xx: conv(xx, k2c, "SAME", ("NCHW", "OIHW", "NCHW")), h48c)
        timed("  conv2 3x3 48->48 NHWC (lane-filling cout)",
              lambda xx: conv(xx, jnp.tile(k2, (1, 1, 1, 4)), "SAME"), h48)
        timed("  concat rebuild (cin+12)",
              lambda xx: jnp.concatenate([x, xx], -1), h12)
        buf = jnp.zeros((B, h, w, 384), DT)
        timed("  DUS write 12ch into 384ch buffer @ofs %d" % cin,
              lambda xx: jax.lax.dynamic_update_slice(
                  buf, xx, (0, 0, 0, cin)), h12)
        # per-slice conv1: 16 slices of 12 channels + the 24-ch stem,
        # summed matmuls (the concat-free formulation)
        slices = [x[..., :24]] + [
            x[..., 24 + i * 12: 36 + i * 12] for i in range((cin - 24) // 12)
        ]
        ks = [k1[0, 0, :24]] + [
            k1[0, 0, 24 + i * 12: 36 + i * 12] for i in range((cin - 24) // 12)
        ]
        def conv1_slices(xx):
            acc = slices[0] @ ks[0]
            for s, kk in zip(slices[1:], ks[1:]):
                acc = acc + s @ kk
            return acc + xx[..., :1] * 0  # keep arg dependence
        timed("  conv1 as per-slice matmul-sum", conv1_slices, h12)
        # whole layer fused (bn+relu+conv1+conv2) on the concat input
        timed("  layer fused: bn+relu -> conv1 -> conv2",
              lambda xx: conv(conv(jax.nn.relu(xx * sc + sc), k1, "VALID"),
                              k2, "SAME"), x)


if __name__ == "__main__":
    main()
