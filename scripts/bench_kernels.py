"""Microbench the fused sphere-conv kernels (fwd/dx/dk) on the real chip.

    python scripts/bench_kernels.py [--dtype bfloat16] [--shapes hot|all]
    python scripts/bench_kernels.py --block_rows 8,16,32   # br sweep

Prints one line per (op, shape, variant) with ms/call, to compare against the
BASELINE.md per-kernel microbench rows (v5e, bs8, 128x256):
  fwd/dx/dk pallas 128->256: 21.0/22.3/20.2 ms   128->64: 14.1/21.0/12.9
  64->64: 14.6/20.8/12.8  (bf16; rolls in f32)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/emlight_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    # tunnel quirk: block_until_ready may not block; force a scalar fetch
    float(jax.tree.leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--shapes", default="hot")
    ap.add_argument("--block_rows", default=None,
                    help="comma list to sweep dx/fwd block_rows")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from emlight_tpu.nn.sphere_conv import conv_compute_dtype
    from emlight_tpu.nn.sphere_conv_pallas import sphere_conv_pallas
    from emlight_tpu.nn import sphere_conv_vjp as V

    dt = jnp.dtype(args.dtype)
    b = args.batch
    shapes = [(128, 256, 128, 256), (128, 256, 128, 64), (128, 256, 64, 64)]
    if args.shapes == "all":
        shapes += [(64, 128, 256, 256), (64, 128, 128, 128), (32, 64, 512, 512)]
    brs = [None] if args.block_rows is None else [
        int(x) for x in args.block_rows.split(",")
    ]

    if args.shapes == "thresholds":
        # re-tune the per-shape dispatch thresholds in sphere_conv_vjp.py
        from emlight_tpu.nn.sphere_conv import conv_compute_dtype, sphere_conv_gather
        rng = np.random.default_rng(0)
        with conv_compute_dtype(dt):
            # (1) dk at wide cout: pallas vs gather (_PALLAS_DK_MAX_COUT)
            for h, w, cin, cout in [(128, 256, 128, 256), (64, 128, 256, 512)]:
                x = jnp.asarray(rng.standard_normal((b, h, w, cin), dtype=np.float32))
                g = jnp.asarray(rng.standard_normal((b, h, w, cout), dtype=np.float32))
                ms_p = timeit(jax.jit(lambda x, g: V._dk_pallas(x, g, 1)), x, g, iters=args.iters)
                ms_g = timeit(jax.jit(lambda x, g: V._dk_gather(x, g, g.shape[-1], 1)), x, g, iters=args.iters)
                print(f"dk   {h}x{w} {cin}->{cout}: pallas {ms_p:6.2f}  gather {ms_g:6.2f}", flush=True)
            # (2) fwd/dk at tiny cin (_PALLAS_FWD_MIN_CIN / _PALLAS_DK_MIN_CIN)
            for h, w, cin, cout in [(128, 256, 3, 384), (128, 256, 3, 128)]:
                x = jnp.asarray(rng.standard_normal((b, h, w, cin), dtype=np.float32))
                k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.05)
                g = jnp.asarray(rng.standard_normal((b, h, w, cout), dtype=np.float32))
                bias = jnp.zeros((cout,), jnp.float32)
                ms_p = timeit(jax.jit(lambda x, k, bias: sphere_conv_pallas(x, k, bias, 1)), x, k, bias, iters=args.iters)
                ms_g = timeit(jax.jit(lambda x, k, bias: sphere_conv_gather(x, k, bias, 1)), x, k, bias, iters=args.iters)
                mk_p = timeit(jax.jit(lambda x, g: V._dk_pallas(x, g, 1)), x, g, iters=args.iters)
                mk_g = timeit(jax.jit(lambda x, g: V._dk_gather(x, g, g.shape[-1], 1)), x, g, iters=args.iters)
                print(f"fwd  {h}x{w} {cin}->{cout}: pallas {ms_p:6.2f}  gather {ms_g:6.2f}", flush=True)
                print(f"dk   {h}x{w} {cin}->{cout}: pallas {mk_p:6.2f}  gather {mk_g:6.2f}", flush=True)
            # (3) dx u-major vs per-triple at mid resolution (_UMAJOR_MIN_PIXELS)
            for h, w, cin, cout in [(64, 128, 256, 256), (64, 128, 128, 128), (32, 64, 512, 512)]:
                x_shape = (b, h, w, cin)
                k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.05)
                g = jnp.asarray(rng.standard_normal((b, h, w, cout), dtype=np.float32))
                orig = V._UMAJOR_MIN_PIXELS
                V._UMAJOR_MIN_PIXELS = 1
                ms_u = timeit(jax.jit(lambda g, k: V._dx_pallas(g, k, x_shape, 1)), g, k, iters=args.iters)
                V._UMAJOR_MIN_PIXELS = 10 ** 9
                ms_t = timeit(jax.jit(lambda g, k: V._dx_pallas(g, k, x_shape, 1)), g, k, iters=args.iters)
                V._UMAJOR_MIN_PIXELS = orig
                print(f"dx   {h}x{w} {cin}->{cout}: umajor {ms_u:6.2f}  per-triple {ms_t:6.2f}", flush=True)
        return

    rng = np.random.default_rng(0)
    for h, w, cin, cout in shapes:
        x = jnp.asarray(rng.standard_normal((b, h, w, cin), dtype=np.float32))
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.05)
        bias = jnp.zeros((cout,), jnp.float32)
        g = jnp.asarray(rng.standard_normal((b, h, w, cout), dtype=np.float32))
        with conv_compute_dtype(dt):
            for br in brs:
                fwd = jax.jit(lambda x, k, bias, _br=br: sphere_conv_pallas(
                    x, k, bias, 1, block_rows=_br))
                ms = timeit(fwd, x, k, bias, iters=args.iters)
                print(f"fwd  {h}x{w} {cin:4d}->{cout:4d} br={br}: {ms:7.2f} ms", flush=True)
            for br in brs:
                dx = jax.jit(lambda g, k, _br=br: V._dx_pallas(
                    g, k, x.shape, 1, block_rows=(_br or 8)))
                ms = timeit(dx, g, k, iters=args.iters)
                print(f"dx   {h}x{w} {cin:4d}->{cout:4d} br={br}: {ms:7.2f} ms", flush=True)
            dkf = jax.jit(lambda x, g: V._dk_pallas(x, g, 1))
            ms = timeit(dkf, x, g, iters=args.iters)
            print(f"dk   {h}x{w} {cin:4d}->{cout:4d}       : {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
