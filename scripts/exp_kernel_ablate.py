"""Ablate the fused sphere-conv forward kernel to locate its cost.

BASELINE.md round-3: the hot fwd kernels measure ~9-15 ms (v5e bs8 bf16,
128x256) vs an ideal-MXU floor of <1 ms — per-kernel MFU ~5%. This script
times WRONG-MATH variants of the same kernel body to attribute the gap:

  base     the shipped kernel (sphere_conv_pallas)
  noroll   per-neighbor circular rotate skipped (shift=0)  -> roll cost
  f32roll  rolls without the bf16<->f32 round trip skipped (base already
           rolls in f32; this variant keeps data f32 end-to-end)
  nomm     tap matmul replaced by a cheap reduce            -> matmul cost
  nostage  staging skipped; 9 matmuls on the raw window     -> staging cost
  dmaonly  body reduced to the halo DMA + one write         -> DMA floor

plus a cout_block sweep (the grid's cb axis re-runs ALL staging per block).

    python scripts/exp_kernel_ablate.py [--batch 8] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/emlight_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=10):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())
    return (time.perf_counter() - t0) / iters * 1e3


def _kernel(rows_ref, shifts_ref, w0_ref, jdev_ref, x_hbm, k_ref, b_ref, out_ref,
            win_ref, s_ref, sems, *, br, w, win_rows, stride, h, variant):
    rb = pl.program_id(1)
    src0 = rb * br * stride
    start = jnp.clip(src0 - 2, 0, h - win_rows)
    b_idx = pl.program_id(0)
    w_in = win_ref.shape[1]
    dma0 = pltpu.make_async_copy(
        x_hbm.at[b_idx, pl.ds(start, win_rows)], win_ref, sems.at[0]
    )
    dma0.start()
    dma0.wait()

    bias = b_ref[:]
    cin = k_ref.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)

    if variant == "dmaonly":
        out_ref[0] = (
            win_ref[0:br, :w, : k_ref.shape[-1]].astype(jnp.float32)
            + bias.reshape(1, 1, -1)
        )
        return

    def tap_body(t, acc):
        def row_body(ii, _):
            s_row = jnp.zeros((w, cin), win_ref.dtype)

            def nb_body(k, s_row):
                r_local = rows_ref[0, ii, t, k] - start
                shift = shifts_ref[0, ii, t, k]
                row = win_ref[r_local]
                if variant == "noroll":
                    shifted = row
                elif row.dtype != jnp.float32:
                    shifted = pltpu.roll(
                        row.astype(jnp.float32), w_in - shift, 0
                    ).astype(row.dtype)
                else:
                    shifted = pltpu.roll(row, w_in - shift, 0)
                if stride > 1:
                    shifted = shifted.reshape(w, stride, cin)[:, 0, :]
                wvec = jnp.where(
                    col_ids == jdev_ref[0, ii, t, k], 0.0, w0_ref[0, ii, t, k]
                ).astype(win_ref.dtype)
                return s_row + wvec * shifted

            s_ref[ii] = jax.lax.fori_loop(0, 4, nb_body, s_row)
            return 0

        if variant != "nostage":
            jax.lax.fori_loop(0, br, row_body, 0)
            smat = s_ref[:].reshape(br * w, cin)
        else:
            smat = win_ref[0:br, :w].reshape(br * w, cin)
        if variant == "nomm":
            # keep the staged data live without an MXU pass
            return acc + jnp.sum(smat.astype(jnp.float32), axis=1, keepdims=True)
        return acc + jnp.dot(smat, k_ref[t], preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(
        0, 9, tap_body, jnp.zeros((br * w, k_ref.shape[-1]), jnp.float32)
    )
    out_ref[0] = (acc + bias).reshape(br, w, k_ref.shape[-1])


def run_variant(x, kernel, bias, variant, cout_block=128, block_rows=8):
    from emlight_tpu.nn.sphere_conv import compute_dtype_of
    from emlight_tpu.nn.sphere_conv_pallas import (
        scalar_weight_tables, structured_tables,
    )

    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    dt = compute_dtype_of(x)
    stride = 1
    rows_c, shift_c, wcol = structured_tables(h, w, stride)
    w0_tab, jdev_tab = scalar_weight_tables(h, w, stride)
    ho, wo = wcol.shape[0], wcol.shape[3]
    br = block_rows
    n_rb = ho // br
    cb = min(cout_block, cout)
    n_cb = cout // cb
    win_rows = min(br * stride + 4, h)
    kflat = kernel.reshape(9, cin, cout)
    bias_in = bias.reshape(1, cout)

    return pl.pallas_call(
        functools.partial(_kernel, br=br, w=wo, win_rows=win_rows,
                          stride=stride, h=h, variant=variant),
        grid=(b, n_rb, n_cb),
        in_specs=[
            pl.BlockSpec((1, br, 9, 4), lambda bb, rb, cb_: (0, rb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, br, 9, 4), lambda bb, rb, cb_: (0, rb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, br, 9, 4), lambda bb, rb, cb_: (0, rb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, br, 9, 4), lambda bb, rb, cb_: (0, rb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, cin, cb), lambda bb, rb, cb_: (0, 0, cb_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb), lambda bb, rb, cb_: (0, cb_),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, br, wo, cb), lambda bb, rb, cb_: (bb, rb, 0, cb_),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((win_rows, w, cin), dt),
            pltpu.VMEM((br, wo, cin), dt),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(
        jnp.asarray(rows_c)[None], jnp.asarray(shift_c)[None],
        jnp.asarray(w0_tab)[None], jnp.asarray(jdev_tab)[None],
        x.astype(dt), kflat.astype(dt), bias_in.astype(jnp.float32),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from emlight_tpu.nn.sphere_conv import conv_compute_dtype

    # cin >= 128 only: this harness omits the shipped kernel's cin zero-pad
    shapes = [(128, 256, 128, 256), (128, 256, 128, 64), (64, 128, 256, 256)]
    rng = np.random.default_rng(0)
    for h, w, cin, cout in shapes:
        x = jnp.asarray(rng.normal(size=(args.batch, h, w, cin)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05, jnp.float32)
        bias = jnp.zeros((cout,), jnp.float32)
        print(f"--- {h}x{w} {cin}->{cout} bs{args.batch} {args.dtype}")
        with conv_compute_dtype(jnp.dtype(args.dtype)):
            variants = ["base", "noroll", "nomm", "nostage", "dmaonly"]
            for v in variants:
                fn = jax.jit(functools.partial(run_variant, variant=v))
                ms = timeit(fn, x, k, bias, iters=args.iters)
                print(f"  {v:<10} {ms:7.2f} ms", flush=True)
            if cout > 128:
                fn = jax.jit(functools.partial(
                    run_variant, variant="base", cout_block=cout))
                ms = timeit(fn, x, k, bias, iters=args.iters)
                print(f"  {'cb=full':<10} {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
