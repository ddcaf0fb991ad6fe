"""Fused Pallas TPU kernels for the DenseNet dense-layer 3x3 conv (train path).

XLA's NCHW 3x3 convolution at the dense layer's shapes (48 -> 12 channels,
192x256) measures ~2.1 ms on a v5e — 36 GB/s effective, 6-20x off
speed-of-light — and its cost is FLAT in cout (the lowering is per-input-byte
bound, not MXU bound). These kernels exploit the structure instead:

- the BN-train affine (y = x*A + B, per-channel batch-moment terms) is fused
  into the input read — the normalized tensor is never materialized in HBM;
- the 9 taps ride ONE (rows*W, Cin) x (Cin, 9*Cout) MXU matmul per row block
  (84% lane fill vs 9% for a Cout=12 conv), producing a tap-major T matrix
  that stays in VMEM;
- the tap sum is 9 static shifted adds of T in f32 — the shifts are
  slice+concat with a zero edge, which IS the conv's zero padding;
- the halo (one row above/below the block) is DMA'd HBM->VMEM with a
  revolving two-slot buffer and one-step prefetch, following
  nn/sphere_conv_pallas.py's window pattern (same hardware, same trick).

Layout is NHWC with channels on lanes (C pads to the 128-lane tile in VMEM;
DMA moves only logical bytes). Backward:

  dx = conv_T(g, K) * A      — the SAME kernel with the tap-reversed,
                               transposed kernel, a post-scale, and two extra
                               per-channel partial-sum outputs:
  dB[c] = sum_p dy2[p, c]       (dy2 = conv_T(g, K), the pre-scale acc)
  dA[c] = sum_p dy2[p, c]*x[p, c]
  dK[t, c, o] = sum_p y[p + off_t, c] * g[p, o]
                             — im2col staging of the y window (9 shifted
                               slabs concatenated on lanes) and one
                               (rows*W, 9C)^T x (rows*W, O) accumulation dot
                               per grid step into a single revisited block
                               (sequential TPU grid), following
                               sphere_conv_vjp's dK pattern.

`fused_affine_conv3x3` wraps fwd+bwd in a jax.custom_vjp: gradients are exact
(the f64 interpret-mode test in tests/test_densenet_fast.py pins them against
autodiff of the XLA reference formulation).

STATUS: carried as a tested experiment, NOT wired into the train path. On a
v5e at the flagship shape (bs16 bf16, 192x256, 48->12) this kernel measured
fwd 4.4 ms / fwd+bwd 7.8 ms vs XLA NHWC's 2.1 / 2.3 (BASELINE.md round-5
ledger). The MXU floor analysis explains why: with K<=128 the MXU pads the
contraction to a full 128-wide pass, so the T-trick's one dot costs ~0.9 ms
regardless of K=48 vs 128, the dx dot's K=12 contraction runs at 9% lane
fill, and the post-dot tap extraction pays lane-relayouts — any kernel for
this thin-channel conv lands within ~2x of XLA's own lowering. The exact-
gradient machinery (analytic moment routing, halo DMA, shift-mask tap sums)
stays tested for reuse at friendlier shapes.

Targets the hot conv of RegressionNetwork/DenseNet.py:41-44 (norm2+conv2)
inside the structured block VJP (nn/densenet_fast._block_core).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_affine_conv3x3", "conv3x3_nhwc_reference", "supported"]

TAPS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))
BR = 8  # row-block size; every flagship H (192/96/48) and test H divides it


def conv3x3_nhwc_reference(x, a, b, kernel):
    """XLA reference: conv3x3(x*a + b, kernel), SAME zero padding, NHWC.

    a/b are per-channel f32 (the BN-train affine); the normalized operand is
    cast to x.dtype before the conv, matching _norm_train_nchw's dtype flow.
    """
    dt = x.dtype
    y = (x.astype(a.dtype) * a + b).astype(dt)
    return lax.conv_general_dilated(
        y, kernel.astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def supported(h: int, w: int) -> bool:
    """Shapes the kernels handle: >=2 row blocks and a lane-friendly W."""
    return h % BR == 0 and h // BR >= 2 and w >= 8


def _win_dma(x_hbm, win_ref, sems, b_idx, rb, slot, *, br, h, win_rows):
    # all-int32 index math: weak-typed python ints recurse in the x64
    # promotion path inside pallas tracing (f64 interpret-mode tests)
    start = jnp.clip(
        rb * jnp.int32(br) - jnp.int32(1), jnp.int32(0), jnp.int32(h - win_rows)
    )
    return pltpu.make_async_copy(
        x_hbm.at[b_idx, pl.ds(start, win_rows)], win_ref.at[slot], sems.at[slot]
    )


def _row_shift(t3, r0, br, zrow):
    """Rows [r0, r0+br) of t3 with zero fill outside the window."""
    rows = t3.shape[0]
    if r0 < 0:
        return jnp.concatenate([zrow] * (-r0) + [t3[0 : br + r0]], axis=0)
    if r0 + br > rows:
        over = r0 + br - rows
        return jnp.concatenate([t3[r0:rows]] + [zrow] * over, axis=0)
    return t3[r0 : r0 + br]


def _col_shift(slab, dx, zcol=None):
    """out col j <- src col j+dx, zero at the borders (= conv zero pad).

    Implemented as a static sublane roll + an iota mask on the wrapped
    column: Mosaic rejects concatenation of sublane slices at unaligned
    offsets ("result/input offset mismatch on non-concat dimension"), but
    static rotates lower fine. Rolls are 32-bit only: 16-bit slabs round-trip
    through f32.
    """
    if dx == 0:
        return slab
    w = slab.shape[1]
    dt = slab.dtype
    s32 = slab.astype(jnp.float32) if dt.itemsize < 4 else slab
    rolled = jnp.roll(s32, -dx, axis=1)
    bad = w - 1 if dx == 1 else 0
    col = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 1)
    rolled = jnp.where(col == bad, jnp.zeros((), s32.dtype), rolled)
    return rolled.astype(dt) if dt.itemsize < 4 else rolled


def _conv_kernel(x_hbm, k_ref, a_ref, b_ref, *rest, br, w, h, cin, cout,
                 acc_dt, out_dt, mode, prefetch):
    """Body for mode='fwd' (pre-affine conv) and mode='dx' (conv +
    post-scale + dA/dB partial sums; rest carries the extra refs)."""
    if mode == "dx":
        pa_ref, xo_ref, out_ref, da_ref, db_ref, win_ref, sems = rest
    else:
        out_ref, win_ref, sems = rest
    b_idx = pl.program_id(0)
    rb = pl.program_id(1)
    n_rb = pl.num_programs(1)
    win_rows = br + 2

    dma = functools.partial(
        _win_dma, x_hbm, win_ref, sems, br=br, h=h, win_rows=win_rows
    )
    if prefetch:
        step = b_idx * jnp.int32(n_rb) + rb
        slot = jax.lax.rem(step, jnp.int32(2))

        @pl.when(step == 0)
        def _first():
            dma(b_idx, rb, slot).start()

        dma(b_idx, rb, slot).wait()
        total = pl.num_programs(0) * n_rb

        @pl.when(step + jnp.int32(1) < jnp.int32(total))
        def _pref():
            nxt = step + jnp.int32(1)
            dma(jax.lax.div(nxt, jnp.int32(n_rb)),
                jax.lax.rem(nxt, jnp.int32(n_rb)), 1 - slot).start()
    else:
        slot = 0
        d = dma(b_idx, rb, slot)
        d.start()
        d.wait()

    a_vec = a_ref[0].astype(acc_dt)
    b_vec = b_ref[0].astype(acc_dt)

    def compute(win):
        xf = win[...].astype(acc_dt)
        y = (xf * a_vec + b_vec).astype(x_hbm.dtype)
        t = jnp.dot(
            y.reshape(win_rows * w, cin), k_ref[...],
            preferred_element_type=acc_dt,
        )
        t3 = t.reshape(win_rows, w, 9 * cout)
        zrow = jnp.zeros((1, w, cout), acc_dt)
        zcol = jnp.zeros((br, 1, cout), acc_dt)

        def tap_sum(base):
            acc = jnp.zeros((br, w, cout), acc_dt)
            for ti, (dy, dx) in enumerate(TAPS):
                sl = lax.slice_in_dim(t3, ti * cout, (ti + 1) * cout, axis=2)
                slab = _row_shift(sl, base + dy, br, zrow)
                acc = acc + _col_shift(slab, dx, zcol)
            return acc

        def finish(acc):
            if mode == "dx":
                db_ref[0, 0, 0] = jnp.sum(acc, axis=(0, 1))
                xof = xo_ref[0].astype(acc_dt)
                da_ref[0, 0, 0] = jnp.sum(acc * xof, axis=(0, 1))
                acc = acc * pa_ref[0].astype(acc_dt)
            out_ref[0] = acc.astype(out_dt)

        # the clamped window start shifts the out-row <-> window-row mapping
        # at the image borders: base = (first out row) - (window start row)
        @pl.when(rb == 0)
        def _top():
            finish(tap_sum(0))

        @pl.when(jnp.logical_and(rb > 0, rb < n_rb - 1))
        def _mid():
            finish(tap_sum(1))

        @pl.when(rb == n_rb - 1)
        def _bot():
            finish(tap_sum(2))

    if prefetch:
        @pl.when(slot == 0)
        def _even():
            compute(win_ref.at[0])

        @pl.when(slot == 1)
        def _odd():
            compute(win_ref.at[1])
    else:
        compute(win_ref.at[0])


def _dk_kernel(x_hbm, g_ref, a_ref, b_ref, dk_ref, win_ref, sems, *, br, w, h,
               cin, cout, acc_dt, prefetch):
    """dK[(t,c), o] += im2col(y window)^T @ g, one row block per grid step."""
    b_idx = pl.program_id(0)
    rb = pl.program_id(1)
    n_rb = pl.num_programs(1)
    win_rows = br + 2

    dma = functools.partial(
        _win_dma, x_hbm, win_ref, sems, br=br, h=h, win_rows=win_rows
    )
    if prefetch:
        step = b_idx * jnp.int32(n_rb) + rb
        slot = jax.lax.rem(step, jnp.int32(2))

        @pl.when(step == 0)
        def _first():
            dma(b_idx, rb, slot).start()

        dma(b_idx, rb, slot).wait()
        total = pl.num_programs(0) * n_rb

        @pl.when(step + jnp.int32(1) < jnp.int32(total))
        def _pref():
            nxt = step + jnp.int32(1)
            dma(jax.lax.div(nxt, jnp.int32(n_rb)),
                jax.lax.rem(nxt, jnp.int32(n_rb)), 1 - slot).start()
    else:
        slot = 0
        d = dma(b_idx, rb, slot)
        d.start()
        d.wait()

    @pl.when(jnp.logical_and(b_idx == 0, rb == 0))
    def _zero():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)

    a_vec = a_ref[0].astype(acc_dt)
    b_vec = b_ref[0].astype(acc_dt)

    def compute(win):
        xf = win[...].astype(acc_dt)
        y3 = (xf * a_vec + b_vec).astype(x_hbm.dtype)
        zrow = jnp.zeros((1, w, cin), y3.dtype)
        g_blk = g_ref[0].reshape(br * w, cout)

        def accumulate(base):
            # one dot per tap into the tap's dk_ref slab — a lane-concat
            # im2col at t*C offsets is an unaligned concat Mosaic rejects
            for ti, (dy, dx) in enumerate(TAPS):
                slab = _row_shift(y3, base + dy, br, zrow)
                slab = _col_shift(slab, dx)
                dk_ref[ti] += jax.lax.dot_general(
                    slab.reshape(br * w, cin), g_blk,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=acc_dt,
                )

        @pl.when(rb == 0)
        def _top():
            accumulate(0)

        @pl.when(jnp.logical_and(rb > 0, rb < n_rb - 1))
        def _mid():
            accumulate(1)

        @pl.when(rb == n_rb - 1)
        def _bot():
            accumulate(2)

    if prefetch:
        @pl.when(slot == 0)
        def _even():
            compute(win_ref.at[0])

        @pl.when(slot == 1)
        def _odd():
            compute(win_ref.at[1])
    else:
        compute(win_ref.at[0])


def _acc_dtype(dt):
    return jnp.promote_types(dt, jnp.float32)


def _pad_lanes(arr, mult=128, axis=-1):
    """Zero-pad a dim up to the lane tile: Mosaic requires manually-DMA'd
    HBM operands to be tile-aligned on the minor dim ("Slice shape along
    dimension 3 must be aligned to tiling (128)"). Zero channels carry zero
    kernel rows, so they contribute nothing."""
    n = arr.shape[axis]
    rem = (-n) % mult
    if rem == 0:
        return arr, n
    pads = [(0, 0)] * arr.ndim
    pads[axis] = (0, rem)
    return jnp.pad(arr, pads), n + rem


def _fwd_pallas(x, a, b, k9, *, interpret):
    """x (B,H,W,C), k9 (C, 9*O) tap-major -> (B,H,W,O) in x.dtype."""
    bsz, h, w, cin = x.shape
    cout = k9.shape[1] // 9
    dt = x.dtype
    acc_dt = _acc_dtype(dt)
    n_rb = h // BR
    x, cin = _pad_lanes(x)
    k9, _ = _pad_lanes(k9, axis=0)
    a, _ = _pad_lanes(a)
    b, _ = _pad_lanes(b)
    return pl.pallas_call(
        functools.partial(
            _conv_kernel, br=BR, w=w, h=h, cin=cin, cout=cout,
            acc_dt=acc_dt, out_dt=dt, mode="fwd", prefetch=True,
        ),
        grid=(bsz, n_rb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x in HBM, manual halo DMA
            pl.BlockSpec((cin, 9 * cout), lambda bb, rb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda bb, rb: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda bb, rb: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BR, w, cout), lambda bb, rb: (bb, rb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cout), dt),
        scratch_shapes=[
            pltpu.VMEM((2, BR + 2, w, cin), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, k9, a.reshape(1, cin).astype(acc_dt), b.reshape(1, cin).astype(acc_dt))


def _dx_pallas(g, x, a, kt9, *, interpret):
    """dx = (conv_T(g, K)) * a, plus dA/dB partials.

    g (B,H,W,O); x (B,H,W,C) the ORIGINAL input; kt9 (O, 9*C) the
    tap-reversed transposed kernel. Returns (dx (B,H,W,C) in g.dtype,
    dA partial (B, n_rb, C) f32, dB partial (B, n_rb, C) f32).
    """
    bsz, h, w, cout_g = g.shape
    cin_x = x.shape[3]
    dt = g.dtype
    acc_dt = _acc_dtype(dt)
    n_rb = h // BR
    g, cout_g = _pad_lanes(g)
    kt9, _ = _pad_lanes(kt9, axis=0)
    # pre-affine is identity for the transposed conv (the scale applies POST)
    ones = jnp.ones((1, cout_g), acc_dt)
    zeros = jnp.zeros((1, cout_g), acc_dt)
    return pl.pallas_call(
        functools.partial(
            _conv_kernel, br=BR, w=w, h=h, cin=cout_g, cout=cin_x,
            acc_dt=acc_dt, out_dt=dt, mode="dx", prefetch=True,
        ),
        grid=(bsz, n_rb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # g in HBM, manual halo DMA
            pl.BlockSpec((cout_g, 9 * cin_x), lambda bb, rb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout_g), lambda bb, rb: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout_g), lambda bb, rb: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin_x), lambda bb, rb: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BR, w, cin_x), lambda bb, rb: (bb, rb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BR, w, cin_x), lambda bb, rb: (bb, rb, 0, 0),
                         memory_space=pltpu.VMEM),
            # 4-D (1,1,1,C) blocks: Mosaic wants the last two dims tile-
            # divisible OR equal to the array dims
            pl.BlockSpec((1, 1, 1, cin_x), lambda bb, rb: (bb, rb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, cin_x), lambda bb, rb: (bb, rb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, w, cin_x), dt),
            jax.ShapeDtypeStruct((bsz, n_rb, 1, cin_x), acc_dt),
            jax.ShapeDtypeStruct((bsz, n_rb, 1, cin_x), acc_dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, BR + 2, w, cout_g), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(g, kt9, ones, zeros, a.reshape(1, cin_x).astype(acc_dt), x)


def _dk_pallas(x, g, a, b, *, interpret):
    """dK (9*C, O) f32 = sum over (batch, pixels) of y-window x g."""
    bsz, h, w, cin = x.shape
    cout = g.shape[3]
    dt = x.dtype
    acc_dt = jnp.float32 if dt != jnp.float64 else jnp.float64
    n_rb = h // BR
    x, cin = _pad_lanes(x)
    a, _ = _pad_lanes(a)
    b, _ = _pad_lanes(b)
    return pl.pallas_call(
        functools.partial(
            _dk_kernel, br=BR, w=w, h=h, cin=cin, cout=cout,
            acc_dt=acc_dt, prefetch=True,
        ),
        grid=(bsz, n_rb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x in HBM, manual halo DMA
            pl.BlockSpec((1, BR, w, cout), lambda bb, rb: (bb, rb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda bb, rb: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda bb, rb: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9, cin, cout), lambda bb, rb: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, cin, cout), acc_dt),
        scratch_shapes=[
            pltpu.VMEM((2, BR + 2, w, cin), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, g, a.reshape(1, cin).astype(acc_dt), b.reshape(1, cin).astype(acc_dt))


def _tap_major(kernel):
    """HWIO (3,3,C,O) -> (C, 9*O), lane group ti*O..(ti+1)*O = tap ti."""
    c, o = kernel.shape[2], kernel.shape[3]
    return jnp.transpose(kernel.reshape(9, c, o), (1, 0, 2)).reshape(c, 9 * o)


def _tap_major_T(kernel):
    """Tap-reversed transposed kernel for conv_T: (O, 9*C).

    dx[p] = sum_t g[p - off_t] K_t^T = sum_t' g[p + off_t'] K_{8-t'}^T.
    """
    c, o = kernel.shape[2], kernel.shape[3]
    k9 = kernel.reshape(9, c, o)[::-1]           # tap-reversed
    return jnp.transpose(k9, (2, 0, 1)).reshape(o, 9 * c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_affine_conv3x3(x, a, b, kernel, interpret=None):
    """conv3x3(x*a + b, kernel), SAME zero pad, NHWC — fused Pallas fwd/bwd.

    x (B,H,W,C) bf16/f32; a, b (C,) f32 per-channel affine (the BN-train
    scale/shift); kernel (3,3,C,O) HWIO. Gradients flow to all four args.
    interpret=None auto-selects interpret mode off-TPU (CPU tests).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fwd_pallas(x, a, b, _tap_major(kernel.astype(x.dtype)),
                       interpret=interpret)


def _fused_fwd(x, a, b, kernel, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _fwd_pallas(x, a, b, _tap_major(kernel.astype(x.dtype)),
                      interpret=interpret)
    return out, (x, a, b, kernel)


def _fused_bwd(interpret, res, g):
    x, a, b, kernel = res
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    g = g.astype(x.dtype)
    dx, da_p, db_p = _dx_pallas(
        g, x, a, _tap_major_T(kernel.astype(x.dtype)), interpret=interpret
    )
    da = da_p.sum((0, 1, 2)).astype(a.dtype)
    db = db_p.sum((0, 1, 2)).astype(b.dtype)
    dk9 = _dk_pallas(x, g, a, b, interpret=interpret)
    c, o = kernel.shape[2], kernel.shape[3]
    dk9 = dk9[:, :c]  # drop zero-padded lane channels
    dk = dk9.reshape(3, 3, c, o)  # tap-major (9, C, O), TAPS order = HWIO
    return dx, da, db, dk.astype(kernel.dtype)


fused_affine_conv3x3.defvjp(_fused_fwd, _fused_bwd)
