"""Fused Pallas TPU kernel for the distortion-aware sphere convolution.

The XLA gather formulation (nn/sphere_conv.py) re-reads the feature map from
HBM 36x per conv (9 taps x 4 bilinear neighbors) and measures ~8x slower than
a dense conv. This kernel exploits the structure of the gnomonic sampling
pattern (verified at table-build time):

- the sampled ROW of every (output-row i, tap t, neighbor k) lies within
  [i-2, i+1] of the (stride-scaled) source row -> a 4-row halo window per
  output row block, DMA'd HBM->VMEM once;
- the sampled COLUMN is a constant circular shift s(i, t, k) of the output
  column -> a dynamic slice of the doubled row buffer, no gather at all;
- per-column bilinear weights w(i, t, k, j) fold the reference's zero-padding
  seam behavior (sphere_cnn.py:54-55 wraps, grid_sample zero-pads the
  half-open edges) into the weight table.

Each tap then contributes one (W, Cin) x (Cin, Cout) MXU matmul. HBM traffic
drops from 36 reads to ~1 read of the input per conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sphere_conv import compute_dtype_of, sphere_taps

__all__ = ["sphere_conv_pallas", "structured_tables", "scalar_weight_tables"]


@functools.lru_cache(maxsize=None)
def structured_tables(h: int, w: int, stride: int = 1):
    """Decompose the gather tables into (row, shift, per-column weight).

    Returns:
      rows:   (Ho, 9, 4) int32 — source row, clamped into [0, h)
      shifts: (Ho, 9, 4) int32 — circular column shift (out col j reads
              input col (j*stride + shift) mod w ... for stride 1; for
              stride 2 the table stores absolute source columns per out col)
      wcol:   (Ho, 9, 4, Wo) float32 — bilinear weight per output column
    """
    idx, wgt, (ho, wo) = sphere_taps(h, w, stride)
    idx = idx.reshape(ho, wo, 9, 4)
    wgt = wgt.reshape(ho, wo, 9, 4)
    rows = idx // w  # already clamped by table construction
    cols = idx % w
    j = (np.arange(wo) * stride)[None, :, None, None]
    shift = (cols - j) % w
    # rows and shifts are column-independent wherever the weight is nonzero;
    # pick the first nonzero-weight column as the canonical value
    mask = wgt > 0
    # fall back to column 0 when a whole (i,t,k) row is dead (weight 0)
    first = np.argmax(mask, axis=1)  # (ho, 9, 4)
    gi, gt, gk = np.meshgrid(np.arange(ho), np.arange(9), np.arange(4), indexing="ij")
    rows_c = rows[gi, first, gt, gk].astype(np.int32)
    shift_c = shift[gi, first, gt, gk].astype(np.int32)
    # sanity: the structured decomposition must reproduce the exact tables
    recon_cols = (j + shift_c[:, None, :, :]) % w
    assert ((recon_cols == cols) | ~mask).all(), "column structure violated"
    assert ((rows_c[:, None, :, :] == rows) | ~mask).all(), "row structure violated"
    # (ho, 9, 4, wo, 1): weights arrive in VMEM with wo on the SUBLANE axis —
    # a lane-oriented (wo,) vector would need a relayout to broadcast against
    # the (wo, cin) sampled rows (Mosaic rejects it for most cin)
    wcol = np.ascontiguousarray(wgt.transpose(0, 2, 3, 1))[..., None].astype(np.float32)
    return rows_c, shift_c, wcol


@functools.lru_cache(maxsize=None)
def scalar_weight_tables(h: int, w: int, stride: int = 1):
    """Decompose wcol into (scalar, dead-column) form.

    Every (i, t, k) weight row is a single constant w0 across all output
    columns except AT MOST one column where grid_sample's zero-padding of the
    half-open wrap edge (sphere_cnn.py:54-55 wraps columns; the j -> j+1
    neighbor of the last column lands on the zero pad) kills it to exactly 0.
    Verified exhaustively at table-build time for both strides. The kernels
    rebuild the per-column weight vector from two scalars —
    where(col == jdev, 0, w0) — which is bit-identical to the dense table
    while replacing its VMEM window (the padded (.., wo, 1) block was the
    kernels' dominant allocation: 1 real lane padded to 128) with SMEM.

    Returns:
      w0:   (Ho, 9, 4) float32 — the constant weight (0 for dead entries)
      jdev: (Ho, 9, 4) int32 — zero-padded output column, or -1 if none
    """
    _, _, wcol = structured_tables(h, w, stride)
    wall = wcol[..., 0]  # (ho, 9, 4, wo)
    w0 = wall.max(axis=3)
    dev = (wall != w0[..., None]) & (w0[..., None] > 0)
    assert (dev.sum(axis=3) <= 1).all(), "more than one deviating column"
    assert (wall[dev] == 0).all(), "deviating weight is not the zero pad"
    jdev = np.where(dev.any(axis=3), dev.argmax(axis=3), -1).astype(np.int32)
    # exact reconstruction (the kernels' in-VMEM math mirrors this)
    cols = np.arange(wall.shape[3])
    recon = np.where(cols[None, None, None] == jdev[..., None], 0.0, w0[..., None])
    assert (recon == wall).all(), "scalar decomposition is not exact"
    return w0.astype(np.float32), jdev


def _win_dma(x_hbm, win_ref, sems, b_idx, rb, slot, *, br, stride, h, win_rows):
    """Descriptor for the (b_idx, rb) halo window -> revolving slot."""
    start = jnp.clip(rb * br * stride - 2, 0, h - win_rows)
    return pltpu.make_async_copy(
        x_hbm.at[b_idx, pl.ds(start, win_rows)], win_ref.at[slot], sems.at[slot]
    )


def _kernel(rows_ref, shifts_ref, w0_ref, jdev_ref, x_hbm, k_ref, b_ref, out_ref,
            win_ref, s_ref, sems, *, br: int, w: int, win_rows: int, stride: int,
            h: int, prefetch: bool):
    """Generic body for stride 1 and 2. The halo window is DMA'd HBM->VMEM
    once per row block — double-buffered across grid steps when the cout
    axis is a single block (the ablation put the serial DMA at ~4 ms of the
    15.9 ms 128x256 forward: latency-bound, ~15 us per grid step). Circular
    column shifts use the native dynamic rotate (Mosaic has no dynamic_slice
    on values)."""
    rb = pl.program_id(1)
    b_idx = pl.program_id(0)
    n_rb = pl.num_programs(1)
    src0 = rb * br * stride
    # window start clamped so [start, start+win_rows) stays in range
    start = jnp.clip(src0 - 2, 0, h - win_rows)

    dma = functools.partial(
        _win_dma, x_hbm, win_ref, sems, br=br, stride=stride, h=h,
        win_rows=win_rows,
    )
    if prefetch:
        step = b_idx * n_rb + rb
        slot = jax.lax.rem(step, 2)

        @pl.when(step == 0)
        def _first():
            dma(b_idx, rb, slot).start()

        dma(b_idx, rb, slot).wait()
        total = pl.num_programs(0) * n_rb

        @pl.when(step + 1 < total)
        def _prefetch():
            nxt = step + 1
            dma(nxt // n_rb, jax.lax.rem(nxt, n_rb), 1 - slot).start()

    else:
        slot = 0
        d = dma(b_idx, rb, slot)
        d.start()
        d.wait()

    bias = b_ref[:]  # (1, cout_block)
    cin = k_ref.shape[1]
    w_in = win_ref.shape[2]
    # per-column weights are a constant with at most one zero-padded column
    # (scalar_weight_tables): rebuild the (wo, 1) vector from two scalars
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)

    # one (br*W, Cin) x (Cin, Cout) MXU matmul per tap: the per-row sampled
    # block is staged in s_ref, then all rows multiply at once
    def compute(win):
        # `win` is a STATICALLY indexed slot of the revolving buffer: a
        # traced slot index on the 288-iteration read path measured ~2 ms
        # slower than unrolling the body per parity (dynamic base address
        # on every row read)
        def tap_body(t, acc):
            def row_body(ii, _):
                s_row = jnp.zeros((w, cin), win_ref.dtype)

                def nb_body(k, s_row):
                    r_local = rows_ref[0, ii, t, k] - start
                    shift = shifts_ref[0, ii, t, k]
                    # circular shift on the sublane axis via the native
                    # dynamic rotate (dynamic-start sublane slices don't
                    # lower). Mosaic only rotates 32-bit lanes: roll in f32,
                    # cast back — the DMA, staging, and matmul stay in the
                    # compute dtype. (Per-triple lax.cond fast paths for
                    # shift==0 / no-dead-column were measured SLOWER than the
                    # straight-line rotate+where: 288 scalar branches per
                    # grid step beat the vector work saved.)
                    row = win[r_local]
                    if row.dtype != jnp.float32:
                        shifted = pltpu.roll(
                            row.astype(jnp.float32), w_in - shift, 0
                        ).astype(row.dtype)
                    else:
                        shifted = pltpu.roll(row, w_in - shift, 0)
                    if stride > 1:
                        # out col j samples input col stride*j + shift
                        shifted = shifted.reshape(w, stride, cin)[:, 0, :]
                    wvec = jnp.where(
                        col_ids == jdev_ref[0, ii, t, k], 0.0,
                        w0_ref[0, ii, t, k],
                    ).astype(win_ref.dtype)
                    return s_row + wvec * shifted  # (wo,1)*(wo,cin)

                s_ref[ii] = jax.lax.fori_loop(0, 4, nb_body, s_row)
                return 0

            jax.lax.fori_loop(0, br, row_body, 0)
            smat = s_ref[:].reshape(br * w, cin)
            return acc + jnp.dot(
                smat, k_ref[t], preferred_element_type=jnp.float32
            )

        acc = jax.lax.fori_loop(
            0, 9, tap_body, jnp.zeros((br * w, k_ref.shape[-1]), jnp.float32)
        )
        out_ref[0] = (acc + bias).reshape(br, w, k_ref.shape[-1])

    if prefetch:
        @pl.when(slot == 0)
        def _even():
            compute(win_ref.at[0])

        @pl.when(slot == 1)
        def _odd():
            compute(win_ref.at[1])

    else:
        compute(win_ref.at[0])


def auto_block_rows(h: int, w: int, stride: int, dt) -> int:
    """Row-block size when the caller doesn't pin one.

    With the weight tables collapsed to SMEM scalars (scalar_weight_tables)
    the halo-DMA traffic the old br=16 config amortized is gone with the
    wcol window, and SMEM — not VMEM — is the binding constraint: Mosaic's
    SMEM budget at br=16 sits within ~4KB of the 1MB cap and the two extra
    scalar tables push it over. br=8 with scalar weights measures faster
    than the old br=16 anyway (15.7 vs 21.0 ms on the 128x256 128->256
    forward, v5e bs8 bf16).
    """
    return 8


def sphere_conv_pallas(x: jax.Array, kernel: jax.Array, bias: jax.Array | None,
                       stride: int = 1, block_rows: int | None = None,
                       cout_block: int | None = None,
                       interpret: bool | None = None) -> jax.Array:
    """Drop-in replacement for sphere_conv_apply (stride 1 or 2).

    x: (B, H, W, Cin) f32; kernel (3, 3, Cin, Cout) HWIO; out (B, Ho, Wo, Cout).
    block_rows None = auto (see auto_block_rows). cout_block None = the whole
    Cout in one block: the grid's cout axis re-ran ALL the staging (rolls +
    weights) per block, which the ablation (scripts/exp_kernel_ablate.py)
    measured as the kernel's dominant cost — one full-width block took the
    128x256 128->256 forward from 15.9 to 10.0 ms, and every SPADE/D shape
    fits the kernel+accumulator in VMEM comfortably (9*cin*cout*2B + the
    (br*wo, cout) f32 accumulator: ~5.7 MB at 512->512, 32x64).
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    dt = compute_dtype_of(x)
    if dt not in (jnp.float32, jnp.bfloat16):
        dt = jnp.float32
    if block_rows is None:
        block_rows = auto_block_rows(h, w, stride, dt)
    # The in-kernel dynamic rotate needs full 128-lane tiles; VMEM pads the
    # lane dim to 128 regardless, so zero-padding cin up to 128 costs nothing
    # (zeros contribute nothing to the matmul).
    if cin < 128:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 128 - cin)))
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, 128 - cin), (0, 0)))
        cin = 128
    pad_out = 0
    if cout < 8:
        pad_out = 8 - cout
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, 0), (0, pad_out)))
        if bias is not None:
            bias = jnp.pad(bias, (0, pad_out))
        cout = 8
    rows_c, shift_c, wcol = structured_tables(h, w, stride)
    w0_tab, jdev_tab = scalar_weight_tables(h, w, stride)
    ho, wo = wcol.shape[0], wcol.shape[3]  # wcol is (ho, 9, 4, wo, 1)

    br = min(block_rows, ho)
    n_rb = pl.cdiv(ho, br)
    if ho % br:
        raise ValueError(f"ho={ho} not divisible by block_rows={br}")
    cb = min(cout_block, cout) if cout_block else cout
    n_cb = pl.cdiv(cout, cb)
    if cout % cb:
        cb = cout  # small heads: single block
        n_cb = 1
    win_rows = min(br * stride + 4, h)
    prefetch = n_cb == 1  # revolving halo buffer (window is per (b, rb))

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kflat = kernel.reshape(9, cin, cout)
    bias_in = (bias if bias is not None else jnp.zeros(cout, x.dtype)).reshape(1, cout)

    # stride-2 tables store source columns for out col j at input col j*2 +
    # shift; fold the *2 into the shift so the kernel slices the doubled row
    # at (j + shift') — only valid when wo == w (stride 1). For stride 2 the
    # kernel instead slices at (2j + shift): implemented by sampling a
    # strided slice of the shifted doubled row.
    grid = (b, n_rb, n_cb)

    out = pl.pallas_call(
        functools.partial(
            _kernel, br=br, w=wo, win_rows=win_rows, stride=stride, h=h,
            prefetch=prefetch,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, br, 9, 4), lambda bb, rb, cb_: (0, rb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, br, 9, 4), lambda bb, rb, cb_: (0, rb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, br, 9, 4), lambda bb, rb, cb_: (0, rb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, br, 9, 4), lambda bb, rb, cb_: (0, rb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM, DMA'd manually
            pl.BlockSpec((9, cin, cb), lambda bb, rb, cb_: (0, 0, cb_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb), lambda bb, rb, cb_: (0, cb_), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, br, wo, cb), lambda bb, rb, cb_: (bb, rb, 0, cb_),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 if prefetch else 1, win_rows, w, cin), dt),
            pltpu.VMEM((br, wo, cin), dt),                    # per-tap staging
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray(rows_c)[None], jnp.asarray(shift_c)[None],
        jnp.asarray(w0_tab)[None], jnp.asarray(jdev_tab)[None],
        x.astype(dt), kflat.astype(dt), bias_in.astype(jnp.float32),
    )
    if pad_out:
        out = out[..., : cout - pad_out]
    return out
