"""Custom VJP for the fused Pallas sphere convolution (training fast path).

Forward: the halo-DMA kernel (sphere_conv_pallas).
Backward:
- dx: a mirror Pallas kernel over INVERSE tables. The forward reads
  out[i, j] += wcol[i,t,k,j] * x[rows[i,t,k], (stride*j + s[i,t,k]) mod W]
  contracted with K_t, so the transpose scatters
  dx[r, stride*j + s] += Σ_{(i,t,k): rows=r} wcol ⊙ (g[i] @ K_tᵀ)[j].
  The fan-in per input row is bounded (the forward's row halo is [-2, +1]),
  so the scatter becomes a fixed-size gather over (out-row, tap, neighbor)
  triples grouped per input row — no atomic scatter, XLA's weakest op here.
  * stride 1: target col = (j + s) mod W -> one circular roll per triple.
  * stride 2: target col = (2j + s) mod W = 2·((j + s//2) mod Wo) + (s mod 2)
    -> roll by s//2 into an even- or odd-parity accumulator; the two parity
    planes are interleaved into W columns OUTSIDE the kernel (one reshape).
- dK[t] = Σ_i s_t(x)[i]ᵀ g[i]: the per-tap weighted samples contracted with
  the cotangent — computed with the XLA gather formulation (one forward-
  equivalent pass; already efficient as a batched matmul).
- dbias = Σ g.

Covers stride 1 (the generator's hot path) and stride 2 (the
discriminator's front layers, reference stride pattern at
GenProjector/models/networks/discriminator.py:87-99, sphere sampling at
spherenet/sphere_cnn.py:111-124).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sphere_conv import compute_dtype_of, sphere_conv_gather, sphere_taps
from .sphere_conv_pallas import (
    _win_dma,
    scalar_weight_tables,
    sphere_conv_pallas,
    structured_tables,
)

__all__ = ["sphere_conv_trainable"]

# Per-shape dispatch, re-measured on v5e (bs8 bf16) after the full-width
# channel blocks + double-buffered halo prefetch (round 4, see BASELINE.md):
# every remaining gather crossover flipped to the fused kernels. fwd at
# cin=3 (the SPADE guide branch, previously gather at wide cout): pallas
# 10.2 vs 20.4 gather at 3->384 on 128x256. dk at cin=3: 10.1 vs 11.5; dk at
# wide cout: 9.5 vs 18.5 at 128->256 (128x256) and 6.0 vs 7.4 at 256->512
# (64x128) — the cout grid axis that re-ran the roll staging per block is
# gone, so dk cost no longer scales with cout tiles. Stride-1 fwd/dx/dk now
# dispatch to the fused kernels unconditionally (stride 2 keeps the
# measured-faster gather dk; the stride-2 fwd/dx kernels are used via
# pallas_sphere_convs(strides=(1, 2)) where profitable).

_MAX_FANIN = 64  # padded (i, t, k) triple count per input row (measured <= ~40)


@functools.lru_cache(maxsize=None)
def _inverse_flat_tables(h: int, w: int, stride: int = 1):
    """Per-INPUT-PIXEL inverse of the forward gather tables.

    For input pixel p: dx[p] = sum_m wv[p, m] * (g @ K_{tap}ᵀ)[src[p, m]]
    with src a flat index into the tap-major (9*P_out) axis. A pure-gather
    dx formulation: autodiff of the forward gather transposes into
    scatter-adds, which lower to `while` loops on TPU (the round-5 G-step
    trace measured 62.7 ms of them); this table gathers instead.

    Returns (src (P_in, F) int32 into 9*P_out, wv (P_in, F) f32, fanin F).
    """
    from .sphere_conv import sphere_taps

    idx, wgt, (ho, wo) = sphere_taps(h, w, stride)
    p_out = ho * wo
    entries: list[list[tuple[int, float]]] = [[] for _ in range(h * w)]
    for po in range(p_out):
        for t in range(9):
            for k in range(4):
                wv = float(wgt[po, t, k])
                if wv != 0.0:
                    entries[int(idx[po, t, k])].append((t * p_out + po, wv))
    fanin = max(1, max(len(e) for e in entries))
    src = np.zeros((h * w, fanin), np.int32)
    wv = np.zeros((h * w, fanin), np.float32)
    for p, e in enumerate(entries):
        for m, (s, v) in enumerate(e):
            src[p, m] = s
            wv[p, m] = v
    return src, wv, fanin


def _dx_gather_flat(g: jax.Array, kernel: jax.Array, x_shape, stride: int = 1):
    """Scatter-free XLA dx for the small shapes below the Pallas pixel gate."""
    b, ho, wo, cout = g.shape
    h, w, cin = x_shape[1], x_shape[2], x_shape[3]
    src, wv, fanin = _inverse_flat_tables(h, w, stride)
    dt = compute_dtype_of(g)
    # U[t] = g @ K_tᵀ, flattened tap-major: (B, 9*P_out, cin)
    kf = kernel.reshape(9, cin, cout).astype(dt)
    gf = g.reshape(b, ho * wo, cout).astype(dt)
    u = jnp.einsum("bpd,tcd->btpc", gf, kf).reshape(b, 9 * ho * wo, cin)
    picked = jnp.take(u, jnp.asarray(src.reshape(-1)), axis=1)
    picked = picked.reshape(b, h * w, fanin, cin)
    dx = jnp.einsum("bpmc,pm->bpc", picked, jnp.asarray(wv).astype(dt))
    return dx.reshape(b, h, w, cin).astype(jnp.float32)


@functools.lru_cache(maxsize=None)
def inverse_tables(h: int, w: int, stride: int = 1):
    """Group forward triples by their source row.

    Returns (out_rows, taps, shifts, w0, jdev, fanin):
      out_rows (H, M) int32 — contributing output row (weight-0 pad slots
               point at an in-window row, see below)
      taps     (H, M) int32
      shifts   (H, M) int32 — column shift s: input col = (stride*j + s) mod W
      w0       (H, M) f32 — the forward's constant per-out-column weight
      jdev     (H, M) int32 — zero-padded output column, -1 if none
               (see scalar_weight_tables: the per-column weight vector is
               where(col == jdev, 0, w0), exactly)
      fanin: max used M (<= _MAX_FANIN)
    """
    rows_c, shift_c, wcol = structured_tables(h, w, stride)
    w0_tab, jdev_tab = scalar_weight_tables(h, w, stride)
    ho = rows_c.shape[0]
    per_row: list[list[tuple[int, int, int]]] = [[] for _ in range(h)]
    for i in range(ho):
        for t in range(9):
            for k in range(4):
                if wcol[i, t, k].any():
                    per_row[rows_c[i, t, k]].append((i, t, k))
    fanin = max(len(v) for v in per_row)
    assert fanin <= _MAX_FANIN, fanin
    m = fanin
    # padded slots carry zero weight but MUST index inside the DMA window:
    # point them at the row's own output row (r // stride) — out_rows outside
    # the window would make the local index negative, and while interpret
    # mode wraps negative indices silently, real TPU hardware faults
    out_rows = np.repeat(
        np.clip(np.arange(h, dtype=np.int32) // stride, 0, ho - 1)[:, None], m, axis=1
    )
    taps = np.zeros((h, m), np.int32)
    shifts = np.zeros((h, m), np.int32)
    w0 = np.zeros((h, m), np.float32)
    jdev = np.full((h, m), -1, np.int32)
    for r in range(h):
        for j, (i, t, k) in enumerate(per_row[r]):
            out_rows[r, j] = i
            taps[r, j] = t
            shifts[r, j] = shift_c[i, t, k]
            w0[r, j] = w0_tab[i, t, k]
            jdev[r, j] = jdev_tab[i, t, k]
    return out_rows, taps, shifts, w0, jdev, fanin


def _dx_kernel_s1(orow_ref, tap_ref, shift_ref, w0_ref, jdev_ref, g_hbm, kt_ref,
                  dx_ref, win_ref, sems, *, br: int, w: int, win_rows: int,
                  h: int, fanin: int):
    rb = pl.program_id(1)
    r0 = rb * br
    # contributing output rows lie within [r0-1, r0+br+2) (inverse halo)
    start = jnp.clip(r0 - 1, 0, h - win_rows)
    b_idx = pl.program_id(0)
    dma = pltpu.make_async_copy(g_hbm.at[b_idx, pl.ds(start, win_rows)], win_ref, sems.at[0])
    dma.start()
    dma.wait()

    cinb = kt_ref.shape[-1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)

    def row_body(rr, _):
        def contrib(m, acc):
            i_local = orow_ref[0, rr, m] - start
            t = tap_ref[0, rr, m]
            s = shift_ref[0, rr, m]
            u = jnp.dot(win_ref[i_local], kt_ref[t], preferred_element_type=jnp.float32)
            wvec = jnp.where(col_ids == jdev_ref[0, rr, m], 0.0, w0_ref[0, rr, m])
            wu = wvec * u  # (w, cinb)
            return acc + pltpu.roll(wu, s, 0)

        acc = jax.lax.fori_loop(0, fanin, contrib, jnp.zeros((w, cinb), jnp.float32))
        dx_ref[0, rr] = acc
        return 0

    jax.lax.fori_loop(0, br, row_body, 0)


def _dx_win_dma(g_hbm, win_ref, sems, b_idx, rb, slot, *, br, ho, win_rows):
    """Descriptor for the inverse-halo g window of row block rb -> slot."""
    start = jnp.clip(rb * br - 1, 0, ho - win_rows)
    return pltpu.make_async_copy(
        g_hbm.at[b_idx, pl.ds(start, win_rows)], win_ref.at[slot], sems.at[slot]
    )


def _dx_kernel_s1_umajor(orow_ref, tap_ref, shift_ref, w0_ref, jdev_ref, g_hbm,
                         kt_ref, dx_ref, win_ref, u_ref, sems, *, br: int, w: int,
                         win_rows: int, h: int, fanin: int, prefetch: bool):
    """U-major stride-1 dx: precompute U[t, jw] = g[jw] @ K_tᵀ for the whole
    window (9 large MXU matmuls) so the fan-in loop is pure roll+fma. ~4x on
    high-resolution layers vs the per-triple matmul in _dx_kernel_s1, which
    recomputes u for each of a tap's ≤4 bilinear neighbors; below 128x256 the
    per-triple variant stays faster (scratch traffic dominates small windows).
    Bit-exact vs _dx_kernel_s1 (same contraction order per contribution).
    Default is one full-width cin block (mirrors the forward: a cin grid axis
    re-DMA'd the g window per block) with the window double-buffered."""
    rb = pl.program_id(1)
    b_idx = pl.program_id(0)
    n_rb = pl.num_programs(1)
    r0 = rb * br
    start = jnp.clip(r0 - 1, 0, h - win_rows)
    dma = functools.partial(
        _dx_win_dma, g_hbm, win_ref, sems, br=br, ho=h, win_rows=win_rows
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

    cinb = kt_ref.shape[-1]
    cout = kt_ref.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)

    def compute(win):
        gflat = win[...].reshape(win_rows * w, cout)

        def tap_body(t, _):
            u = jnp.dot(gflat, kt_ref[t], preferred_element_type=jnp.float32)
            # tap-major layout: a single dynamic sublane-block index at read
            u_ref[pl.ds(t * win_rows, win_rows)] = u.reshape(win_rows, w, cinb)
            return 0

        jax.lax.fori_loop(0, 9, tap_body, 0, unroll=True)

        def row_body(rr, _):
            def contrib(m, acc):
                i_local = orow_ref[0, rr, m] - start
                t = tap_ref[0, rr, m]
                s = shift_ref[0, rr, m]
                wvec = jnp.where(
                    col_ids == jdev_ref[0, rr, m], 0.0, w0_ref[0, rr, m]
                )
                wu = wvec * u_ref[t * win_rows + i_local]
                return acc + pltpu.roll(wu, s, 0)

            acc = jax.lax.fori_loop(
                0, fanin, contrib, jnp.zeros((w, cinb), jnp.float32)
            )
            dx_ref[0, rr] = acc
            return 0

        jax.lax.fori_loop(0, br, row_body, 0)

    if prefetch:
        @pl.when(slot == 0)
        def _even():
            compute(win_ref.at[0])

        @pl.when(slot == 1)
        def _odd():
            compute(win_ref.at[1])

    else:
        compute(win_ref.at[0])


# U-major wins at every measured resolution once the weight window moved to
# SMEM scalars (64x128 256ch: 5.8 vs 11.3; 32x64 512ch: 4.6 vs 11.1); keep
# the per-triple variant only for tiny unmeasured shapes
_UMAJOR_MIN_PIXELS = 2048


def _dx_kernel_s2(orow_ref, tap_ref, shift_ref, w0_ref, jdev_ref, g_hbm, kt_ref,
                  dxe_ref, dxo_ref, win_ref, sems,
                  *, br: int, wo: int, win_rows: int, ho: int, fanin: int):
    rb = pl.program_id(1)
    r0 = rb * br
    # input rows [r0, r0+br) receive from output rows in
    # [floor((r0-1)/2), floor((r0+br+1)/2)] — a (br/2 + 3)-row window
    start = jnp.clip((r0 - 1) // 2, 0, ho - win_rows)
    b_idx = pl.program_id(0)
    dma = pltpu.make_async_copy(g_hbm.at[b_idx, pl.ds(start, win_rows)], win_ref, sems.at[0])
    dma.start()
    dma.wait()

    cinb = kt_ref.shape[-1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (wo, 1), 0)

    def row_body(rr, _):
        def contrib(m, accs):
            acc_e, acc_o = accs
            i_local = orow_ref[0, rr, m] - start
            t = tap_ref[0, rr, m]
            s = shift_ref[0, rr, m]
            u = jnp.dot(win_ref[i_local], kt_ref[t], preferred_element_type=jnp.float32)
            wvec = jnp.where(col_ids == jdev_ref[0, rr, m], 0.0, w0_ref[0, rr, m])
            wu = wvec * u  # (wo, cinb)
            rolled = pltpu.roll(wu, s // 2, 0)
            is_even = (s % 2 == 0)
            acc_e = acc_e + jnp.where(is_even, rolled, 0.0)
            acc_o = acc_o + jnp.where(is_even, 0.0, rolled)
            return acc_e, acc_o

        zero = jnp.zeros((wo, cinb), jnp.float32)
        acc_e, acc_o = jax.lax.fori_loop(0, fanin, contrib, (zero, zero))
        dxe_ref[0, rr] = acc_e
        dxo_ref[0, rr] = acc_o
        return 0

    jax.lax.fori_loop(0, br, row_body, 0)


def _dx_pallas(g: jax.Array, kernel: jax.Array, x_shape, stride: int = 1,
               block_rows: int = 8, cin_block: int | None = None,
               interpret: bool | None = None) -> jax.Array:
    """dx from the cotangent g (B, Ho, Wo, Cout) and kernel (3,3,Cin,Cout)."""
    b, ho, wo, cout = g.shape
    h, w = x_shape[1], x_shape[2]
    cin = x_shape[-1]
    pad_cin = 0
    if cin < 128:
        pad_cin = 128 - cin
    if cout < 128:
        # dynamic rotate needs full lane tiles on u = g @ KT -> pad cout too
        g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, 128 - cout)))
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, 0), (0, 128 - cout)))
        cout = 128
    if pad_cin:
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, pad_cin), (0, 0)))
        cin = 128

    dt = compute_dtype_of(g)
    if dt not in (jnp.float32, jnp.bfloat16):
        dt = jnp.float32
    out_rows, taps, shifts, w0_inv, jdev_inv, fanin = inverse_tables(h, w, stride)
    br = min(block_rows, h)
    if h % br:
        raise ValueError(f"h={h} not divisible by block_rows={br}")
    cb = min(cin_block, cin) if cin_block else cin
    if cin % cb:
        cb = cin
    win_rows = min(br + 3, ho) if stride == 1 else min(br // 2 + 3, ho)
    # The U-major scratch (9*win_rows, wo, cb) f32 scales linearly with the
    # cin block; a wide-cin layer at high resolution can exceed the VMEM
    # budget with cb == cin (ADVICE r4). Estimate the footprint and halve cb
    # until it fits (cb < cin turns off the revolving-window prefetch, which
    # the blocked path never used).
    _VMEM_BUDGET = int(120 * 1024 * 1024 * 0.8)

    def _umajor_bytes(cb_):
        u = 9 * win_rows * wo * cb_ * 4
        gwin = (2 if cb_ == cin else 1) * win_rows * wo * cout * jnp.dtype(dt).itemsize
        return u + gwin

    while cb > 128 and _umajor_bytes(cb) > _VMEM_BUDGET and cin % (cb // 2) == 0:
        cb //= 2
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kt = jnp.transpose(kernel.reshape(9, cin, cout), (0, 2, 1))  # (9, cout, cin)

    smem = lambda blk, ix: pl.BlockSpec(blk, ix, memory_space=pltpu.SMEM)
    in_specs = [
        smem((1, br, fanin), lambda bb, rb, cb_: (0, rb, 0)),
        smem((1, br, fanin), lambda bb, rb, cb_: (0, rb, 0)),
        smem((1, br, fanin), lambda bb, rb, cb_: (0, rb, 0)),
        smem((1, br, fanin), lambda bb, rb, cb_: (0, rb, 0)),
        smem((1, br, fanin), lambda bb, rb, cb_: (0, rb, 0)),
        pl.BlockSpec(memory_space=pl.ANY),  # g in HBM, DMA'd
        pl.BlockSpec((9, cout, cb), lambda bb, rb, cb_: (0, 0, cb_),
                     memory_space=pltpu.VMEM),
    ]
    args = (
        jnp.asarray(out_rows)[None], jnp.asarray(taps)[None],
        jnp.asarray(shifts)[None], jnp.asarray(w0_inv)[None],
        jnp.asarray(jdev_inv)[None],
        g.astype(dt), kt.astype(dt),
    )
    scratch = [
        pltpu.VMEM((win_rows, wo, cout), dt),
        pltpu.SemaphoreType.DMA((1,)),
    ]
    # the U-major variant's tap-major scratch peaks ~112MB at 128x256/cb=128
    params = pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)
    grid = (b, h // br, cin // cb)
    prefetch = cb == cin

    if stride == 1:
        umajor = h * w >= _UMAJOR_MIN_PIXELS
        kern = _dx_kernel_s1_umajor if umajor else _dx_kernel_s1
        kw = {}
        if umajor:
            kw["prefetch"] = prefetch
            scratch = [
                pltpu.VMEM((2 if prefetch else 1, win_rows, wo, cout), dt),
                pltpu.VMEM((9 * win_rows, wo, cb), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        dx = pl.pallas_call(
            functools.partial(
                kern, br=br, w=wo, win_rows=win_rows, h=ho, fanin=fanin, **kw
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, br, wo, cb), lambda bb, rb, cb_: (bb, rb, 0, cb_),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, h, wo, cin), jnp.float32),
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interpret,
        )(*args)
    else:
        # two parity planes (even/odd target columns), interleaved below
        out_spec = pl.BlockSpec((1, br, wo, cb), lambda bb, rb, cb_: (bb, rb, 0, cb_),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, h, wo, cin), jnp.float32)
        dx_e, dx_o = pl.pallas_call(
            functools.partial(
                _dx_kernel_s2, br=br, wo=wo, win_rows=win_rows, ho=ho, fanin=fanin
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=(out_spec, out_spec),
            out_shape=(out_shape, out_shape),
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interpret,
        )(*args)
        dx = jnp.stack((dx_e, dx_o), axis=-2).reshape(b, h, w, cin)
    if pad_cin:
        dx = dx[..., : cin - pad_cin]
    return dx


def _dk_kernel(rows_ref, shifts_ref, w0_ref, jdev_ref, x_hbm, g_ref, dk_ref,
               win_ref, s_ref, sems, *, br: int, w: int, win_rows: int,
               stride: int, h: int, prefetch: bool):
    """dK[t] += s_t(x)ᵀ @ g, one row block per grid step.

    The staging of the per-tap sampled block s_t mirrors the forward kernel
    exactly (same halo window, same roll-per-neighbor), so the input is read
    from HBM once — the XLA gather formulation (_dk_gather) re-reads it 36x.
    The dk output block has a constant index_map: it stays resident in VMEM
    and accumulates across the whole (batch, row-block) grid. Like the
    forward, the staging does NOT depend on cout, so the default is one
    full-width cout block (a cout grid axis re-ran all the rolls per block)
    with the halo window double-buffered across grid steps."""
    rb = pl.program_id(1)
    b_idx = pl.program_id(0)
    n_rb = pl.num_programs(1)
    src0 = rb * br * stride
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
    else:
        slot = 0
        dma(b_idx, rb, 0).start()

    @pl.when(jnp.logical_and(b_idx == 0, rb == 0))
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)

    dma(b_idx, rb, slot).wait()
    if prefetch:
        total = pl.num_programs(0) * n_rb

        @pl.when(step + 1 < total)
        def _prefetch():
            nxt = step + 1
            dma(nxt // n_rb, jax.lax.rem(nxt, n_rb), 1 - slot).start()

    cin = win_ref.shape[-1]
    cout = g_ref.shape[-1]
    w_in = win_ref.shape[2]
    gmat = g_ref[0].reshape(br * w, cout)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)

    def compute(win):
        def tap_body(t, _):
            def row_body(ii, _):
                s_row = jnp.zeros((w, cin), win_ref.dtype)

                def nb_body(k, s_row):
                    r_local = rows_ref[0, ii, t, k] - start
                    shift = shifts_ref[0, ii, t, k]
                    row = win[r_local]
                    if row.dtype != jnp.float32:
                        shifted = pltpu.roll(
                            row.astype(jnp.float32), w_in - shift, 0
                        ).astype(row.dtype)
                    else:
                        shifted = pltpu.roll(row, w_in - shift, 0)
                    if stride > 1:
                        shifted = shifted.reshape(w, stride, cin)[:, 0, :]
                    wvec = jnp.where(
                        col_ids == jdev_ref[0, ii, t, k], 0.0,
                        w0_ref[0, ii, t, k],
                    ).astype(win_ref.dtype)
                    return s_row + wvec * shifted

                s_ref[ii] = jax.lax.fori_loop(0, 4, nb_body, s_row)
                return 0

            jax.lax.fori_loop(0, br, row_body, 0)
            smat = s_ref[:].reshape(br * w, cin)
            dk_ref[t] += jax.lax.dot_general(
                smat, gmat.astype(smat.dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return 0

        jax.lax.fori_loop(0, 9, tap_body, 0)

    if prefetch:
        @pl.when(slot == 0)
        def _even():
            compute(win_ref.at[0])

        @pl.when(slot == 1)
        def _odd():
            compute(win_ref.at[1])

    else:
        compute(win_ref.at[0])


def _dk_pallas(x: jax.Array, g: jax.Array, stride: int = 1,
               block_rows: int = 8, cout_block: int | None = None,
               interpret: bool | None = None) -> jax.Array:
    """dK (3, 3, Cin, Cout) from x (B, H, W, Cin) and cotangent g (B, Ho, Wo, Cout)."""
    b, h, w, cin0 = x.shape
    cout0 = g.shape[-1]
    dt = compute_dtype_of(x)
    if dt not in (jnp.float32, jnp.bfloat16):
        dt = jnp.float32
    # in-kernel dynamic rotate needs full 128-lane tiles on the x window
    cin = cin0
    if cin < 128:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 128 - cin)))
        cin = 128
    cout = cout0
    if cout < 8:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, 8 - cout)))
        cout = 8

    rows_c, shift_c, wcol = structured_tables(h, w, stride)
    w0_tab, jdev_tab = scalar_weight_tables(h, w, stride)
    ho, wo = wcol.shape[0], wcol.shape[3]
    br = min(block_rows, ho)
    if ho % br:
        raise ValueError(f"ho={ho} not divisible by block_rows={br}")
    cb = min(cout_block, cout) if cout_block else cout
    if cout % cb:
        cb = cout
    win_rows = min(br * stride + 4, h)
    prefetch = cb == cout
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    dk = pl.pallas_call(
        functools.partial(
            _dk_kernel, br=br, w=wo, win_rows=win_rows, stride=stride, h=h,
            prefetch=prefetch,
        ),
        grid=(b, ho // br, cout // cb),
        in_specs=[
            pl.BlockSpec((1, br, 9, 4), lambda bb, rb, cb_: (0, rb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, br, 9, 4), lambda bb, rb, cb_: (0, rb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, br, 9, 4), lambda bb, rb, cb_: (0, rb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, br, 9, 4), lambda bb, rb, cb_: (0, rb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # x in HBM, DMA'd
            pl.BlockSpec((1, br, wo, cb), lambda bb, rb, cb_: (bb, rb, 0, cb_),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9, cin, cb), lambda bb, rb, cb_: (0, 0, cb_),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, cin, cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 if prefetch else 1, win_rows, w, cin), dt),
            pltpu.VMEM((br, wo, cin), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray(rows_c)[None], jnp.asarray(shift_c)[None],
        jnp.asarray(w0_tab)[None], jnp.asarray(jdev_tab)[None],
        x.astype(dt), g.astype(dt),
    )
    return dk[:, :cin0, :cout0].reshape(3, 3, cin0, cout0)


def _dk_gather(x: jax.Array, g: jax.Array, cout: int, stride: int = 1) -> jax.Array:
    """dK via the XLA gather formulation: dK[t] = Σ sampled_tᵀ g."""
    b, h, w, cin = x.shape
    idx, wgt, (ho, wo) = sphere_taps(h, w, stride)
    dt = compute_dtype_of(x)
    xf = x.reshape(b, h * w, cin).astype(dt)
    gf = g.reshape(b, ho * wo, cout).astype(dt)
    idx_t = jnp.asarray(idx.transpose(1, 0, 2))
    wgt_t = jnp.asarray(wgt.transpose(1, 0, 2)).astype(dt)

    def body(_, tap):
        t_idx, t_wgt = tap
        s = 0.0
        for k in range(4):
            s = s + jnp.take(xf, t_idx[:, k], axis=1) * t_wgt[:, k][None, :, None]
        dk_t = jnp.einsum("bpc,bpd->cd", s, gf, preferred_element_type=jnp.float32)
        return None, dk_t

    _, dk = jax.lax.scan(body, None, (idx_t, wgt_t))
    return dk.reshape(3, 3, cin, cout)


def _fwd_impl(x, kernel, bias, stride):
    # the FORWARD dispatches per stride and size: the stride-2 fused forward
    # measured 0.4-0.9x vs gather (cin=3/64 fronts pad to the 128-lane tile)
    # so it stays gather unless pallas_sphere_convs(strides=(1, 2)) opts in,
    # and low-resolution layers keep the gather forward (kernel loop overhead
    # loses below the pixel gate) — but the BACKWARD below is always
    # scatter-free (see _bwd)
    from . import sphere_conv as _sc

    if (stride in _sc._PALLAS_STRIDES
            and x.shape[1] * x.shape[2] >= _sc._PALLAS_MIN_PIXELS):
        return sphere_conv_pallas(x, kernel, bias, stride)
    return _sc.sphere_conv_gather(x, kernel, bias, stride)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sphere_conv_trainable(x, kernel, bias, stride: int = 1):
    """Sphere conv with per-shape-dispatched forward and backward kernels.

    Wrapping even the gather-formulation forward in this custom VJP matters
    twice over: (a) the dx Pallas call is a pure custom-call XLA can
    dead-code-eliminate when the input cotangent is unused (the SPADE guide
    branch — its input is the constant rasterized guide), whereas autodiff of
    the scanned gather would bury the dx work inside the backward scan where
    it can't be pruned; (b) autodiff of the gather formulation transposes the
    gathers into SCATTER-ADDs, which lower to `while` loops on TPU — the
    round-5 G-step trace put 62.7 ms of the 285 ms step on those whiles
    (stride-2 discriminator fronts inside the G backward). The U-major
    Pallas dx replaces them at every stride.
    """
    return _fwd_impl(x, kernel, bias, stride)


def _fwd(x, kernel, bias, stride):
    return _fwd_impl(x, kernel, bias, stride), (x, kernel, bias is not None)


def _bwd(stride, res, g):
    assert stride in (1, 2), "trainable pallas path covers stride 1 and 2"
    x, kernel, has_bias = res
    from . import sphere_conv as _sc

    big = x.shape[1] * x.shape[2] >= _sc._PALLAS_MIN_PIXELS
    # dx is NEVER a scatter: Pallas U-major above the pixel gate, the flat
    # inverse-gather formulation below it
    if big:
        dx = _dx_pallas(g, kernel, x.shape, stride)
    else:
        dx = _dx_gather_flat(g, kernel, x.shape, stride)
    # stride 2 measures 0.4-0.9x in the fused dk (the halo window doubles and
    # the cin=3 discriminator front pads to 128 lanes): always gather there.
    use_pallas_dk = stride == 1 and big
    dk = _dk_pallas(x, g, stride) if use_pallas_dk else _dk_gather(x, g, g.shape[-1], stride)
    db = g.sum(axis=(0, 1, 2)) if has_bias else None
    return dx, dk, db


sphere_conv_trainable.defvjp(_fwd, _bwd)
