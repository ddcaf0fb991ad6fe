"""Distortion-aware spherical convolution on equirectangular feature maps.

The reference (GenProjector/models/networks/spherenet/sphere_cnn.py:31-124)
computes, per output pixel, 9 gnomonic (great-circle) sample locations, then
resamples the feature map to (3H, 3W) with grid_sample and applies a stride-3
conv — a 9x activation blow-up and a scatter-heavy access pattern.

TPU-native design here:
- the sample locations depend only on (h, w, stride), so the bilinear taps are
  precomputed host-side into flat gather indices + weights (one table per
  shape, lru-cached);
- the conv itself becomes 9 accumulated [gather -> (P, Cin) x (Cin, Cout)]
  matmul steps on the MXU (an im2col where the im2col is a weighted gather) —
  no (3H, 3W) intermediate;
- grid_sample parity is kept exactly: align_corners=False half-pixel shift,
  zero padding outside the image, horizontal wrap applied to the *unsampled*
  column index only (sphere_cnn.py:54-55), center tap pinned to the source
  pixel (sphere_cnn.py:57).
"""

from __future__ import annotations

import contextlib
import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SphereConv2D", "SphereMaxPool2D", "sphere_taps", "sphere_gather",
           "sphere_conv_gather"]


@functools.lru_cache(maxsize=None)
def _kernel_offsets(delta_phi: float, delta_theta: float) -> np.ndarray:
    """Tangent-plane offsets (x, y) of the 3x3 kernel (sphere_cnn.py:10-28)."""
    tp, tt = np.tan(delta_phi), np.tan(delta_theta)
    ct = np.cos(delta_theta)
    ys = np.array([tp, 0.0, -tp])
    xs = np.array([-tt, 0.0, tt])
    off = np.zeros((3, 3, 2))
    for r in range(3):
        for c in range(3):
            y = ys[r] / (ct if c != 1 else 1.0)
            off[r, c] = (xs[c], y)
    # middle-center is the identity tap; reference stores (1,1) there but
    # overwrites the result with the source pixel anyway (sphere_cnn.py:57)
    off[1, 1] = (1.0, 1.0)
    return off


@functools.lru_cache(maxsize=None)
def sphere_taps(h: int, w: int, stride: int = 1):
    """Precompute gather indices/weights for all output pixels.

    Returns (idx, wgt): int32/float32 arrays of shape (Ho*Wo, 9, 4) — four
    bilinear neighbors per gnomonic tap, as flat indices into (h*w). Weights
    are zeroed for out-of-image rows/columns (grid_sample zero padding).
    """
    rows = np.arange(0, h, stride)
    cols = np.arange(0, w, stride)
    i, j = np.meshgrid(rows, cols, indexing="ij")  # (Ho, Wo)
    phi = -((i + 0.5) / h * np.pi - np.pi / 2)  # latitude
    theta = (j + 0.5) / w * 2 * np.pi - np.pi  # longitude

    off = _kernel_offsets(np.pi / h, 2 * np.pi / w)  # (3, 3, 2)
    x = off[..., 0].reshape(9, 1, 1)
    y = off[..., 1].reshape(9, 1, 1)
    rho = np.sqrt(x * x + y * y)
    v = np.arctan(rho)
    with np.errstate(invalid="ignore", divide="ignore"):
        arg = np.cos(v) * np.sin(phi) + y * np.sin(v) * np.cos(phi) / rho
        new_phi = np.arcsin(np.clip(arg, -1.0, 1.0))
        new_theta = theta + np.arctan(
            x * np.sin(v) / (rho * np.cos(phi) * np.cos(v) - y * np.sin(phi) * np.sin(v))
        )
    new_r = (-new_phi + np.pi / 2) * h / np.pi - 0.5
    new_c = (new_theta + np.pi) * w / (2 * np.pi) - 0.5
    new_c = (new_c + w) % w  # equirect wraparound (sphere_cnn.py:54-55)
    # center tap = source pixel exactly (sphere_cnn.py:57)
    new_r[4] = i
    new_c[4] = j

    # grid_sample align_corners=False: pixel position = coordinate - 0.5
    pr = new_r - 0.5
    pc = new_c - 0.5
    r0 = np.floor(pr)
    c0 = np.floor(pc)
    fr = pr - r0
    fc = pc - c0

    idx = np.zeros((9,) + i.shape + (4,), dtype=np.int64)
    wgt = np.zeros((9,) + i.shape + (4,), dtype=np.float32)
    for k, (dr, dc) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        rr = r0 + dr
        cc = c0 + dc
        wq = (fr if dr else 1 - fr) * (fc if dc else 1 - fc)
        valid = (rr >= 0) & (rr < h) & (cc >= 0) & (cc < w)
        idx[..., k] = np.clip(rr, 0, h - 1) * w + np.clip(cc, 0, w - 1)
        wgt[..., k] = wq * valid

    ho, wo = i.shape
    idx = idx.transpose(1, 2, 0, 3).reshape(ho * wo, 9, 4).astype(np.int32)
    wgt = wgt.transpose(1, 2, 0, 3).reshape(ho * wo, 9, 4)
    return idx, wgt, (ho, wo)


def sphere_gather(x: jax.Array, stride: int = 1, tap: int | None = None):
    """Bilinear-resample features at the gnomonic taps.

    x: (B, H, W, C) -> (B, Ho*Wo, 9, C), or (B, Ho*Wo, C) for a single tap.
    """
    b, h, w, c = x.shape
    idx, wgt, _ = sphere_taps(h, w, stride)
    xf = x.reshape(b, h * w, c)
    taps = range(9) if tap is None else (tap,)
    outs = []
    for t in taps:
        acc = 0.0
        for k in range(4):
            g = jnp.take(xf, jnp.asarray(idx[:, t, k]), axis=1)  # (B, P, C)
            acc = acc + g * jnp.asarray(wgt[:, t, k])[None, :, None]
        outs.append(acc)
    if tap is not None:
        return outs[0]
    return jnp.stack(outs, axis=2)


_PREFER_PALLAS = False
_PALLAS_STRIDES: tuple[int, ...] = (1,)
_PALLAS_MIN_PIXELS = 8192  # fused kernel wins at >= 64x128 (measured, v5e)
_CONV_FLOPS: list | None = None


@contextlib.contextmanager
def count_conv_flops():
    """Accumulate forward conv FLOPs at trace time (bench MFU accounting).

    XLA's compiled cost analysis reports 0 FLOPs for lax.scan bodies and
    Pallas kernels — both of which carry this framework's hot ops — so the
    benchmark instead counts the convolution FLOPs exactly where they are
    issued (sphere_conv_apply / SNConv). Usage:

        with count_conv_flops() as flops:
            jax.eval_shape(step_fn, *args)   # traces, no compile
        fwd_flops = flops()
    """
    global _CONV_FLOPS
    prev = _CONV_FLOPS
    acc = [0]
    _CONV_FLOPS = acc
    try:
        yield lambda: acc[0]
    finally:
        _CONV_FLOPS = prev


def _count_flops(n: int):
    if _CONV_FLOPS is not None:
        _CONV_FLOPS[0] += n


_OUT_HOOK = None  # callable applied to every conv output at trace time


@contextlib.contextmanager
def conv_output_hook(fn):
    """Apply `fn` to every conv output (sphere convs and SNConv) at trace
    time. Used by the GSPMD auto-sharded path (dist/auto.py) to place
    `with_sharding_constraint` on activations so channel-sharded (tensor-
    parallel) kernels actually split the compute instead of being gathered.
    Wrappers using this must own their jit cache (fresh jax.jit closing over
    the context), exactly like pallas_sphere_convs."""
    global _OUT_HOOK
    prev = _OUT_HOOK
    _OUT_HOOK = fn
    try:
        yield
    finally:
        _OUT_HOOK = prev


def apply_output_hook(out: jax.Array) -> jax.Array:
    return _OUT_HOOK(out) if _OUT_HOOK is not None else out


_COMPUTE_DTYPE = None  # None -> full float32


@contextlib.contextmanager
def conv_compute_dtype(dtype):
    """Mixed-precision conv compute (TPU: bfloat16 feeds the MXU natively).

    Inside `conv_compute_dtype(jnp.bfloat16)`, every sphere conv (gather and
    Pallas paths) and SNConv casts its activations/kernels to the given dtype
    for the gathers and matmuls while ACCUMULATING IN float32
    (preferred_element_type) and returning float32 — params, norms, and
    elementwise glue stay full precision. Halves HBM traffic on the gathers
    and doubles MXU rate on v5e. `None` restores full f32.
    """
    global _COMPUTE_DTYPE
    prev = _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype
    try:
        yield
    finally:
        _COMPUTE_DTYPE = prev


def compute_dtype_of(x: jax.Array):
    """The in-effect conv compute dtype (context override, else x.dtype)."""
    return _COMPUTE_DTYPE if _COMPUTE_DTYPE is not None else x.dtype


@contextlib.contextmanager
def pallas_sphere_convs(enable: bool = True, strides: tuple[int, ...] = (1,),
                        min_pixels: int = 2048):
    """Route sphere convs through the fused Pallas kernels (TPU, ~2.4x).

    The custom-VJP path (sphere_conv_vjp) covers stride 1 and 2 and is fully
    differentiable — training steps can run inside this context. `strides`
    selects which strides dispatch to it; the default is stride 1 only:
    measured on v5e, the stride-2 layers (discriminator front, small channel
    counts that pad to the 128-lane tile) are faster in the XLA gather
    formulation (re-measured round 4 after the prefetch kernels: fused G+D
    352 vs 339 ms with stride 2 fused — still gather). Layers below
    `min_pixels` (H*W) keep the gather formulation. Round 4 moved the
    default 8192 -> 2048: with full-width channel blocks + double-buffered
    prefetch the 32x64 SPADE layers now win in the fused kernels (fused G+D
    339 -> 313 ms, scripts/exp_dispatch_sweep.py).
    """
    global _PREFER_PALLAS, _PALLAS_STRIDES, _PALLAS_MIN_PIXELS
    prev, prev_s, prev_p = _PREFER_PALLAS, _PALLAS_STRIDES, _PALLAS_MIN_PIXELS
    _PREFER_PALLAS = enable
    _PALLAS_STRIDES = tuple(strides)
    _PALLAS_MIN_PIXELS = min_pixels
    try:
        yield
    finally:
        _PREFER_PALLAS = prev
        _PALLAS_STRIDES = prev_s
        _PALLAS_MIN_PIXELS = prev_p


def sphere_conv_apply(x: jax.Array, kernel: jax.Array, bias: jax.Array | None,
                      stride: int = 1) -> jax.Array:
    """Functional sphere conv: 9 accumulated gather->matmul steps (MXU).

    kernel: (3, 3, Cin, Cout) HWIO. Output (B, Ho, Wo, Cout).

    The tap loop is a lax.scan (not a Python unroll): the SPADE stack holds
    ~40 sphere convs, and 36 unrolled gathers per conv makes the HLO huge and
    compile times painful; the scan body is one weighted 4-tap gather plus one
    (B*P, Cin) x (Cin, Cout) matmul.

    Inside a pallas_sphere_convs() context on TPU, dispatches to the fused
    halo-DMA Pallas kernel (nn/sphere_conv_pallas.py) instead.
    """
    _count_flops(
        # 9 taps x (B*Ho*Wo, Cin) @ (Cin, Cout) matmul + 4-neighbor bilinear
        2 * x.shape[0] * (x.shape[1] // stride) * (x.shape[2] // stride)
        * 9 * x.shape[3] * (kernel.shape[-1] + 4)
    )
    # the fused kernel wins where the gather traffic dominates (high
    # resolution); at low spatial dims its loop overhead loses to XLA.
    # EVERY stride above the pixel gate routes through the custom VJP:
    # its forward dispatches per stride (gather for stride 2 unless
    # strides=(1, 2) opts into the fused forward) while its backward always
    # runs the Pallas dx — autodiff of the raw gather transposes into
    # scatter-add `while` loops (62.7 ms of the round-5 G step)
    if _PREFER_PALLAS and jax.default_backend() == "tpu":
        from .sphere_conv_vjp import sphere_conv_trainable

        return apply_output_hook(sphere_conv_trainable(x, kernel, bias, stride))
    return apply_output_hook(sphere_conv_gather(x, kernel, bias, stride))


def sphere_conv_gather(x: jax.Array, kernel: jax.Array, bias: jax.Array | None,
                       stride: int = 1) -> jax.Array:
    """The raw XLA gather formulation (no dispatch, no output hook)."""
    b, h, w, cin = x.shape
    idx, wgt, (ho, wo) = sphere_taps(h, w, stride)
    dt = compute_dtype_of(x)
    xf = x.reshape(b, h * w, cin).astype(dt)
    kflat = kernel.reshape(9, cin, -1).astype(dt)
    idx_t = jnp.asarray(idx.transpose(1, 0, 2))  # (9, P, 4)
    wgt_t = jnp.asarray(wgt.transpose(1, 0, 2)).astype(dt)

    def body(acc, tap):
        t_idx, t_wgt, t_k = tap
        s = 0.0
        for k in range(4):
            g = jnp.take(xf, t_idx[:, k], axis=1)  # (B, P, Cin)
            s = s + g * t_wgt[:, k][None, :, None]
        part = jnp.einsum("bpc,cd->bpd", s, t_k, preferred_element_type=jnp.float32)
        return acc + part, None

    out0 = jnp.zeros((b, ho * wo, kflat.shape[-1]), jnp.float32)
    out, _ = jax.lax.scan(body, out0, (idx_t, wgt_t, kflat))
    if bias is not None:
        out = out + bias
    return out.reshape(b, ho, wo, -1)


class SphereConv2D(nn.Module):
    """3x3 distortion-aware conv (drop-in for spherenet.SphereConv2D)."""

    features: int
    stride: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        # kaiming_uniform(a=sqrt(5)) over fan_in=9*cin, matching the torch init
        # (sphere_cnn.py:107-109) so import parity is exact
        fan_in = 9 * cin
        bound = float(np.sqrt(6.0 / ((1 + 5) * fan_in)))
        kernel = self.param(
            "kernel",
            lambda key: jax.random.uniform(key, (3, 3, cin, self.features),
                                           minval=-bound, maxval=bound),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        return sphere_conv_apply(x, kernel, bias, self.stride)


class SphereMaxPool2D(nn.Module):
    """Max over the 9 gnomonic taps (drop-in for spherenet.SphereMaxPool2D)."""

    stride: int = 1

    @nn.compact
    def __call__(self, x):
        s = sphere_gather(x, self.stride)  # (B, P, 9, C)
        b, p, _, c = s.shape
        _, _, (ho, wo) = sphere_taps(x.shape[1], x.shape[2], self.stride)
        return jnp.max(s, axis=2).reshape(b, ho, wo, c)
