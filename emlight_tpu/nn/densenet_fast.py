"""Concat-free DenseNet eval forward (flagship-inference fast path).

The standard DenseNet forward (nn/densenet.py, parity with
RegressionNetwork/DenseNet.py:68-157) materializes a growing channel-concat
tensor after every dense layer. At inference that concat is pure HBM traffic:
on-chip profiling (BASELINE.md, scripts/exp_densenet_profile.py) shows block 1
alone costs 293 of the 427 ms forward at bs 128 bf16, its second half 2.7x its
first — the growing concat's read+write bandwidth, not the MXU, bounds the
model.

This module evaluates the SAME parameters with the SAME math but never builds
the concat. Dense-block features live as a list of per-layer `pieces` (the
stem output + one 12-channel tensor per layer). Every consumer of the concat
is a channel-sliced reduction over pieces:

  concat(P) @ K  ==  sum_i  P_i @ K[off_i : off_i + c_i]

and BatchNorm-at-eval is a per-channel affine, so norm1+relu apply per piece
and fuse into the matmul's operand (XLA input fusion). Per dense layer the
HBM traffic drops from read(cin) + write(cin+12) [concat] + read/write of the
BN pass to read(cin) + write(12): the concat tensor is never written at all.
The block-ending transition + last_norm consume the pieces the same way.

Exactness: identical arithmetic graph up to float reassociation (the matmul
over a sliced contraction sums per piece instead of once); tests pin f32
agreement to ~1e-5 and bf16 heads to bf16 tolerance against DenseNet.apply.

Consumes standard variables trees — trained or torch-imported checkpoints
work unchanged (no parameter transform at all, unlike fold_eval_variables).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

__all__ = ["fast_apply", "buffer_apply"]


def _bn_affine(p, s, eps, dtype):
    """Eval-mode BatchNorm as per-channel (a, b): y = x * a + b (f32 math)."""
    a = p["scale"] / jnp.sqrt(s["var"] + eps)
    b = p["bias"] - s["mean"] * a
    return a.astype(dtype), b.astype(dtype)


def _sliced(arr, offsets, widths, axis=0):
    return [
        lax.slice_in_dim(arr, o, o + w, axis=axis) for o, w in zip(offsets, widths)
    ]


def _norm_relu_matmul(pieces, offsets, a, b, kernel):
    """sum_i relu(P_i * a_i + b_i) @ K_i  — the concat-free norm+relu+1x1-conv.

    `kernel` is (cin, cout); slices ride the static channel offsets. XLA fuses
    the affine+relu into each matmul operand, so no piece is re-materialized.
    """
    widths = [p.shape[-1] for p in pieces]
    a_s = _sliced(a, offsets, widths)
    b_s = _sliced(b, offsets, widths)
    k_s = _sliced(kernel, offsets, widths)
    out = None
    for p, ai, bi, ki in zip(pieces, a_s, b_s, k_s):
        t = jnp.einsum("bhwc,cd->bhwd", nn.relu(p * ai + bi), ki)
        out = t if out is None else out + t
    return out


def fast_apply(
    params,
    batch_stats,
    x,
    *,
    block_config: Sequence[int] = (16, 16, 16),
    growth_rate: int = 12,
    compression: float = 0.5,
    num_init_features: int = 24,
    avgpool_size: int = 4,
    dtype=jnp.bfloat16,
    eps: float = 1e-5,
    group: int = 4,
):
    """crop (B, H, W, 3) -> head dict; == DenseNet.apply(train=False).

    Only the flagship topology knobs are exposed (bn_size=4 path with a 1x1
    bottleneck conv, the only configuration the reference ships).

    `group` compacts every `group` consecutive layer outputs into one slab
    (a group*12-channel concat). Fully piecewise (group=1) keeps 17 live
    tensors per block plus one relu temp per (layer, piece) — measured to
    exceed v5e HBM at bs 128 (the latency-hiding scheduler overlaps the
    branches). Slabs bound live tensors at ~num_layers/group while the
    re-introduced concat traffic is only 12*group channels per group layers
    (~2% of what the standard forward writes).
    """
    dt = jnp.dtype(dtype)
    x = x.astype(dt)
    x = lax.conv_general_dilated(
        x, params["conv0"]["kernel"].astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    a, b = _bn_affine(params["norm0"], batch_stats["norm0"], eps, dt)
    pieces = [nn.relu(x * a + b)]
    offsets = [0]
    num_features = num_init_features

    for i, num_layers in enumerate(block_config):
        pending = []  # layer outputs awaiting slab compaction
        for j in range(num_layers):
            lp = params[f"denseblock{i + 1}_denselayer{j + 1}"]
            ls = batch_stats[f"denseblock{i + 1}_denselayer{j + 1}"]
            a1, b1 = _bn_affine(lp["norm1"], ls["norm1"], eps, dt)
            h = _norm_relu_matmul(
                pieces, offsets, a1, b1, lp["conv1"]["kernel"][0, 0].astype(dt)
            )
            # parity quirk kept: no ReLU between norm2 and conv2
            # (RegressionNetwork/DenseNet.py:30-46)
            a2, b2 = _bn_affine(lp["norm2"], ls["norm2"], eps, dt)
            h = lax.conv_general_dilated(
                h * a2 + b2, lp["conv2"]["kernel"].astype(dt), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            offsets.append(num_features + j * growth_rate)
            pieces.append(h)
            pending.append(len(pieces) - 1)
            if len(pending) == group:
                slab = jnp.concatenate([pieces[k] for k in pending], axis=-1)
                pieces = pieces[: pending[0]] + [slab]
                offsets = offsets[: pending[0]] + [offsets[pending[0]]]
                pending = []
        num_features += num_layers * growth_rate

        tp, ts = params[f"transition{i + 1}"], batch_stats[f"transition{i + 1}"]
        at, bt = _bn_affine(tp["norm"], ts["norm"], eps, dt)
        x = _norm_relu_matmul(
            pieces, offsets, at, bt, tp["conv"]["kernel"][0, 0].astype(dt)
        )
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        num_features = int(math.floor(num_features * compression))
        al, bl = _bn_affine(
            params[f"last_norm{i + 1}"], batch_stats[f"last_norm{i + 1}"], eps, dt
        )
        pieces = [x * al + bl]
        offsets = [0]

    x = nn.relu(pieces[0])
    k = avgpool_size
    x = nn.avg_pool(x, (k, k), strides=(k, k))
    x = x.reshape(x.shape[0], -1)
    x = (x @ params["fc"]["kernel"].astype(dt) + params["fc"]["bias"].astype(dt))

    x = x.astype(jnp.float32)
    heads = {}
    for name, key in (
        ("distribution", "fc_dist"),
        ("intensity", "fc_intensity"),
        ("rgb_ratio", "fc_rgb_ratio"),
        ("ambient", "fc_ambient"),
    ):
        heads[name] = x @ params[key]["kernel"] + params[key]["bias"]
    return heads


def _avg_pool_nchw(x, k):
    s = lax.reduce_window(
        x, jnp.zeros((), x.dtype), lax.add,
        (1, 1, k, k), (1, 1, k, k), "VALID",
    )
    return s / jnp.asarray(k * k, x.dtype)


def buffer_apply(
    params,
    batch_stats,
    x,
    *,
    block_config: Sequence[int] = (16, 16, 16),
    growth_rate: int = 12,
    compression: float = 0.5,
    num_init_features: int = 24,
    avgpool_size: int = 4,
    dtype=jnp.bfloat16,
    eps: float = 1e-5,
):
    """Channel-major (NCHW) eval forward with an in-place concat buffer.

    The standard forward rewrites the whole growing concat every layer: in
    NHWC the 12 new channels interleave into every (8,128) tile, so appending
    is a full-tensor copy. Here features live channel-MAJOR in one
    preallocated (B, C_total, H, W) buffer per block; each layer reads the
    leading cin channel planes (a contiguous slice) and dynamic-update-slices
    its 12 new planes in — an in-place 12-plane write once XLA aliases the
    DUS (channel planes are whole tiles, no interleaving). Same variables
    tree, same math modulo float reassociation; heads match DenseNet.apply at
    bf16 resolution (tests/test_densenet_fast.py).
    """
    dt = jnp.dtype(dtype)

    def affine(name):
        a, b = _bn_affine(params[name], batch_stats[name], eps, dt)
        return a[:, None, None], b[:, None, None]

    def conv1x1(h, kernel):  # kernel (cin, cout), h NCHW
        return jnp.einsum("bchw,cd->bdhw", h, kernel.astype(dt))

    def conv3x3(h, kernel):  # kernel HWIO -> OIHW
        return lax.conv_general_dilated(
            h, jnp.transpose(kernel.astype(dt), (3, 2, 0, 1)), (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    x = jnp.transpose(x.astype(dt), (0, 3, 1, 2))
    x = conv3x3(x, params["conv0"]["kernel"])
    a, b = affine("norm0")
    x = nn.relu(x * a + b)

    num_features = num_init_features
    for i, num_layers in enumerate(block_config):
        bsz, _, hh, ww = x.shape
        total = num_features + num_layers * growth_rate
        buf = jnp.zeros((bsz, total, hh, ww), dt)
        buf = lax.dynamic_update_slice(buf, x, (0, 0, 0, 0))
        for j in range(num_layers):
            cin = num_features + j * growth_rate
            lp = params[f"denseblock{i + 1}_denselayer{j + 1}"]
            ls = batch_stats[f"denseblock{i + 1}_denselayer{j + 1}"]
            a1, b1 = _bn_affine(lp["norm1"], ls["norm1"], eps, dt)
            h = lax.slice_in_dim(buf, 0, cin, axis=1)
            h = nn.relu(h * a1[:, None, None] + b1[:, None, None])
            h = conv1x1(h, lp["conv1"]["kernel"][0, 0])
            a2, b2 = _bn_affine(lp["norm2"], ls["norm2"], eps, dt)
            # parity quirk kept: no ReLU between norm2 and conv2
            h = conv3x3(h * a2[:, None, None] + b2[:, None, None],
                        lp["conv2"]["kernel"])
            buf = lax.dynamic_update_slice(buf, h, (0, cin, 0, 0))
        num_features = total

        tp, ts = params[f"transition{i + 1}"], batch_stats[f"transition{i + 1}"]
        at, bt = _bn_affine(tp["norm"], ts["norm"], eps, dt)
        x = nn.relu(buf * at[:, None, None] + bt[:, None, None])
        x = conv1x1(x, tp["conv"]["kernel"][0, 0])
        x = _avg_pool_nchw(x, 2)
        num_features = int(math.floor(num_features * compression))
        al, bl = affine(f"last_norm{i + 1}")
        x = x * al + bl

    x = nn.relu(x)
    x = _avg_pool_nchw(x, avgpool_size)
    # fc weights are ordered for the NHWC flatten (DenseNet.apply)
    x = jnp.transpose(x, (0, 2, 3, 1)).reshape(x.shape[0], -1)
    x = x @ params["fc"]["kernel"].astype(dt) + params["fc"]["bias"].astype(dt)

    x = x.astype(jnp.float32)
    heads = {}
    for name, key in (
        ("distribution", "fc_dist"),
        ("intensity", "fc_intensity"),
        ("rgb_ratio", "fc_rgb_ratio"),
        ("ambient", "fc_ambient"),
    ):
        heads[name] = x @ params[key]["kernel"] + params[key]["bias"]
    return heads
