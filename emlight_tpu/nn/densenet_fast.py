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

import functools
import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["fast_apply", "buffer_apply", "train_apply"]


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


def _batch_stats_nchw(h, axis_name=None, channel_axis=1):
    """Per-channel (mean, mean-of-squares) of an image tensor, f32.

    channel_axis 1 = NCHW (the buffer layout), 3 = NHWC (the dense-layer
    interior). Matches flax BatchNorm's train-mode `_compute_stats` (fast
    variance, force_float32_reductions): stats in f32, and under a named axis
    the two moments ride ONE stacked pmean, exactly like flax's
    `maybe_distributed_mean`.
    """
    axes = (0, 2, 3) if channel_axis == 1 else (0, 1, 2)
    hf = h.astype(jnp.promote_types(h.dtype, jnp.float32))
    mu = hf.mean(axes)
    mu2 = (hf * hf).mean(axes)
    if axis_name is not None:
        mu, mu2 = lax.pmean(jnp.stack([mu, mu2]), axis_name)
    return mu, mu2


def _norm_train_nchw(h, mu, mu2, p, eps, dt, relu=False):
    """Train-mode BN from precomputed moments + optional ReLU, NCHW.

    Mirrors flax `_normalize`: y = (x - mean) * (rsqrt(var+eps) * scale)
    + bias, computed in f32 (mean/var force f32) then cast to the compute
    dtype. Returns (y, batch_var) — the var the running-average update needs.
    """
    var = jnp.maximum(0.0, mu2 - mu * mu)
    mul = lax.rsqrt(var + eps) * p["scale"]
    y = (h.astype(mu.dtype) - mu[:, None, None]) * mul[:, None, None]
    y = (y + p["bias"][:, None, None]).astype(dt)
    if relu:
        y = nn.relu(y)
    return y, var


def _ra_update(old, mu, var, momentum):
    """flax BatchNorm running-average update (f32 stats)."""
    return {
        "mean": momentum * old["mean"] + (1.0 - momentum) * mu,
        "var": momentum * old["var"] + (1.0 - momentum) * var,
    }


@functools.lru_cache(maxsize=None)
def _block_core(num_layers, num_features, growth_rate, dtype_name, eps, axis_name):
    """Dense-block core with a structured VJP.

    (x, layer_params) -> (buf, mu_all, mu2_all, norm2 moments) — the final
    channel-major buffer plus every batch moment the block computed, so the
    caller's consumers (transition norm, running-average updates) are plain
    traced ops whose cotangents re-enter this VJP.

    Forward: the in-place channel-major buffer loop. Per-plane norm1 moments
    are computed ONCE at plane-write time (`mu_all`/`mu2_all` running arrays,
    O(C) stat reads vs the standard forward's O(L*C) re-reductions).

    Backward: the naive autodiff of the forward keeps every DUS buffer
    version live as a residual (XLA then copies the full buffer once per
    layer — measured 700 ms vs the standard graph's 211 ms fwd+bwd at bs16
    bf16). Dense-block planes are append-only, so layer j's input is
    bit-identical to `buf_final[:, :cin_j]`: the custom backward re-slices
    the FINAL buffer per layer and runs per-layer `jax.vjp` closures whose
    primal convs are dead code (XLA DCE) — only the elementwise norm/relu
    staging is recomputed. Batch moments enter the closures as saved VALUES
    (not recomputed reductions); their cotangents are routed to the producing
    planes analytically: for m = mean(x), m2 = mean(x^2) over N elements
    (N *= axis size under pmean, whose per-device transpose is ct/axis_size),

        dL/dx += g_m / N + 2 x g_m2 / N

    — one fused elementwise pass instead of a re-reduction plus reduce-VJP.
    """
    dt = jnp.dtype(dtype_name)

    def stage_a(xs_n, mu, mu2, scale1, bias1, k1):
        """norm1 + relu + 1x1 conv, all NHWC (channels minor — the TPU
        matmul's native orientation: XLA's NHWC conv fwd+bwd at the dense
        tail's thin shapes measures 2.1+2.3 ms vs ~2.2+3.6 for NCHW plus the
        transpose copies the NCHW einsum forced; the round-5 HLO audit put
        9.3 of the step's 13.6 GiB of copies on those transposes)."""
        sdt = mu.dtype
        var = jnp.maximum(0.0, mu2 - mu * mu)
        mul = lax.rsqrt(var + eps) * scale1
        y1 = nn.relu(((xs_n.astype(sdt) - mu) * mul + bias1).astype(dt))
        return jnp.einsum("bhwc,cd->bhwd", y1, k1.astype(dt))

    def stage_b(h1, mu, mu2, scale2, bias2, k2):
        """norm2 (no ReLU — parity quirk) + 3x3 conv on NHWC h1."""
        sdt = mu.dtype
        var = jnp.maximum(0.0, mu2 - mu * mu)
        mul = lax.rsqrt(var + eps) * scale2
        y2 = ((h1.astype(sdt) - mu) * mul + bias2).astype(dt)
        return lax.conv_general_dilated(
            y2, k2.astype(dt), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def _route_moment_grads(g, x, g_mu, g_mu2, channel_axis=1):
        """Add the analytic moment cotangents onto g (same dtype flow as
        autodiff: f32 math, converted to the cotangent dtype, then added)."""
        n = 1
        for ax in ((0, 2, 3) if channel_axis == 1 else (0, 1, 2)):
            n *= x.shape[ax]
        if axis_name is not None:
            n = n * lax.psum(1, axis_name)
        sdt = g_mu.dtype
        xf = x.astype(sdt)
        if channel_axis == 1:
            gm, gm2 = g_mu[None, :, None, None], g_mu2[None, :, None, None]
        else:
            gm, gm2 = g_mu, g_mu2
        part = gm / n + xf * (2.0 * gm2 / n)
        return g + part.astype(g.dtype)

    def fwd_impl(x, lparams):
        bsz, _, hh, ww = x.shape
        total = num_features + num_layers * growth_rate
        buf = jnp.zeros((bsz, total, hh, ww), dt)
        buf = lax.dynamic_update_slice(buf, x.astype(dt), (0, 0, 0, 0))
        sdt = jnp.promote_types(dt, jnp.float32)
        mu_all = jnp.zeros((total,), sdt)
        mu2_all = jnp.zeros((total,), sdt)
        mu, mu2 = _batch_stats_nchw(x, axis_name)
        mu_all = lax.dynamic_update_slice(mu_all, mu, (0,))
        mu2_all = lax.dynamic_update_slice(mu2_all, mu2, (0,))
        h1s, n2mu, n2mu2 = [], [], []
        for j in range(num_layers):
            cin = num_features + j * growth_rate
            s1, b1, k1, s2, b2, k2 = lparams[j]
            # one fused slice+transpose per layer (exactly the copy XLA was
            # inserting implicitly in front of its conv lowering)
            xs_n = jnp.transpose(
                lax.slice_in_dim(buf, 0, cin, axis=1), (0, 2, 3, 1)
            )
            mu1 = lax.slice_in_dim(mu_all, 0, cin, axis=0)
            mu21 = lax.slice_in_dim(mu2_all, 0, cin, axis=0)
            h1 = stage_a(xs_n, mu1, mu21, s1, b1, k1)  # NHWC
            h1s.append(h1)
            m2, m22 = _batch_stats_nchw(h1, axis_name, channel_axis=3)
            n2mu.append(m2)
            n2mu2.append(m22)
            h_n = stage_b(h1, m2, m22, s2, b2, k2)  # NHWC (B,H,W,growth)
            m, mq = _batch_stats_nchw(h_n, axis_name, channel_axis=3)
            buf = lax.dynamic_update_slice(
                buf, jnp.transpose(h_n, (0, 3, 1, 2)), (0, cin, 0, 0)
            )
            mu_all = lax.dynamic_update_slice(mu_all, m, (cin,))
            mu2_all = lax.dynamic_update_slice(mu2_all, mq, (cin,))
        return (buf, mu_all, mu2_all, tuple(n2mu), tuple(n2mu2)), tuple(h1s)

    def primal(x, lparams):
        return fwd_impl(x, lparams)[0]

    core = jax.custom_vjp(primal)

    def core_fwd(x, lparams):
        out, h1s = fwd_impl(x, lparams)
        return out, (out, h1s, lparams)

    def core_bwd(res, cts):
        (buf, mu_all, mu2_all, n2mu, n2mu2), h1s, lparams = res
        g_buf, g_mu_all, g_mu2_all, g_n2mu, g_n2mu2 = cts
        # The whole backward loop runs NHWC: ONE transpose of the final
        # buffer and of the incoming buffer cotangent replaces the 2-3
        # per-layer transposes XLA otherwise inserts around every conv VJP
        # (9.3 of the step's 13.6 GiB of copies in the round-5 HLO audit).
        buf_n = jnp.transpose(buf, (0, 2, 3, 1))
        g_acc = jnp.transpose(g_buf, (0, 2, 3, 1))
        # moment cotangents from outside consumers (transition norm, running
        # stats) route straight onto the producing planes of the final buffer
        g_acc = _route_moment_grads(g_acc, buf_n, g_mu_all, g_mu2_all,
                                    channel_axis=3)
        g_lparams = []
        for j in reversed(range(num_layers)):
            cin = num_features + j * growth_rate
            s1, b1, k1, s2, b2, k2 = lparams[j]
            g_h = lax.slice_in_dim(g_acc, cin, cin + growth_rate, axis=3)
            _, vjp_b = jax.vjp(stage_b, h1s[j], n2mu[j], n2mu2[j], s2, b2, k2)
            g_h1, g_m2, g_m22, g_s2, g_b2, g_k2 = vjp_b(g_h)
            g_h1 = _route_moment_grads(
                g_h1, h1s[j], g_m2 + g_n2mu[j], g_m22 + g_n2mu2[j],
                channel_axis=3,
            )
            xs_n = lax.slice_in_dim(buf_n, 0, cin, axis=3)
            mu1 = lax.slice_in_dim(mu_all, 0, cin, axis=0)
            mu21 = lax.slice_in_dim(mu2_all, 0, cin, axis=0)
            _, vjp_a = jax.vjp(stage_a, xs_n, mu1, mu21, s1, b1, k1)
            g_xs, g_mu1, g_mu21, g_s1, g_b1, g_k1 = vjp_a(g_h1)
            g_xs = _route_moment_grads(g_xs, xs_n, g_mu1, g_mu21,
                                       channel_axis=3)
            g_acc = g_acc.at[..., :cin].add(g_xs)
            g_lparams.append((g_s1, g_b1, g_k1, g_s2, g_b2, g_k2))
        g_x = jnp.transpose(
            lax.slice_in_dim(g_acc, 0, num_features, axis=3), (0, 3, 1, 2)
        )
        return g_x, tuple(reversed(g_lparams))

    core.defvjp(core_fwd, core_bwd)
    return core


def train_apply(
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
    momentum: float = 0.9,
    axis_name: str | None = None,
    block_vjp: bool = True,
):
    """Concat-free TRAIN forward: (heads, new_batch_stats), autodiff-ready.

    The channel-major buffer layout of `buffer_apply` with flax-exact
    train-mode BatchNorm. One structural optimization over the standard
    forward beyond the missing concats: dense-block planes are immutable once
    written, so each norm1's batch moments over the growing concat are
    assembled from per-plane moments computed ONCE at write time
    (`mu_all`/`mu2_all` running arrays) — O(C) stat reads instead of the
    standard forward's O(L·C) re-reductions. Same values up to f32
    reassociation; gradients flow through the moments exactly as in flax
    (tests/test_densenet_fast.py pins grads vs DenseNet.apply(train=True)).

    Replaces the hot loop of RegressionNetwork/train.py:79-102's forward;
    parity quirks kept (no ReLU between norm2 and conv2, transition + trailing
    BN after every block).
    """
    dt = jnp.dtype(dtype)
    new_stats = {}

    def conv1x1(h, kernel):  # kernel (cin, cout), h NCHW
        return jnp.einsum("bchw,cd->bdhw", h, kernel.astype(dt))

    def conv3x3(h, kernel):  # kernel HWIO -> OIHW
        return lax.conv_general_dilated(
            h, jnp.transpose(kernel.astype(dt), (3, 2, 0, 1)), (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    x = jnp.transpose(x.astype(dt), (0, 3, 1, 2))
    x = conv3x3(x, params["conv0"]["kernel"])
    mu, mu2 = _batch_stats_nchw(x, axis_name)
    x, var = _norm_train_nchw(x, mu, mu2, params["norm0"], eps, dt, relu=True)
    new_stats["norm0"] = _ra_update(batch_stats["norm0"], mu, var, momentum)

    num_features = num_init_features
    for i, num_layers in enumerate(block_config):
        core = _block_core(
            num_layers, num_features, growth_rate, dt.name, eps, axis_name
        )
        lparams = tuple(
            (
                params[f"denseblock{i + 1}_denselayer{j + 1}"]["norm1"]["scale"],
                params[f"denseblock{i + 1}_denselayer{j + 1}"]["norm1"]["bias"],
                params[f"denseblock{i + 1}_denselayer{j + 1}"]["conv1"]["kernel"][0, 0],
                params[f"denseblock{i + 1}_denselayer{j + 1}"]["norm2"]["scale"],
                params[f"denseblock{i + 1}_denselayer{j + 1}"]["norm2"]["bias"],
                params[f"denseblock{i + 1}_denselayer{j + 1}"]["conv2"]["kernel"],
            )
            for j in range(num_layers)
        )
        if block_vjp:
            buf, mu_all, mu2_all, n2mu, n2mu2 = core(x, lparams)
        else:  # debug fallback: plain autodiff through the buffer loop
            buf, mu_all, mu2_all, n2mu, n2mu2 = core.__wrapped__(x, lparams)

        # Moment consumers (transition norm, running-average updates) are
        # plain traced ops on the core's moment OUTPUTS; their cotangents
        # re-enter the structured VJP and route to the producing planes.
        for j in range(num_layers):
            cin = num_features + j * growth_rate
            name = f"denseblock{i + 1}_denselayer{j + 1}"
            ls = batch_stats[name]
            mu1 = lax.slice_in_dim(mu_all, 0, cin, axis=0)
            mu21 = lax.slice_in_dim(mu2_all, 0, cin, axis=0)
            var1 = jnp.maximum(0.0, mu21 - mu1 * mu1)
            var2 = jnp.maximum(0.0, n2mu2[j] - n2mu[j] * n2mu[j])
            new_stats[name] = {
                "norm1": _ra_update(ls["norm1"], mu1, var1, momentum),
                "norm2": _ra_update(ls["norm2"], n2mu[j], var2, momentum),
            }
        num_features += num_layers * growth_rate

        tp, ts = params[f"transition{i + 1}"], batch_stats[f"transition{i + 1}"]
        x, vart = _norm_train_nchw(buf, mu_all, mu2_all, tp["norm"], eps, dt, relu=True)
        new_stats[f"transition{i + 1}"] = {
            "norm": _ra_update(ts["norm"], mu_all, vart, momentum)
        }
        x = conv1x1(x, tp["conv"]["kernel"][0, 0])
        x = _avg_pool_nchw(x, 2)
        num_features = int(math.floor(num_features * compression))
        mu, mu2 = _batch_stats_nchw(x, axis_name)
        x, var = _norm_train_nchw(
            x, mu, mu2, params[f"last_norm{i + 1}"], eps, dt
        )
        new_stats[f"last_norm{i + 1}"] = _ra_update(
            batch_stats[f"last_norm{i + 1}"], mu, var, momentum
        )

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
    return heads, new_stats


def _avg_pool_nchw(x, k):
    # reshape-mean, VALID semantics (crop the non-divisible tail like
    # nn.avg_pool drops partial windows). Differentiable — the train forward
    # goes through this; lax.reduce_window with a traced init has no
    # reverse-mode rule, and with a concrete init (the add-monoid primitive)
    # it measured SLOWER on a v5e than this form (555 vs 585 img/s flagship).
    b, c, h, w = x.shape
    hk, wk = h // k * k, w // k * k
    if (hk, wk) != (h, w):
        x = x[:, :, :hk, :wk]
    s = x.reshape(b, c, hk // k, k, wk // k, k).sum((3, 5))
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
    interior: str = "auto",
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

    `interior` picks the per-layer compute layout — the buffer is NCHW either
    way. "nhwc": one explicit slice+transpose per layer feeds channels-minor
    matmuls/convs (XLA's native matmul orientation; the NCHW einsum made XLA
    materialize feature-major (C,B,H,W) intermediates — 49.5 GiB of copies at
    bs 128). "nchw": the einsum formulation. Measured on a v5e (flagship
    shapes, bit-identical outputs): NHWC wins 2.1x at bs>=128 (438 -> 211 ms)
    but XLA's NHWC conv lowering collapses at mid batches (bs16: 61 vs
    237 ms(!), bs32: 121 vs 284, bs64: 229 vs 357, non-monotonic in batch) —
    "auto" = NHWC iff batch >= 128.
    """
    dt = jnp.dtype(dtype)
    if interior == "auto":
        interior = "nhwc" if x.shape[0] >= 128 else "nchw"

    def affine(name):
        a, b = _bn_affine(params[name], batch_stats[name], eps, dt)
        return a[:, None, None], b[:, None, None]

    def conv3x3_nchw(h, kernel):  # kernel HWIO -> OIHW
        return lax.conv_general_dilated(
            h, jnp.transpose(kernel.astype(dt), (3, 2, 0, 1)), (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    x = jnp.transpose(x.astype(dt), (0, 3, 1, 2))
    x = conv3x3_nchw(x, params["conv0"]["kernel"])
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
            a2, b2 = _bn_affine(lp["norm2"], ls["norm2"], eps, dt)
            if interior == "nhwc":
                h = jnp.transpose(lax.slice_in_dim(buf, 0, cin, axis=1), (0, 2, 3, 1))
                h = nn.relu(h * a1 + b1)
                h = jnp.einsum("bhwc,cd->bhwd", h, lp["conv1"]["kernel"][0, 0].astype(dt))
                # parity quirk kept: no ReLU between norm2 and conv2
                h = lax.conv_general_dilated(
                    h * a2 + b2, lp["conv2"]["kernel"].astype(dt), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                h = jnp.transpose(h, (0, 3, 1, 2))
            else:
                h = lax.slice_in_dim(buf, 0, cin, axis=1)
                h = nn.relu(h * a1[:, None, None] + b1[:, None, None])
                h = jnp.einsum("bchw,cd->bdhw", h, lp["conv1"]["kernel"][0, 0].astype(dt))
                # parity quirk kept: no ReLU between norm2 and conv2
                h = conv3x3_nchw(
                    h * a2[:, None, None] + b2[:, None, None], lp["conv2"]["kernel"]
                )
            buf = lax.dynamic_update_slice(buf, h, (0, cin, 0, 0))
        num_features = total

        tp, ts = params[f"transition{i + 1}"], batch_stats[f"transition{i + 1}"]
        at, bt = _bn_affine(tp["norm"], ts["norm"], eps, dt)  # (C,) on lanes
        if interior == "nhwc":
            xn = nn.relu(jnp.transpose(buf, (0, 2, 3, 1)) * at + bt)
            xn = jnp.einsum("bhwc,cd->bhwd", xn, tp["conv"]["kernel"][0, 0].astype(dt))
            x = jnp.transpose(xn, (0, 3, 1, 2))
        else:
            x = nn.relu(buf * at[:, None, None] + bt[:, None, None])
            x = jnp.einsum("bchw,cd->bdhw", x, tp["conv"]["kernel"][0, 0].astype(dt))
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
