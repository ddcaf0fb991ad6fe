"""DenseNet-BC regression backbone (EMLight stage 1) in Flax.

Architecture parity with RegressionNetwork/DenseNet.py:68-157: growth 12,
blocks (16,16,16), compression 0.5, 24 init features, bn_size 4, a transition
+ trailing BatchNorm after EVERY block (the reference's `if i != len(...)` at
DenseNet.py:110 is always true), global 4x4 avg-pool, fc 8208->1024, and four
linear heads (activations removed per the reference's Jan-2022 update,
README.md:31 / DenseNet.py:141-151).

Layout is NHWC (TPU-native). Module names mirror the torch state_dict keys so
checkpoint import (train/torch_import.py) is a mechanical mapping.

Notable reference quirk kept for parity: _DenseLayer has no ReLU between its
norm2 and conv2 (DenseNet.py:30-46 orders norm1,relu1,conv1,norm2,conv2).

BatchNorm takes an optional `axis_name`, turning every norm into a
cross-replica (pmean) batch norm under shard_map/pjit — the TPU-native
replacement for the vendored sync_batchnorm package (SURVEY.md §2.4).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["DenseNet", "RegressionOutput", "fold_eval_variables"]


class _DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int
    drop_rate: float = 0.0
    axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32
    fold_bn: bool = False  # eval fast path: norm2 pre-folded into conv2 (+bias)

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name=name,
        )
        conv = lambda feats, k, name, bias=False: nn.Conv(
            feats, (k, k), padding=(k - 1) // 2, use_bias=bias,
            dtype=self.dtype, name=name,
        )
        h = bn("norm1")(x)
        h = nn.relu(h)
        if self.bn_size > 0:
            h = conv(4 * self.growth_rate, 1, "conv1")(h)
            if self.fold_bn:
                # norm2 has no nonlinearity before conv2 (the reference's
                # layer order, DenseNet.py:30-46) -> at eval it is an affine
                # map a*h+b foldable into conv2's kernel + a bias
                # (fold_eval_variables does the parameter transform).
                # conv2 zero-pads AFTER norm2, so the folded conv must pad h
                # with the preimage of that zero (-b/a per channel, stored by
                # the fold as conv2_pad) and run VALID — plain zero padding
                # would leak the folded bias through the border taps.
                pad = self.param(
                    "conv2_pad", nn.initializers.zeros, (h.shape[-1],), jnp.float32
                ).astype(h.dtype)
                bsz, hh, ww, c = h.shape
                row = jnp.broadcast_to(pad, (bsz, 1, ww, c))
                hv = jnp.concatenate([row, h, row], axis=1)
                col = jnp.broadcast_to(pad, (bsz, hh + 2, 1, c))
                hp = jnp.concatenate([col, hv, col], axis=2)
                h = nn.Conv(
                    self.growth_rate, (3, 3), padding="VALID", use_bias=True,
                    dtype=self.dtype, name="conv2",
                )(hp)
            else:
                h = bn("norm2")(h)
                h = conv(self.growth_rate, 3, "conv2")(h)
        else:
            h = conv(self.growth_rate, 3, "conv2")(h)
        if self.drop_rate > 0:
            h = nn.Dropout(self.drop_rate, deterministic=not train)(h)
        return jnp.concatenate([x, h.astype(x.dtype)], axis=-1)


class _Transition(nn.Module):
    num_output_features: int
    axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.axis_name, dtype=self.dtype, name="norm",
        )(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.num_output_features, (1, 1), use_bias=False, dtype=self.dtype, name="conv"
        )(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


RegressionOutput = dict  # {distribution, intensity, rgb_ratio, ambient}


class DenseNet(nn.Module):
    """crop (B, H, W, 3) -> anchor light parameters.

    Default input 192x256 (4:3 crop) gives the reference's 8208-dim pooled
    feature vector (171 channels x 6 x 8 after the 4x4 avg pool).
    """

    growth_rate: int = 12
    block_config: Sequence[int] = (16, 16, 16)
    compression: float = 0.5
    num_init_features: int = 24
    bn_size: int = 4
    drop_rate: float = 0.0
    avgpool_size: int = 4
    n_anchors: int = 96  # fc_dist head width (DenseNet.py:126; see SURVEY §2.6)
    axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32  # compute dtype; params stay f32
    remat: bool = False  # rematerialize dense layers (training memory + XLA graph size)
    fold_bn: bool = False  # inference fast path; pair with fold_eval_variables

    @nn.compact
    def __call__(self, x, train: bool = False) -> RegressionOutput:
        assert not (self.fold_bn and train), "fold_bn is an eval-only transform"
        x = x.astype(self.dtype)
        layer_cls = (
            nn.remat(_DenseLayer, static_argnums=(2,)) if self.remat else _DenseLayer
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.axis_name, dtype=self.dtype, name=name,
        )
        x = nn.Conv(
            self.num_init_features, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv0",
        )(x)
        x = bn("norm0")(x)
        x = nn.relu(x)

        num_features = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            for j in range(num_layers):
                x = layer_cls(
                    self.growth_rate, self.bn_size, self.drop_rate,
                    axis_name=self.axis_name, dtype=self.dtype,
                    fold_bn=self.fold_bn,
                    name=f"denseblock{i + 1}_denselayer{j + 1}",
                )(x, train)
            num_features += num_layers * self.growth_rate
            num_features = int(math.floor(num_features * self.compression))
            x = _Transition(
                num_features, axis_name=self.axis_name, dtype=self.dtype,
                name=f"transition{i + 1}",
            )(x, train)
            x = bn(f"last_norm{i + 1}")(x)

        x = nn.relu(x)
        k = self.avgpool_size
        x = nn.avg_pool(x, (k, k), strides=(k, k))
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(1024, dtype=self.dtype, name="fc")(x)

        # heads in f32: small matmuls, and the outputs feed losses/rendering
        x = x.astype(jnp.float32)
        return {
            "distribution": nn.Dense(self.n_anchors, name="fc_dist")(x),
            "intensity": nn.Dense(1, name="fc_intensity")(x),
            "rgb_ratio": nn.Dense(3, name="fc_rgb_ratio")(x),
            "ambient": nn.Dense(3, name="fc_ambient")(x),
        }


def fold_eval_variables(params, batch_stats, eps: float = 1e-5):
    """Fold every dense layer's norm2 into its conv2 for DenseNet(fold_bn=True).

    norm2 -> conv2 has no nonlinearity between them (the reference's layer
    order, RegressionNetwork/DenseNet.py:30-46), so in eval mode
    conv2(norm2(h)) == conv2'(h) with the BN affine absorbed into the kernel
    plus a bias: a pure parameter transform, exact up to f32 reassociation.
    Returns (params', batch_stats') consumable by the fold_bn=True module;
    any checkpoint (trained or imported from torch) folds the same way.
    """
    import jax.numpy as jnp

    p = {k: v for k, v in params.items()}
    s = {k: v for k, v in batch_stats.items()}
    for name in list(p):
        if "_denselayer" not in name or "norm2" not in p[name]:
            continue
        layer = dict(p[name])
        stats = dict(s[name])
        a = layer["norm2"]["scale"] / jnp.sqrt(stats["norm2"]["var"] + eps)
        b = layer["norm2"]["bias"] - stats["norm2"]["mean"] * a
        # A channel with |a| ~ 0 (decayed BN scale) makes -b/a explode and the
        # border taps then rely on (k*a)*(-b/a) cancelling -k*b in floating
        # point — catastrophic rounding, worse in bf16. Such a channel carries
        # (numerically) no signal: zero its kernel column AND its pad, which
        # folds it to the exact constant contribution b via the bias term.
        tiny = jnp.abs(a) < 1e-12 * jnp.max(jnp.abs(a))
        a_safe = jnp.where(tiny, 0.0, a)
        k = layer["conv2"]["kernel"]  # (3, 3, cin, cout)
        layer["conv2"] = {
            "kernel": k * a_safe[None, None, :, None],
            "bias": jnp.einsum("hwio,i->o", k, b),
        }
        # conv2 zero-padded its input AFTER norm2: the folded conv must pad
        # with norm2's preimage of zero. A zeroed column makes any finite pad
        # value correct there — use 0 to dodge the 0/0.
        layer["conv2_pad"] = jnp.where(
            tiny, 0.0, -b / jnp.where(tiny, 1.0, a_safe)
        )
        del layer["norm2"]
        del stats["norm2"]
        p[name] = layer
        s[name] = stats
    return p, s
