"""VGG19 feature extractor for the perceptual loss.

Mirrors the slicing of GenProjector/models/networks/architecture.py:92-122
(relu1_1, relu2_1, relu3_1, relu4_1, relu5_1 boundaries at torchvision
feature indices 2/7/12/21/30) with loss weights 1/32..1 (loss.py:107).

This image has no torchvision and no network egress, so pretrained weights
load from an .npz produced by `export_torchvision_weights` (run wherever
torchvision exists), path via arg or $EMLIGHT_VGG19_NPZ. Without weights the
perceptual term is disabled (train/projector.py checks `available`).
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "VGG19Features",
    "load_vgg19_params",
    "random_vgg19_params",
    "export_torchvision_weights",
    "vgg_perceptual_loss",
    "VGG_SLICE_WEIGHTS",
]

# torchvision vgg19.features conv layout (conv indices in the Sequential)
_CONV_IDS = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
_WIDTHS = [64, 64, 128, 128, 256, 256, 256, 256, 512, 512, 512, 512, 512, 512, 512, 512]
# conv-count boundaries of the 5 slices (relu1_1/2_1/3_1/4_1/5_1 at
# torchvision feature idx 2/7/12/21/30)
_SLICE_CONVS = [1, 3, 5, 9, 13]  # number of convs consumed at each slice end
_POOL_AFTER_CONV = {2, 4, 8, 12}  # maxpool after these many convs consumed
VGG_SLICE_WEIGHTS = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0)


class VGG19Features(nn.Module):
    """Returns the 5 sliced feature maps. Input NHWC in [0, +inf) HDR range
    (the reference feeds HDR env maps straight in, pix2pix_model.py:120)."""

    @nn.compact
    def __call__(self, x):
        feats = []
        conv_i = 0
        for slice_end in _SLICE_CONVS:
            while conv_i < slice_end:
                x = nn.Conv(_WIDTHS[conv_i], (3, 3), padding=1, name=f"conv{conv_i}")(x)
                x = nn.relu(x)
                conv_i += 1
                if conv_i in _POOL_AFTER_CONV and conv_i < slice_end:
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
            feats.append(x)
        return feats


def vgg_perceptual_loss(vgg_apply, vgg_variables, fake, real):
    """Slice-weighted L1 between VGG19 features of fake and real.

    Real features are detached, weights 1/32..1 — the reference's VGGLoss
    (GenProjector/models/networks/loss.py:96-110). Multiply by lambda_vgg at
    the call site (pix2pix_model.py:120). Shared by the single-device and
    shard_mapped generator steps so the two cannot drift.
    """
    ff = vgg_apply(vgg_variables, fake)
    fr = vgg_apply(vgg_variables, real)
    return sum(
        w * jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b)))
        for w, a, b in zip(VGG_SLICE_WEIGHTS, ff, fr)
    )


def load_vgg19_params(path: str | None = None):
    """Load {params} for VGG19Features from an npz; None if unavailable."""
    path = path or os.environ.get("EMLIGHT_VGG19_NPZ")
    if not path or not os.path.exists(path):
        return None
    data = np.load(path)
    params = {}
    for i in range(_SLICE_CONVS[-1]):  # only the convs the slices consume
        params[f"conv{i}"] = {
            "kernel": jnp.asarray(data[f"conv{i}_kernel"]),
            "bias": jnp.asarray(data[f"conv{i}_bias"]),
        }
    return {"params": params}


def random_vgg19_params(seed: int = 0):
    """Random-init {params} with the pretrained layout/shapes.

    Perf-identical to pretrained weights (same graph, same FLOPs), so the
    GAN can be trained/benchmarked WITH the reference's VGG x5 term
    (pix2pix_model.py:120) in images where the torchvision weights don't
    exist. Not a substitute for the pretrained perceptual metric — a
    random-feature L1 is a valid (weaker) perceptual proxy, but the
    reference's loss values won't match.
    """
    rng = np.random.default_rng(seed)
    params = {}
    cin = 3
    for i in range(_SLICE_CONVS[-1]):
        cout = _WIDTHS[i]
        # He-normal fan-in init, the torchvision conv default family
        std = float(np.sqrt(2.0 / (9 * cin)))
        params[f"conv{i}"] = {
            "kernel": jnp.asarray(
                rng.normal(0.0, std, (3, 3, cin, cout)).astype(np.float32)
            ),
            "bias": jnp.zeros((cout,), jnp.float32),
        }
        cin = cout
    return {"params": params}


def export_torchvision_weights(out_path: str) -> None:
    """Run on a machine WITH torchvision: dump vgg19 conv weights as npz
    (kernels pre-transposed OIHW->HWIO)."""
    import torchvision

    feats = torchvision.models.vgg19(weights="IMAGENET1K_V1").features
    arrays = {}
    for i, tid in enumerate(_CONV_IDS):
        conv = feats[tid]
        arrays[f"conv{i}_kernel"] = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        arrays[f"conv{i}_bias"] = conv.bias.detach().numpy()
    np.savez(out_path, **arrays)
