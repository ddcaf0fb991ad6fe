"""Dataclass config tree — the single source for every shape/hyperparameter.

Replaces the reference's split-brain config (argparse tree in GenProjector/
options/ vs hardcoded module constants in RegressionNetwork/train.py:25-65 and
Needlets/gt_gen_j2.py:9-16). The anchor count is ONE knob here; the reference
disagrees with itself (128 GT / 96 regression / 42 stale test — SURVEY.md §2.6).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field


@dataclass(frozen=True)
class AnchorConfig:
    n_anchors: int = 128          # GT extraction + GenProjector (distribution_representation.py:130)
    regression_anchors: int = 96  # regression head/loss width (DenseNet.py:126)
    env_h: int = 128
    env_w: int = 256
    splat_size: float = 0.0025    # train.py:115, data.py:97
    light_threshold: float = 0.05  # 5%-of-max light mask (distribution_representation.py:96)
    intensity_scale: float = 500.0  # data.py:71 (GT /500) & train.py:117 (viz x500)


@dataclass(frozen=True)
class SinkhornConfig:
    p: float = 2.0
    blur: float = 0.025           # train.py:61
    scaling: float = 0.5
    value_weight: float = 0.1     # geomloss/utils.py:94
    n_iters: int = 12             # static schedule length (dynamic diameter)
    diameter: float | None = None
    backend: str = "auto"         # "auto"/"jnp": XLA scanned loop (fastest measured on TPU)


@dataclass(frozen=True)
class RegressionConfig:
    anchors: AnchorConfig = field(default_factory=AnchorConfig)
    sinkhorn: SinkhornConfig = field(default_factory=SinkhornConfig)
    crop_h: int = 192             # 4:3 crop -> 8208-dim pooled features
    crop_w: int = 256
    # backbone (DenseNet.py:82-83); shrink for tests/smoke runs
    block_config: tuple[int, ...] = (16, 16, 16)
    growth_rate: int = 12
    num_init_features: int = 24
    batch_size: int = 16          # train.py:25
    lr: float = 1e-4              # train.py:55
    betas: tuple[float, float] = (0.9, 0.999)
    # loss weights (train.py:92-98)
    w_emd: float = 1000.0
    w_dist_l2: float = 1000.0
    w_intensity: float = 0.1
    w_rgb: float = 100.0
    w_ambient: float = 1.0
    dtype: str = "float32"
    remat: bool = False  # rematerialize dense layers (needed for bs>=16 full-size training)
    # optional global-norm gradient clipping (0 = off, reference parity: the
    # reference has none and its README documents manual NaN recovery instead,
    # README.md:31). Changes the optimizer-state structure when enabled, so
    # keep it consistent across train/resume (opt.json records it).
    clip_grad_norm: float = 0.0
    # log per-head + global gradient norms into the metrics dict (the
    # reference's check_grad/check_module probes, panorama.py:41-64, as a
    # first-class metric instead of tensor hooks)
    log_grad_norms: bool = False
    # training forward: "buffer" = concat-free NCHW buffer forward with the
    # structured block VJP (nn/densenet_fast.train_apply; measured 171 vs
    # 211 ms fwd+bwd at bs16 bf16 on a v5e, gradients match the standard
    # apply to ~1e-13 in f64) — "standard" = the reference-shaped flax
    # forward (needed for drop_rate>0, none shipped by the reference)
    train_forward: str = "buffer"


@dataclass(frozen=True)
class ProjectorConfig:
    """SPADE GenProjector (GenProjector/options + train_laval.sh defaults)."""

    anchors: AnchorConfig = field(default_factory=AnchorConfig)
    crop_size: int = 256          # base_options.py:36; env map = (crop_size/2, crop_size)
    ngf: int = 64
    ndf: int = 64
    num_d: int = 2                # discriminator.py:21
    n_layers_d: int = 4           # discriminator.py:72
    semantic_nc: int = 3          # guide = rasterized env map (RGB)
    output_nc: int = 3
    batch_size: int = 16
    lr: float = 2e-4              # TTUR: G lr/2, D lr*2 (pix2pix_model.py:61-68)
    beta1: float = 0.0
    beta2: float = 0.9
    gan_mode: str = "hinge"
    lambda_vgg: float = 5.0       # pix2pix_model.py:120
    lambda_cos: float = 5.0       # pix2pix_model.py:122
    # upstream SPADE's --use_vae surface (dead code in the EMLight fork —
    # its encoder.py comments fc_var out — kept for completeness): VAE
    # encoder heads + reparameterized latent + KLD x lambda_kld in the G loss
    use_vae: bool = False
    lambda_kld: float = 0.05      # SPADE train_options.py default
    ambient_feat_weight: float = 50.0  # non-light pixels x50 (pix2pix_model.py:112-113)
    num_upsampling_layers: str = "normal"
    norm_g: str = "spectralspadesyncbatch3x3"
    use_vgg_loss: bool = True
    d_steps_per_g: int = 1
    # "bfloat16": conv gathers/matmuls in bf16 with f32 accumulation (MXU
    # native on TPU); params, norms, losses, and optimizer stay f32
    dtype: str = "float32"
    # linear lr decay after niter epochs over niter_decay epochs
    # (train_laval.sh:5-6: 100+100; model_trainer.py:68-88)
    niter: int = 100
    niter_decay: int = 100
    # optional global-norm gradient clipping for BOTH optimizers (0 = off =
    # reference parity). The unclipped hinge-GAN recipe diverges on
    # harsh-light data (measured: f32 and bf16 both NaN at the same step on
    # synthetic scale-60 lights); this is the production guard rail.
    clip_grad_norm: float = 0.0


@dataclass(frozen=True)
class NeedletsConfig:
    jmax: int = 2
    b: float = 2.0
    env_h: int = 128
    env_w: int = 256
    # per-band keep fractions (gt_gen_j2.py:47-66): top 25% of j2, 55% of j1, 70% of j0
    sparsity_percentiles: tuple[float, ...] = (30.0, 45.0, 75.0)  # j0, j1, j2 thresholds


def replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)
