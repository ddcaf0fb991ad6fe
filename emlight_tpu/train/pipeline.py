"""Fused two-stage inference: crop -> regression -> guide -> generator -> HDR env map.

The reference has no single end-to-end entry point — users run
RegressionNetwork/test.py (predicted-anchor pickles), then feed those pickles
through GenProjector's dataset into GenProjector/test.py ("swap in predicted
pickles", see SURVEY §3.4). Chaining the two scripts verbatim also composes
their scale conventions incorrectly: the regression head is trained on
alpha-scaled targets (intensity·alpha/500, ambient·alpha/(128·256),
RegressionNetwork/data.py:71-73) while GenProjector's dataset expects RAW GT
pickles (intensity·0.01, ambient/(128·256), then guide·alpha,
GenProjector/data.py:86-102).

This module composes the two stages with the scales resolved analytically.
Writing the projector's training-time guide in terms of the quantities the
regressor actually predicts (hat = predicted):

    light term:   dist · (raw_int·0.01) · rgb · alpha
                = dist_hat · (int_hat·500/alpha) · 0.01 · rgb_hat · alpha
                = dist_hat · int_hat · 5 · rgb_hat            (alpha cancels)
    ambient term: (raw_amb/(128·256)) · alpha = amb_hat       (exactly the head output)

so the end-to-end guide is

    guide = splat(dist_hat · int_hat · rgb_hat, scale=5) + amb_hat

with NO per-sample alpha — the tonemap scalar cancels out of the pipeline,
and the whole crop->env-map path is one jitted device program.

The splat anchor count follows the regression head (N=96 by default); the
generator's SPADE conditioning is just a 3-channel env map, independent of N.
"""

from __future__ import annotations

import functools

import jax

from ..config import ProjectorConfig, RegressionConfig
from ..representation.splat import render_anchor_params
from . import projector as proj
from . import regression as reg

__all__ = ["pipeline_inference", "predicted_guide", "END_TO_END_INTENSITY_SCALE"]

# dist_hat · int_hat · 5 · rgb_hat — the alpha-cancelled composition of
# RegressionNetwork/data.py:71 (·alpha/500) with GenProjector/data.py:87
# (·0.01) and :102 (guide·alpha).
END_TO_END_INTENSITY_SCALE = 5.0


def predicted_guide(pred: dict, env_h: int, env_w: int, splat_size: float):
    """Rasterize regression predictions into the generator's conditioning map."""
    return render_anchor_params(
        pred["distribution"],
        pred["intensity"][:, 0],
        pred["rgb_ratio"],
        pred["ambient"],
        n=pred["distribution"].shape[-1],
        h=env_h,
        w=env_w,
        size=splat_size,
        intensity_scale=END_TO_END_INTENSITY_SCALE,
    )


@functools.partial(
    jax.jit, static_argnames=("reg_cfg", "proj_cfg", "use_pallas")
)
def pipeline_inference(reg_state, proj_state, crop_reg, crop_proj,
                       reg_cfg: RegressionConfig, proj_cfg: ProjectorConfig,
                       use_pallas: bool = False):
    """One device program: crops -> (HDR env maps, predicted anchor params).

    Args:
      crop_reg:  (B, reg_cfg.crop_h, reg_cfg.crop_w, 3) tonemapped crops
                 (TONEMAP_INPUT), the regressor's input resolution.
      crop_proj: (B, proj_cfg.crop_size//2, proj_cfg.crop_size//2, 3) the SAME
                 tonemapped crops at the generator encoder's resolution.

    Returns (env (B, H, W, 3) HDR, pred dict with distribution/intensity/
    rgb_ratio/ambient — the test_regression pickle fields).
    """
    # default concat-free eval forward (1.36x the standard apply on v5e);
    # closure creation per trace is free — this jit is keyed on reg_cfg
    pred = reg.predict(
        reg.make_eval_apply(reg_cfg), reg_state.params, reg_state.batch_stats,
        crop_reg,
    )
    env_h, env_w = proj_cfg.crop_size // 2, proj_cfg.crop_size
    with proj.compute_ctx(proj_cfg, use_pallas):
        guide = predicted_guide(pred, env_h, env_w, proj_cfg.anchors.splat_size)
        variables = {"params": proj_state.g_params, **proj_state.g_stats}
        env = proj_state.g_apply(variables, guide, crop_proj, train=False)
    return env, pred
