"""Auto-sharded (GSPMD) execution over a 2-D (data, model) device mesh.

`dist/parallel.py` hand-places collectives with `shard_map` — pure data
parallelism with reference-parity SyncBN semantics
(GenProjector/models/networks/sync_batchnorm/batchnorm.py:63-126). This module
is the XLA-native complement, following the standard TPU scaling recipe
("pick a mesh, annotate shardings, let XLA insert collectives"):

- commit the SAME pytrees the single-device steps use onto a
  `Mesh((data, model))` with shape-based PartitionSpecs — batch arrays over
  the `data` axis, conv kernels/biases/norm scales channel-sharded over the
  `model` axis (tensor parallelism);
- jit the SAME step math (no axis_name plumbing, no per-collective code);
- the SPMD partitioner inserts everything: batch-stat reductions over the
  sharded batch axis (SyncBN for free), gradient reductions, and the
  collectives implied by channel-sharded kernels.

Activations are constrained to P(data, None, None, model) at every conv
output via `conv_output_hook` so the channel-sharded kernels actually split
the MXU work per device instead of being all-gathered (the constraint is a
hint; XLA still chooses the collective schedule).

The reference has no counterpart at any scale beyond 2-GPU DataParallel
(GenProjector/train_laval.sh:8); this path exists so the same training/serving
code runs unchanged on arbitrary dp×tp slices.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ProjectorConfig, RegressionConfig
from ..nn.sphere_conv import conv_output_hook
from ..train import regression as R
from ..train.projector import compute_ctx, make_guide
from .mesh import DATA_AXIS, MODEL_AXIS

__all__ = [
    "auto_shard_state",
    "auto_shard_batch",
    "make_auto_regression_step",
    "make_auto_projector_steps",
    "make_auto_inference",
    "make_auto_pipeline",
]


def _leaf_spec(x, tp: int) -> P:
    """Shape-based placement: channel-shard the trailing axis over `model`.

    Any spec is *correct* under GSPMD (mismatches just become resharding);
    these rules are the performance intent: >=2-D leaves (conv kernels HWIO,
    dense (in, out), and their Adam moments, which share shapes) shard the
    output-channel axis; 1-D channel vectors (bias/scale/BN stats/spectral u)
    follow suit so per-channel elementwise ops stay local.
    """
    shape = getattr(x, "shape", ())
    if len(shape) >= 2 and shape[-1] % tp == 0:
        return P(*([None] * (len(shape) - 1)), MODEL_AXIS)
    if len(shape) == 1 and shape[0] % tp == 0 and shape[0] >= tp:
        return P(MODEL_AXIS)
    return P()


def auto_shard_state(state, mesh: Mesh):
    """device_put every array leaf of a train state with the shape rule."""
    tp = mesh.shape[MODEL_AXIS]
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, _leaf_spec(x, tp))), state
    )


def auto_shard_batch(batch, mesh: Mesh):
    """Batch arrays: leading axis over `data`, rest replicated."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS))), batch
    )


def _act_hook(mesh: Mesh):
    """Constrain 4-D conv outputs to (data-sharded batch, channel-sharded)."""
    tp = mesh.shape[MODEL_AXIS]
    nd = mesh.shape[DATA_AXIS]

    def hook(out):
        if out.ndim == 4 and out.shape[-1] % tp == 0 and out.shape[0] % nd == 0:
            return jax.lax.with_sharding_constraint(
                out, NamedSharding(mesh, P(DATA_AXIS, None, None, MODEL_AXIS))
            )
        return out

    return hook


def make_auto_regression_step(cfg: RegressionConfig, mesh: Mesh):
    """DenseNet regression train step under GSPMD.

    The body is literally the single-device `loss_fn` + gradient update: the
    train-mode BatchNorm means over the globally-sharded batch axis ARE the
    SyncBN collectives once XLA partitions them.
    """

    def step(state, batch):
        grad_fn = jax.value_and_grad(R.loss_fn, has_aux=True)
        (_, (metrics, new_stats, _)), grads = grad_fn(
            state.params, state.batch_stats, state.apply_fn, batch, cfg, True
        )
        return state.apply_gradients(grads, new_stats), metrics

    return jax.jit(step)


def make_auto_projector_steps(cfg: ProjectorConfig, mesh: Mesh):
    """(generator_step, discriminator_step, fused_step) under GSPMD tensor +
    data parallelism. Same bodies as train/projector.py; fresh jits own the
    conv_output_hook context (the hook is trace-time state, like the Pallas
    dispatch contexts)."""
    from ..train import projector as Pj

    hook = _act_hook(mesh)

    def g_step(state, batch):
        with compute_ctx(cfg, False), conv_output_hook(hook):
            return Pj._generator_step_body(state, batch, cfg, None, None)

    def d_step(state, batch):
        with compute_ctx(cfg, False), conv_output_hook(hook):
            return Pj._discriminator_step_body(state, batch, cfg)

    def fused(state, batch):
        with compute_ctx(cfg, False), conv_output_hook(hook):
            return Pj._fused_gan_step_body(state, batch, cfg, None, None)

    return jax.jit(g_step), jax.jit(d_step), jax.jit(fused)


def make_auto_inference(cfg: ProjectorConfig, mesh: Mesh):
    """Eval-mode generator synthesis (GenProjector/test.py path), batch over
    `data`, generator channels over `model`."""
    hook = _act_hook(mesh)

    def run(state, batch):
        with compute_ctx(cfg, False), conv_output_hook(hook):
            guide = make_guide(batch, cfg)
            variables = {"params": state.g_params, **state.g_stats}
            return state.g_apply(variables, guide, batch["crop"], train=False)

    return jax.jit(run)


def make_auto_pipeline(reg_cfg: RegressionConfig, proj_cfg: ProjectorConfig,
                       mesh: Mesh):
    """Fused end-to-end inference (train/pipeline.py) under GSPMD dp×tp."""
    from ..train.pipeline import predicted_guide

    hook = _act_hook(mesh)

    def run(reg_state, proj_state, crop_reg, crop_proj):
        with compute_ctx(proj_cfg, False), conv_output_hook(hook):
            pred = reg_state.apply_fn(
                {"params": reg_state.params, "batch_stats": reg_state.batch_stats},
                crop_reg, train=False,
            )
            env_h, env_w = proj_cfg.crop_size // 2, proj_cfg.crop_size
            guide = predicted_guide(pred, env_h, env_w, proj_cfg.anchors.splat_size)
            variables = {"params": proj_state.g_params, **proj_state.g_stats}
            env = proj_state.g_apply(variables, guide, crop_proj, train=False)
        return env, pred

    return jax.jit(run)
