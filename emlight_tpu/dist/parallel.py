"""SPMD data-parallel train steps via shard_map over the device mesh.

Semantics preserved vs single-device training:
- gradients pmean'd across the data axis (the reference's DataParallel
  gather-and-average, GenProjector/model_trainer.py:20-24)
- BatchNorm statistics pmean'd INSIDE the layer via axis_name — global-batch
  statistics, exactly what the vendored SyncBN computed with its thread-queue
  master/slave protocol (sync_batchnorm/batchnorm.py:63-126)
- the Sinkhorn ε-schedule diameter pmax'd so the loss sees the global batch
  range (geomloss sinkhorn_divergence.py:9-18 semantics)

Params are replicated; optimizer updates are computed identically on every
shard, so replication is preserved without any broadcast step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import ProjectorConfig, RegressionConfig
from ..losses.gan import cosine_loss, feature_matching_loss, gan_loss
from ..train import projector as proj
from ..train import regression as reg
from .mesh import DATA_AXIS

__all__ = ["make_parallel_regression_step", "make_parallel_projector_steps",
           "make_parallel_fused_step", "make_parallel_predict",
           "make_parallel_inference", "make_parallel_pipeline"]


def make_parallel_regression_step(cfg: RegressionConfig, mesh: Mesh):
    """Returns step(state, batch) -> (state, metrics); batch sharded on axis 0.

    The state must be built with reg.create_state(rng, cfg, axis_name=DATA_AXIS)
    so BatchNorm cross-replica statistics are enabled.
    """

    def core(state, batch):
        grad_fn = jax.value_and_grad(reg.loss_fn, has_aux=True)
        (_, (metrics, new_stats, _)), grads = grad_fn(
            state.params, state.batch_stats, state.apply_fn, batch, cfg, True, DATA_AXIS
        )
        grads = jax.lax.pmean(grads, DATA_AXIS)
        metrics = jax.lax.pmean(metrics, DATA_AXIS)
        return state.apply_gradients(grads, new_stats), metrics

    sharded = shard_map(
        core,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_parallel_projector_steps(cfg: ProjectorConfig, mesh: Mesh,
                                  vgg_apply=None, vgg_variables=None,
                                  use_pallas: bool = False):
    """Returns (g_step, d_step) shard_mapped over the data axis.

    State from proj.create_state(rng, cfg, axis_name=DATA_AXIS). The fake image
    returned by g_step stays sharded over the data axis. vgg_apply/variables
    enable the perceptual term exactly as in the single-device step; use_pallas
    and cfg.dtype select the same kernel/precision paths (proj.compute_ctx).
    """

    def g_core(state, batch):
        with proj.compute_ctx(cfg, use_pallas):
            return _g_core(state, batch)

    def _g_core(state, batch):
        guide = proj.make_guide(batch, cfg)
        crop, real = batch["crop"], batch["warped"]
        light_map = batch["map"][..., None]

        def loss_fn(g_params):
            fake, g_mut = proj._run_g(state, g_params, guide, crop, True)
            pred_fake, pred_real, d_mut = proj._run_d(
                state, state.d_params, guide, fake, real, True
            )
            losses = {
                "GAN": gan_loss(pred_fake, True, False, cfg.gan_mode),
                "GAN_Feat": feature_matching_loss(
                    pred_fake, pred_real, light_map, cfg.ambient_feat_weight
                ),
                "COS": cosine_loss(fake, real) * cfg.lambda_cos,
            }
            if vgg_apply is not None:
                from ..nn.vgg import vgg_perceptual_loss

                losses["VGG"] = cfg.lambda_vgg * vgg_perceptual_loss(
                    vgg_apply, vgg_variables, fake, real
                )
            return sum(losses.values()), (losses, g_mut, d_mut, fake)

        (total, (losses, g_mut, d_mut, fake)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.g_params)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        losses = jax.lax.pmean({**losses, "loss_G": total}, DATA_AXIS)
        # spectral u vectors follow per-shard power iterations on identical
        # weights; pmean keeps them bitwise-replicated
        g_mut = jax.lax.pmean(g_mut, DATA_AXIS)
        d_mut = jax.lax.pmean(d_mut, DATA_AXIS)
        updates, g_opt = state.tx_g.update(grads, state.g_opt, state.g_params)
        state = state.replace(
            g_params=optax.apply_updates(state.g_params, updates),
            g_opt=g_opt, g_stats=g_mut, d_stats=d_mut, step=state.step + 1,
        )
        return state, losses, fake

    def d_core(state, batch):
        with proj.compute_ctx(cfg, use_pallas):
            return _d_core(state, batch)

    def _d_core(state, batch):
        guide = proj.make_guide(batch, cfg)
        crop, real = batch["crop"], batch["warped"]
        fake, g_mut = proj._run_g(state, state.g_params, guide, crop, True)
        fake = jax.lax.stop_gradient(fake)

        def loss_fn(d_params):
            pred_fake, pred_real, d_mut = proj._run_d(
                state, d_params, guide, fake, real, True
            )
            d_f = gan_loss(pred_fake, False, True, cfg.gan_mode)
            d_r = gan_loss(pred_real, True, True, cfg.gan_mode)
            return d_f + d_r, (d_f, d_r, d_mut)

        (total, (d_f, d_r, d_mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.d_params
        )
        grads = jax.lax.pmean(grads, DATA_AXIS)
        metrics = jax.lax.pmean({"D_Fake": d_f, "D_real": d_r, "loss_D": total}, DATA_AXIS)
        updates, d_opt = state.tx_d.update(grads, state.d_opt, state.d_params)
        state = state.replace(
            d_params=optax.apply_updates(state.d_params, updates),
            d_opt=d_opt, g_stats=jax.lax.pmean(g_mut, DATA_AXIS),
            d_stats=jax.lax.pmean(d_mut, DATA_AXIS),
        )
        return state, metrics

    g_step = jax.jit(shard_map(
        g_core, mesh=mesh, in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P(), P(DATA_AXIS)), check_vma=False,
    ))
    d_step = jax.jit(shard_map(
        d_core, mesh=mesh, in_specs=(P(), P(DATA_AXIS)), out_specs=(P(), P()),
        check_vma=False,
    ))
    return g_step, d_step


def make_parallel_fused_step(cfg: ProjectorConfig, mesh: Mesh,
                             vgg_apply=None, vgg_variables=None,
                             use_pallas: bool = False):
    """shard_mapped fused G+D step (one shared generator forward per
    iteration; Jacobi updates — see proj.fused_gan_step). Same cross-replica
    semantics as the alternating pair: grads/losses/stats pmean'd, BN runs
    global-batch statistics via axis_name."""

    def core(state, batch):
        with proj.compute_ctx(cfg, use_pallas):
            return _core(state, batch)

    def _core(state, batch):
        guide = proj.make_guide(batch, cfg)
        crop, real = batch["crop"], batch["warped"]
        light_map = batch["map"][..., None]

        def g_loss_fn(g_params):
            fake, g_mut = proj._run_g(state, g_params, guide, crop, True)
            pred_fake, pred_real, _ = proj._run_d(
                state, state.d_params, guide, fake, real, True
            )
            losses = {
                "GAN": gan_loss(pred_fake, True, False, cfg.gan_mode),
                "GAN_Feat": feature_matching_loss(
                    pred_fake, pred_real, light_map, cfg.ambient_feat_weight
                ),
                "COS": cosine_loss(fake, real) * cfg.lambda_cos,
            }
            if vgg_apply is not None:
                from ..nn.vgg import vgg_perceptual_loss

                losses["VGG"] = cfg.lambda_vgg * vgg_perceptual_loss(
                    vgg_apply, vgg_variables, fake, real
                )
            return sum(losses.values()), (losses, g_mut, fake)

        (g_total, (g_losses, g_mut, fake)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g_params)
        fake = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            pred_fake, pred_real, d_mut = proj._run_d(
                state, d_params, guide, fake, real, True
            )
            d_f = gan_loss(pred_fake, False, True, cfg.gan_mode)
            d_r = gan_loss(pred_real, True, True, cfg.gan_mode)
            return d_f + d_r, (d_f, d_r, d_mut)

        (d_total, (d_f, d_r, d_mut)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.d_params)

        g_grads = jax.lax.pmean(g_grads, DATA_AXIS)
        d_grads = jax.lax.pmean(d_grads, DATA_AXIS)
        metrics = jax.lax.pmean(
            {**g_losses, "loss_G": g_total,
             "D_Fake": d_f, "D_real": d_r, "loss_D": d_total},
            DATA_AXIS,
        )
        g_updates, g_opt = state.tx_g.update(g_grads, state.g_opt, state.g_params)
        d_updates, d_opt = state.tx_d.update(d_grads, state.d_opt, state.d_params)
        state = state.replace(
            g_params=optax.apply_updates(state.g_params, g_updates),
            d_params=optax.apply_updates(state.d_params, d_updates),
            g_opt=g_opt, d_opt=d_opt,
            g_stats=jax.lax.pmean(g_mut, DATA_AXIS),
            d_stats=jax.lax.pmean(d_mut, DATA_AXIS),
            step=state.step + 1,
        )
        return state, metrics, fake

    return jax.jit(shard_map(
        core, mesh=mesh, in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P(), P(DATA_AXIS)), check_vma=False,
    ))


def make_parallel_predict(cfg: RegressionConfig, mesh: Mesh, apply_fn=None):
    """Data-parallel regression inference: crops sharded over the data axis.

    The reference has no multi-GPU inference path (RegressionNetwork/test.py
    is single-device); serving here weak-scales across chips. Eval-mode BN
    reads stored statistics, so no collectives are emitted — XLA just runs
    each shard's forward locally. The crop batch must be divisible by the
    mesh's data-axis size (mesh.pad_leading handles ragged tails).

    Each shard runs the default concat-free eval forward
    (train/regression.py::make_eval_apply); pass `apply_fn` to override
    (e.g. `state.apply_fn` for the reference-shaped forward).
    """
    eval_apply = apply_fn or reg.make_eval_apply(cfg)

    def core(state, crop):
        return reg.predict(eval_apply, state.params, state.batch_stats, crop)

    sharded = shard_map(
        core,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_parallel_pipeline(reg_cfg: RegressionConfig, proj_cfg: ProjectorConfig,
                           mesh: Mesh, use_pallas: bool = False):
    """Data-parallel fused two-stage inference (crop -> regression -> guide ->
    generator), crops sharded over the data axis, both states replicated.
    Serving weak-scales: each chip runs the full pipeline on its shard with no
    collectives (eval-mode BN reads stored statistics)."""
    from ..train.pipeline import pipeline_inference

    def core(reg_state, proj_state, crop_reg, crop_proj):
        return pipeline_inference(
            reg_state, proj_state, crop_reg, crop_proj,
            reg_cfg, proj_cfg, use_pallas=use_pallas,
        )

    sharded = shard_map(
        core,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_parallel_inference(cfg: ProjectorConfig, mesh: Mesh, use_pallas: bool = False):
    """Data-parallel generator synthesis (GenProjector/test.py path, sharded).

    Batch dict sharded on axis 0; params/stats replicated. The guide env map
    is rasterized on-device inside each shard, as in the single-device path.
    """

    def core(state, batch):
        return proj.inference(state, batch, cfg, use_pallas=use_pallas)

    sharded = shard_map(
        core,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(sharded)
