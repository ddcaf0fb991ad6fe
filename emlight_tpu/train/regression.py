"""Jitted training/eval for the DenseNet anchor regressor (EMLight stage 1).

Replaces the module-level script loop of RegressionNetwork/train.py:73-167
with a functional, jit-compiled train step: Adam(1e-4), loss =
1000·Sinkhorn(dist) + 1000·L2(dist) + 0.1·L2(intensity) + 100·L2(rgb) +
1·L2(ambient) (train.py:92-98). Batch-stat updates ride the same step
(mutable batch_stats collection); under a device mesh the step is shard_map'd
by dist/ with BN stats pmean'd across replicas.
"""

from __future__ import annotations

import functools
from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax

from ..config import RegressionConfig
from ..losses.sinkhorn import SamplesLoss
from ..nn.densenet import DenseNet

__all__ = ["RegressionState", "create_state", "train_step", "eval_step", "loss_fn",
           "run_init", "make_eval_apply", "make_train_apply", "make_baked_infer"]


def run_init(init_fn, *args):
    """Run a flax `Module.init` the fastest way for the current backend.

    On accelerators the init is jitted: eager per-op dispatch through a
    tunneled runtime costs ~100ms/op and init is hundreds of tiny ops. On CPU
    the trade inverts — XLA-compiling the full init graph costs minutes for
    the SPADE stack while eager execution takes seconds — so run it eagerly.
    Same values either way (init math is elementwise + convs).
    """
    if jax.default_backend() == "cpu":
        return init_fn(*args)
    return jax.jit(init_fn)(*args)


class RegressionState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Any = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def _maybe_clipped(tx: optax.GradientTransformation, clip_norm: float):
    """Chain global-norm clipping in front of an optimizer when clip_norm > 0.

    Off by default (reference parity — no clipping anywhere upstream; its
    README prescribes manual reload-and-retrain NaN recovery instead,
    README.md:31). Enabling changes the opt-state STRUCTURE, so a run's
    setting must match between train and resume (the config snapshot in
    opt.json records it).
    """
    if clip_norm and clip_norm > 0:
        return optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx


def make_model(cfg: RegressionConfig, axis_name: str | None = None) -> DenseNet:
    return DenseNet(
        n_anchors=cfg.anchors.regression_anchors,
        block_config=cfg.block_config,
        growth_rate=cfg.growth_rate,
        num_init_features=cfg.num_init_features,
        axis_name=axis_name,
        dtype=jnp.dtype(cfg.dtype),
        remat=cfg.remat,
    )


def create_state(rng: jax.Array, cfg: RegressionConfig, axis_name: str | None = None) -> RegressionState:
    model = make_model(cfg, axis_name)
    dummy = jnp.zeros((1, cfg.crop_h, cfg.crop_w, 3), dtype=jnp.float32)
    variables = run_init(functools.partial(model.init, train=True), rng, dummy)
    tx = _maybe_clipped(
        optax.adam(cfg.lr, b1=cfg.betas[0], b2=cfg.betas[1]), cfg.clip_grad_norm
    )
    if getattr(cfg, "train_forward", "buffer") == "buffer":
        apply_fn = make_train_apply(cfg, axis_name)
    else:
        apply_fn = model.apply
    return RegressionState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=apply_fn,
    )


def _make_sinkhorn(cfg: RegressionConfig, axis_name: str | None = None) -> SamplesLoss:
    s = cfg.sinkhorn
    return SamplesLoss(
        "sinkhorn",
        p=s.p,
        blur=s.blur,
        scaling=s.scaling,
        diameter=s.diameter,
        n_iters=s.n_iters,
        n_anchors=cfg.anchors.regression_anchors,
        backend=s.backend,
        axis_name=axis_name,
    )


def loss_fn(params, batch_stats, apply_fn, batch, cfg: RegressionConfig, train: bool,
            axis_name: str | None = None):
    """Forward + composite loss. batch: crop (B,H,W,3), distribution (B,N),
    intensity (B,), rgb_ratio (B,3), ambient (B,3)."""
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        pred, mutated = apply_fn(variables, batch["crop"], train=True, mutable=["batch_stats"])
        new_stats = mutated["batch_stats"]
    else:
        pred = apply_fn(variables, batch["crop"], train=False)
        new_stats = batch_stats

    emd = _make_sinkhorn(cfg, axis_name)
    dist_pred = pred["distribution"]
    dist_gt = batch["distribution"]
    mse = lambda a, b: jnp.mean((a - b) ** 2)

    # The reference SUMS the EMD over the batch (train.py:92) while every L2
    # term is a mean; under a data mesh the local sum must be scaled by the
    # axis size so pmean(grads) reproduces the global-batch sum.
    emd_scale = jax.lax.psum(1.0, axis_name) if axis_name is not None else 1.0
    dist_emloss = emd(dist_pred[..., None], dist_gt[..., None]).sum() * cfg.w_emd * emd_scale
    dist_l2loss = mse(dist_pred, dist_gt) * cfg.w_dist_l2
    intensity_loss = mse(pred["intensity"][:, 0], batch["intensity"]) * cfg.w_intensity
    rgb_loss = mse(pred["rgb_ratio"], batch["rgb_ratio"]) * cfg.w_rgb
    ambient_loss = mse(pred["ambient"], batch["ambient"]) * cfg.w_ambient
    total = dist_emloss + dist_l2loss + intensity_loss + rgb_loss + ambient_loss

    metrics = {
        "loss": total,
        "dist_emloss": dist_emloss,
        "dist_l2loss": dist_l2loss,
        "intensity_loss": intensity_loss,
        "rgb_loss": rgb_loss,
        "ambient_loss": ambient_loss,
    }
    return total, (metrics, new_stats, pred)


@functools.partial(jax.jit, static_argnames=("cfg",))
def train_step(state: RegressionState, batch, cfg: RegressionConfig):
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (_, (metrics, new_stats, _)), grads = grad_fn(
        state.params, state.batch_stats, state.apply_fn, batch, cfg, True
    )
    if cfg.log_grad_norms:
        # the reference's gradient probes (check_grad on the prediction heads,
        # check_module on the backbone — panorama.py:41-64) as metrics
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        for head in ("fc_dist", "fc_intensity", "fc_rgb_ratio", "fc_ambient"):
            if head in grads:
                metrics[f"grad_norm_{head}"] = optax.global_norm(grads[head])
    return state.apply_gradients(grads, new_stats), metrics


@functools.partial(jax.jit, static_argnames=("cfg",))
def eval_step(state: RegressionState, batch, cfg: RegressionConfig):
    _, (metrics, _, pred) = loss_fn(
        state.params, state.batch_stats, state.apply_fn, batch, cfg, False
    )
    return metrics, pred


@functools.partial(jax.jit, static_argnames=("apply_fn",))
def predict(apply_fn, params, batch_stats, crop):
    """Inference: crop -> anchor parameter dict (RegressionNetwork/test.py path)."""
    return apply_fn({"params": params, "batch_stats": batch_stats}, crop, train=False)


def make_train_apply(cfg: RegressionConfig, axis_name: str | None = None):
    """The DEFAULT training forward: concat-free NCHW buffer forward with the
    structured block VJP (nn/densenet_fast.train_apply) as a drop-in apply_fn.

    Measured on a v5e chip (bs 16 bf16, 2026-08-20): fwd+bwd 171 ms vs 211 ms
    for the standard DenseNet.apply graph — the standard training forward
    rewrites the growing channel-concat every dense layer exactly like the
    eval forward `make_eval_apply` replaced. Gradients and new batch stats
    match the standard apply to ~1e-13 in f64 (tests/test_densenet_fast.py);
    f32/bf16 differences are float reassociation noise of the same size the
    standard graph carries against a f64 gold run.

    Consumes/produces the standard variables tree — resume and torch-imported
    checkpoints work unchanged. train=False dispatches to the eval buffer
    forward. Under a device mesh pass `axis_name` for pmean'd (SyncBN) batch
    moments, matching flax's BatchNorm(axis_name=...) semantics.
    """
    from ..nn.densenet_fast import buffer_apply as _buffer_apply
    from ..nn.densenet_fast import train_apply as _train_apply

    dt = jnp.dtype(cfg.dtype)

    def apply_fn(variables, crop, train: bool = False, mutable=None):
        if not train:
            return _buffer_apply(
                variables["params"], variables["batch_stats"], crop,
                block_config=cfg.block_config, growth_rate=cfg.growth_rate,
                num_init_features=cfg.num_init_features, dtype=dt,
            )
        heads, new_stats = _train_apply(
            variables["params"], variables["batch_stats"], crop,
            block_config=cfg.block_config, growth_rate=cfg.growth_rate,
            num_init_features=cfg.num_init_features, dtype=dt,
            axis_name=axis_name,
        )
        return heads, {"batch_stats": new_stats}

    return apply_fn


def make_eval_apply(cfg: RegressionConfig):
    """The DEFAULT inference forward: concat-free NCHW buffer eval
    (nn/densenet_fast.buffer_apply) as a drop-in apply_fn.

    Measured on a v5e chip (bs 128 bf16, env render on, scripts/
    exp_fast_apply.py, 2026-08-19): 400.9 img/s vs 294.1 for the standard
    DenseNet.apply (1.36x) — the growing channel-concat the standard forward
    rewrites every dense layer is pure HBM traffic; the buffer forward
    dynamic-update-slices 12 contiguous channel planes instead. The slab-
    grouped fast_apply variants measured SLOWER than baseline (281/251/251
    img/s at group 4/8/2) and stay in scripts/exp_fast_apply.py as a ledger.

    Consumes the standard variables tree — trained and torch-imported
    checkpoints work unchanged. Eval only (train=True raises).
    """
    from ..nn.densenet_fast import buffer_apply as _buffer_apply

    def apply_fn(variables, crop, train: bool = False):
        assert not train, "buffer_apply is an eval-only forward"
        return _buffer_apply(
            variables["params"], variables["batch_stats"], crop,
            block_config=cfg.block_config,
            growth_rate=cfg.growth_rate,
            num_init_features=cfg.num_init_features,
            dtype=jnp.dtype(cfg.dtype),
        )

    return apply_fn


def make_baked_infer(cfg: RegressionConfig, params, batch_stats):
    """Deployment inference: weights closed over as COMPILE-TIME CONSTANTS.

    XLA folds the BN eval affines and pre-lays-out every kernel when weights
    are jaxpr constants instead of arguments: 390 -> 585 img/s at bs 128 bf16
    on a v5e for the flagship forward + env-recon (measured 2026-08-20; same
    outputs bit-for-bit). The trade is one recompile per checkpoint — the
    serving scenario. Returns a jitted `infer(crop) -> head dict` closure on
    the concat-free buffer forward.
    """
    eval_apply = make_eval_apply(cfg)
    variables = {"params": params, "batch_stats": batch_stats}

    @jax.jit
    def infer(crop):
        return eval_apply(variables, crop, train=False)

    return infer


def fold_for_inference(cfg: RegressionConfig, params, batch_stats):
    """Eval fast path: (apply_fn, params', batch_stats') with every dense
    layer's norm2 BN affine folded into its conv2 kernel + bias.

    A pure parameter transform (nn/densenet.py::fold_eval_variables) — exact
    up to f32 reassociation — that deletes one normalize pass per dense layer
    at inference. Works on trained and torch-imported checkpoints alike.
    """
    import dataclasses as _dc

    from ..nn.densenet import fold_eval_variables

    model = _dc.replace(make_model(cfg), fold_bn=True)
    p, s = fold_eval_variables(params, batch_stats)
    return model.apply, p, s
