"""Adversarial training for the SPADE GenProjector (EMLight stage 2).

Functional, jitted replacement for GenProjector/{train.py,model_trainer.py,
models/pix2pix_model.py}:
- TTUR Adam pair (G lr/2, D lr*2, betas (0, 0.9)) — pix2pix_model.py:56-70
- generator step: hinge GAN + mask-weighted feature matching + VGG x5 +
  cosine x5 (pix2pix_model.py:92-127)
- discriminator step: hinge real/fake on a detached fake
  (pix2pix_model.py:129-141); fake+real run through D as ONE batch
  (pix2pix_model.py:147-161)
- the anchor-GT guide env map is rasterized ON DEVICE inside the step
  (render_anchor_params), not in the data loader (GenProjector/data.py:86-102
  does it in __getitem__ with .cuda(), forcing nThreads=0)

Torch-faithful state dynamics: every forward in training mode updates
spectral-norm u vectors and G's BN batch_stats — including G's forward inside
the discriminator step and D's forward inside the generator step.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax

from ..config import ProjectorConfig
from ..losses.gan import cosine_loss, feature_matching_loss, gan_loss
from ..nn.discriminator import MultiscaleDiscriminator
from ..nn.spade import SPADEGenerator
from ..nn.vgg import VGG19Features, vgg_perceptual_loss
from ..representation.splat import render_anchor_params

__all__ = ["ProjectorState", "create_state", "generator_step", "discriminator_step",
           "fused_gan_step", "scanned_fused_steps", "inference", "make_guide"]


class ProjectorState(flax.struct.PyTreeNode):
    step: jax.Array
    g_params: Any
    g_stats: Any          # batch_stats + spectral for G
    d_params: Any
    d_stats: Any          # spectral for D
    g_opt: Any
    d_opt: Any
    tx_g: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    tx_d: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    g_apply: Any = flax.struct.field(pytree_node=False)
    d_apply: Any = flax.struct.field(pytree_node=False)


def make_models(cfg: ProjectorConfig, axis_name: str | None = None):
    g = SPADEGenerator(
        ngf=cfg.ngf,
        norm_type="syncbatch" if "syncbatch" in cfg.norm_g else "instance",
        num_upsampling_layers=cfg.num_upsampling_layers,
        crop_size=cfg.crop_size,
        aspect_ratio=2.0,
        axis_name=axis_name,
        use_vae=getattr(cfg, "use_vae", False),
    )
    d = MultiscaleDiscriminator(ndf=cfg.ndf, num_d=cfg.num_d, n_layers=cfg.n_layers_d)
    return g, d


def _env_hw(cfg: ProjectorConfig):
    # latent (sh, sw) = (crop_size/2^n / aspect, crop_size/2^n) upsampled n
    # times -> output is always (crop_size/2, crop_size) (generator.py:49-88)
    return cfg.crop_size // 2, cfg.crop_size


def _lr_schedule(base_lr: float, cfg: ProjectorConfig, steps_per_epoch: int | None):
    """Constant for niter epochs, then linear decay to 0 over niter_decay
    epochs (the reference's per-epoch lr -= lr0/niter_decay,
    model_trainer.py:68-88)."""
    if steps_per_epoch is None:
        # constant, but still a callable: keeps the optax state STRUCTURE
        # identical to the scheduled case so checkpoints restore into
        # templates built either way
        return lambda step: base_lr

    def schedule(step):
        epoch = step // steps_per_epoch
        over = jnp.maximum(epoch - cfg.niter, 0)
        return base_lr * jnp.clip(1.0 - over / cfg.niter_decay, 0.0, 1.0)

    return schedule


def create_state(rng: jax.Array, cfg: ProjectorConfig, axis_name: str | None = None,
                 steps_per_epoch: int | None = None) -> ProjectorState:
    g, d = make_models(cfg, axis_name)
    env_h, env_w = _env_hw(cfg)
    guide = jnp.zeros((1, env_h, env_w, 3))
    crop = jnp.zeros((1, cfg.crop_size // 2, cfg.crop_size // 2, 3))
    kg, kd = jax.random.split(rng)
    from .regression import run_init

    if getattr(cfg, "use_vae", False):
        kg1, kg2 = jax.random.split(kg)
        gv = run_init(
            functools.partial(g.init, train=True),
            {"params": kg1, "vae": kg2}, guide, crop,
        )
    else:
        gv = run_init(functools.partial(g.init, train=True), kg, guide, crop)
    dv = run_init(
        functools.partial(d.init, train=True),
        kd, jnp.zeros((2, env_h, env_w, cfg.semantic_nc + cfg.output_nc)),
    )
    # TTUR: G lr/2, D lr*2 (pix2pix_model.py:61-68), with optional linear decay
    from .regression import _maybe_clipped

    tx_g = _maybe_clipped(
        optax.adam(_lr_schedule(cfg.lr / 2, cfg, steps_per_epoch), b1=cfg.beta1, b2=cfg.beta2),
        cfg.clip_grad_norm,
    )
    tx_d = _maybe_clipped(
        optax.adam(_lr_schedule(cfg.lr * 2, cfg, steps_per_epoch), b1=cfg.beta1, b2=cfg.beta2),
        cfg.clip_grad_norm,
    )
    g_stats = {k: gv[k] for k in gv if k != "params"}
    d_stats = {k: dv[k] for k in dv if k != "params"}
    return ProjectorState(
        step=jnp.zeros((), jnp.int32),
        g_params=gv["params"],
        g_stats=g_stats,
        d_params=dv["params"],
        d_stats=d_stats,
        g_opt=tx_g.init(gv["params"]),
        d_opt=tx_d.init(dv["params"]),
        tx_g=tx_g,
        tx_d=tx_d,
        g_apply=g.apply,
        d_apply=d.apply,
    )


def compute_ctx(cfg: ProjectorConfig, use_pallas: bool = False):
    """Trace-time contexts for the step bodies: Pallas kernel dispatch and
    mixed-precision conv compute (cfg.dtype='bfloat16' -> bf16 gathers/matmuls
    with f32 accumulation; everything else stays f32)."""
    from ..nn.sphere_conv import conv_compute_dtype, pallas_sphere_convs

    stack = contextlib.ExitStack()
    stack.enter_context(pallas_sphere_convs(use_pallas))
    if cfg.dtype == "bfloat16":
        stack.enter_context(conv_compute_dtype(jnp.bfloat16))
    return stack


def make_guide(batch, cfg: ProjectorConfig):
    """Rasterize the anchor-GT environment map (GenProjector/data.py:86-102):
    env = (splat(dist * intensity * rgb) + ambient) * alpha."""
    env_h, env_w = _env_hw(cfg)
    env = render_anchor_params(
        batch["distribution"], batch["intensity"], batch["rgb_ratio"],
        batch["ambient"], n=batch["distribution"].shape[-1],
        h=env_h, w=env_w, size=cfg.anchors.splat_size,
    )
    return env * batch["alpha"][:, None, None, None]


def _run_g(state, g_params, guide, crop, train, vae_rng=None, want_vae=False):
    """Generator forward. vae_rng: PRNG key for the --use_vae reparameterized
    latent (required for train=True on a use_vae model). want_vae=True also
    returns the sown (mu, logvar) for the KLD loss — the 'vae_stats'
    collection is kept OUT of g_stats so the checkpoint tree is identical
    with or without the flag."""
    variables = {"params": g_params, **state.g_stats}
    mutable = ["batch_stats", "spectral"] + (["vae_stats"] if want_vae else [])
    kwargs = {"rngs": {"vae": vae_rng}} if vae_rng is not None else {}
    out, mut = state.g_apply(
        variables, guide, crop, train=train, mutable=mutable, **kwargs
    )
    if want_vae:
        vs = mut["vae_stats"]
        g_mut = {k: v for k, v in mut.items() if k != "vae_stats"}
        return out, g_mut, (vs["mu"][0], vs["logvar"][0])
    return out, mut


def _run_d(state, d_params, guide, fake, real, train):
    # fake and real concatenated through D in one batch (pix2pix_model.py:147-161)
    x = jnp.concatenate(
        [jnp.concatenate([guide, fake], -1), jnp.concatenate([guide, real], -1)], 0
    )
    variables = {"params": d_params, **state.d_stats}
    out, mut = state.d_apply(variables, x, train=train, mutable=["spectral"])
    split = lambda t: (t[: t.shape[0] // 2], t[t.shape[0] // 2 :])
    pred_fake = [[split(t)[0] for t in per_d] for per_d in out]
    pred_real = [[split(t)[1] for t in per_d] for per_d in out]
    return pred_fake, pred_real, mut


@functools.partial(jax.jit, static_argnames=("cfg", "vgg_apply", "use_pallas"))
def generator_step(state: ProjectorState, batch, cfg: ProjectorConfig,
                   vgg_apply=None, vgg_variables=None, use_pallas: bool = False):
    """use_pallas (TPU): stride-1 sphere convs run the fused custom-VJP
    kernel — differentiable, ~2.4x on the high-res layers."""
    with compute_ctx(cfg, use_pallas):
        return _generator_step_body(state, batch, cfg, vgg_apply, vgg_variables)


def _generator_step_body(state, batch, cfg, vgg_apply, vgg_variables):
    guide = make_guide(batch, cfg)
    crop, real = batch["crop"], batch["warped"]
    light_map = batch["map"][..., None]

    use_vae = getattr(cfg, "use_vae", False)
    vae_rng = (
        jax.random.fold_in(jax.random.PRNGKey(0xEA), state.step) if use_vae else None
    )

    def loss_fn(g_params):
        if use_vae:
            fake, g_mut, (mu, logvar) = _run_g(
                state, g_params, guide, crop, True, vae_rng, want_vae=True
            )
        else:
            fake, g_mut = _run_g(state, g_params, guide, crop, True)
        pred_fake, pred_real, d_mut = _run_d(state, state.d_params, guide, fake, real, True)
        losses = {
            "GAN": gan_loss(pred_fake, True, for_discriminator=False, mode=cfg.gan_mode),
            "GAN_Feat": feature_matching_loss(
                pred_fake, pred_real, light_map, cfg.ambient_feat_weight
            ),
            "COS": cosine_loss(fake, real) * cfg.lambda_cos,
        }
        if vgg_apply is not None:
            losses["VGG"] = cfg.lambda_vgg * vgg_perceptual_loss(
                vgg_apply, vgg_variables, fake, real
            )
        if use_vae:
            from ..losses.gan import kld_loss

            losses["KLD"] = kld_loss(mu, logvar) * getattr(cfg, "lambda_kld", 0.05)
        total = sum(losses.values())
        return total, (losses, g_mut, d_mut, fake)

    (total, (losses, g_mut, d_mut, fake)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.g_params)
    updates, g_opt = state.tx_g.update(grads, state.g_opt, state.g_params)
    state = state.replace(
        g_params=optax.apply_updates(state.g_params, updates),
        g_opt=g_opt,
        g_stats=g_mut,
        d_stats=d_mut,
        step=state.step + 1,
    )
    return state, {**losses, "loss_G": total}, fake


@functools.partial(jax.jit, static_argnames=("cfg", "use_pallas"))
def discriminator_step(state: ProjectorState, batch, cfg: ProjectorConfig,
                       use_pallas: bool = False):
    with compute_ctx(cfg, use_pallas):
        return _discriminator_step_body(state, batch, cfg)


def _discriminator_step_body(state, batch, cfg):
    guide = make_guide(batch, cfg)
    crop, real = batch["crop"], batch["warped"]
    # generate_fake runs in train mode (updates G stats) but detached
    # (pix2pix_model.py:129-134). A use_vae generator re-samples its latent
    # here, exactly like upstream SPADE's D pass.
    d_vae_rng = (
        jax.random.fold_in(jax.random.PRNGKey(0xDA), state.step)
        if getattr(cfg, "use_vae", False) else None
    )
    fake, g_mut = _run_g(state, state.g_params, guide, crop, True, d_vae_rng)
    fake = jax.lax.stop_gradient(fake)

    def loss_fn(d_params):
        pred_fake, pred_real, d_mut = _run_d(state, d_params, guide, fake, real, True)
        d_fake = gan_loss(pred_fake, False, for_discriminator=True, mode=cfg.gan_mode)
        d_real = gan_loss(pred_real, True, for_discriminator=True, mode=cfg.gan_mode)
        return d_fake + d_real, (d_fake, d_real, d_mut)

    (total, (d_fake, d_real, d_mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.d_params
    )
    updates, d_opt = state.tx_d.update(grads, state.d_opt, state.d_params)
    state = state.replace(
        d_params=optax.apply_updates(state.d_params, updates),
        d_opt=d_opt,
        g_stats=g_mut,
        d_stats=d_mut,
    )
    return state, {"D_Fake": d_fake, "D_real": d_real, "loss_D": total}


@functools.partial(jax.jit, static_argnames=("cfg", "vgg_apply", "use_pallas"))
def fused_gan_step(state: ProjectorState, batch, cfg: ProjectorConfig,
                   vgg_apply=None, vgg_variables=None, use_pallas: bool = False):
    """One G update + one D update sharing a single generator forward.

    The reference's alternating recipe (train.py:26-69) runs G's forward twice
    per iteration — once for the G step, once (detached) for the D step
    (pix2pix_model.py:129-134) — and the regenerated fake dominates the D
    step's cost (measured: 206 of 229 ms at full size bs 8 bf16). This step
    computes the fake ONCE and takes both updates from it:

    - G grads are IDENTICAL to generator_step's (same loss, same params).
    - D grads equal discriminator_step's evaluated at the PRE-update G —
      a Jacobi (simultaneous) update instead of the reference's Gauss-Seidel
      (alternating) one; both are standard GAN trainings, but the iterate
      sequence differs from the reference, so this mode is opt-in
      (--fused in cli.train_projector, requires d_steps_per_g == 1).
    - G's BN/spectral stats update once per iteration (alternating updates
      them twice: the D step reruns G in train mode).
    """
    with compute_ctx(cfg, use_pallas):
        return _fused_gan_step_body(state, batch, cfg, vgg_apply, vgg_variables)


def _fused_gan_step_body(state, batch, cfg, vgg_apply, vgg_variables):
    guide = make_guide(batch, cfg)
    crop, real = batch["crop"], batch["warped"]
    light_map = batch["map"][..., None]

    use_vae = getattr(cfg, "use_vae", False)
    vae_rng = (
        jax.random.fold_in(jax.random.PRNGKey(0xEA), state.step) if use_vae else None
    )

    def g_loss_fn(g_params):
        if use_vae:
            fake, g_mut, (mu, logvar) = _run_g(
                state, g_params, guide, crop, True, vae_rng, want_vae=True
            )
        else:
            fake, g_mut = _run_g(state, g_params, guide, crop, True)
        pred_fake, pred_real, _ = _run_d(state, state.d_params, guide, fake, real, True)
        losses = {
            "GAN": gan_loss(pred_fake, True, for_discriminator=False, mode=cfg.gan_mode),
            "GAN_Feat": feature_matching_loss(
                pred_fake, pred_real, light_map, cfg.ambient_feat_weight
            ),
            "COS": cosine_loss(fake, real) * cfg.lambda_cos,
        }
        if vgg_apply is not None:
            losses["VGG"] = cfg.lambda_vgg * vgg_perceptual_loss(
                vgg_apply, vgg_variables, fake, real
            )
        if use_vae:
            from ..losses.gan import kld_loss

            losses["KLD"] = kld_loss(mu, logvar) * getattr(cfg, "lambda_kld", 0.05)
        return sum(losses.values()), (losses, g_mut, fake)

    (g_total, (g_losses, g_mut, fake)), g_grads = jax.value_and_grad(
        g_loss_fn, has_aux=True
    )(state.g_params)
    fake = jax.lax.stop_gradient(fake)

    def d_loss_fn(d_params):
        pred_fake, pred_real, d_mut = _run_d(state, d_params, guide, fake, real, True)
        d_fake = gan_loss(pred_fake, False, for_discriminator=True, mode=cfg.gan_mode)
        d_real = gan_loss(pred_real, True, for_discriminator=True, mode=cfg.gan_mode)
        return d_fake + d_real, (d_fake, d_real, d_mut)

    (d_total, (d_fake, d_real, d_mut)), d_grads = jax.value_and_grad(
        d_loss_fn, has_aux=True
    )(state.d_params)

    g_updates, g_opt = state.tx_g.update(g_grads, state.g_opt, state.g_params)
    d_updates, d_opt = state.tx_d.update(d_grads, state.d_opt, state.d_params)
    state = state.replace(
        g_params=optax.apply_updates(state.g_params, g_updates),
        d_params=optax.apply_updates(state.d_params, d_updates),
        g_opt=g_opt,
        d_opt=d_opt,
        g_stats=g_mut,
        d_stats=d_mut,
        step=state.step + 1,
    )
    metrics = {**g_losses, "loss_G": g_total,
               "D_Fake": d_fake, "D_real": d_real, "loss_D": d_total}
    return state, metrics, fake


@functools.partial(jax.jit, static_argnames=("cfg", "vgg_apply", "use_pallas"))
def scanned_fused_steps(state: ProjectorState, batches, cfg: ProjectorConfig,
                        vgg_apply=None, vgg_variables=None, use_pallas: bool = False):
    """N fused G+D steps under one lax.scan (--scan_steps N).

    `batches` is a batch pytree with a leading scan axis: every leaf is
    (N, B, ...). Step math is IDENTICAL to fused_gan_step iterated N times
    (same state trajectory, tested elementwise); the win is dispatch: one
    device program per N iterations instead of N host->device round trips —
    measured 120 full-size iters in 99.9 s scanned vs 310.6 s alternating
    (BASELINE.md). Returns (state, metrics stacked (N,), last fake) so the
    caller logs every step but only materializes one image batch.
    """
    with compute_ctx(cfg, use_pallas):
        def body(carry, batch):
            s, _ = carry
            s, metrics, fake = _fused_gan_step_body(s, batch, cfg, vgg_apply, vgg_variables)
            return (s, fake), metrics

        env_h, env_w = _env_hw(cfg)
        b = jax.tree.leaves(batches)[0].shape[1]
        fake0 = jnp.zeros((b, env_h, env_w, cfg.output_nc))
        (state, fake), metrics = jax.lax.scan(body, (state, fake0), batches)
        return state, metrics, fake


@functools.partial(jax.jit, static_argnames=("cfg", "use_pallas"))
def inference(state: ProjectorState, batch, cfg: ProjectorConfig, use_pallas: bool = False):
    """Eval-mode generation (pix2pix_model.py:49-52).

    use_pallas routes high-resolution sphere convs through the fused Pallas
    kernel (TPU inference only — it has no VJP); ~1.6x on the full generator.
    """
    with compute_ctx(cfg, use_pallas):
        guide = make_guide(batch, cfg)
        variables = {"params": state.g_params, **state.g_stats}
        return state.g_apply(variables, guide, batch["crop"], train=False)
