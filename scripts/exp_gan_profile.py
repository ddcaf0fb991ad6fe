"""Component breakdown of the bf16 bs8 GAN G step on the real chip.

Round-3's scalar-weight kernel change (BASELINE.md) collapsed the G step
571 -> 380 ms and invalidated the round-2 breakdown (G fwd 206 / G bwd 526 /
D fwd 3 / D bwd 45 / rest 7 = 785 ms). This re-measures the stack so the next
kernel lever has a name:

    python scripts/exp_gan_profile.py [--batch 8] [--steps 10]

Each row is an on-device scan of the component (one dispatch, one fetch),
compiled exactly once. Deltas between rows isolate G bwd, D fwd+bwd, and
loss/optimizer overhead.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/emlight_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from emlight_tpu.config import ProjectorConfig
from emlight_tpu.train import projector as P
from emlight_tpu.train.data import synthetic_projector_batch
from emlight_tpu.train.projector import make_guide


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    cfg = dataclasses.replace(
        ProjectorConfig(), batch_size=args.batch, use_vgg_loss=False,
        dtype=args.dtype,
    )
    state = P.create_state(jax.random.PRNGKey(0), cfg)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_projector_batch(
            args.batch, n_anchors=cfg.anchors.n_anchors,
            crop_size=cfg.crop_size // 2,
            env_hw=(cfg.crop_size // 2, cfg.crop_size),
        ).items()
    }
    use_pallas = jax.devices()[0].platform == "tpu"
    steps = args.steps

    def scanned(body):
        def run(st, b):
            with P.compute_ctx(cfg, use_pallas):
                def sbody(carry, _):
                    return body(carry, b)
                return jax.lax.scan(sbody, st, None, length=steps)
        return run

    def measure(name, body, st=state, fetch=None):
        fn = scanned(body)
        compiled = jax.jit(fn).lower(st, batch).compile()
        out = compiled(st, batch)
        f = fetch or (lambda o: jax.tree.leaves(o[1])[0][-1])
        float(f(out))
        t0 = time.perf_counter()
        out = compiled(st, batch)
        float(f(out))
        ms = (time.perf_counter() - t0) / steps * 1000
        print(f"{name:<46} {ms:8.1f} ms/step", flush=True)
        return ms

    # --- eval-mode synthesis (no stats mutation, no grads). The state rides
    # the scan CARRY: closing over it embeds ~100 MB of weights as HLO
    # constants, which the tunnel's remote-compile service rejects (HTTP 413
    # length limit). The acc perturbation defeats loop-invariant hoisting.
    def synth_body(carry, b):
        st, acc = carry
        guide = make_guide(b, cfg)
        variables = {"params": st.g_params, **st.g_stats}
        fake = st.g_apply(variables, guide + acc * 1e-30, b["crop"], train=False)
        return (st, acc + jnp.sum(fake)), jnp.sum(fake)

    measure("G fwd eval (synthesis)", synth_body, (state, jnp.float32(0.0)),
            fetch=lambda o: o[0][1])

    # --- train-mode G forward only (mutates stats, no grads)
    def g_fwd_body(st, b):
        guide = make_guide(b, cfg)
        fake, g_mut = P._run_g(st, st.g_params, guide, b["crop"], True)
        st = st.replace(g_stats=g_mut)
        return st, jnp.sum(fake)

    measure("G fwd train (stats mutated)", g_fwd_body)

    # --- G fwd + bwd, trivial loss (isolates the G backward)
    def g_fwdbwd_body(st, b):
        guide = make_guide(b, cfg)

        def loss_fn(g_params):
            fake, g_mut = P._run_g(st, g_params, guide, b["crop"], True)
            return jnp.sum(fake), g_mut

        (loss, g_mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.g_params)
        import optax
        updates, g_opt = st.tx_g.update(grads, st.g_opt, st.g_params)
        st = st.replace(g_params=optax.apply_updates(st.g_params, updates),
                        g_opt=g_opt, g_stats=g_mut)
        return st, loss

    measure("G fwd+bwd+adam, loss=sum(fake)", g_fwdbwd_body)

    # --- G fwd + D fwd, no grads (isolates the D forward)
    def gd_fwd_body(st, b):
        guide = make_guide(b, cfg)
        fake, g_mut = P._run_g(st, st.g_params, guide, b["crop"], True)
        pred_fake, pred_real, d_mut = P._run_d(
            st, st.d_params, guide, fake, b["warped"], True
        )
        st = st.replace(g_stats=g_mut, d_stats=d_mut)
        return st, sum(jnp.sum(t[-1]) for t in pred_fake)

    measure("G fwd + D fwd (no grads)", gd_fwd_body)

    # --- full steps
    def g_body(st, b):
        st2, losses, _ = P._generator_step_body(st, b, cfg, None, None)
        return st2, losses["loss_G"]

    def d_body(st, b):
        st2, metrics = P._discriminator_step_body(st, b, cfg)
        return st2, metrics["loss_D"]

    def fused_body(st, b):
        st2, metrics, _ = P._fused_gan_step_body(st, b, cfg, None, None)
        return st2, metrics["loss_G"]

    measure("full generator_step", g_body)
    measure("full discriminator_step", d_body)
    measure("fused G+D step", fused_body)


if __name__ == "__main__":
    main()
