"""GAN slice: generator/discriminator shapes, alternating jitted steps,
mask-weighted losses, spectral-norm state dynamics.

One module-scoped state is shared across tests: every create_state compiles
two model inits, and the SPADE stack is the most compile-heavy graph in the
suite.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emlight_tpu.config import AnchorConfig, ProjectorConfig
from emlight_tpu.train import projector as P
from emlight_tpu.train.data import synthetic_projector_batch

# EXACTLY the config cli tests train with (test_cli.py: ngf/ndf 8, crop 64,
# anchors 96, batch 2): pytest runs one process, so identical static configs
# share every jitted step compile across files — the suite is compile-bound
TINY = dataclasses.replace(
    ProjectorConfig(),
    crop_size=64,  # -> env maps 32x64, latent (1, 2)
    ngf=8,
    ndf=8,
    batch_size=2,
    anchors=AnchorConfig(n_anchors=96, env_h=32, env_w=64),
)


@pytest.fixture(scope="module")
def state0():
    return P.create_state(jax.random.PRNGKey(0), TINY)


def _batch(seed=0):
    b = synthetic_projector_batch(
        TINY.batch_size, n_anchors=96, crop_size=TINY.crop_size // 2,
        env_hw=(32, 64), seed=seed,
    )
    return {k: jnp.asarray(v) for k, v in b.items() if not isinstance(v, list)}


def test_generator_output_shape_and_range(state0):
    out = P.inference(state0, _batch(), TINY)
    assert out.shape == (2, 32, 64, 3)
    o = np.asarray(out)
    assert o.min() >= 0.0 and o.max() <= 50.0  # (tanh+1)*25 range


def test_alternating_gan_steps_update_both_nets(state0):
    batch = _batch(1)
    g0 = jax.tree.map(lambda x: np.asarray(x).copy(), state0.g_params)
    d0 = jax.tree.map(lambda x: np.asarray(x).copy(), state0.d_params)
    u_before = np.asarray(jax.tree.leaves(state0.d_stats["spectral"])[0]).copy()

    state, g_metrics, fake = P.generator_step(state0, batch, TINY)
    state, d_metrics = P.discriminator_step(state, batch, TINY)

    assert fake.shape == (2, 32, 64, 3)
    for v in {**g_metrics, **d_metrics}.values():
        assert np.isfinite(float(v)), (g_metrics, d_metrics)
    changed_g = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(state.g_params))
    )
    changed_d = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(d0), jax.tree.leaves(state.d_params))
    )
    assert changed_g and changed_d
    assert int(state.step) == 1
    # the D forward inside the G step updates D's spectral u (torch hook parity)
    u_after = np.asarray(jax.tree.leaves(state.d_stats["spectral"])[0])
    assert not np.allclose(u_before, u_after)


def test_make_guide_matches_manual_composition():
    batch = _batch(3)
    guide = P.make_guide(batch, TINY)
    assert guide.shape == (2, 32, 64, 3)
    from emlight_tpu.representation import render_anchor_params

    manual = render_anchor_params(
        batch["distribution"], batch["intensity"], batch["rgb_ratio"],
        batch["ambient"], n=96, h=32, w=64,
    ) * batch["alpha"][:, None, None, None]
    np.testing.assert_allclose(np.asarray(guide), np.asarray(manual), rtol=1e-6)


def test_projector_checkpoint_roundtrip(state0, tmp_path):
    from emlight_tpu.train import checkpoint as ckpt

    state, _, _ = P.generator_step(state0, _batch(7), TINY)
    path = ckpt.save_checkpoint(str(tmp_path), state)
    template = P.create_state(jax.random.PRNGKey(9), TINY)
    restored = ckpt.restore_checkpoint(path, template)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(state.g_params), jax.tree.leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.d_opt), jax.tree.leaves(restored.d_opt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_overfit_discriminator_separates(state0):
    # a few D steps on fixed data should reduce D loss (sanity of grads)
    batch = _batch(4)
    s, m0 = P.discriminator_step(state0, batch, TINY)
    m = m0
    for _ in range(5):
        s, m = P.discriminator_step(s, batch, TINY)
    assert float(m["loss_D"]) < float(m0["loss_D"])


def test_fused_step_matches_alternating_grads(state0):
    """fused_gan_step: G update identical to generator_step's; D update
    identical to discriminator_step's at the PRE-update G (Jacobi semantics,
    see the fused_gan_step docstring)."""
    batch = _batch(11)
    sf, mf, fake = P.fused_gan_step(state0, batch, TINY)

    sg, mg, _ = P.generator_step(state0, batch, TINY)
    sd, md = P.discriminator_step(state0, batch, TINY)

    np.testing.assert_allclose(float(mf["loss_G"]), float(mg["loss_G"]), rtol=1e-5)
    np.testing.assert_allclose(float(mf["loss_D"]), float(md["loss_D"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(sf.g_params), jax.tree.leaves(sg.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree.leaves(sf.d_params), jax.tree.leaves(sd.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
    assert int(sf.step) == int(state0.step) + 1
    assert fake.shape == (2, 32, 64, 3)
    # fused training stays finite over a few iterations
    s = sf
    for i in range(3):
        s, m, _ = P.fused_gan_step(s, _batch(12 + i), TINY)
        assert all(np.isfinite(float(v)) for v in m.values())


def test_scanned_fused_steps_match_iterated(state0):
    """--scan_steps math: N fused steps under one lax.scan must reproduce the
    iterated fused_gan_step trajectory.

    Tolerances are in Adam-update units, NOT float epsilons: the scanned and
    standalone step bodies are separate XLA compilations whose reassociated
    float noise flips the SIGN of zero-gradient components, and Adam's step-1
    update is exactly ±lr regardless of gradient magnitude — so each step can
    legitimately move a noise-dominated parameter by 2·lr in opposite
    directions (measured: 1-step maxdiff 2e-4 = 2·lr_G with losses matching
    to 1e-4 relative). Per-step METRIC comparison is the semantic check —
    wrong batch order or broken state threading shifts losses by several
    percent (these batches' losses differ by ~6%), far above the 1% bound."""
    batches = [_batch(s) for s in (10, 11, 12)]
    n = len(batches)

    s_ref = state0
    ref_metrics = []
    for b in batches:
        s_ref, m, fake_ref = P.fused_gan_step(s_ref, b, TINY)
        ref_metrics.append(m)

    stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
    s_scan, m_scan, fake_scan = P.scanned_fused_steps(state0, stacked, TINY)

    lr_g, lr_d = TINY.lr / 2, TINY.lr * 2  # TTUR pair
    for a, b in zip(jax.tree.leaves(s_ref.g_params), jax.tree.leaves(s_scan.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                                   atol=4 * n * lr_g)
    for a, b in zip(jax.tree.leaves(s_ref.d_params), jax.tree.leaves(s_scan.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                                   atol=4 * n * lr_d)
    assert int(s_scan.step) == int(s_ref.step)
    for i, m in enumerate(ref_metrics):
        for k in m:
            np.testing.assert_allclose(
                float(m[k]), float(m_scan[k][i]), rtol=1e-2, atol=1e-3,
                err_msg=f"{k}[{i}]",
            )
    # last fake: generated from params that have accumulated the lr-unit
    # trajectory noise above — bound it in those units too (the generator's
    # output scale is (tanh+1)*25)
    np.testing.assert_allclose(
        np.asarray(fake_scan), np.asarray(fake_ref), rtol=0, atol=0.5
    )


def test_use_vae_surface(state0):
    """Upstream SPADE's --use_vae: VAE encoder heads + KLD in the G loss.

    Dead code in the EMLight fork (its encoder.py comments fc_var out), kept
    for completeness: both alternating steps run, KLD is finite and scales
    with lambda_kld, eval inference is deterministic (z = mu), and the flag
    OFF leaves the parameter tree untouched (checkpoint compatibility).
    """
    vcfg = dataclasses.replace(TINY, use_vae=True)
    vstate = P.create_state(jax.random.PRNGKey(0), vcfg)
    enc = vstate.g_params["netE"]
    assert "fc_mu" in enc and "fc_var" in enc and "fc" not in enc
    # default tree has the deterministic head only
    assert "fc" in state0.g_params["netE"] and "fc_mu" not in state0.g_params["netE"]

    b = _batch()
    st2, gm, _ = P.generator_step(vstate, b, vcfg)
    assert np.isfinite(gm["loss_G"]) and np.isfinite(gm["KLD"])
    st3, dm = P.discriminator_step(st2, b, vcfg)
    assert np.isfinite(dm["loss_D"])
    # fused step carries the KLD too
    _, fm, _ = P.fused_gan_step(vstate, b, vcfg)
    assert np.isfinite(fm["KLD"])

    # lambda scaling is exact
    v2 = dataclasses.replace(vcfg, lambda_kld=0.1)
    _, gm2, _ = P.generator_step(vstate, b, v2)
    np.testing.assert_allclose(gm2["KLD"], 2.0 * gm["KLD"], rtol=1e-5)

    # eval path is deterministic (z = mu, no rng needed)
    out1 = P.inference(vstate, b, vcfg)
    out2 = P.inference(vstate, b, vcfg)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
