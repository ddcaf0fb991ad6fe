"""Concat-free eval forward == DenseNet.apply on the same variables."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emlight_tpu.nn.densenet import DenseNet
from emlight_tpu.nn.densenet_fast import buffer_apply, fast_apply


def _setup(dtype, block_config=(4, 4, 4), n_anchors=24, hw=(48, 64), group=4):
    model = DenseNet(
        block_config=block_config, n_anchors=n_anchors, dtype=dtype
    )
    x = jnp.asarray(
        np.random.default_rng(0).random((2, *hw, 3), dtype=np.float32)
    )
    # pure numerics parity — compile at XLA opt level 0 (conftest.jit0):
    # default-pipeline compiles of two full DenseNet graphs per
    # parametrization dominated the suite (132 s for the flagship topology
    # alone on the 1-vCPU VM; opt0 is ~20x faster, same outputs)
    from conftest import jit0

    v = jit0(lambda xx: model.init(jax.random.PRNGKey(0), xx, train=True))(x)
    ref = jit0(lambda vv, xx: model.apply(vv, xx, train=False))(v, x)
    fast = jit0(
        lambda p, s, xx: fast_apply(
            p, s, xx, block_config=block_config, dtype=dtype, group=group
        )
    )(v["params"], v["batch_stats"], x)
    return ref, fast


@pytest.mark.parametrize("group", [1, 3, 4])
def test_fast_apply_matches_f32(group):
    # group 3 leaves a pending (uncompacted) tail at block end; 4 divides
    ref, fast = _setup(jnp.float32, group=group)
    for k in ref:
        np.testing.assert_allclose(fast[k], ref[k], rtol=1e-4, atol=1e-4)


def test_fast_apply_matches_bf16():
    # bf16: same math modulo reassociation + where the affine rounds; heads
    # are f32-cast bf16 features, so agreement is at bf16 resolution relative
    # to each head's scale (near-zero logits carry only absolute error)
    ref, fast = _setup(jnp.bfloat16)
    for k in ref:
        r, f = np.asarray(ref[k]), np.asarray(fast[k])
        err = np.max(np.abs(f - r)) / np.max(np.abs(r))
        assert err < 0.02, (k, err)


def test_buffer_apply_matches_f32():
    from conftest import jit0

    model = DenseNet(block_config=(4, 4, 4), n_anchors=24, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).random((2, 48, 64, 3), dtype=np.float32))
    v = jit0(lambda xx: model.init(jax.random.PRNGKey(0), xx, train=True))(x)
    ref = jit0(lambda vv, xx: model.apply(vv, xx, train=False))(v, x)
    fast = jit0(
        lambda p, s, xx: buffer_apply(
            p, s, xx, block_config=(4, 4, 4), dtype=jnp.float32
        )
    )(v["params"], v["batch_stats"], x)
    for k in ref:
        np.testing.assert_allclose(fast[k], ref[k], rtol=1e-4, atol=1e-4)


def test_fast_apply_flagship_shape():
    # flagship topology at tiny spatial size: exercises all 48 layers' slicing
    ref, fast = _setup(jnp.float32, block_config=(16, 16, 16), hw=(32, 32))
    for k in ref:
        np.testing.assert_allclose(fast[k], ref[k], rtol=3e-4, atol=3e-4)


def test_default_opt_level_canary():
    """One cheap parity case compiled at the DEFAULT XLA pipeline.

    The suite compiles numerics tests at opt level 0 (conftest.jit0) for
    wall-time; this canary keeps one small case on the production pipeline so
    an optimization-dependent numeric divergence cannot escape the suite
    entirely (ADVICE r4).
    """
    model = DenseNet(block_config=(2,), n_anchors=8, num_init_features=8,
                     growth_rate=6, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(5).random((2, 16, 16, 3), dtype=np.float32))
    v = jax.jit(lambda xx: model.init(jax.random.PRNGKey(0), xx, train=True))(x)
    ref = jax.jit(lambda vv, xx: model.apply(vv, xx, train=False))(v, x)  # default opts
    fast = jax.jit(lambda p, s, xx: buffer_apply(
        p, s, xx, block_config=(2,), num_init_features=8, growth_rate=6,
        dtype=jnp.float32))(v["params"], v["batch_stats"], x)
    for k in ref:
        np.testing.assert_allclose(fast[k], ref[k], rtol=2e-4, atol=2e-4)


def _x64():
    from jax._src.config import enable_x64  # no public context manager yet

    return enable_x64(True)


def test_train_apply_matches_f64():
    """Heads, new batch stats, and grads == flax apply in f64.

    f32 comparisons are meaningless here: a random-init DenseNet's BN rsqrt
    chains amplify f32 reassociation noise to ~3e-3 in the heads (flax-f32
    itself sits 3-5e-3 from an f64 gold run); in f64 the two graphs agree to
    ~1e-13, proving the math identical.
    """
    from emlight_tpu.nn.densenet_fast import train_apply

    with _x64():
        model = DenseNet(n_anchors=16, block_config=(3, 2),
                         num_init_features=8, growth_rate=6, dtype=jnp.float64)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((3, 32, 48, 3)), dtype=jnp.float64)
        v = jax.jit(lambda xx: model.init(jax.random.PRNGKey(0), xx, train=True))(x)
        p = jax.tree.map(lambda t: t.astype(jnp.float64), v["params"])
        s = jax.tree.map(lambda t: (t + 0.13).astype(jnp.float64), v["batch_stats"])

        ref, mut = jax.jit(lambda pp: model.apply(
            {"params": pp, "batch_stats": s}, x, train=True,
            mutable=["batch_stats"]))(p)
        got, ns = jax.jit(lambda pp: train_apply(
            p, s, x, block_config=(3, 2), num_init_features=8,
            growth_rate=6, dtype=jnp.float64))(p)
        for k in ref:
            np.testing.assert_allclose(got[k], ref[k], rtol=1e-10, atol=1e-10)
        for a, b in zip(jax.tree.leaves(ns), jax.tree.leaves(mut["batch_stats"])):
            np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12)

        def loss_ref(pp):
            out, m = model.apply({"params": pp, "batch_stats": s}, x,
                                 train=True, mutable=["batch_stats"])
            return sum(jnp.sum(o ** 2) for o in out.values()) + sum(
                jnp.sum(q ** 2) for q in jax.tree.leaves(m["batch_stats"]))

        def loss_fast(pp):
            out, nss = train_apply(pp, s, x, block_config=(3, 2),
                                   num_init_features=8, growth_rate=6,
                                   dtype=jnp.float64)
            return sum(jnp.sum(o ** 2) for o in out.values()) + sum(
                jnp.sum(q ** 2) for q in jax.tree.leaves(nss))

        g1 = jax.jit(jax.grad(loss_ref))(p)
        g2 = jax.jit(jax.grad(loss_fast))(p)
        gmax = max(float(jnp.abs(t).max()) for t in jax.tree.leaves(g1))
        for a, b in zip(jax.tree.leaves(g2), jax.tree.leaves(g1)):
            assert float(jnp.abs(a - b).max()) < 1e-9 * max(gmax, 1.0)


def test_train_apply_block_vjp_fallback():
    """block_vjp=False (plain autodiff through the buffer loop) == flax."""
    from emlight_tpu.nn.densenet_fast import train_apply

    with _x64():
        model = DenseNet(n_anchors=8, block_config=(2, 2),
                         num_init_features=8, growth_rate=6, dtype=jnp.float64)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), dtype=jnp.float64)
        v = jax.jit(lambda xx: model.init(jax.random.PRNGKey(0), xx, train=True))(x)
        p = jax.tree.map(lambda t: t.astype(jnp.float64), v["params"])
        s = jax.tree.map(lambda t: t.astype(jnp.float64), v["batch_stats"])
        ref, _ = jax.jit(lambda pp: model.apply(
            {"params": pp, "batch_stats": s}, x, train=True,
            mutable=["batch_stats"]))(p)
        got, _ = jax.jit(lambda pp: train_apply(
            pp, s, x, block_config=(2, 2), num_init_features=8, growth_rate=6,
            dtype=jnp.float64, block_vjp=False))(p)
        for k in ref:
            np.testing.assert_allclose(got[k], ref[k], rtol=1e-10, atol=1e-10)


def test_train_apply_sync_stats_pmean():
    """axis_name batch moments == flax BatchNorm(axis_name=...) under vmap."""
    from emlight_tpu.nn.densenet_fast import train_apply

    model = DenseNet(n_anchors=8, block_config=(2,), num_init_features=8,
                     growth_rate=6, dtype=jnp.float32, axis_name="dp")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((2, 2, 16, 16, 3), dtype=np.float32))
    v = jax.jit(lambda xx: DenseNet(
        n_anchors=8, block_config=(2,), num_init_features=8, growth_rate=6,
    ).init(jax.random.PRNGKey(0), xx, train=True))(x[0])

    def ref_fn(xx):
        out, m = model.apply(v, xx, train=True, mutable=["batch_stats"])
        return out["distribution"], m["batch_stats"]

    def fast_fn(xx):
        heads, ns = train_apply(
            v["params"], v["batch_stats"], xx, block_config=(2,),
            num_init_features=8, growth_rate=6, dtype=jnp.float32,
            axis_name="dp")
        return heads["distribution"], ns

    ref = jax.vmap(ref_fn, axis_name="dp")(x)
    got = jax.vmap(fast_fn, axis_name="dp")(x)
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree.leaves(got[1]), jax.tree.leaves(ref[1])):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_fused_conv3x3_pallas_interpret():
    """dense_conv_pallas kernels (interpret): fwd + all four grads exact.

    Carried as an experiment (not wired into the train path): on a v5e the
    thin-channel conv2's MXU floor analysis puts any kernel within ~2x of
    XLA's NHWC lowering, and this kernel measured 4.4 ms vs XLA's 2.1 at the
    flagship shape (BASELINE.md round-5 ledger). The numerics machinery is
    exact and stays tested.
    """
    from emlight_tpu.nn.dense_conv_pallas import (
        conv3x3_nhwc_reference, fused_affine_conv3x3)

    with _x64():
        rng = np.random.default_rng(3)
        B, H, W, C, O = 2, 16, 24, 5, 3
        x = jnp.asarray(rng.standard_normal((B, H, W, C)))
        a = jnp.asarray(rng.standard_normal((C,)) * 0.5 + 1.0)
        b = jnp.asarray(rng.standard_normal((C,)) * 0.1)
        k = jnp.asarray(rng.standard_normal((3, 3, C, O)))
        ct = jnp.asarray(rng.standard_normal((B, H, W, O)))
        ref = conv3x3_nhwc_reference(x, a, b, k)
        got = jax.jit(lambda *A: fused_affine_conv3x3(*A, True))(x, a, b, k)
        np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-10)
        gr = jax.jit(jax.grad(
            lambda *A: jnp.sum(conv3x3_nhwc_reference(*A) * ct),
            argnums=(0, 1, 2, 3)))(x, a, b, k)
        gg = jax.jit(jax.grad(
            lambda *A: jnp.sum(fused_affine_conv3x3(*A, True) * ct),
            argnums=(0, 1, 2, 3)))(x, a, b, k)
        for p, q in zip(gg, gr):
            np.testing.assert_allclose(p, q, rtol=1e-9, atol=1e-10)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
