"""Sinkhorn divergence: value + gradient parity against a torch oracle that
reproduces the reference's exact autograd structure (stop-grad loop +
differentiable final extrapolation), plus jnp-vs-Pallas-kernel equality
(the batchnorm_reimpl oracle pattern from SURVEY.md §4)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from emlight_tpu.losses.sinkhorn import (
    SamplesLoss,
    anchor_cost_matrix,
    epsilon_schedule,
    sinkhorn_divergence,
)


def torch_oracle(x_np, y_np, M_np, blur=0.025, scaling=0.5, p=2.0, want_grad=False):
    """Fresh torch implementation of the reference loss semantics
    (geomloss/samples_loss.py:74-92, sinkhorn_divergence.py:21-109,
    utils.py:85-99) used as an autograd oracle."""
    x = torch.tensor(x_np, dtype=torch.float32, requires_grad=want_grad)
    y = torch.tensor(y_np, dtype=torch.float32)
    M = torch.tensor(M_np, dtype=torch.float32)
    B, N = x.shape
    w = torch.full((B, N), 1.0 / N)
    wl = w.log()

    def cost(u, v):
        v = v.detach()
        return (0.1 * (u[:, :, None] - v[:, None, :]) ** 2 + M) / 2

    Cxx, Cyy, Cxy, Cyx = cost(x, x), cost(y, y), cost(x, y), cost(y, x)
    with torch.no_grad():
        d = float(torch.max(x.max(), y.max()) - torch.min(x.min(), y.min()))
    eps_s = (
        [d**p]
        + [math.exp(e) for e in np.arange(p * math.log(d), p * math.log(blur), p * math.log(scaling))]
        + [blur**p]
    )

    def smin(eps, C, w_log):
        return -eps * torch.logsumexp(w_log[:, None, :] - C / eps, dim=2)

    with torch.no_grad():
        e0 = eps_s[0]
        ax, by, ay, bx = smin(e0, Cxx, wl), smin(e0, Cyy, wl), smin(e0, Cyx, wl), smin(e0, Cxy, wl)
        for eps in eps_s:
            ax_n = smin(eps, Cxx, wl + ax / eps)
            by_n = smin(eps, Cyy, wl + by / eps)
            ay_n = smin(eps, Cyx, wl + bx / eps)
            bx_n = smin(eps, Cxy, wl + ay / eps)
            ax, by = 0.5 * (ax + ax_n), 0.5 * (by + by_n)
            ay, bx = 0.5 * (ay + ay_n), 0.5 * (bx + bx_n)

    eps = eps_s[-1]
    ax_f = smin(eps, Cxx, (wl + ax / eps).detach())
    by_f = smin(eps, Cyy, (wl + by / eps).detach())
    ay_f = smin(eps, Cyx, (wl + bx / eps).detach())
    bx_f = smin(eps, Cxy, (wl + ay / eps).detach())
    val = (w * (bx_f - ax_f)).sum(1) + (w * (ay_f - by_f)).sum(1)

    grad = None
    if want_grad:
        val.sum().backward()
        grad = x.grad.numpy()
    return val.detach().numpy(), grad, d


def _rand_dists(b, n, seed):
    rng = np.random.default_rng(seed)
    x = rng.random((b, n)).astype(np.float32)
    x /= x.sum(1, keepdims=True)
    y = rng.random((b, n)).astype(np.float32)
    y /= y.sum(1, keepdims=True)
    return x, y


@pytest.mark.parametrize("n", [96, 128])
def test_value_matches_torch_oracle_static_diameter(n):
    x, y = _rand_dists(4, n, 7)
    M = anchor_cost_matrix(n)
    ref, _, d = torch_oracle(x, y, M)
    ours = sinkhorn_divergence(jnp.asarray(x), jnp.asarray(y), diameter=d)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-6)


def test_gradient_matches_torch_oracle():
    n = 96
    x, y = _rand_dists(3, n, 8)
    M = anchor_cost_matrix(n)
    ref_val, ref_grad, d = torch_oracle(x, y, M, want_grad=True)

    def loss(xx):
        return sinkhorn_divergence(xx, jnp.asarray(y), diameter=d).sum()

    ours_grad = jax.grad(loss)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours_grad), ref_grad, rtol=2e-3, atol=1e-6)


def test_dynamic_diameter_close_to_reference_schedule():
    # The clamped fixed-length schedule only appends extra converged
    # iterations at eps=blur^p -> value should be very close to the exact one.
    n = 96
    x, y = _rand_dists(4, n, 9)
    ref, _, d = torch_oracle(x, y, anchor_cost_matrix(n))
    ours = sinkhorn_divergence(jnp.asarray(x), jnp.asarray(y), diameter=None, n_iters=14)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-3, atol=1e-5)


def test_epsilon_schedule_matches_reference_formula():
    p, d, blur, scaling = 2.0, 1.37, 0.025, 0.5
    eps = epsilon_schedule(p, d, blur, scaling)
    assert eps[0] == pytest.approx(d**p)
    assert eps[-1] == pytest.approx(blur**p)
    # interior: geometric descent by scaling^p per step
    ratios = eps[2:-1] / eps[1:-2]
    np.testing.assert_allclose(ratios, scaling**p, rtol=1e-5)


def test_samples_loss_api_and_jit():
    x, y = _rand_dists(4, 96, 10)
    loss = SamplesLoss("sinkhorn", p=2, blur=0.025, batchsize=4, diameter=2.0)
    f = jax.jit(lambda a, b: loss(a, b).sum())
    v1 = f(jnp.asarray(x), jnp.asarray(y))
    assert np.isfinite(float(v1))
    # identical inputs -> (near) zero divergence, different -> positive
    v_same = loss(jnp.asarray(x), jnp.asarray(x))
    assert np.allclose(np.asarray(v_same), 0.0, atol=1e-4)
    assert float(loss(jnp.asarray(x), jnp.asarray(y)).sum()) > float(np.asarray(v_same).sum())


def test_backend_auto_is_jnp_and_pallas_removed():
    # the fused Pallas loop was removed after losing to the XLA lowering at
    # every measured shape; 'auto'/'jnp' are the scanned loop, 'pallas' errors
    x, y = _rand_dists(4, 128, 11)
    kw = dict(p=2, blur=0.025, n_anchors=128, diameter=2.0)
    v_auto = np.asarray(SamplesLoss("sinkhorn", backend="auto", **kw)(
        jnp.asarray(x), jnp.asarray(y)))
    v_jnp = np.asarray(SamplesLoss("sinkhorn", backend="jnp", **kw)(
        jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_array_equal(v_auto, v_jnp)
    import pytest

    with pytest.raises(ValueError, match="pallas"):
        SamplesLoss("sinkhorn", backend="pallas", **kw)


def test_gmlight_geometry_variant():
    x, y = _rand_dists(2, 128, 12)
    depth = np.random.default_rng(0).uniform(0.5, 2.0, 128).astype(np.float32)
    loss = SamplesLoss("sinkhorn", blur=0.025, n_anchors=128, diameter=2.0, geometry=depth)
    v = np.asarray(loss(jnp.asarray(x), jnp.asarray(y)))
    assert v.shape == (2,) and np.all(np.isfinite(v))

    # dynamic (traced) geometry == host-precomputed geometry
    base = SamplesLoss("sinkhorn", blur=0.025, n_anchors=128, diameter=2.0)
    v_dyn = np.asarray(base(jnp.asarray(x), jnp.asarray(y), geometry=jnp.asarray(depth)))
    np.testing.assert_allclose(v_dyn, v, rtol=1e-5, atol=1e-8)

    # per-sample (B, N) depths are accepted
    depths_b = np.stack([depth, depth * 1.5])
    v_b = np.asarray(base(jnp.asarray(x), jnp.asarray(y), geometry=jnp.asarray(depths_b)))
    np.testing.assert_allclose(v_b[0], v[0], rtol=1e-5, atol=1e-8)

    # the traced matrix equals the host-built one, and scales with depth
    from emlight_tpu.losses.sinkhorn import geometric_cost_matrix, geometric_cost_matrix_jnp

    M_host = geometric_cost_matrix(128, depth)
    M_jnp = np.asarray(geometric_cost_matrix_jnp(jnp.asarray(depth)))
    np.testing.assert_allclose(M_jnp, M_host, rtol=1e-4, atol=1e-6)
    M_scaled = np.asarray(geometric_cost_matrix_jnp(jnp.asarray(depth * 1.5)))
    assert np.abs(M_scaled - M_jnp).max() > 0.1
