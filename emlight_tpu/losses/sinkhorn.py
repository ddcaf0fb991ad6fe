"""Sinkhorn spherical-transport divergence (EMLight's anchor EMD loss).

Reimplements the reference's tensorized unbiased Sinkhorn divergence
(RegressionNetwork/geomloss/: samples_loss.py:12-92,
sinkhorn_divergence.py:21-109, utils.py:64-99) and the GMLight geometric
variant (gmloss/) with JAX-native semantics:

- The ε-scaling "coordinate ascent" loop runs WITHOUT gradients (the reference
  wraps it in set_grad_enabled(False), sinkhorn_divergence.py:74-99); here the
  loop runs under lax.stop_gradient inside a lax.scan.
- Gradients flow only through a final extrapolation step whose dual inputs are
  detached (sinkhorn_divergence.py:101-107) — reproduced with stop_gradient
  placement, no custom_vjp needed.
- The ε schedule is data-dependent in the reference (diameter from the batch,
  sinkhorn_divergence.py:9-36). Under jit the schedule LENGTH must be static:
  pass a static `diameter` for the exact reference schedule, or leave it None
  to compute the diameter on-device with a fixed-length blur-clamped schedule
  (extra tail iterations run at ε=blur^p, i.e. strictly more converged).

A fused Pallas TPU kernel for the no-grad loop was built, oracle-tested, and
benchmarked in rounds 1-2 — and then deleted: inside a jitted step XLA's
native lowering of the scanned softmin loop beats it at every relevant shape
(v5e, value+grad: 305 vs 826 us at bs16/n96, 469 vs 1718 us at bs128; value
only: 299 vs 343 us). The one-kernel-per-loss-call framing only pays in a
dispatch-bound regime that jitted training never enters. `loop_fn` remains
the seam where an alternative loop implementation can hook in.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry import geometric_points, sphere_points

__all__ = [
    "anchor_cost_matrix",
    "epsilon_schedule",
    "sinkhorn_divergence",
    "SamplesLoss",
]

_LOG_WEIGHT_FLOOR = -100000.0  # log_weights clamp (sinkhorn_divergence.py:47-50)


@functools.lru_cache(maxsize=None)
def _anchor_cost_matrix_cached(n: int) -> np.ndarray:
    a = sphere_points(n)
    d = np.linalg.norm(a[:, None, :] - a[None, :, :], axis=-1)
    return d.astype(np.float32)


def anchor_cost_matrix(n: int = 96) -> np.ndarray:
    """Pairwise anchor-to-anchor euclidean distances (geomloss/utils.py:64-81)."""
    return _anchor_cost_matrix_cached(int(n))


def geometric_cost_matrix(n: int, anchor_depth) -> np.ndarray:
    """GMLight per-sample variant: anchors at predicted depths (gmloss/utils.py:76-93)."""
    a = geometric_points(n, anchor_depth)
    return np.linalg.norm(a[:, None, :] - a[None, :, :], axis=-1).astype(np.float32)


def geometric_cost_matrix_jnp(anchor_depth: jax.Array) -> jax.Array:
    """In-graph GMLight cost matrix from traced per-anchor depths.

    anchor_depth: (N,) or (B, N) -> (N, N) or (B, N, N). The reference rebuilds
    its matrix per batch on the host (gmloss/samples_loss.py:69-72); here it
    stays on device so depths can come straight from the data pipeline or a
    depth head. Geometry matches geometric_points (gmloss/utils.py:63-73):
    x/y scaled by depth, z on the unit golden-spiral profile.
    """
    n = anchor_depth.shape[-1]
    golden_angle = np.pi * (3.0 - np.sqrt(5.0))
    theta = jnp.asarray(golden_angle * np.arange(n), dtype=anchor_depth.dtype)
    z = jnp.asarray(np.linspace(1 - 1.0 / n, 1.0 / n - 1, n), dtype=anchor_depth.dtype)
    pts = jnp.stack(
        [anchor_depth * jnp.cos(theta), anchor_depth * jnp.sin(theta),
         jnp.broadcast_to(z, anchor_depth.shape)],
        axis=-1,
    )  # (..., N, 3)
    diff = pts[..., :, None, :] - pts[..., None, :, :]
    return jnp.sqrt(jnp.maximum((diff * diff).sum(-1), 0.0))


def log_weights(alpha: jax.Array) -> jax.Array:
    return jnp.where(alpha > 0, jnp.log(jnp.where(alpha > 0, alpha, 1.0)), _LOG_WEIGHT_FLOOR)


def softmin(eps, C, wlog):
    """-ε·logsumexp(wlog - C/ε) over the last axis (samples_loss.py:74-77).

    C: (..., N, M), wlog: (..., M) -> (..., N).
    """
    return -eps * jax.nn.logsumexp(wlog[..., None, :] - C / eps, axis=-1)


def epsilon_schedule(p: float, diameter: float, blur: float, scaling: float) -> np.ndarray:
    """Exact reference schedule (sinkhorn_divergence.py:21-25), host-side."""
    eps_s = (
        [diameter**p]
        + [
            math.exp(e)
            for e in np.arange(p * math.log(diameter), p * math.log(blur), p * math.log(scaling))
        ]
        + [blur**p]
    )
    return np.asarray(eps_s, dtype=np.float32)


def _clamped_schedule(diameter, p, blur, scaling, n_iters):
    """Traced-diameter schedule with static length n_iters (see module docstring)."""
    i = jnp.arange(n_iters - 2, dtype=jnp.float32)
    mid = jnp.maximum(diameter * scaling**i, blur) ** p
    return jnp.concatenate([jnp.asarray([diameter**p]), mid, jnp.asarray([blur**p])])


def _sinkhorn_loop(alpha_log, beta_log, C_xx, C_yy, C_xy, C_yx, eps_s):
    """No-grad ε-scaling loop + differentiable final extrapolation.

    Port of sinkhorn_loop (sinkhorn_divergence.py:72-109), balanced case
    (reach=None -> λ=1). Returns (a_x, b_y, a_y, b_x).
    """
    sg = jax.lax.stop_gradient
    sCxx, sCyy, sCxy, sCyx = sg(C_xx), sg(C_yy), sg(C_xy), sg(C_yx)
    s_alog, s_blog = sg(alpha_log), sg(beta_log)

    eps0 = eps_s[0]
    a_x = softmin(eps0, sCxx, s_alog)
    b_y = softmin(eps0, sCyy, s_blog)
    a_y = softmin(eps0, sCyx, s_alog)
    b_x = softmin(eps0, sCxy, s_blog)

    def body(carry, eps):
        a_x, b_y, a_y, b_x = carry
        at_x = softmin(eps, sCxx, s_alog + a_x / eps)
        bt_y = softmin(eps, sCyy, s_blog + b_y / eps)
        at_y = softmin(eps, sCyx, s_alog + b_x / eps)
        bt_x = softmin(eps, sCxy, s_blog + a_y / eps)
        return (
            0.5 * (a_x + at_x),
            0.5 * (b_y + bt_y),
            0.5 * (a_y + at_y),
            0.5 * (b_x + bt_x),
        ), None

    (a_x, b_y, a_y, b_x), _ = jax.lax.scan(body, (a_x, b_y, a_y, b_x), eps_s)

    # Last extrapolation, to get the correct gradients (sinkhorn_divergence.py:101-107):
    # duals detached, cost matrices and ε differentiable.
    eps = eps_s[-1]
    a_x_f = softmin(eps, C_xx, sg(alpha_log + a_x / eps))
    b_y_f = softmin(eps, C_yy, sg(beta_log + b_y / eps))
    a_y_f = softmin(eps, C_yx, sg(alpha_log + b_x / eps))
    b_x_f = softmin(eps, C_xy, sg(beta_log + a_y / eps))
    return a_x_f, b_y_f, a_y_f, b_x_f


@functools.partial(jax.custom_jvp, nondiff_argnums=(1, 2))
def _global_extremum(x, axis_name, is_min):
    return jax.lax.pmin(x, axis_name) if is_min else jax.lax.pmax(x, axis_name)


@_global_extremum.defjvp
def _global_extremum_jvp(axis_name, is_min, primals, tangents):
    # pmin/pmax have no JVP rule in jax; the ε-schedule diameter is
    # stop-gradient in the reference anyway (computed under no_grad), so a
    # zero tangent is the faithful rule.
    (x,) = primals
    out = _global_extremum(x, axis_name, is_min)
    return out, jnp.zeros_like(out)


def _scal(alpha, f):
    return (alpha.reshape(alpha.shape[0], -1) * f.reshape(f.shape[0], -1)).sum(axis=1)


def sinkhorn_divergence(
    x: jax.Array,
    y: jax.Array,
    *,
    cost_matrix: jax.Array | None = None,
    alpha: jax.Array | None = None,
    beta: jax.Array | None = None,
    p: float = 2.0,
    blur: float = 0.025,
    scaling: float = 0.5,
    diameter: float | None = None,
    n_iters: int = 12,
    value_weight: float = 0.1,
    loop_fn=None,
    axis_name: str | None = None,
):
    """Unbiased Sinkhorn divergence S_ε(α, β) between anchored histograms.

    Mirrors SamplesLoss.sinkhorn_tensorized (samples_loss.py:79-92) with the
    spherical anchor cost: C(x_i, y_j) = (value_weight·(x_i-y_j)² + M_ij) / 2,
    where M is the fixed anchor-distance matrix and the second argument of each
    pairwise cost is detached (utils.py:85-99).

    Args:
      x, y: (B, N[, 1]) predicted / target distribution values.
      cost_matrix: (N, N) anchor distances; default anchor_cost_matrix(N).
      alpha, beta: (B, N) weights; default uniform (samples_loss.py:63-72).
      diameter: static float -> exact reference ε schedule; None -> on-device
        diameter with fixed n_iters clamped schedule.
      loop_fn: override for the no-grad loop (the Pallas backend hooks in here).

    Returns (B,) divergences.
    """
    sg = jax.lax.stop_gradient
    b = x.shape[0]
    x = x.reshape(b, -1)
    y = y.reshape(b, -1)
    n, m = x.shape[1], y.shape[1]
    if cost_matrix is None:
        if n != m:
            raise ValueError("x and y must share the anchor set")
        cost_matrix = jnp.asarray(anchor_cost_matrix(n))
    if alpha is None:
        alpha = jnp.full((b, n), 1.0 / n, dtype=x.dtype)
    if beta is None:
        beta = jnp.full((b, m), 1.0 / m, dtype=y.dtype)

    def cost(u, v, Muv):
        # ((u_i - v_j)^2 * w + M_ij) / 2 with v detached (utils.py:85-99 + /2
        # from samples_loss.py:82)
        v = sg(v)
        sq = (u[..., :, None] - v[..., None, :]) ** 2
        return (sq * value_weight + Muv) * 0.5

    C_xx = cost(x, x, cost_matrix)
    C_yy = cost(y, y, cost_matrix)
    C_xy = cost(x, y, cost_matrix)
    C_yx = cost(y, x, cost_matrix)

    if diameter is None:
        # max_diameter over the flattened batch (sinkhorn_divergence.py:9-18);
        # under a data mesh the reference semantics are "over the GLOBAL
        # batch", so reduce across the data axis when one is bound
        mins = jnp.minimum(x.min(), y.min())
        maxs = jnp.maximum(x.max(), y.max())
        if axis_name is not None:
            mins = _global_extremum(mins, axis_name, True)
            maxs = _global_extremum(maxs, axis_name, False)
        d = sg(jnp.abs(maxs - mins)) + 1e-8
        eps_s = _clamped_schedule(d, p, blur, scaling, n_iters)
    else:
        eps_s = jnp.asarray(epsilon_schedule(p, float(diameter), blur, scaling))

    loop = loop_fn if loop_fn is not None else _sinkhorn_loop
    a_x, b_y, a_y, b_x = loop(log_weights(alpha), log_weights(beta), C_xx, C_yy, C_xy, C_yx, eps_s)

    # sinkhorn_cost, balanced (sinkhorn_divergence.py:65-69)
    return _scal(alpha, b_x - a_x) + _scal(beta, a_y - b_y)


class SamplesLoss:
    """Drop-in mirror of the reference's geomloss.SamplesLoss API.

    loss = SamplesLoss("sinkhorn", p=2, blur=.025, batchsize=16)
    values = loss(dist_pred, dist_gt)   # (B,) like the reference

    n_anchors picks the anchor cost matrix (96 for EMLight's regression loss,
    geomloss/utils.py:66; 128 for GMLight, gmloss/utils.py:70).
    """

    def __init__(
        self,
        loss: str = "sinkhorn",
        p: float = 2.0,
        blur: float = 0.05,
        reach=None,
        diameter: float | None = None,
        scaling: float = 0.5,
        batchsize: int | None = None,
        n_anchors: int = 96,
        n_iters: int = 12,
        backend: str = "auto",
        geometry=None,
        axis_name: str | None = None,
    ):
        if loss != "sinkhorn":
            raise NotImplementedError("only the sinkhorn branch exists in the reference")
        if reach is not None:
            raise NotImplementedError("reference always runs balanced OT (reach=None)")
        self.p, self.blur, self.scaling = p, blur, scaling
        self.diameter = diameter
        self.n_iters = n_iters
        self.axis_name = axis_name
        if geometry is not None:
            # GMLight: anchors pushed to per-sample geometric depth
            self.M = jnp.asarray(geometric_cost_matrix(n_anchors, geometry))
        else:
            self.M = jnp.asarray(anchor_cost_matrix(n_anchors))
        if backend in ("auto", "jnp"):
            # XLA's native lowering of the scanned softmin loop is the fastest
            # implementation measured on TPU at every relevant shape (see
            # module docstring); a fused Pallas loop was tried and removed
            self._loop_fn = None
        else:
            raise ValueError(
                f"unknown backend {backend!r} (the 'pallas' loop was removed: "
                "measured slower than the XLA lowering at all shapes)"
            )

    def __call__(self, x, y, geometry=None):
        """geometry: optional traced (N,) or (B, N) anchor depths -> GMLight
        dynamic cost matrix (gmloss/samples_loss.py:34-46 forward signature)."""
        M = geometric_cost_matrix_jnp(jnp.asarray(geometry)) if geometry is not None else self.M
        return sinkhorn_divergence(
            x,
            y,
            cost_matrix=M,
            p=self.p,
            blur=self.blur,
            scaling=self.scaling,
            diameter=self.diameter,
            n_iters=self.n_iters,
            loop_fn=self._loop_fn,
            axis_name=self.axis_name,
        )
