"""Image-grid Sinkhorn OT (the reference's legacy SinkhornDistance,
RegressionNetwork/util.py:311-351): balanced entropic transport between two
images treated as histograms over pixel coordinates, via the classic
matrix-scaling (u/v) iterations on K = exp(-M/reg).

Kept for capability parity (it's an alternative image-space loss); the matrix
scaling loop is a lax.fori_loop and the (P, P) kernel matmuls ride the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["image_sinkhorn"]


@functools.lru_cache(maxsize=None)
def _coord_cost(h: int, w: int) -> np.ndarray:
    ys = np.linspace(0, 1, h)
    xs = np.linspace(0, 1, w)
    Y, X = np.meshgrid(ys, xs, indexing="ij")
    coords = np.stack([Y.reshape(-1), X.reshape(-1)], axis=1)
    sq = (coords**2).sum(1)
    M = sq[:, None] + sq[None, :] - 2 * coords @ coords.T
    return np.maximum(M, 0.0).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("max_iter", "reg"))
def image_sinkhorn(a: jax.Array, b: jax.Array, reg: float = 1.0, max_iter: int = 5):
    """OT cost between (B, C, H, W) image histograms (util.py:329-351 semantics).

    a, b should be positive; the reference does not normalize them and neither
    do we. Returns a (B, C) transport-cost matrix mean-reduced like the
    reference's einsum (one scalar per batch/channel pair, then caller means).
    """
    bsz, c, h, w = a.shape
    dim = h * w
    M = jnp.asarray(_coord_cost(h, w))
    K = jnp.exp(-M / reg)  # (P, P)
    av = a.reshape(bsz, c, dim)
    bv = b.reshape(bsz, c, dim)
    u0 = jnp.full((bsz, c, dim), 1.0 / dim, dtype=a.dtype)
    v0 = jnp.full((bsz, c, dim), 1.0 / dim, dtype=a.dtype)

    def body(_, carry):
        u, _v = carry
        # v_{t+1} = b / (K^T u_t); u_{t+1} = a / (K v_{t+1})  (util.py:344-348,
        # with the reference's Kp = (1/a)*K folded into u = a/(K v))
        v = bv / jnp.einsum("qp,bcq->bcp", K, u)
        u = av / jnp.einsum("pq,bcq->bcp", K, v)
        return u, v

    u, v = jax.lax.fori_loop(0, max_iter, body, (u0, v0))
    # cost_{bc} = sum_pq u_p K_pq v_q M_pq (the reference's final einsum :350)
    return jnp.einsum("bcp,pq,bcq,pq->bc", u, K, v, M)
