"""Fused Pallas TPU kernel for the Sinkhorn ε-scaling loop.

The no-grad loop is K iterations x 4 softmins over (N, M) cost matrices
(N = 96/128 anchors). Dispatched as individual XLA ops this ping-pongs
HBM<->VMEM every softmin; the fused kernel keeps all four cost matrices and
the dual vectors resident in VMEM for the whole loop (~0.5 MB per sample at
N=128), one grid step per batch element.

Gradient semantics are preserved by construction: the kernel computes only the
stop-gradient part (the reference runs it under set_grad_enabled(False),
geomloss/sinkhorn_divergence.py:74-99); the differentiable final extrapolation
stays in plain JAX (see losses/sinkhorn.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_sinkhorn_loop"]


def _softmin_block(eps, C, wlog):
    """-ε·logsumexp(wlog[None, :] - C/ε, axis=1) for a single (N, M) block."""
    z = wlog[None, :] - C / eps
    m = jnp.max(z, axis=1, keepdims=True)
    lse = m[:, 0] + jnp.log(jnp.sum(jnp.exp(z - m), axis=1))
    return -eps * lse


def _kernel(eps_ref, alog_ref, blog_ref, cxx_ref, cyy_ref, cxy_ref, cyx_ref,
            ax_ref, by_ref, ay_ref, bx_ref):
    alog = alog_ref[0, 0, :]
    blog = blog_ref[0, 0, :]
    cxx = cxx_ref[0]
    cyy = cyy_ref[0]
    cxy = cxy_ref[0]
    cyx = cyx_ref[0]
    k_total = eps_ref.shape[0]

    eps0 = eps_ref[0]
    a_x = _softmin_block(eps0, cxx, alog)
    b_y = _softmin_block(eps0, cyy, blog)
    a_y = _softmin_block(eps0, cyx, alog)
    b_x = _softmin_block(eps0, cxy, blog)

    def body(k, carry):
        a_x, b_y, a_y, b_x = carry
        eps = eps_ref[k]
        at_x = _softmin_block(eps, cxx, alog + a_x / eps)
        bt_y = _softmin_block(eps, cyy, blog + b_y / eps)
        at_y = _softmin_block(eps, cyx, alog + b_x / eps)
        bt_x = _softmin_block(eps, cxy, blog + a_y / eps)
        return (
            0.5 * (a_x + at_x),
            0.5 * (b_y + bt_y),
            0.5 * (a_y + at_y),
            0.5 * (b_x + bt_x),
        )

    a_x, b_y, a_y, b_x = jax.lax.fori_loop(0, k_total, body, (a_x, b_y, a_y, b_x))
    ax_ref[0, 0, :] = a_x
    by_ref[0, 0, :] = b_y
    ay_ref[0, 0, :] = a_y
    bx_ref[0, 0, :] = b_x


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run_loop_kernel(alog, blog, cxx, cyy, cxy, cyx, eps_s, interpret=False):
    b, n = alog.shape
    m = blog.shape[1]
    # Vectors carry a singleton sublane dim so every block's trailing two dims
    # equal the array's (the Mosaic blocking requirement for small shapes).
    vec = lambda d: pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((1, r, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # eps schedule, shared
            vec(n), vec(m), mat(n, n), mat(m, m), mat(n, m), mat(m, n),
        ],
        out_specs=(vec(n), vec(m), vec(m), vec(n)),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        ),
        interpret=interpret,
    )(eps_s, alog[:, None, :], blog[:, None, :], cxx, cyy, cxy, cyx)
    return tuple(o[:, 0, :] for o in out)


def pallas_sinkhorn_loop(alpha_log, beta_log, C_xx, C_yy, C_xy, C_yx, eps_s):
    """Drop-in replacement for losses.sinkhorn._sinkhorn_loop.

    Runs the ε-scaling loop in one fused TPU kernel (interpreter on CPU), then
    performs the reference's differentiable final extrapolation in plain JAX.
    """
    from .sinkhorn import softmin  # shared definition, avoids divergence

    sg = jax.lax.stop_gradient
    interpret = jax.default_backend() != "tpu"
    f32 = lambda t: sg(t).astype(jnp.float32)
    a_x, b_y, a_y, b_x = _run_loop_kernel(
        f32(alpha_log), f32(beta_log), f32(C_xx), f32(C_yy), f32(C_xy), f32(C_yx),
        f32(eps_s), interpret=interpret,
    )

    eps = eps_s[-1]
    a_x_f = softmin(eps, C_xx, sg(alpha_log + a_x / eps))
    b_y_f = softmin(eps, C_yy, sg(beta_log + b_y / eps))
    a_y_f = softmin(eps, C_yx, sg(alpha_log + b_x / eps))
    b_x_f = softmin(eps, C_xy, sg(beta_log + a_y / eps))
    return a_x_f, b_y_f, a_y_f, b_x_f
