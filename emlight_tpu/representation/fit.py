"""Direct spherical-Gaussian fitting to a panorama (RegressionNetwork/
panorama.py capability, TPU-native).

The reference's Panorama module overfits K=3 light directions/sizes/colors +
ambient to a single panorama with Adam + MSE through the splat rasterizer
(panorama.py:67-163,275-432), with tensor-hook gradient probes. Here the
whole optimization is ONE jitted lax.scan of Adam steps on device — no Python
loop, no hooks; per-step grad norms come back as a scanned metrics array.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from .splat import render_sg

__all__ = ["fit_spherical_gaussians"]


def _render_params(params, h, w):
    dirs = params["dirs_raw"]
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    sizes = jnp.exp(params["log_sizes"])
    colors = jax.nn.softplus(params["colors_raw"])
    env = render_sg(dirs[None], sizes[None], colors[None], h=h, w=w)[0]
    return env + jax.nn.softplus(params["ambient_raw"])[None, None, :]


@functools.partial(jax.jit, static_argnames=("n_lights", "steps", "lr"))
def fit_spherical_gaussians(
    pano: jax.Array,
    n_lights: int = 3,
    steps: int = 500,
    lr: float = 1e-2,
    seed: int = 0,
):
    """Fit n_lights spherical Gaussians + ambient to one (H, W, 3) panorama.

    Returns (params, env, metrics): fitted {dirs, sizes, colors, ambient},
    the final rendered env map, and per-step {loss, grad_norm} arrays.
    """
    h, w, _ = pano.shape
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    raw = {
        "dirs_raw": jax.random.normal(k1, (n_lights, 3)),
        "log_sizes": jnp.full((n_lights,), jnp.log(0.05)),
        "colors_raw": jax.random.normal(k2, (n_lights, 3)) * 0.1 + 1.0,
        "ambient_raw": jnp.zeros((3,)),
    }
    tx = optax.adam(lr)
    opt_state = tx.init(raw)

    def loss_fn(p):
        return jnp.mean((_render_params(p, h, w) - pano) ** 2)

    def step(carry, _):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p)
        gnorm = optax.global_norm(grads)
        updates, s = tx.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), {"loss": loss, "grad_norm": gnorm}

    (raw, _), metrics = jax.lax.scan(step, (raw, opt_state), None, length=steps)

    dirs = raw["dirs_raw"] / jnp.linalg.norm(raw["dirs_raw"], axis=-1, keepdims=True)
    fitted = {
        "dirs": dirs,
        "sizes": jnp.exp(raw["log_sizes"]),
        "colors": jax.nn.softplus(raw["colors_raw"]),
        "ambient": jax.nn.softplus(raw["ambient_raw"]),
    }
    return fitted, _render_params(raw, h, w), metrics
