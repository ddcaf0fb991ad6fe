"""Gaussian fitter convergence + legacy image-grid OT sanity."""

import numpy as np
import jax.numpy as jnp

from emlight_tpu.losses.image_ot import image_sinkhorn
from emlight_tpu.representation import render_sg
from emlight_tpu.representation.fit import fit_spherical_gaussians
from emlight_tpu.core.geometry import sphere_points


def test_fit_recovers_single_light():
    # ground truth: one bright Gaussian + ambient on a small panorama
    h, w = 32, 64
    true_dir = sphere_points(16)[4][None, None]  # (1, 1, 3)
    env = render_sg(
        jnp.asarray(true_dir), jnp.asarray([[0.05]]), jnp.asarray([[[5.0, 4.0, 3.0]]]),
        h=h, w=w,
    )[0] + 0.1

    fitted, rec, metrics = fit_spherical_gaussians(env, n_lights=2, steps=400, lr=3e-2)
    losses = np.asarray(metrics["loss"])
    assert losses[-1] < losses[0] * 0.05, (losses[0], losses[-1])
    # one of the fitted lights points at the true direction
    cos = np.asarray(fitted["dirs"]) @ np.asarray(true_dir)[0, 0]
    assert cos.max() > 0.95, cos
    assert np.all(np.isfinite(np.asarray(metrics["grad_norm"])))


def test_image_sinkhorn_orders_costs():
    # identical histograms cost less than displaced ones
    h, w = 8, 8
    a = np.zeros((1, 1, h, w), np.float32)
    a[0, 0, 2, 2] = 1.0
    b_same = a.copy()
    b_near = np.zeros_like(a)
    b_near[0, 0, 3, 2] = 1.0
    b_far = np.zeros_like(a)
    b_far[0, 0, 7, 7] = 1.0
    # small uniform floor keeps the scaling iterations finite
    floor = 1e-3
    cost = lambda x, y: float(
        image_sinkhorn(jnp.asarray(x + floor), jnp.asarray(y + floor), reg=0.05, max_iter=20)[0, 0]
    )
    c0, c1, c2 = cost(a, b_same), cost(a, b_near), cost(a, b_far)
    assert c0 < c1 < c2, (c0, c1, c2)
