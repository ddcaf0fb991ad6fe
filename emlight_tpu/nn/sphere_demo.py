"""Planar-image -> sphere projection (the vendored OmniMNIST demo capability).

The reference vendors an OmniMNIST dataset (GenProjector/models/networks/
spherenet/dataset.py:73-155) that gnomonically projects MNIST digits onto an
equirectangular sphere to exercise the distortion-aware convolutions. This
module provides the same capability framework-natively: project any planar
image onto the sphere at a given rotation/FOV, batched and jittable — useful
for SphereConv demos and distortion-robustness tests without torchvision.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry import equirect_xyz_splat

__all__ = ["project_to_sphere"]


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "fov_deg"))
def project_to_sphere(
    img: jax.Array,
    v_rot: jax.Array,
    h_rot: jax.Array,
    out_h: int = 60,
    out_w: int = 60,
    fov_deg: float = 120.0,
):
    """Project (B, H, W, C) planar images onto (B, out_h, out_w, C) equirect maps.

    The image is placed on the tangent plane at the (v_rot, h_rot)-rotated
    +z pole and sampled gnomonically: equirect pixels whose rays hit the
    tangent-plane square within the FOV read the image bilinearly; the rest
    are zero (the OmniMNIST construction).

    v_rot/h_rot: (B,) rotation angles in radians.
    """
    b, h, w, c = img.shape
    grid = jnp.asarray(equirect_xyz_splat(out_h, out_w), jnp.float32)  # (oh, ow, 3)

    def one(im, vr, hr):
        # tangent plane at the equator point (1, 0, 0), rotated by v_rot
        # (about y: vertical) then h_rot (about z: horizontal) — both
        # rotations move the projected image, like the OmniMNIST dataset
        cv, sv = jnp.cos(vr), jnp.sin(vr)
        ch, sh = jnp.cos(hr), jnp.sin(hr)
        rot_v = jnp.array([[cv, 0, sv], [0, 1, 0], [-sv, 0, cv]])
        rot_h = jnp.array([[ch, -sh, 0], [sh, ch, 0], [0, 0, 1]])
        rays = grid.reshape(-1, 3) @ (rot_h @ rot_v)  # inverse-rotate rays
        z = rays[:, 0]  # component toward the tangent point
        valid = z > 1e-6
        scale = jnp.tan(jnp.deg2rad(fov_deg / 2.0))
        u = jnp.where(valid, rays[:, 1] / jnp.maximum(z, 1e-6), 2.0) / scale
        v = jnp.where(valid, rays[:, 2] / jnp.maximum(z, 1e-6), 2.0) / scale
        inside = valid & (jnp.abs(u) <= 1) & (jnp.abs(v) <= 1)
        px = (u + 1) / 2 * (w - 1)
        py = (v + 1) / 2 * (h - 1)
        x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, w - 1)
        y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        y1 = jnp.minimum(y0 + 1, h - 1)
        fx = (px - x0)[:, None]
        fy = (py - y0)[:, None]
        flat = im.reshape(-1, c)
        sample = (
            flat[y0 * w + x0] * (1 - fy) * (1 - fx)
            + flat[y0 * w + x1] * (1 - fy) * fx
            + flat[y1 * w + x0] * fy * (1 - fx)
            + flat[y1 * w + x1] * fy * fx
        )
        return jnp.where(inside[:, None], sample, 0.0).reshape(out_h, out_w, c)

    return jax.vmap(one)(img, v_rot, h_rot)
