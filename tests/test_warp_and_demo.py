"""Panorama re-warp (resize_exr capability) and sphere-projection demo."""

import numpy as np
import jax.numpy as jnp

from emlight_tpu.core.hdr import warp_panorama
from emlight_tpu.nn.sphere_demo import project_to_sphere


def test_warp_identity_is_resample():
    rng = np.random.default_rng(0)
    img = rng.random((64, 128, 3)).astype(np.float32)
    out = warp_panorama(img, 64, 128)  # theta=phi=move=0
    # identity viewpoint: resampling the same grid reproduces the panorama
    # up to bilinear interpolation at the half-pixel offsets of the ray grid
    assert out.shape == (64, 128, 3)
    corr = np.corrcoef(out.reshape(-1), img.reshape(-1))[0, 1]
    assert corr > 0.98, corr


def test_warp_rotation_rolls_azimuth():
    rng = np.random.default_rng(1)
    img = rng.random((32, 64, 3)).astype(np.float32)
    base = warp_panorama(img, 32, 64)
    # the reference's theta rotates about the x-axis, which rolls the
    # azimuthal coordinate of its (lat, lon) convention by the same angle
    rot = warp_panorama(img, 32, 64, theta_deg=90.0)
    rolled = np.roll(base, shift=-16, axis=1)
    corr = np.corrcoef(rot.reshape(-1), rolled.reshape(-1))[0, 1]
    assert corr > 0.9, corr


def test_warp_translation_changes_view():
    img = np.random.default_rng(2).random((32, 64, 3)).astype(np.float32)
    moved = warp_panorama(img, 32, 64, move=0.4)
    base = warp_panorama(img, 32, 64)
    assert not np.allclose(moved, base)
    assert np.isfinite(moved).all()


def test_project_to_sphere_places_image():
    # a bright square projected at the equator shows up, rest is zero
    img = jnp.ones((2, 8, 8, 1))
    out = np.asarray(
        project_to_sphere(img, jnp.zeros(2), jnp.zeros(2), out_h=32, out_w=64, fov_deg=90)
    )
    assert out.shape == (2, 32, 64, 1)
    assert out.max() > 0.9
    # the projection covers the FOV, not the whole sphere
    cover = (out[0, ..., 0] > 0).mean()
    assert 0.02 < cover < 0.5, cover
    # rotating moves the projection
    out2 = np.asarray(
        project_to_sphere(img, jnp.zeros(2), jnp.full(2, np.pi), out_h=32, out_w=64, fov_deg=90)
    )
    assert not np.allclose(out2, out)
