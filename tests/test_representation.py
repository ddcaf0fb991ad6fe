"""Splat rasterizer + anchor extraction: parity with reference math and roundtrips."""

import jax.numpy as jnp
import numpy as np
import pytest

from emlight_tpu.core import geometry as G
from emlight_tpu.representation import (
    AnchorExtractor,
    extract_anchors,
    extract_anchors_batch,
    render_anchor_params,
    render_sg,
)


def reference_convert_to_panorama(dirs, sizes, colors, h=128, w=256):
    """NumPy port of RegressionNetwork/util.py:222-245 (the per-light loop)."""
    lat = (np.arange(h) + 0.5) * (np.pi / h)
    lon = (np.arange(w) + 0.5) * (np.pi / (h if w == 2 * h else w / 2))
    glat, glon = np.meshgrid(lat, lon, indexing="ij")
    x = np.sin(glat) * np.cos(glon)
    y = np.sin(glat) * np.sin(glon)
    z = np.cos(glat)
    xyz = np.stack((x, y, z))  # (3, h, w)
    nbatch = colors.shape[0]
    nlights = colors.shape[1] // 3
    lights = np.zeros((nbatch, 3, h, w))
    for i in range(nlights):
        d = dirs[:, 3 * i : 3 * i + 3]  # (B, 3)
        c = colors[:, 3 * i : 3 * i + 3]  # (B, 3)
        dot = np.einsum("bd,dhw->bhw", d, xyz)
        g = np.exp((dot - 1) / sizes[:, i][:, None, None])
        lights += c[:, :, None, None] * g[:, None, :, :]
    return lights


def test_render_sg_matches_reference_loop():
    rng = np.random.default_rng(1)
    b, n = 2, 16
    dirs = G.sphere_points(n)[None].repeat(b, 0).reshape(b, n * 3)
    sizes = np.full((b, n), 0.0025) * rng.uniform(1, 3, (b, n))
    colors = rng.random((b, n * 3)).astype(np.float64)
    ref = reference_convert_to_panorama(dirs, sizes, colors)
    ours = render_sg(jnp.asarray(dirs), jnp.asarray(sizes), jnp.asarray(colors))
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    # f32 dot-product rounding enters an exp() scaled by 1/size (~400x), so
    # ~1e-7 dot error -> ~4e-5 relative error; the reference itself runs f32.
    np.testing.assert_allclose(ours_nchw, ref, rtol=1e-4, atol=1e-6)


def test_render_anchor_params_composition():
    rng = np.random.default_rng(2)
    b, n = 2, 32
    dist = rng.random((b, n)).astype(np.float32)
    dist /= dist.sum(axis=1, keepdims=True)
    intensity = rng.random((b,)).astype(np.float32)
    rgb = rng.random((b, 3)).astype(np.float32)
    ambient = rng.random((b, 3)).astype(np.float32)

    env = render_anchor_params(
        jnp.asarray(dist), jnp.asarray(intensity), jnp.asarray(rgb),
        jnp.asarray(ambient), n=n, intensity_scale=500.0,
    )
    # manual composition through render_sg
    colors = (dist[:, :, None] * intensity[:, None, None] * 500.0 * rgb[:, None, :]).reshape(b, -1)
    dirs = G.sphere_points(n)[None].repeat(b, 0).reshape(b, -1)
    sizes = np.full((b, n), 0.0025, dtype=np.float32)
    expected = np.asarray(render_sg(jnp.asarray(dirs), jnp.asarray(sizes), jnp.asarray(colors)))
    expected = expected + ambient[:, None, None, :]
    # f32 multiply-order differences between the fused and manual compositions
    np.testing.assert_allclose(np.asarray(env), expected, rtol=2e-4, atol=1e-5)


def reference_extract(hdr, ln):
    """NumPy port of extract_mesh (distribution_representation.py:65-120)."""
    h, w, _ = hdr.shape
    ster = np.sin((np.linspace(0, h, num=h, endpoint=False) + 0.5) / h * np.pi)
    hdr = hdr * ster[:, None, None]
    inten = 0.3 * hdr[..., 0] + 0.59 * hdr[..., 1] + 0.11 * hdr[..., 2]
    mask = (inten > inten.max() * 0.05)[..., None]
    light = hdr * mask
    remain = hdr * (~mask)
    ambient = remain.sum(axis=(0, 1))
    idx = G.nearest_anchor_index(h, w, ln)
    anchors = np.zeros((ln, 3))
    for i in range(ln):
        anchors[i] = (light * (idx == i)[..., None]).sum(axis=(0, 1))
    energy = 0.3 * anchors[:, 0] + 0.59 * anchors[:, 1] + 0.11 * anchors[:, 2]
    distribution = energy / energy.sum()
    rgb = anchors.sum(0)
    intensity = np.linalg.norm(rgb)
    return distribution, intensity, rgb / intensity, ambient


@pytest.mark.parametrize("ln", [96, 128])
def test_extract_matches_reference(ln):
    rng = np.random.default_rng(3)
    hdr = rng.random((64, 128, 3)).astype(np.float32)
    hdr[10:14, 30:40] *= 400.0  # a light source
    dist, inten, rgb, amb = reference_extract(hdr.astype(np.float64), ln)
    out = extract_anchors(jnp.asarray(hdr), n=ln)
    np.testing.assert_allclose(np.asarray(out["distribution"]), dist, atol=1e-6)
    np.testing.assert_allclose(float(out["intensity"]), inten, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["rgb_ratio"]), rgb, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["ambient"]), amb, rtol=1e-4, atol=1e-5)


def test_extract_batch_consistent_with_single():
    rng = np.random.default_rng(4)
    hdrs = rng.random((3, 32, 64, 3)).astype(np.float32) * 10
    batch = extract_anchors_batch(jnp.asarray(hdrs), n=24)
    for i in range(3):
        single = extract_anchors(jnp.asarray(hdrs[i]), n=24)
        np.testing.assert_allclose(
            np.asarray(batch["distribution"][i]), np.asarray(single["distribution"]), atol=1e-6
        )
        np.testing.assert_allclose(
            float(batch["intensity"][i]), float(single["intensity"]), rtol=1e-6
        )


def test_extract_then_render_roundtrip_peak():
    # Analysis->synthesis: a single bright light should re-render with its peak
    # at (approximately) the same panorama location.
    hdr = np.full((128, 256, 3), 0.01, dtype=np.float32)
    hdr[40:44, 100:104] = 2000.0
    out = extract_anchors(jnp.asarray(hdr), n=128)
    env = render_anchor_params(
        out["distribution"][None],
        out["intensity"][None],
        out["rgb_ratio"][None],
        n=128,
    )
    env = np.asarray(env)[0].sum(-1)
    py, px = np.unravel_index(env.argmax(), env.shape)
    assert abs(py - 42) < 10 and abs(px - 102) < 12


def test_anchor_extractor_wrapper():
    hdr = np.random.default_rng(5).random((64, 128, 3)).astype(np.float32)
    ex = AnchorExtractor(h=64, w=128, ln=48)
    params, lmap = ex.compute(hdr)
    assert params["distribution"].shape == (48,)
    np.testing.assert_allclose(params["distribution"].sum(), 1.0, rtol=1e-5)
    assert lmap.shape == (64, 128)
