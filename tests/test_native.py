"""Native C++ runtime vs pure-Python oracle (codec equality, tonemap alpha,
threaded batch loader)."""

import numpy as np
import pytest

from emlight_tpu import native
from emlight_tpu.core import exr as pyexr
from emlight_tpu.core.hdr import Tonemap

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native build failed: {native.build_error()}"
)


def test_native_reads_python_written(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.random((37, 53, 3)) * 100).astype(np.float32)
    for comp in ("none", "zip", "zips", "piz"):
        p = str(tmp_path / f"{comp}.exr")
        pyexr.write_exr(p, img, compression=comp)
        np.testing.assert_array_equal(native.read_exr(p), img)


def test_native_piz_half_and_smooth(tmp_path):
    """PIZ half: smooth HDR data (the compressing case; exercises short AND
    long Huffman codes, the RLE symbol, and the 14-bit wavelet mode)."""
    h, w = 64, 96
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    img = np.stack(
        [np.sin(6 * xx) * np.cos(3 * yy) + 1.2, xx * yy * 2,
         np.exp(-((xx - 0.5) ** 2 + (yy - 0.3) ** 2) * 20) * 80], -1
    ).astype(np.float32)
    p = str(tmp_path / "piz_half.exr")
    pyexr.write_exr(p, img, half=True, compression="piz")
    np.testing.assert_array_equal(native.read_exr(p), pyexr.read_exr(p))


def test_python_reads_native_written(tmp_path):
    rng = np.random.default_rng(1)
    img = (rng.random((40, 64, 3)) * 1e4).astype(np.float32)
    p = str(tmp_path / "n.exr")
    native.write_exr(p, img)
    np.testing.assert_array_equal(pyexr.read_exr(p), img)
    # half roundtrip
    p2 = str(tmp_path / "h.exr")
    native.write_exr(p2, img, half=True)
    np.testing.assert_allclose(
        pyexr.read_exr(p2), img.astype(np.float16).astype(np.float32)
    )


def test_native_reads_half_channels(tmp_path):
    img = np.array([[[0.0, 1.5, -2.25]]], dtype=np.float32).repeat(8, 0).repeat(8, 1)
    p = str(tmp_path / "half.exr")
    pyexr.write_exr(p, img, half=True)
    np.testing.assert_allclose(native.read_exr(p), img)


def test_tonemap_alpha_matches_python():
    rng = np.random.default_rng(2)
    img = (rng.random((64, 128, 3)) * 10).astype(np.float32)
    img[5:9, 10:20] = 500.0
    tm = Tonemap(gamma=2.4, percentile=50, max_mapping=0.5)
    ref_img, ref_alpha = tm(img)
    alpha = native.tonemap_alpha(img, 2.4, 50.0, 0.5)
    np.testing.assert_allclose(alpha, ref_alpha, rtol=1e-5)
    out, alpha2 = native.tonemap_alpha(img.copy(), 2.4, 50.0, 0.5, apply=True)
    np.testing.assert_allclose(out, ref_img, rtol=1e-5, atol=1e-6)


def test_batch_loader_threads_and_resize(tmp_path):
    rng = np.random.default_rng(3)
    paths = []
    imgs = []
    for i in range(6):
        img = (rng.random((64, 128, 3)) * (i + 1)).astype(np.float32)
        p = str(tmp_path / f"b{i}.exr")
        pyexr.write_exr(p, img)
        paths.append(p)
        imgs.append(img)

    out, _ = native.load_batch(paths, (64, 128))
    np.testing.assert_array_equal(out, np.stack(imgs))

    # 2x area downscale == 2x2 box mean
    out2, _ = native.load_batch(paths, (32, 64))
    expect = np.stack(imgs).reshape(6, 32, 2, 64, 2, 3).mean((2, 4))
    np.testing.assert_allclose(out2, expect, rtol=1e-5)

    # with tonemap applied, alphas match the python Tonemap
    tm = Tonemap(2.4, 50, 0.5)
    out3, alphas = native.load_batch(paths, (64, 128), tonemap=(2.4, 50.0, 0.5))
    for i in range(6):
        ref_img, ref_alpha = tm(imgs[i])
        np.testing.assert_allclose(alphas[i], ref_alpha, rtol=1e-5)
        np.testing.assert_allclose(out3[i], ref_img, rtol=1e-4, atol=1e-6)
