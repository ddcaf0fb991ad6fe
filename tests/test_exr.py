"""EXR codec roundtrip and format-conformance tests."""

import numpy as np
import pytest

from emlight_tpu.core import exr


@pytest.mark.parametrize("compression", ["none", "zip", "zips"])
@pytest.mark.parametrize("half", [False, True])
def test_roundtrip(tmp_path, compression, half):
    rng = np.random.default_rng(42)
    img = (rng.random((37, 53, 3)) * 100).astype(np.float32)
    p = str(tmp_path / "t.exr")
    exr.write_exr(p, img, half=half, compression=compression)
    back = exr.read_exr(p)
    if half:
        np.testing.assert_allclose(back, img.astype(np.float16).astype(np.float32))
    else:
        np.testing.assert_array_equal(back, img)


def test_roundtrip_hdr_range(tmp_path):
    # HDR values far above 1.0 (light sources) must survive exactly in FLOAT.
    img = np.array([[[0.0, 1e-8, 5e4]]], dtype=np.float32).repeat(20, 0).repeat(20, 1)
    p = str(tmp_path / "hdr.exr")
    exr.write_exr(p, img)
    np.testing.assert_array_equal(exr.read_exr(p), img)


def test_channel_order_and_subset(tmp_path):
    img = np.stack(
        [np.full((8, 8), v, dtype=np.float32) for v in (1.0, 2.0, 3.0, 4.0)], axis=-1
    )
    p = str(tmp_path / "rgba.exr")
    exr.write_exr(p, img, channels="RGBA")
    back = exr.read_exr(p)  # defaults to RGB
    assert back.shape == (8, 8, 3)
    np.testing.assert_array_equal(back[0, 0], [1.0, 2.0, 3.0])
    a = exr.read_exr(p, channels="A")
    np.testing.assert_array_equal(a[0, 0], [4.0])


def test_zip_predictor_vectors():
    # encode/decode are exact inverses on random bytes
    rng = np.random.default_rng(0)
    for n in (1, 2, 7, 256, 1023):
        raw = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert exr._zip_decode(exr._zip_encode(raw), n) == raw


def test_tall_image_partial_last_chunk(tmp_path):
    # height not a multiple of 16 exercises the short final ZIP chunk
    img = np.arange(35 * 5 * 3, dtype=np.float32).reshape(35, 5, 3)
    p = str(tmp_path / "tall.exr")
    exr.write_exr(p, img, compression="zip")
    np.testing.assert_array_equal(exr.read_exr(p), img)


def test_rejects_bad_magic(tmp_path):
    p = tmp_path / "bad.exr"
    p.write_bytes(b"not an exr file" * 4)
    with pytest.raises(exr.EXRError):
        exr.read_exr(str(p))
