"""EXR codec roundtrip and format-conformance tests."""

import numpy as np
import pytest

from emlight_tpu.core import exr


@pytest.mark.parametrize("compression", ["none", "zip", "zips", "piz"])
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


# --- PIZ (wavelet + Huffman, core/piz.py) ----------------------------------
# The reference ingests PIZ through the OpenEXR bindings
# (RegressionNetwork/util.py:20-33); these pin the from-scratch codec.


def test_piz_chunk_stage_roundtrips():
    from emlight_tpu.core import piz

    rng = np.random.default_rng(0)
    data = rng.integers(0, 60000, size=1000).astype(np.uint16)
    bm, _, _ = piz._bitmap_from_data(data)
    flut, m1 = piz._forward_lut(bm)
    rlut, m2 = piz._reverse_lut(bm)
    assert m1 == m2
    np.testing.assert_array_equal(rlut[flut[data]], data)

    # wavelet: both arithmetic modes, odd/even/degenerate shapes
    for shape in [(32, 64), (7, 33), (1, 16), (16, 1), (5, 5)]:
        for mv in (1000, 60000):
            hi = mv + 1 if mv < (1 << 14) else 65536
            p = rng.integers(0, hi, size=shape).astype(np.uint16)
            q = p.copy()
            piz._wav2_encode(q, mv)
            assert not (shape[0] > 4 and shape[1] > 4) or not np.array_equal(p, q)
            piz._wav2_decode(q, mv)
            np.testing.assert_array_equal(p, q)

    # huffman incl. the run-length escape path
    for n in (1, 10, 1000, 20000):
        d = rng.integers(0, 500, size=n).astype(np.uint16)
        d[n // 2 :] = 7
        np.testing.assert_array_equal(piz._huf_decompress(piz._huf_compress(d), n), d)


def test_piz_chunk_roundtrip_mixed_channels():
    from emlight_tpu.core import piz

    rng = np.random.default_rng(1)
    # HALF + FLOAT channels (1 and 2 u16 lanes), ragged final-chunk height
    for units, w, nl in ([1, 1, 1], 64, 32), ([2, 2, 2], 37, 32), ([1, 2, 1], 16, 7):
        n_u16 = sum(w * u for u in units) * nl
        raw = np.frombuffer(rng.bytes(n_u16 * 2), np.uint16).tobytes()
        assert piz.decode_chunk(piz.encode_chunk(raw, units, w, nl), units, w, nl) == raw
    # all-zero and constant chunks (empty / single-entry bitmap)
    for vals in (np.zeros(33 * 32, np.float16), np.full(33 * 32, 2.5, np.float16)):
        raw = vals.tobytes()
        assert piz.decode_chunk(piz.encode_chunk(raw, [1], 33, 32), [1], 33, 32) == raw


def test_piz_mixed_compression_dir(tmp_path):
    """One directory holding NONE/ZIP/PIZ files all read back exactly —
    the Laval-in-the-wild ingestion case the reference handles via OpenEXR."""
    rng = np.random.default_rng(2)
    imgs = {}
    for i, comp in enumerate(("none", "zip", "piz")):
        img = (rng.random((40, 24, 3)) * 50).astype(np.float32)
        exr.write_exr(str(tmp_path / f"s{i}_{comp}.exr"), img, compression=comp)
        imgs[f"s{i}_{comp}.exr"] = img
    for name, img in imgs.items():
        np.testing.assert_array_equal(exr.read_exr(str(tmp_path / name)), img)
