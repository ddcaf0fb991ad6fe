"""Parity extras: legacy 42-anchor extraction, pickle migration CLI,
needlets spherical_sampling (reference surface closed in round 2)."""

import os
import pickle

import jax.numpy as jnp
import numpy as np

from emlight_tpu.core.geometry import icosphere, polar_to_cartesian, steradian_map
from emlight_tpu.representation.extract import extract_light_info_legacy


def _legacy_oracle(hdr):
    """Direct loop port of intensity_modify.py:70-120 (numpy, slow)."""
    h, w, _ = hdr.shape
    ster = steradian_map(h, w, multiply=False)
    whdr = hdr * ster[..., None]
    verts, _ = icosphere(1)
    ln = len(verts)
    rgbs = np.zeros((ln, 3))
    for i in range(h):
        for j in range(w):
            coord = polar_to_cartesian(j / w * 2 * np.pi, i / h * np.pi)
            idx = np.linalg.norm(verts - coord, axis=1).argmin()
            rgbs[idx] += whdr[i, j]
    rgbs = rgbs + 1e-9
    tmp = rgbs.sum(0)
    rgb_ratio = tmp / tmp.sum()
    luma = lambda v: 0.3 * v[..., 0] + 0.59 * v[..., 1] + 0.11 * v[..., 2]
    total = luma(tmp)
    return {
        "distribution": luma(rgbs) / total,
        "rgb_ratio": rgb_ratio,
        "intensity": total / luma(rgb_ratio),
    }


def test_legacy_42_extraction_matches_loop_oracle():
    rng = np.random.default_rng(0)
    hdr = rng.random((16, 32, 3)).astype(np.float32) * 2
    hdr[4:6, 10:12] = 80.0
    got = {k: np.asarray(v) for k, v in extract_light_info_legacy(jnp.asarray(hdr)).items()}
    want = _legacy_oracle(hdr.astype(np.float64))
    assert got["distribution"].shape == (42,)
    np.testing.assert_allclose(got["distribution"], want["distribution"], rtol=1e-4)
    np.testing.assert_allclose(got["rgb_ratio"], want["rgb_ratio"], rtol=1e-5)
    np.testing.assert_allclose(float(got["intensity"]), want["intensity"], rtol=1e-4)
    np.testing.assert_allclose(got["distribution"].sum(), 1.0, rtol=1e-5)
    np.testing.assert_allclose(got["rgb_ratio"].sum(), 1.0, rtol=1e-6)


def test_modify_pickles_scale(tmp_path):
    from emlight_tpu.cli.modify_pickles import main

    src = tmp_path / "pkl"
    src.mkdir()
    for i in range(3):
        with open(src / f"s{i}.pickle", "wb") as f:
            pickle.dump(
                {"distribution": np.ones(96) / 96, "intensity": np.float32(2.0),
                 "rgb_ratio": np.ones(3) / 3, "ambient": np.ones(3) * 0.5},
                f,
            )
    out = tmp_path / "out"
    main(["--pkl_dir", str(src), "--out_dir", str(out),
          "--scale_intensity", "3.0", "--scale_ambient", "0.5"])
    with open(out / "s0.pickle", "rb") as f:
        p = pickle.load(f)
    np.testing.assert_allclose(float(p["intensity"]), 6.0)
    np.testing.assert_allclose(p["ambient"], 0.25)


def test_modify_pickles_legacy_42(tmp_path):
    from emlight_tpu.cli.modify_pickles import main
    from emlight_tpu.core.exr import write_exr

    hdr_dir = tmp_path / "warped"
    hdr_dir.mkdir()
    rng = np.random.default_rng(1)
    pano = rng.random((128, 256, 3)).astype(np.float32)
    pano[30:34, 60:66] = 200.0
    write_exr(str(hdr_dir / "a.exr"), pano)
    out = tmp_path / "pkl42"
    main(["--hdr_dir", str(hdr_dir), "--out_dir", str(out), "--legacy_42"])
    with open(out / "a.pickle", "rb") as f:
        p = pickle.load(f)
    assert p["distribution"].shape == (42,)
    np.testing.assert_allclose(p["distribution"].sum(), 1.0, rtol=1e-5)


def test_spherical_sampling_matches_bruteforce():
    from emlight_tpu.core.geometry import sphere_points
    from emlight_tpu.needlets.healpix import nside2npix, pix2vec
    from emlight_tpu.needlets.needlets import spherical_sampling

    ids = spherical_sampling(jmax=2, b=2.0)
    assert ids.shape == (64, 3)
    # Nside = 2^ceil(log2(floor(2^3)/2)) = 4 (Needlets/utils.py:207-208)
    dirs = pix2vec(4, np.arange(nside2npix(4)))
    pts = sphere_points(64)
    for n in (0, 17, 63):
        d = np.linalg.norm(dirs - pts[n], axis=1)
        np.testing.assert_array_equal(ids[n], np.argsort(d)[:3])


def test_kld_loss_matches_torch_reference():
    """kld_loss vs the reference formula (loss.py:118-120) evaluated in torch."""
    import torch

    from emlight_tpu.losses.gan import kld_loss

    rng = np.random.default_rng(3)
    mu = rng.normal(size=(4, 256)).astype(np.float32)
    logvar = rng.normal(size=(4, 256)).astype(np.float32)
    tmu, tlv = torch.from_numpy(mu), torch.from_numpy(logvar)
    want = float(-0.5 * torch.sum(1 + tlv - tmu.pow(2) - tlv.exp()))
    got = float(kld_loss(jnp.asarray(mu), jnp.asarray(logvar)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
