"""Needlets/SH subsystem: golden values, partition of unity, HEALPix geometry,
addition-theorem basis vs direct SH construction, roundtrip energy."""

import math

import numpy as np
import pytest

from emlight_tpu.needlets import harmonics as H
from emlight_tpu.needlets import healpix as hp
from emlight_tpu.needlets.needlets import (
    band_nside,
    band_slices,
    cubature_pairing,
    needlet_basis_matrix,
    needlet_window,
    sh_to_needlet_matrix,
)


# ---------------- spherical harmonics ----------------

def test_sh_closed_forms():
    theta = np.array([0.3, 1.2, 2.0])
    phi = np.array([0.5, 2.5, 4.0])
    # Y_0^0 = 1/sqrt(4pi)
    np.testing.assert_allclose(
        H.complex_sh(0, 0, theta, phi).real, 1 / np.sqrt(4 * np.pi)
    )
    # Y_1^0 = sqrt(3/4pi) cos(theta)
    np.testing.assert_allclose(
        H.complex_sh(1, 0, theta, phi).real,
        np.sqrt(3 / (4 * np.pi)) * np.cos(theta),
        rtol=1e-12,
    )
    # Y_1^1 = -sqrt(3/8pi) sin(theta) e^{i phi}
    np.testing.assert_allclose(
        H.complex_sh(1, 1, theta, phi),
        -np.sqrt(3 / (8 * np.pi)) * np.sin(theta) * np.exp(1j * phi),
        rtol=1e-12,
    )


def test_legendre_matches_scipy():
    from scipy.special import lpmv

    x = 0.37
    lmax = 8
    P = H.legendre_all(lmax, np.array([x]))
    for l in range(lmax + 1):
        for m in range(l + 1):
            # lpmv includes the Condon-Shortley phase, like the reference lpmn
            np.testing.assert_allclose(P[l, m, 0], lpmv(m, l, x), rtol=1e-10)


def test_real_sh_matrix_orthonormal_under_quadrature():
    # sum over a fine equirect grid with sin(theta) weights approximates the
    # L2 inner product; the basis must be orthonormal
    h, w, lmax = 64, 128, 3
    theta = (np.arange(h) + 0.5) * np.pi / h
    phi = (np.arange(w) + 0.5) * 2 * np.pi / w
    P, T = np.meshgrid(phi, theta)
    Y = H.real_sh_matrix(T.reshape(-1), P.reshape(-1), lmax)
    wgt = (np.sin(theta) * (np.pi / h) * (2 * np.pi / w)).repeat(w)
    gram = (Y * wgt[:, None]).T @ Y
    np.testing.assert_allclose(gram, np.eye(H.sh_terms(lmax)), atol=2e-3)


def test_symmetrized_matrix_matches_complex_definition():
    theta = np.array([0.7, 1.9])
    phi = np.array([1.1, 3.3])
    M = H.symmetrized_sh_matrix(theta, phi, 2)
    for l in range(3):
        for m in range(-l, l + 1):
            Y = H.complex_sh(l, m, theta, phi)
            if m < 0:
                expect = (-1) ** m * np.sqrt(2) * Y.real
            elif m == 0:
                expect = Y.real
            else:
                expect = (-1) ** m * np.sqrt(2) * Y.imag
            np.testing.assert_allclose(M[:, H.sh_index(l, m)], expect, atol=1e-12)


# ---------------- healpix ----------------

def test_healpix_golden_values_nside1():
    theta, phi = hp.pix2ang(1, np.arange(12))
    z = np.cos(theta)
    np.testing.assert_allclose(z[:4], 2 / 3, rtol=1e-12)
    np.testing.assert_allclose(z[4:8], 0, atol=1e-12)
    np.testing.assert_allclose(z[8:], -2 / 3, rtol=1e-12)
    np.testing.assert_allclose(phi[:4], [np.pi / 4, 3 * np.pi / 4, 5 * np.pi / 4, 7 * np.pi / 4])
    np.testing.assert_allclose(phi[4:8], [0, np.pi / 2, np.pi, 3 * np.pi / 2], atol=1e-12)


@pytest.mark.parametrize("nside", [1, 2, 4, 8])
def test_healpix_geometry_invariants(nside):
    npix = hp.nside2npix(nside)
    vec = hp.pix2vec(nside, np.arange(npix))
    np.testing.assert_allclose(np.linalg.norm(vec, axis=1), 1.0, atol=1e-12)
    # equal-area: center of mass at origin
    np.testing.assert_allclose(vec.mean(0), 0.0, atol=1e-12)
    # ring structure
    starts = hp.ring_start(nside)
    assert starts[-1] == npix
    # antipodal symmetry of the RING grid (needed for needlet pairing)
    corr = vec @ vec.T
    assert ((corr.min(axis=1) + 1) < 1e-10).all()


def test_healpix_quadrature_integrates_harmonics():
    # HEALPix equal-weight cubature integrates low-l harmonics to ~0
    nside = 8
    theta, phi = hp.pix2ang(nside, np.arange(hp.nside2npix(nside)))
    lam = 4 * np.pi / hp.nside2npix(nside)
    for l, m in [(1, 0), (2, 1), (3, -2), (4, 4)]:
        val = (H.real_sh(l, m, theta, phi)).sum() * lam
        # HEALPix is an approximate (not exact) cubature; ~1e-5 at l=4, Nside=8
        assert abs(val) < 1e-4, (l, m, val)


# ---------------- needlets ----------------

def test_window_partition_of_unity():
    # sum_j b^2(l / B^j) = 1 for l >= 1 (Littlewood-Paley property)
    for l in range(1, 9):
        s = sum(needlet_window(l / 2.0 ** j, 2.0) ** 2 for j in range(0, 12))
        np.testing.assert_allclose(s, 1.0, rtol=1e-8)


def test_band_dimensions_match_reference():
    # jmax=2: 1 + 12 + 48 + 192 = 253 coeffs; jmax=3: + 768 = 1021
    assert [band_nside(j) for j in range(4)] == [1, 2, 4, 8]
    sl2 = band_slices(2)
    assert (sl2[0].start, sl2[0].stop) == (1, 13)
    assert (sl2[1].start, sl2[1].stop) == (13, 61)
    assert (sl2[2].start, sl2[2].stop) == (61, 253)
    theta = np.array([0.5, 1.5])
    phi = np.array([0.1, 3.0])
    assert needlet_basis_matrix(theta, phi, 2).shape == (2, 253)
    assert needlet_basis_matrix(theta, phi, 3).shape == (2, 1021)


def test_basis_matrix_matches_direct_sh_sum():
    """Addition-theorem construction == direct windowed SH synthesis."""
    theta = np.array([0.4, 1.3, 2.2])
    phi = np.array([0.9, 2.1, 5.0])
    jmax, b = 1, 2.0
    M = needlet_basis_matrix(theta, phi, jmax, b)

    lmax = int(np.floor(b ** (jmax + 1)))
    col = 1
    for j in range(jmax + 1):
        ns = band_nside(j, b)
        lam = 4 * np.pi / hp.nside2npix(ns)
        tc, pc = hp.pix2ang(ns, np.arange(hp.nside2npix(ns)))
        l_st = int(np.ceil(b ** (j - 1)))
        l_en = int(min(np.floor(b ** (j + 1)), lmax))
        for k in range(hp.nside2npix(ns)):
            # psi_jk(x) = sqrt(lam) sum_l b_l sum_m Y_lm(x) conj(Y_lm(xi_k))
            val = np.zeros(3, dtype=complex)
            for l in range(l_st, l_en + 1):
                wl = needlet_window(l / 2.0 ** j, 2.0)
                for m in range(-l, l + 1):
                    val += wl * H.complex_sh(l, m, theta, phi) * np.conj(
                        H.complex_sh(l, m, tc[k], pc[k])
                    )
            np.testing.assert_allclose(M[:, col], np.sqrt(lam) * val.real, atol=1e-10)
            col += 1


def test_cubature_pairing_antipodal():
    pair, use = cubature_pairing(2)
    pix = np.vstack(
        [hp.pix2vec(band_nside(j), np.arange(hp.nside2npix(band_nside(j)))) for j in range(3)]
    )
    for i, p in enumerate(pair):
        np.testing.assert_allclose(pix[i], -pix[p], atol=1e-10)
    assert len(use) == len(pair) // 2


def test_sh_to_needlet_matrix_shapes():
    C = sh_to_needlet_matrix(4, symmetrized=False)
    # even l in 0..4 -> 1 + 5 + 9 = 15 rows; cols: 1 + (12+48+192) for jmax=2
    assert C.shape == (15, 253)
    Cs = sh_to_needlet_matrix(4, symmetrized=True)
    assert Cs.shape == (15, 1 + 252 // 2)
    # constant basis row: 1 at column 0, 0 elsewhere
    np.testing.assert_allclose(Cs[0, 0], 1.0)
    np.testing.assert_allclose(Cs[0, 1:], 0.0, atol=1e-14)


def test_pipeline_roundtrip_energy():
    import dataclasses
    import jax.numpy as jnp

    from emlight_tpu.config import NeedletsConfig
    from emlight_tpu.needlets import NeedletPipeline

    cfg = dataclasses.replace(NeedletsConfig(), env_h=32, env_w=64, jmax=2)
    pipe = NeedletPipeline(cfg)
    # smooth band-limited-ish signal reconstructs with most of its energy
    theta, phi = np.meshgrid(
        np.linspace(0, np.pi, 32), np.linspace(0, 2 * np.pi, 64), indexing="ij"
    )
    img = (1.0 + 0.5 * np.cos(theta) + 0.3 * np.sin(theta) * np.cos(phi)).astype(np.float32)
    img = np.stack([img, 0.8 * img, 0.6 * img], -1)[None]
    coeffs = pipe.project(jnp.asarray(img))
    assert coeffs.shape == (1, 253, 3)
    rec = np.asarray(pipe.reconstruct(coeffs))
    # mat_gen2-style energy comparison
    e_in = float((img[..., 0] * 0.3 + img[..., 1] * 0.59 + img[..., 2] * 0.11).sum())
    e_rec = float((rec[..., 0] * 0.3 + rec[..., 1] * 0.59 + rec[..., 2] * 0.11).sum())
    # the reference's analysis mixes an endpoint-inclusive grid with
    # pixel-center solid angles (mat_gen2.py:22-25 vs :37), so the frame
    # roundtrip carries a few-percent energy bias at low resolution
    assert abs(e_rec - e_in) / e_in < 0.10, (e_in, e_rec)
    corr = np.corrcoef(rec.reshape(-1), img.reshape(-1))[0, 1]
    # approximate tight frame: corr 0.966 at 32x64, 0.996 at the reference's
    # 128x256 (checked offline); the test grid is deliberately coarse
    assert corr > 0.95, corr

    sparse = pipe.sparsify(coeffs)
    # sparsification keeps the top-25% of j2, 55% of j1, 70% of j0
    for sl, keep in zip(pipe.slices, (0.70, 0.55, 0.25)):
        band = np.asarray(sparse[0, sl])
        frac = (np.abs(band).sum(-1) > 0).mean()
        assert abs(frac - keep) < 0.15, (sl, frac, keep)
