"""Tests for photometry transforms and PDF summaries."""

import numpy as np
import pytest

from frankenz_tpu.ops import (inv_luptitude, inv_magnitude, luptitude,
                              magnitude, pdfs_resample, pdfs_summarize)

RTOL = 1e-6


def test_magnitude_roundtrip():
    rng = np.random.default_rng(0)
    phot = rng.uniform(0.5, 100.0, (10, 5))
    err = rng.uniform(0.01, 1.0, (10, 5))
    mag, mag_err = magnitude(phot, err, zeropoints=3.0)
    back, back_err = inv_magnitude(np.asarray(mag), np.asarray(mag_err),
                                   zeropoints=3.0)
    np.testing.assert_allclose(np.asarray(back), phot, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(back_err), err, rtol=RTOL)


def test_magnitude_values():
    # AB: flux ratio of 100 <-> 5 magnitudes.
    mag, _ = magnitude(np.array([[1.0, 100.0]]), np.ones((1, 2)))
    np.testing.assert_allclose(np.asarray(mag[0, 0] - mag[0, 1]), 5.0,
                               rtol=RTOL)


def test_luptitude_roundtrip_and_negative_flux():
    rng = np.random.default_rng(1)
    phot = rng.uniform(-5.0, 100.0, (10, 5))  # asinh handles negatives
    err = rng.uniform(0.01, 1.0, (10, 5))
    mag, mag_err = luptitude(phot, err, skynoise=2.0, zeropoints=3.0)
    assert np.isfinite(np.asarray(mag)).all()
    back, back_err = inv_luptitude(np.asarray(mag), np.asarray(mag_err),
                                   skynoise=2.0, zeropoints=3.0)
    np.testing.assert_allclose(np.asarray(back), phot, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(back_err), err, rtol=1e-5)


def test_luptitude_approaches_magnitude_at_high_snr():
    phot = np.array([[1000.0]])
    err = np.array([[1.0]])
    lup, _ = luptitude(phot, err, skynoise=1e-3, zeropoints=1.0)
    mag, _ = magnitude(phot, err, zeropoints=1.0)
    np.testing.assert_allclose(np.asarray(lup), np.asarray(mag), rtol=1e-4)


@pytest.fixture(scope="module")
def gaussian_pdfs():
    grid = np.linspace(0.0, 4.0, 401)
    mus = np.array([0.5, 1.0, 2.0, 3.1])
    sigs = np.array([0.1, 0.3, 0.2, 0.15])
    pdfs = np.exp(-0.5 * ((grid[None, :] - mus[:, None]) / sigs[:, None])**2)
    pdfs /= pdfs.sum(axis=1, keepdims=True)
    return pdfs, grid, mus, sigs


def test_resample_preserves_shape_and_norm(gaussian_pdfs):
    pdfs, grid, _, _ = gaussian_pdfs
    new_grid = np.linspace(0.0, 4.0, 97)
    out = np.asarray(pdfs_resample(pdfs, grid, new_grid))
    assert out.shape == (4, 97)
    np.testing.assert_allclose(out.sum(axis=1), 1.0, rtol=RTOL)


def test_resample_matches_numpy_interp(gaussian_pdfs):
    pdfs, grid, _, _ = gaussian_pdfs
    new_grid = np.linspace(-0.5, 4.5, 123)
    out = np.asarray(pdfs_resample(pdfs, grid, new_grid, renormalize=False))
    for k in range(4):
        want = np.interp(new_grid, grid, pdfs[k], left=0.0, right=0.0)
        np.testing.assert_allclose(out[k], want, rtol=RTOL, atol=1e-15)


def test_summarize_gaussian_recovery(gaussian_pdfs):
    """On Gaussian PDFs all point estimators agree with mu, std with sigma."""
    pdfs, grid, mus, sigs = gaussian_pdfs
    s = pdfs_summarize(pdfs, grid)
    dx = grid[1] - grid[0]
    for est in (s.mean, s.median, s.mode, s.best):
        np.testing.assert_allclose(np.asarray(est.point), mus, atol=dx)
        np.testing.assert_allclose(np.asarray(est.std), sigs, rtol=0.05)
    np.testing.assert_allclose(np.asarray(s.low68), mus - sigs, atol=2 * dx)
    np.testing.assert_allclose(np.asarray(s.high68), mus + sigs, atol=2 * dx)
    np.testing.assert_allclose(np.asarray(s.low95), mus - 1.96 * sigs,
                               atol=2 * dx)
    # MC draws stay within the support of each PDF.
    assert ((np.asarray(s.mc) > mus - 5 * sigs)
            & (np.asarray(s.mc) < mus + 5 * sigs)).all()


def test_summarize_conf_and_risk(gaussian_pdfs):
    pdfs, grid, mus, sigs = gaussian_pdfs
    s = pdfs_summarize(pdfs, grid)
    from scipy.special import erf as serf

    conf = np.asarray(s.mean.conf)
    # conf = PDF mass within +/- (1+point)*0.03: analytic for a Gaussian.
    width = (1.0 + mus) * 0.03
    want = serf(width / (np.sqrt(2) * sigs))
    np.testing.assert_allclose(conf, want, rtol=0.02)
    # Risk at the best point is the minimum of the risk curve.
    assert (np.asarray(s.best.risk)
            <= np.asarray(s.mean.risk) + 1e-12).all()


def test_summarize_matches_reference_loop(gaussian_pdfs):
    """Vectorized quantiles equal per-object np.interp on the CDF."""
    pdfs, grid, _, _ = gaussian_pdfs
    s = pdfs_summarize(pdfs, grid)
    cdfs = np.cumsum(pdfs / pdfs.sum(axis=1, keepdims=True), axis=1)
    for i, cdf in enumerate(cdfs):
        q = np.interp([0.025, 0.16, 0.5, 0.84, 0.975], cdf, grid)
        np.testing.assert_allclose(
            [np.asarray(s.low95)[i], np.asarray(s.low68)[i],
             np.asarray(s.median.point)[i], np.asarray(s.high68)[i],
             np.asarray(s.high95)[i]], q, rtol=RTOL)
