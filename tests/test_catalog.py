"""SDSS DR13 stand-in catalog: determinism + PDF coverage uniformity.

VERDICT round-1 item 6: the real catalog is stripped upstream
(`.MISSING_LARGE_BLOBS:1`); benchmarks and demo-style workflows consume
the regenerated mock, whose PDFs must pass the demo-3 coverage checks
(CDF values at MC-jittered truths ~ Uniform(0, 1)).
"""

import numpy as np
import pytest

from frankenz_tpu.models import BruteForce
from frankenz_tpu.plotting import cdf_vs_ecdf, cdf_vs_epdf
from frankenz_tpu.sim import make_sdss_mock, sdss_model_grid


@pytest.fixture(scope="module")
def cat():
    return make_sdss_mock(nobj=4500, seed=99, cache=False)


def test_catalog_deterministic(cat):
    again = make_sdss_mock(nobj=4500, seed=99, cache=False)
    for k in cat:
        np.testing.assert_array_equal(cat[k], again[k])
    assert len(cat["phot"]) > 4000
    # Realistic structure: redshifts within the prior support, noisy
    # fluxes at the declared depths, r-band flux consistent with refmag.
    assert 0 <= cat["redshifts"].min() and cat["redshifts"].max() <= 7
    assert cat["types"].min() >= 0 and cat["types"].max() <= 2
    snr_r = cat["phot"][:, 2] / cat["phot_err"][:, 2]
    assert np.median(snr_r) > 3.0


def test_model_grid_helper():
    models, me, mm, zz, tt = sdss_model_grid(nz=41, zbounds=(0, 3))
    assert models.shape[1] == 5
    assert len(models) == len(zz) == len(tt)
    assert np.isfinite(models).all()
    assert (models[:, 2] > 0).all()


def test_catalog_pdf_coverage(cat):
    """Demo-3 style check: fit held-out catalog objects against a
    training split and verify coverage uniformity of the PDFs."""
    ntrain, ntest = 3000, 800
    m = cat["phot"][:ntrain]
    me = cat["phot_err"][:ntrain]
    mm = cat["phot_mask"][:ntrain]
    z = cat["redshifts"][:ntrain]
    zerr = 0.06 * (1.0 + z)
    d = cat["phot"][ntrain:ntrain + ntest]
    de = cat["phot_err"][ntrain:ntrain + ntest]
    dm = cat["phot_mask"][ntrain:ntrain + ntest]
    ztrue = cat["redshifts"][ntrain:ntrain + ntest]

    grid = np.linspace(0, 7.0, 351)
    bf = BruteForce(m, me, mm)
    pdfs = bf.fit_predict(d, de, dm, z, zerr, label_grid=grid,
                          verbose=False)
    assert np.isfinite(pdfs).all()
    np.testing.assert_allclose(pdfs.sum(axis=1), 1.0, atol=1e-3)

    # Point-estimate quality on realistic photometry.
    zhat = grid[np.argmax(pdfs, axis=1)]
    dz = (zhat - ztrue) / (1 + ztrue)
    nmad = 1.48 * np.median(np.abs(dz - np.median(dz)))
    assert nmad < 0.06, nmad
    assert np.mean(np.abs(dz) > 0.15) < 0.12

    # Coverage: CDF draws at jittered truths ~ U(0,1) (demo 3;
    # plotting.py:369-521).  Loose bounds — the mock is magnitude
    # limited and the fit is likelihood-only, like the demo.
    # at the tails (the demo-3 notebooks show the same mild
    # overconfidence), so the bounds assert approximate uniformity, not
    # perfect calibration.
    zerr_true = np.full(ntest, 0.06) * (1 + ztrue)
    n = cdf_vs_epdf(ztrue, zerr_true, pdfs, grid, Nmc=20, Nbins=10,
                    plot=False, seed=3)
    assert n.min() > 0.5, n
    assert n.max() < 2.2, n
    # Interior bins (away from the overconfident tails) are flat.
    assert 0.6 < n[1:-1].min() and n[1:-1].max() < 1.4, n
    x, y = cdf_vs_ecdf(ztrue, zerr_true, pdfs, grid, Nmc=20, plot=False,
                       seed=3)
    assert np.max(np.abs(y - x)) < 0.12, np.max(np.abs(y - x))
