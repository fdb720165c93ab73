"""Full-pipeline integration: mock catalog -> fitter PDFs -> population
N(z) inference, recovering the truth (the demo 1 -> 3 -> 6 chain run as
one test, on the regenerated SDSS stand-in instead of synthetic
Gaussian PDFs)."""

import numpy as np
import pytest

from frankenz_tpu.models import BruteForce
from frankenz_tpu.ops import pdfs_summarize
from frankenz_tpu.samplers import hierarchical_sampler
from frankenz_tpu.sim import make_sdss_mock


@pytest.fixture(scope="module")
def pipeline():
    cat = make_sdss_mock(nobj=4200, seed=77, cache=False)
    ntrain, ntest = 2800, 1000
    grid = np.linspace(0, 7.0, 281)
    bf = BruteForce(cat["phot"][:ntrain], cat["phot_err"][:ntrain],
                    cat["phot_mask"][:ntrain])
    z = cat["redshifts"][:ntrain]
    pdfs = bf.fit_predict(
        cat["phot"][ntrain:ntrain + ntest],
        cat["phot_err"][ntrain:ntrain + ntest],
        cat["phot_mask"][ntrain:ntrain + ntest],
        z, 0.05 * (1.0 + z), label_grid=grid, verbose=False)
    ztrue = cat["redshifts"][ntrain:ntrain + ntest]
    return pdfs, grid, ztrue


def test_point_estimates_recover_truth(pipeline):
    pdfs, grid, ztrue = pipeline
    summ = pdfs_summarize(pdfs, grid)
    for est in (summ.median, summ.mean, summ.best):
        dz = (np.asarray(est.point) - ztrue) / (1 + ztrue)
        nmad = 1.48 * np.median(np.abs(dz - np.median(dz)))
        assert nmad < 0.05, nmad
    # Credible intervals bracket the point estimates.
    assert (np.asarray(summ.low68) <= np.asarray(summ.high68)).all()
    med = np.asarray(summ.median.point)
    cover68 = np.mean((ztrue >= np.asarray(summ.low68) - 0.05)
                      & (ztrue <= np.asarray(summ.high68) + 0.05))
    assert cover68 > 0.6, cover68


def test_hierarchical_nz_recovery_from_fitted_pdfs(pipeline):
    pdfs, grid, ztrue = pipeline
    # Run the Gibbs sampler on the native fine grid (the PDFs are
    # narrower than any sensible coarse binning — point-resampling them
    # would alias) and compare distributions via their CDFs.
    pdfs_s = np.maximum(np.asarray(pdfs), 0.0) + 1e-12
    samp = hierarchical_sampler(pdfs_s)
    # Weak hyper-prior: the default flat alpha=1 per bin would inject
    # Nbins=281 uniform pseudo-counts against 1000 objects (~22% of the
    # posterior mass spread over [0, 7]).
    samp.run_mcmc(80, alpha=np.full(len(grid), 0.02), thin=4, seed=1,
                  verbose=False)
    samples, lnps = samp.results
    assert np.isfinite(lnps).all()
    np.testing.assert_allclose(samples.sum(axis=1), 1.0, atol=1e-3)
    post = samples[30:].mean(axis=0)
    # Mean redshift of the recovered N(z) matches the truth.
    assert abs(post @ grid - ztrue.mean()) < 0.05
    # Kolmogorov-style CDF check.  The deconvolved posterior is
    # legitimately atomic (the ML mixing distribution of narrow kernels
    # concentrates on spikes), so compare at the resolution the data
    # support: re-smooth the posterior by the 0.05(1+z) label kernel and
    # match it against the same smoothing of the truth.
    from scipy.stats import norm

    from frankenz_tpu.ops import kernel_matrix

    Gs = np.asarray(kernel_matrix(grid, 0.05 * (1.0 + grid), grid))
    post_s = post @ Gs
    post_s /= post_s.sum()
    sig = 0.05 * (1.0 + ztrue)
    cdf_smooth = norm.cdf((grid[:, None] - ztrue[None, :])
                          / sig[None, :]).mean(axis=1)
    ks = np.max(np.abs(np.cumsum(post_s) - cdf_smooth))
    assert ks < 0.06, ks
    # And the raw (unsmoothed) posterior still tracks the empirical CDF
    # to kernel-width level.
    cdf_emp = np.mean(ztrue[None, :] <= grid[:, None], axis=1)
    assert np.max(np.abs(np.cumsum(post) - cdf_emp)) < 0.2
