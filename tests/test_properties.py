"""Property-based tests (SURVEY.md section 4b): algebraic invariants of
the likelihood/KDE/summary kernels that must hold for ANY valid input,
checked with hypothesis-generated photometry."""

import numpy as np
from hypothesis import given, settings, strategies as st
from hypothesis.extra import numpy as hnp

from frankenz_tpu.ops import (gauss_kde, inv_luptitude, inv_magnitude,
                              loglike, luptitude, magnitude,
                              pdfs_summarize, threshold_weights)

_finite = dict(allow_nan=False, allow_infinity=False)


def _phot(rng_shape):
    return hnp.arrays(np.float64, rng_shape,
                      elements=st.floats(0.1, 50.0, **_finite))


@settings(max_examples=25, deadline=None)
@given(_phot((3, 4)), _phot((6, 4)),
       st.floats(0.05, 2.0, **_finite),
       st.floats(0.0, 0.3, **_finite))
def test_loglike_shift_and_scale_invariances(d, m, derr, merr):
    """(a) free-scale lnlike is invariant to rescaling every model when
    errors scale along (the ML scale absorbs it); (b) fixed-scale chi2 is
    symmetric under swapping data/models with swapped errors."""
    de = np.full_like(d, derr)
    dm = np.ones_like(d)
    me = merr * m
    mm = np.ones_like(m)
    # dim_prior=False: the invariance is exact in chi2; the chi2-dist
    # logpdf would amplify roundoff via log(chi2) at degenerate
    # perfect-fit draws (chi2 ~ 0).
    base = loglike(d, de, dm, m, me, mm, free_scale=True,
                   ignore_model_err=True, dim_prior=False)
    scaled = loglike(d, de, dm, 3.0 * m, 3.0 * me, mm, free_scale=True,
                     ignore_model_err=True, dim_prior=False)
    np.testing.assert_allclose(np.asarray(scaled.lnlike),
                               np.asarray(base.lnlike), rtol=1e-8,
                               atol=1e-6)
    # Scale solution itself divides by 3.
    np.testing.assert_allclose(np.asarray(
        loglike(d, de, dm, 3.0 * m, me, mm, free_scale=True,
                ignore_model_err=True, return_scale=True).scale) * 3.0,
        np.asarray(loglike(d, de, dm, m, me, mm, free_scale=True,
                           ignore_model_err=True,
                           return_scale=True).scale), rtol=1e-6)


@settings(max_examples=25, deadline=None)
@given(_phot((2, 5)), _phot((4, 5)))
def test_loglike_masked_band_equals_dropped_band(d, m):
    """Masking a band == removing that band from the problem (chi2 and
    Ndim agree; the non-dim-prior lnl differs only by that band's
    variance normalization, which the masked version still sums —
    pdf.py:97-98 — so compare chi2/Ndim)."""
    de = np.full_like(d, 0.2)
    me = np.zeros_like(m)
    mm = np.ones_like(m)
    dmask = np.ones_like(d)
    dmask[:, 2] = 0.0
    full = loglike(d, de, dmask, m, me, mm)
    keep = [0, 1, 3, 4]
    sub = loglike(d[:, keep], de[:, keep], np.ones((2, 4)), m[:, keep],
                  me[:, keep], np.ones((4, 4)))
    np.testing.assert_allclose(np.asarray(full.chi2), np.asarray(sub.chi2),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_array_equal(np.asarray(full.ndim),
                                  np.asarray(sub.ndim))


@settings(max_examples=25, deadline=None)
@given(hnp.arrays(np.float64, (5, 30),
                  elements=st.floats(0.0, 1.0, **_finite)),
       st.floats(1e-4, 0.5, **_finite))
def test_threshold_weights_properties(wts, wt_thresh):
    """Thresholding only zeroes entries, never changes survivors, and
    always keeps each row's maximum."""
    wts = wts + 1e-9  # avoid all-zero rows
    out = np.asarray(threshold_weights(wts, wt_thresh, None))
    assert out.shape == wts.shape
    zeroed = out == 0.0
    np.testing.assert_allclose(out[~zeroed], wts[~zeroed], rtol=1e-12)
    rows = np.arange(wts.shape[0])
    assert (out[rows, wts.argmax(axis=1)] > 0).all()


@settings(max_examples=25, deadline=None)
@given(hnp.arrays(np.float64, (8,),
                  elements=st.floats(0.1, 3.4, **_finite)),
       hnp.arrays(np.float64, (8,),
                  elements=st.floats(0.02, 0.3, **_finite)))
def test_gauss_kde_mass_and_support(y, ys):
    """Unit-weight KDE stacks to total mass ~ Nkept and is non-negative,
    with every kernel's mass inside its +-5 sigma window."""
    grid = np.linspace(0, 3.5, 351)
    pdf = np.asarray(gauss_kde(y, ys, grid, y_wt=np.ones(8),
                               wt_thresh=None, cdf_thresh=None))
    assert (pdf >= 0).all()
    np.testing.assert_allclose(pdf.sum(), 8.0, rtol=1e-6)
    lo, hi = (y - 5 * ys).min(), (y + 5 * ys).max()
    outside = (grid < lo - 0.02) | (grid > hi + 0.02)
    assert pdf[outside].max(initial=0.0) == 0.0


@settings(max_examples=20, deadline=None)
@given(st.floats(1.0, 2.5, **_finite), st.floats(0.02, 0.2, **_finite))
def test_summarize_of_gaussian_pdf(mu, sig):
    """Summaries of an UNtruncated Gaussian PDF recover its parameters
    (mu kept >= 5 sigma inside the grid)."""
    grid = np.linspace(0, 3.5, 701)
    pdf = np.exp(-0.5 * ((grid - mu) / sig) ** 2)
    pdf /= pdf.sum()
    s = pdfs_summarize(pdf[None, :], grid)
    for est in (s.mean, s.median, s.mode):
        assert abs(float(est.point[0]) - mu) < 2 * sig / 10 + 0.01
    assert abs(float(s.mean.std[0]) - sig) < 0.1 * sig + 0.01
    assert float(s.low68[0]) < mu < float(s.high68[0])


@settings(max_examples=25, deadline=None)
@given(hnp.arrays(np.float64, (3, 4),
                  elements=st.floats(0.5, 100.0, **_finite)),
       hnp.arrays(np.float64, (3, 4),
                  elements=st.floats(0.01, 5.0, **_finite)))
def test_transform_round_trips(flux, err):
    """magnitude and luptitude invert exactly (pdf.py:625-775)."""
    m, me = magnitude(flux, err)
    f2, e2 = inv_magnitude(np.asarray(m), np.asarray(me))
    np.testing.assert_allclose(np.asarray(f2), flux, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(e2), err, rtol=1e-10)
    lu, lue = luptitude(flux, err)
    f3, e3 = inv_luptitude(np.asarray(lu), np.asarray(lue))
    np.testing.assert_allclose(np.asarray(f3), flux, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(e3), err, rtol=1e-8)


def test_fit_predict_bitwise_repeatable():
    """The BASELINE accuracy bar demands bitwise-stable PDFs: the same
    fit_predict call repeated (fresh fitter instance, identical inputs)
    must return BIT-IDENTICAL PDFs and GOF on both the fused and XLA
    paths (fixed per-path reduction orders), and batch size must not
    move the result beyond matmul re-tiling roundoff."""
    from frankenz_tpu.models import BruteForce

    rng = np.random.default_rng(19)
    nobj, nmodel, nfilt = 40, 120, 5
    m = rng.uniform(1, 10, (nmodel, nfilt))
    me = 0.1 * m
    mm = np.ones_like(m)
    d = m[rng.integers(0, nmodel, nobj)] + rng.normal(0, 0.3, (nobj, nfilt))
    de = np.full_like(d, 0.3)
    dm = np.ones_like(d)
    zl = rng.uniform(0.2, 2.8, nmodel)
    zle = rng.uniform(0.05, 0.2, nmodel)
    grid = np.linspace(0, 3, 151)

    def run(use_fused, batch_size=None):
        bf = BruteForce(m, me, mm)
        pdfs, (lmap, levid) = bf.fit_predict(
            d, de, dm, zl, zle, label_grid=grid, return_gof=True,
            use_fused=use_fused, verbose=False,
            **({"batch_size": batch_size} if batch_size else {}))
        return (np.asarray(pdfs), np.asarray(lmap), np.asarray(levid))

    for use_fused in (False, True):
        a = run(use_fused)
        b = run(use_fused)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    a = run(False)
    c = run(False, batch_size=17)
    np.testing.assert_allclose(c[0], a[0], rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(c[1], a[1], rtol=1e-6)
    np.testing.assert_allclose(c[2], a[2], rtol=1e-6)
