"""KDE / PDFDict parity tests vs the NumPy oracle."""

import numpy as np
import pytest

import _oracle as oracle
from frankenz_tpu.ops import kde

RTOL = 1e-6


@pytest.fixture(scope="module")
def grid():
    return np.linspace(0.0, 4.0, 401)


@pytest.fixture(scope="module")
def pdfdict(grid):
    return kde.PDFDict(grid, np.linspace(0.005, 0.25, 50))


def make_labels(rng, n=40):
    y = rng.uniform(0.2, 3.5, n)
    y_std = rng.uniform(0.01, 0.3, n)
    wt = rng.uniform(0.0, 1.0, n) ** 4
    return y, y_std, wt


def test_gaussian_matches():
    x = np.linspace(-3, 3, 100)
    got = np.asarray(kde.gaussian(0.5, 0.3, x))
    want = oracle.gaussian(0.5, 0.3, x)
    np.testing.assert_allclose(got, want, rtol=RTOL)


def test_gaussian_bin_is_cdf_difference():
    from scipy.stats import norm

    bins = np.linspace(-2, 2, 41)
    got = np.asarray(kde.gaussian_bin(0.3, 0.5, bins))
    assert got.shape == (40,)
    assert got.sum() < 1.0
    want = np.diff(norm.cdf(bins, loc=0.3, scale=0.5))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-12)


@pytest.mark.parametrize("wt_thresh,cdf_thresh", [(1e-3, None), (None, 2e-4)])
def test_gauss_kde_matches_oracle(grid, wt_thresh, cdf_thresh):
    rng = np.random.default_rng(10)
    y, y_std, wt = make_labels(rng)
    got = np.asarray(kde.gauss_kde(y, y_std, grid, y_wt=wt,
                                   wt_thresh=wt_thresh,
                                   cdf_thresh=cdf_thresh))
    want = oracle.gauss_kde_1(y, y_std, grid, wt, wt_thresh=wt_thresh,
                              cdf_thresh=cdf_thresh)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-12)


def test_gauss_kde_offgrid_labels(grid):
    """Labels beyond the grid edges clip cleanly (pdf.py:499-502)."""
    y = np.array([-1.0, 0.01, 3.99, 6.0])
    y_std = np.array([0.1, 0.2, 0.2, 0.1])
    wt = np.ones(4)
    got = np.asarray(kde.gauss_kde(y, y_std, grid, y_wt=wt))
    want = oracle.gauss_kde_1(y, y_std, grid, wt)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-12)


def test_gauss_kde_far_below_grid_deviation(grid):
    """DOCUMENTED deviation from the reference (ops/kde.py docstring).

    For labels so far below the grid that `center + offset < 0`, the
    reference's unclamped negative `upper` triggers Python
    negative-slice indexing (`x[0:upper]` drops the last |upper| points)
    and spuriously stacks the label's whole weight, renormalized, into
    the left grid tail (pdf.py:499-525).  We treat both off-grid sides
    symmetrically: zero contribution.  This test pins our convention AND
    reproduces the reference artifact explicitly so the difference stays
    visible instead of implicit.
    """
    y = np.array([-1.0])
    y_std = np.array([0.1])
    wt = np.ones(1)
    got = np.asarray(kde.gauss_kde(y, y_std, grid, y_wt=wt))
    assert got.sum() == 0.0  # our convention: nothing stacked

    # Reproduce the reference's artifact for contrast.
    nx, dx = len(grid), grid[1] - grid[0]
    center = int((y[0] - grid[0]) / dx)
    upper = center + int(5.0 * y_std[0] / dx)
    assert -nx < upper < 0  # the artifact regime (negative Python slice)
    vals = oracle.gaussian(y[0], y_std[0], grid[0:upper])
    ref_pdf = np.zeros(nx)
    ref_pdf[0:upper] = vals / vals.sum()
    assert ref_pdf.sum() > 0.999  # reference stacks ~all of the weight
    assert np.abs(got - ref_pdf).max() > 1e-4  # deviation is deliberate

    # Far ABOVE the grid both conventions agree: zero contribution.
    got_hi = np.asarray(kde.gauss_kde(np.array([40.0]), y_std, grid,
                                      y_wt=wt))
    assert got_hi.sum() == 0.0


def test_pdfdict_structure(pdfdict):
    assert pdfdict.kernel_table.shape == (pdfdict.Ndict,
                                          2 * pdfdict.max_width + 1)
    for i, (k, w) in enumerate(zip(pdfdict.sigma_dict, pdfdict.sigma_width)):
        assert len(k) == 2 * w + 1
        row = pdfdict.kernel_table[i]
        np.testing.assert_array_equal(
            row[pdfdict.max_width - w:pdfdict.max_width + w + 1], k)


def test_pdfdict_fit_quantization(pdfdict, grid):
    rng = np.random.default_rng(11)
    y = rng.uniform(-0.5, 4.5, 100)
    ye = rng.uniform(0.0, 0.5, 100)
    x_idx, e_idx = pdfdict.fit(y, ye)
    x_idx, e_idx = np.asarray(x_idx), np.asarray(e_idx)
    np.testing.assert_array_equal(
        x_idx, np.round((y - grid[0]) / pdfdict.delta).astype(int))
    assert e_idx.min() >= 0 and e_idx.max() <= pdfdict.Ndict - 1


@pytest.mark.parametrize("wt_thresh,cdf_thresh", [(1e-3, None), (None, 2e-4)])
def test_gauss_kde_dict_matches_oracle(pdfdict, wt_thresh, cdf_thresh):
    rng = np.random.default_rng(12)
    y, y_std, wt = make_labels(rng, n=60)
    y_idx, e_idx = pdfdict.fit(y, y_std)
    got = np.asarray(kde.gauss_kde_dict(pdfdict, y_idx=y_idx,
                                        y_std_idx=e_idx, y_wt=wt,
                                        wt_thresh=wt_thresh,
                                        cdf_thresh=cdf_thresh))
    want = oracle.gauss_kde_dict_1(pdfdict, np.asarray(y_idx),
                                   np.asarray(e_idx), wt,
                                   wt_thresh=wt_thresh,
                                   cdf_thresh=cdf_thresh)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-12)


def test_gauss_kde_dict_edge_kernels(pdfdict):
    """Kernels overhanging the grid edge are renormalized (pdf.py:610-620)."""
    y_idx = np.array([0, 2, pdfdict.Ngrid - 1, pdfdict.Ngrid - 3])
    e_idx = np.array([49, 49, 49, 49])  # widest kernel in the dict
    wt = np.ones(4)
    got = np.asarray(kde.gauss_kde_dict(pdfdict, y_idx=y_idx,
                                        y_std_idx=e_idx, y_wt=wt))
    want = oracle.gauss_kde_dict_1(pdfdict, y_idx, e_idx, wt)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-12)
    # Each retained kernel contributes exactly its weight.
    np.testing.assert_allclose(got.sum(), 4.0, rtol=RTOL)


def test_batched_weights_match_loop(pdfdict):
    """(Nobj, Ny) weight batches equal per-object calls."""
    rng = np.random.default_rng(13)
    y, y_std, _ = make_labels(rng, n=30)
    y_idx, e_idx = pdfdict.fit(y, y_std)
    wts = rng.uniform(0.0, 1.0, (5, 30)) ** 3
    got = np.asarray(kde.gauss_kde_dict(pdfdict, y_idx=y_idx,
                                        y_std_idx=e_idx, y_wt=wts))
    for k in range(5):
        want = oracle.gauss_kde_dict_1(pdfdict, np.asarray(y_idx),
                                       np.asarray(e_idx), wts[k])
        np.testing.assert_allclose(got[k], want, rtol=RTOL, atol=1e-12)


def test_threshold_weights_relative():
    wts = np.array([[1.0, 0.5, 1e-5, 0.0], [0.1, 0.2, 0.3, 0.4]])
    out = np.asarray(kde.threshold_weights(wts, wt_thresh=1e-3))
    np.testing.assert_array_equal(out[0], [1.0, 0.5, 0.0, 0.0])
    np.testing.assert_array_equal(out[1], wts[1])
