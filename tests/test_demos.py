"""Demo scripts as end-to-end integration tests (tiny sizes, CPU)."""

import os
import sys

import numpy as np
import pytest

DEMOS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "demos")
sys.path.insert(0, DEMOS)


@pytest.fixture(scope="module")
def outdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("demo_output"))


@pytest.fixture(scope="module")
def demo1(outdir):
    import demo1_mock_data

    data, survey = demo1_mock_data.main(nobj=400, out=outdir, plot=False,
                                        nz=100)
    return outdir, data, survey


def test_demo1(demo1):
    outdir, data, survey = demo1
    assert os.path.exists(os.path.join(outdir, "mock_sdss_cww_bpz.npz"))
    mock = np.load(os.path.join(outdir, "mock_sdss_cww_bpz.npz"))
    assert mock["models"].shape == (100 * 8, 5)
    assert np.isfinite(mock["models"]).all()


def test_demo2(demo1):
    import demo2_photometric_inference

    outdir = demo1[0]
    results = demo2_photometric_inference.main(out=outdir, nfit=150,
                                               plot=False)
    assert set(results) == {"mag", "color", "color+bpz"}
    for pdfs in results.values():
        assert pdfs.shape == (150, 701)
        np.testing.assert_allclose(pdfs.sum(axis=1), 1.0, atol=1e-3)


def test_demo3(demo1):
    import demo3_photometric_pdfs

    outdir = demo1[0]
    pdfs, s = demo3_photometric_pdfs.main(out=outdir, nfit=200, plot=False)
    assert pdfs.shape[0] == 200
    assert np.isfinite(np.asarray(s.median.point)).all()


def test_demo4(demo1):
    import demo4_posterior_approximations

    outdir = demo1[0]
    results = demo4_posterior_approximations.main(out=outdir, nfit=100,
                                                  plot=False)
    assert set(results) == {"bruteforce", "kmcknn", "som nodes"}


def test_demo5(tmp_path):
    import demo5_population_inference

    s = demo5_population_inference.main(out=str(tmp_path), nobs=200,
                                        niter=10, thin=50, nchains=1,
                                        plot=False)
    samples, lnps = s.results
    assert samples.shape == (10, 60)


def test_demo6(tmp_path):
    import demo6_hierarchical_inference

    import warnings

    with warnings.catch_warnings():
        # The reference-comparison arm must actually compare: an
        # oversized burn-in used to empty the slice (mean-of-empty
        # RuntimeWarning) and make the demo's self-check vacuous.
        warnings.simplefilter("error", RuntimeWarning)
        s = demo6_hierarchical_inference.main(out=str(tmp_path), nobs=200,
                                              niter=20, plot=False)
    samples, _ = s.results
    assert len(samples) == 40  # 2 chains interleaved
