"""API-surface parity checks against the reference's public names."""

import numpy as np


def test_fitting_facade_exports_all_fitters():
    # Reference fitting.py:25-30 re-exports exactly these four.
    from frankenz_tpu import fitting

    for name in ("BruteForce", "NearestNeighbors", "SelfOrganizingMap",
                 "GrowingNeuralGas"):
        assert hasattr(fitting, name)


def test_package_root():
    import frankenz_tpu

    assert frankenz_tpu.__version__
    for sub in ("ops", "models", "fitting", "samplers", "sim", "parallel",
                "utils", "plotting", "config"):
        assert hasattr(frankenz_tpu, sub)


def test_pdf_layer_names():
    # Reference pdf.py __all__ (pdf.py:21-24).
    from frankenz_tpu import ops

    for name in ("loglike", "logprob", "gaussian", "gaussian_bin",
                 "gauss_kde", "gauss_kde_dict", "magnitude",
                 "inv_magnitude", "luptitude", "inv_luptitude", "PDFDict",
                 "pdfs_resample", "pdfs_summarize"):
        assert hasattr(ops, name)


def test_networks_names():
    # Reference networks.py __all__ minus the dangling lprob_train
    # (networks.py:33-35 — documented, not reproduced).
    from frankenz_tpu.models import networks

    for name in ("SelfOrganizingMap", "GrowingNeuralGas", "_Network",
                 "learn_linear", "learn_geometric", "learn_harmonic",
                 "neighbor_gauss", "neighbor_lorentz"):
        assert hasattr(networks, name)
    assert not hasattr(networks, "lprob_train")


def test_samplers_and_sim_names():
    from frankenz_tpu import samplers, sim

    for name in ("loglike_nz", "population_sampler",
                 "hierarchical_sampler"):
        assert hasattr(samplers, name)
    # Reference sampler class surface (samplers.py:83-535): reset,
    # results, run_mcmc, AND the sample generator.
    for cls in (samplers.population_sampler,
                samplers.hierarchical_sampler):
        for meth in ("reset", "results", "run_mcmc", "sample"):
            assert hasattr(cls, meth), (cls, meth)
    # Reference simulate.py __all__ (simulate.py:22-23).
    for name in ("mag_err", "draw_mag", "draw_type_given_mag",
                 "draw_redshift_given_type_mag", "draw_ztm", "MockSurvey"):
        assert hasattr(sim, name)
    for name in ("pmag", "bpz_pt_m", "bpz_pz_tm", "madau_teff"):
        assert hasattr(sim, name)


def test_cdf_threshold_quirk_replicated():
    """The reference's CDF rule always drops the single largest weight
    (pdf.py:512-516) — replicated, not 'fixed' (SURVEY.md section 2.3)."""
    from frankenz_tpu.ops import threshold_weights

    wts = np.array([0.05, 0.2, 0.05, 0.7])
    out = np.asarray(threshold_weights(wts, wt_thresh=None,
                                       cdf_thresh=2e-4))
    assert out[3] == 0.0  # largest weight dropped (cdf == 1 > 1 - eps)
    assert out[1] == 0.2  # others retained


def test_saved_fit_state_names():
    """Every fitter carries the reference's saved-fit attribute set."""
    from frankenz_tpu.fitting import (BruteForce, NearestNeighbors,
                                      SelfOrganizingMap)

    rng = np.random.default_rng(0)
    m = rng.uniform(1, 10, (20, 3))
    attrs = ("fit_lnprior", "fit_lnlike", "fit_lnprob", "fit_Ndim",
             "fit_chi2", "fit_scale", "fit_scale_err")
    for cls in (BruteForce, SelfOrganizingMap):
        obj = cls(m, 0.1 * m, np.ones_like(m))
        for a in attrs:
            assert hasattr(obj, a), (cls, a)
    nn = NearestNeighbors(m, 0.1 * m, np.ones_like(m), K=2, verbose=False)
    for a in attrs + ("neighbors", "Nneighbors"):
        assert hasattr(nn, a)
