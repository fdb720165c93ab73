"""Plotting/diagnostics compute tests (rendering disabled via plot=False,
plus one smoke test on the Agg backend)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from frankenz_tpu import plotting as fzplot
from frankenz_tpu.ops import PDFDict


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(8)
    nobj, ngrid = 200, 151
    grid = np.linspace(0, 3, ngrid)
    ztrue = rng.uniform(0.2, 2.8, nobj)
    zerr = np.full(nobj, 0.1)
    sig = 0.15
    pdfs = np.exp(-0.5 * ((grid[None, :] - ztrue[:, None]) / sig) ** 2)
    pdfs /= pdfs.sum(axis=1, keepdims=True)
    vdict = PDFDict(grid, np.linspace(0.02, 0.3, 40))
    return ztrue, zerr, pdfs, grid, vdict, sig


def test_input_vs_pdf_stack(setup):
    ztrue, zerr, pdfs, grid, vdict, _ = setup
    stack = fzplot.input_vs_pdf(ztrue, zerr, vdict, pdfs, grid, plot=False)
    assert stack.shape == (vdict.Ngrid, len(grid))
    # Total mass = number of stacked objects (each contributes weight 1).
    np.testing.assert_allclose(stack.sum(), len(ztrue), rtol=1e-3)
    # Mass concentrates on the diagonal (input == predicted).
    ridge = np.array([grid[np.argmax(row)] if row.max() > 0 else np.nan
                      for row in stack])
    sel = stack.max(axis=1) > 0.1 * stack.max()
    np.testing.assert_allclose(ridge[sel], vdict.grid[sel], atol=0.2)


def test_input_vs_dpdf_centered(setup):
    ztrue, zerr, pdfs, grid, vdict, sig = setup
    dgrid = np.linspace(-1, 1, 101)
    stack = fzplot.input_vs_dpdf(ztrue, zerr, vdict, pdfs, grid, ztrue,
                                 dgrid, plot=False)
    assert stack.shape == (vdict.Ngrid, 101)
    # Dispersion stack peaks at zero offset.
    marg = stack.sum(axis=0)
    assert abs(dgrid[np.argmax(marg)]) < 0.05


def test_cdf_coverage_uniform(setup):
    """Perfectly calibrated PDFs -> CDF draws ~ Uniform(0,1)."""
    ztrue, zerr, pdfs, grid, vdict, sig = setup
    # Draw "truths" from each PDF itself: exact coverage by construction.
    n = fzplot.cdf_vs_epdf(ztrue, np.full_like(ztrue, sig), pdfs, grid,
                           Nmc=200, seed=1, plot=False)
    assert n.shape == (50,)
    assert 0.5 < n.mean() < 1.5
    assert n.std() < 0.4  # roughly flat
    x, y = fzplot.cdf_vs_ecdf(ztrue, np.full_like(ztrue, sig), pdfs, grid,
                              Nmc=200, seed=2, plot=False)
    np.testing.assert_allclose(y, x, atol=0.05)


def test_cdf_coverage_detects_overconfidence(setup):
    """Overconfident (too-narrow) PDFs produce U-shaped coverage."""
    ztrue, zerr, pdfs, grid, vdict, sig = setup
    narrow = pdfs ** 4  # sharpen
    narrow /= narrow.sum(axis=1, keepdims=True)
    n = fzplot.cdf_vs_epdf(ztrue, np.full_like(ztrue, sig), narrow, grid,
                           Nmc=100, seed=3, plot=False)
    # Edge bins overloaded relative to center.
    assert n[[0, -1]].mean() > 1.5 * n[20:30].mean()


@pytest.fixture(scope="module")
def network(setup):
    from frankenz_tpu.models import SelfOrganizingMap

    rng = np.random.default_rng(5)
    models = rng.uniform(1, 10, (300, 4))
    som = SelfOrganizingMap(models, 0.05 * models, np.ones_like(models))
    som.train_network(nside=4, nproj=2, niter=50, nbatch=20, seed=1,
                      verbose=False)
    som.populate_network(verbose=False)
    return som, models


def test_plot2d_network_counts_and_estimates(network):
    som, models = network
    counts = fzplot.plot2d_network(som, counts="absolute", plot=False)
    np.testing.assert_array_equal(counts, som.nodes_Nmatch)
    wcounts = fzplot.plot2d_network(som, counts="weighted", plot=False)
    # Weighted counts sum to Nmodel (per-model weights are normalized).
    np.testing.assert_allclose(wcounts.sum(), som.NMODEL, rtol=1e-3)
    labels = models[:, 0]
    for est in ("mean", "median", "std", "mad"):
        vals = fzplot.plot2d_network(som, labels=labels, point_est=est,
                                     plot=False)
        assert vals.shape == (som.NNODE,)
    # Node label means track the node's own first-band value.
    vals = fzplot.plot2d_network(som, labels=labels, point_est="mean",
                                 plot=False)
    occ = som.nodes_Nmatch > 3
    corr = np.corrcoef(vals[occ], np.asarray(som.nodes)[occ, 0])[0, 1]
    assert corr > 0.7


def test_plot_node(network):
    som, models = network
    idx = int(np.argmax(som.nodes_Nmatch))
    node_model, mc = fzplot.plot_node(som, models, 0.05 * models, idx=idx,
                                      seed=4, plot=False)
    assert node_model.shape == (4,)
    assert mc.shape[1] == 4
    # Member photometry scatters around the node model.
    np.testing.assert_allclose(mc.mean(axis=0), node_model, rtol=0.5)


def test_rendering_smoke(setup):
    """One end-to-end render on the Agg backend."""
    import matplotlib.pyplot as plt

    ztrue, zerr, pdfs, grid, vdict, sig = setup
    plt.figure()
    fzplot.input_vs_pdf(ztrue[:50], zerr[:50], vdict, pdfs[:50], grid)
    plt.close("all")
    plt.figure()
    fzplot.cdf_vs_epdf(ztrue[:50], np.full(50, sig), pdfs[:50], grid,
                       Nmc=20, seed=0)
    plt.close("all")
