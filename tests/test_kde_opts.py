"""kde_args/kde_kwargs plumbing through fitter predict paths.

Reference forwards ``*kde_args, **kde_kwargs`` into `gauss_kde` /
`gauss_kde_dict` from every fitter (bruteforce.py:363-369,
networks.py:484-495) — `sig_thresh` (and positional `dx`) overrides must
reach the kernel construction, not just the thresholds.
"""

import numpy as np
import pytest
from scipy.special import logsumexp

import _oracle as oracle
from frankenz_tpu.models import (BruteForce, NearestNeighbors,
                                 SelfOrganizingMap)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(17)
    nmodel, nobj, nfilt = 120, 25, 4
    zgrid = rng.uniform(0, 3, nmodel)
    zerr = np.full(nmodel, 0.2)  # wide kernels: sig_thresh visibly bites
    models = rng.uniform(1, 10, (nmodel, nfilt))
    models_err = 0.1 * models
    models_mask = np.ones_like(models)
    truth = rng.integers(0, nmodel, nobj)
    data = models[truth] + rng.normal(0, 0.3, (nobj, nfilt))
    data_err = np.full((nobj, nfilt), 0.3)
    data_mask = np.ones_like(data)
    return dict(models=models, models_err=models_err,
                models_mask=models_mask, data=data, data_err=data_err,
                data_mask=data_mask, zgrid=zgrid, zerr=zerr)


def _oracle_pdfs(p, grid, lnl, sig_thresh):
    pdfs = []
    for row in lnl:
        wt = np.exp(row - logsumexp(row))
        pdf = oracle.gauss_kde_1(p["zgrid"], p["zerr"], grid, wt,
                                 sig_thresh=sig_thresh)
        pdfs.append(pdf / pdf.sum())
    return np.array(pdfs)


def test_bruteforce_sig_thresh_reaches_kernels(problem):
    grid = np.linspace(0, 3, 201)
    bf = BruteForce(problem["models"], problem["models_err"],
                    problem["models_mask"])
    bf.fit(problem["data"], problem["data_err"], problem["data_mask"],
           verbose=False)
    default = bf.predict(problem["zgrid"], problem["zerr"],
                         label_grid=grid, verbose=False)
    narrow = bf.predict(problem["zgrid"], problem["zerr"], label_grid=grid,
                        kde_kwargs={"sig_thresh": 1.0}, verbose=False)
    assert np.abs(default - narrow).max() > 1e-4  # override took effect
    want = _oracle_pdfs(problem, grid, np.asarray(bf.fit_lnprob, float),
                        sig_thresh=1.0)
    np.testing.assert_allclose(narrow, want, rtol=1e-4, atol=1e-7)
    # fit_predict path honors the same override.
    fused = bf.fit_predict(problem["data"], problem["data_err"],
                           problem["data_mask"], problem["zgrid"],
                           problem["zerr"], label_grid=grid,
                           kde_kwargs={"sig_thresh": 1.0}, verbose=False,
                           use_fused=False)
    np.testing.assert_allclose(fused, narrow, rtol=1e-4, atol=1e-7)


def test_bruteforce_positional_dx(problem):
    grid = np.linspace(0, 3, 201)
    bf = BruteForce(problem["models"], problem["models_err"],
                    problem["models_mask"])
    bf.fit(problem["data"], problem["data_err"], problem["data_mask"],
           verbose=False)
    dx = float(grid[1] - grid[0])
    via_args = bf.predict(problem["zgrid"], problem["zerr"],
                          label_grid=grid, kde_args=(dx,), verbose=False)
    default = bf.predict(problem["zgrid"], problem["zerr"],
                         label_grid=grid, verbose=False)
    np.testing.assert_allclose(via_args, default, rtol=1e-6)


def test_knn_sig_thresh_changes_pdfs(problem):
    grid = np.linspace(0, 3, 201)
    nn = NearestNeighbors(problem["models"], problem["models_err"],
                          problem["models_mask"], K=4, seed=0,
                          verbose=False)
    nn.fit(problem["data"], problem["data_err"], problem["data_mask"],
           k=10, verbose=False, batch_size=32)
    default = nn.predict(problem["zgrid"], problem["zerr"],
                         label_grid=grid, verbose=False, batch_size=32)
    narrow = nn.predict(problem["zgrid"], problem["zerr"], label_grid=grid,
                        kde_kwargs={"sig_thresh": 1.0}, verbose=False,
                        batch_size=32)
    assert np.abs(default - narrow).max() > 1e-4


def test_network_sig_thresh_changes_node_pdfs(problem):
    som = SelfOrganizingMap(problem["models"], problem["models_err"],
                            problem["models_mask"])
    som.train_network(nside=3, nproj=2, niter=40, nbatch=10, seed=2,
                      verbose=False)
    som.populate_network(verbose=False, batch_size=64)
    grid = np.linspace(0, 3, 201)
    default = som.get_pdfs(problem["zgrid"], problem["zerr"],
                           label_grid=grid, verbose=False, batch_size=16)
    narrow = som.get_pdfs(problem["zgrid"], problem["zerr"],
                          label_grid=grid,
                          kde_kwargs={"sig_thresh": 1.0},
                          verbose=False, batch_size=16)
    assert np.abs(default - narrow).max() > 1e-6


def test_network_node_pdfs_threshold_members(problem):
    """Node PDFs forward kde_kwargs thresholds to the member-weight stack
    (reference networks.py:484-495), lmap/levid staying full-member."""
    som = SelfOrganizingMap(problem["models"], problem["models_err"],
                            problem["models_mask"])
    som.train_network(nside=3, nproj=2, niter=40, nbatch=10, seed=2,
                      verbose=False)
    som.populate_network(verbose=False, batch_size=64)
    grid = np.linspace(0, 3, 201)
    default = som.get_pdfs(problem["zgrid"], problem["zerr"],
                           label_grid=grid, verbose=False, batch_size=16)
    strong = som.get_pdfs(problem["zgrid"], problem["zerr"],
                          label_grid=grid,
                          kde_kwargs={"wt_thresh": 0.9},
                          verbose=False, batch_size=16)
    assert np.abs(default - strong).max() > 1e-8

    # Oracle parity for the fullest node under both thresholds.
    i = int(np.argmax(som.nodes_Nmatch))
    n = som.nodes_Nmatch[i]
    idxs = som.nodes_idxs[i, :n]
    lwt = som.nodes_logwts[i, :n].astype(float)
    levid = logsumexp(lwt)
    wt = np.exp(lwt - levid)
    for got, wt_thresh in ((default[i], 1e-3), (strong[i], 0.9)):
        pdf = oracle.gauss_kde_1(problem["zgrid"][idxs],
                                 problem["zerr"][idxs], grid, wt,
                                 wt_thresh=wt_thresh)
        pdf = pdf / pdf.sum() * np.exp(levid)
        np.testing.assert_allclose(got, pdf, rtol=1e-4, atol=1e-6)


def test_kde_args_two_positionals_raise():
    """Reference parity: gauss_kde(y, y_std, x, y_wt=wt, *kde_args)
    raises on a second positional (collision with y_wt) — so do we,
    instead of silently dropping it."""
    import pytest

    from frankenz_tpu.ops.kde import resolve_kde_opts

    resolve_kde_opts(kde_args=(0.01,))  # one positional (dx) is fine
    with pytest.raises(TypeError, match="y_wt"):
        resolve_kde_opts(kde_args=(0.01, None, 3.0))
