"""BruteForce.fit_summarize: on-device streaming summaries.

The summary columns that stream back must equal running the reference
workflow — fit_predict to materialized PDFs, then `pdfs_summarize` on
the host (pdf.py:899-1074) — and must be identical across the XLA,
fused-Pallas (interpret), and mesh-sharded execution paths and across
batch sizes (the MC uniforms are drawn per global row, not per batch).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frankenz_tpu.models import BruteForce
from frankenz_tpu.ops import pdfs_summarize
from frankenz_tpu.ops import summarize as summ


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(5)
    nmodel, nobj, nfilt = 120, 37, 5
    zgrid_m = rng.uniform(0, 3, nmodel)
    zerr_m = np.full(nmodel, 0.1)
    models = rng.uniform(1, 10, (nmodel, nfilt))
    truth = rng.integers(0, nmodel, nobj)
    data = models[truth] + rng.normal(0, 0.3, (nobj, nfilt))
    grid = np.linspace(0, 3, 151)
    return dict(models=models, models_err=0.1 * models,
                models_mask=np.ones_like(models), data=data,
                data_err=np.full((nobj, nfilt), 0.3),
                data_mask=np.ones_like(data), zgrid=zgrid_m, zerr=zerr_m,
                grid=grid)


def _fit(p):
    return BruteForce(p["models"], p["models_err"], p["models_mask"])


def _expected(p, seed=0):
    """Host-side reference: materialized PDFs + pdfs_summarize (+ the
    documented MC-uniform contract, reproduced independently)."""
    bf = _fit(p)
    pdfs, gof = bf.fit_predict(p["data"], p["data_err"], p["data_mask"],
                               p["zgrid"], p["zerr"],
                               label_grid=p["grid"], return_gof=True,
                               verbose=False, use_fused=False)
    s = pdfs_summarize(pdfs, p["grid"])
    ndata = len(pdfs)
    u = np.random.default_rng(seed).random(ndata).astype(np.float32)
    norm = pdfs / pdfs.sum(1, keepdims=True)
    mc = np.array([np.interp(u[i], np.cumsum(norm[i]), p["grid"])
                   for i in range(ndata)])
    return pdfs, gof, s, mc


def _assert_summary_matches(got, want, mc_want, rtol=2e-5, atol=2e-6):
    for est in ("mean", "median", "mode", "best"):
        g, w = getattr(got, est), getattr(want, est)
        for field in ("point", "std", "conf", "risk"):
            np.testing.assert_allclose(
                getattr(g, field), np.asarray(getattr(w, field)),
                rtol=rtol, atol=atol, err_msg=f"{est}.{field}")
    for field in ("low95", "low68", "high68", "high95"):
        np.testing.assert_allclose(
            getattr(got, field), np.asarray(getattr(want, field)),
            rtol=rtol, atol=atol, err_msg=field)
    np.testing.assert_allclose(got.mc, mc_want, rtol=1e-4, atol=1e-5)


def test_fit_summarize_matches_host_summary(problem):
    pdfs, gof, want, mc_want = _expected(problem)
    bf = _fit(problem)
    got, got_gof = bf.fit_summarize(
        problem["data"], problem["data_err"], problem["data_mask"],
        problem["zgrid"], problem["zerr"], label_grid=problem["grid"],
        verbose=False, use_fused=False)
    _assert_summary_matches(got, want, mc_want)
    np.testing.assert_allclose(got_gof[0], gof[0], rtol=1e-6)
    np.testing.assert_allclose(got_gof[1], gof[1], rtol=1e-6)
    # Summaries are (Nobj,) host arrays, never (Nobj, Ngrid).
    assert got.mean.point.shape == (len(problem["data"]),)


def test_fit_summarize_batch_size_invariant(problem):
    """The MC uniforms key off the global row index: chopping the
    catalog into different batch sizes must not change ANY column."""
    bf = _fit(problem)
    kw = dict(label_grid=problem["grid"], verbose=False, use_fused=False)
    a, _ = bf.fit_summarize(problem["data"], problem["data_err"],
                            problem["data_mask"], problem["zgrid"],
                            problem["zerr"], batch_size=8, **kw)
    b, _ = bf.fit_summarize(problem["data"], problem["data_err"],
                            problem["data_mask"], problem["zgrid"],
                            problem["zerr"], batch_size=37, **kw)
    for fa, fb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(fa, fb, rtol=1e-6, atol=1e-7)


def test_fit_summarize_fused_interpret(problem):
    """The fused Pallas path (interpret mode) feeds the same on-device
    summary step; PDFs differ from XLA only at threshold-flip level."""
    _, _, want, mc_want = _expected(problem)
    bf = _fit(problem)
    got, _ = bf.fit_summarize(
        problem["data"], problem["data_err"], problem["data_mask"],
        problem["zgrid"], problem["zerr"], label_grid=problem["grid"],
        verbose=False, use_fused=True)
    _assert_summary_matches(got, want, mc_want, rtol=2e-3, atol=2e-4)


def test_fit_summarize_mesh(problem):
    from frankenz_tpu.parallel import make_mesh

    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    _, _, want, mc_want = _expected(problem)
    bf = _fit(problem)
    got, _ = bf.fit_summarize(
        problem["data"], problem["data_err"], problem["data_mask"],
        problem["zgrid"], problem["zerr"], label_grid=problem["grid"],
        verbose=False, mesh=mesh)
    _assert_summary_matches(got, want, mc_want)


def test_summary_stream_step_no_retrace(problem):
    """i0 is a dynamic operand: streaming N batches must compile the
    summary step exactly once (the relay charges ~15 s per retrace)."""
    grid = jnp.linspace(0.0, 3.0, 61)
    kern_c = summ.loss_kernel_matrix(grid)
    u = jnp.asarray(np.random.default_rng(0).random(64), jnp.float32)
    pdfs = jnp.asarray(np.random.default_rng(1).random((16, 61)),
                       jnp.float32)
    before = summ.summary_stream_step._cache_size()
    for i0 in (0, 16, 48):
        summ.summary_stream_step(pdfs, grid, kern_c, u, i0)
    assert summ.summary_stream_step._cache_size() <= before + 1


def _assert_matches_host(fitter_summary, pdfs, grid, seed=0,
                         rtol=2e-5, atol=2e-6):
    """Shared check: streamed summary == host pdfs_summarize(pdfs) (+
    the documented MC-uniform contract)."""
    want = pdfs_summarize(pdfs, grid)
    ndata = len(pdfs)
    u = np.random.default_rng(seed).random(ndata).astype(np.float32)
    norm = pdfs / pdfs.sum(1, keepdims=True)
    mc = np.array([np.interp(u[i], np.cumsum(norm[i]), grid)
                   for i in range(ndata)])
    _assert_summary_matches(fitter_summary, want, mc, rtol=rtol, atol=atol)


def test_knn_fit_summarize(problem):
    from frankenz_tpu.models import NearestNeighbors

    nn = NearestNeighbors(problem["models"], problem["models_err"],
                          problem["models_mask"], K=3, seed=0,
                          verbose=False)
    kw = dict(label_grid=problem["grid"], verbose=False, k=10,
              rng=np.random.default_rng(9), batch_size=16)
    pdfs, gof = nn.fit_predict(problem["data"], problem["data_err"],
                               problem["data_mask"], problem["zgrid"],
                               problem["zerr"], return_gof=True, **kw)
    # Same MC-jitter stream for the second run.
    kw["rng"] = np.random.default_rng(9)
    got, got_gof = nn.fit_summarize(
        problem["data"], problem["data_err"], problem["data_mask"],
        problem["zgrid"], problem["zerr"], **kw)
    _assert_matches_host(got, pdfs, problem["grid"])
    np.testing.assert_allclose(got_gof[0], gof[0], rtol=1e-6)


def test_network_fit_summarize_both_paths(problem):
    from frankenz_tpu.models import SelfOrganizingMap

    som = SelfOrganizingMap(problem["models"], problem["models_err"],
                            problem["models_mask"])
    som.train_network(nside=3, nproj=2, niter=60, nbatch=20, seed=3,
                      verbose=False)
    som.populate_network(verbose=False)
    for nodes_only in (True, False):
        pdfs = som.fit_predict(problem["data"], problem["data_err"],
                               problem["data_mask"], problem["zgrid"],
                               problem["zerr"], label_grid=problem["grid"],
                               save_fits=False, nodes_only=nodes_only,
                               verbose=False)
        got, _ = som.fit_summarize(
            problem["data"], problem["data_err"], problem["data_mask"],
            problem["zgrid"], problem["zerr"], label_grid=problem["grid"],
            nodes_only=nodes_only, verbose=False)
        _assert_matches_host(got, pdfs, problem["grid"])


def test_fit_summarize_cdf_thresh_mode(problem):
    """wt_thresh=None routes through the cdf-mass selection; the
    streamed summary still matches the host pipeline."""
    bf = _fit(problem)
    kw = dict(label_grid=problem["grid"], verbose=False,
              wt_thresh=None, cdf_thresh=2e-4)
    pdfs = bf.fit_predict(problem["data"], problem["data_err"],
                          problem["data_mask"], problem["zgrid"],
                          problem["zerr"], **kw)
    got, _ = bf.fit_summarize(problem["data"], problem["data_err"],
                              problem["data_mask"], problem["zgrid"],
                              problem["zerr"], **kw)
    _assert_matches_host(got, pdfs, problem["grid"])


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(2)
    pdfs = rng.random((9, 41))
    grid = np.linspace(0, 3, 41)
    s = pdfs_summarize(pdfs, grid)
    cols = summ._pack_summary(s)
    assert cols.shape == (9, summ.SUMMARY_NCOLS)
    back = summ.unpack_summary(np.asarray(cols))
    for a, b in zip(jax.tree.leaves(s), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-6)
