"""End-to-end BruteForce fitter tests vs an oracle pipeline."""

import numpy as np
import pytest
from scipy.special import logsumexp

import _oracle as oracle
from frankenz_tpu.models import BruteForce
from frankenz_tpu.ops import PDFDict

RTOL = 1e-5


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(7)
    nmodel, nobj, nfilt = 150, 40, 5
    zgrid = rng.uniform(0, 3, nmodel)
    zerr = np.full(nmodel, 0.1)
    models = rng.uniform(1, 10, (nmodel, nfilt))
    models_err = 0.1 * models
    models_mask = np.ones_like(models)
    truth = rng.integers(0, nmodel, nobj)
    data = models[truth] + rng.normal(0, 0.3, (nobj, nfilt))
    data_err = np.full((nobj, nfilt), 0.3)
    data_mask = np.ones_like(data)
    return dict(models=models, models_err=models_err,
                models_mask=models_mask, data=data, data_err=data_err,
                data_mask=data_mask, zgrid=zgrid, zerr=zerr, truth=truth)


def oracle_pdfs(p, grid, wt_thresh=1e-3):
    """Reference-style pipeline: per-object logprob -> weights -> KDE."""
    lnl, ndim, chi2 = oracle.loglike(p["data"], p["data_err"],
                                     p["data_mask"], p["models"],
                                     p["models_err"], p["models_mask"])
    pdfs, lmaps, levids = [], [], []
    for row in lnl:
        lmap, levid = row.max(), logsumexp(row)
        wt = np.exp(row - levid)
        pdf = oracle.gauss_kde_1(p["zgrid"], p["zerr"], grid, wt,
                                 wt_thresh=wt_thresh)
        pdfs.append(pdf / pdf.sum())
        lmaps.append(lmap)
        levids.append(levid)
    return np.array(pdfs), np.array(lmaps), np.array(levids), lnl


def test_fit_then_predict_matches_oracle(problem):
    grid = np.linspace(0, 3, 301)
    bf = BruteForce(problem["models"], problem["models_err"],
                    problem["models_mask"])
    bf.fit(problem["data"], problem["data_err"], problem["data_mask"],
           verbose=False)
    pdfs, (lmap, levid) = bf.predict(problem["zgrid"], problem["zerr"],
                                     label_grid=grid, return_gof=True,
                                     verbose=False)
    want_pdfs, want_lmap, want_levid, want_lnl = oracle_pdfs(problem, grid)
    np.testing.assert_allclose(bf.fit_lnprob, want_lnl, rtol=1e-4)
    np.testing.assert_allclose(lmap, want_lmap, rtol=1e-4)
    np.testing.assert_allclose(levid, want_levid, rtol=1e-4)
    np.testing.assert_allclose(pdfs, want_pdfs, rtol=5e-3, atol=1e-6)


def test_fused_fit_predict_matches_two_step(problem):
    grid = np.linspace(0, 3, 301)
    bf = BruteForce(problem["models"], problem["models_err"],
                    problem["models_mask"])
    bf.fit(problem["data"], problem["data_err"], problem["data_mask"],
           verbose=False)
    two_step = bf.predict(problem["zgrid"], problem["zerr"],
                          label_grid=grid, verbose=False)
    fused = bf.fit_predict(problem["data"], problem["data_err"],
                           problem["data_mask"], problem["zgrid"],
                           problem["zerr"], label_grid=grid, verbose=False)
    np.testing.assert_allclose(fused, two_step, rtol=1e-4, atol=1e-7)


def test_fit_predict_with_dict_matches_oracle(problem):
    grid = np.linspace(0, 3, 301)
    pd = PDFDict(grid, np.linspace(0.02, 0.3, 60))
    bf = BruteForce(problem["models"], problem["models_err"],
                    problem["models_mask"])
    pdfs = bf.fit_predict(problem["data"], problem["data_err"],
                          problem["data_mask"], problem["zgrid"],
                          problem["zerr"], label_dict=pd, verbose=False)
    # Oracle: quantized dict KDE on exact float64 weights.
    lnl, _, _ = oracle.loglike(problem["data"], problem["data_err"],
                               problem["data_mask"], problem["models"],
                               problem["models_err"],
                               problem["models_mask"])
    yi, ei = pd.fit(problem["zgrid"], problem["zerr"])
    for k in (0, 7, 23):
        wt = np.exp(lnl[k] - logsumexp(lnl[k]))
        want = oracle.gauss_kde_dict_1(pd, np.asarray(yi), np.asarray(ei),
                                       wt)
        want = want / want.sum()
        np.testing.assert_allclose(pdfs[k], want, rtol=5e-3, atol=1e-6)


def test_save_fits_and_batching(problem):
    """Odd batch sizes (padding) don't change results; save_fits stores."""
    grid = np.linspace(0, 3, 301)
    bf = BruteForce(problem["models"], problem["models_err"],
                    problem["models_mask"])
    a = bf.fit_predict(problem["data"], problem["data_err"],
                       problem["data_mask"], problem["zgrid"],
                       problem["zerr"], label_grid=grid, verbose=False,
                       save_fits=True, batch_size=17)
    assert bf.fit_lnprob.shape == (40, 150)
    b = BruteForce(problem["models"], problem["models_err"],
                   problem["models_mask"]).fit_predict(
        problem["data"], problem["data_err"], problem["data_mask"],
        problem["zgrid"], problem["zerr"], label_grid=grid, verbose=False,
        batch_size=64)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_custom_lprob_func(problem):
    """The lprob plugin hook: add a per-model prior (demo-2 pattern)."""
    import jax.numpy as jnp

    from frankenz_tpu.ops import logprob

    prior = np.linspace(0.0, 2.0, 150)

    def lprob_with_prior(d, de, dm, m, me, mm):
        res = logprob(d, de, dm, m, me, mm)
        lnprior = jnp.broadcast_to(jnp.asarray(prior), res.lnlike.shape)
        return (lnprior, res.lnlike, res.lnlike + lnprior, res.ndim,
                res.chi2)

    grid = np.linspace(0, 3, 301)
    bf = BruteForce(problem["models"], problem["models_err"],
                    problem["models_mask"])
    bf.fit(problem["data"], problem["data_err"], problem["data_mask"],
           lprob_func=lprob_with_prior, verbose=False)
    np.testing.assert_allclose(bf.fit_lnprob, bf.fit_lnlike + prior,
                               rtol=1e-5)


def test_photoz_recovery(problem):
    """Statistical check: point estimates recover the true redshifts."""
    from frankenz_tpu.ops import pdfs_summarize

    grid = np.linspace(0, 3, 301)
    bf = BruteForce(problem["models"], problem["models_err"],
                    problem["models_mask"])
    pdfs = bf.fit_predict(problem["data"], problem["data_err"],
                          problem["data_mask"], problem["zgrid"],
                          problem["zerr"], label_grid=grid, verbose=False)
    s = pdfs_summarize(pdfs, grid)
    ztrue = problem["zgrid"][problem["truth"]]
    zhat = np.asarray(s.median.point)
    assert np.std((zhat - ztrue) / (1 + ztrue)) < 0.2


def test_fit_dtype_float64_storage():
    """fit(fit_dtype=float64) restores the reference's saved-fit storage
    precision contract (bruteforce.py:183-189; VERDICT round-2 missing
    point 5 — float32 remains the memory-halving default)."""
    rng = np.random.default_rng(0)
    m = rng.uniform(1, 10, (30, 4))
    d = m[:6] + rng.normal(0, 0.2, (6, 4))
    bf = BruteForce(m, 0.05 * m, np.ones_like(m))
    bf.fit(d, np.full_like(d, 0.2), np.ones_like(d), verbose=False,
           fit_dtype=np.float64)
    assert bf.fit_lnprob.dtype == np.float64
    assert bf.fit_chi2.dtype == np.float64
    bf32 = BruteForce(m, 0.05 * m, np.ones_like(m))
    bf32.fit(d, np.full_like(d, 0.2), np.ones_like(d), verbose=False)
    assert bf32.fit_lnprob.dtype == np.float32
    np.testing.assert_allclose(bf.fit_lnprob, bf32.fit_lnprob, rtol=1e-6)


def test_wide_grid_auto_dispatch_streams_xla(problem, monkeypatch):
    """Wide serving grids auto-route fit_predict to the streaming XLA
    dense stack (docs/MXU_NOTE.md section 7); results must match the
    oracle and the materializing use_fused=False path, and the batch
    default must come from default_xla_batch_size."""
    from frankenz_tpu.models import bruteforce as bf_mod

    grid = np.linspace(0, 3, 301)  # Gp = 384 >= patched ceiling
    monkeypatch.setattr(bf_mod, "_WIDE_GRID_XLA_GP", 256)
    monkeypatch.setattr(bf_mod._fused, "pallas_supported", lambda: True)
    routed = {}
    orig = bf_mod.BruteForce._fit_predict_xla_stream

    def spy(self, *a, **k):
        routed["stream"] = True
        routed["batch"] = a[7]
        return orig(self, *a, **k)

    monkeypatch.setattr(bf_mod.BruteForce, "_fit_predict_xla_stream", spy)
    bf = BruteForce(problem["models"], problem["models_err"],
                    problem["models_mask"])
    pdfs, (lmap, levid) = bf.fit_predict(
        problem["data"], problem["data_err"], problem["data_mask"],
        problem["zgrid"], problem["zerr"], label_grid=grid,
        return_gof=True, verbose=False)
    assert routed.get("stream")
    assert routed["batch"] == bf_mod.default_xla_batch_size(bf.NMODEL)
    want_pdfs, want_lmap, want_levid, _ = oracle_pdfs(problem, grid)
    np.testing.assert_allclose(lmap, want_lmap, rtol=1e-4)
    np.testing.assert_allclose(levid, want_levid, rtol=1e-4)
    np.testing.assert_allclose(pdfs, want_pdfs, rtol=5e-3, atol=1e-6)
    # and against the materializing XLA path: same composition, only
    # jit fusion boundaries differ.
    pdfs_m, (lmap_m, levid_m) = bf.fit_predict(
        problem["data"], problem["data_err"], problem["data_mask"],
        problem["zgrid"], problem["zerr"], label_grid=grid,
        return_gof=True, use_fused=False, verbose=False)
    np.testing.assert_allclose(lmap, lmap_m, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(levid, levid_m, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(pdfs, pdfs_m, rtol=1e-5, atol=1e-7)


def test_wide_grid_dispatch_skips_free_scale_and_narrow(problem,
                                                        monkeypatch):
    """free_scale configs and narrow grids must keep the fused kernel
    even when the grid passes the width ceiling."""
    from frankenz_tpu.models import bruteforce as bf_mod

    assert not bf_mod._wide_grid_xla(4001, {"free_scale": True})
    assert bf_mod._wide_grid_xla(4001, {})      # Gp=4096 >= 2048
    assert not bf_mod._wide_grid_xla(301, {})   # Gp=384 < 2048
    monkeypatch.setattr(bf_mod, "_WIDE_GRID_XLA_GP", 256)
    assert bf_mod._wide_grid_xla(301, {})       # Gp=384 >= 256
    assert not bf_mod._wide_grid_xla(120, {})   # Gp=128 < 256
    assert not bf_mod._wide_grid_xla(2047, {"free_scale": True})


def test_wide_grid_stream_cdf_thresh_matches_xla(problem, monkeypatch):
    """cdf_thresh selection runs exactly inside the streaming step (the
    XLA sort) — no fused fallback involved."""
    from frankenz_tpu.models import bruteforce as bf_mod

    grid = np.linspace(0, 3, 301)
    monkeypatch.setattr(bf_mod, "_WIDE_GRID_XLA_GP", 256)
    monkeypatch.setattr(bf_mod._fused, "pallas_supported", lambda: True)
    bf = BruteForce(problem["models"], problem["models_err"],
                    problem["models_mask"])
    kw = dict(label_grid=grid, return_gof=True, verbose=False,
              wt_thresh=None, cdf_thresh=2e-4)
    pdfs, (lmap, levid) = bf.fit_predict(
        problem["data"], problem["data_err"], problem["data_mask"],
        problem["zgrid"], problem["zerr"], **kw)
    pdfs_m, (lmap_m, levid_m) = bf.fit_predict(
        problem["data"], problem["data_err"], problem["data_mask"],
        problem["zgrid"], problem["zerr"], use_fused=False, **kw)
    np.testing.assert_allclose(lmap, lmap_m, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(pdfs, pdfs_m, rtol=1e-5, atol=1e-7)


def test_stream_drain_budget_preserves_results(problem, monkeypatch):
    """Both streaming paths drain pending device blocks past
    _STREAM_PENDING_BYTES (HBM residency bound at 1M x wide-grid
    scale); a tiny budget forcing a drain every batch must not change
    any result."""
    from frankenz_tpu.models import bruteforce as bf_mod

    grid = np.linspace(0, 3, 301)
    bf = BruteForce(problem["models"], problem["models_err"],
                    problem["models_mask"])
    kw = dict(label_grid=grid, return_gof=True, verbose=False,
              batch_size=16)
    base_f = bf.fit_predict(problem["data"], problem["data_err"],
                            problem["data_mask"], problem["zgrid"],
                            problem["zerr"], use_fused=True, **kw)
    monkeypatch.setattr(bf_mod, "_STREAM_PENDING_BYTES", 1)
    drained_f = bf.fit_predict(problem["data"], problem["data_err"],
                               problem["data_mask"], problem["zgrid"],
                               problem["zerr"], use_fused=True, **kw)
    for a, b in zip(drained_f[0:1] + drained_f[1], base_f[0:1] + base_f[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # XLA stream path under the same forced budget
    monkeypatch.setattr(bf_mod, "_WIDE_GRID_XLA_GP", 256)
    monkeypatch.setattr(bf_mod._fused, "pallas_supported", lambda: True)
    base_x = bf._fit_predict_xla_stream(
        problem["data"], problem["data_err"], problem["data_mask"],
        np.asarray(bf._kernel_G(problem["zgrid"], problem["zerr"], None,
                                grid)[0]),
        {}, 1e-3, None, 16, True, False)
    monkeypatch.setattr(bf_mod, "_STREAM_PENDING_BYTES", 1 << 40)
    full_x = bf._fit_predict_xla_stream(
        problem["data"], problem["data_err"], problem["data_mask"],
        np.asarray(bf._kernel_G(problem["zgrid"], problem["zerr"], None,
                                grid)[0]),
        {}, 1e-3, None, 16, True, False)
    for a, b in zip(base_x[0:1] + base_x[1], full_x[0:1] + full_x[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_mask_kwarg_for_device_arrays(problem):
    """Device-array masks skip host auto-detection (no relay readback);
    the explicit ctor kwarg restores the fullmask fast path and its
    results match the host-detected construction exactly."""
    import jax.numpy as jnp

    host = BruteForce(problem["models"], problem["models_err"],
                      problem["models_mask"])
    assert host._full_mask is True
    dev = BruteForce(jnp.asarray(problem["models"]),
                     jnp.asarray(problem["models_err"]),
                     jnp.asarray(problem["models_mask"]))
    assert dev._full_mask is False  # documented: no device readback
    dev_kw = BruteForce(jnp.asarray(problem["models"]),
                        jnp.asarray(problem["models_err"]),
                        jnp.asarray(problem["models_mask"]),
                        full_mask=True)
    assert dev_kw._full_mask is True
    kw = dict(label_grid=np.linspace(0, 3, 101), verbose=False,
              use_fused=True)
    a = host.fit_predict(problem["data"], problem["data_err"],
                         problem["data_mask"], problem["zgrid"],
                         problem["zerr"], **kw)
    b = dev_kw.fit_predict(problem["data"], problem["data_err"],
                           problem["data_mask"], problem["zgrid"],
                           problem["zerr"], **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
