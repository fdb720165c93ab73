"""Differential tests against the ACTUAL reference implementation.

These import frankenz v0.3.5 from the read-only reference mount and
compare our outputs function-by-function on seeded float64 problems —
no hand-written oracle in the middle.  Skipped entirely when the mount
is absent (e.g. a standalone checkout of this repo).

Documented deviations asserted explicitly where they fire:
zero-overlap / 0-dof pairs are NaN in the reference and -inf here
(ops/likelihood.py).
"""

import os
import sys

import numpy as np
import pytest

_REF = "/root/reference"
if not os.path.isdir(os.path.join(_REF, "frankenz")):  # pragma: no cover
    pytest.skip("reference mount not available", allow_module_level=True)
if _REF not in sys.path:
    sys.path.insert(0, _REF)

rpdf = pytest.importorskip("frankenz.pdf")
rpriors = pytest.importorskip("frankenz.priors")
rred = pytest.importorskip("frankenz.reddening")
rsamp = pytest.importorskip("frankenz.samplers")

from frankenz_tpu import ops
from frankenz_tpu import plotting  # noqa: F401  (keeps lazy imports warm)
from frankenz_tpu.samplers import loglike_nz
from frankenz_tpu.sim import bpz_pt_m, bpz_pz_tm, madau_teff, pmag

RTOL, ATOL = 1e-6, 1e-10

# The REFERENCE uses long-deprecated NumPy/SciPy spellings (np.trapz,
# scipy.ndimage.filters); its warnings are not ours to fix.
pytestmark = pytest.mark.filterwarnings(
    "ignore::DeprecationWarning")


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(17)
    nobj, nmodel, nfilt = 12, 80, 5
    models = rng.uniform(1, 10, (nmodel, nfilt))
    models_err = 0.1 * models
    models_mask = np.ones((nmodel, nfilt))
    # ~15% masked cells on both sides, but always >= 2 common bands so
    # the dof stays positive for the dim-prior variants.
    models_mask[rng.uniform(size=models_mask.shape) < 0.15] = 0.0
    models_mask[:, :2] = 1.0
    data = models[rng.integers(0, nmodel, nobj)] + rng.normal(
        0, 0.3, (nobj, nfilt))
    data_err = np.full((nobj, nfilt), 0.3)
    data_mask = np.ones((nobj, nfilt))
    data_mask[rng.uniform(size=data_mask.shape) < 0.15] = 0.0
    data_mask[:, :2] = 1.0
    return data, data_err, data_mask, models, models_err, models_mask


def _ref_loglike_rows(d, de, dm, m, me, mm, **kw):
    """Reference loglike per object (it is one-datum-vs-all-models and
    mutates its inputs on cleaning — hand it copies)."""
    outs = [rpdf.loglike(d[i].copy(), de[i].copy(), dm[i].copy(),
                         m.copy(), me.copy(), mm.copy(), **kw)
            for i in range(len(d))]
    return [np.stack([o[j] for o in outs]) for j in range(len(outs[0]))]


def _compare_lnl(got, want):
    """NaN-aware: where the reference NaNs (0-dof / zero-overlap pairs),
    we return -inf by documented policy; everywhere else 1e-6."""
    got, want = np.asarray(got, float), np.asarray(want)
    bad = ~np.isfinite(want)
    assert (got[bad] == -np.inf).all()
    np.testing.assert_allclose(got[~bad], want[~bad], rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("dim_prior", [True, False])
@pytest.mark.parametrize("ignore_model_err", [True, False])
def test_loglike_fixed_scale(problem, dim_prior, ignore_model_err):
    d, de, dm, m, me, mm = problem
    want_lnl, want_ndim, want_chi2 = _ref_loglike_rows(
        d, de, dm, m, me, mm, free_scale=False,
        ignore_model_err=ignore_model_err, dim_prior=dim_prior)
    got = ops.loglike(d, de, dm, m, me, mm, free_scale=False,
                      ignore_model_err=ignore_model_err,
                      dim_prior=dim_prior)
    np.testing.assert_array_equal(np.asarray(got.ndim), want_ndim)
    np.testing.assert_allclose(np.asarray(got.chi2), want_chi2,
                               rtol=RTOL, atol=ATOL)
    _compare_lnl(got.lnlike, want_lnl)


@pytest.mark.parametrize("free_scale", [False, True])
def test_loglike_input_cleaning(problem, free_scale):
    """The sanitization rule (pdf.py:310-311): non-finite data, non-finite
    errors, and non-positive errors are treated as masked (value 0,
    sigma 1) — the reference mutates its inputs, ours is functional."""
    d, de, dm, m, me, mm = problem
    d, de, dm = d.copy(), de.copy(), dm.copy()
    d[0, 2], d[1, 3] = np.nan, np.inf
    de[2, 2], de[3, 3], de[4, 2] = 0.0, -1.0, np.nan
    want_lnl = _ref_loglike_rows(d, de, dm, m, me, mm,
                                 free_scale=free_scale, dim_prior=True)[0]
    got = ops.loglike(d, de, dm, m, me, mm, free_scale=free_scale,
                      dim_prior=True)
    _compare_lnl(got.lnlike, want_lnl)
    # and the inputs were not mutated
    assert not np.isfinite(d[0, 2]) and de[2, 2] == 0.0


@pytest.mark.parametrize("seed", range(10))
def test_loglike_fuzz_vs_reference(seed):
    """Randomized loglike differential: shapes, mask densities, data
    magnitudes, and the full option lattice drawn per seed — the regime
    holes (zero-overlap pairs, single-band rows, huge/tiny fluxes) that
    hand-written cases miss.  NaN cells (0-dof in the reference) assert
    the documented -inf policy via _compare_lnl."""
    rng = np.random.default_rng(52000 + seed)
    nobj = int(rng.integers(2, 7))
    nmodel = int(rng.integers(3, 41))
    nfilt = int(rng.integers(2, 9))
    mag = 10.0 ** rng.uniform(-4, 4)
    models = rng.uniform(0.1, 10.0, (nmodel, nfilt)) * mag
    models_err = rng.uniform(0.01, 0.5, (nmodel, nfilt)) * mag
    data = models[rng.integers(0, nmodel, nobj)] + rng.normal(
        0, 0.3 * mag, (nobj, nfilt))
    data_err = rng.uniform(0.05, 0.6, (nobj, nfilt)) * mag
    # mask density up to "almost everything masked" (exercises 0-dof)
    pmask = rng.uniform(0.0, 0.6)
    dm = (rng.uniform(size=(nobj, nfilt)) >= pmask).astype(float)
    mm = (rng.uniform(size=(nmodel, nfilt)) >= pmask).astype(float)
    free_scale = bool(rng.integers(0, 2))
    dim_prior = bool(rng.integers(0, 2))
    ime = bool(rng.integers(0, 2))

    kw = dict(free_scale=free_scale, dim_prior=dim_prior,
              ignore_model_err=ime)
    with np.errstate(all="ignore"):
        want = _ref_loglike_rows(data, data_err, dm, models, models_err, mm,
                                 **kw)
    got = ops.loglike(data, data_err, dm, models, models_err, mm, **kw)
    np.testing.assert_array_equal(np.asarray(got.ndim), want[1])
    fin = np.isfinite(want[0])
    np.testing.assert_allclose(np.asarray(got.chi2)[fin], want[2][fin],
                               rtol=1e-5, atol=1e-8)
    _compare_lnl(got.lnlike, want[0])


@pytest.mark.parametrize("ignore_model_err", [True, False])
def test_loglike_free_scale(problem, ignore_model_err):
    d, de, dm, m, me, mm = problem
    want = _ref_loglike_rows(
        d, de, dm, m, me, mm, free_scale=True,
        ignore_model_err=ignore_model_err, dim_prior=True,
        return_scale=True)
    want_lnl, want_ndim, want_chi2, want_s, want_serr = want
    got = ops.loglike(d, de, dm, m, me, mm, free_scale=True,
                      ignore_model_err=ignore_model_err, dim_prior=True,
                      return_scale=True)
    np.testing.assert_array_equal(np.asarray(got.ndim), want_ndim)
    fin = np.isfinite(want_lnl)
    np.testing.assert_allclose(np.asarray(got.chi2)[fin], want_chi2[fin],
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(got.scale)[fin], want_s[fin],
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(got.scale_err)[fin],
                               want_serr[fin], rtol=1e-5, atol=1e-8)
    _compare_lnl(got.lnlike, want_lnl)


def test_gauss_kde(problem):
    rng = np.random.default_rng(3)
    y = rng.uniform(0, 3, 200)
    y_std = rng.uniform(0.05, 0.3, 200)
    y_wt = rng.uniform(size=200)
    x = np.linspace(0, 3, 301)
    want = rpdf.gauss_kde(y, y_std, x, y_wt=y_wt, wt_thresh=1e-3)
    got = np.asarray(ops.gauss_kde(y, y_std, x, y_wt=y_wt, wt_thresh=1e-3))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-12)
    # cdf-mass thresholding variant (incl. the reference's
    # drop-the-largest-weight discretization quirk).
    want = rpdf.gauss_kde(y, y_std, x, y_wt=y_wt, wt_thresh=None,
                          cdf_thresh=2e-4)
    got = np.asarray(ops.gauss_kde(y, y_std, x, y_wt=y_wt, wt_thresh=None,
                                   cdf_thresh=2e-4))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-12)


def test_pdfdict_and_gauss_kde_dict():
    # Kernels kept interior to the grid: the REFERENCE's dictionary edge
    # normalization crashes outright (IndexError, pdf.py:617) once a
    # truncated kernel overhangs both grid edges — another latent
    # reference bug (cf. SURVEY.md 2.3); our edge behavior is covered by
    # the window-mask oracle in tests/_oracle.py instead.
    rng = np.random.default_rng(4)
    grid = np.linspace(0, 3, 301)
    sig = np.linspace(0.01, 0.12, 100)
    rd = rpdf.PDFDict(grid, sig)
    od = ops.PDFDict(grid, sig)
    y = rng.uniform(0.7, 2.3, 150)
    ys = rng.uniform(0.02, 0.11, 150)
    ri, rsi = rd.fit(y, ys)
    oi, osi = od.fit(y, ys)
    np.testing.assert_array_equal(np.asarray(oi), ri)
    np.testing.assert_array_equal(np.asarray(osi), rsi)
    wt = rng.uniform(size=150)
    want = rpdf.gauss_kde_dict(rd, y_idx=ri, y_std_idx=rsi, y_wt=wt)
    got = np.asarray(ops.gauss_kde_dict(od, y_idx=oi, y_std_idx=osi,
                                        y_wt=wt))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-12)


@pytest.mark.parametrize("seed", range(8))
def test_kde_and_summarize_fuzz_vs_reference(seed):
    """Randomized gauss_kde / gauss_kde_dict / pdfs_resample /
    pdfs_summarize differential: grid sizes and spans, kernel widths,
    weight sparsity, and the threshold-mode choice drawn per seed.
    Kernels are kept from overhanging BOTH grid edges — there the
    reference's dict edge normalization raises IndexError outright
    (pdf.py:617, documented bug)."""
    rng = np.random.default_rng(61000 + seed)
    ngrid = int(rng.integers(40, 400))
    span = 10.0 ** rng.uniform(-1, 1)
    x = np.linspace(0.0, span, ngrid)
    ny = int(rng.integers(5, 300))
    sig_max = span / rng.uniform(15.0, 60.0)
    y = rng.uniform(0.0, span, ny)
    y_std = rng.uniform(0.1 * sig_max, sig_max, ny)
    y_wt = rng.uniform(size=ny)
    y_wt[rng.uniform(size=ny) < 0.2] = 0.0  # sparse weights
    if rng.integers(0, 2):
        kw = dict(wt_thresh=10.0 ** rng.uniform(-5, -2))
    else:
        kw = dict(wt_thresh=None, cdf_thresh=10.0 ** rng.uniform(-5, -3))
    want = rpdf.gauss_kde(y, y_std, x, y_wt=y_wt, **kw)
    got = np.asarray(ops.gauss_kde(y, y_std, x, y_wt=y_wt, **kw))
    np.testing.assert_allclose(got, want, rtol=1e-6,
                               atol=1e-12 * max(1.0, want.max()))

    # dictionary variant on the same draw (interior-kernel regime)
    sig_dict = np.linspace(0.1 * sig_max, sig_max, int(rng.integers(8, 60)))
    rd = rpdf.PDFDict(x, sig_dict)
    od = ops.PDFDict(x, sig_dict)
    lo, hi = 5.5 * sig_max, span - 5.5 * sig_max
    yc = np.clip(y, lo, hi)
    ri, rsi = rd.fit(yc, y_std)
    oi, osi = od.fit(yc, y_std)
    np.testing.assert_array_equal(np.asarray(oi), ri)
    np.testing.assert_array_equal(np.asarray(osi), rsi)
    want = rpdf.gauss_kde_dict(rd, y_idx=ri, y_std_idx=rsi, y_wt=y_wt, **kw)
    got = np.asarray(ops.gauss_kde_dict(od, y_idx=oi, y_std_idx=osi,
                                        y_wt=y_wt, **kw))
    np.testing.assert_allclose(got, want, rtol=1e-6,
                               atol=1e-12 * max(1.0, want.max()))

    # resample + summarize on random gaussian mixtures over this grid
    nobj = int(rng.integers(3, 12))
    ncomp = int(rng.integers(1, 4))
    c = rng.uniform(0.1 * span, 0.9 * span, (nobj, ncomp, 1))
    w = rng.uniform(0.2, 1.0, (nobj, ncomp, 1))
    s = rng.uniform(0.02 * span, 0.1 * span, (nobj, ncomp, 1))
    pdfs = (w * np.exp(-0.5 * ((x[None, None] - c) / s) ** 2)).sum(axis=1)
    pdfs /= pdfs.sum(axis=1, keepdims=True)
    new = np.linspace(0.0, span, int(rng.integers(30, 250)))
    np.testing.assert_allclose(
        np.asarray(ops.pdfs_resample(pdfs, x, new)),
        rpdf.pdfs_resample(pdfs, x, new), rtol=1e-6, atol=1e-12)
    want = rpdf.pdfs_summarize(pdfs, x, rstate=np.random.RandomState(1))
    got = ops.pdfs_summarize(pdfs, x)
    for i, est in enumerate(("mean", "median", "mode", "best")):
        g = getattr(got, est)
        for j, field in enumerate(("point", "std", "conf", "risk")):
            np.testing.assert_allclose(
                np.asarray(getattr(g, field)), want[i][j], rtol=1e-5,
                atol=1e-7 * span, err_msg=f"seed {seed}: {est}.{field}")
    for j, field in enumerate(("low95", "low68", "high68", "high95")):
        np.testing.assert_allclose(np.asarray(getattr(got, field)),
                                   want[4][j], rtol=1e-5, atol=1e-7 * span,
                                   err_msg=f"seed {seed}: {field}")


def test_photometry_transforms():
    rng = np.random.default_rng(5)
    phot = rng.uniform(0.1, 50, (20, 5))
    err = 0.05 * phot
    for rf, of, args in [
            (rpdf.magnitude, ops.magnitude, (phot, err)),
            (rpdf.luptitude, ops.luptitude, (phot, err, 0.5)),
    ]:
        wm, we = rf(*args)
        gm, ge = of(*args)
        np.testing.assert_allclose(np.asarray(gm), wm, rtol=RTOL)
        np.testing.assert_allclose(np.asarray(ge), we, rtol=RTOL)
    m, me_ = rpdf.magnitude(phot, err)
    wf, wfe = rpdf.inv_magnitude(m, me_)
    gf, gfe = ops.inv_magnitude(m, me_)
    np.testing.assert_allclose(np.asarray(gf), wf, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(gfe), wfe, rtol=RTOL)
    lu, lue = rpdf.luptitude(phot, err, 0.5)
    wf, wfe = rpdf.inv_luptitude(lu, lue, 0.5)
    gf, gfe = ops.inv_luptitude(lu, lue, 0.5)
    np.testing.assert_allclose(np.asarray(gf), wf, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(gfe), wfe, rtol=RTOL)


def test_pdfs_resample_and_summarize():
    rng = np.random.default_rng(6)
    grid = np.linspace(0, 3, 201)
    c = rng.uniform(0.3, 2.7, (25, 1))
    pdfs = np.exp(-0.5 * ((grid[None] - c) / 0.15) ** 2)
    pdfs /= pdfs.sum(1, keepdims=True)
    new = np.linspace(0, 3, 121)
    want = rpdf.pdfs_resample(pdfs, grid, new)
    got = np.asarray(ops.pdfs_resample(pdfs, grid, new))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-12)

    want = rpdf.pdfs_summarize(pdfs, grid, rstate=np.random.RandomState(1))
    got = ops.pdfs_summarize(pdfs, grid)
    for i, est in enumerate(("mean", "median", "mode", "best")):
        g = getattr(got, est)
        for j, field in enumerate(("point", "std", "conf", "risk")):
            np.testing.assert_allclose(
                np.asarray(getattr(g, field)), want[i][j], rtol=1e-5,
                atol=1e-7, err_msg=f"{est}.{field}")
    for j, field in enumerate(("low95", "low68", "high68", "high95")):
        np.testing.assert_allclose(np.asarray(getattr(got, field)),
                                   want[4][j], rtol=1e-5, atol=1e-7,
                                   err_msg=field)


def test_priors_and_igm():
    rng = np.random.default_rng(7)
    mags = rng.uniform(14, 26, 200)
    np.testing.assert_allclose(np.asarray(pmag(mags, maglim=24.5)),
                               rpriors.pmag(mags, 24.5), rtol=1e-6)
    m = rng.uniform(18, 25, 50)
    for t in (0, 1, 2):
        np.testing.assert_allclose(
            np.asarray(bpz_pt_m(t, m)), rpriors.bpz_pt_m(t, m),
            rtol=1e-5, atol=1e-8, err_msg=f"bpz_pt_m t={t}")
    z = rng.uniform(0.01, 4.0, 50)
    for t in (0, 1, 2):
        np.testing.assert_allclose(
            np.asarray(bpz_pz_tm(z, t, m)), rpriors.bpz_pz_tm(z, t, m),
            rtol=1e-5, atol=1e-8, err_msg=f"bpz_pz_tm t={t}")
    wave = np.linspace(300, 9000, 400)
    for zz in (0.5, 2.5, 4.5):
        np.testing.assert_allclose(np.asarray(madau_teff(wave, zz)),
                                   rred.madau_teff(wave, zz),
                                   rtol=1e-6, atol=1e-12, err_msg=str(zz))


class _IdentityJitter:
    """rng/rstate stand-in whose `.normal(loc, scale)` returns `loc`:
    disables the Monte Carlo jitters on BOTH implementations so the
    end-to-end kNN pipelines become deterministic and comparable."""

    def normal(self, loc, scale=None, size=None):
        arr = np.asarray(loc, float)
        if size is not None:
            arr = np.broadcast_to(arr, size).copy()
        return arr


@pytest.mark.parametrize("free_scale", [False, True])
def test_bruteforce_fit_predict_differential(problem, free_scale):
    """Flagship end-to-end path vs the reference: identical PDFs, lmap,
    levid from fit_predict on a masked problem (grid-KDE variant)."""
    import frankenz.bruteforce as rbfmod

    from frankenz_tpu.models import BruteForce

    d, de, dm, m, me, mm = problem
    rng = np.random.default_rng(23)
    zl = rng.uniform(0.2, 2.8, len(m))
    zle = rng.uniform(0.05, 0.2, len(m))
    grid = np.linspace(0, 3, 151)
    kw = dict(label_grid=grid, return_gof=True, verbose=False,
              lprob_kwargs=dict(free_scale=free_scale))

    ref = rbfmod.BruteForce(m.copy(), me.copy(), mm.copy())
    want_pdfs, (want_lmap, want_levid) = ref.fit_predict(
        d.copy(), de.copy(), dm.copy(), zl, zle, **kw)

    ours = BruteForce(m, me, mm)
    got_pdfs, (got_lmap, got_levid) = ours.fit_predict(
        d, de, dm, zl, zle, use_fused=False, **kw)

    np.testing.assert_allclose(got_lmap, want_lmap, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_levid, want_levid, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_pdfs, want_pdfs, rtol=1e-5, atol=1e-7)


def test_custom_lprob_func_differential(problem):
    """The lprob_func plugin contract (SURVEY.md 2.2, demo-2's custom
    posterior pattern) end-to-end vs the reference: a per-model BPZ-style
    log-prior added to the grid likelihood on both sides — the
    reference's per-object hook vs our batched traceable hook."""
    import jax.numpy as jnp

    import frankenz.bruteforce as rbfmod

    from frankenz_tpu.models import BruteForce
    from frankenz_tpu.ops import logprob as our_logprob

    d, de, dm, m, me, mm = problem
    rng = np.random.default_rng(59)
    zl = rng.uniform(0.2, 2.8, len(m))
    zle = rng.uniform(0.05, 0.2, len(m))
    lnprior_vec = np.log(0.1 + rng.uniform(size=len(m)))
    grid = np.linspace(0, 3, 151)

    def lprob_ref(x, xe, xm, m_, me_, mm_):
        res = rpdf.logprob(x, xe, xm, m_, me_, mm_)
        return ((lnprior_vec, res[1], res[1] + lnprior_vec)
                + tuple(res[3:]))

    def lprob_ours(x, xe, xm, m_, me_, mm_):
        res = our_logprob(x, xe, xm, m_, me_, mm_)
        lp = jnp.broadcast_to(jnp.asarray(lnprior_vec), res.lnlike.shape)
        return (lp, res.lnlike, res.lnlike + lp, res.ndim, res.chi2)

    ref = rbfmod.BruteForce(m.copy(), me.copy(), mm.copy())
    want, (wl, wv) = ref.fit_predict(d.copy(), de.copy(), dm.copy(),
                                     zl, zle, lprob_func=lprob_ref,
                                     label_grid=grid, return_gof=True,
                                     verbose=False)
    ours = BruteForce(m, me, mm)
    got, (gl, gv) = ours.fit_predict(d, de, dm, zl, zle,
                                     lprob_func=lprob_ours,
                                     label_grid=grid, return_gof=True,
                                     verbose=False)
    np.testing.assert_allclose(gl, wl, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gv, wv, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("seed", range(6))
def test_bruteforce_option_lattice_fuzz(seed):
    """End-to-end BruteForce.fit_predict vs the reference with the whole
    option lattice drawn per seed: scale mode, dim prior, model-error
    handling, wt-vs-cdf thresholding, and grid-vs-dictionary KDE, on
    masked catalogs (>= 2 shared bands, so no 0-dof NaN cells)."""
    import frankenz.bruteforce as rbfmod

    from frankenz_tpu.models import BruteForce

    rng = np.random.default_rng(73000 + seed)
    nobj = int(rng.integers(4, 9))
    nmodel = int(rng.integers(30, 70))
    nfilt = int(rng.integers(4, 7))
    m = rng.uniform(1, 10, (nmodel, nfilt))
    me = rng.uniform(0.05, 0.3, (nmodel, nfilt))
    mm = np.ones((nmodel, nfilt))
    mm[rng.uniform(size=mm.shape) < 0.15] = 0.0
    mm[:, :2] = 1.0
    d = m[rng.integers(0, nmodel, nobj)] + rng.normal(0, 0.3, (nobj, nfilt))
    de = rng.uniform(0.1, 0.5, (nobj, nfilt))
    dm = np.ones((nobj, nfilt))
    dm[rng.uniform(size=dm.shape) < 0.15] = 0.0
    dm[:, :2] = 1.0
    zl = rng.uniform(0.2, 2.8, nmodel)
    zle = rng.uniform(0.05, 0.2, nmodel)
    grid = np.linspace(0, 3, int(rng.integers(80, 220)))

    kw = dict(return_gof=True, verbose=False,
              lprob_kwargs=dict(
                  free_scale=bool(rng.integers(0, 2)),
                  dim_prior=bool(rng.integers(0, 2)),
                  ignore_model_err=bool(rng.integers(0, 2))))
    if rng.integers(0, 2):
        kw["kde_kwargs"] = dict(wt_thresh=10.0 ** rng.uniform(-4, -2))
    else:
        kw["kde_kwargs"] = dict(wt_thresh=None,
                                cdf_thresh=10.0 ** rng.uniform(-5, -3))
    if rng.integers(0, 2):
        kw["label_grid"] = grid
        rkw = okw = kw
    else:
        sig = np.linspace(0.01, 0.12, 80)
        rkw = dict(kw, label_dict=rpdf.PDFDict(grid, sig))
        okw = dict(kw, label_dict=ops.PDFDict(grid, sig))
        zl = np.clip(zl, 6 * 0.12, 3 - 6 * 0.12)  # interior kernels

    ref = rbfmod.BruteForce(m.copy(), me.copy(), mm.copy())
    want, (wl, wv) = ref.fit_predict(d.copy(), de.copy(), dm.copy(),
                                     zl, zle, **rkw)
    ours = BruteForce(m, me, mm)
    got, (gl, gv) = ours.fit_predict(d, de, dm, zl, zle, use_fused=False,
                                     **okw)
    np.testing.assert_allclose(gl, wl, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gv, wv, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_bruteforce_fit_then_predict_differential(problem):
    """The materializing fit() -> predict() path (saved-grid contract):
    full float64 fit grids and the prediction from stored log-weights
    both match the reference."""
    import frankenz.bruteforce as rbfmod

    from frankenz_tpu.models import BruteForce

    d, de, dm, m, me, mm = problem
    rng = np.random.default_rng(41)
    zl = rng.uniform(0.2, 2.8, len(m))
    zle = rng.uniform(0.05, 0.2, len(m))
    grid = np.linspace(0, 3, 151)

    ref = rbfmod.BruteForce(m.copy(), me.copy(), mm.copy())
    ref.fit(d.copy(), de.copy(), dm.copy(), verbose=False)
    want, (wl, wv) = ref.predict(zl, zle, label_grid=grid,
                                 return_gof=True, verbose=False)

    ours = BruteForce(m, me, mm)
    ours.fit(d, de, dm, verbose=False, fit_dtype=np.float64)
    fin = np.isfinite(ref.fit_lnprob)
    assert ours.fit_lnprob.dtype == np.float64
    np.testing.assert_allclose(ours.fit_lnprob[fin], ref.fit_lnprob[fin],
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(ours.fit_chi2[fin], ref.fit_chi2[fin],
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_array_equal(ours.fit_Ndim, ref.fit_Ndim)
    assert (np.asarray(ours.fit_lnprob)[~fin] == -np.inf).all()

    got, (gl, gv) = ours.predict(zl, zle, label_grid=grid,
                                 return_gof=True, verbose=False)
    np.testing.assert_allclose(gl, wl, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gv, wv, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_knn_fit_predict_differential(problem):
    """End-to-end KMCkNN vs the reference with identity jitters (zero
    model errors + a fake rng, so both MC pipelines are deterministic
    and the K ensembles/trees coincide): identical neighbor unions give
    identical PDFs and GOF."""
    import frankenz.knn as rknnmod

    from frankenz_tpu.models import NearestNeighbors

    d, de, dm, m, _, mm = problem
    me0 = np.zeros_like(m)
    rng = np.random.default_rng(29)
    zl = rng.uniform(0.2, 2.8, len(m))
    zle = rng.uniform(0.05, 0.2, len(m))
    grid = np.linspace(0, 3, 151)
    # Full masks: the reference maps masked cells through luptitude
    # anyway; keep the feature spaces trivially identical.
    dm1, mm1 = np.ones_like(dm), np.ones_like(mm)

    ref = rknnmod.NearestNeighbors(m.copy(), me0.copy(), mm1.copy(),
                                   K=4, rstate=_IdentityJitter(),
                                   verbose=False)
    want_pdfs, (want_lmap, want_levid) = ref.fit_predict(
        d.copy(), de.copy(), dm1.copy(), zl, zle, k=10,
        rstate=_IdentityJitter(), label_grid=grid, return_gof=True,
        verbose=False)

    ours = NearestNeighbors(m, me0, mm1, K=4, seed=0, verbose=False)
    got_pdfs, (got_lmap, got_levid) = ours.fit_predict(
        d, de, dm1, zl, zle, k=10, rng=_IdentityJitter(),
        label_grid=grid, return_gof=True, verbose=False)

    np.testing.assert_allclose(got_lmap, want_lmap, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_levid, want_levid, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(got_pdfs, want_pdfs, rtol=1e-5, atol=1e-7)

    # The separate fit() -> predict() path (stored padded neighbor
    # grids -> prediction from stored log-weights), same determinism.
    ref.fit(d.copy(), de.copy(), dm1.copy(), k=10,
            rstate=_IdentityJitter(), verbose=False)
    want_pdfs, (want_lmap, want_levid) = ref.predict(
        zl, zle, label_grid=grid, return_gof=True, verbose=False)
    ours.fit(d, de, dm1, k=10, rng=_IdentityJitter(), verbose=False)
    np.testing.assert_array_equal(np.asarray(ours.Nneighbors, int),
                                  np.asarray(ref.Nneighbors, int))
    got_pdfs, (got_lmap, got_levid) = ours.predict(
        zl, zle, label_grid=grid, return_gof=True, verbose=False)
    np.testing.assert_allclose(got_lmap, want_lmap, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_levid, want_levid, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(got_pdfs, want_pdfs, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("seed", range(5))
def test_knn_option_lattice_fuzz(seed):
    """KMCkNN vs the reference (identity jitters) with the option
    lattice drawn per seed: feature map x K x k x lp_norm x scale mode
    x threshold mode — same ensembles, same unions, same PDFs."""
    import frankenz.knn as rknnmod

    from frankenz_tpu.models import NearestNeighbors

    rng = np.random.default_rng(91000 + seed)
    nobj = int(rng.integers(4, 8))
    nmodel = int(rng.integers(40, 80))
    nfilt = int(rng.integers(3, 6))
    m = rng.uniform(1, 10, (nmodel, nfilt))
    me0 = np.zeros_like(m)
    mm1 = np.ones((nmodel, nfilt))
    d = m[rng.integers(0, nmodel, nobj)] + rng.normal(0, 0.3, (nobj, nfilt))
    de = rng.uniform(0.1, 0.5, (nobj, nfilt))
    dm1 = np.ones((nobj, nfilt))
    zl = rng.uniform(0.2, 2.8, nmodel)
    zle = rng.uniform(0.05, 0.2, nmodel)
    grid = np.linspace(0, 3, 151)

    fmap = ("identity", "magnitude", "luptitude")[int(rng.integers(0, 3))]
    K = int(rng.integers(1, 5))
    k = int(rng.integers(3, 12))
    lp = (1, 2)[int(rng.integers(0, 2))]
    kw = dict(k=k, lp_norm=lp, label_grid=grid, return_gof=True,
              verbose=False,
              lprob_kwargs=dict(free_scale=bool(rng.integers(0, 2)),
                                dim_prior=bool(rng.integers(0, 2))))
    if rng.integers(0, 2):
        kw["kde_kwargs"] = dict(wt_thresh=10.0 ** rng.uniform(-4, -2))
    else:
        kw["kde_kwargs"] = dict(wt_thresh=None,
                                cdf_thresh=10.0 ** rng.uniform(-5, -3))

    ref = rknnmod.NearestNeighbors(m.copy(), me0.copy(), mm1.copy(),
                                   K=K, feature_map=fmap,
                                   rstate=_IdentityJitter(), verbose=False)
    want, (wl, wv) = ref.fit_predict(d.copy(), de.copy(), dm1.copy(),
                                     zl, zle, rstate=_IdentityJitter(),
                                     **kw)
    ours = NearestNeighbors(m, me0, mm1, K=K, feature_map=fmap, seed=0,
                            verbose=False)
    got, (gl, gv) = ours.fit_predict(d, de, dm1, zl, zle,
                                     rng=_IdentityJitter(), **kw)
    np.testing.assert_allclose(gl, wl, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gv, wv, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_network_populate_and_fit_differential(problem):
    """populate_network + fit_predict (nodes_only AND exact-union) vs
    the reference on IDENTICAL nodes: our trained SOM's node table is
    injected into an untrained reference instance (training itself is
    rng-entangled by design, SURVEY.md 2.3 "RNG parity"), after which
    both pipelines are deterministic — memberships, BMU lists, node
    log-weights, PDFs, and GOF must coincide."""
    import frankenz.networks as rnetmod

    from frankenz_tpu.models import SelfOrganizingMap

    d, de, dm, m, me, mm = problem
    # Trimmed: the reference side is per-object/per-model pure-Python
    # loops and dominates the suite (2+ min at the fixture's full size).
    d, de = d[:6], de[:6]
    m, me = m[:40], me[:40]
    dm1, mm1 = np.ones_like(de), np.ones_like(me)
    rng = np.random.default_rng(31)
    zl = rng.uniform(0.2, 2.8, len(m))
    zle = rng.uniform(0.05, 0.2, len(m))
    grid = np.linspace(0, 3, 151)

    som = SelfOrganizingMap(m, me, mm1)
    som.train_network(nside=3, nproj=2, niter=50, nbatch=20, seed=3,
                      verbose=False)
    som.populate_network(verbose=False)

    ref = rnetmod.SelfOrganizingMap(m.copy(), me.copy(), mm1.copy())
    ref.nodes = np.asarray(som.nodes, float).copy()
    ref.NNODE = len(ref.nodes)
    ref.nodes_pos = np.zeros((ref.NNODE, 2))
    ref.populate_network(verbose=False)

    for j in range(ref.NNODE):
        ridx = np.asarray(ref.nodes_idxs[j], int)
        rlw = np.asarray(ref.nodes_logwts[j], float)
        n = int(som.nodes_Nmatch[j])
        oidx = np.asarray(som.nodes_idxs[j, :n], int)
        olw = np.asarray(som.nodes_logwts[j, :n], float)
        assert sorted(ridx.tolist()) == sorted(oidx.tolist()), j
        np.testing.assert_allclose(rlw[np.argsort(ridx)],
                                   olw[np.argsort(oidx)], rtol=1e-5,
                                   atol=1e-5, err_msg=f"node {j} logwts")
        rb = sorted(np.asarray(ref.nodes_bmus[j], int).tolist())
        nb = int((som.nodes_bmus[j] >= 0).sum())
        ob = sorted(np.asarray(som.nodes_bmus[j, :nb], int).tolist())
        assert rb == ob, f"node {j} bmus"

    # Per-node member-stacked PDFs with the exp(levid) density scaling
    # (networks.py:495-496).
    want_np = ref.get_pdfs(zl, zle, label_grid=grid, verbose=False)
    got_np = som.get_pdfs(zl, zle, label_grid=grid, verbose=False)
    np.testing.assert_allclose(np.asarray(got_np), want_np, rtol=1e-4,
                               atol=1e-6)

    for nodes_only in (True, False):
        want, (wl, wv) = ref.fit_predict(
            d.copy(), de.copy(), dm1.copy(), zl, zle,
            nodes_only=nodes_only, label_grid=grid, return_gof=True,
            verbose=False)
        got, (gl, gv) = som.fit_predict(
            d, de, dm1, zl, zle, nodes_only=nodes_only, label_grid=grid,
            return_gof=True, save_fits=False, verbose=False)
        np.testing.assert_allclose(gl, wl, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(gv, wv, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)

        # The separate fit() -> predict() path (stored node / padded
        # union grids -> prediction from stored log-weights).
        ref.fit(d.copy(), de.copy(), dm1.copy(), nodes_only=nodes_only,
                verbose=False)
        want, (wl, wv) = ref.predict(zl, zle, label_grid=grid,
                                     return_gof=True, verbose=False)
        som.fit(d, de, dm1, nodes_only=nodes_only, verbose=False)
        got, (gl, gv) = som.predict(zl, zle, label_grid=grid,
                                    return_gof=True, verbose=False)
        np.testing.assert_allclose(gl, wl, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(gv, wv, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("seed", range(6))
def test_network_option_lattice_fuzz(seed):
    """_Network.fit_predict vs the reference on injected identical nodes
    with the option lattice drawn per seed: nodes_only x discrete x
    node-threshold mode (wt vs cdf) x KDE-threshold mode x scale mode."""
    import frankenz.networks as rnetmod

    from frankenz_tpu.models import SelfOrganizingMap

    rng = np.random.default_rng(83000 + seed)
    nobj = int(rng.integers(3, 7))
    nmodel = int(rng.integers(25, 45))
    nfilt = int(rng.integers(3, 6))
    m = rng.uniform(1, 10, (nmodel, nfilt))
    me = rng.uniform(0.05, 0.3, (nmodel, nfilt))
    mm1 = np.ones((nmodel, nfilt))
    d = m[rng.integers(0, nmodel, nobj)] + rng.normal(0, 0.3, (nobj, nfilt))
    de = rng.uniform(0.1, 0.5, (nobj, nfilt))
    dm1 = np.ones((nobj, nfilt))
    zl = rng.uniform(0.2, 2.8, nmodel)
    zle = rng.uniform(0.05, 0.2, nmodel)
    grid = np.linspace(0, 3, int(rng.integers(80, 200)))

    som = SelfOrganizingMap(m, me, mm1)
    som.train_network(nside=3, nproj=2, niter=40, nbatch=15,
                      seed=int(rng.integers(0, 100)), verbose=False)
    som.populate_network(verbose=False)
    ref = rnetmod.SelfOrganizingMap(m.copy(), me.copy(), mm1.copy())
    ref.nodes = np.asarray(som.nodes, float).copy()
    ref.NNODE = len(ref.nodes)
    ref.nodes_pos = np.zeros((ref.NNODE, 2))
    ref.populate_network(verbose=False)

    kw = dict(nodes_only=bool(rng.integers(0, 2)),
              discrete=bool(rng.integers(0, 2)),
              return_gof=True, verbose=False,
              lprob_kwargs=dict(free_scale=bool(rng.integers(0, 2)),
                                dim_prior=bool(rng.integers(0, 2))),
              label_grid=grid)
    if rng.integers(0, 2):
        kw.update(wt_thresh=10.0 ** rng.uniform(-4, -2))
    else:
        kw.update(wt_thresh=None, cdf_thresh=10.0 ** rng.uniform(-5, -3))
    if rng.integers(0, 2):
        kw["kde_kwargs"] = dict(wt_thresh=10.0 ** rng.uniform(-4, -2))
    else:
        kw["kde_kwargs"] = dict(wt_thresh=None,
                                cdf_thresh=10.0 ** rng.uniform(-5, -3))

    want, (wl, wv) = ref.fit_predict(d.copy(), de.copy(), dm1.copy(),
                                     zl, zle, **kw)
    got, (gl, gv) = som.fit_predict(d, de, dm1, zl, zle, save_fits=False,
                                    **kw)
    np.testing.assert_allclose(gl, wl, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gv, wv, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_gng_training_differential():
    """FULL GNG training vs the reference's networkx implementation on
    an identical scripted draw stream (both rngs replaced; the reference
    draws one model per step, we take the whole stream up front): the
    fixed-degree adjacency + counter-aging redesign must land on the
    same graph — same node count, node positions (f32-vs-f64 training
    accumulation apart), and EXACT edge set with EXACT ages.  This also
    pins the default hyperparameters: max_age=15 / learn_neighbor=0.005
    (networks.py:1898-1902) — a defaults drift this test originally
    caught.

    Clustered (blob) models: on near-uniform random models two nodes
    can sit within f32 lnl roundoff of the BMU rank boundary, and a
    single f32-vs-f64 rank flip cascades into different graphs — a
    sensitivity of the ALGORITHM, not an implementation gap."""
    import frankenz.networks as rnetmod

    from frankenz_tpu.models import GrowingNeuralGas

    rng = np.random.default_rng(42)
    centers = np.array([[2.0, 5.0, 8.0], [8.0, 3.0, 2.0],
                        [5.0, 9.0, 4.0], [9.0, 8.0, 7.0]])
    m = np.vstack([c + rng.normal(0, 0.3, (100, 3)) for c in centers])
    me = np.full_like(m, 0.05)
    mm1 = np.ones_like(m)
    nsteps = 600
    draws = rng.integers(0, len(m), nsteps)
    pair = (3, 7)

    class ScriptedRef:
        ptr = 0

        def choice(self, n, size=None, replace=True):
            if size == 2:
                return np.asarray(pair)
            v = int(draws[ScriptedRef.ptr])
            ScriptedRef.ptr += 1
            return v

    class ScriptedOurs:
        def integers(self, low, high=None, size=None):
            assert size == nsteps
            return draws

        def choice(self, n, size=2, replace=False):
            return np.asarray(pair)

    kw = dict(niter=24, nbatch=25, max_nodes=30, verbose=False)
    ref = rnetmod.GrowingNeuralGas(m.copy(), me.copy(), mm1.copy())
    ref.train_network(rstate=ScriptedRef(), **kw)
    ours = GrowingNeuralGas(m, me, mm1)
    ours.train_network(rng=ScriptedOurs(), **kw)

    assert ours.NNODE == ref.NNODE
    np.testing.assert_allclose(np.asarray(ours.nodes),
                               np.asarray(ref.nodes, float), rtol=2e-5,
                               atol=2e-5)
    # Edge set + ages: exact (integers; insertion/pruning step-identical).
    want = {}
    for u, v, a in ref.graph.edges(data="age"):
        cu, cv = ref.graph.nodes[u]["count"], ref.graph.nodes[v]["count"]
        want[tuple(sorted((cu, cv)))] = a
    ages = np.asarray(ours.edge_ages)
    got = {(int(i), int(j)): int(ages[i, j])
           for i, j in zip(*np.nonzero(ages >= 0)) if i < j}
    assert got == want
    # Accumulated errors: f32 training accumulation vs the reference's
    # f64 over 600 steps.
    order = np.argsort([ref.graph.nodes[i]["count"]
                        for i in ref.graph.nodes()])
    want_err = np.array([ref.graph.nodes[i]["error"]
                         for i in ref.graph.nodes()])[order]
    np.testing.assert_allclose(np.asarray(ours.nodes_err), want_err,
                               rtol=1e-3, atol=1e-3)


def test_som_training_differential():
    """FULL SOM training vs the reference on an identical scripted draw
    stream (one init-node draw + per-step object draws; both rngs
    replaced): the lax.scan path (networks.py:1826-1865 semantics —
    harmonic rate, Gaussian neighborhood, wt_thresh window) must land on
    the same lattice positions and the same node table, f32-vs-f64
    training accumulation apart.  Clustered (blob) models keep the BMU
    argmax away from f32 rank boundaries — same caveat as the GNG
    differential above."""
    import frankenz.networks as rnetmod

    from frankenz_tpu.models import SelfOrganizingMap

    rng = np.random.default_rng(7)
    centers = np.array([[2.0, 5.0, 8.0], [8.0, 3.0, 2.0],
                        [5.0, 9.0, 4.0], [9.0, 8.0, 7.0]])
    m = np.vstack([c + rng.normal(0, 0.3, (100, 3)) for c in centers])
    me = np.full_like(m, 0.05)
    mm1 = np.ones_like(m)
    nside, nproj = 5, 2
    nnode = nside ** nproj
    niter, nbatch = 20, 10
    nsteps = niter * nbatch
    init_idxs = rng.choice(len(m), size=nnode, replace=False)
    draws = rng.integers(0, len(m), nsteps)

    class ScriptedRef:
        ptr = 0

        def choice(self, n, size=None, replace=True):
            if size is not None:  # the one init-node draw
                assert size == nnode and not replace
                return init_idxs.copy()
            v = int(draws[ScriptedRef.ptr])
            ScriptedRef.ptr += 1
            return v

    class ScriptedOurs:
        def choice(self, n, size=None, replace=True):
            assert size == nnode and not replace
            return init_idxs.copy()

        def integers(self, low, high=None, size=None):
            assert size == nsteps
            return draws

    kw = dict(nside=nside, nproj=nproj, niter=niter, nbatch=nbatch,
              verbose=False)
    ref = rnetmod.SelfOrganizingMap(m.copy(), me.copy(), mm1.copy())
    ref.train_network(rstate=ScriptedRef(), **kw)
    assert ScriptedRef.ptr == nsteps  # every scripted draw consumed
    ours = SelfOrganizingMap(m, me, mm1)
    ours.train_network(rng=ScriptedOurs(), use_pallas=False, **kw)

    np.testing.assert_allclose(np.asarray(ours.nodes_pos),
                               np.asarray(ref.nodes_pos, float))
    np.testing.assert_allclose(np.asarray(ours.nodes),
                               np.asarray(ref.nodes, float),
                               rtol=2e-5, atol=2e-5)


def test_mock_survey_model_grid_differential():
    """MockSurvey.make_model_grid vs the reference: the whole synthesis
    stack (filter curves, template f_lambda->f_nu + normalization, Madau
    IGM, trapezoid flux integral, reference-band scaling) is
    deterministic and must agree to machine epsilon.  The reference's
    loaders need a shim on modern NumPy (float `num` into linspace,
    legacy behavior)."""
    import frankenz.simulate as rsim

    from frankenz_tpu.sim import MockSurvey

    orig = np.linspace

    def shim(start, stop, num=50, **kw):
        return orig(start, stop, int(num), **kw)

    np.linspace = shim
    try:
        ref = rsim.MockSurvey(survey="sdss", templates="cww+", prior="bpz")
    finally:
        np.linspace = orig
    z = np.linspace(0.05, 2.0, 12)
    ref.make_model_grid(z, verbose=False)
    want = np.asarray(ref.models["data"])

    ours = MockSurvey(survey="sdss", templates="cww+", prior="bpz", seed=1)
    ours.make_model_grid(z)
    got = np.asarray(ours.models["data"], float)

    assert got.shape == want.shape == (12, 8, 5)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=0.0)


def test_shared_kwarg_defaults_match_reference():
    """Every kwarg shared by name with the reference keeps the
    reference's default, except the explicitly-intended deviations
    below (each documented in docs/MIGRATING.md).  Guards against the
    defaults drift the GNG differential caught (max_age/learn_neighbor)."""
    import inspect

    import frankenz.bruteforce as rbf
    import frankenz.knn as rknn
    import frankenz.networks as rnet
    import frankenz.plotting as rplot
    import frankenz.samplers as rs

    from frankenz_tpu import plotting as oplot
    from frankenz_tpu.models import (BruteForce, GrowingNeuralGas,
                                     NearestNeighbors, SelfOrganizingMap)
    from frankenz_tpu.models import networks as onet
    from frankenz_tpu.samplers import (hierarchical_sampler,
                                       population_sampler)

    # Intended deviations: save_fits=False (the reference's 7 full
    # (Ndata, Nmodel) float64 grids are 5.6 TB at target scale).
    ALLOW = {("fit_predict", "save_fits")}
    # Equivalent-empty containers ((), None vs [], {}).
    EMPTYISH = (None, (), [], {})

    PAIRS = [
        (rpdf.loglike, ops.loglike), (rpdf.logprob, ops.logprob),
        (rpdf.gauss_kde, ops.gauss_kde),
        (rpdf.gauss_kde_dict, ops.gauss_kde_dict),
        (rpdf.PDFDict.__init__, ops.PDFDict.__init__),
        (rpdf.pdfs_resample, ops.pdfs_resample),
        (rpdf.pdfs_summarize, ops.pdfs_summarize),
        (rpdf.magnitude, ops.magnitude), (rpdf.luptitude, ops.luptitude),
        (rbf.BruteForce.fit, BruteForce.fit),
        (rbf.BruteForce.predict, BruteForce.predict),
        (rbf.BruteForce.fit_predict, BruteForce.fit_predict),
        (rknn.NearestNeighbors.__init__, NearestNeighbors.__init__),
        (rknn.NearestNeighbors.fit_predict, NearestNeighbors.fit_predict),
        (rnet.SelfOrganizingMap.train_network,
         SelfOrganizingMap.train_network),
        (rnet.GrowingNeuralGas.train_network,
         GrowingNeuralGas.train_network),
        (rnet._Network.populate_network, onet._Network.populate_network),
        (rnet._Network.fit_predict, onet._Network.fit_predict),
        (rnet._Network.get_pdfs, onet._Network.get_pdfs),
        (rnet._Network.get_node, onet._Network.get_node),
        (rs.population_sampler.run_mcmc, population_sampler.run_mcmc),
        (rs.population_sampler.sample, population_sampler.sample),
        (rs.hierarchical_sampler.run_mcmc, hierarchical_sampler.run_mcmc),
        (rs.hierarchical_sampler.sample, hierarchical_sampler.sample),
        (rs.loglike_nz, loglike_nz), (rpriors.pmag, pmag),
        (rplot.input_vs_pdf, oplot.input_vs_pdf),
        (rplot.input_vs_dpdf, oplot.input_vs_dpdf),
        (rplot.cdf_vs_epdf, oplot.cdf_vs_epdf),
        (rplot.cdf_vs_ecdf, oplot.cdf_vs_ecdf),
        (rplot.plot2d_network, oplot.plot2d_network),
        (rplot.plot_node, oplot.plot_node),
    ]

    def defaults(fn):
        return {n: p.default
                for n, p in inspect.signature(fn).parameters.items()
                if p.default is not inspect.Parameter.empty}

    drifts = []
    for rf, of in PAIRS:
        rd, od = defaults(rf), defaults(of)
        for k in sorted(set(rd) & set(od)):
            rv, ov = rd[k], od[k]
            if (rf.__name__, k) in ALLOW:
                continue
            if rv in EMPTYISH and ov in EMPTYISH:
                continue
            same = (rv is ov) or (rv == ov)
            if (not same and isinstance(rv, float)
                    and isinstance(ov, (int, float))):
                same = (np.isnan(rv) and np.isnan(ov)) or abs(rv - ov) < 1e-12
            if not same:
                drifts.append(f"{rf.__qualname__}.{k}: ref={rv!r} "
                              f"ours={ov!r}")
    assert not drifts, "\n".join(drifts)


def test_samplers_statistical_differential():
    """Population and hierarchical samplers vs the reference on the
    same mock N(z) problem: rng streams differ by construction
    (SURVEY.md 2.3, "RNG parity"), so compare each sampler's posterior
    mean against the KNOWN truth — ours must recover it at least as
    well as the reference does (same burn/thin/steps)."""
    rng = np.random.default_rng(0)
    nbins, nobs = 30, 2000
    grid = np.arange(nbins)
    nz = np.exp(-0.5 * ((grid - 12) / 4.0) ** 2)
    nz /= nz.sum()
    zt = rng.choice(nbins, nobs, p=nz)
    c = zt + rng.normal(0, 1.2, nobs)
    pdfs = np.exp(-0.5 * ((grid[None] - c[:, None]) / 1.2) ** 2)
    pdfs /= pdfs.sum(1, keepdims=True)

    from frankenz_tpu.samplers import (hierarchical_sampler,
                                       population_sampler)

    rps = rsamp.population_sampler(pdfs)
    rps.run_mcmc(40, thin=100, mh_steps=3,
                 rstate=np.random.RandomState(3), verbose=False)
    ref_err = np.abs(rps.results[0][20:].mean(0) - nz).mean()
    ops_ = population_sampler(pdfs)
    ops_.run_mcmc(40, thin=100, mh_steps=3, seed=3, verbose=False)
    our_err = np.abs(np.asarray(ops_.results[0])[20:].mean(0) - nz).mean()
    assert ref_err < 0.03 and our_err < 0.03, (ref_err, our_err)
    assert our_err <= 1.5 * ref_err + 0.005, (ref_err, our_err)

    rhs = rsamp.hierarchical_sampler(pdfs)
    rhs.run_mcmc(150, rstate=np.random.RandomState(4), verbose=False)
    ref_err = np.abs(rhs.results[0][50:].mean(0) - nz).mean()
    ohs = hierarchical_sampler(pdfs)
    ohs.run_mcmc(150, seed=4, verbose=False)
    our_err = np.abs(np.asarray(ohs.results[0])[50:].mean(0) - nz).mean()
    assert ref_err < 0.02 and our_err < 0.02, (ref_err, our_err)
    assert our_err <= 1.5 * ref_err + 0.005, (ref_err, our_err)


def test_population_sampler_scripted_differential(monkeypatch):
    """EXACT population-sampler chain differential (not statistical):
    one shared draw stream — pair choices, MH normals, exponentials —
    is fed to the reference via a scripted rstate and to our chain
    mega-kernel via a scripted _pop_draws table, so every proposal,
    gradient scale, and accept decision must coincide; samples and
    lnpost trajectories compared along the whole chain (f32 kernel vs
    f64 reference)."""
    from frankenz_tpu.samplers import population as pop_mod
    from frankenz_tpu.samplers import population_sampler

    rng = np.random.default_rng(97)
    nobs, nbins = 60, 12
    niter, thin, mh = 15, 4, 2
    nsteps = niter * thin
    c = rng.uniform(1, 10, (nobs, 1))
    grid = np.arange(nbins)[None]
    pdfs = np.exp(-0.5 * ((grid - c) / 2.0) ** 2) + 0.05
    pdfs /= pdfs.sum(axis=1, keepdims=True)
    pos0 = np.full(nbins, 1.0 / nbins)

    ii = rng.integers(0, nbins, nsteps)
    jj = rng.integers(0, nbins - 1, nsteps)
    jj = jj + (jj >= ii)
    # f32 exactly: the kernel ingests the slab in f32 — hand the
    # reference the identical values.
    zs = rng.normal(size=(nsteps, mh)).astype(np.float32)
    es = rng.exponential(size=(nsteps, mh)).astype(np.float32)

    class ScriptedRef:
        cp = zp = ep = 0

        def choice(self, n, size=None, replace=True):
            assert size == 2 and not replace
            k = ScriptedRef.cp
            ScriptedRef.cp += 1
            return np.array([ii[k], jj[k]])

        def randn(self):
            k = ScriptedRef.zp
            ScriptedRef.zp += 1
            return float(zs[k // mh, k % mh])

        def exponential(self):
            k = ScriptedRef.ep
            ScriptedRef.ep += 1
            return float(es[k // mh, k % mh])

    table = np.concatenate([ii[:, None].astype(np.float32),
                            jj[:, None].astype(np.float32), zs, es], axis=1)

    def scripted_draws(key, *, nsteps, nbins, mh_steps):
        assert nsteps == niter * thin and mh_steps == mh
        import jax.numpy as jnp
        return jnp.asarray(table[:nsteps])

    ref = rsamp.population_sampler(pdfs.copy())
    ref.run_mcmc(niter, pos_init=pos0.copy(), thin=thin, mh_steps=mh,
                 rstate=ScriptedRef(), verbose=False)
    want_s, want_lnp = ref.results
    assert ScriptedRef.cp == nsteps and ScriptedRef.zp == nsteps * mh

    monkeypatch.setattr(pop_mod, "_pop_draws", scripted_draws)
    monkeypatch.setattr(population_sampler, "_kernel_ok",
                        lambda *a, **k: True)
    ours = population_sampler(pdfs)
    ours.run_mcmc(niter, pos_init=pos0, thin=thin, mh_steps=mh, seed=0,
                  verbose=False)
    got_s, got_lnp = ours.results

    np.testing.assert_allclose(got_s, np.asarray(want_s), rtol=2e-4,
                               atol=2e-6)
    np.testing.assert_allclose(got_lnp, np.asarray(want_lnp), rtol=2e-5,
                               atol=2e-4)


def test_loglike_nz():
    rng = np.random.default_rng(8)
    pdfs = rng.uniform(size=(100, 40))
    pdfs /= pdfs.sum(1, keepdims=True)
    nz = rng.uniform(size=40)
    nz /= nz.sum()
    want = rsamp.loglike_nz(nz, pdfs)
    got = loglike_nz(nz, pdfs)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-8)

def _plot_problem(seed=11, nobj=40, ngrid=101):
    rng = np.random.default_rng(seed)
    grid = np.linspace(0.0, 3.0, ngrid)
    ztrue = rng.uniform(0.3, 2.7, nobj)
    zerr = rng.uniform(0.05, 0.2, nobj)
    sig = rng.uniform(0.1, 0.3, nobj)
    pdfs = np.exp(-0.5 * ((grid[None, :] - ztrue[:, None])
                          / sig[:, None]) ** 2)
    pdfs /= pdfs.sum(axis=1, keepdims=True)
    weights = rng.uniform(0.2, 1.0, nobj)
    return grid, ztrue, zerr, pdfs, weights


def test_plotting_stack_differentials():
    """input_vs_pdf / input_vs_dpdf vs the reference: identical stacked
    2-D densities across the threshold modes.  The outer cdf_thresh mode
    uses UNIFORM weights: with non-uniform weights the reference pairs
    object `idx_sort[i]`'s PDF with object `i`'s weight
    (plotting.py:128-159 `zip(arange, objids, sel_arr)` ... `weights[i]`)
    — a pairing bug we deliberately do not reproduce (each object
    carries its own weight here)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import frankenz.plotting as rplot

    from frankenz_tpu import plotting as fzplot
    from frankenz_tpu.ops import PDFDict

    grid, ztrue, zerr, pdfs, weights = _plot_problem()
    sig_grid = np.linspace(0.02, 0.3, 40)
    vdict_r = rpdf.PDFDict(grid, sig_grid)
    vdict_o = PDFDict(grid, sig_grid)

    cases = [
        (dict(), weights),                                   # wt outer mode
        (dict(wt_thresh=None, cdf_thresh=2e-2), None),       # cdf outer mode
        (dict(pdf_wt_thresh=None, pdf_cdf_thresh=5e-3),      # cdf inner mode
         weights),
    ]
    for kw, w in cases:
        want = rplot.input_vs_pdf(ztrue, zerr, vdict_r, pdfs.copy(), grid,
                                  weights=w, verbose=False, **kw)
        plt.close("all")
        got = fzplot.input_vs_pdf(ztrue, zerr, vdict_o, pdfs, grid,
                                  weights=w, plot=False, **kw)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-6, atol=1e-12)

    dgrid = np.linspace(-0.75, 0.75, 81)
    cent = ztrue + 0.05  # slightly-off point estimates
    for kw, w in cases:
        want = rplot.input_vs_dpdf(ztrue, zerr, vdict_r, pdfs.copy(), grid,
                                   cent, dgrid, weights=w, verbose=False,
                                   **kw)
        plt.close("all")
        got = fzplot.input_vs_dpdf(ztrue, zerr, vdict_o, pdfs, grid,
                                   cent, dgrid, weights=w, plot=False, **kw)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-6, atol=1e-12)


def test_plotting_coverage_differentials():
    """cdf_vs_epdf / cdf_vs_ecdf vs the reference on one scripted MC
    stream (the reference draws per-object rows, we draw the (Nobj, Nmc)
    block in one call — both rngs replaced by the same matrix)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import frankenz.plotting as rplot

    from frankenz_tpu import plotting as fzplot

    grid, ztrue, zerr, pdfs, weights = _plot_problem(seed=13)
    nobj, nmc = len(ztrue), 25
    mc = np.random.default_rng(29).normal(ztrue[:, None], zerr[:, None],
                                          (nobj, nmc))

    class ScriptedRef:
        ptr = 0

        def normal(self, loc, scale, size=None):
            assert size == nmc
            row = mc[ScriptedRef.ptr]
            ScriptedRef.ptr += 1
            return row.copy()

    class ScriptedOurs:
        def normal(self, loc, scale, size=None):
            assert size == mc.shape
            return mc.copy()

    want = rplot.cdf_vs_epdf(ztrue, zerr, pdfs, grid, Nmc=nmc,
                             weights=weights, Nbins=20,
                             rstate=ScriptedRef())
    plt.close("all")
    assert ScriptedRef.ptr == nobj
    got = fzplot.cdf_vs_epdf(ztrue, zerr, pdfs, grid, Nmc=nmc,
                             weights=weights, Nbins=20,
                             rng=ScriptedOurs(), plot=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-12)

    ScriptedRef.ptr = 0
    wx, wy = rplot.cdf_vs_ecdf(ztrue, zerr, pdfs, grid, Nmc=nmc,
                               weights=weights, rstate=ScriptedRef())
    plt.close("all")
    gx, gy = fzplot.cdf_vs_ecdf(ztrue, zerr, pdfs, grid, Nmc=nmc,
                                weights=weights, rng=ScriptedOurs(),
                                plot=False)
    np.testing.assert_allclose(np.asarray(gx), wx, rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gy), wy, rtol=1e-6, atol=1e-12)

def test_plot2d_network_differential():
    """plot2d_network vs the reference on identically-built SOMs (same
    nodes_init, one scripted training step, same populate): counts modes,
    all four deterministic point estimates, the discrete(BMU) path, and
    the Monte Carlo label-error path on one scripted draw stream."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import frankenz.networks as rnetmod
    import frankenz.plotting as rplot

    from frankenz_tpu import plotting as fzplot
    from frankenz_tpu.models import SelfOrganizingMap

    rng = np.random.default_rng(23)
    nmodel, nfilt = 400, 3
    m = rng.uniform(1.0, 10.0, (nmodel, nfilt))
    me = np.full_like(m, 0.1)
    mm1 = np.ones_like(m)
    nside, nproj = 4, 2
    nnode = nside ** nproj
    init = m[rng.choice(nmodel, nnode, replace=False)].copy()
    draw = int(rng.integers(0, nmodel))

    class ScriptedRef:
        def choice(self, n, size=None, replace=True):
            return draw

    class ScriptedOurs:
        def integers(self, low, high=None, size=None):
            assert size == 1
            return np.array([draw])

    kw = dict(nside=nside, nproj=nproj, niter=1, nbatch=1, verbose=False)
    ref = rnetmod.SelfOrganizingMap(m.copy(), me.copy(), mm1.copy())
    # NB: the reference trains `nodes_init` IN PLACE (networks.py:1819
    # binds self.nodes = nodes_init, :1864 += on it) — each run needs
    # its own copy.
    ref.train_network(rstate=ScriptedRef(), nodes_init=init.copy(), **kw)
    ref.populate_network(verbose=False)
    ours = SelfOrganizingMap(m, me, mm1)
    ours.train_network(rng=ScriptedOurs(), use_pallas=False,
                       nodes_init=init.copy(), **kw)
    ours.populate_network(verbose=False)

    nm_ours = np.asarray(ours.nodes_Nmatch, int)
    np.testing.assert_array_equal(nm_ours, np.asarray(ref.nodes_Nmatch))
    assert (nm_ours > 0).all()  # reference crashes on empty nodes

    labels = rng.uniform(0.0, 3.0, nmodel)
    labels_err = rng.uniform(0.02, 0.1, nmodel)

    def both(**pkw):
        # rtol 1e-4: node logwts/scales are f32 on our side (populate
        # stores device f32), the reference's are f64.
        want = rplot.plot2d_network(ref, verbose=False, **pkw)
        plt.close("all")
        got = fzplot.plot2d_network(ours, plot=False, **pkw)
        np.testing.assert_allclose(np.asarray(got, float),
                                   np.asarray(want, float),
                                   rtol=1e-4, atol=1e-8)

    both(counts="absolute")
    both(counts="weighted")
    for pe in ("mean", "median", "std", "mad"):
        both(labels=labels, point_est=pe)

    # The REFERENCE's discrete path is broken twice over: nodes_bmus[i]
    # is a plain list, so `np.log(nodes_bmus[i] + 1e-100)`
    # (plotting.py:630) raises TypeError — and it pairs Nbmu weights
    # with Nmatch labels.  Ours implements the documented intent
    # (BMU members, uniform weights); pin both facts.
    with pytest.raises(TypeError):
        rplot.plot2d_network(ref, labels=labels, point_est="mean",
                             discrete=True, verbose=False)
    got = np.asarray(fzplot.plot2d_network(ours, labels=labels,
                                           point_est="mean", discrete=True,
                                           plot=False), float)
    ok = np.isfinite(got)
    assert ok.any()
    assert got[ok].min() >= labels.min() and got[ok].max() <= labels.max()

    # Monte Carlo label-error path: one shared draw stream.  The
    # reference draws (Nmc, Ny) per node; we draw the tiled flat vector
    # — identical row-major layout.
    nmc = 4
    streams = []
    for i in range(nnode):
        n = int(nm_ours[i])
        idxs = np.asarray(ours.nodes_idxs[i, :n], int)
        streams.append(rng.normal(np.tile(labels[idxs], nmc),
                                  np.tile(labels_err[idxs], nmc)))

    class MCRef:
        ptr = 0

        def normal(self, loc, scale, size=None):
            s = streams[MCRef.ptr]
            MCRef.ptr += 1
            assert size == (nmc, len(s) // nmc)
            return s.reshape(size).copy()

    class MCOurs:
        ptr = 0

        def normal(self, loc, scale, size=None):
            s = streams[MCOurs.ptr]
            MCOurs.ptr += 1
            assert s.shape == np.shape(loc)
            return s.copy()

    for pe in ("mean", "median"):
        MCRef.ptr = MCOurs.ptr = 0
        want = rplot.plot2d_network(ref, labels=labels,
                                    labels_err=labels_err, Nmc=nmc,
                                    point_est=pe, rstate=MCRef(),
                                    verbose=False)
        plt.close("all")
        assert MCRef.ptr == nnode
        got = fzplot.plot2d_network(ours, labels=labels,
                                    labels_err=labels_err, Nmc=nmc,
                                    point_est=pe, rng=MCOurs(), plot=False)
        np.testing.assert_allclose(np.asarray(got, float),
                                   np.asarray(want, float),
                                   rtol=1e-4, atol=1e-8)

def test_draw_sampling_differential():
    """draw_mag / draw_type_given_mag / draw_redshift_given_type_mag vs
    the reference on one scripted uniform stream, with the REFERENCE's
    own prior functions passed to both sides — isolates the inverse-CDF
    sampling machinery (left-padded CDF, augmented categorical draw,
    z >= 0 clip) exactly."""
    import frankenz.simulate as rsim

    from frankenz_tpu.sim import survey as osim

    nobj = 60
    rng = np.random.default_rng(31)
    u_mag = rng.uniform(size=nobj)
    u_type = rng.uniform(size=nobj)
    u_z = rng.uniform(size=nobj)

    class ScriptedRef:
        queue = []

        def rand(self, n=None):
            if n is not None:
                return u_mag.copy()
            return ScriptedRef.queue.pop(0)

    class ScriptedOurs:
        queue = []

        def uniform(self, size=None):
            return ScriptedOurs.queue.pop(0)

    # Stage 1: magnitudes.
    pmkw = {"maglim": 25.0}
    want_m = rsim.draw_mag(nobj, rpriors.pmag, rstate=ScriptedRef(),
                           pmag_kwargs=pmkw)
    ScriptedOurs.queue = [u_mag.copy()]
    got_m = osim.draw_mag(nobj, rpriors.pmag, ScriptedOurs(),
                          pmag_kwargs=pmkw)
    np.testing.assert_allclose(got_m, want_m, rtol=1e-12)

    # Stage 2: types given magnitudes (reference: generator consuming
    # one scalar per object).
    ScriptedRef.queue = list(u_type)
    want_t = np.array(list(rsim.draw_type_given_mag(
        rpriors.bpz_pt_m, want_m, 3, rstate=ScriptedRef())))
    ScriptedOurs.queue = [u_type.copy()]
    got_t = osim.draw_type_given_mag(rpriors.bpz_pt_m, got_m, 3,
                                     rng=ScriptedOurs())
    np.testing.assert_array_equal(got_t, want_t)

    # Stage 3: redshifts given (type, mag).
    ScriptedRef.queue = list(u_z)
    want_z = np.array(list(rsim.draw_redshift_given_type_mag(
        rpriors.bpz_pz_tm, want_t, want_m, rstate=ScriptedRef())))
    ScriptedOurs.queue = [u_z.copy()]
    got_z = osim.draw_redshift_given_type_mag(rpriors.bpz_pz_tm, got_t,
                                              got_m, rng=ScriptedOurs())
    np.testing.assert_allclose(got_z, want_z, rtol=1e-10, atol=1e-12)
    assert ScriptedRef.queue == [] and ScriptedOurs.queue == []


def test_gaussian_kernels_differential():
    """gaussian / gaussian_bin vs the reference.  The broadcast case
    covers `gaussian` only: the reference's `gaussian_bin` diffs the CDF
    along axis 0 (pdf.py:439), so it is 1-D-only — ours generalizes with
    an `[..., 1:]` trailing-axis diff; compared per kernel."""
    rng = np.random.default_rng(37)
    mu = rng.uniform(0.5, 2.5, (8, 1))
    std = rng.uniform(0.05, 0.4, (8, 1))
    x = np.linspace(0.0, 3.0, 121)
    np.testing.assert_allclose(
        np.asarray(ops.gaussian(mu, std, x)), rpdf.gaussian(mu, std, x),
        rtol=1e-10, atol=1e-300)
    for i in range(len(mu)):
        np.testing.assert_allclose(
            np.asarray(ops.gaussian_bin(mu[i, 0], std[i, 0], x)),
            rpdf.gaussian_bin(mu[i, 0], std[i, 0], x),
            rtol=1e-8, atol=1e-30)

def test_sample_phot_differential():
    """MockSurvey.sample_phot vs the reference on an injected identical
    catalog (same refmags/types/templates/redshifts) and one scripted
    noise stream: the per-object gathered synthesis (we integrate each
    object's own template; the reference loops objects) must agree with
    the reference's asinh-interp trapezoid integral, reference-band
    normalization, bad-photometry handling, and noise draw."""
    import frankenz.simulate as rsim

    from frankenz_tpu.sim import MockSurvey

    orig = np.linspace

    def shim(start, stop, num=50, **kw):
        return orig(start, stop, int(num), **kw)

    np.linspace = shim
    try:
        ref = rsim.MockSurvey(survey="sdss", templates="cww+", prior="bpz")
    finally:
        np.linspace = orig
    ours = MockSurvey(survey="sdss", templates="cww+", prior="bpz", seed=1)

    rng = np.random.default_rng(41)
    nobj = 25
    ntmpl = len(ours.TTYPE)
    params = {
        "refmags": rng.uniform(16.0, 24.0, nobj),
        "types": rng.integers(0, 3, nobj),
        "templates": rng.integers(0, ntmpl, nobj),
        "redshifts": rng.uniform(0.05, 3.0, nobj),
    }
    noise = rng.normal(size=(nobj, ref.NFILTER))

    class ScriptedRef:
        def normal(self, loc, scale):
            return loc + scale * noise

    class ScriptedOurs:
        def normal(self, loc, scale):
            return np.asarray(loc, float) + np.asarray(scale) * noise

    ref.data = {k: np.array(v) for k, v in params.items()}
    ref.NOBJ = nobj
    ref.sample_phot(rstate=ScriptedRef(), verbose=False)

    ours.data = {k: np.array(v) for k, v in params.items()}
    ours.NOBJ = nobj
    ours.sample_phot(rng=ScriptedOurs())

    np.testing.assert_allclose(np.asarray(ours.data["phot_true"], float),
                               ref.data["phot_true"], rtol=1e-10,
                               atol=1e-300)
    np.testing.assert_allclose(np.asarray(ours.data["phot_err"], float),
                               ref.data["phot_err"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ours.data["phot_obs"], float),
                               ref.data["phot_obs"], rtol=1e-10,
                               atol=1e-12)
    # no-IGM branch too
    ref.data = {k: np.array(v) for k, v in params.items()}
    ref.sample_phot(red_fn=None, rstate=ScriptedRef(), verbose=False)
    ours.data = {k: np.array(v) for k, v in params.items()}
    ours.sample_phot(red_fn=None, rng=ScriptedOurs())
    np.testing.assert_allclose(np.asarray(ours.data["phot_true"], float),
                               ref.data["phot_true"], rtol=1e-10,
                               atol=1e-300)


def test_get_node_and_plot_node_differential():
    """get_node (idx + pos lookup, discrete) and plot_node vs the
    reference on identically-built SOMs.  plot_node returns nothing in
    the reference — the rescaled node line is recovered from the Agg
    axes, the resampling weights from the scripted `choice(p=...)`
    call, and the MC model draws from the y-limits it sets."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import frankenz.networks as rnetmod
    import frankenz.plotting as rplot

    from frankenz_tpu import plotting as fzplot
    from frankenz_tpu.models import SelfOrganizingMap

    rng = np.random.default_rng(29)
    nmodel, nfilt = 300, 4
    m = rng.uniform(1.0, 10.0, (nmodel, nfilt))
    me = np.full_like(m, 0.1)
    mm1 = np.ones_like(m)
    nside, nproj = 4, 2
    nnode = nside ** nproj
    init = m[rng.choice(nmodel, nnode, replace=False)].copy()
    draw = int(rng.integers(0, nmodel))

    class TrainRef:
        def choice(self, n, size=None, replace=True):
            return draw

    class TrainOurs:
        def integers(self, low, high=None, size=None):
            return np.array([draw])

    kw = dict(nside=nside, nproj=nproj, niter=1, nbatch=1, verbose=False)
    ref = rnetmod.SelfOrganizingMap(m.copy(), me.copy(), mm1.copy())
    ref.train_network(rstate=TrainRef(), nodes_init=init.copy(), **kw)
    ref.populate_network(verbose=False)
    ours = SelfOrganizingMap(m, me, mm1)
    ours.train_network(rng=TrainOurs(), use_pallas=False,
                       nodes_init=init.copy(), **kw)
    ours.populate_network(verbose=False)

    # --- get_node parity on every node (f32 populate state -> 1e-4).
    for idx in range(nnode):
        want = ref.get_node(idx=idx)
        got = ours.get_node(idx=idx)
        assert int(got[0]) == int(want[0]) == idx
        np.testing.assert_allclose(np.asarray(got[1], float),
                                   np.asarray(want[1], float), rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(got[2], float),
                                      np.asarray(want[2], float))
        np.testing.assert_array_equal(np.asarray(got[3], int),
                                      np.asarray(want[3], int))
        for j in (4, 5, 6):
            np.testing.assert_allclose(np.asarray(got[j], float),
                                       np.asarray(want[j], float),
                                       rtol=1e-4, atol=1e-8)
        # Discrete mode: BMU members with uniform weights.  The
        # reference still returns the FULL Nmatch-long scales lists
        # alongside Nbmu-long idxs (networks.py:402-410, a length
        # mismatch plot_node would then mis-index); ours returns
        # unit scales of matching length — compare idxs/logwts only.
        want_d = ref.get_node(idx=idx, discrete=True)
        got_d = ours.get_node(idx=idx, discrete=True)
        np.testing.assert_array_equal(np.asarray(got_d[3], int),
                                      np.asarray(want_d[3], int))
        np.testing.assert_array_equal(np.asarray(got_d[4], float),
                                      np.asarray(want_d[4], float))
        assert len(got_d[5]) == len(got_d[3])

    # --- pos lookup + argument validation.
    pos = tuple(np.asarray(ref.nodes_pos[5], float) + 0.2)
    assert int(ours.get_node(pos=pos)[0]) == int(ref.get_node(pos=pos)[0])
    for bad in (dict(), dict(idx=0, pos=pos)):
        with pytest.raises(ValueError):
            ref.get_node(**bad)
        with pytest.raises(ValueError):
            ours.get_node(**bad)

    # --- plot_node on the fullest node, one scripted draw stream.
    idx = int(np.argmax(np.asarray(ours.nodes_Nmatch, int)))
    nmatch = int(ours.nodes_Nmatch[idx])
    nrsamp = 2
    rs = rng.integers(0, nmatch, nmatch * nrsamp)
    noise = rng.normal(size=(len(rs), nfilt))

    class Scripted:
        def __init__(self):
            self.p = None

        def choice(self, n, p=None, size=None, replace=True):
            assert n == nmatch and size == nmatch * nrsamp
            self.p = np.asarray(p, float)
            return rs.copy()

        def normal(self, loc, scale, size=None):
            return np.asarray(loc, float) + np.asarray(scale, float) * noise

    sref, sours = Scripted(), Scripted()
    plt.figure()
    rplot.plot_node(ref, m, me, idx=idx, Nrsamp=nrsamp, rstate=sref)
    ax = plt.gca()
    want_line = np.asarray(ax.lines[0].get_ydata(), float)
    want_ylim = ax.get_ylim()
    plt.close("all")

    got_node, got_mc = fzplot.plot_node(ours, m, me, idx=idx, Nrsamp=nrsamp,
                                        rng=sours, plot=False)
    got_node = np.asarray(got_node, float)
    got_mc = np.asarray(got_mc, float)

    np.testing.assert_allclose(sours.p, sref.p, rtol=1e-4, atol=1e-10)
    np.testing.assert_allclose(got_node, want_line, rtol=1e-4)
    mean, std = got_mc.mean(axis=0), got_mc.std(axis=0)
    np.testing.assert_allclose(
        [float((mean - 3 * std).min()), float((mean + 3 * std).max())],
        list(want_ylim), rtol=1e-4)
