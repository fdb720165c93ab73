"""Fused Pallas pipeline vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frankenz_tpu.ops import kde as K
from frankenz_tpu.ops import likelihood as L
from frankenz_tpu.ops.fused import fused_fit_pdf


def xla_reference(d, de, dm, m, me, mm, G, dim_prior=True,
                  ignore_model_err=False, wt_thresh=1e-3):
    res = L.loglike_fixed(
        jnp.asarray(d, jnp.float32), jnp.asarray(de, jnp.float32),
        jnp.asarray(dm, jnp.float32), jnp.asarray(m, jnp.float32),
        jnp.asarray(me, jnp.float32), jnp.asarray(mm, jnp.float32),
        dim_prior=dim_prior, ignore_model_err=ignore_model_err)
    lnp = res.lnlike
    lmap = jnp.max(lnp, axis=1)
    levid = jax.scipy.special.logsumexp(lnp, axis=1)
    wt = jnp.exp(lnp - levid[:, None])
    wt = K.threshold_weights(wt, wt_thresh, None) if wt_thresh else wt
    pdf = wt @ jnp.asarray(G, jnp.float32)
    return (np.asarray(pdf), np.asarray(lmap), np.asarray(levid))


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(17)
    B, M, F, Ngrid = 24, 300, 5, 101
    m = rng.uniform(1, 10, (M, F)).astype(np.float32)
    me = (0.05 * m).astype(np.float32)
    mm = (rng.uniform(size=(M, F)) > 0.1).astype(np.float32)
    mm[:, :2] = 1.0
    truth = rng.integers(0, M, B)
    d = (m[truth] + rng.normal(0, 0.3, (B, F))).astype(np.float32)
    de = np.full((B, F), 0.3, np.float32)
    dm = (rng.uniform(size=(B, F)) > 0.1).astype(np.float32)
    dm[:, :2] = 1.0
    G = np.asarray(K.kernel_matrix(
        rng.uniform(0, 3, M), np.full(M, 0.1), np.linspace(0, 3, Ngrid)),
        np.float32)
    return d, de, dm, m, me, mm, G


@pytest.mark.parametrize("dim_prior", [True, False])
@pytest.mark.parametrize("ignore_model_err", [False, True])
def test_fused_matches_xla(problem, dim_prior, ignore_model_err):
    d, de, dm, m, me, mm, G = problem
    pdf, lmap, levid = fused_fit_pdf(
        d, de, dm, m, me, mm, G, dim_prior=dim_prior,
        ignore_model_err=ignore_model_err, tb=8, tm=128, interpret=True)
    want_pdf, want_lmap, want_levid = xla_reference(
        d, de, dm, m, me, mm, G, dim_prior=dim_prior,
        ignore_model_err=ignore_model_err)
    np.testing.assert_allclose(np.asarray(lmap), want_lmap, rtol=2e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(levid), want_levid, rtol=2e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pdf), want_pdf, rtol=1e-3,
                               atol=1e-5)


def test_fused_padding_edges(problem):
    """Non-multiple B/M/Ngrid exercise all padding paths."""
    d, de, dm, m, me, mm, G = problem
    pdf, lmap, levid = fused_fit_pdf(
        d[:19], de[:19], dm[:19], m[:251], me[:251], mm[:251], G[:251, :77],
        tb=8, tm=128, interpret=True)
    want_pdf, want_lmap, want_levid = xla_reference(
        d[:19], de[:19], dm[:19], m[:251], me[:251], mm[:251], G[:251, :77])
    assert pdf.shape == (19, 77)
    np.testing.assert_allclose(np.asarray(levid), want_levid, rtol=2e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pdf), want_pdf, rtol=1e-3,
                               atol=1e-5)


def test_fused_no_threshold(problem):
    d, de, dm, m, me, mm, G = problem
    pdf, _, _ = fused_fit_pdf(d, de, dm, m, me, mm, G, wt_thresh=None,
                              tb=8, tm=128, interpret=True)
    want_pdf, _, _ = xla_reference(d, de, dm, m, me, mm, G, wt_thresh=None)
    np.testing.assert_allclose(np.asarray(pdf), want_pdf, rtol=1e-3,
                               atol=1e-5)


@pytest.mark.parametrize("screen", [True, False])
@pytest.mark.parametrize("wt_thresh", [1e-3, None])
@pytest.mark.parametrize("nfilt", [2, 5, 8])
def test_fused_fullmask_fast_path(nfilt, wt_thresh, screen):
    """All-ones masks engage the no-log chi2-domain kernels (screened by
    default, banded with screen=False); results must still match the
    XLA path (including the padding sentinels)."""
    rng = np.random.default_rng(23)
    B, M, Ngrid = 24, 300, 101
    m = rng.uniform(1, 10, (M, nfilt)).astype(np.float32)
    me = (0.05 * m).astype(np.float32)
    mm = np.ones((M, nfilt), np.float32)
    d = (m[rng.integers(0, M, B)]
         + rng.normal(0, 0.3, (B, nfilt))).astype(np.float32)
    de = np.full((B, nfilt), 0.3, np.float32)
    dm = np.ones((B, nfilt), np.float32)
    G = np.asarray(K.kernel_matrix(
        rng.uniform(0, 3, M), np.full(M, 0.1), np.linspace(0, 3, Ngrid)),
        np.float32)
    pdf, lmap, levid = fused_fit_pdf(d, de, dm, m, me, mm, G, tb=8,
                                     tm=128, wt_thresh=wt_thresh,
                                     screen=screen, interpret=True)
    want_pdf, want_lmap, want_levid = xla_reference(
        d, de, dm, m, me, mm, G, wt_thresh=wt_thresh)
    np.testing.assert_allclose(np.asarray(lmap), want_lmap, rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(levid), want_levid, rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(pdf), want_pdf, rtol=2e-3,
                               atol=2e-5)


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("wt_thresh", [1e-3, None])
def test_fused_free_scale(problem, masked, wt_thresh):
    """Free-scale error-free fits (the color-likelihood path) in-kernel."""
    d, de, dm, m, me, mm, G = problem
    if not masked:
        dm = np.ones_like(dm)
        mm = np.ones_like(mm)
    pdf, lmap, levid = fused_fit_pdf(
        d, de, dm, m, me, mm, G, free_scale=True, ignore_model_err=True,
        wt_thresh=wt_thresh, tb=8, tm=128, interpret=True)
    res = L.loglike_free(
        jnp.asarray(d, jnp.float32), jnp.asarray(de, jnp.float32),
        jnp.asarray(dm, jnp.float32), jnp.asarray(m, jnp.float32),
        jnp.asarray(me, jnp.float32), jnp.asarray(mm, jnp.float32),
        ignore_model_err=True)
    lnp = res.lnlike
    want_lmap = np.asarray(jnp.max(lnp, axis=1))
    want_levid = np.asarray(jax.scipy.special.logsumexp(lnp, axis=1))
    wt = jnp.exp(lnp - want_levid[:, None])
    if wt_thresh:
        wt = K.threshold_weights(wt, wt_thresh, None)
    want_pdf = np.asarray(wt @ jnp.asarray(G, jnp.float32))
    np.testing.assert_allclose(np.asarray(lmap), want_lmap, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(levid), want_levid, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(pdf), want_pdf, rtol=5e-3,
                               atol=5e-5)


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("dim_prior", [True, False])
def test_fused_free_scale_with_model_errors(problem, masked, dim_prior):
    """In-tile converged scale iteration vs the XLA while_loop path.

    Both run the fixed-point to |delta lnl| <= max(ltol, roundoff
    floor) — the kernel per pair, the XLA path per object — so they
    agree to ~ltol even on masked rows (VERDICT round-2 item 3; the
    round-2 fixed-sweep kernel sat at rel ~0.3 there).
    """
    d, de, dm, m, me, mm, G = problem
    if not masked:
        dm = np.ones_like(dm)
        mm = np.ones_like(mm)
    pdf, lmap, levid = fused_fit_pdf(
        d, de, dm, m, me, mm, G, free_scale=True, ignore_model_err=False,
        dim_prior=dim_prior, wt_thresh=1e-3, tb=8, tm=128, interpret=True,
        scale_ltol=1e-4)
    res = L.loglike_free(
        jnp.asarray(d, jnp.float32), jnp.asarray(de, jnp.float32),
        jnp.asarray(dm, jnp.float32), jnp.asarray(m, jnp.float32),
        jnp.asarray(me, jnp.float32), jnp.asarray(mm, jnp.float32),
        ignore_model_err=False, dim_prior=dim_prior, ltol=1e-6)
    lnp = res.lnlike
    want_lmap = np.asarray(jnp.max(lnp, axis=1))
    want_levid = np.asarray(jax.scipy.special.logsumexp(lnp, axis=1))
    wt = jnp.exp(lnp - want_levid[:, None])
    wt = K.threshold_weights(wt, 1e-3, None)
    want_pdf = np.asarray(wt @ jnp.asarray(G, jnp.float32))
    np.testing.assert_allclose(np.asarray(lmap), want_lmap, rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(levid), want_levid, rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(pdf), want_pdf, rtol=3e-3,
                               atol=1e-4)


def test_bruteforce_fused_dispatch(problem):
    """BruteForce.fit_predict(use_fused=True) == XLA path."""
    from frankenz_tpu.models import BruteForce

    d, de, dm, m, me, mm, G = problem
    rng = np.random.default_rng(0)
    zlab = rng.uniform(0, 3, m.shape[0])
    zerr = np.full(m.shape[0], 0.1)
    grid = np.linspace(0, 3, 101)
    bf = BruteForce(m, me, mm)
    a = bf.fit_predict(d, de, dm, zlab, zerr, label_grid=grid,
                       verbose=False, use_fused=True)
    b = bf.fit_predict(d, de, dm, zlab, zerr, label_grid=grid,
                       verbose=False, use_fused=False)
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)
    # Free-scale with model errors: the in-tile converged iteration vs
    # the XLA while_loop.  (On TPU `_fused_eligible` auto-selects the
    # tile for this configuration too; in the CPU suite
    # pallas_supported() is False, so use_fused=True runs it in
    # interpret mode.)  Both paths stop at |delta lnl| <= max(ltol,
    # roundoff floor) — at a loose ltol they are two legitimately
    # different iterates whose gap is the geometric convergence tail,
    # NOT ~ltol, so the envelope is only derivable at the floor:
    # ltol=1e-6 sits below the f32 roundoff floor (ops/likelihood.py
    # _loglike_s), both paths run to the same per-pair fixed point, and
    # the residual is f32 accumulation order — the same 1e-3-grade
    # bound the other fused cases carry.
    kw = {"free_scale": True, "ltol": 1e-6}
    c = bf.fit_predict(d, de, dm, zlab, zerr, label_grid=grid,
                       verbose=False, use_fused=True, lprob_kwargs=kw)
    ref = bf.fit_predict(d, de, dm, zlab, zerr, label_grid=grid,
                         verbose=False, use_fused=False, lprob_kwargs=kw)
    np.testing.assert_allclose(c, ref, rtol=1e-3, atol=1e-5)
    # Ineligible configs refuse rather than silently diverge.
    with pytest.raises(ValueError):
        bf.fit_predict(d, de, dm, zlab, zerr, label_grid=grid,
                       verbose=False, use_fused=True, track_scale=True,
                       save_fits=True)


def test_fused_all_masked_object(problem):
    d, de, dm, m, me, mm, G = problem
    dm2 = dm.copy()
    dm2[0] = 0.0
    pdf, lmap, levid = fused_fit_pdf(d, de, dm2, m, me, mm, G, tb=8,
                                     tm=128, interpret=True)
    assert np.asarray(pdf[0]).sum() == 0.0
    assert np.asarray(lmap)[0] == -np.inf
    assert np.isfinite(np.asarray(pdf[1:])).all()


def test_masked_zero_overlap_pairs_do_not_poison_rows():
    """float32 regression: a (datum, model) pair with NO overlapping
    bands has chi2 == 0 and ndim == 0; the old log floor (1e-300)
    underflowed to 0 in f32, so the tile computed inf - inf = NaN and the
    NaN poisoned the whole row's online max (row silently zeroed).  The
    row max must instead match the NaN-cleaned XLA reference."""
    import numpy as np
    from scipy.special import logsumexp

    from frankenz_tpu.ops import fused as fz
    from frankenz_tpu.ops import likelihood as lk

    rng = np.random.default_rng(7)
    B, M, F = 64, 512, 5
    m = rng.uniform(1, 10, (M, F)).astype(np.float32)
    me = (0.05 * m).astype(np.float32)
    mm = (rng.uniform(size=(M, F)) > 0.3).astype(np.float32)
    d = (m[rng.integers(0, M, B)]
         + rng.normal(0, 0.3, (B, F))).astype(np.float32)
    de = np.full((B, F), 0.3, np.float32)
    dm = (rng.uniform(size=(B, F)) > 0.3).astype(np.float32)
    dm[0] = [1, 0, 0, 0, 0]  # guarantees zero-overlap pairs exist
    assert (dm[0] * mm[np.all(mm[:, :1] == 0, axis=1)]).sum(axis=-1).size
    G = np.asarray(np.ones((M, 128), np.float32))

    for fs, dp in ((False, True), (False, False)):
        pdf, lmap, levid = fz.fused_fit_pdf(
            d, de, dm, m, me, mm, jnp.asarray(G), wt_thresh=1e-3,
            full_mask=False, free_scale=fs, dim_prior=dp, interpret=True)
        res = lk.logprob(jnp.asarray(d), jnp.asarray(de), jnp.asarray(dm),
                         jnp.asarray(m), jnp.asarray(me), jnp.asarray(mm),
                         free_scale=fs, dim_prior=dp)
        lnp = np.asarray(res.lnprob)
        lnp = np.where(np.isnan(lnp), -np.inf, lnp)  # 0-overlap pairs
        lm2 = np.max(lnp, 1)
        lv2 = logsumexp(lnp, axis=1)
        lmap, levid = np.asarray(lmap), np.asarray(levid)
        assert np.isfinite(lmap).all(), "poisoned rows"
        np.testing.assert_allclose(lmap, lm2, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(levid, lv2, rtol=1e-3, atol=1e-3)

    # Free-scale tiles floor `shape` before the reciprocal: zero-overlap
    # pairs must not poison rows here either.  Since round 3 the tile
    # runs the fixed point to per-pair convergence (same criterion as
    # the XLA while_loop), so even these heavily-masked rows carry a
    # QUANTIFIED bound vs XLA — measured max deviation on this problem
    # is ~1e-6 (the two paths converge to the same scale; residual
    # differences are f32 accumulation order).  -inf patterns (rows /
    # pairs with no usable evidence under dof = Ndim - 1) must match
    # exactly, never NaN.
    for fs, dp in ((True, True), (True, False)):
        pdf, lmap, levid = fz.fused_fit_pdf(
            d, de, dm, m, me, mm, jnp.asarray(G), wt_thresh=1e-3,
            full_mask=False, free_scale=fs, dim_prior=dp, interpret=True,
            scale_ltol=1e-4)
        res = lk.logprob(jnp.asarray(d), jnp.asarray(de), jnp.asarray(dm),
                         jnp.asarray(m), jnp.asarray(me), jnp.asarray(mm),
                         free_scale=fs, dim_prior=dp)
        lnp = np.asarray(res.lnprob)
        lnp = np.where(np.isnan(lnp), -np.inf, lnp)  # 0-overlap pairs
        lm2 = np.max(lnp, 1)
        lv2 = logsumexp(lnp, axis=1)
        lmap, levid = np.asarray(lmap), np.asarray(levid)
        assert not np.isnan(lmap).any(), (fs, dp)
        assert np.isfinite(np.asarray(pdf)).all(), (fs, dp)
        np.testing.assert_array_equal(np.isfinite(lmap), np.isfinite(lm2))
        fin = np.isfinite(lm2)
        np.testing.assert_allclose(lmap[fin], lm2[fin], rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(levid[fin], lv2[fin], rtol=1e-5,
                                   atol=1e-5)


def test_free_scale_dof1_noise_floor_determinism():
    """dof=1 pairs (2 common bands) whose ML scale fits (near-)exactly:
    chi2 is pure f32 cancellation noise there, and the dim-prior lnl =
    -0.5*log(chi2) turned that noise into lmap values differing by TENS
    of nats between the fused tile, the XLA while_loop, and different
    ltol settings (found by the hardware parity sweep; masked catalogs
    hit this on every near-degenerate 2-common-band pair).  Both paths
    now floor chi2 at the per-pair cancellation scale 16*eps*A and must
    agree -- and the XLA path must be ltol-independent."""
    from frankenz_tpu.ops import likelihood as L

    rng = np.random.default_rng(3)
    B, M, F, Ng = 16, 192, 5, 33
    m = rng.uniform(1, 10, (M, F)).astype(np.float32)
    me = (0.05 * m).astype(np.float32)
    mm = np.ones((M, F), np.float32)
    # Every model overlaps each datum in exactly bands {0, 1} -> dof=1;
    # the data are exact scalings of model rows on those bands, so the
    # ML scale fit is exact and chi2 is pure roundoff.
    mm[:, 2:] = 0.0
    d = np.zeros((B, F), np.float32)
    pick = rng.integers(0, M, B)
    d[:, :2] = 1.7 * m[pick, :2]
    de = np.full((B, F), 0.3, np.float32)
    dm = np.ones((B, F), np.float32)
    G = np.abs(rng.normal(size=(M, Ng))).astype(np.float32)
    G /= G.sum(1, keepdims=True)

    pdf, lmap, levid = fused_fit_pdf(
        d, de, dm, m, me, mm, G, free_scale=True, dim_prior=True,
        wt_thresh=1e-3, tb=8, tm=128, interpret=True, scale_ltol=1e-4)
    lmap, levid = np.asarray(lmap), np.asarray(levid)
    assert np.isfinite(lmap).all() and np.isfinite(levid).all()

    ref = {}
    for ltol in (1e-6, 1e-4):
        res = L.loglike_free(
            jnp.asarray(d), jnp.asarray(de), jnp.asarray(dm),
            jnp.asarray(m), jnp.asarray(me), jnp.asarray(mm),
            ignore_model_err=False, dim_prior=True, ltol=ltol)
        lnp = np.asarray(res.lnlike)
        ref[ltol] = lnp.max(1)
        # Derived floor bound: on these rows chi2 sits AT the floor
        # 16*eps*A in both paths, so lmap = -0.5*log(16 eps A) - ... and
        # the only cross-path freedom is A's f32 accumulation order
        # (~eps relative) -> |dlmap| ~ 0.5 * eps ~ 1e-7.  Measured CPU
        # deviation: 0.0 exactly; hardware accumulation orders are
        # covered by tools/hw_parity.py with the same bound class.
        np.testing.assert_allclose(lmap, ref[ltol], rtol=1e-5, atol=1e-4)
    # ltol must not move the floored value at all.
    np.testing.assert_allclose(ref[1e-6], ref[1e-4], rtol=1e-5, atol=1e-4)
    # The floored lnl is bounded: -0.5*log(16 eps A) with A ~ sum d^2/de^2
    # stays well under the ~34 nats the old 1e-30 floor produced.
    assert lmap.max() < 10.0


def test_g_split_high_emulation_matches_plain(problem):
    """g_split=True routes the pre-split (Gh, Gl) bf16 operands through
    every pass-B kernel (the HIGH stack-precision path on real Mosaic,
    hoisted out of the tile in round 4).  PDFs must match the plain-G
    path within the 3-pass split's representation error (~2^-16: the
    dropped lo@lo term), and lmap/levid must be BITWISE equal — pass A
    never touches G."""
    d, de, dm, m, me, mm, G = problem
    ones_d, ones_m = np.ones_like(dm), np.ones_like(mm)

    cases = [
        # full-mask dim-prior -> screened chi2-domain stack kernel
        dict(full_mask=True, wt_thresh=1e-3),
        # ... and the banded (unscreened) chi2-domain stack kernel
        dict(full_mask=True, wt_thresh=1e-3, screen=False),
        # general masked two-pass -> stack kernel
        dict(full_mask=False, wt_thresh=1e-3),
        # flash-style one-pass
        dict(full_mask=True, wt_thresh=None),
        # on-device cdf cut -> cut-stack kernel
        dict(full_mask=True, wt_thresh=None, cdf_thresh=2e-4),
    ]
    for kw in cases:
        fm = kw["full_mask"]
        dmk, mmk = (ones_d, ones_m) if fm else (dm, mm)
        a = fused_fit_pdf(d, de, dmk, m, me, mmk, G, tb=8, tm=128,
                          interpret=True, g_split=False, **kw)
        b = fused_fit_pdf(d, de, dmk, m, me, mmk, G, tb=8, tm=128,
                          interpret=True, g_split=True, **kw)
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]),
                                      err_msg=str(kw))
        np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]),
                                      err_msg=str(kw))
        np.testing.assert_allclose(
            np.asarray(b[0]), np.asarray(a[0]), rtol=1e-4,
            atol=1e-6 * float(np.max(np.asarray(a[0]))), err_msg=str(kw))


def test_chi2_mxu_optin_matches_vpu_path():
    """The benched-and-rejected MXU chi^2 decomposition (docs/MXU_NOTE.md)
    stays functional as an opt-in: in interpret mode its dots are exact,
    so it reproduces the VPU-loop kernel up to the expansion's
    cancellation noise (the note's reason for rejecting it as a parity
    path)."""
    rng = np.random.default_rng(11)
    B, M, F = 32, 96, 5
    models = rng.uniform(1, 10, (M, F)).astype(np.float32)
    data = rng.uniform(1, 10, (B, F)).astype(np.float32)
    de = np.full((B, F), 0.3, np.float32)
    ones_d, ones_m = np.ones_like(data), np.ones_like(models)
    grid = np.linspace(0, 3, 41)
    G = np.asarray(K.kernel_matrix(rng.uniform(0, 3, M),
                                   np.full(M, 0.1), grid), np.float32)
    kw = dict(ignore_model_err=True, wt_thresh=1e-3, full_mask=True,
              interpret=True)
    ref = fused_fit_pdf(data, de, ones_d, models, np.zeros_like(models),
                        ones_m, G, **kw)
    got = fused_fit_pdf(data, de, ones_d, models, np.zeros_like(models),
                        ones_m, G, chi2_mxu=True, **kw)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
    # The flag demands the configuration whose algebra it implements.
    with pytest.raises(ValueError, match="chi2_mxu"):
        fused_fit_pdf(data, de, ones_d, models, np.zeros_like(models),
                      ones_m, G, chi2_mxu=True, ignore_model_err=False,
                      wt_thresh=1e-3, full_mask=True, interpret=True)


def test_fused_cdf_thresh_matches_xla(problem):
    """On-device cdf_thresh selection (top-T cut) == the XLA sorted-cdf
    path, including the reference's drop-the-largest-weight quirk
    (VERDICT round-2 item 8)."""
    d, de, dm, m, me, mm, G = problem
    pdf, lmap, levid = fused_fit_pdf(
        d, de, dm, m, me, mm, G, wt_thresh=None, cdf_thresh=2e-4,
        tb=8, tm=128, interpret=True)
    res = L.logprob(d, de, dm, m, me, mm)
    lnp = res.lnprob
    want_lmap = np.asarray(jnp.max(lnp, axis=1))
    want_levid = np.asarray(jax.scipy.special.logsumexp(lnp, axis=1))
    wt = jnp.exp(lnp - want_levid[:, None])
    wt = K.threshold_weights(wt, None, 2e-4)
    # The quirk holds: the largest weight is dropped for every object.
    assert (np.asarray(wt)[np.arange(wt.shape[0]),
                           np.argmax(np.asarray(lnp), axis=1)] == 0).all()
    want_pdf = np.asarray(wt @ jnp.asarray(G, jnp.float32))
    np.testing.assert_allclose(np.asarray(lmap), want_lmap, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(levid), want_levid, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pdf), want_pdf, rtol=1e-4,
                               atol=1e-6)


def test_fused_cdf_thresh_flat_posterior_falls_back(problem):
    """A posterior flat enough that the top-T values carry < cdf_thresh
    of the mass raises the documented fallback signal."""
    from frankenz_tpu.ops.fused import FusedCdfFallback

    d, de, dm, m, me, mm, G = problem
    # Identical weights everywhere: every pair carries 1/M of the mass,
    # so with a huge cdf_thresh the tracked top-1 distinct value's
    # exclusive prefix (0) never reaches the threshold... use tiny T.
    d0 = np.tile(m[:1], (d.shape[0], 1))
    with pytest.raises(FusedCdfFallback):
        fused_fit_pdf(np.asarray(d0), de, np.ones_like(dm), m, me,
                      np.ones_like(mm), G, wt_thresh=None,
                      cdf_thresh=0.999999, cdf_topk=2, tb=8, tm=128,
                      interpret=True)


def test_fused_cdf_defer_flag_instead_of_raise(problem):
    """defer_cdf_check=True returns the validity flag as a device scalar
    (for streaming callers to drain asynchronously) instead of raising."""
    d, de, dm, m, me, mm, G = problem
    d0 = np.tile(m[:1], (d.shape[0], 1))
    out = fused_fit_pdf(np.asarray(d0), de, np.ones_like(dm), m, me,
                        np.ones_like(mm), G, wt_thresh=None,
                        cdf_thresh=0.999999, cdf_topk=2, tb=8, tm=128,
                        interpret=True, defer_cdf_check=True)
    assert len(out) == 4
    assert not bool(out[3])
    # Determinate cuts report True and match the eager (raising) call.
    out2 = fused_fit_pdf(d, de, dm, m, me, mm, G, wt_thresh=None,
                         cdf_thresh=2e-4, tb=8, tm=128, interpret=True,
                         defer_cdf_check=True)
    assert bool(out2[3])
    pdf, lmap, levid = fused_fit_pdf(d, de, dm, m, me, mm, G,
                                     wt_thresh=None, cdf_thresh=2e-4,
                                     tb=8, tm=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(out2[0]), np.asarray(pdf))


def test_bruteforce_cdf_fallback_rerun_matches_xla(monkeypatch):
    """When every batch's deferred cdf flag comes back False, the
    streaming loop reruns them all on the XLA sort path — results must
    equal the pure XLA fit_predict."""
    from frankenz_tpu.models import BruteForce
    from frankenz_tpu.models import bruteforce as bf_mod

    rng = np.random.default_rng(3)
    m = rng.uniform(1, 10, (200, 4)).astype(np.float32)
    d = (m[rng.integers(0, 200, 40)]
         + rng.normal(0, 0.3, (40, 4))).astype(np.float32)
    de = np.full((40, 4), 0.3, np.float32)
    z = rng.uniform(0, 3, 200)
    grid = np.linspace(0, 3.2, 65)
    kw = dict(label_grid=grid, wt_thresh=None, cdf_thresh=2e-4,
              verbose=False, batch_size=16, return_gof=True)

    bf = BruteForce(m, np.zeros_like(m), np.ones_like(m))
    want, (wl, wv) = bf.fit_predict(d, de, np.ones_like(d), z,
                                    np.full(200, 0.1), use_fused=False,
                                    **kw)

    orig = bf_mod._fused.fused_fit_pdf

    def always_flagged(*a, **k):
        out = orig(*a, **k)
        if k.get("defer_cdf_check") and len(out) == 4:
            return out[0], out[1], out[2], jnp.asarray(False)
        return out

    monkeypatch.setattr(bf_mod._fused, "fused_fit_pdf", always_flagged)
    got, (gl, gv) = bf.fit_predict(d, de, np.ones_like(d), z,
                                   np.full(200, 0.1), use_fused=True,
                                   **kw)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(gl, wl, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gv, wv, rtol=1e-5, atol=1e-5)


def test_fullmask_wide_filter_no_overflow():
    """a1 > 8.5 (F > 19) switches pass B to the log-form weight: the
    sqrt-chain power overflowed to inf at the chi2 clamp there, and
    inf * exp(-big) = NaN poisoned levid for every row with padded
    models."""
    from frankenz_tpu.ops import likelihood as L

    rng = np.random.default_rng(0)
    B, M, F, Ng = 8, 300, 20, 33
    m = rng.uniform(1, 10, (M, F)).astype(np.float32)
    me = (0.05 * m).astype(np.float32)
    d = (m[rng.integers(0, M, B)]
         + rng.normal(0, .3, (B, F))).astype(np.float32)
    de = np.full((B, F), .3, np.float32)
    G = np.abs(rng.normal(size=(M, Ng))).astype(np.float32)
    G /= G.sum(1, keepdims=True)
    pdf, lmap, levid = fused_fit_pdf(
        d, de, np.ones_like(d), m, me, np.ones_like(m), G, tb=8, tm=128,
        interpret=True, full_mask=True)
    res = L.logprob(d, de, np.ones_like(d), m, me, np.ones_like(m))
    lm = np.asarray(res.lnprob.max(1))
    lv = np.asarray(jax.scipy.special.logsumexp(res.lnprob, axis=1))
    assert np.isfinite(np.asarray(pdf)).all()
    np.testing.assert_allclose(np.asarray(lmap), lm, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(levid), lv, rtol=1e-5, atol=1e-5)


def test_fullmask_all_clamped_outliers_keep_gof_parity():
    """Rows whose every model sits past the chi2 clamp (insane
    outliers): lmap/levid must match the XLA path at f32 (pass A was
    clamped, pinning both at lnl(clamp) ~ -1.5e4 instead of the true
    ~ -1.5e12, and sentinel pads inflated levid by log(Mp/M))."""
    from frankenz_tpu.ops import likelihood as L

    rng = np.random.default_rng(1)
    B, M, F, Ng = 8, 3, 3, 33
    m = rng.uniform(1, 2, (M, F)).astype(np.float32)
    d = np.full((B, F), 1e6, np.float32)
    de = np.full((B, F), 1.0, np.float32)
    G = np.abs(rng.normal(size=(M, Ng))).astype(np.float32)
    G /= G.sum(1, keepdims=True)
    pdf, lmap, levid = fused_fit_pdf(
        d, de, np.ones_like(d), m, np.zeros_like(m), np.ones_like(m), G,
        tb=8, tm=128, interpret=True, full_mask=True,
        ignore_model_err=True)
    res = L.logprob(d, de, np.ones_like(d), m, np.zeros_like(m),
                    np.ones_like(m), ignore_model_err=True)
    lm = np.float32(np.asarray(res.lnprob.max(1)))
    lv = np.float32(np.asarray(
        jax.scipy.special.logsumexp(res.lnprob, axis=1)))
    np.testing.assert_array_equal(np.float32(np.asarray(lmap)), lm)
    np.testing.assert_array_equal(np.float32(np.asarray(levid)), lv)
    # The PDF on such rows is a uniform mixture over the clamped models
    # (the no-log kernel cannot resolve lnl differences past the clamp)
    # — documented deviation; it must at least be finite + normalizable.
    assert np.isfinite(np.asarray(pdf)).all()


@pytest.mark.parametrize("wt_thresh", [1e-3, None])
def test_screened_skips_are_bitwise_exact(problem, wt_thresh):
    """The screened fullmask pipeline's skips must be EXACT: identical
    kernels with every skip disabled (screen_run_all=True: bounds forced
    -inf so all subtiles run) must produce bitwise-equal pdf/lmap/levid.
    This is the core screening guarantee — a skipped pass-A subtile
    provably cannot move the chi2 brackets, a skipped pass-B subtile's
    weights all underflow to exactly 0.0, and a skipped stack dot's
    weights all fail the kernel's own threshold compare."""
    d, de, dm, m, me, mm, G = problem
    dm, mm = np.ones_like(dm), np.ones_like(mm)
    kw = dict(tb=8, tm=128, interpret=True, wt_thresh=wt_thresh,
              full_mask=True)
    scr = fused_fit_pdf(d, de, dm, m, me, mm, G, screen=True, **kw)
    ra = fused_fit_pdf(d, de, dm, m, me, mm, G, screen=True,
                       screen_run_all=True, **kw)
    for a, b, name in zip(scr, ra, ("pdf", "lmap", "levid")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
    # ... and the screened results match the banded/unscreened path to
    # f32 reassociation (the model/object permutations are the only
    # difference) and the XLA oracle at the standard bounds.
    old = fused_fit_pdf(d, de, dm, m, me, mm, G, screen=False, **kw)
    np.testing.assert_array_equal(np.asarray(scr[1]), np.asarray(old[1]))
    np.testing.assert_allclose(np.asarray(scr[2]), np.asarray(old[2]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(scr[0]), np.asarray(old[0]),
                               rtol=1e-5, atol=1e-7)
    want_pdf, want_lmap, want_levid = xla_reference(
        d, de, dm, m, me, mm, G, wt_thresh=wt_thresh)
    np.testing.assert_allclose(np.asarray(scr[1]), want_lmap, rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(scr[2]), want_levid, rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(scr[0]), want_pdf, rtol=2e-3,
                               atol=2e-5)


def test_screened_stats_and_edge_rows():
    """screen_stats returns the three run fractions (exact replications
    of the kernels' skip compares); all-clamped outlier rows (floored
    shift — the uniform-PDF quirk) must keep their skips exact and their
    GOF parity, including the sentinel-pad s-correction."""
    rng = np.random.default_rng(1)
    B, M, F, Ng = 8, 3, 3, 33
    m = rng.uniform(1, 2, (M, F)).astype(np.float32)
    d = np.full((B, F), 1e6, np.float32)
    de = np.full((B, F), 1.0, np.float32)
    G = np.abs(rng.normal(size=(M, Ng))).astype(np.float32)
    G /= G.sum(1, keepdims=True)
    kw = dict(tb=8, tm=128, interpret=True, full_mask=True,
              ignore_model_err=True)
    out = fused_fit_pdf(d, de, np.ones_like(d), m, np.zeros_like(m),
                        np.ones_like(m), G, screen=True,
                        screen_stats=True, **kw)
    assert len(out) == 4
    stats = np.asarray(out[3])
    assert stats.shape == (3,)
    # All-clamped rows live past the no-log clamp: the underflow and
    # dot cuts must be +inf there (w(clamp) stays live), so every
    # pass-B subtile runs.
    np.testing.assert_array_equal(stats[1:], 1.0)
    ra = fused_fit_pdf(d, de, np.ones_like(d), m, np.zeros_like(m),
                       np.ones_like(m), G, screen=True,
                       screen_run_all=True, **kw)
    for a, b in zip(out[:3], ra):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    from frankenz_tpu.ops import likelihood as L
    res = L.logprob(d, de, np.ones_like(d), m, np.zeros_like(m),
                    np.ones_like(m), ignore_model_err=True)
    lm = np.float32(np.asarray(res.lnprob.max(1)))
    lv = np.float32(np.asarray(
        jax.scipy.special.logsumexp(res.lnprob, axis=1)))
    np.testing.assert_array_equal(np.float32(np.asarray(out[1])), lm)
    np.testing.assert_array_equal(np.float32(np.asarray(out[2])), lv)


@pytest.mark.parametrize("home_first", [True, False])
def test_screened_absorption_cut_fires_and_stays_bitwise(home_first):
    """The pass-B ABSORPTION cut (delta-lnl ~25 instead of the f32 exp
    underflow ~104): past the last subtile that can hold a row's
    best-fit chi2, the running weight sum provably contains the peak
    weight, so subtiles whose weight-sum upper bound is below half an
    ulp of it fold into s as exact f32 no-ops.  On data with locality
    (models along a photometric line, objects clustered at one end) it
    must (a) strictly reduce the pass-B run fraction and (b) leave
    pdf/lmap/levid bitwise-unchanged vs absorb=False AND vs
    screen_run_all=True — under BOTH tile visit orders (the per-block
    home-first order expresses ph in visit coordinates)."""
    rng = np.random.default_rng(3)
    M, B, F, Ng = 4096, 64, 5, 65
    t = np.sort(rng.uniform(0, 1, M)).astype(np.float32)
    m = (1.0 + 9.0 * t)[:, None] * np.linspace(1., 2., F)[None, :]
    m = (m + rng.normal(0, .02, (M, F))).astype(np.float32)
    me = (0.02 * m).astype(np.float32)
    d = (m[rng.integers(0, 400, B)]
         + rng.normal(0, .05, (B, F))).astype(np.float32)
    de = np.full((B, F), .05, np.float32)
    G = np.abs(rng.normal(size=(M, Ng))).astype(np.float32)
    G /= G.sum(1, keepdims=True)
    od, om = np.ones_like(d), np.ones_like(m)
    kw = dict(tb=8, tm=512, interpret=True, wt_thresh=1e-3,
              full_mask=True, screen=True, screen_stats=True,
              screen_home_first=home_first)
    on = fused_fit_pdf(d, de, od, m, me, om, G, screen_absorb=True, **kw)
    off = fused_fit_pdf(d, de, od, m, me, om, G, screen_absorb=False,
                        **kw)
    ra = fused_fit_pdf(d, de, od, m, me, om, G, screen_absorb=True,
                       screen_run_all=True, **kw)
    for a, b, name in zip(on[:3], off[:3], ("pdf", "lmap", "levid")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
    for a, b, name in zip(on[:3], ra[:3], ("pdf", "lmap", "levid")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
    assert float(on[3][1]) < float(off[3][1])
    # wt_thresh=None neutralizes absorption exactly (cut_dot == cut_uf
    # floors the gate): run fractions must match absorb=False.
    kw["wt_thresh"] = None
    on_n = fused_fit_pdf(d, de, od, m, me, om, G, screen_absorb=True,
                         **kw)
    off_n = fused_fit_pdf(d, de, od, m, me, om, G, screen_absorb=False,
                          **kw)
    np.testing.assert_array_equal(np.asarray(on_n[3]),
                                  np.asarray(off_n[3]))
    for a, b in zip(on_n[:3], off_n[:3]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_screened_zig_visit_order_bitwise(monkeypatch):
    """Past the SMEM budget for the full (nb, nm) visit table, pass B
    switches to the zig-zag-from-home order computed arithmetically in
    the index maps from the (nb,) home-tile vector.  The order must be
    a permutation for every home position, and outputs must stay
    bitwise vs run_all / absorb-off and reassociation-close to the
    table order."""
    from frankenz_tpu.ops import fused as fz

    for nm in (1, 2, 5, 8):
        for st in range(nm):
            vs = np.asarray(fz._zig_tile_of(
                np.int32(st), np.arange(nm, dtype=np.int32), nm))
            assert sorted(vs.tolist()) == list(range(nm)), (nm, st, vs)

    rng = np.random.default_rng(3)
    M, B, F, Ng = 4096, 64, 5, 65
    t = np.sort(rng.uniform(0, 1, M)).astype(np.float32)
    m = (1.0 + 9.0 * t)[:, None] * np.linspace(1., 2., F)[None, :]
    m = (m + rng.normal(0, .02, (M, F))).astype(np.float32)
    me = (0.02 * m).astype(np.float32)
    d = (m[rng.integers(0, M, B)]
         + rng.normal(0, .05, (B, F))).astype(np.float32)
    de = np.full((B, F), .05, np.float32)
    G = np.abs(rng.normal(size=(M, Ng))).astype(np.float32)
    G /= G.sum(1, keepdims=True)
    od, om = np.ones_like(d), np.ones_like(m)
    kw = dict(tb=8, tm=512, interpret=True, wt_thresh=1e-3,
              full_mask=True, screen=True)
    table = fused_fit_pdf(d, de, od, m, me, om, G, **kw)
    monkeypatch.setattr(fz, "_VISIT_SMEM_MAX", 0)  # force the zig path
    fz._fused_call_fullmask_dimprior_screened.clear_cache()
    fz._fused_call.clear_cache()
    try:
        zig = fused_fit_pdf(d, de, od, m, me, om, G, **kw)
        zra = fused_fit_pdf(d, de, od, m, me, om, G,
                            screen_run_all=True, **kw)
        zoff = fused_fit_pdf(d, de, od, m, me, om, G,
                             screen_absorb=False, **kw)
    finally:
        monkeypatch.undo()
        fz._fused_call_fullmask_dimprior_screened.clear_cache()
        fz._fused_call.clear_cache()
    for a, b, name in zip(zig, zra, ("pdf", "lmap", "levid")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg="run_all " + name)
    for a, b, name in zip(zig, zoff, ("pdf", "lmap", "levid")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg="absorb " + name)
    np.testing.assert_array_equal(np.asarray(zig[1]), np.asarray(table[1]))
    np.testing.assert_allclose(np.asarray(zig[2]), np.asarray(table[2]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(zig[0]), np.asarray(table[0]),
                               rtol=1e-5, atol=1e-6)


def test_screened_wide_filters_logform_bitwise():
    """F=20 (a1 > 8.5) routes the screened pass B through the log-form
    weight; skips must stay bitwise-exact there too."""
    rng = np.random.default_rng(0)
    B, M, F, Ng = 8, 300, 20, 33
    m = rng.uniform(1, 10, (M, F)).astype(np.float32)
    me = (0.05 * m).astype(np.float32)
    d = (m[rng.integers(0, M, B)]
         + rng.normal(0, .3, (B, F))).astype(np.float32)
    de = np.full((B, F), .3, np.float32)
    G = np.abs(rng.normal(size=(M, Ng))).astype(np.float32)
    G /= G.sum(1, keepdims=True)
    kw = dict(tb=8, tm=128, interpret=True, full_mask=True)
    scr = fused_fit_pdf(d, de, np.ones_like(d), m, me, np.ones_like(m),
                        G, screen=True, **kw)
    ra = fused_fit_pdf(d, de, np.ones_like(d), m, me, np.ones_like(m),
                       G, screen=True, screen_run_all=True, **kw)
    for a, b in zip(scr, ra):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("wt_thresh", [1e-3, None])
def test_fullmask_banded_model_chunking(monkeypatch, wt_thresh):
    """Models split into >1 chunk through the fullmask banded path (the
    _NM_SMEM_MAX ceiling, hit for real past ~1M models at tm=512): pass
    A's chi2 brackets combine exactly across chunks (max/min), pass B's
    per-chunk PDFs/weight sums add — results must match both the XLA
    oracle and the dense (band_skip=False) stack."""
    from frankenz_tpu.ops import fused as fz
    monkeypatch.setattr(fz, "_NM_SMEM_MAX", 3)
    rng = np.random.default_rng(41)
    B, M, F, Ngrid = 16, 1100, 5, 140  # nm=9 tiles at tm=128 -> 3 chunks
    m = rng.uniform(1, 10, (M, F)).astype(np.float32)
    me = (0.05 * m).astype(np.float32)
    mm = np.ones((M, F), np.float32)
    d = (m[rng.integers(0, M, B)]
         + rng.normal(0, 0.3, (B, F))).astype(np.float32)
    de = np.full((B, F), 0.3, np.float32)
    dm = np.ones((B, F), np.float32)
    G = np.asarray(K.kernel_matrix(
        rng.uniform(0, 3, M), np.full(M, 0.1), np.linspace(0, 3, Ngrid)),
        np.float32)
    pdf, lmap, levid = fused_fit_pdf(d, de, dm, m, me, mm, G, tb=8,
                                     tm=128, wt_thresh=wt_thresh,
                                     screen=False, interpret=True)
    want_pdf, want_lmap, want_levid = xla_reference(
        d, de, dm, m, me, mm, G, wt_thresh=wt_thresh)
    np.testing.assert_allclose(np.asarray(lmap), want_lmap, rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(levid), want_levid, rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(pdf), want_pdf, rtol=2e-3,
                               atol=2e-5)
    # vs the dense stack: only f32 reassociation (band sort + chunk
    # boundary) separates them.
    pdf_d, lmap_d, levid_d = fused_fit_pdf(d, de, dm, m, me, mm, G, tb=8,
                                           tm=128, wt_thresh=wt_thresh,
                                           band_skip=False, screen=False,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(lmap), np.asarray(lmap_d))
    np.testing.assert_allclose(np.asarray(levid), np.asarray(levid_d),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf_d),
                               rtol=1e-5, atol=1e-7)


def test_general_path_band_fallback_past_smem_ceiling(monkeypatch):
    """The general (masked) path cannot chunk; past the SMEM flag-table
    ceiling it must drop to the dense stack and still match the XLA
    oracle."""
    from frankenz_tpu.ops import fused as fz
    monkeypatch.setattr(fz, "_NM_SMEM_MAX", 3)
    rng = np.random.default_rng(43)
    B, M, F, Ngrid = 16, 1100, 5, 140
    m = rng.uniform(1, 10, (M, F)).astype(np.float32)
    me = (0.05 * m).astype(np.float32)
    mm = (rng.uniform(size=(M, F)) > 0.1).astype(np.float32)
    mm[:, :2] = 1.0
    d = (m[rng.integers(0, M, B)]
         + rng.normal(0, 0.3, (B, F))).astype(np.float32)
    de = np.full((B, F), 0.3, np.float32)
    dm = (rng.uniform(size=(B, F)) > 0.1).astype(np.float32)
    dm[:, :2] = 1.0
    G = np.asarray(K.kernel_matrix(
        rng.uniform(0, 3, M), np.full(M, 0.1), np.linspace(0, 3, Ngrid)),
        np.float32)
    pdf, lmap, levid = fused_fit_pdf(d, de, dm, m, me, mm, G, tb=8,
                                     tm=128, interpret=True)
    want_pdf, want_lmap, want_levid = xla_reference(d, de, dm, m, me, mm,
                                                    G)
    np.testing.assert_allclose(np.asarray(lmap), want_lmap, rtol=2e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(levid), want_levid, rtol=2e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pdf), want_pdf, rtol=1e-3,
                               atol=1e-5)
