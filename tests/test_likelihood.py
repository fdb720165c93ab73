"""Golden-value tests: JAX likelihood kernels vs the NumPy oracle."""

import numpy as np
import pytest

import _oracle as oracle
from frankenz_tpu.ops import likelihood as L

RTOL = 1e-6


def make_problem(rng, nobj=7, nmodel=23, nfilt=5, masked=True):
    models = rng.uniform(1.0, 10.0, (nmodel, nfilt))
    models_err = rng.uniform(0.05, 0.5, (nmodel, nfilt))
    models_mask = (rng.uniform(size=(nmodel, nfilt)) > 0.1 if masked
                   else np.ones((nmodel, nfilt))).astype(float)
    data = rng.uniform(1.0, 10.0, (nobj, nfilt))
    data_err = rng.uniform(0.1, 1.0, (nobj, nfilt))
    data_mask = (rng.uniform(size=(nobj, nfilt)) > 0.1 if masked
                 else np.ones((nobj, nfilt))).astype(float)
    # Keep >=3 bands jointly unmasked so free-scale fits are never exactly
    # degenerate (ndim <= 1 makes chi2 collapse to rounding noise and the
    # chi2-distribution logpdf blow up in both oracle and implementation).
    models_mask[:, :3] = 1.0
    data_mask[:, :3] = 1.0
    return data, data_err, data_mask, models, models_err, models_mask


@pytest.mark.parametrize("ignore_model_err", [False, True])
@pytest.mark.parametrize("dim_prior", [False, True])
def test_loglike_fixed(ignore_model_err, dim_prior):
    rng = np.random.default_rng(0)
    prob = make_problem(rng)
    got = L.loglike(*prob, free_scale=False,
                    ignore_model_err=ignore_model_err, dim_prior=dim_prior)
    want = oracle.loglike(*prob, free_scale=False,
                          ignore_model_err=ignore_model_err,
                          dim_prior=dim_prior)
    np.testing.assert_allclose(got.lnlike, want[0], rtol=RTOL)
    np.testing.assert_allclose(got.ndim, want[1], rtol=0, atol=0)
    np.testing.assert_allclose(got.chi2, want[2], rtol=RTOL)


@pytest.mark.parametrize("ignore_model_err", [False, True])
@pytest.mark.parametrize("dim_prior", [False, True])
def test_loglike_free(ignore_model_err, dim_prior):
    rng = np.random.default_rng(1)
    prob = make_problem(rng)
    got = L.loglike(*prob, free_scale=True,
                    ignore_model_err=ignore_model_err, dim_prior=dim_prior,
                    return_scale=True)
    want = oracle.loglike(*prob, free_scale=True,
                          ignore_model_err=ignore_model_err,
                          dim_prior=dim_prior, return_scale=True)
    np.testing.assert_allclose(got.lnlike, want[0], rtol=RTOL)
    np.testing.assert_allclose(got.chi2, want[2], rtol=RTOL)
    np.testing.assert_allclose(got.scale, want[3], rtol=RTOL)
    np.testing.assert_allclose(got.scale_err, want[4], rtol=RTOL)


def test_loglike_free_tight_tolerance():
    """Many iterations of the fixed-point loop still match the oracle."""
    rng = np.random.default_rng(2)
    prob = make_problem(rng, nobj=5, nmodel=11, nfilt=8)
    # Large model errors force the scale iteration to actually work.
    prob = (prob[0], prob[1], prob[2], prob[3], prob[4] * 4.0, prob[5])
    got = L.loglike(*prob, free_scale=True, ltol=1e-10, return_scale=True)
    want = oracle.loglike(*prob, free_scale=True, ltol=1e-10,
                          return_scale=True)
    np.testing.assert_allclose(got.lnlike, want[0], rtol=RTOL)
    np.testing.assert_allclose(got.scale, want[3], rtol=RTOL)


def test_input_cleaning():
    """Non-finite data / bad errors behave as masked bands (pdf.py:310)."""
    rng = np.random.default_rng(3)
    d, de, dm, m, me, mm = make_problem(rng, masked=False)
    d[0, 0] = np.nan
    de[1, 2] = -1.0
    de[2, 3] = np.inf
    got = L.loglike(d, de, dm, m, me, mm)
    want = oracle.loglike(d, de, dm, m, me, mm)
    np.testing.assert_allclose(got.lnlike, want[0], rtol=RTOL)
    np.testing.assert_allclose(got.ndim, want[1])


def test_single_datum_promotion():
    """(Nfilt,) inputs behave as a batch of one."""
    rng = np.random.default_rng(4)
    d, de, dm, m, me, mm = make_problem(rng, nobj=1)
    got1 = L.loglike(d[0], de[0], dm[0], m, me, mm)
    got2 = L.loglike(d, de, dm, m, me, mm)
    np.testing.assert_array_equal(np.asarray(got1.lnlike),
                                  np.asarray(got2.lnlike))


def test_logprob_contract():
    """logprob returns the fitting-layer 5/7-field contract."""
    rng = np.random.default_rng(5)
    prob = make_problem(rng)
    res = L.logprob(*prob)
    assert res.lnprior.shape == res.lnlike.shape == res.lnprob.shape
    np.testing.assert_array_equal(np.asarray(res.lnprior), 0.0)
    np.testing.assert_array_equal(np.asarray(res.lnprob),
                                  np.asarray(res.lnlike))
    assert res.scale is None
    res_s = L.logprob(*prob, free_scale=True, return_scale=True)
    assert res_s.scale is not None and res_s.scale_err is not None


def test_jit_and_vmap_compatible():
    import jax

    rng = np.random.default_rng(6)
    prob = make_problem(rng)

    @jax.jit
    def f(*args):
        return L.loglike_fixed(*args).lnlike

    np.testing.assert_allclose(np.asarray(f(*prob)),
                               np.asarray(L.loglike_fixed(*prob).lnlike),
                               rtol=1e-12)


def test_degenerate_pair_policy_all_paths():
    """Documented deviation (CLAUDE.md / VERDICT round-2 weak point 7):
    zero-overlap (datum, model) pairs and free-scale pairs with Ndim < 2
    produce lnl = -inf on EVERY path — the reference NaNs there
    (0-dof chi2 pdf).  Asserted here for the XLA fixed/free paths and
    the fused kernels (interpret mode) rather than masked out."""
    import jax.numpy as jnp

    from frankenz_tpu.ops import likelihood as L
    from frankenz_tpu.ops.fused import fused_fit_pdf

    rng = np.random.default_rng(0)
    B, M, F = 8, 12, 5
    m = rng.uniform(1, 10, (M, F))
    me = 0.05 * m
    mm = np.ones((M, F))
    mm[0] = 0.0          # model 0 observes nothing -> zero overlap
    d = rng.uniform(1, 10, (B, F))
    de = np.full((B, F), 0.3)
    dmask = np.ones((B, F))
    dmask[1, 1:] = 0.0   # object 1 has one band -> free-scale Ndim < 2
    dmask[2, :] = 0.0    # object 2 fully masked -> all pairs degenerate

    fixed = L.logprob(d, de, dmask, m, me, mm)
    assert (np.asarray(fixed.lnprob)[:, 0] == -np.inf).all()
    assert (np.asarray(fixed.lnprob)[2] == -np.inf).all()
    assert np.isfinite(np.asarray(fixed.lnprob)[0, 1:]).all()

    for ime in (False, True):
        free = L.logprob(d, de, dmask, m, me, mm, free_scale=True,
                         ignore_model_err=ime)
        lnp = np.asarray(free.lnprob)
        assert (lnp[:, 0] == -np.inf).all(), ime   # zero overlap
        assert (lnp[1] == -np.inf).all(), ime      # Ndim == 1 < 2
        assert (lnp[2] == -np.inf).all(), ime
        assert np.isfinite(lnp[0, 1:]).all(), ime

    # Fused kernels: same contract surfaces as -inf GOF + zero PDFs for
    # the all-degenerate object; zero-overlap models never contribute.
    grid = np.linspace(0, 3, 33)
    from frankenz_tpu.ops import kernel_matrix

    G = np.asarray(kernel_matrix(rng.uniform(0, 3, M),
                                 np.full(M, 0.1), grid))
    for kw in (dict(),
               dict(free_scale=True, ignore_model_err=True),
               dict(free_scale=True, ignore_model_err=False)):
        pdf, lmap, levid = fused_fit_pdf(
            d, de, dmask, m, me, mm, G, wt_thresh=1e-3, tb=8, tm=128,
            interpret=True, **kw)
        assert np.asarray(lmap)[2] == -np.inf, kw
        assert np.asarray(levid)[2] == -np.inf, kw
        np.testing.assert_array_equal(np.asarray(pdf)[2], 0.0)
        assert np.isfinite(np.asarray(lmap)[0]), kw
