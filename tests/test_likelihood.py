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
