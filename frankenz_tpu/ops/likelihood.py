"""
Photometric log-likelihood kernels (batched, TPU-first).

Reference semantics: `frankenz/pdf.py:27-411` (`_loglike`, `_loglike_s`,
`loglike`, `logprob`).  The reference computes one datum against all models
per call inside a Python loop over objects; here every function is batched
over objects from the start — shapes ``(Nobj, Nfilt) x (Nmodel, Nfilt) ->
(Nobj, Nmodel)`` — and is jit/vmap/shard_map friendly (pure functions, no
mutation, static flags).

Math contract (must match the reference to <=1e-6 relative):

* combined mask ``tot_mask = data_mask * models_mask``; total variance
  ``sigma_d^2 + sigma_m^2`` (or ``sigma_d^2`` alone when
  ``ignore_model_err``)  [pdf.py:76-87]
* ``dim_prior=True`` replaces the Normal logpdf with the chi^2-distribution
  logpdf with dof = Ndim (fixed scale) or Ndim-1 (free scale)
  [pdf.py:90-93, 226-229]
* free-scale ML solution ``s = (sum m d / var) / (sum m^2 / var)`` with the
  *frozen-numerator* fixed-point iteration: the masked numerators
  ``m*d`` and ``m^2`` are computed once with the initial variance's mask and
  never rebuilt, only re-divided by the updated variance
  ``sigma_d^2 + (s*sigma_m)^2``  [pdf.py:180-223]
* the Normal logpdf's ``sum(log tot_var)`` term sums over *all* filters,
  not just masked ones  [pdf.py:97-98]
* ``loglike`` treats non-finite / non-positive-error bands as masked with
  value 0 and error 1  [pdf.py:310-311]

Design notes (TPU):

* The general masked chi^2 has a per-(object, model, filter) variance, which
  breaks a clean matmul decomposition.  Nfilt is tiny (5-30), so the exact
  path reduces over filters with an unrolled loop of rank-1 outer updates —
  XLA fuses this into a single elementwise pipeline over the (Nobj, Nmodel)
  tile and never materializes (Nobj, Nmodel, Nfilt).
* When ``ignore_model_err=True`` the variance depends only on the datum and
  chi^2 decomposes into matmuls that run on the MXU (the free-scale fast
  path below); `frankenz_tpu.ops.fused` holds the Pallas pipeline.  This
  module is the exact reference-parity path and the building block for
  everything else.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln, xlogy

__all__ = ["static_spec",
    "LoglikeResult",
    "LogprobResult",
    "loglike",
    "loglike_fixed",
    "loglike_free",
    "logprob",
    "clean_data",
]

_LOG_2PI = 1.8378770664093453  # log(2*pi)
_LOG_2 = 0.6931471805599453  # log(2)
# Free-scale chi2 comes from the cancelling ML identity A - inter^2/shape
# (A = sum mask d^2/var); its roundoff is ~eps*A, so values below
# _CHI2_NOISE_MULT*eps*A are pure noise and are floored there (the
# margin covers both this path's and the Pallas tile's accumulation
# orders).  Keeps the dof=1 dim-prior lnl = -0.5*log(chi2) DETERMINISTIC
# for (near-)exact fits instead of noise-valued by tens of nats.
_CHI2_NOISE_MULT = 16.0


class LoglikeResult(NamedTuple):
    """Output of the likelihood kernels, batched over objects.

    All fields have shape (Nobj, Nmodel); `scale`/`scale_err` are None
    unless the free-scale path produced them.
    """

    lnlike: jax.Array
    ndim: jax.Array
    chi2: jax.Array
    scale: jax.Array | None = None
    scale_err: jax.Array | None = None


class LogprobResult(NamedTuple):
    """Output of `logprob` — the fitting-layer contract.

    Mirrors the 5/7-tuple returned by the reference `pdf.logprob`
    (pdf.py:404-411): (lnprior, lnlike, lnprob, ndim, chi2[, scale,
    scale_err]).
    """

    lnprior: jax.Array
    lnlike: jax.Array
    lnprob: jax.Array
    ndim: jax.Array
    chi2: jax.Array
    scale: jax.Array | None = None
    scale_err: jax.Array | None = None


def _atleast_2d(*arrays):
    """Promote (Nfilt,) single-object inputs to (1, Nfilt)."""
    return tuple(a if a.ndim == 2 else a[None, :] for a in arrays)


def _f(x):
    return jnp.asarray(x, dtype=jnp.result_type(jnp.asarray(x).dtype, jnp.float32))


def _chi2_dim_logpdf(a, chi2, max_ndim=None):
    """logpdf of the chi^2 distribution with dof 2*a evaluated at chi2.

    Matches the reference's dimensionality prior (pdf.py:90-93):
    ``xlogy(a - 1, chi2) - chi2/2 - gammaln(a) - a*log(2)``.

    When `max_ndim` is given, ``2*a`` is known to take integer-or-
    half-integer values in [-1, max_ndim], so the expensive
    ``gammaln(a) + a*log2`` term is evaluated once per possible value
    and gathered — on a (Nobj, Nmodel) grid this replaces ~1e9 gammaln
    calls with a (2*max_ndim+3)-entry table lookup.
    """
    if max_ndim is None:
        norm = gammaln(a) + _LOG_2 * a
    else:
        # Possible 2a values: -1, -0.5, 0, ..., max_ndim in half steps
        # (fixed scale: 2a = Ndim; free scale: 2a = Ndim - 1).
        twoa = jnp.arange(-2, 2 * max_ndim + 1) * 0.5
        table = gammaln(0.5 * twoa) + _LOG_2 * 0.5 * twoa
        idx = jnp.round(4.0 * a + 2.0).astype(jnp.int32)
        norm = table[jnp.clip(idx, 0, table.shape[0] - 1)]
    return xlogy(a - 1.0, chi2) - 0.5 * chi2 - norm


def _filter_reduce(d, de, dm, m, me, mm, *, ignore_model_err, need_logvar,
                   scale=None):
    """Reduce chi^2 (and optionally sum-log-variance) over the filter axis.

    Unrolled rank-1 outer updates over Nfilt: each step broadcasts a
    (Nobj, 1) column against a (1, Nmodel) row, so the working set is a
    single (Nobj, Nmodel) tile per accumulator and XLA fuses the whole
    pipeline — (Nobj, Nmodel, Nfilt) is never materialized.

    `scale` (Nobj, Nmodel), if given, rescales the models (free-scale chi^2
    with variance sigma_d^2 + (scale*sigma_m)^2 when model errors are kept).
    """
    nfilt = d.shape[1]
    dt = jnp.result_type(d.dtype, m.dtype)
    nobj, nmodel = d.shape[0], m.shape[0]
    chi2 = jnp.zeros((nobj, nmodel), dt)
    logvar = jnp.zeros((nobj, nmodel), dt) if need_logvar else None
    for k in range(nfilt):
        dk = d[:, k:k + 1]
        dek = de[:, k:k + 1]
        mek = me[None, :, k]
        mask = dm[:, k:k + 1] * mm[None, :, k]
        if ignore_model_err:
            var = dek * dek + jnp.zeros((1, nmodel), dt)
        elif scale is None:
            var = dek * dek + mek * mek
        else:
            smek = scale * me[None, :, k]
            var = dek * dek + smek * smek
        if scale is None:
            resid = dk - m[None, :, k]
        else:
            resid = dk - scale * m[None, :, k]
        chi2 = chi2 + mask * resid * resid / var
        if need_logvar:
            # Reference sums log(tot_var) over *all* filters (pdf.py:97-98),
            # masked or not.
            logvar = logvar + jnp.log(var)
    return chi2, logvar


@functools.partial(jax.jit,
                   static_argnames=("clean", "ignore_model_err", "dim_prior"))
def _loglike_fixed_jit(data, data_err, data_mask, models, models_err,
                       models_mask, *, clean=False, ignore_model_err=False,
                       dim_prior=True):
    d, de, dm = _atleast_2d(_f(data), _f(data_err), _f(data_mask))
    m, me, mm = _f(models), _f(models_err), _f(models_mask)
    if clean:
        d, de, dm = clean_data(d, de, dm)

    ndim = dm @ mm.T  # Ndim = sum of combined mask (exact: 0/1 entries)
    chi2, logvar = _filter_reduce(
        d, de, dm, m, me, mm,
        ignore_model_err=ignore_model_err, need_logvar=not dim_prior)
    if dim_prior:
        # Zero-overlap pairs (Ndim == 0): the chi^2 log-pdf with 0 dof is
        # inf - inf = NaN in the reference (pdf.py:90-93, degenerate
        # input); a NaN would poison the caller's max/logsumexp and
        # silently zero the whole object's PDF, so such pairs carry no
        # evidence: lnl = -inf (consistent with the fused kernels).
        lnl = _chi2_dim_logpdf(0.5 * ndim, chi2, max_ndim=d.shape[1])
        lnl = jnp.where(ndim > 0, lnl, -jnp.inf)
    else:
        lnl = -0.5 * chi2 - 0.5 * (ndim * _LOG_2PI + logvar)
    return LoglikeResult(lnl, ndim, chi2)


def loglike_fixed(data, data_err, data_mask, models, models_err, models_mask,
                  *, ignore_model_err=False, dim_prior=True):
    """Fixed-scale log-likelihood, batched over objects (jitted).

    Reference: `frankenz/pdf.py:27-100` (`_loglike`).

    Parameters have shapes (Nobj, Nfilt) for the data triplet and
    (Nmodel, Nfilt) for the model triplet; (Nfilt,) data is auto-promoted.
    Returns a `LoglikeResult` of (Nobj, Nmodel) arrays.
    """
    return _loglike_fixed_jit(data, data_err, data_mask, models, models_err,
                              models_mask, ignore_model_err=ignore_model_err,
                              dim_prior=dim_prior)


@functools.partial(jax.jit,
                   static_argnames=("clean", "ignore_model_err", "dim_prior",
                                    "return_scale"))
def _loglike_free_jit(data, data_err, data_mask, models, models_err,
                      models_mask, *, clean=False, ignore_model_err=False,
                      dim_prior=True, ltol=1e-3, return_scale=False,
                      max_iter=100):
    d, de, dm = _atleast_2d(_f(data), _f(data_err), _f(data_mask))
    m, me, mm = _f(models), _f(models_err), _f(models_mask)
    if clean:
        d, de, dm = clean_data(d, de, dm)
    dt = jnp.result_type(d.dtype, m.dtype)
    nobj, nfilt = d.shape
    nmodel = m.shape[0]

    ndim = dm @ mm.T

    if ignore_model_err and nobj >= 8:
        # MXU fast path: with datum-only variance every reduction over the
        # filter axis factorizes into matmuls (gated on batch size:
        # single-datum-inside-scan workloads like GNG training run faster
        # on the elementwise path) —
        #   inter = sum_f mask m d / s^2 = (dm d/s^2) @ (mm m)^T
        #   shape = sum_f mask m^2 / s^2 = (dm /s^2)  @ (mm m^2)^T
        #   chi2  = sum_f mask d^2/s^2 - inter^2/shape   (ML identity)
        # Exact in real arithmetic; in float32 the chi2 subtraction can
        # cancel for very-high-SNR data (error ~1e-7 * sum(d/s)^2) — the
        # elementwise path is retained for model-error configurations and
        # float64 runs bit-match the reference.
        inv_var = dm / (de * de)
        # HIGHEST on the accuracy-bearing dots: the MXU default rounds
        # f32 inputs to bf16 (~1e-3 relative), far over the 1e-6 parity
        # bar; the contraction axis is only Nfilt, so the full-f32
        # passes are ~free next to the (Nobj, Nmodel) elementwise work.
        # (ndim above keeps the default: 0/1 masks are exact in bf16.)
        hi = jax.lax.Precision.HIGHEST
        inter = jnp.dot(d * inv_var, (mm * m).T, precision=hi)
        shape_vals = jnp.dot(inv_var, (mm * m * m).T, precision=hi)
        A = jnp.dot(d * d * inv_var, mm.T, precision=hi)
        # Guarded divide: zero-overlap pairs (and all-zero-flux models)
        # have shape == 0; 0/0 = NaN would poison downstream
        # max/logsumexp (see _loglike_fixed_jit).
        scale = inter / jnp.maximum(shape_vals, jnp.finfo(dt).tiny)
        # Final chi2 in RESIDUAL form (pdf.py:188-189), not the matmul-
        # friendly ML identity A - inter*scale: the identity cancels to
        # ~eps*A of roundoff for near-perfect fits, so in float32 every
        # chi2 below ~100*eps*A was pure noise that legitimately
        # differed O(1) between accumulation orders (XLA vs the Pallas
        # tile on hardware) — and under the dof=1 chi2-prior (a1 = -1/2,
        # divergent density at 0) that noise turned into lmap wobble of
        # tens of nats (masked catalogs hit this on every near-exact
        # 2-common-band pair).  The residual form is non-cancelling
        # (relative error ~eps*sqrt(A/chi2), log-stable down to
        # ~eps*A/4), one unrolled pass over the tiny filter axis.
        chi2 = jnp.zeros_like(inter)
        for k in range(nfilt):
            rk = d[:, k:k + 1] - scale * m[None, :, k]
            chi2 = chi2 + (inv_var[:, k:k + 1] * mm[None, :, k]) * rk * rk
        # Floor at the per-pair cancellation scale 16*eps*A: below it
        # even the residual form is rounding noise (r ~ eps*d), and the
        # dof=1 dim-prior lnl = -0.5*log(chi2) must stay DETERMINISTIC
        # across paths for (near-)exact fits.  The fused tile floors
        # identically (ops/fused.py); the reference's f64 direct-form
        # chi2 has the same singularity, unguarded — a documented
        # deviation.
        chi2 = jnp.maximum(chi2, _CHI2_NOISE_MULT * jnp.finfo(dt).eps * A)
        logvar = jnp.sum(jnp.log(de * de), axis=1, keepdims=True)
        lnl = -0.5 * chi2 - 0.5 * (ndim * _LOG_2PI + logvar)
        if dim_prior:
            # dof = Ndim - 1 needs Ndim >= 2; degenerate pairs carry no
            # evidence (fused-kernel-consistent -inf).
            lnl = _chi2_dim_logpdf(0.5 * (ndim - 1.0),
                                   jnp.maximum(chi2, 1e-30),
                                   max_ndim=d.shape[1])
            lnl = jnp.where(ndim >= 2, lnl, -jnp.inf)
        else:
            # Zero-overlap pairs: the ML scale is 0/0 — NaN in the
            # reference (pdf.py:180-185); without this floor they'd get
            # the finite nonsense value -logvar/2 (which can even win
            # the row max).  Documented policy: no evidence, -inf.
            lnl = jnp.where(ndim > 0, lnl, -jnp.inf)
        if return_scale:
            return LoglikeResult(lnl, ndim, chi2, scale,
                                 jnp.sqrt(1.0 / shape_vals))
        return LoglikeResult(lnl, ndim, chi2)

    # General path: the per-pair variance de^2 + (s*me)^2 breaks the
    # matmul decomposition, so reduce over the (tiny) filter axis with
    # unrolled rank-1 passes — every accumulator is a single
    # (Nobj, Nmodel) tile and XLA fuses each pass; (Nobj, Nmodel, Nfilt)
    # temporaries are NEVER materialized (at 16K x 100K x 5 they would be
    # ~10 GB each).  The frozen-numerator semantics (pdf.py:181-183) hold
    # by construction: the masked numerators mask*m*d and mask*m^2 do not
    # depend on the variance, so recomputing them per filter column each
    # sweep is algebraically identical to freezing them.

    def sweep(scale_prev):
        """One fixed-point sweep: var(scale_prev) -> scale -> chi2/lnl.

        scale_prev=None means the initial un-scaled variance
        de^2 + me^2 (pdf.py:180-185).  chi2 is computed in the
        reference's RESIDUAL form ``sum mask (d - s m)^2 / var``
        (pdf.py:210-212) with a second pass over the filter axis —
        non-cancelling, unlike the ML identity ``A - s * inter`` (equal
        in real arithmetic, but ~eps*A of f32 roundoff for near-exact
        fits; see the MXU path).  The variance is recomputed per filter
        column in both passes, so no (Nobj, Nmodel, Nfilt) temporary is
        ever materialized.
        """
        inter = jnp.zeros((nobj, nmodel), dt)
        shape = jnp.zeros((nobj, nmodel), dt)
        A = jnp.zeros((nobj, nmodel), dt)
        logvar = jnp.zeros((nobj, nmodel), dt)

        def var_k(k):
            dek2 = (de[:, k] * de[:, k])[:, None]
            if ignore_model_err:
                return dek2 + jnp.zeros((1, nmodel), dt)
            mek = me[None, :, k]
            if scale_prev is None:
                return dek2 + mek * mek
            smek = scale_prev * mek
            return dek2 + smek * smek

        for k in range(nfilt):
            var = var_k(k)
            iv = 1.0 / var
            mask = dm[:, k:k + 1] * mm[None, :, k]
            mk = m[None, :, k]
            dk = d[:, k:k + 1]
            miv = mask * iv
            inter = inter + miv * mk * dk
            shape = shape + miv * mk * mk
            A = A + miv * dk * dk
            # Reference sums log(tot_var) over *all* filters
            # (pdf.py:97-98), masked or not.
            logvar = logvar + jnp.log(var)
        # Guarded divide: shape == 0 for zero-overlap pairs (see the MXU
        # path) — 0/0 NaN would also make the convergence loop spin to
        # max_iter (NaN never satisfies the |delta lnl| test).
        scale = inter / jnp.maximum(shape, jnp.finfo(dt).tiny)
        chi2 = jnp.zeros((nobj, nmodel), dt)
        for k in range(nfilt):
            iv = 1.0 / var_k(k)
            mask = dm[:, k:k + 1] * mm[None, :, k]
            rk = d[:, k:k + 1] - scale * m[None, :, k]
            chi2 = chi2 + (mask * iv) * rk * rk
        # Floor at the per-pair cancellation scale (see the MXU path).
        chi2 = jnp.maximum(chi2,
                           _CHI2_NOISE_MULT * jnp.finfo(dt).eps * A)
        lnl = -0.5 * chi2 - 0.5 * (ndim * _LOG_2PI + logvar)
        return scale, shape, chi2, lnl, A

    scale, shape_vals, chi2, lnl, A0 = sweep(None)

    if not ignore_model_err:
        # Convergence floor: lnl carries ~eps * A of roundoff (A = the
        # un-cancelled sum mask d^2/var term), so in float32 a tight
        # `ltol` can sit below the noise and the per-object |delta lnl|
        # test would never pass — every object would spin to max_iter.
        # Objects therefore also stop once |delta lnl| reaches the
        # roundoff scale; in float64 the floor (~1e-12) is far below any
        # practical ltol and the reference criterion is unchanged.
        eps = jnp.finfo(dt).eps

        def cond(state):
            _, _, _, _, done, it = state
            return jnp.logical_and(jnp.any(~done), it < max_iter)

        def body(state):
            lnl_c, scale_c, chi2_c, shape_c, done, it = state
            scale_n, shape_n, chi2_n, lnl_n, A_n = sweep(scale_c)
            # Per-object convergence: max over models (pdf.py:219-220).
            lerr = jnp.max(jnp.abs(lnl_n - lnl_c), axis=1)
            floor = 4.0 * eps * jnp.max(A_n, axis=1)
            keep = done[:, None]
            lnl_o = jnp.where(keep, lnl_c, lnl_n)
            scale_o = jnp.where(keep, scale_c, scale_n)
            chi2_o = jnp.where(keep, chi2_c, chi2_n)
            shape_o = jnp.where(keep, shape_c, shape_n)
            done_n = done | (lerr <= jnp.maximum(ltol, floor))
            return lnl_o, scale_o, chi2_o, shape_o, done_n, it + 1

        state = (lnl, scale, chi2, shape_vals,
                 jnp.zeros((nobj,), bool), jnp.asarray(0))
        lnl, scale, chi2, shape_vals, _, _ = jax.lax.while_loop(
            cond, body, state)

    if dim_prior:
        lnl = _chi2_dim_logpdf(0.5 * (ndim - 1.0),
                               jnp.maximum(chi2, 1e-30),
                               max_ndim=d.shape[1])
        # dof = Ndim - 1 needs Ndim >= 2 (see the MXU path).
        lnl = jnp.where(ndim >= 2, lnl, -jnp.inf)
    else:
        # Zero-overlap: 0/0 scale (reference NaN) -> -inf (see the
        # MXU path).
        lnl = jnp.where(ndim > 0, lnl, -jnp.inf)

    if return_scale:
        scale_err = jnp.sqrt(1.0 / shape_vals)
        return LoglikeResult(lnl, ndim, chi2, scale, scale_err)
    return LoglikeResult(lnl, ndim, chi2)


def loglike_free(data, data_err, data_mask, models, models_err, models_mask,
                 *, ignore_model_err=False, dim_prior=True, ltol=1e-3,
                 return_scale=False, max_iter=100):
    """Free-scale log-likelihood (models rescaled by the ML factor; jitted).

    Reference: `frankenz/pdf.py:103-235` (`_loglike_s`), including the
    frozen-numerator fixed-point iteration (pdf.py:197-223): the masked
    numerators ``m*d/var`` and ``m^2/var`` reuse the *initial* products and
    only the variance is refreshed with the previous scale.  Iteration stops
    per object once ``max_m |delta lnl|`` <= ltol; converged objects freeze
    (bit-for-bit with the reference's early exit) while others continue,
    bounded by `max_iter` (the reference loop is unbounded; 100 covers any
    practical ltol).
    """
    return _loglike_free_jit(data, data_err, data_mask, models, models_err,
                             models_mask, ignore_model_err=ignore_model_err,
                             dim_prior=dim_prior, ltol=ltol,
                             return_scale=return_scale, max_iter=max_iter)


def clean_data(data, data_err, data_mask):
    """Mask out non-finite / non-positive-error bands.

    Functional version of the reference's in-place sanitization
    (pdf.py:310-311): bad bands get value 0, error 1, mask 0.
    """
    d, de, dm = _f(data), _f(data_err), _f(data_mask)
    ok = jnp.isfinite(d) & jnp.isfinite(de) & (de > 0.0)
    return (jnp.where(ok, d, 0.0), jnp.where(ok, de, 1.0),
            jnp.where(ok, dm, 0.0))


def loglike(data, data_err, data_mask, models, models_err, models_mask,
            free_scale=False, ignore_model_err=False, dim_prior=True,
            ltol=1e-4, return_scale=False, **kwargs):
    """Dispatching wrapper with input sanitization.

    Reference: `frankenz/pdf.py:238-323`.  Note the reference forwards its
    default ``ltol=1e-4`` to `_loglike_s` (whose own default is 1e-3); we
    match that here.
    """
    if free_scale:
        return _loglike_free_jit(
            data, data_err, data_mask, models, models_err, models_mask,
            clean=True, ignore_model_err=ignore_model_err,
            dim_prior=dim_prior, ltol=ltol, return_scale=return_scale)
    return _loglike_fixed_jit(
        data, data_err, data_mask, models, models_err, models_mask,
        clean=True, ignore_model_err=ignore_model_err, dim_prior=dim_prior)


def static_spec(func, args=None, kwargs=None):
    """Hashable (func-or-None, args, sorted-kwargs-items) key for the
    module-level jitted fitter programs.

    The default `logprob` canonicalizes to None so every fitter instance
    (and every call site spelling) shares ONE compiled program — a site
    that skipped the canonicalization would silently fork the global jit
    cache and pay a fresh device compile per fitter instance
    (tests/test_recompile.py pins the cache sizes).
    """
    return (None if func is None or func is logprob else func,
            tuple(args or ()),
            tuple(sorted((kwargs or {}).items())))


def logprob(data, data_err, data_mask, models, models_err, models_mask,
            free_scale=False, ignore_model_err=False, dim_prior=True,
            ltol=1e-4, return_scale=False, **kwargs):
    """Flat-prior log-posterior — the fitters' default `lprob_func`.

    Reference: `frankenz/pdf.py:326-411`.  lnprior is identically zero and
    lnprob aliases lnlike; custom priors are added by passing a different
    `lprob_func` to the fitters (the reference's de-facto plugin API,
    SURVEY.md section 2.2).
    """
    res = loglike(data, data_err, data_mask, models, models_err, models_mask,
                  free_scale=free_scale, ignore_model_err=ignore_model_err,
                  dim_prior=dim_prior, ltol=ltol, return_scale=return_scale)
    lnprior = jnp.zeros_like(res.lnlike)
    return LogprobResult(lnprior, res.lnlike, res.lnlike, res.ndim, res.chi2,
                         res.scale, res.scale_err)
