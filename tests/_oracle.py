"""Independent NumPy oracle implementations of the reference math.

These follow the equations and control flow documented in SURVEY.md
sections 2.3 (correctness contract) — masked chi^2 with combined variance,
the chi^2-distribution dimensionality prior, the frozen-numerator
free-scale iteration, truncated/renormalized KDE stacking — written
straightforwardly in float64 NumPy.  They exist purely as test oracles for
the JAX/Pallas implementations.
"""

import numpy as np
from scipy.special import gammaln, xlogy


def loglike_fixed_1(d, de, dm, m, me, mm, ignore_model_err=False,
                    dim_prior=True):
    """Fixed-scale log-likelihood of one datum against all models."""
    var = de**2 + (0.0 if ignore_model_err else me**2)
    var = np.broadcast_to(var, m.shape).astype(float)
    mask = dm * mm
    ndim = mask.sum(axis=1)
    chi2 = (mask * (d - m) ** 2 / var).sum(axis=1)
    if dim_prior:
        a = 0.5 * ndim
        lnl = xlogy(a - 1.0, chi2) - chi2 / 2.0 - gammaln(a) - np.log(2.0) * a
    else:
        lnl = -0.5 * chi2 - 0.5 * (ndim * np.log(2 * np.pi)
                                   + np.log(var).sum(axis=1))
    return lnl, ndim, chi2


def loglike_free_1(d, de, dm, m, me, mm, ignore_model_err=False,
                   dim_prior=True, ltol=1e-3, return_scale=False):
    """Free-scale log-likelihood of one datum against all models.

    Frozen-numerator fixed-point iteration: the masked m*d and m^2 products
    are built once from the initial mask and only re-divided by the
    refreshed variance sigma_d^2 + (s*sigma_m)^2.
    """
    var = de**2 + (0.0 if ignore_model_err else me**2)
    var = np.broadcast_to(var, m.shape).astype(float)
    mask = dm * mm
    ndim = mask.sum(axis=1)

    num_inter = mask * m * d[None, :]
    num_shape = mask * m**2
    inter = (num_inter / var).sum(axis=1)
    shape = (num_shape / var).sum(axis=1)
    s = inter / shape
    chi2 = (mask * (d - s[:, None] * m) ** 2 / var).sum(axis=1)
    lnl = (-0.5 * chi2
           - 0.5 * (ndim * np.log(2 * np.pi) + np.log(var).sum(axis=1)))

    if not ignore_model_err:
        err = np.inf
        while err > ltol:
            var = de**2 + (s[:, None] * me) ** 2
            inter = (num_inter / var).sum(axis=1)
            shape = (num_shape / var).sum(axis=1)
            s_new = inter / shape
            chi2 = (mask * (d - s_new[:, None] * m) ** 2 / var).sum(axis=1)
            lnl_new = (-0.5 * chi2 - 0.5 * (ndim * np.log(2 * np.pi)
                                            + np.log(var).sum(axis=1)))
            err = np.max(np.abs(lnl_new - lnl))
            lnl, s = lnl_new, s_new

    if dim_prior:
        a = 0.5 * (ndim - 1.0)
        lnl = xlogy(a - 1.0, chi2) - chi2 / 2.0 - gammaln(a) - np.log(2.0) * a

    if return_scale:
        return lnl, ndim, chi2, s, np.sqrt(1.0 / shape)
    return lnl, ndim, chi2


def loglike(data, data_err, data_mask, models, models_err, models_mask,
            free_scale=False, ignore_model_err=False, dim_prior=True,
            ltol=1e-4, return_scale=False):
    """Batched oracle: loops over objects, sanitizing bad bands first."""
    data = np.atleast_2d(np.asarray(data, float)).copy()
    data_err = np.atleast_2d(np.asarray(data_err, float)).copy()
    data_mask = np.atleast_2d(np.asarray(data_mask, float)).copy()
    bad = ~(np.isfinite(data) & np.isfinite(data_err) & (data_err > 0))
    data[bad], data_err[bad], data_mask[bad] = 0.0, 1.0, 0.0

    rows = []
    for d, de, dm in zip(data, data_err, data_mask):
        if free_scale:
            rows.append(loglike_free_1(
                d, de, dm, models, models_err, models_mask,
                ignore_model_err=ignore_model_err, dim_prior=dim_prior,
                ltol=ltol, return_scale=return_scale))
        else:
            rows.append(loglike_fixed_1(
                d, de, dm, models, models_err, models_mask,
                ignore_model_err=ignore_model_err, dim_prior=dim_prior))
    return tuple(np.stack(cols) for cols in zip(*rows))


def gaussian(mu, std, x):
    return np.exp(-0.5 * ((x - mu) / std) ** 2) / (np.sqrt(2 * np.pi) * std)


def _select_weights(y_wt, wt_thresh, cdf_thresh):
    """Indices of retained mixture components (SURVEY.md section 2.3):
    weights above ``wt_thresh * max`` when a weight threshold is given,
    else everything but the lightest ``cdf_thresh`` tail of the
    ascending-sorted cumulative weight mass."""
    if wt_thresh is not None:
        return np.flatnonzero(y_wt > wt_thresh * np.max(y_wt))
    order = np.argsort(y_wt)
    cdf = np.cumsum(y_wt[order])
    cdf = cdf / cdf[-1]
    return order[cdf <= 1.0 - cdf_thresh]


def gauss_kde_1(y, y_std, x, y_wt, sig_thresh=5.0, wt_thresh=1e-3,
                cdf_thresh=2e-4):
    """Single-PDF truncated-Gaussian KDE stack on grid `x`.

    Window-mask formulation: each retained component contributes a
    Gaussian evaluated on the grid points whose integer index falls
    inside [center - halfwidth, center + halfwidth), where center is the
    component's (floor-quantized) grid position and halfwidth the
    quantized ``sig_thresh`` truncation radius; the contribution is
    renormalized to unit mass over those retained points.  Off-grid
    components simply have empty windows.  (The exclusive upper bound
    makes the window asymmetric by one cell — the reference's
    discretization, kept for parity.)
    """
    nx = len(x)
    dx = x[1] - x[0]
    centers = np.asarray((y - x[0]) / dx, dtype=int)
    halfwidths = np.asarray(sig_thresh * y_std / dx, dtype=int)
    gidx = np.arange(nx)

    pdf = np.zeros(nx)
    for i in _select_weights(y_wt, wt_thresh, cdf_thresh):
        inside = ((gidx >= centers[i] - halfwidths[i])
                  & (gidx < centers[i] + halfwidths[i]))
        vals = gaussian(y[i], y_std[i], x[inside])
        norm = vals.sum()
        if norm != 0.0:
            pdf[inside] += y_wt[i] / norm * vals
    return pdf


def gauss_kde_dict_1(pdfdict, y_idx, y_std_idx, y_wt, wt_thresh=1e-3,
                     cdf_thresh=2e-4):
    """Single-PDF dictionary KDE stack (edge-renormalized kernels).

    Window-mask formulation: a dictionary kernel of half-width w is a
    (2w+1)-vector whose element j sits at grid index pos - w + j.  The
    in-grid part of the window is selected with a boolean mask, and the
    retained kernel mass (the same quantity the reference reads off a
    precomputed kernel CDF) is just the kernel sum over that mask —
    contributions are divided by it so every stacked kernel integrates
    to its weight over the grid.
    """
    nx = pdfdict.Ngrid
    pdf = np.zeros(nx)
    for i in _select_weights(y_wt, wt_thresh, cdf_thresh):
        pos = int(y_idx[i])
        kidx = int(y_std_idx[i])
        kernel = np.asarray(pdfdict.sigma_dict[kidx])
        width = int(pdfdict.sigma_width[kidx])
        gidx = pos + np.arange(-width, width + 1)
        inside = (gidx >= 0) & (gidx < nx)
        if not inside.any():
            continue
        norm = kernel[inside].sum()
        pdf[gidx[inside]] += (y_wt[i] / norm) * kernel[inside]
    return pdf
