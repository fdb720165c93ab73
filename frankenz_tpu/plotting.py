"""
Diagnostics and plotting.

Reference: `frankenz/plotting.py` (`input_vs_pdf` :31, `input_vs_dpdf`
:184, `cdf_vs_epdf` :369, `cdf_vs_ecdf` :443, `plot2d_network` :524,
`plot_node` :681).

Compute is vectorized (the 2-D PDF stacks are a single MXU matmul; the
coverage tests are vmapped interpolation); rendering stays host-side
matplotlib.  matplotlib is imported lazily so headless/compute-only usage
never touches it.

Key reformulation: the reference stacks, per object, the outer product of
its (window-renormalized) x-kernel with its (thresholded, renormalized)
PDF (plotting.py:129-159).  Since the joint normalization factorizes,

    stack = (w * Gx).T @ Pn

with Gx the (Nobj, Ngrid_x) dictionary kernel-row matrix and Pn the
(Nobj, Ngrid_y) thresholded-renormalized PDFs — one matmul.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from scipy.ndimage import gaussian_filter

from .ops import kde as _kde

__all__ = ["input_vs_pdf", "input_vs_dpdf", "cdf_vs_epdf", "cdf_vs_ecdf",
           "plot2d_network", "plot_node"]


def _plt():
    import matplotlib.pyplot as plt

    return plt


@functools.partial(jax.jit, static_argnames=("mode",))
def _weight_sel_jit(weights, thresh, mode):
    if mode == "wt":
        return jnp.where(weights > thresh * jnp.max(weights), weights, 0.0)
    order = jnp.argsort(weights)
    cdf = jnp.cumsum(weights[order])
    cdf = cdf / cdf[-1]
    keep = jnp.zeros(weights.shape, bool).at[order].set(
        cdf <= (1.0 - thresh))
    return jnp.where(keep, weights, 0.0)


def _outer_weight_sel(weights, nobj, wt_thresh, cdf_thresh):
    """Per-object stacking weights after outer thresholding
    (plotting.py:93-107) — on device (one jitted sort/scan)."""
    if weights is None:
        weights = np.ones(nobj, np.float32)
    weights = jnp.asarray(weights, float)
    if wt_thresh is None and cdf_thresh is None:
        return weights
    if wt_thresh is not None:
        return _weight_sel_jit(weights, float(wt_thresh), "wt")
    return _weight_sel_jit(weights, float(cdf_thresh), "cdf")


@functools.partial(jax.jit, static_argnames=("mode",))
def _renorm_pdfs_jit(P, thresh, mode):
    if mode == "none":
        keep = jnp.ones(P.shape, bool)  # reference: wt_thresh = -inf
    elif mode == "wt":
        keep = P > jnp.max(P, axis=1, keepdims=True) * thresh
    else:
        order = jnp.argsort(P, axis=1)
        cs = jnp.cumsum(jnp.take_along_axis(P, order, axis=1), axis=1)
        keep = jnp.zeros(P.shape, bool).at[
            jnp.arange(P.shape[0])[:, None], order].set(
                cs <= (1.0 - thresh))
    P = jnp.where(keep, P, 0.0)
    norm = jnp.sum(P, axis=1, keepdims=True)
    return jnp.where(norm > 0, P / jnp.where(norm > 0, norm, 1.0), 0.0)


def _threshold_renorm_pdfs(pdfs, pdf_wt_thresh, pdf_cdf_thresh):
    """Per-row PDF thresholding + renormalization (plotting.py:138-144).

    NB: the reference's *plotting* cdf cut runs on the UNNORMALIZED
    cumsum (plotting.py:325-328) — unlike ``gauss_kde``'s normalized one
    (pdf.py:512-516) — so the kept mass depends on the row's sum.  That
    matters for ``input_vs_dpdf``, whose resampled rows no longer sum
    to 1.  Runs on device (jitted: the per-row sort + cumsum + scatter
    feeding the one-matmul 2-D stack), so catalog-scale diagnostics are
    not host-bound by an O(Nobj*Ngrid log Ngrid) numpy pass (timing at
    the 1M-object serving scale: docs/PARITY.md "plotting" note).
    Tie order among exactly-equal positive cells follows jnp.argsort
    (stable) rather than np.argsort (introsort); ties only arise from
    duplicate models and land inside the same kept/dropped boundary
    class."""
    if pdf_wt_thresh is None and pdf_cdf_thresh is None:
        mode, thresh = "none", 0.0
    elif pdf_wt_thresh is not None:
        mode, thresh = "wt", float(pdf_wt_thresh)
    else:
        mode, thresh = "cdf", float(pdf_cdf_thresh)
    return _renorm_pdfs_jit(jnp.asarray(pdfs, float), thresh, mode)


def _stack2d(vals, errs, vdict, Pn, weights):
    """(Ngrid_x, Ngrid_y) density stack = (w * Gx).T @ Pn."""
    vidx, eidx = vdict.fit(jnp.asarray(vals), jnp.asarray(errs))
    Gx = _kde.kernel_matrix_dict(vdict, vidx, eidx)  # (Nobj, Ngrid_x)
    W = jnp.asarray(weights)[:, None] * Gx
    # Stack-dot precision: see ops/kde.py STACK_PRECISION (PDF contract).
    return np.asarray(jnp.dot(W.T, jnp.asarray(Pn),
                              precision=_kde.STACK_PRECISION))


def input_vs_pdf(vals, errs, vdict, pdfs, pgrid, weights=None,
                 pdf_wt_thresh=1e-3, pdf_cdf_thresh=2e-4, wt_thresh=1e-3,
                 cdf_thresh=2e-4, plot_thresh=0.0, cmap="viridis", smooth=0,
                 plot_kwargs=None, verbose=False, plot=True, **kwargs):
    """2-D stack of input values vs predicted PDFs (plotting.py:31-181).

    Returns the (Ngrid_x, Ngrid_y) stacked density; with ``plot=True``
    also renders the reference's imshow panel.
    """
    del verbose
    nobj = len(vals)
    weights = _outer_weight_sel(weights, nobj, wt_thresh, cdf_thresh)
    Pn = _threshold_renorm_pdfs(pdfs, pdf_wt_thresh, pdf_cdf_thresh)
    stack = _stack2d(vals, errs, vdict, Pn, weights)
    if smooth != 0:
        stack = gaussian_filter(stack, smooth)
    if plot:
        plt = _plt()
        img = np.array(stack)
        img[img < plot_thresh] = np.nan
        plt.imshow(img.T, origin="lower", aspect="auto",
                   extent=(vdict.grid[0], vdict.grid[-1], pgrid[0],
                           pgrid[-1]), cmap=cmap, **(plot_kwargs or {}))
        plt.colorbar(label="Number Density")
        plt.xlim([vdict.grid[0], vdict.grid[-1]])
        plt.ylim([pgrid[0], pgrid[-1]])
        plt.xlabel("Input")
        plt.ylabel("Predicted")
        plt.tight_layout()
    return stack


def input_vs_dpdf(vals, errs, vdict, pdfs, pgrid, pdf_cent, dgrid,
                  disp_func=None, disp_args=(), disp_kwargs=None,
                  weights=None, pdf_wt_thresh=1e-3, pdf_cdf_thresh=2e-4,
                  wt_thresh=1e-3, cdf_thresh=2e-4, plot_thresh=0.0,
                  cmap="viridis", smooth=0, plot_kwargs=None, verbose=False,
                  plot=True, **kwargs):
    """2-D stack of inputs vs *centered-dispersion* PDFs
    (plotting.py:184-366): each PDF is re-sampled onto `dgrid` in the
    dispersion coordinate ``disp_func(pgrid, pdf_cent)`` (default
    ``pgrid - cent``) before stacking."""
    del verbose
    nobj = len(vals)
    disp_kwargs = disp_kwargs or {}
    if disp_func is None:
        def disp_func(pg, cent):
            return pg - cent
    weights = _outer_weight_sel(weights, nobj, wt_thresh, cdf_thresh)

    pgrid_j = jnp.asarray(pgrid)
    dgrid_j = jnp.asarray(dgrid)

    def recenter(pdf, cent):
        dx = disp_func(pgrid_j, cent, *disp_args, **disp_kwargs)
        return jnp.interp(dgrid_j, dx, pdf)

    dpdfs = np.asarray(jax.vmap(recenter)(jnp.asarray(pdfs),
                                          jnp.asarray(pdf_cent)))
    Pn = _threshold_renorm_pdfs(dpdfs, pdf_wt_thresh, pdf_cdf_thresh)
    stack = _stack2d(vals, errs, vdict, Pn, weights)
    if smooth != 0:
        stack = gaussian_filter(stack, smooth)
    if plot:
        plt = _plt()
        img = np.array(stack)
        img[img < plot_thresh] = np.nan
        plt.imshow(img.T, origin="lower", aspect="auto",
                   extent=(vdict.grid[0], vdict.grid[-1], dgrid[0],
                           dgrid[-1]), cmap=cmap, **(plot_kwargs or {}))
        plt.colorbar(label="Number Density")
        plt.xlabel("Input")
        plt.ylabel("Predicted")
        plt.tight_layout()
    return stack


def _cdf_draws(vals, errs, pdfs, pdf_grid, Nmc, rng):
    """(Nobj, Nmc) CDF values at MC-jittered truths (plotting.py:421-428)."""
    nobj = len(vals)
    mc = rng.normal(np.asarray(vals)[:, None], np.asarray(errs)[:, None],
                    (nobj, Nmc))

    pdfs_j = jnp.asarray(pdfs)
    grid_j = jnp.asarray(pdf_grid)

    def one(pdf, m):
        cdf = jnp.cumsum(pdf)
        cdf = cdf / cdf[-1]
        return jnp.interp(m, grid_j, cdf)

    return np.asarray(jax.vmap(one)(pdfs_j, jnp.asarray(mc)))


def cdf_vs_epdf(vals, errs, pdfs, pdf_grid, Nmc=100, weights=None,
                Nbins=50, plot_kwargs=None, rng=None, seed=None, plot=True,
                **kwargs):
    """Coverage test: histogram of CDF values at MC-jittered truths
    (plotting.py:369-440).  Well-calibrated PDFs give ~Uniform(0,1).
    Returns the normalized bin counts."""
    nobj = len(vals)
    rng = rng if rng is not None else np.random.default_rng(seed)
    if weights is None:
        weights = np.ones(nobj, np.float32)
    w = np.repeat(np.asarray(weights, float), Nmc)
    draws = _cdf_draws(vals, errs, pdfs, pdf_grid, Nmc, rng).ravel()
    bins = np.linspace(0.0, 1.0, Nbins + 1)
    n, _ = np.histogram(draws, bins=bins, weights=w, density=True)
    if plot:
        plt = _plt()
        pk = plot_kwargs or {"color": "blue", "alpha": 0.6}
        plt.hist(draws, bins=bins, weights=w, density=True, **pk)
        plt.xlabel("CDF Draws")
        plt.ylabel("Normalized Counts")
    return n


def cdf_vs_ecdf(vals, errs, pdfs, pdf_grid, Nmc=100, weights=None,
                plot_kwargs=None, rng=None, seed=None, plot=True, **kwargs):
    """Coverage test: sorted CDF draws vs the weighted empirical CDF
    (plotting.py:443-521).  Returns (x, y); calibrated PDFs give y ~ x."""
    nobj = len(vals)
    rng = rng if rng is not None else np.random.default_rng(seed)
    if weights is None:
        weights = np.ones(nobj, np.float32)
    w = np.repeat(np.asarray(weights, float), Nmc)
    draws = _cdf_draws(vals, errs, pdfs, pdf_grid, Nmc, rng).ravel()
    order = np.argsort(draws)
    ds, ws = draws[order], w[order]
    dd = np.append(ds[0], np.diff(ds))
    x = np.cumsum(ws) / ws.sum()
    y = np.cumsum(ws * dd)
    y = y / y[-1]
    if plot:
        plt = _plt()
        pk = plot_kwargs or {"color": "blue", "alpha": 0.6}
        plt.plot(x, y, **pk)
        plt.xlabel("Sorted CDF Draws")
        plt.ylabel("Empirical CDF")
    return x, y


def _weighted_median(ys, wts):
    order = np.argsort(ys)
    cdf = np.cumsum(wts[order])
    return np.interp(0.5, cdf, ys[order])


def plot2d_network(network, counts="weighted", label_name=None, labels=None,
                   labels_err=None, vals=None, dims=(0, 1), cmap="viridis",
                   Nmc=5, point_est="median", plot_kwargs=None, rng=None,
                   seed=None, discrete=False, verbose=True, plot=True,
                   **kwargs):
    """Scatter the network's projected nodes colored by a per-node value
    (plotting.py:524-678): member counts, weighted counts, or a weighted
    point estimate (mean/median/std/mad or a custom ``f(labels, wts)``)
    of member labels (with optional Monte Carlo label errors)."""
    del verbose
    rng = rng if rng is not None else np.random.default_rng(seed)
    nnodes = network.NNODE
    xpos = np.asarray(network.nodes_pos)[:, dims[0]]
    ypos = np.asarray(network.nodes_pos)[:, dims[1]]
    if label_name is None and (labels is not None or vals is not None):
        label_name = "Node Value"

    if vals is None and labels is None:
        if counts == "absolute":
            vals = np.asarray(network.nodes_Nmatch, float)
            label_name = label_name or "Counts"
        elif counts == "weighted":
            lw = np.asarray(network.nodes_logwts, float)
            with np.errstate(over="ignore"):
                vals = np.exp(jax.scipy.special.logsumexp(
                    jnp.asarray(lw), axis=1))
            vals = np.asarray(vals)
            label_name = label_name or "Weighted Counts"
        else:
            raise ValueError("unknown `counts` option: {!r}".format(counts))

    if vals is None and labels is not None:
        labels = np.asarray(labels)
        vals = np.zeros(nnodes)
        for i in range(nnodes):
            n = int(network.nodes_Nmatch[i] if not discrete
                    else network.nodes_Nbmu[i])
            if n == 0:
                vals[i] = np.nan
                continue
            if discrete:
                idxs = network.nodes_bmus[i, :n]
                wts = np.full(n, 1.0 / n)
            else:
                idxs = network.nodes_idxs[i, :n]
                lw = network.nodes_logwts[i, :n]
                wts = np.exp(lw - lw.max())
                wts /= wts.sum()
            ys = labels[idxs]
            if labels_err is not None:
                yes = np.asarray(labels_err)[idxs]
                ys = rng.normal(np.tile(ys, Nmc), np.tile(yes, Nmc))
                wts = np.tile(wts, Nmc) / Nmc
            if point_est == "mean":
                vals[i] = wts @ ys
            elif point_est == "median":
                vals[i] = _weighted_median(ys, wts)
            elif point_est == "std":
                vals[i] = wts @ np.square(ys - wts @ ys)
            elif point_est == "mad":
                med = _weighted_median(ys, wts)
                vals[i] = _weighted_median(np.abs(ys - med), wts)
            elif callable(point_est):
                vals[i] = point_est(ys, wts)
            else:
                raise ValueError("unknown `point_est`: {!r}"
                                 .format(point_est))

    if plot:
        plt = _plt()
        plt.scatter(xpos, ypos, c=vals, cmap=cmap, **(plot_kwargs or {}))
        plt.xlabel(r"$x_{}$".format(dims[0]))
        plt.ylabel(r"$x_{}$".format(dims[1]))
        plt.colorbar(label=label_name)
    return vals


def plot_node(network, models, models_err, pos=None, idx=None,
              models_x=None, Nrsamp=1, Nmc=5, node_kwargs=None,
              violin_kwargs=None, rng=None, seed=None, discrete=False,
              plot=True, **kwargs):
    """Violin plot of one node's member photometry vs the node model
    (plotting.py:681-789).  Members are resampled by weight, Monte Carlo
    jittered by their errors, de-scaled by their fitted scale factors, and
    the node model gets a small least-squares rescaling if needed."""
    rng = rng if rng is not None else np.random.default_rng(seed)
    models = np.asarray(models)
    models_err = np.asarray(models_err)
    if models_x is None:
        models_x = np.arange(models.shape[-1]) + 1

    (idx, node_model, _npos, idxs, logwts, scales,
     scales_err) = network.get_node(pos=pos, idx=idx, discrete=discrete)
    tmodels, tmodels_err = models[idxs], models_err[idxs]
    lw = np.asarray(logwts, float)
    wts = np.exp(lw - lw.max())
    wts /= wts.sum()

    nmatch = len(idxs)
    rs = rng.choice(nmatch, p=wts, size=nmatch * Nrsamp)
    mc = rng.normal(tmodels[rs], tmodels_err[rs])
    snorm = np.mean(np.asarray(scales)[rs])
    mc = mc / (np.asarray(scales)[rs, None] / snorm)

    mean_model = mc.mean(axis=0)
    std_model = mc.std(axis=0)
    num = (mean_model / std_model) @ (node_model / std_model)
    den = (node_model / std_model) @ (node_model / std_model)
    node_scale = num / den
    if abs(node_scale - 1.0) < 0.05:
        node_scale = 1.0

    if plot:
        plt = _plt()
        nk = dict(color="black", marker="*", markersize=10, alpha=0.6)
        nk.update(node_kwargs or {})
        vk = dict(widths=600, showextrema=False)
        vk.update(violin_kwargs or {})
        plt.plot(models_x, node_model * node_scale, **nk)
        for i in range(models.shape[-1]):
            plt.violinplot(mc[:, i], [models_x[i]], **vk)
        plt.ylim([float((mean_model - 3 * std_model).min()),
                  float((mean_model + 3 * std_model).max())])
    return node_model * node_scale, mc
