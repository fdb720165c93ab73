"""
PDF post-processing: resampling and summary statistics.

Reference: `frankenz/pdf.py:855-1074` (`pdfs_resample`, `pdfs_summarize`).
The reference loops over objects for quantiles/confidence/risk
(pdf.py:993-1001, 1044-1068); here everything is vmapped `jnp.interp` and
the risk map is a single (Nobj, Ngrid) @ (Ngrid, Ngrid) MXU matmul.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["pdfs_resample", "pdfs_summarize", "PDFSummary", "PointEstimate",
           "SUMMARY_NCOLS", "loss_kernel_matrix", "summary_stream_step",
           "unpack_summary"]


class PointEstimate(NamedTuple):
    """A point estimator with its quality metrics, each of shape (Nobj,)."""

    point: jax.Array
    std: jax.Array
    conf: jax.Array
    risk: jax.Array


class PDFSummary(NamedTuple):
    """Full output of `pdfs_summarize`.

    Same content as the reference's 6-tuple (pdf.py:1070-1074): four point
    estimators (mean / median / mode / risk-minimizing "best") with
    (std, conf, risk) attached, the 95/68% credible bounds, and a Monte
    Carlo draw from each PDF.
    """

    mean: PointEstimate
    median: PointEstimate
    mode: PointEstimate
    best: PointEstimate
    low95: jax.Array
    low68: jax.Array
    high68: jax.Array
    high95: jax.Array
    mc: jax.Array


def pdfs_resample(pdfs, old_grid, new_grid, renormalize=True, left=0.0,
                  right=0.0):
    """Linearly resample PDFs onto a new grid (pdf.py:855-896)."""
    pdfs = jnp.atleast_2d(jnp.asarray(pdfs))
    old_grid = jnp.asarray(old_grid)
    new_grid = jnp.asarray(new_grid)
    new_pdfs = jax.vmap(
        lambda p: jnp.interp(new_grid, old_grid, p, left=left, right=right)
    )(pdfs)
    if renormalize:
        new_pdfs = new_pdfs / jnp.sum(new_pdfs, axis=1, keepdims=True)
    return new_pdfs


def _default_photoz_kern_grid(pgrid):
    """Photo-z loss argument grid (z_true - z_guess)/((1+z_true)*0.15).

    Reference default (pdf.py:1004-1011); rows index "truth", columns
    "guess".
    """
    ptrue = pgrid[:, None]
    pguess = pgrid[None, :]
    return (ptrue - pguess) / ((1.0 + ptrue) * 0.15)


def _loss_kernel(pkern, pkern_grid):
    """Evaluate the loss kernel over the grid (pdf.py:1012-1023)."""
    if pkern == "tophat":
        return (jnp.square(pkern_grid) < 1.0).astype(pkern_grid.dtype)
    if pkern == "gaussian":
        return jnp.exp(-0.5 * jnp.square(pkern_grid))
    if pkern == "lorentz":
        return 1.0 / (1.0 + jnp.square(pkern_grid))
    if callable(pkern):
        return pkern(pkern_grid)
    raise ValueError("unknown loss kernel: {!r}".format(pkern))


def loss_kernel_matrix(pgrid, pkern="lorentz", pkern_grid=None):
    """(Ngrid, Ngrid) complementary loss matrix 1 - kernel.

    The risk map is `pdfs @ loss_kernel_matrix(...)` (pdf.py:1024-1025);
    precompute it once when summarizing many batches over the same grid
    (see `summary_stream_step`).
    """
    pgrid = jnp.asarray(pgrid)
    if pkern_grid is None:
        pkern_grid = _default_photoz_kern_grid(pgrid)
    return 1.0 - _loss_kernel(pkern, jnp.asarray(pkern_grid))


def pdfs_summarize(pdfs, pgrid, renormalize=True, rng=None, pkern="lorentz",
                   pkern_grid=None, wconf_func=None):
    """Compute point estimators + quality metrics for a batch of PDFs.

    Reference: `frankenz/pdf.py:899-1074`.  Differences in surface only:
    the Monte Carlo draw takes a JAX PRNG key (`rng`) instead of a NumPy
    RandomState, and results come back in a `PDFSummary` NamedTuple whose
    field order matches the reference tuple.

    Point estimators: mean (L2), median (L1), mode (L0), and "best"
    (minimizing the expected loss under `pkern`, default the photo-z
    Lorentzian with dispersion 0.15).  Each carries std (second moment
    about the point), conf (PDF mass within +/- wconf_func(point), default
    (1+point)*0.03), and risk (expected loss at the point).
    """
    pdfs = jnp.atleast_2d(jnp.asarray(pdfs))
    pgrid = jnp.asarray(pgrid)
    if rng is None:
        rng = jax.random.key(0)
    u = jax.random.uniform(rng, (pdfs.shape[0],), dtype=pdfs.dtype)
    kern_c = loss_kernel_matrix(pgrid, pkern, pkern_grid)
    return _summarize_core(pdfs, pgrid, kern_c, u, renormalize, wconf_func)


def _summarize_core(pdfs, pgrid, kern_c, u, renormalize=True,
                    wconf_func=None):
    """`pdfs_summarize` body with the MC uniforms `u` (Nobj,) and the
    complementary loss matrix `kern_c` passed explicitly — jit-traceable
    with no per-call randomness or kernel rebuild (the streaming path)."""
    pdfs = jnp.atleast_2d(jnp.asarray(pdfs))
    if renormalize:
        pdfs = pdfs / jnp.sum(pdfs, axis=1, keepdims=True)

    # HIGHEST on the point-estimate dots: the MXU's default bf16 input
    # rounding costs ~1e-3 relative on TPU (see ops/kde.py `_matmul`);
    # point estimates carry the same parity contract as the PDFs.
    hi = jax.lax.Precision.HIGHEST
    pmean = jnp.dot(pdfs, pgrid, precision=hi)
    pmode = pgrid[jnp.argmax(pdfs, axis=1)]

    cdfs = jnp.cumsum(pdfs, axis=1)

    def quantiles(cdf, ui):
        qs = jnp.array([0.025, 0.16, 0.5, 0.84, 0.975])
        qv = jnp.interp(qs, cdf, pgrid)
        mc = jnp.interp(ui, cdf, pgrid)
        return qv, mc

    qvals, pmc = jax.vmap(quantiles)(cdfs, u)
    plow2, plow1, pmed, phigh1, phigh2 = (qvals[:, k] for k in range(5))

    # Risk map: expected loss of guessing column g when truth follows the
    # PDF — a single MXU contraction (pdf.py:1024-1025).
    prisk = jnp.dot(pdfs, kern_c, precision=hi)
    pbest = pgrid[jnp.argmin(prisk, axis=1)]

    def point_std(point):
        sqdev = jnp.square(pgrid[None, :] - point[:, None])
        return jnp.sqrt(jnp.sum(sqdev * pdfs, axis=1))

    if wconf_func is None:
        def wconf_func(point):
            return (1.0 + point) * 0.03

    def point_conf(point):
        width = wconf_func(point)
        lo = jax.vmap(jnp.interp, (0, None, 0))(point - width, pgrid, cdfs)
        hi = jax.vmap(jnp.interp, (0, None, 0))(point + width, pgrid, cdfs)
        return hi - lo

    def point_risk(point):
        return jax.vmap(jnp.interp, (0, None, 0))(point, pgrid, prisk)

    def estimate(point):
        return PointEstimate(point, point_std(point), point_conf(point),
                             point_risk(point))

    return PDFSummary(estimate(pmean), estimate(pmed), estimate(pmode),
                      estimate(pbest), plow2, plow1, phigh1, phigh2, pmc)


# Packed-column layout for the streaming summary path: 4 point estimators
# x (point, std, conf, risk), then the 4 credible bounds and the MC draw.
SUMMARY_NCOLS = 21


def _pack_summary(s):
    """PDFSummary -> (Nobj, SUMMARY_NCOLS) matrix (see SUMMARY_NCOLS)."""
    cols = []
    for est in (s.mean, s.median, s.mode, s.best):
        cols += [est.point, est.std, est.conf, est.risk]
    cols += [s.low95, s.low68, s.high68, s.high95, s.mc]
    return jnp.stack(cols, axis=1)


def unpack_summary(cols):
    """(Nobj, SUMMARY_NCOLS) matrix -> PDFSummary (inverse of packing)."""
    ests = [PointEstimate(cols[:, 4 * i], cols[:, 4 * i + 1],
                          cols[:, 4 * i + 2], cols[:, 4 * i + 3])
            for i in range(4)]
    return PDFSummary(*ests, cols[:, 16], cols[:, 17], cols[:, 18],
                      cols[:, 19], cols[:, 20])


def label_grid_of(label_dict, label_grid):
    """The label grid a fit_predict call will stack PDFs on (the
    fitters' shared `label_dict`-or-`label_grid` contract)."""
    if label_dict is not None:
        return np.asarray(label_dict.grid)
    if label_grid is not None:
        return np.asarray(label_grid)
    raise ValueError("`label_dict` or `label_grid` must be specified.")


def stream_summary_setup(grid, pkern="lorentz", pkern_grid=None,
                         summary_seed=0):
    """Factory for the fitters' streaming-summary hook.

    Returns ``setup(ndata, batch_size) -> (post, SUMMARY_NCOLS)`` where
    `post(pdf_batch, i0)` is the jitted on-device summary transform the
    fit_predict streaming loops apply before results leave the chip.
    The two-stage shape lets each fitter resolve its final (rounded)
    batch size first, so the once-drawn MC uniforms cover exactly the
    padded catalog and every batch slices the same global rows —
    results are independent of batching.
    """
    grid_dev = jnp.asarray(grid, jnp.float32)
    kern_c = jnp.asarray(loss_kernel_matrix(grid_dev, pkern, pkern_grid),
                         jnp.float32)

    def setup(ndata, batch_size):
        npad = -(-ndata // batch_size) * batch_size
        u_dev = jnp.asarray(
            np.random.default_rng(summary_seed).random(npad), jnp.float32)

        def post(pdf_b, i0):
            return summary_stream_step(pdf_b, grid_dev, kern_c, u_dev, i0)

        return post, SUMMARY_NCOLS

    return setup


@jax.jit
def summary_stream_step(pdfs, pgrid, kern_c, u_all, i0):
    """One streaming-summary batch: summarize `pdfs` (B, Ngrid) on device
    and return the packed (B, SUMMARY_NCOLS) column matrix.

    `u_all` holds the whole catalog's MC uniforms (drawn once on the
    host, so results are independent of batching); `i0` is the batch's
    first global row.  Everything stays on device — the caller reads
    back only the 21 summary columns, never the PDFs (the reference
    reads back every PDF and summarizes on the host, pdf.py:899-1074;
    over a remote-TPU relay that readback dominates the wall time).
    Default conf window and renormalization; custom `wconf_func`/`pkern`
    consumers use `pdfs_summarize` on materialized PDFs.
    """
    u = jax.lax.dynamic_slice_in_dim(u_all, i0, pdfs.shape[0])
    return _pack_summary(_summarize_core(pdfs, pgrid, kern_c, u))
