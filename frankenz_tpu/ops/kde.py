"""
Weighted kernel density estimation of label PDFs on a fixed grid.

Reference: `frankenz/pdf.py:414-852` (`gaussian`, `gaussian_bin`,
`gauss_kde`, `gauss_kde_dict`, `PDFDict`).

The reference stacks truncated Gaussian kernels one object at a time with a
Python loop and in-place slice adds (pdf.py:519-525, 603-620).  The TPU
formulation observes that for a *fixed* set of label positions/widths the
weighted KDE is a linear map of the weights:

    pdfs (Nobj, Ngrid) = weights (Nobj, Nmodel) @ G (Nmodel, Ngrid)

where row j of ``G`` is model j's truncated, window-renormalized kernel.
``G`` is precomputed once per label set (host- or device-side), and the
stack becomes a single MXU matmul — this is also the formulation the fused
Pallas pipeline uses, contracting weight tiles against ``G`` tiles without
materializing the (Nobj, Nmodel) weight grid.

Exact-parity details replicated from the reference:

* kernels truncated at ``sig_thresh`` (default 5) sigma and renormalized
  over the *retained, in-grid* window (pdf.py:519-525; dict edge handling
  pdf.py:610-620); objects whose window-sum is zero contribute nothing.
* `gauss_kde` discretizes window bounds with int() truncation
  (pdf.py:499-502) and clamps ``upper`` to Ngrid / ``lower`` to 0.
  Documented deviation: for labels far *below* the grid the reference's
  un-clamped negative ``upper`` triggers Python negative-slice indexing
  (``x[0:-50]``) and spuriously stacks the label's whole weight,
  renormalized, into the left grid tail; labels far above the grid
  contribute nothing.  We treat both sides symmetrically (no
  contribution) instead of reproducing the negative-slice artifact.
* weight thresholding keeps ``wt > wt_thresh * max(wt)`` (default 1e-3);
  when ``wt_thresh=None``, the CDF rule keeps objects whose
  smallest-first cumulative weight is <= 1 - cdf_thresh (pdf.py:508-516).
  NOTE: the reference's CDF rule always drops the single largest weight
  (its cumulative value is exactly 1) — we replicate that behavior
  faithfully rather than "fix" it.
* `PDFDict.fit` rounds means to the nearest grid index (unclamped) and
  sigmas to the nearest dictionary index clamped to [0, Ndict-1]
  (pdf.py:844-850).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import erf

__all__ = [
    "STACK_PRECISION",
    "norm_rows",
    "gaussian",
    "gaussian_bin",
    "PDFDict",
    "kernel_matrix",
    "kernel_matrix_dict",
    "threshold_weights",
    "kde_stack",
    "kde_stack_gathered",
    "kde_stack_gathered_dict",
    "gauss_kde",
    "gauss_kde_dict",
    "resolve_kde_opts",
]


def resolve_kde_opts(kde_args=None, kde_kwargs=None, wt_thresh=1e-3,
                     cdf_thresh=2e-4):
    """Resolve the reference's `kde_args`/`kde_kwargs` forwarding into
    ``(dx, sig_thresh, wt_thresh, cdf_thresh)``.

    The reference forwards ``*kde_args, **kde_kwargs`` into
    `gauss_kde(y, y_std, x, dx=None, y_wt=None, sig_thresh=5., ...)`
    (bruteforce.py:363-369), so the first positional arg binds `dx` and
    the kwargs may override `dx`/`sig_thresh`/`wt_thresh`/`cdf_thresh`
    (the dict variant honors only the thresholds, like
    `gauss_kde_dict`).  Fitter-level `wt_thresh`/`cdf_thresh` arguments
    act as defaults that `kde_kwargs` can override.

    Only ONE positional kde_arg is accepted: the reference spells the
    call `gauss_kde(y, y_std, x, y_wt=wt, *kde_args, ...)`, so a second
    positional would collide with the keyword `y_wt` and raise there
    too — pass `sig_thresh` etc. through `kde_kwargs`.
    """
    args = tuple(kde_args or ())
    if len(args) > 1:
        raise TypeError(
            "kde_args accepts at most one positional value (dx): the "
            "reference call gauss_kde(y, y_std, x, y_wt=wt, *kde_args) "
            "raises on more (collision with y_wt). Pass sig_thresh / "
            "wt_thresh / cdf_thresh via kde_kwargs.")
    kw = dict(kde_kwargs or {})
    dx = args[0] if args else kw.get("dx")
    sig_thresh = float(kw.get("sig_thresh", 5.0))
    wt_thresh = kw.get("wt_thresh", wt_thresh)
    cdf_thresh = kw.get("cdf_thresh", cdf_thresh)
    return dx, sig_thresh, wt_thresh, cdf_thresh


# Matmul precision for every PDF-stack dot (wts @ G here, the fused
# Pallas tiles, the ring/sharded mesh paths, node-PDF stacking, and the
# plotting 2-D stacks).  The MXU's DEFAULT rounds f32 inputs to bf16
# (~2e-3 relative noise on stacked cells, measured on v5e); HIGHEST is
# the full 6-pass f32 emulation and measurably slows the flop-dominant
# stack dot (config 4: 2.80e10 -> 1.65e10 pair-evals/s).  HIGH — the
# 3-pass bf16 decomposition, ~2^-17 relative per product, far inside
# the f32 stack contract — is the measured sweet spot and the default.
# Mosaic does not lower Precision.HIGH, so the Pallas tiles emulate it
# with an explicit hi/lo bf16 split (ops/fused.py `_stack_dot`); the
# XLA paths pass it natively.  Override with
# FRANKENZ_STACK_PRECISION={default,high,highest} before import
# (measurements: docs/MXU_NOTE.md).  GOF-contractual dots (summarize
# risk, the opt-in MXU chi2 expansion) are NOT governed by this knob —
# they stay HIGHEST unconditionally.
STACK_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}[os.environ.get("FRANKENZ_STACK_PRECISION", "high").lower()]


def norm_rows(pdf):
    """Normalize PDF rows to sum 1; all-zero rows stay zero (the fitters'
    shared per-object normalization, bruteforce.py:370, :629)."""
    norm = jnp.sum(pdf, axis=1, keepdims=True)
    return jnp.where(norm > 0, pdf / jnp.where(norm > 0, norm, 1.0), 0.0)


_SQRT_2PI = 2.5066282746310002


def gaussian(mu, std, x):
    """Gaussian PDF N(x | mu, std) on grid `x` (pdf.py:414-425)."""
    mu, std, x = jnp.asarray(mu), jnp.asarray(std), jnp.asarray(x)
    dif = x - mu
    return jnp.exp(-0.5 * jnp.square(dif / std)) / (_SQRT_2PI * std)


def gaussian_bin(mu, std, bins):
    """Gaussian PDF integrated over bins with edges `bins` (pdf.py:428-441).

    Returns a vector one shorter than `bins`.
    """
    mu, std, bins = jnp.asarray(mu), jnp.asarray(std), jnp.asarray(bins)
    y = (bins - mu) / (jnp.sqrt(2.0) * std)
    cdf = 0.5 * (1.0 + erf(y))
    return cdf[..., 1:] - cdf[..., :-1]


class PDFDict:
    """Discretized grid + Gaussian kernel dictionary for fast KDE.

    Reference: `frankenz/pdf.py:778-852`.  Kernels are evaluated on the
    actual grid around its midpoint (bit-matching the reference) and stored
    both as the reference's ragged list (`sigma_dict`, `sigma_dict_cdf`)
    and as a dense (Ndict, 2*max_width+1) device table used by the TPU
    kernels, with each kernel centered at column `max_width`.
    """

    def __init__(self, pdf_grid, sigma_grid, sigma_trunc=5.0):
        pdf_grid = np.asarray(pdf_grid, dtype=np.float64)
        sigma_grid = np.asarray(sigma_grid, dtype=np.float64)
        self.Ngrid = len(pdf_grid)
        self.min, self.max = pdf_grid.min(), pdf_grid.max()
        self.delta = pdf_grid[1] - pdf_grid[0]
        self.grid = pdf_grid

        self.Ndict = len(sigma_grid)
        self.sigma_grid = sigma_grid
        self.dsigma = sigma_grid[1] - sigma_grid[0]
        self.sigma_trunc = float(sigma_trunc)
        # Half-widths in grid cells, truncated at sigma_trunc sigmas.  Wider
        # than the grid itself buys nothing (windows clip to the grid and
        # normalization is over the retained in-grid portion either way), so
        # cap at Ngrid — unlike the reference, which silently mis-slices
        # kernels wider than half the grid.
        self.sigma_width = np.minimum(
            np.asarray(np.ceil(sigma_grid * sigma_trunc / self.delta),
                       dtype=np.int64),
            self.Ngrid)

        # Kernels evaluated at integer cell offsets o*delta, o in [-w, w]
        # (identical, to fp roundoff, to the reference's evaluation on an
        # evenly spaced grid slice around its midpoint, pdf.py:814-818).
        self.sigma_dict = [
            np.exp(-0.5 * ((np.arange(-w, w + 1) * self.delta) / s) ** 2)
            / (_SQRT_2PI * s)
            for s, w in zip(sigma_grid, self.sigma_width)
        ]
        self.sigma_dict_cdf = [np.cumsum(p) for p in self.sigma_dict]

        # Dense device-side table: row i holds kernel i centered at column
        # `max_width`, zero-padded outside its own half-width.
        wmax = int(self.sigma_width.max())
        self.max_width = wmax
        table = np.zeros((self.Ndict, 2 * wmax + 1), dtype=np.float64)
        for i, (k, w) in enumerate(zip(self.sigma_dict, self.sigma_width)):
            table[i, wmax - w:wmax + w + 1] = k
        self.kernel_table = table

    def fit(self, X, Xe):
        """Quantize (mean, sigma) pairs onto the dictionary (pdf.py:821-852).

        Returns integer arrays (X_idx, Xe_idx); X_idx is intentionally
        *not* clamped to the grid (matching the reference), Xe_idx is
        clamped to [0, Ndict-1].
        """
        X = jnp.asarray(X)
        Xe = jnp.asarray(Xe)
        x_idx = jnp.round((X - self.grid[0]) / self.delta).astype(jnp.int32)
        e_idx = jnp.round(
            (Xe - self.sigma_grid[0]) / self.dsigma).astype(jnp.int32)
        e_idx = jnp.clip(e_idx, 0, self.Ndict - 1)
        return x_idx, e_idx


@jax.jit
def _kernel_matrix_jit(y, y_std, grid, dx, sig_thresh):
    y = jnp.asarray(y)
    y_std = jnp.asarray(y_std)
    grid = jnp.asarray(grid)
    nx = grid.shape[0]
    # int()-style truncation toward zero, as np.array(..., dtype=int) does.
    centers = jnp.trunc((y - grid[0]) / dx).astype(jnp.int32)
    offsets = jnp.trunc(sig_thresh * y_std / dx).astype(jnp.int32)
    uppers = jnp.where(centers + offsets > nx, nx, centers + offsets)
    lowers = jnp.where(centers - offsets < 0, 0, centers - offsets)

    cols = jnp.arange(nx, dtype=jnp.int32)
    in_win = (cols[None, :] >= lowers[:, None]) & (cols[None, :]
                                                   < uppers[:, None])
    vals = gaussian(y[:, None], y_std[:, None], grid[None, :]) * in_win
    norm = jnp.sum(vals, axis=1, keepdims=True)
    return jnp.where(norm > 0.0, vals / jnp.where(norm > 0.0, norm, 1.0),
                     0.0)


def kernel_matrix(y, y_std, grid, dx=None, sig_thresh=5.0):
    """Row-normalized truncated-Gaussian kernel matrix G of shape (Ny, Ngrid).

    Row j reproduces the kernel `gauss_kde` (pdf.py:444-526) would stack for
    object j: evaluated on the grid, truncated with int()-discretized
    +/- sig_thresh*sigma bounds, renormalized over the retained window
    (zero row if the window sum vanishes).
    """
    grid = jnp.asarray(grid)
    if dx is None:
        dx = grid[1] - grid[0]
    return _kernel_matrix_jit(y, y_std, grid, dx, sig_thresh)


@functools.partial(jax.jit, static_argnames=("nx",))
def _kernel_matrix_dict_jit(sigmas, widths, delta, y_idx, y_sig_idx, *, nx):
    cols = jnp.arange(nx, dtype=jnp.int32)
    off = cols[None, :] - y_idx[:, None]  # (Ny, Nx) offsets from center
    w = widths[y_sig_idx][:, None]
    in_win = jnp.abs(off) <= w
    # Evaluate the dictionary kernel arithmetically at the offset — the
    # exact expression the table rows were built from (bit-identical),
    # but with no (Ny, Nx) table gather: `take_along_axis` over wide rows
    # is pathologically slow on TPU (a VPU gather per element), while
    # exp is ~free.
    s = sigmas[y_sig_idx][:, None]
    x = off.astype(s.dtype) * delta / s
    vals = jnp.exp(-0.5 * x * x) / (_SQRT_2PI * s) * in_win
    norm = jnp.sum(vals, axis=1, keepdims=True)
    return jnp.where(norm > 0.0, vals / jnp.where(norm > 0.0, norm, 1.0),
                     0.0)


def kernel_matrix_dict(pdfdict, y_idx, y_sig_idx):
    """Row-normalized kernel matrix from a `PDFDict` (Ny, Ngrid).

    Row j reproduces the (edge-renormalized) contribution `gauss_kde_dict`
    (pdf.py:529-622) stacks for dictionary element (y_idx[j],
    y_sig_idx[j]): the discretized kernel evaluated at offset
    (grid_col - center), masked to the kernel's half-width and the grid,
    renormalized over the retained window.
    """
    y_idx = jnp.asarray(y_idx, dtype=jnp.int32)
    y_sig_idx = jnp.asarray(y_sig_idx, dtype=jnp.int32)
    sigmas = jnp.asarray(pdfdict.sigma_grid)
    widths = jnp.asarray(pdfdict.sigma_width, dtype=jnp.int32)
    return _kernel_matrix_dict_jit(sigmas, widths, pdfdict.delta, y_idx,
                                   y_sig_idx, nx=pdfdict.Ngrid)


@jax.jit
def _threshold_rel(wts, wt_thresh):
    cut = wt_thresh * jnp.max(wts, axis=-1, keepdims=True)
    return jnp.where(wts > cut, wts, 0.0)


@jax.jit
def _threshold_cdf(wts, cdf_thresh):
    order = jnp.argsort(wts, axis=-1)
    sorted_wts = jnp.take_along_axis(wts, order, axis=-1)
    cdf = jnp.cumsum(sorted_wts, axis=-1)
    cdf = cdf / cdf[..., -1:]
    keep_sorted = cdf <= (1.0 - cdf_thresh)
    keep = jnp.zeros_like(keep_sorted)
    keep = jnp.put_along_axis(keep, order, keep_sorted, axis=-1,
                              inplace=False)
    return jnp.where(keep, wts, 0.0)


def threshold_weights(wts, wt_thresh=1e-3, cdf_thresh=2e-4):
    """Zero out negligible weights, batched over objects.

    `wts` has shape (..., Ny).  With `wt_thresh` set, keeps
    ``wt > wt_thresh * max(wt)`` (pdf.py:508-511).  With ``wt_thresh=None``
    applies the reference's CDF rule (pdf.py:512-516), including its
    drop-the-largest-weight quirk.  With both None, keeps everything.
    """
    wts = jnp.asarray(wts)
    if wt_thresh is None and cdf_thresh is None:
        return wts
    if wt_thresh is not None:
        return _threshold_rel(wts, wt_thresh)
    return _threshold_cdf(wts, cdf_thresh)


@jax.jit
def _matmul(wts, G):
    # HIGHEST: the MXU's default bf16 input rounding puts ~0.1-0.7% of
    # noise on stacked PDF cells (measured on hardware, tools/
    # hw_parity.py) — the 1e-6 PDF-parity contract needs full-f32 dots.
    # The Pallas stack kernels pin the same precision (ops/fused.py).
    return jnp.dot(wts, G, precision=STACK_PRECISION)


def kde_stack_gathered_dict(pdfdict, pos, sig, wts):
    """KDE stack where every object has its OWN label subset (kNN path).

    ``pos``/``sig``/``wts`` have shape (Nobj, J): per-object dictionary
    positions, sigma indices, and weights (invalid slots: weight 0).
    Builds each object's J kernel rows on the fly (same gather+mask+
    renormalize as `kernel_matrix_dict`) and contracts them immediately —
    einsum('bj,bjg->bg') — so no shared (Nmodel, Ngrid) matrix is needed.
    Output is unnormalized, like `kde_stack`.
    """
    sigmas = jnp.asarray(pdfdict.sigma_grid)
    widths = jnp.asarray(pdfdict.sigma_width, dtype=jnp.int32)
    return _kde_stack_gathered_jit(sigmas, widths, pdfdict.delta,
                                   jnp.asarray(pos, jnp.int32),
                                   jnp.asarray(sig, jnp.int32),
                                   jnp.asarray(wts), nx=pdfdict.Ngrid)


@functools.partial(jax.jit, static_argnames=("nx",))
def _kde_stack_gathered_jit(sigmas, widths, delta, pos, sig, wts, *, nx):
    cols = jnp.arange(nx, dtype=jnp.int32)
    off = cols[None, None, :] - pos[..., None]  # (B, J, nx)
    w = widths[sig][..., None]
    in_win = jnp.abs(off) <= w
    # Arithmetic kernel evaluation (see `_kernel_matrix_dict_jit`): the
    # same expression the dictionary rows hold, with no table gather.
    s = sigmas[sig][..., None]
    x = off.astype(s.dtype) * delta / s
    vals = jnp.exp(-0.5 * x * x) / (_SQRT_2PI * s) * in_win
    norm = jnp.sum(vals, axis=-1, keepdims=True)
    rows = jnp.where(norm > 0.0, vals / jnp.where(norm > 0.0, norm, 1.0),
                     0.0)
    # HIGHEST precision: see `_matmul` (PDF cells are contractual).
    return jnp.einsum("bj,bjg->bg", wts, rows,
                      precision=STACK_PRECISION)


@jax.jit
def _kde_stack_gathered_grid_jit(y, y_std, wts, grid, dx, sig_thresh):
    rows = jax.vmap(lambda yy, ss: _kernel_matrix_jit(yy, ss, grid, dx,
                                                      sig_thresh))(y, y_std)
    return jnp.einsum("bj,bjg->bg", wts, rows,
                      precision=STACK_PRECISION)


def kde_stack_gathered(y, y_std, wts, grid, dx=None, sig_thresh=5.0):
    """Grid (non-dict) variant of `kde_stack_gathered_dict`.

    ``y``/``y_std``/``wts``: (Nobj, J) per-object label subsets + weights.
    """
    grid = jnp.asarray(grid)
    if dx is None:
        dx = grid[1] - grid[0]
    return _kde_stack_gathered_grid_jit(jnp.asarray(y), jnp.asarray(y_std),
                                        jnp.asarray(wts), grid, dx,
                                        sig_thresh)


def pack_label_spec(label_dict, label_grid, model_labels, model_label_errs,
                    dx=None, sig_thresh=5.0):
    """``(use_dict, ngrid, lab)`` for the gathered-KDE jit programs.

    `lab` is the 5-tuple of device arrays the fused fit_predict programs
    consume: with a `PDFDict` it is (sigmas, widths, delta, full_pos,
    full_sig); with a grid it is (labels, label_errs, grid, dx,
    sig_thresh).  Shared by the kNN and network streaming paths so the
    parametrization contract lives in one place.
    """
    if label_dict is not None:
        fp, fs = label_dict.fit(jnp.asarray(model_labels),
                                jnp.asarray(model_label_errs))
        lab = (jnp.asarray(label_dict.sigma_grid),
               jnp.asarray(label_dict.sigma_width, jnp.int32),
               jnp.asarray(label_dict.delta),
               jnp.asarray(fp, jnp.int32), jnp.asarray(fs, jnp.int32))
        return True, label_dict.Ngrid, lab
    if label_grid is None:
        raise ValueError("`label_dict` or `label_grid` must be "
                         "specified.")
    grid = jnp.asarray(label_grid)
    lab = (jnp.asarray(model_labels), jnp.asarray(model_label_errs), grid,
           jnp.asarray(dx if dx is not None else grid[1] - grid[0]),
           jnp.asarray(sig_thresh))
    return False, len(label_grid), lab


def kde_stack(weights, G, wt_thresh=1e-3, cdf_thresh=2e-4):
    """Stack thresholded weights through a kernel matrix: (Nobj, Ngrid).

    The TPU equivalent of the reference's per-object kernel stacking loop —
    one (Nobj, Ny) @ (Ny, Ngrid) MXU contraction.  Output is *not*
    normalized (the fitters normalize per-object, as the reference's
    `_predict` does at bruteforce.py:370).
    """
    wts = threshold_weights(weights, wt_thresh, cdf_thresh)
    return _matmul(wts, G)


def gauss_kde(y, y_std, x, dx=None, y_wt=None, sig_thresh=5.0,
              wt_thresh=1e-3, cdf_thresh=2e-4, **kwargs):
    """Drop-in batched `gauss_kde` (pdf.py:444-526).

    `y_wt` may be (Ny,) for a single PDF (reference signature) or
    (Nobj, Ny) for a batch; returns (Nx,) or (Nobj, Nx) accordingly.
    """
    y = jnp.asarray(y)
    if y_wt is None:
        y_wt = jnp.ones_like(y)
    G = kernel_matrix(y, y_std, x, dx=dx, sig_thresh=sig_thresh)
    out = kde_stack(jnp.atleast_2d(y_wt), G, wt_thresh, cdf_thresh)
    return out[0] if jnp.ndim(y_wt) == 1 else out


def gauss_kde_dict(pdfdict, y=None, y_std=None, y_idx=None, y_std_idx=None,
                   y_wt=None, wt_thresh=1e-3, cdf_thresh=2e-4, **kwargs):
    """Drop-in batched `gauss_kde_dict` (pdf.py:529-622)."""
    if y_idx is None or y_std_idx is None:
        if y is None or y_std is None:
            raise ValueError("provide (y, y_std) or (y_idx, y_std_idx)")
        y_idx, y_std_idx = pdfdict.fit(y, y_std)
    y_idx = jnp.asarray(y_idx)
    if y_wt is None:
        y_wt = jnp.ones(y_idx.shape[0], dtype=jnp.float32)
    G = kernel_matrix_dict(pdfdict, y_idx, y_std_idx)
    out = kde_stack(jnp.atleast_2d(y_wt), G, wt_thresh, cdf_thresh)
    return out[0] if jnp.ndim(y_wt) == 1 else out
