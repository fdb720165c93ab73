"""
Fused Pallas TPU pipeline: chi^2 grid -> log-likelihood -> logsumexp ->
thresholded posterior weights -> KDE label PDFs.

This is the flagship kernel behind `BruteForce.fit_predict` (reference
call stack SURVEY.md section 3.1): the reference materializes the full
(Ndata, Nmodel) grids in host RAM; the XLA fused path materializes a
(B, M) batch grid in HBM ~5 times (chi2, lnl, weights, ...).  This kernel
keeps the (TB, TM) tile entirely in VMEM and streams model tiles through
twice:

  pass A (reduce):   lnl tile -> online max / rescaled sum-exp
                     => exact lmap, levid per object
  pass B (stack):    lnl tile recomputed -> wt = exp(lnl - levid),
                     exact reference thresholding (lnl > ln(wt_thresh) +
                     lmap), pdf += wt @ G tile on the MXU

HBM traffic per batch is just the model set + kernel matrix (read twice)
and the (B, Ngrid) output — the (B, M) grid never leaves the chip.  The
two-pass structure keeps the weight threshold *exact* (a single-pass
flash-style accumulator would have to threshold against a running max).

Model arrays are passed pre-transposed (F, M) so the per-filter rows
broadcast against (TB, 1) data columns without in-kernel transposes.

Supports the fixed-scale likelihood (dim_prior on/off, model errors
on/off) — the default BruteForce configuration and the BASELINE.md
config-4 benchmark.  Free-scale fits use the XLA path.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from scipy.special import gammaln as _sp_gammaln

from .kde import STACK_PRECISION

__all__ = ["fused_fit_pdf", "pallas_supported", "FusedCdfFallback"]


class FusedCdfFallback(RuntimeError):
    """Raised when the on-device cdf_thresh cut is indeterminate for a
    batch (pathologically flat posterior); callers fall back to the XLA
    thresholding path for that batch."""

_LOG_2PI = 1.8378770664093453
_LOG_2 = 0.6931471805599453
_NEG_INF = float(np.finfo(np.float32).min)  # finite -inf stand-in
# Free-scale ML-identity chi2 noise floor, as a multiple of A =
# sum mask d^2/var (16 * f32 eps; see ops/likelihood.py
# _CHI2_NOISE_MULT — the two paths must floor identically).
_CHI2_NOISE = 16.0 * float(np.finfo(np.float32).eps)


def pallas_supported():
    """True when the default backend can run the Mosaic TPU kernels."""
    return jax.default_backend() == "tpu"


# HIGH-emulation formulation knob (measured-and-rejected alternative):
# 1 = the 3 bf16 passes ride ONE dot with a concatenated 3x contraction
# (w streamed through the MXU once), 0 = three separate accumulated
# dots.  v5e, config 4: cat 273.9 ms device busy/batch vs 266.9 for the
# 3-dot form — the in-tile concatenate copies cost more than the saved
# MXU invocations.  Default stays 0; the knob reproduces the A/B.
_STACK_CAT = os.environ.get("FRANKENZ_STACK_CAT", "0") != "0"


def _round_up(x, m):
    return (x + m - 1) // m * m


def _stack_dot(w, G):
    """PDF-stack contraction at the package-wide STACK_PRECISION.

    Mosaic supports only DEFAULT / HIGHEST dot precisions, so HIGH (the
    3-pass bf16 decomposition XLA runs on f32 inputs) is emulated
    manually: split each operand into a bf16 hi part plus an f32
    residual and contract hi@hi + hi@lo + lo@hi, dropping the lo@lo
    term whose relative weight is ~2^-16.  Error per product lands at
    ~2^-17 relative — far below the f32 stack contract (2e-3 hardware
    tolerance) — at half the MXU passes of HIGHEST (measured on v5e:
    config 4 runs 1.65e10 pair-evals/s at HIGHEST, 2.43e10 at DEFAULT;
    the 3-pass path recovers most of the gap, see docs/MXU_NOTE.md).
    """
    if STACK_PRECISION == jax.lax.Precision.HIGH and pallas_supported():
        # Only on real Mosaic: in interpret mode (CPU test suite) the
        # f32 dot below is exact, and the split's ~2^-17 representation
        # error would needlessly loosen the 1e-6 interpret-vs-XLA
        # parity assertions.
        Gh, Gl = _split_bf16(G)
        return _stack_dot_split(w, Gh, Gl)
    return jnp.dot(w, G, preferred_element_type=jnp.float32,
                   precision=STACK_PRECISION)


def _split_bf16(x):
    """In-KERNEL (hi, lo) bf16 split of an f32 array: x ~= hi + lo with
    ~2^-17 relative representation error (hi carries the top 8 mantissa
    bits, lo the next 8).  Mosaic compiles the f32->bf16->f32 round-trip
    literally (hardware-verified: in-tile split lands 3.2e-5 of max
    cell vs an f64 host truth) — do NOT use this form in XLA-traced
    code, where the convert pair is STRIPPED under excess-precision
    rules (lo == 0 silently; see `_split_bf16_xla`)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _split_bf16_xla(x):
    """XLA-side (hi, lo) bf16 split, for pre-splitting G outside the
    kernels (the opt-in ``g_split`` path).

    A plain ``astype(bf16).astype(f32)`` round-trip is deleted by XLA's
    excess-precision rules, making lo = x - x = 0 — measured on v5e as
    a silent bf16-grade stack (2.9e-3 of max cell vs the in-tile
    split's 3.2e-5).  `lax.reduce_precision` is contractual rounding
    XLA must preserve, so the residual is computed against the
    honestly-rounded hi."""
    hi_f32 = jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)
    lo_f32 = jax.lax.reduce_precision(x - hi_f32, exponent_bits=8,
                                      mantissa_bits=7)
    return hi_f32.astype(jnp.bfloat16), lo_f32.astype(jnp.bfloat16)


def _stack_dot_split(w, Gh, Gl):
    """3-pass HIGH-emulation contraction against a PRE-SPLIT G.

    Hoisting the static G split out of the tile (pass-B kernels take
    (Gh, Gl) bf16 operands prepared once per predict call) was the
    round-3 verdict's hypothesis for reclaiming the HIGH-precision
    cost.  Measured on v5e at config-4 shape (round 4): results are
    BITWISE identical to the in-tile split and timing is within relay
    variance of it (340 vs 353 ms/batch one run, 326 vs 328 another) —
    the in-tile VPU re-split rides under the serialized MXU passes, so
    there is nothing to reclaim (docs/MXU_NOTE.md section 5: device
    time is linear in MXU passes, not split passes).  Default stays
    the single-operand in-tile form (no per-call prep pass, fewer
    operand streams); ``fused_fit_pdf(g_split=True)`` keeps the
    measurement reproducible.  Only the weights tile is split here;
    the three bf16 MXU passes are identical to `_stack_dot`'s.
    """
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    if _STACK_CAT:
        return jnp.dot(jnp.concatenate([wh, wh, wl], axis=1),
                       jnp.concatenate([Gh, Gl, Gh], axis=0),
                       preferred_element_type=jnp.float32)
    acc = jnp.dot(wh, Gh, preferred_element_type=jnp.float32)
    acc += jnp.dot(wh, Gl, preferred_element_type=jnp.float32)
    acc += jnp.dot(wl, Gh, preferred_element_type=jnp.float32)
    return acc


def _stack_dot_g(w, g_refs):
    """Stack contraction against the kernel's G ref(s): two refs = the
    pre-split (Gh, Gl) HIGH path, one ref = plain `_stack_dot`."""
    if len(g_refs) == 2:
        return _stack_dot_split(w, g_refs[0][:, :], g_refs[1][:, :])
    return _stack_dot(w, g_refs[0][:, :])


def _g_operands(G, g_split, spec):
    """Kernel operand(s) + block spec(s) for the KDE kernel matrix:
    the pre-split (Gh, Gl) bf16 pair (see `_stack_dot_split`) when
    ``g_split``, else the single f32 G."""
    if g_split:
        return _split_bf16_xla(G), [spec, spec]
    return (G,), [spec]


def _default_g_split(interpret):
    """Always False: on v5e the hoisted pre-split measures bitwise
    identical and within relay variance of the in-tile split (see
    `_stack_dot_split`) — it buys nothing, so the shipped default is
    the single-operand G with `_stack_dot`'s in-kernel split at HIGH.
    ``g_split=True`` remains an explicit opt-in for reproducing the
    measurement and for the CPU suite's two-operand kernel coverage."""
    del interpret
    return False


def _stack_accum_blocks(w, g_refs, pdf_ref, flags_ref, j, nblk):
    """Stack accumulation per 128-lane grid block, skipping blocks whose
    kernel-matrix columns are all zero for this model tile.

    Column blocks of a matmul are independent, so this is BITWISE equal
    to the dense `pdf += w @ G` (skipped blocks contribute exactly 0).
    The caller sorts models by kernel-support center (see
    `_band_sort`), making each model tile's KDE kernels cover a narrow
    contiguous grid band — typically 1-2 of the nblk 128-column blocks
    at Ngrid=301, and far fewer on wide serving grids — so both the
    MXU passes and the in-tile HIGH split run only where the kernel
    matrix has support.  `flags_ref` is the full (nm, nblk) SMEM array
    of per-(model-tile, block) any-nonzero flags (whole-array block:
    Mosaic's block-shape divisibility rule forbids a (1, nblk) row
    block), indexed by the model-tile grid position `j`."""
    split = len(g_refs) == 2
    in_tile_high = (not split
                    and STACK_PRECISION == jax.lax.Precision.HIGH
                    and pallas_supported())
    if split or in_tile_high:
        wh = w.astype(jnp.bfloat16)
        wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
        if _STACK_CAT:
            wcat = jnp.concatenate([wh, wh, wl], axis=1)
    for b in range(nblk):
        sl = slice(b * 128, (b + 1) * 128)

        @pl.when(flags_ref[j, b] != 0)
        def _(b=b, sl=sl):
            if split:
                gh, gl = g_refs[0][:, sl], g_refs[1][:, sl]
            elif in_tile_high:
                gh, gl = _split_bf16(g_refs[0][:, sl])
            else:
                pdf_ref[:, sl] += jnp.dot(
                    w, g_refs[0][:, sl],
                    preferred_element_type=jnp.float32,
                    precision=STACK_PRECISION)
                return
            if _STACK_CAT:
                # One MXU call per block: the 3 HIGH passes ride one
                # dot with a 3x contraction (identical flops; w is
                # streamed through the MXU once instead of 3 times).
                gcat = jnp.concatenate([gh, gl, gh], axis=0)
                pdf_ref[:, sl] += jnp.dot(
                    wcat, gcat, preferred_element_type=jnp.float32)
                return
            acc = jnp.dot(wh, gh, preferred_element_type=jnp.float32)
            acc += jnp.dot(wh, gl, preferred_element_type=jnp.float32)
            acc += jnp.dot(wl, gh, preferred_element_type=jnp.float32)
            pdf_ref[:, sl] += acc


def _band_sort(G, nm, tm, nblk, model_arrays=()):
    """Sort models by KDE kernel-support center and compute per-
    (model-tile, 128-column-block) any-nonzero flags.

    The KDE kernel matrix G has compact row support (each model's
    kernel covers a ~8-sigma grid window), so models sorted by window
    center give model tiles whose union support is a narrow band; the
    stack kernels then skip zero blocks (`_stack_accum_blocks`).  The
    permutation is semantically invisible — the fused path returns
    only per-object reductions (pdf/lmap/levid), all permutation-
    invariant up to f32 reassociation.  All-zero rows (sentinel pads,
    off-grid models) sort last.  ``model_arrays`` are (*, Mp) arrays
    permuted along their last axis together with G's rows.  Returns
    (G, flags, permuted_model_arrays)."""
    Gp = G.shape[1]
    nz = G != 0.0
    cols = jnp.arange(Gp, dtype=jnp.int32)
    lo = jnp.min(jnp.where(nz, cols, Gp), axis=1)
    hi = jnp.max(jnp.where(nz, cols, -1), axis=1)
    key = jnp.where(hi >= 0, lo + hi, 2 * Gp + 1)
    perm = jnp.argsort(key, stable=True)
    G = jnp.take(G, perm, axis=0)
    flags = (G != 0.0).reshape(nm, tm, nblk, 128).any(axis=(1, 3))
    out = tuple(jnp.take(a, perm, axis=-1) for a in model_arrays)
    return G, flags.astype(jnp.int32), out


def band_stack_products(G, tm=512):
    """Effective (model, grid-point) products per object each banded
    pass-B stack executes for kernel matrix `G` — i.e. `Mp * Gp` scaled
    by the flagged-block fraction of `_band_sort` at model-tile size
    `tm` (the dense count when banding is inapplicable).  Benchmarks
    use this to report MXU duty from flops the kernel actually issues
    rather than the dense analytic count (bench.py `mxu_duty_cycle`).
    """
    G = jnp.asarray(G, jnp.float32)
    M, Ngrid = G.shape
    Gp = _round_up(Ngrid, 128)
    tm = min(tm, _round_up(M, 128))
    Mp = _round_up(M, tm)
    nblk = Gp // 128 if (Gp % 128 == 0 and Gp > 128) else 0
    if not nblk:
        return Mp * Gp
    G = jnp.pad(G, ((0, Mp - M), (0, Gp - Ngrid)))
    _, flags, _ = _band_sort(G, Mp // tm, tm, nblk)
    return int(jnp.sum(flags)) * tm * 128


# Newton-Raphson refinement steps for `_fast_recip` (experimental knob,
# hardware A/B only): 2 (default) is f32-roundoff-exact from any
# estimate quality; 1 relies on the hardware estimate's ~2^-12 accuracy
# to land at ~2^-24 (f32-eps grade, NOT bit-identical to `/`) and is
# UNSAFE in interpret mode, whose fallback estimate is only bf16-grade.
_RECIP_NR = int(os.environ.get("FRANKENZ_RECIP_NR", "2"))


def _fast_recip(x):
    """f32-exact reciprocal: hardware estimate + 2 Newton-Raphson steps.

    The per-(object, model) divides are the VPU bottleneck of the fused
    chi^2 tiles (the kernel is op-bound, not MXU- or HBM-bound); the
    estimate+NR sequence measures ~25% faster than the full `/` on v5e
    at config-4 shapes.  Two steps square the estimate's relative error
    twice, so even the bf16-grade interpret-mode fallback (~2^-8) lands
    below f32 eps — results stay at f32-roundoff parity with the divide
    on both Mosaic and interpret paths.
    """
    r = pl.reciprocal(x, approx=True)
    for _ in range(max(_RECIP_NR, 1)):
        r = r * (2.0 - x * r)
    return r


def _lnl_tile(d_ref, de_ref, dm_ref, mT_ref, meT_ref, mmT_ref, valid_ref,
              *, nfilt, dim_prior, ignore_model_err, gl_table, full_mask,
              free_scale=False, scale_ltol=1e-3, scale_max_iter=100):
    """(TB, TM) log-likelihood tile (pdf.py:76-98 / :170-194).

    With ``full_mask`` (host-verified all-ones masks — the common survey
    case) the mask products, Ndim accumulation, and the per-pair
    normalization select-chain all disappear: Ndim == Nfilt everywhere.

    With ``free_scale`` (pdf.py:180-194) the ML scale factor is solved
    in-tile: inter/shape/d^2 sums accumulate over filters, then a second
    filter pass computes chi2 in the reference's non-cancelling residual
    form sum mask (d - s m)^2 / var (pdf.py:188-189).  With datum-only
    variance (``ignore_model_err``) one divide per (TB, 1) column
    suffices and no iteration is needed; with model errors kept, the
    fixed-point iteration runs to per-pair convergence in-tile (see
    `_lnl_tile_freescale_me`).
    """
    if free_scale and not ignore_model_err:
        return _lnl_tile_freescale_me(
            d_ref, de_ref, dm_ref, mT_ref, meT_ref, mmT_ref, valid_ref,
            nfilt=nfilt, dim_prior=dim_prior, gl_table=gl_table,
            full_mask=full_mask, ltol=scale_ltol,
            max_iter=scale_max_iter)
    chi2 = None
    ndim = None
    logvar = None
    inter = None
    shape = None
    for k in range(nfilt):
        dk = d_ref[:, k:k + 1]          # (TB, 1)
        dek = de_ref[:, k:k + 1]
        mk = mT_ref[k:k + 1, :]          # (1, TM)
        if free_scale:
            iv = 1.0 / (dek * dek)       # (TB, 1): one divide per column
            if full_mask:
                mask = None
                it = (dk * iv) * mk
                sh = iv * (mk * mk)
                aa = dk * dk * iv        # (TB, 1)
            else:
                mask = dm_ref[:, k:k + 1] * mmT_ref[k:k + 1, :]
                it = mask * ((dk * iv) * mk)
                sh = mask * (iv * (mk * mk))
                aa = mask * (dk * dk * iv)
                ndim = mask if ndim is None else ndim + mask
            inter = it if inter is None else inter + it
            shape = sh if shape is None else shape + sh
            chi2 = aa if chi2 is None else chi2 + aa  # holds A for now
            if not dim_prior:
                lv = jnp.log(dek * dek)
                logvar = lv if logvar is None else logvar + lv
            continue
        if ignore_model_err:
            var = dek * dek
        else:
            mek = meT_ref[k:k + 1, :]
            var = dek * dek + mek * mek
        r = dk - mk
        iv = _fast_recip(var)
        if full_mask:
            term = (r * r) * iv
        else:
            mask = dm_ref[:, k:k + 1] * mmT_ref[k:k + 1, :]
            term = mask * (r * r) * iv
            ndim = mask if ndim is None else ndim + mask
        chi2 = term if chi2 is None else chi2 + term
        if not dim_prior:
            lv = jnp.log(var)
            logvar = lv if logvar is None else logvar + lv

    if free_scale:
        # chi2 currently holds A = sum mask d^2/s^2.  Final chi2 in the
        # reference's RESIDUAL form (pdf.py:188-189) with a second pass
        # over the filters — the ML identity A - inter^2/shape is equal
        # in real arithmetic but cancels to ~eps*A of f32 roundoff for
        # near-exact fits, and that noise legitimately differs between
        # this tile's and XLA's accumulation orders on hardware (the
        # dof=1 dim-prior log then wobbles by whole nats).  Floored at
        # the per-pair cancellation scale _CHI2_NOISE*A, matching
        # ops/likelihood.py, so (near-)exact fits stay deterministic.
        A = chi2
        s = inter * _fast_recip(jnp.maximum(shape, 1e-30))
        chi2 = None
        for k in range(nfilt):
            dk = d_ref[:, k:k + 1]
            dek = de_ref[:, k:k + 1]
            mk = mT_ref[k:k + 1, :]
            iv = 1.0 / (dek * dek)
            r = dk - s * mk
            term = (r * r) * iv
            if not full_mask:
                term = (dm_ref[:, k:k + 1] * mmT_ref[k:k + 1, :]) * term
            chi2 = term if chi2 is None else chi2 + term
        chi2 = jnp.maximum(chi2, _CHI2_NOISE * A)
        dof_shift = 1.0  # dof = Ndim - 1 (pdf.py:228)
    else:
        dof_shift = 0.0

    if dim_prior:
        # lnl = xlogy(a-1, chi2) - chi2/2 - [gammaln(a) + a ln2], with the
        # normalization gathered from a static table over 2a = Ndim (- 1
        # for free scale, pdf.py:228); gl_table[k] holds the value for
        # 2a = k, with gl_table[0] = +inf (gammaln(0)).
        shift = int(dof_shift)

        def tab(nd):
            return gl_table[nd - shift] if nd - shift >= 0 else float("inf")

        if full_mask:
            a1 = 0.5 * (nfilt - dof_shift) - 1.0
            lnl = (a1 * jnp.log(jnp.maximum(chi2, 1e-30)) if a1 != 0.0
                   else 0.0) - 0.5 * chi2 - tab(nfilt)
        else:
            a1 = 0.5 * (ndim - dof_shift) - 1.0
            safe_log = jnp.log(jnp.maximum(chi2, 1e-30))
            xl = jnp.where(a1 == 0.0, 0.0, a1 * safe_log)
            norm = jnp.full_like(chi2, float("inf"))
            for nd in range(1, nfilt + 1):
                norm = jnp.where(ndim == float(nd), tab(nd), norm)
            lnl = xl - 0.5 * chi2 - norm
    else:
        nd_term = float(nfilt) if full_mask else ndim
        lnl = -0.5 * chi2 - 0.5 * (nd_term * _LOG_2PI + logvar)
        if free_scale and not full_mask:
            # Zero-overlap pairs: the ML scale is 0/0 (reference NaN,
            # pdf.py:180-185) — no evidence, floor (matches the XLA
            # path; fixed-scale keeps the reference's finite value).
            lnl = jnp.where(ndim > 0.0, lnl, _NEG_INF)
    # Clamp to a finite floor: true -inf would poison the online
    # logsumexp with (-inf) - (-inf) = nan.  Degenerate all-floor rows
    # are zeroed by the caller.
    lnl = jnp.maximum(lnl, _NEG_INF)
    return jnp.where(valid_ref[0:1, :] > 0.0, lnl, _NEG_INF)


def _lnl_tile_freescale_me(d_ref, de_ref, dm_ref, mT_ref, meT_ref, mmT_ref,
                           valid_ref, *, nfilt, dim_prior, gl_table,
                           full_mask, ltol, max_iter):
    """(TB, TM) free-scale lnl tile WITH model errors: in-tile fixed-point
    iteration run TO CONVERGENCE, matching the XLA while_loop
    (ops/likelihood.py) and the reference's per-object early exit
    (pdf.py:197-223): a row freezes once max over its models of
    |delta lnl| <= max(ltol, 4 eps max(A)) (the roundoff floor — in
    float32 the lnl carries ~eps*A of noise, so a tight ltol could
    never be met), and the tile exits when every row is frozen or
    `max_iter` sweeps have run.  The final chi2/lnl are recomputed in
    the reference's residual form with each row's (var(s_prev), s_new)
    pairing (pdf.py:203-216) — see the comment at the final pass.
    """
    # Ndim does not change across sweeps: precompute once.
    if full_mask:
        ndim = None
    else:
        ndim = None
        for k in range(nfilt):
            mk = dm_ref[:, k:k + 1] * mmT_ref[k:k + 1, :]
            ndim = mk if ndim is None else ndim + mk

    def sweep(s):
        inter = shape = A = logvar = None
        for k in range(nfilt):
            dk = d_ref[:, k:k + 1]          # (TB, 1)
            dek = de_ref[:, k:k + 1]
            mk = mT_ref[k:k + 1, :]          # (1, TM)
            mek = meT_ref[k:k + 1, :]
            if s is None:
                var = dek * dek + mek * mek  # initial pass (pdf.py:180)
            else:
                sme = s * mek
                var = dek * dek + sme * sme
            iv = _fast_recip(var)
            if not full_mask:
                mask = dm_ref[:, k:k + 1] * mmT_ref[k:k + 1, :]
                iv = mask * iv
            it = iv * (mk * dk)
            sh = iv * (mk * mk)
            aa = iv * (dk * dk)
            inter = it if inter is None else inter + it
            shape = sh if shape is None else shape + sh
            A = aa if A is None else A + aa
            # Reference sums log(tot_var) over ALL filters
            # (pdf.py:97-98), masked or not.
            lv = jnp.log(var)
            logvar = lv if logvar is None else logvar + lv
        s_new = inter * _fast_recip(jnp.maximum(shape, 1e-30))
        # In-loop chi2 via the ML identity (exact in real arithmetic;
        # only drives the convergence deltas), floored at the per-pair
        # cancellation scale (see _lnl_tile / likelihood.py).
        chi2 = jnp.maximum(A - inter * s_new, _CHI2_NOISE * A)
        nd_term = float(nfilt) if full_mask else ndim
        lnl = -0.5 * chi2 - 0.5 * (nd_term * _LOG_2PI + logvar)
        return s_new, chi2, lnl, A

    scale, chi2, lnl, _ = sweep(None)
    eps = float(np.finfo(np.float32).eps)

    def cond(state):
        _, _, _, done, it = state
        return jnp.logical_and(it < max_iter,
                               jnp.logical_not(jnp.all(done > 0.0)))

    def body(state):
        scale_c, prev_c, lnl_c, done, it = state
        scale_n, chi2_n, lnl_n, A_n = sweep(scale_c)
        # Per-OBJECT convergence (max over the tile's models), exactly
        # the XLA path's criterion (ops/likelihood.py): whole rows
        # freeze together.  (A per-PAIR freeze stops pairs earlier than
        # XLA keeps iterating them, and at dof=1 the leftover ~thr of
        # chi2 slack wobbles the dim-prior log by whole nats between
        # the two paths.)  thr carries the same roundoff floor: in f32
        # the row's lnl noise is ~eps * max(A), so a tighter ltol could
        # never be met and rows would spin to max_iter.
        delta = jnp.max(jnp.abs(lnl_n - lnl_c), axis=1, keepdims=True)
        thr = jnp.maximum(ltol, (4.0 * eps)
                          * jnp.max(A_n, axis=1, keepdims=True))
        frozen = done > 0.0                      # (TB, 1)
        lnl_o = jnp.where(frozen, lnl_c, lnl_n)
        scale_o = jnp.where(frozen, scale_c, scale_n)
        # Each row's variance anchor: the scale that produced its
        # frozen value (the reference pairs chi2(var(s_prev), s_new),
        # pdf.py:203-212) — carried for the final residual pass below.
        prev_o = jnp.where(frozen, prev_c, scale_c)
        done_n = jnp.where(delta <= thr, 1.0, done)
        return scale_o, prev_o, lnl_o, done_n, it + 1

    done0 = jnp.zeros((lnl.shape[0], 1), jnp.float32)
    scale, prev, lnl, _, _ = jax.lax.while_loop(
        cond, body, (scale, scale, lnl, done0, jnp.int32(0)))

    # Final chi2/lnl in the reference's RESIDUAL form (pdf.py:210-216)
    # with each pair's own (var(s_prev), s_new) pairing: the in-loop ML
    # identity carries ~eps*A of f32 cancellation noise for near-exact
    # fits, which differs between accumulation orders (this tile vs XLA
    # on hardware) and wobbles the dof=1 dim-prior log by whole nats.
    chi2 = A_f = logvar = None
    for k in range(nfilt):
        dk = d_ref[:, k:k + 1]
        dek = de_ref[:, k:k + 1]
        mk = mT_ref[k:k + 1, :]
        mek = meT_ref[k:k + 1, :]
        sme = prev * mek
        var = dek * dek + sme * sme
        iv = _fast_recip(var)
        if not full_mask:
            iv = (dm_ref[:, k:k + 1] * mmT_ref[k:k + 1, :]) * iv
        r = dk - scale * mk
        term = iv * (r * r)
        aa = iv * (dk * dk)
        lv = jnp.log(var)
        chi2 = term if chi2 is None else chi2 + term
        A_f = aa if A_f is None else A_f + aa
        logvar = lv if logvar is None else logvar + lv
    chi2 = jnp.maximum(chi2, _CHI2_NOISE * A_f)
    if not dim_prior:
        nd_term = float(nfilt) if full_mask else ndim
        lnl = -0.5 * chi2 - 0.5 * (nd_term * _LOG_2PI + logvar)
        if not full_mask:
            # Zero-overlap: 0/0 scale (reference NaN) -> floor, matching
            # the XLA path and _lnl_tile.
            lnl = jnp.where(ndim > 0.0, lnl, _NEG_INF)

    if dim_prior:
        # dof = Ndim - 1 (pdf.py:228).
        def tab(nd):
            return gl_table[nd - 1] if nd - 1 >= 0 else float("inf")

        if full_mask:
            a1 = 0.5 * (nfilt - 1.0) - 1.0
            lnl = (a1 * jnp.log(jnp.maximum(chi2, 1e-30)) if a1 != 0.0
                   else 0.0) - 0.5 * chi2 - tab(nfilt)
        else:
            a1 = 0.5 * (ndim - 1.0) - 1.0
            safe_log = jnp.log(jnp.maximum(chi2, 1e-30))
            xl = jnp.where(a1 == 0.0, 0.0, a1 * safe_log)
            norm = jnp.full_like(chi2, float("inf"))
            for nd in range(1, nfilt + 1):
                norm = jnp.where(ndim == float(nd), tab(nd), norm)
            lnl = xl - 0.5 * chi2 - norm
    lnl = jnp.maximum(lnl, _NEG_INF)
    return jnp.where(valid_ref[0:1, :] > 0.0, lnl, _NEG_INF)


def _make_reduce_kernel(nfilt, dim_prior, ignore_model_err, gl_table,
                        full_mask, free_scale=False, scale_ltol=1e-3,
                        scale_max_iter=100):
    def kernel(d, de, dm, mT, meT, mmT, valid, lmap_ref, lse_ref):
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        lnl = _lnl_tile(d, de, dm, mT, meT, mmT, valid, nfilt=nfilt,
                        dim_prior=dim_prior,
                        ignore_model_err=ignore_model_err,
                        gl_table=gl_table, full_mask=full_mask,
                        free_scale=free_scale, scale_ltol=scale_ltol,
                        scale_max_iter=scale_max_iter)
        t_max = jnp.max(lnl, axis=1, keepdims=True)   # (TB, 1)

        @pl.when(j == 0)
        def _():
            lmap_ref[:, :] = jnp.full_like(t_max, _NEG_INF)
            lse_ref[:, :] = jnp.zeros_like(t_max)

        rm = lmap_ref[:, :]
        s = lse_ref[:, :]
        new_m = jnp.maximum(rm, t_max)
        # Rescale the running sum and add this tile's mass.
        tile_sum = jnp.sum(jnp.exp(lnl - new_m), axis=1, keepdims=True)
        s = s * jnp.exp(rm - new_m) + tile_sum
        lmap_ref[:, :] = new_m
        lse_ref[:, :] = s

        @pl.when(j == nj - 1)
        def _():
            lse_ref[:, :] = jnp.log(lse_ref[:, :]) + lmap_ref[:, :]

    return kernel


def _make_stack_kernel(nfilt, dim_prior, ignore_model_err, gl_table,
                       log_wt_thresh, full_mask, free_scale=False,
                       scale_ltol=1e-3, scale_max_iter=100, ng=1, nblk=0):
    def kernel(d, de, dm, mT, meT, mmT, valid, *rest):
        if nblk:
            flags, rest = rest[0], rest[1:]
        g_refs, (lmap, levid, pdf_ref) = rest[:ng], rest[ng:]
        j = pl.program_id(1)
        lnl = _lnl_tile(d, de, dm, mT, meT, mmT, valid, nfilt=nfilt,
                        dim_prior=dim_prior,
                        ignore_model_err=ignore_model_err,
                        gl_table=gl_table, full_mask=full_mask,
                        free_scale=free_scale, scale_ltol=scale_ltol,
                        scale_max_iter=scale_max_iter)
        wt = jnp.exp(lnl - levid[:, :])
        if log_wt_thresh is not None:
            wt = jnp.where(lnl > log_wt_thresh + lmap[:, :], wt, 0.0)

        @pl.when(j == 0)
        def _():
            pdf_ref[:, :] = jnp.zeros_like(pdf_ref)

        # STACK_PRECISION on every pdf-stack dot (here and the
        # one-pass / cut-stack / chi2-stack kernels): the MXU default
        # rounds f32 inputs to bf16, which put ~0.1-0.7% of noise on
        # stacked PDF cells (measured on v5e; dominant-weight products
        # round directly into their cells).  At the HIGH default the
        # caller pre-splits G into (Gh, Gl) bf16 operands (ng == 2).
        if nblk:
            _stack_accum_blocks(wt, g_refs, pdf_ref, flags, j, nblk)
        else:
            pdf_ref[:, :] += _stack_dot_g(wt, g_refs)

    return kernel


def _make_onepass_kernel(nfilt, dim_prior, ignore_model_err, gl_table,
                         full_mask, free_scale=False, scale_ltol=1e-3,
                         scale_max_iter=100, ng=1, nblk=0):
    """Single-pass flash-style kernel (no weight threshold): carries a
    running max, rescaled sum-exp, AND a rescaled (TB, Gp) PDF
    accumulator; pdf_out = sum_j exp(lnl_j - rm_final) @ G_j, which the
    caller normalizes (identical post-normalization to exp(lnl - levid)
    weights)."""

    def kernel(d, de, dm, mT, meT, mmT, valid, *rest):
        if nblk:
            flags, rest = rest[0], rest[1:]
        g_refs, (pdf_ref, lmap_ref, lse_ref) = rest[:ng], rest[ng:]
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        lnl = _lnl_tile(d, de, dm, mT, meT, mmT, valid, nfilt=nfilt,
                        dim_prior=dim_prior,
                        ignore_model_err=ignore_model_err,
                        gl_table=gl_table, full_mask=full_mask,
                        free_scale=free_scale, scale_ltol=scale_ltol,
                        scale_max_iter=scale_max_iter)
        t_max = jnp.max(lnl, axis=1, keepdims=True)

        @pl.when(j == 0)
        def _():
            lmap_ref[:, :] = jnp.full_like(t_max, _NEG_INF)
            lse_ref[:, :] = jnp.zeros_like(t_max)
            pdf_ref[:, :] = jnp.zeros_like(pdf_ref)

        rm = lmap_ref[:, :]
        new_m = jnp.maximum(rm, t_max)
        alpha = jnp.exp(rm - new_m)  # (TB, 1)
        w = jnp.exp(lnl - new_m)
        lse_ref[:, :] = lse_ref[:, :] * alpha + jnp.sum(w, axis=1,
                                                        keepdims=True)
        if nblk:
            # Banded: the alpha rescale must touch every column (the
            # accumulator is global-state), only the dot is skippable.
            pdf_ref[:, :] = pdf_ref[:, :] * alpha
            _stack_accum_blocks(w, g_refs, pdf_ref, flags, j, nblk)
        else:
            pdf_ref[:, :] = pdf_ref[:, :] * alpha + _stack_dot_g(w, g_refs)
        lmap_ref[:, :] = new_m

        @pl.when(j == nj - 1)
        def _():
            lse_ref[:, :] = jnp.log(lse_ref[:, :]) + lmap_ref[:, :]

    return kernel


def _make_topk_kernel(nfilt, dim_prior, ignore_model_err, gl_table,
                      full_mask, free_scale, scale_ltol, scale_max_iter,
                      T):
    """Online per-object top-T DISTINCT lnl values + tie counts.

    Feeds the on-device cdf_thresh cut (pdf.py:512-516): the reference
    drops the minimal descending-weight prefix whose mass reaches
    cdf_thresh, so knowing the T heaviest distinct weight values (with
    multiplicities) per object determines the cut EXACTLY whenever
    those values carry >= cdf_thresh of the posterior mass — for the
    default cdf_thresh = 2e-4 the top handful always does.  Values are
    maintained descending in (TB, T) running refs, merged tile by tile
    over a (TB, 2T) concatenation; equal values across tiles pool
    their counts.
    """

    def kernel(d, de, dm, mT, meT, mmT, valid, vals_ref, cnts_ref):
        j = pl.program_id(1)
        lnl = _lnl_tile(d, de, dm, mT, meT, mmT, valid, nfilt=nfilt,
                        dim_prior=dim_prior,
                        ignore_model_err=ignore_model_err,
                        gl_table=gl_table, full_mask=full_mask,
                        free_scale=free_scale, scale_ltol=scale_ltol,
                        scale_max_iter=scale_max_iter)

        @pl.when(j == 0)
        def _():
            vals_ref[:, :] = jnp.full_like(vals_ref, _NEG_INF)
            cnts_ref[:, :] = jnp.zeros_like(cnts_ref)

        # Tile-local top-T distinct values (+ counts) by repeated
        # extract-and-mask.
        tvals = []
        tcnts = []
        work = lnl
        for _ in range(T):
            v = jnp.max(work, axis=1, keepdims=True)        # (TB, 1)
            c = jnp.sum((lnl == v).astype(jnp.float32), axis=1,
                        keepdims=True)
            tvals.append(v)
            tcnts.append(c)
            work = jnp.where(work == v, _NEG_INF, work)
        cat_v = jnp.concatenate([vals_ref[:, :]] + tvals, axis=1)
        cat_c = jnp.concatenate([cnts_ref[:, :]] + tcnts, axis=1)
        # Merge: top-T distinct of the (TB, 2T) union; counts of equal
        # values pool (the same lnl can appear in both lists).
        for t in range(T):
            v = jnp.max(cat_v, axis=1, keepdims=True)
            c = jnp.sum(jnp.where(cat_v == v, cat_c, 0.0), axis=1,
                        keepdims=True)
            vals_ref[:, t:t + 1] = v
            cnts_ref[:, t:t + 1] = jnp.where(v > _NEG_INF, c,
                                             jnp.float32(0.0))
            cat_v = jnp.where(cat_v == v, _NEG_INF, cat_v)

    return kernel


def _make_cut_stack_kernel(nfilt, dim_prior, ignore_model_err, gl_table,
                           full_mask, free_scale, scale_ltol,
                           scale_max_iter, ng=1, nblk=0):
    """Pass B against a per-object lnl cut: keep lnl <= cut (the exact
    complement of the reference's dropped descending prefix; see
    `_make_topk_kernel` / `_cdf_cut`)."""

    def kernel(d, de, dm, mT, meT, mmT, valid, *rest):
        if nblk:
            flags, rest = rest[0], rest[1:]
        g_refs, (cut, levid, pdf_ref) = rest[:ng], rest[ng:]
        j = pl.program_id(1)
        lnl = _lnl_tile(d, de, dm, mT, meT, mmT, valid, nfilt=nfilt,
                        dim_prior=dim_prior,
                        ignore_model_err=ignore_model_err,
                        gl_table=gl_table, full_mask=full_mask,
                        free_scale=free_scale, scale_ltol=scale_ltol,
                        scale_max_iter=scale_max_iter)
        wt = jnp.exp(lnl - levid[:, :])
        wt = jnp.where(lnl <= cut[:, :], wt, 0.0)

        @pl.when(j == 0)
        def _():
            pdf_ref[:, :] = jnp.zeros_like(pdf_ref)

        if nblk:
            _stack_accum_blocks(wt, g_refs, pdf_ref, flags, j, nblk)
        else:
            pdf_ref[:, :] += _stack_dot_g(wt, g_refs)

    return kernel


def _cdf_cut(vals, cnts, levid, cdf_thresh):
    """Per-object lnl cut from the top-T distinct (value, count) table.

    The reference keeps weights whose ascending-sorted inclusive CDF is
    <= 1 - cdf_thresh (pdf.py:512-516) — equivalently it DROPS the
    minimal descending prefix whose exclusive-prefix mass is below
    cdf_thresh (the largest weight always drops).  With weights
    normalized by levid the posterior mass sums to 1, so the cut is the
    heaviest tracked value whose descending exclusive prefix mass
    reaches cdf_thresh.  Returns (cut, ok): `ok` is False for objects
    whose tracked mass never reaches cdf_thresh (cut indeterminate —
    caller falls back).  Tie groups that straddle the boundary drop
    whole (the reference drops an index-prefix of the group; ties only
    arise from duplicate models).
    """
    w = jnp.exp(vals - levid[:, None]) * cnts          # (B, T)
    excl = jnp.cumsum(w, axis=1) - w                   # descending excl
    crossed = excl >= cdf_thresh
    ok = jnp.any(crossed, axis=1)
    # First crossed index's value is the heaviest KEPT value.
    idx = jnp.argmax(crossed, axis=1)
    cut = jnp.take_along_axis(vals, idx[:, None], axis=1)[:, 0]
    return jnp.where(ok, cut, jnp.inf), ok


def _chi2_tile_fullmask(d_ref, de_ref, mT_ref, meT_ref, *, nfilt,
                        ignore_model_err, mxu=False):
    """(TB, TM) chi^2 tile with all-ones masks.

    ``mxu=True`` (requires datum-only variance): the masked chi^2
    expands exactly into ONE contraction over a stacked 2F filter axis
    (pdf.py:85-87):

        chi2[b, m] = sum_f iv[b,f] d[b,f]^2            (per-row constant)
                     + [-2 d*iv | iv] @ [m ; m^2]^T    (MXU, K = 2F)

    which moves the O(F) per-pair reduce onto the MXU — the VPU then
    only runs the O(1)-per-pair epilogue (exp/threshold/compare).
    MEASURED CAVEATS (v5e, config-4 shapes; see docs/MXU_NOTE.md):
    the expansion's absolute error is ~|sum d^2 iv| * eps no matter the
    dot precision (catastrophic cancellation as chi2 -> 0), so this is
    an approximate opt-in, not a parity path — and Mosaic's default dot
    runs bf16 passes (~0.4% of term magnitude); HIGHEST (6-pass f32)
    restores f32-grade sums but costs more than the VPU loop it
    replaces.  The per-pair variance of the model-error case
    (sigma_d^2 + sigma_m^2 depends on BOTH operands) breaks the
    factorization entirely (SURVEY.md section 7, "hard parts").
    """
    if mxu:
        assert ignore_model_err, "per-pair variance breaks the expansion"
        d = d_ref[:, :]                      # (TB, F)
        de = de_ref[:, :]
        iv = _fast_recip(de * de)            # (TB, F)
        div = d * iv
        a = jnp.sum(d * div, axis=1, keepdims=True)   # (TB, 1)
        mT = mT_ref[:, :]                    # (F, TM)
        # One K=2F dot instead of two K=F dots: Mosaic pads the
        # contraction dim to 128 lanes either way, so fusing halves the
        # MXU passes.
        lhs = jnp.concatenate([-2.0 * div, iv], axis=1)      # (TB, 2F)
        rhs = jnp.concatenate([mT, mT * mT], axis=0)         # (2F, TM)
        acc = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        # max(..., 0): the expansion goes epsilon-negative for
        # near-perfect matches where the direct form gives ~0.
        return jnp.maximum(a + acc, 0.0)
    chi2 = None
    for k in range(nfilt):
        dk = d_ref[:, k:k + 1]
        dek = de_ref[:, k:k + 1]
        mk = mT_ref[k:k + 1, :]
        if ignore_model_err:
            var = dek * dek
        else:
            mek = meT_ref[k:k + 1, :]
            var = dek * dek + mek * mek
        r = dk - mk
        term = (r * r) * _fast_recip(var)
        chi2 = term if chi2 is None else chi2 + term
    return chi2


_CHI2_CLAMP = 30000.0  # exp(-15000) == 0 in every float format


def _half_pow(x, a1):
    """x**a1 for half-integer a1 via binary exponentiation + sqrt (no
    log/pow transcendentals).  Returns None when a1 == 0 (x^0 == 1)."""
    if a1 == 0.0:
        return None
    a = abs(a1)
    n = int(a)
    out = None
    base, e = x, n
    while e:
        if e & 1:
            out = base if out is None else out * base
        e >>= 1
        if e:
            base = base * base
    if a != n:  # trailing 0.5
        s = jnp.sqrt(x)
        out = s if out is None else out * s
    return 1.0 / out if a1 < 0 else out


def _make_chi2max_kernel(nfilt, ignore_model_err, c0, mxu=False):
    """Pass A (full-mask, dim-prior): transcendental-free tracking of the
    chi^2 values bracketing c0 = 2*a1, where the unimodal lnl(chi2)
    peaks — lmap is recovered from them on the host side.

    chi2 is tracked UNCLAMPED: clamping here broke lmap/levid parity
    with the XLA path for rows whose every model exceeds the clamp
    (insane outliers), pinning both at lnl(clamp) instead of the true
    values.  Sentinel-padded models carry chi2 ~ 1e30 and never win the
    bracketing min against any real model."""

    def kernel(d, de, mT, meT, below_ref, above_ref):
        j = pl.program_id(1)
        chi2 = _chi2_tile_fullmask(d, de, mT, meT, nfilt=nfilt,
                                   ignore_model_err=ignore_model_err,
                                   mxu=mxu)

        @pl.when(j == 0)
        def _():
            below_ref[:, :] = jnp.full((below_ref.shape[0], 1), -1.0,
                                       jnp.float32)
            above_ref[:, :] = jnp.full((above_ref.shape[0], 1), jnp.inf,
                                       jnp.float32)

        lo = jnp.where(chi2 < c0, chi2, -1.0)
        hi = jnp.where(chi2 >= c0, chi2, jnp.inf)
        below_ref[:, :] = jnp.maximum(below_ref[:, :],
                                      jnp.max(lo, axis=1, keepdims=True))
        above_ref[:, :] = jnp.minimum(above_ref[:, :],
                                      jnp.min(hi, axis=1, keepdims=True))

    return kernel


# Largest a1 for which the no-log sqrt-chain power cannot overflow at
# the clamp: 30000^8.5 ~ 1.1e38 < f32 max.  Wider filter sets (a1 > 8.5,
# F > 19) switch to the log-form weight, whose single exponent is
# bounded by lnl - lmap <= 0 for any chi2 (no clamp needed).
_A1_NOLOG_MAX = 8.5

# Mosaic rejects whole-array SMEM blocks once the banded flag table's
# first dimension grows past ~2K rows: the kernels compile at nm = 1954
# model tiles (1M models at tm=512) and crash the TPU compiler
# (remote tpu_compile_helper exit 1) at nm = 3907 (2M) — total SMEM
# bytes are NOT the limit (config 7 runs a 392 x 32 table, 50 KB).
# Past this, the fullmask specialization streams the model axis in
# chunks of _NM_SMEM_MAX tiles per pallas_call: pass A's chi2 brackets
# combine exactly across chunks (max/min are associative), pass B takes
# the globally-combined shift so chunk PDFs and weight sums just add
# (f32 reassociation at chunk boundaries only).  The general path falls
# back to the dense stack instead (nblk = 0).
_NM_SMEM_MAX = 2048

# SMEM budget (bytes) for the screened pass-B home-first visit table —
# a scalar-prefetch operand that lives whole in SMEM (1 MB on v5e; the
# (128, 1954) table of a 65Ki x 1M run is exactly 1.00 MB and the
# compile dies "Ran out of memory in memory space smem").  Half the
# budget leaves room for Mosaic's own scoped scalars; past it the
# screened pipeline keeps the natural tile order (absorption stays on).
_VISIT_SMEM_MAX = 512 * 1024


def _make_chi2stack_kernel(nfilt, ignore_model_err, a1, log_wt_thresh,
                           mxu=False, ng=1, nblk=0):
    """Pass B (full-mask, dim-prior): w = chi2^a1 * exp(-chi2/2 - shift),
    shift = max(lmap, lnl(clamp)) + gammaln-norm — one exp + one sqrt
    per pair, no log (a1 <= 8.5; the log-form otherwise — see
    _A1_NOLOG_MAX).  Accumulates pdf += w @ G and s += sum(w);
    levid = log(s) + lmap.  ``nblk > 0`` enables the banded stack: the
    first extra operand is the (nm, nblk) SMEM block-flags array and
    the dot runs per 128-column block, skipping zero blocks
    (`_stack_accum_blocks`)."""

    wthr = None if log_wt_thresh is None else float(np.exp(log_wt_thresh))

    def kernel(d, de, mT, meT, *rest):
        if nblk:
            flags, rest = rest[0], rest[1:]
        g_refs, (shift, pdf_ref, s_ref) = rest[:ng], rest[ng:]
        j = pl.program_id(1)
        chi2 = _chi2_tile_fullmask(d, de, mT, meT, nfilt=nfilt,
                                   ignore_model_err=ignore_model_err,
                                   mxu=mxu)
        if a1 > _A1_NOLOG_MAX:
            # Log-form: exact exp(lnl - lmap), overflow-free for any
            # chi2 (pads at ~1e30 underflow to w = 0).
            w = jnp.exp(a1 * jnp.log(jnp.maximum(chi2, 1e-30))
                        - 0.5 * chi2 - shift[:, :])
        else:
            # No-log form: clamped chi2 keeps the sqrt-chain power
            # finite; `shift` is floored at lnl(clamp) host-side so the
            # exponent stays <= 0 even when every real chi2 clamps.
            chi2 = jnp.minimum(chi2, _CHI2_CLAMP)
            pw = _half_pow(chi2, a1)
            e = jnp.exp(-0.5 * chi2 - shift[:, :])
            w = e if pw is None else pw * e

        @pl.when(j == 0)
        def _():
            pdf_ref[:, :] = jnp.zeros_like(pdf_ref)
            s_ref[:, :] = jnp.zeros_like(s_ref)

        # levid is the UN-thresholded logsumexp (bruteforce.py:359-360);
        # the threshold only gates which kernels get stacked.
        s_ref[:, :] += jnp.sum(w, axis=1, keepdims=True)
        if wthr is not None:
            # w = exp(lnl - lmap), so the reference cut
            # lnl > ln(wt_thresh) + lmap is exactly w > wt_thresh.
            w = jnp.where(w > wthr, w, 0.0)
        if nblk:
            _stack_accum_blocks(w, g_refs, pdf_ref, flags, j, nblk)
        else:
            pdf_ref[:, :] += _stack_dot_g(w, g_refs)

    return kernel


# ---------------------------------------------------------------------
# Screened fullmask pipeline (round 5): exact tile pruning.
#
# The two-pass fullmask kernels spend their time on per-pair VPU chi^2
# work that is provably irrelevant for most (object, model-subtile)
# combinations:
#   pass A only needs the chi^2 values bracketing c0 = F - 2 (the lnl
#     peak), i.e. near-best fits — a tiny photometric neighborhood;
#   pass B's thresholded stack dot only touches pairs with
#     lnl > ln(wt_thresh) + lmap — a chi^2 ball around the best fit —
#     and even the unthresholded weight sum gets EXACT zeros (f32
#     underflow) once chi^2 passes a per-row cut.
# Sorting models AND objects by a shared photometric-locality key
# (Morton interleave of the two highest-variance filters) makes those
# neighborhoods contiguous, so a per-(row, model-subtile) chi^2 LOWER
# BOUND — the distance to the subtile's photometric bounding box over
# the largest possible variance — certifies whole subtiles as
# skippable.  Every skip is exact:
#   pass A skips a subtile iff no pair in it can improve the running
#     brackets (bound > min(above_run, seed), seed = an inflated real
#     anchor-model chi^2 >= the final `above`);
#   pass B skips the weight/sum work iff every pair's weight underflows
#     to exactly 0.0 in f32, and skips only the stack dot iff every
#     pair is provably below the weight threshold (both cuts are
#     conservative Newton roots of the unimodal lnl(chi2)).
# Results are BITWISE identical to the same kernels with screening
# disabled (tests/test_fused.py::test_screened_*), and match the
# unscreened banded path to f32 reassociation.  There is no SMEM flag
# table, so the _NM_SMEM_MAX chunking ceiling does not apply — >1M
# model sets run as one pallas_call per pass.
# ---------------------------------------------------------------------


def _interleave2(a, b):
    """Morton-interleave two 15-bit int32 lane values -> 30-bit key."""
    def spread(v):
        v = jnp.bitwise_and(v, 0x7FFF)
        v = jnp.bitwise_and(jnp.bitwise_or(v, v << 8), 0x00FF00FF)
        v = jnp.bitwise_and(jnp.bitwise_or(v, v << 4), 0x0F0F0F0F)
        v = jnp.bitwise_and(jnp.bitwise_or(v, v << 2), 0x33333333)
        v = jnp.bitwise_and(jnp.bitwise_or(v, v << 1), 0x55555555)
        return v

    return jnp.bitwise_or(spread(a), spread(b) << 1)


def _chi2_upper_root(a1, K, c0):
    """Conservative upper root of f(c) = a1*ln(c) - c/2 = K (c > c0).

    f is decreasing and concave right of its peak c0 = 2*a1, so Newton
    started right of the peak lands right of the root after one step
    and then decreases monotonically while staying >= the root — the
    returned value NEVER undercuts, which is what makes screening
    against it exact.  Vectorized over rows; 40 static iterations
    (quadratic convergence; far starts take ~5).  A final (1 + 1e-5)
    inflation absorbs f32 evaluation noise of f itself.
    """
    c = jnp.maximum(jnp.full_like(K, c0 + 1.0), 1e-3)
    for _ in range(40):
        if a1 != 0.0:
            f = a1 * jnp.log(c) - 0.5 * c
            fp = a1 / c - 0.5
        else:
            f = -0.5 * c
            fp = jnp.full_like(c, -0.5)
        c = c + (K - f) / fp
        c = jnp.maximum(c, c0 * (1.0 + 1e-6) + 1e-6)
    return c * (1.0 + 1e-5) + 1e-3


def _screen_prep(d, de, mT, meT, G, m_real, sm, n_anchor, c0,
                 ignore_model_err):
    """Locality sort + subtile boxes + exact chi^2 lower bounds + seeds.

    Returns (d, de, mT, meT, G, bounds, seed, inv_obj_perm): models
    (columns of mT/meT, rows of G) and objects (rows of d/de) permuted
    by a shared Morton key over the two highest-variance filters;
    `bounds` (B, S = Mp/sm) a per-(object, model-subtile) LOWER bound on
    any chi^2 in the subtile (interval distance to the subtile's
    photometric box over the subtile-max variance, deflated 1e-4 for
    f32 slop); `seed` (B, 1) an inflated real anchor-model chi^2 that
    upper-bounds the final pass-A `above` bracket (+inf where no anchor
    chi^2 clears c0).  Sentinel-padded model columns sort last (key
    2^30) and their subtile boxes stay honest, so pad handling is
    unchanged.  The permutations are exact: per-object outputs are
    row-independent, and model max/min/sum reductions are
    order-invariant up to the f32 reassociation the banded path already
    documents.
    """
    F, Mp = mT.shape
    mr = mT[:, :m_real]
    var = jnp.var(mr, axis=1)
    _, dims = jax.lax.top_k(var, 2)
    lo = jnp.min(mr, axis=1)
    hi = jnp.max(mr, axis=1)
    scale = 1.0 / jnp.maximum(hi - lo, 1e-20)

    def key_of(rows):  # (N, F) -> int32 Morton keys
        q = jnp.clip((rows - lo[None, :]) * scale[None, :], 0.0, 1.0)
        q2 = jnp.take(q, dims, axis=1)
        qi = (q2 * 32767.0).astype(jnp.int32)
        return _interleave2(qi[:, 0], qi[:, 1])

    mkey = jnp.concatenate(
        [key_of(mr.T), jnp.full((Mp - m_real,), jnp.int32(1 << 30))])
    mperm = jnp.argsort(mkey, stable=True)
    mT = jnp.take(mT, mperm, axis=1)
    meT = jnp.take(meT, mperm, axis=1)
    G = jnp.take(G, mperm, axis=0)

    operm = jnp.argsort(key_of(d), stable=True)
    inv_operm = jnp.argsort(operm)
    d = jnp.take(d, operm, axis=0)
    de = jnp.take(de, operm, axis=0)

    # Bounds in LANE orientation (S, B) — objects on the 128-lane minor
    # dim — so both the XLA prep fusion and the kernels' per-subtile
    # row reads vectorize (a (…, nsub) minor dim would be T(8,128)-
    # padded 32x in storage AND run the prep as a near-scalar kLoop —
    # measured 31.7 ms/batch and 6.6 GB of HBM at the driver shape).
    S = Mp // sm
    mres = mT.reshape(F, S, sm)
    blo = jnp.min(mres, axis=2)          # (F, S)
    bhi = jnp.max(mres, axis=2)
    memax = jnp.max(meT.reshape(F, S, sm), axis=2)
    bound = None
    for k in range(F):
        dk = d[None, :, k]               # (1, B)
        gap = jnp.maximum(jnp.maximum(blo[k][:, None] - dk,
                                      dk - bhi[k][:, None]), 0.0)
        v = de[None, :, k] ** 2
        if not ignore_model_err:
            v = v + memax[k][:, None] ** 2
        t = gap * gap / v
        bound = t if bound is None else bound + t
    bound = bound * (1.0 - 1e-4)         # (S, B)

    # Anchor seeds: exact chi^2 against real models only — (a) A models
    # spread evenly through the sorted order (coverage for objects far
    # from every model), and (b) each object's HOME subtile (the sm
    # models nearest its own Morton position — photometric neighbors,
    # so their chi^2 sits near the final `above` and pass-A skips fire
    # from the first tile).  The (1 + 1e-4) inflation covers any
    # XLA-vs-kernel last-ulp accumulation difference; the c0*(1+1e-3)
    # qualification margin guarantees a qualifying anchor's in-kernel
    # chi^2 also lands >= c0, so the final `above` bracket is <= the
    # seed.
    def anchor_min(am, ame):
        # am/ame: (F, A) shared anchors or (F, B, A) per-object anchors;
        # broadcast against (B, 1) data columns either way.
        chi2a = None
        for k in range(F):
            dk = d[:, k:k + 1]
            va = de[:, k:k + 1] ** 2
            mk = am[k] if am.ndim == 3 else am[None, k, :]
            if not ignore_model_err:
                mek = ame[k] if am.ndim == 3 else ame[None, k, :]
                va = va + mek ** 2
            r = dk - mk
            t = r * r / va
            chi2a = t if chi2a is None else chi2a + t
        qual = chi2a >= c0 * (1.0 + 1e-3)
        return jnp.min(jnp.where(qual, chi2a, jnp.inf), axis=1,
                       keepdims=True)

    A = min(int(n_anchor), int(m_real))
    aidx = (jnp.arange(A) * (m_real // A)).astype(jnp.int32)
    seed = anchor_min(jnp.take(mT, aidx, axis=1),
                      jnp.take(meT, aidx, axis=1))
    seed = seed * (1.0 + 1e-4)
    return d, de, mT, meT, G, bound, seed.reshape(1, -1), inv_operm


def _chi2_subtile_fullmask(d_ref, de_ref, mT_ref, meT_ref, sl, *, nfilt,
                           ignore_model_err):
    """(TB, sm) chi^2 for one model subtile — the exact per-pair op chain
    of `_chi2_tile_fullmask`'s filter loop (bitwise-equal values)."""
    chi2 = None
    for k in range(nfilt):
        dk = d_ref[:, k:k + 1]
        dek = de_ref[:, k:k + 1]
        mk = mT_ref[k:k + 1, sl]
        if ignore_model_err:
            var = dek * dek
        else:
            mek = meT_ref[k:k + 1, sl]
            var = dek * dek + mek * mek
        r = dk - mk
        term = (r * r) * _fast_recip(var)
        chi2 = term if chi2 is None else chi2 + term
    return chi2


def _zig_tile_of(st, j, nm):
    """Tile visited at position `j` of the zig-zag-from-home order.

    Sequence: st, st+1, st-1, st+2, st-2, ... and once one side
    exhausts, the remaining tiles of the other side in order — a
    permutation of [0, nm) for any home tile `st`.  Pure int32
    arithmetic so Pallas index maps can evaluate it per grid step from
    a scalar-prefetched (nb,) home-tile vector (the full (nb, nm)
    visit table overruns SMEM past ~130K entries).  Works on traced
    scalars and broadcast arrays alike.
    """
    nl = st                       # tiles strictly left of home
    nr = (nm - 1) - st            # tiles strictly right of home
    zig = jnp.where(j % 2 == 1, st + (j + 1) // 2, st - j // 2)
    return jnp.where(
        j == 0, st,
        jnp.where(j // 2 > nl, st + (j - nl),          # left exhausted
                  jnp.where((j + 1) // 2 > nr,
                            st - (j - nr), zig)))      # right exhausted


def _make_seed_kernel(nfilt, ignore_model_err, c0):
    """Per-object-block seed refinement: exact chi^2 against ONE model
    tile — the block's best-bounded neighborhood, DMA'd via a scalar-
    prefetched tile index — reduced to min{chi2 >= c0}.  The chi^2 chain
    is the pass-A kernel's own (`_chi2_subtile_fullmask`), so the seed
    is a value pass A itself would produce for that tile (the 1+1e-6
    inflation covers nothing more than paranoia about vector grouping);
    any real model's chi^2 >= c0 upper-bounds the final `above` bracket
    by definition.  Replaces a measured 75 ms/batch of per-object
    XLA gathers (+16 ms of searchsorted) with ~one extra pass-A tile."""

    def kernel(start_ref, d, de, mT, meT, seed_ref):
        del start_ref  # consumed by the index maps
        chi2 = _chi2_subtile_fullmask(
            d, de, mT, meT, slice(None), nfilt=nfilt,
            ignore_model_err=ignore_model_err)
        hi = jnp.where(chi2 >= c0, chi2, jnp.inf)
        seed_ref[:, :] = jnp.min(hi, axis=1,
                                 keepdims=True) * (1.0 + 1e-6)

    return kernel


def _make_chi2max_screened_kernel(nfilt, ignore_model_err, c0, nsub, sm):
    """Screened pass A: per model subtile, run the chi^2 + bracket
    update only when some row's bound admits an improvement
    (bound <= seed, the inflated real anchor chi^2 that upper-bounds
    the final `above`); skipped subtiles provably cannot move either
    bracket, so results are bitwise-equal to running all.  The compare
    is pure lane-oriented work ((1, tb) rows, no sublane/lane mixing —
    the GNG mega-kernel lesson)."""

    def kernel(d, de, mT, meT, bounds, seed, below_ref, above_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            below_ref[:, :] = jnp.full_like(below_ref, -1.0)
            above_ref[:, :] = jnp.full_like(above_ref, jnp.inf)

        for s in range(nsub):
            sl = slice(s * sm, (s + 1) * sm)

            def body(sl=sl):
                chi2 = _chi2_subtile_fullmask(
                    d, de, mT, meT, sl, nfilt=nfilt,
                    ignore_model_err=ignore_model_err)
                lo = jnp.where(chi2 < c0, chi2, -1.0)
                hi = jnp.where(chi2 >= c0, chi2, jnp.inf)
                below_ref[:, :] = jnp.maximum(
                    below_ref[:, :], jnp.max(lo, axis=1, keepdims=True))
                above_ref[:, :] = jnp.minimum(
                    above_ref[:, :], jnp.min(hi, axis=1, keepdims=True))

            pl.when(jnp.any(bounds[0, s, :] <= seed[0, :]))(body)

    return kernel


def _make_chi2stack_screened_kernel(nfilt, ignore_model_err, a1,
                                    log_wt_thresh, nsub, sm, ng=1,
                                    absorb=False, prefetch=False):
    """Screened pass B: per model subtile, `cut_uf` gates ALL work (every
    weight underflows to exactly 0.0 past it — skipping adds the same
    nothing), `cut_dot` gates only the stack dot (every weight provably
    below wt_thresh — the per-pair threshold would zero them all).  The
    weight math inside surviving subtiles is the exact
    `_make_chi2stack_kernel` chain.

    ``absorb=True`` adds the ABSORPTION cut (two more row inputs,
    `ph` and `cut_abs`): for subtile positions p STRICTLY past `ph`
    (the last subtile whose bound admits the row's peak chi^2), the
    running row sum provably already contains the peak weight — f32
    folds of nonnegatives are monotone nondecreasing and the in-tile
    tree sum is >= any single term, so s >= w_peak ~ 1 — and a subtile
    whose weight-sum upper bound is below half an ulp of s folds into
    `s_ref` as a bitwise NO-OP.  Skipping it is therefore exact, at a
    cut ~4x tighter in delta-lnl than f32 exp underflow (see
    `_fused_call_fullmask_dimprior_screened` for the margins).  The
    dot cut floors the gate so a subtile needed only for the stack dot
    is never absorption-skipped (with wt_thresh=None, cut_dot ==
    cut_uf and absorption is exactly neutralized, as required: pdf
    cells have no s >= 1 floor to absorb against)."""

    wthr = None if log_wt_thresh is None else float(np.exp(log_wt_thresh))

    def kernel(*args):
        if prefetch:
            # Leading scalar-prefetch ref (the per-block tile visit
            # table) is consumed by the index maps; `j` below is the
            # VISIT position, which is exactly the coordinate `ph` is
            # expressed in.
            args = args[1:]
        d, de, mT, meT, bounds, cut_uf, cut_dot, *rest = args
        if absorb:
            ph, cut_abs = rest[:2]
            rest = rest[2:]
        g_refs, (shift, pdf_ref, s_ref) = rest[:ng], rest[ng:]
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            pdf_ref[:, :] = jnp.zeros_like(pdf_ref)
            s_ref[:, :] = jnp.zeros_like(s_ref)

        for si in range(nsub):
            sl = slice(si * sm, (si + 1) * sm)

            def run_body(si=si, sl=sl):
                chi2 = _chi2_subtile_fullmask(
                    d, de, mT, meT, sl, nfilt=nfilt,
                    ignore_model_err=ignore_model_err)
                if a1 > _A1_NOLOG_MAX:
                    w = jnp.exp(a1 * jnp.log(jnp.maximum(chi2, 1e-30))
                                - 0.5 * chi2 - shift[:, :])
                else:
                    chi2 = jnp.minimum(chi2, _CHI2_CLAMP)
                    pw = _half_pow(chi2, a1)
                    e = jnp.exp(-0.5 * chi2 - shift[:, :])
                    w = e if pw is None else pw * e
                s_ref[:, :] += jnp.sum(w, axis=1, keepdims=True)
                if wthr is not None:
                    w = jnp.where(w > wthr, w, 0.0)

                def dot_body(w=w, sl=sl):
                    if len(g_refs) == 2:
                        pdf_ref[:, :] += _stack_dot_split(
                            w, g_refs[0][sl, :], g_refs[1][sl, :])
                    else:
                        pdf_ref[:, :] += _stack_dot(w, g_refs[0][sl, :])

                pl.when(jnp.any(bounds[0, si, :]
                                <= cut_dot[0, :]))(dot_body)

            if absorb:
                pf = (j * nsub + si).astype(jnp.float32)
                run_cut = jnp.maximum(
                    jnp.where(pf > ph[0, :], cut_abs[0, :], cut_uf[0, :]),
                    cut_dot[0, :])
            else:
                run_cut = cut_uf[0, :]
            pl.when(jnp.any(bounds[0, si, :] <= run_cut))(run_body)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("ignore_model_err", "wt_thresh", "tb", "tm",
                     "interpret", "m_pad", "g_split", "sm", "n_anchor",
                     "run_all", "with_stats", "absorb", "home_first"))
def _fused_call_fullmask_dimprior_screened(
        d, de, mT, meT, G, *, ignore_model_err, wt_thresh, tb, tm,
        interpret, m_pad=0, g_split=False, sm=128, n_anchor=256,
        run_all=False, with_stats=False, absorb=True, home_first=True):
    """Screened fullmask + dim-prior pipeline (see the section comment).

    ``run_all=True`` keeps the sort/subtile structure but disables every
    skip (bounds forced -inf) — the bitwise-equality reference for the
    screening tests and the A/B baseline on hardware.  ``with_stats``
    appends a (3,) vector of run fractions — pass-A subtiles admitted by
    the seed alone (an upper bound on actual pass-A runs: the in-kernel
    running bracket only tightens it), pass-B weight-work subtiles, and
    pass-B stack-dot subtiles — each an exact XLA replication of the
    kernels' own skip compares, for benchmark MXU-duty accounting.
    """
    B, F = d.shape
    Mp = mT.shape[1]
    Gp = G.shape[1]
    nb, nm = B // tb, Mp // tm
    nsub = tm // sm
    a1 = 0.5 * F - 1.0
    c0 = 2.0 * a1
    norm = float(_sp_gammaln(0.5 * F) + _LOG_2 * 0.5 * F)

    d, de, mT, meT, G, bounds, seed, inv_operm = _screen_prep(
        d, de, mT, meT, G, Mp - m_pad, sm, n_anchor, c0, ignore_model_err)
    # Kernel layout (nm, nsub, B): a contiguous reshape of the (S, B)
    # lane-oriented bounds.  The (1, nsub, tb) block is Mosaic-legal
    # (dim-1 block equals the array dim; tb is 128-divisible or the
    # full batch), per-subtile rows read as (tb,) lane vectors, and
    # T(8,128) tiling pads only nsub -> 8 (not the 32x a (…, nsub)
    # minor dim costs).  ``run_all`` forces -inf into the KERNEL
    # operand only (every gate passes, every subtile runs): all
    # STRUCTURAL quantities derived from the bounds — the home-first
    # tile visit order, the seed start tiles, ph, the stats — must be
    # computed from the REAL bounds so screened and run-all calls
    # share the exact same accumulation structure (the bitwise
    # contract compares them).
    bounds_k = (jnp.full_like(bounds, -jnp.inf) if run_all
                else bounds).reshape(nm, nsub, B)

    data_spec = pl.BlockSpec((tb, F), lambda i, j: (i, 0))
    model_spec = pl.BlockSpec((F, tm), lambda i, j: (0, j))
    stat_spec = pl.BlockSpec((tb, 1), lambda i, j: (i, 0))
    row_spec = pl.BlockSpec((1, tb), lambda i, j: (0, i))
    bound_spec = pl.BlockSpec((1, nsub, tb), lambda i, j: (j, 0, i))
    G_spec = pl.BlockSpec((tm, Gp), lambda i, j: (j, 0))
    g_args, g_specs = _g_operands(G, g_split, G_spec)
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"))

    # Seed refinement: each object block's best-bounded model tile (from
    # the bounds themselves — no gathers, no searchsorted).
    bmin = bounds.reshape(-1, nb, tb).min(axis=2)            # (S, nb)
    start_tiles = (jnp.argmin(bmin, axis=0) // nsub).astype(jnp.int32)
    seed_w = pl.pallas_call(
        _make_seed_kernel(F, ignore_model_err, c0),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((tb, F), lambda i, s: (i, 0)),
                pl.BlockSpec((tb, F), lambda i, s: (i, 0)),
                pl.BlockSpec((F, tm), lambda i, s: (0, s[i])),
                pl.BlockSpec((F, tm), lambda i, s: (0, s[i])),
            ],
            out_specs=pl.BlockSpec((tb, 1), lambda i, s: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        interpret=interpret,
    )(start_tiles, d, de, mT, meT)
    seed = jnp.minimum(seed, seed_w.reshape(1, B))

    below, above = pl.pallas_call(
        _make_chi2max_screened_kernel(F, ignore_model_err, c0, nsub, sm),
        grid=(nb, nm),
        in_specs=[data_spec, data_spec, model_spec, model_spec,
                  bound_spec, row_spec],
        out_specs=(stat_spec, stat_spec),
        out_shape=(jax.ShapeDtypeStruct((B, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1), jnp.float32)),
        compiler_params=params,
        interpret=interpret,
    )(d, de, mT, meT, bounds_k, seed)

    def lnl_of(c):
        safe = jnp.maximum(c, 1e-30)
        return (a1 * jnp.log(safe) if a1 != 0.0 else 0.0) - 0.5 * c - norm

    lmap = jnp.maximum(jnp.where(below >= 0.0, lnl_of(below), -jnp.inf),
                       jnp.where(jnp.isfinite(above), lnl_of(above),
                                 -jnp.inf))  # (B, 1)
    if a1 > _A1_NOLOG_MAX:
        shift = lmap + norm
    else:
        lnl_clamp = float((a1 * np.log(_CHI2_CLAMP) if a1 else 0.0)
                          - 0.5 * _CHI2_CLAMP - norm)
        shift = jnp.maximum(lmap, lnl_clamp) + norm
    log_thresh = None if wt_thresh is None else float(np.log(wt_thresh))

    # Per-row chi^2 cuts for pass B, in the kernel's own weight
    # convention ln w = f(c) - shift, f(c) = a1 ln c - c/2 (see
    # _chi2_upper_root: both are conservative upper roots of the
    # unimodal f, so no skip can drop a nonzero contribution).
    #  - cut_uf: weights are EXACTLY 0.0 in f32 past it (ln w <= -104.2
    #    < ln(2^-150) — exp underflows to zero and the power factor is
    #    already inside f);
    #  - cut_dot: weights fail the kernel's w > wt_thresh compare past
    #    it (the per-pair threshold would zero them before the dot).
    # In the no-log form chi2 clamps at _CHI2_CLAMP and w is CONSTANT
    # past the clamp, so a root that does not clear the clamp (the
    # floored-shift all-outlier quirk, where w(clamp) stays live) must
    # never skip -> cut +inf.  For f decreasing past c0 this check also
    # certifies the c > clamp region whenever the root DOES clear it.
    def cut_of(K):
        cut = _chi2_upper_root(a1, K, c0)
        if a1 <= _A1_NOLOG_MAX:
            cut = jnp.where(cut < _CHI2_CLAMP, cut, jnp.inf)
        return jnp.where(jnp.isfinite(lmap), cut, jnp.inf)

    cut_uf = cut_of(shift - 104.2).reshape(1, B)      # lane-oriented
    cut_dot = (cut_of(log_thresh + shift).reshape(1, B)
               if log_thresh is not None else cut_uf)

    # Absorption cut (see the kernel docstring): a subtile whose
    # weight-sum upper bound sm * exp(f(bound) - shift) sits below half
    # an ulp of the running row sum folds into s as a bitwise no-op —
    # but only once that running sum provably contains the row's peak
    # weight (w = 1 at the argmax; f32 folds of nonnegatives are
    # monotone).  `ph` = the LAST subtile position whose bound admits
    # the argmax chi^2 (bound <= conservative upper root at K = shift
    # - 0.5 >= chi2*); past it, s >= w_peak >= exp(-eval noise) > 0.5.
    # delta_abs = ln(sm) (tile-sum factor) + 25 ln 2 (half an ulp of
    # s >= 0.5, one spare power of two over ulp(1)/2 for tie-to-even)
    # + 1.0 of kernel-vs-XLA f-eval margin.  Rows with an empty heavy
    # set (can't happen — bound(p*) <= chi2* — but cheap to guard) and
    # the no-log clamp/floored-shift rows disable via ph = S / +inf.
    absorb_args, absorb_specs = (), ()
    S = bounds.shape[0]
    posS = jnp.arange(S, dtype=jnp.int32)[:, None]
    visit = None
    # The full (nb, nm) visit table is a scalar-prefetch operand and
    # lives whole in SMEM (1 MB total on v5e): at 1M models (nm = 1954,
    # nb = 128) it is exactly 1.00 MB and the Mosaic compile dies with
    # "Ran out of memory in memory space smem".  Past half the budget
    # the order switches to a ZIG-ZAG from each block's home tile,
    # computed arithmetically in the index maps from just `start_tiles`
    # ((nb,) ints in SMEM) — locality makes distance-from-home a good
    # proxy for ascending bound, at any model count.
    visit_table = home_first and nb * nm * 4 <= _VISIT_SMEM_MAX
    if home_first:
        # Per-object-block tile VISIT order: each block's best-bounded
        # (peak-holding) tiles are visited first, so `ph` — the last
        # visit position whose bound admits a row's argmax chi^2 —
        # lands near 0 for most rows and the absorption cut applies at
        # nearly every later position (the natural-order ph splits the
        # Morton ball in half).  Any per-block visit permutation is
        # exact: run_all shares the structure bit-for-bit, and the
        # per-row weight sums reassociate exactly like the Morton
        # model sort already does.
        if visit_table:
            # Ascending per-block tile bound (the measured-best order).
            tmin = bmin.reshape(nm, nsub, nb).min(axis=1)    # (nm, nb)
            visit = jnp.argsort(tmin.T, axis=1).astype(jnp.int32)
        else:
            # Zig-zag from the home tile: home, +1, -1, +2, -2, ...
            # with exhausted-side tails appended (a permutation for
            # any home position).  Must match `_zig_tile_of` exactly —
            # the kernel's index maps recompute it per (i, j).
            jj = jnp.arange(nm, dtype=jnp.int32)[None, :]
            visit = _zig_tile_of(start_tiles[:, None], jj, nm)
        invv = jnp.argsort(visit, axis=1)            # tile -> visit pos
        vp_sb = (jnp.take(invv, posS[:, 0] // nsub, axis=1) * nsub
                 + (posS[:, 0] % nsub)[None, :])             # (nb, S)
        vp_full = jnp.broadcast_to(
            vp_sb.T[:, :, None], (S, nb, tb)).reshape(S, B)
    else:
        vp_full = jnp.broadcast_to(posS, (S, B))
    if absorb:
        delta_abs = float(np.log(sm) + 25.0 * np.log(2.0) + 1.0)
        cut_abs = cut_of(shift - delta_abs).reshape(1, B)
        cut_heavy = cut_of(shift - 0.5).reshape(1, B)
        ph = jnp.max(jnp.where(bounds <= cut_heavy, vp_full, -1), axis=0)
        ph = jnp.where(ph >= 0, ph, S).astype(jnp.float32).reshape(1, B)
        absorb_args = (ph, cut_abs)
        absorb_specs = (row_spec, row_spec)

    stack_kernel = _make_chi2stack_screened_kernel(
        F, ignore_model_err, a1, log_thresh, nsub, sm, ng=len(g_args),
        absorb=absorb, prefetch=home_first)
    stack_out = (jax.ShapeDtypeStruct((B, Gp), jnp.float32),
                 jax.ShapeDtypeStruct((B, 1), jnp.float32))
    stack_cost = pl.CostEstimate(
        flops=2 * B * Mp * (Gp + 4 * F),
        bytes_accessed=(Mp * Gp + 2 * Mp * F) * 8 + B * Gp * 4,
        transcendentals=B * Mp)
    if home_first:
        if visit_table:
            pf_arg = visit
            tile_at = lambda i, j, v: v[i, j]  # noqa: E731
        else:
            pf_arg = start_tiles
            tile_at = lambda i, j, v: _zig_tile_of(v[i], j, nm)  # noqa: E731
        pdf, s = pl.pallas_call(
            stack_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nb, nm),
                in_specs=[
                    pl.BlockSpec((tb, F), lambda i, j, v: (i, 0)),
                    pl.BlockSpec((tb, F), lambda i, j, v: (i, 0)),
                    pl.BlockSpec((F, tm),
                                 lambda i, j, v: (0, tile_at(i, j, v))),
                    pl.BlockSpec((F, tm),
                                 lambda i, j, v: (0, tile_at(i, j, v))),
                    pl.BlockSpec((1, nsub, tb),
                                 lambda i, j, v: (tile_at(i, j, v), 0, i)),
                    pl.BlockSpec((1, tb), lambda i, j, v: (0, i)),
                    pl.BlockSpec((1, tb), lambda i, j, v: (0, i)),
                    *([pl.BlockSpec((1, tb), lambda i, j, v: (0, i))]
                      * len(absorb_args)),
                    *([pl.BlockSpec((tm, Gp),
                                    lambda i, j, v: (tile_at(i, j, v), 0))]
                      * len(g_args)),
                    pl.BlockSpec((tb, 1), lambda i, j, v: (i, 0)),
                ],
                out_specs=(pl.BlockSpec((tb, Gp), lambda i, j, v: (i, 0)),
                           pl.BlockSpec((tb, 1), lambda i, j, v: (i, 0))),
            ),
            out_shape=stack_out,
            compiler_params=params,
            cost_estimate=stack_cost,
            interpret=interpret,
        )(pf_arg, d, de, mT, meT, bounds_k, cut_uf, cut_dot, *absorb_args,
          *g_args, shift)
    else:
        pdf, s = pl.pallas_call(
            stack_kernel,
            grid=(nb, nm),
            in_specs=[data_spec, data_spec, model_spec, model_spec,
                      bound_spec, row_spec, row_spec, *absorb_specs,
                      *g_specs, stat_spec],
            out_specs=(pl.BlockSpec((tb, Gp), lambda i, j: (i, 0)),
                       stat_spec),
            out_shape=stack_out,
            compiler_params=params,
            cost_estimate=stack_cost,
            interpret=interpret,
        )(d, de, mT, meT, bounds_k, cut_uf, cut_dot, *absorb_args,
          *g_args, shift)

    if a1 <= _A1_NOLOG_MAX and m_pad:
        pw_c = _half_pow(jnp.asarray(_CHI2_CLAMP, jnp.float32), a1)
        w_pad = jnp.exp(-0.5 * _CHI2_CLAMP - shift)
        if pw_c is not None:
            w_pad = pw_c * w_pad
        s = jnp.maximum(s - m_pad * w_pad, 0.0)
    levid = jnp.where(s > 0, jnp.log(jnp.maximum(s, 1e-30)) + lmap,
                      -jnp.inf)
    pdf = jnp.where(s > 0, pdf * jnp.exp(lmap - levid), 0.0)
    # Undo the object locality sort (model-side permutations are
    # reduction-invariant; rows are fully independent).
    pdf = jnp.take(pdf, inv_operm, axis=0)
    lmap_o = jnp.take(lmap[:, 0], inv_operm)
    levid = jnp.take(levid[:, 0], inv_operm)
    if not with_stats:
        return pdf, lmap_o, levid

    def run_frac(cut):
        hit = (bounds <= cut).reshape(-1, nb, tb).any(axis=2)
        return jnp.mean(hit.astype(jnp.float32))

    if absorb:
        gate_run = jnp.maximum(
            jnp.where(vp_full.astype(jnp.float32) > ph, cut_abs, cut_uf),
            cut_dot)                              # (S, B)
    else:
        gate_run = cut_uf
    stats = jnp.stack([run_frac(seed), run_frac(gate_run),
                       run_frac(cut_dot)])
    return pdf, lmap_o, levid, stats


@functools.partial(
    jax.jit,
    static_argnames=("ignore_model_err", "wt_thresh", "tb", "tm",
                     "interpret", "chi2_mxu", "m_pad", "g_split",
                     "band_skip"))
def _fused_call_fullmask_dimprior(d, de, mT, meT, G, *, ignore_model_err,
                                  wt_thresh, tb, tm, interpret,
                                  chi2_mxu=False, m_pad=0, g_split=False,
                                  band_skip=True):
    """Specialized full-mask + dim-prior pipeline (see kernels above)."""
    B, F = d.shape
    M = mT.shape[1]
    Gp = G.shape[1]
    nb, nm = B // tb, M // tm
    a1 = 0.5 * F - 1.0
    c0 = 2.0 * a1
    norm = float(_sp_gammaln(0.5 * F) + _LOG_2 * 0.5 * F)

    nblk = Gp // 128 if (band_skip and Gp % 128 == 0 and Gp > 128) else 0
    flags = None
    if nblk:
        G, flags, (mT, meT) = _band_sort(G, nm, tm, nblk, (mT, meT))

    data_spec = pl.BlockSpec((tb, F), lambda i, j: (i, 0))
    model_spec = pl.BlockSpec((F, tm), lambda i, j: (0, j))
    stat_spec = pl.BlockSpec((tb, 1), lambda i, j: (i, 0))
    G_spec = pl.BlockSpec((tm, Gp), lambda i, j: (j, 0))
    g_args, g_specs = _g_operands(G, g_split, G_spec)
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"))

    # Model-axis chunks: one pallas_call per <= _NM_SMEM_MAX model tiles
    # (single chunk — today's exact code path — below the SMEM flag-table
    # ceiling).  The band sort above is GLOBAL, so each chunk covers a
    # contiguous kernel band and skips even more blocks than the
    # unchunked call would.
    nmc = min(nm, _NM_SMEM_MAX) if nblk else nm
    chunks = [(lo, min(nm, lo + nmc)) for lo in range(0, nm, nmc)]

    chi2max_kernel = _make_chi2max_kernel(F, ignore_model_err, c0,
                                          mxu=chi2_mxu)
    below = above = None
    for lo, hi in chunks:
        msl = slice(lo * tm, hi * tm)
        below_c, above_c = pl.pallas_call(
            chi2max_kernel,
            grid=(nb, hi - lo),
            in_specs=[data_spec, data_spec, model_spec, model_spec],
            out_specs=(stat_spec, stat_spec),
            out_shape=(jax.ShapeDtypeStruct((B, 1), jnp.float32),
                       jax.ShapeDtypeStruct((B, 1), jnp.float32)),
            compiler_params=params,
            interpret=interpret,
        )(d, de, mT[:, msl], meT[:, msl])
        below = (below_c if below is None
                 else jnp.maximum(below, below_c))
        above = (above_c if above is None
                 else jnp.minimum(above, above_c))

    def lnl_of(c):
        safe = jnp.maximum(c, 1e-30)
        return (a1 * jnp.log(safe) if a1 != 0.0 else 0.0) - 0.5 * c - norm

    lmap = jnp.maximum(jnp.where(below >= 0.0, lnl_of(below), -jnp.inf),
                       jnp.where(jnp.isfinite(above), lnl_of(above),
                                 -jnp.inf))  # (B, 1)
    if a1 > _A1_NOLOG_MAX:
        shift = lmap + norm
    else:
        # No-log kernel clamps chi2 at _CHI2_CLAMP, so floor the shift
        # at lnl(clamp): rows whose every model clamps then get w = 1
        # per real pair (s counts them; levid = lmap + log(s) differs
        # from the true logsumexp by <= log(M) — sub-ulp at |lmap| of
        # that magnitude) instead of exp-overflow.
        lnl_clamp = float((a1 * np.log(_CHI2_CLAMP) if a1 else 0.0)
                          - 0.5 * _CHI2_CLAMP - norm)
        shift = jnp.maximum(lmap, lnl_clamp) + norm
    log_thresh = None if wt_thresh is None else float(np.log(wt_thresh))

    stack_kernel = _make_chi2stack_kernel(F, ignore_model_err, a1,
                                          log_thresh, mxu=chi2_mxu,
                                          ng=len(g_args), nblk=nblk)
    pdf = s = None
    for lo, hi in chunks:
        msl = slice(lo * tm, hi * tm)
        flag_args, flag_specs = (), []
        if nblk:
            flag_args = (flags[lo:hi],)
            # Whole-array SMEM block (Mosaic's divisibility rule forbids
            # a (1, nblk) row block); the kernel indexes rows by
            # program_id.
            flag_specs = [pl.BlockSpec((hi - lo, nblk),
                                       lambda i, j: (0, 0),
                                       memory_space=pltpu.SMEM)]
        Mc = (hi - lo) * tm
        pdf_c, s_c = pl.pallas_call(
            stack_kernel,
            grid=(nb, hi - lo),
            in_specs=[data_spec, data_spec, model_spec, model_spec,
                      *flag_specs, *g_specs, stat_spec],
            out_specs=(pl.BlockSpec((tb, Gp), lambda i, j: (i, 0)),
                       stat_spec),
            out_shape=(jax.ShapeDtypeStruct((B, Gp), jnp.float32),
                       jax.ShapeDtypeStruct((B, 1), jnp.float32)),
            compiler_params=params,
            cost_estimate=pl.CostEstimate(
                flops=2 * B * Mc * (Gp + 4 * F),
                bytes_accessed=(Mc * Gp + 2 * Mc * F) * 8 + B * Gp * 4,
                transcendentals=B * Mc),
            interpret=interpret,
        )(d, de, mT[:, msl], meT[:, msl],
          *flag_args, *(g[msl] for g in g_args), shift)
        pdf = pdf_c if pdf is None else pdf + pdf_c
        s = s_c if s is None else s + s_c

    if a1 <= _A1_NOLOG_MAX and m_pad:
        # Sentinel-padded models clamp to _CHI2_CLAMP in the no-log
        # kernel; their per-pad weight exp(lnl(clamp) - shift) is 0
        # except on (near-)all-clamped rows, where subtracting it here
        # keeps s (and levid) pad-free.  (Their pdf contribution is
        # already 0: padded kernel rows of G are zero.)
        pw_c = _half_pow(jnp.asarray(_CHI2_CLAMP, jnp.float32), a1)
        w_pad = jnp.exp(-0.5 * _CHI2_CLAMP - shift)
        if pw_c is not None:
            w_pad = pw_c * w_pad
        s = jnp.maximum(s - m_pad * w_pad, 0.0)
    # pdf is in exp(lnl - lmap) scale; convert to the exp(lnl - levid)
    # convention; all-zero-weight rows (insane outliers whose weights
    # underflow) degrade gracefully to zero PDFs.
    levid = jnp.where(s > 0, jnp.log(jnp.maximum(s, 1e-30)) + lmap,
                      -jnp.inf)
    pdf = jnp.where(s > 0, pdf * jnp.exp(lmap - levid), 0.0)
    return pdf, lmap[:, 0], levid[:, 0]


@functools.partial(
    jax.jit,
    static_argnames=("dim_prior", "ignore_model_err", "wt_thresh", "tb",
                     "tm", "interpret", "full_mask", "free_scale",
                     "scale_ltol", "scale_max_iter", "chi2_mxu",
                     "cdf_thresh", "cdf_topk", "m_pad", "g_split",
                     "band_skip", "screen", "screen_sub",
                     "screen_run_all", "screen_stats", "screen_absorb",
                     "screen_home_first"))
def _fused_call(d, de, dm, mT, meT, mmT, valid, G, *, dim_prior,
                ignore_model_err, wt_thresh, tb, tm, interpret,
                full_mask=False, free_scale=False, scale_ltol=1e-3,
                scale_max_iter=100, chi2_mxu=False, cdf_thresh=None,
                cdf_topk=8, m_pad=0, g_split=False, band_skip=True,
                screen=True, screen_sub=512, screen_run_all=False,
                screen_stats=False, screen_absorb=True,
                screen_home_first=True):
    cdf_mode = wt_thresh is None and cdf_thresh is not None
    if full_mask and dim_prior and not free_scale and not cdf_mode:
        if screen and not chi2_mxu:
            sm = screen_sub if tm % screen_sub == 0 else tm
            return _fused_call_fullmask_dimprior_screened(
                d, de, mT, meT, G, ignore_model_err=ignore_model_err,
                wt_thresh=wt_thresh, tb=tb, tm=tm, interpret=interpret,
                m_pad=m_pad, g_split=g_split, sm=sm,
                run_all=screen_run_all, with_stats=screen_stats,
                absorb=screen_absorb, home_first=screen_home_first)
        return _fused_call_fullmask_dimprior(
            d, de, mT, meT, G, ignore_model_err=ignore_model_err,
            wt_thresh=wt_thresh, tb=tb, tm=tm, interpret=interpret,
            chi2_mxu=chi2_mxu, m_pad=m_pad, g_split=g_split,
            band_skip=band_skip)

    B, F = d.shape
    M = mT.shape[1]
    Gp = G.shape[1]
    nb, nm = B // tb, M // tm
    gl_table = tuple(float(_sp_gammaln(0.5 * k) + _LOG_2 * 0.5 * k)
                     if k > 0 else float("inf") for k in range(F + 1))

    data_spec = pl.BlockSpec((tb, F), lambda i, j: (i, 0))
    model_spec = pl.BlockSpec((F, tm), lambda i, j: (0, j))
    valid_spec = pl.BlockSpec((1, tm), lambda i, j: (0, j))
    stat_spec = pl.BlockSpec((tb, 1), lambda i, j: (i, 0))

    nblk = Gp // 128 if (band_skip and Gp % 128 == 0 and Gp > 128) else 0
    if nblk and nm > _NM_SMEM_MAX:
        # The (nm, nblk) SMEM flag table would exceed Mosaic's
        # first-dimension ceiling (see _NM_SMEM_MAX); the general path
        # keeps one pallas_call and drops to the dense stack.  (The
        # fullmask specialization chunks the model axis instead.)
        nblk = 0
    if nblk:
        G, flags, (mT, meT, mmT, valid) = _band_sort(
            G, nm, tm, nblk, (mT, meT, mmT, valid))

    G_spec = pl.BlockSpec((tm, Gp), lambda i, j: (j, 0))
    pdf_spec = pl.BlockSpec((tb, Gp), lambda i, j: (i, 0))
    g_args, g_specs = _g_operands(G, g_split, G_spec)
    flag_args, flag_specs = (), []
    if nblk:
        flag_args = (flags,)
        flag_specs = [pl.BlockSpec((nm, nblk), lambda i, j: (0, 0),
                                   memory_space=pltpu.SMEM)]
    # The free-scale+model-errors while_loop carries three extra
    # (tb, tm) tiles, overshooting Mosaic's conservative 16 MB scoped
    # stack accounting by ~50 KB at tb=256/tm=512; physical VMEM covers
    # it, so raise the cap for that configuration only.
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"),
        vmem_limit_bytes=(32 * 1024 * 1024
                          if free_scale and not ignore_model_err
                          else None))
    cost = pl.CostEstimate(
        flops=2 * B * M * (Gp + 4 * F),
        bytes_accessed=(M * Gp + 3 * M * F) * 4 + B * Gp * 4,
        transcendentals=2 * B * M)

    if cdf_mode:
        # CDF thresholding (pdf.py:512-516): pass A for lmap/levid, a
        # top-T pass for the exact per-object weight cut, then pass B
        # thresholding lnl against the cut on the MXU.
        reduce_kernel = _make_reduce_kernel(
            F, dim_prior, ignore_model_err, gl_table, full_mask,
            free_scale, scale_ltol, scale_max_iter)
        lmap, levid = pl.pallas_call(
            reduce_kernel,
            grid=(nb, nm),
            in_specs=[data_spec, data_spec, data_spec, model_spec,
                      model_spec, model_spec, valid_spec],
            out_specs=(stat_spec, stat_spec),
            out_shape=(jax.ShapeDtypeStruct((B, 1), jnp.float32),
                       jax.ShapeDtypeStruct((B, 1), jnp.float32)),
            compiler_params=params,
            interpret=interpret,
        )(d, de, dm, mT, meT, mmT, valid)

        T = cdf_topk
        topk_kernel = _make_topk_kernel(
            F, dim_prior, ignore_model_err, gl_table, full_mask,
            free_scale, scale_ltol, scale_max_iter, T)
        top_spec = pl.BlockSpec((tb, T), lambda i, j: (i, 0))
        vals, cnts = pl.pallas_call(
            topk_kernel,
            grid=(nb, nm),
            in_specs=[data_spec, data_spec, data_spec, model_spec,
                      model_spec, model_spec, valid_spec],
            out_specs=(top_spec, top_spec),
            out_shape=(jax.ShapeDtypeStruct((B, T), jnp.float32),
                       jax.ShapeDtypeStruct((B, T), jnp.float32)),
            compiler_params=params,
            interpret=interpret,
        )(d, de, dm, mT, meT, mmT, valid)
        cut, ok = _cdf_cut(vals, cnts, levid[:, 0], float(cdf_thresh))

        stack_kernel = _make_cut_stack_kernel(
            F, dim_prior, ignore_model_err, gl_table, full_mask,
            free_scale, scale_ltol, scale_max_iter, ng=len(g_args),
            nblk=nblk)
        pdf = pl.pallas_call(
            stack_kernel,
            grid=(nb, nm),
            in_specs=[data_spec, data_spec, data_spec, model_spec,
                      model_spec, model_spec, valid_spec, *flag_specs,
                      *g_specs, stat_spec, stat_spec],
            out_specs=pdf_spec,
            out_shape=jax.ShapeDtypeStruct((B, Gp), jnp.float32),
            compiler_params=params,
            cost_estimate=cost,
            interpret=interpret,
        )(d, de, dm, mT, meT, mmT, valid, *flag_args, *g_args,
          cut[:, None], levid)
        return pdf, lmap[:, 0], levid[:, 0], ok

    if wt_thresh is None:
        # Single pass: flash-style rescaled PDF accumulator.
        onepass = _make_onepass_kernel(F, dim_prior, ignore_model_err,
                                       gl_table, full_mask, free_scale,
                                       scale_ltol, scale_max_iter,
                                       ng=len(g_args), nblk=nblk)
        pdf, lmap, levid = pl.pallas_call(
            onepass,
            grid=(nb, nm),
            in_specs=[data_spec, data_spec, data_spec, model_spec,
                      model_spec, model_spec, valid_spec, *flag_specs,
                      *g_specs],
            out_specs=(pdf_spec, stat_spec, stat_spec),
            out_shape=(jax.ShapeDtypeStruct((B, Gp), jnp.float32),
                       jax.ShapeDtypeStruct((B, 1), jnp.float32),
                       jax.ShapeDtypeStruct((B, 1), jnp.float32)),
            compiler_params=params,
            cost_estimate=cost,
            interpret=interpret,
        )(d, de, dm, mT, meT, mmT, valid, *flag_args, *g_args)
        # One-pass accumulator is relative to the running max; convert to
        # the exp(lnl - levid) convention here.
        pdf = pdf * jnp.exp(lmap - levid)
        return pdf, lmap[:, 0], levid[:, 0]

    reduce_kernel = _make_reduce_kernel(F, dim_prior, ignore_model_err,
                                        gl_table, full_mask, free_scale,
                                        scale_ltol, scale_max_iter)
    lmap, levid = pl.pallas_call(
        reduce_kernel,
        grid=(nb, nm),
        in_specs=[data_spec, data_spec, data_spec, model_spec, model_spec,
                  model_spec, valid_spec],
        out_specs=(stat_spec, stat_spec),
        out_shape=(jax.ShapeDtypeStruct((B, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1), jnp.float32)),
        compiler_params=params,
        interpret=interpret,
    )(d, de, dm, mT, meT, mmT, valid)

    log_thresh = float(np.log(wt_thresh))
    stack_kernel = _make_stack_kernel(F, dim_prior, ignore_model_err,
                                      gl_table, log_thresh, full_mask,
                                      free_scale, scale_ltol,
                                      scale_max_iter, ng=len(g_args),
                                      nblk=nblk)
    pdf = pl.pallas_call(
        stack_kernel,
        grid=(nb, nm),
        in_specs=[data_spec, data_spec, data_spec, model_spec, model_spec,
                  model_spec, valid_spec, *flag_specs, *g_specs,
                  stat_spec, stat_spec],
        out_specs=pdf_spec,
        out_shape=jax.ShapeDtypeStruct((B, Gp), jnp.float32),
        compiler_params=params,
        cost_estimate=cost,
        interpret=interpret,
    )(d, de, dm, mT, meT, mmT, valid, *flag_args, *g_args, lmap, levid)

    return pdf, lmap[:, 0], levid[:, 0]


def fused_fit_pdf(data, data_err, data_mask, models, models_err,
                  models_mask, G, *, dim_prior=True, ignore_model_err=False,
                  free_scale=False, wt_thresh=1e-3, cdf_thresh=None,
                  tb=None, tm=None, interpret=None, full_mask=None,
                  scale_ltol=1e-4, scale_max_iter=100, chi2_mxu=False,
                  cdf_topk=8, defer_cdf_check=False, g_split=None,
                  band_skip=True, screen=None, screen_sub=512,
                  screen_run_all=False, screen_stats=False,
                  screen_absorb=True, screen_home_first=True):
    """Fused fit->PDF for one object batch.

    Parameters mirror `ops.logprob` + a row-normalized kernel matrix `G`
    (Nmodel, Ngrid).  Returns (pdf, lmap, levid): unnormalized stacked
    PDFs (Nobj, Ngrid) and the GOF metrics.  Results match the XLA path
    (logprob -> logsumexp -> threshold_weights -> kde_stack) to float32
    roundoff; the caller normalizes PDFs.  One documented deviation: on
    full-mask dim-prior rows whose EVERY model chi2 exceeds the no-log
    kernel's clamp (F <= 19, chi2 > 30000 ~ insane outliers), lmap and
    levid stay f32-exact but the PDF is a uniform mixture over the
    clamped models rather than the XLA path's argmax row (the
    transcendental-free kernel cannot resolve lnl differences past the
    clamp; F > 19 uses a log-form kernel with no clamp at all).

    With ``wt_thresh=None`` and ``cdf_thresh`` set, the reference's
    sorted-CDF weight selection (pdf.py:512-516, including its
    drop-the-largest-weight quirk) runs fully on-device: a top-T pass
    tracks each object's T heaviest distinct weight values (+ tie
    counts), from which the dropped descending prefix — the minimal one
    whose mass reaches cdf_thresh — is exact whenever those values
    carry >= cdf_thresh of the mass (always, in practice, at the 2e-4
    default; `FusedCdfFallback` is raised otherwise — or, with
    ``defer_cdf_check=True``, a per-call validity flag is returned as a
    fourth output so streaming callers like BruteForce drain it with
    their bulk readback and rerun flagged batches on the XLA sort
    without a per-batch device sync).  Tie groups straddling
    the cut drop whole where the reference drops an index-prefix; ties
    only arise from duplicate models.

    ``free_scale=True`` with model errors kept runs the in-tile
    fixed-point to per-pair convergence (|delta lnl| <= max(scale_ltol,
    roundoff floor), capped at `scale_max_iter` sweeps) — same criterion
    as the XLA while_loop, so results agree to ~ltol even on heavily
    masked rows and BruteForce auto-selects this kernel.

    Shapes are padded internally: objects to `tb`, models to `tm` (padded
    models get lnl = -inf and zero kernel rows), grid columns to 128
    lanes.  `interpret=None` auto-selects interpreter mode off-TPU.
    ``g_split=True`` pre-splits the kernel matrix into bf16 (Gh, Gl)
    operands for the HIGH stack-precision emulation instead of
    `_stack_dot`'s in-tile split.  Measured bitwise-identical and
    timing-neutral on v5e (see `_stack_dot_split`), so the default
    stays False; the knob exists to reproduce that measurement and so
    the CPU suite can exercise the two-operand kernels.
    ``band_skip`` (default True; every pass-B stack kernel) sorts
    models by KDE kernel-support center and skips all-zero 128-column
    grid blocks in the stack dot — bitwise equal to the dense stack up
    to f32 reassociation of the model-tile order, at a fraction of the
    MXU passes (see `_stack_accum_blocks`).
    ``screen`` (default None -> True) routes the full-mask dim-prior
    fixed-scale configuration through the SCREENED pipeline (the
    section comment above `_fused_call_fullmask_dimprior_screened`):
    locality-sorted objects/models + per-(row, model-subtile) chi^2
    lower bounds let both passes skip subtiles whose contribution is
    provably nil — bitwise-equal results to the same kernels with
    ``screen_run_all=True`` (every skip disabled), and within f32
    reassociation of the unscreened/banded path.  ``screen=False``
    restores the banded two-pass path; ``screen_sub`` sets the
    screening granularity (model columns per skip decision; falls back
    to ``tm`` when it does not divide it).  The 512 default is a
    hardware sweep result at the driver shape: each finer level of
    per-subtile predication costs ~20 ms/batch of Mosaic control
    overhead, which outweighs the extra skips (512: 201 ms, 256:
    204 ms, 128: 292 ms at tb=tm=512, B=64Ki, M=100K).
    ``screen_absorb`` (default True) adds the ABSORPTION cut to the
    screened pass B: past the last subtile that can hold a row's
    best-fit model, the running weight sum provably contains the peak
    weight (~1), so a subtile whose weight-sum upper bound is below
    half an ulp of it folds into `s` as a bitwise no-op — an exact
    skip at delta-lnl ~ 25 instead of the f32-underflow ~104 (see
    `_make_chi2stack_screened_kernel`).  Outputs are bitwise-identical
    with it on or off; the knob exists for A/B measurement.
    """
    if interpret is None:
        interpret = not pallas_supported()
    if g_split is None:
        g_split = _default_g_split(interpret)
    if screen is None:
        screen = True
    # Host-side full-mask detection (skips all mask/Ndim work in-kernel);
    # only attempted on host arrays — device round-trips are expensive.
    # Callers that know can pass `full_mask` explicitly.
    if full_mask is None:
        full_mask = False
        if isinstance(data_mask, np.ndarray) and isinstance(models_mask,
                                                            np.ndarray):
            full_mask = bool(np.all(data_mask == 1)
                             and np.all(models_mask == 1))
    d = jnp.asarray(data, jnp.float32)
    de = jnp.asarray(data_err, jnp.float32)
    dm = jnp.asarray(data_mask, jnp.float32)
    m = jnp.asarray(models, jnp.float32)
    me = jnp.asarray(models_err, jnp.float32)
    mm = jnp.asarray(models_mask, jnp.float32)
    G = jnp.asarray(G, jnp.float32)

    B, F = d.shape
    M, Ngrid = G.shape[0], G.shape[1]
    if tm is None:
        tm = 512
    if tb is None:
        # Measured on v5e (two-pass exact kernels at the driver shape,
        # Gp=384): tb=512/tm=512 runs a batch ~5% faster than 256/512
        # (device busy 254.8 vs 268.3 ms); 1024/512 and 512/1024 fail
        # Mosaic's scoped-VMEM accounting at compile time.  Two paths
        # stay at 256: free-scale with model errors (its while_loop
        # carries three extra (tb, tm) tiles — already needs the raised
        # vmem cap at 256/512) and wide grids (Gp > 512, where the
        # (tb, Gp) PDF accumulator + (tm, Gp) kernel tiles dominate).
        tb = (256 if (free_scale and not ignore_model_err)
              or _round_up(Ngrid, 128) > 512 else 512)
    tb = min(tb, _round_up(B, 8))
    tm = min(tm, _round_up(M, 128))
    Bp = _round_up(B, tb)
    Mp = _round_up(M, tm)
    Gp = _round_up(Ngrid, 128)

    if Bp != B:
        pad = Bp - B
        d = jnp.pad(d, ((0, pad), (0, 0)))
        de = jnp.pad(de, ((0, pad), (0, 0)), constant_values=1.0)
        dm = jnp.pad(dm, ((0, pad), (0, 0)))
    valid = jnp.ones((1, M), jnp.float32)
    if Mp != M:
        pad = Mp - M
        # Sentinel 1e15 pad values drive padded models' chi2 past the
        # clamp in the full-mask path (weights identically 0); the
        # general path masks them via `valid` regardless.
        m = jnp.pad(m, ((0, pad), (0, 0)), constant_values=1e15)
        me = jnp.pad(me, ((0, pad), (0, 0)), constant_values=1.0)
        mm = jnp.pad(mm, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    if Gp != Ngrid:
        G = jnp.pad(G, ((0, 0), (0, Gp - Ngrid)))
    if Mp != M:
        G = jnp.pad(G, ((0, Mp - M), (0, 0)))

    if chi2_mxu and not (ignore_model_err and full_mask and dim_prior
                         and not free_scale):
        raise ValueError(
            "chi2_mxu requires ignore_model_err=True (per-pair "
            "sigma_d^2 + sigma_m^2 variance breaks the matmul "
            "factorization), full_mask=True, dim_prior=True, "
            "free_scale=False")
    out = _fused_call(
        d, de, dm, m.T, me.T, mm.T, valid, G, dim_prior=dim_prior,
        ignore_model_err=ignore_model_err, wt_thresh=wt_thresh, tb=tb,
        tm=tm, interpret=bool(interpret), full_mask=full_mask,
        free_scale=free_scale, scale_ltol=float(scale_ltol),
        scale_max_iter=int(scale_max_iter), chi2_mxu=bool(chi2_mxu),
        cdf_thresh=(None if cdf_thresh is None else float(cdf_thresh)),
        cdf_topk=int(cdf_topk), m_pad=Mp - M, g_split=bool(g_split),
        band_skip=bool(band_skip), screen=bool(screen),
        screen_sub=int(screen_sub), screen_run_all=bool(screen_run_all),
        screen_stats=bool(screen_stats), screen_absorb=bool(screen_absorb),
        screen_home_first=bool(screen_home_first))
    stats = None
    if screen_stats:
        if len(out) != 4:
            raise ValueError("screen_stats=True requires the screened "
                             "fullmask dim-prior fixed-scale route")
        out, stats = out[:3], out[3]
    cdf_ok = None
    if len(out) == 4:
        pdf, lmap, levid, okc = out
        # The cdf cut is exact only when the tracked top values carry
        # >= cdf_thresh of the posterior mass (essentially always at
        # the 2e-4 default); an extremely flat posterior falls back.
        cdf_ok = jnp.all(okc[:B])
        # `bool()` here forces a device sync per call; streaming callers
        # pass defer_cdf_check=True and drain the flag with their bulk
        # readback instead (rerunning flagged batches afterwards).
        if not defer_cdf_check and not bool(cdf_ok):
            raise FusedCdfFallback(
                "cdf_thresh cut undetermined for some objects (top-"
                f"{int(cdf_topk)} weights carry < cdf_thresh of the "
                "mass); use the XLA path or raise cdf_topk")
    else:
        pdf, lmap, levid = out
    pdf, lmap, levid = pdf[:B, :Ngrid], lmap[:B], levid[:B]
    # Degenerate rows (every model at the -inf floor) -> zero PDF, -inf
    # GOF, matching the XLA path's handling of all-masked objects.
    ok = lmap > _NEG_INF / 2
    pdf = jnp.where(ok[:, None], pdf, 0.0)
    lmap = jnp.where(ok, lmap, -jnp.inf)
    levid = jnp.where(ok, levid, -jnp.inf)
    if defer_cdf_check:
        if cdf_ok is None:
            cdf_ok = jnp.asarray(True)
        return pdf, lmap, levid, cdf_ok
    if stats is not None:
        return pdf, lmap, levid, stats
    return pdf, lmap, levid
