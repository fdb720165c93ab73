"""
BruteForce fitter: every model against every datum, fused fit->PDF on TPU.

Reference: `frankenz/bruteforce.py` (class BruteForce, fit/predict/
fit_predict at :66/:207/:374).  The reference loops over objects in Python,
storing seven (Ndata, Nmodel) float64 grids; at target scale (1M x 100K)
that is 5.6 TB — impossible.  Here the whole pipeline is batched and
fused:

  object batch --(lprob_func)--> (B, M) log-posteriors
              --max/logsumexp--> GOF metrics (lmap, levid)
              --exp/threshold--> posterior weights
              --@ G ----------> (B, Ngrid) label PDFs   [MXU matmul]

so the (B, M) grid lives only in HBM for one batch at a time, and the
full (Ndata, Nmodel) grids are materialized (as host NumPy, float32) only
when `save_fits=True` — the API keeps the reference's saved-fit state
(`fit_lnprior/fit_lnlike/fit_lnprob/fit_Ndim/fit_chi2/fit_scale/
fit_scale_err`) but the default fused path streams past it.

`lprob_func` keeps the reference's plugin contract (SURVEY.md section
2.2) in batched form: a traceable callable

    lprob_func(data, data_err, data_mask, models, models_err, models_mask,
               *args, **kwargs)
      -> (lnprior, lnlike, lnprob, Ndim, chi2[, scale, scale_err])

over (B, Nfilt) x (M, Nfilt) -> (B, M) arrays (default
`frankenz_tpu.ops.logprob`).  It must be jit-traceable; it is compiled
once per batch shape.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import fused as _fused
from ..ops import kde as _kde
from ..ops import likelihood as _like
from ..ops import summarize as _summ
from ..utils.metrics import metrics as _metrics
from ..utils.progress import progress_iter

__all__ = ["BruteForce"]


@functools.partial(jax.jit, static_argnames=("lprob_spec",))
def _bf_lprob_jit(d, de, dm, m, me, mm, *, lprob_spec):
    """Batched lprob with a static (func, args, kwargs-items) spec so the
    global jit cache applies across fit calls and fitter instances."""
    lprob_func, lprob_args, kw_items = lprob_spec
    if lprob_func is None:
        lprob_func = _like.logprob
    res = lprob_func(d, de, dm, m, me, mm, *lprob_args, **dict(kw_items))
    lnprior, lnlike, lnprob, ndim, chi2 = res[:5]
    scale = res[5] if len(res) > 5 else None
    scale_err = res[6] if len(res) > 6 else None
    return lnprior, lnlike, lnprob, ndim, chi2, scale, scale_err


@jax.jit
def _gof_weights(lnprob):
    lmap = jnp.max(lnprob, axis=1)
    levid = jax.scipy.special.logsumexp(lnprob, axis=1)
    return lmap, levid, jnp.exp(lnprob - levid[:, None])


_norm_rows = jax.jit(_kde.norm_rows)


def _batch_slices(n, batch_size):
    """Static-shape batching: every batch has exactly `batch_size` rows;
    the last is padded (caller slices the valid region)."""
    for start in range(0, n, batch_size):
        yield start, min(batch_size, n - start)


def _pad_rows(arr, batch_size):
    pad = batch_size - arr.shape[0]
    if pad <= 0:
        return arr
    return np.concatenate([arr, np.zeros((pad,) + arr.shape[1:],
                                         arr.dtype)], axis=0)


def resume_fit_rows(obj, resume, checkpoint_file, ndata,
                    checkpoint_every=None):
    """Restore a mid-fit checkpoint onto `obj`; returns completed rows.

    SURVEY.md section 5 (failure detection): the reference survives
    crashes only because fit state fills `self` as it goes
    (bruteforce.py:183-189); here the same consistent prefix is
    periodically persisted and restored.  Shared by every fitter's
    batch-checkpointing fit loop; also validates the SAVE plan up
    front (checkpoint_every without a file must fail before the first
    batch, not at the first save).
    """
    from ..utils import checkpoint as _ckpt

    _ckpt.validate_plan(checkpoint_every, checkpoint_file)
    if not resume:
        return 0
    if not checkpoint_file:
        raise ValueError("resume=True requires checkpoint_file")
    if not _ckpt.exists(checkpoint_file):
        return 0
    _ckpt.restore(checkpoint_file, obj)
    done = int(getattr(obj, "_fit_rows_done", 0) or 0)
    if obj.NDATA != ndata:
        raise ValueError(
            f"checkpoint was taken for NDATA={obj.NDATA}, resuming "
            f"fit has ndata={ndata}")
    return done


def default_batch_size(nmodel, budget_elems=1 << 26):
    """Object-batch size keeping the (B, M) grid near `budget_elems`."""
    b = max(64, int(budget_elems // max(nmodel, 1)))
    return int(min(1 << 14, 1 << (b.bit_length() - 1)))


def default_fused_batch_size(ndata, ngrid, budget_elems=1 << 25):
    """Object-batch size for the fused streaming path.

    The fused kernel never materializes the (B, M) grid (it lives
    tile-by-tile in VMEM), so unlike `default_batch_size` the batch is
    NOT bounded by Nmodel — only by the HBM PDF accumulator (B, Gp)
    (`budget_elems` f32 elements, 128 MB default) and capped at 65536
    (the bench-validated driver batch).  Large batches matter over the
    remote-TPU relay: each dispatched module has ~10 ms of host/relay
    latency, so 1M objects in 512-row batches spend more time
    dispatching than computing (measured: fit_summarize 73 s at batch
    512 vs ~16 x 0.25 s device time at batch 65536).  Small catalogs
    round up to the next power of two (>=256) so padding stays bounded
    and repeat calls at the same catalog scale reuse one compile.
    """
    gp = -(-int(ngrid) // 128) * 128
    b = max(512, min(1 << 16, int(budget_elems) // gp))
    b = 1 << (b.bit_length() - 1)
    if ndata < b:
        b = min(b, max(256, 1 << max(int(ndata) - 1, 1).bit_length()))
    return int(b)


# Wide-grid crossover (measured, docs/MXU_NOTE.md section 7): once the
# padded grid reaches this many columns, the XLA dense stack — 3 bf16 MXU
# passes over a materialized (B, M) weight matrix — beats the fused
# Pallas kernel (whose in-tile chi2 serializes against the stack dot),
# 6.0e9 vs 5.2e9 pair/s at Gp=4096 on v5e.  Below it the fused kernel
# wins outright (2.57e10 vs 2.2e10 at Gp=384).  Set from the hardware
# sweep in the same note; free-scale configs never switch (the Pallas
# in-tile iteration is 1.9x the XLA while_loop there).
_WIDE_GRID_XLA_GP = 2048


_STREAM_PENDING_BYTES = 2 << 30


def _drain_pending(parts, host_parts, part_bytes):
    """Bound the device residency of streamed result batches.

    The streaming fit_predict paths keep every batch's (B, width) PDF
    block on device until one bulk readback (per-batch syncs would
    serialize compute with tunnel round-trips).  At 1M objects on a
    wide serving grid the pending blocks alone reach ~16 GB and OOM
    HBM — so once the pending set would exceed `_STREAM_PENDING_BYTES`
    (2 GiB), drain it to host in one chunk.  Async dispatch keeps the
    pipeline full between drains; results are unchanged.
    """
    if parts and (len(parts) + 1) * part_bytes > _STREAM_PENDING_BYTES:
        host_parts.extend(jax.device_get(parts))
        parts = []
    return parts, host_parts


def default_xla_batch_size(nmodel, budget_elems=1 << 30):
    """Object-batch size for the wide-grid streaming XLA path.

    Unlike `default_batch_size` (sized for seven saved-fit grids), this
    path materializes ONE transient (B, M) weight matrix feeding the MXU
    stack; the measured-optimal batch at 100K models is 8192 (~3.3 GB
    f32 with its elementwise producers, docs/MXU_NOTE.md section 7).
    Larger model sets scale the batch down to keep (B, M) near
    `budget_elems`.
    """
    b = max(256, int(budget_elems) // max(int(nmodel), 1))
    return int(min(1 << 13, 1 << (b.bit_length() - 1)))


def _wide_grid_xla(ngrid, lprob_kwargs):
    """True when auto-dispatch should run the XLA dense stack (wide
    serving grid, fixed scale) instead of the fused Pallas kernel."""
    kw = lprob_kwargs or {}
    if kw.get("free_scale"):
        return False
    return -(-int(ngrid) // 128) * 128 >= _WIDE_GRID_XLA_GP


@functools.partial(jax.jit, static_argnames=("lprob_spec", "wt_thresh",
                                             "cdf_thresh"))
def _bf_stream_xla_jit(d, de, dm, m, me, mm, G, *, lprob_spec, wt_thresh,
                       cdf_thresh):
    """One wide-grid serving batch on the XLA dense stack.

    log-posteriors -> GOF -> thresholded weights -> (B, M) @ (M, Gp)
    MXU stack, all inside one jitted module (static spec keys the
    global jit cache, tests/test_recompile.py) — only (B, Ngrid) PDFs
    and per-object GOF scalars ever leave the device.
    """
    lprob_func, lprob_args, kw_items = lprob_spec
    if lprob_func is None:
        lprob_func = _like.logprob
    res = lprob_func(d, de, dm, m, me, mm, *lprob_args, **dict(kw_items))
    lnprob = res[2]
    lmap = jnp.max(lnprob, axis=1)
    levid = jax.scipy.special.logsumexp(lnprob, axis=1)
    wt = jnp.exp(lnprob - levid[:, None])
    pdf = _kde.kde_stack(wt, G, wt_thresh, cdf_thresh)
    return _kde.norm_rows(pdf), lmap, levid


@functools.lru_cache(maxsize=None)
def _sharded_fp_step(mesh, obj_axis, use_pallas, lprob_spec, wt_thresh,
                     cdf_thresh, dim_prior, ignore_model_err, free_scale,
                     full_mask, interpret, scale_ltol, scale_max_iter):
    """Mesh-sharded fused fit->PDF step (cached per mesh + static spec).

    Objects shard over `obj_axis`; the model set and kernel matrix
    replicate.  Each shard runs the SAME per-chip pipeline as the
    single-device path (the Pallas kernel or the XLA composition) under
    `shard_map` — photo-z fitting is pure data parallel, so the SPMD
    program has zero collectives.
    """
    from jax.sharding import PartitionSpec as P

    def local(d, de, dm, m, me, mm, G):
        if use_pallas:
            pdf, lmap, levid = _fused.fused_fit_pdf(
                d, de, dm, m, me, mm, G, dim_prior=dim_prior,
                ignore_model_err=ignore_model_err, free_scale=free_scale,
                wt_thresh=wt_thresh, full_mask=full_mask,
                interpret=interpret, scale_ltol=scale_ltol,
                scale_max_iter=scale_max_iter)
        else:
            res = _bf_lprob_jit(d, de, dm, m, me, mm,
                                lprob_spec=lprob_spec)
            lmap, levid, wt = _gof_weights(res[2])
            pdf = _kde.kde_stack(wt, G, wt_thresh, cdf_thresh)
        return _kde.norm_rows(pdf), lmap, levid

    dspec = P(obj_axis, None)
    rspec = P(None, None)
    # check_vma=False: pallas_call outputs carry no varying-mesh-axis
    # annotation; the kernel is purely shard-local (no collectives).
    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(dspec, dspec, dspec, rspec, rspec, rspec, rspec),
        out_specs=(dspec, P(obj_axis), P(obj_axis)),
        check_vma=False))


class BruteForce:
    """Brute-force photo-z fitter over a fixed model set.

    Parameters
    ----------
    models, models_err, models_mask : array_like of shape (Nmodel, Nfilt)
        Model photometry, errors, and 0/1 observation mask (kept on device).
    full_mask : bool, optional
        Declare the model mask all-ones to engage the fullmask
        fast-path kernels (screened/banded chi2-domain stacks).  When
        omitted it is auto-detected from HOST inputs only — a
        `jax.Array` mask is NOT read back (device readbacks over the
        remote relay are slow), so pass `full_mask=True` explicitly if
        you construct with device arrays and know the mask is trivial.
    """

    def __init__(self, models, models_err, models_mask, full_mask=None):
        self.models = jnp.asarray(models)
        self.models_err = jnp.asarray(models_err)
        self.models_mask = jnp.asarray(models_mask)
        # Full-mask detection for the Pallas fast path, done once on the
        # host inputs (device readbacks over a remote relay are slow) —
        # overridable for device-array ctor inputs (see docstring).
        if full_mask is not None:
            self._full_mask = bool(full_mask)
        else:
            self._full_mask = bool(np.all(np.asarray(models_mask) == 1)) \
                if not isinstance(models_mask, jax.Array) else False
        self.NMODEL, self.NDIM = self.models.shape
        self.NDATA = None
        self.fit_lnprior = None
        self.fit_lnlike = None
        self.fit_lnprob = None
        self.fit_Ndim = None
        self.fit_chi2 = None
        self.fit_scale = None
        self.fit_scale_err = None
        self._fit_rows_done = 0

    # ------------------------------------------------------------------
    # internals
    # ------------------------------------------------------------------

    def _lprob_step(self, lprob_func, lprob_args, lprob_kwargs):
        """Batched lprob evaluation returning the 7-field tuple (cached
        globally via `_bf_lprob_jit`; args/kwargs must be hashable)."""
        spec = _like.static_spec(lprob_func, lprob_args, lprob_kwargs)

        def step(d, de, dm, m, me, mm):
            return _bf_lprob_jit(d, de, dm, m, me, mm, lprob_spec=spec)

        return step

    def _alloc_fits(self, ndata, track_scale, fit_dtype=np.float32):
        m = self.NMODEL
        dt = np.dtype(fit_dtype)
        self.NDATA = ndata
        self.fit_lnprior = np.zeros((ndata, m), dt)
        self.fit_lnlike = np.zeros((ndata, m), dt)
        self.fit_lnprob = np.zeros((ndata, m), dt)
        self.fit_Ndim = np.zeros((ndata, m), np.int32)
        self.fit_chi2 = np.zeros((ndata, m), dt)
        if track_scale:
            self.fit_scale = np.ones((ndata, m), dt)
            self.fit_scale_err = np.zeros((ndata, m), dt)
        else:
            self.fit_scale = None
            self.fit_scale_err = None

    def _store_fits(self, i0, n, res):
        lnprior, lnlike, lnprob, ndim, chi2, scale, scale_err = res
        sl = slice(i0, i0 + n)
        dt = self.fit_lnprob.dtype
        self.fit_lnprior[sl] = np.asarray(lnprior[:n], dt)
        self.fit_lnlike[sl] = np.asarray(lnlike[:n], dt)
        self.fit_lnprob[sl] = np.asarray(lnprob[:n], dt)
        self.fit_Ndim[sl] = np.asarray(ndim[:n], np.int32)
        self.fit_chi2[sl] = np.asarray(chi2[:n], dt)
        if scale is not None and self.fit_scale is not None:
            self.fit_scale[sl] = np.asarray(scale[:n], dt)
        if scale_err is not None and self.fit_scale_err is not None:
            self.fit_scale_err[sl] = np.asarray(scale_err[:n], dt)

    def _fp_metrics(self, ndata):
        """fit_predict telemetry: one phase timer + the BASELINE counters
        (chi^2 pair-evals, per-object PDF stacks) on the global registry
        (SURVEY.md section 5, metrics/observability)."""
        _metrics.count("pdf_stacks", ndata)
        return _metrics.timer("bruteforce.fit_predict",
                              items=ndata * self.NMODEL,
                              item_counter="chi2_pair_evals")

    def _kernel_G(self, model_labels, model_label_errs, label_dict,
                  label_grid, dx=None, sig_thresh=5.0):
        """(Nmodel, Ngrid) row-normalized kernel matrix + the grid.

        `dx`/`sig_thresh` apply to the grid (non-dict) path, mirroring
        `gauss_kde`'s kwargs (pdf.py:444); the dict path's truncation is
        fixed at `PDFDict` construction, as in `gauss_kde_dict`.
        """
        if label_dict is not None:
            y_idx, y_std_idx = label_dict.fit(jnp.asarray(model_labels),
                                              jnp.asarray(model_label_errs))
            G = _kde.kernel_matrix_dict(label_dict, y_idx, y_std_idx)
            return G, jnp.asarray(label_dict.grid)
        if label_grid is None:
            raise ValueError("`label_dict` or `label_grid` must be "
                             "specified.")
        grid = jnp.asarray(label_grid)
        G = _kde.kernel_matrix(jnp.asarray(model_labels),
                               jnp.asarray(model_label_errs), grid,
                               dx=dx, sig_thresh=sig_thresh)
        return G, grid

    # ------------------------------------------------------------------
    # public API (mirrors the reference surface)
    # ------------------------------------------------------------------

    def fit(self, data, data_err, data_mask, lprob_func=None,
            lprob_args=None, lprob_kwargs=None, track_scale=False,
            verbose=True, batch_size=None, checkpoint_every=None,
            checkpoint_file=None, resume=False, fit_dtype=np.float32):
        """Fit all models to all data; store the full posterior grids.

        Reference: `bruteforce.py:66-125`.  `fit_dtype` sets the saved-
        fit storage precision: float32 by default (halving the
        7*Ndata*Nmodel footprint — far beyond the 1e-3 weight-threshold
        resolution any downstream consumer uses), or float64 for the
        reference's exact storage contract (bruteforce.py:183-189; the
        device computation itself is float32 either way).

        With `checkpoint_every=N`, the saved-fit state (a consistent
        prefix) is written to `checkpoint_file` every N batches via
        `utils.checkpoint`; `resume=True` restores an existing checkpoint
        and continues from the first incomplete batch, reproducing the
        uninterrupted results exactly.
        """
        from ..utils import checkpoint as _ckpt

        data = np.atleast_2d(np.asarray(data))
        data_err = np.atleast_2d(np.asarray(data_err))
        data_mask = np.atleast_2d(np.asarray(data_mask))
        ndata = data.shape[0]
        if batch_size is None:
            batch_size = default_batch_size(self.NMODEL)
        step = self._lprob_step(lprob_func, lprob_args, lprob_kwargs)
        done = resume_fit_rows(self, resume, checkpoint_file, ndata,
                               checkpoint_every)
        if not done:
            self._alloc_fits(ndata, track_scale, fit_dtype)
        self._fit_rows_done = done

        def drain(parts):
            # Bulk readback: JAX's async dispatch pipelines the queued
            # batches; a per-batch np.asarray would serialize each
            # device program with a (slow) relay round-trip.
            for j0, jn, jres in jax.device_get(parts):
                self._store_fits(j0, jn, jres)
                self._fit_rows_done = j0 + jn

        nb = 0
        parts = []
        with _metrics.timer("bruteforce.fit",
                            items=(ndata - done) * self.NMODEL,
                            item_counter="chi2_pair_evals"):
            for i0, n in progress_iter(_batch_slices(ndata, batch_size),
                                       total=ndata, label="Fitting object",
                                       sizes=True, verbose=verbose):
                if i0 + n <= done:
                    continue
                d = _pad_rows(data[i0:i0 + n], batch_size)
                de = _pad_rows(data_err[i0:i0 + n], batch_size)
                dm = _pad_rows(data_mask[i0:i0 + n], batch_size)
                parts.append((i0, n, step(d, de, dm, self.models,
                                          self.models_err,
                                          self.models_mask)))
                nb += 1
                if checkpoint_every and nb % checkpoint_every == 0:
                    drain(parts)
                    parts = []
                    _ckpt.save(checkpoint_file, self)
                elif len(parts) >= 16:
                    drain(parts)
                    parts = []
            drain(parts)
        return self

    def predict(self, model_labels, model_label_errs, label_dict=None,
                label_grid=None, logwt=None, kde_args=None, kde_kwargs=None,
                return_gof=False, verbose=True, batch_size=None,
                wt_thresh=1e-3, cdf_thresh=2e-4):
        """Turn stored (or provided) log-weights into per-object label PDFs.

        Reference: `bruteforce.py:207-372`.  The KDE stack is a weights @
        kernel-matrix contraction; each PDF is normalized to sum 1.
        `kde_args`/`kde_kwargs` accept `wt_thresh`/`cdf_thresh` overrides
        for compatibility.
        """
        if logwt is None:
            logwt = self.fit_lnprob
        if logwt is None:
            raise ValueError("Fits have not been computed and weights have "
                             "not been provided.")
        dx, sig_thresh, wt_thresh, cdf_thresh = _kde.resolve_kde_opts(
            kde_args, kde_kwargs, wt_thresh, cdf_thresh)
        G, grid = self._kernel_G(model_labels, model_label_errs, label_dict,
                                 label_grid, dx=dx, sig_thresh=sig_thresh)
        logwt = np.atleast_2d(np.asarray(logwt))
        ndata = logwt.shape[0]
        if batch_size is None:
            batch_size = default_batch_size(self.NMODEL)

        def stack(lwt, G):
            lmap, levid, wt = _gof_weights(lwt)
            pdf = _kde.kde_stack(wt, G, wt_thresh, cdf_thresh)
            return _norm_rows(pdf), lmap, levid

        ngrid = G.shape[1]
        pdfs = np.zeros((ndata, ngrid), np.float32)
        lmap = np.zeros(ndata, np.float32)
        levid = np.zeros(ndata, np.float32)
        with _metrics.timer("bruteforce.predict", items=ndata,
                            item_counter="pdf_stacks"):
            for i0, n in progress_iter(_batch_slices(ndata, batch_size),
                                       total=ndata, label="Generating PDF",
                                       sizes=True, verbose=verbose):
                lwt = _pad_rows(logwt[i0:i0 + n].astype(np.float32),
                                batch_size)
                pdf_b, lmap_b, levid_b = stack(lwt, G)
                pdfs[i0:i0 + n] = np.asarray(pdf_b[:n])
                lmap[i0:i0 + n] = np.asarray(lmap_b[:n])
                levid[i0:i0 + n] = np.asarray(levid_b[:n])

        if return_gof:
            return pdfs, (lmap, levid)
        return pdfs

    def _fused_eligible(self, lprob_func, lprob_args, lprob_kwargs,
                        track_scale, save_fits, wt_thresh, cdf_thresh):
        """The Pallas kernel covers the default lprob pipelines
        (fixed- and free-scale; the free-scale+model-errors tile runs
        its fixed-point to per-pair convergence, matching the XLA
        while_loop, so it auto-selects too)."""
        if lprob_func is not None or lprob_args or track_scale or save_fits:
            return False
        kw = lprob_kwargs or {}
        if kw.get("return_scale"):
            return False
        if set(kw) - {"free_scale", "ignore_model_err", "dim_prior",
                      "return_scale", "ltol", "max_iter"}:
            return False
        return True

    def fit_predict(self, data, data_err, data_mask, model_labels,
                    model_label_errs, lprob_func=None, label_dict=None,
                    label_grid=None, kde_args=None, kde_kwargs=None,
                    lprob_args=None, lprob_kwargs=None, return_gof=False,
                    track_scale=False, verbose=True, save_fits=False,
                    batch_size=None, wt_thresh=1e-3, cdf_thresh=2e-4,
                    use_fused=None, mesh=None, _post_setup=None):
        """Fused fit + predict: posteriors -> weights -> PDFs in one pass.

        Reference: `bruteforce.py:374-631`.  Unlike the reference (which
        defaults `save_fits=True`), the fused path defaults to *not*
        materializing the (Ndata, Nmodel) grids — at the 1M x 100K target
        that difference is 2.8 TB vs 0.  The (B, M) batch grid never
        leaves the device; only PDFs and GOF metrics stream back.

        On TPU, default fixed-scale configurations automatically run the
        fused Pallas kernel (`ops.fused.fused_fit_pdf`) — the (B, M) grid
        then never leaves VMEM; set ``use_fused=False`` to force the XLA
        path (or True to force the kernel, e.g. interpret mode in tests).
        One measured exception, handled automatically (docs/MXU_NOTE.md
        section 7): on WIDE serving grids (padded Ngrid >=
        `_WIDE_GRID_XLA_GP`) where a batch's (B, M) weight matrix fits
        in HBM, auto-dispatch streams batches through the XLA dense
        stack instead (`_fit_predict_xla_stream`, batch ~8K at 100K
        models) — 3 bf16 MXU passes over the materialized weights beat
        the fused kernel by ~15% there (6.0e9 vs 5.2e9 pair/s at
        Ngrid=4001 on v5e).  The fused kernel remains the default for
        narrow grids, free-scale fits, and whenever ``use_fused=True``
        forces it.

        `_post_setup` (internal, see `fit_summarize` and
        `ops.summarize.stream_summary_setup`): resolves to a jitted
        device-side transform `(pdf_batch, i0) -> (B, width)` applied to
        each normalized PDF batch before results leave the device — the
        "pdfs" the caller receives are then the transformed columns.
        """
        data = np.atleast_2d(np.asarray(data))
        data_err = np.atleast_2d(np.asarray(data_err))
        data_mask = np.atleast_2d(np.asarray(data_mask))
        ndata = data.shape[0]
        dx, sig_thresh, wt_thresh, cdf_thresh = _kde.resolve_kde_opts(
            kde_args, kde_kwargs, wt_thresh, cdf_thresh)
        batch_size_explicit = batch_size is not None
        if batch_size is None:
            batch_size = default_batch_size(self.NMODEL)
        G, grid = self._kernel_G(model_labels, model_label_errs, label_dict,
                                 label_grid, dx=dx, sig_thresh=sig_thresh)
        eligible = self._fused_eligible(lprob_func, lprob_args,
                                        lprob_kwargs, track_scale,
                                        save_fits, wt_thresh, cdf_thresh)
        cdf_mode = wt_thresh is None and cdf_thresh is not None
        explicit_fused = use_fused is True
        xla_stream = False
        if use_fused is None:
            use_fused = eligible and _fused.pallas_supported()
            if use_fused and _wide_grid_xla(len(grid), lprob_kwargs):
                # Measured crossover (docs/MXU_NOTE.md sections 7-8):
                # wide serving grids run the XLA dense stack.  Under
                # mesh= the same decision routes the sharded local step
                # through the XLA composition (`_sharded_fp_step`'s
                # non-Pallas branch is that dense stack; it shard_maps
                # cleanly, and the cdf top-T escape — the one
                # incompatibility — already raises above).
                use_fused = False
                xla_stream = mesh is None
        elif use_fused and not eligible:
            raise ValueError("use_fused=True requires the default lprob "
                             "pipeline (no custom lprob_func/args, no "
                             "save_fits/track_scale/return_scale, "
                             "wt_thresh-style thresholding)")
        if mesh is not None:
            if explicit_fused and cdf_mode:
                # Don't silently honor an explicit kernel request with
                # the XLA path: the cdf top-T pass and its FusedCdfFallback
                # escape don't compose with shard_map.
                raise ValueError(
                    "use_fused=True with cdf_thresh selection is not "
                    "supported under mesh=; the sharded cdf path runs the "
                    "XLA composition (pass use_fused=None/False)")
            if save_fits or track_scale:
                raise ValueError("mesh-sharded fit_predict streams PDFs "
                                 "only; save_fits/track_scale are "
                                 "unsupported (run per-host fit() for "
                                 "stored grids)")
            with self._fp_metrics(ndata):
                return self._fit_predict_sharded(
                    data, data_err, data_mask, G, lprob_func, lprob_args,
                    lprob_kwargs, wt_thresh, cdf_thresh, batch_size, mesh,
                    bool(use_fused) and not cdf_mode,
                    return_gof, verbose, _post_setup)
        if use_fused:
            if not batch_size_explicit:
                # The fused path is dispatch-latency-bound, not
                # (B, M)-HBM-bound — use the wide streaming default.
                batch_size = default_fused_batch_size(ndata, len(grid))
            with self._fp_metrics(ndata):
                return self._fit_predict_fused(
                    data, data_err, data_mask, G, lprob_kwargs or {},
                    wt_thresh, cdf_thresh, batch_size, return_gof,
                    verbose, _post_setup)
        if xla_stream:
            if not batch_size_explicit:
                batch_size = default_xla_batch_size(self.NMODEL)
            with self._fp_metrics(ndata):
                return self._fit_predict_xla_stream(
                    data, data_err, data_mask, G, lprob_kwargs or {},
                    wt_thresh, cdf_thresh, batch_size, return_gof,
                    verbose, _post_setup)
        if lprob_func is None:
            lprob_func = _like.logprob
        lprob_args = lprob_args or ()
        lprob_kwargs = lprob_kwargs or {}

        spec = _like.static_spec(lprob_func, lprob_args, lprob_kwargs)

        def fused(d, de, dm, m, me, mm, G):
            res = _bf_lprob_jit(d, de, dm, m, me, mm, lprob_spec=spec)
            lnprob = res[2]
            lmap, levid, wt = _gof_weights(lnprob)
            pdf = _kde.kde_stack(wt, G, wt_thresh, cdf_thresh)
            return _norm_rows(pdf), lmap, levid, res

        if save_fits:
            self._alloc_fits(ndata, track_scale)
        _post, ngrid = ((None, G.shape[1]) if _post_setup is None
                        else _post_setup(ndata, batch_size))
        pdfs = np.zeros((ndata, ngrid), np.float32)
        lmap = np.zeros(ndata, np.float32)
        levid = np.zeros(ndata, np.float32)
        with self._fp_metrics(ndata):
            for i0, n in progress_iter(_batch_slices(ndata, batch_size),
                                       total=ndata, label="Fitting object",
                                       sizes=True, verbose=verbose):
                d = _pad_rows(data[i0:i0 + n], batch_size)
                de = _pad_rows(data_err[i0:i0 + n], batch_size)
                dm = _pad_rows(data_mask[i0:i0 + n], batch_size)
                pdf_b, lmap_b, levid_b, res = fused(
                    d, de, dm, self.models, self.models_err,
                    self.models_mask, G)
                if _post is not None:
                    pdf_b = _post(pdf_b, i0)
                pdfs[i0:i0 + n] = np.asarray(pdf_b[:n])
                lmap[i0:i0 + n] = np.asarray(lmap_b[:n])
                levid[i0:i0 + n] = np.asarray(levid_b[:n])
                if save_fits:
                    full = res[:5] + ((res[5] if len(res) > 5 else None),
                                      (res[6] if len(res) > 6 else None))
                    self._store_fits(i0, n, full)

        if return_gof:
            return pdfs, (lmap, levid)
        return pdfs

    def fit_summarize(self, data, data_err, data_mask, model_labels,
                      model_label_errs, label_dict=None, label_grid=None,
                      kde_args=None, kde_kwargs=None, lprob_func=None,
                      lprob_args=None, lprob_kwargs=None, verbose=True,
                      batch_size=None, wt_thresh=1e-3, cdf_thresh=2e-4,
                      use_fused=None, mesh=None, pkern="lorentz",
                      pkern_grid=None, summary_seed=0):
        """`fit_predict` + `pdfs_summarize` with the summary computed ON
        DEVICE per batch: only the 21 packed summary columns (plus the
        GOF metrics) ever stream back to the host — the (Ndata, Ngrid)
        PDF matrix is reduced on-chip right after the KDE stack.

        The reference workflow materializes every PDF and summarizes on
        the host (pdf.py:899-1074 over bruteforce.py:374's output); at
        catalog scale the PDF readback dominates the serving wall time
        (Ngrid/21 ~ 15-30x more transfer than the summaries).  Results
        are identical to ``pdfs_summarize(fit_predict(...))`` with
        default conf window/renormalization; the MC draw uses uniforms
        drawn once on the host as ``default_rng(summary_seed).random()``
        per (padded) catalog row, so it is independent of batching.

        Returns ``(PDFSummary, (lmap, levid))`` as host NumPy arrays.
        Custom `wconf_func` consumers need the PDFs anyway — use
        `fit_predict` + `pdfs_summarize`.
        """
        grid = _summ.label_grid_of(label_dict, label_grid)
        cols, gof = self.fit_predict(
            data, data_err, data_mask, model_labels, model_label_errs,
            lprob_func=lprob_func, label_dict=label_dict,
            label_grid=label_grid, kde_args=kde_args,
            kde_kwargs=kde_kwargs, lprob_args=lprob_args,
            lprob_kwargs=lprob_kwargs, return_gof=True, verbose=verbose,
            batch_size=batch_size, wt_thresh=wt_thresh,
            cdf_thresh=cdf_thresh, use_fused=use_fused, mesh=mesh,
            _post_setup=_summ.stream_summary_setup(grid, pkern, pkern_grid,
                                                   summary_seed))
        return _summ.unpack_summary(cols), gof

    def _fit_predict_sharded(self, data, data_err, data_mask, G,
                             lprob_func, lprob_args, lprob_kwargs,
                             wt_thresh, cdf_thresh, batch_size, mesh,
                             use_pallas, return_gof, verbose,
                             post_setup=None):
        """Stream object batches through a mesh-sharded fused step.

        Pure data parallelism over the mesh's first axis: every chip
        holds the (replicated) model set + kernel matrix and fits its
        shard of each batch; results concatenate on the host.  The
        per-chip compute is the Pallas kernel when the single-device
        dispatch would use it, else the XLA composition.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        obj_axis = mesh.axis_names[0]
        ndev = int(mesh.size)
        ndata = data.shape[0]
        # Batch must split evenly over the mesh; round up to a multiple.
        batch_size = -(-batch_size // ndev) * ndev
        kw = lprob_kwargs or {}
        full_mask = self._full_mask and bool(np.all(data_mask == 1))
        lprob_spec = _like.static_spec(lprob_func, lprob_args, kw)
        step = _sharded_fp_step(
            mesh, obj_axis, use_pallas, lprob_spec, wt_thresh, cdf_thresh,
            kw.get("dim_prior", True), kw.get("ignore_model_err", False),
            kw.get("free_scale", False), full_mask,
            not _fused.pallas_supported(), float(kw.get("ltol", 1e-4)),
            int(kw.get("max_iter", 100)))

        dspec = NamedSharding(mesh, P(obj_axis))
        rspec = NamedSharding(mesh, P())
        m = jax.device_put(jnp.asarray(self.models, jnp.float32), rspec)
        me = jax.device_put(jnp.asarray(self.models_err, jnp.float32),
                            rspec)
        mm = jax.device_put(jnp.asarray(self.models_mask, jnp.float32),
                            rspec)
        Gr = jax.device_put(jnp.asarray(G, jnp.float32), rspec)

        pad = (-ndata) % batch_size
        data_p = np.pad(np.asarray(data, np.float32), ((0, pad), (0, 0)))
        err_p = np.pad(np.asarray(data_err, np.float32),
                       ((0, pad), (0, 0)), constant_values=1.0)
        mask_p = np.pad(np.asarray(data_mask, np.float32),
                        ((0, pad), (0, 0)))

        post, ngrid = ((None, G.shape[1]) if post_setup is None
                       else post_setup(ndata, batch_size))
        pdfs = np.zeros((ndata, ngrid), np.float32)
        lmap = np.zeros(ndata, np.float32)
        levid = np.zeros(ndata, np.float32)
        parts = []
        # Dispatch is async; the single bulk device_get below is where
        # the wall time goes, so progress reports dispatched batches.
        for i0, n in progress_iter(_batch_slices(ndata, batch_size),
                                   total=ndata, label="Dispatching batch",
                                   verbose=verbose, sizes=True):
            sl = slice(i0, i0 + batch_size)
            d = jax.device_put(data_p[sl], dspec)
            de = jax.device_put(err_p[sl], dspec)
            dm = jax.device_put(mask_p[sl], dspec)
            pdf_b, lmap_b, levid_b = step(d, de, dm, m, me, mm, Gr)
            if post is not None:
                # The transform is a jitted per-object map; on the
                # obj-sharded batch it runs shard-local and only its
                # (B, post_width) output joins the bulk readback.
                pdf_b = post(pdf_b, i0)
            parts.append((i0, n, (pdf_b, lmap_b, levid_b)))
        for i0, n, out in jax.device_get(parts):
            pdf_b, lmap_b, levid_b = out
            pdfs[i0:i0 + n] = pdf_b[:n]
            lmap[i0:i0 + n] = lmap_b[:n]
            levid[i0:i0 + n] = levid_b[:n]
        if return_gof:
            return pdfs, (lmap, levid)
        return pdfs

    def _fit_predict_fused(self, data, data_err, data_mask, G,
                           lprob_kwargs, wt_thresh, cdf_thresh,
                           batch_size, return_gof, verbose,
                           post_setup=None):
        """Stream object batches through the Pallas fused kernel.

        The whole catalog is uploaded once, batches are sliced on device,
        and results stay on device until one bulk readback — JAX's async
        dispatch then pipelines every batch (per-batch host readbacks
        would serialize compute with tunnel round-trips).
        """
        ndata = data.shape[0]
        post = (None if post_setup is None
                else post_setup(ndata, batch_size)[0])
        dim_prior = lprob_kwargs.get("dim_prior", True)
        ignore_model_err = lprob_kwargs.get("ignore_model_err", False)
        free_scale = lprob_kwargs.get("free_scale", False)
        full_mask = self._full_mask and bool(np.all(data_mask == 1))
        G = jnp.asarray(G, jnp.float32)
        pad = (-ndata) % batch_size
        d_all = jnp.asarray(np.pad(data, ((0, pad), (0, 0))), jnp.float32)
        de_all = jnp.asarray(np.pad(data_err, ((0, pad), (0, 0)),
                                    constant_values=1.0), jnp.float32)
        dm_all = jnp.asarray(np.pad(data_mask, ((0, pad), (0, 0))),
                             jnp.float32)

        def slices(i0):
            return (jax.lax.dynamic_slice_in_dim(d_all, i0, batch_size),
                    jax.lax.dynamic_slice_in_dim(de_all, i0, batch_size),
                    jax.lax.dynamic_slice_in_dim(dm_all, i0, batch_size))

        parts, host_parts = [], []
        starts = []
        for i0, n in progress_iter(_batch_slices(ndata, batch_size),
                                   total=ndata, label="Fitting object",
                                   sizes=True, verbose=verbose):
            d, de, dm = slices(i0)
            # defer_cdf_check: the cdf-cut validity flag rides the async
            # pipeline and drains with the bulk readback below — a
            # per-batch bool() sync here would serialize every batch
            # with a tunnel round-trip.  Flagged batches (pathologically
            # flat posteriors) rerun on the XLA sort path afterwards.
            pdf_b, lmap_b, levid_b, ok_b = _fused.fused_fit_pdf(
                d, de, dm, self.models, self.models_err,
                self.models_mask, G, dim_prior=dim_prior,
                ignore_model_err=ignore_model_err,
                free_scale=free_scale, wt_thresh=wt_thresh,
                cdf_thresh=(cdf_thresh if wt_thresh is None
                            else None),
                full_mask=full_mask,
                scale_ltol=float(lprob_kwargs.get("ltol", 1e-4)),
                scale_max_iter=int(lprob_kwargs.get("max_iter", 100)),
                defer_cdf_check=True)
            pdf_b = _kde.norm_rows(pdf_b)
            if post is not None:
                pdf_b = post(pdf_b, i0)
            parts, host_parts = _drain_pending(
                parts, host_parts, pdf_b.shape[1] * batch_size * 4)
            parts.append((pdf_b, lmap_b, levid_b, ok_b))
            starts.append(i0)

        parts = host_parts + jax.device_get(parts)
        pdfs = np.concatenate([p[0] for p in parts])[:ndata]
        lmap = np.concatenate([p[1] for p in parts])[:ndata]
        levid = np.concatenate([p[2] for p in parts])[:ndata]
        # Exact cdf selection via the XLA sort for flagged batches, in
        # (B, M)-budgeted sub-chunks: the fused streaming batch
        # (default_fused_batch_size) is far larger than the XLA path's
        # materialized-lnprob grid allows.  sub divides batch_size
        # (both powers of two), so fixed-size slices stay inside the
        # padded upload.
        sub = min(batch_size, default_batch_size(self.NMODEL))
        for i0, part in zip(starts, parts):
            if bool(part[3]):
                continue
            spec = _like.static_spec(None, (), lprob_kwargs)
            for j0 in range(i0, i0 + batch_size, sub):
                n = min(sub, ndata - j0)
                if n <= 0:
                    break
                d = jax.lax.dynamic_slice_in_dim(d_all, j0, sub)
                de = jax.lax.dynamic_slice_in_dim(de_all, j0, sub)
                dm = jax.lax.dynamic_slice_in_dim(dm_all, j0, sub)
                res = _bf_lprob_jit(d, de, dm, self.models,
                                    self.models_err, self.models_mask,
                                    lprob_spec=spec)
                lmap_b, levid_b, wt = _gof_weights(res[2])
                pdf_b = _kde.norm_rows(
                    _kde.kde_stack(wt, G, None, cdf_thresh))
                if post is not None:
                    pdf_b = post(pdf_b, j0)
                pdfs[j0:j0 + n] = np.asarray(pdf_b[:n])
                lmap[j0:j0 + n] = np.asarray(lmap_b[:n])
                levid[j0:j0 + n] = np.asarray(levid_b[:n])
        if return_gof:
            return pdfs, (lmap, levid)
        return pdfs

    def _fit_predict_xla_stream(self, data, data_err, data_mask, G,
                                lprob_kwargs, wt_thresh, cdf_thresh,
                                batch_size, return_gof, verbose,
                                post_setup=None):
        """Stream object batches through the XLA dense stack
        (`_bf_stream_xla_jit`): the auto-selected path for wide serving
        grids (see `_WIDE_GRID_XLA_GP`).  Same upload-once /
        slice-on-device / bulk-readback pipeline as the fused path —
        only the per-batch step differs, and the XLA sort handles both
        wt_thresh and cdf_thresh selection exactly (no fallback pass).
        """
        ndata = data.shape[0]
        post = (None if post_setup is None
                else post_setup(ndata, batch_size)[0])
        spec = _like.static_spec(None, (), lprob_kwargs)
        G = jnp.asarray(G, jnp.float32)
        pad = (-ndata) % batch_size
        d_all = jnp.asarray(np.pad(data, ((0, pad), (0, 0))), jnp.float32)
        de_all = jnp.asarray(np.pad(data_err, ((0, pad), (0, 0)),
                                    constant_values=1.0), jnp.float32)
        dm_all = jnp.asarray(np.pad(data_mask, ((0, pad), (0, 0))),
                             jnp.float32)

        parts, host_parts = [], []
        for i0, n in progress_iter(_batch_slices(ndata, batch_size),
                                   total=ndata, label="Fitting object",
                                   sizes=True, verbose=verbose):
            d = jax.lax.dynamic_slice_in_dim(d_all, i0, batch_size)
            de = jax.lax.dynamic_slice_in_dim(de_all, i0, batch_size)
            dm = jax.lax.dynamic_slice_in_dim(dm_all, i0, batch_size)
            pdf_b, lmap_b, levid_b = _bf_stream_xla_jit(
                d, de, dm, self.models, self.models_err, self.models_mask,
                G, lprob_spec=spec, wt_thresh=wt_thresh,
                cdf_thresh=cdf_thresh)
            if post is not None:
                pdf_b = post(pdf_b, i0)
            parts, host_parts = _drain_pending(
                parts, host_parts, pdf_b.shape[1] * batch_size * 4)
            parts.append((pdf_b, lmap_b, levid_b))

        parts = host_parts + jax.device_get(parts)
        pdfs = np.concatenate([p[0] for p in parts])[:ndata]
        lmap = np.concatenate([p[1] for p in parts])[:ndata]
        levid = np.concatenate([p[2] for p in parts])[:ndata]
        if return_gof:
            return pdfs, (lmap, levid)
        return pdfs
