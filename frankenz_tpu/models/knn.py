"""
NearestNeighbors (KMCkNN) fitter: Monte-Carlo ensemble kNN posteriors.

Reference: `frankenz/knn.py` (class NearestNeighbors :33, `_train_kdtrees`
:158, `_fit` :281, `_predict` :500, `fit_predict` :560).  Algorithm: build
K Monte-Carlo realizations of the (noisy) models in feature space
(luptitudes by default), find each datum's k nearest neighbors in every
realization, take the union of the K*k indices, and evaluate the exact
posterior only on that union.

TPU redesign (cf. the TPU-KNN approach in PAPERS.md):

* no KDTrees — neighbor search is a brute-force distance matmul
  ``|y|^2 - 2 y @ Y_k^T + |Y_k|^2`` on the MXU followed by
  ``jax.lax.top_k``, scanned over the K Monte-Carlo feature ensembles
  (exact k-NN, no approximation; scipy KDTree is exact too, so results
  match up to RNG and distance ties);
* the union/dedupe is a fixed-shape sort-based unique: duplicate slots are
  detected with a stable argsort, compacted to the front in first-seen
  order (matching `pandas.unique` semantics, knn.py:368), and masked with
  the reference's padding values (index -99, lnprob -inf, chi2 +inf,
  knn.py:344-352);
* posteriors are evaluated on the gathered (Nobj, K*k) per-object model
  subsets with a vmapped lprob, and the KDE stacks per-object kernel rows
  on the fly (`kde_stack_gathered*`) — nothing is ever ragged.

`lp_norm` in {1, 2} and `distance_upper_bound` are supported
(out-of-bound neighbors become padded slots; the reference would crash
indexing with scipy's out-of-bound sentinel).  `eps` (approximate tree
search slack) is accepted for API compatibility and ignored — the search
here is exact.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import kde as _kde
from ..ops import likelihood as _like
from ..ops import summarize as _summ
from ..ops import transforms as _tf
from ..utils.metrics import metrics as _metrics
from .bruteforce import _batch_slices, _pad_rows

__all__ = ["NearestNeighbors"]

_BIG = np.int32(1 << 30)

# Exact top-k columns per lax.top_k call: the XLA TPU lowering compiles
# at 1M model columns and crashes the remote compiler at 3M, and the
# (B, M) distance block grows unboundedly with the model set.  Larger
# model axes run per-chunk top_k + an exact merge (the global top-k is
# a subset of the union of per-chunk top-k's; concatenating chunks in
# index order preserves lax.top_k's lowest-index tie-breaking).
_TOPK_CHUNK = 1 << 20
# ... and each chunk's materialized (B, cols) f32 distance block must
# also fit HBM alongside the model features: cap it in BYTES and derive
# the chunk width from the batch (a 4096-row batch over a 1M-column
# chunk is 16 GB — measured OOM on the 16 GB v5e at M=1.2M).
_TOPK_DIST_BYTES = 2 << 30


def _topk_chunk_cols(nrows, k):
    """Exact-search chunk width: <= _TOPK_CHUNK columns per top_k AND
    <= _TOPK_DIST_BYTES per materialized distance block, never below k
    (the merge needs full per-chunk top-k's), lane-aligned."""
    by_bytes = _TOPK_DIST_BYTES // (4 * max(int(nrows), 1)) // 128 * 128
    return min(_TOPK_CHUNK, max(int(k), by_bytes))


@functools.partial(jax.jit, static_argnames=("lprob_spec",))
def _gathered_lprob_jit(d, de, dm, idx, valid, models, models_err,
                        models_mask, *, lprob_spec):
    """Vmapped lprob: each object against its own gathered model subset.

    `lprob_spec` = (lprob_func_or_None, args_tuple, sorted_kwargs_items);
    static so the global jit cache keys on it.
    """
    lprob_func, lprob_args, kw_items = lprob_spec
    if lprob_func is None:
        lprob_func = _like.logprob
    lprob_kwargs = dict(kw_items)
    safe = jnp.maximum(idx, 0)
    m = models[safe]          # (B, J, Nf)
    me = models_err[safe]
    mm = models_mask[safe]

    def one(x, xe, xm, mj, mej, mmj):
        res = lprob_func(x[None], xe[None], xm[None], mj, mej, mmj,
                         *lprob_args, **lprob_kwargs)
        return tuple(None if r is None else r[0] for r in
                     (res[0], res[1], res[2], res[3], res[4],
                      res[5] if len(res) > 5 else None,
                      res[6] if len(res) > 6 else None))

    out = jax.vmap(one)(d, de, dm, m, me, mm)
    lnprior, lnlike, lnprob, ndim, chi2, scale, scale_err = out
    neg = jnp.float32(-jnp.inf)
    lnprior = jnp.where(valid, lnprior, neg)
    lnlike = jnp.where(valid, lnlike, neg)
    lnprob = jnp.where(valid, lnprob, neg)
    ndim = jnp.where(valid, ndim, 0)
    chi2 = jnp.where(valid, chi2, jnp.inf)
    if scale is not None:
        scale = jnp.where(valid, scale, 1.0)
        scale_err = jnp.where(valid, scale_err, 0.0)
    return lnprior, lnlike, lnprob, ndim, chi2, scale, scale_err


@jax.jit
def _gof_weights(lnprob):
    """(lmap, levid, wt) from a log-weight grid (bruteforce.py:359-360)."""
    lmap = jnp.max(lnprob, axis=1)
    levid = jax.scipy.special.logsumexp(lnprob, axis=1)
    return lmap, levid, jnp.exp(lnprob - levid[:, None])


_norm_rows = jax.jit(_kde.norm_rows)


def _resolve_feature_map(feature_map, fmap_args, fmap_kwargs):
    if feature_map == "identity":
        def feature_map(x, xe, *a, **k):
            return x, xe
    elif feature_map == "magnitude":
        feature_map = _tf.magnitude
    elif feature_map == "luptitude":
        feature_map = _tf.luptitude
    elif not callable(feature_map):
        raise ValueError("The provided feature map is not valid.")
    return lambda x, xe: feature_map(x, xe, *fmap_args, **fmap_kwargs)


def _fmap_from_spec(fmap_spec):
    """Rebuild the feature map from its static (name/callable, args,
    kwargs-items) spec — hashable, so jitted pipelines cache across
    fitter instances."""
    name, args, kw_items = fmap_spec
    return _resolve_feature_map(name, args, dict(kw_items))


@functools.partial(jax.jit,
                   static_argnames=("K", "k", "lp_norm", "dbound", "approx"))
def _search_jit(q, feats, feats_sq, *, K, k, lp_norm, dbound, approx):
    # q: (B, Nf) jittered query features.
    qsq = jnp.sum(q * q, axis=1, keepdims=True)

    def dist(Y, Ysq):
        if lp_norm == 2:
            return Ysq[None, :] - 2.0 * (q @ Y.T) + qsq
        return jnp.sum(jnp.abs(q[:, None, :] - Y[None, :, :]) ** lp_norm,
                       axis=-1)

    def per_ensemble(carry, ens):
        Y, Ysq = ens
        M = Y.shape[0]
        chunk = _topk_chunk_cols(q.shape[0], k)
        if approx:
            neg, idx = jax.lax.approx_max_k(-dist(Y, Ysq), k,
                                            recall_target=0.95)
        elif M > chunk and chunk >= k:
            # Chunked exact search: neither the (B, M) distance block
            # nor any single top_k ever sees more than `chunk` columns
            # (column AND byte ceilings, _topk_chunk_cols); the merge
            # top_k over the (B, nchunk*k) candidates is exact (see
            # _TOPK_CHUNK).
            negs, idxs = [], []
            for lo in range(0, M, chunk):
                hi = min(M, lo + chunk)
                neg_c, idx_c = jax.lax.top_k(
                    -dist(Y[lo:hi], Ysq[lo:hi]), k)
                negs.append(neg_c)
                idxs.append(idx_c + lo)
            neg, sel = jax.lax.top_k(jnp.concatenate(negs, axis=1), k)
            idx = jnp.take_along_axis(jnp.concatenate(idxs, axis=1),
                                      sel, axis=1)
        else:
            neg, idx = jax.lax.top_k(-dist(Y, Ysq), k)
        ok = -neg <= (dbound ** lp_norm if np.isfinite(dbound)
                      else jnp.inf)
        return carry, (idx, ok)

    _, (idx, ok) = jax.lax.scan(per_ensemble, None,
                                (feats, feats_sq))
    # (K, B, k) -> (B, K*k)
    idx = jnp.moveaxis(idx, 0, 1).reshape(q.shape[0], K * k)
    ok = jnp.moveaxis(ok, 0, 1).reshape(q.shape[0], K * k)

    # First-seen-order unique (pandas.unique semantics): stable
    # sort by index; a slot is a duplicate if it equals its
    # predecessor in sorted order; scatter back, then compact
    # valid slots to the front by stable sort on the dup flag.
    # Out-of-bound slots are remapped to per-slot-unique sentinels
    # FIRST so they can neither shadow an in-bound occurrence of the
    # same model (which would invalidate both) nor be marked dup.
    slot = jnp.arange(K * k, dtype=jnp.int32)[None, :]
    idx_d = jnp.where(ok, idx, _BIG + slot)
    order = jnp.argsort(idx_d, axis=1, stable=True)
    sorted_idx = jnp.take_along_axis(idx_d, order, axis=1)
    dup_sorted = jnp.concatenate(
        [jnp.zeros((idx.shape[0], 1), bool),
         sorted_idx[:, 1:] == sorted_idx[:, :-1]], axis=1)
    dup = jnp.zeros_like(dup_sorted)
    dup = jnp.put_along_axis(dup, order, dup_sorted, axis=1,
                             inplace=False)
    invalid = dup | ~ok
    perm = jnp.argsort(jnp.where(invalid, _BIG + slot, slot),
                       axis=1, stable=True)
    cidx = jnp.take_along_axis(idx, perm, axis=1)
    cvalid = ~jnp.take_along_axis(invalid, perm, axis=1)
    nidx = jnp.sum(cvalid, axis=1)
    return jnp.where(cvalid, cidx, -99), cvalid, nidx


@functools.partial(jax.jit, static_argnames=("K", "k", "lp_norm", "dbound",
                                             "approx", "fmap_spec",
                                             "lprob_spec"))
def _knn_fit_batch_jit(jq, d, de, dm, feats, fsq, models, models_err,
                       models_mask, *, K, k, lp_norm, dbound, approx,
                       fmap_spec, lprob_spec):
    """Whole KMCkNN fit batch as ONE program: feature map -> MC-ensemble
    search -> union dedupe -> gathered exact posterior.

    One dispatch per batch: over a remote-TPU relay the eager glue
    between separately jitted pieces (feature map, gathers, thresholds)
    dominates wall time otherwise.
    """
    fmap = _fmap_from_spec(fmap_spec)
    q, _ = fmap(jnp.asarray(jq, jnp.float32), jnp.asarray(de, jnp.float32))
    idx, valid, nidx = _search_jit(jnp.asarray(q, jnp.float32), feats, fsq,
                                   K=K, k=k, lp_norm=lp_norm, dbound=dbound,
                                   approx=approx)
    res = _gathered_lprob_jit(d, de, dm, idx, valid, models, models_err,
                              models_mask, lprob_spec=lprob_spec)
    return idx, valid, nidx, res


@functools.partial(jax.jit, static_argnames=("K", "k", "lp_norm", "dbound",
                                             "approx", "fmap_spec",
                                             "lprob_spec", "wt_thresh",
                                             "cdf_thresh", "save_fits",
                                             "nx"))
def _knn_fit_predict_dict_jit(jq, d, de, dm, feats, fsq, models, models_err,
                              models_mask, sigmas, widths, delta, full_pos,
                              full_sig, *, K, k, lp_norm, dbound, approx,
                              fmap_spec, lprob_spec, wt_thresh, cdf_thresh,
                              save_fits, nx):
    """Fused KMCkNN fit+predict batch (PDFDict path) as ONE program."""
    idx, valid, nidx, res = _knn_fit_batch_jit(
        jq, d, de, dm, feats, fsq, models, models_err, models_mask, K=K,
        k=k, lp_norm=lp_norm, dbound=dbound, approx=approx,
        fmap_spec=fmap_spec, lprob_spec=lprob_spec)
    lmap, levid, wt = _gof_weights(res[2])
    wt = _kde.threshold_weights(wt, wt_thresh, cdf_thresh)
    safe = jnp.maximum(idx, 0)
    pdf = _kde._kde_stack_gathered_jit(sigmas, widths, delta,
                                       full_pos[safe], full_sig[safe], wt,
                                       nx=nx)
    out_res = res if save_fits else None
    return _norm_rows(pdf), lmap, levid, idx, nidx, out_res


@functools.partial(jax.jit, static_argnames=("K", "k", "lp_norm", "dbound",
                                             "approx", "fmap_spec",
                                             "lprob_spec", "wt_thresh",
                                             "cdf_thresh", "save_fits"))
def _knn_fit_predict_grid_jit(jq, d, de, dm, feats, fsq, models, models_err,
                              models_mask, labels, label_errs, grid, dx,
                              sig_thresh, *, K, k, lp_norm, dbound, approx,
                              fmap_spec, lprob_spec, wt_thresh, cdf_thresh,
                              save_fits):
    """Fused KMCkNN fit+predict batch (label-grid path) as ONE program."""
    idx, valid, nidx, res = _knn_fit_batch_jit(
        jq, d, de, dm, feats, fsq, models, models_err, models_mask, K=K,
        k=k, lp_norm=lp_norm, dbound=dbound, approx=approx,
        fmap_spec=fmap_spec, lprob_spec=lprob_spec)
    lmap, levid, wt = _gof_weights(res[2])
    wt = _kde.threshold_weights(wt, wt_thresh, cdf_thresh)
    safe = jnp.maximum(idx, 0)
    pdf = _kde._kde_stack_gathered_grid_jit(labels[safe], label_errs[safe],
                                            wt, grid, dx, sig_thresh)
    out_res = res if save_fits else None
    return _norm_rows(pdf), lmap, levid, idx, nidx, out_res


@functools.lru_cache(maxsize=None)
def _knn_sharded_step(mesh, obj_axis, use_dict, K, k, lp_norm, dbound,
                      approx, fmap_spec, lprob_spec, wt_thresh, cdf_thresh,
                      nx):
    """Mesh-sharded fused KMCkNN fit_predict step (cached per mesh +
    static spec): objects shard over `obj_axis`; the feature ensembles,
    model set, and label parametrization replicate.  Pure data parallel
    — zero collectives."""
    from jax.sharding import PartitionSpec as P

    if use_dict:
        def local(jq, d, de, dm, feats, fsq, models, me, mm, la, lb, lc,
                  ld, le):
            pdf, lmap, levid, _idx, _nidx, _res = _knn_fit_predict_dict_jit(
                jq, d, de, dm, feats, fsq, models, me, mm, la, lb, lc, ld,
                le, K=K, k=k, lp_norm=lp_norm, dbound=dbound, approx=approx,
                fmap_spec=fmap_spec, lprob_spec=lprob_spec,
                wt_thresh=wt_thresh, cdf_thresh=cdf_thresh,
                save_fits=False, nx=nx)
            return pdf, lmap, levid
    else:
        def local(jq, d, de, dm, feats, fsq, models, me, mm, la, lb, lc,
                  ld, le):
            pdf, lmap, levid, _idx, _nidx, _res = _knn_fit_predict_grid_jit(
                jq, d, de, dm, feats, fsq, models, me, mm, la, lb, lc, ld,
                le, K=K, k=k, lp_norm=lp_norm, dbound=dbound, approx=approx,
                fmap_spec=fmap_spec, lprob_spec=lprob_spec,
                wt_thresh=wt_thresh, cdf_thresh=cdf_thresh,
                save_fits=False)
            return pdf, lmap, levid

    dspec = P(obj_axis, None)
    rep = P()
    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(dspec, dspec, dspec, dspec) + (rep,) * 10,
        out_specs=(dspec, P(obj_axis), P(obj_axis)), check_vma=False))


class NearestNeighbors:
    """KMCkNN fitter over a fixed model set.

    Parameters (mirroring knn.py:40-156): `K` Monte-Carlo ensembles
    (default 25), `feature_map` in {'identity','magnitude','luptitude'} or
    a callable, `leafsize` accepted-and-ignored (no trees to build).
    """

    def __init__(self, models, models_err, models_mask, leafsize=50, K=25,
                 feature_map="luptitude", fmap_args=None, fmap_kwargs=None,
                 rng=None, seed=None, verbose=True):
        del leafsize  # KDTree tuning knob; no trees here
        self.models = jnp.asarray(models)
        self.models_err = jnp.asarray(models_err)
        self.models_mask = jnp.asarray(models_mask)
        self.NMODEL, self.NDIM = self.models.shape
        self.K = int(K)
        self.fmap_args = fmap_args or ()
        self.fmap_kwargs = fmap_kwargs or {}
        # Static spec (hashable) keys the fused per-batch jit programs;
        # the resolved callable serves host-side/ctor use.
        self.fmap_spec = (feature_map, tuple(self.fmap_args),
                          tuple(sorted(self.fmap_kwargs.items())))
        self.feature_map = _resolve_feature_map(feature_map, self.fmap_args,
                                                self.fmap_kwargs)
        self.rng = rng if rng is not None else np.random.default_rng(seed)

        self.NDATA = None
        self.neighbors = None
        self.Nneighbors = None
        self.k = None
        self.fit_lnprior = None
        self.fit_lnlike = None
        self.fit_lnprob = None
        self.fit_Ndim = None
        self.fit_chi2 = None
        self.fit_scale = None
        self.fit_scale_err = None
        self._fit_rows_done = 0

        # K Monte-Carlo feature ensembles (knn.py:158-188): jitter the
        # models by their errors, map to feature space, store (K, M, Nf).
        # All K realizations go through ONE jitted vmapped feature-map
        # call, and the jitters are drawn from the ORIGINAL host arrays
        # (reading self.models back from the device costs minutes over a
        # remote-TPU relay).
        mods = np.asarray(models, dtype=float)
        errs = np.asarray(models_err, dtype=float)
        jits = self.rng.normal(mods[None], errs[None],
                               (self.K,) + mods.shape).astype(np.float32)
        fmap = self.feature_map

        @jax.jit
        def build(j, e):
            return jax.vmap(lambda x: fmap(x, e)[0])(j)

        self.features = jnp.asarray(
            build(jnp.asarray(jits), self.models_err), jnp.float32)
        self.features_sqnorm = jnp.sum(self.features**2, axis=-1)
        if verbose:
            import sys
            sys.stderr.write("{0}/{0} MC feature ensembles constructed\n"
                             .format(self.K))

    # ------------------------------------------------------------------

    def _search_fn(self, k, lp_norm, dbound, approx=False):
        """(B, Nf) query features -> (B, K*k) indices (+valid).

        ``approx=True`` uses `jax.lax.approx_max_k` (the TPU-native
        approximate top-k; recall ~0.95) instead of the exact sort-based
        top-k — a good fit here since the K Monte-Carlo ensembles are
        themselves a stochastic neighborhood approximation.
        """
        return functools.partial(_search_jit, K=self.K, k=k,
                                 lp_norm=lp_norm, dbound=float(dbound),
                                 approx=approx)


    def _alloc_fits(self, ndata, k, track_scale):
        j = self.K * k
        inf = np.inf
        self.NDATA = ndata
        self.k = k
        self.Nneighbors = np.zeros(ndata, np.int32)
        self.neighbors = np.full((ndata, j), -99, np.int32)
        self.fit_lnprior = np.full((ndata, j), -inf, np.float32)
        self.fit_lnlike = np.full((ndata, j), -inf, np.float32)
        self.fit_lnprob = np.full((ndata, j), -inf, np.float32)
        self.fit_Ndim = np.zeros((ndata, j), np.int32)
        self.fit_chi2 = np.full((ndata, j), inf, np.float32)
        if track_scale:
            self.fit_scale = np.ones((ndata, j), np.float32)
            self.fit_scale_err = np.zeros((ndata, j), np.float32)
        else:
            self.fit_scale = None
            self.fit_scale_err = None

    def _store(self, i0, n, idx, nidx, res):
        sl = slice(i0, i0 + n)
        self.neighbors[sl] = np.asarray(idx[:n], np.int32)
        self.Nneighbors[sl] = np.asarray(nidx[:n], np.int32)
        lnprior, lnlike, lnprob, ndim, chi2, scale, scale_err = res
        self.fit_lnprior[sl] = np.asarray(lnprior[:n], np.float32)
        self.fit_lnlike[sl] = np.asarray(lnlike[:n], np.float32)
        self.fit_lnprob[sl] = np.asarray(lnprob[:n], np.float32)
        self.fit_Ndim[sl] = np.asarray(ndim[:n], np.int32)
        self.fit_chi2[sl] = np.asarray(chi2[:n], np.float32)
        if scale is not None and self.fit_scale is not None:
            self.fit_scale[sl] = np.asarray(scale[:n], np.float32)
            self.fit_scale_err[sl] = np.asarray(scale_err[:n], np.float32)

    def _data_batches(self, data, data_err, data_mask, batch_size, rng):
        """Yield (i0, n, jittered-query, padded data triplet) batches.

        The Monte-Carlo query jitter (knn.py:358-361) is drawn host-side;
        everything downstream runs as one fused device program.
        """
        ndata = data.shape[0]
        for i0, n in _batch_slices(ndata, batch_size):
            d = _pad_rows(data[i0:i0 + n], batch_size)
            de = _pad_rows(data_err[i0:i0 + n], batch_size)
            dm = _pad_rows(data_mask[i0:i0 + n], batch_size)
            jq = rng.normal(d, np.abs(de))
            yield i0, n, jq, d, de, dm

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def fit(self, data, data_err, data_mask, lprob_func=None, rng=None,
            k=20, eps=1e-3, lp_norm=2, distance_upper_bound=np.inf,
            lprob_args=None, lprob_kwargs=None, track_scale=False,
            verbose=True, batch_size=4096, approx=False,
            checkpoint_every=None, checkpoint_file=None, resume=False):
        """KMCkNN fit: neighbor union + exact posteriors on the union.

        Reference: knn.py:190-388.  Stores `neighbors` / `Nneighbors` and
        the (Ndata, K*k) padded fit grids.

        `checkpoint_every=N` persists the fit prefix every N batches;
        `resume=True` (same seeded `rng`) continues from the checkpoint
        with identical results — skipped batches still consume the
        query-jitter stream, so the remaining draws line up.
        """
        from ..utils import checkpoint as _ckpt
        from .bruteforce import resume_fit_rows

        del eps  # exact search
        data = np.atleast_2d(np.asarray(data, float))
        data_err = np.atleast_2d(np.asarray(data_err, float))
        data_mask = np.atleast_2d(np.asarray(data_mask, float))
        rng = rng or self.rng
        ndata = data.shape[0]
        batch_size = min(batch_size, max(256, ndata))
        done = resume_fit_rows(self, resume, checkpoint_file, ndata,
                               checkpoint_every)
        if not done:
            self._alloc_fits(ndata, k, track_scale)
        self._fit_rows_done = done
        lprob_spec = _like.static_spec(lprob_func, lprob_args, lprob_kwargs)

        def flush(parts):
            for j0, jn, jidx, jnidx, jres in jax.device_get(parts):
                self._store(j0, jn, jidx, jnidx, jres)
                self._fit_rows_done = j0 + jn

        nb = 0
        parts = []
        for i0, n, jq, d, de, dm in self._data_batches(
                data, data_err, data_mask, batch_size, rng):
            if i0 + n <= done:
                continue  # jitter stream already consumed by the yield
            idx, valid, nidx, res = _knn_fit_batch_jit(
                jnp.asarray(jq), jnp.asarray(d), jnp.asarray(de),
                jnp.asarray(dm), self.features, self.features_sqnorm,
                self.models, self.models_err, self.models_mask, K=self.K,
                k=k, lp_norm=lp_norm, dbound=float(distance_upper_bound),
                approx=approx, fmap_spec=self.fmap_spec,
                lprob_spec=lprob_spec)
            parts.append((i0, n, idx, nidx, res))
            nb += 1
            if checkpoint_every and nb % checkpoint_every == 0:
                flush(parts)
                parts = []
                _ckpt.save(checkpoint_file, self)
            elif len(parts) >= 32:
                flush(parts)
                parts = []
            if verbose:
                import sys
                sys.stderr.write("\rFitting object {0}/{1}"
                                 .format(min(i0 + n, ndata), ndata))
        # Bulk readback after all batches are dispatched (async pipeline).
        flush(parts)
        if verbose:
            import sys
            sys.stderr.write("\n")
        return self

    def predict(self, model_labels, model_label_errs, label_dict=None,
                label_grid=None, logwt=None, kde_args=None, kde_kwargs=None,
                return_gof=False, verbose=True, batch_size=1024,
                wt_thresh=1e-3, cdf_thresh=2e-4):
        """PDFs from stored neighbor fits (knn.py:390-558)."""
        if logwt is None:
            logwt = self.fit_lnprob
        if logwt is None:
            raise ValueError("Fits have not been computed and weights have "
                             "not been provided.")
        dx, sig_thresh, wt_thresh, cdf_thresh = _kde.resolve_kde_opts(
            kde_args, kde_kwargs, wt_thresh, cdf_thresh)
        model_labels = np.asarray(model_labels)
        model_label_errs = np.asarray(model_label_errs)
        ndata, j = np.shape(logwt)

        pdfs, lmap, levid, grid = self._stack_batches(
            np.asarray(logwt, np.float32), self.neighbors, model_labels,
            model_label_errs, label_dict, label_grid, wt_thresh, cdf_thresh,
            batch_size, dx=dx, sig_thresh=sig_thresh)
        if return_gof:
            return pdfs, (lmap, levid)
        return pdfs

    def _stack_batches(self, logwt, neighbors, model_labels,
                       model_label_errs, label_dict, label_grid, wt_thresh,
                       cdf_thresh, batch_size, dx=None, sig_thresh=5.0):
        if label_dict is None and label_grid is None:
            raise ValueError("`label_dict` or `label_grid` must be "
                             "specified.")
        ndata = logwt.shape[0]
        if label_dict is not None:
            full_pos, full_sig = label_dict.fit(
                jnp.asarray(model_labels), jnp.asarray(model_label_errs))
            full_pos = np.asarray(full_pos)
            full_sig = np.asarray(full_sig)
            ngrid = label_dict.Ngrid
            grid = np.asarray(label_dict.grid)
        else:
            grid = np.asarray(label_grid)
            ngrid = len(grid)

        def stack_dict_batch(lwt, pos, sig):
            lmap, levid, wt = _gof_weights(lwt)
            wt = _kde.threshold_weights(wt, wt_thresh, cdf_thresh)
            pdf = _kde.kde_stack_gathered_dict(label_dict, pos, sig, wt)
            return _norm_rows(pdf), lmap, levid

        def stack_grid_batch(lwt, y, ys):
            lmap, levid, wt = _gof_weights(lwt)
            wt = _kde.threshold_weights(wt, wt_thresh, cdf_thresh)
            pdf = _kde.kde_stack_gathered(y, ys, wt, jnp.asarray(grid),
                                          dx=dx, sig_thresh=sig_thresh)
            return _norm_rows(pdf), lmap, levid

        pdfs = np.zeros((ndata, ngrid), np.float32)
        lmap = np.zeros(ndata, np.float32)
        levid = np.zeros(ndata, np.float32)
        for i0, n in _batch_slices(ndata, batch_size):
            lwt = _pad_rows(logwt[i0:i0 + n], batch_size)
            idx = _pad_rows(neighbors[i0:i0 + n], batch_size)
            safe = np.maximum(idx, 0)
            if label_dict is not None:
                out = stack_dict_batch(jnp.asarray(lwt),
                                       jnp.asarray(full_pos[safe]),
                                       jnp.asarray(full_sig[safe]))
            else:
                out = stack_grid_batch(jnp.asarray(lwt),
                                       jnp.asarray(model_labels[safe]),
                                       jnp.asarray(model_label_errs[safe]))
            pdf_b, lmap_b, levid_b = out
            pdfs[i0:i0 + n] = np.asarray(pdf_b[:n])
            lmap[i0:i0 + n] = np.asarray(lmap_b[:n])
            levid[i0:i0 + n] = np.asarray(levid_b[:n])
        return pdfs, lmap, levid, grid

    def fit_predict(self, data, data_err, data_mask, model_labels,
                    model_label_errs, lprob_func=None, label_dict=None,
                    label_grid=None, kde_args=None, kde_kwargs=None,
                    lprob_args=None, lprob_kwargs=None, return_gof=False,
                    track_scale=False, verbose=True, save_fits=False,
                    rng=None, k=20, eps=1e-3, lp_norm=2,
                    distance_upper_bound=np.inf, batch_size=4096,
                    wt_thresh=1e-3, cdf_thresh=2e-4, approx=False,
                    mesh=None, _post_setup=None):
        """Fused KMCkNN fit + PDF prediction (knn.py:560-874).

        Each batch is ONE device program (jitter features -> ensemble
        search -> union posterior -> thresholded gathered KDE), with
        results read back in bulk — no eager per-batch glue.  With
        `mesh` given, batches shard over the mesh's first axis (pure
        data parallel; requires save_fits=False).
        """
        del eps
        if mesh is not None and save_fits:
            raise ValueError("mesh-sharded fit_predict streams PDFs only; "
                             "save_fits is unsupported")
        data = np.atleast_2d(np.asarray(data, float))
        data_err = np.atleast_2d(np.asarray(data_err, float))
        data_mask = np.atleast_2d(np.asarray(data_mask, float))
        rng = rng or self.rng
        ndata = data.shape[0]
        batch_size = min(batch_size, max(256, ndata))
        if mesh is not None:
            ndev = int(mesh.size)
            batch_size = -(-batch_size // ndev) * ndev
        dx, sig_thresh, wt_thresh, cdf_thresh = _kde.resolve_kde_opts(
            kde_args, kde_kwargs, wt_thresh, cdf_thresh)
        if save_fits:
            self._alloc_fits(ndata, k, track_scale)
        model_labels = np.asarray(model_labels)
        model_label_errs = np.asarray(model_label_errs)
        lprob_spec = _like.static_spec(lprob_func, lprob_args, lprob_kwargs)
        use_dict, ngrid, lab = _kde.pack_label_spec(
            label_dict, label_grid, model_labels, model_label_errs,
            dx=dx, sig_thresh=sig_thresh)
        post, out_width = ((None, ngrid) if _post_setup is None
                           else _post_setup(ndata, batch_size))

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            obj_axis = mesh.axis_names[0]
            step = _knn_sharded_step(
                mesh, obj_axis, use_dict, self.K, k, lp_norm,
                float(distance_upper_bound), approx, self.fmap_spec,
                lprob_spec, wt_thresh, cdf_thresh, ngrid)
            dspec = NamedSharding(mesh, P(obj_axis))
            rspec = NamedSharding(mesh, P())
            reps = [jax.device_put(x, rspec) for x in
                    (self.features, self.features_sqnorm, self.models,
                     self.models_err, self.models_mask) + lab]

            def fused(jq, d, de, dm):
                out = step(jax.device_put(jq, dspec),
                           jax.device_put(d, dspec),
                           jax.device_put(de, dspec),
                           jax.device_put(dm, dspec), *reps)
                return out + (None, None, None)
        else:
            def fused(jq, d, de, dm):
                common = dict(K=self.K, k=k, lp_norm=lp_norm,
                              dbound=float(distance_upper_bound),
                              approx=approx, fmap_spec=self.fmap_spec,
                              lprob_spec=lprob_spec, wt_thresh=wt_thresh,
                              cdf_thresh=cdf_thresh, save_fits=save_fits)
                if use_dict:
                    return _knn_fit_predict_dict_jit(
                        jq, d, de, dm, self.features, self.features_sqnorm,
                        self.models, self.models_err, self.models_mask,
                        *lab, nx=ngrid, **common)
                return _knn_fit_predict_grid_jit(
                    jq, d, de, dm, self.features, self.features_sqnorm,
                    self.models, self.models_err, self.models_mask, *lab,
                    **common)

        pdfs = np.zeros((ndata, out_width), np.float32)
        lmap = np.zeros(ndata, np.float32)
        levid = np.zeros(ndata, np.float32)

        def drain(parts):
            for j0, jn, jout in jax.device_get(parts):
                pdf_b, lmap_b, levid_b, jidx, jnidx, jres = jout
                pdfs[j0:j0 + jn] = pdf_b[:jn]
                lmap[j0:j0 + jn] = lmap_b[:jn]
                levid[j0:j0 + jn] = levid_b[:jn]
                if save_fits:
                    self._store(j0, jn, jidx, jnidx, jres)

        # Telemetry (SURVEY.md section 5): ensemble-search distance pairs,
        # exact chi^2 evals on the padded neighbor unions, PDF stacks.
        _metrics.count("knn_search_pairs", ndata * self.K * self.NMODEL)
        _metrics.count("chi2_pair_evals", ndata * self.K * k)
        _metrics.count("pdf_stacks", ndata)
        parts = []
        with _metrics.timer("knn.fit_predict"):
            for i0, n, jq, d, de, dm in self._data_batches(
                    data, data_err, data_mask, batch_size, rng):
                out = fused(jnp.asarray(jq), jnp.asarray(d),
                            jnp.asarray(de), jnp.asarray(dm))
                if post is not None:
                    out = (post(out[0], i0),) + tuple(out[1:])
                parts.append((i0, n, out))
                if len(parts) >= 32:
                    drain(parts)
                    parts = []
                if verbose:
                    import sys
                    sys.stderr.write("\rFitting object {0}/{1}"
                                     .format(min(i0 + n, ndata), ndata))
            # Bulk readback after all batches are dispatched (async
            # pipeline).
            drain(parts)
        if verbose:
            import sys
            sys.stderr.write("\n")
        if return_gof:
            return pdfs, (lmap, levid)
        return pdfs

    def fit_summarize(self, data, data_err, data_mask, model_labels,
                      model_label_errs, lprob_func=None, label_dict=None,
                      label_grid=None, kde_args=None, kde_kwargs=None,
                      lprob_args=None, lprob_kwargs=None, verbose=True,
                      rng=None, k=20, eps=1e-3, lp_norm=2,
                      distance_upper_bound=np.inf, batch_size=4096,
                      wt_thresh=1e-3, cdf_thresh=2e-4, approx=False,
                      mesh=None, pkern="lorentz", pkern_grid=None,
                      summary_seed=0):
        """`fit_predict` + `pdfs_summarize` with the summary reduced on
        device per batch — only 21 columns per object stream back, not
        the (Ndata, Ngrid) PDFs (see `BruteForce.fit_summarize`; same
        contract and MC-uniform convention).  Returns
        ``(PDFSummary, (lmap, levid))``.
        """
        grid = _summ.label_grid_of(label_dict, label_grid)
        cols, gof = self.fit_predict(
            data, data_err, data_mask, model_labels, model_label_errs,
            lprob_func=lprob_func, label_dict=label_dict,
            label_grid=label_grid, kde_args=kde_args,
            kde_kwargs=kde_kwargs, lprob_args=lprob_args,
            lprob_kwargs=lprob_kwargs, return_gof=True, verbose=verbose,
            rng=rng, k=k, eps=eps, lp_norm=lp_norm,
            distance_upper_bound=distance_upper_bound,
            batch_size=batch_size, wt_thresh=wt_thresh,
            cdf_thresh=cdf_thresh, approx=approx, mesh=mesh,
            _post_setup=_summ.stream_summary_setup(grid, pkern, pkern_grid,
                                                   summary_seed))
        return _summ.unpack_summary(cols), gof
