"""
Manifold fitters: shared `_Network` machinery + SelfOrganizingMap +
GrowingNeuralGas.

Reference: `frankenz/networks.py` (`_Network` :121, learning/neighborhood
functions :38-118, `SelfOrganizingMap` :1490, `GrowingNeuralGas` :1870).

A network compresses a large model set onto Nnode << Nmodel nodes: models
are soft-assigned to nodes (`populate_network`), each node carries a
label PDF of its members, and new data are fit against nodes first —
either stopping there (`nodes_only=True`, the "cell-conditioned photo-z"
mode) or refining with exact posteriors on the union of member models.

TPU-first structural redesign (the reference uses ragged Python lists, a
`networkx` graph, and per-object/per-step Python loops):

* `populate_network` is a single batched pass: (Nmodel, Nnode) node
  log-posteriors per model batch on the MXU; memberships come back as a
  thresholded mask and are compacted host-side into fixed-capacity padded
  member tables (Nnode, max_members) with the kNN padding conventions.
* node PDFs (`get_pdfs`) stack each node's member kernels with the same
  gathered-KDE kernel as the kNN fitter; the density scaling by
  exp(levid) (networks.py:495-496) is preserved.
* `fit`/`predict` with `nodes_only=True` is fully dense: thresholded node
  weights (Nobj, Nocc) -> `pdfs = wts @ node_pdfs` — one matmul.
  With `nodes_only=False`, per-object unions of member indices are built
  with fixed caps (`max_sel_nodes` selected nodes, `max_neighbors` union
  size) and sort-based dedupe — the reference's unbounded ragged unions
  (networks.py:908-919) become static shapes; caps are recorded and a
  too-small cap raises rather than silently truncating.
* SOM training (networks.py:1682-1867) is one `lax.scan` over
  niter*nbatch steps with the node table resident on device; BMU search
  is an argmax over the node log-posterior vector; neighborhood and
  learning-rate schedules are traced jnp functions.
* GNG training (networks.py:2037-2260) replaces the dynamic
  `networkx.Graph` with fixed-capacity dense state — node table
  (max_nodes, Nfilt), per-node error vector, alive mask, and an edge-age
  matrix (max_nodes, max_nodes; -1 = no edge) — inside one `lax.scan`
  with masked insert/prune writes.

NOTE: the reference's `__all__` exports a nonexistent `lprob_train`
(networks.py:33-35, a dangling name) — deliberately not reproduced.

RNG: training draws use JAX counter-based PRNG keys (seeded), so streams
are distribution-equivalent, not bitwise-equal, to the reference's global
NumPy state (SURVEY.md section 7, "RNG parity").
"""

from __future__ import annotations

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import kde as _kde
from ..ops import likelihood as _like
from .bruteforce import _batch_slices, _pad_rows
from ..utils.progress import progress_iter, train_note

__all__ = ["SelfOrganizingMap", "GrowingNeuralGas", "_Network",
           "learn_linear", "learn_geometric", "learn_harmonic",
           "neighbor_gauss", "neighbor_lorentz"]


# ----------------------------------------------------------------------
# Learning-rate schedules and neighborhood kernels (networks.py:38-118)
# ----------------------------------------------------------------------

def learn_linear(t, start=0.5, end=0.1, **kwargs):
    """Linear interpolation from `start` to `end` over t in [0, 1]."""
    return (1.0 - t) * start + t * end


def learn_geometric(t, start=0.5, end=0.1, **kwargs):
    """Geometric (log-linear) interpolation from `start` to `end`."""
    return jnp.exp((1.0 - t) * jnp.log(start) + t * jnp.log(end))


def learn_harmonic(t, start=0.5, end=0.1, **kwargs):
    """Weighted harmonic mean of `start` and `end`."""
    return 1.0 / ((1.0 - t) / start + t / end)


# Phase-1 membership slab width for populate_network: covers >98% of
# models at the default wt_thresh; overflowing models re-run once at an
# escalated cap (populate is relay-bandwidth-bound, so slim slabs win).
_POPULATE_PHASE1_CAP = 16

_LEARN = {"linear": learn_linear, "geometric": learn_geometric,
          "harmonic": learn_harmonic}


def neighbor_gauss(t, pos, positions, nside, start=0.7, end=0.02,
                   rate="harmonic", **kwargs):
    """Gaussian lattice neighborhood with annealed width sigma(t)*nside."""
    learn = _LEARN[rate] if isinstance(rate, str) else rate
    if nside is None:
        nside = jnp.sqrt(len(positions))
    sqdist = jnp.sum((pos - positions) ** 2, axis=1)
    sigma = learn(t, start=start, end=end) * nside
    return jnp.exp(-0.5 * sqdist / sigma**2), sigma


def neighbor_lorentz(t, pos, positions, nside, start=0.7, end=0.02,
                     rate="harmonic", **kwargs):
    """Lorentzian lattice neighborhood with annealed width."""
    learn = _LEARN[rate] if isinstance(rate, str) else rate
    sqdist = jnp.sum((pos - positions) ** 2, axis=1)
    sigma = learn(t, start=start, end=end) * nside
    return sigma**2 / (sqdist + sigma**2), sigma


@functools.partial(jax.jit, static_argnames=("lpnet_spec", "wt_thresh",
                                              "cdf_thresh"))
def _node_fit_jit(x, xe, xm, nodes_occ, *, lpnet_spec, wt_thresh,
                  cdf_thresh):
    """Batched node fit + threshold mask (cached globally by the static
    (lpnet_func, args, kwargs-items) spec)."""
    lpnet_func, lpnet_args, kw_items = lpnet_spec
    if lpnet_func is None:
        lpnet_func = _like.logprob
    ye = jnp.zeros_like(nodes_occ)
    ym = jnp.ones_like(nodes_occ)
    res = lpnet_func(x, xe, xm, nodes_occ, ye, ym, *lpnet_args,
                     **dict(kw_items))
    lnp = res[2]
    sel = _threshold_sel(lnp, wt_thresh, cdf_thresh)
    return res, sel


@functools.partial(jax.jit, static_argnames=("lpnet_spec", "wt_thresh",
                                              "cdf_thresh", "cap",
                                              "track_scale"))
def _populate_batch_jit(x, xe, xm, nodes, *, lpnet_spec, wt_thresh,
                        cdf_thresh, cap, track_scale):
    """One populate batch: node log-posteriors, BMU, thresholded top-`cap`
    memberships (module-level so repeated populate calls never recompile;
    cached by the static (lpnet_func, args, kwargs-items) spec)."""
    lpnet_func, lpnet_args, kw_items = lpnet_spec
    if lpnet_func is None:
        lpnet_func = _like.logprob
    ye = jnp.zeros_like(nodes)
    ym = jnp.ones_like(nodes)
    res = lpnet_func(x, xe, xm, nodes, ye, ym, *lpnet_args,
                     **dict(kw_items))
    lnp = res[2]
    bmu = jnp.argmax(lnp, axis=1)
    sel = _threshold_sel(lnp, wt_thresh, cdf_thresh)
    cnt = jnp.sum(sel, axis=1)
    masked = jnp.where(sel, lnp, -jnp.inf)
    lmap = jnp.max(masked, axis=1)
    levid = jax.scipy.special.logsumexp(masked, axis=1)
    top_lw, top_node = jax.lax.top_k(masked, cap)
    top_lw = top_lw - levid[:, None]
    if track_scale and len(res) > 5 and res[5] is not None:
        top_scale = jnp.take_along_axis(res[5], top_node, axis=1)
        top_serr = jnp.take_along_axis(res[6], top_node, axis=1)
    else:
        top_scale = jnp.ones_like(top_lw)
        top_serr = jnp.zeros_like(top_lw)
    return cnt, top_lw, top_node, top_scale, top_serr, bmu, lmap, levid


@jax.jit
def _node_pdf_weights_jit(lwt):
    """(lmap, levid, wt) for padded member log-weight rows (-inf pads)."""
    lmap = jnp.max(lwt, axis=1)
    levid = jax.scipy.special.logsumexp(lwt, axis=1)
    wt = jnp.exp(lwt - levid[:, None])
    wt = jnp.where(jnp.isfinite(lwt), wt, 0.0)
    return lmap, levid, wt


@jax.jit
def _density_scale_jit(pdf, levid):
    """Normalize PDF rows, then scale by exp(levid) (networks.py:495-496)."""
    return _kde.norm_rows(pdf) * jnp.exp(levid)[:, None]


@functools.partial(jax.jit, static_argnames=("lpnet_spec", "wt_thresh",
                                              "cdf_thresh", "cap_sel",
                                              "max_neighbors"))
def _gather_union_jit(x, xe, xm, nodes_occ, members, *, lpnet_spec,
                      wt_thresh, cdf_thresh, cap_sel, max_neighbors):
    """Exact-union neighbor gather: node fit -> strongest `cap_sel` nodes
    -> first-seen-unique member union, compacted to `max_neighbors` slots
    (module-level jit: repeated network fits never recompile)."""
    res, sel = _node_fit_jit(x, xe, xm, nodes_occ, lpnet_spec=lpnet_spec,
                             wt_thresh=wt_thresh, cdf_thresh=cdf_thresh)
    lnp = jnp.where(sel, res[2], -jnp.inf)
    # Strongest selected nodes, up to cap_sel.
    top_lnp, top_nodes = jax.lax.top_k(lnp, cap_sel)
    node_ok = jnp.isfinite(top_lnp)
    maxm = members.shape[1]
    cand = members[top_nodes]  # (B, cap_sel, maxm)
    cand = jnp.where(node_ok[:, :, None], cand, -99)
    cand = cand.reshape(x.shape[0], cap_sel * maxm)
    # Sort-based first-seen unique over candidate slots.
    invalid = cand < 0
    order = jnp.argsort(jnp.where(invalid, jnp.int32(1 << 30),
                                  cand), axis=1, stable=True)
    sorted_c = jnp.take_along_axis(cand, order, axis=1)
    dup_sorted = jnp.concatenate(
        [jnp.zeros((cand.shape[0], 1), bool),
         (sorted_c[:, 1:] == sorted_c[:, :-1])
         & (sorted_c[:, 1:] >= 0)], axis=1)
    uniq = jnp.where(dup_sorted | (sorted_c < 0), -99, sorted_c)
    nuniq = jnp.sum(uniq >= 0, axis=1)
    # Compact unique entries to the front.
    perm = jnp.argsort(jnp.where(uniq < 0, jnp.int32(1 << 30), 0)
                       + jnp.arange(uniq.shape[1])[None, :],
                       axis=1, stable=True)
    compact = jnp.take_along_axis(uniq, perm, axis=1)
    if compact.shape[1] < max_neighbors:  # fewer candidates than slots
        pad = jnp.full((compact.shape[0],
                        max_neighbors - compact.shape[1]), -99, jnp.int32)
        compact = jnp.concatenate([compact, pad], axis=1)
    return compact[:, :max_neighbors], nuniq


@functools.partial(jax.jit, static_argnames=("lpnet_spec", "wt_thresh",
                                             "cdf_thresh"))
def _nodes_only_fp_jit(x, xe, xm, nodes_occ, node_pdfs_occ, *, lpnet_spec,
                       wt_thresh, cdf_thresh):
    """Fused nodes_only fit_predict batch: node fit -> thresholded node
    weights -> node-PDF stack, as ONE program (save_fits=False path)."""
    res, sel = _node_fit_jit(x, xe, xm, nodes_occ, lpnet_spec=lpnet_spec,
                             wt_thresh=wt_thresh, cdf_thresh=cdf_thresh)
    lwt = jnp.where(sel, res[2], -jnp.inf)
    return _stack_node_pdfs_jit(lwt, node_pdfs_occ)


@functools.partial(jax.jit, static_argnames=("lpnet_spec", "lprob_spec",
                                             "wt_thresh", "cdf_thresh",
                                             "cap_sel", "max_neighbors",
                                             "kde_wt_thresh",
                                             "kde_cdf_thresh", "use_dict",
                                             "nx"))
def _union_fp_jit(x, xe, xm, nodes_occ, members, models, models_err,
                  models_mask, lab_a, lab_b, lab_c, lab_d, lab_e, *,
                  lpnet_spec, lprob_spec, wt_thresh, cdf_thresh, cap_sel,
                  max_neighbors, kde_wt_thresh, kde_cdf_thresh, use_dict,
                  nx):
    """Fused exact-union fit_predict batch as ONE program
    (save_fits=False path): node fit -> member union -> exact posterior
    -> thresholded gathered KDE.  Only (pdf, lmap, levid, nuniq) leave
    the device — the (B, max_neighbors) grids never round-trip.

    ``lab_*`` carries the label parametrization: with ``use_dict`` it is
    (sigmas, widths, delta, full_pos, full_sig); otherwise
    (labels, label_errs, grid, dx, sig_thresh).
    """
    from .knn import _gathered_lprob_jit

    idx, nuniq = _gather_union_jit(x, xe, xm, nodes_occ, members,
                                   lpnet_spec=lpnet_spec,
                                   wt_thresh=wt_thresh,
                                   cdf_thresh=cdf_thresh, cap_sel=cap_sel,
                                   max_neighbors=max_neighbors)
    res = _gathered_lprob_jit(x, xe, xm, idx, idx >= 0, models, models_err,
                              models_mask, lprob_spec=lprob_spec)
    lnp = res[2]
    lmap = jnp.max(lnp, axis=1)
    levid = jax.scipy.special.logsumexp(lnp, axis=1)
    wt = jnp.exp(lnp - levid[:, None])
    wt = _kde.threshold_weights(wt, kde_wt_thresh, kde_cdf_thresh)
    safe = jnp.maximum(idx, 0)
    if use_dict:
        sigmas, widths, delta, full_pos, full_sig = \
            lab_a, lab_b, lab_c, lab_d, lab_e
        pdf = _kde._kde_stack_gathered_jit(sigmas, widths, delta,
                                           full_pos[safe], full_sig[safe],
                                           wt, nx=nx)
    else:
        labels, label_errs, grid, dx, sig_thresh = \
            lab_a, lab_b, lab_c, lab_d, lab_e
        pdf = _kde._kde_stack_gathered_grid_jit(labels[safe],
                                                label_errs[safe], wt, grid,
                                                dx, sig_thresh)
    return _kde.norm_rows(pdf), lmap, levid, nuniq


@functools.lru_cache(maxsize=None)
def _nodes_only_sharded_step(mesh, obj_axis, lpnet_spec, wt_thresh,
                             cdf_thresh):
    """Mesh-sharded nodes_only fit_predict step (objects sharded; nodes
    + node PDFs replicated; zero collectives)."""
    from jax.sharding import PartitionSpec as P

    def local(x, xe, xm, nodes_occ, node_pdfs_occ):
        return _nodes_only_fp_jit(x, xe, xm, nodes_occ, node_pdfs_occ,
                                  lpnet_spec=lpnet_spec,
                                  wt_thresh=wt_thresh,
                                  cdf_thresh=cdf_thresh)

    dspec = P(obj_axis, None)
    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(dspec, dspec, dspec, P(), P()),
        out_specs=(dspec, P(obj_axis), P(obj_axis)), check_vma=False))


@functools.lru_cache(maxsize=None)
def _union_sharded_step(mesh, obj_axis, lpnet_spec, lprob_spec, wt_thresh,
                        cdf_thresh, cap_sel, max_neighbors, kde_wt_thresh,
                        kde_cdf_thresh, use_dict, nx):
    """Mesh-sharded exact-union fit_predict step (objects sharded;
    nodes, member tables, models, and labels replicated)."""
    from jax.sharding import PartitionSpec as P

    def local(x, xe, xm, nodes_occ, members, models, models_err,
              models_mask, la, lb, lc, ld, le):
        return _union_fp_jit(x, xe, xm, nodes_occ, members, models,
                             models_err, models_mask, la, lb, lc, ld, le,
                             lpnet_spec=lpnet_spec, lprob_spec=lprob_spec,
                             wt_thresh=wt_thresh, cdf_thresh=cdf_thresh,
                             cap_sel=cap_sel, max_neighbors=max_neighbors,
                             kde_wt_thresh=kde_wt_thresh,
                             kde_cdf_thresh=kde_cdf_thresh,
                             use_dict=use_dict, nx=nx)

    dspec = P(obj_axis, None)
    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(dspec, dspec, dspec) + (P(),) * 10,
        out_specs=(dspec, P(obj_axis), P(obj_axis), P(obj_axis)),
        check_vma=False))


def _threshold_sel(lnprob, wt_thresh, cdf_thresh):
    """Boolean selection mask over the last axis (networks.py:323-332)."""
    if wt_thresh is None and cdf_thresh is None:
        return jnp.ones(lnprob.shape, bool)
    if wt_thresh is not None:
        cut = jnp.log(wt_thresh) + jnp.max(lnprob, axis=-1, keepdims=True)
        return lnprob > cut
    prob = jnp.exp(lnprob
                   - jax.scipy.special.logsumexp(lnprob, axis=-1,
                                                 keepdims=True))
    order = jnp.argsort(prob, axis=-1)
    cdf = jnp.cumsum(jnp.take_along_axis(prob, order, axis=-1), axis=-1)
    keep_sorted = cdf <= (1.0 - cdf_thresh)
    keep = jnp.zeros_like(keep_sorted)
    return jnp.put_along_axis(keep, order, keep_sorted, axis=-1,
                              inplace=False)


@jax.jit
def _stack_node_pdfs_jit(lwt, node_pdfs_occ):
    """nodes_only prediction: thresholded node weights @ node PDFs
    (networks.py:1113-1115), normalized per object."""
    lmap = jnp.max(lwt, axis=1)
    levid = jax.scipy.special.logsumexp(lwt, axis=1)
    wt = jnp.exp(lwt - levid[:, None])
    # HIGHEST precision: see ops/kde.py `_matmul` (PDF contract).
    pdf = jnp.dot(wt, node_pdfs_occ, precision=_kde.STACK_PRECISION)
    return _kde.norm_rows(pdf), lmap, levid


class _Network:
    """Shared node-network machinery (reference `_Network`, networks.py:121).

    Subclasses set `self.nodes` (Nnode, Nfilt) and `self.nodes_pos`
    (Nnode, Nproj) in `train_network`; everything else lives here.
    """

    def __init__(self, models, models_err, models_mask):
        self.models = jnp.asarray(models)
        self.models_err = jnp.asarray(models_err)
        self.models_mask = jnp.asarray(models_mask)
        # Host copies (device readback over a remote-TPU relay is slow).
        self._models_np = np.asarray(models, dtype=float)
        self._models_err_np = np.asarray(models_err, dtype=float)
        self._models_mask_np = np.asarray(models_mask, dtype=float)
        self.NMODEL, self.NDIM = self.models.shape
        self.models_lmap = np.full(self.NMODEL, -np.inf)
        self.models_levid = np.full(self.NMODEL, -np.inf)

        self.nodes = None
        self.nodes_pos = None
        self.NNODE = None
        self.NPROJ = None

        # Padded membership tables (built by populate_network).
        self.nodes_idxs = None        # (Nnode, maxm) int32, -99 pad
        self.nodes_logwts = None      # (Nnode, maxm) float32, -inf pad
        self.nodes_scales = None      # (Nnode, maxm) float32, 1 pad
        self.nodes_scales_err = None  # (Nnode, maxm) float32, 0 pad
        self.nodes_bmus = None        # (Nnode, maxb) int32, -99 pad
        self.nodes_Nmatch = None      # (Nnode,) int32
        self.nodes_Nbmu = None        # (Nnode,) int32
        self.nodes_only = None

        # Fit state (dense / padded, see fit()).
        self.NDATA = None
        self.neighbors = None
        self.Nneighbors = None
        self.fit_lnprior = None
        self.fit_lnlike = None
        self.fit_lnprob = None
        self.fit_Ndim = None
        self.fit_chi2 = None
        self.fit_scale = None
        self.fit_scale_err = None
        self._fit_rows_done = 0

        self.lpnet_func = None
        self.lpnet_args = ()
        self.lpnet_kwargs = None

    # ------------------------------------------------------------------
    # populate
    # ------------------------------------------------------------------

    def populate_network(self, lpnet_func=None, wt_thresh=1e-3,
                         cdf_thresh=2e-4, lpnet_args=None,
                         lpnet_kwargs=None, track_scale=True, verbose=True,
                         batch_size=8192, max_nodes_per_model=64):
        """Soft-assign every model to its matching nodes.

        Reference: networks.py:175-356.  One batched pass: per model batch
        the (B, Nnode) node log-posteriors (default free-scale,
        error-free), BMU by argmax, thresholded memberships, per-model
        normalized log-weights, and scales.  Results land in the padded
        member tables.
        """
        if lpnet_func is None:
            lpnet_func = _like.logprob
        lpnet_args = lpnet_args or ()
        if lpnet_kwargs is None:
            lpnet_kwargs = {"free_scale": True, "ignore_model_err": True,
                            "return_scale": True}
        self.lpnet_func = lpnet_func
        self.lpnet_args = lpnet_args
        self.lpnet_kwargs = lpnet_kwargs

        nodes = jnp.asarray(self.nodes)
        nnode = nodes.shape[0]
        # On-device compaction: transfer only the top-S thresholded
        # memberships per model ((B, S) slabs) instead of (B, Nnode)
        # grids — per-batch fancy-index readbacks over a remote-TPU relay
        # dominate populate time otherwise.  Two-phase cap: phase 1 runs a
        # slim slab (16 slots covers >98% of models at the default
        # threshold); the tail models that overflow it are re-run once at
        # an escalated cap.  Populate is relay-bandwidth-bound, so the 4x
        # slab shrink is a direct wall-clock win.
        cap = min(int(max_nodes_per_model), nnode)
        cap1 = min(_POPULATE_PHASE1_CAP, cap)
        lpnet_spec = _like.static_spec(lpnet_func, lpnet_args, lpnet_kwargs)

        def batch(x, xe, xm, bcap):
            return _populate_batch_jit(x, xe, xm, nodes,
                                       lpnet_spec=lpnet_spec,
                                       wt_thresh=wt_thresh,
                                       cdf_thresh=cdf_thresh, cap=bcap,
                                       track_scale=bool(track_scale))

        mods = self._models_np
        errs = self._models_err_np
        mask = self._models_mask_np

        def dispatch(idx0_or_rows, n, bcap):
            sl = (slice(idx0_or_rows, idx0_or_rows + n)
                  if isinstance(idx0_or_rows, int) else idx0_or_rows)
            x = _pad_rows(mods[sl], batch_size)
            xe = _pad_rows(errs[sl], batch_size)
            xm = _pad_rows(mask[sl], batch_size)
            return batch(jnp.asarray(x), jnp.asarray(xe), jnp.asarray(xm),
                         bcap)

        rows, cols, lws, scs, ses = [], [], [], [], []
        bmus = np.zeros(self.NMODEL, np.int64)
        parts = []
        for i0, n in _batch_slices(self.NMODEL, batch_size):
            parts.append((i0, n, dispatch(i0, n, cap1)))

        def collect(model_idx, cnt, top_lw, top_node, top_scale, top_serr):
            bcap = top_lw.shape[1]
            r, c = np.nonzero(np.arange(bcap)[None, :] < cnt[:, None])
            rows.append(model_idx[r])
            cols.append(top_node[r, c])
            lws.append(top_lw[r, c])
            scs.append(top_scale[r, c])
            ses.append(top_serr[r, c])

        tail_idx = []
        tail_max = 0
        for i0, n, part in progress_iter(parts, total=self.NMODEL,
                                         label="Mapping models",
                                         verbose=verbose, sizes=True):
            cnt, top_lw, top_node, top_scale, top_serr, bmu, lmap, levid = \
                jax.device_get(part)
            cnt = cnt[:n]
            over = cnt > cap1
            if over.any():
                tail_idx.append(np.flatnonzero(over) + i0)
                tail_max = max(tail_max, int(cnt.max()))
                cnt = np.where(over, 0, cnt)  # re-collected in phase 2
            collect(np.arange(i0, i0 + n), cnt, top_lw[:n], top_node[:n],
                    top_scale[:n], top_serr[:n])
            bmus[i0:i0 + n] = bmu[:n]
            self.models_lmap[i0:i0 + n] = lmap[:n]
            self.models_levid[i0:i0 + n] = levid[:n]

        if tail_idx:
            if tail_max > cap:
                raise ValueError(
                    "a model matched {} nodes (> max_nodes_per_model={}); "
                    "raise the cap or tighten wt_thresh".format(
                        tail_max, cap))
            tail = np.concatenate(tail_idx)
            # Exact counts are known from phase 1: escalate once to the
            # next power-of-two slab that fits every tail model.
            cap2 = cap1
            while cap2 < tail_max:
                cap2 *= 2
            cap2 = min(cap2, cap)
            tparts = []
            for j0, n in _batch_slices(len(tail), batch_size):
                tparts.append((j0, n, dispatch(tail[j0:j0 + n], n, cap2)))
            for j0, n, part in tparts:
                cnt, top_lw, top_node, top_scale, top_serr = [
                    np.asarray(a[:n]) for a in jax.device_get(part[:5])]
                collect(tail[j0:j0 + n], cnt, top_lw, top_node, top_scale,
                        top_serr)

        model_idx = np.concatenate(rows)
        node_idx = np.concatenate(cols).astype(np.int64)
        logwt = np.concatenate(lws)
        scale = np.concatenate(scs)
        serr = np.concatenate(ses)
        # Phase-2 (tail) entries arrive after all phase-1 entries; restore
        # global ascending-model order so per-node member lists keep the
        # reference's model-iteration order (networks.py:347-354).
        if tail_idx:
            om = np.argsort(model_idx, kind="stable")
            model_idx, node_idx, logwt, scale, serr = (
                model_idx[om], node_idx[om], logwt[om], scale[om],
                serr[om])

        # Compact into padded per-node tables, preserving model order.
        self.nodes_Nmatch = np.bincount(node_idx,
                                        minlength=nnode).astype(np.int32)
        maxm = max(int(self.nodes_Nmatch.max()), 1)
        self.nodes_idxs = np.full((nnode, maxm), -99, np.int32)
        self.nodes_logwts = np.full((nnode, maxm), -np.inf, np.float32)
        self.nodes_scales = np.ones((nnode, maxm), np.float32)
        self.nodes_scales_err = np.zeros((nnode, maxm), np.float32)
        order = np.argsort(node_idx, kind="stable")
        slot = np.zeros(len(node_idx), np.int64)
        sorted_nodes = node_idx[order]
        # Position within each node's run (stable sort keeps model order).
        starts = np.searchsorted(sorted_nodes, np.arange(nnode))
        slot = np.arange(len(node_idx)) - starts[sorted_nodes]
        self.nodes_idxs[sorted_nodes, slot] = model_idx[order]
        self.nodes_logwts[sorted_nodes, slot] = logwt[order]
        self.nodes_scales[sorted_nodes, slot] = scale[order]
        self.nodes_scales_err[sorted_nodes, slot] = serr[order]

        self.nodes_Nbmu = np.bincount(bmus,
                                      minlength=nnode).astype(np.int32)
        maxb = max(int(self.nodes_Nbmu.max()), 1)
        self.nodes_bmus = np.full((nnode, maxb), -99, np.int32)
        order_b = np.argsort(bmus, kind="stable")
        sorted_b = bmus[order_b]
        starts_b = np.searchsorted(sorted_b, np.arange(nnode))
        slot_b = np.arange(self.NMODEL) - starts_b[sorted_b]
        self.nodes_bmus[sorted_b, slot_b] = order_b.astype(np.int32)
        return self

    # ------------------------------------------------------------------
    # node access / node PDFs
    # ------------------------------------------------------------------

    def get_node(self, idx=None, pos=None, discrete=False):
        """Quantities for one node (networks.py:358-410).

        Returns (idx, node, node_pos, member_idxs, member_logwts, scales,
        scale_errs) with the valid member prefix only.
        """
        if (idx is None) == (pos is None):
            raise ValueError("Exactly one of `idx` or `pos` must be given.")
        if pos is not None:
            idx = int(np.argmin(((np.asarray(self.nodes_pos)
                                  - np.asarray(pos)) ** 2).sum(axis=1)))
        if discrete:
            n = self.nodes_Nbmu[idx]
            idxs = self.nodes_bmus[idx, :n]
            logwts = np.zeros(n)
            scales = np.ones(n)
            serr = np.zeros(n)
        else:
            n = self.nodes_Nmatch[idx]
            idxs = self.nodes_idxs[idx, :n]
            logwts = self.nodes_logwts[idx, :n]
            scales = self.nodes_scales[idx, :n]
            serr = self.nodes_scales_err[idx, :n]
        return (idx, np.asarray(self.nodes)[idx],
                np.asarray(self.nodes_pos)[idx], idxs, logwts, scales, serr)

    def get_pdfs(self, model_labels, model_label_errs, label_dict=None,
                 label_grid=None, kde_args=None, kde_kwargs=None,
                 return_gof=False, discrete=False, verbose=True,
                 batch_size=256):
        """Per-node member-stacked label PDFs: (Nnode, Ngrid).

        Reference: networks.py:509-694.  Each node's PDF is the weighted
        KDE over its members, normalized to 1 and then scaled by
        exp(levid) to reflect object density (networks.py:495-496); empty
        nodes get zero PDFs and -inf GOF.
        """
        if label_dict is None and label_grid is None:
            raise ValueError("`label_dict` or `label_grid` must be "
                             "specified.")
        # The reference stacks node PDFs through gauss_kde(_dict) with
        # its default thresholds unless kde_args/kde_kwargs override them
        # (networks.py:484-495) — member weights below threshold drop out
        # of the node PDF while lmap/levid stay computed on all members.
        dx, sig_thresh, wt_thresh, cdf_thresh = _kde.resolve_kde_opts(
            kde_args, kde_kwargs)
        model_labels = np.asarray(model_labels)
        model_label_errs = np.asarray(model_label_errs)
        if discrete:
            idx_tab = self.nodes_bmus
            counts = self.nodes_Nbmu
            lw_tab = np.where(idx_tab >= 0, 0.0, -np.inf).astype(np.float32)
        else:
            idx_tab = self.nodes_idxs
            counts = self.nodes_Nmatch
            lw_tab = self.nodes_logwts
        nnode, maxm = idx_tab.shape

        if label_dict is not None:
            fp, fs = label_dict.fit(jnp.asarray(model_labels),
                                    jnp.asarray(model_label_errs))
            fp, fs = np.asarray(fp), np.asarray(fs)
            ngrid = label_dict.Ngrid
        else:
            grid = jnp.asarray(label_grid)
            ngrid = len(label_grid)

        # Composed from module-level jitted pieces (global jit cache —
        # repeated get_pdfs calls never recompile).
        def stack(lwt, a, b):
            lmap, levid, wt = _node_pdf_weights_jit(lwt)
            wt = _kde.threshold_weights(wt, wt_thresh, cdf_thresh)
            if label_dict is not None:
                pdf = _kde.kde_stack_gathered_dict(label_dict, a, b, wt)
            else:
                pdf = _kde.kde_stack_gathered(a, b, wt, grid, dx=dx,
                                              sig_thresh=sig_thresh)
            pdf = _density_scale_jit(pdf, levid)
            return pdf, lmap, levid

        pdfs = np.zeros((nnode, ngrid), np.float32)
        lmap = np.full(nnode, -np.inf, np.float32)
        levid = np.full(nnode, -np.inf, np.float32)
        for i0, n in progress_iter(_batch_slices(nnode, batch_size),
                                   total=nnode, label="Generating node PDF",
                                   verbose=verbose, sizes=True):
            idx = _pad_rows(idx_tab[i0:i0 + n], batch_size)
            lwt = _pad_rows(lw_tab[i0:i0 + n], batch_size)
            safe = np.maximum(idx, 0)
            if label_dict is not None:
                a, b = fp[safe], fs[safe]
            else:
                a, b = model_labels[safe], model_label_errs[safe]
            pdf_b, lmap_b, levid_b = stack(jnp.asarray(lwt),
                                           jnp.asarray(a), jnp.asarray(b))
            pdfs[i0:i0 + n] = np.asarray(pdf_b[:n])
            lmap[i0:i0 + n] = np.asarray(lmap_b[:n])
            levid[i0:i0 + n] = np.asarray(levid_b[:n])
        empty = counts == 0
        pdfs[empty] = 0.0
        lmap[empty] = -np.inf
        levid[empty] = -np.inf
        if return_gof:
            return pdfs, (lmap, levid)
        return pdfs

    def get_pdf(self, idx, model_labels, model_label_errs, label_dict=None,
                label_grid=None, kde_args=None, kde_kwargs=None,
                return_gof=False, discrete=False):
        """One node's PDF (networks.py:412-507)."""
        out = self.get_pdfs(model_labels, model_label_errs,
                            label_dict=label_dict, label_grid=label_grid,
                            kde_args=kde_args, kde_kwargs=kde_kwargs,
                            return_gof=return_gof, discrete=discrete,
                            verbose=False)
        if return_gof:
            pdfs, (lmap, levid) = out
            return pdfs[idx], (lmap[idx], levid[idx])
        return out[idx]

    # ------------------------------------------------------------------
    # fit / predict
    # ------------------------------------------------------------------

    def _occupied(self):
        if self.nodes_Nmatch is None:
            raise RuntimeError("populate_network() must run before fit()")
        sel = np.flatnonzero(self.nodes_Nmatch > 0)
        if len(sel) == 0:
            raise RuntimeError(
                "no occupied nodes — populate_network found no finite "
                "model-node fits (zero model errors with the default "
                "free-scale likelihood give 0/0 variances; pass nonzero "
                "models_err)")
        return sel

    def fit(self, data, data_err, data_mask, lprob_func=None,
            nodes_only=False, wt_thresh=1e-3, cdf_thresh=2e-4,
            lprob_args=None, lprob_kwargs=None, track_scale=False,
            discrete=False, verbose=True, batch_size=256,
            max_sel_nodes=24, max_neighbors=4096, checkpoint_every=None,
            checkpoint_file=None, resume=False):
        """Fit data against the network (networks.py:696-936).

        nodes_only=True: stop at the node fits — `fit_lnprob` is the dense
        (Ndata, Nocc) thresholded node log-posterior grid over occupied
        nodes (`self.neighbors` holds the occupied node ids).

        nodes_only=False: per object, union the member models of the
        thresholded nodes (strongest `max_sel_nodes` nodes; union capped
        at `max_neighbors`, raising if the cap would truncate) and
        evaluate `lprob_func` exactly on the union — stored in kNN-style
        padded grids.

        `checkpoint_every=N` persists the fit prefix every N batches via
        `utils.checkpoint`; `resume=True` continues from an existing
        checkpoint with identical results.
        """
        from ..utils import checkpoint as _ckpt
        from .bruteforce import resume_fit_rows

        data = np.atleast_2d(np.asarray(data, float))
        data_err = np.atleast_2d(np.asarray(data_err, float))
        data_mask = np.atleast_2d(np.asarray(data_mask, float))
        ndata = data.shape[0]
        done = resume_fit_rows(self, resume, checkpoint_file, ndata,
                               checkpoint_every)
        self.NDATA = ndata
        self._fit_rows_done = done
        self.nodes_only = nodes_only
        occ = self._occupied()
        nocc = len(occ)
        nodes_occ = jnp.asarray(np.asarray(self.nodes)[occ])
        lpnet_func = self.lpnet_func or _like.logprob
        lpnet_args = self.lpnet_args or ()
        lpnet_kwargs = self.lpnet_kwargs or {
            "free_scale": True, "ignore_model_err": True,
            "return_scale": True}

        lpnet_spec = _like.static_spec(lpnet_func, lpnet_args, lpnet_kwargs)

        def node_fit(x, xe, xm):
            return _node_fit_jit(x, xe, xm, nodes_occ,
                                 lpnet_spec=lpnet_spec,
                                 wt_thresh=wt_thresh,
                                 cdf_thresh=cdf_thresh)

        if nodes_only:
            if not done:
                self.neighbors = occ.astype(np.int32)
                self.Nneighbors = np.full(ndata, nocc, np.int32)
                self.fit_lnprior = np.zeros((ndata, nocc), np.float32)
                self.fit_lnlike = np.zeros((ndata, nocc), np.float32)
                self.fit_lnprob = np.full((ndata, nocc), -np.inf,
                                          np.float32)
                self.fit_Ndim = np.zeros((ndata, nocc), np.int32)
                self.fit_chi2 = np.full((ndata, nocc), np.inf, np.float32)
                if track_scale:
                    self.fit_scale = np.ones((ndata, nocc), np.float32)
                    self.fit_scale_err = np.zeros((ndata, nocc),
                                                  np.float32)
            nb = 0
            for i0, n in progress_iter(
                    _batch_slices(ndata, batch_size), total=ndata,
                    label="Fitting object", verbose=verbose, sizes=True):
                if i0 + n <= done:
                    continue
                x = jnp.asarray(_pad_rows(data[i0:i0 + n], batch_size))
                xe = jnp.asarray(_pad_rows(data_err[i0:i0 + n], batch_size))
                xm = jnp.asarray(_pad_rows(data_mask[i0:i0 + n],
                                           batch_size))
                res, sel = node_fit(x, xe, xm)
                sel = np.asarray(sel[:n])
                sl = slice(i0, i0 + n)
                lnp = np.asarray(res[2][:n], np.float32)
                self.fit_lnprob[sl] = np.where(sel, lnp, -np.inf)
                self.fit_lnprior[sl] = np.asarray(res[0][:n], np.float32)
                self.fit_lnlike[sl] = np.asarray(res[1][:n], np.float32)
                self.fit_Ndim[sl] = np.asarray(res[3][:n], np.int32)
                self.fit_chi2[sl] = np.asarray(res[4][:n], np.float32)
                if track_scale and len(res) > 5 and res[5] is not None:
                    self.fit_scale[sl] = np.asarray(res[5][:n], np.float32)
                    self.fit_scale_err[sl] = np.asarray(res[6][:n],
                                                        np.float32)
                self._fit_rows_done = i0 + n
                nb += 1
                if checkpoint_every and nb % checkpoint_every == 0:
                    _ckpt.save(checkpoint_file, self)
            return self

        # --- exact-union path ---
        member_tab = self.nodes_bmus if discrete else self.nodes_idxs
        member_occ = member_tab[occ]  # (Nocc, maxm)
        cap_sel = min(max_sel_nodes, nocc)

        if not done:
            self.neighbors = np.full((ndata, max_neighbors), -99, np.int32)
            self.Nneighbors = np.zeros(ndata, np.int32)
            inf = np.inf
            shape = (ndata, max_neighbors)
            self.fit_lnprior = np.full(shape, -inf, np.float32)
            self.fit_lnlike = np.full(shape, -inf, np.float32)
            self.fit_lnprob = np.full(shape, -inf, np.float32)
            self.fit_Ndim = np.zeros(shape, np.int32)
            self.fit_chi2 = np.full(shape, inf, np.float32)
            if track_scale:
                self.fit_scale = np.ones(shape, np.float32)
                self.fit_scale_err = np.zeros(shape, np.float32)
            else:
                self.fit_scale = None
                self.fit_scale_err = None

        members_dev = jnp.asarray(member_occ)

        def gather_union(x, xe, xm):
            return _gather_union_jit(x, xe, xm, nodes_occ, members_dev,
                                     lpnet_spec=lpnet_spec,
                                     wt_thresh=wt_thresh,
                                     cdf_thresh=cdf_thresh, cap_sel=cap_sel,
                                     max_neighbors=max_neighbors)

        from .knn import _gathered_lprob_jit

        lprob_spec = _like.static_spec(lprob_func, lprob_args, lprob_kwargs)

        def union_lprob(x, xe, xm, idx):
            return _gathered_lprob_jit(x, xe, xm, idx, idx >= 0,
                                       self.models, self.models_err,
                                       self.models_mask,
                                       lprob_spec=lprob_spec)

        # Batches are dispatched asynchronously and read back in bulk,
        # trimmed to the widest ACTUAL union (rounded up to a lane
        # multiple): the (B, max_neighbors) grids are mostly padding, and
        # per-batch full-width readbacks over a remote-TPU relay dominate
        # wall time otherwise.  Columns beyond the trim width keep their
        # preallocated pad values.
        def flush(parts):
            if not parts:
                return
            nus = jax.device_get([nuniq for _, _, _, nuniq, _ in parts])
            wmax = 1
            for (i0, n, _, _, _), nu in zip(parts, nus):
                nu = np.asarray(nu[:n])
                if (nu > max_neighbors).any():
                    raise ValueError(
                        "neighbor union ({}) exceeds max_neighbors ({}); "
                        "raise `max_neighbors` or tighten `wt_thresh`"
                        .format(int(nu.max()), max_neighbors))
                self.Nneighbors[i0:i0 + n] = nu
                wmax = max(wmax, int(nu.max(initial=1)))
            w = min(max_neighbors, -(-wmax // 128) * 128)
            sliced = [(idx[:, :w],
                       tuple(None if r is None else r[:, :w] for r in res))
                      for _, _, idx, _, res in parts]
            for (i0, n, _, _, _), (idx_h, res_h) in zip(
                    parts, jax.device_get(sliced)):
                sl = slice(i0, i0 + n)
                self.neighbors[sl, :w] = np.asarray(idx_h[:n], np.int32)
                self.fit_lnprior[sl, :w] = np.asarray(res_h[0][:n],
                                                      np.float32)
                self.fit_lnlike[sl, :w] = np.asarray(res_h[1][:n],
                                                     np.float32)
                self.fit_lnprob[sl, :w] = np.asarray(res_h[2][:n],
                                                     np.float32)
                self.fit_Ndim[sl, :w] = np.asarray(res_h[3][:n], np.int32)
                self.fit_chi2[sl, :w] = np.asarray(res_h[4][:n], np.float32)
                if track_scale and res_h[5] is not None:
                    self.fit_scale[sl, :w] = np.asarray(res_h[5][:n],
                                                        np.float32)
                    self.fit_scale_err[sl, :w] = np.asarray(res_h[6][:n],
                                                            np.float32)
                self._fit_rows_done = i0 + n

        nb = 0
        parts = []
        for i0, n in progress_iter(
                _batch_slices(ndata, batch_size), total=ndata,
                label="Fitting object", verbose=verbose, sizes=True):
            if i0 + n <= done:
                continue
            x = jnp.asarray(_pad_rows(data[i0:i0 + n], batch_size))
            xe = jnp.asarray(_pad_rows(data_err[i0:i0 + n], batch_size))
            xm = jnp.asarray(_pad_rows(data_mask[i0:i0 + n], batch_size))
            idx, nuniq = gather_union(x, xe, xm)
            res = union_lprob(x, xe, xm, idx)
            parts.append((i0, n, idx, nuniq, res))
            nb += 1
            if checkpoint_every and nb % checkpoint_every == 0:
                flush(parts)
                parts = []
                _ckpt.save(checkpoint_file, self)
            elif len(parts) >= 64:
                flush(parts)
                parts = []
        flush(parts)
        return self

    def predict(self, model_labels, model_label_errs, label_dict=None,
                label_grid=None, logwt=None, kde_args=None, kde_kwargs=None,
                return_gof=False, discrete=False, verbose=True,
                batch_size=256, wt_thresh=1e-3, cdf_thresh=2e-4):
        """PDF predictions from stored fits (networks.py:938-1128).

        nodes_only fits stack precomputed node PDFs with the node weights
        (one matmul, networks.py:1113-1115); exact-union fits stack the
        per-object member kernels like the kNN fitter.
        """
        if logwt is None:
            logwt = self.fit_lnprob
        if logwt is None:
            raise ValueError("Fits have not been computed and weights have "
                             "not been provided.")
        if label_dict is None and label_grid is None:
            raise ValueError("`label_dict` or `label_grid` must be "
                             "specified.")
        dx, sig_thresh, wt_thresh, cdf_thresh = _kde.resolve_kde_opts(
            kde_args, kde_kwargs, wt_thresh, cdf_thresh)
        logwt = np.asarray(logwt, np.float32)
        ndata = logwt.shape[0]
        model_labels = np.asarray(model_labels)
        model_label_errs = np.asarray(model_label_errs)

        if self.nodes_only:
            node_pdfs = self.get_pdfs(model_labels, model_label_errs,
                                      label_dict=label_dict,
                                      label_grid=label_grid,
                                      kde_args=kde_args,
                                      kde_kwargs=kde_kwargs,
                                      discrete=discrete, verbose=False)
            node_pdfs_occ = jnp.asarray(node_pdfs[self.neighbors])

            def stack(lwt):
                return _stack_node_pdfs_jit(lwt, node_pdfs_occ)

            ngrid = node_pdfs.shape[1]
            pdfs = np.zeros((ndata, ngrid), np.float32)
            lmap = np.zeros(ndata, np.float32)
            levid = np.zeros(ndata, np.float32)
            for i0, n in progress_iter(
                    _batch_slices(ndata, batch_size), total=ndata,
                    label="Generating PDF", verbose=verbose, sizes=True):
                lwt = _pad_rows(logwt[i0:i0 + n], batch_size)
                pdf_b, lmap_b, levid_b = stack(jnp.asarray(lwt))
                pdfs[i0:i0 + n] = np.asarray(pdf_b[:n])
                lmap[i0:i0 + n] = np.asarray(lmap_b[:n])
                levid[i0:i0 + n] = np.asarray(levid_b[:n])
            if return_gof:
                return pdfs, (lmap, levid)
            return pdfs

        # exact-union path: reuse the kNN gathered stacking
        from .knn import NearestNeighbors as _NN

        neighbors = self.neighbors
        if (self.Nneighbors is not None
                and logwt.shape == neighbors.shape):
            # Trim to the widest actual union (lane-aligned): the padded
            # columns carry zero weight, and the gathered KDE materializes
            # (B, J, Ngrid) kernel rows — width trimming cuts both the
            # upload and that temporary by the padding ratio.
            w = min(neighbors.shape[1],
                    -(-max(int(self.Nneighbors.max()), 1) // 128) * 128)
            neighbors = neighbors[:, :w]
            logwt = logwt[:, :w]

        pdfs, lmap, levid, _ = _NN._stack_batches(
            self, logwt, neighbors, model_labels, model_label_errs,
            label_dict, label_grid, wt_thresh, cdf_thresh, batch_size,
            dx=dx, sig_thresh=sig_thresh)
        if return_gof:
            return pdfs, (lmap, levid)
        return pdfs

    def fit_predict(self, data, data_err, data_mask, model_labels,
                    model_label_errs, lprob_func=None, label_dict=None,
                    label_grid=None, kde_args=None, kde_kwargs=None,
                    lprob_args=None, lprob_kwargs=None, return_gof=False,
                    track_scale=False, discrete=False, nodes_only=False,
                    verbose=True, save_fits=True, batch_size=256,
                    wt_thresh=1e-3, cdf_thresh=2e-4, max_sel_nodes=24,
                    max_neighbors=4096, mesh=None, _post_setup=None):
        """fit + predict (networks.py:1130-1487).

        With ``save_fits=True`` (the reference default) this is
        fit() then predict(), materializing the padded fit grids on the
        host.  With ``save_fits=False`` each batch runs as ONE fused
        device program and only (pdf, lmap, levid) stream back — the
        (B, max_neighbors) grids never round-trip, which over a
        remote-TPU relay is ~10x faster on the exact-union path.  With
        `mesh` given (requires save_fits=False), batches shard over the
        mesh's first axis — pure data parallelism, zero collectives.
        """
        if mesh is not None and save_fits:
            raise ValueError("mesh-sharded fit_predict streams PDFs only; "
                             "pass save_fits=False")
        if _post_setup is not None and save_fits:
            raise ValueError("streaming summaries require the fused "
                             "save_fits=False path")
        if save_fits:
            self.fit(data, data_err, data_mask, lprob_func=lprob_func,
                     nodes_only=nodes_only, wt_thresh=wt_thresh,
                     cdf_thresh=cdf_thresh, lprob_args=lprob_args,
                     lprob_kwargs=lprob_kwargs, track_scale=track_scale,
                     discrete=discrete, verbose=verbose,
                     batch_size=batch_size, max_sel_nodes=max_sel_nodes,
                     max_neighbors=max_neighbors)
            return self.predict(model_labels, model_label_errs,
                                label_dict=label_dict,
                                label_grid=label_grid, kde_args=kde_args,
                                kde_kwargs=kde_kwargs,
                                return_gof=return_gof, discrete=discrete,
                                verbose=verbose, batch_size=batch_size,
                                wt_thresh=wt_thresh, cdf_thresh=cdf_thresh)
        return self._fit_predict_fused(
            data, data_err, data_mask, model_labels, model_label_errs,
            lprob_func=lprob_func, label_dict=label_dict,
            label_grid=label_grid, kde_args=kde_args,
            kde_kwargs=kde_kwargs, lprob_args=lprob_args,
            lprob_kwargs=lprob_kwargs, return_gof=return_gof,
            discrete=discrete, nodes_only=nodes_only,
            batch_size=batch_size, wt_thresh=wt_thresh,
            cdf_thresh=cdf_thresh, max_sel_nodes=max_sel_nodes,
            max_neighbors=max_neighbors, mesh=mesh, verbose=verbose,
            post_setup=_post_setup)

    def _fit_predict_fused(self, data, data_err, data_mask, model_labels,
                           model_label_errs, lprob_func, label_dict,
                           label_grid, kde_args, kde_kwargs, lprob_args,
                           lprob_kwargs, return_gof, discrete, nodes_only,
                           batch_size, wt_thresh, cdf_thresh,
                           max_sel_nodes, max_neighbors, mesh=None,
                           verbose=True, post_setup=None):
        """save_fits=False streaming fit_predict (see fit_predict)."""
        data = np.atleast_2d(np.asarray(data, float))
        data_err = np.atleast_2d(np.asarray(data_err, float))
        data_mask = np.atleast_2d(np.asarray(data_mask, float))
        ndata = data.shape[0]
        if mesh is not None:
            ndev = int(mesh.size)
            batch_size = -(-batch_size // ndev) * ndev
        occ = self._occupied()
        nocc = len(occ)
        nodes_occ = jnp.asarray(np.asarray(self.nodes)[occ])
        lpnet_func = self.lpnet_func or _like.logprob
        lpnet_kwargs = self.lpnet_kwargs or {
            "free_scale": True, "ignore_model_err": True,
            "return_scale": True}
        lpnet_spec = _like.static_spec(lpnet_func, self.lpnet_args,
                                       lpnet_kwargs)
        dx, sig_thresh, kde_wt, kde_cdf = _kde.resolve_kde_opts(
            kde_args, kde_kwargs, wt_thresh, cdf_thresh)
        model_labels = np.asarray(model_labels)
        model_label_errs = np.asarray(model_label_errs)

        if nodes_only:
            node_pdfs = self.get_pdfs(model_labels, model_label_errs,
                                      label_dict=label_dict,
                                      label_grid=label_grid,
                                      kde_args=kde_args,
                                      kde_kwargs=kde_kwargs,
                                      discrete=discrete, verbose=False)
            node_pdfs_occ = jnp.asarray(node_pdfs[occ])
            ngrid = node_pdfs.shape[1]

            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                obj_axis = mesh.axis_names[0]
                step = _nodes_only_sharded_step(mesh, obj_axis, lpnet_spec,
                                                wt_thresh, cdf_thresh)
                dspec = NamedSharding(mesh, P(obj_axis))
                rspec = NamedSharding(mesh, P())
                nodes_r = jax.device_put(nodes_occ, rspec)
                pdfs_r = jax.device_put(node_pdfs_occ, rspec)

                def run(x, xe, xm):
                    pdf, lmap, levid = step(
                        jax.device_put(x, dspec), jax.device_put(xe, dspec),
                        jax.device_put(xm, dspec), nodes_r, pdfs_r)
                    return pdf, lmap, levid, None
            else:
                def run(x, xe, xm):
                    pdf, lmap, levid = _nodes_only_fp_jit(
                        x, xe, xm, nodes_occ, node_pdfs_occ,
                        lpnet_spec=lpnet_spec, wt_thresh=wt_thresh,
                        cdf_thresh=cdf_thresh)
                    return pdf, lmap, levid, None
        else:
            member_tab = self.nodes_bmus if discrete else self.nodes_idxs
            members_dev = jnp.asarray(member_tab[occ])
            cap_sel = min(max_sel_nodes, nocc)
            lprob_spec = _like.static_spec(lprob_func, lprob_args,
                                           lprob_kwargs)
            use_dict, ngrid, lab = _kde.pack_label_spec(
                label_dict, label_grid, model_labels, model_label_errs,
                dx=dx, sig_thresh=sig_thresh)

            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                obj_axis = mesh.axis_names[0]
                step = _union_sharded_step(
                    mesh, obj_axis, lpnet_spec, lprob_spec, wt_thresh,
                    cdf_thresh, cap_sel, max_neighbors, kde_wt, kde_cdf,
                    use_dict, ngrid)
                dspec = NamedSharding(mesh, P(obj_axis))
                rspec = NamedSharding(mesh, P())
                reps = [jax.device_put(v, rspec) for v in
                        (nodes_occ, members_dev, self.models,
                         self.models_err, self.models_mask) + lab]

                def run(x, xe, xm):
                    return step(jax.device_put(x, dspec),
                                jax.device_put(xe, dspec),
                                jax.device_put(xm, dspec), *reps)
            else:
                def run(x, xe, xm):
                    return _union_fp_jit(
                        x, xe, xm, nodes_occ, members_dev, self.models,
                        self.models_err, self.models_mask, *lab,
                        lpnet_spec=lpnet_spec, lprob_spec=lprob_spec,
                        wt_thresh=wt_thresh, cdf_thresh=cdf_thresh,
                        cap_sel=cap_sel, max_neighbors=max_neighbors,
                        kde_wt_thresh=kde_wt, kde_cdf_thresh=kde_cdf,
                        use_dict=use_dict, nx=ngrid)

        post, out_width = ((None, ngrid) if post_setup is None
                           else post_setup(ndata, batch_size))
        pdfs = np.zeros((ndata, out_width), np.float32)
        lmap = np.zeros(ndata, np.float32)
        levid = np.zeros(ndata, np.float32)

        def drain(parts):
            for i0, n, out in jax.device_get(parts):
                pdf_b, lmap_b, levid_b, nuniq = out
                if nuniq is not None:
                    nu = np.asarray(nuniq[:n])
                    if (nu > max_neighbors).any():
                        raise ValueError(
                            "neighbor union ({}) exceeds max_neighbors "
                            "({}); raise `max_neighbors` or tighten "
                            "`wt_thresh`".format(int(nu.max()),
                                                 max_neighbors))
                pdfs[i0:i0 + n] = pdf_b[:n]
                lmap[i0:i0 + n] = lmap_b[:n]
                levid[i0:i0 + n] = levid_b[:n]

        parts = []
        for i0, n in progress_iter(
                _batch_slices(ndata, batch_size), total=ndata,
                label="Generating PDF", verbose=verbose, sizes=True):
            x = jnp.asarray(_pad_rows(data[i0:i0 + n], batch_size))
            xe = jnp.asarray(_pad_rows(data_err[i0:i0 + n], batch_size))
            xm = jnp.asarray(_pad_rows(data_mask[i0:i0 + n], batch_size))
            out = run(x, xe, xm)
            if post is not None:
                out = (post(out[0], i0),) + tuple(out[1:])
            parts.append((i0, n, out))
            if len(parts) >= 64:
                drain(parts)
                parts = []
        drain(parts)
        if return_gof:
            return pdfs, (lmap, levid)
        return pdfs

    def fit_summarize(self, data, data_err, data_mask, model_labels,
                      model_label_errs, lprob_func=None, label_dict=None,
                      label_grid=None, kde_args=None, kde_kwargs=None,
                      lprob_args=None, lprob_kwargs=None, discrete=False,
                      nodes_only=False, verbose=True, batch_size=256,
                      wt_thresh=1e-3, cdf_thresh=2e-4, max_sel_nodes=24,
                      max_neighbors=4096, mesh=None, pkern="lorentz",
                      pkern_grid=None, summary_seed=0):
        """Streaming `fit_predict(save_fits=False)` + on-device
        `pdfs_summarize` — only 21 summary columns per object stream
        back, not the (Ndata, Ngrid) PDFs (see
        `BruteForce.fit_summarize`; same contract and MC-uniform
        convention).  Works on both the nodes_only and exact-union
        paths.  Returns ``(PDFSummary, (lmap, levid))``.
        """
        from ..ops import summarize as _summ

        grid = _summ.label_grid_of(label_dict, label_grid)
        cols, gof = self.fit_predict(
            data, data_err, data_mask, model_labels, model_label_errs,
            lprob_func=lprob_func, label_dict=label_dict,
            label_grid=label_grid, kde_args=kde_args,
            kde_kwargs=kde_kwargs, lprob_args=lprob_args,
            lprob_kwargs=lprob_kwargs, return_gof=True,
            discrete=discrete, nodes_only=nodes_only, verbose=verbose,
            save_fits=False, batch_size=batch_size, wt_thresh=wt_thresh,
            cdf_thresh=cdf_thresh, max_sel_nodes=max_sel_nodes,
            max_neighbors=max_neighbors, mesh=mesh,
            _post_setup=_summ.stream_summary_setup(grid, pkern, pkern_grid,
                                                   summary_seed))
        return _summ.unpack_summary(cols), gof


@functools.partial(jax.jit, static_argnames=("lprob_spec", "learn_spec",
                                             "neighbor_spec", "wt_thresh",
                                             "cdf_thresh", "track_scale",
                                             "nside"))
def _som_train_jit(nodes0, draws, times, mods, errs, mask, positions, *,
                   lprob_spec, learn_spec, neighbor_spec, wt_thresh,
                   cdf_thresh, track_scale, nside):
    """Whole SOM training run as ONE `lax.scan` program (module-level:
    arrays enter as arguments, not baked closure constants — a fresh
    instance or process with the same static spec reuses the compiled
    program, including via the persistent compilation cache)."""
    lprob_func, lprob_args, lp_kw = lprob_spec
    if lprob_func is None:
        lprob_func = _like.logprob
    lprob_kwargs = dict(lp_kw)
    learn_fn, learn_args, lk = learn_spec
    learn_kwargs = dict(lk)
    neighbor_fn, neighbor_args, nk = neighbor_spec
    neighbor_kwargs = dict(nk)

    def step(nodes, xs):
        idx, t = xs
        x, xe, xm = mods[idx], errs[idx], mask[idx]
        res = lprob_func(x[None], xe[None], xm[None], nodes,
                         jnp.zeros_like(nodes), jnp.ones_like(nodes),
                         *lprob_args, **lprob_kwargs)
        lnp = res[2][0]
        if track_scale:
            nodes = nodes * res[5][0][:, None]
        bmu = jnp.argmax(lnp)
        rate = learn_fn(t, *learn_args, **learn_kwargs)
        wt, _sigma = neighbor_fn(t, positions[bmu], positions, nside,
                                 *neighbor_args, **neighbor_kwargs)
        if wt_thresh is not None:
            keep = wt > wt_thresh * jnp.max(wt)
        else:
            prob = wt / jnp.sum(wt)
            order = jnp.argsort(wt)
            cdf = jnp.cumsum(prob[order])
            keep_sorted = cdf <= (1.0 - cdf_thresh)
            keep = jnp.zeros_like(keep_sorted)
            keep = keep.at[order].set(keep_sorted)
        update = rate * wt[:, None] * (x[None, :] - nodes)
        nodes = nodes + jnp.where(keep[:, None], update, 0.0)
        return nodes, bmu

    return jax.lax.scan(step, nodes0, (draws, times))


_LEARN_NAMES = {learn_linear: "linear", learn_geometric: "geometric",
                learn_harmonic: "harmonic"}


def _learn_value(name, t, start, end):
    """Traced learning-rate schedule by static name (networks.py:38-68)."""
    if name == "linear":
        return (1.0 - t) * start + t * end
    if name == "geometric":
        return jnp.exp((1.0 - t) * jnp.log(start) + t * jnp.log(end))
    return 1.0 / ((1.0 - t) / start + t / end)  # harmonic


def _make_som_mega_kernel(*, chunk, nsteps, nsteps_total, nproj, nside,
                          wt_thresh, dim_prior, learn_name, lstart, lend,
                          neighbor_name, nb_rate, nstart, nend, nfilt, n):
    """Whole-training-run SOM kernel body.

    LANE-ORIENTED like the GNG mega-kernel (nodes on the 128-wide lane
    axis): the node table `nodesT` (F8, Np) and lattice positions
    `posT` (8, Np) are VMEM-resident across sequential grid steps (a
    few hundred KB — the node-per-sublane layout of rounds 1-2 paid
    ~N/8 tile-ops per per-node vector op).  Draws stream in
    group-packed (chunk, 128) slabs (128 // group_w sequential draws
    per row, statically rolled into lanes [0, group_w)); per-filter
    scalars are lane-extracted and multiply static sublane rows, so
    there are no dynamic-lane accesses or gathers anywhere.

    Cleaned-data semantics (pdf.py:310-311) arrive pre-baked: masked /
    non-finite / zero-error bands carry iv = 0 and x = 0 (as do the
    lane pads), so they vanish from every sum and Ndim = #(iv > 0).

    `nsteps` is the number of live steps in THIS dispatch; the traced
    `off_ref` scalar is the global index of its first step and
    `nsteps_total` the whole run's length, so a run chunked for
    checkpointing (train_network(checkpoint_every=...)) walks the
    learning-rate/neighborhood schedules identically to one dispatch.
    """
    group_w = 8
    while group_w < 128 and group_w < nfilt:
        group_w *= 2
    groups = 128 // group_w
    inv_T = 1.0 / float(max(nsteps_total - 1, 1))

    def kernel(xc_ref, iv_ref, xraw_ref, nodes0_ref, pos0_ref, off_ref,
               nodes_ref, pos_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            nodes_ref[:, :] = nodes0_ref[:, :]
            pos_ref[:, :] = pos0_ref[:, :]

        frow, npl = nodes0_ref.shape
        ln = jax.lax.broadcasted_iota(jnp.int32,
                                      (1, npl), 1).astype(jnp.float32)
        subf = jax.lax.broadcasted_iota(jnp.int32,
                                        (frow, 1), 0).astype(jnp.float32)
        lid128 = jax.lax.broadcasted_iota(jnp.int32,
                                          (1, 128), 1).astype(jnp.float32)
        valid_lane = ln < float(n)
        big = jnp.float32(1e9)
        # Lane-pad score sentinel: must sit below any real score (a
        # plain -1e9 loses to chi2 ~ 2e9 from high-flux/low-error
        # photometry, silently making a pad lane the BMU); the GNG
        # kernel masks dead lanes with the same near--inf constant.
        neg = jnp.float32(-3e38)

        def one_step(i, xcg, ivg, xrg):
            @pl.when(i < nsteps)
            def _():
                t = (off_ref[0, 0] + i.astype(jnp.float32)) * inv_T
                xivg = xcg * ivg
                A = jnp.sum(xcg * xivg, keepdims=True)
                nodes = nodes_ref[:, :]
                # Free-scale error-free color likelihood
                # (pdf.py:180-194): per-filter scalars multiply static
                # node sublane rows.
                inter = None
                shape = None
                xcol = None
                for f in range(nfilt):
                    xiv_f = xivg[:, f:f + 1]
                    iv_f = ivg[:, f:f + 1]
                    xr_f = xrg[:, f:f + 1]
                    nf_row = nodes[f:f + 1, :]
                    it = nf_row * xiv_f
                    sh = (nf_row * nf_row) * iv_f
                    inter = it if inter is None else inter + it
                    shape = sh if shape is None else shape + sh
                    xcontrib = jnp.where(subf == float(f), xr_f, 0.0)
                    xcol = xcontrib if xcol is None else xcol + xcontrib
                chi2 = A - inter * (inter / jnp.maximum(shape, 1e-30))
                if dim_prior:
                    # Node masks are all-ones so Ndim is per-draw
                    # constant; the gammaln norm drops from the argmax.
                    ndim = jnp.sum((ivg > 0.0).astype(jnp.float32),
                                   keepdims=True)
                    a1 = 0.5 * (ndim - 1.0) - 1.0
                    score = (a1 * jnp.log(jnp.maximum(chi2, 1e-30))
                             - 0.5 * chi2)
                else:
                    score = -0.5 * chi2
                score = jnp.where(valid_lane, score, neg)
                bmu = jnp.min(jnp.where(
                    score == jnp.max(score, keepdims=True), ln, big),
                    keepdims=True)
                is_bmu = ln == bmu

                # Neighborhood over the lattice (networks.py:71-118).
                pos = pos_ref[:, :]
                pbmu = jnp.sum(jnp.where(is_bmu, pos, 0.0), axis=1,
                               keepdims=True)
                diff = pos - pbmu
                sqd = jnp.sum(diff * diff, axis=0, keepdims=True)
                sigma = _learn_value(nb_rate, t, nstart, nend) \
                    * float(nside)
                if neighbor_name == "gauss":
                    wt = jnp.exp(-0.5 * sqd / (sigma * sigma))
                else:  # lorentz
                    wt = sigma * sigma / (sqd + sigma * sigma)
                rate = _learn_value(learn_name, t, lstart, lend)
                wt = jnp.where(valid_lane, wt, 0.0)
                keep = wt > wt_thresh * jnp.max(wt, keepdims=True)
                # The node update uses the RAW draw (the reference
                # cleans data only inside the likelihood,
                # networks.py:1864).
                upd = jnp.where(keep, rate * wt, 0.0)
                nodes_ref[:, :] = nodes + upd * (xcol - nodes)

        group_mask = lid128 < float(group_w)

        def row_step(r, _):
            xc_row = xc_ref[pl.ds(r, 1), :]
            iv_row = iv_ref[pl.ds(r, 1), :]
            xr_row = xraw_ref[pl.ds(r, 1), :]
            for gsub in range(groups):
                sh = (128 - gsub * group_w) % 128
                xc = jnp.where(group_mask, pltpu.roll(xc_row, sh, 1),
                               0.0)
                iv = jnp.where(group_mask, pltpu.roll(iv_row, sh, 1),
                               0.0)
                xr = jnp.where(group_mask, pltpu.roll(xr_row, sh, 1),
                               0.0)
                one_step((g * chunk + r) * groups + gsub, xc, iv, xr)
            return 0

        jax.lax.fori_loop(0, chunk, row_step, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("nsteps", "nsteps_total",
                                             "nproj", "nside", "wt_thresh",
                                             "dim_prior", "learn_name",
                                             "lstart", "lend",
                                             "neighbor_name", "nb_rate",
                                             "nstart", "nend", "chunk",
                                             "nfilt", "n_true",
                                             "interpret"))
def _som_train_pallas(nodes0, xc, iv, xraw, positions, off, *, nsteps,
                      nsteps_total, nproj, nside, wt_thresh, dim_prior,
                      learn_name, lstart, lend, neighbor_name, nb_rate,
                      nstart, nend, chunk, nfilt, n_true, interpret):
    """Dispatch the SOM mega-kernel (see `_make_som_mega_kernel`).

    nodes0: (F8, Np) lane-oriented node table; positions: (8, Np)
    lattice coordinates; xc/iv/xraw: group-packed draw slabs; off: the
    (1, 128) global step offset of this dispatch's first step.
    Returns the trained (F8, Np) node table.
    """
    npad = xc.shape[0]
    assert npad % chunk == 0
    frow, np_l = nodes0.shape
    kernel = _make_som_mega_kernel(
        chunk=chunk, nsteps=nsteps, nsteps_total=nsteps_total,
        nproj=nproj, nside=nside, wt_thresh=wt_thresh,
        dim_prior=dim_prior, learn_name=learn_name, lstart=lstart,
        lend=lend, neighbor_name=neighbor_name, nb_rate=nb_rate,
        nstart=nstart, nend=nend, nfilt=nfilt, n=n_true)
    slab = pl.BlockSpec((chunk, 128), lambda g: (g, 0))
    nodes_s = pl.BlockSpec((frow, np_l), lambda g: (0, 0))
    pos_s = pl.BlockSpec((8, np_l), lambda g: (0, 0))
    off_s = pl.BlockSpec((1, 128), lambda g: (0, 0))
    nodes_out, _ = pl.pallas_call(
        kernel,
        grid=(npad // chunk,),
        in_specs=[slab, slab, slab, nodes_s, pos_s, off_s],
        out_specs=(nodes_s, pos_s),
        out_shape=(jax.ShapeDtypeStruct((frow, np_l), jnp.float32),
                   jax.ShapeDtypeStruct((8, np_l), jnp.float32)),
        interpret=interpret,
    )(xc, iv, xraw, nodes0, positions, off)
    return nodes_out


class SelfOrganizingMap(_Network):
    """Classic SOM trained with log-posterior BMU matching.

    Reference: networks.py:1490-1867.  Defaults: 50x50 lattice (nside=50,
    nproj=2), niter=2000 x nbatch=50 = 100K sequential steps, free-scale
    error-free color likelihood, harmonic learning rate, Gaussian
    neighborhood.  Training runs as ONE `lax.scan` on device; on TPU the
    default configuration auto-dispatches to a Pallas mega-kernel that
    runs the ENTIRE training loop on-chip (node table resident in VMEM
    across sequential grid steps, draws streamed in chunks — no
    per-step kernel launches; ~2x the scan path, trajectories
    distribution-equivalent).  Control with ``use_pallas``.
    """

    def train_network(self, models=None, models_err=None, models_mask=None,
                      nside=50, nproj=2, nodes_init=None, niter=2000,
                      nbatch=50, err_kernel=None, lprob_func=None,
                      learn_func=None, neighbor_func=None, wt_thresh=1e-3,
                      cdf_thresh=2e-4, rng=None, seed=None,
                      lprob_args=None, lprob_kwargs=None, track_scale=False,
                      learn_args=None, learn_kwargs=None, neighbor_args=None,
                      neighbor_kwargs=None, verbose=True, use_pallas=None,
                      checkpoint_every=None, checkpoint_file=None,
                      resume=False):
        if models is None:
            models = self._models_np
            models_err = self._models_err_np
            models_mask = self._models_mask_np
        models = np.asarray(models, float)
        models_err = np.asarray(models_err, float)
        models_mask = np.asarray(models_mask, float)
        if err_kernel is not None:
            models_err = np.sqrt(models_err**2 + np.asarray(err_kernel)**2)
        nmodel = len(models)
        self.NITER, self.NBATCH = niter, nbatch
        self.NSIDE = nside
        self.NNODE, self.NPROJ = nside**nproj, nproj

        if lprob_func is None:
            lprob_func = _like.logprob
        lprob_args = lprob_args or ()
        if lprob_kwargs is None:
            lprob_kwargs = {"free_scale": True, "ignore_model_err": True}
            if track_scale:
                lprob_kwargs["return_scale"] = True
        learn_fn = learn_func or learn_harmonic
        learn_kwargs = learn_kwargs or {}
        learn_args = learn_args or ()
        neighbor_fn = neighbor_func or neighbor_gauss
        neighbor_kwargs = neighbor_kwargs or {}
        neighbor_args = neighbor_args or ()

        # Lattice positions: digit i of the node index in base nside
        # (networks.py:1804-1810).
        idxs = np.arange(self.NNODE)
        pos = np.zeros((self.NNODE, nproj))
        for i in range(nproj):
            pos[:, i] = (idxs // nside ** (nproj - 1 - i)) % nside
        self.nodes_pos = pos

        rng = rng if rng is not None else np.random.default_rng(seed)
        if nodes_init is None:
            init = models[rng.choice(nmodel, size=self.NNODE,
                                     replace=False)]
        else:
            init = np.asarray(nodes_init, float)

        nsteps = niter * nbatch
        t0 = time.time()
        draws = rng.integers(0, nmodel, size=nsteps)
        times = np.linspace(0.0, 1.0, nsteps)

        # Mid-run durability (SURVEY.md section 5): the training scan
        # runs in `checkpoint_every`-step segments with the node table
        # carried across device calls; the segment composition is exactly
        # the single-call scan, and `resume=True` (same seed, so the same
        # regenerated draw sequence) continues from the saved node state.
        from ..utils import checkpoint as _ckpt

        _ckpt.validate_plan(checkpoint_every, checkpoint_file)
        start = 0
        if resume:
            if not checkpoint_file:
                raise ValueError("resume=True requires checkpoint_file")
            if _ckpt.exists(checkpoint_file):
                st = _ckpt.restore(checkpoint_file)
                if int(st["nsteps_total"]) != nsteps:
                    raise ValueError("checkpoint was taken for a "
                                     f"{int(st['nsteps_total'])}-step run, "
                                     f"resuming one of {nsteps}")
                init = np.asarray(st["nodes"], float)
                start = int(st["steps_done"])
        seg = nsteps if not checkpoint_every else int(checkpoint_every)

        def save_ckpt(nodes_host, steps_done):
            if checkpoint_every:
                _ckpt.save(checkpoint_file,
                           {"nodes": np.asarray(nodes_host, float),
                            "steps_done": int(steps_done),
                            "nsteps_total": int(nsteps)})

        lprob_spec = _like.static_spec(lprob_func, lprob_args, lprob_kwargs)
        learn_spec = (learn_fn, tuple(learn_args),
                      tuple(sorted(learn_kwargs.items())))
        neighbor_spec = (neighbor_fn, tuple(neighbor_args),
                         tuple(sorted(neighbor_kwargs.items())))

        # Mega-kernel eligibility: default free-scale error-free color
        # likelihood, named schedules, wt_thresh mode.  The node cap is
        # derived from the VMEM footprint, which scales with BOTH the
        # lane-padded node count and the filter-row count frow (the
        # nodes in/out blocks are (frow, Np)): per lane ~ 4*frow + 32
        # f32 rows (nodes in+out, pos in+out, kernel temporaries),
        # calibrated so the validated F<=8 point keeps its 32768-node
        # cap (nside 181 at nproj=2) under Mosaic's conservatively
        # accounted 16 MB scoped limit.  Larger lattices use lax.scan.
        kw = dict(lprob_spec[2])
        nb_rate = neighbor_kwargs.get("rate", "harmonic")
        mega_chunk = 64  # slab rows per grid step (1024 draws at F<=8)
        frow_som = max(8, -(-models.shape[1] // 8) * 8)
        mega_max_nodes = min(32768, (8 << 20) // (4 * (4 * frow_som + 32))
                             // 128 * 128)
        mega_ok = (
            lprob_spec[0] is None and not lprob_spec[1]
            and kw.get("free_scale") is True
            and kw.get("ignore_model_err") is True
            and set(kw) <= {"free_scale", "ignore_model_err", "dim_prior"}
            and not track_scale
            and wt_thresh is not None
            and learn_fn in _LEARN_NAMES and not learn_args
            and set(learn_kwargs) <= {"start", "end"}
            and neighbor_fn in (neighbor_gauss, neighbor_lorentz)
            and not neighbor_args
            and set(neighbor_kwargs) <= {"start", "end", "rate"}
            and isinstance(nb_rate, str) and nb_rate in ("linear",
                                                         "geometric",
                                                         "harmonic")
            and nproj <= 8 and models.shape[1] <= 120
            and self.NNODE <= mega_max_nodes)
        if use_pallas is None:
            from ..ops import fused as _fz
            use_pallas = mega_ok and _fz.pallas_supported()
        elif use_pallas and not mega_ok:
            raise ValueError("use_pallas=True requires the default "
                             "free-scale error-free likelihood, named "
                             "learn/neighbor schedules, wt_thresh mode, "
                             "nproj <= 8, and <= {} nodes at {} filters "
                             "(VMEM-resident node buffers)".format(
                                 mega_max_nodes, models.shape[1]))
        if use_pallas:
            from ..ops.fused import pallas_supported

            # Pre-gather draws and bake cleaned-data semantics into iv.
            F = models.shape[1]
            x = models[draws].astype(np.float32)
            xe = models_err[draws].astype(np.float32)
            xm = models_mask[draws].astype(np.float32)
            ok = (np.isfinite(x) & np.isfinite(xe) & (xe > 0) & (xm == 1))
            iv = np.where(ok, 1.0 / np.where(ok, xe, 1.0) ** 2,
                          0.0).astype(np.float32)
            xc = np.where(ok, x, 0.0).astype(np.float32)
            group_w = 8
            while group_w < 128 and group_w < F:
                group_w *= 2
            groups = 128 // group_w
            chunk = mega_chunk
            N = self.NNODE
            Np = -(-N // 128) * 128
            frow = max(8, -(-F // 8) * 8)
            posT = np.zeros((8, Np), np.float32)
            posT[:nproj, :N] = pos.T
            static_kw = dict(
                nsteps_total=nsteps, nproj=nproj, nside=nside,
                wt_thresh=float(wt_thresh),
                dim_prior=bool(kw.get("dim_prior", True)),
                learn_name=_LEARN_NAMES[learn_fn],
                lstart=float(learn_kwargs.get("start", 0.5)),
                lend=float(learn_kwargs.get("end", 0.1)),
                neighbor_name=("gauss" if neighbor_fn is neighbor_gauss
                               else "lorentz"), nb_rate=nb_rate,
                nstart=float(neighbor_kwargs.get("start", 0.7)),
                nend=float(neighbor_kwargs.get("end", 0.02)),
                chunk=chunk, nfilt=F, n_true=N,
                interpret=not pallas_supported())

            def packed_slab(vals, s0, ns, nrows):
                slab = np.zeros((nrows * groups, group_w), np.float32)
                slab[:ns, :F] = vals[s0:s0 + ns]
                return slab.reshape(nrows, 128)

            nodes_cur = init
            for s0 in range(start, nsteps, seg):
                ns = min(seg, nsteps - s0)
                rows_needed = -(-ns // groups)
                nrows = -(-rows_needed // chunk) * chunk
                nodesT = np.zeros((frow, Np), np.float32)
                nodesT[:F, :N] = nodes_cur.T
                off = np.full((1, 128), float(s0), np.float32)
                out = _som_train_pallas(
                    jnp.asarray(nodesT),
                    jnp.asarray(packed_slab(xc, s0, ns, nrows)),
                    jnp.asarray(packed_slab(iv, s0, ns, nrows)),
                    jnp.asarray(packed_slab(
                        x.astype(np.float32), s0, ns, nrows)),
                    jnp.asarray(posT), jnp.asarray(off), nsteps=ns,
                    **static_kw)
                nodes_cur = np.asarray(jax.device_get(out),
                                       float)[:F, :N].T
                save_ckpt(nodes_cur, s0 + ns)
            self.nodes = nodes_cur
            train_note(verbose, "SOM training (mega-kernel)", nsteps, t0)
            return self

        nodes = jnp.asarray(init, jnp.float32)
        mods_j = jnp.asarray(models, jnp.float32)
        errs_j = jnp.asarray(models_err, jnp.float32)
        mask_j = jnp.asarray(models_mask, jnp.float32)
        pos_j = jnp.asarray(pos, jnp.float32)
        for s0 in range(start, nsteps, seg):
            ns = min(seg, nsteps - s0)
            nodes, _ = _som_train_jit(
                nodes, jnp.asarray(draws[s0:s0 + ns]),
                jnp.asarray(times[s0:s0 + ns], jnp.float32),
                mods_j, errs_j, mask_j, pos_j, lprob_spec=lprob_spec,
                learn_spec=learn_spec, neighbor_spec=neighbor_spec,
                wt_thresh=wt_thresh, cdf_thresh=cdf_thresh,
                track_scale=bool(track_scale), nside=nside)
            if checkpoint_every:
                save_ckpt(np.asarray(jax.device_get(nodes), float),
                          s0 + ns)
        self.nodes = np.asarray(jax.device_get(nodes), float)
        train_note(verbose, "SOM training", nsteps, t0)
        return self


@functools.partial(jax.jit, static_argnames=("lprob_spec", "track_scale",
                                             "nbatch", "max_age",
                                             "learn_best", "learn_neighbor",
                                             "new_err_dec", "all_err_dec"))
def _gng_train_jit(pos0, err0, alive0, state0, draws, mods, errs, mask, *,
                   lprob_spec, track_scale, nbatch, max_age, learn_best,
                   learn_neighbor, new_err_dec, all_err_dec):
    """Whole GNG training run as ONE `lax.scan` program (module-level:
    arrays enter as arguments, not baked closure constants).

    The full mutable state (node table, accumulated errors, alive mask,
    edge state) enters and leaves as arrays, so a run split into
    segment calls (train_network(checkpoint_every=...)) composes
    bitwise-identically to one call as long as segment boundaries align
    with `nbatch` blocks.

    Edge bookkeeping (the round-2 hot spot — a dense (N, N) age matrix
    cost ~25 MB of carry traffic per step at 2500 nodes) is a
    fixed-degree adjacency table with IMPLICIT aging:

    * ``ids`` (N, K): neighbor node ids per node (-1 = empty slot);
    * ``c`` (N,): per-node BMU-event counter;
    * ``sref`` (N, K): per-slot aging anchor.

    The reference ages ALL of the BMU's edges by one per step
    (symmetrically), so an edge's age is exactly (BMU events of i) +
    (BMU events of j) since its last reset.  A slot refresh stores
    ``sref = c[i]``; each BMU event of the NEIGHBOR decrements the slot's
    ``sref`` by one, giving

        age[i, slot] = c[i] - sref[i, slot]

    with both directions always in agreement.  Aging therefore costs one
    scalar counter bump plus one (N, K) compare-add pass per step
    (`ids == bmu`) instead of O(N^2) row/column traffic; ages
    materialize only in the per-block prune.  ``state0``/returned state
    pack (ids, sref, c, overflow) where `overflow` counts edge
    insertions dropped because a node already carried K live edges
    (K = 32; GNG degrees under max_age pruning are ~10)."""
    lprob_func, lprob_args, lp_kw = lprob_spec
    if lprob_func is None:
        lprob_func = _like.logprob
    lprob_kwargs = dict(lp_kw)
    N = pos0.shape[0]
    nsteps = draws.shape[0]
    # Inline the default free-scale error-free likelihood: the general
    # `logprob` machinery adds ~5x the per-step op count inside the
    # sequential scan (clean_data, result plumbing, dispatch), which
    # dominates at one draw per step.
    default_spec = (lprob_spec[0] is None and not lprob_spec[1]
                    and dict(lp_kw).get("free_scale") is True
                    and dict(lp_kw).get("ignore_model_err") is True
                    and set(dict(lp_kw)) <= {"free_scale",
                                             "ignore_model_err",
                                             "dim_prior"})
    dim_prior = dict(lp_kw).get("dim_prior", True)

    def _default_lnp_chi2(x, xe, xm, pos, alive):
        """(lnp-score, chi2) vs all nodes; score is lnl up to a per-step
        constant (the argmax/top-2 target; pdf.py:180-229)."""
        ok = (jnp.isfinite(x) & jnp.isfinite(xe) & (xe > 0.0)
              & (xm > 0.0))
        iv = jnp.where(ok, 1.0 / jnp.where(ok, xe, 1.0) ** 2, 0.0)
        xc = jnp.where(ok, x, 0.0)
        xiv = xc * iv
        inter = pos @ xiv
        shape = (pos * pos) @ iv
        A = jnp.sum(xc * xiv)
        chi2 = A - inter * (inter / jnp.maximum(shape, 1e-30))
        if dim_prior:
            ndim = jnp.sum(ok.astype(pos.dtype))
            a1 = 0.5 * (ndim - 1.0) - 1.0
            score = a1 * jnp.log(jnp.maximum(chi2, 1e-30)) - 0.5 * chi2
        else:
            score = -0.5 * chi2
        return jnp.where(alive, score, -jnp.inf), chi2

    K = state0[0].shape[1]

    def _upsert(ids, sref, ov, i, j, ci):
        """Create or refresh edge slot j in node i's row (age -> 0)."""
        # argmax/argmin indices are int64 under x64; keep the stored
        # values in the table dtypes (avoids unsafe-scatter promotion).
        j = jnp.asarray(j, ids.dtype)
        ci = jnp.asarray(ci, sref.dtype)
        row = ids[i]
        match = row == j
        has = jnp.any(match)
        occupied = row >= 0
        free = jnp.argmin(occupied)  # first empty slot
        slot = jnp.where(has, jnp.argmax(match), free)
        dropped = jnp.logical_and(~has, jnp.all(occupied))
        ids = ids.at[i, slot].set(jnp.where(dropped, row[slot], j))
        refresh = jnp.logical_or(has, ~dropped)
        sref = sref.at[i, slot].set(jnp.where(refresh, ci,
                                              sref[i, slot]))
        return ids, sref, ov + dropped.astype(jnp.int32)

    def _remove(ids, i, j):
        """Clear edge slot j in node i's row (no-op when absent)."""
        row = ids[i]
        match = row == j
        slot = jnp.argmax(match)
        return ids.at[i, slot].set(jnp.where(jnp.any(match), -1,
                                             row[slot]))

    def step(state, idx):
        pos, err, alive, (ids, sref, c, ov), nalive = state
        x, xe, xm = mods[idx], errs[idx], mask[idx]
        if default_spec and not track_scale:
            lnp, chi2 = _default_lnp_chi2(x, xe, xm, pos, alive)
        else:
            res = lprob_func(x[None], xe[None], xm[None], pos,
                             jnp.zeros_like(pos), jnp.ones_like(pos),
                             *lprob_args, **lprob_kwargs)
            lnp = jnp.where(alive, res[2][0], -jnp.inf)
            chi2 = res[4][0]
            if track_scale:
                pos = jnp.where(alive[:, None],
                                pos * res[5][0][:, None], pos)
        _, top2 = jax.lax.top_k(lnp, 2)
        bmu, bmu2 = top2[0], top2[1]

        # BMU update.
        resid = x - pos[bmu]
        pos = pos.at[bmu].add(learn_best * resid)
        err = err.at[bmu].add(chi2[bmu])

        # Rejuvenate/create the (bmu, bmu2) edge (age -> 0), both rows.
        ids, sref, ov = _upsert(ids, sref, ov, bmu, bmu2, c[bmu])
        ids, sref, ov = _upsert(ids, sref, ov, bmu2, bmu, c[bmu2])

        # Move the BMU's topological neighbors and age its edges.  The
        # reference resets (bmu, bmu2) to 0 and then ages ALL of bmu's
        # edges (networks.py:2186-2199), so (bmu, bmu2) ends the step at
        # age 1 — replicated by bumping the counters after the refresh.
        row = ids[bmu]
        valid_row = row >= 0
        nbr = jnp.zeros(N, bool).at[
            jnp.where(valid_row, row, N)].set(True, mode="drop")
        resid_n = x[None, :] - pos
        pos = pos + jnp.where(nbr[:, None], learn_neighbor * resid_n, 0.0)
        c = c.at[bmu].add(1)
        sref = jnp.where(ids == bmu, sref - 1, sref)
        return (pos, err, alive, (ids, sref, c, ov), nalive), ()

    def batch_update(args):
        pos, err, alive, (ids, sref, c, ov), nalive = args
        # Prune overage edges: materialize ages from the counters.
        age = c[:, None] - sref
        ids = jnp.where((ids >= 0) & (age >= max_age), -1, ids)
        deg = jnp.sum(ids >= 0, axis=1)
        alive = alive & (deg > 0)
        nalive = jnp.sum(alive)

        # Insert a node at the max-error node if room.
        def insert(args):
            pos, err, alive, (ids, sref, c, ov), nalive = args
            e1 = jnp.argmax(jnp.where(alive, err, -jnp.inf))
            row = ids[e1]
            nbr_err = jnp.where(row >= 0,
                                err[jnp.maximum(row, 0)], -jnp.inf)
            e2 = row[jnp.argmax(nbr_err)]
            free = jnp.argmin(alive)  # first dead slot
            err = err.at[e1].multiply(1.0 - new_err_dec)
            err = err.at[e2].multiply(1.0 - new_err_dec)
            pos = pos.at[free].set(0.5 * (pos[e1] + pos[e2]))
            err = err.at[free].set(err[e1])
            alive = alive.at[free].set(True)
            ids = _remove(ids, e1, e2)
            ids = _remove(ids, e2, e1)
            ids = ids.at[free].set(jnp.full(K, -1, ids.dtype))
            ids, sref, ov = _upsert(ids, sref, ov, free, e1, c[free])
            ids, sref, ov = _upsert(ids, sref, ov, free, e2, c[free])
            ids, sref, ov = _upsert(ids, sref, ov, e1, free, c[e1])
            ids, sref, ov = _upsert(ids, sref, ov, e2, free, c[e2])
            return (pos, err, alive, (ids, sref, c, ov), nalive + 1)

        return jax.lax.cond(nalive < N, insert, lambda a: a,
                            (pos, err, alive, (ids, sref, c, ov),
                             nalive))

    # Nested scan: the reference fires batch_update at every
    # i %% nbatch == 0 step (AFTER that step's BMU ops,
    # networks.py:2204-2243), i.e. once per block — running it
    # unconditionally per block avoids a per-step lax.cond whose
    # pass-through branch forces a full age-matrix copy every step
    # (~80 us/step of pure HBM traffic at max_nodes=2500).
    niter_blocks = nsteps // nbatch
    draws2 = draws[:niter_blocks * nbatch].reshape(niter_blocks, nbatch)

    def decay(state):
        pos, err, alive, edges, nalive = state
        return pos, err * (1.0 - all_err_dec), alive, edges, nalive

    def dstep(state, idx):
        state, _ = step(state, idx)
        return decay(state), ()

    def block(state, idx_row):
        # Reference per-step order (networks.py:2159-2258): BMU ops,
        # then prune+insert when i %% nbatch == 0, then error decay.
        state, _ = step(state, idx_row[0])
        state = decay(batch_update(state))
        if nbatch > 1:
            state, _ = jax.lax.scan(dstep, state, idx_row[1:])
        return state, ()

    carry0 = (pos0, err0, alive0, tuple(state0), jnp.sum(alive0))
    state, _ = jax.lax.scan(block, carry0, draws2)
    # Trailing steps when nsteps is not a block multiple (only possible
    # with hand-built draw arrays; train_network always passes
    # niter * nbatch).
    rem = nsteps - niter_blocks * nbatch
    if rem:
        state, _ = jax.lax.scan(dstep, state, draws[-rem:])
    return state


def _gng_seed_state(graph_init, max_nodes, nfilt, K=32):
    """Build the dense GNG state arrays from an initial graph.

    Reference parity: ``train_network(graph_init=...)`` continues
    training from an existing graph (networks.py:2132-2156).  Accepted
    forms (no hard networkx dependency):

    * a trained :class:`GrowingNeuralGas` (``nodes`` / ``nodes_err`` /
      ``edge_ages``, as produced by :meth:`export_graph`);
    * a dict with ``pos`` (n, Nfilt), optional ``err`` (n,), and either
      ``edge_ages`` (n, n; -1 = no edge) or ``edges`` [(i, j, age), ...];
    * a ``networkx.Graph`` with node attribute ``pos`` (required),
      ``error`` (default 0) and edge attribute ``age`` (default 0) —
      the reference's own format; nodes are relabelled to dense slots
      in iteration order exactly as the reference assigns ``count``
      labels (networks.py:2146-2148).

    Edge ages are RELATIVE in the adjacency table (age = c - sref, see
    `_gng_train_jit`), so seeding ``c = 0, sref = -age`` reproduces them
    exactly; continued training from a seeded state is equivalent to an
    uninterrupted run up to slot numbering.
    """
    if hasattr(graph_init, "edge_ages") and hasattr(graph_init, "nodes"):
        pos = np.asarray(graph_init.nodes, np.float32)
        err = np.asarray(getattr(graph_init, "nodes_err",
                                 np.zeros(len(pos))), np.float32)
        ages = np.asarray(graph_init.edge_ages)
        ii, jj = np.nonzero(ages >= 0)
        keep = ii < jj
        edges = list(zip(ii[keep].tolist(), jj[keep].tolist(),
                         ages[ii[keep], jj[keep]].tolist()))
    elif isinstance(graph_init, dict):
        pos = np.asarray(graph_init["pos"], np.float32)
        err = np.asarray(graph_init.get("err", np.zeros(len(pos))),
                         np.float32)
        if "edge_ages" in graph_init:
            ages = np.asarray(graph_init["edge_ages"])
            ii, jj = np.nonzero(ages >= 0)
            keep = ii < jj
            edges = list(zip(ii[keep].tolist(), jj[keep].tolist(),
                             ages[ii[keep], jj[keep]].tolist()))
        else:
            edges = [tuple(e) if len(e) == 3 else (e[0], e[1], 0)
                     for e in graph_init.get("edges", [])]
    elif hasattr(graph_init, "nodes") and hasattr(graph_init, "edges"):
        # networkx.Graph duck type (the reference's graph_init form).
        slot = {node: i for i, node in enumerate(graph_init.nodes())}
        pos_l, err_l = [], []
        for node in graph_init.nodes():
            attrs = graph_init.nodes[node]
            if "pos" not in attrs:
                raise ValueError(
                    f"graph_init node {node!r} lacks the 'pos' attribute")
            pos_l.append(np.asarray(attrs["pos"], np.float32))
            err_l.append(float(attrs.get("error", 0.0)))
        pos = np.stack(pos_l) if pos_l else np.zeros((0, nfilt), np.float32)
        err = np.asarray(err_l, np.float32)
        edges = [(slot[u], slot[v],
                  int(graph_init.edges[u, v].get("age", 0)))
                 for u, v in graph_init.edges()]
    else:
        raise TypeError(
            "graph_init must be a GrowingNeuralGas, a dict with "
            "pos/err/edge_ages (or edges), or a networkx.Graph with "
            "'pos'/'error'/'age' attributes; got "
            f"{type(graph_init).__name__}")

    n = len(pos)
    if n < 2:
        raise ValueError(f"graph_init needs at least 2 nodes, got {n}")
    if n > max_nodes:
        raise ValueError(f"graph_init has {n} nodes > max_nodes="
                         f"{max_nodes}")
    if pos.ndim != 2 or pos.shape[1] != nfilt:
        raise ValueError(f"graph_init node positions have shape "
                         f"{pos.shape}, expected (n, {nfilt})")

    pos0 = np.zeros((max_nodes, nfilt), np.float32)
    pos0[:n] = pos
    err0 = np.zeros(max_nodes, np.float32)
    err0[:n] = err
    alive0 = np.zeros(max_nodes, bool)
    alive0[:n] = True
    ids0 = np.full((max_nodes, K), -1, np.int32)
    sref0 = np.zeros((max_nodes, K), np.int32)
    c0 = np.zeros(max_nodes, np.int32)
    deg = np.zeros(max_nodes, np.int64)
    for i, j, age in edges:
        i, j, age = int(i), int(j), int(age)
        for a, b in ((i, j), (j, i)):
            if deg[a] >= K:
                raise ValueError(
                    f"graph_init node {a} has more than {K} edges; the "
                    "fixed-degree adjacency cannot hold it")
            ids0[a, deg[a]] = b
            sref0[a, deg[a]] = -age
            deg[a] += 1
    return pos0, err0, alive0, ids0, sref0, c0


def _make_gng_mega_kernel(*, chunk, nsteps, nbatch, max_age, learn_best,
                          learn_neighbor, new_err_dec, all_err_dec,
                          dim_prior, n, nfilt):
    """Whole-training-run GNG kernel body (cf. the SOM mega-kernel).

    All mutable state is VMEM-resident across sequential grid steps and
    LANE-ORIENTED (nodes on the 128-wide lane axis): node table `posT`
    (8, Np) [feature f in sublane f], packed per-node scalars `metaT`
    (8, Np) [sublane 0 err, 1 BMU counter c, 2 alive, metaT[3, 0] edge
    overflow], and the adjacency arrays `idsT`/`srefT` (K=32, Np) of
    `_gng_train_jit` (implicit counter-based aging) — everything f32
    (counts < 2^24 exact), Np = N rounded up to 128 lanes.

    Layout rationale (all measured on v5e at N=2500): a node-per-
    SUBLANE layout costs ~N/8 tile-ops for every per-node vector op
    ((N, 1) columns use 1 of 128 lanes -> ~13-24 us/step over the ~30
    sequential ops of a GNG step); lane orientation makes the same ops
    (1, Np) row passes (~Np/128 tiles) and fixed-depth sublane
    reductions, ~10x less.  The XLA scan path pays 25-70 us/step of op
    dispatch latency regardless — the measured 12-18 s round-2 floor.

    Draws stream in group-packed (chunk, 128) slabs (128 // group_w
    sequential draws per row, statically rolled into lanes
    [0, group_w)); per-filter scalars are lane-extracted and multiply
    static posT sublane rows, so there are no dynamic-lane accesses
    (unsupported) and no gathers (nonexistent) anywhere.  Index values
    live as (1, 1) pseudo-scalars.
    """
    neg = -3.0e38
    K = 32
    group_w = 8
    while group_w < 128 and group_w < nfilt:
        group_w *= 2
    groups = 128 // group_w

    def kernel(xc_ref, iv_ref, xraw_ref, pos0_ref, meta0_ref,
               ids0_ref, sref0_ref, pos_ref, meta_ref, ids_ref, sref_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            pos_ref[:, :] = pos0_ref[:, :]
            meta_ref[:, :] = meta0_ref[:, :]
            ids_ref[:, :] = ids0_ref[:, :]
            sref_ref[:, :] = sref0_ref[:, :]

        frow, npl = pos0_ref.shape  # (filter rows, lane-padded nodes)
        # Mosaic's iota is integer-only; the arithmetic below wants f32.
        ln = jax.lax.broadcasted_iota(jnp.int32,
                                      (1, npl), 1).astype(jnp.float32)
        sub8 = jax.lax.broadcasted_iota(jnp.int32,
                                        (8, 1), 0).astype(jnp.float32)
        subf = jax.lax.broadcasted_iota(jnp.int32,
                                        (frow, 1), 0).astype(jnp.float32)
        subk = jax.lax.broadcasted_iota(jnp.int32,
                                        (K, 1), 0).astype(jnp.float32)
        lid128 = jax.lax.broadcasted_iota(jnp.int32,
                                          (1, 128), 1).astype(jnp.float32)
        valid_lane = ln < float(n)
        big = jnp.float32(1e9)

        def min_index(mask):
            """(1, 1) lowest REAL node index where (1, Np) `mask` holds
            (lax.top_k's stable tie order); lane pads excluded."""
            return jnp.min(jnp.where(
                jnp.logical_and(mask, valid_lane), ln, big),
                keepdims=True)

        def pick(mask, x):
            """(1, 1) value of (1, Np) x at the single-True mask."""
            return jnp.sum(jnp.where(mask, x, 0.0), keepdims=True)

        def lane_extract(row, j):
            """(1, 1) lane j of a (1, 128) row (static j)."""
            return row[:, j:j + 1]

        def upsert(is_col, j11, ci11):
            """Create/refresh edge slot j in the masked column
            (age -> 0); returns the overflow increment as (1, 1)."""
            ids = ids_ref[:, :]
            match = jnp.logical_and(is_col, ids == j11)
            has = jnp.max(jnp.where(match, 1.0, 0.0), keepdims=True)
            free = jnp.min(jnp.where(
                jnp.logical_and(is_col, ids < 0.0), subk, big),
                keepdims=True)
            slot_m = jnp.min(jnp.where(match, subk, big), keepdims=True)
            slot = jnp.where(has > 0.0, slot_m, free)
            dropped = jnp.logical_and(has == 0.0, free >= big)
            sel = jnp.logical_and(jnp.logical_and(is_col, subk == slot),
                                  jnp.logical_not(dropped))
            ids_ref[:, :] = jnp.where(sel, j11, ids)
            sref_ref[:, :] = jnp.where(sel, ci11, sref_ref[:, :])
            return jnp.where(dropped, 1.0, 0.0)

        def batch_update():
            meta = meta_ref[:, :]
            c = meta[1:2, :]
            alive = meta[2:3, :] > 0.0
            ids = ids_ref[:, :]
            # Prune: materialize ages from the counters.
            age = c - sref_ref[:, :]
            ids = jnp.where(jnp.logical_and(ids >= 0.0,
                                            age >= float(max_age)),
                            -1.0, ids)
            ids_ref[:, :] = ids
            deg = jnp.sum((ids >= 0.0).astype(jnp.float32), axis=0,
                          keepdims=True)
            alive = jnp.logical_and(alive, deg > 0.0)
            meta_ref[:, :] = jnp.where(
                sub8 == 2.0, alive.astype(jnp.float32), meta)
            nalive = jnp.sum(alive.astype(jnp.float32))

            @pl.when(nalive < float(n))
            def _():
                meta = meta_ref[:, :]
                err = meta[0:1, :]
                c_row = meta[1:2, :]
                alive_c = meta[2:3, :] > 0.0
                # The equality tests are restricted to the same subset
                # the max ran over: an exact err tie on a dead (resp.
                # non-neighbor) lane must not steal the pick (scan path:
                # argmax over jnp.where(alive, err, -inf)).
                e1 = min_index(jnp.logical_and(alive_c, err == jnp.max(
                    jnp.where(alive_c, err, neg), keepdims=True)))
                nbr_e1 = jnp.any(ids_ref[:, :] == e1, axis=0,
                                 keepdims=True)
                e2 = min_index(jnp.logical_and(nbr_e1, err == jnp.max(
                    jnp.where(nbr_e1, err, neg), keepdims=True)))
                free = min_index(jnp.logical_not(alive_c))
                is_e1 = ln == e1
                is_e2 = ln == e2
                is_free = ln == free
                dec = 1.0 - new_err_dec
                err = jnp.where(jnp.logical_or(is_e1, is_e2), err * dec,
                                err)
                err = jnp.where(is_free, pick(is_e1, err), err)
                alive_f = jnp.where(is_free, 1.0,
                                    alive_c.astype(jnp.float32))
                # posT[:, free] = midpoint — lane reductions per row.
                pos = pos_ref[:, :]
                p_new = 0.5 * (
                    jnp.sum(jnp.where(is_e1, pos, 0.0), axis=1,
                            keepdims=True)
                    + jnp.sum(jnp.where(is_e2, pos, 0.0), axis=1,
                              keepdims=True))
                pos_ref[:, :] = jnp.where(is_free, p_new, pos)
                # Remove (e1, e2) both directions; blank the free col.
                ids = ids_ref[:, :]
                kill = jnp.logical_or(
                    jnp.logical_or(jnp.logical_and(is_e1, ids == e2),
                                   jnp.logical_and(is_e2, ids == e1)),
                    is_free)
                ids_ref[:, :] = jnp.where(kill, -1.0, ids)
                ov = upsert(is_free, e1, pick(is_free, c_row))
                ov = ov + upsert(is_free, e2, pick(is_free, c_row))
                ov = ov + upsert(is_e1, free, pick(is_e1, c_row))
                ov = ov + upsert(is_e2, free, pick(is_e2, c_row))
                meta2 = meta_ref[:, :]
                ov_cell = jnp.logical_and(sub8 == 3.0, ln == 0.0)
                meta_ref[:, :] = jnp.where(
                    sub8 == 0.0, err,
                    jnp.where(sub8 == 2.0, alive_f,
                              jnp.where(ov_cell, meta2 + ov, meta2)))

        def one_step(i, xcg, ivg, xrg):
            """One BMU step; the draw arrives as (1, 128) group rows
            with photometry in lanes [0, group_w)."""

            @pl.when(i < nsteps)
            def _():
                # Per-draw constants, on-chip: A = sum x^2 iv and the
                # chi2-prior exponent from Ndim (pdf.py:226-229).
                xivg = xcg * ivg
                A = jnp.sum(xcg * xivg, keepdims=True)
                ndim = jnp.sum((ivg > 0.0).astype(jnp.float32),
                               keepdims=True)
                a1 = 0.5 * (ndim - 1.0) - 1.0
                meta = meta_ref[:, :]
                c = meta[1:2, :]
                alive = meta[2:3, :] > 0.0
                pos = pos_ref[:, :]

                # Free-scale error-free score (pdf.py:180-194): filter
                # scalars multiply static posT sublane rows.
                inter = None
                shape = None
                xcol = None
                for f in range(nfilt):
                    xiv_f = lane_extract(xivg, f)
                    iv_f = lane_extract(ivg, f)
                    xr_f = lane_extract(xrg, f)
                    pf = pos[f:f + 1, :]
                    it = pf * xiv_f
                    sh = (pf * pf) * iv_f
                    inter = it if inter is None else inter + it
                    shape = sh if shape is None else shape + sh
                    xcontrib = jnp.where(subf == float(f), xr_f, 0.0)
                    xcol = xcontrib if xcol is None else xcol + xcontrib
                chi2 = A - inter * (inter / jnp.maximum(shape, 1e-30))
                if dim_prior:
                    score = (a1 * jnp.log(jnp.maximum(chi2, 1e-30))
                             - 0.5 * chi2)
                else:
                    score = -0.5 * chi2
                score = jnp.where(alive, score, neg)
                bmu = min_index(score == jnp.max(score, keepdims=True))
                is_bmu = ln == bmu
                score2 = jnp.where(is_bmu, neg, score)
                bmu2 = min_index(score2 == jnp.max(score2,
                                                   keepdims=True))
                is_bmu2 = ln == bmu2

                # Edge refresh BEFORE the counter bump, so (bmu, bmu2)
                # ends the step at age 1 (networks.py:2186-2199).
                ov = upsert(is_bmu, bmu2, pick(is_bmu, c))
                ov = ov + upsert(is_bmu2, bmu, pick(is_bmu2, c))

                # Symmetry makes the neighbor mask a sublane reduce:
                # node n is adjacent to bmu iff its own id slots
                # contain bmu.
                nbr = jnp.any(ids_ref[:, :] == bmu, axis=0,
                              keepdims=True)
                upd = (jnp.where(is_bmu, learn_best, 0.0)
                       + jnp.where(nbr, learn_neighbor, 0.0))
                pos_ref[:, :] = pos + upd * (xcol - pos)

                # Implicit aging: bump c[bmu]; neighbor anchors drop.
                sref = sref_ref[:, :]
                sref_ref[:, :] = jnp.where(ids_ref[:, :] == bmu,
                                           sref - 1.0, sref)
                err_new = meta[0:1, :] + jnp.where(
                    is_bmu, pick(is_bmu, chi2), 0.0)
                c_new = c + jnp.where(is_bmu, 1.0, 0.0)
                ov_cell = jnp.logical_and(sub8 == 3.0, ln == 0.0)
                meta_ref[:, :] = jnp.where(
                    sub8 == 0.0, err_new,
                    jnp.where(sub8 == 1.0, c_new,
                              jnp.where(ov_cell, meta + ov, meta)))

                @pl.when(i % nbatch == 0)
                def _():
                    batch_update()

                # Error decay, every step (networks.py:2256-2258).
                meta2 = meta_ref[:, :]
                meta_ref[:, :] = jnp.where(
                    sub8 == 0.0, meta2[0:1, :] * (1.0 - all_err_dec),
                    meta2)

        group_mask = lid128 < float(group_w)

        def row_step(r, _):
            """One slab row = `groups` packed sequential draws; each is
            statically rolled to lanes [0, group_w) and masked."""
            xc_row = xc_ref[pl.ds(r, 1), :]
            iv_row = iv_ref[pl.ds(r, 1), :]
            xr_row = xraw_ref[pl.ds(r, 1), :]
            for gsub in range(groups):
                # roll takes non-negative shifts; left-rotate by sh is
                # a right-rotate by 128 - sh.
                sh = (128 - gsub * group_w) % 128
                xc = jnp.where(group_mask, pltpu.roll(xc_row, sh, 1),
                               0.0)
                iv = jnp.where(group_mask, pltpu.roll(iv_row, sh, 1),
                               0.0)
                xr = jnp.where(group_mask, pltpu.roll(xr_row, sh, 1),
                               0.0)
                one_step((g * chunk + r) * groups + gsub, xc, iv, xr)
            return 0

        jax.lax.fori_loop(0, chunk, row_step, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk", "nsteps", "nbatch",
                                             "max_age", "learn_best",
                                             "learn_neighbor",
                                             "new_err_dec", "all_err_dec",
                                             "dim_prior", "nfilt",
                                             "n_true", "interpret"))
def _gng_train_pallas(xc, iv, xraw, pos0, meta0, ids0, sref0, *,
                      chunk, nsteps, nbatch, max_age, learn_best,
                      learn_neighbor, new_err_dec, all_err_dec, dim_prior,
                      nfilt, n_true, interpret):
    """Dispatch the GNG mega-kernel (see `_make_gng_mega_kernel`).

    State arrives LANE-ORIENTED: pos0/meta0 (8, Np), ids0/sref0
    (32, Np).  Slabs arrive GROUP-PACKED: each (chunk-multiple, 128)
    row holds 128 // group_w sequential draws in group_w-lane groups,
    so slab HBM traffic and host build time shrink ~16x (the end-to-end
    cost was upload-bound before).  `chunk` counts slab ROWS per grid
    step.
    """
    npad = xc.shape[0]
    assert npad % chunk == 0
    frow, np_l = pos0.shape
    kernel = _make_gng_mega_kernel(
        chunk=chunk, nsteps=nsteps, nbatch=nbatch, max_age=max_age,
        learn_best=learn_best, learn_neighbor=learn_neighbor,
        new_err_dec=new_err_dec, all_err_dec=all_err_dec,
        dim_prior=dim_prior, n=n_true, nfilt=nfilt)
    slab = pl.BlockSpec((chunk, 128), lambda g: (g, 0))
    pos_s = pl.BlockSpec((frow, np_l), lambda g: (0, 0))
    meta_s = pl.BlockSpec((8, np_l), lambda g: (0, 0))
    edge_s = pl.BlockSpec((32, np_l), lambda g: (0, 0))
    return pl.pallas_call(
        kernel,
        grid=(npad // chunk,),
        in_specs=[slab, slab, slab, pos_s, meta_s, edge_s, edge_s],
        out_specs=(pos_s, meta_s, edge_s, edge_s),
        out_shape=(jax.ShapeDtypeStruct((frow, np_l), jnp.float32),
                   jax.ShapeDtypeStruct((8, np_l), jnp.float32),
                   jax.ShapeDtypeStruct((32, np_l), jnp.float32),
                   jax.ShapeDtypeStruct((32, np_l), jnp.float32)),
        interpret=interpret,
    )(xc, iv, xraw, pos0, meta0, ids0, sref0)


class GrowingNeuralGas(_Network):
    """Growing Neural Gas trained on log-posterior BMU pairs.

    Reference: networks.py:1870-2260.  The dynamic `networkx.Graph`
    becomes fixed-capacity dense state inside one `lax.scan`:

    * node table (max_nodes, Nfilt) + per-node accumulated error + alive
      mask; dead slots are masked to -inf in the BMU search;
    * fixed-degree adjacency table (max_nodes, K=32) with implicit
      counter-based aging (see `_gng_train_jit`); the public
      ``edge_ages`` attribute materializes the symmetric age matrix
      over alive nodes after training;
    * per step (networks.py:2159-2258): BMU and runner-up by top-2
      lnprob; BMU moves by learn_best * resid and accumulates chi2[bmu];
      edge(bmu, bmu2) is created/rejuvenated; BMU's other neighbors move
      by learn_neighbor * resid and their edges age by 1;
    * every nbatch steps (including step 0, replicating the reference's
      `i % nbatch == 0`): edges that reached max_age are pruned, nodes
      left isolated die, and (below max_nodes) a node is inserted halfway
      between the max-error node and its max-error neighbor with the
      parents' errors decayed by (1 - new_err_dec);
    * all errors decay by (1 - all_err_dec) every step.
    """

    def train_network(self, models=None, models_err=None, models_mask=None,
                      niter=5000, nbatch=50, max_nodes=2500, max_age=15,
                      learn_best=0.2, learn_neighbor=0.005,
                      new_err_dec=0.5, all_err_dec=0.005, graph_init=None,
                      err_kernel=None, lprob_func=None, rng=None, seed=None,
                      lprob_args=None, lprob_kwargs=None, track_scale=False,
                      verbose=True, checkpoint_every=None,
                      checkpoint_file=None, resume=False, use_pallas=None):
        """Train the GNG (networks.py:1898-2035 defaults).  `graph_init`
        continues from an existing graph — a trained GNG /
        :meth:`export_graph` dict / networkx.Graph (networks.py:
        2140-2141); `checkpoint_every`/`resume` give mid-run durability;
        `use_pallas` selects the VMEM-resident mega-kernel (auto when
        eligible)."""
        if models is None:
            models = self._models_np
            models_err = self._models_err_np
            models_mask = self._models_mask_np
        models = np.asarray(models, float)
        models_err = np.asarray(models_err, float)
        models_mask = np.asarray(models_mask, float)
        if err_kernel is not None:
            models_err = np.sqrt(models_err**2 + np.asarray(err_kernel)**2)
        nmodel = len(models)
        self.NITER, self.NBATCH = niter, nbatch

        if lprob_func is None:
            lprob_func = _like.logprob
        lprob_args = lprob_args or ()
        if lprob_kwargs is None:
            lprob_kwargs = {"free_scale": True, "ignore_model_err": True}
            if track_scale:
                lprob_kwargs["return_scale"] = True

        rng = rng if rng is not None else np.random.default_rng(seed)
        nsteps = niter * nbatch
        t0 = time.time()
        draws = rng.integers(0, nmodel, size=nsteps)

        N = max_nodes
        K = 32  # max degree; GNG degrees under max_age pruning are ~10
        if graph_init is not None:
            # Continue from an existing graph (networks.py:2132-2156);
            # the 2-random-node draw is skipped, as in the reference.
            pos0, err0, alive0, ids0, sref0, c0 = _gng_seed_state(
                graph_init, N, models.shape[1], K)
        else:
            i1, i2 = rng.choice(nmodel, size=2, replace=False)
            pos0 = np.zeros((N, models.shape[1]), np.float32)
            pos0[0], pos0[1] = models[i1], models[i2]
            err0 = np.zeros(N, np.float32)
            alive0 = np.zeros(N, bool)
            alive0[:2] = True
            # Adjacency-table edge state (see _gng_train_jit): the
            # initial (0, 1) edge at age 0 is one slot in each row; all
            # counters 0.
            ids0 = np.full((N, K), -1, np.int32)
            ids0[0, 0], ids0[1, 0] = 1, 0
            sref0 = np.zeros((N, K), np.int32)
            c0 = np.zeros(N, np.int32)
        ov0 = np.int32(0)

        # Mid-run durability: run in nbatch-aligned segments (the insert/
        # prune block fires on each call's first step, so boundaries must
        # sit on block starts); the full edge state is carried and saved,
        # and `resume=True` (same seed => same regenerated draws)
        # continues bitwise-identically.
        from ..utils import checkpoint as _ckpt

        _ckpt.validate_plan(checkpoint_every, checkpoint_file)
        start = 0
        if resume:
            if not checkpoint_file:
                raise ValueError("resume=True requires checkpoint_file")
            if _ckpt.exists(checkpoint_file):
                st = _ckpt.restore(checkpoint_file)
                if int(st["nsteps_total"]) != nsteps:
                    raise ValueError("checkpoint was taken for a "
                                     f"{int(st['nsteps_total'])}-step run, "
                                     f"resuming one of {nsteps}")
                pos0 = np.asarray(st["pos"], np.float32)
                err0 = np.asarray(st["err"], np.float32)
                alive0 = np.asarray(st["alive"], bool)
                ids0 = np.asarray(st["ids"], np.int32)
                sref0 = np.asarray(st["sref"], np.int32)
                c0 = np.asarray(st["c"], np.int32)
                ov0 = np.int32(st["overflow"])
                start = int(st["steps_done"])
        if checkpoint_every:
            seg = max(int(nbatch), -(-int(checkpoint_every) // int(nbatch))
                      * int(nbatch))
        else:
            seg = nsteps

        lprob_spec = _like.static_spec(lprob_func, lprob_args, lprob_kwargs)
        # Mega-kernel eligibility mirrors the SOM kernel: the default
        # free-scale error-free likelihood with named knobs, no scale
        # tracking, and state that fits VMEM.  The node cap scales with
        # the filter-row count frow (posT in/out blocks are (frow, Np);
        # idsT/srefT contribute 2*64 rows): per lane ~ 3*frow + 200 f32
        # rows, calibrated so the F<=8 point keeps its 16384-node cap
        # under Mosaic's conservatively accounted 16 MB scoped limit.
        kwd = dict(lprob_spec[2])
        frow_gng = max(8, -(-models.shape[1] // 8) * 8)
        gng_max_nodes = min(16384,
                            (224 * 4 * 16384) // (4 * (3 * frow_gng + 200))
                            // 128 * 128)
        mega_ok = (lprob_spec[0] is None and not lprob_spec[1]
                   and kwd.get("free_scale") is True
                   and kwd.get("ignore_model_err") is True
                   and set(kwd) <= {"free_scale", "ignore_model_err",
                                    "dim_prior"}
                   and not track_scale and N <= gng_max_nodes
                   and models.shape[1] <= 120)
        if use_pallas is None:
            from ..ops import fused as _fz
            use_pallas = mega_ok and _fz.pallas_supported()
        elif use_pallas and not mega_ok:
            raise ValueError("use_pallas=True requires the default "
                             "free-scale error-free likelihood, "
                             "track_scale=False, and max_nodes <= {} at "
                             "{} filters (VMEM-resident state)".format(
                                 gng_max_nodes, models.shape[1]))

        if use_pallas:
            from ..ops.fused import pallas_supported

            # Pre-clean draws (pdf.py:310-311 semantics baked into iv).
            F = models.shape[1]
            x = models[draws].astype(np.float32)
            xe = models_err[draws].astype(np.float32)
            xm = models_mask[draws].astype(np.float32)
            okb = (np.isfinite(x) & np.isfinite(xe) & (xe > 0)
                   & (xm == 1))
            iv = np.where(okb, 1.0 / np.where(okb, xe, 1.0) ** 2,
                          0.0).astype(np.float32)
            xc = np.where(okb, x, 0.0).astype(np.float32)
            group_w = 8
            while group_w < 128 and group_w < F:
                group_w *= 2
            groups = 128 // group_w
            chunk = 64  # slab rows per grid step (= 1024 draws at F<=8)
            state = dict(
                pos=pos0.astype(np.float32), err=err0, alive=alive0,
                ids=ids0, sref=sref0, c=c0, overflow=ov0)

            Np = -(-N // 128) * 128
            frow = max(8, -(-F // 8) * 8)

            def pack(st):
                posT = np.zeros((frow, Np), np.float32)
                posT[:F, :N] = st["pos"].T
                metaT = np.zeros((8, Np), np.float32)
                metaT[0, :N] = st["err"]
                metaT[1, :N] = st["c"]
                metaT[2, :N] = st["alive"].astype(np.float32)
                metaT[3, 0] = float(st["overflow"])
                idsT = np.full((32, Np), -1.0, np.float32)
                idsT[:, :N] = st["ids"].T
                srefT = np.zeros((32, Np), np.float32)
                srefT[:, :N] = st["sref"].T
                return posT, metaT, idsT, srefT

            def unpack(posT, metaT, idsT, srefT):
                return dict(
                    pos=posT[:F, :N].T, err=metaT[0, :N],
                    c=metaT[1, :N], alive=metaT[2, :N] > 0.5,
                    overflow=np.int32(round(float(metaT[3, 0]))),
                    ids=np.rint(idsT[:, :N].T).astype(np.int32),
                    sref=np.rint(srefT[:, :N].T).astype(np.int32))

            def packed_slab(vals, s0, ns, nrows):
                slab = np.zeros((nrows * groups, group_w), np.float32)
                slab[:ns, :F] = vals[s0:s0 + ns]
                return slab.reshape(nrows, 128)

            for s0 in range(start, nsteps, seg):
                ns = min(seg, nsteps - s0)
                rows_needed = -(-ns // groups)
                nrows = -(-rows_needed // chunk) * chunk
                out = _gng_train_pallas(
                    *(jnp.asarray(a) for a in
                      (packed_slab(xc, s0, ns, nrows),
                       packed_slab(iv, s0, ns, nrows),
                       packed_slab(x.astype(np.float32), s0, ns, nrows))
                      + pack(state)),
                    chunk=chunk, nsteps=ns, nbatch=int(nbatch),
                    max_age=int(max_age), learn_best=float(learn_best),
                    learn_neighbor=float(learn_neighbor),
                    new_err_dec=float(new_err_dec),
                    all_err_dec=float(all_err_dec),
                    dim_prior=bool(kwd.get("dim_prior", True)),
                    nfilt=F, n_true=N,
                    interpret=not pallas_supported())
                state = unpack(*(np.asarray(a)
                                 for a in jax.device_get(out)))
                if checkpoint_every:
                    _ckpt.save(checkpoint_file, dict(
                        state, overflow=int(state["overflow"]),
                        steps_done=int(s0 + ns),
                        nsteps_total=int(nsteps)))
            pos, err, alive = state["pos"], state["err"], state["alive"]
            ids, sref, c = state["ids"], state["sref"], state["c"]
            ov = state["overflow"]
        else:
            state = (jnp.asarray(pos0), jnp.asarray(err0),
                     jnp.asarray(alive0),
                     (jnp.asarray(ids0), jnp.asarray(sref0),
                      jnp.asarray(c0), jnp.asarray(ov0)))
            mods_j = jnp.asarray(models, jnp.float32)
            errs_j = jnp.asarray(models_err, jnp.float32)
            mask_j = jnp.asarray(models_mask, jnp.float32)
            for s0 in range(start, nsteps, seg):
                ns = min(seg, nsteps - s0)
                pos, err, alive, edges, nalive = _gng_train_jit(
                    *state, jnp.asarray(draws[s0:s0 + ns]), mods_j,
                    errs_j, mask_j, lprob_spec=lprob_spec,
                    track_scale=bool(track_scale), nbatch=int(nbatch),
                    max_age=int(max_age), learn_best=float(learn_best),
                    learn_neighbor=float(learn_neighbor),
                    new_err_dec=float(new_err_dec),
                    all_err_dec=float(all_err_dec))
                state = (pos, err, alive, edges)
                if checkpoint_every:
                    ids, sref, c, ov = edges
                    _ckpt.save(checkpoint_file, {
                        "pos": np.asarray(pos), "err": np.asarray(err),
                        "alive": np.asarray(alive),
                        "ids": np.asarray(ids),
                        "sref": np.asarray(sref),
                        "c": np.asarray(c), "overflow": int(ov),
                        "steps_done": int(s0 + ns),
                        "nsteps_total": int(nsteps)})
            pos, err, alive, (ids, sref, c, ov) = state
        alive_np = np.asarray(alive)
        sel = np.flatnonzero(alive_np)
        self.nodes = np.asarray(pos)[sel].astype(float)
        self.nodes_err = np.asarray(err)[sel].astype(float)
        # Rebuild the dense symmetric edge-age matrix for the public
        # `edge_ages` attribute from the adjacency table + counters.
        ids_np, sref_np, c_np = (np.asarray(x) for x in (ids, sref, c))
        age_np = c_np[:, None] - sref_np
        full_ages = np.full((N, N), -1, np.int32)
        rows = np.repeat(np.arange(N), ids_np.shape[1])
        cols = ids_np.ravel()
        vmask = cols >= 0
        full_ages[rows[vmask], cols[vmask]] = age_np.ravel()[vmask]
        self.edge_overflow = int(ov)
        self.edge_ages = full_ages[np.ix_(sel, sel)]
        self.NNODE = len(sel)
        self.NPROJ = self.nodes.shape[1]
        # GNG has no lattice projection; expose node positions in data
        # space for plotting (first two feature dims).
        self.nodes_pos = self.nodes[:, :2] if self.nodes.shape[1] >= 2 \
            else self.nodes
        train_note(verbose, "GNG training", nsteps, t0)
        return self

    def edges(self):
        """(Nedge, 2) array of alive-node edge index pairs (i < j)."""
        ii, jj = np.nonzero(self.edge_ages >= 0)
        keep = ii < jj
        return np.stack([ii[keep], jj[keep]], axis=1)

    def export_graph(self):
        """Trained graph as a ``graph_init``-ready dict.

        The reference continues training by passing a previous run's
        ``self.graph`` back in (networks.py:2140-2141); here the
        equivalent round-trip is ``train_network(graph_init=
        gng.export_graph())`` (a trained GNG instance itself is also
        accepted).  Ages are absolute, so reseeding reproduces the
        pruning schedule exactly.
        """
        return {"pos": np.asarray(self.nodes, np.float32),
                "err": np.asarray(self.nodes_err, np.float32),
                "edge_ages": np.asarray(self.edge_ages)}
