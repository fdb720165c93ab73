"""
Device-mesh construction and sharded execution of the fit pipelines.

The reference has no distributed backend at all (SURVEY.md section 5): its
longest computations run single-threaded.  The TPU-native scaling story is
pure data parallelism over *objects* — each object's posterior and PDF is
independent, so the natural layout is a 1-D mesh with objects sharded and
the model set + kernel matrix replicated in every chip's HBM (100K models
x 30 filters is ~12 MB; replication is free at that scale).  Zero
cross-chip communication in the fit path; collectives appear only in
final reductions (stacked N(z) sums, population-sampler overlaps), which
ride ICI as single `psum`s.

For model sets too large to replicate (>>10M models), `shard_models=True`
shards the model axis as well and log-space reductions (`logsumexp` over
the model axis) become `psum`-style collectives over the model axis — the
blockwise-streaming analogue of ring attention (SURVEY.md section 5,
"long-context").
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "make_mesh_2d", "shard_objects",
           "shard_models", "replicate", "sharded_logprob",
           "sharded_fit_predict_step",
           "model_sharded_fit_predict_step",
           "ring_fit_predict_step", "stacked_nz"]

OBJ_AXIS = "objects"
MODEL_AXIS = "models"


def make_mesh(n_devices=None, devices=None):
    """1-D mesh over `objects` using the first `n_devices` devices.

    Raises ValueError (not an opaque reshape crash) when fewer devices
    exist than requested — e.g. when the caller assumed a virtual CPU
    mesh but JAX initialized on a 1-chip TPU backend.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"make_mesh: requested {n_devices} devices but only "
                f"{len(devices)} available on platform "
                f"'{devices[0].platform}'. For a virtual multi-device CPU "
                f"mesh, force the cpu platform and set XLA_FLAGS="
                f"--xla_force_host_platform_device_count={n_devices} "
                f"before JAX initializes.")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (OBJ_AXIS,))


def make_mesh_2d(n_obj, n_model, devices=None):
    """2-D (objects, models) mesh for sharded-model-set operation."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < n_obj * n_model:
        raise ValueError(
            f"make_mesh_2d: requested {n_obj}x{n_model}="
            f"{n_obj * n_model} devices but only {len(devices)} available "
            f"on platform '{devices[0].platform}'. For a virtual "
            f"multi-device CPU mesh, force the cpu platform and set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count="
            f"{n_obj * n_model} before JAX initializes.")
    devs = np.asarray(devices[:n_obj * n_model]).reshape(n_obj, n_model)
    return Mesh(devs, (OBJ_AXIS, MODEL_AXIS))


def shard_objects(mesh, *arrays):
    """Place arrays with their leading (object) axis sharded over the mesh."""
    spec = NamedSharding(mesh, P(OBJ_AXIS))
    out = tuple(jax.device_put(jnp.asarray(a), spec) for a in arrays)
    return out[0] if len(out) == 1 else out


def replicate(mesh, *arrays):
    """Place arrays fully replicated over the mesh."""
    spec = NamedSharding(mesh, P())
    out = tuple(jax.device_put(jnp.asarray(a), spec) for a in arrays)
    return out[0] if len(out) == 1 else out


def sharded_logprob(mesh, lprob_func=None):
    """Build a jitted, object-sharded batched lprob evaluator.

    Returns ``f(data, data_err, data_mask, models, models_err,
    models_mask) -> LogprobResult`` with (Nobj, ...) inputs sharded over
    the object axis and models replicated.  With objects sharded and no
    cross-object dependency, XLA partitions this without any collectives.
    """
    from ..ops import likelihood as _like

    if lprob_func is None:
        lprob_func = _like.logprob
    data_spec = NamedSharding(mesh, P(OBJ_AXIS))
    model_spec = NamedSharding(mesh, P())

    @jax.jit
    def f(d, de, dm, m, me, mm):
        d, de, dm = (jax.lax.with_sharding_constraint(x, data_spec)
                     for x in (d, de, dm))
        m, me, mm = (jax.lax.with_sharding_constraint(x, model_spec)
                     for x in (m, me, mm))
        return lprob_func(d, de, dm, m, me, mm)

    return f


def sharded_fit_predict_step(mesh, lprob_func=None, wt_thresh=1e-3,
                             cdf_thresh=2e-4):
    """Build the jitted object-sharded fused fit->PDF step.

    ``f(data, data_err, data_mask, models, models_err, models_mask, G)
    -> (pdfs, lmap, levid)`` — data sharded over objects, model set and
    kernel matrix replicated.  The per-shard compute is identical to the
    single-chip fused step in `models/bruteforce.py`; XLA's SPMD
    partitioner emits no collectives because every reduction is over the
    (replicated) model axis.
    """
    from ..ops import kde as _kde
    from ..ops import likelihood as _like

    if lprob_func is None:
        lprob_func = _like.logprob
    data_spec = NamedSharding(mesh, P(OBJ_AXIS))
    rep_spec = NamedSharding(mesh, P())

    @jax.jit
    def f(d, de, dm, m, me, mm, G):
        d, de, dm = (jax.lax.with_sharding_constraint(x, data_spec)
                     for x in (d, de, dm))
        m, me, mm, G = (jax.lax.with_sharding_constraint(x, rep_spec)
                        for x in (m, me, mm, G))
        res = lprob_func(d, de, dm, m, me, mm)
        lnprob = res[2]
        lmap = jnp.max(lnprob, axis=1)
        levid = jax.scipy.special.logsumexp(lnprob, axis=1)
        wt = jnp.exp(lnprob - levid[:, None])
        pdf = _kde.kde_stack(wt, G, wt_thresh, cdf_thresh)
        return _kde.norm_rows(pdf), lmap, levid

    return f


def model_sharded_fit_predict_step(mesh, wt_thresh=1e-3, dim_prior=True,
                                   ignore_model_err=False):
    """Fused fit->PDF step with BOTH objects and models sharded (2-D mesh).

    For model sets too large to replicate in one chip's HBM (>>10M
    models), the model axis shards over `MODEL_AXIS` and the blockwise
    pattern of ring attention applies to chi^2/logsumexp instead of
    softmax*V (SURVEY.md section 5, "long-context analogue"):

      * each chip computes its local (B_shard, M_shard) log-posterior
        block against its resident model shard;
      * the exact global lmap/levid come from a `psum`-style max / log-
        sum-exp over the model axis (one collective each);
      * each chip contracts its thresholded local weights with its LOCAL
        kernel-matrix shard and a final `psum` over the model axis sums
        the partial PDFs.

    Built with `jax.shard_map`; data enters sharded (objects on
    OBJ_AXIS, models/G on MODEL_AXIS).
    """
    from ..ops import kde as _kde
    from ..ops import likelihood as _like

    def local_step(d, de, dm, m, me, mm, G):
        res = _like.logprob(d, de, dm, m, me, mm, dim_prior=dim_prior,
                            ignore_model_err=ignore_model_err)
        lnp = res.lnprob
        # Global GOF metrics over the sharded model axis.
        lmap = jax.lax.pmax(jnp.max(lnp, axis=1), MODEL_AXIS)
        local_sum = jnp.sum(jnp.exp(lnp - lmap[:, None]), axis=1)
        levid = jnp.log(jax.lax.psum(local_sum, MODEL_AXIS)) + lmap
        wt = jnp.exp(lnp - levid[:, None])
        if wt_thresh is not None:
            keep = lnp > jnp.log(wt_thresh) + lmap[:, None]
            wt = jnp.where(keep, wt, 0.0)
        # HIGHEST precision: see ops/kde.py `_matmul` (PDF contract).
        pdf = jax.lax.psum(
            jnp.dot(wt, G, precision=_kde.STACK_PRECISION),
            MODEL_AXIS)
        return _kde.norm_rows(pdf), lmap, levid

    data_spec = P(OBJ_AXIS, None)
    model_spec = P(MODEL_AXIS, None)
    return jax.jit(jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(data_spec, data_spec, data_spec, model_spec, model_spec,
                  model_spec, model_spec),
        out_specs=(P(OBJ_AXIS, None), P(OBJ_AXIS), P(OBJ_AXIS))))


def ring_fit_predict_step(mesh, wt_thresh=1e-3, dim_prior=True,
                          ignore_model_err=False):
    """Ring-rotation fused fit->PDF step on a 1-D mesh: objects AND
    models both sharded over the same axis, with model shards rotating
    around the ICI ring via `ppermute`.

    This is the full ring-attention analogue from SURVEY.md section 5
    ("long-context"): the 2-D mesh path
    (`model_sharded_fit_predict_step`) must replicate each object shard
    across the model axis, so an (n_obj x n_model) mesh holds only
    n_obj object shards; here ALL n chips hold distinct object shards
    AND distinct model shards — n x more objects and models resident per
    pass — and each chip sees every model shard after n rotation steps.
    Per step the (B_loc, M_loc) block is computed locally and folded
    into online accumulators, exactly like the blockwise softmax of
    ring attention applied to chi^2/logsumexp instead of softmax*V:

      * pass A rotates model shards n times, carrying a running max and
        rescaled sum-exp per object => exact lmap, levid;
      * pass B rotates again, stacking exactly-thresholded weights
        against the co-rotating kernel-matrix shard on the MXU.

    With ``wt_thresh=None`` a single rotation suffices (flash-style
    rescaled PDF accumulator — no threshold to anchor against the final
    max).  Shard shapes must divide evenly; returned lmap/levid/pdfs are
    sharded over objects.  Each `ppermute` is a neighbor-to-neighbor ICI
    transfer, so the rotation pipeline never funnels the model set
    through a single all-gather.

    Reference N/A (single-threaded NumPy); semantics match
    `bruteforce.py:359-360` weights + `pdf.py:508-516` thresholding.
    """
    from ..ops import kde as _kde
    from ..ops import likelihood as _like

    n = int(np.prod(mesh.devices.shape))
    perm = [(i, (i + 1) % n) for i in range(n)]

    def local_step(d, de, dm, m, me, mm, G):
        def lnp_of(m, me, mm):
            res = _like.logprob(d, de, dm, m, me, mm, dim_prior=dim_prior,
                                ignore_model_err=ignore_model_err)
            return res.lnprob

        def rotate(*arrays):
            return tuple(jax.lax.ppermute(a, OBJ_AXIS, perm)
                         for a in arrays)

        B = d.shape[0]
        dt = jnp.result_type(d.dtype, de.dtype, m.dtype, jnp.float32)
        pdt = jnp.result_type(dt, G.dtype)
        neg_inf = jnp.asarray(np.finfo(np.float32).min, dt)

        def vary(x):
            # scan carries must enter with the same varying-over-mesh-axis
            # type their outputs have inside shard_map.  pvary was renamed
            # to pcast(..., to='varying') in newer JAX.
            if hasattr(jax.lax, "pcast"):
                return jax.lax.pcast(x, (OBJ_AXIS,), to="varying")
            return jax.lax.pvary(x, (OBJ_AXIS,))

        if wt_thresh is None:
            # One rotation: flash-style rescaled PDF accumulator.
            def step(carry, _):
                m, me, mm, G, rm, s, pdf = carry
                lnp = lnp_of(m, me, mm)
                t_max = jnp.max(lnp, axis=1)
                new_m = jnp.maximum(rm, t_max)
                alpha = jnp.exp(rm - new_m)
                w = jnp.exp(lnp - new_m[:, None])
                s = s * alpha + jnp.sum(w, axis=1)
                pdf = pdf * alpha[:, None] + jnp.dot(
                    w, G, precision=_kde.STACK_PRECISION)
                m, me, mm, G = rotate(m, me, mm, G)
                return (m, me, mm, G, new_m, s, pdf), ()

            rm0 = vary(jnp.full((B,), neg_inf, dt))
            s0 = vary(jnp.zeros((B,), dt))
            pdf0 = vary(jnp.zeros((B, G.shape[1]), pdt))
            (m, me, mm, G, rm, s, pdf), _ = jax.lax.scan(
                step, (m, me, mm, G, rm0, s0, pdf0), None, length=n)
            levid = jnp.log(jnp.maximum(s, jnp.finfo(s.dtype).tiny)) + rm
            pdf = pdf * jnp.exp(rm - levid)[:, None]
            lmap = rm
        else:
            # Pass A: exact lmap/levid via online max + rescaled sum-exp.
            def step_a(carry, _):
                m, me, mm, rm, s = carry
                lnp = lnp_of(m, me, mm)
                t_max = jnp.max(lnp, axis=1)
                new_m = jnp.maximum(rm, t_max)
                s = (s * jnp.exp(rm - new_m)
                     + jnp.sum(jnp.exp(lnp - new_m[:, None]), axis=1))
                m, me, mm = rotate(m, me, mm)
                return (m, me, mm, new_m, s), ()

            rm0 = vary(jnp.full((B,), neg_inf, dt))
            s0 = vary(jnp.zeros((B,), dt))
            (m, me, mm, lmap, s), _ = jax.lax.scan(
                step_a, (m, me, mm, rm0, s0), None, length=n)
            levid = jnp.log(jnp.maximum(s, jnp.finfo(s.dtype).tiny)) + lmap

            # Pass B: exact reference threshold against the final lmap.
            log_thr = jnp.log(wt_thresh)

            def step_b(carry, _):
                m, me, mm, G, pdf = carry
                lnp = lnp_of(m, me, mm)
                w = jnp.exp(lnp - levid[:, None])
                w = jnp.where(lnp > log_thr + lmap[:, None], w, 0.0)
                pdf = pdf + jnp.dot(w, G,
                                    precision=_kde.STACK_PRECISION)
                m, me, mm, G = rotate(m, me, mm, G)
                return (m, me, mm, G, pdf), ()

            pdf0 = vary(jnp.zeros((B, G.shape[1]), pdt))
            (m, me, mm, G, pdf), _ = jax.lax.scan(
                step_b, (m, me, mm, G, pdf0), None, length=n)

        # The online max was seeded with finfo.min (a finite sentinel, to
        # avoid -inf minus -inf NaNs in the rescales).  Objects with no
        # finite pair likelihood (fully masked) still carry it here —
        # convert back to the -inf the materializing/sharded paths return.
        dead = s <= 0
        lmap = jnp.where(dead, -jnp.inf, lmap)
        levid = jnp.where(dead, -jnp.inf, levid)
        return _kde.norm_rows(pdf), lmap, levid

    data_spec = P(OBJ_AXIS, None)
    return jax.jit(jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(data_spec, data_spec, data_spec, data_spec, data_spec,
                  data_spec, data_spec),
        out_specs=(P(OBJ_AXIS, None), P(OBJ_AXIS), P(OBJ_AXIS))))


def shard_models(mesh, *arrays):
    """Place arrays with their leading (model) axis sharded over the
    2-D mesh's model axis (replicated over the object axis)."""
    spec = NamedSharding(mesh, P(MODEL_AXIS))
    out = tuple(jax.device_put(jnp.asarray(a), spec) for a in arrays)
    return out[0] if len(out) == 1 else out


def stacked_nz(mesh, pdfs):
    """Stacked N(z) over all objects — the one cross-chip reduction.

    Sums per-object PDFs over the sharded object axis; XLA lowers the
    reduction to a single `psum` over ICI.
    """
    spec = NamedSharding(mesh, P(OBJ_AXIS))

    @jax.jit
    def f(p):
        p = jax.lax.with_sharding_constraint(p, spec)
        return jnp.sum(p, axis=0)

    return f(pdfs)
