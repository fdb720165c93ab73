"""
Population N(z) sampler: MH-in-Gibbs over the simplex of bin heights.

Reference: `frankenz/samplers.py:24-308` (`loglike_nz`, class
`population_sampler`).  Model: given per-object redshift PDFs p_g on a
common grid, the population distribution rho maximizes
``sum_g ln(p_g . rho)``.  Proposals move along random (+1, -1) pair basis
vectors of the simplex with a step scale set by a numerical gradient, and
are accepted via ``-Exponential() < delta ln(post)``
(samplers.py:290-305).

TPU redesign: the entire (Niter x thin x mh_steps) chain runs as ONE
jitted `lax.scan` on device — the overlap vector (Nobs,) is carried and
rank-1-updated per proposal (``overlap + z * (pdfs[:,i] - pdfs[:,j])``,
samplers.py:70-75), so each proposal costs O(Nobs), and `nchains`
independent chains run vmapped in parallel (the reference is
single-chain).  PRNG is JAX counter-based; draws are
distribution-equivalent, not stream-equal, to the reference.

`logprior_nz`, if given, must be jit-traceable: ``logprior_nz(pos) ->
scalar``.
"""

from __future__ import annotations

import functools

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.progress import train_note
from .base import ChainSampler

__all__ = ["loglike_nz", "population_sampler"]


def loglike_nz(nz, pdfs, overlap=None, return_overlap=False, pair=None,
               pair_step=None):
    """Log-likelihood of a population distribution given per-object PDFs.

    Drop-in for samplers.py:24-80 including the rank-1 pair perturbation
    and the -inf guard for invalid (negative / non-finite) positions.
    """
    nz = jnp.asarray(nz)
    pdfs = jnp.asarray(pdfs)
    bad = jnp.any(~jnp.isfinite(nz) | (nz < 0.0))
    if overlap is None:
        overlap = pdfs @ nz
    perturb = 0.0
    if pair is not None and pair_step is not None:
        i, j = pair
        perturb = pair_step * (pdfs[:, i] - pdfs[:, j])
    ov = overlap + perturb
    lnlike = jnp.where(bad, -jnp.inf, jnp.sum(jnp.log(ov)))
    ov = jnp.where(bad, 0.0, ov)
    if return_overlap:
        return lnlike, ov
    return lnlike


def _zero_prior(pos, *args, **kwargs):
    """Default flat prior (module-level so jit caching keys stably)."""
    return 0.0


def _log1p_f32(x):
    """f32-accurate log1p from Mosaic-safe primitives (log/mul/where):
    3-term series for |x| < 1e-3 (truncation < |x|^3/4 relative), plain
    log(1 + x) above (cancellation <= eps/|x| <= 6e-5 relative)."""
    small = jnp.abs(x) < 1e-3
    series = x * (1.0 - x * (0.5 - x * (1.0 / 3.0)))
    return jnp.where(small, series, jnp.log(1.0 + jnp.where(small, 0.0, x)))


def _pair_dlnl_terms(ov, half):
    """Elementwise ln(ov + half) - ln(ov - half), cancellation-free.

    The numeric gradient (samplers.py:272-287) is the difference of two
    overlap log-sums; computed as two separate f32 sums it cancels to
    ~eps * sum|ln ov| of noise — at the reference's scale = 1e-4 *
    min(pos) step that noise was tens of percent of the true value, and
    the proposal scale gscale = |1/grad| inherited it (the f64 reference
    computes the same subtraction losslessly).  Taking the log of the
    per-element RATIO instead keeps every term at machine precision:
    ln((ov+h)/(ov-h)) = log1p(2h / (ov-h)).  Degenerate terms
    (|half| >= ov, where the old form hit its 1e-30 clamps) keep the
    clamped-subtraction semantics exactly.
    """
    num = ov + half
    den = ov - half
    ok = ov - jnp.abs(half) > 1e-25
    fast = _log1p_f32((2.0 * half) / jnp.where(ok, den, 1.0))
    slow = (jnp.log(jnp.maximum(num, 1e-30))
            - jnp.log(jnp.maximum(den, 1e-30)))
    return jnp.where(ok, fast, slow)


class _BoundPrior:
    """Hashable binding of (prior_func, args, kwargs) so `_pop_run`'s jit
    cache keys on the *contents* rather than a per-call closure identity —
    two run_mcmc calls with the same bound prior compile once.

    `prior_args` / `prior_kwargs` values must be hashable (they are static
    under jit); arrays should be closed over inside `logprior_nz` itself.
    """

    __slots__ = ("func", "args", "kw_items")

    def __init__(self, func, args, kwargs):
        self.func = func
        self.args = tuple(args)
        self.kw_items = tuple(sorted(kwargs.items()))

    def __call__(self, pos):
        return self.func(pos, *self.args, **dict(self.kw_items))

    def __hash__(self):
        return hash((self.func, self.args, self.kw_items))

    def __eq__(self, other):
        return (isinstance(other, _BoundPrior)
                and self.func is other.func and self.args == other.args
                and self.kw_items == other.kw_items)


@functools.partial(jax.jit, static_argnames=("prior", "thin", "mh_steps",
                                             "axis_name"))
def _pop_run(keys, pos0, pdfs, carry0=None, *, prior, thin, mh_steps,
             axis_name=None):
    """All chains x all samples in one compiled program, cached globally
    across run_mcmc calls by the static (prior, thin, mh_steps) key.

    keys: (nchains, Niter) PRNG keys; pos0: (nchains, Nbins).  With
    `axis_name` (inside shard_map over the OBJECT axis of `pdfs`), the
    per-object log-likelihood sums become `psum` collectives while the
    chain state stays replicated — the multi-chip layout for catalogs
    too large for one chip.

    `carry0`, if given, is the exact per-chain ``(overlap, lnpost)``
    MH state from a previous call (else recomputed from `pos0`); the
    final carry is returned as a third output so block-streaming callers
    (`sample`) resume bitwise-identically to one uninterrupted run.
    """
    # Row-major transpose for the per-step pair columns: a dynamic
    # column extraction (pdfs[:, i]) is a lane-dimension dynamic slice
    # on TPU (layout shuffle per access); rows of the transpose are
    # cheap sublane slices.
    pdfsT = pdfs.T
    step = _chain_step(pdfsT, prior, mh_steps, axis_name=axis_name)

    def lnsum(ov):
        s = jnp.sum(jnp.log(ov))
        return s if axis_name is None else jax.lax.psum(s, axis_name)

    def run_one_chain(chain_keys, p0, ov0, lnp0):
        def outer(state, key):
            state, _ = jax.lax.scan(step, state,
                                    jax.random.split(key, thin))
            pos, overlap, lnpost = state
            return state, (pos, lnpost)

        (_, ov_f, lnp_f), (samples, lnps) = jax.lax.scan(
            outer, (p0, ov0, lnp0), chain_keys)
        return samples, lnps, (ov_f, lnp_f)

    if carry0 is None:
        ov0 = jax.vmap(lambda p: pdfs @ p)(pos0)
        lnp0 = jax.vmap(lambda ov, p: lnsum(ov) + prior(p))(ov0, pos0)
    else:
        ov0, lnp0 = carry0
    return jax.vmap(run_one_chain)(keys, pos0, ov0, lnp0)


def _make_pop_mega_kernel(*, chunk, nsteps, thin, mh_steps, nbins, nobs):
    """Whole-MCMC-chain Pallas kernel (flat-prior population sampler).

    The XLA scan pays ~40-60 us of op-dispatch latency per MH proposal
    (the same floor the GNG/SOM trainers had); here the entire chain
    runs on-chip with the (Nbins, Nobs) transposed PDF matrix
    VMEM-resident and every random draw precomputed into group-packed
    slabs (128 // group_w Gibbs steps per 128-lane row; lanes
    [i, j, z_1..z_mh, e_1..e_mh] per group).  State is lane-oriented:
    pos (1, 128) [bin b in lane b], overlap (1, Nobs_pad), lnpost
    (1, 128) [lane 0].  Thinned samples write one (Niter, 128) row per
    thin block.

    Semantics match `_chain_step` exactly (rank-1 overlap updates,
    numeric gradient step scale, -Exponential() < delta accepts); the
    random STREAM is the precomputed one, so a seeded run is
    reproducible and block-streaming (`sample`) stays bitwise-identical
    to `run_mcmc`, but it differs from the lax.scan path's stream (both
    are distribution-equivalent; the reference uses global np.random).
    """
    group_w = 8
    while group_w < 128 and group_w < 2 + 2 * mh_steps:
        group_w *= 2
    groups = 128 // group_w

    def kernel(draws_ref, pdfsT_ref, pos0_ref, ov0_ref, lnp0_ref,
               samples_ref, lnps_ref, pos_ref, ov_ref, lnp_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            pos_ref[:, :] = pos0_ref[:, :]
            ov_ref[:, :] = ov0_ref[:, :]
            lnp_ref[:, :] = lnp0_ref[:, :]

        npl = ov0_ref.shape[1]
        lid = jax.lax.broadcasted_iota(jnp.int32,
                                       (1, 128), 1).astype(jnp.float32)
        lob = jax.lax.broadcasted_iota(jnp.int32,
                                       (1, npl), 1).astype(jnp.float32)
        valid_obj = lob < float(nobs)
        bin_mask = lid < float(nbins)

        def lane(row, j):
            return row[:, j:j + 1]                   # (1, 1) static lane

        def pick_lane(vec, i11):
            return jnp.sum(jnp.where(lid == i11, vec, 0.0),
                           keepdims=True)

        def lnsum(ov):
            return jnp.sum(jnp.where(valid_obj,
                                     jnp.log(jnp.maximum(ov, 1e-30)),
                                     0.0), keepdims=True)

        def one_step(istep, d):
            @pl.when(istep < nsteps)
            def _():
                i11 = lane(d, 0)
                j11 = lane(d, 1)
                pos = pos_ref[:, :]
                ov = ov_ref[:, :]
                lnpost = lnp_ref[:, 0:1]
                # Pair direction (samplers.py:264-271).
                di = pdfsT_ref[pl.ds(i11.astype(jnp.int32)[0, 0], 1), :]
                dj = pdfsT_ref[pl.ds(j11.astype(jnp.int32)[0, 0], 1), :]
                dcol = di - dj
                t = (jnp.where(lid == i11, 1.0, 0.0)
                     - jnp.where(lid == j11, 1.0, 0.0))
                pi = pick_lane(pos, i11)
                pj = pick_lane(pos, j11)
                # Numeric gradient scale (samplers.py:272-287), via the
                # cancellation-free ratio form (_pair_dlnl_terms).
                scale = 1e-4 * jnp.minimum(
                    jnp.minimum(pi, pj),
                    jnp.minimum(1.0 - pi, 1.0 - pj))
                half = (scale[0, 0] / 2.0) * dcol
                dlnl = jnp.sum(jnp.where(valid_obj,
                                         _pair_dlnl_terms(ov, half), 0.0),
                               keepdims=True)
                grad = dlnl / scale
                gscale = jnp.where(
                    grad != 0.0,
                    jnp.minimum(jnp.abs(1.0 / grad),
                                jnp.abs(scale * 1e4)),
                    jnp.abs(scale))

                pos_c, ov_c, lnp_c = pos, ov, lnpost
                for k in range(mh_steps):
                    z = lane(d, 2 + k) * gscale          # (1, 1)
                    e = lane(d, 2 + mh_steps + k)
                    pos_n = pos_c + t * z
                    ov_n = ov_c + z[0, 0] * dcol
                    bad = jnp.max(jnp.where(
                        jnp.logical_and(bin_mask, pos_n < 0.0),
                        1.0, 0.0), keepdims=True)
                    lnp_n = jnp.where(bad > 0.0, -3.0e38, lnsum(ov_n))
                    accept = -e < (lnp_n - lnp_c)
                    pos_c = jnp.where(accept, pos_n, pos_c)
                    ov_c = jnp.where(accept, ov_n, ov_c)
                    lnp_c = jnp.where(accept, lnp_n, lnp_c)

                pos_ref[:, :] = pos_c
                ov_ref[:, :] = ov_c
                lnp_ref[:, :] = jnp.where(lid == 0.0, lnp_c,
                                          lnp_ref[:, :])

                # Thinned sample output (one row per thin block).
                @pl.when(istep % thin == thin - 1)
                def _():
                    it = istep // thin
                    samples_ref[pl.ds(it, 1), :] = pos_c
                    lnps_ref[pl.ds(it, 1), :] = jnp.where(lid == 0.0,
                                                          lnp_c, 0.0)

        def row_step(r, _):
            row = draws_ref[pl.ds(r, 1), :]
            for gsub in range(groups):
                sh = (128 - gsub * group_w) % 128
                d = pltpu.roll(row, sh, 1)
                one_step((g * chunk + r) * groups + gsub, d)
            return 0

        jax.lax.fori_loop(0, chunk, row_step, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk", "nsteps", "thin",
                                             "mh_steps", "nbins", "nobs",
                                             "niter", "interpret"))
def _pop_run_pallas(draws, pdfsT, pos0, ov0, lnp0, *, chunk, nsteps, thin,
                    mh_steps, nbins, nobs, niter, interpret):
    """Dispatch the population-chain mega-kernel (one chain).

    Returns (samples (niter, 128), lnps (niter, 128), pos_f, ov_f,
    lnp_f) — the final state triple is the exact MH carry for
    block-streaming resume.
    """
    npad = draws.shape[0]
    assert npad % chunk == 0
    npl = ov0.shape[1]
    nb = pdfsT.shape[0]
    kernel = _make_pop_mega_kernel(chunk=chunk, nsteps=nsteps, thin=thin,
                                   mh_steps=mh_steps, nbins=nbins,
                                   nobs=nobs)
    slab = pl.BlockSpec((chunk, 128), lambda g: (g, 0))
    full = lambda shape: pl.BlockSpec(shape, lambda g: (0, 0))
    return pl.pallas_call(
        kernel,
        grid=(npad // chunk,),
        in_specs=[slab, full((nb, npl)), full((1, 128)), full((1, npl)),
                  full((1, 128))],
        out_specs=(full((niter, 128)), full((niter, 128)),
                   full((1, 128)), full((1, npl)), full((1, 128))),
        out_shape=(jax.ShapeDtypeStruct((niter, 128), jnp.float32),
                   jax.ShapeDtypeStruct((niter, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1, npl), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.float32)),
        interpret=interpret,
    )(draws, pdfsT, pos0, ov0, lnp0)


@functools.partial(jax.jit, static_argnames=("nsteps", "nbins",
                                             "mh_steps"))
def _pop_draws(key, *, nsteps, nbins, mh_steps):
    """All of one chain's randomness, precomputed: per Gibbs step an
    unordered pair (i != j, uniform), mh_steps standard normals, and
    mh_steps exponentials — (nsteps, 2 + 2*mh_steps) f32."""
    ki, kj, kz, ke = jax.random.split(key, 4)
    i = jax.random.randint(ki, (nsteps,), 0, nbins)
    j = jax.random.randint(kj, (nsteps,), 0, nbins - 1)
    j = j + (j >= i).astype(j.dtype)  # uniform over j != i
    z = jax.random.normal(kz, (nsteps, mh_steps), jnp.float32)
    e = jax.random.exponential(ke, (nsteps, mh_steps), jnp.float32)
    return jnp.concatenate([i[:, None].astype(jnp.float32),
                            j[:, None].astype(jnp.float32), z, e], axis=1)


def _pack_draw_rows(draw_vals, chunk):
    """Group-pack (nsteps, ncols) draw values into (nrows, 128) slab rows
    (128 // group_w steps per row), chunk-aligned."""
    nsteps, ncols = draw_vals.shape
    group_w = 8
    while group_w < 128 and group_w < ncols:
        group_w *= 2
    groups = 128 // group_w
    rows_needed = -(-nsteps // groups)
    nrows = -(-rows_needed // chunk) * chunk
    slab = np.zeros((nrows * groups, group_w), np.float32)
    slab[:nsteps, :ncols] = draw_vals
    return slab.reshape(nrows, 128)


def _chain_step(pdfsT, logprior_nz, mh_steps, axis_name=None):
    """One Gibbs step (random pair + mh_steps MH proposals) as a pure fn.

    ``pdfsT`` is the (Nbins, Nobs) transpose — see `_pop_run`.
    """

    def lnlike_from_overlap(ov):
        s = jnp.sum(jnp.log(ov))
        return s if axis_name is None else jax.lax.psum(s, axis_name)

    def step(state, key):
        pos, overlap, lnpost = state
        kpair, kmh = jax.random.split(key)
        nbins = pos.shape[0]
        # Random unordered pair (i != j), as rstate.choice(replace=False).
        i, j = jax.random.choice(kpair, nbins, (2,), replace=False)
        dcol = pdfsT[i, :] - pdfsT[j, :]
        t = jnp.zeros_like(pos).at[i].set(1.0).at[j].set(-1.0)

        # Numerical gradient along the pair direction (samplers.py:272-287),
        # via the cancellation-free ratio form (_pair_dlnl_terms).
        vals = jnp.stack([pos[i], pos[j], 1.0 - pos[i], 1.0 - pos[j]])
        scale = 1e-4 * jnp.min(vals)
        half = (scale / 2.0) * dcol
        dlnl = jnp.sum(_pair_dlnl_terms(overlap, half))
        if axis_name is not None:
            dlnl = jax.lax.psum(dlnl, axis_name)
        grad = (dlnl + logprior_nz(pos + t * (scale / 2.0))
                - logprior_nz(pos - t * (scale / 2.0))) / scale
        gscale = jnp.where(grad != 0.0,
                           jnp.minimum(jnp.abs(1.0 / grad),
                                       jnp.abs(scale * 1e4)),
                           jnp.abs(scale))

        def mh(carry, k):
            pos, overlap, lnpost = carry
            kz, ke = jax.random.split(k)
            z = jax.random.normal(kz) * gscale
            pos_new = pos + t * z
            ov_new = overlap + z * dcol
            bad = jnp.any(pos_new < 0.0)
            lnpost_new = jnp.where(
                bad, -jnp.inf,
                lnlike_from_overlap(ov_new) + logprior_nz(pos_new))
            accept = -jax.random.exponential(ke) < (lnpost_new - lnpost)
            pos = jnp.where(accept, pos_new, pos)
            overlap = jnp.where(accept, ov_new, overlap)
            lnpost = jnp.where(accept, lnpost_new, lnpost)
            return (pos, overlap, lnpost), None

        (pos, overlap, lnpost), _ = jax.lax.scan(
            mh, (pos, overlap, lnpost), jax.random.split(kmh, mh_steps))
        return (pos, overlap, lnpost), None

    return step


@functools.lru_cache(maxsize=None)
def _pop_run_sharded(mesh, obj_axis, prior, thin, mh_steps,
                     has_carry=False):
    """Mesh-sharded chain runner: PDF rows shard over objects, chain
    state replicates, and each log-likelihood reduction is one `psum`
    over ICI — the layout for catalogs beyond one chip's HBM.

    The returned MH carry's overlap stays sharded over objects (it is
    shard-local state); with ``has_carry`` a previous call's carry is
    accepted back for exact block-streaming resume.
    """
    from jax.sharding import PartitionSpec as P

    carry_spec = (P(None, obj_axis), P())

    def local(keys, pos0, pdfs, *carry):
        return _pop_run(keys, pos0, pdfs, carry if has_carry else None,
                        prior=prior, thin=thin, mh_steps=mh_steps,
                        axis_name=obj_axis)

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(obj_axis, None))
        + (carry_spec if has_carry else ()),
        out_specs=(P(), P(), carry_spec), check_vma=False))


class population_sampler(ChainSampler):
    """MH-in-Gibbs sampler over N(z) bin heights (samplers.py:83-308).

    Extra capability vs the reference: `nchains` vmapped parallel chains
    (results interleave chains: sample s of chain c is row s*nchains+c of
    `results`; use `results_by_chain` for the (Niter, nchains, Nbins)
    view).
    """

    def _resolve_prior(self, logprior_nz, prior_args, prior_kwargs):
        prior_kwargs = prior_kwargs or {}
        if logprior_nz is None:
            return _zero_prior
        if prior_args or prior_kwargs:
            return _BoundPrior(logprior_nz, prior_args, prior_kwargs)
        return logprior_nz

    def _sharded_inputs(self, mesh, pos0, thin, mh_steps, prior):
        """(runner, sharded pdfs, per-chain lnpost shift) for `mesh`.

        Objects pad to the device count with uniform rows; pair moves
        preserve sum(pos), so the pads shift every lnpost by the same
        per-chain constant (subtracted from stored values).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        nobs, nbins = self.pdfs.shape
        obj_axis = mesh.axis_names[0]
        ndev = int(mesh.size)
        npad = (-nobs) % ndev
        pdfs_np = self.pdfs
        lnp_shift = 0.0
        if npad:
            pad = np.full((npad, nbins), 1.0 / nbins, self.pdfs.dtype)
            pdfs_np = np.concatenate([self.pdfs, pad], axis=0)
            lnp_shift = npad * np.log(
                np.asarray(pos0).sum(axis=1) / nbins)[:, None]
        pdfs = jax.device_put(jnp.asarray(pdfs_np),
                              NamedSharding(mesh, P(obj_axis)))
        rep = NamedSharding(mesh, P())

        def run(keys, pos, carry=None):
            runner = _pop_run_sharded(mesh, obj_axis, prior, thin,
                                      mh_steps, carry is not None)
            args = (jax.device_put(keys, rep),
                    jax.device_put(jnp.asarray(pos), rep), pdfs)
            if carry is not None:
                args = args + tuple(carry)
            return runner(*args)

        return run, lnp_shift

    def _kernel_ok(self, prior, nbins, niter, mh_steps):
        """Mega-kernel eligibility: flat prior (in-kernel priors would
        need arbitrary traceables), lane-sized bin grid, draw groups
        that fit a 128-lane slab row (2 + 2*mh_steps values), and
        VMEM-resident state — the transposed PDF matrix plus the
        (niter, 128) samples/lnpost output blocks."""
        from ..ops import fused as _fz

        nobs = self.pdfs.shape[0]
        npl = -(-nobs // 128) * 128
        return (prior is _zero_prior and _fz.pallas_supported()
                and nbins <= 128
                and 2 + 2 * mh_steps <= 128
                and (nbins * npl * 4 + 2 * niter * 128 * 4
                     <= 12 * 2**20))

    def _run_kernel(self, key, pos0, Niter, thin, mh_steps, s0=0,
                    nsteps_total=None, carry=None):
        """Run `Niter` thinned samples through the chain mega-kernel for
        every chain; exact-carry resumable (block streaming).

        Each chain's full draw stream derives from fold_in(key, chain)
        over `nsteps_total` Gibbs steps; `s0` (in thinned samples)
        selects this block's slice, so run_mcmc and a block-streaming
        `sample` consume identical randomness.
        """
        nchains, nbins = pos0.shape
        nobs = self.pdfs.shape[0]
        npl = -(-nobs // 128) * 128
        if nsteps_total is None:
            nsteps_total = Niter * thin
        if not hasattr(self, "_pdfsT_dev") or \
                self._pdfsT_dev.shape[1] != npl:
            pdfsT = np.zeros((nbins, npl), np.float32)
            pdfsT[:, :nobs] = np.asarray(self.pdfs, np.float32).T
            self._pdfsT_dev = jnp.asarray(pdfsT)
        chunk = 64
        nsteps = Niter * thin
        # Cache the per-chain host draw streams across block-streaming
        # calls: the stream for a given (key, chain, nsteps_total) is
        # deterministic, and regenerating + reading back the WHOLE
        # stream for every block would be O(Niter^2 * thin) relay
        # traffic from `sample`.
        base = (np.asarray(jax.random.key_data(key)).tobytes(),
                int(nsteps_total), int(nbins), int(mh_steps))
        if getattr(self, "_draws_cache_key", None) != base:
            self._draws_cache_key = base
            self._draws_cache = {}
        outs = []
        for c in range(nchains):
            draws = self._draws_cache.get(c)
            if draws is None:
                draws = np.asarray(_pop_draws(
                    jax.random.fold_in(key, c), nsteps=int(nsteps_total),
                    nbins=nbins, mh_steps=mh_steps))
                self._draws_cache[c] = draws
            rows = _pack_draw_rows(
                draws[s0 * thin:s0 * thin + nsteps], chunk)
            if carry is None:
                p128 = np.zeros((1, 128), np.float32)
                p128[0, :nbins] = pos0[c]
                ov0 = np.zeros((1, npl), np.float32)
                ov0[0, :nobs] = np.asarray(self.pdfs, np.float32) \
                    @ pos0[c].astype(np.float32)
                ov0[0, nobs:] = 1.0
                lnp0 = np.zeros((1, 128), np.float32)
                lnp0[0, 0] = np.sum(np.log(np.maximum(ov0[0, :nobs],
                                                      1e-30)))
                state = (jnp.asarray(p128), jnp.asarray(ov0),
                         jnp.asarray(lnp0))
            else:
                state = carry[c]
            from ..ops import fused as _fz

            outs.append(_pop_run_pallas(
                jnp.asarray(rows), self._pdfsT_dev, *state, chunk=chunk,
                nsteps=int(nsteps), thin=int(thin),
                mh_steps=int(mh_steps), nbins=int(nbins),
                nobs=int(nobs), niter=int(Niter),
                interpret=not _fz.pallas_supported()))
        outs = jax.device_get(outs)
        samples = np.stack([o[0][:, :nbins] for o in outs])
        lnps = np.stack([o[1][:, 0] for o in outs])
        carry_f = [tuple(map(jnp.asarray, (o[2], o[3], o[4])))
                   for o in outs]
        return samples.astype(float), lnps.astype(float), carry_f

    def run_mcmc(self, Niter, logprior_nz=None, pos_init=None, thin=400,
                 mh_steps=3, rng=None, seed=None, verbose=True,
                 nchains=1, prior_args=(), prior_kwargs=None, mesh=None):
        """Draw `Niter` (thinned) samples; the whole run is one device call.

        Mirrors samplers.py:118-198 (resume from the last stored sample,
        default init = stacked PDFs).  With `mesh` given, the PDF matrix
        shards over the mesh's first axis (objects) and likelihood sums
        ride ICI as psums; objects are padded to the device count with
        uniform rows, which shift every lnpost by the same constant
        (corrected in the stored values) and leave acceptances exact.
        """
        t0 = time.time()
        prior = self._resolve_prior(logprior_nz, prior_args, prior_kwargs)
        pos0 = self._resolve_pos0(pos_init, nchains)
        key = self._resolve_key(seed, rng)
        keys = jax.random.split(key, (nchains, Niter))
        lnp_shift = 0.0
        if mesh is not None:
            run, lnp_shift = self._sharded_inputs(mesh, pos0, thin,
                                                  mh_steps, prior)
            samples, lnps, _ = run(keys, pos0)
        elif self._kernel_ok(prior, pos0.shape[1], Niter, mh_steps):
            samples, lnps, _ = self._run_kernel(key, pos0, Niter, thin,
                                                mh_steps)
        else:
            samples, lnps, _ = _pop_run(keys, jnp.asarray(pos0),
                                        jnp.asarray(self.pdfs),
                                        prior=prior, thin=thin,
                                        mh_steps=mh_steps)
        samples = np.asarray(samples)  # (nchains, Niter, Nbins)
        lnps = np.asarray(lnps) - lnp_shift
        self._store_run(samples, lnps, nchains, Niter)
        train_note(verbose, "population MCMC", Niter, t0)
        return self

    def sample(self, Niter, logprior_nz=None, pos_init=None, thin=400,
               mh_steps=3, rng=None, seed=None, verbose=True, nchains=1,
               prior_args=(), prior_kwargs=None, mesh=None, block=1):
        """Generator yielding one `(pos, lnpost)` per (thinned) sample,
        AS THE CHAIN RUNS.

        Reference: samplers.py:200-308 — the streaming generator behind
        `run_mcmc`, preserved for its monitoring / early-stop use-case:
        the chain advances `block` thinned samples per device call (the
        per-block scan compiles once — the block shape is constant), so
        the first yield costs O(block*thin*mh_steps) proposals, NOT
        O(Niter*...).  Blocks resume from the previous block's exact MH
        carry (position, overlap, lnpost), so for a given seed the
        stream is bitwise-identical to `run_mcmc`.  `run_mcmc` stays the
        single-device-call fast path; like the reference generator, this
        does NOT append to the stored chain — only `run_mcmc` does.
        """
        del verbose
        prior = self._resolve_prior(logprior_nz, prior_args, prior_kwargs)
        pos = self._resolve_pos0(pos_init, nchains)
        key = self._resolve_key(seed, rng)
        keys = jax.random.split(key, (nchains, Niter))
        use_kernel = mesh is None and self._kernel_ok(
            prior, pos.shape[1], min(block, Niter), mh_steps)
        if mesh is not None:
            run, lnp_shift = self._sharded_inputs(mesh, pos, thin,
                                                  mh_steps, prior)
        elif use_kernel:
            # Same mega-kernel and draw stream as run_mcmc, resumed
            # from the exact (pos, overlap, lnpost) carry per block —
            # a seeded stream stays bitwise-identical to run_mcmc.
            lnp_shift = 0.0
            total = Niter * thin

            def run(i0, nb, carry):
                return self._run_kernel(key, pos, nb, thin, mh_steps,
                                        s0=i0, nsteps_total=total,
                                        carry=carry)
        else:
            lnp_shift = 0.0
            pdfs = jnp.asarray(self.pdfs)

            def run(kb, p, carry=None):
                return _pop_run(kb, jnp.asarray(p), pdfs, carry,
                                prior=prior, thin=thin,
                                mh_steps=mh_steps)

        carry = None
        for i0 in range(0, Niter, block):
            nb = min(block, Niter - i0)
            if use_kernel:
                samples, lnps, carry = run(i0, nb, carry)
            else:
                samples, lnps, carry = run(keys[:, i0:i0 + nb], pos,
                                           carry)
            samples = np.asarray(samples)
            lnps = np.asarray(lnps) - lnp_shift
            pos = samples[:, -1, :]
            for it in range(nb):
                if nchains == 1:
                    yield samples[0, it], float(lnps[0, it])
                else:
                    yield samples[:, it, :], lnps[:, it]
