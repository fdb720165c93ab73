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

from ..utils.progress import train_note

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
def _pop_run(keys, pos0, pdfs, *, prior, thin, mh_steps, axis_name=None):
    """All chains x all samples in one compiled program, cached globally
    across run_mcmc calls by the static (prior, thin, mh_steps) key.

    keys: (nchains, Niter) PRNG keys; pos0: (nchains, Nbins).  With
    `axis_name` (inside shard_map over the OBJECT axis of `pdfs`), the
    per-object log-likelihood sums become `psum` collectives while the
    chain state stays replicated — the multi-chip layout for catalogs
    too large for one chip.
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

    def run_one_chain(chain_keys, p0):
        overlap0 = pdfs @ p0
        lnpost0 = lnsum(overlap0) + prior(p0)

        def outer(state, key):
            state, _ = jax.lax.scan(step, state,
                                    jax.random.split(key, thin))
            pos, overlap, lnpost = state
            return state, (pos, lnpost)

        _, (samples, lnps) = jax.lax.scan(
            outer, (p0, overlap0, lnpost0), chain_keys)
        return samples, lnps

    return jax.vmap(run_one_chain)(keys, pos0)


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

        # Numerical gradient along the pair direction (samplers.py:272-287).
        vals = jnp.stack([pos[i], pos[j], 1.0 - pos[i], 1.0 - pos[j]])
        scale = 1e-4 * jnp.min(vals)
        lnp1 = (lnlike_from_overlap(overlap + (scale / 2.0) * dcol)
                + logprior_nz(pos + t * (scale / 2.0)))
        lnp2 = (lnlike_from_overlap(overlap - (scale / 2.0) * dcol)
                + logprior_nz(pos - t * (scale / 2.0)))
        grad = (lnp1 - lnp2) / scale
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
def _pop_run_sharded(mesh, obj_axis, prior, thin, mh_steps):
    """Mesh-sharded chain runner: PDF rows shard over objects, chain
    state replicates, and each log-likelihood reduction is one `psum`
    over ICI — the layout for catalogs beyond one chip's HBM."""
    from jax.sharding import PartitionSpec as P

    def local(keys, pos0, pdfs):
        return _pop_run(keys, pos0, pdfs, prior=prior, thin=thin,
                        mh_steps=mh_steps, axis_name=obj_axis)

    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(), P(obj_axis, None)),
        out_specs=(P(), P()), check_vma=False))


class population_sampler:
    """MH-in-Gibbs sampler over N(z) bin heights (samplers.py:83-308).

    Extra capability vs the reference: `nchains` vmapped parallel chains
    (results interleave chains: sample s of chain c is row s*nchains+c of
    `results`; use `results_by_chain` for the (Niter, nchains, Nbins)
    view).
    """

    def __init__(self, pdfs):
        # Host-side float64: mixed-precision inputs (e.g. float32 PDFs
        # from the fitters) would otherwise promote inconsistently inside
        # the scan carry (jnp.asarray downcasts uniformly when x64 is
        # disabled, so on-device dtype stays consistent either way).
        self.pdfs = np.asarray(pdfs, float)
        self.samples = []
        self.samples_lnp = []
        self._chain_state = None

    def reset(self):
        """Re-initialize the sampler."""
        self.samples = []
        self.samples_lnp = []
        self._chain_state = None

    @property
    def results(self):
        """(samples, lnpost) arrays; multi-chain samples interleaved."""
        s = np.array(self.samples)
        lnp = np.array(self.samples_lnp)
        if s.ndim == 3:  # (Niter, nchains, Nbins) -> interleaved
            s = s.reshape(-1, s.shape[-1])
            lnp = lnp.reshape(-1)
        return s, lnp

    @property
    def results_by_chain(self):
        """(Niter, nchains, Nbins) samples + (Niter, nchains) lnpost."""
        s = np.array(self.samples)
        lnp = np.array(self.samples_lnp)
        if s.ndim == 2:
            s = s[:, None, :]
            lnp = lnp[:, None]
        return s, lnp

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
        prior_kwargs = prior_kwargs or {}
        nobs, nbins = self.pdfs.shape
        if logprior_nz is None:
            prior = _zero_prior
        elif prior_args or prior_kwargs:
            prior = _BoundPrior(logprior_nz, prior_args, prior_kwargs)
        else:
            prior = logprior_nz

        if pos_init is None:
            if self._chain_state is not None:
                pos0 = self._chain_state
            elif self.samples:
                pos0 = np.atleast_2d(np.asarray(self.samples[-1]))
            else:
                stack = self.pdfs.sum(axis=0) / self.pdfs.sum()
                pos0 = np.tile(stack, (nchains, 1))
        else:
            pos0 = np.atleast_2d(np.asarray(pos_init, float))
        if pos0.ndim == 1:
            pos0 = pos0[None, :]
        if pos0.shape[0] != nchains:
            pos0 = np.tile(pos0[0], (nchains, 1))

        key = jax.random.key(seed if seed is not None
                             else (rng.integers(2**31) if rng is not None
                                   else np.random.default_rng().integers(
                                       2**31)))
        keys = jax.random.split(key, (nchains, Niter))
        lnp_shift = 0.0
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            obj_axis = mesh.axis_names[0]
            ndev = int(mesh.size)
            npad = (-nobs) % ndev
            pdfs_np = self.pdfs
            if npad:
                # Uniform pad rows: overlap = sum(pos)/Nbins, and pair
                # proposals preserve sum(pos) — a CONSTANT lnpost shift
                # per chain (sum(pos0) need not be 1), exact otherwise.
                pad = np.full((npad, nbins), 1.0 / nbins, self.pdfs.dtype)
                pdfs_np = np.concatenate([self.pdfs, pad], axis=0)
                lnp_shift = npad * np.log(
                    np.asarray(pos0).sum(axis=1) / nbins)[:, None]
            pdfs = jax.device_put(jnp.asarray(pdfs_np),
                                  NamedSharding(mesh, P(obj_axis)))
            runner = _pop_run_sharded(mesh, obj_axis, prior, thin,
                                      mh_steps)
            rep = NamedSharding(mesh, P())
            samples, lnps = runner(jax.device_put(keys, rep),
                                   jax.device_put(jnp.asarray(pos0), rep),
                                   pdfs)
        else:
            pdfs = jnp.asarray(self.pdfs)
            samples, lnps = _pop_run(keys, jnp.asarray(pos0), pdfs,
                                     prior=prior, thin=thin,
                                     mh_steps=mh_steps)
        samples = np.asarray(samples)  # (nchains, Niter, Nbins)
        lnps = np.asarray(lnps) - lnp_shift
        for it in range(Niter):
            if nchains == 1:
                self.samples.append(samples[0, it])
                self.samples_lnp.append(float(lnps[0, it]))
            else:
                self.samples.append(samples[:, it, :])
                self.samples_lnp.append(lnps[:, it])
        self._chain_state = samples[:, -1, :]
        train_note(verbose, "population MCMC", Niter, t0)
        return self

    def sample(self, Niter, logprior_nz=None, pos_init=None, thin=400,
               mh_steps=3, rng=None, seed=None, verbose=True, nchains=1,
               prior_args=(), prior_kwargs=None, mesh=None):
        """Generator yielding one `(pos, lnpost)` per (thinned) sample.

        Reference: samplers.py:200-308 — the generator behind `run_mcmc`.
        The whole chain is computed on-device up front (sequential MCMC
        steps stream poorly over a device boundary) and the samples are
        then yielded in order.  Like the reference generator, this does
        NOT append to the stored chain — only `run_mcmc` does.
        """
        del verbose
        keep = (list(self.samples), list(self.samples_lnp),
                self._chain_state)
        try:
            self.run_mcmc(Niter, logprior_nz=logprior_nz,
                          pos_init=pos_init, thin=thin, mh_steps=mh_steps,
                          rng=rng, seed=seed, verbose=False,
                          nchains=nchains, prior_args=prior_args,
                          prior_kwargs=prior_kwargs, mesh=mesh)
            out = list(zip(self.samples[len(keep[0]):],
                           self.samples_lnp[len(keep[1]):]))
        finally:
            self.samples, self.samples_lnp, self._chain_state = keep
        for pos, lnpost in out:
            yield pos, lnpost
