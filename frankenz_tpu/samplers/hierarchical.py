"""
Hierarchical N(z) sampler: collapsed Gibbs with a Dirichlet hyper-prior.

Reference: `frankenz/samplers.py:311-535` (class `hierarchical_sampler`).
Model: per-object redshift-bin assignments z_g ~ Categorical(p_g * rho),
population rho ~ Dirichlet(alpha + counts [+ ref_counts]), optional
unrepresentative-reference-sample step (samplers.py:503-505, 524-529).
Inputs must be *likelihoods* (the prior is modeled explicitly).

TPU redesign: each Gibbs sweep is fully vectorized — the per-object
multinomial loop (samplers.py:519-520, O(Nobs) Python draws per sweep)
becomes one Gumbel-max categorical over the (Nobs, Nbins) weight matrix
plus a segment-sum; the Dirichlet and multinomial draws and the
closed-form log-pmf/pdf evaluations (gammaln-based, replacing
scipy.stats) all run inside a single `lax.scan` over (Niter x thin)
sweeps, with optional vmapped parallel chains.
"""

from __future__ import annotations

import functools

import time

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.progress import train_note
from jax.scipy.special import gammaln, xlogy

__all__ = ["hierarchical_sampler", "multinomial_logpmf", "dirichlet_logpdf"]


def multinomial_logpmf(counts, n, p):
    """Closed-form multinomial log-pmf (replaces scipy.stats.multinomial).

    Matches scipy's convention: support requires sum(counts) == n; zero
    probabilities with zero counts contribute 0 via xlogy.
    """
    counts = jnp.asarray(counts)
    return (gammaln(n + 1.0) - jnp.sum(gammaln(counts + 1.0), axis=-1)
            + jnp.sum(xlogy(counts, p), axis=-1))


def dirichlet_logpdf(x, alpha):
    """Closed-form Dirichlet log-pdf (replaces scipy.stats.dirichlet)."""
    x = jnp.asarray(x)
    alpha = jnp.asarray(alpha)
    return (gammaln(jnp.sum(alpha, axis=-1))
            - jnp.sum(gammaln(alpha), axis=-1)
            + jnp.sum(xlogy(alpha - 1.0, x), axis=-1))


@functools.partial(jax.jit,
                   static_argnames=("nref", "nobs", "thin", "has_ref",
                                    "axis_name"))
def _hier_run(keys, pos0, pdfs, alpha, beta, ref, ref_norm, valid=None, *,
              nref, nobs, thin, has_ref, axis_name=None):
    """All chains x all samples in one compiled program (cached globally
    across run_mcmc calls by the static (nref, nobs, thin, has_ref) key).

    keys: (nchains, Niter) PRNG keys; pos0: (nchains, Nbins).  With
    `axis_name` (inside shard_map over the OBJECT axis of `pdfs`) the
    per-object categorical draws stay shard-local — each shard folds its
    axis index into the draw key so streams are independent — and the
    bin counts reduce with one `psum`; `valid` masks padded objects out
    of the counts.  The population-level draws use the unfolded
    (replicated) keys, so chain state is identical on every shard.
    """
    nbins = pos0.shape[-1]
    # Hoisted: the per-object log-PDF matrix is loop-invariant; only the
    # log of the (Nbins,) population vector changes per sweep.
    log_pdfs = jnp.log(pdfs)

    def sweep(carry, key):
        pos, ref_counts = carry
        kz, kd, kr = jax.random.split(key, 3)
        if axis_name is not None:
            kz = jax.random.fold_in(kz, jax.lax.axis_index(axis_name))
        # Per-object categorical draw ~ p_g * rho via Gumbel-max
        # (samplers.py:519-520's multinomial(1, .) loop, vectorized).
        logits = log_pdfs + jnp.log(pos)[None, :]
        g = jax.random.gumbel(kz, logits.shape)
        zdraw = jnp.argmax(logits + g, axis=1)
        w = jnp.ones(pdfs.shape[0], pos.dtype) if valid is None else valid
        counts = jnp.zeros(nbins, pos.dtype).at[zdraw].add(w)
        if axis_name is not None:
            counts = jax.lax.psum(counts, axis_name)
        # Population draw (samplers.py:522).
        pos = jax.random.dirichlet(kd, alpha + counts + ref_counts)
        # Reference-sample draw (samplers.py:524-529).
        if has_ref:
            pcounts = ref + beta + nobs * pos
            ref_counts = jax.random.multinomial(
                kr, nref, pcounts / jnp.sum(pcounts)).astype(pos.dtype)
            lnpriorref = multinomial_logpmf(ref_counts, nref, ref_norm)
        else:
            lnpriorref = 0.0
        lnlike = multinomial_logpmf(counts, float(nobs), pos)
        lnprior = dirichlet_logpdf(pos, alpha + ref_counts)
        return (pos, ref_counts), lnlike + lnprior + lnpriorref

    def run_one_chain(chain_keys, p0):
        def outer(carry, key):
            carry, lnps = jax.lax.scan(sweep, carry,
                                       jax.random.split(key, thin))
            pos, _ = carry
            return carry, (pos, lnps[-1])

        carry0 = (p0, ref if has_ref else jnp.zeros(nbins, p0.dtype))
        _, (samples, lnps) = jax.lax.scan(outer, carry0, chain_keys)
        return samples, lnps

    return jax.vmap(run_one_chain)(keys, pos0)


@functools.lru_cache(maxsize=None)
def _hier_run_sharded(mesh, obj_axis, nref, nobs, thin, has_ref):
    """Mesh-sharded Gibbs runner (see `_hier_run`)."""
    from jax.sharding import PartitionSpec as P

    def local(keys, pos0, pdfs, alpha, beta, ref, ref_norm, valid):
        return _hier_run(keys, pos0, pdfs, alpha, beta, ref, ref_norm,
                         valid, nref=nref, nobs=nobs, thin=thin,
                         has_ref=has_ref, axis_name=obj_axis)

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(obj_axis, None), P(), P(), P(), P(),
                  P(obj_axis)),
        out_specs=(P(), P()), check_vma=False))


class hierarchical_sampler:
    """Collapsed Gibbs sampler over (z_g, rho) (samplers.py:311-535).

    Extra capability vs the reference: `nchains` vmapped parallel chains
    (see `population_sampler` for the results layout).
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
        s = np.array(self.samples)
        lnp = np.array(self.samples_lnp)
        if s.ndim == 3:
            s = s.reshape(-1, s.shape[-1])
            lnp = lnp.reshape(-1)
        return s, lnp

    @property
    def results_by_chain(self):
        s = np.array(self.samples)
        lnp = np.array(self.samples_lnp)
        if s.ndim == 2:
            s = s[:, None, :]
            lnp = lnp[:, None]
        return s, lnp

    def run_mcmc(self, Niter, alpha=None, pos_init=None, thin=5,
                 ref_sample=None, beta=None, rng=None, seed=None,
                 verbose=True, nchains=1, mesh=None):
        """Draw `Niter` (thinned) samples; the whole run is one device call.

        Mirrors samplers.py:349-427: flat alpha/beta defaults, resume from
        the last stored sample, default init = stacked PDFs.  With `mesh`
        given, the PDF matrix shards over objects: categorical draws are
        shard-local (independent folded streams, so chains are
        distribution-equivalent, not bitwise-equal, to single-device
        runs) and the bin counts reduce with one `psum` per sweep.
        """
        t0 = time.time()
        nobs, nbins = self.pdfs.shape
        alpha = np.ones(nbins) if alpha is None else np.asarray(alpha, float)
        beta = np.ones(nbins) if beta is None else np.asarray(beta, float)

        has_ref = ref_sample is not None
        if has_ref:
            ref_sample = np.asarray(ref_sample, float)
            ref_norm = ref_sample + beta
            ref_norm = ref_norm / ref_norm.sum()
            nref = float(ref_sample.sum())
        else:
            ref_sample = np.zeros(nbins)
            ref_norm = np.ones(nbins) / nbins
            nref = 0.0

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
        if pos0.shape[0] != nchains:
            pos0 = np.tile(pos0[0], (nchains, 1))

        key = jax.random.key(seed if seed is not None
                             else (rng.integers(2**31) if rng is not None
                                   else np.random.default_rng().integers(
                                       2**31)))
        pdfs = jnp.asarray(self.pdfs)
        alpha_j = jnp.asarray(alpha)
        beta_j = jnp.asarray(beta)
        ref_j = jnp.asarray(ref_sample)
        ref_norm_j = jnp.asarray(ref_norm)

        keys = jax.random.split(key, (nchains, Niter))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            obj_axis = mesh.axis_names[0]
            ndev = int(mesh.size)
            npad = (-nobs) % ndev
            pdfs_np = self.pdfs
            valid = np.ones(nobs + npad, np.float64)
            if npad:
                pdfs_np = np.concatenate(
                    [self.pdfs, np.full((npad, nbins), 1.0 / nbins,
                                        self.pdfs.dtype)], axis=0)
                valid[nobs:] = 0.0
            dspec = NamedSharding(mesh, P(obj_axis))
            rep = NamedSharding(mesh, P())
            runner = _hier_run_sharded(mesh, obj_axis, nref, nobs, thin,
                                       has_ref)
            samples, lnps = runner(
                jax.device_put(keys, rep),
                jax.device_put(jnp.asarray(pos0), rep),
                jax.device_put(jnp.asarray(pdfs_np), dspec),
                jax.device_put(alpha_j, rep), jax.device_put(beta_j, rep),
                jax.device_put(ref_j, rep),
                jax.device_put(ref_norm_j, rep),
                jax.device_put(jnp.asarray(valid), dspec))
        else:
            samples, lnps = _hier_run(
                keys, jnp.asarray(pos0), pdfs, alpha_j, beta_j, ref_j,
                ref_norm_j, nref=nref, nobs=nobs, thin=thin,
                has_ref=has_ref)
        samples = np.asarray(samples)
        lnps = np.asarray(lnps)
        for it in range(Niter):
            if nchains == 1:
                self.samples.append(samples[0, it])
                self.samples_lnp.append(float(lnps[0, it]))
            else:
                self.samples.append(samples[:, it, :])
                self.samples_lnp.append(lnps[:, it])
        self._chain_state = samples[:, -1, :]
        train_note(verbose, "hierarchical MCMC", Niter, t0)
        return self

    def sample(self, Niter, alpha=None, pos_init=None, thin=5,
               ref_sample=None, beta=None, rng=None, seed=None,
               verbose=True, nchains=1, mesh=None):
        """Generator yielding one `(pos, lnpost)` per (thinned) sample.

        Reference: samplers.py:429-535 — the generator behind `run_mcmc`.
        The whole chain is computed on-device up front and the samples
        are then yielded in order.  Like the reference generator, this
        does NOT append to the stored chain — only `run_mcmc` does.
        """
        del verbose
        keep = (list(self.samples), list(self.samples_lnp),
                self._chain_state)
        try:
            self.run_mcmc(Niter, alpha=alpha, pos_init=pos_init,
                          thin=thin, ref_sample=ref_sample, beta=beta,
                          rng=rng, seed=seed, verbose=False,
                          nchains=nchains, mesh=mesh)
            out = list(zip(self.samples[len(keep[0]):],
                           self.samples_lnp[len(keep[1]):]))
        finally:
            self.samples, self.samples_lnp, self._chain_state = keep
        for pos, lnpost in out:
            yield pos, lnpost
