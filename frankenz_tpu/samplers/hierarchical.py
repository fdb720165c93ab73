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

Scan-vs-mega-kernel decision (measured on v5e, round 5): per-sweep
wall time SCALES with Nobs — 185 us at 2K objects, 589 us at 20K,
4.3 ms at 200K, 22.9 ms at 1M, with obj-draws/s saturating at ~4.4e7
from 20K up — so at catalog scale the Gumbel-max categorical is
compute/HBM-bound, not scan-dispatch-bound, and the scan is the right
design (a Pallas mega-kernel would only recover the ~100-200 us/sweep
dispatch floor that dominates below ~5K objects, where absolute run
times are already trivial).  Contrast the population sampler, whose
per-proposal state is O(Nbins) only: there the dispatch floor WAS the
cost and the mega-kernel pays (samplers/population.py).
"""

from __future__ import annotations

import functools

import time

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.progress import train_note
from .base import ChainSampler
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
def _hier_run(keys, pos0, pdfs, alpha, beta, ref, ref_norm, valid=None,
              ref0=None, *, nref, nobs, thin, has_ref, axis_name=None):
    """All chains x all samples in one compiled program (cached globally
    across run_mcmc calls by the static (nref, nobs, thin, has_ref) key).

    keys: (nchains, Niter) PRNG keys; pos0: (nchains, Nbins).  With
    `axis_name` (inside shard_map over the OBJECT axis of `pdfs`) the
    per-object categorical draws stay shard-local — each shard folds its
    axis index into the draw key so streams are independent — and the
    bin counts reduce with one `psum`; `valid` masks padded objects out
    of the counts.  The population-level draws use the unfolded
    (replicated) keys, so chain state is identical on every shard.

    `ref0` (nchains, Nbins) seeds the reference-count part of the Gibbs
    carry (defaults to `ref`); the final carry is returned as a third
    output so block-streaming callers (`sample`) can resume exactly.
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

    def run_one_chain(chain_keys, p0, rc0):
        def outer(carry, key):
            carry, lnps = jax.lax.scan(sweep, carry,
                                       jax.random.split(key, thin))
            pos, _ = carry
            return carry, (pos, lnps[-1])

        (_, rc_final), (samples, lnps) = jax.lax.scan(
            outer, (p0, rc0), chain_keys)
        return samples, lnps, rc_final

    if ref0 is None:
        rc0 = ref if has_ref else jnp.zeros(nbins, pos0.dtype)
        ref0 = jnp.broadcast_to(rc0, pos0.shape).astype(pos0.dtype)
    return jax.vmap(run_one_chain)(keys, pos0, ref0)


@functools.lru_cache(maxsize=None)
def _hier_run_sharded(mesh, obj_axis, nref, nobs, thin, has_ref):
    """Mesh-sharded Gibbs runner (see `_hier_run`)."""
    from jax.sharding import PartitionSpec as P

    def local(keys, pos0, pdfs, alpha, beta, ref, ref_norm, valid, ref0):
        return _hier_run(keys, pos0, pdfs, alpha, beta, ref, ref_norm,
                         valid, ref0, nref=nref, nobs=nobs, thin=thin,
                         has_ref=has_ref, axis_name=obj_axis)

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(obj_axis, None), P(), P(), P(), P(),
                  P(obj_axis), P()),
        out_specs=(P(), P(), P()), check_vma=False))


class hierarchical_sampler(ChainSampler):
    """Collapsed Gibbs sampler over (z_g, rho) (samplers.py:311-535).

    Extra capability vs the reference: `nchains` vmapped parallel chains
    (see `population_sampler` for the results layout).
    """

    def _resolve_hyper(self, alpha, beta, ref_sample):
        """Flat alpha/beta defaults + reference-sample normalization
        (samplers.py:365-380)."""
        nbins = self.pdfs.shape[1]
        alpha = (np.ones(nbins) if alpha is None
                 else np.asarray(alpha, float))
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
        return alpha, beta, ref_sample, ref_norm, nref, has_ref

    def _make_runner(self, mesh, hyper, thin):
        """`run(keys, pos, ref0) -> (samples, lnps, ref_final)` closure
        with the PDF matrix (sharded when `mesh` is given) and hyper
        arrays staged once."""
        alpha, beta, ref_sample, ref_norm, nref, has_ref = hyper
        nobs, nbins = self.pdfs.shape
        alpha_j, beta_j = jnp.asarray(alpha), jnp.asarray(beta)
        ref_j, ref_norm_j = jnp.asarray(ref_sample), jnp.asarray(ref_norm)
        if mesh is None:
            pdfs = jnp.asarray(self.pdfs)

            def run(keys, pos, ref0):
                return _hier_run(keys, jnp.asarray(pos), pdfs, alpha_j,
                                 beta_j, ref_j, ref_norm_j, None, ref0,
                                 nref=nref, nobs=nobs, thin=thin,
                                 has_ref=has_ref)

            return run

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
        pdfs_s = jax.device_put(jnp.asarray(pdfs_np), dspec)
        valid_s = jax.device_put(jnp.asarray(valid), dspec)
        hyper_s = [jax.device_put(x, rep)
                   for x in (alpha_j, beta_j, ref_j, ref_norm_j)]

        def run(keys, pos, ref0):
            pos = jnp.asarray(pos)
            if ref0 is None:
                rc0 = ref_j if has_ref else jnp.zeros(nbins, pos.dtype)
                ref0 = jnp.broadcast_to(rc0, pos.shape).astype(pos.dtype)
            return runner(jax.device_put(keys, rep),
                          jax.device_put(pos, rep), pdfs_s, *hyper_s,
                          valid_s,
                          jax.device_put(jnp.asarray(ref0), rep))

        return run

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
        hyper = self._resolve_hyper(alpha, beta, ref_sample)
        pos0 = self._resolve_pos0(pos_init, nchains)
        keys = jax.random.split(self._resolve_key(seed, rng),
                                (nchains, Niter))
        run = self._make_runner(mesh, hyper, thin)
        samples, lnps, _ = run(keys, pos0, None)
        self._store_run(np.asarray(samples), np.asarray(lnps), nchains,
                        Niter)
        train_note(verbose, "hierarchical MCMC", Niter, t0)
        return self

    def sample(self, Niter, alpha=None, pos_init=None, thin=5,
               ref_sample=None, beta=None, rng=None, seed=None,
               verbose=True, nchains=1, mesh=None, block=1):
        """Generator yielding one `(pos, lnpost)` per (thinned) sample,
        AS THE CHAIN RUNS.

        Reference: samplers.py:429-535 — the streaming generator behind
        `run_mcmc`, preserved for its monitoring / early-stop use-case:
        the chain advances `block` thinned samples per device call (one
        compiled scan, cached across blocks), resuming each block from
        the previous block's full Gibbs carry (position AND reference
        counts), so the first yield costs O(block*thin) sweeps rather
        than O(Niter*thin).  `run_mcmc` stays the single-call fast path;
        like the reference generator, this does NOT append to the stored
        chain — only `run_mcmc` does.
        """
        del verbose
        hyper = self._resolve_hyper(alpha, beta, ref_sample)
        pos = self._resolve_pos0(pos_init, nchains)
        keys = jax.random.split(self._resolve_key(seed, rng),
                                (nchains, Niter))
        run = self._make_runner(mesh, hyper, thin)
        ref0 = None
        for i0 in range(0, Niter, block):
            nb = min(block, Niter - i0)
            samples, lnps, rc = run(keys[:, i0:i0 + nb], pos, ref0)
            samples = np.asarray(samples)
            lnps = np.asarray(lnps)
            pos, ref0 = samples[:, -1, :], rc
            for it in range(nb):
                if nchains == 1:
                    yield samples[0, it], float(lnps[0, it])
                else:
                    yield samples[:, it, :], lnps[:, it]
