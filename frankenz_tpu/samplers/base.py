"""Shared chain-store machinery for the MCMC samplers.

Both reference samplers (`frankenz/samplers.py:83`, `:311`) keep their
chains as Python lists on `self` and resume from the last stored sample;
this base class holds that state plus the multi-chain results views and
the shared position/key resolution used by `run_mcmc` and the streaming
`sample` generators.
"""

from __future__ import annotations

import numpy as np
import jax

__all__ = ["ChainSampler"]


class ChainSampler:
    """Chain storage + init/resume resolution common to both samplers."""

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

    def _resolve_pos0(self, pos_init, nchains):
        """Initial per-chain positions: explicit init, else the resumed
        chain state, else the stacked-PDF default (samplers.py:173-179)."""
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
        return pos0

    @staticmethod
    def _resolve_key(seed, rng):
        return jax.random.key(
            seed if seed is not None
            else (rng.integers(2**31) if rng is not None
                  else np.random.default_rng().integers(2**31)))

    def _store_run(self, samples, lnps, nchains, Niter):
        """Append a finished (nchains, Niter, ...) run to the chain."""
        for it in range(Niter):
            if nchains == 1:
                self.samples.append(samples[0, it])
                self.samples_lnp.append(float(lnps[0, it]))
            else:
                self.samples.append(samples[:, it, :])
                self.samples_lnp.append(lnps[:, it])
        self._chain_state = samples[:, -1, :]
