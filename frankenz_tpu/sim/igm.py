"""
IGM attenuation: Madau (1995/1999) effective transmission.

Reference: `frankenz/reddening.py:23-95` (`_madau_t1`, `_madau_tau1`,
`_madau_tau2`, `madau_teff`).  Physics: Lyman-series line blanketing for
the n=2..12 transitions plus photoelectric continuum absorption below the
Lyman limit (912 A).  The reference applies each line with a Python loop
and boolean masks; here everything is a single broadcasted jnp expression
over an arbitrary-shape wavelength array and scalar-or-array redshift, so
it vectorizes over (z, wavelength) grids and runs under jit/vmap for the
model-grid synthesis.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["madau_teff", "madau_tau"]

# Lyman-series n->1 wavelengths [A] (n = 2..12) and Madau line coefficients.
_LY_LINES = np.array([1216.0, 1026.0, 973.0, 950.0, 938.1, 931.0, 926.5,
                      923.4, 921.2, 919.6, 918.4])
_LY_COEFFS = np.array([0.0037, 0.00177, 0.00106, 0.000584, 0.00044, 0.00040,
                       0.00037, 0.00035, 0.00033, 0.00032, 0.00031])
_LY_LIMIT = 912.0


def madau_tau(wave, z):
    """Total Madau optical depth at observed wavelengths `wave` [A] for a
    source at scalar redshift `z` (vmap over `z` for arrays)."""
    wave = jnp.asarray(wave)
    w = wave[..., None]  # broadcast against the trailing line axis

    # Line blanketing (reddening.py:23-56): each line contributes
    # coeff * (wave/line)^3.46 blueward of its redshifted position.
    zline = _LY_LINES * (1.0 + z)
    tau1 = jnp.sum(jnp.where(w < zline,
                             _LY_COEFFS * (w / _LY_LINES) ** 3.46, 0.0),
                   axis=-1)

    # Photoelectric continuum below the Lyman limit (reddening.py:59-78).
    xc = wave / _LY_LIMIT
    xem = 1.0 + z
    tau2 = (0.25 * xc**3 * (xem**0.46 - xc**0.46)
            + 9.4 * xc**1.5 * (xem**0.18 - xc**0.18)
            - 0.7 * xc**3 * (xc**-1.32 - xem**-1.32)
            - 0.023 * (xem**1.68 - xc**1.68))
    tau2 = jnp.where(wave < _LY_LIMIT * xem, jnp.maximum(tau2, 0.0), 0.0)

    return tau1 + tau2


def madau_teff(wave, z):
    """Effective IGM transmission exp(-tau) (reddening.py:81-95)."""
    return jnp.exp(-madau_tau(wave, z))
