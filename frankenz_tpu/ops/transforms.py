"""
Photometry transforms: flux <-> AB magnitude and asinh magnitude
("luptitude", Lupton et al. 1999), with first-order error propagation.

Reference: `frankenz/pdf.py:625-775` (`magnitude`, `inv_magnitude`,
`luptitude`, `inv_luptitude`).  Trivially elementwise — plain jnp, fully
jit/vmap compatible, used both on host (feature construction for the kNN
fitter) and inside kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["magnitude", "inv_magnitude", "luptitude", "inv_luptitude"]

_LN10 = 2.302585092994046  # log(10)
_POGSON = 2.5 / _LN10  # 2.5 * log10(e)


def magnitude(phot, err, zeropoints=1.0, **kwargs):
    """Flux density -> AB magnitude, with errors (pdf.py:625-657)."""
    phot = jnp.asarray(phot)
    err = jnp.asarray(err)
    mag = -2.5 * jnp.log10(phot / zeropoints)
    mag_err = _POGSON * err / phot
    return mag, mag_err


def inv_magnitude(mag, err, zeropoints=1.0, **kwargs):
    """AB magnitude -> flux density, with errors (pdf.py:660-692)."""
    mag = jnp.asarray(mag)
    err = jnp.asarray(err)
    phot = 10 ** (-0.4 * mag) * zeropoints
    phot_err = err * 0.4 * _LN10 * phot
    return phot, phot_err


def luptitude(phot, err, skynoise=1.0, zeropoints=1.0, **kwargs):
    """Flux density -> asinh magnitude, with errors (pdf.py:695-734).

    `skynoise` is the softening parameter b; the transform stays
    well-behaved through zero and negative fluxes, which is why the kNN
    fitter uses it as the default feature map.
    """
    phot = jnp.asarray(phot)
    err = jnp.asarray(err)
    mag = -_POGSON * (jnp.arcsinh(phot / (2.0 * skynoise))
                      + jnp.log(skynoise / zeropoints))
    mag_err = jnp.sqrt(jnp.square(2.5 * jnp.log10(jnp.e) * err)
                       / (jnp.square(2.0 * skynoise) + jnp.square(phot)))
    return mag, mag_err


def inv_luptitude(mag, err, skynoise=1.0, zeropoints=1.0, **kwargs):
    """Asinh magnitude -> flux density, with errors (pdf.py:737-775)."""
    mag = jnp.asarray(mag)
    err = jnp.asarray(err)
    phot = (2.0 * skynoise) * jnp.sinh(-mag / _POGSON
                                       - jnp.log(skynoise / zeropoints))
    phot_err = jnp.sqrt((jnp.square(2.0 * skynoise) + jnp.square(phot))
                        * jnp.square(err)) / (2.5 * jnp.log10(jnp.e))
    return phot, phot_err
