"""Population / hierarchical N(z) MCMC (reference frankenz/samplers.py)."""

from .hierarchical import (  # noqa: F401
    dirichlet_logpdf,
    hierarchical_sampler,
    multinomial_logpmf,
)
from .population import loglike_nz, population_sampler  # noqa: F401
