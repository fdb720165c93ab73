"""
frankenz_tpu — a TPU-native (JAX/XLA/Pallas) Bayesian photometric-redshift
engine with the capabilities of `frankenz` (joshspeagle/frankenz v0.3.5).

Where the reference iterates a Python loop over objects around vectorized
NumPy inner kernels, this framework is batched-first: every likelihood, KDE,
and fitter operates on (Nobj, ...) arrays, jit-compiles to fused XLA/Mosaic
programs, and shards over a `jax.sharding.Mesh` of TPU chips (pure data
parallelism over objects — each object's posterior is independent).

Layer map (mirrors reference layers; see SURVEY.md):
  ops/       — likelihood kernels, KDE/PDF machinery, photometry transforms,
               PDF summaries (reference frankenz/pdf.py).
  models/    — BruteForce, NearestNeighbors, SelfOrganizingMap,
               GrowingNeuralGas fitters (reference bruteforce.py, knn.py,
               networks.py, fitting.py).
  samplers/  — population + hierarchical MCMC (reference samplers.py).
  sim/       — mock-survey simulator, priors, IGM attenuation (reference
               simulate.py, priors.py, reddening.py).
  parallel/  — mesh construction and sharded drivers (no reference
               counterpart: the reference is single-threaded NumPy).
  utils/     — checkpointing, progress, metrics (no reference counterpart).
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
from . import ops  # noqa: F401
from . import models  # noqa: F401
from . import fitting  # noqa: F401
from . import samplers  # noqa: F401
from . import sim  # noqa: F401
from . import parallel  # noqa: F401
from . import utils  # noqa: F401
from . import plotting  # noqa: F401
