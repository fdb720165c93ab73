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

import os as _os
import tempfile as _tempfile

import jax as _jax


def _host_tag():
    """Short fingerprint of the host CPU's feature set.

    /proc/cpuinfo's `flags` line captures exactly what XLA:CPU AOT
    compilation specializes on; hashing it (plus the machine arch)
    keys the persistent cache per CPU type so entries never migrate
    across heterogeneous hosts.
    """
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line.strip()
                    break
    except OSError:
        pass
    raw = (platform.machine() + " " + flags).encode()
    return hashlib.sha1(raw).hexdigest()[:10]


def _default_compilation_cache():
    """Enable JAX's persistent compilation cache when the user hasn't.

    Remote/accelerator compiles dominate cold-start latency for every
    public entry point (each fitter pipeline is one large jitted
    program); a disk cache makes every process after the first start
    warm.  Respects any user configuration: an existing
    ``JAX_COMPILATION_CACHE_DIR`` env var or an already-set
    ``jax_compilation_cache_dir`` wins, and failures (read-only
    filesystems) are silently ignored.
    """
    if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        if _jax.config.jax_compilation_cache_dir is not None:
            return
        # CPU-only processes get NO persistent cache: this jaxlib's
        # XLA:CPU AOT serialization is machine-specialized outside the
        # cache key (cross-machine reload SIGSEGVs in cpu_aot_loader)
        # and aborts outright serializing the largest CPU executables.
        # The cache's whole value here is skipping the REMOTE (TPU
        # relay) compiles, which serialize fine.
        plats = (_jax.config.jax_platforms
                 or _os.environ.get("JAX_PLATFORMS") or "")
        if plats.strip().lower() == "cpu":
            return
        # Per-user path (uid suffix) created 0o700: on shared hosts a
        # world-writable fixed tempdir path would collide across users
        # and let any local user pre-seed the compiled-program cache.
        # The host CPU fingerprint is part of the path: XLA:CPU AOT
        # executables bake in the compile host's vector features, and
        # this jaxlib's cache key does NOT — reloading an entry written
        # on a different machine SIGSEGVs in cpu_aot_loader (observed:
        # a round-over-round driver VM change made every suite run
        # crash inside compilation_cache.get_executable_and_time).
        uid = _os.getuid() if hasattr(_os, "getuid") else "u"
        path = _os.path.join(_tempfile.gettempdir(),
                             f"frankenz_tpu_jax_cache_{uid}_{_host_tag()}")
        _os.makedirs(path, mode=0o700, exist_ok=True)
        if hasattr(_os, "getuid") and _os.stat(path).st_uid != _os.getuid():
            return  # pre-existing dir owned by someone else: don't trust it
        _jax.config.update("jax_compilation_cache_dir", path)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           0.5)
    except Exception:
        pass


_default_compilation_cache()

from . import config  # noqa: F401
from . import ops  # noqa: F401
from . import models  # noqa: F401
from . import fitting  # noqa: F401
from . import samplers  # noqa: F401
from . import sim  # noqa: F401
from . import parallel  # noqa: F401
from . import utils  # noqa: F401
from . import plotting  # noqa: F401
