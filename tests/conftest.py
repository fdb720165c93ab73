"""Test configuration: virtual 8-device CPU mesh + float64 parity mode.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
are exercised without TPU hardware, and with x64 enabled so the JAX
implementations can be checked against the float64 NumPy oracle at <=1e-6
relative error (the BASELINE.md accuracy bar).

Note: this environment force-registers a remote-TPU ("axon") PJRT backend
via sitecustomize *before* conftest runs, so setting JAX_PLATFORMS here is
too late as an env var — but backend *initialization* is lazy, so
`jax.config.update("jax_platforms", "cpu")` still wins as long as it runs
before the first JAX operation.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: repeated suite runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
