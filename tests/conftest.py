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

# NO persistent compilation cache for the CPU suite: this jaxlib's
# XLA:CPU AOT executable serialization is machine-feature-specialized
# but NOT part of the cache key, and on some driver VMs it hard-crashes
# the process — reloading an entry written on a different CPU SIGSEGVs
# in cpu_aot_loader, and serializing the biggest executables (the
# sampler mega-programs) aborts outright ("Fatal Python error:
# Aborted" in compilation_cache.put_executable_and_time, reproducible
# at tests/test_samplers.py on the round-5 VM).  CPU compiles are
# local and cheap relative to the relay's; correctness wins.
jax.config.update("jax_compilation_cache_dir", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    On single-core driver VMs, XLA:CPU's in-process LLVM JIT becomes
    unstable after a few hundred compiled programs accumulate in one
    process — the suite segfaulted/aborted inside
    `backend_compile_and_load` (and, when the persistent cache was on,
    inside its read/write paths) at ~85% regardless of which test got
    there, while every crashing test passes in isolation.  Clearing
    caches at module boundaries bounds the resident compiled-program
    state; within-module jit reuse (what tests/test_recompile.py pins,
    via before/after deltas) is unaffected.
    """
    yield
    jax.clear_caches()
    gc.collect()
