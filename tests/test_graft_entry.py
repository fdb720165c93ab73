"""Driver-environment smoke tests for `__graft_entry__`.

Round-1 regression: `dryrun_multichip` inherited whatever platform the
parent process had initialized (the forced single-chip remote-TPU
backend) and crashed. These tests invoke the graft entry points in fresh
subprocesses WITHOUT conftest's in-process CPU forcing, exactly as the
driver does, asserting rc==0 — so the fix (subprocess + forced virtual
CPU platform inside `dryrun_multichip` itself) can never regress
silently.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code, extra_env=None, timeout=600):
    env = dict(os.environ)
    # Emulate the driver: no conftest, no parent-side platform forcing.
    env.pop("JAX_PLATFORMS", None)
    if extra_env:
        env.update(extra_env)
    return subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


def test_dryrun_multichip_subprocess_default_env():
    # The recorded-red round-1 deliverable: must pass with NO help from
    # the caller's environment (dryrun_multichip forces its own CPU
    # platform in a child process).
    proc = _run("import __graft_entry__; __graft_entry__.dryrun_multichip(8)")
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "OK on 8 devices" in proc.stdout
    assert "2-D (4x2 obj x model) mesh OK" in proc.stdout


def test_dryrun_multichip_odd_device_count():
    # 1-D path must also work for counts that don't admit the 2-D mesh.
    proc = _run("import __graft_entry__; __graft_entry__.dryrun_multichip(3)")
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "OK on 3 devices" in proc.stdout


def test_entry_compiles_subprocess():
    # entry() must build args and jit-compile on a bare platform. CPU is
    # forced in the child via jax.config (NOT conftest) to keep the test
    # hermetic — the driver compile-checks the same fn single-chip.
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import jax.numpy as jnp\n"
        "import __graft_entry__\n"
        "fn, args = __graft_entry__.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "jax.block_until_ready(out)\n"
        "pdf, lmap, levid = out\n"
        "assert pdf.shape == (256, 301), pdf.shape\n"
        "assert bool(jnp.isfinite(levid).all())\n"
        "print('ENTRY_OK')\n"
    )
    proc = _run(code)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "ENTRY_OK" in proc.stdout
