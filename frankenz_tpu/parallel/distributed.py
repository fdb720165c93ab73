"""
Multi-process (multi-host) runtime: `jax.distributed` initialization and
a certifiable local-cluster harness.

SURVEY.md section 5 (distributed backend): on a multi-host TPU slice each
host runs one JAX process, `jax.distributed.initialize` wires the
processes into one runtime (DCN for cross-host collectives + input
sharding), and the catalog enters through
`parallel.io.catalog_from_process_shards` — each host loads ONLY its
contiguous object block (`process_shard_bounds`) and the global
object-sharded array is assembled from the per-process shards.

`launch_local_cluster` certifies that seam with REAL processes: it
spawns N fresh Python workers on a virtual CPU platform (K local devices
each), initializes a `jax.distributed` cluster over localhost, and each
worker runs the end-to-end path — local shard load ->
`catalog_from_process_shards` (the `make_array_from_process_local_data`
branch a real slice executes) -> `sharded_fit_predict_step` over the
GLOBAL mesh -> `stacked_nz` (a psum crossing the process boundary) —
then asserts bitwise-level parity of its addressable PDF shards and the
replicated N(z) against a single-device reference.  Used by
`tests/test_distributed.py` and `__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

__all__ = ["initialize_distributed", "launch_local_cluster"]


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, **kwargs):
    """Initialize the multi-process JAX runtime (idempotent wrapper).

    On managed TPU slices every argument is discoverable and
    ``initialize_distributed()`` suffices (jax.distributed reads the
    cluster env); explicit arguments drive manual clusters — e.g. the
    local CPU cluster `launch_local_cluster` spawns.  Call it before
    the first JAX operation of each process.
    """
    import jax

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)
    return jax.process_index(), jax.process_count()


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_body(coordinator, num_processes, process_id, nobj, nmodel,
                 ngrid):
    """End-to-end multi-process worker (runs in a fresh subprocess).

    Asserts its own slice of the work against a locally-computed
    single-device reference; any mismatch exits nonzero.
    """
    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    initialize_distributed(coordinator_address=coordinator,
                           num_processes=num_processes,
                           process_id=process_id)
    assert jax.process_count() == num_processes, jax.process_count()

    import jax.numpy as jnp

    from ..ops import kde as _kde
    from ..ops import likelihood as _like
    from . import make_mesh, replicate, sharded_fit_predict_step, \
        stacked_nz
    from .io import catalog_from_process_shards, process_shard_bounds

    # Deterministic full catalog on every host (a real pipeline would
    # read only the local block from storage; the full copy here is the
    # parity reference).
    rng = np.random.default_rng(0)
    m = rng.uniform(1, 10, (nmodel, 5)).astype(np.float32)
    me = (0.05 * m).astype(np.float32)
    mm = np.ones_like(m)
    d = (m[rng.integers(0, nmodel, nobj)]
         + rng.normal(0, 0.3, (nobj, 5))).astype(np.float32)
    de = np.full((nobj, 5), 0.3, np.float32)
    dm = np.ones_like(d)
    G = np.asarray(_kde.kernel_matrix(
        rng.uniform(0, 3, nmodel), np.full(nmodel, 0.1),
        np.linspace(0, 3, ngrid)), np.float32)

    # THE multi-host input path: this host loads only its block; the
    # global object-sharded arrays assemble over the process boundary.
    start, stop = process_shard_bounds(nobj)
    mesh = make_mesh(jax.device_count())
    dG, deG, dmG = catalog_from_process_shards(
        mesh, (d[start:stop], de[start:stop], dm[start:stop]), nobj)
    assert not dG.is_fully_addressable  # really crossed processes
    mG, meG, mmG, GG = replicate(mesh, m, me, mm, G)

    step = sharded_fit_predict_step(mesh)
    pdfs, lmap, levid = step(dG, deG, dmG, mG, meG, mmG, GG)
    nz = stacked_nz(mesh, pdfs)  # psum across ICI *and* DCN
    jax.block_until_ready(nz)

    # Single-device reference (local compute, no mesh).
    res = _like.logprob(jnp.asarray(d), jnp.asarray(de), jnp.asarray(dm),
                        jnp.asarray(m), jnp.asarray(me), jnp.asarray(mm))
    lnp = res.lnprob
    lv = jax.scipy.special.logsumexp(lnp, axis=1)
    lm = jnp.max(lnp, axis=1)
    wt = jnp.exp(lnp - lv[:, None])
    ref = _kde.norm_rows(_kde.kde_stack(wt, jnp.asarray(G), 1e-3, None))
    ref_nz = np.asarray(jnp.sum(ref, axis=0))

    # Parity: every addressable PDF/GOF shard row-for-row, and the
    # replicated cross-process N(z) reduction.
    for arr, want in ((pdfs, np.asarray(ref)),
                      (lmap, np.asarray(lm)), (levid, np.asarray(lv))):
        for shard in arr.addressable_shards:
            sl = shard.index[0]
            np.testing.assert_allclose(np.asarray(shard.data), want[sl],
                                       rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nz), ref_nz, rtol=1e-5,
                               atol=1e-6)
    print(f"[proc {process_id}/{num_processes}] multi-process parity OK "
          f"(devices local={jax.local_device_count()} "
          f"global={jax.device_count()}, rows {start}:{stop})",
          flush=True)


def launch_local_cluster(num_processes=2, local_devices=4, nobj=64,
                         nmodel=96, ngrid=65, timeout=600):
    """Run the multi-process certification on a local CPU cluster.

    Spawns `num_processes` fresh Python workers, each with
    `local_devices` virtual CPU devices, wired into one jax.distributed
    runtime over a localhost coordinator; every worker runs
    `_worker_body` (catalog shard assembly -> global-mesh sharded fit ->
    cross-process psum -> parity asserts) and must exit 0.
    """
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    code = (
        "import sys; sys.path.insert(0, {repo!r})\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from frankenz_tpu.parallel.distributed import _worker_body\n"
        "_worker_body({coord!r}, {np_}, {pid}, {nobj}, {nmodel}, "
        "{ngrid})\n")
    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if not f.startswith(
                     "--xla_force_host_platform_device_count")]
        flags.append(
            f"--xla_force_host_platform_device_count={local_devices}")
        env["XLA_FLAGS"] = " ".join(flags)
        # Workers must not inherit a compilation-cache dir pointed at
        # TPU artifacts; isolate per-cluster.
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c",
             code.format(repo=repo, coord=coordinator, np_=num_processes,
                         pid=pid, nobj=nobj, nmodel=nmodel, ngrid=ngrid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    fail = None
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            fail = fail or f"worker {pid} timed out"
        outs.append(out)
        if p.returncode != 0 and fail is None:
            fail = (f"worker {pid} rc={p.returncode}\n"
                    f"--- worker {pid} output ---\n{out[-2000:]}")
    if fail:
        raise RuntimeError(f"local cluster failed: {fail}")
    return outs
