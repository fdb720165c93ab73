"""Recompile-hygiene tests: repeated public calls must not recompile.

Every hot path routes through module-level jitted functions whose cache
keys are static specs (never per-call closures) — a per-call `jax.jit`
closure recompiles every public call, which costs ~15 s each over a
remote-TPU relay.  These tests pin that property by asserting the jit
cache sizes of the module-level functions do not grow on a SECOND round
of identical calls from FRESH instances.
"""

import numpy as np
import pytest

from frankenz_tpu.models import SelfOrganizingMap
from frankenz_tpu.models import networks as _net
from frankenz_tpu.ops import PDFDict
from frankenz_tpu.samplers import population_sampler
from frankenz_tpu.samplers import population as _pop


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(11)
    centers = np.array([[2.0, 5.0, 8.0], [8.0, 3.0, 2.0],
                        [5.0, 9.0, 4.0], [9.0, 8.0, 7.0]])
    zc = np.array([0.3, 1.0, 1.8, 2.6])
    nper = 50
    models = np.vstack([c + rng.normal(0, 0.3, (nper, 3)) for c in centers])
    zlab = np.concatenate([z + rng.normal(0, 0.05, nper) for z in zc])
    models_err = np.full_like(models, 0.05)
    models_mask = np.ones_like(models)
    data = models[::10] + rng.normal(0, 0.1, models[::10].shape)
    data_err = np.full_like(data, 0.1)
    data_mask = np.ones_like(data)
    return models, models_err, models_mask, zlab, data, data_err, data_mask


def _drive_network(problem, seed):
    models, me, mm, zlab, data, de, dm = problem
    som = SelfOrganizingMap(models, me, mm)
    som.train_network(nside=3, nproj=2, niter=50, nbatch=10, seed=seed,
                      verbose=False)
    som.populate_network(verbose=False, batch_size=64)
    grid = np.linspace(0.0, 3.5, 51)
    pd = PDFDict(grid, np.linspace(0.01, 0.3, 20))
    som.get_pdfs(zlab, np.full_like(zlab, 0.05), label_dict=pd,
                 verbose=False, batch_size=32)
    # nodes_only path
    som.fit(data, de, dm, nodes_only=True, verbose=False, batch_size=32)
    som.predict(zlab, np.full_like(zlab, 0.05), label_dict=pd,
                verbose=False, batch_size=32)
    # exact-union path
    som.fit(data, de, dm, nodes_only=False, verbose=False, batch_size=32,
            max_neighbors=256)
    som.predict(zlab, np.full_like(zlab, 0.05), label_dict=pd,
                verbose=False, batch_size=32)


def test_network_second_instance_zero_recompiles(problem):
    _drive_network(problem, seed=3)
    watch = {
        "som_train": _net._som_train_jit,
        "populate": _net._populate_batch_jit,
        "node_fit": _net._node_fit_jit,
        "gather_union": _net._gather_union_jit,
        "node_pdf_weights": _net._node_pdf_weights_jit,
        "density_scale": _net._density_scale_jit,
        "stack_node_pdfs": _net._stack_node_pdfs_jit,
    }
    before = {k: f._cache_size() for k, f in watch.items()}
    assert all(v > 0 for k, v in before.items() if k != "node_fit"), before
    # Fresh instance, same seed: identical shapes + static specs, new
    # object identities — any cache growth is closure-identity disease.
    _drive_network(problem, seed=3)
    after = {k: f._cache_size() for k, f in watch.items()}
    assert after == before, (before, after)


def test_population_sampler_bound_prior_compiles_once(problem):
    rng = np.random.default_rng(5)
    pdfs = rng.uniform(0.1, 1.0, (40, 12))
    pdfs /= pdfs.sum(axis=1, keepdims=True)

    def prior(pos, strength=1.0):
        import jax.numpy as jnp
        return -strength * jnp.sum(pos**2)

    samp = population_sampler(pdfs)
    samp.run_mcmc(3, logprior_nz=prior, prior_kwargs={"strength": 2.0},
                  thin=5, seed=0, verbose=False)
    before = _pop._pop_run._cache_size()
    samp2 = population_sampler(pdfs)
    samp2.run_mcmc(3, logprior_nz=prior, prior_kwargs={"strength": 2.0},
                   thin=5, seed=1, verbose=False)
    assert _pop._pop_run._cache_size() == before
    # A genuinely different binding SHOULD recompile (new static key).
    samp3 = population_sampler(pdfs)
    samp3.run_mcmc(3, logprior_nz=prior, prior_kwargs={"strength": 3.0},
                   thin=5, seed=2, verbose=False)
    assert _pop._pop_run._cache_size() == before + 1
