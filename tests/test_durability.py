"""Mid-run durability: kill a fit/training run partway, resume from the
checkpoint, and reproduce the uninterrupted results exactly.

SURVEY.md section 5 (failure detection / elastic recovery): the reference
survives crashes only through fit state accumulating on `self`
(bruteforce.py:183-189) and has NO durability for its 100K-step network
training runs; here both are checkpointed at batch/segment granularity.
"""

import numpy as np
import pytest

from frankenz_tpu.models import (BruteForce, GrowingNeuralGas,
                                 NearestNeighbors, SelfOrganizingMap)
from frankenz_tpu.models import bruteforce as bf_mod
from frankenz_tpu.models import knn as knn_mod
from frankenz_tpu.models import networks as net_mod


@pytest.fixture()
def problem():
    rng = np.random.default_rng(17)
    models = rng.uniform(1, 10, (60, 4))
    data = models[rng.integers(0, 60, 40)] + rng.normal(0, 0.2, (40, 4))
    derr = np.full_like(data, 0.2)
    dmask = np.ones_like(data)
    return models, data, derr, dmask


def _bomb_after(monkeypatch, module, name, ncalls):
    """Replace module.name with a wrapper raising after `ncalls` calls."""
    orig = getattr(module, name)
    state = {"n": 0}

    def wrapper(*a, **k):
        state["n"] += 1
        if state["n"] > ncalls:
            raise RuntimeError("simulated crash")
        return orig(*a, **k)

    monkeypatch.setattr(module, name, wrapper)
    return orig


def test_bruteforce_fit_kill_and_resume(tmp_path, problem, monkeypatch):
    models, data, derr, dmask = problem
    ck = str(tmp_path / "bf_ck")

    ref = BruteForce(models, 0.05 * models, np.ones_like(models))
    ref.fit(data, derr, dmask, batch_size=8, verbose=False)

    orig = _bomb_after(monkeypatch, bf_mod, "_bf_lprob_jit", 2)
    crashed = BruteForce(models, 0.05 * models, np.ones_like(models))
    with pytest.raises(RuntimeError, match="simulated crash"):
        crashed.fit(data, derr, dmask, batch_size=8, checkpoint_every=1,
                    checkpoint_file=ck, verbose=False)
    assert crashed._fit_rows_done == 16  # two completed batches
    monkeypatch.setattr(bf_mod, "_bf_lprob_jit", orig)

    resumed = BruteForce(models, 0.05 * models, np.ones_like(models))
    resumed.fit(data, derr, dmask, batch_size=8, checkpoint_every=1,
                checkpoint_file=ck, resume=True, verbose=False)
    np.testing.assert_array_equal(resumed.fit_lnprob, ref.fit_lnprob)
    np.testing.assert_array_equal(resumed.fit_chi2, ref.fit_chi2)
    np.testing.assert_array_equal(resumed.fit_Ndim, ref.fit_Ndim)
    assert resumed._fit_rows_done == 40


def test_knn_fit_kill_and_resume(tmp_path, problem, monkeypatch):
    models, data, derr, dmask = problem
    ck = str(tmp_path / "knn_ck")
    mk = dict(K=3, seed=0, verbose=False)

    ref = NearestNeighbors(models, 0.05 * models, np.ones_like(models),
                           **mk)
    ref.fit(data, derr, dmask, k=4, batch_size=256,
            rng=np.random.default_rng(5), verbose=False)

    orig = _bomb_after(monkeypatch, knn_mod, "_knn_fit_batch_jit", 0)
    crashed = NearestNeighbors(models, 0.05 * models,
                               np.ones_like(models), **mk)
    with pytest.raises(RuntimeError, match="simulated crash"):
        crashed.fit(data, derr, dmask, k=4, batch_size=256,
                    rng=np.random.default_rng(5), checkpoint_every=1,
                    checkpoint_file=ck, verbose=False)
    monkeypatch.setattr(knn_mod, "_knn_fit_batch_jit", orig)

    # batch_size clamps to >=256 > ndata, so the crash hit batch 1 of 1
    # and nothing persisted — resume must redo the whole fit, consuming
    # the jitter stream identically (fresh rng with the same seed).
    resumed = NearestNeighbors(models, 0.05 * models,
                               np.ones_like(models), **mk)
    resumed.fit(data, derr, dmask, k=4, batch_size=256,
                rng=np.random.default_rng(5), checkpoint_every=1,
                checkpoint_file=ck, resume=True, verbose=False)
    np.testing.assert_array_equal(resumed.neighbors, ref.neighbors)
    np.testing.assert_array_equal(resumed.fit_lnprob, ref.fit_lnprob)


def test_network_fit_kill_and_resume(tmp_path, problem, monkeypatch):
    models, data, derr, dmask = problem
    ck = str(tmp_path / "net_ck")

    def build():
        som = SelfOrganizingMap(models, 0.05 * models,
                                np.ones_like(models))
        som.train_network(nside=4, nproj=2, niter=10, nbatch=5, seed=3,
                          verbose=False)
        som.populate_network(verbose=False)
        return som

    ref = build()
    ref.fit(data, derr, dmask, nodes_only=True, batch_size=8,
            verbose=False)

    crashed = build()
    orig = _bomb_after(monkeypatch, net_mod, "_node_fit_jit", 2)
    with pytest.raises(RuntimeError, match="simulated crash"):
        crashed.fit(data, derr, dmask, nodes_only=True, batch_size=8,
                    checkpoint_every=1, checkpoint_file=ck, verbose=False)
    monkeypatch.setattr(net_mod, "_node_fit_jit", orig)

    resumed = build()
    resumed.fit(data, derr, dmask, nodes_only=True, batch_size=8,
                checkpoint_every=1, checkpoint_file=ck, resume=True,
                verbose=False)
    np.testing.assert_array_equal(resumed.fit_lnprob, ref.fit_lnprob)
    np.testing.assert_array_equal(resumed.neighbors, ref.neighbors)


def test_som_chunked_training_matches_single_call(tmp_path, problem):
    models, _, _, _ = problem
    kw = dict(nside=4, nproj=2, niter=20, nbatch=5, seed=9, verbose=False)
    ref = SelfOrganizingMap(models, 0.05 * models, np.ones_like(models))
    ref.train_network(**kw)

    som = SelfOrganizingMap(models, 0.05 * models, np.ones_like(models))
    som.train_network(checkpoint_every=30,
                      checkpoint_file=str(tmp_path / "c1"), **kw)
    np.testing.assert_array_equal(som.nodes, ref.nodes)


def test_som_mega_kernel_chunked_matches_single_call(tmp_path, problem):
    models, _, _, _ = problem
    kw = dict(nside=4, nproj=2, niter=20, nbatch=5, seed=9, verbose=False,
              use_pallas=True)  # interpret mode on CPU
    ref = SelfOrganizingMap(models, 0.05 * models, np.ones_like(models))
    ref.train_network(**kw)

    som = SelfOrganizingMap(models, 0.05 * models, np.ones_like(models))
    som.train_network(checkpoint_every=40,
                      checkpoint_file=str(tmp_path / "c2"), **kw)
    np.testing.assert_allclose(som.nodes, ref.nodes, rtol=1e-6)


def test_som_training_kill_and_resume(tmp_path, problem, monkeypatch):
    models, _, _, _ = problem
    ck = str(tmp_path / "som_ck")
    kw = dict(nside=4, nproj=2, niter=20, nbatch=5, seed=9, verbose=False)
    ref = SelfOrganizingMap(models, 0.05 * models, np.ones_like(models))
    ref.train_network(**kw)

    orig = _bomb_after(monkeypatch, net_mod, "_som_train_jit", 2)
    crashed = SelfOrganizingMap(models, 0.05 * models,
                                np.ones_like(models))
    with pytest.raises(RuntimeError, match="simulated crash"):
        crashed.train_network(checkpoint_every=25, checkpoint_file=ck,
                              **kw)
    monkeypatch.setattr(net_mod, "_som_train_jit", orig)

    resumed = SelfOrganizingMap(models, 0.05 * models,
                                np.ones_like(models))
    resumed.train_network(checkpoint_every=25, checkpoint_file=ck,
                          resume=True, **kw)
    np.testing.assert_array_equal(resumed.nodes, ref.nodes)


def test_gng_chunked_training_and_resume(tmp_path, problem, monkeypatch):
    models, _, _, _ = problem
    ck = str(tmp_path / "gng_ck")
    kw = dict(niter=30, nbatch=5, max_nodes=20, seed=4, verbose=False)
    ref = GrowingNeuralGas(models, 0.05 * models, np.ones_like(models))
    ref.train_network(**kw)

    # Chunked == single call, bitwise.
    gng = GrowingNeuralGas(models, 0.05 * models, np.ones_like(models))
    gng.train_network(checkpoint_every=40,
                      checkpoint_file=str(tmp_path / "c3"), **kw)
    np.testing.assert_array_equal(gng.nodes, ref.nodes)
    np.testing.assert_array_equal(gng.edge_ages, ref.edge_ages)

    # Kill after two segments, resume to identical results.
    orig = _bomb_after(monkeypatch, net_mod, "_gng_train_jit", 2)
    crashed = GrowingNeuralGas(models, 0.05 * models,
                               np.ones_like(models))
    with pytest.raises(RuntimeError, match="simulated crash"):
        crashed.train_network(checkpoint_every=40, checkpoint_file=ck,
                              **kw)
    monkeypatch.setattr(net_mod, "_gng_train_jit", orig)
    resumed = GrowingNeuralGas(models, 0.05 * models,
                               np.ones_like(models))
    resumed.train_network(checkpoint_every=40, checkpoint_file=ck,
                          resume=True, **kw)
    np.testing.assert_array_equal(resumed.nodes, ref.nodes)
    np.testing.assert_array_equal(resumed.nodes_err, ref.nodes_err)
    np.testing.assert_array_equal(resumed.edge_ages, ref.edge_ages)


def test_checkpoint_every_without_file_fails_fast(problem):
    """checkpoint_every without checkpoint_file must raise BEFORE any
    batch runs (not crash at the first save, discarding the work the
    checkpoint was supposed to protect)."""
    models, data, derr, dmask = problem
    bf = BruteForce(models, 0.05 * models, np.ones_like(models))
    with pytest.raises(ValueError, match="checkpoint_file"):
        bf.fit(data, derr, dmask, checkpoint_every=2, verbose=False)
    nn = NearestNeighbors(models, 0.05 * models, np.ones_like(models),
                          K=2, seed=0, verbose=False)
    with pytest.raises(ValueError, match="checkpoint_file"):
        nn.fit(data, derr, dmask, k=3, checkpoint_every=2, verbose=False)
    som = SelfOrganizingMap(models, 0.05 * models, np.ones_like(models))
    with pytest.raises(ValueError, match="checkpoint_file"):
        som.train_network(nside=3, nproj=2, niter=4, nbatch=2, seed=0,
                          checkpoint_every=4, verbose=False)
    gng = GrowingNeuralGas(models, 0.05 * models, np.ones_like(models))
    with pytest.raises(ValueError, match="checkpoint_file"):
        gng.train_network(niter=4, nbatch=2, max_nodes=10, seed=0,
                          checkpoint_every=4, verbose=False)
