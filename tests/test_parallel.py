"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from frankenz_tpu.parallel import (make_mesh, replicate, shard_objects,
                                   sharded_fit_predict_step,
                                   sharded_logprob, stacked_nz)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(8)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(21)
    nobj, nmodel, nfilt = 64, 50, 5
    models = rng.uniform(1, 10, (nmodel, nfilt))
    models_err = 0.1 * models
    models_mask = np.ones_like(models)
    data = rng.uniform(1, 10, (nobj, nfilt))
    data_err = np.full((nobj, nfilt), 0.3)
    data_mask = np.ones_like(data)
    return data, data_err, data_mask, models, models_err, models_mask


def test_sharded_logprob_matches_single_device(problem, mesh):
    from frankenz_tpu.ops import logprob

    d, de, dm, m, me, mm = problem
    want = np.asarray(logprob(d, de, dm, m, me, mm).lnprob)
    ds, des, dms = shard_objects(mesh, d, de, dm)
    mr, mer, mmr = replicate(mesh, m, me, mm)
    got = sharded_logprob(mesh)(ds, des, dms, mr, mer, mmr)
    np.testing.assert_allclose(np.asarray(got.lnprob), want, rtol=1e-12)
    # Output really is sharded over objects.
    assert len(got.lnprob.sharding.device_set) == 8


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    pdfs = np.asarray(out[0])
    assert pdfs.shape == (256, 301)
    np.testing.assert_allclose(pdfs.sum(axis=1), 1.0, atol=1e-4)


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_model_sharded_step_matches_replicated(problem):
    """2-D (objects x models) mesh: sharding the model axis reproduces
    the replicated-model results (logsumexp/threshold collectives)."""
    import jax.numpy as jnp

    from frankenz_tpu.ops import kde as K
    from frankenz_tpu.ops import likelihood as L
    from frankenz_tpu.parallel import (make_mesh_2d,
                                       model_sharded_fit_predict_step)
    from jax.sharding import NamedSharding, PartitionSpec as P

    d, de, dm, m, me, mm = problem
    rng = np.random.default_rng(5)
    G = np.asarray(K.kernel_matrix(rng.uniform(0, 3, m.shape[0]),
                                   np.full(m.shape[0], 0.1),
                                   np.linspace(0, 3, 64)))
    # Pad models to a multiple of the model-axis size (2).
    mesh2 = make_mesh_2d(4, 2)
    step = model_sharded_fit_predict_step(mesh2)
    ds = jax.device_put(d, NamedSharding(mesh2, P("objects")))
    des = jax.device_put(de, NamedSharding(mesh2, P("objects")))
    dms = jax.device_put(dm, NamedSharding(mesh2, P("objects")))
    ms, mes, mms, Gs = (jax.device_put(x, NamedSharding(mesh2, P("models")))
                        for x in (m, me, mm, G))
    pdf, lmap, levid = step(ds, des, dms, ms, mes, mms, Gs)

    res = L.logprob(d, de, dm, m, me, mm)
    lnp = res.lnprob
    want_lmap = jnp.max(lnp, axis=1)
    want_levid = jax.scipy.special.logsumexp(lnp, axis=1)
    wt = K.threshold_weights(jnp.exp(lnp - want_levid[:, None]), 1e-3,
                             None)
    want_pdf = wt @ jnp.asarray(G)
    want_pdf = want_pdf / want_pdf.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(lmap), np.asarray(want_lmap),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(levid), np.asarray(want_levid),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(want_pdf),
                               rtol=1e-8, atol=1e-12)


def test_ring_step_matches_single_device(problem, mesh):
    """Ring rotation (objects AND models sharded over the same 1-D axis,
    model shards ppermuted around the ring) == replicated results, for
    the exact-threshold two-rotation path and the flash-style
    single-rotation (wt_thresh=None) path."""
    import jax.numpy as jnp

    from frankenz_tpu.ops import kde as K
    from frankenz_tpu.ops import likelihood as L
    from frankenz_tpu.parallel import ring_fit_predict_step

    d, de, dm, m, me, mm = problem
    # Model count must divide the ring size.
    m, me, mm = m[:48], me[:48], mm[:48]
    rng = np.random.default_rng(5)
    G = np.asarray(K.kernel_matrix(rng.uniform(0, 3, 48),
                                   np.full(48, 0.1),
                                   np.linspace(0, 3, 64)))

    res = L.logprob(d, de, dm, m, me, mm)
    lnp = res.lnprob
    want_lmap = np.asarray(jnp.max(lnp, axis=1))
    want_levid = np.asarray(jax.scipy.special.logsumexp(lnp, axis=1))

    for wt_thresh in (1e-3, None):
        step = ring_fit_predict_step(mesh, wt_thresh=wt_thresh)
        ds, des, dms = shard_objects(mesh, d, de, dm)
        ms, mes, mms, Gs = shard_objects(mesh, m, me, mm, G)
        pdf, lmap, levid = step(ds, des, dms, ms, mes, mms, Gs)
        wt = jnp.exp(lnp - want_levid[:, None])
        if wt_thresh is not None:
            wt = K.threshold_weights(wt, wt_thresh, None)
        want_pdf = np.asarray(wt @ jnp.asarray(G))
        want_pdf = want_pdf / want_pdf.sum(axis=1, keepdims=True)
        np.testing.assert_allclose(np.asarray(lmap), want_lmap,
                                   rtol=1e-10, err_msg=str(wt_thresh))
        np.testing.assert_allclose(np.asarray(levid), want_levid,
                                   rtol=1e-10, err_msg=str(wt_thresh))
        np.testing.assert_allclose(np.asarray(pdf), want_pdf,
                                   rtol=1e-8, atol=1e-12,
                                   err_msg=str(wt_thresh))
        assert len(pdf.sharding.device_set) == 8


def test_ring_step_all_masked_object_returns_neg_inf(problem, mesh):
    """A fully-masked object must come back with lmap = levid = -inf and a
    zero PDF from the ring path too (same contract as the materializing
    and object-sharded paths) — not the finite finfo.min scan sentinel."""
    from frankenz_tpu.ops import kde as K
    from frankenz_tpu.parallel import ring_fit_predict_step

    d, de, dm, m, me, mm = problem
    m, me, mm = m[:48], me[:48], mm[:48]
    dm = dm.copy()
    dm[3] = 0.0  # object 3 has no usable bands anywhere
    rng = np.random.default_rng(5)
    G = np.asarray(K.kernel_matrix(rng.uniform(0, 3, 48),
                                   np.full(48, 0.1),
                                   np.linspace(0, 3, 64)))
    for wt_thresh in (1e-3, None):
        step = ring_fit_predict_step(mesh, wt_thresh=wt_thresh)
        ds, des, dms = shard_objects(mesh, d, de, dm)
        ms, mes, mms, Gs = shard_objects(mesh, m, me, mm, G)
        pdf, lmap, levid = step(ds, des, dms, ms, mes, mms, Gs)
        lmap, levid, pdf = (np.asarray(x) for x in (lmap, levid, pdf))
        assert lmap[3] == -np.inf, wt_thresh
        assert levid[3] == -np.inf, wt_thresh
        np.testing.assert_array_equal(pdf[3], 0.0)
        assert np.isfinite(lmap[[0, 1, 2]]).all()


def test_catalog_io(mesh):
    from frankenz_tpu.parallel import (catalog_batches,
                                       catalog_from_process_shards,
                                       process_shard_bounds)

    # Shard bounds partition [0, nobj) contiguously.
    bounds = [process_shard_bounds(103, i, 4) for i in range(4)]
    assert bounds[0][0] == 0 and bounds[-1][1] == 103
    for (a, b), (c, d) in zip(bounds, bounds[1:]):
        assert b == c
    # Single-process assembly places an object-sharded global array.
    x = np.arange(64 * 3, dtype=np.float32).reshape(64, 3)
    g = catalog_from_process_shards(mesh, {"phot": x}, 64)
    assert g["phot"].shape == (64, 3)
    assert len(g["phot"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(g["phot"]), x)
    # Batch iterator covers everything exactly once (incl. ragged tail).
    seen = []
    for start, n, batch in catalog_batches(g, 24):
        assert batch["phot"].shape[0] == n
        seen.append(np.asarray(batch["phot"]))
    np.testing.assert_array_equal(np.concatenate(seen), x)


def test_stacked_nz(problem, mesh):
    rng = np.random.default_rng(3)
    pdfs = rng.uniform(size=(64, 33))
    pdfs /= pdfs.sum(axis=1, keepdims=True)
    nz = np.asarray(stacked_nz(mesh, shard_objects(mesh, pdfs)))
    np.testing.assert_allclose(nz, pdfs.sum(axis=0), rtol=1e-10)


def test_bruteforce_mesh_fit_predict_matches_single_device():
    """BruteForce.fit_predict(mesh=...) == single-device results, for
    both the XLA composition and the Pallas kernel (interpret mode)
    running per-shard under shard_map."""
    import numpy as np
    from frankenz_tpu.models import BruteForce
    from frankenz_tpu.ops import kernel_matrix
    from frankenz_tpu.parallel import make_mesh

    rng = np.random.default_rng(21)
    M, B, F = 200, 50, 5
    m = rng.uniform(1, 10, (M, F)).astype(np.float32)
    me = (0.05 * m).astype(np.float32)
    mm = np.ones_like(m)
    d = (m[rng.integers(0, M, B)] + rng.normal(0, 0.3, (B, F))).astype(
        np.float32)
    de = np.full((B, F), 0.3, np.float32)
    dm = np.ones_like(d)
    zlab = rng.uniform(0, 3, M)
    zerr = np.full(M, 0.1)
    grid = np.linspace(0, 3, 101)

    mesh = make_mesh(8)
    bf = BruteForce(m, me, mm)
    single, (lm0, le0) = bf.fit_predict(d, de, dm, zlab, zerr,
                                        label_grid=grid, verbose=False,
                                        return_gof=True, use_fused=False)
    # XLA per-shard path.
    sharded, (lm1, le1) = bf.fit_predict(d, de, dm, zlab, zerr,
                                         label_grid=grid, verbose=False,
                                         return_gof=True, mesh=mesh,
                                         use_fused=False, batch_size=32)
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(lm1, lm0, rtol=1e-5)
    np.testing.assert_allclose(le1, le0, rtol=1e-5)
    # Pallas per-shard path (interpret mode off-TPU).
    sharded_p = bf.fit_predict(d, de, dm, zlab, zerr, label_grid=grid,
                               verbose=False, mesh=mesh, use_fused=True,
                               batch_size=32)
    np.testing.assert_allclose(sharded_p, single, rtol=1e-3, atol=1e-5)
    # save_fits over a mesh is refused loudly.
    import pytest
    with pytest.raises(ValueError, match="mesh"):
        bf.fit_predict(d, de, dm, zlab, zerr, label_grid=grid,
                       verbose=False, mesh=mesh, save_fits=True)


def test_bruteforce_mesh_wide_grid_routes_xla(monkeypatch):
    """Wide serving grids (padded Ngrid >= _WIDE_GRID_XLA_GP) must route
    the SHARDED auto-dispatch through the XLA dense stack too — the
    measured-15%-faster path at Gp >= 2048 (docs/MXU_NOTE.md section 8)
    used to be skipped whenever mesh= was set.  Simulated TPU dispatch
    (pallas_supported patched True) with the recorded `use_pallas` flag
    asserted False; the XLA local step then runs fine on the CPU mesh
    and must match the single-device wide-grid result."""
    import numpy as np
    import frankenz_tpu.models.bruteforce as bf_mod
    from frankenz_tpu.models import BruteForce
    from frankenz_tpu.parallel import make_mesh

    rng = np.random.default_rng(27)
    M, B, F = 150, 40, 5
    m = rng.uniform(1, 10, (M, F)).astype(np.float32)
    me = (0.05 * m).astype(np.float32)
    mm = np.ones_like(m)
    d = (m[rng.integers(0, M, B)] + rng.normal(0, 0.3, (B, F))).astype(
        np.float32)
    de = np.full((B, F), 0.3, np.float32)
    dm = np.ones_like(d)
    zlab = rng.uniform(0, 3, M)
    zerr = np.full(M, 0.1)
    grid = np.linspace(0, 3, bf_mod._WIDE_GRID_XLA_GP + 1)  # padded >= cap

    mesh = make_mesh(8)
    bf = BruteForce(m, me, mm)
    single = bf.fit_predict(d, de, dm, zlab, zerr, label_grid=grid,
                            verbose=False, use_fused=False)

    recorded = {}
    orig_step = bf_mod._sharded_fp_step

    def record_step(mesh_, obj_axis, use_pallas, *a, **k):
        recorded["use_pallas"] = use_pallas
        return orig_step(mesh_, obj_axis, False, *a, **k)

    monkeypatch.setattr(bf_mod._fused, "pallas_supported", lambda: True)
    monkeypatch.setattr(bf_mod, "_sharded_fp_step", record_step)
    sharded = bf.fit_predict(d, de, dm, zlab, zerr, label_grid=grid,
                             verbose=False, mesh=mesh, batch_size=32)
    assert recorded["use_pallas"] is False
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-7)
    # A NARROW grid under the same simulated TPU dispatch still selects
    # the kernel for the sharded step (the routing is grid-width-keyed).
    recorded.clear()
    bf.fit_predict(d, de, dm, zlab, zerr,
                   label_grid=np.linspace(0, 3, 101), verbose=False,
                   mesh=mesh, batch_size=32)
    assert recorded["use_pallas"] is True


def test_knn_mesh_fit_predict_matches_single_device():
    """NearestNeighbors.fit_predict(mesh=...) == single-device results
    (same host RNG stream -> identical jitters -> identical unions)."""
    import numpy as np
    from frankenz_tpu.models import NearestNeighbors
    from frankenz_tpu.ops import PDFDict
    from frankenz_tpu.parallel import make_mesh

    rng = np.random.default_rng(33)
    M, B, F = 400, 64, 4
    m = rng.uniform(1, 10, (M, F)).astype(np.float32)
    me = (0.05 * m).astype(np.float32)
    mm = np.ones_like(m)
    d = (m[rng.integers(0, M, B)] + rng.normal(0, 0.3, (B, F))).astype(
        np.float32)
    de = np.full((B, F), 0.3, np.float32)
    dm = np.ones_like(d)
    zlab = rng.uniform(0, 3, M)
    zerr = np.full(M, 0.1)
    grid = np.linspace(0, 3, 101)
    pd = PDFDict(grid, np.linspace(0.01, 0.3, 20))
    mesh = make_mesh(8)

    nn = NearestNeighbors(m, me, mm, K=5, seed=3, verbose=False)
    for labels in ({"label_grid": grid}, {"label_dict": pd}):
        single = nn.fit_predict(d, de, dm, zlab, zerr, k=8, verbose=False,
                                rng=np.random.default_rng(7),
                                batch_size=32, **labels)
        sharded = nn.fit_predict(d, de, dm, zlab, zerr, k=8, verbose=False,
                                 rng=np.random.default_rng(7),
                                 batch_size=32, mesh=mesh, **labels)
        np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-7,
                                   err_msg=str(labels))


def test_network_mesh_fit_predict_matches_single_device():
    """_Network.fit_predict(save_fits=False, mesh=...) == single device,
    for nodes_only and exact-union modes."""
    import numpy as np
    from frankenz_tpu.models import SelfOrganizingMap
    from frankenz_tpu.parallel import make_mesh

    rng = np.random.default_rng(44)
    M, B = 300, 48
    centers = np.array([[2.0, 5.0, 8.0], [8.0, 3.0, 2.0], [5.0, 9.0, 4.0]])
    zc = np.array([0.4, 1.2, 2.2])
    models = np.vstack([c + rng.normal(0, 0.3, (100, 3)) for c in centers])
    zlab = np.concatenate([z + rng.normal(0, 0.05, 100) for z in zc])
    me = np.full_like(models, 0.05)
    mm = np.ones_like(models)
    d = models[rng.integers(0, M, B)] + rng.normal(0, 0.1, (B, 3))
    de = np.full_like(d, 0.1)
    dm = np.ones_like(d)
    grid = np.linspace(0, 3, 101)
    zerr = np.full(M, 0.05)
    mesh = make_mesh(8)

    som = SelfOrganizingMap(models, me, mm)
    som.train_network(nside=3, nproj=2, niter=40, nbatch=10, seed=2,
                      verbose=False)
    som.populate_network(verbose=False, batch_size=64)
    for nodes_only in (True, False):
        kw = dict(label_grid=grid, nodes_only=nodes_only, verbose=False,
                  batch_size=16, max_neighbors=256, save_fits=False,
                  return_gof=True)
        single, (lm0, le0) = som.fit_predict(d, de, dm, zlab, zerr, **kw)
        sharded, (lm1, le1) = som.fit_predict(d, de, dm, zlab, zerr,
                                              mesh=mesh, **kw)
        np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-7,
                                   err_msg=f"nodes_only={nodes_only}")
        np.testing.assert_allclose(lm1, lm0, rtol=1e-5)
        np.testing.assert_allclose(le1, le0, rtol=1e-5)


def test_population_sampler_mesh_matches_single_device():
    """run_mcmc(mesh=...) shards objects with psum likelihood sums; the
    chain (same keys) matches the single-device run, including with a
    padded (non-divisible) object count."""
    import numpy as np
    from frankenz_tpu.samplers import population_sampler
    from frankenz_tpu.parallel import make_mesh

    rng = np.random.default_rng(9)
    nobs, nbins = 203, 12  # deliberately not a multiple of 8
    pdfs = rng.uniform(0.05, 1.0, (nobs, nbins))
    pdfs /= pdfs.sum(axis=1, keepdims=True)
    mesh = make_mesh(8)

    a = population_sampler(pdfs)
    a.run_mcmc(5, thin=20, seed=4, verbose=False)
    b = population_sampler(pdfs)
    b.run_mcmc(5, thin=20, seed=4, verbose=False, mesh=mesh)
    sa, la = a.results
    sb, lb = b.results
    # psum partial sums reorder the float reduction; trajectories agree
    # to roundoff (an acceptance flip would diverge macroscopically).
    np.testing.assert_allclose(sb, sa, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(lb, la, rtol=1e-6)


def test_hierarchical_sampler_mesh_recovers_truth():
    """run_mcmc(mesh=...) shards the categorical step (folded per-shard
    streams + psum counts): distribution-equivalent, so assert recovery
    quality rather than bitwise equality, with a padded object count."""
    import numpy as np
    from frankenz_tpu.samplers import hierarchical_sampler
    from frankenz_tpu.parallel import make_mesh

    rng = np.random.default_rng(3)
    nbins, nobs = 20, 403  # not a multiple of 8
    grid = np.arange(nbins)
    nz_true = np.exp(-0.5 * ((grid - 7.0) / 2.5) ** 2)
    nz_true /= nz_true.sum()
    ztrue = rng.choice(nbins, size=nobs, p=nz_true)
    sig = 0.8
    centers = ztrue + rng.normal(0, sig, nobs)
    pdfs = np.exp(-0.5 * ((grid[None, :] - centers[:, None]) / sig) ** 2)
    pdfs /= pdfs.sum(axis=1, keepdims=True)
    mesh = make_mesh(8)

    samp = hierarchical_sampler(pdfs)
    samp.run_mcmc(60, thin=5, seed=4, verbose=False, mesh=mesh)
    samples, lnps = samp.results
    assert samples.shape == (60, nbins)
    np.testing.assert_allclose(samples.sum(axis=1), 1.0, atol=1e-3)
    assert np.isfinite(lnps).all()
    post = samples[20:].mean(axis=0)
    emp = np.bincount(ztrue, minlength=nbins) / nobs
    assert abs(post @ grid - emp @ grid) < 0.3  # mean-z recovered
    # Padded rows contribute nothing: total counts stay at nobs, so the
    # posterior is not diluted toward uniform.
    assert np.abs(post - emp).sum() < 0.4


def test_catalog_process_shard_assembly_branch(mesh):
    """The multi-host assembly branch (make_array_from_process_local_data)
    produces the same sharded global arrays as the single-process
    shortcut, exercised via the process_count test seam."""
    from frankenz_tpu.parallel.io import (catalog_from_process_shards,
                                          process_shard_bounds)

    rng = np.random.default_rng(0)
    nobj = 64
    cat = {"phot": rng.uniform(1, 10, (nobj, 5)),
           "z": rng.uniform(0, 3, nobj)}
    fast = catalog_from_process_shards(mesh, cat, nobj)
    assembled = catalog_from_process_shards(mesh, cat, nobj,
                                            process_count=1)
    for k in cat:
        np.testing.assert_array_equal(np.asarray(assembled[k]),
                                      np.asarray(fast[k]))
        assert len(assembled[k].sharding.device_set) == 8
    # Bounds partition [0, nobj) disjointly for any host count.
    for pc in (1, 3, 8):
        spans = [process_shard_bounds(nobj, pi, pc) for pi in range(pc)]
        assert spans[0][0] == 0 and spans[-1][1] == nobj
        for (a, b), (c, d) in zip(spans, spans[1:]):
            assert b == c
