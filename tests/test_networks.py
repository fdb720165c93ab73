"""SOM / GNG / _Network tests."""

import numpy as np
import pytest

from frankenz_tpu.models import (BruteForce, GrowingNeuralGas,
                                 SelfOrganizingMap, learn_geometric,
                                 learn_harmonic, learn_linear,
                                 neighbor_gauss, neighbor_lorentz)


def test_learning_schedules():
    np.testing.assert_allclose(float(learn_linear(0.0)), 0.5)
    np.testing.assert_allclose(float(learn_linear(1.0)), 0.1)
    np.testing.assert_allclose(float(learn_geometric(0.5)),
                               np.exp(0.5 * (np.log(0.5) + np.log(0.1))))
    np.testing.assert_allclose(float(learn_harmonic(0.5)),
                               1.0 / (0.5 / 0.5 + 0.5 / 0.1))


def test_neighborhood_kernels():
    pos = np.array([0.0, 0.0])
    positions = np.array([[0.0, 0.0], [1.0, 0.0], [3.0, 4.0]])
    wt, sigma = neighbor_gauss(0.0, pos, positions, nside=10)
    sig = 0.7 * 10
    want = np.exp(-0.5 * np.array([0.0, 1.0, 25.0]) / sig**2)
    np.testing.assert_allclose(np.asarray(wt), want, rtol=1e-6)
    wt, sigma = neighbor_lorentz(1.0, pos, positions, nside=10)
    sig = 0.02 * 10
    want = sig**2 / (np.array([0.0, 1.0, 25.0]) + sig**2)
    np.testing.assert_allclose(np.asarray(wt), want, rtol=1e-6)


@pytest.fixture(scope="module")
def blob_problem():
    """Models clustered around 4 blobs in 3-band flux space, with a
    redshift label tied to the blob."""
    rng = np.random.default_rng(42)
    centers = np.array([[2.0, 5.0, 8.0], [8.0, 3.0, 2.0],
                        [5.0, 9.0, 4.0], [9.0, 8.0, 7.0]])
    zc = np.array([0.3, 1.0, 1.8, 2.6])
    nper = 100
    models = np.vstack([c + rng.normal(0, 0.3, (nper, 3)) for c in centers])
    zlab = np.concatenate([z + rng.normal(0, 0.05, nper) for z in zc])
    models_err = np.full_like(models, 0.05)
    models_mask = np.ones_like(models)
    return models, models_err, models_mask, zlab, centers, zc


def _train_som(blob_problem, nside=4):
    models, me, mm, zlab, centers, zc = blob_problem
    som = SelfOrganizingMap(models, me, mm)
    som.train_network(nside=nside, nproj=2, niter=100, nbatch=20, seed=3,
                      verbose=False)
    return som


def test_som_training_and_lattice(blob_problem):
    models, me, mm, zlab, centers, zc = blob_problem
    som = _train_som(blob_problem)
    assert som.nodes.shape == (16, 3)
    assert som.NNODE == 16 and som.NPROJ == 2
    # Lattice positions enumerate the grid.
    pos = {tuple(p) for p in som.nodes_pos}
    assert pos == {(float(i), float(j)) for i in range(4) for j in range(4)}
    # Nodes live near the data manifold (within the blob bounding box).
    assert som.nodes.min() > models.min() - 1.0
    assert som.nodes.max() < models.max() + 1.0
    # Every blob center has a node nearby (free-scale fit: compare colors;
    # here absolute distance works since scales ~1).
    for c in centers:
        d = np.sqrt(((som.nodes - c) ** 2).sum(axis=1)).min()
        assert d < 2.0


def test_populate_and_node_access(blob_problem):
    models, me, mm, zlab, centers, zc = blob_problem
    som = _train_som(blob_problem)
    som.populate_network(verbose=False)
    assert som.nodes_Nmatch.sum() >= som.NMODEL  # soft assign >= 1 node
    assert som.nodes_Nbmu.sum() == som.NMODEL   # every model has one BMU
    assert np.isfinite(som.models_levid).all()
    # get_node returns consistent members.
    idx, node, npos, idxs, logwts, scales, serr = som.get_node(idx=0)
    assert len(idxs) == som.nodes_Nmatch[0]
    assert np.all(idxs >= 0)
    # Per-model weights across nodes sum to ~1 (normalized in log space).
    wts = np.zeros(som.NMODEL)
    for i in range(som.NNODE):
        _, _, _, idxs, logwts, _, _ = som.get_node(idx=i)
        wts[idxs] += np.exp(logwts)
    np.testing.assert_allclose(wts, 1.0, rtol=1e-4)


def test_node_pdfs_density_scaling(blob_problem):
    models, me, mm, zlab, centers, zc = blob_problem
    som = _train_som(blob_problem)
    som.populate_network(verbose=False)
    grid = np.linspace(0, 3, 151)
    pdfs, (lmap, levid) = som.get_pdfs(zlab, np.full_like(zlab, 0.05),
                                       label_grid=grid, return_gof=True,
                                       verbose=False)
    assert pdfs.shape == (16, 151)
    occupied = som.nodes_Nmatch > 0
    # Node PDFs are scaled by exp(levid): total mass = sum exp(levid).
    np.testing.assert_allclose(pdfs.sum(axis=1)[occupied],
                               np.exp(levid[occupied]), rtol=1e-3)
    assert (pdfs.sum(axis=1)[~occupied] == 0).all()


def test_populate_tail_escalation_matches_single_phase(blob_problem,
                                                       monkeypatch):
    """Models overflowing the slim phase-1 membership slab are re-run at
    an escalated cap; the resulting member tables must be identical to a
    single-phase populate with a wide slab."""
    import frankenz_tpu.models.networks as nw

    models, me, mm, zlab, centers, zc = blob_problem
    # Large errors flatten the likelihood so each model genuinely matches
    # more than the phase-1 slab of nodes; 25 nodes > phase-1 cap of 16.
    me_wide = np.full_like(models, 5.0)
    som = SelfOrganizingMap(models, me_wide, mm)
    som.train_network(nside=5, nproj=2, niter=100, nbatch=20, seed=3,
                      verbose=False)
    som.populate_network(wt_thresh=1e-6, verbose=False)
    assert som.nodes_Nmatch.sum() > som.NMODEL * nw._POPULATE_PHASE1_CAP
    got = (som.nodes_Nmatch.copy(), som.nodes_idxs.copy(),
           som.nodes_logwts.copy(), som.nodes_scales.copy(),
           som.nodes_scales_err.copy(), som.models_lmap.copy(),
           som.models_levid.copy())
    monkeypatch.setattr(nw, "_POPULATE_PHASE1_CAP", 64)
    som.populate_network(wt_thresh=1e-6, verbose=False)
    np.testing.assert_array_equal(got[0], som.nodes_Nmatch)
    np.testing.assert_array_equal(got[1], som.nodes_idxs)
    np.testing.assert_array_equal(got[2], som.nodes_logwts)
    np.testing.assert_array_equal(got[3], som.nodes_scales)
    np.testing.assert_array_equal(got[4], som.nodes_scales_err)
    np.testing.assert_array_equal(got[5], som.models_lmap)
    np.testing.assert_array_equal(got[6], som.models_levid)


def test_nodes_only_fit_predict(blob_problem):
    models, me, mm, zlab, centers, zc = blob_problem
    som = _train_som(blob_problem)
    som.populate_network(verbose=False)
    rng = np.random.default_rng(0)
    truth = rng.integers(0, len(models), 50)
    data = models[truth] + rng.normal(0, 0.1, (50, 3))
    derr = np.full_like(data, 0.1)
    dmask = np.ones_like(data)
    grid = np.linspace(0, 3, 151)
    pdfs, (lmap, levid) = som.fit_predict(
        data, derr, dmask, zlab, np.full_like(zlab, 0.05),
        label_grid=grid, nodes_only=True, return_gof=True, verbose=False)
    assert pdfs.shape == (50, 151)
    np.testing.assert_allclose(pdfs.sum(axis=1), 1.0, atol=1e-4)
    # Point estimates recover the blob redshifts.
    zhat = grid[np.argmax(pdfs, axis=1)]
    ztrue = zlab[truth]
    assert np.median(np.abs(zhat - ztrue)) < 0.3


def test_exact_union_fit_matches_bruteforce(blob_problem):
    """With generous thresholds the union covers all relevant models, so
    network fits reduce to brute force."""
    models, me, mm, zlab, centers, zc = blob_problem
    som = _train_som(blob_problem)
    som.populate_network(wt_thresh=1e-6, verbose=False)
    rng = np.random.default_rng(1)
    truth = rng.integers(0, len(models), 20)
    data = models[truth] + rng.normal(0, 0.1, (20, 3))
    derr = np.full_like(data, 0.1)
    dmask = np.ones_like(data)
    grid = np.linspace(0, 3, 151)
    pdfs_net = som.fit_predict(
        data, derr, dmask, zlab, np.full_like(zlab, 0.05),
        label_grid=grid, nodes_only=False, wt_thresh=1e-6, verbose=False,
        max_sel_nodes=16, max_neighbors=512)
    bf = BruteForce(models, me, mm)
    pdfs_bf = bf.fit_predict(data, derr, dmask, zlab,
                             np.full_like(zlab, 0.05), label_grid=grid,
                             verbose=False)
    l1 = np.abs(pdfs_net - pdfs_bf).sum(axis=1)
    assert np.median(l1) < 0.1


def test_union_cap_raises(blob_problem):
    models, me, mm, zlab, centers, zc = blob_problem
    som = _train_som(blob_problem)
    som.populate_network(wt_thresh=1e-6, verbose=False)
    rng = np.random.default_rng(2)
    data = models[:8] + rng.normal(0, 0.1, (8, 3))
    with pytest.raises(ValueError, match="max_neighbors"):
        som.fit(data, np.full_like(data, 0.1), np.ones_like(data),
                wt_thresh=1e-6, verbose=False, max_sel_nodes=16,
                max_neighbors=8)


def test_som_single_step_update_rule():
    """One SOM step against the hand-computed reference rule
    (networks.py:1852-1865): nodes += rate * wt * (x - node) on the
    thresholded neighborhood."""
    rng = np.random.default_rng(0)
    models = rng.uniform(1, 10, (16, 3))
    me = np.full_like(models, 0.1)
    mm = np.ones_like(models)
    som = SelfOrganizingMap(models, me, mm)
    som.train_network(nside=2, nproj=2, niter=1, nbatch=1, seed=5,
                      verbose=False)
    # Replay: same init (nodes drawn with the same generator sequence)
    # and the same single training draw.
    rng2 = np.random.default_rng(5)
    init = models[rng2.choice(16, size=4, replace=False)]
    draw = rng2.integers(0, 16, size=1)[0]
    x = models[draw]
    # Free-scale error-free lnprob of x against the 4 initial nodes.
    iv = 1.0 / me[draw] ** 2
    inter = (init * (x * iv)).sum(axis=1)
    shape = (init**2 * iv).sum(axis=1)
    s = inter / shape
    chi2 = (((x - s[:, None] * init) ** 2) * iv).sum(axis=1)
    from scipy.special import gammaln

    a = 0.5 * (3 - 1)
    lnl = (a - 1) * np.log(chi2) - chi2 / 2 - gammaln(a) - np.log(2) * a
    bmu = int(np.argmax(lnl))
    pos = np.array([[0, 0], [0, 1], [1, 0], [1, 1]], float)
    sqd = ((pos[bmu] - pos) ** 2).sum(axis=1)
    rate = 1.0 / (1.0 / 0.5 + 0.0)  # learn_harmonic(t=0) = start = 0.5
    sigma = 0.7 * 2  # neighbor_gauss start * nside at t=0
    wt = np.exp(-0.5 * sqd / sigma**2)
    keep = wt > 1e-3 * wt.max()
    want = init + np.where(keep[:, None], rate * wt[:, None] * (x - init),
                           0.0)
    np.testing.assert_allclose(np.asarray(som.nodes), want, rtol=1e-5)


def test_gng_training(blob_problem):
    models, me, mm, zlab, centers, zc = blob_problem
    gng = GrowingNeuralGas(models, me, mm)
    gng.train_network(niter=40, nbatch=25, max_nodes=30, seed=5,
                      verbose=False)
    assert 2 < gng.NNODE <= 30
    assert gng.nodes.shape == (gng.NNODE, 3)
    # Edges reference alive nodes only and are symmetric by construction.
    e = gng.edges()
    assert (e >= 0).all() and (e < gng.NNODE).all()
    assert len(e) >= 1
    # Nodes track the data manifold.
    assert gng.nodes.min() > models.min() - 2.0
    assert gng.nodes.max() < models.max() + 2.0
    # The trained GNG supports the full network workflow.
    gng.populate_network(verbose=False)
    assert gng.nodes_Nbmu.sum() == gng.NMODEL
    grid = np.linspace(0, 3, 151)
    pdfs = gng.get_pdfs(zlab, np.full_like(zlab, 0.05), label_grid=grid,
                        verbose=False)
    assert pdfs.shape == (gng.NNODE, 151)


class _FixedRng:
    """Deterministic rng stand-in: hands train_network a preset draw
    array (and node pair), so split-vs-continuous runs see the exact
    same object stream."""

    def __init__(self, draws, pair=(0, 1)):
        self._draws = np.asarray(draws)
        self._pair = np.asarray(pair)

    def integers(self, low, high=None, size=None):
        assert size == len(self._draws)
        return self._draws

    def choice(self, n, size=2, replace=False):
        return self._pair


def test_gng_graph_init_resumes_training(blob_problem):
    """graph_init continues training from an exported graph
    (networks.py:2132-2156): a run split into two train_network calls
    bridged by export_graph() reproduces the uninterrupted run exactly
    (same draws; ages are absolute in the export, so the pruning
    schedule is preserved)."""
    models, me, mm, zlab, centers, zc = blob_problem
    rng = np.random.default_rng(11)
    draws = rng.integers(0, len(models), 600)
    kw = dict(nbatch=25, max_nodes=30, verbose=False)

    full = GrowingNeuralGas(models, me, mm)
    full.train_network(niter=24, rng=_FixedRng(draws, (3, 7)), **kw)

    part = GrowingNeuralGas(models, me, mm)
    part.train_network(niter=12, rng=_FixedRng(draws[:300], (3, 7)), **kw)
    # Exact resume requires the half-way alive set to be the slot prefix
    # (no mid-run deaths): compaction then preserves slot numbering.
    assert part.NNODE == 2 + 12  # one insert per block, no deaths
    resumed = GrowingNeuralGas(models, me, mm)
    resumed.train_network(niter=12, rng=_FixedRng(draws[300:]),
                          graph_init=part.export_graph(), **kw)

    assert resumed.NNODE == full.NNODE
    np.testing.assert_allclose(resumed.nodes, full.nodes, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(resumed.nodes_err, full.nodes_err,
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_array_equal(resumed.edge_ages, full.edge_ages)
    # A trained instance is itself accepted as graph_init.
    again = GrowingNeuralGas(models, me, mm)
    again.train_network(niter=12, rng=_FixedRng(draws[300:]),
                        graph_init=part, **kw)
    np.testing.assert_array_equal(again.edge_ages, full.edge_ages)


def test_gng_graph_init_networkx_and_errors(blob_problem):
    """The reference's own graph_init form — a networkx.Graph with
    pos/error/age attributes — seeds the dense state; malformed inputs
    refuse loudly."""
    nx = pytest.importorskip("networkx")
    models, me, mm, zlab, centers, zc = blob_problem
    g = nx.Graph()
    g.add_node("a", pos=models[0], error=0.5)
    g.add_node("b", pos=models[100], error=0.0)
    g.add_node("c", pos=models[200])
    g.add_edge("a", "b", age=3)
    g.add_edge("b", "c")
    gng = GrowingNeuralGas(models, me, mm)
    gng.train_network(niter=8, nbatch=25, max_nodes=30, seed=2,
                      graph_init=g, verbose=False)
    assert gng.NNODE >= 3
    assert len(gng.edges()) >= 1

    from frankenz_tpu.models.networks import _gng_seed_state
    pos0, err0, alive0, ids0, sref0, c0 = _gng_seed_state(g, 30, 3)
    assert alive0[:3].all() and not alive0[3:].any()
    np.testing.assert_allclose(err0[:3], [0.5, 0.0, 0.0])
    # Seeded ages materialize as c - sref = [3, 0] on node b's slots.
    assert sorted((c0[1] - sref0[1])[ids0[1] >= 0].tolist()) == [0, 3]

    with pytest.raises(ValueError, match="at least 2"):
        _gng_seed_state({"pos": models[:1]}, 30, 3)
    with pytest.raises(ValueError, match="max_nodes"):
        _gng_seed_state({"pos": models[:31]}, 30, 3)
    with pytest.raises(TypeError, match="graph_init"):
        _gng_seed_state(42, 30, 3)
    big = nx.star_graph(40)  # hub degree 40 > K=32
    for node in big.nodes():
        big.add_node(node, pos=models[node])
    with pytest.raises(ValueError, match="more than 32"):
        _gng_seed_state(big, 60, 3)


def test_fit_predict_save_fits_false_matches(blob_problem):
    """save_fits=False streams fused batches; results match the
    materializing fit()+predict() path on both prediction modes."""
    from frankenz_tpu.ops import PDFDict

    models, me, mm, zlab, centers, zc = blob_problem
    som = _train_som(blob_problem)
    som.populate_network(verbose=False)
    rng = np.random.default_rng(5)
    truth = rng.integers(0, len(models), 40)
    data = models[truth] + rng.normal(0, 0.1, (40, 3))
    derr = np.full_like(data, 0.1)
    dmask = np.ones_like(data)
    grid = np.linspace(0, 3, 151)
    pd = PDFDict(grid, np.linspace(0.01, 0.3, 30))
    zerr = np.full_like(zlab, 0.05)

    for nodes_only in (True, False):
        for labels in ({"label_grid": grid}, {"label_dict": pd}):
            kw = dict(nodes_only=nodes_only, verbose=False, batch_size=16,
                      max_neighbors=512, return_gof=True, **labels)
            a, (lm_a, le_a) = som.fit_predict(
                data, derr, dmask, zlab, zerr, save_fits=True, **kw)
            b, (lm_b, le_b) = som.fit_predict(
                data, derr, dmask, zlab, zerr, save_fits=False, **kw)
            np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-7,
                                       err_msg=str((nodes_only, labels)))
            np.testing.assert_allclose(lm_b, lm_a, rtol=1e-5)
            np.testing.assert_allclose(le_b, le_a, rtol=1e-5)


def test_som_pallas_mega_kernel_matches_scan(blob_problem):
    """The whole-training-run Pallas kernel (interpret mode on CPU)
    reproduces the lax.scan path: same draws, same update math."""
    models, me, mm, zlab, centers, zc = blob_problem
    kw = dict(nside=4, nproj=2, niter=40, nbatch=10, seed=9,
              verbose=False)
    a = SelfOrganizingMap(models, me, mm)
    a.train_network(use_pallas=False, **kw)
    b = SelfOrganizingMap(models, me, mm)
    b.train_network(use_pallas=True, **kw)
    # f32 op-order differences can flip a BMU tie; on this short run the
    # trajectories stay numerically locked.
    np.testing.assert_allclose(b.nodes, a.nodes, rtol=2e-4, atol=2e-4)
    # Ineligible configs refuse loudly.
    import pytest as _pytest
    with _pytest.raises(ValueError, match="use_pallas"):
        c = SelfOrganizingMap(models, me, mm)
        c.train_network(use_pallas=True, track_scale=True, **kw)


def test_som_pallas_mega_kernel_masked_bands():
    """Masked / zero-error bands drop out via iv=0 exactly like the scan
    path's clean_data semantics.  (At most one bad band per object:
    free-scale draws with Ndim <= 2 have chi2 ~ 0 for every node, and
    the two implementations break the resulting tie differently.)"""
    rng = np.random.default_rng(8)
    centers = rng.uniform(2, 9, (4, 5))
    models = np.vstack([c + rng.normal(0, 0.3, (80, 5)) for c in centers])
    me2 = np.full_like(models, 0.05)
    mm2 = np.ones_like(models)
    me2[::7, 0] = 0.0       # zero-error band -> cleaned out
    mm2[1::5, 2] = 0.0      # masked band
    kw = dict(nside=3, nproj=2, niter=30, nbatch=10, seed=2,
              verbose=False)
    a = SelfOrganizingMap(models, me2, mm2)
    a.train_network(use_pallas=False, **kw)
    b = SelfOrganizingMap(models, me2, mm2)
    b.train_network(use_pallas=True, **kw)
    np.testing.assert_allclose(b.nodes, a.nodes, rtol=2e-4, atol=2e-4)


def test_som_mega_kernel_vmem_bound():
    """Lattices whose VMEM-resident buffers exceed the mega-kernel's
    node cap must refuse use_pallas=True (and never auto-select it)
    instead of failing at Mosaic compile time on hardware.  The
    lane-oriented kernel's cap is 32768 nodes (nside 182 at nproj=2;
    round-2's node-per-sublane layout capped at 7680)."""
    rng = np.random.default_rng(0)
    m = rng.uniform(1, 10, (40000, 3)).astype(np.float32)
    som = SelfOrganizingMap(m, 0.05 * m, np.ones_like(m))
    with pytest.raises(ValueError, match="nodes"):
        som.train_network(nside=182, nproj=2, niter=1, nbatch=1, seed=0,
                          use_pallas=True, verbose=False)


def test_mega_kernel_node_caps_scale_with_filters():
    """The VMEM-derived node caps shrink as the filter count grows: the
    (frow, Np) node blocks dominate the footprint at wide F, so a
    lattice that fits at 5 filters must refuse the kernel at 80 (it
    would OOM at Mosaic compile time otherwise)."""
    rng = np.random.default_rng(0)
    m80 = rng.uniform(1, 10, (7000, 80)).astype(np.float32)
    som = SelfOrganizingMap(m80, 0.05 * m80, np.ones_like(m80))
    with pytest.raises(ValueError, match="80 filters"):
        # 78^2 = 6084 nodes: fine at F<=8 (cap 32768), over the F=80 cap.
        som.train_network(nside=78, nproj=2, niter=1, nbatch=1, seed=0,
                          use_pallas=True, verbose=False)
    gng = GrowingNeuralGas(m80, 0.05 * m80, np.ones_like(m80))
    with pytest.raises(ValueError, match="80 filters"):
        gng.train_network(niter=1, nbatch=1, max_nodes=9000, seed=0,
                          use_pallas=True, verbose=False)


def test_gng_mega_kernel_matches_scan_path(blob_problem):
    """The GNG Pallas mega-kernel (interpret mode on CPU) reproduces the
    lax.scan path: same math, same tie-breaking, same insert/prune
    schedule — trajectories agree to f32 reduction-order noise."""
    models, me, mm, zlab, centers, zc = blob_problem
    kw = dict(niter=40, nbatch=25, max_nodes=30, seed=5, verbose=False)
    ref = GrowingNeuralGas(models, me, mm)
    ref.train_network(use_pallas=False, **kw)
    gng = GrowingNeuralGas(models, me, mm)
    gng.train_network(use_pallas=True, **kw)
    assert gng.edge_overflow == 0
    assert gng.NNODE == ref.NNODE
    np.testing.assert_allclose(gng.nodes, ref.nodes, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_array_equal(gng.edge_ages, ref.edge_ages)
