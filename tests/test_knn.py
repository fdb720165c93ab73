"""KMCkNN fitter tests: exact search, dedupe semantics, posterior parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from frankenz_tpu.models import BruteForce, NearestNeighbors
from frankenz_tpu.ops import PDFDict


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(11)
    nmodel, nobj, nfilt = 120, 30, 5
    models = rng.uniform(1, 10, (nmodel, nfilt))
    models_err = 0.02 * models
    models_mask = np.ones_like(models)
    zlab = rng.uniform(0, 3, nmodel)
    zerr = np.full(nmodel, 0.1)
    truth = rng.integers(0, nmodel, nobj)
    data = models[truth] + rng.normal(0, 0.05, (nobj, nfilt))
    data_err = np.full((nobj, nfilt), 0.05)
    data_mask = np.ones_like(data)
    return dict(models=models, models_err=models_err,
                models_mask=models_mask, data=data, data_err=data_err,
                data_mask=data_mask, zlab=zlab, zerr=zerr, truth=truth)


def test_search_matches_numpy_topk(problem):
    """Brute-force matmul top-k equals numpy nearest neighbors."""
    nn = NearestNeighbors(problem["models"], problem["models_err"],
                          problem["models_mask"], K=3, seed=0,
                          verbose=False)
    rng = np.random.default_rng(1)
    q = rng.uniform(-10, 0, (8, 5)).astype(np.float32)
    search = nn._search_fn(k=7, lp_norm=2, dbound=np.inf)
    idx, valid, nidx = search(jnp.asarray(q), nn.features,
                              nn.features_sqnorm)
    idx = np.asarray(idx)
    valid = np.asarray(valid)
    feats = np.asarray(nn.features)
    for b in range(8):
        want = set()
        for kk in range(3):
            d = ((q[b] - feats[kk]) ** 2).sum(axis=1)
            want |= set(np.argsort(d, kind="stable")[:7].tolist())
        got = set(idx[b][valid[b]].tolist())
        assert got == want
    # Valid counts equal union sizes; padded slots are -99.
    assert (np.asarray(nidx) == [len({*idx[b][valid[b]]}) for b in
                                 range(8)]).all()
    assert (idx[~valid] == -99).all()


def test_dedupe_first_seen_order(problem):
    """Compacted indices preserve first-seen order (pandas.unique)."""
    nn = NearestNeighbors(problem["models"], problem["models_err"],
                          problem["models_mask"], K=4, seed=0,
                          verbose=False)
    q = np.asarray(nn.features[0][:3]) * 1.0  # exact model features
    search = nn._search_fn(k=5, lp_norm=2, dbound=np.inf)
    idx, valid, nidx = search(jnp.asarray(q), nn.features,
                              nn.features_sqnorm)
    idx, valid = np.asarray(idx), np.asarray(valid)
    for b in range(3):
        compact = idx[b][valid[b]]
        # No duplicates, and matches a first-seen-order unique of the raw
        # concatenated per-ensemble lists.
        assert len(compact) == len(set(compact.tolist()))
        assert (np.asarray(nidx)[b] == len(compact))
        assert valid[b][:len(compact)].all()
        assert not valid[b][len(compact):].any()


def test_fit_stores_reference_padding(problem):
    nn = NearestNeighbors(problem["models"], problem["models_err"],
                          problem["models_mask"], K=5, seed=2,
                          verbose=False)
    nn.fit(problem["data"], problem["data_err"], problem["data_mask"],
           k=10, verbose=False)
    assert nn.neighbors.shape == (30, 50)
    pad = nn.neighbors == -99
    assert (nn.fit_lnprob[pad] == -np.inf).all()
    assert (nn.fit_chi2[pad] == np.inf).all()
    assert (nn.fit_Ndim[pad] == 0).all()
    assert (nn.Nneighbors == (~pad).sum(axis=1)).all()
    # The generating model should almost always be in the neighbor set
    # for low-noise data.
    hits = [problem["truth"][i] in set(nn.neighbors[i].tolist())
            for i in range(30)]
    assert np.mean(hits) > 0.9


def test_knn_pdfs_approach_bruteforce(problem):
    """With k*K covering most of the weight, kNN PDFs ~ brute force."""
    grid = np.linspace(0, 3, 301)
    nn = NearestNeighbors(problem["models"], problem["models_err"],
                          problem["models_mask"], K=8, seed=3,
                          verbose=False)
    pdfs_knn, (lmap_k, levid_k) = nn.fit_predict(
        problem["data"], problem["data_err"], problem["data_mask"],
        problem["zlab"], problem["zerr"], label_grid=grid, k=40,
        return_gof=True, verbose=False)
    bf = BruteForce(problem["models"], problem["models_err"],
                    problem["models_mask"])
    pdfs_bf, (lmap_b, levid_b) = bf.fit_predict(
        problem["data"], problem["data_err"], problem["data_mask"],
        problem["zlab"], problem["zerr"], label_grid=grid,
        return_gof=True, verbose=False)
    # k=40 x K=8 on 120 models: the union covers everything that matters.
    np.testing.assert_allclose(lmap_k, lmap_b, rtol=1e-4)
    l1 = np.abs(pdfs_knn - pdfs_bf).sum(axis=1)
    assert np.median(l1) < 0.05


def test_dict_and_grid_paths_agree(problem):
    grid = np.linspace(0, 3, 301)
    pd = PDFDict(grid, np.linspace(0.02, 0.3, 80))
    nn = NearestNeighbors(problem["models"], problem["models_err"],
                          problem["models_mask"], K=4, seed=4,
                          verbose=False)
    rng_state = np.random.default_rng(42)
    a = nn.fit_predict(problem["data"], problem["data_err"],
                       problem["data_mask"], problem["zlab"],
                       problem["zerr"], label_grid=grid, k=15,
                       verbose=False, rng=np.random.default_rng(77))
    b = nn.fit_predict(problem["data"], problem["data_err"],
                       problem["data_mask"], problem["zlab"],
                       problem["zerr"], label_dict=pd, k=15,
                       verbose=False, rng=np.random.default_rng(77))
    # Same query jitters (same rng seed) -> same neighbor sets; dict
    # quantization only discretizes the kernels.
    l1 = np.abs(a - b).sum(axis=1)
    assert np.median(l1) < 0.15


def test_save_fits_then_predict_matches_fused(problem):
    grid = np.linspace(0, 3, 301)
    nn = NearestNeighbors(problem["models"], problem["models_err"],
                          problem["models_mask"], K=4, seed=5,
                          verbose=False)
    fused = nn.fit_predict(problem["data"], problem["data_err"],
                           problem["data_mask"], problem["zlab"],
                           problem["zerr"], label_grid=grid, k=15,
                           verbose=False, save_fits=True,
                           rng=np.random.default_rng(123))
    two_step = nn.predict(problem["zlab"], problem["zerr"],
                          label_grid=grid, verbose=False)
    np.testing.assert_allclose(fused, two_step, rtol=1e-4, atol=1e-7)


def test_lp_norm_1(problem):
    nn = NearestNeighbors(problem["models"], problem["models_err"],
                          problem["models_mask"], K=2, seed=6,
                          verbose=False)
    q = np.asarray(nn.features[0][:4])
    search = nn._search_fn(k=5, lp_norm=1, dbound=np.inf)
    idx, valid, nidx = search(jnp.asarray(q), nn.features,
                              nn.features_sqnorm)
    feats = np.asarray(nn.features)
    for b in range(4):
        want = set()
        for kk in range(2):
            d = np.abs(q[b] - feats[kk]).sum(axis=1)
            want |= set(np.argsort(d, kind="stable")[:5].tolist())
        got = set(np.asarray(idx)[b][np.asarray(valid)[b]].tolist())
        assert got == want


def test_distance_bound_does_not_shadow_inbound_neighbor():
    """An out-of-bound occurrence of a model index must not mark the
    in-bound occurrence from another ensemble as a duplicate (both
    ending up invalid and the object losing a real neighbor)."""
    from frankenz_tpu.models.knn import _search_jit

    # K=2 ensembles, M=2 models, 1 feature; query at 0.
    # Ensemble 0 sees model 0 at distance 3 (out of bound for dbound=2),
    # ensemble 1 sees model 0 at distance 1 (in bound).
    feats = jnp.asarray([[[3.0], [10.0]], [[1.0], [10.0]]], jnp.float32)
    fsq = jnp.sum(feats * feats, axis=-1)
    q = jnp.zeros((1, 1), jnp.float32)
    idx, valid, nidx = _search_jit(q, feats, fsq, K=2, k=1, lp_norm=2,
                                   dbound=2.0, approx=False)
    assert int(nidx[0]) == 1
    assert np.asarray(idx)[0].tolist() == [0, -99]
    assert np.asarray(valid)[0].tolist() == [True, False]


def test_search_chunked_topk_matches_oracle(monkeypatch):
    """Past _TOPK_CHUNK model columns the exact search runs per-chunk
    top_k + an exact merge; integer-valued features make both distance
    formulations exact in f32, so the chunked result (including
    lowest-index tie-breaking across chunk boundaries) must equal the
    numpy oracle exactly."""
    from frankenz_tpu.models import knn as knn_mod
    monkeypatch.setattr(knn_mod, "_TOPK_CHUNK", 100)
    rng = np.random.default_rng(7)
    B, M, Nf, K, k = 8, 317, 4, 3, 6  # 317 cols -> 4 uneven chunks
    feats = rng.integers(0, 8, (K, M, Nf)).astype(np.float32)
    q = rng.integers(0, 8, (B, Nf)).astype(np.float32)
    fsq = (feats.astype(np.float64) ** 2).sum(-1).astype(np.float32)
    idx, valid, nidx = knn_mod._search_jit(
        jnp.asarray(q), jnp.asarray(feats), jnp.asarray(fsq),
        K=K, k=k, lp_norm=2, dbound=np.inf, approx=False)
    idx, valid = np.asarray(idx), np.asarray(valid)
    for b in range(B):
        # First-seen-order unique over the K ensembles' exact top-k
        # lists (ties -> lowest index, = stable ascending argsort).
        seen, want = set(), []
        for kk in range(K):
            d = ((q[b] - feats[kk]) ** 2).sum(axis=1)
            for i in np.argsort(d, kind="stable")[:k]:
                if int(i) not in seen:
                    seen.add(int(i))
                    want.append(int(i))
        got = idx[b][valid[b]].tolist()
        assert got == want
    assert (idx[~valid] == -99).all()


def test_search_chunked_respects_distance_bound(monkeypatch):
    """dbound filtering happens on the merged per-ensemble result; the
    chunked path must mark out-of-bound slots invalid identically."""
    from frankenz_tpu.models import knn as knn_mod
    monkeypatch.setattr(knn_mod, "_TOPK_CHUNK", 50)
    rng = np.random.default_rng(9)
    B, M, Nf, K, k = 4, 123, 3, 2, 5
    feats = rng.integers(0, 6, (K, M, Nf)).astype(np.float32)
    q = rng.integers(0, 6, (B, Nf)).astype(np.float32)
    fsq = (feats ** 2).sum(-1)
    dbound = 3.0
    idx, valid, nidx = knn_mod._search_jit(
        jnp.asarray(q), jnp.asarray(feats), jnp.asarray(fsq),
        K=K, k=k, lp_norm=2, dbound=dbound, approx=False)
    idx, valid = np.asarray(idx), np.asarray(valid)
    for b in range(4):
        seen, want = set(), []
        for kk in range(K):
            d = ((q[b] - feats[kk]) ** 2).sum(axis=1)
            for i in np.argsort(d, kind="stable")[:k]:
                if d[i] <= dbound ** 2 and int(i) not in seen:
                    seen.add(int(i))
                    want.append(int(i))
        got = idx[b][valid[b]].tolist()
        assert got == want


def test_topk_chunk_cols_byte_ceiling(monkeypatch):
    """The exact-search chunk width honors BOTH ceilings: columns
    (_TOPK_CHUNK, remote-compiler limit) and bytes (_TOPK_DIST_BYTES /
    batch rows — a 4096-row batch over a 1M-column chunk is a 16 GB
    distance block, the measured v5e OOM at M=1.2M), never below k."""
    from frankenz_tpu.models import knn as knn_mod

    # 4096 rows x 2 GiB budget -> 131072 columns, lane-aligned.
    assert knn_mod._topk_chunk_cols(4096, 20) == (2 << 30) // (4 * 4096)
    # Small batches are column-limited, not byte-limited.
    assert knn_mod._topk_chunk_cols(8, 20) == knn_mod._TOPK_CHUNK
    # Gigantic batches still get at least k columns.
    assert knn_mod._topk_chunk_cols(1 << 30, 20) == 20
    # The byte ceiling engages the chunked path end-to-end: same oracle
    # as the column-ceiling test, forced via _TOPK_DIST_BYTES.
    monkeypatch.setattr(knn_mod, "_TOPK_DIST_BYTES", 8 * 4 * 130)
    assert knn_mod._topk_chunk_cols(8, 6) == 128  # 317 cols -> 3 chunks
    rng = np.random.default_rng(3)
    B, M, Nf, K, k = 8, 317, 4, 2, 6
    feats = rng.integers(0, 8, (K, M, Nf)).astype(np.float32)
    q = rng.integers(0, 8, (B, Nf)).astype(np.float32)
    fsq = (feats.astype(np.float64) ** 2).sum(-1).astype(np.float32)
    idx, valid, nidx = knn_mod._search_jit(
        jnp.asarray(q), jnp.asarray(feats), jnp.asarray(fsq),
        K=K, k=k, lp_norm=2, dbound=np.inf, approx=False)
    idx, valid = np.asarray(idx), np.asarray(valid)
    for b in range(B):
        seen, want = set(), []
        for kk in range(K):
            d = ((q[b] - feats[kk]) ** 2).sum(axis=1)
            for i in np.argsort(d, kind="stable")[:k]:
                if int(i) not in seen:
                    seen.add(int(i))
                    want.append(int(i))
        assert idx[b][valid[b]].tolist() == want
