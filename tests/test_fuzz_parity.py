"""Randomized differential sweeps: fused/jitted fast paths vs the XLA
oracle across option combinations and data regimes.

Every recent parity bug lived in a regime no hand-written case covered:
the f32 log-floor underflow (zero-overlap pairs), the clamped pass-A
GOF pinning (all-outlier rows), the sqrt-chain overflow (F > 19), the
sentinel-pad levid inflation, and the kNN dbound dedupe shadowing.
These seeded sweeps draw shapes, masks, option combos, and data regimes
at random (deterministically per seed) so the NEXT regime hole fails a
test here before it ships.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frankenz_tpu.ops import kde as K
from frankenz_tpu.ops import likelihood as L
from frankenz_tpu.ops.fused import FusedCdfFallback, fused_fit_pdf


def _xla_ref(d, de, dm, m, me, mm, G, *, dim_prior, ignore_model_err,
             free_scale, wt_thresh, cdf_thresh):
    """logprob -> logsumexp -> threshold_weights -> kde_stack oracle.

    Zero-overlap / zero-dof pairs NaN in the reference math; the rebuild
    documents them as -inf (strictly better) — clean them here so the
    comparison asserts the documented contract.
    """
    if free_scale:
        res = L.loglike_free(
            jnp.asarray(d, jnp.float32), jnp.asarray(de, jnp.float32),
            jnp.asarray(dm, jnp.float32), jnp.asarray(m, jnp.float32),
            jnp.asarray(me, jnp.float32), jnp.asarray(mm, jnp.float32),
            ignore_model_err=ignore_model_err, dim_prior=dim_prior,
            ltol=1e-6)
    else:
        res = L.loglike_fixed(
            jnp.asarray(d, jnp.float32), jnp.asarray(de, jnp.float32),
            jnp.asarray(dm, jnp.float32), jnp.asarray(m, jnp.float32),
            jnp.asarray(me, jnp.float32), jnp.asarray(mm, jnp.float32),
            ignore_model_err=ignore_model_err, dim_prior=dim_prior)
    lnp = np.asarray(res.lnlike)
    lnp = np.where(np.isnan(lnp), -np.inf, lnp)
    lmap = lnp.max(axis=1)
    from scipy.special import logsumexp
    levid = logsumexp(lnp, axis=1)
    with np.errstate(invalid="ignore"):
        wt = np.where(np.isfinite(levid)[:, None],
                      np.exp(lnp - levid[:, None]), 0.0)
    wt = np.asarray(K.threshold_weights(jnp.asarray(wt, jnp.float32),
                                        wt_thresh, cdf_thresh))
    pdf = wt @ np.asarray(G, np.float64)
    return pdf, lmap, levid


@pytest.mark.parametrize("seed", range(16))
def test_fuzz_fused_vs_xla(seed):
    rng = np.random.default_rng(31000 + seed)
    B = int(rng.integers(5, 30))
    M = int(rng.integers(70, 350))
    F = int(rng.integers(2, 25))
    Ngrid = int(rng.integers(33, 170))
    full_mask = bool(rng.uniform() < 0.5)
    dim_prior = bool(rng.uniform() < 0.7)
    ignore_model_err = bool(rng.uniform() < 0.5)
    free_scale = bool(rng.uniform() < 0.35)
    if rng.uniform() < 0.15:
        wt_thresh, cdf_thresh = None, 2e-4
    elif rng.uniform() < 0.75:
        wt_thresh, cdf_thresh = 1e-3, None
    else:
        wt_thresh, cdf_thresh = None, None
    regime = rng.choice(["normal", "outlier", "perfect"])

    m = rng.uniform(1, 10, (M, F)).astype(np.float32)
    me = (0.05 * m).astype(np.float32)
    truth = rng.integers(0, M, B)
    de = np.full((B, F), 0.3, np.float32)
    if regime == "perfect":
        d = m[truth].copy()
    else:
        d = (m[truth] + rng.normal(0, 0.3, (B, F))).astype(np.float32)
    if regime == "outlier":
        # Offsets sized so chi2 stays below the no-log kernel's clamp
        # (parity holds); the all-clamped regime beyond it is pinned by
        # test_fullmask_all_clamped_outliers_keep_gof_parity.
        off = np.sqrt(20000.0 / F) * de[0, 0]
        rows = rng.integers(0, B, max(1, B // 3))
        d[rows] += off * rng.choice([-1.0, 1.0], (rows.size, F))
    if full_mask:
        dm = np.ones((B, F), np.float32)
        mm = np.ones((M, F), np.float32)
    else:
        keep = 0.55 if F <= 4 else 0.75
        dm = (rng.uniform(size=(B, F)) < keep).astype(np.float32)
        mm = (rng.uniform(size=(M, F)) < keep).astype(np.float32)
        # a couple of fully masked objects exercise the -inf contract
        if B > 6 and rng.uniform() < 0.4:
            dm[rng.integers(0, B)] = 0.0
    G = np.asarray(K.kernel_matrix(
        rng.uniform(0, 3, M), np.full(M, 0.1),
        np.linspace(0, 3, Ngrid)), np.float32)

    try:
        pdf, lmap, levid = fused_fit_pdf(
            d, de, dm, m, me, mm, G, dim_prior=dim_prior,
            ignore_model_err=ignore_model_err, free_scale=free_scale,
            wt_thresh=wt_thresh, cdf_thresh=cdf_thresh, tb=8, tm=128,
            interpret=True, scale_ltol=1e-4)
    except FusedCdfFallback:
        # Documented contract for flat posteriors under cdf_thresh:
        # the deferred-check variant must flag the same objects
        # instead of raising (BruteForce reruns them on XLA).
        assert cdf_thresh is not None and wt_thresh is None
        out = fused_fit_pdf(
            d, de, dm, m, me, mm, G, dim_prior=dim_prior,
            ignore_model_err=ignore_model_err, free_scale=free_scale,
            wt_thresh=wt_thresh, cdf_thresh=cdf_thresh, tb=8, tm=128,
            interpret=True, scale_ltol=1e-4, defer_cdf_check=True)
        assert not bool(np.asarray(out[3]).all())
        return
    want_pdf, want_lmap, want_levid = _xla_ref(
        d, de, dm, m, me, mm, G, dim_prior=dim_prior,
        ignore_model_err=ignore_model_err, free_scale=free_scale,
        wt_thresh=wt_thresh, cdf_thresh=cdf_thresh)

    lmap, levid = np.asarray(lmap), np.asarray(levid)
    pdf = np.asarray(pdf)
    assert not np.isnan(lmap).any() and not np.isnan(levid).any()
    assert np.isfinite(pdf).all()
    if free_scale:
        # The ML-identity chi2 (sum d^2/var - inter^2/shape) cancels:
        # its f32 roundoff is ~eps * sum d^2/var (~1e-3 at outlier
        # chi2 ~ 2e4), accumulated in different orders on the two
        # paths; with model errors both sides also iterate only to
        # ~ltol.  Agreement is cancellation-bound, not roundoff-bound.
        rt_g, at_g, rt_p, at_p = 5e-3, 2e-3, 5e-3, 2e-4
    else:
        rt_g, at_g, rt_p, at_p = 2e-4, 2e-4, 2e-3, 3e-5
    msg = (f"seed={seed} B={B} M={M} F={F} Ngrid={Ngrid} "
           f"full_mask={full_mask} dim_prior={dim_prior} "
           f"ignore_model_err={ignore_model_err} free_scale={free_scale} "
           f"wt={wt_thresh} cdf={cdf_thresh} regime={regime}")
    np.testing.assert_allclose(lmap, want_lmap, rtol=rt_g, atol=at_g,
                               err_msg=msg)
    np.testing.assert_allclose(levid, want_levid, rtol=rt_g, atol=at_g,
                               err_msg=msg)
    np.testing.assert_allclose(pdf, want_pdf, rtol=rt_p, atol=at_p,
                               err_msg=msg)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_kde_vs_oracle(seed):
    """gauss_kde / gauss_kde_dict vs the float64 window-mask oracle on
    random grids, sigma dictionaries, thresholds, and label placements
    (including off-grid and edge-overhanging kernels)."""
    import _oracle as oracle
    from frankenz_tpu.ops import kde

    rng = np.random.default_rng(59000 + seed)
    n = int(rng.integers(5, 80))
    Ng = int(rng.integers(40, 400))
    lo = rng.uniform(-2, 2)
    hi = lo + rng.uniform(0.5, 6.0)
    grid = np.linspace(lo, hi, Ng)
    y = rng.uniform(lo - 1.0, hi + 1.0, n)  # includes off-grid labels
    y_std = rng.uniform(0.003, 0.5, n)
    wt = rng.uniform(0, 1, n) ** 2
    if rng.uniform() < 0.5:
        wt_thresh, cdf_thresh = 1e-3, None
    else:
        wt_thresh, cdf_thresh = None, 2e-4
    got = np.asarray(kde.gauss_kde(y, y_std, grid, y_wt=wt,
                                   wt_thresh=wt_thresh,
                                   cdf_thresh=cdf_thresh))
    want = oracle.gauss_kde_1(y, y_std, grid, wt, wt_thresh=wt_thresh,
                              cdf_thresh=cdf_thresh)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-12,
                               err_msg=f"seed={seed} gauss_kde")

    # Dictionary variant: in-grid labels (edge-overhangs included via
    # placement near the boundaries), random sigma dictionary.
    ndict = int(rng.integers(10, 60))
    pdfdict = kde.PDFDict(grid, np.sort(rng.uniform(0.003, 0.4, ndict)))
    y_in = np.clip(y, lo, hi)
    y_idx, e_idx = pdfdict.fit(y_in, y_std)
    got = np.asarray(kde.gauss_kde_dict(pdfdict, y_idx=y_idx,
                                        y_std_idx=e_idx, y_wt=wt,
                                        wt_thresh=wt_thresh,
                                        cdf_thresh=cdf_thresh))
    want = oracle.gauss_kde_dict_1(pdfdict, np.asarray(y_idx),
                                   np.asarray(e_idx), wt,
                                   wt_thresh=wt_thresh,
                                   cdf_thresh=cdf_thresh)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-12,
                               err_msg=f"seed={seed} gauss_kde_dict")


def _knn_oracle(q, feats, K_, k, lp_norm, dbound):
    """First-seen union of per-ensemble in-bound top-k (knn.py:368
    pandas.unique semantics; ties broken toward the lower index exactly
    as lax.top_k does)."""
    out = []
    for b in range(q.shape[0]):
        seen, ordered = set(), []
        for e in range(K_):
            dist = np.sum(np.abs(q[b][None, :] - feats[e]) ** lp_norm,
                          axis=-1)
            top = np.lexsort((np.arange(dist.size), dist))[:k]
            for i in top:
                if dist[i] <= dbound ** lp_norm and i not in seen:
                    seen.add(int(i))
                    ordered.append(int(i))
        out.append(ordered)
    return out


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_knn_search_vs_oracle(seed):
    from frankenz_tpu.models.knn import _search_jit

    rng = np.random.default_rng(47000 + seed)
    B = int(rng.integers(2, 9))
    M = int(rng.integers(20, 90))
    K_ = int(rng.integers(1, 6))
    k = int(rng.integers(1, 9))
    Fd = int(rng.integers(1, 6))
    lp_norm = int(rng.choice([1, 2]))
    feats = rng.normal(0, 1, (K_, M, Fd)).astype(np.float32)
    # duplicate some models ACROSS ensembles so the union actually
    # dedupes, and WITHIN the distance field so dbound interacts
    if K_ > 1:
        feats[1:, : M // 3] = feats[0, : M // 3]
    q = rng.normal(0, 1, (B, Fd)).astype(np.float32)
    if rng.uniform() < 0.7:
        alld = np.abs(q[:, None, None, :]
                      - feats[None, :, :, :]).sum(-1)
        dbound = float(np.quantile(alld, rng.uniform(0.05, 0.6)))
    else:
        dbound = np.inf

    fsq = np.sum(feats * feats, axis=-1).astype(np.float32)
    idx, valid, nidx = _search_jit(
        jnp.asarray(q), jnp.asarray(feats), jnp.asarray(fsq),
        K=K_, k=k, lp_norm=lp_norm, dbound=dbound, approx=False)
    idx, valid, nidx = (np.asarray(idx), np.asarray(valid),
                        np.asarray(nidx))
    want = _knn_oracle(q, feats, K_, k, lp_norm, dbound)
    msg = f"seed={seed} B={B} M={M} K={K_} k={k} Fd={Fd} lp={lp_norm}"
    for b in range(B):
        assert int(nidx[b]) == len(want[b]), msg
        got = idx[b][valid[b]].tolist()
        assert got == want[b], msg
        assert (idx[b][~valid[b]] == -99).all(), msg
