"""
Benchmark: HSC-scale brute-force photo-z (BASELINE.md config 4).

Workload: Nobj x Nmodel full log-likelihood grid (masked chi^2 with model
errors + chi^2-distribution dim prior) -> per-object posterior weights ->
KDE label PDFs (weights @ kernel matrix) -> stacked N(z); everything
on-device, object batches streamed through the fused jitted step.

Prints ONE JSON line:
  {"metric": "chi2_evals_per_sec", "value": ..., "unit": "pair-evals/s",
   "vs_baseline": ...}
vs_baseline is measured against the BASELINE.json north-star rate of
1e10 pair-evals/s (1M x 100K in <10 s on one TPU v5p chip).

Env overrides: BENCH_NOBJ, BENCH_NMODEL, BENCH_NFILT, BENCH_NGRID,
BENCH_BATCH; BENCH_PATH=xla forces the non-Pallas path.

The other BASELINE.md configs run via BENCH_CONFIG={1,2,3,5,6,7}
(config 4, the primary metric, is the default):
  1  demo-2 mock: BruteForce 5K x 1K (CPU-runnable)
  2  KMCkNN: 100K train / 10K test, K=25 ensembles, k=20
  3  SOM 50x50 + GNG on 100K models; cell-conditioned PDFs for 10K objs
  5  hierarchical + population MCMC over stacked PDFs
  6  serving: fit_summarize (on-device summaries) vs full-PDF readback
  7  MXU-duty demonstration: config-4 pipeline on a fine-z serving grid
     (Ngrid 4001) where the PDF-stack contraction dominates
Each extra config prints its own one-line JSON (no vs_baseline — the
reference publishes no numbers; BASELINE.md documents its asymptotic
costs instead).  Configs 4/7 also emit `mxu_duty_cycle`: analytic
MXU-pass time at peak / profiler-measured device busy (a lower bound
on true MXU duty; see the comment at the computation).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

# Persistent compilation cache: repeated bench runs (and the driver's
# per-round invocation) skip the remote recompiles, whose latency is
# high-variance (10-300 s for the same program over the TPU relay).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("BENCH_CACHE_DIR", "/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _emit(metric, value, unit, **detail):
    """One JSON line; carries the package's structured-metrics registry
    snapshot (counters filled by the fitter pipelines themselves)."""
    from frankenz_tpu.utils.metrics import metrics

    print(json.dumps({"metric": metric, "value": float(f"{value:.4g}"),
                      "unit": unit, "detail": detail,
                      "metrics": metrics.snapshot()}))


# Peak dense-matmul throughput per chip (bf16 FLOPs/s), for the MFU
# estimate.  Public spec-sheet numbers.
_PEAK_BF16 = (("v5 lite", 197e12), ("v5e", 197e12), ("v6 lite", 918e12),
              ("trillium", 918e12), ("v5p", 459e12), ("v5", 459e12),
              ("v4", 275e12))


def _peak_flops(device):
    kind = (getattr(device, "device_kind", "") or str(device)).lower()
    for key, val in _PEAK_BF16:
        if key in kind:
            return val
    return None


def _profile_step(step, slices, nprof=3):
    """On-device busy seconds per batch via the package tracing utility
    (frankenz_tpu.utils.tracing.profile_device_busy): `nprof` batches
    under one jax.profiler trace, summing device-plane `jit_` module
    events."""
    from frankenz_tpu.utils.tracing import profile_device_busy

    busy, _ = profile_device_busy(step, slices[:nprof])
    return busy


def config1():
    """Demo-2 mock: BruteForce 5K x 1K."""
    from frankenz_tpu.fitting import BruteForce

    rng = np.random.default_rng(0)
    m = rng.uniform(1, 10, (1000, 5)).astype(np.float32)
    d = (m[rng.integers(0, 1000, 5000)]
         + rng.normal(0, 0.3, (5000, 5))).astype(np.float32)
    de = np.full((5000, 5), 0.3, np.float32)
    bf = BruteForce(m, np.zeros_like(m), np.ones_like(m))
    z = rng.uniform(0, 3, 1000)
    grid = np.linspace(0, 3.2, 321)
    kw = dict(free_scale=True, ignore_model_err=True)
    bf.fit_predict(d, de, np.ones_like(d), z, np.full(1000, 0.05),
                   label_grid=grid, verbose=False, lprob_kwargs=kw)  # warm
    t0 = time.time()
    bf.fit_predict(d, de, np.ones_like(d), z, np.full(1000, 0.05),
                   label_grid=grid, verbose=False, lprob_kwargs=kw)
    dt = time.time() - t0
    _emit("config1_bruteforce_5kx1k", 5000 / dt, "obj/s", elapsed_s=dt)


def config2():
    """KMCkNN on the regenerated SDSS DR13-like catalog: 100K train /
    10K test (real color-redshift structure; the actual DR13 file is
    stripped upstream, `.MISSING_LARGE_BLOBS:1`)."""
    from frankenz_tpu.fitting import NearestNeighbors
    from frankenz_tpu.sim import make_sdss_mock

    cat = make_sdss_mock(nobj=113_000, seed=13)
    ntrain, ntest = 100_000, 10_000
    assert len(cat["phot"]) >= ntrain + ntest, len(cat["phot"])
    m = cat["phot"][:ntrain]
    me = cat["phot_err"][:ntrain]
    mmask = cat["phot_mask"][:ntrain]
    z = cat["redshifts"][:ntrain]
    zerr = 0.02 * (1.0 + z)
    d = cat["phot"][ntrain:ntrain + ntest]
    de = cat["phot_err"][ntrain:ntrain + ntest]
    dmask = cat["phot_mask"][ntrain:ntrain + ntest]
    ztrue = cat["redshifts"][ntrain:ntrain + ntest]
    grid = np.linspace(0, 7.0, 701)
    nn = NearestNeighbors(m, me, mmask, K=25, seed=1, verbose=False)
    nn.fit_predict(d[:4096], de[:4096], dmask[:4096], z, zerr,
                   label_grid=grid, k=20, verbose=False)  # warm
    t0 = time.time()
    pdfs = nn.fit_predict(d, de, dmask, z, zerr, label_grid=grid, k=20,
                          verbose=False)
    dt = time.time() - t0
    # TPU-native approximate search (lax.approx_max_k) for comparison —
    # exact top-k stays the default for KDTree-parity with the reference.
    nn.fit_predict(d[:4096], de[:4096], dmask[:4096], z, zerr,
                   label_grid=grid, k=20, verbose=False,
                   approx=True)  # warm
    t0 = time.time()
    pdfs_a = nn.fit_predict(d, de, dmask, z, zerr, label_grid=grid, k=20,
                            verbose=False, approx=True)
    dt_a = time.time() - t0
    zhat = grid[np.argmax(pdfs, axis=1)]
    dz = (zhat - ztrue) / (1 + ztrue)
    zhat_a = grid[np.argmax(pdfs_a, axis=1)]
    dz_a = (zhat_a - ztrue) / (1 + ztrue)
    _emit("config2_kmcknn_sdss_100k_10k", ntest / dt, "obj/s",
          elapsed_s=dt, K=25, k=20,
          sigma_nmad=round(float(1.48 * np.median(np.abs(
              dz - np.median(dz)))), 4),
          outlier_frac=round(float(np.mean(np.abs(dz) > 0.15)), 4),
          approx_obj_per_s=round(ntest / dt_a, 1),
          approx_sigma_nmad=round(float(1.48 * np.median(np.abs(
              dz_a - np.median(dz_a)))), 4),
          approx_outlier_frac=round(float(np.mean(
              np.abs(dz_a) > 0.15)), 4))


def config3():
    """SOM 50x50 + GNG on 100K models; cell-conditioned PDFs."""
    from frankenz_tpu.fitting import GrowingNeuralGas, SelfOrganizingMap

    rng = np.random.default_rng(0)
    m = rng.uniform(1, 10, (100_000, 5)).astype(np.float32)
    me = (0.05 * m).astype(np.float32)
    z = rng.uniform(0, 3, 100_000)
    grid = np.linspace(0, 3.2, 321)
    som = SelfOrganizingMap(m, me, np.ones_like(m))
    t0 = time.time()
    som.train_network(nside=50, nproj=2, niter=2000, nbatch=50, seed=1,
                      verbose=False)
    t_train = time.time() - t0
    t0 = time.time()  # warm repeat: trace/compile amortized
    som.train_network(nside=50, nproj=2, niter=2000, nbatch=50, seed=1,
                      verbose=False)
    t_train_w = time.time() - t0
    t0 = time.time()
    som.populate_network(verbose=False)
    t_pop = time.time() - t0
    t0 = time.time()
    som.populate_network(verbose=False)
    t_pop_w = time.time() - t0
    d = (m[rng.integers(0, 100_000, 10_000)]
         + rng.normal(0, 0.3, (10_000, 5))).astype(np.float32)
    de = np.full((10_000, 5), 0.3, np.float32)
    fit_kw = dict(label_grid=grid, nodes_only=True, verbose=False,
                  batch_size=2048, save_fits=False)
    t0 = time.time()
    som.fit_predict(d, de, np.ones_like(d), z, np.full(100_000, 0.05),
                    **fit_kw)
    t_fit = time.time() - t0
    t0 = time.time()
    som.fit_predict(d, de, np.ones_like(d), z, np.full(100_000, 0.05),
                    **fit_kw)
    t_fit_w = time.time() - t0
    gng = GrowingNeuralGas(m, me, np.ones_like(m))
    t0 = time.time()
    gng.train_network(niter=5000, nbatch=50, max_nodes=2500, seed=2,
                      verbose=False)
    t_gng = time.time() - t0
    t0 = time.time()  # warm repeat: trace/compile amortized
    gng.train_network(niter=5000, nbatch=50, max_nodes=2500, seed=2,
                      verbose=False)
    t_gng_w = time.time() - t0
    _emit("config3_som_gng", 10_000 / t_fit_w, "obj/s",
          som_train_s=round(t_train, 2), som_train_warm_s=round(t_train_w, 2),
          populate_s=round(t_pop, 2), populate_warm_s=round(t_pop_w, 2),
          som_fit_s=round(t_fit, 2), som_fit_warm_s=round(t_fit_w, 2),
          gng_train_s=round(t_gng, 2), gng_train_warm_s=round(t_gng_w, 2),
          gng_nodes=int(gng.NNODE))


def config5():
    """Population + hierarchical MCMC over stacked PDFs."""
    from frankenz_tpu.samplers import hierarchical_sampler, \
        population_sampler

    rng = np.random.default_rng(0)
    nbins, nobs = 50, 20_000
    grid = np.arange(nbins)
    nz = np.exp(-0.5 * ((grid - 18) / 5.0) ** 2)
    nz /= nz.sum()
    zt = rng.choice(nbins, nobs, p=nz)
    c = zt + rng.normal(0, 1.5, nobs)
    pdfs = np.exp(-0.5 * ((grid[None] - c[:, None]) / 1.5) ** 2)
    pdfs /= pdfs.sum(1, keepdims=True)
    ps = population_sampler(pdfs)
    ps.run_mcmc(100, thin=400, mh_steps=3, seed=0, verbose=False)  # warm
    ps.reset()
    t0 = time.time()
    ps.run_mcmc(100, thin=400, mh_steps=3, seed=0, verbose=False)
    t_pop = time.time() - t0
    hs = hierarchical_sampler(pdfs)
    hs.run_mcmc(200, thin=5, seed=0, verbose=False)  # warm
    hs.reset()
    t0 = time.time()
    hs.run_mcmc(200, thin=5, seed=0, verbose=False)
    t_hier = time.time() - t0
    # First-class hierarchical rate (VERDICT r04 item 7): one Gibbs
    # sweep = a full categorical draw over Nobs objects + the Dirichlet
    # resample, Niter*thin sweeps per run — the demo-6 workload
    # (reference samplers.py:311-535).
    hier_steps = 200 * 5
    _emit("config5_samplers", 100 * 400 * 3 / t_pop, "proposals/s",
          population_s=round(t_pop, 2), hierarchical_s=round(t_hier, 2),
          hierarchical_sweeps_per_s=round(hier_steps / t_hier, 1),
          hierarchical_obj_draws_per_s=float(
              f"{hier_steps * nobs / t_hier:.4g}"),
          nobs=nobs)


def config6():
    """Serving: streaming on-device summaries vs full-PDF readback.

    fit_summarize reduces each PDF batch to 21 summary columns on-chip;
    fit_predict reads back the whole (Nobj, Ngrid) matrix.  Identical
    device compute — the delta is purely the host readback (over the
    remote-TPU relay the PDF transfer dominates at catalog scale).

    Default shape is the north star (1M objects x 100K models, the
    config-4 grid, through the serving path); BENCH_NOBJ/BENCH_NMODEL
    scale it down for quick runs.
    """
    from frankenz_tpu.fitting import BruteForce

    rng = np.random.default_rng(0)
    nobj = int(os.environ.get("BENCH_NOBJ", 1_000_000))
    nmodel = int(os.environ.get("BENCH_NMODEL", 100_000))
    m = rng.uniform(1, 10, (nmodel, 5)).astype(np.float32)
    me = (0.05 * m).astype(np.float32)
    d = (m[rng.integers(0, nmodel, nobj)]
         + rng.normal(0, 0.3, (nobj, 5))).astype(np.float32)
    de = np.full((nobj, 5), 0.3, np.float32)
    dm = np.ones_like(d)
    bf = BruteForce(m, me, np.ones_like(m))
    z = rng.uniform(0, 3, nmodel)
    grid = np.linspace(0, 3.2, 321)
    args = (d, de, dm, z, np.full(nmodel, 0.05))
    kw = dict(label_grid=grid, verbose=False)

    bf.fit_summarize(*args, **kw)  # warm
    t0 = time.time()
    summary, _ = bf.fit_summarize(*args, **kw)
    t_summ = time.time() - t0
    assert np.isfinite(summary.median.point).all()

    bf.fit_predict(*args, **kw)  # warm
    t0 = time.time()
    pdfs = bf.fit_predict(*args, **kw)
    t_pdf = time.time() - t0
    assert pdfs.shape == (nobj, len(grid))

    _emit("config6_serving_summaries", nobj / t_summ, "obj/s",
          fit_summarize_s=round(t_summ, 2), fit_predict_s=round(t_pdf, 2),
          readback_speedup=round(t_pdf / t_summ, 2), nobj=nobj,
          nmodel=nmodel, ngrid=len(grid))


def main(defaults=(1_000_000, 100_000, 5, 301, 65536),
         metric="chi2_evals_per_sec"):
    nobj = int(os.environ.get("BENCH_NOBJ", defaults[0]))
    nmodel = int(os.environ.get("BENCH_NMODEL", defaults[1]))
    nfilt = int(os.environ.get("BENCH_NFILT", defaults[2]))
    ngrid = int(os.environ.get("BENCH_NGRID", defaults[3]))
    batch = int(os.environ.get("BENCH_BATCH", defaults[4]))

    from frankenz_tpu.ops import PDFDict, kernel_matrix_dict
    from frankenz_tpu.ops import kde as _kde
    from frankenz_tpu.ops import likelihood as _like

    rng = np.random.default_rng(0)
    f32 = np.float32

    models = rng.uniform(1, 10, (nmodel, nfilt)).astype(f32)
    models_err = (0.05 * models).astype(f32)
    models_mask = np.ones((nmodel, nfilt), f32)
    zlabels = rng.uniform(0, 3.5, nmodel)
    zerrs = np.full(nmodel, 0.1)

    grid = np.linspace(0.0, 4.0, ngrid)
    pd = PDFDict(grid, np.linspace(0.01, 0.5, 100))
    yi, ei = pd.fit(zlabels, zerrs)
    G = jnp.asarray(np.asarray(kernel_matrix_dict(pd, yi, ei), f32))

    data = rng.uniform(1, 10, (nobj, nfilt)).astype(f32)
    data_err = np.full((nobj, nfilt), 0.25, f32)
    data_mask = np.ones((nobj, nfilt), f32)

    from frankenz_tpu.ops import fused as _fz

    m = jnp.asarray(models)
    me = jnp.asarray(models_err)
    mm = jnp.asarray(models_mask)
    d_all = jnp.asarray(data)
    de_all = jnp.asarray(data_err)
    dm_all = jnp.asarray(data_mask)
    use_pallas = (_fz.pallas_supported()
                  and os.environ.get("BENCH_PATH", "pallas") == "pallas")

    # Wide serving grids (config 7, Ngrid in the thousands) shrink the
    # tiles: the (tm, Gp) kernel-matrix tiles + the (tb, Gp) PDF
    # accumulator overrun Mosaic's 16 MB scoped-VMEM accounting once
    # Gp > ~1024.  Narrow grids take the measured-fastest 512/512
    # (the library default, ops/fused.py).
    gp_pad = -(-ngrid // 128) * 128
    tb, tm = ((512, 512) if gp_pad <= 512
              else (256, 512) if gp_pad <= 1024 else (128, 256))

    # NOTE: the big arrays (the catalog slabs and above all G — 1.6 GB
    # at config 7's Ngrid=4001) must be jit ARGUMENTS, not closures: a
    # closed-over concrete array is baked into the lowered HLO as a
    # constant, and the remote-compile relay rejects the payload
    # (HTTP 413) once it passes ~1 GB (and re-uploads it on every
    # compile otherwise).
    band_skip = os.environ.get("BENCH_BAND", "1") == "1"
    # BENCH_SCREEN=0 pins the banded two-pass kernels (the pre-round-5
    # path); default runs the screened pipeline (exact subtile pruning).
    # BENCH_ABSORB=0 / BENCH_HOMEFIRST=0 disable the pass-B absorption
    # cut / the per-block home-first tile visit order for A/B runs.
    screen = os.environ.get("BENCH_SCREEN", "1") == "1"
    absorb = os.environ.get("BENCH_ABSORB", "1") == "1"
    home_first = os.environ.get("BENCH_HOMEFIRST", "1") == "1"
    if use_pallas:
        def step(d, de, dm, G):
            pdf, lmap, levid = _fz.fused_fit_pdf(
                d, de, dm, m, me, mm, G, wt_thresh=1e-3, full_mask=True,
                tb=tb, tm=tm, band_skip=band_skip, screen=screen,
                screen_absorb=absorb, screen_home_first=home_first)
            norm = jnp.sum(pdf, axis=1, keepdims=True)
            pdf = jnp.where(norm > 0, pdf / jnp.where(norm > 0, norm, 1.0),
                            0.0)
            return jnp.sum(pdf, axis=0), lmap, levid
    else:
        @jax.jit
        def step(d, de, dm, G):
            res = _like.logprob(d, de, dm, m, me, mm)
            lnprob = res.lnprob
            lmap = jnp.max(lnprob, axis=1)
            levid = jax.scipy.special.logsumexp(lnprob, axis=1)
            wt = jnp.exp(lnprob - levid[:, None])
            pdf = _kde.kde_stack(wt, G, 1e-3, None)
            norm = jnp.sum(pdf, axis=1, keepdims=True)
            pdf = jnp.where(norm > 0, pdf / jnp.where(norm > 0, norm, 1.0),
                            0.0)
            return jnp.sum(pdf, axis=0), lmap, levid

    # Single-dispatch batch step: slice + kernel + accumulate inside ONE
    # jitted call.  The previous loop issued 3 eager dynamic-slice ops
    # plus the step per batch; over the remote relay each dispatch has
    # real latency, and the gaps cost ~11% wall rate vs device-busy
    # (2.07e10 wall vs 2.33e10 busy at STACK_PRECISION=HIGH on v5e).
    @jax.jit
    def _step_at(s, nz, da, dea, dma, G):
        d = jax.lax.dynamic_slice_in_dim(da, s, batch)
        de = jax.lax.dynamic_slice_in_dim(dea, s, batch)
        dm = jax.lax.dynamic_slice_in_dim(dma, s, batch)
        nz_b, lmap, levid = step(d, de, dm, G)
        return nz + nz_b, lmap, levid

    def step_at(s, nz):
        return _step_at(s, nz, d_all, de_all, dm_all, G)

    # Warmup / compile on the first batch.
    out = step(d_all[:batch], de_all[:batch], dm_all[:batch], G)
    jax.block_until_ready(out)
    out = step_at(0, jnp.zeros(ngrid, jnp.float32))
    jax.block_until_ready(out)

    from frankenz_tpu.utils.metrics import metrics

    nbatch = nobj // batch

    # BENCH_SCAN=1: run the whole catalog as ONE dispatch (fori_loop
    # over step_at inside a jit) — isolates the per-dispatch host/relay
    # gap (wall minus device-busy, ~1% at 15 batches) from the kernel
    # throughput.  Default off: the per-batch loop mirrors how the
    # streaming fitters actually dispatch.
    use_scan = os.environ.get("BENCH_SCAN", "0") == "1"
    if use_scan:
        @jax.jit
        def _run_all(nz0, da, dea, dma, Ga):
            def body(i, carry):
                return _step_at(i * batch, carry[0], da, dea, dma, Ga)
            init = (nz0, jnp.zeros(batch, jnp.float32),
                    jnp.zeros(batch, jnp.float32))
            return jax.lax.fori_loop(0, nbatch, body, init)

        def run_all(nz0):
            return _run_all(nz0, d_all, de_all, dm_all, G)
        jax.block_until_ready(run_all(jnp.zeros(ngrid, jnp.float32)))

    nz = jnp.zeros(ngrid, jnp.float32)
    t0 = time.time()
    with metrics.timer("bench.config4", items=nbatch * batch * nmodel,
                       item_counter="chi2_pair_evals"):
        if use_scan:
            nz, lmap, levid = run_all(nz)
            jax.block_until_ready(nz)
        else:
            for i in range(nbatch):
                nz, lmap, levid = step_at(i * batch, nz)
            jax.block_until_ready(nz)
    metrics.count("pdf_stacks", nbatch * batch)
    elapsed = time.time() - t0

    npairs = nbatch * batch * nmodel
    rate = npairs / elapsed
    north_star = 1e10  # 1M x 100K in <10 s (BASELINE.json)
    # MFU estimate from the fused kernel's cost model
    # (ops/fused.py CostEstimate): per (object, model) pair, TWO passes
    # over the F-filter chi^2 reduce (~4 flops/filter each: resid,
    # square, weight, accumulate -> 8F total) plus the Ngrid-wide
    # (padded to a 128-lane multiple) weights @ G contraction
    # (2 flops/grid point, the only MXU-shaped work) — everything else
    # is VPU/transcendental epilogue.
    gp = -(-ngrid // 128) * 128
    flops_per_pair = 2 * gp + 8 * nfilt
    peak = _peak_flops(jax.devices()[0])
    mfu = rate * flops_per_pair / peak if peak else None

    # Profiler-MEASURED utilization (docs/MXU_NOTE.md): device busy time
    # per batch from a jax.profiler trace, so the MFU denominator is the
    # time the chip actually spent in the step's compiled modules rather
    # than wall clock (which includes host dispatch / relay latency).
    mfu_meas = kernel_ms = mxu_duty = mxu_duty_meas = None
    screen_fracs = None
    if peak and os.environ.get("BENCH_PROFILE", "1") != "0":
        # Profile the exact module the wall loop runs (`step_at`, which
        # also fuses the dynamic slices + nz accumulate on-device; with
        # BENCH_SCAN=1 the whole-catalog fori_loop module instead).
        if use_scan:
            busy = _profile_step(run_all,
                                 [(jnp.zeros(ngrid, jnp.float32),)])
            busy = busy / nbatch if busy else busy
        else:
            slices = [(i * batch, jnp.zeros(ngrid, jnp.float32))
                      for i in range(min(3, nbatch))]
            busy = _profile_step(step_at, slices)
        if busy:
            kernel_ms = round(busy * 1e3, 2)
            mfu_meas = float(f"{batch * nmodel * flops_per_pair / (busy * peak):.4g}")
            # MXU duty cycle (BASELINE.md >= 50% MXU clause): the
            # stack contraction is the only MXU-shaped work in the
            # pipeline — at STACK_PRECISION=HIGH it runs 3 bf16 passes
            # over the (batch, M) @ (M, Gp) product (1 at DEFAULT,
            # 6 at HIGHEST).  Duty = ISSUED MXU flops at peak /
            # measured device busy — a LOWER bound on the true duty
            # (in-pass inefficiency only raises it).  The banded Pallas
            # stack skips flagged-zero 128-column blocks, so count only
            # the blocks it executes (`band_stack_products`); the XLA
            # path stacks dense.  Config 4 is VPU-op-bound by design
            # (docs/MXU_NOTE.md); the stack-dominant demonstration
            # shape is BENCH_CONFIG=7.
            from frankenz_tpu.ops.kde import STACK_PRECISION as _SP
            passes = {jax.lax.Precision.DEFAULT: 1,
                      jax.lax.Precision.HIGH: 3,
                      jax.lax.Precision.HIGHEST: 6}[_SP]
            if use_pallas and screen:
                # Screened pipeline: the stack dot runs only for
                # subtiles whose bound admits an above-threshold weight
                # for some row — `screen_stats` replicates the kernels'
                # own skip compares exactly (ops/fused.py).
                mp = -(-nmodel // tm) * tm
                _, _, _, st = _fz.fused_fit_pdf(
                    d_all[:batch], de_all[:batch], dm_all[:batch], m, me,
                    mm, G, wt_thresh=1e-3, full_mask=True, tb=tb, tm=tm,
                    screen=True, screen_stats=True, screen_absorb=absorb,
                    screen_home_first=home_first)
                st = jax.device_get(st)
                screen_fracs = [round(float(x), 4) for x in st]
                products = float(st[2]) * mp * gp
            elif use_pallas and band_skip:
                products = _fz.band_stack_products(G, tm)
                screen_fracs = None
            else:
                products = nmodel * gp
                screen_fracs = None
            mxu_flops = 2.0 * batch * products * passes
            mxu_duty = float(f"{mxu_flops / peak / busy:.4g}")

            # MEASURED MXU duty (BENCH_MXU_DIFF=1): device busy is
            # linear in stack passes (docs/MXU_NOTE.md section 5 —
            # hardware ladder), so the per-pass MXU time is the busy
            # delta between this run's precision (`passes` passes) and
            # a 1-pass DEFAULT run of one batch in a subprocess
            # (STACK_PRECISION is baked at import).  duty =
            # passes * (busy - busy_1pass) / (passes - 1) / busy.
            if passes > 1 and os.environ.get("BENCH_MXU_DIFF") == "1":
                import subprocess
                import sys as _sys
                env = dict(
                    os.environ, FRANKENZ_STACK_PRECISION="default",
                    BENCH_MXU_DIFF="0", BENCH_SCAN="0", BENCH_CONFIG="4",
                    BENCH_NOBJ=str(batch), BENCH_NMODEL=str(nmodel),
                    BENCH_NFILT=str(nfilt), BENCH_NGRID=str(ngrid),
                    BENCH_BATCH=str(batch))
                try:
                    sub = subprocess.run(
                        [_sys.executable, os.path.abspath(__file__)],
                        env=env, capture_output=True, text=True,
                        timeout=2400)
                    one = json.loads(sub.stdout.strip().splitlines()[-1])
                    busy1 = (one.get("device_busy_ms_per_batch") or 0) / 1e3
                    if 0 < busy1 < busy:
                        mxu_s = passes * (busy - busy1) / (passes - 1)
                        mxu_duty_meas = float(f"{mxu_s / busy:.4g}")
                except Exception:  # pragma: no cover - measurement aid
                    pass
    result = {
        "metric": metric,
        "value": float(f"{rate:.4g}"),
        "unit": "pair-evals/s",
        "vs_baseline": float(f"{rate / north_star:.4g}"),
        "mfu": float(f"{mfu:.4g}") if mfu is not None else None,
        "mfu_measured": mfu_meas,
        "mxu_duty_cycle": mxu_duty,
        "mxu_duty_measured": mxu_duty_meas,
        "device_busy_ms_per_batch": kernel_ms,
        "detail": {
            "nobj": nbatch * batch, "nmodel": nmodel, "nfilt": nfilt,
            "ngrid": ngrid, "batch": batch, "elapsed_s": round(elapsed, 3),
            "device": str(jax.devices()[0]),
            "path": ("pallas-screened" if use_pallas and screen
                     else "pallas" if use_pallas else "xla"),
            # [passA-seed-admit (upper bd on runs), passB-run, passB-dot]
            "screen_run_fracs": screen_fracs,
            "flops_per_pair": flops_per_pair,
            "peak_bf16_flops": peak,
        },
        "metrics": metrics.snapshot(),
    }
    print(json.dumps(result))


def _require_devices(timeout_s=600):
    """Fail fast (one JSON error line) when the TPU relay is down.

    Device enumeration over the remote relay HANGS indefinitely during
    an outage (observed: 4+ h); a hung bench run leaves the driver with
    no artifact at all, so probe in a daemon thread and emit a
    machine-readable failure instead.
    """
    import threading

    out = {}

    def probe():
        try:
            out["devices"] = jax.devices()
        except Exception as exc:  # pragma: no cover
            out["error"] = repr(exc)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" in out:
        return
    print(json.dumps({
        "metric": "chi2_evals_per_sec", "value": 0.0,
        "unit": "pair-evals/s", "vs_baseline": 0.0,
        "error": out.get("error",
                         f"TPU backend unreachable after {timeout_s}s "
                         "(relay outage?)")}))
    os._exit(1)


def config8():
    """Free-scale hardware rates (VERDICT r04 item 4): the in-tile
    per-pair-converged Pallas iteration vs the XLA while_loop on
    IDENTICAL data at the driver catalog (100K models, 5 filters,
    config-4 grid).  Free scale with model errors kept is the
    reference's `_loglike_s` iteration (pdf.py:197-223) — the
    data-dependent fixed point makes rates workload-dependent, so the
    data here are noisy scaled model copies (every pair genuinely
    iterates).  The XLA path runs at its HBM-bounded batch (the
    while_loop carries ~6 (B, M) grids; 4096 OOMs 16 GB — CLAUDE.md),
    the fused tile at the driver batch."""
    from frankenz_tpu.ops import PDFDict, kernel_matrix_dict
    from frankenz_tpu.ops import fused as _fz
    from frankenz_tpu.ops import kde as _kde
    from frankenz_tpu.ops import likelihood as _like

    rng = np.random.default_rng(0)
    nmodel, nfilt, ngrid = 100_000, 5, 301
    batch_f = int(os.environ.get("BENCH_BATCH", 16384))
    batch_x = 2048
    nobj = batch_f
    models = rng.uniform(1, 10, (nmodel, nfilt)).astype(np.float32)
    models_err = (0.05 * models).astype(np.float32)
    scales = rng.uniform(0.5, 2.0, (nobj, 1))
    data = (scales * models[rng.integers(0, nmodel, nobj)]
            + rng.normal(0, 0.3, (nobj, nfilt))).astype(np.float32)
    data_err = np.full((nobj, nfilt), 0.25, np.float32)
    grid = np.linspace(0.0, 4.0, ngrid)
    pd = PDFDict(grid, np.linspace(0.01, 0.5, 100))
    yi, ei = pd.fit(rng.uniform(0, 3.5, nmodel), np.full(nmodel, 0.1))
    G = jnp.asarray(np.asarray(kernel_matrix_dict(pd, yi, ei), np.float32))
    m = jnp.asarray(models)
    me = jnp.asarray(models_err)
    mm = jnp.ones_like(m)
    d_all = jnp.asarray(data)
    de_all = jnp.asarray(data_err)
    dm_all = jnp.ones_like(d_all)

    def fused_run():
        out = _fz.fused_fit_pdf(
            d_all, de_all, dm_all, m, me, mm, G, free_scale=True,
            wt_thresh=1e-3, full_mask=True, scale_ltol=1e-4)
        jax.block_until_ready(out)
        return out

    @jax.jit
    def _xla_batch(d, de, dm, G):
        res = _like.loglike_free(d, de, dm, m, me, mm, dim_prior=True,
                                 ltol=1e-4)
        lnp = res.lnlike
        lmap = jnp.max(lnp, axis=1)
        levid = jax.scipy.special.logsumexp(lnp, axis=1)
        wt = jnp.exp(lnp - levid[:, None])
        pdf = _kde.kde_stack(wt, G, 1e-3, None)
        return pdf, lmap, levid

    def xla_run():
        outs = []
        for i in range(0, nobj, batch_x):
            outs.append(_xla_batch(
                jax.lax.dynamic_slice_in_dim(d_all, i, batch_x),
                jax.lax.dynamic_slice_in_dim(de_all, i, batch_x),
                jax.lax.dynamic_slice_in_dim(dm_all, i, batch_x), G))
        jax.block_until_ready(outs)
        return outs

    fused_run()  # compile
    t0 = time.time()
    out_f = fused_run()
    t_f = time.time() - t0
    xla_run()  # compile
    t0 = time.time()
    out_x = xla_run()
    t_x = time.time() - t0
    # Parity on identical data (converged fixed points; lmap at the
    # fixed-point resolution).
    lm_f = np.asarray(out_f[1])
    lm_x = np.concatenate([np.asarray(o[1]) for o in out_x])
    gof_dev = float(np.max(np.abs(lm_f - lm_x)
                           / np.maximum(np.abs(lm_x), 1.0)))
    pairs = nobj * nmodel
    _emit("config8_free_scale", pairs / t_f, "pair-evals/s",
          fused_s=round(t_f, 3), xla_s=round(t_x, 3),
          xla_pair_evals_per_s=float(f"{pairs / t_x:.4g}"),
          fused_vs_xla_speedup=round(t_x / t_f, 2),
          lmap_maxrel_vs_xla=float(f"{gof_dev:.2g}"),
          nobj=nobj, nmodel=nmodel, batch_fused=batch_f,
          batch_xla=batch_x)


def config7():
    """MXU-duty demonstration (BASELINE.md >= 50% MXU clause): the
    stack-dominant shape from docs/MXU_NOTE.md section 3 — a realistic
    fine-z serving grid (Ngrid 4001 ~ dz 0.001 over 0..4) makes the
    (batch, M) @ (M, Ngrid) PDF-stack contraction dominate the per-pair
    VPU epilogue, so the MXU carries the flops.  Same pipeline as
    config 4, wider grid, fewer objects (the per-batch work is ~13x
    config 4's)."""
    main(defaults=(262_144, 100_000, 5, 4001, 65_536),
         metric="config7_mxu_stack_evals_per_sec")


if __name__ == "__main__":
    _require_devices()
    cfg = os.environ.get("BENCH_CONFIG", "4")
    if cfg == "4":
        main()
    else:
        {"1": config1, "2": config2, "3": config3, "5": config5,
         "6": config6, "7": config7, "8": config8}[cfg]()
