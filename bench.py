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
BENCH_BATCH.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def main():
    nobj = int(os.environ.get("BENCH_NOBJ", 1_000_000))
    nmodel = int(os.environ.get("BENCH_NMODEL", 100_000))
    nfilt = int(os.environ.get("BENCH_NFILT", 5))
    ngrid = int(os.environ.get("BENCH_NGRID", 301))
    batch = int(os.environ.get("BENCH_BATCH", 16384))

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

    if use_pallas:
        def step(d, de, dm):
            pdf, lmap, levid = _fz.fused_fit_pdf(
                d, de, dm, m, me, mm, G, wt_thresh=1e-3, full_mask=True)
            norm = jnp.sum(pdf, axis=1, keepdims=True)
            pdf = jnp.where(norm > 0, pdf / jnp.where(norm > 0, norm, 1.0),
                            0.0)
            return jnp.sum(pdf, axis=0), lmap, levid
    else:
        @jax.jit
        def step(d, de, dm):
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

    # Warmup / compile on the first batch.
    out = step(d_all[:batch], de_all[:batch], dm_all[:batch])
    jax.block_until_ready(out)

    nbatch = nobj // batch
    nz = jnp.zeros(ngrid, jnp.float32)
    t0 = time.time()
    for i in range(nbatch):
        s = i * batch
        nz_b, lmap, levid = step(
            jax.lax.dynamic_slice_in_dim(d_all, s, batch),
            jax.lax.dynamic_slice_in_dim(de_all, s, batch),
            jax.lax.dynamic_slice_in_dim(dm_all, s, batch))
        nz = nz + nz_b
    jax.block_until_ready(nz)
    elapsed = time.time() - t0

    npairs = nbatch * batch * nmodel
    rate = npairs / elapsed
    north_star = 1e10  # 1M x 100K in <10 s (BASELINE.json)
    result = {
        "metric": "chi2_evals_per_sec",
        "value": float(f"{rate:.4g}"),
        "unit": "pair-evals/s",
        "vs_baseline": float(f"{rate / north_star:.4g}"),
        "detail": {
            "nobj": nbatch * batch, "nmodel": nmodel, "nfilt": nfilt,
            "ngrid": ngrid, "batch": batch, "elapsed_s": round(elapsed, 3),
            "device": str(jax.devices()[0]),
            "path": "pallas" if use_pallas else "xla",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
