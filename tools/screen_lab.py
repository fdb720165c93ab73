"""Screened-pipeline headroom lab (round 5).

Runs on the real TPU at the driver config-4 shape and answers:
  1. How is device-busy split across seed / pass A / pass B?
  2. What are the PER-ROW run fractions vs the block-level (any over
     tb rows) fractions the kernels actually act on — i.e. how much
     skip precision does the tb=512 block `any()` dilute away?
  3. Would a 3-filter Morton key (bounds informative in 3 of 5 dims
     instead of 2) tighten the bounds enough to matter?
  4. What would an absorption-grade cut (delta-lnl ~ 25 instead of the
     f32-underflow 104.2) buy in run-fraction terms?

Pure analysis — no library behavior changes. Emits one JSON line.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from frankenz_tpu.ops import PDFDict, kernel_matrix_dict
from frankenz_tpu.ops import fused as _fz


def make_data(nmodel=100_000, nfilt=5, ngrid=301, batch=65_536):
    rng = np.random.default_rng(0)
    f32 = np.float32
    models = rng.uniform(1, 10, (nmodel, nfilt)).astype(f32)
    models_err = (0.05 * models).astype(f32)
    zlabels = rng.uniform(0, 3.5, nmodel)
    zerrs = np.full(nmodel, 0.1)
    grid = np.linspace(0.0, 4.0, ngrid)
    pd = PDFDict(grid, np.linspace(0.01, 0.5, 100))
    yi, ei = pd.fit(zlabels, zerrs)
    G = np.asarray(kernel_matrix_dict(pd, yi, ei), f32)
    data = rng.uniform(1, 10, (1_000_000, nfilt)).astype(f32)[:batch]
    data_err = np.full((batch, nfilt), 0.25, f32)
    return data, data_err, models, models_err, G


def _interleave3(a, b, c):
    """Morton-interleave three 10-bit lanes -> 30-bit key."""
    def spread(v):
        v = jnp.bitwise_and(v, 0x3FF)
        v = jnp.bitwise_and(jnp.bitwise_or(v, v << 16), 0x030000FF)
        v = jnp.bitwise_and(jnp.bitwise_or(v, v << 8), 0x0300F00F)
        v = jnp.bitwise_and(jnp.bitwise_or(v, v << 4), 0x030C30C3)
        v = jnp.bitwise_and(jnp.bitwise_or(v, v << 2), 0x09249249)
        return v

    return (spread(a) | (spread(b) << 1) | (spread(c) << 2))


def prep_bounds(d, de, mT, meT, m_real, sm, ndim_key):
    """_screen_prep's sort + bounds with a parameterized Morton arity.

    Returns (bounds (S, B), operm) in sorted orders.
    """
    F, Mp = mT.shape
    mr = mT[:, :m_real]
    var = jnp.var(mr, axis=1)
    _, dims = jax.lax.top_k(var, ndim_key)
    lo = jnp.min(mr, axis=1)
    hi = jnp.max(mr, axis=1)
    scale = 1.0 / jnp.maximum(hi - lo, 1e-20)

    def key_of(rows):
        q = jnp.clip((rows - lo[None, :]) * scale[None, :], 0.0, 1.0)
        qk = jnp.take(q, dims, axis=1)
        if ndim_key == 2:
            qi = (qk * 32767.0).astype(jnp.int32)
            return _fz._interleave2(qi[:, 0], qi[:, 1])
        qi = (qk * 1023.0).astype(jnp.int32)
        return _interleave3(qi[:, 0], qi[:, 1], qi[:, 2])

    mkey = jnp.concatenate(
        [key_of(mr.T), jnp.full((Mp - m_real,), jnp.int32(1 << 30))])
    mperm = jnp.argsort(mkey, stable=True)
    mTs = jnp.take(mT, mperm, axis=1)
    meTs = jnp.take(meT, mperm, axis=1)
    operm = jnp.argsort(key_of(d), stable=True)
    ds = jnp.take(d, operm, axis=0)
    des = jnp.take(de, operm, axis=0)

    S = Mp // sm
    mres = mTs.reshape(F, S, sm)
    blo = jnp.min(mres, axis=2)
    bhi = jnp.max(mres, axis=2)
    memax = jnp.max(meTs.reshape(F, S, sm), axis=2)
    bound = None
    for k in range(F):
        dk = ds[None, :, k]
        gap = jnp.maximum(jnp.maximum(blo[k][:, None] - dk,
                                      dk - bhi[k][:, None]), 0.0)
        v = des[None, :, k] ** 2 + memax[k][:, None] ** 2
        t = gap * gap / v
        bound = t if bound is None else bound + t
    return bound * (1.0 - 1e-4), operm


@jax.jit
def _fracs_dev(bounds, cut):
    S, B = bounds.shape
    hit = bounds <= cut[None, :]
    out = [jnp.mean(hit.astype(jnp.float32))]
    for tb in (128, 256, 512):
        h = hit.reshape(S, B // tb, tb).any(axis=2)
        out.append(jnp.mean(h.astype(jnp.float32)))
    return jnp.stack(out)


def fracs(bounds, cut):
    v = np.asarray(jax.device_get(_fracs_dev(bounds, cut)))
    return {"row": round(float(v[0]), 4), "128": round(float(v[1]), 4),
            "256": round(float(v[2]), 4), "512": round(float(v[3]), 4)}


def main():
    batch = int(os.environ.get("LAB_BATCH", 65_536))
    data, data_err, models, models_err, G = make_data(batch=batch)
    B, F = data.shape
    M = models.shape[0]
    a1 = 0.5 * F - 1.0
    c0 = 2.0 * a1

    dmask = np.ones_like(data)
    mmask = np.ones_like(models)

    out = _fz.fused_fit_pdf(
        data, data_err, dmask, models, models_err, mmask, G,
        wt_thresh=1e-3, full_mask=True, tb=512, tm=512,
        screen_stats=True)
    jax.block_until_ready(out)
    pdf, lmap, levid, stats = out

    # 1) Busy split per kernel via the profiler.
    from frankenz_tpu.utils.tracing import profile_device_busy

    def run(_):
        r = _fz.fused_fit_pdf(
            data, data_err, dmask, models, models_err, mmask, G,
            wt_thresh=1e-3, full_mask=True, tb=512, tm=512)
        jax.block_until_ready(r)
        return r

    busy, events = profile_device_busy(run, [None] * 3)
    ev = {}
    if events:
        for k, v in sorted(events.items(), key=lambda kv: -kv[1]):
            if v > 3e-4:
                ev[k] = round(v / 3, 6)

    res = {"busy_s_per_call": busy,
           "kernel_stats_blockany": [round(float(x), 4)
                                     for x in np.asarray(stats)],
           "events": ev}

    # 2/3/4) Run-fraction geometry, on device.
    import scipy.special as sps
    norm = float(sps.gammaln(0.5 * F) + 0.5 * F * np.log(2.0))
    shift = jnp.asarray(lmap) + norm

    # Padded transposed model arrays, the way fused_fit_pdf builds them.
    Mp = _fz._round_up(M, 512)
    pad = Mp - M
    mT = jnp.asarray(
        np.concatenate([models.T, np.full((F, pad), 1e15, np.float32)], 1))
    meT = jnp.asarray(
        np.concatenate([models_err.T, np.ones((F, pad), np.float32)], 1))
    d = jnp.asarray(data)
    de = jnp.asarray(data_err)

    prep_j = jax.jit(prep_bounds, static_argnames=("m_real", "sm",
                                                   "ndim_key"))
    for ndim in (2, 3):
        bounds, operm = prep_j(d, de, mT, meT, M, 512, ndim)
        sh_s = shift[operm]  # per-row shift in sorted order
        cut_uf = _fz._chi2_upper_root(a1, sh_s - 104.2, c0)
        cut_dot = _fz._chi2_upper_root(a1, sh_s + float(np.log(1e-3)), c0)
        cut_abs = _fz._chi2_upper_root(a1, sh_s - 25.0, c0)
        res[f"uf_ndim{ndim}"] = fracs(bounds, cut_uf)
        res[f"dot_ndim{ndim}"] = fracs(bounds, cut_dot)
        res[f"abs25_ndim{ndim}"] = fracs(bounds, cut_abs)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
