"""Hardware A/B for the pass-B absorption cut at the driver shape.

Times fused_fit_pdf screened with screen_absorb on/off (warm loops),
checks the outputs are bitwise-identical on chip, and prints run
fractions.  One JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from frankenz_tpu.ops import PDFDict, kernel_matrix_dict
from frankenz_tpu.ops import fused as _fz


def main():
    batch = int(os.environ.get("AB_BATCH", 65_536))
    nmodel = int(os.environ.get("AB_NMODEL", 100_000))
    nrep = int(os.environ.get("AB_NREP", 5))
    rng = np.random.default_rng(0)
    f32 = np.float32
    F, Ng = 5, 301
    models = rng.uniform(1, 10, (nmodel, F)).astype(f32)
    models_err = (0.05 * models).astype(f32)
    zlabels = rng.uniform(0, 3.5, nmodel)
    pd = PDFDict(np.linspace(0.0, 4.0, Ng), np.linspace(0.01, 0.5, 100))
    yi, ei = pd.fit(zlabels, np.full(nmodel, 0.1))
    G = np.asarray(kernel_matrix_dict(pd, yi, ei), f32)
    data = rng.uniform(1, 10, (1_000_000, F)).astype(f32)[:batch]
    data_err = np.full((batch, F), 0.25, f32)
    dmask, mmask = np.ones_like(data), np.ones_like(models)

    kw = dict(wt_thresh=1e-3, full_mask=True, tb=512, tm=512, screen=True)

    def run(absorb, stats=False):
        return _fz.fused_fit_pdf(
            data, data_err, dmask, models, models_err, mmask, G,
            screen_absorb=absorb, screen_stats=stats, **kw)

    res = {"batch": batch, "nmodel": nmodel}
    outs = {}
    for absorb in (True, False):
        out = run(absorb, stats=True)
        jax.block_until_ready(out)
        outs[absorb] = [np.asarray(jax.device_get(x)) for x in out[:3]]
        res[f"stats_absorb_{absorb}"] = [round(float(x), 4)
                                         for x in np.asarray(out[3])]
        # warm timing (no stats variant — the production call)
        o = run(absorb)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(nrep):
            o = run(absorb)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / nrep
        res[f"s_per_batch_absorb_{absorb}"] = round(dt, 4)
        res[f"pair_evals_per_s_absorb_{absorb}"] = round(
            batch * nmodel / dt / 1e9, 3)

    bitwise = all(np.array_equal(a, b)
                  for a, b in zip(outs[True], outs[False]))
    res["bitwise_on_vs_off"] = bool(bitwise)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
