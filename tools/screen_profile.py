"""Per-kernel device-event breakdown of the config-4 screened step.

Profiles the exact bench step (fused_fit_pdf + normalize + nz-sum,
one jit) for 3 batches and prints the largest device events — shows
how the ~142 ms/batch splits across seed / pass A / pass B / prep
fusions.  One JSON line.
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
from frankenz_tpu.utils.tracing import profile_device_busy


def main():
    rng = np.random.default_rng(0)
    f32 = np.float32
    nmodel, F, Ng, batch = 100_000, 5, 301, 65_536
    models = rng.uniform(1, 10, (nmodel, F)).astype(f32)
    models_err = (0.05 * models).astype(f32)
    pdict = PDFDict(np.linspace(0.0, 4.0, Ng), np.linspace(0.01, 0.5, 100))
    yi, ei = pdict.fit(rng.uniform(0, 3.5, nmodel), np.full(nmodel, 0.1))
    G = jnp.asarray(np.asarray(kernel_matrix_dict(pdict, yi, ei), f32))
    d = jnp.asarray(rng.uniform(1, 10, (batch, F)).astype(f32))
    de = jnp.asarray(np.full((batch, F), 0.25, f32))
    dm = jnp.ones_like(d)
    m = jnp.asarray(models)
    me = jnp.asarray(models_err)
    mm = jnp.ones_like(m)

    @jax.jit
    def step(d, de, dm, G):
        pdf, lmap, levid = _fz.fused_fit_pdf(
            d, de, dm, m, me, mm, G, wt_thresh=1e-3, full_mask=True,
            tb=512, tm=512)
        norm = jnp.sum(pdf, axis=1, keepdims=True)
        pdf = jnp.where(norm > 0, pdf / jnp.where(norm > 0, norm, 1.0), 0.0)
        return jnp.sum(pdf, axis=0), lmap, levid

    out = step(d, de, dm, G)
    jax.block_until_ready(out)

    busy, events = profile_device_busy(step, [(d, de, dm, G)] * 3)
    top = {}
    if events:
        for k, v in sorted(events.items(), key=lambda kv: -kv[1])[:25]:
            if v / 3 > 5e-4:
                top[k] = round(v / 3 * 1e3, 2)  # ms per batch
    print(json.dumps({"busy_ms": None if busy is None
                      else round(busy * 1e3, 2), "top_events_ms": top}))


if __name__ == "__main__":
    main()
