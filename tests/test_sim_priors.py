"""Custom-prior plumbing through the mock-survey sampler.

Reference threads the loaded prior into sampling (simulate.py:711-714
passes `self.ptm`, :746-749 passes `self.pztm`, with ptm_kwargs /
pztm_kwargs forwarded) — a prior installed via `load_prior` must change
the drawn (t, z) distributions, and the draw_* helpers must accept the
prior function as their first argument like the reference's.
"""

import numpy as np
import pytest

from frankenz_tpu.sim import (MockSurvey, draw_redshift_given_type_mag,
                              draw_type_given_mag, draw_ztm, pmag)


@pytest.fixture(scope="module")
def sdss():
    return MockSurvey(survey="sdss", templates="cww+", prior="bpz", seed=7)


def _type2_prior(t, m, boost=50.0):
    """P(t | m) heavily favoring type 2, vectorized over m."""
    w = np.array([1.0, 1.0, boost])[int(t) if np.ndim(t) == 0 else t]
    return np.broadcast_to(w / (2.0 + boost), np.shape(m)) \
        if np.ndim(m) else w / (2.0 + boost)


def _lowz_prior(z, t, m, zcut=0.3):
    """P(z | t, m) concentrated below `zcut` regardless of (t, m)."""
    z = np.asarray(z, dtype=float)
    return np.broadcast_to(np.exp(-z / zcut),
                           np.broadcast_shapes(np.shape(z), np.shape(t),
                                               np.shape(m)))


def test_load_prior_shifts_sampling(sdss):
    rng = np.random.default_rng(3)
    base = MockSurvey(survey="sdss", templates="cww+", prior="bpz")
    base.sample_params(2000, rng=np.random.default_rng(3))
    zs_bpz = base.data["redshifts"]
    ts_bpz = base.data["types"]

    custom = MockSurvey(survey="sdss", templates="cww+")
    custom.load_prior((pmag, _type2_prior, _lowz_prior))
    custom.sample_params(2000, rng=rng)
    zs, ts = custom.data["redshifts"], custom.data["types"]

    # Type 2 dominates under the boosted prior but not under BPZ.
    assert (ts == 2).mean() > 0.85
    assert (ts_bpz == 2).mean() < 0.6
    # Redshifts concentrate at low z under the exponential prior.
    assert np.median(zs) < 0.35
    assert np.median(zs) < np.median(zs_bpz) / 2.0
    # Mean of Exp(zcut) truncated to [0, 15]: close to 0.3.
    assert abs(zs.mean() - 0.3) < 0.05


def test_prior_kwargs_forwarded(sdss):
    custom = MockSurvey(survey="sdss", templates="cww+")
    custom.load_prior((pmag, _type2_prior, _lowz_prior))
    custom.sample_params(1500, rng=np.random.default_rng(5),
                         ptm_kwargs={"boost": 0.0},
                         pztm_kwargs={"zcut": 2.0})
    # boost=0 removes type 2 entirely; zcut=2 spreads the redshifts.
    assert (custom.data["types"] == 2).sum() == 0
    assert custom.data["redshifts"].mean() > 1.0


def test_bpz_kwargs_route_through_function_path(sdss):
    """ptm_kwargs with the PRESET prior must not be dropped: bpz_pt_m
    ignores extra kwargs, so the draw must route through the generic
    function path and still match the table fast path statistically."""
    a = MockSurvey(survey="sdss", templates="cww+", prior="bpz")
    a.sample_params(4000, rng=np.random.default_rng(11))
    b = MockSurvey(survey="sdss", templates="cww+", prior="bpz")
    b.sample_params(4000, rng=np.random.default_rng(11),
                    ptm_kwargs={}, pztm_kwargs=None)
    c = MockSurvey(survey="sdss", templates="cww+", prior="bpz")
    c.sample_params(4000, rng=np.random.default_rng(11),
                    ptm_kwargs={"ignored": 1})
    for t in range(3):
        frac = [(s.data["types"] == t).mean() for s in (a, b, c)]
        assert max(frac) - min(frac) < 0.05, (t, frac)


def test_draw_helpers_reference_signatures():
    rng = np.random.default_rng(0)
    mags = np.full(500, 21.0)
    ts = draw_type_given_mag(_type2_prior, mags, 3, rng=rng)
    assert ts.shape == (500,)
    assert (ts == 2).mean() > 0.9
    zs = draw_redshift_given_type_mag(_lowz_prior, ts, mags, rng=rng,
                                      zbounds=(0, 15), npoints=1000)
    assert zs.shape == (500,)
    assert (zs >= 0).all()
    assert np.median(zs) < 0.35

    m2, t2, z2 = draw_ztm(pmag, _type2_prior, _lowz_prior, 300,
                          pm_kwargs={"maglim": 22.0}, rng=rng)
    assert m2.shape == t2.shape == z2.shape == (300,)


def test_scalar_only_prior_fallback():
    """A prior that rejects vector input still works (per-object loop)."""

    def scalar_ptm(t, m):
        if np.ndim(m) != 0:
            raise TypeError("scalar only")
        return [0.2, 0.5, 0.3][int(t)]

    def scalar_pztm(z, t, m):
        if np.ndim(z) != 0:
            raise TypeError("scalar only")
        return float(np.exp(-abs(z - 1.0)))

    rng = np.random.default_rng(2)
    mags = np.full(200, 21.0)
    ts = draw_type_given_mag(scalar_ptm, mags, 3, rng=rng)
    assert set(np.unique(ts)) <= {0, 1, 2}
    assert abs((ts == 1).mean() - 0.5) < 0.15
    zs = draw_redshift_given_type_mag(scalar_pztm, ts, mags, rng=rng,
                                      npoints=200)
    assert abs(np.median(zs) - 1.0) < 0.3


def test_synthesize_objects_matches_grid_gather(sdss):
    rng = np.random.default_rng(4)
    zs = rng.uniform(0.05, 3.0, 40)
    tidx = rng.integers(0, sdss.NTEMPLATE, 40)
    per_obj = sdss.synthesize_objects(zs, tidx)
    grid = sdss.synthesize_grid(zs)
    want = grid[np.arange(40), tidx, :]
    np.testing.assert_allclose(per_obj, want, rtol=1e-6, atol=1e-12)
    # no-IGM path too
    per_obj0 = sdss.synthesize_objects(zs, tidx, igm=False)
    grid0 = sdss.synthesize_grid(zs, igm=False)
    np.testing.assert_allclose(per_obj0, grid0[np.arange(40), tidx, :],
                               rtol=1e-6, atol=1e-12)
