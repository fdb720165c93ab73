"""Simulation stack tests: IGM, priors, MockSurvey synthesis."""

import numpy as np
import pytest

from frankenz_tpu.sim import (BPZPrior, MockSurvey, bpz_prior, bpz_pt_m,
                              bpz_pz_tm, madau_teff, mag_err, pmag)

C_MS = 299792458.0


def oracle_madau_teff(wave, z):
    """Direct transcription of the Madau formulas (reddening.py:23-95)."""
    lines = [1216.0, 1026.0, 973.0, 950.0, 938.1, 931.0, 926.5, 923.4,
             921.2, 919.6, 918.4]
    coeffs = [0.0037, 0.00177, 0.00106, 0.000584, 0.00044, 0.00040,
              0.00037, 0.00035, 0.00033, 0.00032, 0.00031]
    wave = np.asarray(wave, float)
    tau = np.zeros_like(wave)
    for l, c in zip(lines, coeffs):
        sel = wave < l * (1 + z)
        tau[sel] += c * (wave[sel] / l) ** 3.46
    sel = wave < 912.0 * (1 + z)
    xc = wave[sel] / 912.0
    xem = 1.0 + z
    t2 = (0.25 * xc**3 * (xem**0.46 - xc**0.46)
          + 9.4 * xc**1.5 * (xem**0.18 - xc**0.18)
          - 0.7 * xc**3 * (xc**-1.32 - xem**-1.32)
          - 0.023 * (xem**1.68 - xc**1.68))
    t2[t2 < 0] = 0.0
    tau[sel] += t2
    return np.exp(-tau)


@pytest.mark.parametrize("z", [0.1, 1.0, 3.0, 6.0])
def test_madau_matches_oracle(z):
    wave = np.linspace(300.0, 12000.0, 4000)
    got = np.asarray(madau_teff(wave, z))
    want = oracle_madau_teff(wave, z)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-12)
    # Transmission is 1 redward of redshifted Ly-alpha, <1 blueward.
    assert got[wave > 1216.0 * (1 + z)].min() == 1.0
    assert got[wave < 1216.0 * (1 + z)].max() < 1.0


def test_pmag_normalized_and_shaped():
    mgrid = np.linspace(10, 28, 1000)
    p = pmag(mgrid, maglim=23.0)
    np.testing.assert_allclose(np.trapezoid(p, mgrid), 1.0, rtol=1e-3)
    assert p[np.argmin(np.abs(mgrid - 22))] > p[0]  # rises toward limit


def test_bpz_prior_structure():
    zgrid = np.linspace(0, 15, 1000)
    p, ft = bpz_prior(22.0, zgrid)
    assert p.shape == (1000, 3) and ft.shape == (3,)
    np.testing.assert_allclose(ft.sum(), 1.0, rtol=1e-12)
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-10)
    # Fainter magnitudes push P(z) to higher z.
    p_faint, _ = bpz_prior(26.0, zgrid)
    mean_bright = (zgrid[:, None] * p).sum() / p.sum()
    mean_faint = (zgrid[:, None] * p_faint).sum() / p_faint.sum()
    assert mean_faint > mean_bright


def test_bpz_functional_wrappers():
    ms = np.array([20.5, 23.0, 27.0])
    for t in range(3):
        probs = bpz_pt_m(t, ms)
        assert probs.shape == (3,)
        assert (probs > 0).all() and (probs < 1).all()
    total = sum(bpz_pt_m(t, ms) for t in range(3))
    np.testing.assert_allclose(total, 1.0, rtol=1e-10)
    with pytest.raises(ValueError):
        bpz_pt_m(3, 22.0)
    # pz_tm at a few points matches the normalized closed form.
    prior = BPZPrior.instance()
    z, t, m = 1.3, 1, 23.7
    got = bpz_pz_tm(z, t, m)
    grid = prior.pz_tm_grid(t, m)
    want = np.interp(z, prior.zgrid, grid)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_mag_err_behaves():
    """Corrected Rykoff model: ~0.217 mag at the 5-sigma limit, smaller
    for brighter objects."""
    err_at_lim = mag_err(24.0, 24.0)
    np.testing.assert_allclose(err_at_lim, 2.5 / np.log(10) / 5.0,
                               rtol=1e-6)
    assert mag_err(20.0, 24.0) < mag_err(23.0, 24.0) < err_at_lim


@pytest.fixture(scope="module")
def sdss():
    return MockSurvey(survey="sdss", templates="cww+", prior="bpz", seed=7)


def test_survey_loading(sdss):
    assert sdss.NFILTER == 5
    names = [f["name"] for f in sdss.filters]
    assert names == ["u", "g", "r", "i", "z"]
    assert sdss.ref_filter == 2  # r band
    # Effective wavelengths in the right ballpark (A).
    leff = [f["lambda_eff"] for f in sdss.filters]
    for got, want in zip(leff, [3550, 4690, 6180, 7500, 8960]):
        assert abs(got - want) / want < 0.05
    assert sdss.NTEMPLATE == 8
    assert sdss.NTYPE == 3


def oracle_synth_flux(tmp, fltr, z, igm=True):
    """Reference-style integral for one (template, filter, z)
    (simulate.py:1004-1014), unpadded numpy."""
    tlw = np.log(tmp["wavelength"])
    flw = np.log(fltr["wavelength"])
    fnu = fltr["frequency"]
    ft = fltr["transmission"]
    te = oracle_madau_teff(fltr["wavelength"], z) if igm else 1.0
    fl = np.sinh(np.interp(flw, tlw + np.log(1 + z), np.arcsinh(tmp["fnu"])))
    norm = np.trapezoid(ft / fnu, fnu)
    return np.trapezoid(ft / fnu * te * fl, fnu) / norm


def test_synthesis_matches_oracle(sdss):
    zs = np.array([0.05, 0.5, 1.5, 3.5])
    grid = sdss.synthesize_grid(zs)
    assert grid.shape == (4, 8, 5)
    for iz, z in enumerate(zs):
        for it in (0, 3, 7):
            for jf in range(5):
                want = oracle_synth_flux(sdss.templates[it],
                                         sdss.filters[jf], z)
                np.testing.assert_allclose(grid[iz, it, jf], want,
                                           rtol=1e-5, atol=1e-12,
                                           err_msg=f"z={z} t={it} f={jf}")


def test_model_grid_and_flatten(sdss):
    zgrid = np.linspace(0.01, 3.0, 20)
    models = sdss.make_model_grid(zgrid)
    assert models["data"].shape == (20, 8, 5)
    flat, zz, tt = sdss.flatten_grid()
    assert flat.shape == (160, 5)
    np.testing.assert_array_equal(zz[:8], np.full(8, zgrid[0]))
    np.testing.assert_array_equal(tt[:8], np.arange(8))


def test_make_mock(sdss):
    data = sdss.make_mock(200, verbose=False)
    assert sdss.NOBJ == 200
    assert set(data) >= {"refmags", "types", "templates", "redshifts",
                         "phot_true", "phot_obs", "phot_err"}
    ok = np.isfinite(data["refmags"])
    assert ok.mean() > 0.9  # only a few bad-photometry objects
    assert data["types"].min() >= 0 and data["types"].max() <= 2
    assert data["redshifts"].min() >= 0
    assert data["redshifts"].max() <= 15
    # Reference-band true flux equals the drawn magnitude's flux.
    want = 10 ** ((data["refmags"][ok] - 23.9) / -2.5)
    np.testing.assert_allclose(data["phot_true"][ok, sdss.ref_filter],
                               want, rtol=1e-10)
    # Noise scatter statistically matches the declared depths.
    resid = (data["phot_obs"] - data["phot_true"]) / data["phot_err"]
    assert 0.8 < resid[ok].std() < 1.2
    # Types/templates are consistent.
    assert (sdss.TTYPE[data["templates"]] == data["types"]).all()


def test_draw_distributions(sdss):
    """Inverse-CDF draws follow the analytic prior (KS-style check)."""
    rng = np.random.default_rng(0)
    from frankenz_tpu.sim import draw_mag

    mags = draw_mag(20000, sdss.pm, rng, pmag_kwargs={"maglim": 22.3},
                    mbounds=(14, 24))
    mgrid = np.linspace(14, 24, 1000)
    p = pmag(mgrid, maglim=22.3)
    p /= np.trapezoid(p, mgrid)
    cdf = np.cumsum(p) / p.sum()
    # Empirical vs analytic CDF at a few quantiles.
    for q in (0.1, 0.5, 0.9):
        want = mgrid[np.searchsorted(cdf, q)]
        got = np.quantile(mags, q)
        assert abs(got - want) < 0.1
