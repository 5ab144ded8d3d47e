"""DM-annihilation energy injection golden acceptance
(tests/golden/gen/g16_injection.ini): annihilation = 1e-6 m^3/s/kg boosts
the freeze-out ionization fraction by up to ~180% at z~100.

Reference: thermodynamics_onthespot_energy_injection (:1755) + the
chi_ion/chi_heat Slatyer-fit terms in the recfast derivatives (:3894, :3952).
"""

import numpy as np
import pytest

from classpp_public_tpu import Class, CosmoSevereError
from tests.conftest import GOLDEN_DIR, Golden

PARAMS = {
    "h": 0.67810, "T_cmb": 2.7255, "omega_b": 0.02238280,
    "omega_cdm": 0.1201075, "N_ur": 3.046, "A_s": 2.100549e-09,
    "n_s": 0.9660499, "tau_reio": 0.05430842, "YHe": 0.2454006,
    "annihilation": 1.0e-6,
    "output": "tCl,pCl,lCl", "lensing": "yes", "l_max_scalars": 1200,
}


@pytest.fixture(scope="module")
def g16():
    return Golden(GOLDEN_DIR / "g16_injection.npz")


@pytest.fixture(scope="module")
def computed():
    c = Class()
    c.set(dict(PARAMS))
    c.compute(["lensing"])
    return c


def test_xe_vs_golden(computed, g16):
    th = computed.cosmo.thermodynamics
    cols = [str(x) for x in g16.cols("thermo")]
    T = g16.table("thermo")
    zr, xer = T[:, 0], T[:, cols.index("x_e")]
    sel = (zr > 50) & (zr < 1500)
    mine = np.interp(zr[sel], np.asarray(th.z_grid), np.asarray(th.xe_of_z))
    assert np.abs(mine / xer[sel] - 1).max() < 1e-3


def test_lensed_cl_vs_golden(computed, g16):
    cols = [str(x) for x in g16.cols("cl_lensed")]
    T = g16.table("cl_lensed")
    lr = T[:, 0]
    cl = computed.lensed_cl(1100)
    ell = cl["ell"][2:]
    fac = ell * (ell + 1) / (2 * np.pi)
    for name, col in [("tt", "TT"), ("ee", "EE")]:
        mine = fac * cl[name][2:]
        ref = np.interp(ell, lr, T[:, cols.index(col)])
        rel = np.abs(mine / ref - 1)
        assert rel.max() < 3e-3, (name, rel.max(), ell[rel.argmax()])


def test_injection_shifts_xe():
    # the injected history must differ from the clean one (guards against a
    # silently-ignored parameter)
    c = Class()
    c.set(dict(PARAMS, annihilation=0.0, output="tCl", l_max_scalars=50))
    c.compute(["thermodynamics"])
    th0 = c.cosmo.thermodynamics
    c2 = Class()
    c2.set(dict(PARAMS, output="tCl", l_max_scalars=50))
    c2.compute(["thermodynamics"])
    th1 = c2.cosmo.thermodynamics
    z = np.asarray(th0.z_grid)
    m = (z > 80) & (z < 300)
    d = np.abs(np.interp(z[m], np.asarray(th1.z_grid), np.asarray(th1.xe_of_z))
               / np.asarray(th0.xe_of_z)[m] - 1)
    assert d.max() > 0.5


def test_injection_hyrec_shifts_xe():
    """Energy injection through the HyRec branch (hyrec/history.c:98-101
    energy_injection_rate hook; REC_COSMOPARAMS filled at
    thermodynamics_module.cpp:3031-3152): the injected history must deviate
    from the clean one at freeze-out, by an amount comparable to the
    recfast-branch shift for identical injection parameters."""
    c0 = Class()
    c0.set(dict(PARAMS, annihilation=0.0, recombination="hyrec",
                output="tCl", l_max_scalars=50))
    c0.compute(["thermodynamics"])
    th0 = c0.cosmo.thermodynamics
    c1 = Class()
    c1.set(dict(PARAMS, recombination="hyrec", output="tCl",
                l_max_scalars=50))
    c1.compute(["thermodynamics"])
    th1 = c1.cosmo.thermodynamics
    z = np.asarray(th0.z_grid)
    m = (z > 80) & (z < 300)
    boost = np.interp(z[m], np.asarray(th1.z_grid), np.asarray(th1.xe_of_z)) \
        / np.asarray(th0.xe_of_z)[m]
    assert boost.max() > 1.5
    # cross-branch consistency: same injection through recfast
    c2 = Class()
    c2.set(dict(PARAMS, output="tCl", l_max_scalars=50))
    c2.compute(["thermodynamics"])
    th2 = c2.cosmo.thermodynamics
    c3 = Class()
    c3.set(dict(PARAMS, annihilation=0.0, output="tCl", l_max_scalars=50))
    c3.compute(["thermodynamics"])
    th3 = c3.cosmo.thermodynamics
    boost_rf = np.interp(z[m], np.asarray(th2.z_grid), np.asarray(th2.xe_of_z)) \
        / np.interp(z[m], np.asarray(th3.z_grid), np.asarray(th3.xe_of_z))
    # the two branches agree on the injection boost to ~10%
    assert np.abs(boost / boost_rf - 1).max() < 0.15


# --- beyond-on-the-spot deposition (on the spot = no) ----------------------
# golden: tests/golden/gen/g22_injection_bos.ini — same config with the
# delayed-deposition redshift convolution
# (thermodynamics_energy_injection :1810-1870)


@pytest.fixture(scope="module")
def g22():
    return Golden(GOLDEN_DIR / "g22_injection_bos.npz")


@pytest.fixture(scope="module")
def computed_bos():
    c = Class()
    c.set(dict(PARAMS, **{"on the spot": "no"}))
    c.compute(["lensing"])
    return c


def test_bos_xe_vs_golden(computed_bos, g22):
    th = computed_bos.cosmo.thermodynamics
    cols = [str(x) for x in g22.cols("thermodynamics")]
    T = g22.table("thermodynamics")
    zr, xer = T[:, 0], T[:, cols.index("x_e")]
    sel = (zr > 50) & (zr < 1500)
    mine = np.interp(zr[sel], np.asarray(th.z_grid), np.asarray(th.xe_of_z))
    assert np.abs(mine / xer[sel] - 1).max() < 2e-3


def test_bos_lensed_cl_vs_golden(computed_bos, g22):
    cols = [str(x) for x in g22.cols("cl_lensed")]
    T = g22.table("cl_lensed")
    lr = T[:, 0]
    cl = computed_bos.lensed_cl(1100)
    ell = cl["ell"][2:]
    fac = ell * (ell + 1) / (2 * np.pi)
    for name, col in [("tt", "TT"), ("ee", "EE")]:
        mine = fac * cl[name][2:]
        ref = np.interp(ell, lr, T[:, cols.index(col)])
        rel = np.abs(mine / ref - 1)
        assert rel.max() < 3e-3, (name, rel.max(), ell[rel.argmax()])


def test_bos_differs_from_ots(computed, computed_bos):
    """Delayed deposition smooths the injection: x_e histories must differ
    at low z but agree before recombination."""
    th1 = computed.cosmo.thermodynamics
    th2 = computed_bos.cosmo.thermodynamics
    xe1 = np.interp(100.0, np.asarray(th1.z_grid), np.asarray(th1.xe_of_z))
    xe2 = np.interp(100.0, np.asarray(th2.z_grid), np.asarray(th2.xe_of_z))
    assert abs(xe1 / xe2 - 1) > 1e-3
