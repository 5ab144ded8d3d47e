"""Reionization parametrizations beyond reio_camb: reio_bins_tanh and
reio_many_tanh golden acceptance (tests/golden/gen/g11*_reio*.ini), plus
reio_inter / reio_half_tanh behavioral checks.

Reference: thermodynamics_reionization_function
(thermodynamics_module.cpp:1893-2110) and the per-scheme parameter setup
(:2358-2640). The reference runs print tau = 0.080889 (bins) and
0.057604 (many_tanh); we reproduce tau to ~3e-4 and x_e(z) to ~7e-4.
"""

import numpy as np
import pytest

from classpp_public_tpu import Class, CosmoSevereError
from tests.conftest import GOLDEN_DIR, Golden

BASE = {
    "h": 0.67810, "T_cmb": 2.7255, "omega_b": 0.02238280,
    "omega_cdm": 0.1201075, "N_ur": 3.046, "A_s": 2.100549e-09,
    "n_s": 0.9660499,
    "output": "tCl,pCl,lCl", "lensing": "yes", "l_max_scalars": 1200,
}

BINS = {"reio_parametrization": "reio_bins_tanh", "binned_reio_num": 3,
        "binned_reio_z": "8,12,16", "binned_reio_xe": "0.8,0.2,0.1",
        "binned_reio_step_sharpness": 0.3}
MANY = {"reio_parametrization": "reio_many_tanh", "many_tanh_num": 2,
        "many_tanh_z": "3.5,8", "many_tanh_xe": "-2,-1",
        "many_tanh_width": 0.5}


@pytest.fixture(scope="module")
def g11():
    return Golden(GOLDEN_DIR / "g11_reio.npz")


def _compute(extra, level="lensing"):
    c = Class()
    c.set(dict(BASE, **extra))
    c.compute([level])
    return c


@pytest.fixture(scope="module")
def bins_run():
    return _compute(BINS)


@pytest.fixture(scope="module")
def many_run():
    return _compute(MANY)


def _check_xe(c, g11, tag, tau_ref):
    th = c.cosmo.thermodynamics
    assert abs(float(th.tau_reio) / tau_ref - 1) < 2e-3
    cols = [str(x) for x in g11.cols(f"{tag}_thermo")]
    T = g11.table(f"{tag}_thermo")
    zr, xer = T[:, 0], T[:, cols.index("x_e")]
    sel = zr < 45
    mine = np.interp(zr[sel], np.asarray(th.z_grid), np.asarray(th.xe_of_z))
    assert np.abs(mine / xer[sel] - 1).max() < 3e-3


def _check_cl(c, g11, tag):
    cols = [str(x) for x in g11.cols(f"{tag}_cl_lensed")]
    T = g11.table(f"{tag}_cl_lensed")
    lr = T[:, 0]
    cl = c.lensed_cl(1100)
    ell = cl["ell"][2:]
    fac = ell * (ell + 1) / (2 * np.pi)
    for name, col in [("tt", "TT"), ("ee", "EE")]:
        mine = fac * cl[name][2:]
        ref = np.interp(ell, lr, T[:, cols.index(col)])
        rel = np.abs(mine / ref - 1)
        assert rel.max() < 3e-3, (name, rel.max(), ell[rel.argmax()])


def test_bins_tanh_xe(bins_run, g11):
    _check_xe(bins_run, g11, "g11a", 0.080889)


def test_bins_tanh_cl(bins_run, g11):
    _check_cl(bins_run, g11, "g11a")


def test_many_tanh_xe(many_run, g11):
    _check_xe(many_run, g11, "g11b", 0.057604)


def test_many_tanh_cl(many_run, g11):
    _check_cl(many_run, g11, "g11b")


def test_reio_inter_runs():
    c = Class()
    c.set(dict(BASE, output="tCl", l_max_scalars=100,
               reio_parametrization="reio_inter", reio_inter_num=4,
               reio_inter_z="0,3,9.5,28",
               reio_inter_xe="-2,-2,0.16,0"))
    c.compute(["thermodynamics"])
    th = c.cosmo.thermodynamics
    # piecewise-linear profile: xe(0)=1+2fHe, decaying to the recombination
    # value at z=28; tau must land in a physical band
    assert 0.02 < float(th.tau_reio) < 0.2
    xe0 = np.interp(0.0, np.asarray(th.z_grid), np.asarray(th.xe_of_z))
    assert abs(xe0 / (1.0 + 2.0 * float(th.fHe)) - 1) < 1e-3


def test_half_tanh_runs():
    c = Class()
    c.set(dict(BASE, output="tCl", l_max_scalars=100,
               reio_parametrization="reio_half_tanh", z_reio=7.0))
    c.compute(["thermodynamics"])
    th = c.cosmo.thermodynamics
    xe0 = np.interp(0.0, np.asarray(th.z_grid), np.asarray(th.xe_of_z))
    # half_tanh neglects helium: xe -> 1 at z=0
    assert abs(xe0 - 1.0) < 5e-2


def test_bad_inputs_raise():
    c = Class()
    with pytest.raises(CosmoSevereError):
        c.set(dict(BASE, reio_parametrization="reio_nonsense"))
        c.compute(["thermodynamics"])
    c2 = Class()
    with pytest.raises(CosmoSevereError):
        c2.set(dict(BASE, **dict(BINS, binned_reio_num=7)))
        c2.compute(["thermodynamics"])
