"""Decaying cold dark matter -> dark radiation golden acceptance
(tests/golden/gen/g10_dcdm.ini): Omega_dcdmdr = 0.11, Gamma_dcdm = 50 km/s/Mpc
(lifetime of order the Hubble time, so a large late-time effect), lensed
TT/TE/EE + P(k).

Exercises the closed-form dcdm/dr background (exact a^-3 e^{-Gamma t} +
cumulative dr integral replacing the reference's shooting) and the dr
Boltzmann hierarchy with its dcdm source terms
(perturbations_module.cpp:8290-8360).
"""

import numpy as np
import pytest

from classpp_public_tpu import Class
from tests.conftest import GOLDEN_DIR, Golden

PARAMS = {
    "h": 0.67810, "omega_b": 0.02238280, "omega_cdm": 0.07,
    "Omega_dcdmdr": 0.11, "Gamma_dcdm": 50.0,
    "N_ur": 3.046, "A_s": 2.100549e-09, "n_s": 0.9660499,
    "tau_reio": 0.05430842,
    "output": "tCl,pCl,lCl,mPk", "lensing": "yes",
    "l_max_scalars": 2500, "P_k_max_1/Mpc": 1.0, "z_pk": "0.",
}


@pytest.fixture(scope="module")
def g10():
    return Golden(GOLDEN_DIR / "g10_dcdm.npz")


@pytest.fixture(scope="module")
def computed():
    c = Class()
    c.set(dict(PARAMS))
    c.compute(["lensing"])
    return c


def test_background_vs_golden(computed, g10):
    bg, bidx = computed.cosmo.background
    t = np.asarray(bg.table)
    z = 1.0 / t[:, bidx["a"]] - 1.0
    zr = g10.col("background", "z")
    sel = (zr > 0.01) & (zr < 5000)
    for col, gcol in [("rho_dcdm", "rho_dcdm"), ("rho_dr", "(.)rho_dr")]:
        ref = g10.col("background", gcol)[sel]
        mine = np.exp(np.interp(np.log1p(zr[sel]), np.log1p(z[::-1]),
                                np.log(t[::-1, bidx[col]])))
        assert np.abs(mine / ref - 1).max() < 1e-3, col


def test_raw_cl_vs_golden(computed, g10):
    cols = [str(c) for c in g10.cols("cl")]
    T = g10.table("cl")
    lr = T[:, 0]
    cl = computed.raw_cl(2500)
    ell = cl["ell"][2:]
    fac = ell * (ell + 1) / (2 * np.pi)
    for name, col, tol in [("tt", "TT", 3e-3), ("ee", "EE", 3e-3)]:
        mine = fac * cl[name][2:]
        ref = np.interp(ell, lr, T[:, cols.index(col)])
        rel = np.abs(mine / ref - 1)
        assert rel.max() < tol, (name, rel.max(), ell[rel.argmax()])


def test_lensed_cl_vs_golden(computed, g10):
    cols = [str(c) for c in g10.cols("cl_lensed")]
    T = g10.table("cl_lensed")
    lr = T[:, 0]
    cl = computed.lensed_cl(2400)
    ell = cl["ell"][2:]
    fac = ell * (ell + 1) / (2 * np.pi)
    for name, col in [("tt", "TT"), ("ee", "EE")]:
        mine = fac * cl[name][2:]
        ref = np.interp(ell, lr, T[:, cols.index(col)])
        rel = np.abs(mine / ref - 1)
        assert rel.max() < 3e-3, (name, rel.max(), ell[rel.argmax()])


def test_pk_vs_golden(computed, g10):
    h = computed.h()
    T = g10.table("pk")
    ks = T[:, 0] * h
    sel = (ks > 1e-3) & (ks < 0.9)
    mine = np.array([computed.pk_lin(kk, 0.0) for kk in ks[sel][::5]])
    ref = T[sel, 1][::5] / h**3
    rel = np.abs(mine / ref - 1)
    assert rel.max() < 1e-2, (rel.max(), ks[sel][::5][rel.argmax()])
