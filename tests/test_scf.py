"""Scalar-field dark energy (quintessence) golden acceptance
(tests/golden/gen/g13_scf.ini): Omega_Lambda = Omega_fld = 0, budget closed
by the scf with an exponential potential; the reference's shooting found
scf_lambda = 2.085983 and Omega_scf = 0.690026.

Exercises the KG background integration + lambda tuning (bisection replacing
input_module.cpp:3517 Ridder shooting) and the delta-phi perturbations
(perturbations_module.cpp:8556-8570, :6438-6476).
"""

import numpy as np
import pytest

from classpp_public_tpu import Class
from tests.conftest import GOLDEN_DIR, Golden

PARAMS = {
    "h": 0.67810, "T_cmb": 2.7255, "omega_b": 0.02238280,
    "omega_cdm": 0.1201075, "N_ur": 3.046, "A_s": 2.100549e-09,
    "n_s": 0.9660499, "tau_reio": 0.05430842, "YHe": 0.2454006,
    "Omega_Lambda": 0, "Omega_fld": 0, "Omega_scf": -1,
    "attractor_ic_scf": "yes",
    "scf_parameters": "10.0, 0.0, 0.0, 0.0, 100.0, 0.0",
    "scf_tuning_index": 0,
    "output": "tCl,pCl,lCl,mPk", "lensing": "yes",
    "l_max_scalars": 1200, "P_k_max_1/Mpc": 1.0, "z_pk": "0.",
}


@pytest.fixture(scope="module")
def g13():
    return Golden(GOLDEN_DIR / "g13_scf.npz")


@pytest.fixture(scope="module")
def computed():
    c = Class()
    c.set(dict(PARAMS))
    c.compute(["lensing"])
    return c


def test_background_vs_golden(computed, g13):
    bg, bidx = computed.cosmo.background
    t = np.asarray(bg.table)
    z = 1.0 / t[:, bidx["a"]] - 1.0
    cols = [str(x) for x in g13.cols("background")]
    T = g13.table("background")
    zr = T[:, 0]
    sel = (zr > 0.01) & (zr < 1e10)
    for col, gcol, tol in [("rho_scf", "(.)rho_scf", 1e-3),
                           ("H", "H [1/Mpc]", 1e-4),
                           ("phi_scf", "phi_scf", 1e-3)]:
        ref = T[sel, cols.index(gcol)]
        mine = np.interp(np.log1p(zr[sel]), np.log1p(z[::-1]),
                         t[::-1, bidx[col]])
        assert np.abs(mine / ref - 1).max() < tol, col
    # Omega_scf today matched the reference's shooting target
    om = float(t[-1, bidx["rho_scf"]] / t[-1, bidx["H"]] ** 2)
    assert abs(om / 0.690026 - 1) < 1e-4


def test_lensed_cl_vs_golden(computed, g13):
    cols = [str(x) for x in g13.cols("cl_lensed")]
    T = g13.table("cl_lensed")
    lr = T[:, 0]
    cl = computed.lensed_cl(1100)
    ell = cl["ell"][2:]
    fac = ell * (ell + 1) / (2 * np.pi)
    # EE: the low-l reionization bump differs at ~4e-3 (tau_reio inversion
    # through the scf-modified H(z~8) reaches the target to ~0.2%)
    for name, col, tol in [("tt", "TT", 3e-3), ("ee", "EE", 6e-3)]:
        mine = fac * cl[name][2:]
        ref = np.interp(ell, lr, T[:, cols.index(col)])
        rel = np.abs(mine / ref - 1)
        assert rel.max() < tol, (name, rel.max(), ell[rel.argmax()])


def test_pk_vs_golden(computed, g13):
    h = computed.h()
    T = g13.table("pk")
    ks = T[:, 0] * h
    sel = (ks > 1e-3) & (ks < 0.9)
    mine = np.array([computed.pk_lin(kk, 0.0) for kk in ks[sel][::5]])
    ref = T[sel, 1][::5] / h**3
    rel = np.abs(mine / ref - 1)
    assert rel.max() < 1e-2, (rel.max(), ks[sel][::5][rel.argmax()])
