"""Decaying ncdm -> dark radiation (G28) — this fork's headline extension.

Golden: one stable 0.06 eV ncdm + one 1 eV decay species with
Gamma = 1e4 km/s/Mpc and Neff_ini = 1 (tests/golden/gen/g28_dncdm.ini),
lensed CMB + P(k) + the background decay history against the reference
build (tools/non_cold_dark_matter.cpp decay_dr_map_,
background_module.cpp:1991, perturbations_module.cpp:8359).
"""

import numpy as np
import pytest

from classpp_public_tpu import Class, CosmoSevereError
from tests.conftest import GOLDEN_DIR, Golden

PARAMS = {
    "h": 0.67810, "omega_b": 0.02238280, "omega_cdm": 0.1201075,
    "N_ur": 2.0328, "N_ncdm": 1, "m_ncdm": "0.06",
    "N_ncdm_decay_dr": 1, "m_ncdm_decay_dr": "1.0",
    "Gamma_ncdm_decay_dr": "1e4", "Neff_ini_dncdm": "1.0",
    "A_s": 2.100549e-09, "n_s": 0.9660499, "tau_reio": 0.05430842,
    "output": "tCl,pCl,lCl,mPk", "lensing": "yes",
    # l_max 600 (golden compare below stops at 450): the decay species keeps
    # its FULL q x l hierarchy to tau0 (no ncdmfa, solve.py n_dncdm note), so
    # the state is ~6x LCDM's and a 2500-lane run is hours on a 1-core CPU
    # host; 450 multipoles already exercise every decay term against g28
    "l_max_scalars": 600, "P_k_max_1/Mpc": 1.0, "z_pk": "0.",
}


@pytest.fixture(scope="module")
def g28():
    return Golden(GOLDEN_DIR / "g28_dncdm.npz")


@pytest.fixture(scope="module")
def computed():
    c = Class()
    c.set(dict(PARAMS))
    c.compute(["lensing"])
    return c


def test_background_decay_vs_golden(computed, g28):
    """rho_dncdm(z) and the decay-product rho_dr(z) against the reference."""
    cols = [str(x) for x in g28.cols("background")]
    T = g28.table("background")
    zr = T[:, 0]
    bg, bidx = computed.cosmo.background
    a = np.asarray(bg.table[:, bidx["a"]])
    zm = 1.0 / a - 1.0
    for name, mine_col, tol in [("(.)rho_ncdm[1]", "rho_ncdm1", 1e-3),
                                ("(.)rho_dr[0]", "rho_dr_ncdm0", 1e-2)]:
        ref = T[:, cols.index(name)]
        mine = np.asarray(bg.table[:, bidx[mine_col]])
        sel = (zr > 0.01) & (zr < 1e9)
        vals = np.interp(np.log1p(zr[sel])[::-1],
                         np.log1p(zm)[::-1], mine[::-1])[::-1]
        den = np.maximum(np.abs(ref[sel]), np.abs(ref[sel]).max() * 1e-10)
        rel = np.abs(vals - ref[sel]) / den
        assert rel.max() < tol, (name, rel.max(), zr[sel][rel.argmax()])


def test_lensed_cl_vs_golden(computed, g28):
    cols = [str(x) for x in g28.cols("cl_lensed")]
    T = g28.table("cl_lensed")
    lr = T[:, 0]
    cl = computed.lensed_cl(450)
    ell = cl["ell"][2:]
    fac = ell * (ell + 1) / (2 * np.pi)
    for name, col in [("tt", "TT"), ("ee", "EE")]:
        mine = fac * cl[name][2:]
        ref = np.interp(ell, lr, T[:, cols.index(col)])
        rel = np.abs(mine / ref - 1)
        assert rel.max() < 3e-3, (name, rel.max(), ell[rel.argmax()])


def test_pk_vs_golden(computed, g28):
    T = g28.table("pk")
    h = computed.h()
    ks = T[:, 0] * h
    sel = (ks > 2e-4) & (ks < 0.9)
    mine = np.array([computed.pk_lin(k, 0.0) for k in ks[sel][::5]])
    ref = T[sel, 1][::5] / h**3
    rel = np.abs(mine / ref - 1)
    assert rel.max() < 1e-2, rel.max()


def test_tensors_with_dncdm_raise():
    """Parity with the reference class_test (perturbations_module.cpp:7787)."""
    c = Class()
    c.set(dict(PARAMS, modes="s,t", r=0.1))
    with pytest.raises(CosmoSevereError):
        c.compute(["spectra"])
