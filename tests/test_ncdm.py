"""ncdm acceptance test vs golden G2: 3 massive neutrinos (normal hierarchy,
sum m ~ 0.1 eV), lensed TT/EE/BB + P(k) + P_cb(k), at the reference CI
contract (C_l rtol 3e-3, P(k) rtol 1e-2; python/test_class.py:102-105).

Exercises the ncdm q x l phase-space hierarchy, the fluid approximation and
remap (equations.py ncdm blocks; reference perturbations_module.cpp:8725), the
background momentum integrals (tools/non_cold_dark_matter.cpp:44) and the cb
vs m source split.
"""

import numpy as np
import pytest

from classpp_public_tpu import Class
from tests.conftest import GOLDEN_DIR, Golden


@pytest.fixture(scope="module")
def g2():
    return Golden(GOLDEN_DIR / "g2_ncdm.npz")


@pytest.fixture(scope="module")
def computed_ncdm():
    cosmo = Class()
    cosmo.set({
        "h": 0.67810, "T_cmb": 2.7255, "omega_b": 0.02238280,
        "omega_cdm": 0.1201075, "N_ur": 0.00641, "N_ncdm": 3,
        "m_ncdm": "0.021934, 0.023582, 0.054485",
        "A_s": 2.100549e-09, "n_s": 0.9660499, "tau_reio": 0.05430842,
        "YHe": "BBN",
        "output": "tCl,pCl,lCl,mPk", "lensing": "yes",
        "l_max_scalars": 2500, "P_k_max_1/Mpc": 10.0, "z_pk": "0.",
    })
    cosmo.compute(["lensing"])
    return cosmo


def test_ncdm_background_density(computed_ncdm, g2):
    """Omega_ncdm and rho_ncdm(z) vs the golden background table."""
    bgt = g2.table("background")
    cols = [str(c) for c in g2.cols("background")]
    z = g2.col("background", "z")
    rho_tot = sum(g2.col("background", f"(.)rho_ncdm[{i}]") for i in range(3))
    bg = computed_ncdm.get_background()
    mine = sum(np.interp(100.0, bg["z"][::-1],
                         bg[f"(.)rho_ncdm[{i}]"][::-1]) for i in range(3))
    ref = np.interp(100.0, z[::-1], rho_tot[::-1])
    assert abs(mine / ref - 1) < 1e-3


def test_ncdm_raw_cl(computed_ncdm, g2):
    cols = [str(c) for c in g2.cols("cl")]
    T = g2.table("cl")
    lr = T[:, 0]
    cl = computed_ncdm.raw_cl(2500)
    ell = cl["ell"][2:]
    fac = ell * (ell + 1) / (2 * np.pi)
    for name, col in [("tt", "TT"), ("ee", "EE")]:
        mine = fac * cl[name][2:]
        ref = np.interp(ell, lr, T[:, cols.index(col)])
        rel = np.abs(mine / ref - 1)
        assert rel.max() < 3e-3, (name, rel.max(), ell[rel.argmax()])
    mine = fac * cl["pp"][2:]
    ref = np.interp(ell, lr, T[:, cols.index("phiphi")])
    assert np.abs(mine / ref - 1).max() < 1e-2


def test_ncdm_lensed_cl(computed_ncdm, g2):
    cols = [str(c) for c in g2.cols("cl_lensed")]
    T = g2.table("cl_lensed")
    lr = T[:, 0]
    cl = computed_ncdm.lensed_cl(2498)
    ell = cl["ell"][2:]
    fac = ell * (ell + 1) / (2 * np.pi)
    for name, col in [("tt", "TT"), ("ee", "EE"), ("bb", "BB")]:
        mine = fac * cl[name][2:]
        ref = np.interp(ell, lr, T[:, cols.index(col)])
        rel = np.abs(mine / ref - 1)
        assert rel.max() < 3e-3, (name, rel.max(), ell[rel.argmax()])


def test_ncdm_pk_and_pk_cb(computed_ncdm, g2):
    """P_m includes the ncdm suppression; P_cb excludes ncdm. Both at 1e-2."""
    h = computed_ncdm.h()
    for tab, fn in [("pk", computed_ncdm.pk_lin), ("pk_cb", computed_ncdm.pk_cb_lin)]:
        T = g2.table(tab)
        k_h, pk_h = T[:, 0], T[:, 1]
        ks = k_h * h
        sel = (ks > 2e-4) & (ks < 9.0)
        mine = np.array([fn(k, 0.0) for k in ks[sel][::9]])
        ref = pk_h[sel][::9] / h**3
        rel = np.abs(mine / ref - 1)
        assert rel.max() < 1e-2, (tab, rel.max())


def test_ncdm_pk_suppression(computed_ncdm, g2):
    """Sanity: massive-nu suppression P_m < P_cb at small scales."""
    assert computed_ncdm.pk_lin(1.0, 0.0) < computed_ncdm.pk_cb_lin(1.0, 0.0)
