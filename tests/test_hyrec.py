"""HyRec recombination golden acceptance (tests/golden/gen/g5_hyrec.ini):
`recombination = HyRec`, lensed TT/TE/EE + P(k).

Contracts: x_e(z) within 1e-3 relative of the reference HyRec through
recombination (VERDICT round-1 item 5), C_l at the usual 3e-3 / P(k) 1e-2.
"""

import numpy as np
import pytest

from classpp_public_tpu import Class
from tests.conftest import GOLDEN_DIR, Golden

PARAMS = {
    "h": 0.67810, "omega_b": 0.02238280, "omega_cdm": 0.1201075,
    "N_ur": 3.046, "A_s": 2.100549e-09, "n_s": 0.9660499,
    "tau_reio": 0.05430842, "recombination": "HyRec",
    "output": "tCl,pCl,lCl,mPk", "lensing": "yes",
    "l_max_scalars": 2500, "P_k_max_1/Mpc": 10.0, "z_pk": "0.",
}


@pytest.fixture(scope="module")
def g5():
    return Golden(GOLDEN_DIR / "g5_hyrec.npz")


@pytest.fixture(scope="module")
def computed():
    c = Class()
    c.set(dict(PARAMS))
    c.compute(["lensing"])
    return c


def test_xe_vs_reference(computed, g5):
    """x_e(z) against the reference thermodynamics table through
    recombination (200 < z < 1800) and reionization tail."""
    zr = g5.col("thermodynamics", "z")
    xer = g5.col("thermodynamics", "x_e")
    th = computed.cosmo.thermodynamics
    z_mine = np.asarray(th.z_grid)
    xe_mine = np.asarray(th.xe_of_z)
    sel = (zr > 200) & (zr < 1800)
    mine = np.exp(np.interp(np.log1p(zr[sel]), np.log1p(z_mine), np.log(xe_mine)))
    rel = np.abs(mine / xer[sel] - 1)
    assert rel.max() < 1e-3, (rel.max(), zr[sel][rel.argmax()])


def test_raw_cl_vs_golden(computed, g5):
    cols = [str(c) for c in g5.cols("cl")]
    T = g5.table("cl")
    lr = T[:, 0]
    cl = computed.raw_cl(2500)
    ell = cl["ell"][2:]
    fac = ell * (ell + 1) / (2 * np.pi)
    for name, col, tol in [("tt", "TT", 3e-3), ("ee", "EE", 3e-3)]:
        mine = fac * cl[name][2:]
        ref = np.interp(ell, lr, T[:, cols.index(col)])
        rel = np.abs(mine / ref - 1)
        assert rel.max() < tol, (name, rel.max(), ell[rel.argmax()])


def test_lensed_cl_vs_golden(computed, g5):
    cols = [str(c) for c in g5.cols("cl_lensed")]
    T = g5.table("cl_lensed")
    lr = T[:, 0]
    cl = computed.lensed_cl(2400)
    ell = cl["ell"][2:]
    fac = ell * (ell + 1) / (2 * np.pi)
    for name, col in [("tt", "TT"), ("ee", "EE")]:
        mine = fac * cl[name][2:]
        ref = np.interp(ell, lr, T[:, cols.index(col)])
        rel = np.abs(mine / ref - 1)
        assert rel.max() < 3e-3, (name, rel.max(), ell[rel.argmax()])


def test_pk_vs_golden(computed, g5):
    h = computed.h()
    T = g5.table("pk")
    ks = T[:, 0] * h
    sel = (ks > 1e-3) & (ks < 9.0)
    mine = np.array([computed.pk_lin(kk, 0.0) for kk in ks[sel][::5]])
    ref = T[sel, 1][::5] / h**3
    rel = np.abs(mine / ref - 1)
    assert rel.max() < 1e-2, (rel.max(), ks[sel][::5][rel.argmax()])
