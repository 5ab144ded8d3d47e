"""Newtonian-gauge golden acceptance vs the reference build (tests/golden/
gen/g9_newt.ini): `gauge = newtonian`, lensed TT/TE/EE + P(k) to 10/Mpc.

Contract: the reference CI accuracy contract (C_l rtol 3e-3, P(k) 1e-2,
python/test_class.py:102-105) applied to the newtonian-gauge solve. This is
stronger than the gauge cross-check in test_gauge.py: it pins the newtonian
pipeline to the reference's own newtonian output, not just to our own
synchronous solve.
"""

import numpy as np
import pytest

from classpp_public_tpu import Class
from tests.conftest import GOLDEN_DIR, Golden

PARAMS = {
    "h": 0.67810, "omega_b": 0.02238280, "omega_cdm": 0.1201075,
    "N_ur": 3.046, "A_s": 2.100549e-09, "n_s": 0.9660499,
    "tau_reio": 0.05430842, "gauge": "newtonian",
    "output": "tCl,pCl,lCl,mPk", "lensing": "yes",
    "l_max_scalars": 2500, "P_k_max_1/Mpc": 10.0, "z_pk": "0.",
}


@pytest.fixture(scope="module")
def g9():
    return Golden(GOLDEN_DIR / "g9_newt.npz")


@pytest.fixture(scope="module")
def computed():
    c = Class()
    c.set(dict(PARAMS))
    c.compute(["lensing"])
    return c


def test_raw_cl_vs_golden(computed, g9):
    cols = [str(c) for c in g9.cols("cl")]
    T = g9.table("cl")
    lr = T[:, 0]
    cl = computed.raw_cl(2500)
    ell = cl["ell"][2:]
    fac = ell * (ell + 1) / (2 * np.pi)
    for name, col, tol in [("tt", "TT", 3e-3), ("ee", "EE", 3e-3), ("pp", "phiphi", 1e-2)]:
        mine = fac * cl[name][2:]
        ref = np.interp(ell, lr, T[:, cols.index(col)])
        rel = np.abs(mine / ref - 1)
        assert rel.max() < tol, (name, rel.max(), ell[rel.argmax()])
    mine = fac * cl["te"][2:]
    ref = np.interp(ell, lr, T[:, cols.index("TE")])
    den = np.sqrt(np.interp(ell, lr, T[:, cols.index("TT")])
                  * np.interp(ell, lr, T[:, cols.index("EE")]))
    assert np.max(np.abs(mine - ref) / den) < 3e-3


def test_lensed_cl_vs_golden(computed, g9):
    cols = [str(c) for c in g9.cols("cl_lensed")]
    T = g9.table("cl_lensed")
    lr = T[:, 0]
    cl = computed.lensed_cl(2400)
    ell = cl["ell"][2:]
    fac = ell * (ell + 1) / (2 * np.pi)
    for name, col, tol in [("tt", "TT", 3e-3), ("ee", "EE", 3e-3)]:
        mine = fac * cl[name][2:]
        ref = np.interp(ell, lr, T[:, cols.index(col)])
        rel = np.abs(mine / ref - 1)
        assert rel.max() < tol, (name, rel.max(), ell[rel.argmax()])


def test_pk_vs_golden(computed, g9):
    h = computed.h()
    T = g9.table("pk")
    ks = T[:, 0] * h
    sel = (ks > 1e-3) & (ks < 9.0)
    mine = np.array([computed.pk_lin(kk, 0.0) for kk in ks[sel][::5]])
    ref = T[sel, 1][::5] / h**3
    rel = np.abs(mine / ref - 1)
    assert rel.max() < 1e-2, (rel.max(), ks[sel][::5][rel.argmax()])
