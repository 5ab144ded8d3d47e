"""PPF dark-energy fluid golden acceptance (tests/golden/gen/g15_ppf.ini):
w0 = -1.2, wa = 0.5 — the equation of state crosses w = -1 at a = 0.6,
where the standard fluid equations are singular and the PPF formalism
(one Gamma variable; perturbations_module.cpp:6484-6570, :8550) is required.
"""

import numpy as np
import pytest

from classpp_public_tpu import Class, CosmoSevereError
from tests.conftest import GOLDEN_DIR, Golden

PARAMS = {
    "h": 0.67810, "T_cmb": 2.7255, "omega_b": 0.02238280,
    "omega_cdm": 0.1201075, "N_ur": 3.046, "A_s": 2.100549e-09,
    "n_s": 0.9660499, "tau_reio": 0.05430842, "YHe": 0.2454006,
    "Omega_Lambda": 0, "w0_fld": -1.2, "wa_fld": 0.5, "cs2_fld": 1.0,
    "use_ppf": "yes",
    "output": "tCl,pCl,lCl,mPk", "lensing": "yes",
    "l_max_scalars": 1200, "P_k_max_1/Mpc": 1.0, "z_pk": "0.",
}


@pytest.fixture(scope="module")
def g15():
    return Golden(GOLDEN_DIR / "g15_ppf.npz")


@pytest.fixture(scope="module")
def computed():
    c = Class()
    c.set(dict(PARAMS))
    c.compute(["lensing"])
    return c


def test_lensed_cl_vs_golden(computed, g15):
    cols = [str(x) for x in g15.cols("cl_lensed")]
    T = g15.table("cl_lensed")
    lr = T[:, 0]
    cl = computed.lensed_cl(1100)
    ell = cl["ell"][2:]
    fac = ell * (ell + 1) / (2 * np.pi)
    for name, col in [("tt", "TT"), ("ee", "EE")]:
        mine = fac * cl[name][2:]
        ref = np.interp(ell, lr, T[:, cols.index(col)])
        rel = np.abs(mine / ref - 1)
        assert rel.max() < 3e-3, (name, rel.max(), ell[rel.argmax()])


def test_pk_vs_golden(computed, g15):
    h = computed.h()
    T = g15.table("pk")
    ks = T[:, 0] * h
    sel = (ks > 1e-3) & (ks < 0.9)
    mine = np.array([computed.pk_lin(kk, 0.0) for kk in ks[sel][::5]])
    ref = T[sel, 1][::5] / h**3
    rel = np.abs(mine / ref - 1)
    assert rel.max() < 1e-2, (rel.max(), ks[sel][::5][rel.argmax()])


def test_ppf_newtonian_raises():
    c = Class()
    with pytest.raises(CosmoSevereError):
        c.set(dict(PARAMS, gauge="newtonian"))
        c.compute(["perturbations"])
