"""Correlated isocurvature golden acceptance (G21).

Three correlated scalar modes (ad, cdi, nid) with non-zero cross
correlations c_ad_cdi = -0.6 (plus a cross tilt), c_ad_nid = 0.4,
c_cdi_nid = 0.25. Reference: primordial_module.cpp:775-890 (off-diagonal
amplitude sqrt(A1 A2) c_12, tilt (n1+n2)/2 + n_12) and the spectra
ic1-ic2 assembly with factor 2 on off-diagonal pairs
(spectra_module.cpp:305-308, symmetrized TE :1155).
"""

import numpy as np
import pytest

from classpp_public_tpu import Class
from tests.conftest import GOLDEN_DIR, Golden

PARAMS = {
    "h": 0.67810, "omega_b": 0.02238280, "omega_cdm": 0.1201075,
    "N_ur": 3.046, "A_s": 2.100549e-09, "n_s": 0.9660499,
    "tau_reio": 0.05430842,
    "ic": "ad, cdi, nid",
    "f_cdi": 0.3, "n_cdi": 0.95,
    "f_nid": 0.2, "n_nid": 1.05,
    "c_ad_cdi": -0.6, "n_ad_cdi": 0.02,
    "c_ad_nid": 0.4,
    "c_cdi_nid": 0.25,
    "output": "tCl,pCl,lCl", "lensing": "yes",
    "l_max_scalars": 2500,
}


@pytest.fixture(scope="module")
def g21():
    return Golden(GOLDEN_DIR / "g21_isocorr.npz")


@pytest.fixture(scope="module")
def computed():
    c = Class()
    c.set(dict(PARAMS))
    c.compute(["lensing"])
    return c


def _rel(a, b):
    return np.abs(a / b - 1.0)


def test_raw_cl_vs_golden(computed, g21):
    cols = [str(c) for c in g21.cols("cl")]
    T = g21.table("cl")
    lr = T[:, 0]
    cl = computed.raw_cl(2500)
    ell = cl["ell"][2:]
    fac = ell * (ell + 1) / (2 * np.pi)
    for name, col in [("tt", "TT"), ("ee", "EE")]:
        mine = fac * cl[name][2:]
        ref = np.interp(ell, lr, T[:, cols.index(col)])
        assert _rel(mine, ref).max() < 3e-3, (name, _rel(mine, ref).max(),
                                              ell[_rel(mine, ref).argmax()])
    # TE crosses zero: compare against the TT*EE envelope
    mine = fac * cl["te"][2:]
    ref = np.interp(ell, lr, T[:, cols.index("TE")])
    den = np.sqrt(np.interp(ell, lr, T[:, cols.index("TT")])
                  * np.interp(ell, lr, T[:, cols.index("EE")]))
    assert (np.abs(mine - ref) / den).max() < 3e-3


def test_lensed_cl_vs_golden(computed, g21):
    cols = [str(c) for c in g21.cols("cl_lensed")]
    T = g21.table("cl_lensed")
    lr = T[:, 0]
    cl = computed.lensed_cl(2400)
    ell = cl["ell"][2:]
    fac = ell * (ell + 1) / (2 * np.pi)
    for name, col in [("tt", "TT"), ("ee", "EE")]:
        mine = fac * cl[name][2:]
        ref = np.interp(ell, lr, T[:, cols.index(col)])
        assert _rel(mine, ref).max() < 3e-3, (name, _rel(mine, ref).max())


def test_correlation_changes_cl():
    """A non-zero c_ad_cdi must shift low-l TT relative to the uncorrelated
    case (guards against a silently-dropped cross term; the shift's sign
    depends on the relative sign of the ad and cdi transfer functions)."""
    c0 = Class()
    c0.set(dict(PARAMS, c_ad_cdi=0.0, c_ad_nid=0.0, c_cdi_nid=0.0,
                output="tCl", lensing="no", l_max_scalars=50))
    c0.compute(["spectra"])
    c1 = Class()
    c1.set(dict(PARAMS, c_ad_nid=0.0, c_cdi_nid=0.0,
                output="tCl", lensing="no", l_max_scalars=50))
    c1.compute(["spectra"])
    tt0 = c0.raw_cl(40)["tt"][10]
    tt1 = c1.raw_cl(40)["tt"][10]
    assert abs(tt1 / tt0 - 1) > 0.01, (tt0, tt1)
