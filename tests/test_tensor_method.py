"""'tensor method = exact / photons' golden acceptance (VERDICT r3 item 9).

Reference: input dispatch input_module.cpp:2911-2920, method switch
perturbations_module.cpp:594-609, exact ncdm Psi_l(q) tensor hierarchy
:9158-9205 and its gw source :6700-6745.

Config (g32/g33): 1 massive ncdm (0.06 eV) + N_ur = 2.0328, r = 0.1,
n_t = scc, lensed TT/EE/BB to l_max_scalars 1200 / l_max_tensors 500.
g32 = tensor method exact, g33 = photons. Contract: C_l rtol 3e-3 on the
scalar-dominated spectra; BB (pure tensor) rtol 1e-2 to l = 400.
"""

import numpy as np
import pytest

from classpp_public_tpu import Class
from tests.conftest import GOLDEN_DIR, Golden

BASE = {
    "h": 0.67810, "omega_b": 0.02238280, "omega_cdm": 0.1201075,
    "N_ur": 2.0328, "N_ncdm": 1, "m_ncdm": 0.06,
    "A_s": 2.100549e-09, "n_s": 0.9660499, "tau_reio": 0.05430842,
    "modes": "s,t", "r": 0.1, "n_t": "scc", "l_max_tensors": 500,
    "output": "tCl,pCl,lCl", "lensing": "yes", "l_max_scalars": 1200,
}


@pytest.fixture(scope="module", params=[("g32_texact", "exact"),
                                        ("g33_tphotons", "photons")],
                ids=["exact", "photons"])
def case(request):
    name, method = request.param
    c = Class()
    c.set(dict(BASE, **{"tensor method": method}))
    c.compute(["lensing"])
    return Golden(GOLDEN_DIR / f"{name}.npz"), c


def test_raw_cl_vs_golden(case):
    g, c = case
    cols = [str(x) for x in g.cols("cl")]
    T = g.table("cl")
    lr = T[:, 0]
    cl = c.raw_cl(1200)
    ell = cl["ell"][2:]
    fac = ell * (ell + 1) / (2 * np.pi)
    for name, col in [("tt", "TT"), ("ee", "EE")]:
        mine = fac * cl[name][2:]
        ref = np.interp(ell, lr, T[:, cols.index(col)])
        rel = np.abs(mine / ref - 1)
        assert rel.max() < 3e-3, (name, rel.max(), ell[rel.argmax()])


def test_tensor_bb_vs_golden(case):
    """BB below lensing-B domination is pure tensor power: the direct probe
    of the method-specific neutrino damping of gravitational waves."""
    g, c = case
    cols = [str(x) for x in g.cols("cl")]
    T = g.table("cl")
    lr = T[:, 0]
    cl = c.raw_cl(1200)
    ell = cl["ell"][2:]
    m = ell <= 400
    fac = ell[m] * (ell[m] + 1) / (2 * np.pi)
    mine = fac * cl["bb"][2:][m]
    ref = np.interp(ell[m], lr, T[:, cols.index("BB")])
    rel = np.abs(mine / ref - 1)
    assert rel.max() < 1e-2, (rel.max(), ell[m][rel.argmax()])


def test_methods_differ():
    """photons vs exact must differ in tensor BB: free-streaming neutrinos
    damp gravitational waves by ~10% in power (Weinberg 2004); with no
    neutrino anisotropic stress the BB spectrum comes out higher."""
    g_ph = Golden(GOLDEN_DIR / "g33_tphotons.npz")
    g_ex = Golden(GOLDEN_DIR / "g32_texact.npz")
    T_ph, T_ex = g_ph.table("cl"), g_ex.table("cl")
    cols = [str(x) for x in g_ph.cols("cl")]
    bb = cols.index("BB")
    m = (T_ph[:, 0] >= 10) & (T_ph[:, 0] <= 100)
    ratio = T_ph[m, bb] / T_ex[m, bb]
    assert ratio.mean() > 1.05
