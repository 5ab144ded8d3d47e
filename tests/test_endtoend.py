"""End-to-end acceptance test: lensed/unlensed C_l and P(k) vs the reference
golden outputs at default precision. This is the analog of the reference CI's
regression contract (python/test_class.py:102-105): C_l rtol 3e-3, P(k) 1e-2.

The full pipeline at Planck-ish resolution takes a few CPU minutes; all
spectra checks share one session-scoped pipeline run.
"""

import numpy as np
import pytest

from classpp_public_tpu import Class


@pytest.fixture(scope="session")
def computed(g1_params):
    cosmo = Class()
    cosmo.set({
        "h": 0.67810, "T_cmb": 2.7255, "omega_b": 0.02238280,
        "omega_cdm": 0.1201075, "N_ur": 3.046, "A_s": 2.100549e-09,
        "n_s": 0.9660499, "tau_reio": 0.05430842,
        "output": "tCl,pCl,lCl,mPk", "lensing": "yes",
        "l_max_scalars": 2500, "P_k_max_1/Mpc": 10.0, "z_pk": "0., 1., 3.",
        "non linear": "halofit",
    })
    cosmo.compute(["lensing"])
    cosmo.cosmo.nonlinear  # also pull halofit
    return cosmo


def _cl_table(g1, name):
    cols = [str(c) for c in g1.cols(name)]
    T = g1.table(name)
    return cols, T


def test_raw_cl_vs_golden(computed, g1):
    cols, T = _cl_table(g1, "cl")
    lr = T[:, 0]
    cl = computed.raw_cl(2500)
    ell = cl["ell"][2:]
    fac = ell * (ell + 1) / (2 * np.pi)
    for name, col, tol in [("tt", "TT", 3e-3), ("ee", "EE", 3e-3), ("pp", "phiphi", 1e-2)]:
        mine = fac * cl[name][2:]
        ref = np.interp(ell, lr, T[:, cols.index(col)])
        rel = np.abs(mine / ref - 1)
        assert rel.max() < tol, (name, rel.max(), ell[rel.argmax()])
    # TE crosses zero: compare against sqrt(TT*EE)
    mine = fac * cl["te"][2:]
    ref = np.interp(ell, lr, T[:, cols.index("TE")])
    den = np.sqrt(np.interp(ell, lr, T[:, cols.index("TT")])
                  * np.interp(ell, lr, T[:, cols.index("EE")]))
    assert np.max(np.abs(mine - ref) / den) < 3e-3


def test_lensed_cl_vs_golden(computed, g1):
    cols, T = _cl_table(g1, "cl_lensed")
    lr = T[:, 0]
    cl = computed.lensed_cl(2500)
    ell = cl["ell"][2:]
    fac = ell * (ell + 1) / (2 * np.pi)
    for name, col, tol in [("tt", "TT", 3e-3), ("ee", "EE", 3e-3), ("bb", "BB", 3e-3)]:
        mine = fac * cl[name][2:]
        ref = np.interp(ell, lr, T[:, cols.index(col)])
        rel = np.abs(mine / ref - 1)
        assert rel.max() < tol, (name, rel.max(), ell[rel.argmax()])


def test_pk_lin_vs_golden(computed, g1):
    # golden z1_pk is z=0, z2 is z=1, z3 is z=3 (z_pk = 0, 1, 3)
    for tab, z in [("z1_pk", 0.0), ("z2_pk", 1.0), ("z3_pk", 3.0)]:
        T = g1.table(tab)
        k_h, pk_h = T[:, 0], T[:, 1]  # h/Mpc, (Mpc/h)^3
        h = computed.h()
        ks = k_h * h
        sel = (ks > 2e-4) & (ks < 9.0)
        mine = np.array([computed.pk_lin(k, z) for k in ks[sel][::7]])
        ref = (pk_h[sel][::7] / h**3)
        rel = np.abs(mine / ref - 1)
        assert rel.max() < 1e-2, (tab, rel.max())


def test_pk_nl_halofit_vs_golden(computed):
    import numpy as np

    from tests.conftest import GOLDEN_DIR, Golden

    gh = Golden(GOLDEN_DIR / "g1h_halofit.npz")
    nl = computed.cosmo.nonlinear
    h = computed.h()
    for tab, iz in [("z1_pk_nl", 0), ("z2_pk_nl", 1), ("z3_pk_nl", 2)]:
        T = gh.table(tab)
        k_h, pk_h = T[:, 0], T[:, 1]
        ks = k_h * h
        sel = (ks > 1e-2) & (ks < 9.0)
        lnk = np.log(np.asarray(nl.k))
        mine = np.exp(np.interp(np.log(ks[sel]), lnk, np.log(np.asarray(nl.pk_nl[iz]))))
        ref = pk_h[sel] / h**3
        rel = np.abs(mine / ref - 1)
        assert rel.max() < 2.5e-2, (tab, rel.max())


def test_sigma8(computed):
    s8 = computed.sigma8()
    # reference build for this exact cosmology prints
    # "sigma8=0.824933 for total matter (computed till k = 16.5325 h/Mpc)";
    # we integrate to k_max=10/Mpc ~ 14.7 h/Mpc, so allow for the small
    # truncation difference on top of the P(k) 1e-2 contract
    assert abs(s8 / 0.824933 - 1) < 5e-3, s8


def test_derived_parameters(computed):
    d = computed.get_current_derived_parameters(
        ["z_rec", "tau_rec", "rs_rec", "z_star", "100*theta_star", "z_d", "rs_d", "age"])
    assert abs(d["z_rec"] - 1088.796044) < 1.0
    assert abs(d["100*theta_star"] - 1.044061) / 1.044061 < 2e-4
    assert abs(d["rs_d"] - 147.060518) / 147.060518 < 1.5e-3
    assert abs(d["age"] - 13.770593) < 1e-3


def test_background_accessors(computed):
    assert abs(computed.Hubble(0.0) / computed.h() - 1.0e5 / 2.99792458e8 / 1.0) < 1e-6
    da = computed.angular_distance(1088.8)
    assert abs(da - 12.728287) / 12.728287 < 1e-3
    r, dzdr = computed.z_of_r([0.5, 1.0])
    assert r[1] > r[0] > 0


def test_invalid_input_raises(g1_params):
    from classpp_public_tpu import CosmoSevereError

    c = Class()
    c.set({"output": "tCl", "modes": "s,v"})  # vector modes: not implemented
    with pytest.raises(CosmoSevereError):
        c.compute()
    c = Class()
    c.set({"output": "tCl", "made_up_parameter": 1.0})  # unknown keys refuse
    with pytest.raises(CosmoSevereError):
        c.compute()
