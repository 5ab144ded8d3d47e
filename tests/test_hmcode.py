"""HMcode-2016 golden acceptance vs the reference build (tests/golden/gen/
g6_hmcode.ini): `non linear = hmcode`, P(k) at z = 0, 1, 3 up to 20/Mpc.

Contract: nonlinear P(k) within a few percent of the reference HMcode
(the reference CI P(k) tolerance is 1e-2; trapezoid-vs-spline quadrature
differences in the sigma/1h integrals add a little slack at high k).
"""

import numpy as np
import pytest

from classpp_public_tpu import Class
from tests.conftest import GOLDEN_DIR, Golden

PARAMS = {
    "h": 0.67810, "omega_b": 0.02238280, "omega_cdm": 0.1201075,
    "N_ur": 3.046, "A_s": 2.100549e-09, "n_s": 0.9660499,
    "tau_reio": 0.05430842,
    "output": "mPk", "non linear": "hmcode",
    "P_k_max_1/Mpc": 20.0, "z_pk": "0., 1., 3.",
}


@pytest.fixture(scope="module")
def g6():
    return Golden(GOLDEN_DIR / "g6_hmcode.npz")


@pytest.fixture(scope="module")
def computed():
    c = Class()
    c.set(dict(PARAMS))
    c.compute(["nonlinear"])
    return c


def test_pk_lin_vs_golden(computed, g6):
    nl = computed.cosmo.nonlinear
    h = computed.h()
    lnk = np.log(np.asarray(nl.k))
    for tab, iz in [("z1_pk", 0), ("z2_pk", 1), ("z3_pk", 2)]:
        T = g6.table(tab)
        ks = T[:, 0] * h
        sel = (ks > 1e-2) & (ks < 18.0)
        mine = np.exp(np.interp(np.log(ks[sel]), lnk,
                                np.log(np.asarray(nl.pk_lin[iz]))))
        ref = T[sel, 1] / h**3
        assert np.abs(mine / ref - 1).max() < 1e-2, tab


def test_pk_nl_hmcode_vs_golden(computed, g6):
    nl = computed.cosmo.nonlinear
    h = computed.h()
    lnk = np.log(np.asarray(nl.k))
    for tab, iz in [("z1_pk_nl", 0), ("z2_pk_nl", 1), ("z3_pk_nl", 2)]:
        T = g6.table(tab)
        ks = T[:, 0] * h
        sel = (ks > 1e-2) & (ks < 18.0)
        mine = np.exp(np.interp(np.log(ks[sel]), lnk,
                                np.log(np.asarray(nl.pk_nl[iz]))))
        ref = T[sel, 1] / h**3
        rel = np.abs(mine / ref - 1)
        assert rel.max() < 3e-2, (tab, rel.max(), ks[sel][rel.argmax()])


def test_knl_reasonable(computed):
    k_nl = np.asarray(computed.cosmo.nonlinear.k_nl)
    # k_nl grows toward higher z (less evolved structure)
    assert k_nl[0] < k_nl[1] < k_nl[2]
    assert 0.05 < k_nl[0] < 1.0


# --- Pk_equal (pk_eq = yes): halofit for (w0, wa) via effective constant-w
# models (0810.0190 / 1601.07230; reference prepare_pk_eq,
# nonlinear_module.cpp:4064). NOTE: the reference binary SEGFAULTS on any
# pk_eq=yes config (the prepare_pk_eq fake-model rebuild crashes), so no
# golden exists; validated by its analytic limits instead.


def test_pk_eq_selfconsistency():
    import numpy as np

    from classpp_public_tpu import Class

    base = {
        "h": 0.67810, "omega_b": 0.02238280, "omega_cdm": 0.1201075,
        "N_ur": 3.046, "A_s": 2.100549e-09, "n_s": 0.9660499,
        "tau_reio": 0.05430842,
        "Omega_Lambda": 0.0, "w0_fld": -0.9, "wa_fld": 0.1, "cs2_fld": 1.0,
        "non linear": "halofit", "output": "mPk",
        "P_k_max_1/Mpc": 10.0, "z_pk": "0., 1., 2.",
    }
    c_eq = Class(); c_eq.set(dict(base, pk_eq="yes")); c_eq.compute(["nonlinear"])
    c_std = Class(); c_std.set(dict(base)); c_std.compute(["nonlinear"])
    for z in (0.0, 1.0, 2.0):
        p_eq = c_eq.pk(1.0, z)
        p_std = c_std.pk(1.0, z)
        # small but non-zero effect on nonlinear scales
        assert np.isfinite(p_eq) and p_eq > 0
        assert abs(p_eq / p_std - 1) < 0.05, (z, p_eq / p_std)
    # linear P(k) must be identical (pk_eq only reroutes halofit inputs)
    assert abs(c_eq.pk_lin(0.05, 0.0) / c_std.pk_lin(0.05, 0.0) - 1) < 1e-12
    # the effective w0 table: w_eff(z=0) must land between w0 and w0+wa
    from classpp_public_tpu.models.nonlinear import _pk_eq_tables
    cosmo = c_eq._cosmo
    bg, _ = cosmo.background
    w0_z, om_z = _pk_eq_tables(cosmo.params, bg, cosmo.pr,
                               float(cosmo.thermodynamics.tau_rec),
                               (0.0, 1.0, 2.0))
    w0_z = np.asarray(w0_z)
    assert np.all(w0_z > -1.0) and np.all(w0_z < -0.7), w0_z
    assert np.all(np.asarray(om_z) > 0.2) and np.all(np.asarray(om_z) < 1.0)
