"""classy accessor-tail parity: derived parameters, Omega_nu, pk_tilt,
get_ncdm, theta_d_100 (VERDICT r3 items 4/8; reference classy.pyx:1414-1640).

Every derived name the reference recognizes must either return a float or
raise CosmoSevereError explaining why it is not applicable — never
'not recognized'.
"""

import numpy as np
import pytest

from classpp_public_tpu import Class, CosmoSevereError

# the complete reference name list (classy.pyx get_current_derived_parameters)
REF_DERIVED = [
    "h", "H0", "Omega0_lambda", "Omega_Lambda", "Omega0_fld", "age",
    "conformal_age", "m_ncdm_in_eV", "m_ncdm_tot", "Neff", "Omega_m",
    "omega_m", "Omega_g", "xi_idr", "N_dg", "Gamma_0_nadm", "a_dark",
    "tau_reio", "z_reio", "z_rec", "tau_rec", "rs_rec", "rs_rec_h",
    "ds_rec", "ds_rec_h", "ra_rec", "ra_rec_h", "da_rec", "da_rec_h",
    "z_star", "tau_star", "rs_star", "ds_star", "ra_star", "da_star",
    "rd_star", "z_d", "tau_d", "ds_d", "ds_d_h", "rs_d", "rs_d_h",
    "100*theta_s", "100*theta_star", "100*theta_d", "YHe", "n_e",
    "A_s", "ln10^{10}A_s", "n_s", "alpha_s", "beta_s", "r", "r_0002",
    "n_t", "alpha_t", "V_0", "V_1", "V_2", "V_3", "V_4", "epsilon_V",
    "eta_V", "ksi_V^2", "exp_m_2_tau_As", "phi_min", "phi_max",
    "sigma8", "sigma8_cb", "k_eq",
]


@pytest.fixture(scope="module")
def lcdm():
    c = Class()
    c.set({"output": "tCl,mPk", "l_max_scalars": 100, "P_k_max_1/Mpc": 1.0,
           "z_pk": "0."})
    c.compute(["spectra"])
    return c


def test_every_reference_derived_name_handled(lcdm):
    unrecognized = []
    for name in REF_DERIVED:
        try:
            v = lcdm.get_current_derived_parameters([name])[name]
            assert np.isfinite(v), name
        except CosmoSevereError as e:
            # acceptable only as an explained inapplicability, never as an
            # unknown name
            msg = str(e)
            if "not recognized" in msg:
                unrecognized.append(name)
            else:
                assert ("not applicable" in msg or "no ncdm" in msg
                        or "not set" in msg), f"{name}: {msg}"
    assert not unrecognized, f"unrecognized derived names: {unrecognized}"


def test_derived_epoch_relations(lcdm):
    d = lcdm.get_current_derived_parameters(
        ["z_rec", "rs_rec", "ds_rec", "ra_rec", "da_rec", "rd_star",
         "100*theta_d", "n_e", "k_eq", "rs_rec_h"])
    h = lcdm.h()
    assert d["ds_rec"] == pytest.approx(d["rs_rec"] / (1 + d["z_rec"]), rel=1e-12)
    assert d["da_rec"] == pytest.approx(d["ra_rec"] / (1 + d["z_rec"]), rel=1e-12)
    assert d["rs_rec_h"] == pytest.approx(d["rs_rec"] * h, rel=1e-12)
    # flat LCDM sanity ranges
    assert 135.0 < d["ra_rec"] / 100.0 < 145.0     # ~13.9 Gpc comoving
    assert 30.0 < d["rd_star"] < 60.0   # r_d = 2pi/k_d ~ 45 Mpc (k_d~0.14)
    assert d["100*theta_d"] > 0
    assert 0.15 < d["n_e"] < 0.25                  # ~0.19 m^-3 for omega_b=0.0224
    assert 0.005 < d["k_eq"] < 0.02                # ~0.010 1/Mpc


def test_exp_m_2_tau_As(lcdm):
    d = lcdm.get_current_derived_parameters(["exp_m_2_tau_As", "A_s",
                                             "tau_reio"])
    assert d["exp_m_2_tau_As"] == pytest.approx(
        np.exp(-2 * d["tau_reio"]) * d["A_s"], rel=1e-12)


def test_beta_s_zero_for_powerlaw(lcdm):
    d = lcdm.get_current_derived_parameters(["beta_s", "alpha_s"])
    assert abs(d["beta_s"]) < 1e-8
    assert abs(d["alpha_s"]) < 1e-12


def test_pk_tilt(lcdm):
    # on large scales P ~ k^{n_s}; tilt crosses through ~n_s - 4-ish near
    # the turnover; just check the asymptotics and the error branch
    tilt_lo = lcdm.pk_tilt(2e-4, 0.0)
    assert 0.7 < tilt_lo < 1.05
    tilt_hi = lcdm.pk_tilt(0.5, 0.0)
    assert tilt_hi < -1.5
    with pytest.raises(CosmoSevereError):
        lcdm.pk_tilt(50.0, 0.0)


def test_omega_nu_and_get_ncdm_empty(lcdm):
    assert lcdm.Omega_nu == 0.0
    assert lcdm.get_ncdm() == {}


def test_get_ncdm_species():
    c = Class()
    c.set({"output": "mPk", "P_k_max_1/Mpc": 0.5, "N_ncdm": 1,
           "m_ncdm": 0.06, "z_pk": "0."})
    c.compute(["perturbations"])
    d = c.get_ncdm()
    assert d["deg[0]"] == 1.0
    assert d["m_ncdm[0]"] == pytest.approx(0.06)
    n = d["q_size[0]"]
    qs = [d[f"q[0][{j}]"] for j in range(n)]
    assert all(q > 0 for q in qs) and qs == sorted(qs)
    assert c.Omega_nu > 0.0
    der = c.get_current_derived_parameters(["m_ncdm_in_eV", "m_ncdm_tot",
                                            "Omega_ncdm"])
    assert der["m_ncdm_in_eV"] == pytest.approx(0.06)
    # Omega_nu h^2 ~ m/93.14 eV
    assert der["m_ncdm_tot"] == pytest.approx(0.06, rel=0.1)
