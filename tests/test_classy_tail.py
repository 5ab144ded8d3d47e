"""Round-5 classy parity tail: every public name in the reference Cython
wrapper exists on Class, and the new accessors return sane physics.

Name list extracted from /root/reference/classy.pyx (cpdef/def/property
declarations, :152-1776)."""

import numpy as np
import pytest

from classpp_public_tpu import Class

# Every public cpdef/def/property on the reference PyCosmology/Class
# (grep '^    cpdef|^    def|^    property' classy.pyx), minus Cython
# internals (__init__/__str__ are object protocol, present trivially).
REFERENCE_PUBLIC_API = [
    "A_s", "Hubble", "Neff", "Om_m", "Omega0_cdm", "Omega0_k", "Omega0_m",
    "Omega_Lambda", "Omega_b", "Omega_g", "Omega_m", "Omega_nu", "Omega_r",
    "T_cmb", "__call__", "age", "angular_distance", "baryon_temperature",
    "compute", "empty", "get_background", "get_current_derived_parameters",
    "get_input_background", "get_input_lensing", "get_input_nonlinear",
    "get_input_output", "get_input_perturbations", "get_input_precision",
    "get_input_primordial", "get_input_spectra", "get_input_thermodynamics",
    "get_input_transfers", "get_ncdm", "get_perturbations", "get_pk",
    "get_pk_array", "get_pk_cb", "get_pk_cb_array", "get_pk_cb_lin",
    "get_pk_lin", "get_primordial", "get_thermodynamics", "get_transfer",
    "h", "ionization_fraction", "k_eq", "lensed_cl", "lensed_cl_computed",
    "luminosity_distance", "n_s", "nonlinear_method", "nonlinear_scale",
    "nonlinear_scale_cb", "omega_b", "pars", "pk", "pk_cb", "pk_cb_lin",
    "pk_lin", "pk_tilt", "raw_cl", "raw_cl_no_copy", "rs_drag",
    "scale_independent_growth_factor", "scale_independent_growth_factor_f",
    "set", "sigma", "sigma8", "sigma8_cb", "sigma_cb", "state",
    "struct_cleanup", "tau_reio", "theta_d_100", "theta_s_100",
    "theta_star_100", "z_of_r", "z_of_tau", "z_reio", "reset",
]


def test_every_reference_public_name_exists():
    missing = [n for n in REFERENCE_PUBLIC_API if not hasattr(Class, n)]
    assert not missing, f"classy.pyx public API gaps: {missing}"


@pytest.fixture(scope="module")
def lcdm():
    c = Class()
    c.set({"output": "mPk,tCl", "P_k_max_1/Mpc": 1.0, "z_pk": "0., 1.",
           "l_max_scalars": 100,
           "h": 0.67556, "omega_b": 0.022032, "omega_cdm": 0.12038,
           "A_s": 2.215e-9, "n_s": 0.9619, "z_reio": 11.357})
    c.compute(["nonlinear"])
    return c


@pytest.fixture(scope="module")
def ncdm_nl():
    c = Class()
    c.set({"output": "mPk", "P_k_max_1/Mpc": 1.0, "z_pk": "0., 1.",
           "N_ncdm": 1, "m_ncdm": 0.06, "N_ur": 2.0328,
           "non linear": "halofit"})
    c.compute(["nonlinear"])
    return c


def test_z_of_tau_inverts_background(lcdm):
    bg, _ = lcdm._bg()
    from classpp_public_tpu.models.background import tau_of_z

    for z in (0.0, 1.0, 10.0, 500.0):
        tau = float(tau_of_z(bg, z))
        assert abs(lcdm.z_of_tau(tau) - z) < 1e-3 * (1.0 + z)


def test_om_m_limits(lcdm):
    # Omega_m(z) -> Omega0_m at z=0 and -> small in radiation domination
    assert abs(float(lcdm.Om_m(0.0)) - lcdm.Omega0_m()) < 1e-3
    assert float(lcdm.Om_m(2.0)) > float(lcdm.Om_m(0.0))
    # high-z matter domination: Om_m ~ 1
    assert 0.9 < float(lcdm.Om_m(50.0)) <= 1.001


def test_ionization_fraction_and_tb(lcdm):
    # fully ionized before recombination, ~1e-4..1e-3 after, rises at reio
    assert float(lcdm.ionization_fraction(2500.0)) > 1.0  # H + He ionized
    assert float(lcdm.ionization_fraction(50.0)) < 1e-3
    assert float(lcdm.ionization_fraction(3.0)) > 1.0
    # Tb tracks T_cmb*(1+z) at high z, cools below it after decoupling
    assert abs(float(lcdm.baryon_temperature(1000.0))
               / (lcdm.T_cmb() * 1001.0) - 1.0) < 0.05
    assert float(lcdm.baryon_temperature(10.0)) < lcdm.T_cmb() * 11.0


def test_omega0_accessors(lcdm):
    p = lcdm.cosmo.params
    assert abs(lcdm.Omega0_cdm() - p.omega_cdm / p.h**2) < 1e-10
    assert lcdm.Omega0_k() == 0.0
    assert abs(lcdm.Omega0_m() - lcdm.Omega_m()) < 1e-15


def test_get_pk_3d_matches_scalar(lcdm):
    ks = np.array([0.01, 0.05, 0.1, 0.5])
    zs = np.array([0.0, 1.0])
    k3 = np.broadcast_to(ks[:, None, None], (4, 2, 3)).copy()
    out = lcdm.get_pk_lin(k3, zs, 4, 2, 3)
    assert out.shape == (4, 2, 3)
    for ik, kv in enumerate(ks):
        for iz, zv in enumerate(zs):
            want = lcdm.pk_lin(kv, zv)
            assert abs(out[ik, iz, 0] / want - 1.0) < 1e-6
            assert out[ik, iz, 1] == out[ik, iz, 0]  # mu-independent input
    # get_pk == linear when no nonlinear method was requested
    out2 = lcdm.get_pk(k3, zs, 4, 2, 3)
    np.testing.assert_allclose(out2, out, rtol=1e-12)


def test_get_pk_cb_raises_without_ncdm(lcdm):
    from classpp_public_tpu.classy import CosmoSevereError

    k3 = np.full((1, 1, 1), 0.1)
    with pytest.raises(CosmoSevereError, match="P_cb not computed"):
        lcdm.get_pk_cb_lin(k3, np.array([0.0]), 1, 1, 1)
    with pytest.raises(CosmoSevereError, match="P_cb not computed"):
        lcdm.sigma_cb(8.0, 0.0)
    with pytest.raises(CosmoSevereError, match="P_cb not computed"):
        lcdm.get_pk_cb_array(np.array([0.1]), np.array([0.0]), 1, 1, False)


def test_get_pk_cb_family(ncdm_nl):
    c = ncdm_nl
    ks = np.array([0.05, 0.2])
    zs = np.array([0.0])
    k3 = np.broadcast_to(ks[:, None, None], (2, 1, 1)).copy()
    cb = c.get_pk_cb_lin(k3, zs, 2, 1, 1)
    m = c.get_pk_lin(k3, zs, 2, 1, 1)
    # cb spectrum sits above total-matter with massive neutrinos
    assert np.all(cb > m)
    for ik, kv in enumerate(ks):
        assert abs(cb[ik, 0, 0] / c.pk_cb_lin(kv, 0.0) - 1.0) < 1e-6
    # nonlinear 3D accessor routes through halofit
    nl = c.get_pk(k3, zs, 2, 1, 1)
    assert abs(nl[0, 0, 0] / c.pk(ks[0], 0.0) - 1.0) < 1e-6
    # array-general family
    pk_arr, pk_cb_arr = c.get_pk_array_general(ks, zs, 2, 1, False)
    assert abs(pk_arr[1] / c.pk_lin(ks[1], 0.0) - 1.0) < 1e-6
    assert abs(pk_cb_arr[1] / c.pk_cb_lin(ks[1], 0.0) - 1.0) < 1e-6
    cb_arr = c.get_pk_cb_array(ks, zs, 2, 1, False)
    np.testing.assert_allclose(cb_arr, pk_cb_arr, rtol=1e-12)


def test_sigma_cb_and_knl_cb(ncdm_nl):
    c = ncdm_nl
    s_cb = c.sigma_cb(8.0 / c.h(), 0.0)
    s_m = c.sigma(8.0 / c.h(), 0.0)
    assert 0.5 < s_m < 1.2
    assert s_cb > s_m  # cb fluctuations exceed total-matter with ncdm
    knl = c.nonlinear_scale(np.array([0.0, 1.0]), 2)
    knl_cb = c.nonlinear_scale_cb(np.array([0.0, 1.0]), 2)
    assert knl.shape == knl_cb.shape == (2,)
    assert np.all(knl > 0) and np.all(knl_cb > 0)


def test_raw_cl_no_copy_and_lensed_cl_computed():
    c = Class()
    c.set({"output": "tCl,pCl,lCl", "lensing": "yes", "l_max_scalars": 600})
    c.compute(["lensing"])
    raw = c.raw_cl_no_copy(500)
    assert raw["tt"].shape == (501,)
    full = c.lensed_cl_computed()
    some = c.lensed_cl(600)
    assert full["tt"].shape[0] >= some["tt"].shape[0]
    np.testing.assert_allclose(full["tt"][:601], some["tt"], rtol=1e-12)


def test_reset_and_properties(lcdm):
    c = Class()
    c.set({"output": "tCl", "l_max_scalars": 50})
    c.reset()
    assert c.state is True
    assert c.pars["output"] == "tCl"
    assert c.nonlinear_method == 0
    assert lcdm.get_input_precision() is lcdm.cosmo.pr
    assert lcdm.get_input_background() is lcdm.cosmo.params
