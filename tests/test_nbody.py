"""N-body gauge transfer functions (1811.00904).

The reference fork's own Nbody branch is unreachable (it force-enables the
k2gamma_Nb source whose assembly hits a class_stop, perturbations_module.cpp
:6926), so no golden can exist; validated instead by the defining property
of a gauge TRANSFORM: the N-body-gauge outputs must agree whether the
Boltzmann solve ran in synchronous or newtonian gauge.
"""

import numpy as np
import pytest

from classpp_public_tpu import Class

BASE = {
    "h": 0.67810, "omega_b": 0.02238280, "omega_cdm": 0.1201075,
    "A_s": 2.100549e-09, "n_s": 0.9660499, "tau_reio": 0.05430842,
    "output": "dTk,vTk", "P_k_max_1/Mpc": 0.5, "z_pk": "0.",
    "Nbody gauge transfer functions": "yes",
}


@pytest.fixture(scope="module")
def computed_sync():
    c = Class()
    c.set(dict(BASE))
    c.compute(["perturbations"])
    return c


def test_nbody_columns_present(computed_sync):
    tk = computed_sync.get_transfer(z=0.0)
    assert "H_T_Nb_prime" in tk and "t_tot" in tk
    for key in ("d_cdm", "d_b", "t_b", "t_tot", "H_T_Nb_prime"):
        assert np.isfinite(tk[key]).all(), key


def test_nbody_gauge_invariance(computed_sync):
    """d_i and t_i in N-body gauge agree between synchronous and newtonian
    source gauges (both are transformed INTO the same gauge)."""
    c2 = Class()
    c2.set(dict(BASE, gauge="newtonian"))
    c2.compute(["perturbations"])
    tk_s = computed_sync.get_transfer(z=0.0)
    tk_n = c2.get_transfer(z=0.0)
    k_s = tk_s["k (h/Mpc)"]
    k_n = tk_n["k (h/Mpc)"]
    sel = (k_s > 2e-4) & (k_s < 0.5)
    # Tolerances: at low k the N-body shift is O(1) of delta, so agreement
    # validates the transform itself; at high k the shift vanishes and the
    # comparison reduces to the underlying cross-gauge solver consistency,
    # which is ~4e-3 at k=0.5/Mpc (the reference's own gauge cross-check
    # bar is 5e-2 on P(k), test_class.py:100-107).
    for key, tol in [("d_cdm", 1e-2), ("d_b", 1e-2), ("d_tot", 1e-2),
                     ("t_b", 2e-2), ("t_tot", 2e-2)]:
        a = tk_s[key][sel]
        b = np.interp(k_s[sel], k_n, tk_n[key])
        den = np.maximum(np.abs(a), np.abs(a).max() * 1e-3)
        rel = np.abs(a - b) / den
        assert rel.max() < tol, (key, rel.max(), k_s[sel][rel.argmax()])


def test_nbody_shift_magnitude(computed_sync):
    """The N-body delta shift vanishes at high k (it scales as aH^2/k^2):
    d_cdm with and without the gauge transform converge at k >> aH.

    NOTE the delta shift from SYNCHRONOUS gauge is small at every k: the
    N-body time slicing is close to the CDM-comoving synchronous slicing,
    so theta_tot^{sync} (baryon+radiation weighted) is tiny — the shift is
    O(1) only when transforming from Newtonian gauge (covered by
    test_nbody_gauge_invariance).  The sharp synchronous-side signature is
    the VELOCITY shift: theta_cdm == 0 identically in synchronous gauge but
    theta_cdm^{Nb} = H_T_Nb' + k^2 alpha != 0."""
    c0 = Class()
    c0.set({k: v for k, v in BASE.items()
            if k != "Nbody gauge transfer functions"})
    c0.compute(["perturbations"])
    tk_nb = computed_sync.get_transfer(z=0.0)
    tk_sy = c0.get_transfer(z=0.0)
    k = tk_nb["k (h/Mpc)"]
    hi = k > 0.2
    rel_hi = np.abs(tk_nb["d_cdm"][hi] / tk_sy["d_cdm"][hi] - 1)
    assert rel_hi.max() < 1e-3
    # synchronous theta_cdm is identically zero; the N-body one is not
    assert np.abs(tk_sy["t_cdm"]).max() == 0.0
    assert np.abs(tk_nb["t_cdm"]).min() > 0.0
    # and it matches H_T' + k^2 alpha ~ the t_b shift: t_b^{Nb}-t_b^{sync}
    # equals t_cdm^{Nb} up to the (small) synchronous baryon velocity
    shift_b = tk_nb["t_b"] - tk_sy["t_b"]
    rel = np.abs(shift_b / tk_nb["t_cdm"] - 1)
    assert np.median(rel) < 1e-6
