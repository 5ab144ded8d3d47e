"""Accelerator-path accuracy contract: the float32 perturbation solver.

On any accelerator, solve.py switches the perturbation working state to
float32 and floors rtol at tol_perturb_f32_floor (perturb_dtype="auto").
The golden contract (C_l rtol 3e-3 / P(k) 1e-2, reference CI
python/test_class.py:102-105) must hold on exactly that configuration —
this test forces perturb_dtype="float32" so the same code path runs on CPU,
where the reference-built g1 golden is available.
"""

import numpy as np
import pytest

from classpp_public_tpu import Class


@pytest.fixture(scope="module")
def computed_f32():
    cosmo = Class()
    cosmo.set({
        "h": 0.67810, "T_cmb": 2.7255, "omega_b": 0.02238280,
        "omega_cdm": 0.1201075, "N_ur": 3.046, "A_s": 2.100549e-09,
        "n_s": 0.9660499, "tau_reio": 0.05430842,
        "output": "tCl,pCl,lCl,mPk", "lensing": "yes",
        "l_max_scalars": 2500, "P_k_max_1/Mpc": 10.0, "z_pk": "0.",
        "perturb_dtype": "float32",
    })
    cosmo.compute(["lensing"])
    return cosmo


def test_f32_lensed_cl_vs_golden(computed_f32, g1):
    cols = [str(c) for c in g1.cols("cl_lensed")]
    T = g1.table("cl_lensed")
    lr = T[:, 0]
    cl = computed_f32.lensed_cl(2500)
    ell = cl["ell"][2:]
    fac = ell * (ell + 1) / (2 * np.pi)
    for name, col in [("tt", "TT"), ("ee", "EE"), ("bb", "BB")]:
        mine = fac * cl[name][2:]
        ref = np.interp(ell, lr, T[:, cols.index(col)])
        rel = np.abs(mine / ref - 1)
        assert rel.max() < 3e-3, (name, rel.max(), ell[rel.argmax()])
    # TE crosses zero: compare against sqrt(TT*EE)
    mine = fac * cl["te"][2:]
    ref = np.interp(ell, lr, T[:, cols.index("TE")])
    den = np.sqrt(np.interp(ell, lr, T[:, cols.index("TT")])
                  * np.interp(ell, lr, T[:, cols.index("EE")]))
    assert np.max(np.abs(mine - ref) / den) < 3e-3


def test_f32_raw_pp_vs_golden(computed_f32, g1):
    cols = [str(c) for c in g1.cols("cl")]
    T = g1.table("cl")
    lr = T[:, 0]
    cl = computed_f32.raw_cl(2500)
    ell = cl["ell"][2:]
    fac = ell * (ell + 1) / (2 * np.pi)
    mine = fac * cl["pp"][2:]
    ref = np.interp(ell, lr, T[:, cols.index("phiphi")])
    rel = np.abs(mine / ref - 1)
    assert rel.max() < 1e-2, (rel.max(), ell[rel.argmax()])


def test_f32_pk_lin_vs_golden(computed_f32, g1):
    T = g1.table("z1_pk")
    k_h, pk_h = T[:, 0], T[:, 1]
    h = computed_f32.h()
    ks = k_h * h
    sel = (ks > 2e-4) & (ks < 9.0)
    mine = np.array([computed_f32.pk_lin(k, 0.0) for k in ks[sel][::7]])
    ref = pk_h[sel][::7] / h**3
    rel = np.abs(mine / ref - 1)
    assert rel.max() < 1e-2, rel.max()
