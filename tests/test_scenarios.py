"""Scenario smoke matrix, modeled on the reference combinatorial CI
(python/test_class.py CLASS_INPUT product): each scenario must compute and
return finite spectra of the right shape. Reduced l_max / k_max keep runtime
bounded; accuracy is covered by the golden-data suites.
"""

import numpy as np
import pytest

from classpp_public_tpu import Class, CosmoSevereError

BASE = {
    "h": 0.6781, "omega_b": 0.02238, "omega_cdm": 0.1201,
    "A_s": 2.1e-9, "n_s": 0.966, "tau_reio": 0.0543,
    "l_max_scalars": 200, "P_k_max_1/Mpc": 0.3,
}

SCENARIOS = [
    {"output": "tCl", "lensing": "no"},
    {"output": "tCl,pCl,lCl", "lensing": "yes"},
    {"output": "mPk", "non linear": "halofit", "z_pk": "0., 1."},
    {"output": "tCl", "lensing": "no", "modes": "s,t", "r": 0.1, "l_max_tensors": 150},
    {"output": "tCl", "lensing": "no", "ic": "ad,cdi"},
    {"output": "tCl,mPk", "lensing": "no", "Omega_Lambda": 0.0,
     "w0_fld": -0.9, "wa_fld": 0.05},
    {"output": "tCl,mPk", "lensing": "no", "gauge": "newtonian"},
    {"output": "nCl", "selection_mean": "0.5"},
]


@pytest.mark.parametrize("extra", SCENARIOS,
                         ids=["tCl", "lensed", "halofit", "tensors", "iso_cdi",
                              "fld", "newtonian", "nCl"])
def test_scenario(extra):
    c = Class()
    pars = dict(BASE)
    pars.update(extra)
    c.set(pars)
    if pars["output"] == "nCl":
        c.compute(["spectra"])
        nc = c.density_cl(200)
        assert np.isfinite(nc["dd"]).all() and (nc["dd"][0, 2:] > 0).all()
        return
    want_cls = "Cl" in pars["output"]
    c.compute(["lensing"] if want_cls else ["nonlinear"])
    if want_cls:
        lmax = pars["l_max_scalars"]
        cl = c.lensed_cl(lmax) if pars.get("lensing") == "yes" else c.raw_cl(lmax)
        assert cl["tt"].shape == (lmax + 1,)
        assert np.isfinite(cl["tt"][2:]).all()
        assert (cl["tt"][2:] > 0).all()
        if pars.get("modes") == "s,t":
            assert (cl["bb"][2:150] > 0).all()  # primordial B modes present
    if "mPk" in pars["output"]:
        pk = c.pk_lin(0.1, 0.0)
        assert np.isfinite(pk) and pk > 0
        if pars.get("non linear") == "halofit":
            assert np.isfinite(c.pk(0.1, 0.0))


def test_incompatible_inputs_raise():
    for bad in [
        {"output": "tCl", "modes": "s,v"},          # vector modes: not yet
        {"output": "tCl", "ic": "ad,xyz"},          # unknown ic
        {"output": "tCl", "varying_alpha": "yes"},  # varying constants: not yet
        {"output": "tCl", "not_a_class_parameter": 1.0},
    ]:
        c = Class()
        pars = dict(BASE)
        pars.update(bad)
        c.set(pars)
        with pytest.raises(CosmoSevereError):
            c.compute(["spectra"])
