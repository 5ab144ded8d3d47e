"""Combinatorial input matrix, ported from the reference CI generator.

The reference (python/test_class.py:109-199) builds CLASS_INPUT from 'power'
fragments (every subset combination via itertools.product) and 'normal'
fragments (one at a time), runs Class on each combined dict, and asserts that
exactly the combinations flagged by has_incompatible_input (:388-454) raise
CosmoSevereError while all others compute.

Here the full generated matrix (84 combinations at TEST_LEVEL 1, the
default; 112+ at level 2) is checked against the *raising contract* via the
cheap parse/_build step, and a deterministic subset runs the full pipeline
with the reference's positive/negative output-function checks
(test_class.py:317-357: raw_cl sizes, pk availability, and the
CosmoSevereError negatives). TEST_LEVEL env var gates the deeper fragments
exactly like the reference.
"""

import itertools
import os

import numpy as np
import pytest

from classpp_public_tpu import Class, CosmoSevereError

TEST_LEVEL = int(os.getenv("TEST_LEVEL", "1"))

# --- the reference CLASS_INPUT generator (test_class.py:115-199) -----------

CLASS_INPUT = {}
CLASS_INPUT["Output_spectra"] = (
    [{"output": "mPk", "P_k_max_1/Mpc": 2},
     {"output": "tCl"},
     {"output": "tCl pCl lCl"},
     {"output": "mPk tCl lCl", "P_k_max_1/Mpc": 2},
     {"output": "nCl sCl"},
     {"output": "tCl pCl lCl nCl sCl"}],
    "power")
CLASS_INPUT["Nonlinear"] = ([{"non linear": "halofit"}], "power")
CLASS_INPUT["Lensing"] = ([{"lensing": "yes"}], "power")

if TEST_LEVEL > 0:
    CLASS_INPUT["Mnu"] = (
        [{"N_ur": 0.0, "N_ncdm": 1, "m_ncdm": 0.06, "deg_ncdm": 3.0},
         {"N_ur": 1.5, "N_ncdm": 1, "m_ncdm": 0.03, "deg_ncdm": 1.5}],
        "normal")
if TEST_LEVEL > 1:
    CLASS_INPUT["Curvature"] = (
        [{"Omega_k": 0.01}, {"Omega_k": -0.01}], "normal")
    CLASS_INPUT["modes"] = (
        [{"modes": "t"}, {"modes": "s, t"}], "power")
    CLASS_INPUT["Tensor_method"] = (
        [{"tensor method": "exact"}, {"tensor method": "photons"}], "power")
if TEST_LEVEL > 2:
    CLASS_INPUT["Isocurvature_modes"] = (
        [{"ic": "ad,nid,cdi", "c_ad_cdi": -0.5}], "normal")
    CLASS_INPUT["Scalar_field"] = (
        [{"Omega_scf": 0.1, "attractor_ic_scf": "yes",
          "scf_parameters": "10, 0, 0, 0"}], "normal")

INPUTPOWER = []
INPUTNORMAL = [{}]
for key, (models, state) in CLASS_INPUT.items():
    if state == "power":
        INPUTPOWER.append([{}] + models)
    else:
        INPUTNORMAL.extend(models)

DICTARRAY = []
for normelem in INPUTNORMAL:
    for powelem in itertools.product(*INPUTPOWER):
        temp = dict(normelem)
        for elem in powelem:
            temp.update(elem)
        DICTARRAY.append(temp)


def has_tensor(d):
    return "modes" in d and d["modes"].find("t") != -1


def has_incompatible_input(scenario):
    """Literal port of the reference contract (test_class.py:388-454)."""
    should_fail = False
    if has_tensor(scenario):
        if "output" not in scenario:
            should_fail = True
        else:
            output = scenario["output"].split()
            if "tCl" not in output and "pCl" not in output:
                should_fail = True
    if "lensing" in scenario:
        if "output" not in scenario:
            should_fail = True
        else:
            output = scenario["output"].split()
            if "lCl" not in output:
                should_fail = True
            elif "tCl" not in output and "pCl" not in output:
                should_fail = True
    if "tensor method" in scenario and not has_tensor(scenario):
        should_fail = True
    if "non linear" in scenario and "output" not in scenario:
        should_fail = True
    if "output" in scenario and "lCl" in scenario["output"].split():
        if "modes" in scenario and scenario["modes"].find("s") == -1:
            should_fail = True
    if "ic" in scenario:
        if "modes" in scenario and scenario["modes"].find("s") == -1:
            should_fail = True
        if "output" not in scenario:
            should_fail = True
    if "P_k_ini type" in scenario \
            and scenario["P_k_ini type"].find("inflation") != -1:
        if "modes" not in scenario:
            should_fail = True
        else:
            if scenario["modes"].find("s") == -1:
                should_fail = True
            if scenario["modes"].find("v") != -1:
                should_fail = True
            if scenario["modes"].find("t") == -1:
                should_fail = True
        if "ic" in scenario and scenario["ic"].find("i") != -1:
            should_fail = True
    return should_fail


N_FAIL = sum(has_incompatible_input(s) for s in DICTARRAY)


def test_matrix_size():
    """The generator must produce the reference's combination count: at
    TEST_LEVEL 1, 3 normal x (7 x 2 x 2) power = 84 cases, of which the
    incompatibility contract flags a nonempty subset."""
    expect = {0: 28, 1: 84}.get(TEST_LEVEL)
    if expect is not None:
        assert len(DICTARRAY) == expect
    assert len(DICTARRAY) >= 50
    assert N_FAIL >= 10


def _ids():
    out = []
    for i, s in enumerate(DICTARRAY):
        tag = "_".join(f"{k}={v}" for k, v in s.items())
        tag = tag.replace("/", "%").replace(",", "").replace(" ", "")
        out.append(f"{i:03d}_{tag[:60]}" if tag else f"{i:03d}_default")
    return out


@pytest.mark.parametrize("scenario", DICTARRAY, ids=_ids())
def test_matrix_raise_contract(scenario):
    """Every generated combination must satisfy the reference contract at
    the input-parsing level: incompatible inputs raise CosmoSevereError,
    compatible ones build a pipeline object without error. (Full numerical
    computes for a representative subset are in test_matrix_compute below;
    the parse step is where the reference's own failures fire, via
    input_module consistency checks.)"""
    c = Class()
    c.set(dict(scenario))
    if has_incompatible_input(scenario):
        with pytest.raises(CosmoSevereError):
            c._build()
            # some contracts (unread parameters) only fire at compute level
            c.compute(["perturbations"])
    else:
        c._build()


# --- full-compute subset (reference positive/negative output checks) -------

FAST = {"h": 0.6781, "omega_b": 0.02238, "omega_cdm": 0.1201,
        "A_s": 2.1e-9, "n_s": 0.966, "tau_reio": 0.0543,
        "l_max_scalars": 200, "l_max_tensors": 150}

CL_DICT = {"tCl": ["tt"], "lCl": ["pp"], "pCl": ["ee", "bb"],
           "nCl": ["dd"], "sCl": ["ll"]}

# deterministic spread over the valid matrix: indices chosen to cover
# none/mPk-only/tCl-only/full-Cl outputs, halofit on/off, lensing on/off
COMPUTE_SUBSET = [
    {"output": "tCl"},
    {"output": "mPk", "P_k_max_1/Mpc": 2},
    {"output": "tCl pCl lCl", "lensing": "yes"},
    {"output": "mPk tCl lCl", "P_k_max_1/Mpc": 2, "non linear": "halofit"},
    {"output": "tCl pCl lCl nCl sCl", "lensing": "yes"},
    {"output": "tCl", "non linear": "halofit"},
]


@pytest.mark.parametrize("scenario", COMPUTE_SUBSET,
                         ids=["tCl", "mPk", "lensedCl", "halofit_mPk",
                              "allCl", "tCl_halofit"])
def test_matrix_compute(scenario):
    assert not has_incompatible_input(scenario)
    assert any(scenario == d for d in DICTARRAY), \
        "subset entry must come from the generated matrix"
    c = Class()
    c.set(dict(FAST, **scenario))
    c.compute()
    output = scenario.get("output", "")
    # positive checks (reference test_class.py:317-345)
    for elem in output.split():
        if elem in ("tCl", "lCl", "pCl"):
            cl = c.raw_cl(100)
            assert cl is not None
            for ct in CL_DICT[elem]:
                assert np.shape(cl[ct])[0] == 101
                assert np.isfinite(cl[ct][2:]).all()
        elif elem in ("nCl", "sCl"):
            nc = c.density_cl(100)
            assert np.isfinite(nc[CL_DICT[elem][0]]).all()
    if "mPk" in output.split():
        pk = c.pk(0.1, 0)
        assert pk is not None and np.isfinite(pk)
    # negative checks (:346-357)
    if not any(e in CL_DICT for e in output.split()):
        with pytest.raises(CosmoSevereError):
            c.raw_cl(100)
    if "mPk" not in output.split():
        with pytest.raises(CosmoSevereError):
            c.pk(0.1, 0)
