"""CAMB output format + per-k perturbation output files.

Golden: tests/golden/gen/g12_camb.ini (reference run with format=camb).
Checks the CLI writes cl/cl_lensed/tk tables in CAMB units/order
(output_module.cpp:1227-1395, perturbations_module.cpp:289-299 camb branch)
and perturbations_k*_s.dat files for k_output_values
(perturbations_module.cpp:2797).
"""

import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import GOLDEN_DIR, Golden

INI = """\
h = 0.67810
T_cmb = 2.7255
omega_b = 0.02238280
omega_cdm = 0.1201075
N_ur = 3.046
A_s = 2.100549e-09
n_s = 0.9660499
tau_reio = 0.05430842
output = tCl,pCl,lCl,dTk
lensing = yes
l_max_scalars = 1200
P_k_max_1/Mpc = 1.
z_pk = 0
format = camb
k_output_values = 0.05, 0.5
root = {root}
"""


@pytest.fixture(scope="module")
def g12():
    return Golden(GOLDEN_DIR / "g12_camb.npz")


@pytest.fixture(scope="module")
def cli_run(tmp_path_factory):
    d = tmp_path_factory.mktemp("cambout")
    ini = d / "run.ini"
    ini.write_text(INI.format(root=str(d / "out_")))
    subprocess.run([sys.executable, "-m", "classpp_public_tpu", str(ini)],
                   check=True, capture_output=True, timeout=3000)
    return d


def _load(path):
    import re

    cols = None
    for ln in path.read_text().splitlines():
        if ln.startswith("#") and ":" in ln:
            m = re.findall(r"\d+:([^\s].*?)(?=\s{2,}|\s*$)", ln)
            if m:
                cols = [c.strip() for c in m]
    return cols, np.loadtxt(path)


def test_camb_cl_lensed(cli_run, g12):
    cols, T = _load(cli_run / "out_cl_lensed.dat")
    gcols = [str(c) for c in g12.cols("cl_lensed")]
    G = g12.table("cl_lensed")
    ell = T[:, 0]
    m = (ell >= 2) & (ell <= 1100)
    for name in ["TT", "EE", "dd"]:
        mine = T[m, cols.index(name)]
        ref = np.interp(ell[m], G[:, 0], G[:, gcols.index(name)])
        rel = np.abs(mine / ref - 1)
        tol = 1e-2 if name == "dd" else 3e-3
        assert rel.max() < tol, (name, rel.max())
    # TE crosses zero: normalize by sqrt(TT*EE) instead of a ratio
    mine = T[m, cols.index("TE")]
    ref = np.interp(ell[m], G[:, 0], G[:, gcols.index("TE")])
    den = np.sqrt(np.interp(ell[m], G[:, 0], G[:, gcols.index("TT")])
                  * np.interp(ell[m], G[:, 0], G[:, gcols.index("EE")]))
    assert np.max(np.abs(mine - ref) / den) < 3e-3


def test_camb_tk(cli_run, g12):
    cols, T = _load(cli_run / "out_z1_tk.dat")
    gcols = [str(c) for c in g12.cols("tk")]
    G = g12.table("tk")
    kq = T[:, 0]
    sel = (kq > 2e-4) & (kq < 1.0)
    for name in ["-T_cdm/k2", "-T_b/k2", "-T_tot/k2"]:
        ref = np.interp(np.log(kq[sel]), np.log(G[:, 0]), G[:, gcols.index(name)])
        mine = T[sel, cols.index(name)]
        rel = np.abs(mine / ref - 1)
        assert rel.max() < 1e-2, (name, rel.max(), kq[sel][rel.argmax()])


def test_perturbations_files(cli_run):
    f0 = cli_run / "out_perturbations_k0_s.dat"
    f1 = cli_run / "out_perturbations_k1_s.dat"
    assert f0.exists() and f1.exists()
    cols, T = _load(f0)
    assert "delta_cdm" in cols and "phi" in cols
    assert T.shape[0] > 100
    # delta_cdm grows monotonically (in magnitude) at late times
    dc = np.abs(T[:, cols.index("delta_cdm")])
    assert dc[-1] > dc[len(dc) // 2]
