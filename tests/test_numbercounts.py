"""Number counts / galaxy lensing golden acceptance (tests/golden/gen/
g7_ncl.ini): output = nCl,sCl, two Gaussian bins (z = 0.5, 1.0, sigma = 0.1),
l <= 300, non_diagonal = 1.
"""

import numpy as np
import pytest

from classpp_public_tpu import Class
from tests.conftest import GOLDEN_DIR, Golden

PARAMS = {
    "h": 0.67810, "omega_b": 0.02238280, "omega_cdm": 0.1201075,
    "N_ur": 3.046, "A_s": 2.100549e-09, "n_s": 0.9660499,
    "tau_reio": 0.05430842,
    "output": "nCl,sCl", "selection": "gaussian",
    "selection_mean": "0.5, 1.0", "selection_width": "0.1",
    "l_max_lss": 300, "non_diagonal": 1,
}


@pytest.fixture(scope="module")
def g7():
    return Golden(GOLDEN_DIR / "g7_ncl.npz")


@pytest.fixture(scope="module")
def computed():
    c = Class()
    c.set(dict(PARAMS))
    c.compute(["spectra"])
    return c


def _compare(computed, g7, key, col_sub, tol):
    cols = [str(c) for c in g7.cols("cl")]
    T = g7.table("cl")
    lr = T[:, 0].astype(int)
    icol = [i for i, c in enumerate(cols) if col_sub in c]
    assert len(icol) == 1, (col_sub, cols)
    cl = computed.raw_cl(300)
    ell = lr[(lr >= 2) & (lr <= 300)]
    fac = ell * (ell + 1) / (2 * np.pi)
    mine = cl[key][ell] * fac
    ref = T[(lr >= 2) & (lr <= 300), icol[0]]
    rel = np.abs(mine / ref - 1)
    assert rel.max() < tol, (key, rel.max(), ell[rel.argmax()])


@pytest.mark.parametrize("key", [
    "dens[1]-dens[1]", "dens[1]-dens[2]", "dens[2]-dens[2]"])
def test_density_cl(computed, g7, key):
    # cross-bin dd is tiny (window overlap ~ exp(-12)); looser tolerance
    tol = 3e-2 if key == "dens[1]-dens[2]" else 1e-2
    _compare(computed, g7, key, key.replace("dens[", "dens[").replace("]-", "]-"), tol)


@pytest.mark.parametrize("key", [
    "lens[1]-lens[1]", "lens[1]-lens[2]", "lens[2]-lens[2]"])
def test_lensing_cl(computed, g7, key):
    _compare(computed, g7, key, key, 1e-2)


@pytest.mark.parametrize("key", [
    "dens[1]-lens[1]", "dens[1]-lens[2]", "dens[2]-lens[1]", "dens[2]-lens[2]"])
def test_density_lensing_cross(computed, g7, key):
    _compare(computed, g7, key, key, 2e-2)
