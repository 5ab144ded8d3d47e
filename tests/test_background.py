"""Background module vs reference golden tables (g1_background.dat columns)."""

import numpy as np
import pytest

from classpp_public_tpu import CosmoParams, PrecisionParams
from classpp_public_tpu.models import background as bgm


@pytest.fixture(scope="module")
def bg(g1_params):
    res, idx = bgm.compute_background(g1_params, PrecisionParams())
    return res, idx


def _ref_interp(g1, colname, z_ref, loga_query):
    """Interpolate a golden column (given on the reference z grid) onto loga."""
    loga_ref = -np.log1p(z_ref)
    order = np.argsort(loga_ref)
    y = g1.col("background", colname)
    return np.interp(loga_query, loga_ref[order], y[order])


def test_conformal_age(bg, g1):
    res, _ = bg
    # reference printed conformal age = 14151.863944 Mpc for this config
    assert abs(float(res.tau0) - 14151.863944) / 14151.863944 < 1e-5


def test_age(bg):
    res, _ = bg
    assert abs(float(res.age) - 13.770593) / 13.770593 < 1e-5


def test_z_eq(bg):
    res, _ = bg
    assert abs(float(res.z_eq) - 3404.836463) / 3404.836463 < 1e-4


def test_H_and_densities_vs_golden(bg, g1):
    res, idx = bg
    z_ref = g1.col("background", "z")
    # compare on a set of redshifts covering RD->MD->Lambda
    for zq in [0.0, 0.5, 3.0, 50.0, 1000.0, 1.0e4, 1.0e6]:
        lq = -np.log1p(zq)
        i = np.argmin(np.abs(res.loga - lq))
        row = np.asarray(res.table[i])
        a = row[idx["a"]]
        z_here = 1.0 / a - 1.0
        for name, col in [("H", "H [1/Mpc]"), ("rho_g", "rho_g"), ("rho_b", "rho_b"),
                          ("rho_cdm", "rho_cdm"), ("rho_ur", "rho_ur"),
                          ("rho_lambda", "rho_lambda")]:
            ref = _ref_interp(g1, col, z_ref, np.log(a))
            got = row[idx[name]]
            assert abs(got - ref) / abs(ref) < 2e-4, (name, zq, got, ref)


def test_tau_and_distances_vs_golden(bg, g1):
    res, idx = bg
    z_ref = g1.col("background", "z")
    tau_ref = g1.col("background", "conf. time [Mpc]")
    loga_ref = -np.log1p(z_ref)
    order = np.argsort(loga_ref)
    tau_interp = np.interp(np.asarray(res.loga), loga_ref[order], tau_ref[order])
    mask = np.asarray(res.loga) > -20  # avoid interpolation noise at extreme z
    rel = np.abs(np.asarray(res.tau_of_loga) - tau_interp)[mask] / tau_interp[mask]
    assert np.max(rel) < 5e-4


def test_sound_horizon_at_z0(bg, g1):
    res, idx = bg
    rs_ref = g1.col("background", "comov.snd.hrz.")[-1]
    got = float(res.table[-1, idx["rs"]])
    assert abs(got - rs_ref) / rs_ref < 1e-4


def test_growth_factor(bg, g1):
    res, idx = bg
    z_ref = g1.col("background", "z")
    D_ref = g1.col("background", "gr.fac. D")
    f_ref = g1.col("background", "gr.fac. f")
    loga_ref = -np.log1p(z_ref)
    order = np.argsort(loga_ref)
    for zq in [0.0, 0.5, 2.0, 10.0]:
        lq = -np.log1p(zq)
        i = int(np.argmin(np.abs(np.asarray(res.loga) - lq)))
        a = float(res.table[i, idx["a"]])
        Dr = np.interp(np.log(a), loga_ref[order], D_ref[order])
        fr = np.interp(np.log(a), loga_ref[order], f_ref[order])
        assert abs(float(res.table[i, idx["D"]]) - Dr) / Dr < 2e-3
        assert abs(float(res.table[i, idx["f"]]) - fr) / fr < 2e-3


def test_runtime_spline_roundtrip(bg):
    res, idx = bg
    import jax.numpy as jnp
    taus = jnp.array([1.0, 10.0, 280.0, 5000.0, 14000.0])
    vals = res.at_tau(taus)
    # interpolated a must invert to tau via the loga->tau table
    a_q = vals[:, idx["a"]]
    tau_back = np.interp(np.log(np.asarray(a_q)), np.asarray(res.loga), np.asarray(res.tau_of_loga))
    assert np.allclose(tau_back, np.asarray(taus), rtol=1e-5)
