"""Interacting dark matter <-> dark radiation (ETHOS) golden acceptance
(tests/golden/gen/g17_idm_dr.ini): N_idr=0.5, f_idm_dr=1, a_idm_dr=1e3,
nindex=4 — a strongly-coupled ETHOS-1-like model with dark acoustic
oscillations in P(k).

Reference: thermodynamics_module.cpp:191-216 (scattering rates + T_idm
march), perturbations_module.cpp:8252-8268 + :8572-8612. TPU-native
difference: the stiff idm<->idr momentum exchange is solved IMPLICITLY by
the IMEX evolver (a 2x2 closed-form block) instead of the reference's
first-order tca_idm_dr approximation, so a small part of the P(k)
difference at the DAO feature is the reference's own approximation error.
"""

import numpy as np
import pytest

from classpp_public_tpu import Class, CosmoSevereError
from tests.conftest import GOLDEN_DIR, Golden

PARAMS = {
    "h": 0.67810, "T_cmb": 2.7255, "omega_b": 0.02238280,
    "omega_cdm": 0.1201075, "N_ur": 3.046, "A_s": 2.100549e-09,
    "n_s": 0.9660499, "tau_reio": 0.05430842, "YHe": 0.2454006,
    "N_idr": 0.5, "f_idm_dr": 1.0, "a_idm_dr": 1.0e3,
    "nindex_idm_dr": 4, "m_idm": 1.0e9,
    "output": "tCl,pCl,lCl,mPk", "lensing": "yes",
    "l_max_scalars": 1200, "P_k_max_1/Mpc": 1.0, "z_pk": "0.",
}


@pytest.fixture(scope="module")
def g17():
    return Golden(GOLDEN_DIR / "g17_idm_dr.npz")


@pytest.fixture(scope="module")
def computed():
    c = Class()
    c.set(dict(PARAMS))
    c.compute(["lensing"])
    return c


def test_lensed_cl_vs_golden(computed, g17):
    cols = [str(x) for x in g17.cols("cl_lensed")]
    T = g17.table("cl_lensed")
    lr = T[:, 0]
    cl = computed.lensed_cl(1100)
    ell = cl["ell"][2:]
    fac = ell * (ell + 1) / (2 * np.pi)
    for name, col in [("tt", "TT"), ("ee", "EE")]:
        mine = fac * cl[name][2:]
        ref = np.interp(ell, lr, T[:, cols.index(col)])
        rel = np.abs(mine / ref - 1)
        assert rel.max() < 3e-3, (name, rel.max(), ell[rel.argmax()])


def test_pk_vs_golden(computed, g17):
    h = computed.h()
    T = g17.table("pk")
    ks = T[:, 0] * h
    sel = (ks > 1e-3) & (ks < 0.9)
    mine = np.array([computed.pk_lin(kk, 0.0) for kk in ks[sel][::5]])
    ref = T[sel, 1][::5] / h**3
    rel = np.abs(mine / ref - 1)
    # 1.4% at the DAO feature near k~0.03 (implicit scattering vs the
    # reference's first-order tca_idm_dr); everywhere else under 1e-2
    assert rel.max() < 2e-2, (rel.max(), ks[sel][::5][rel.argmax()])


def test_pk_suppression():
    # the interacting model must show dark acoustic damping relative to LCDM
    c0 = Class()
    base = {k: v for k, v in PARAMS.items()
            if k not in ("N_idr", "f_idm_dr", "a_idm_dr", "nindex_idm_dr", "m_idm")}
    c0.set(dict(base, output="mPk"))
    c0.compute(["nonlinear"])
    c1 = Class()
    c1.set(dict(PARAMS, output="mPk"))
    c1.compute(["nonlinear"])
    # measured: ~8.4% suppression at k=0.5/Mpc for this coupling
    assert c1.pk_lin(0.5, 0.0) < 0.95 * c0.pk_lin(0.5, 0.0)


def test_bad_inputs_raise():
    c = Class()
    with pytest.raises(CosmoSevereError):
        c.set(dict(PARAMS, idr_nature="nonsense"))
        c.compute(["background"])


def test_alpha_beta_lists_parse():
    """alpha_idm_dr/beta_idr per-l lists (+ *_dark aliases) reach the params
    pytree; shorter lists pad with the last entry (input_module.cpp:988-1031)."""
    from classpp_public_tpu.models.perturbations.indices import PtIdx

    c = Class()
    c.set(dict(PARAMS, **{"alpha_idm_dr": "1.5, 1.2, 1.0", "beta_dark": "0.5"}))
    p = c._build().params
    assert p.alpha_idm_dr == (1.5, 1.2, 1.0)
    assert p.beta_idr == (0.5,)
    idx = PtIdx(has_idm_dr=True, l_max_idr=6,
                alpha_idm_dr=p.alpha_idm_dr, beta_idr=p.beta_idr)
    al, be = idx.idr_damping_coeffs()
    assert al == (1.5, 1.2, 1.0, 1.0, 1.0) and be == (0.5,) * 5
    # default: the reference's all-1.5 fill (input_module.cpp:1007)
    al0, be0 = PtIdx(has_idm_dr=True, l_max_idr=6).idr_damping_coeffs()
    assert al0 == (1.5,) * 5 and be0 == (1.5,) * 5


def test_alpha_beta_stiff_consistency():
    """(I - gh J) stiff_solve(r) == r still holds with non-uniform per-l
    alpha/beta damping, and the damping actually differs per multipole."""
    import jax
    import jax.numpy as jnp
    from classpp_public_tpu import CosmoParams, PrecisionParams
    from classpp_public_tpu.models import background as bgm
    from classpp_public_tpu.models import thermodynamics as thm
    from classpp_public_tpu.models.perturbations import equations as eq
    from classpp_public_tpu.models.perturbations.indices import PtIdx

    params = CosmoParams(Omega_idm_dr=0.05, xi_idr=0.3, a_idm_dr=1.0e3)
    pr = PrecisionParams(background_Nloga=1024, recfast_Nz0=4000)
    bg, bidx = bgm.compute_background(params, pr)
    th = thm.compute_thermodynamics(params, pr, bg, bidx)
    alpha = tuple(1.5 - 0.05 * i for i in range(16))
    idx = PtIdx(pr.l_max_g, pr.l_max_pol_g, pr.l_max_ur, has_idm_dr=True,
                l_max_idr=pr.l_max_idr, alpha_idm_dr=alpha, beta_idr=(0.7,))
    ctx = eq.PertCtx(k=jnp.asarray(0.3), tca_on=jnp.asarray(False),
                     rsa_on=jnp.asarray(False), ufa_on=jnp.asarray(False),
                     bg_spline=bg.lntau_spline, th_spline=th.lntau_spline,
                     bidx=bidx, idx=idx)
    tau = jnp.asarray(30.0)
    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.normal(size=idx.size))
    for gh in (1e-4, 1.0, 1e4):
        x = eq.stiff_solve(tau, jnp.asarray(gh), r, ctx)
        resid = x - gh * eq.stiff_apply(tau, x, ctx) - r
        assert float(jnp.max(jnp.abs(resid))) < 1e-9 * max(1.0, gh)
    # per-l damping: the implicit Jacobian diagonal over the F_idr block
    # follows alpha_l (distinct entries => distinct damping rates)
    J = jax.jacfwd(lambda y: eq.stiff_apply(tau, y, ctx))(
        jnp.zeros((idx.size,)))
    dF = np.asarray(jnp.diagonal(J))[idx.F_idr: idx.F_idr + idx.n_F_idr]
    assert np.all(np.diff(dF) > 0), dF  # decreasing alpha => weaker damping


# --- per-l alpha/beta golden (tests/golden/gen/g34_idmdr_l.ini) -------------
# Same ETHOS model with non-default angular coefficients
# alpha_idm_dr = 1.0,1.2,1.4 (padded with 1.4) and beta_idr = 0.5,1.0
# (padded with 1.0) — end-to-end acceptance of the per-l damping against
# the reference build (the l>=2 idr collision terms, perturb :8593-8612).

@pytest.fixture(scope="module")
def g34():
    return Golden(GOLDEN_DIR / "g34_idmdr_l.npz")


@pytest.fixture(scope="module")
def computed_lists():
    c = Class()
    c.set(dict(PARAMS, **{"alpha_idm_dr": "1.0, 1.2, 1.4",
                          "beta_idr": "0.5, 1.0"}))
    c.compute(["lensing"])
    return c


def test_lists_lensed_cl_vs_golden(computed_lists, g34):
    cols = [str(x) for x in g34.cols("cl_lensed")]
    T = g34.table("cl_lensed")
    lr = T[:, 0]
    cl = computed_lists.lensed_cl(1100)
    ell = cl["ell"][2:]
    fac = ell * (ell + 1) / (2 * np.pi)
    for name, col in [("tt", "TT"), ("ee", "EE")]:
        mine = fac * cl[name][2:]
        ref = np.interp(ell, lr, T[:, cols.index(col)])
        rel = np.abs(mine / ref - 1)
        assert rel.max() < 3e-3, (name, rel.max(), ell[rel.argmax()])


def test_lists_pk_vs_golden(computed_lists, g34):
    h = computed_lists.h()
    T = g34.table("pk")
    ks = T[:, 0] * h
    sel = (ks > 1e-3) & (ks < 0.9)
    mine = np.array([computed_lists.pk_lin(kk, 0.0) for kk in ks[sel][::5]])
    ref = T[sel, 1][::5] / h**3
    rel = np.abs(mine / ref - 1)
    assert rel.max() < 2e-2, (rel.max(), ks[sel][::5][rel.argmax()])
