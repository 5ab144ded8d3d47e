"""Integrator unit tests: tableau order conditions and stiff behavior of the
IMEX evolvers (ops/ode.py), the ndf15-equivalents (tools/evolver_ndf15.cpp:62).
"""

import numpy as np
import jax
import jax.numpy as jnp


def _check_tables(C, AE, AI, B, BH, order):
    c = np.asarray(C)
    s = len(c)

    def full(A):
        M = np.zeros((s, s))
        for i, row in enumerate(A):
            M[i, :len(row)] = row
        return M

    ae, ai = full(AE), full(AI)
    ai = ai + np.diag([0.0] + [AI[-1][-1] if len(AI[-1]) == s else 0.0] * 0)
    b = np.asarray(B)
    bh = np.asarray(BH)
    tol = 1e-12
    for nm, A, g in (("AE", ae, 0.0), ("AI", ai, None)):
        gam = B[-1] if nm == "AI" else 0.0
        # ESDIRK: diagonal gamma for stages 1..s-1 (stage 0 explicit)
        diag = np.zeros(s)
        if nm == "AI":
            diag[1:] = gam if order == 3 else 0.25
        M = A + np.diag(diag)
        assert np.max(np.abs(M.sum(1) - c)) < tol, nm
        if nm == "AI":
            ai = M
    assert abs(b.sum() - 1) < tol
    assert abs(b @ c - 0.5) < tol
    assert abs(b @ c**2 - 1 / 3) < tol
    for A in (ae, ai):
        assert abs(b @ A @ c - 1 / 6) < tol
    if order >= 4:
        assert abs(b @ c**3 - 0.25) < tol
        for A in (ae, ai):
            assert abs((b * c) @ A @ c - 1 / 8) < tol
            assert abs(b @ A @ c**2 - 1 / 12) < tol
        for A1 in (ae, ai):
            for A2 in (ae, ai):
                assert abs(b @ A1 @ A2 @ c - 1 / 24) < tol
    # embedded order >= 2 (+3 for the 4(3) pair)
    assert abs(bh.sum() - 1) < tol
    assert abs(bh @ c - 0.5) < tol
    if order >= 4:
        assert abs(bh @ c**2 - 1 / 3) < tol
        for A in (ae, ai):
            assert abs(bh @ A @ c - 1 / 6) < tol
    # L-stability of the implicit table: R(-inf) -> 0
    for z in (-1e6, -1e9):
        R = 1 + z * b @ np.linalg.solve(np.eye(s) - z * ai, np.ones(s))
        assert abs(R) < 1e-4


def test_ark32_tableau():
    from classpp_public_tpu.ops import ode

    _check_tables(ode._ARK_C, ode._ARK_AE, ode._ARK_AI, ode._ARK_B,
                  ode._ARK_BH, order=3)


def test_ark43_tableau():
    from classpp_public_tpu.ops import ode

    _check_tables(ode._ARK4_C, ode._ARK4_AE, ode._ARK4_AI, ode._ARK4_B,
                  ode._ARK4_BH, order=4)


def test_ark43_stiff_convergence():
    """Stiff relaxation with the WHOLE coupling implicit (as in the physics
    split, where every kappa'-term is linear in y and lives in J):
    y1' = -lam (y1 - y2), y2' = -y2. The fast component is slaved; an
    L-stable IMEX scheme must integrate accurately at lam*h >> 1."""
    from classpp_public_tpu.ops.ode import ark43_step

    LAM = 1e5

    def rhs(t, y, a):
        return jnp.stack([-LAM * (y[0] - y[1]), -y[1]])

    def sap(t, y, a):
        return jnp.stack([-LAM * (y[0] - y[1]), 0.0 * y[1]])

    def ssol(t, gh, r, a):
        # (I - gh J) x = r with J = [[-lam, lam], [0, 0]]
        x1 = r[1]
        x0 = (r[0] + gh * LAM * x1) / (1.0 + gh * LAM)
        return jnp.stack([x0, x1])

    def exact(t):
        y2 = np.exp(-t)
        c = 1.0 - LAM / (LAM - 1.0)
        y1 = c * np.exp(-LAM * t) + LAM / (LAM - 1.0) * np.exp(-t)
        return np.array([y1, y2])

    errs = []
    for n in (8, 16):
        h = 1.0 / n
        y, t = jnp.asarray([1.0, 1.0]), 0.0
        for _ in range(n):
            y, err, _ = ark43_step(rhs, sap, ssol, t, y, h, None)
            t += h
        errs.append(float(np.max(np.abs(np.asarray(y) - exact(1.0)))))
    # stable and accurate at lam*h = 1e4
    assert errs[0] < 1e-6, errs
    assert errs[0] / max(errs[1], 1e-17) > 3.5, errs


def test_ark43_nonstiff_order():
    """Nonstiff limit (stiff part zero): classic order-4 convergence."""
    from classpp_public_tpu.ops.ode import ark43_step

    def rhs(t, y, a):
        return jnp.cos(t) * y

    def sap(t, y, a):
        return 0.0 * y

    def ssol(t, gh, r, a):
        return r

    errs = []
    for n in (8, 16):
        h = 1.0 / n
        y, t = jnp.asarray(1.0), 0.0
        for _ in range(n):
            y, err, _ = ark43_step(rhs, sap, ssol, t, y, h, None)
            t += h
        errs.append(float(abs(y - np.exp(np.sin(1.0)))))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 3.7, (errs, rate)


def test_stiff_solve_consistency():
    """(I - gh J) stiff_solve(r) == r for the scalar-perturbation split."""
    from classpp_public_tpu import CosmoParams, PrecisionParams
    from classpp_public_tpu.models import background as bgm
    from classpp_public_tpu.models import thermodynamics as thm
    from classpp_public_tpu.models.perturbations import equations as eq
    from classpp_public_tpu.models.perturbations.indices import PtIdx

    params = CosmoParams()
    pr = PrecisionParams(background_Nloga=1024, recfast_Nz0=4000)
    bg, bidx = bgm.compute_background(params, pr)
    th = thm.compute_thermodynamics(params, pr, bg, bidx)
    idx = PtIdx(pr.l_max_g, pr.l_max_pol_g, pr.l_max_ur)
    ctx = eq.PertCtx(k=jnp.asarray(0.3), tca_on=jnp.asarray(False),
                     rsa_on=jnp.asarray(False), ufa_on=jnp.asarray(False),
                     bg_spline=bg.lntau_spline, th_spline=th.lntau_spline,
                     bidx=bidx, idx=idx)
    tau = jnp.asarray(30.0)
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.normal(size=idx.size))
    for gh in (1e-6, 1e-2, 1e4):
        x = eq.stiff_solve(tau, jnp.asarray(gh), r, ctx)
        resid = x - gh * eq.stiff_apply(tau, x, ctx) - r
        assert float(jnp.max(jnp.abs(resid))) < 1e-10 * max(1.0, gh)

    # stiff_apply must be exactly the kappa'-terms of the rhs: the residual
    # Jacobian (rhs - stiff) may contain k-advection but nothing at the
    # Thomson-rate scale
    y0 = jnp.asarray(rng.normal(size=idx.size))
    J = jax.jacfwd(lambda y: eq.rhs(tau, y, ctx))(y0)
    Js = jax.jacfwd(lambda y: eq.stiff_apply(tau, y, ctx))(y0)
    from classpp_public_tpu.models.thermodynamics import ThIdx
    kap = float(th.lntau_spline.eval(jnp.log(tau))[ThIdx.ix["dkappa"]])
    k = 0.3
    resid = np.abs(np.asarray(J - Js))
    assert kap > 50.0  # the point in time actually is stiff
    assert resid.max() < 0.05 * kap  # advection/metric scale, not Thomson
