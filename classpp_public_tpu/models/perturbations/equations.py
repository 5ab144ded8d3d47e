"""Scalar perturbation equations: RHS, initial conditions, approximation
remaps and CMB/LSS source assembly.

Physics follows the reference exactly (synchronous gauge, flat, LambdaCDM+ur):
  - Einstein constraints: perturb_einstein (perturbations_module.cpp:5840)
  - stress-energy sums:   perturb_total_stress_energy (:6047)
  - Boltzmann hierarchies and fluid equations: perturb_derivs (:7861)
  - tight coupling, compromise_CLASS scheme: perturb_tca_slip_and_shear (:9229)
  - radiation streaming (rsa_MD_with_reio):  perturb_rsa_delta_and_theta (:9530)
  - ur fluid approximation (ufa_CLASS):      derivs (:8710)
  - adiabatic ICs: perturb_initial_conditions (:4723)
  - approximation-switch state remaps: perturb_vector_init (:3880-3975)
  - sources: perturb_sources (:6731)

The TPU-native difference: no dynamic state resizing and no branching — a
single maximal state vector with approximation *masks* (jnp.where), so one
trace covers every (k, regime) and vmap runs the whole k-grid in lockstep.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..background import BgIdx
from ..thermodynamics import ThIdx
from .indices import PtIdx, SrcIdx


class NcdmCtx(NamedTuple):
    """Static-shape ncdm phase-space data (shared momentum grid, per-species
    mass factors). Replaces the reference's per-species adaptive q-grids
    (tools/non_cold_dark_matter.cpp) with one fixed Gauss-Laguerre grid.

    Conventions: eps(q, a) = sqrt(q^2 + (a m/T0)^2) with q in units of T_ncdm0;
    rho_s = pref_s / a^4 * sum_q w_q q^2 eps; pref absorbs deg, T_ratio^4 and
    the FD normalization so the massless limit reproduces (7/8)(T/Tg)^4 rho_g.
    """

    q: jnp.ndarray        # (nq,) shared momentum nodes
    w: jnp.ndarray        # (ns, nq) per-species weights including f~0(q)
    dlnf0: jnp.ndarray    # (ns, nq) per-species dln f0 / dln q
    x_fac: jnp.ndarray    # (ns,) m/T_ncdm0 (dimensionless)
    pref: jnp.ndarray     # (ns,) normalization (class units Mpc^-2)
    # decaying ncdm -> dr (the LAST idx.n_dncdm species): decay rates and
    # the background-table column of rho_dr_ncdm0 (each decay species owns
    # a contiguous [rho_dr, lnfdec x nq, dsep x nq] column block)
    gamma: jnp.ndarray = None     # (ns,) decay rate [1/Mpc], 0 = stable
    ker_x: jnp.ndarray = None     # (npts,) kernel table abscissae
    ker_G: jnp.ndarray = None     # (npts, l_max_dr+1) F_l(x)/x^l table


def _ncdm_eff_weights(bgv, ctx):
    """(w_eff, dlnf0_eff): per-species quadrature weights and dln f0/dln q
    with the decaying species' time-dependent factors pulled from the
    background table (the reference re-weights w_ncdm per step from its
    integrated ln f, background_module.cpp:372-380)."""
    nc, idx = ctx.ncdm, ctx.idx
    if not idx.n_dncdm:
        return nc.w, nc.dlnf0
    ns, nq = idx.n_ncdm, idx.q_size_ncdm
    n_std = ns - idx.n_dncdm
    stride = 1 + 2 * nq
    rows_w = [nc.w[i] for i in range(n_std)]
    rows_d = [nc.dlnf0[i] for i in range(n_std)]
    for j in range(idx.n_dncdm):
        base = idx.dec_col0 + j * stride
        lnf = bgv[base + 1: base + 1 + nq]
        sep = bgv[base + 1 + nq: base + 1 + 2 * nq]
        rows_w.append(nc.w[n_std + j] * jnp.exp(lnf))
        rows_d.append(nc.dlnf0[n_std + j] + sep)
    return jnp.stack(rows_w), jnp.stack(rows_d)


@lru_cache(maxsize=2)
def dr_kernel_table(lmax, npts=1024):
    """Decay scattering kernel F_l(x), x = q/eps, tabulated as the smooth
    G_l(x) = F_l(x)/x^l on a uniform x grid. Cosmology-independent, so it is
    precomputed on the host ONCE (numpy) instead of running the reference's
    per-step Miller recurrence (perturbations_module.cpp:8374-8420
    ComputeFl) inside the jitted RHS."""
    import numpy as _np

    xg = _np.linspace(1e-6, 1.0, npts)
    G = _np.ones((npts, lmax + 1))
    ell = _np.arange(lmax + 1)
    for i, x in enumerate(xg):
        F = _np.ones(lmax + 1)
        if x > 0.9999:
            if lmax >= 1:
                F[1] = x
            if lmax >= 2:
                xa = min(x, 1.0 - 1e-14)
                F[2] = (x * (5.0 * x * x - 3.0)
                        + 3.0 * (x * x - 1.0) ** 2 * _np.arctanh(xa))                     / (2.0 * x ** 3)
            for l in range(3, lmax + 1):
                F[l] = ((2.0 * l - 1.0) * F[l - 1] / x
                        - (l + 1.0) * F[l - 2]) / (l - 2.0)
        else:
            km = 42 + lmax
            if x > 0.9:
                km = int(km * (-1.0 - 1.8 * math.log(1.0 / x - 1.0)))
            Fp2, Fp1 = 0.0, 1.0
            for l in range(km, -1, -1):
                Fp = ((2.0 * l + 3.0) * Fp1 / x - l * Fp2) / (l + 3.0)
                if Fp > 1e250:
                    Fp1 /= Fp
                    F /= Fp
                    Fp = 1.0
                if l <= lmax:
                    F[l] = Fp
                Fp2, Fp1 = Fp1, Fp
            F = F / F[0]
        G[i] = F / x ** ell
    return jnp.asarray(xg), jnp.asarray(G)


def _dr_kernel_eval(x, xg, G):
    """F_l(x) for x (nq,) -> (nq, L): linear interp of G_l plus the exact
    x^l prefactor (so the steep small-x behavior costs no table resolution)."""
    npts = xg.shape[0]
    fi = (jnp.clip(x, xg[0], xg[-1]) - xg[0]) / (xg[-1] - xg[0]) * (npts - 1)
    i0 = jnp.clip(jnp.floor(fi).astype(jnp.int32), 0, npts - 2)
    wgt = (fi - i0.astype(x.dtype))[:, None]
    Gx = G[i0] * (1.0 - wgt) + G[i0 + 1] * wgt
    L = G.shape[1]
    return Gx * x[:, None] ** jnp.arange(L, dtype=x.dtype)


class PertCtx(NamedTuple):
    """Everything the RHS needs besides (tau, y): wavenumber, approximation
    flags for the current segment, and the runtime interpolation tables."""

    k: jnp.ndarray
    tca_on: jnp.ndarray   # bool
    rsa_on: jnp.ndarray   # bool
    ufa_on: jnp.ndarray   # bool
    bg_spline: object     # UniformSpline over ln(tau), background columns
    th_spline: object     # UniformSpline over ln(tau), thermo columns
    bidx: object          # BgIdx
    idx: PtIdx
    ncdmfa_on: jnp.ndarray = jnp.asarray(False)  # ncdm fluid approximation
    ncdm: object = None   # NcdmCtx when idx.n_ncdm > 0
    wa_fld: float = 0.0
    cs2_fld: float = 1.0
    c_gamma_over_c_fld: float = 0.4   # PPF sound-speed ratio (input :3212)
    # PPF large/small-scale branch cap on (c_gamma k/aH)^2 c_s^2
    # (precisions.h:245); static — changing it retraces, like any precision
    c_gamma_k_H_square_max: float = 1.0e3
    # offset of the stored eta slot (0.0 or 1.0, may be per-lane traced): the
    # state carries eta - eta_off. Low-k adiabatic modes store eta - 1 so the
    # super-horizon value 1 - O((k tau)^2) keeps its deviation at full
    # relative precision; high-k modes store eta itself since their late-time
    # eta decays far below 1 (critical for the f32 state path; exact no-op
    # in f64)
    eta_off: float = 0.0
    # temperature-contribution switches (sw, eisw, lisw, dop, pol, split_z);
    # None = all on (perturb_sources :6826-6895)
    tswitch: object = None
    # spatial curvature K [Mpc^-2] = -Omega_k H0^2 (reference pba->K); the
    # flat/open/closed branch is trace-time via idx.sgnK
    K: float = 0.0
    # dcdm -> dr: decay rate in 1/Mpc and H0 in 1/Mpc (for the dr F_l
    # normalization rho_dr a^4 / H0^2)
    Gamma_dcdm: float = 0.0
    H0: float = 1.0


class Locals(NamedTuple):
    """Quantities computed inside the RHS that sources also need."""

    a: jnp.ndarray
    aH: jnp.ndarray
    app_a: jnp.ndarray        # a''/a = aH' + 2(aH)^2
    aH_prime: jnp.ndarray     # (a'/a)' = aH' + (aH)^2
    h_prime: jnp.ndarray
    eta_prime: jnp.ndarray
    alpha: jnp.ndarray
    alpha_prime: jnp.ndarray
    delta_g_eff: jnp.ndarray
    P: jnp.ndarray            # polarization source combo
    delta_m: jnp.ndarray
    theta_m: jnp.ndarray
    delta_cb: jnp.ndarray
    theta_cb: jnp.ndarray
    theta_b_prime: jnp.ndarray
    g: jnp.ndarray
    dg: jnp.ndarray
    exp_m_kappa: jnp.ndarray
    eta: jnp.ndarray          # eta (sync) / phi (newtonian state slot)
    # gauge-invariant Bardeen potentials, computed per gauge in rhs_full
    phi: jnp.ndarray = None
    psi: jnp.ndarray = None
    phi_plus_psi: jnp.ndarray = None
    phi_prime: jnp.ndarray = None
    # per-species effective (approximation-aware) values for the transfer-
    # function outputs (perturb_output_data, class format)
    theta_g_eff: jnp.ndarray = None
    delta_ur_eff: jnp.ndarray = None
    theta_ur_eff: jnp.ndarray = None
    delta_nc: jnp.ndarray = None
    theta_nc: jnp.ndarray = None
    delta_tot: jnp.ndarray = None
    # N-body gauge ingredients (1811.00904 Eq. A.3/A.5)
    theta_tot: jnp.ndarray = None       # rho_plus_p_theta/(rho+p)_tot
    theta_over_k2: jnp.ndarray = None   # theta_tot / k^2
    H_T_Nb_prime: jnp.ndarray = None
    w_nc_tot: jnp.ndarray = None        # p_ncdm_tot/rho_ncdm_tot
    # (rho+p)_tot / rho_tot-excluding-Lambda: the delta_tot N-body shift
    # factor.  delta_tot = delta_rho/rho_ex (CMBFAST convention, Lambda
    # excluded) transforms under a time shift T by -3 aH (rho+p)_tot T /
    # rho_ex, so gauge invariance of delta_tot^{Nb} requires the SAME
    # Lambda-exclusive rho in the shift denominator.  The reference's
    # dormant code divides by the inclusive rho_tot (perturbations_module
    # .cpp:7034) which is NOT gauge-invariant — verified by the sync vs
    # newtonian cross-check in tests/test_nbody.py (3.4e-2 mismatch at low
    # k with the inclusive form, <1e-2 with this one).
    rpp_over_rho_ex: jnp.ndarray = None


def rhs_full(tau, y, ctx: PertCtx):
    """dy/dtau plus the Locals needed for source assembly."""
    tau = jnp.asarray(tau, y.dtype)  # time bookkeeping may be f64
    idx = ctx.idx
    bidx = ctx.bidx
    k = ctx.k
    k2 = k * k
    lntau = jnp.log(tau)
    bgv = ctx.bg_spline.eval(lntau)
    thv = ctx.th_spline.eval(lntau)

    a = bgv[bidx["a"]]
    H = bgv[bidx["H"]]
    Hp = bgv[bidx["H_prime"]]
    rho_g = bgv[bidx["rho_g"]]
    rho_b = bgv[bidx["rho_b"]]
    rho_cdm = bgv[bidx["rho_cdm"]]
    rho_ur = bgv[bidx["rho_ur"]]
    a2 = a * a
    aH = a * H
    app_a = Hp * a + 2.0 * aH * aH     # a''/a
    aH_prime = Hp * a + aH * aH        # (a'/a)'

    cb2 = thv[ThIdx.ix["cb2"]]
    kap = thv[ThIdx.ix["dkappa"]]
    kapp = thv[ThIdx.ix["ddkappa"]]
    g_vis = thv[ThIdx.ix["g"]]
    dg_vis = thv[ThIdx.ix["dg"]]
    emk = thv[ThIdx.ix["exp_m_kappa"]]

    R = 4.0 / 3.0 * rho_g / rho_b

    # --- curvature factors (perturb_workspace :2532 s_l, :7966 cotKgen,
    # :5856 s2_squared). Flat: s_l = 1, s2 = 1, cotKgen = 1/(k tau).
    K = ctx.K
    s2 = 1.0 - 3.0 * K / k2                      # s_l[2]^2

    def s_of_l(lv):
        return jnp.sqrt(jnp.maximum(1.0 - K * (lv * lv - 1.0) / k2, 0.0))

    s_l2 = jnp.sqrt(jnp.maximum(s2, 0.0))
    s_l3 = s_of_l(3.0)
    if ctx.idx.sgnK == 0:
        cotKgen = 1.0 / (k * tau)
    else:
        sqrt_absK = jnp.sqrt(jnp.abs(K))
        tanK = jnp.tan(sqrt_absK * tau) if ctx.idx.sgnK > 0 else jnp.tanh(sqrt_absK * tau)
        cotKgen = sqrt_absK / (k * tanK)

    tca = ctx.tca_on
    rsa = ctx.rsa_on
    ufa = ctx.ufa_on

    # --- unpack state
    delta_g = y[idx.delta_g]
    theta_g = y[idx.theta_g]
    shear_g = y[idx.shear_g]
    F_g = jax.lax.dynamic_slice(y, (idx.F_g,), (idx.n_F_g,))           # l=3..lmax_g
    G = jax.lax.dynamic_slice(y, (idx.G_g,), (idx.n_G_g,))             # l=0..lmax_pol
    delta_b = y[idx.delta_b]
    theta_b = y[idx.theta_b]
    delta_cdm = y[idx.delta_cdm]
    delta_ur = y[idx.delta_ur]
    theta_ur = y[idx.theta_ur]
    shear_ur = y[idx.shear_ur]
    F_ur = jax.lax.dynamic_slice(y, (idx.F_ur,), (idx.n_F_ur,))        # l=3..lmax_ur
    eta = y[idx.eta] + ctx.eta_off
    if idx.has_dcdm:
        delta_dc = y[idx.delta_dcdm]
        theta_dc = y[idx.theta_dcdm_pt]
        F_dr = jax.lax.dynamic_slice(y, (idx.F_dr,), (idx.n_F_dr,))
        rho_dcdm = bgv[bidx["rho_dcdm"]]
        rho_dr = bgv[bidx["rho_dr"]]
        dr_fac = (ctx.H0 / a2) ** 2        # rho_dr_over_f (:6253)
        r_dr = rho_dr / dr_fac             # rho_dr a^4 / H0^2
        rprime_dr = ctx.Gamma_dcdm * rho_dcdm * a2 * a2 * a / ctx.H0**2
    if idx.has_scf:
        dphi_scf = y[idx.phi_scf_pt]
        dphip_scf = y[idx.phi_prime_scf_pt]
        phip_scf_bg = bgv[bidx["phi_prime_scf"]]
        dV_scf_bg = bgv[bidx["dV_scf"]]
        ddV_scf_bg = bgv[bidx["ddV_scf"]]
    if idx.has_idm_dr:
        delta_idm = y[idx.delta_idm_dr]
        theta_idm = y[idx.theta_idm_dr_pt]
        delta_idr_v = y[idx.delta_idr]
        theta_idr_v = y[idx.theta_idr]
        shear_idr_v = y[idx.shear_idr]
        rho_idm = bgv[bidx["rho_idm_dr"]]
        rho_idr_bg = bgv[bidx["rho_idr"]]
        dmu_idm = thv[ThIdx.ix["dmu_idm_dr"]]
        dmu_idr_v = thv[ThIdx.ix["dmu_idr"]]
        cidm2 = thv[ThIdx.ix["cidm_dr2"]]
        Sinv_idm = 4.0 * rho_idr_bg / (3.0 * rho_idm)

    ncdmfa = ctx.ncdmfa_on
    if idx.n_ncdm:
        nc = ctx.ncdm
        ns, nq, nl = idx.n_ncdm, idx.q_size_ncdm, idx.n_l_ncdm
        Psi = jax.lax.dynamic_slice(y, (idx.ncdm,), (idx.n_ncdm_block,)).reshape(ns, nq, nl)
        eps = jnp.sqrt(nc.q[None, :] ** 2 + (a * nc.x_fac[:, None]) ** 2)   # (ns, nq)
        fac = nc.pref / a2 / a2                                             # (ns,)
        # exact momentum integrals (perturb_total_stress_energy :6347-6395)
        w_eff, dl_eff = _ncdm_eff_weights(bgv, ctx)
        qw = w_eff * nc.q[None, :] ** 2                                 # (ns, nq)
        rho_delta_ex = fac * jnp.sum(qw * eps * Psi[:, :, 0], axis=1)
        rpt_ex = k * fac * jnp.sum(qw * nc.q[None, :] * Psi[:, :, 1], axis=1)
        rps_ex = 2.0 / 3.0 * fac * jnp.sum(qw * nc.q[None, :] ** 2 / eps * Psi[:, :, 2], axis=1)
        dp_ex = fac / 3.0 * jnp.sum(qw * nc.q[None, :] ** 2 / eps * Psi[:, :, 0], axis=1)
        # per-species background quantities
        rho_nc = jnp.stack([bgv[bidx[f"rho_ncdm{i}"]] for i in range(ns)])
        p_nc = jnp.stack([bgv[bidx[f"p_ncdm{i}"]] for i in range(ns)])
        pp_nc = jnp.stack([bgv[bidx[f"pseudo_p_ncdm{i}"]] for i in range(ns)])
        w_nc = p_nc / rho_nc
        rho_plus_p_nc = rho_nc + p_nc
        # fluid variables live in slots (s, 0, 0:3)
        d_fl, t_fl, s_fl = Psi[:, 0, 0], Psi[:, 0, 1], Psi[:, 0, 2]
        cg2_nc = w_nc * (1.0 - (3.0 * w_nc - 2.0 + pp_nc / p_nc) / (3.0 + 3.0 * w_nc))
        rho_delta_nc = jnp.where(ncdmfa, rho_nc * d_fl, rho_delta_ex)
        rpt_nc = jnp.where(ncdmfa, rho_plus_p_nc * t_fl, rpt_ex)
        rps_nc = jnp.where(ncdmfa, rho_plus_p_nc * s_fl, rps_ex)
        dp_nc = jnp.where(ncdmfa, cg2_nc * rho_nc * d_fl, dp_ex)

    # --- effective photon/ur variables entering the Einstein sums
    # (perturb_total_stress_energy :6107-6170): zero under RSA; under TCA the
    # state delta/theta are used and shear enters via its 1st-order value.
    zero = jnp.zeros_like(delta_g)
    d_g = jnp.where(rsa, zero, delta_g)
    t_g = jnp.where(rsa, zero, theta_g)
    s_g = jnp.where(rsa | tca, zero, shear_g)
    d_ur = jnp.where(rsa, zero, delta_ur)
    t_ur = jnp.where(rsa, zero, theta_ur)
    s_ur = jnp.where(rsa, zero, shear_ur)

    delta_rho = rho_g * d_g + rho_b * delta_b + rho_cdm * delta_cdm + rho_ur * d_ur
    rho_plus_p_theta = 4.0 / 3.0 * rho_g * t_g + rho_b * theta_b + 4.0 / 3.0 * rho_ur * t_ur
    rho_plus_p_shear = 4.0 / 3.0 * rho_g * s_g + 4.0 / 3.0 * rho_ur * s_ur
    delta_p = 1.0 / 3.0 * rho_g * d_g + cb2 * rho_b * delta_b + 1.0 / 3.0 * rho_ur * d_ur
    if idx.has_dcdm:
        # dcdm + dr stress energy (perturb_total_stress_energy :6228-6262)
        delta_rho = delta_rho + rho_dcdm * delta_dc + dr_fac * F_dr[0]
        rho_plus_p_theta = rho_plus_p_theta + rho_dcdm * theta_dc + k * dr_fac * F_dr[1]
        rho_plus_p_shear = rho_plus_p_shear + 2.0 / 3.0 * dr_fac * F_dr[2]
        delta_p = delta_p + 1.0 / 3.0 * dr_fac * F_dr[0]
    if idx.n_dncdm:
        # dncdm dark radiation: same F_l normalization as the dcdm dr block
        # (the reference accumulates both into index_pt_F0_dr_sum,
        # perturbations_module.cpp:5258 + :8397)
        drn_fac = (ctx.H0 / a2) ** 2
        nld_se = idx.l_max_dr + 1
        for j_se in range(idx.n_dncdm):
            Fd_se = jax.lax.dynamic_slice(
                y, (idx.F_dr_ncdm + j_se * nld_se,), (3,))
            delta_rho = delta_rho + drn_fac * Fd_se[0]
            rho_plus_p_theta = rho_plus_p_theta + k * drn_fac * Fd_se[1]
            rho_plus_p_shear = rho_plus_p_shear + 2.0 / 3.0 * drn_fac * Fd_se[2]
            delta_p = delta_p + 1.0 / 3.0 * drn_fac * Fd_se[0]
    if idx.has_idm_dr:
        # idm_dr + idr stress energy (perturb_total_stress_energy :6244-6251)
        delta_rho = delta_rho + rho_idm * delta_idm + rho_idr_bg * delta_idr_v
        rho_plus_p_theta = rho_plus_p_theta + rho_idm * theta_idm \
            + 4.0 / 3.0 * rho_idr_bg * theta_idr_v
        if not idx.idr_fluid:
            rho_plus_p_shear = rho_plus_p_shear + 4.0 / 3.0 * rho_idr_bg * shear_idr_v
        delta_p = delta_p + 1.0 / 3.0 * rho_idr_bg * delta_idr_v
    if idx.n_ncdm:
        delta_rho = delta_rho + jnp.sum(rho_delta_nc)
        rho_plus_p_theta = rho_plus_p_theta + jnp.sum(rpt_nc)
        rho_plus_p_shear = rho_plus_p_shear + jnp.sum(rps_nc)
        delta_p = delta_p + jnp.sum(dp_nc)
    if idx.has_scf:
        # scf stress-energy (perturb_total_stress_energy :6438-6476): added
        # after every shear-carrying species since the newtonian-gauge
        # delta_rho_scf needs psi built from the completed shear sum
        dr_scf = (phip_scf_bg * dphip_scf / a2 + dV_scf_bg * dphi_scf) / 3.0
        dp_scf = (phip_scf_bg * dphip_scf / a2 - dV_scf_bg * dphi_scf) / 3.0
        if idx.gauge == "newtonian":
            shear_psi_scf = rho_plus_p_shear + jnp.where(
                tca, 4.0 / 3.0 * rho_g * 16.0 / 45.0 / kap * theta_g, zero)
            psi_scf = eta - 4.5 * (a2 / k2) * shear_psi_scf  # slot holds phi
            corr = phip_scf_bg ** 2 / a2 * psi_scf / 3.0
            dr_scf = dr_scf - corr
            dp_scf = dp_scf - corr
        delta_rho = delta_rho + dr_scf
        rho_plus_p_theta = rho_plus_p_theta + k2 / a2 * phip_scf_bg * dphi_scf / 3.0
        delta_p = delta_p + dp_scf

    # --- dark-energy fluid: LAST species (the PPF scheme needs the non-fld
    # sums, perturb_total_stress_energy :6484-6570).
    # Ordering note: under RSA the photon/ur contributions in delta_rho /
    # rho_plus_p_theta above are ZERO at this point — this matches the
    # reference exactly: perturb_total_stress_energy (which contains the fld
    # block) sets delta_g=theta_g=0 under RSA (:6121-6123) and the rsa values
    # are only added later inside perturb_einstein, after h' is known
    # (perturb_rsa_delta_and_theta :9626-9631) — same place we add them below.
    Gamma_prime_fld = zero
    if idx.has_fld:
        rho_fld = bgv[bidx["rho_fld"]]
        w_fld = bgv[bidx["w_fld"]]
        # w'(tau) from the background table (CLP: -wa a^2 H; EDE: analytic
        # dw/da of the tracker, background.py fld block)
        w_prime_fld = bgv[bidx["w_prime_fld"]]
        cs2_fld = ctx.cs2_fld
        if idx.use_ppf:
            # PPF formalism (Hu 2008; :6484-6562, synchronous gauge). One
            # dynamical variable Gamma (stored in the delta_fld slot); the
            # fld density/velocity perturbations are constrained.
            rho_tot_bg = bgv[bidx["rho_tot"]]
            p_tot_bg = bgv[bidx["p_tot"]]
            p_tot_prime_bg = bgv[bidx["p_tot_prime"]]
            H_bg = bgv[bidx["H"]]
            Hp_bg = bgv[bidx["H_prime"]]
            Gamma = y[idx.delta_fld]
            cK = (ctx.c_gamma_over_c_fld * k / aH) ** 2 * cs2_fld
            big = cK > ctx.c_gamma_k_H_square_max   # precisions.h:245
            Gamma_e = jnp.where(big, zero, Gamma)
            rpp_nofld = (rho_tot_bg + p_tot_bg) - (1.0 + w_fld) * rho_fld
            alpha_ppf = (eta + 1.5 * a2 / (k2 * s2)
                         * (delta_rho + 3.0 * aH / k2 * rho_plus_p_theta)
                         - Gamma_e) / aH
            S_fld = rho_fld * (1.0 + w_fld) * 1.5 * a2 / k2 / aH * (
                rho_plus_p_theta / rpp_nofld + k2 * alpha_ppf)
            Gamma_prime_fld = jnp.where(
                big, zero, aH * (S_fld / (1.0 + cK) - (1.0 + cK) * Gamma_e))
            Gpa = Gamma_prime_fld + aH * Gamma_e
            rpt_fld = rho_fld * (1.0 + w_fld) * rho_plus_p_theta / rpp_nofld \
                - k2 * (2.0 / 3.0) * aH / a2 / (1.0 + 4.5 * a2 / (k2 * s2) * rpp_nofld) \
                * (S_fld - Gpa / aH)
            drho_fld = -2.0 / 3.0 * k2 * s2 / a2 * Gamma_e - 3.0 * aH / k2 * rpt_fld
            # pressure perturbation from the analytic theta_fld' (:6528-6560)
            p_fld = w_fld * rho_fld
            rho_fld_prime = -3.0 * aH * (rho_fld + p_fld)
            p_fld_prime = w_prime_fld * rho_fld - 3.0 * aH * (1.0 + w_fld) * p_fld
            rho_t = rho_tot_bg - rho_fld
            p_t = p_tot_bg - p_fld
            rho_t_prime = -3.0 * aH * (rho_t + p_t)
            p_t_prime = p_tot_prime_bg - p_fld_prime
            X = cK
            X_prime = -2.0 * X * (aH + Hp_bg / H_bg)
            Yv = 4.5 * a2 / (k2 * s2) * (rho_t + p_t)
            Y_prime = Yv * (2.0 * aH + (rho_t_prime + p_t_prime) / (rho_t + p_t))
            Zv = 2.0 / 3.0 * k2 * H_bg / a
            Z_prime = Zv * (Hp_bg / H_bg - aH)
            theta_t = rho_plus_p_theta / rpp_nofld
            theta_t_prime = -aH * theta_t - (p_t_prime * theta_t - k2 * delta_p
                                             + k2 * rho_plus_p_shear) / rpp_nofld
            alpha_prime_ppf = -2.0 * aH * alpha_ppf + eta \
                - 4.5 * (a2 / k2) * rho_plus_p_shear
            S_prime = -Z_prime / Zv * S_fld \
                + (rho_fld_prime + p_fld_prime) * (theta_t + k2 * alpha_ppf) / Zv \
                + (rho_fld + p_fld) * (theta_t_prime + k2 * alpha_prime_ppf) / Zv
            inv1X = 1.0 / (1.0 + 1.0 / X)
            rpt_fld_prime = Z_prime * (S_fld - (S_fld * inv1X + Gamma_e * X) / (1.0 + Yv)) \
                + Zv * (S_prime + Y_prime / (1.0 + Yv) ** 2 * (S_fld * inv1X + Gamma_e * X)
                        - (S_prime * inv1X + S_fld * X_prime / (1.0 + X) ** 2
                           + Gamma_prime_fld * X + Gamma_e * X_prime) / (1.0 + Yv)) \
                - k2 * alpha_prime_ppf * (rho_fld + p_fld) \
                - k2 * alpha_ppf * (rho_fld_prime + p_fld_prime)
            dp_fld = (rpt_fld_prime + 4.0 * aH * rpt_fld) / k2
            delta_rho = delta_rho + drho_fld
            rho_plus_p_theta = rho_plus_p_theta + rpt_fld
            delta_p = delta_p + dp_fld
        else:
            d_fld = y[idx.delta_fld]
            t_fld = y[idx.theta_fld]
            ca2_fld = w_fld - w_prime_fld / (3.0 * (1.0 + w_fld) * aH)
            delta_rho = delta_rho + rho_fld * d_fld
            rho_plus_p_theta = rho_plus_p_theta + (1.0 + w_fld) * rho_fld * t_fld
            delta_p = delta_p + cs2_fld * rho_fld * d_fld \
                + 3.0 * aH * (cs2_fld - ca2_fld) * (1.0 + w_fld) * rho_fld * t_fld / k2

    newt = idx.gauge == "newtonian"
    if newt:
        # --- Einstein equations, newtonian gauge (perturb_einstein :5870-5905):
        # phi is dynamical (state slot idx.eta holds phi), psi is constrained.
        phi = eta          # the state slot, unpacked above under the name eta
        theta_cdm = y[idx.theta_cdm]
        rho_plus_p_theta = rho_plus_p_theta + rho_cdm * theta_cdm
        # under TCA the photon shear entering psi is its 1st-order value
        # 16/45/kap * theta_g (perturb_total_stress_energy :6125)
        rho_plus_p_shear_psi = rho_plus_p_shear + jnp.where(
            tca, 4.0 / 3.0 * rho_g * 16.0 / 45.0 / kap * theta_g, zero)
        psi = phi - 4.5 * (a2 / k2) * rho_plus_p_shear_psi
        phi_prime = -aH * psi + 1.5 * (a2 / k2) * rho_plus_p_theta

        # radiation streaming, newtonian (perturb_rsa_delta_and_theta :9543)
        rsa_delta_g = -4.0 * phi - 4.0 / k2 * kap * theta_b
        rsa_theta_g = 6.0 * phi_prime + 3.0 / k2 * (
            kapp * theta_b
            + kap * (-aH * theta_b + cb2 * k2 * delta_b + k2 * phi))
        rsa_delta_ur = -4.0 * phi
        rsa_theta_ur = 6.0 * phi_prime

        metric_continuity = -3.0 * phi_prime
        metric_euler = k2 * psi
        metric_shear = zero
        metric_shear_prime = zero
        metric_ufa = -6.0 * phi_prime
        # sync-only quantities, defined for the shared Locals layout
        h_prime = zero
        eta_prime = phi_prime
        alpha = zero
        alpha_prime = zero
        phi_plus_psi = phi + psi
    else:
        # --- Einstein 00: h' (perturb_einstein :5911), synchronous
        h_prime = (k2 * s2 * eta + 1.5 * a2 * delta_rho) / (0.5 * aH)

        # --- radiation streaming values (perturb_rsa_delta_and_theta
        # :9581-9615, synchronous, rsa_MD_with_reio)
        rsa_delta_g = 4.0 / k2 * (aH * h_prime - k2 * eta) \
            - 4.0 / k2 * kap * (theta_b + 0.5 * h_prime)
        rsa_theta_g = -0.5 * h_prime + 3.0 / k2 * (
            kapp * (theta_b + 0.5 * h_prime)
            + kap * (-aH * theta_b + cb2 * k2 * delta_b - aH * h_prime + k2 * eta)
        )
        rsa_delta_ur = 4.0 / k2 * (aH * h_prime - k2 * eta)
        rsa_theta_ur = -0.5 * h_prime

        delta_rho = delta_rho + jnp.where(rsa, rho_g * rsa_delta_g + rho_ur * rsa_delta_ur, zero)
        rho_plus_p_theta = rho_plus_p_theta + jnp.where(
            rsa, 4.0 / 3.0 * rho_g * rsa_theta_g + 4.0 / 3.0 * rho_ur * rsa_theta_ur, zero)

        # --- Einstein 0i, trace, shear (perturb_einstein :5941-5976)
        eta_prime = (1.5 * a2 * rho_plus_p_theta + 0.5 * K * h_prime) / (k2 * s2)
        alpha = (h_prime + 6.0 * eta_prime) / (2.0 * k2)

        tca_shear_g_1 = 16.0 / 45.0 / kap * (theta_g + k2 * alpha)
        rho_plus_p_shear = rho_plus_p_shear + jnp.where(tca, 4.0 / 3.0 * rho_g * tca_shear_g_1, zero)
        alpha_prime = -2.0 * aH * alpha + eta - 4.5 * (a2 / k2) * rho_plus_p_shear

        metric_continuity = 0.5 * h_prime
        metric_euler = zero
        metric_shear = k2 * alpha
        metric_shear_prime = k2 * alpha_prime
        metric_ufa = 0.5 * h_prime
        phi = eta - aH * alpha
        psi = aH * alpha + alpha_prime
        phi_prime = eta_prime - aH_prime * alpha - aH * alpha_prime
        phi_plus_psi = eta + alpha_prime

    # --- effective delta/theta for the evolution equations under RSA
    d_g = jnp.where(rsa, rsa_delta_g, delta_g)
    t_g = jnp.where(rsa, rsa_theta_g, theta_g)

    # --- TCA slip & shear, compromise_CLASS (perturb_tca_slip_and_shear :9229)
    tau_c = 1.0 / kap
    dtau_c = -kapp * tau_c * tau_c
    F = tau_c / (1.0 + R)
    F_prime = dtau_c / (1.0 + R) + tau_c * aH * R / (1.0 + R) ** 2
    slip_1 = (dtau_c / tau_c - 2.0 * aH / (1.0 + R)) * (theta_b - t_g) + F * (
        -app_a * theta_b
        + k2 * (-aH * d_g / 2.0
                + cb2 * (-theta_b - metric_continuity)
                + (t_g + metric_continuity) / 3.0)
        - aH * metric_euler
    )
    shear_g_tca1 = 16.0 / 45.0 * tau_c * (t_g + metric_shear)
    theta_prime0 = (-aH * theta_b + k2 * (cb2 * delta_b + R / 4.0 * d_g)) / (1.0 + R) \
        + metric_euler
    shear_g_prime1 = 16.0 / 45.0 * (tau_c * (theta_prime0 + metric_shear_prime)
                                    + dtau_c * (t_g + metric_shear))
    tca_slip = (1.0 - 2.0 * aH * F) * slip_1 + F * k2 * (
        2.0 * aH * s2 * shear_g_tca1 + s2 * shear_g_prime1
        - (1.0 / 3.0 - cb2) * (F * theta_prime0 + 2.0 * F_prime * theta_b)
    )
    tca_shear_g = (1.0 - 11.0 / 6.0 * dtau_c) * shear_g_tca1 \
        - 11.0 / 6.0 * tau_c * 16.0 / 45.0 * tau_c * (theta_prime0 + metric_shear_prime)

    # --- assemble dy
    dy = jnp.zeros_like(y)

    # photons: density (off under RSA)
    d_delta_g = -4.0 / 3.0 * (t_g + metric_continuity)
    dy = dy.at[idx.delta_g].set(jnp.where(rsa, zero, d_delta_g))

    # baryons
    d_delta_b = -(theta_b + metric_continuity)
    theta_b_prime_notca = (-aH * theta_b + k2 * cb2 * delta_b
                           + metric_euler
                           + R * kap * (t_g - theta_b))
    theta_b_prime_tca = (-aH * theta_b
                         + k2 * (cb2 * delta_b + R * (d_g / 4.0 - s2 * tca_shear_g))
                         + R * tca_slip) / (1.0 + R) + metric_euler
    theta_b_prime = jnp.where(tca, theta_b_prime_tca, theta_b_prime_notca)
    dy = dy.at[idx.delta_b].set(d_delta_b)
    dy = dy.at[idx.theta_b].set(theta_b_prime)

    # photon velocity
    P0 = (G[0] + G[2] + 2.0 * s_l2 * shear_g) / 8.0
    theta_g_prime_full = k2 * (d_g / 4.0 - s2 * shear_g) + metric_euler + kap * (theta_b - t_g)
    theta_g_prime_tca = (-(theta_b_prime + aH * theta_b - k2 * cb2 * delta_b) / R
                         + k2 * (0.25 * d_g - s2 * tca_shear_g)
                         + (1.0 + R) / R * metric_euler)
    dy = dy.at[idx.theta_g].set(
        jnp.where(rsa, zero, jnp.where(tca, theta_g_prime_tca, theta_g_prime_full)))

    hier_on = ~(tca | rsa)

    # photon shear and higher moments (perturb_derivs :8152-8215; the l
    # couplings carry the curvature free-streaming coefficients s_l)
    d_shear_g = 0.5 * (8.0 / 15.0 * (theta_g + metric_shear)
                       - 3.0 / 5.0 * k * s_l3 / s_l2 * F_g[0]
                       - kap * (2.0 * shear_g - 4.0 / 5.0 / s_l2 * P0))
    dy = dy.at[idx.shear_g].set(jnp.where(hier_on, d_shear_g, zero))

    # F_g l=3..lmax: build the (lmax-2,) derivative vector. F_2 enters the
    # l=3 equation as 2 s_l[2] shear_g (:8160)
    lmax_g = idx.l_max_g
    ls = jnp.arange(3, lmax_g + 1, dtype=y.dtype)
    sl_g = s_of_l(ls)                       # s_l[l],  l = 3..lmax
    sl_g_p1 = s_of_l(ls + 1.0)              # s_l[l+1]
    F_lm1 = jnp.concatenate([2.0 * s_l2 * shear_g[None], F_g[:-1]])
    F_lp1 = jnp.concatenate([F_g[1:], jnp.zeros((1,), y.dtype)])
    dF = k / (2.0 * ls + 1.0) * (ls * sl_g * F_lm1 - (ls + 1.0) * sl_g_p1 * F_lp1) - kap * F_g
    # lmax closure: F'_lmax = k(s_l F_{lmax-1} - (lmax+1) cotKgen F_lmax) - kap F_lmax
    dF_last = k * (sl_g[-1] * F_g[-2] - (lmax_g + 1.0) * cotKgen * F_g[-1]) - kap * F_g[-1]
    dF = dF.at[-1].set(dF_last)
    dy = jax.lax.dynamic_update_slice(dy, jnp.where(hier_on, dF, jnp.zeros_like(dF)), (idx.F_g,))

    # polarization l=0..lmax_pol (:8180-8213)
    lmax_p = idx.l_max_pol_g
    lp = jnp.arange(0, lmax_p + 1, dtype=y.dtype)
    sl_p = s_of_l(lp)
    sl_p_p1 = s_of_l(lp + 1.0)
    G_lm1 = jnp.concatenate([jnp.zeros((1,), y.dtype), G[:-1]])
    G_lp1 = jnp.concatenate([G[1:], jnp.zeros((1,), y.dtype)])
    dG = k / (2.0 * lp + 1.0) * (lp * sl_p * G_lm1 - (lp + 1.0) * sl_p_p1 * G_lp1) - kap * G
    dG = dG.at[0].set(-k * G[1] - kap * (G[0] - 4.0 * P0))
    dG = dG.at[2].set(k / 5.0 * (2.0 * s_l2 * G[1] - 3.0 * s_l3 * G[3])
                      - kap * (G[2] - 4.0 / 5.0 * P0))
    dG_last = k * (sl_p[-1] * G[-2] - (lmax_p + 1.0) * cotKgen * G[-1]) - kap * G[-1]
    dG = dG.at[-1].set(dG_last)
    dy = jax.lax.dynamic_update_slice(dy, jnp.where(hier_on, dG, jnp.zeros_like(dG)), (idx.G_g,))

    # cdm (synchronous: theta_cdm = 0; newtonian evolves it,
    # perturb_derivs :8238-8248)
    if newt:
        dy = dy.at[idx.delta_cdm].set(-(theta_cdm + metric_continuity))
        dy = dy.at[idx.theta_cdm].set(-aH * theta_cdm + metric_euler)
    else:
        dy = dy.at[idx.delta_cdm].set(-metric_continuity)

    # ur (perturb_derivs :8630-8672)
    d_delta_ur = -4.0 / 3.0 * (theta_ur + metric_continuity)
    d_theta_ur = k2 * (delta_ur / 4.0 - s2 * shear_ur) + metric_euler
    d_shear_ur_full = 0.5 * (8.0 / 15.0 * (theta_ur + metric_shear)
                             - 3.0 / 5.0 * k * s_l3 / s_l2 * F_ur[0])
    d_shear_ur_ufa = -3.0 / tau * shear_ur + 2.0 / 3.0 * (theta_ur + metric_ufa)
    ur_on = ~rsa
    dy = dy.at[idx.delta_ur].set(jnp.where(ur_on, d_delta_ur, zero))
    dy = dy.at[idx.theta_ur].set(jnp.where(ur_on, d_theta_ur, zero))
    dy = dy.at[idx.shear_ur].set(
        jnp.where(ur_on, jnp.where(ufa, d_shear_ur_ufa, d_shear_ur_full), zero))

    lmax_u = idx.l_max_ur
    lu = jnp.arange(3, lmax_u + 1, dtype=y.dtype)
    sl_u = s_of_l(lu)
    sl_u_p1 = s_of_l(lu + 1.0)
    Fu_lm1 = jnp.concatenate([2.0 * s_l2 * shear_ur[None], F_ur[:-1]])
    Fu_lp1 = jnp.concatenate([F_ur[1:], jnp.zeros((1,), y.dtype)])
    dFu = k / (2.0 * lu + 1.0) * (lu * sl_u * Fu_lm1 - (lu + 1.0) * sl_u_p1 * Fu_lp1)
    dFu_last = k * (sl_u[-1] * F_ur[-2] - (lmax_u + 1.0) * cotKgen * F_ur[-1])
    dFu = dFu.at[-1].set(dFu_last)
    ur_hier_on = ur_on & (~ufa)
    dy = jax.lax.dynamic_update_slice(
        dy, jnp.where(ur_hier_on, dFu, jnp.zeros_like(dFu)), (idx.F_ur,))

    # --- ncdm (perturb_derivs :8725-8894)
    if idx.n_ncdm:
        qk_eps = k * nc.q[None, :] / eps                      # (ns, nq)
        dl0 = dl_eff
        # exact Boltzmann hierarchy on the momentum grid
        lsn = jnp.arange(0, nl, dtype=y.dtype)                # l values
        sl_n = s_of_l(lsn)
        sl_n_p1 = s_of_l(lsn + 1.0)
        Ps_m1 = jnp.concatenate([jnp.zeros((ns, nq, 1), y.dtype), Psi[:, :, :-1]], axis=2)
        Ps_p1 = jnp.concatenate([Psi[:, :, 1:], jnp.zeros((ns, nq, 1), y.dtype)], axis=2)
        dPsi = qk_eps[:, :, None] / (2.0 * lsn + 1.0) * (
            lsn * sl_n * Ps_m1 - (lsn + 1.0) * sl_n_p1 * Ps_p1)
        dPsi = dPsi.at[:, :, 0].set(-qk_eps * Psi[:, :, 1]
                                    + metric_continuity * dl0 / 3.0)
        dPsi = dPsi.at[:, :, 1].set(qk_eps / 3.0 * (Psi[:, :, 0] - 2.0 * s_l2 * Psi[:, :, 2])
                                    - eps * metric_euler / (3.0 * nc.q[None, :] * k) * dl0)
        dPsi = dPsi.at[:, :, 2].set(qk_eps / 5.0 * (2.0 * s_l2 * Psi[:, :, 1]
                                                    - 3.0 * s_l3 * Psi[:, :, 3])
                                    - s_l2 * metric_shear * 2.0 / 15.0 * dl0)
        dPsi = dPsi.at[:, :, -1].set(qk_eps * Psi[:, :, -2]
                                     - (1.0 + (nl - 1.0)) * k * cotKgen * Psi[:, :, -1])
        # fluid approximation (ncdmfa_CLASS, :8770-8790)
        ca2 = w_nc / 3.0 / (1.0 + w_nc) * (5.0 - pp_nc / p_nc)
        ceff2 = ca2
        cvis2 = 3.0 * w_nc * ca2
        d_dfl = (-(1.0 + w_nc) * (t_fl + metric_continuity)
                 - 3.0 * aH * (ceff2 - w_nc) * d_fl)
        d_tfl = (-aH * (1.0 - 3.0 * ca2) * t_fl
                 + ceff2 / (1.0 + w_nc) * k2 * d_fl - k2 * s_fl + metric_euler)
        d_sfl = (-3.0 * (aH * (2.0 / 3.0 - ca2 - pp_nc / p_nc / 3.0) + 1.0 / tau) * s_fl
                 + 8.0 / 3.0 * cvis2 / (1.0 + w_nc) * s_l2 * (t_fl + metric_ufa))
        dPsi_fl = jnp.zeros_like(dPsi)
        dPsi_fl = dPsi_fl.at[:, 0, 0].set(d_dfl)
        dPsi_fl = dPsi_fl.at[:, 0, 1].set(d_tfl)
        dPsi_fl = dPsi_fl.at[:, 0, 2].set(d_sfl)
        dPsi = jnp.where(ncdmfa, dPsi_fl, dPsi)
        dy = jax.lax.dynamic_update_slice(dy, dPsi.reshape(-1), (idx.ncdm,))

    # dcdm + dr (perturb_derivs :8290-8360)
    if idx.has_dcdm:
        aG = a * ctx.Gamma_dcdm
        dy = dy.at[idx.delta_dcdm].set(-(theta_dc + metric_continuity)
                                       - aG / k2 * metric_euler)
        dy = dy.at[idx.theta_dcdm_pt].set(-aH * theta_dc + metric_euler)
        lmax_dr = idx.l_max_dr
        ld = jnp.arange(0, lmax_dr + 1, dtype=y.dtype)
        sl_d = s_of_l(ld)
        sl_d_p1 = s_of_l(ld + 1.0)
        Fd_m1 = jnp.concatenate([jnp.zeros((1,), y.dtype), F_dr[:-1]])
        Fd_p1 = jnp.concatenate([F_dr[1:], jnp.zeros((1,), y.dtype)])
        dFd = k / (2.0 * ld + 1.0) * (ld * sl_d * Fd_m1 - (ld + 1.0) * sl_d_p1 * Fd_p1)
        dFd = dFd.at[0].set(-k * F_dr[1] - 4.0 / 3.0 * metric_continuity * r_dr
                            + rprime_dr * (delta_dc + metric_euler / k2))
        dFd = dFd.at[1].set(k / 3.0 * F_dr[0] - 2.0 / 3.0 * k * s2 * F_dr[2]
                            + 4.0 * metric_euler / (3.0 * k) * r_dr
                            + rprime_dr / k * theta_dc)
        dFd = dFd.at[2].set(8.0 / 15.0 * (0.75 * k * F_dr[1] + metric_shear * r_dr)
                            - 3.0 / 5.0 * k * s_l3 / s_l2 * F_dr[3])
        dFd = dFd.at[3].set(k / 7.0 * (3.0 * s_l3 * s_l2 * F_dr[2]
                                       - 4.0 * s_of_l(4.0) * F_dr[4]))
        dFd_last = k * (s_of_l(float(lmax_dr)) * F_dr[-2]
                        - (1.0 + lmax_dr) * cotKgen * F_dr[-1])
        dFd = dFd.at[-1].set(dFd_last)
        dy = jax.lax.dynamic_update_slice(dy, dFd, (idx.F_dr,))

    # decaying ncdm -> dr hierarchies (perturb_derivs :8359-8520): each decay
    # species feeds its own F_l_dr with the collision term
    # rprime_dr <Psi_l F_l(q/eps)>_w / <1>_w, where the scattering kernel
    # F_l(x) comes from the host-precomputed table (dr_kernel_table)
    if idx.n_dncdm:
        nc_d = ctx.ncdm
        ns_d, nq_d, nl_d = idx.n_ncdm, idx.q_size_ncdm, idx.n_l_ncdm
        n_std_d = ns_d - idx.n_dncdm
        nld = idx.l_max_dr + 1
        stride_d = 1 + 2 * nq_d
        Psi_d = jax.lax.dynamic_slice(
            y, (idx.ncdm,), (idx.n_ncdm_block,)).reshape(ns_d, nq_d, nl_d)
        ld = jnp.arange(0, nld, dtype=y.dtype)
        sl_d2 = s_of_l(ld)
        sl_d2_p1 = s_of_l(ld + 1.0)
        drn_fac = (ctx.H0 / a2) ** 2
        # collision terms enter only for l <= l_max_dr_col (precisions :8498)
        nlc = min(nl_d, nld, idx.l_max_dr_col + 1)
        for j in range(idx.n_dncdm):
            i_sp = n_std_d + j
            base = idx.dec_col0 + j * stride_d
            Fd = jax.lax.dynamic_slice(y, (idx.F_dr_ncdm + j * nld,), (nld,))
            r_drn = bgv[base] / drn_fac
            eps_j = jnp.sqrt(nc_d.q ** 2 + (a * nc_d.x_fac[i_sp]) ** 2)
            W2 = w_eff[i_sp] * nc_d.q ** 2
            sumW2 = jnp.sum(W2)
            # rprime_dr = a^5 Gamma M n / H0^2 (:8370); M n = pref a x
            # sum(w q^2) / a^4 in our normalization
            rprime = (nc_d.gamma[i_sp] * nc_d.x_fac[i_sp] * nc_d.pref[i_sp]
                      * a2 * sumW2 / ctx.H0 ** 2)
            FL = _dr_kernel_eval(nc_d.q / eps_j, nc_d.ker_x, nc_d.ker_G)
            coll = jnp.zeros((nld,), y.dtype)
            coll = jax.lax.dynamic_update_slice(
                coll,
                rprime * jnp.einsum("q,ql,ql->l", W2, Psi_d[i_sp, :, :nlc],
                                    FL[:, :nlc]) / sumW2,
                (0,))
            Fd_m1 = jnp.concatenate([jnp.zeros((1,), y.dtype), Fd[:-1]])
            Fd_p1 = jnp.concatenate([Fd[1:], jnp.zeros((1,), y.dtype)])
            dFd = k / (2.0 * ld + 1.0) * (ld * sl_d2 * Fd_m1
                                          - (ld + 1.0) * sl_d2_p1 * Fd_p1) + coll
            dFd = dFd.at[0].set(-k * Fd[1]
                                - 4.0 / 3.0 * metric_continuity * r_drn
                                + coll[0])
            dFd = dFd.at[1].set(k / 3.0 * Fd[0] - 2.0 / 3.0 * k * s2 * Fd[2]
                                + 4.0 * metric_euler / (3.0 * k) * r_drn
                                + coll[1])
            dFd = dFd.at[2].set(8.0 / 15.0 * (0.75 * k * Fd[1]
                                              + metric_shear * r_drn)
                                - 3.0 / 5.0 * k * s_l3 / s_l2 * Fd[3]
                                + coll[2])
            dFd_last = k * (s_of_l(float(idx.l_max_dr)) * Fd[-2]
                            - (1.0 + idx.l_max_dr) * cotKgen * Fd[-1])                 + coll[-1]
            dFd = dFd.at[-1].set(dFd_last)
            dy = jax.lax.dynamic_update_slice(dy, dFd,
                                              (idx.F_dr_ncdm + j * nld,))

    # interacting dark matter + dark radiation (perturb_derivs :8252-8268 +
    # :8572-8612). The stiff dmu couplings are handled IMPLICITLY by the IMEX
    # evolver (stiff_apply/stiff_solve below) instead of the reference's
    # tca_idm_dr approximation, so the explicit part here carries only the
    # non-scattering terms.
    if idx.has_idm_dr:
        dy = dy.at[idx.delta_idm_dr].set(-(theta_idm + metric_continuity))
        dy = dy.at[idx.theta_idm_dr_pt].set(
            -aH * theta_idm + metric_euler + k2 * cidm2 * delta_idm)
        dy = dy.at[idx.delta_idr].set(-4.0 / 3.0 * (theta_idr_v + metric_continuity))
        if idx.idr_fluid:
            dy = dy.at[idx.theta_idr].set(k2 / 4.0 * delta_idr_v + metric_euler)
        else:
            dy = dy.at[idx.theta_idr].set(
                k2 * (delta_idr_v / 4.0 - s2 * shear_idr_v) + metric_euler)
            F_idr_v = jax.lax.dynamic_slice(y, (idx.F_idr,), (idx.n_F_idr,))
            dy = dy.at[idx.shear_idr].set(
                0.5 * (8.0 / 15.0 * (theta_idr_v + metric_shear)
                       - 3.0 / 5.0 * k * s_l3 / s_l2 * F_idr_v[0]))
            li = jnp.arange(3, idx.l_max_idr + 1, dtype=y.dtype)
            sl_i = s_of_l(li)
            sl_i1 = s_of_l(li + 1.0)
            Fm1 = jnp.concatenate([jnp.zeros((1,), y.dtype), F_idr_v[:-1]])
            Fp1 = jnp.concatenate([F_idr_v[1:], jnp.zeros((1,), y.dtype)])
            dFi = k / (2.0 * li + 1.0) * (li * sl_i * Fm1 - (li + 1.0) * sl_i1 * Fp1)
            dFi = dFi.at[0].set(k / 7.0 * (6.0 * s_l3 * s_l2 * shear_idr_v
                                           - 4.0 * s_of_l(4.0) * F_idr_v[1]))
            dFi = dFi.at[-1].set(k * (s_of_l(float(idx.l_max_idr)) * F_idr_v[-2]
                                      - (1.0 + idx.l_max_idr) * cotKgen * F_idr_v[-1]))
            dy = jax.lax.dynamic_update_slice(dy, dFi, (idx.F_idr,))

    # scalar field: Klein-Gordon (perturb_derivs :8556-8570)
    if idx.has_scf:
        dy = dy.at[idx.phi_scf_pt].set(dphip_scf)
        dy = dy.at[idx.phi_prime_scf_pt].set(
            -2.0 * aH * dphip_scf - metric_continuity * phip_scf_bg
            - (k2 + a2 * ddV_scf_bg) * dphi_scf)

    # dark-energy fluid (perturb_derivs fld block)
    if idx.has_fld:
        if idx.use_ppf:
            # PPF: single Gamma variable (:8550-8552)
            dy = dy.at[idx.delta_fld].set(Gamma_prime_fld)
        else:
            dy = dy.at[idx.delta_fld].set(
                -(1.0 + w_fld) * (t_fld + metric_continuity)
                - 3.0 * (cs2_fld - w_fld) * aH * d_fld
                - 9.0 * (1.0 + w_fld) * (cs2_fld - ca2_fld) * aH * aH * t_fld / k2)
            dy = dy.at[idx.theta_fld].set(
                -(1.0 - 3.0 * cs2_fld) * aH * t_fld
                + cs2_fld * k2 / (1.0 + w_fld) * d_fld + metric_euler)

    # metric slot: eta' (synchronous) or phi' (newtonian, :8075)
    dy = dy.at[idx.eta].set(eta_prime)

    # --- gauge-invariant matter variables (perturb_einstein :5986-6006).
    # Note the order: the 3aH*theta/k^2 shift uses the synchronous-gauge
    # theta_m; the alpha*k^2 shift applies to the theta_m source afterwards.
    # (in newtonian gauge alpha == 0, so the +k2*alpha shift is a no-op and
    # the cdm velocity enters the gauge sums directly)
    rho_m_cb = rho_b + rho_cdm
    theta_cdm_g = theta_cdm if newt else zero
    theta_cb_gauge = (rho_b * theta_b + rho_cdm * theta_cdm_g) / rho_m_cb
    delta_cb = (rho_b * delta_b + rho_cdm * delta_cdm) / rho_m_cb + 3.0 * aH * theta_cb_gauge / k2
    theta_cb = theta_cb_gauge + k2 * alpha
    if idx.n_ncdm or idx.has_dcdm or idx.has_idm_dr:
        rho_m = rho_m_cb
        rho_plus_p_m = rho_m_cb
        delta_rho_m = rho_b * delta_b + rho_cdm * delta_cdm
        rho_plus_p_theta_m = rho_b * theta_b + rho_cdm * theta_cdm_g
        if idx.n_ncdm:
            rho_m = rho_m + jnp.sum(rho_nc)
            rho_plus_p_m = rho_plus_p_m + jnp.sum(rho_plus_p_nc)
            delta_rho_m = delta_rho_m + jnp.sum(rho_delta_nc)
            rho_plus_p_theta_m = rho_plus_p_theta_m + jnp.sum(rpt_nc)
        if idx.has_dcdm:
            rho_m = rho_m + rho_dcdm
            rho_plus_p_m = rho_plus_p_m + rho_dcdm
            delta_rho_m = delta_rho_m + rho_dcdm * delta_dc
            rho_plus_p_theta_m = rho_plus_p_theta_m + rho_dcdm * theta_dc
        if idx.has_idm_dr:
            rho_m = rho_m + rho_idm
            rho_plus_p_m = rho_plus_p_m + rho_idm
            delta_rho_m = delta_rho_m + rho_idm * delta_idm
            rho_plus_p_theta_m = rho_plus_p_theta_m + rho_idm * theta_idm
        theta_m_gauge = rho_plus_p_theta_m / rho_plus_p_m
        delta_m = delta_rho_m / rho_m + 3.0 * aH * theta_m_gauge / k2
        theta_m = theta_m_gauge + k2 * alpha
    else:
        delta_m = delta_cb
        theta_m = theta_cb

    # polarization source combo P (perturb_sources :6800-6809)
    P = jnp.where(rsa, zero,
                  jnp.where(tca, 5.0 * s_l2 * tca_shear_g / 8.0,
                            (G[0] + G[2] + 2.0 * s_l2 * shear_g) / 8.0))
    delta_g_src = jnp.where(rsa, rsa_delta_g, delta_g)

    # per-species effective values + total density perturbation
    d_ur_eff = jnp.where(rsa, rsa_delta_ur, delta_ur)
    t_ur_eff = jnp.where(rsa, rsa_theta_ur, theta_ur)
    rho_tot = rho_g + rho_b + rho_cdm + rho_ur
    if idx.n_ncdm:
        delta_nc_tot = jnp.sum(rho_delta_nc) / jnp.sum(rho_nc)
        theta_nc_tot = jnp.sum(rpt_nc) / jnp.sum(rho_plus_p_nc)
        rho_tot = rho_tot + jnp.sum(rho_nc)
    else:
        delta_nc_tot = zero
        theta_nc_tot = zero
    if idx.has_fld:
        rho_tot = rho_tot + rho_fld
    if idx.has_dcdm:
        rho_tot = rho_tot + rho_dcdm + rho_dr
    if idx.has_scf:
        rho_tot = rho_tot + bgv[bidx["rho_scf"]]
    if idx.has_idm_dr:
        rho_tot = rho_tot + rho_idm + rho_idr_bg
    delta_tot = delta_rho / rho_tot

    # N-body gauge ingredients (1811.00904): H_T' = 3 aH/(rho+p) (-delta_p
    # + p_tot' theta_tot/k^2 + (rho+p)sigma), Eq. A.5, and the theta_tot/k^2
    # entering the per-species delta shifts, Eq. A.3
    rpp_tot = bgv[bidx["rho_tot"]] + bgv[bidx["p_tot"]]
    theta_tot_v = rho_plus_p_theta / rpp_tot
    theta_over_k2 = theta_tot_v / k2
    H_T_Nb_prime = 3.0 * aH / rpp_tot * (
        -delta_p + bgv[bidx["p_tot_prime"]] * rho_plus_p_theta / (rpp_tot * k2)
        + rho_plus_p_shear)
    w_nc_tot = (jnp.sum(p_nc) / jnp.sum(rho_nc)) if idx.n_ncdm else zero
    rpp_over_rho_ex = rpp_tot / rho_tot

    loc = Locals(
        a=a, aH=aH, app_a=app_a, aH_prime=aH_prime,
        h_prime=h_prime, eta_prime=eta_prime, alpha=alpha, alpha_prime=alpha_prime,
        delta_g_eff=delta_g_src, P=P,
        delta_m=delta_m, theta_m=theta_m, delta_cb=delta_cb, theta_cb=theta_cb,
        theta_b_prime=theta_b_prime, g=g_vis, dg=dg_vis, exp_m_kappa=emk, eta=eta,
        phi=phi, psi=psi, phi_plus_psi=phi_plus_psi, phi_prime=phi_prime,
        theta_g_eff=t_g, delta_ur_eff=d_ur_eff, theta_ur_eff=t_ur_eff,
        delta_nc=delta_nc_tot, theta_nc=theta_nc_tot, delta_tot=delta_tot,
        theta_tot=theta_tot_v, theta_over_k2=theta_over_k2,
        H_T_Nb_prime=H_T_Nb_prime, w_nc_tot=w_nc_tot,
        rpp_over_rho_ex=rpp_over_rho_ex,
    )
    return dy, loc


def rhs(tau, y, ctx: PertCtx):
    return rhs_full(tau, y, ctx)[0]


# --- stiff (Thomson-drag) split for the IMEX evolver -------------------------
# The perturbation ODE is linear, y' = A(tau) y, and the ONLY stiff entries of
# A are the Thomson terms proportional to kappa' (reference perturb_derivs,
# perturbations_module.cpp:7861+). Their sub-matrix is diagonal over the
# photon hierarchies plus two tiny couplings:
#   * {shear_g, G0, G2} through P0 = (G0 + G2 + 2 shear)/8:
#       J3 = kap * (-I + u v^T), u = (0.05, 0.5, 0.1), v = (2, 1, 1)
#     so (I - gh J3)^-1 is a Sherman-Morrison closed form;
#   * {theta_g, theta_b}: J2 = kap * [[-1, 1], [R, -R]], 2x2 closed form.
# Everything else (k^2 oscillation terms, metric, ncdm, fld) stays explicit —
# those are accuracy-limited, not stability-limited. Under TCA and RSA the
# kappa' terms are masked out of the RHS, so the stiff mask is ~(tca|rsa).

_SM_U = (0.05, 0.5, 0.1)   # rows: shear_g, G0, G2 (P0-coupling strengths /8)
_SM_V = (2.0, 1.0, 1.0)    # P0 composition: 2*shear + G0 + G2
_SM_VU = 0.7               # v.u


def _stiff_kappa(tau, y_dtype, ctx: PertCtx):
    """(kap_masked, R): Thomson rate with the TCA/RSA mask applied, and the
    baryon-photon momentum ratio R = 4 rho_g / (3 rho_b)."""
    lntau = jnp.log(jnp.asarray(tau, y_dtype))
    thv = ctx.th_spline.eval(lntau)
    bgv = ctx.bg_spline.eval(lntau)
    kap = thv[ThIdx.ix["dkappa"]]
    R = 4.0 / 3.0 * bgv[ctx.bidx["rho_g"]] / bgv[ctx.bidx["rho_b"]]
    on = ~(ctx.tca_on | ctx.rsa_on)
    return jnp.where(on, kap, jnp.zeros_like(kap)), R


# ETHOS per-l angular coefficients for the l>=2 idr damping come from
# idx.idr_damping_coeffs() (alpha_idm_dr/beta_idr input lists; reference
# default all 1.5, input_module.cpp:1007).


def _stiff_idm(tau, y_dtype, ctx: PertCtx):
    """(dmu_idm, dmu_idr, Sinv) for the implicit idm_dr scattering terms."""
    lntau = jnp.log(jnp.asarray(tau, y_dtype))
    thv = ctx.th_spline.eval(lntau)
    bgv = ctx.bg_spline.eval(lntau)
    dmu = thv[ThIdx.ix["dmu_idm_dr"]]
    dmu_idr = thv[ThIdx.ix["dmu_idr"]]
    Sinv = 4.0 * bgv[ctx.bidx["rho_idr"]] / (3.0 * bgv[ctx.bidx["rho_idm_dr"]])
    return dmu, dmu_idr, Sinv


def _s_l2(ctx, dtype):
    k2 = ctx.k * ctx.k
    return jnp.sqrt(jnp.maximum(jnp.asarray(1.0 - 3.0 * ctx.K / k2, dtype), 0.0))


def stiff_apply(tau, y, ctx: PertCtx):
    """J_s(tau) · y — exactly the kappa'-proportional terms of rhs()."""
    idx = ctx.idx
    kap, R = _stiff_kappa(tau, y.dtype, ctx)
    sl2 = _s_l2(ctx, y.dtype)
    theta_g = y[idx.theta_g]
    theta_b = y[idx.theta_b]
    shear_g = y[idx.shear_g]
    F_g = jax.lax.dynamic_slice(y, (idx.F_g,), (idx.n_F_g,))
    G = jax.lax.dynamic_slice(y, (idx.G_g,), (idx.n_G_g,))
    P0 = (G[0] + G[2] + 2.0 * sl2 * shear_g) / 8.0

    out = jnp.zeros_like(y)
    out = out.at[idx.theta_g].set(kap * (theta_b - theta_g))
    out = out.at[idx.theta_b].set(R * kap * (theta_g - theta_b))
    out = out.at[idx.shear_g].set(kap * (0.4 / sl2 * P0 - shear_g))
    out = jax.lax.dynamic_update_slice(out, -kap * F_g, (idx.F_g,))
    outG = -kap * G
    outG = outG.at[0].add(kap * 4.0 * P0)
    outG = outG.at[2].add(kap * 0.8 * P0)
    out = jax.lax.dynamic_update_slice(out, outG, (idx.G_g,))
    if idx.has_idm_dr:
        # idm_dr <-> idr scattering, treated implicitly instead of the
        # reference's tca_idm_dr approximation (perturb :8260, :8585, :8593)
        dmu, dmu_idr, Sinv = _stiff_idm(tau, y.dtype, ctx)
        th_idm = y[idx.theta_idm_dr_pt]
        th_idr = y[idx.theta_idr]
        out = out.at[idx.theta_idm_dr_pt].set(Sinv * dmu * (th_idr - th_idm))
        out = out.at[idx.theta_idr].set(dmu * (th_idm - th_idr))
        if not idx.idr_fluid:
            al, be = idx.idr_damping_coeffs()
            al = jnp.asarray(al, y.dtype)
            be = jnp.asarray(be, y.dtype)
            damp = al * dmu + be * dmu_idr   # per-l, l = 2..l_max_idr
            out = out.at[idx.shear_idr].set(-damp[0] * y[idx.shear_idr])
            F_i = jax.lax.dynamic_slice(y, (idx.F_idr,), (idx.n_F_idr,))
            out = jax.lax.dynamic_update_slice(out, -damp[1:] * F_i, (idx.F_idr,))
    return out


def stiff_solve(tau, gh, r, ctx: PertCtx):
    """x = (I - gh·J_s(tau))^{-1} r, closed form (no LU)."""
    idx = ctx.idx
    kap, R = _stiff_kappa(tau, r.dtype, ctx)
    a = jnp.asarray(gh, r.dtype) * kap

    # diagonal part: hierarchy slots relax as 1/(1+a)
    x = r
    F_r = jax.lax.dynamic_slice(r, (idx.F_g,), (idx.n_F_g,))
    G_r = jax.lax.dynamic_slice(r, (idx.G_g,), (idx.n_G_g,))
    x = jax.lax.dynamic_update_slice(x, F_r / (1.0 + a), (idx.F_g,))
    x = jax.lax.dynamic_update_slice(x, G_r / (1.0 + a), (idx.G_g,))

    # 3x3 {shear_g, G0, G2}: M = (1+a) I - a u v^T (Sherman-Morrison);
    # curvature: u = (0.05/s_l2, 0.5, 0.1), v = (2 s_l2, 1, 1), v.u = 0.7
    sl2 = _s_l2(ctx, r.dtype)
    r3 = jnp.stack([r[idx.shear_g], G_r[0], G_r[2]])
    u = jnp.asarray(_SM_U, r.dtype).at[0].divide(sl2)
    vr = 2.0 * sl2 * r3[0] + r3[1] + r3[2]
    x3 = r3 / (1.0 + a) + a * u * vr / ((1.0 + a) * (1.0 + (1.0 - _SM_VU) * a))
    x = x.at[idx.shear_g].set(x3[0])
    x = x.at[idx.G_g + 0].set(x3[1])
    x = x.at[idx.G_g + 2].set(x3[2])

    # 2x2 {theta_g, theta_b}: det = 1 + a (1 + R)
    det = 1.0 + a * (1.0 + R)
    r_g, r_b = r[idx.theta_g], r[idx.theta_b]
    x = x.at[idx.theta_g].set(((1.0 + a * R) * r_g + a * r_b) / det)
    x = x.at[idx.theta_b].set((a * R * r_g + (1.0 + a) * r_b) / det)
    if idx.has_idm_dr:
        dmu, dmu_idr, Sinv = _stiff_idm(tau, r.dtype, ctx)
        b = jnp.asarray(gh, r.dtype) * dmu
        # 2x2 {theta_idr, theta_idm}: M = [[1+b, -b], [-b S, 1+b S]],
        # det = 1 + b(1 + S)
        det_i = 1.0 + b * (1.0 + Sinv)
        r_r, r_m = r[idx.theta_idr], r[idx.theta_idm_dr_pt]
        x = x.at[idx.theta_idr].set(((1.0 + b * Sinv) * r_r + b * r_m) / det_i)
        x = x.at[idx.theta_idm_dr_pt].set((b * Sinv * r_r + (1.0 + b) * r_m) / det_i)
        if not idx.idr_fluid:
            al, be = idx.idr_damping_coeffs()
            al = jnp.asarray(al, r.dtype)
            be = jnp.asarray(be, r.dtype)
            ad = jnp.asarray(gh, r.dtype) * (al * dmu + be * dmu_idr)
            x = x.at[idx.shear_idr].set(r[idx.shear_idr] / (1.0 + ad[0]))
            F_r = jax.lax.dynamic_slice(r, (idx.F_idr,), (idx.n_F_idr,))
            x = jax.lax.dynamic_update_slice(x, F_r / (1.0 + ad[1:]), (idx.F_idr,))
    return x


# ---------------------------------------------------------------------------


def adiabatic_ic(k, tau, ctx: PertCtx, curvature_ini=1.0):
    """Adiabatic initial conditions, synchronous gauge
    (perturb_initial_conditions :4825-4935, curvature factors s2)."""
    tau = jnp.asarray(tau, jnp.result_type(k))
    idx = ctx.idx
    bidx = ctx.bidx
    bgv = ctx.bg_spline.eval(jnp.log(tau))
    a = bgv[bidx["a"]]
    rho_g = bgv[bidx["rho_g"]]
    rho_b = bgv[bidx["rho_b"]]
    rho_cdm = bgv[bidx["rho_cdm"]]
    rho_ur = bgv[bidx["rho_ur"]]

    rho_r = rho_g + rho_ur
    rho_m = rho_b + rho_cdm
    rho_nu = rho_ur
    if idx.has_idm_dr:
        rho_idm_i = bgv[bidx["rho_idm_dr"]]
        rho_idr_i = bgv[bidx["rho_idr"]]
        rho_m = rho_m + rho_idm_i
        rho_r = rho_r + rho_idr_i
        rho_nu = rho_nu + rho_idr_i
    if idx.has_dcdm:
        rho_dcdm_i = bgv[bidx["rho_dcdm"]]
        rho_dr_i = bgv[bidx["rho_dr"]]
        rho_m = rho_m + rho_dcdm_i
        rho_r = rho_r + rho_dr_i
        rho_nu = rho_nu + rho_dr_i
    fracnu = rho_nu / rho_r
    fracb = rho_b / rho_m
    om = a * rho_m / jnp.sqrt(rho_r)

    ktau2 = (k * tau) ** 2
    ktau3 = (k * tau) ** 3
    s2 = 1.0 - 3.0 * ctx.K / (k * k)

    delta_g = -ktau2 / 3.0 * (1.0 - om * tau / 5.0) * curvature_ini * s2
    theta_g = -k * ktau3 / 36.0 * (1.0 - 3.0 * (1.0 + 5.0 * fracb - fracnu)
                                   / 20.0 / (1.0 - fracnu) * om * tau) * curvature_ini * s2
    delta_ur = delta_g
    theta_ur = -k * ktau3 / 36.0 / (4.0 * fracnu + 15.0) * (
        4.0 * fracnu + 11.0 + 12.0 * s2
        - 3.0 * (8.0 * fracnu * fracnu + 50.0 * fracnu + 275.0) / 20.0 / (2.0 * fracnu + 15.0) * tau * om
    ) * curvature_ini * s2
    shear_ur = ktau2 / (45.0 + 12.0 * fracnu) * (3.0 * s2 - 1.0) * (
        1.0 + (4.0 * fracnu - 5.0) / 4.0 / (2.0 * fracnu + 15.0) * tau * om) * curvature_ini
    l3_ur = ktau3 * 2.0 / 7.0 / (12.0 * fracnu + 45.0) * curvature_ini
    # deviation from curvature_ini computed directly (never form 1 - small),
    # then shifted by the lane's eta_off (see PertCtx.eta_off)
    eta_hat = -curvature_ini * ktau2 / 12.0 / (15.0 + 4.0 * fracnu) * (
        5.0 + 4.0 * s2 * fracnu
        - (16.0 * fracnu**2 + 280.0 * fracnu + 325.0) / 10.0 / (2.0 * fracnu + 15.0) * tau * om)
    eta_hat = eta_hat + (curvature_ini - ctx.eta_off)

    y = jnp.zeros((idx.size,), jnp.result_type(k))
    y = y.at[idx.delta_g].set(delta_g)
    y = y.at[idx.theta_g].set(theta_g)
    y = y.at[idx.delta_b].set(0.75 * delta_g)
    y = y.at[idx.theta_b].set(theta_g)
    y = y.at[idx.delta_cdm].set(0.75 * delta_g)
    if idx.has_idm_dr:
        # idm_dr/idr adiabatic ICs (perturb_initial_conditions :4880, :5214)
        y = y.at[idx.delta_idm_dr].set(0.75 * delta_g)
        y = y.at[idx.theta_idm_dr_pt].set(theta_ur)
        y = y.at[idx.delta_idr].set(delta_ur)
        y = y.at[idx.theta_idr].set(theta_ur)
        if not idx.idr_fluid:
            y = y.at[idx.shear_idr].set(shear_ur)
            y = y.at[idx.F_idr].set(l3_ur)
    if idx.has_dcdm:
        # dcdm density like cdm; dr seeded from the ur values weighted by
        # r_dr (perturb_initial_conditions :5255-5267)
        y = y.at[idx.delta_dcdm].set(0.75 * delta_g)
        a_bg = bgv[bidx["a"]]
        r_dr_i = rho_dr_i * (a_bg * a_bg / ctx.H0) ** 2
        y = y.at[idx.F_dr + 0].set(delta_ur * r_dr_i)
        y = y.at[idx.F_dr + 1].set(4.0 / (3.0 * k) * theta_ur * r_dr_i)
    y = y.at[idx.delta_ur].set(delta_ur)
    y = y.at[idx.theta_ur].set(theta_ur)
    y = y.at[idx.shear_ur].set(shear_ur)
    y = y.at[idx.F_ur].set(l3_ur)
    y = y.at[idx.eta].set(eta_hat)
    if idx.has_fld and not idx.use_ppf:
        # from 1004.5509 (perturb_initial_conditions :4895-4900); under PPF
        # the single Gamma variable starts at zero
        w0 = ctx.bg_spline.eval(jnp.log(tau))[ctx.bidx["w_fld"]]
        cs2 = ctx.cs2_fld
        y = y.at[idx.delta_fld].set(-ktau2 / 4.0 * (1.0 + w0) * (4.0 - 3.0 * cs2)
                                    / (4.0 - 6.0 * w0 + 3.0 * cs2) * curvature_ini * s2)
        y = y.at[idx.theta_fld].set(-k * ktau3 / 4.0 * cs2
                                    / (4.0 - 6.0 * w0 + 3.0 * cs2) * curvature_ini * s2)
    if idx.n_ncdm:
        # relativistic ncdm ICs (perturb_initial_conditions :5249-5252):
        # Psi_l = (ur multipole) * coefficient * dlnf0/dlnq
        nc = ctx.ncdm
        ns, nq, nl = idx.n_ncdm, idx.q_size_ncdm, idx.n_l_ncdm
        eps = jnp.sqrt(nc.q[None, :] ** 2 + (a * nc.x_fac[:, None]) ** 2)
        dl0 = nc.dlnf0
        Psi = jnp.zeros((ns, nq, nl), y.dtype)
        Psi = Psi.at[:, :, 0].set(-0.25 * delta_ur * dl0)
        Psi = Psi.at[:, :, 1].set(-eps / (3.0 * nc.q[None, :] * k) * theta_ur * dl0)
        Psi = Psi.at[:, :, 2].set(-0.5 * shear_ur * dl0)
        Psi = Psi.at[:, :, 3].set(-0.25 * l3_ur * dl0)
        y = jax.lax.dynamic_update_slice(y, Psi.reshape(-1), (idx.ncdm,))
    return y


def isocurvature_ic(kind, k, tau, ctx: PertCtx, entropy_ini=1.0):
    """Isocurvature initial conditions (Bucher-Moodley-Turok 99 conventions;
    reference perturb_initial_conditions :4946-5085): kind in
    {"cdi", "bi", "nid", "niv"}. Flat case."""
    tau = jnp.asarray(tau, jnp.result_type(k))
    idx = ctx.idx
    bidx = ctx.bidx
    bgv = ctx.bg_spline.eval(jnp.log(tau))
    a = bgv[bidx["a"]]
    rho_g = bgv[bidx["rho_g"]]
    rho_b = bgv[bidx["rho_b"]]
    rho_cdm = bgv[bidx["rho_cdm"]]
    rho_ur = bgv[bidx["rho_ur"]]
    if idx.n_ncdm:
        for i in range(idx.n_ncdm):
            rho_ur = rho_ur + bgv[bidx[f"rho_ncdm{i}"]]
    rho_r = rho_g + rho_ur
    rho_m = rho_b + rho_cdm
    fracnu = rho_ur / rho_r
    fracg = rho_g / rho_r
    fracb = rho_b / rho_m
    fraccdm = 1.0 - fracb
    om = a * rho_m / jnp.sqrt(rho_r)
    kt = k * tau
    kt2 = kt * kt
    e = entropy_ini

    zero = jnp.zeros(())
    dg = tg = db = tb = dc = dur = tur = sur = eta = zero

    if kind == "cdi":
        dg = e * fraccdm * om * tau * (-2.0 / 3.0 + om * tau / 4.0)
        tg = -e * fraccdm * om * kt2 / 12.0
        db = 0.75 * dg
        tb = tg
        dc = e + 0.75 * dg
        dur = dg
        tur = tg
        sur = -e * fraccdm * kt2 * tau * om / 6.0 / (2.0 * fracnu + 15.0)
        eta = -e * fraccdm * om * tau * (1.0 / 6.0 - om * tau / 16.0)
    elif kind == "bi":
        dg = e * fracb * om * tau * (-2.0 / 3.0 + om * tau / 4.0)
        tg = -e * fracb * om * kt2 / 12.0
        db = e + 0.75 * dg
        tb = tg
        dc = 0.75 * dg
        dur = dg
        tur = tg
        sur = -e * fracb * kt2 * tau * om / 6.0 / (2.0 * fracnu + 15.0)
        eta = -e * fracb * om * tau * (1.0 / 6.0 - om * tau / 16.0)
    elif kind == "nid":
        dg = e * fracnu / fracg * (-1.0 + kt2 / 6.0)
        tg = -e * fracnu / fracg * k * k * tau * (0.25 - fracb / fracg * 3.0 / 16.0 * om * tau)
        db = e * fracnu / fracg / 8.0 * kt2
        tb = tg
        dc = -e * fracnu * fracb / fracg / 80.0 * kt2 * om * tau
        dur = e * (1.0 - kt2 / 6.0)
        tur = e * k * k * tau / 4.0
        sur = e * kt2 / (4.0 * fracnu + 15.0) / 2.0
        eta = -e * fracnu / (4.0 * fracnu + 15.0) / 6.0 * kt2
    elif kind == "niv":
        dg = e * kt * fracnu / fracg * (1.0 - 3.0 / 16.0 * fracb * (2.0 + fracg) / fracg * om * tau)
        tg = e * fracnu / fracg * 0.75 * k * (
            -1.0 + 0.75 * fracb / fracg * om * tau
            + 3.0 / 16.0 * om * om * tau * tau * fracb / fracg / fracg * (fracg - 3.0 * fracb)
            + kt2 / 6.0)
        db = 0.75 * dg
        tb = tg
        dc = -e * 9.0 / 64.0 * fracnu * fracb / fracg * kt * om * tau
        dur = -e * kt * (1.0 + 3.0 / 16.0 * fracb * fracnu / fracg * om * tau)
        tur = e * 0.75 * k * (1.0 - kt2 / 6.0 * (4.0 * fracnu + 9.0) / (4.0 * fracnu + 5.0))
        sur = e / (4.0 * fracnu + 15.0) * kt * (1.0 + 3.0 * om * tau * fracnu / (4.0 * fracnu + 15.0))
        eta = e * fracnu * kt * (-1.0 / (4.0 * fracnu + 5.0)
                                 + (-3.0 / 64.0 * fracb / fracg
                                    + 15.0 / 4.0 / (4.0 * fracnu + 15.0) / (4.0 * fracnu + 5.0) * om * tau))
    else:
        raise ValueError(f"unknown isocurvature kind {kind!r}")

    y = jnp.zeros((idx.size,), jnp.result_type(k))
    y = y.at[idx.delta_g].set(dg)
    y = y.at[idx.theta_g].set(tg)
    y = y.at[idx.delta_b].set(db)
    y = y.at[idx.theta_b].set(tb)
    y = y.at[idx.delta_cdm].set(dc)
    y = y.at[idx.delta_ur].set(dur)
    y = y.at[idx.theta_ur].set(tur)
    y = y.at[idx.shear_ur].set(sur)
    y = y.at[idx.eta].set(eta)
    if idx.n_ncdm:
        nc = ctx.ncdm
        ns, nq, nl = idx.n_ncdm, idx.q_size_ncdm, idx.n_l_ncdm
        eps = jnp.sqrt(nc.q[None, :] ** 2 + (a * nc.x_fac[:, None]) ** 2)
        dl0 = nc.dlnf0
        Psi = jnp.zeros((ns, nq, nl), y.dtype)
        Psi = Psi.at[:, :, 0].set(-0.25 * dur * dl0)
        Psi = Psi.at[:, :, 1].set(-eps / (3.0 * nc.q[None, :] * k) * tur * dl0)
        Psi = Psi.at[:, :, 2].set(-0.5 * sur * dl0)
        y = jax.lax.dynamic_update_slice(y, Psi.reshape(-1), (idx.ncdm,))
    return y


def _ic_to_newtonian(y, k, tau, ctx: PertCtx):
    """Gauge-transform synchronous-gauge initial conditions to newtonian
    (perturb_initial_conditions :5095-5250): build alpha = (h'+6 eta')/2k^2
    from the first two Einstein equations, then shift every species."""
    idx = ctx.idx
    bidx = ctx.bidx
    tau = jnp.asarray(tau, y.dtype)
    bgv = ctx.bg_spline.eval(jnp.log(tau))
    a = bgv[bidx["a"]]
    aH = a * bgv[bidx["H"]]
    rho_g = bgv[bidx["rho_g"]]
    rho_b = bgv[bidx["rho_b"]]
    rho_cdm = bgv[bidx["rho_cdm"]]
    rho_ur = bgv[bidx["rho_ur"]]
    for i in range(idx.n_ncdm):
        rho_ur = rho_ur + bgv[bidx[f"rho_ncdm{i}"]]   # still relativistic here
    k2 = k * k
    rho_r = rho_g + rho_ur
    rho_m = rho_b + rho_cdm
    fracg = rho_g / rho_r
    fracnu = rho_ur / rho_r
    fracb = rho_b / rho_m
    fraccdm = 1.0 - fracb
    rmr = rho_m / rho_r

    dg, tg = y[idx.delta_g], y[idx.theta_g]
    db, tb = y[idx.delta_b], y[idx.theta_b]
    dc = y[idx.delta_cdm]
    dur, tur = y[idx.delta_ur], y[idx.theta_ur]
    eta = y[idx.eta] + ctx.eta_off

    delta_tot = (fracg * dg + fracnu * dur + rmr * (fracb * db + fraccdm * dc)) / (1.0 + rmr)
    velocity_tot = (4.0 / 3.0 * (fracg * tg + fracnu * tur) + rmr * fracb * tb) / (1.0 + rmr)
    # curvature enters through s2^2 = 1 - 3K/k^2 dividing the bracket
    # (perturb_initial_conditions :5130: 3/2 (a'/a)^2 /k^2 /s2_squared {...})
    s2 = 1.0 - 3.0 * ctx.K / k2
    alpha = (eta + 1.5 * aH * aH / (k2 * s2)
             * (delta_tot + 3.0 * aH / k2 * velocity_tot)) / aH

    y = y.at[idx.eta].set(eta - aH * alpha)           # slot now holds phi
    y = y.at[idx.delta_g].add(-4.0 * aH * alpha)
    y = y.at[idx.theta_g].add(k2 * alpha)
    y = y.at[idx.delta_b].add(-3.0 * aH * alpha)
    y = y.at[idx.theta_b].add(k2 * alpha)
    y = y.at[idx.delta_cdm].add(-3.0 * aH * alpha)
    y = y.at[idx.theta_cdm].set(k2 * alpha)
    y = y.at[idx.delta_ur].add(-4.0 * aH * alpha)
    y = y.at[idx.theta_ur].add(k2 * alpha)            # shear, l3 gauge-invariant
    if idx.has_fld and not idx.use_ppf:
        w0 = bgv[bidx["w_fld"]]
        y = y.at[idx.delta_fld].add(3.0 * (1.0 + w0) * aH * alpha)
        y = y.at[idx.theta_fld].add(k2 * alpha)
    if idx.has_idm_dr:
        y = y.at[idx.delta_idm_dr].add(-3.0 * aH * alpha)
        y = y.at[idx.theta_idm_dr_pt].add(k2 * alpha)
        y = y.at[idx.delta_idr].add(-4.0 * aH * alpha)
        y = y.at[idx.theta_idr].add(k2 * alpha)
    if idx.has_scf:
        # scf gauge shift (:5166-5175); alpha' from the shear constraint with
        # the early-time ur shear (photons tightly coupled, zero shear)
        phip_bg = bgv[bidx["phi_prime_scf"]]
        dV_bg = bgv[bidx["dV_scf"]]
        rho_ur_i = bgv[bidx["rho_ur"]]
        shear_sum = 4.0 / 3.0 * rho_ur_i * y[idx.shear_ur]
        alpha_prime = -2.0 * aH * alpha + eta - 4.5 * (a * a / k2) * shear_sum
        y = y.at[idx.phi_scf_pt].add(alpha * phip_bg)
        y = y.at[idx.phi_prime_scf_pt].add(
            -2.0 * aH * alpha * phip_bg - a * a * dV_bg * alpha
            + phip_bg * alpha_prime)
    if idx.has_dcdm:
        # dcdm picks up a decay term in the gauge shift (:5152); the dr seeds
        # are rebuilt from the transformed ur variables with the source
        # correction (:5186, :5260-5261)
        aG = a * ctx.Gamma_dcdm
        rho_dcdm_i = bgv[bidx["rho_dcdm"]]
        rho_dr_i = bgv[bidx["rho_dr"]]
        y = y.at[idx.delta_dcdm].add((-3.0 * aH - aG) * alpha)
        y = y.at[idx.theta_dcdm_pt].set(k2 * alpha)
        r_dr_i = rho_dr_i * (a * a / ctx.H0) ** 2
        delta_dr_shift = (-4.0 * aH + aG * rho_dcdm_i / rho_dr_i) * alpha
        y = y.at[idx.F_dr + 0].add(delta_dr_shift * r_dr_i)
        y = y.at[idx.F_dr + 1].set(4.0 / (3.0 * k) * y[idx.theta_ur] * r_dr_i)
    if idx.n_ncdm:
        # re-seed Psi0/Psi1 from the transformed ur variables (:5246-5252)
        nc = ctx.ncdm
        ns, nq, nl = idx.n_ncdm, idx.q_size_ncdm, idx.n_l_ncdm
        eps = jnp.sqrt(nc.q[None, :] ** 2 + (a * nc.x_fac[:, None]) ** 2)
        dl0 = nc.dlnf0
        Psi = jax.lax.dynamic_slice(y, (idx.ncdm,), (idx.n_ncdm_block,)).reshape(ns, nq, nl)
        Psi = Psi.at[:, :, 0].set(-0.25 * y[idx.delta_ur] * dl0)
        Psi = Psi.at[:, :, 1].set(-eps / (3.0 * nc.q[None, :] * k) * y[idx.theta_ur] * dl0)
        y = jax.lax.dynamic_update_slice(y, Psi.reshape(-1), (idx.ncdm,))
    return y


def initial_conditions(kind, k, tau, ctx: PertCtx):
    """Dispatch over the five supported initial-condition types. ICs are
    constructed in synchronous gauge and transformed when running newtonian."""
    y = adiabatic_ic(k, tau, ctx) if kind == "ad" else isocurvature_ic(kind, k, tau, ctx)
    if ctx.idx.gauge == "newtonian":
        y = _ic_to_newtonian(y, k, tau, ctx)
    return y


def remap_tca_off(y, tau, ctx: PertCtx):
    """State re-initialization when tight coupling switches off
    (perturb_vector_init :3900-3920): fill the photon hierarchy slots from
    their tight-coupling values."""
    tau = jnp.asarray(tau, y.dtype)
    idx = ctx.idx
    ctx_tca = ctx._replace(tca_on=jnp.asarray(True))
    _, loc = rhs_full(tau, y, ctx_tca)
    thv = ctx.th_spline.eval(jnp.log(tau))
    kap = thv[ThIdx.ix["dkappa"]]
    k = ctx.k
    # recompute tca shear at switch time; curvature factors per
    # perturb_vector_init :3905-3917
    K = ctx.K
    k2 = k * k
    s_l2 = jnp.sqrt(jnp.maximum(1.0 - 3.0 * K / k2, 0.0))
    s_l3 = jnp.sqrt(jnp.maximum(1.0 - 8.0 * K / k2, 0.0))
    shear_g = 8.0 / 5.0 * loc.P / s_l2  # P = 5 s_l2 shear/8 under TCA
    y = y.at[idx.shear_g].set(shear_g)
    y = y.at[idx.F_g].set(6.0 / 7.0 * k / kap * s_l3 * shear_g)          # l=3
    y = y.at[idx.G_g + 0].set(2.5 * shear_g)
    y = y.at[idx.G_g + 1].set(k / kap * (5.0 - 2.0 * s_l2) / 6.0 * shear_g)
    y = y.at[idx.G_g + 2].set(0.5 * shear_g)
    y = y.at[idx.G_g + 3].set(k / kap * 3.0 * s_l3 / 14.0 * shear_g)
    return y


def remap_ufa_on(y, ctx: PertCtx):
    """Drop the ur hierarchy above l=2 when the fluid approximation starts
    (perturb_vector_init, ufa branch)."""
    idx = ctx.idx
    return jax.lax.dynamic_update_slice(
        y, jnp.zeros((idx.n_F_ur,), y.dtype), (idx.F_ur,))


def remap_ncdmfa_on(y, tau, ctx: PertCtx):
    """Collapse each ncdm phase-space block to its fluid moments when the
    fluid approximation switches on (perturb_vector_init :4485-4517)."""
    tau = jnp.asarray(tau, y.dtype)
    idx = ctx.idx
    nc = ctx.ncdm
    ns, nq, nl = idx.n_ncdm, idx.q_size_ncdm, idx.n_l_ncdm
    bgv = ctx.bg_spline.eval(jnp.log(tau))
    a = bgv[ctx.bidx["a"]]
    Psi = jax.lax.dynamic_slice(y, (idx.ncdm,), (idx.n_ncdm_block,)).reshape(ns, nq, nl)
    eps = jnp.sqrt(nc.q[None, :] ** 2 + (a * nc.x_fac[:, None]) ** 2)
    fac = nc.pref / a**4
    qw = nc.w * nc.q[None, :] ** 2                                # (ns, nq)
    rho_nc = jnp.stack([bgv[ctx.bidx[f"rho_ncdm{i}"]] for i in range(ns)])
    p_nc = jnp.stack([bgv[ctx.bidx[f"p_ncdm{i}"]] for i in range(ns)])
    k = ctx.k
    delta = fac * jnp.sum(qw * eps * Psi[:, :, 0], axis=1) / rho_nc
    theta = k * fac * jnp.sum(qw * nc.q[None, :] * Psi[:, :, 1], axis=1) / (rho_nc + p_nc)
    shear = 2.0 / 3.0 * fac * jnp.sum(qw * nc.q[None, :] ** 2 / eps * Psi[:, :, 2], axis=1) / (rho_nc + p_nc)
    Psi_new = jnp.zeros((ns, nq, nl), y.dtype)
    Psi_new = Psi_new.at[:, 0, 0].set(delta)
    Psi_new = Psi_new.at[:, 0, 1].set(theta)
    Psi_new = Psi_new.at[:, 0, 2].set(shear)
    return jax.lax.dynamic_update_slice(y, Psi_new.reshape(-1), (idx.ncdm,))


def remap_rsa_on(y, ctx: PertCtx):
    """Zero all radiation slots when free streaming starts; their values are
    algebraic from then on (perturb_vector_init, rsa branch)."""
    idx = ctx.idx
    y = y.at[idx.delta_g].set(0.0)
    y = y.at[idx.theta_g].set(0.0)
    y = y.at[idx.shear_g].set(0.0)
    y = jax.lax.dynamic_update_slice(y, jnp.zeros((idx.n_F_g,), y.dtype), (idx.F_g,))
    y = jax.lax.dynamic_update_slice(y, jnp.zeros((idx.n_G_g,), y.dtype), (idx.G_g,))
    y = y.at[idx.delta_ur].set(0.0)
    y = y.at[idx.theta_ur].set(0.0)
    y = y.at[idx.shear_ur].set(0.0)
    y = jax.lax.dynamic_update_slice(y, jnp.zeros((idx.n_F_ur,), y.dtype), (idx.F_ur,))
    return y


# ---------------------------------------------------------------------------


def compute_sources(tau, y, ctx: PertCtx):
    """All source functions at (k, tau) — reference perturb_sources (:6830-7010),
    synchronous gauge 'efficient' form. Returns (SrcIdx.n,) vector."""
    tau = jnp.asarray(tau, y.dtype)
    k = ctx.k
    k2 = k * k
    dy, L = rhs_full(tau, y, ctx)
    idx = ctx.idx

    g = L.g
    dg = L.dg
    emk = L.exp_m_kappa

    # temperature-contribution switches (perturb_sources :6826-6895):
    # s_sw/s_dop/s_pol gate the Sachs-Wolfe, Doppler and polarization terms;
    # the ISW term splits into early/late at z = split_z
    if ctx.tswitch is None:
        s_sw = s_dop = s_pol = s_isw = 1.0
    else:
        ts = ctx.tswitch
        s_sw, s_dop, s_pol = ts[0], ts[3], ts[4]
        z_here = 1.0 / L.a - 1.0
        s_isw = jnp.where(z_here >= ts[5], ts[1], ts[2])

    if ctx.idx.gauge == "newtonian":
        # perturb_sources :6848-6860 (newtonian efficient form)
        t0 = (s_sw * g * (L.delta_g_eff / 4.0 + L.psi)
              + s_isw * (g * (L.phi - L.psi) + emk * 2.0 * L.phi_prime)
              + s_dop * (g * L.theta_b_prime + dg * y[idx.theta_b]) / k2)
        t1 = s_isw * emk * k * (L.psi - L.phi)
    else:
        # perturb_sources :6874-6895 (synchronous efficient form)
        t0 = (s_sw * g * (L.delta_g_eff / 4.0 + L.alpha_prime)
              + s_isw * (g * (L.eta - L.alpha_prime - 2.0 * L.aH * L.alpha)
                         + emk * 2.0 * (L.eta_prime - L.aH_prime * L.alpha
                                        - L.aH * L.alpha_prime))
              + s_dop * (g * (L.theta_b_prime / k2 + L.alpha_prime)
                         + dg * (y[idx.theta_b] / k2 + L.alpha)))
        t1 = s_isw * emk * k * (L.alpha_prime + 2.0 * L.aH * L.alpha - L.eta)
    t2 = s_pol * g * L.P
    p = jnp.sqrt(6.0) * g * L.P

    phi = L.phi
    psi = L.psi
    phi_plus_psi = L.phi_plus_psi
    phi_prime = L.phi_prime

    out = jnp.zeros((SrcIdx.n,), y.dtype)
    six = SrcIdx.ix
    out = out.at[six["t0"]].set(t0)
    out = out.at[six["t1"]].set(t1)
    out = out.at[six["t2"]].set(t2)
    out = out.at[six["p"]].set(p)
    out = out.at[six["phi"]].set(phi)
    out = out.at[six["psi"]].set(psi)
    out = out.at[six["phi_plus_psi"]].set(phi_plus_psi)
    out = out.at[six["phi_prime"]].set(phi_prime)
    out = out.at[six["delta_m"]].set(L.delta_m)
    out = out.at[six["theta_m"]].set(L.theta_m)
    out = out.at[six["delta_cb"]].set(L.delta_cb)
    out = out.at[six["theta_cb"]].set(L.theta_cb)
    out = out.at[six["h_prime"]].set(L.h_prime)
    out = out.at[six["eta_src"]].set(L.eta)
    # per-species transfer functions (perturb_output_data class format,
    # perturbations_module.cpp:2797+): effective (approximation-aware) values
    out = out.at[six["delta_g"]].set(L.delta_g_eff)
    out = out.at[six["theta_g"]].set(L.theta_g_eff)
    out = out.at[six["delta_b"]].set(y[idx.delta_b])
    out = out.at[six["theta_b"]].set(y[idx.theta_b])
    out = out.at[six["delta_cdm"]].set(y[idx.delta_cdm])
    theta_cdm_v = y[idx.theta_cdm] if idx.gauge == "newtonian" else jnp.zeros_like(t0)
    out = out.at[six["theta_cdm"]].set(theta_cdm_v)
    out = out.at[six["delta_ur"]].set(L.delta_ur_eff)
    out = out.at[six["theta_ur"]].set(L.theta_ur_eff)
    out = out.at[six["delta_ncdm"]].set(L.delta_nc)
    out = out.at[six["theta_ncdm"]].set(L.theta_nc)
    out = out.at[six["delta_tot"]].set(L.delta_tot)
    out = out.at[six["H_T_Nb_prime"]].set(L.H_T_Nb_prime)
    out = out.at[six["theta_tot"]].set(L.theta_tot)
    if idx.nbody:
        # N-body gauge shifts (1811.00904 Eq. A.3): delta_i += 3(1+w_i)
        # aH theta_tot/k^2, theta_i += H_T' (+ k^2 alpha in synchronous)
        aHt = L.aH * L.theta_over_k2
        shift_t = L.H_T_Nb_prime + (k2 * L.alpha
                                    if idx.gauge == "synchronous" else 0.0)
        for col, w_i in [("delta_g", 1.0 / 3.0), ("delta_ur", 1.0 / 3.0),
                         ("delta_b", 0.0), ("delta_cdm", 0.0)]:
            out = out.at[six[col]].add(3.0 * (1.0 + w_i) * aHt)
        if idx.n_ncdm:
            out = out.at[six["delta_ncdm"]].add(3.0 * (1.0 + L.w_nc_tot) * aHt)
        # delta_tot shift: (rho+p)_tot / rho_tot-excl-Lambda, NOT (1+w_tot)
        # with the inclusive rho — see the Locals.rpp_over_rho_ex docstring
        out = out.at[six["delta_tot"]].add(3.0 * L.rpp_over_rho_ex * aHt)
        for col in ["theta_g", "theta_b", "theta_cdm", "theta_ur",
                    "theta_ncdm", "theta_tot"]:
            out = out.at[six[col]].add(shift_t)
    return out
