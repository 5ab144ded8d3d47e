"""Background cosmology (L3).

TPU-native rebuild of the reference BackgroundModule
(source/background_module.cpp): instead of an adaptive ODE solve into a
growing table (background_solve, :1027), every density is evaluated
*algebraically* on a fixed uniform ln(a) grid — for LambdaCDM + ur + ncdm +
CLP fluid all rho(a) have closed forms (ncdm via fixed-grid momentum
quadrature) — and the time-like integrals (tau, t, rs) are exact cumulative
spline integrals on that grid. The growth factor D is the only true ODE
(background_module.cpp:1975-1983) and runs as an RK4 lax.scan.

Runtime queries (`background_at_tau`, reference :125) are served by a
uniform-in-ln(tau) respline => O(1) arithmetic lookup inside jitted hot loops.

Everything is float64 and jit-compatible; shapes depend only on
PrecisionParams and N_ncdm.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as const
from ..config.params import CosmoParams
from ..config.precision import PrecisionParams
from ..ops import quadrature as quad
from ..ops.splines import UniformSpline, spline_d2, spline_eval, spline_integrate


class BgIdx:
    """Column indices of the background runtime table (analog of index_bg_*,
    source/background_module.h:40-99). Built per-run since ncdm count varies."""

    def __init__(self, n_ncdm: int, has_fld: bool, has_dcdm: bool = False):
        self.key = (n_ncdm, has_fld, has_dcdm)
        names = ["a", "H", "H_prime", "rho_g", "rho_b", "rho_cdm", "rho_lambda", "rho_ur"]
        if has_fld:
            names += ["rho_fld", "w_fld"]
        if has_dcdm:
            names += ["rho_dcdm", "rho_dr"]
        for i in range(n_ncdm):
            names += [f"rho_ncdm{i}", f"p_ncdm{i}", f"pseudo_p_ncdm{i}"]
        names += ["rho_tot", "p_tot", "p_tot_prime", "rho_crit", "Omega_m", "Omega_r",
                  "conf_distance", "ang_distance", "lum_distance", "time", "rs", "D", "f"]
        self.names = names
        self.ix = {n: i for i, n in enumerate(names)}
        self.n = len(names)

    def __getitem__(self, name):
        return self.ix[name]


class BackgroundResult(NamedTuple):
    """All background tables + derived scalars."""

    loga: jnp.ndarray          # (N,) uniform grid of ln(a)
    tau_of_loga: jnp.ndarray   # (N,)
    table: jnp.ndarray         # (N, ncol) quantities on the loga grid
    # uniform-in-ln(tau) respline for runtime queries
    lntau_spline: UniformSpline    # columns = table columns
    # spline z -> tau for background_tau_of_z
    tau0: jnp.ndarray          # conformal age [Mpc]
    age: jnp.ndarray           # proper age [Gyr]
    z_eq: jnp.ndarray
    tau_eq: jnp.ndarray
    a_today: jnp.ndarray
    H0: jnp.ndarray
    Omega0_m: jnp.ndarray
    Omega0_r: jnp.ndarray
    Omega0_g: jnp.ndarray
    Omega0_b: jnp.ndarray
    Omega0_cdm: jnp.ndarray
    Omega0_lambda: jnp.ndarray
    Omega0_ur: jnp.ndarray
    Omega0_ncdm_tot: jnp.ndarray
    rho_ncdm0: jnp.ndarray     # (n_ncdm,) today's rho per species

    def at_tau(self, tau):
        """All columns interpolated at conformal time tau (any shape).
        Analog of background_at_tau (background_module.cpp:125), long format."""
        return self.lntau_spline.eval(jnp.log(tau))

    def col(self, vec, name):
        raise NotImplementedError  # resolved via BgIdx at build site


# ---------------------------------------------------------------------------
# ncdm momentum integrals (replaces tools/non_cold_dark_matter.cpp momenta)

_NCDM_NQ = 128
_NCDM_QMAX = 32.0


def _ncdm_quadrature():
    """Fixed Gauss-Laguerre-like grid for Fermi-Dirac integrals (dense trapz —
    exact enough at 1e-10 for all a)."""
    q = np.linspace(1e-5, _NCDM_QMAX, _NCDM_NQ)
    w = quad.trapz_weights_np(q)
    f0 = 1.0 / (np.exp(q) + 1.0)
    return jnp.asarray(q), jnp.asarray(w * f0)


_Q_NCDM, _WF_NCDM = _ncdm_quadrature()
_RHO_INTEGRAL_0 = 7.0 * math.pi**4 / 120.0  # ∫ q^3/(e^q+1) dq


def ncdm_momenta(x):
    """Dimensionless FD integrals at mass-to-temperature ratio x = a m / T0.

    Returns (I_rho, I_p, I_pseudo_p) normalized so that I_rho(0) = I_p(0)*3 = 1:
      I_rho = ∫ q^2 eps f0 / I0,  eps = sqrt(q^2+x^2)
      I_p   = (1/3) ∫ q^4/eps f0 / I0
      I_pp  = (1/3) ∫ q^6/eps^3 f0 / I0   (pseudo-pressure, ncdm fluid approx;
               reference background_ncdm_momenta, tools/non_cold_dark_matter.cpp)
    """
    x = jnp.asarray(x)
    q = _Q_NCDM
    eps = jnp.sqrt(q**2 + x[..., None] ** 2)
    i_rho = jnp.sum(q**2 * eps * _WF_NCDM, axis=-1) / _RHO_INTEGRAL_0
    i_p = jnp.sum(q**4 / eps * _WF_NCDM, axis=-1) / (3.0 * _RHO_INTEGRAL_0)
    i_pp = jnp.sum(q**6 / eps**3 * _WF_NCDM, axis=-1) / (3.0 * _RHO_INTEGRAL_0)
    return i_rho, i_p, i_pp


# ---------------------------------------------------------------------------


def compute_background(params: CosmoParams, pr: PrecisionParams) -> tuple[BackgroundResult, BgIdx]:
    """Build all background tables. Pure function of (params, precision).

    Runs on the host CPU backend: this stage is a latency-dominated chain of
    small f64 ops (closed-form densities + cumulative integrals on a 4k grid)
    — see utils/device.py. The resulting tables feed the accelerator stages.
    """
    from ..utils.device import on_host_cpu

    with on_host_cpu():
        return _compute_background_impl(params, pr)


def _compute_background_impl(params: CosmoParams, pr: PrecisionParams) -> tuple[BackgroundResult, BgIdx]:
    N = pr.background_Nloga
    dtype = jnp.float64
    H0 = jnp.asarray(params.H0, dtype)
    h2 = params.h * params.h

    a_ini = pr.a_ini_over_a_today_default
    loga = jnp.linspace(math.log(a_ini), 0.0, N, dtype=dtype)
    a = jnp.exp(loga)

    # --- densities in class units (Mpc^-2), closed forms --------------------
    rho_g0 = jnp.asarray(const.rho_gamma_class_units(params.T_cmb), dtype)
    Omega0_g = rho_g0 / H0**2
    Omega0_b = params.omega_b / h2
    Omega0_cdm = params.omega_cdm / h2
    Omega0_ur = params.N_ur * const.ur_over_g_factor * Omega0_g

    rho_g = rho_g0 / a**4
    rho_b = Omega0_b * H0**2 / a**3
    rho_cdm = Omega0_cdm * H0**2 / a**3
    rho_ur = Omega0_ur * H0**2 / a**4

    # ncdm species
    n_ncdm = params.N_ncdm
    rho_ncdm = []
    p_ncdm = []
    pp_ncdm = []
    Omega0_ncdm_tot = jnp.asarray(0.0, dtype)
    rho_ncdm0_list = []
    for i in range(n_ncdm):
        T_ratio = params.T_ncdm_of(i)
        deg = params.deg_ncdm_of(i)
        T0_eV = const.k_B * params.T_cmb * T_ratio / const.eV_SI  # T_ncdm today in eV
        x = a * params.m_ncdm[i] / T0_eV
        i_rho, i_p, i_pp = ncdm_momenta(x)
        pref = deg * (7.0 / 8.0) * T_ratio**4 * rho_g0 / a**4
        r_i = pref * i_rho
        p_i = pref * i_p
        pp_i = pref * i_pp
        rho_ncdm.append(r_i)
        p_ncdm.append(p_i)
        pp_ncdm.append(pp_i)
        rho_ncdm0_list.append(r_i[-1])
        Omega0_ncdm_tot = Omega0_ncdm_tot + r_i[-1] / H0**2
    rho_ncdm0 = jnp.asarray(rho_ncdm0_list) if n_ncdm else jnp.zeros((0,), dtype)

    # --- decaying cold dark matter -> dark radiation ------------------------
    # (background_module.cpp dcdm/dr: d rho_dcdm/dtau = -(3aH + a Gamma) rho,
    # d(rho_dr a^4)/dtau = Gamma rho_dcdm a^5). Closed forms on the grid:
    # rho_dcdm = C a^-3 e^{-Gamma t}, rho_dr = C Gamma a^-4 int a e^{-Gamma t}/H dln a
    # with t(a) the proper time; since t depends weakly on rho_dcdm itself,
    # a short fixed-point iteration replaces the reference's shooting
    # (input_module.cpp:195 Omega_dcdmdr target).
    has_dcdm = (params.Omega_ini_dcdm > 0.0) or (params.Omega_dcdmdr > 0.0)
    rho_dcdm = jnp.zeros_like(a)
    rho_dr = jnp.zeros_like(a)
    Omega0_dcdmdr_now = jnp.asarray(0.0, dtype)
    if has_dcdm:
        Gmpc = params.Gamma_dcdm / 299792.458      # km/s/Mpc -> 1/Mpc
        Om_guess = params.Omega_ini_dcdm or params.Omega_dcdmdr
        rho_dcdm = Om_guess * H0**2 / a**3
        base = rho_g + rho_b + rho_cdm + rho_ur
        for i in range(n_ncdm):
            base = base + rho_ncdm[i]
        for _ in range(4):
            lam = (1.0 - params.Omega_k - Omega0_g - Omega0_b - Omega0_cdm
                   - Omega0_ur - Omega0_ncdm_tot
                   - (rho_dcdm[-1] + rho_dr[-1]) / H0**2) * H0**2
            rho_ti = base + rho_dcdm + rho_dr + lam
            H_i = jnp.sqrt(rho_ti + params.Omega_k * H0**2 / a**2)
            inv_Hi = 1.0 / H_i
            t_i = 0.5 / H_i[0] + spline_integrate(loga, inv_Hi, spline_d2(loga, inv_Hi))
            shape = a ** -3.0 * jnp.exp(-Gmpc * t_i)
            integ = Gmpc * a * jnp.exp(-Gmpc * t_i) / H_i
            I_dr = spline_integrate(loga, integ, spline_d2(loga, integ))
            if params.Omega_ini_dcdm > 0.0:
                C = params.Omega_ini_dcdm * H0**2
            else:
                C = params.Omega_dcdmdr * H0**2 / (shape[-1] + I_dr[-1])
            rho_dcdm = C * shape
            rho_dr = C * I_dr / a**4
        Omega0_dcdmdr_now = (rho_dcdm[-1] + rho_dr[-1]) / H0**2

    # fld (CLP w0-wa): rho_fld = Omega_fld H0^2 a^{-3(1+w0+wa)} e^{3 wa (a-1)}
    has_fld = params.use_fld
    # budget closure: Lambda or fld absorbs 1 - sum(others) - Omega_k
    Omega0_others = (Omega0_g + Omega0_b + Omega0_cdm + Omega0_ur
                     + Omega0_ncdm_tot + Omega0_dcdmdr_now)
    Omega0_de = 1.0 - params.Omega_k - Omega0_others
    if has_fld:
        Omega0_fld = Omega0_de
        Omega0_lambda = jnp.asarray(0.0, dtype)
        w_fld = params.w0_fld + params.wa_fld * (1.0 - a)
        rho_fld = (
            Omega0_fld * H0**2
            * a ** (-3.0 * (1.0 + params.w0_fld + params.wa_fld))
            * jnp.exp(3.0 * params.wa_fld * (a - 1.0))
        )
    else:
        Omega0_lambda = Omega0_de
        Omega0_fld = jnp.asarray(0.0, dtype)
        rho_fld = jnp.zeros_like(a)
        w_fld = jnp.full_like(a, -1.0)
    rho_lambda = jnp.full_like(a, Omega0_lambda * H0**2)

    rho_tot = rho_g + rho_b + rho_cdm + rho_ur + rho_lambda + rho_fld \
        + rho_dcdm + rho_dr
    p_tot = (rho_g + rho_ur + rho_dr) / 3.0 - rho_lambda \
        + (w_fld * rho_fld if has_fld else 0.0)
    for i in range(n_ncdm):
        rho_tot = rho_tot + rho_ncdm[i]
        p_tot = p_tot + p_ncdm[i]

    rho_crit = rho_tot + params.Omega_k * H0**2 / a**2
    H = jnp.sqrt(rho_crit)
    aH = a * H

    # H' = dH/dtau = -3/2 a (rho+p)_tot - Omega_k H0^2 / a
    H_prime = -1.5 * a * (rho_tot + p_tot) - params.Omega_k * H0**2 / a

    # p_tot_prime = dp_tot/dtau (used by ncdm fluid approx & RSA sources).
    # radiation: p = rho/3, rho' = -4 aH rho  =>  p' = -(4/3) aH rho
    p_tot_prime = -(4.0 / 3.0) * aH * (rho_g + rho_ur)
    if has_dcdm:
        Gmpc = params.Gamma_dcdm / 299792.458
        p_tot_prime = p_tot_prime + (-4.0 * aH * rho_dr + a * Gmpc * rho_dcdm) / 3.0
    if has_fld:
        # p_fld = w rho_fld; w' = -wa da/dtau = -wa a^2 H; rho_fld' = -3 aH (1+w) rho_fld
        w_prime = -params.wa_fld * a * a * H
        p_tot_prime = p_tot_prime + w_prime * rho_fld + w_fld * (-3.0 * aH * (1.0 + w_fld) * rho_fld)
    for i in range(n_ncdm):
        # dp_ncdm/dtau = aH (pseudo_p - 5 p)  (tools/non_cold_dark_matter.cpp)
        p_tot_prime = p_tot_prime + aH * (pp_ncdm[i] - 5.0 * p_ncdm[i])

    # --- time-like integrals on the loga grid ------------------------------
    inv_aH = 1.0 / aH
    d2 = spline_d2(loga, inv_aH)
    tau_ini = 1.0 / aH[0]
    tau = tau_ini + spline_integrate(loga, inv_aH, d2)
    tau0 = tau[-1]

    inv_H = 1.0 / H
    t_ini = 0.5 / H[0]
    t = t_ini + spline_integrate(loga, inv_H, spline_d2(loga, inv_H))
    age = t[-1] / const.Gyr_over_Mpc  # table stores Gyr

    cs = 1.0 / jnp.sqrt(3.0 * (1.0 + 3.0 * rho_b / (4.0 * rho_g)))
    integrand_rs = cs * inv_aH
    rs_ini = cs[0] * tau_ini
    rs = rs_ini + spline_integrate(loga, integrand_rs, spline_d2(loga, integrand_rs))

    # comoving / angular / luminosity distances
    chi = tau0 - tau
    sqrt_K = jnp.sqrt(jnp.abs(params.Omega_k)) * H0
    if params.Omega_k > 1e-10:  # open
        r = jnp.sinh(sqrt_K * chi) / sqrt_K
    elif params.Omega_k < -1e-10:  # closed
        r = jnp.sin(sqrt_K * chi) / sqrt_K
    else:
        r = chi
    ang_distance = r * a
    lum_distance = r / a

    # --- growth factor ODE (reference background_module.cpp:1975-1983) -----
    rho_m = rho_b + rho_cdm + rho_dcdm
    rho_m_spl = UniformSpline.build(loga[0], loga[1] - loga[0], jnp.stack([rho_m, a, H], axis=1))

    def growth_rhs(lga, y, _):
        vals = rho_m_spl.eval(lga)
        rm, aa, hh = vals[0], vals[1], vals[2]
        D, Dp = y
        # d/dloga = (1/(aH)) d/dtau
        inv = 1.0 / (aa * hh)
        return jnp.array([Dp * inv, (-aa * hh * Dp + 1.5 * aa * aa * rm * D) * inv])

    from ..ops.ode import rk4_fixed

    D0 = jnp.array([a[0], a[0] * 2.0 * aH[0]])  # D=a, D'=2 D aH in RD
    Dys = rk4_fixed(growth_rhs, D0, loga, None, substeps=2)
    D = Dys[:, 0] / Dys[-1, 0]
    f = Dys[:, 1] / (Dys[:, 0] * aH)

    # --- z_eq (radiation-matter equality) -----------------------------------
    rho_r_tot = rho_g + rho_ur + rho_dr  # (+ relativistic part of ncdm ~ 3p)
    rho_m_tot = rho_b + rho_cdm + rho_dcdm
    for i in range(n_ncdm):
        rho_r_tot = rho_r_tot + 3.0 * p_ncdm[i]
        rho_m_tot = rho_m_tot + (rho_ncdm[i] - 3.0 * p_ncdm[i])
    ratio = jnp.log(rho_r_tot / rho_m_tot)
    # find zero crossing by spline root on the uniform grid
    idx_eq = jnp.argmin(jnp.abs(ratio))
    # local linear refine
    sl = (ratio[idx_eq + 1] - ratio[idx_eq - 1]) / (loga[idx_eq + 1] - loga[idx_eq - 1])
    loga_eq = loga[idx_eq] - ratio[idx_eq] / sl
    z_eq = jnp.exp(-loga_eq) - 1.0
    tau_eq = jnp.interp(loga_eq, loga, tau)

    Omega_m_of_a = rho_m_tot / rho_crit
    Omega_r_of_a = rho_r_tot / rho_crit

    # --- assemble table ------------------------------------------------------
    idx = BgIdx(n_ncdm, has_fld, has_dcdm)
    cols = {
        "a": a, "H": H, "H_prime": H_prime,
        "rho_g": rho_g, "rho_b": rho_b, "rho_cdm": rho_cdm,
        "rho_lambda": rho_lambda, "rho_ur": rho_ur,
        "rho_tot": rho_tot, "p_tot": p_tot, "p_tot_prime": p_tot_prime,
        "rho_crit": rho_crit, "Omega_m": Omega_m_of_a, "Omega_r": Omega_r_of_a,
        "conf_distance": chi, "ang_distance": ang_distance, "lum_distance": lum_distance,
        "time": t / const.Gyr_over_Mpc, "rs": rs, "D": D, "f": f,
    }
    if has_fld:
        cols["rho_fld"] = rho_fld
        cols["w_fld"] = w_fld
    if has_dcdm:
        cols["rho_dcdm"] = rho_dcdm
        cols["rho_dr"] = rho_dr
    for i in range(n_ncdm):
        cols[f"rho_ncdm{i}"] = rho_ncdm[i]
        cols[f"p_ncdm{i}"] = p_ncdm[i]
        cols[f"pseudo_p_ncdm{i}"] = pp_ncdm[i]
    table = jnp.stack([cols[n] for n in idx.names], axis=1)

    # --- uniform ln(tau) respline for runtime -------------------------------
    lntau = jnp.log(tau)
    n_rt = 8192
    lntau_u = jnp.linspace(lntau[0], lntau[-1], n_rt)
    # interpolate table columns from the loga grid to the lntau_u grid:
    # loga(lntau) is smooth & monotonic — spline it, then respline columns.
    d2_lt = spline_d2(lntau, loga)
    loga_u = spline_eval(lntau, loga, d2_lt, lntau_u)
    loga_u = loga_u.at[0].set(loga[0]).at[-1].set(loga[-1])
    d2_tab = spline_d2(loga, table)
    table_u = spline_eval(loga, table, d2_tab, loga_u)
    lntau_spline = UniformSpline.build(lntau_u[0], lntau_u[1] - lntau_u[0], table_u)

    res = BackgroundResult(
        loga=loga,
        tau_of_loga=tau,
        table=table,
        lntau_spline=lntau_spline,
        tau0=tau0,
        age=age,
        z_eq=z_eq,
        tau_eq=tau_eq,
        a_today=jnp.asarray(1.0, dtype),
        H0=H0,
        Omega0_m=Omega0_b + Omega0_cdm + (Omega0_ncdm_tot if n_ncdm else 0.0)
        + (rho_dcdm[-1] / H0**2 if has_dcdm else 0.0),
        Omega0_r=Omega0_g + Omega0_ur,
        Omega0_g=Omega0_g,
        Omega0_b=Omega0_b,
        Omega0_cdm=Omega0_cdm,
        Omega0_lambda=Omega0_lambda,
        Omega0_ur=Omega0_ur,
        Omega0_ncdm_tot=jnp.asarray(Omega0_ncdm_tot, dtype),
        rho_ncdm0=rho_ncdm0,
    )
    return res, idx


def tau_of_z(bg: BackgroundResult, z):
    """Conformal time at redshift z (reference background_tau_of_z, :211)."""
    loga_q = -jnp.log1p(z)
    return jnp.interp(loga_q, bg.loga, bg.tau_of_loga)


def tau_of_z_spline(bg: BackgroundResult, z):
    loga_q = -jnp.log1p(z)
    d2 = spline_d2(bg.loga, bg.tau_of_loga)
    return spline_eval(bg.loga, bg.tau_of_loga, d2, loga_q)
