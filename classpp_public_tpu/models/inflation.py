"""Inflationary primordial spectra P_R(k), P_h(k) from V(phi) or H(phi).

Reference PrimordialModule inflation solver (primordial_module.cpp:1087-3020):
attractor search (:1781-1860), background evolution (:1902-2000), and
mode-by-mode Mukhanov-Sasaki integration (:1621-1780) with Bunch-Davies
initial conditions.

TPU-native redesign: the reference re-integrates the *background* from
phi_pivot for every wavenumber (primordial_inflation_one_wavenumber :1543).
Here the background trajectory (a, phi, phi', z''/z, a''/a) is integrated
ONCE over the full observable window onto a dense uniform ln(a) grid, and
every k then integrates only the two oscillators (scalar ksi, tensor ah)
against splined coefficients — vmapped over the whole k grid in lockstep
with per-k start/stop masks, exactly like the Boltzmann solver.

Units follow the reference: phi in units of the (non-reduced) Planck mass,
factors 8 pi from G = 1/m_P^2 (primordial_inflation_derivs :2861).
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

_8PI = 8.0 * math.pi


def potential_V(phi, pot):
    """(V, dV, ddV) for the named potential (primordial_inflation_potential
    :937-1003). pot = (kind, V0..V4); kind 0 polynomial, 1 natural."""
    kind = pot[0]
    V0, V1, V2, V3, V4 = pot[1]
    if kind == "polynomial":
        V = V0 + phi * V1 + phi**2 / 2.0 * V2 + phi**3 / 6.0 * V3 + phi**4 / 24.0 * V4
        dV = V1 + phi * V2 + phi**2 / 2.0 * V3 + phi**3 / 6.0 * V4
        ddV = V2 + phi * V3 + phi**2 / 2.0 * V4
    elif kind == "natural":
        # V = V0 (1 + cos(phi/V1))
        V = V0 * (1.0 + np.cos(phi / V1))
        dV = -V0 / V1 * np.sin(phi / V1)
        ddV = -V0 / V1**2 * np.cos(phi / V1)
    elif kind == "higgs_inflation":
        # arXiv:1403.6078 Einstein-frame potential (reference
        # primordial_inflation_potential higgs_inflation branch, :975-1003):
        # V0=b, V1=ksi, V2=kappa, V3=delta_lambda, phi = -chi/M_P
        ex = np.exp(2.0 / math.sqrt(6.0) * math.sqrt(8.0 * math.pi) * phi)
        dex = 2.0 / math.sqrt(6.0) * math.sqrt(8.0 * math.pi) * ex
        ddex = 2.0 / 3.0 * 8.0 * math.pi * ex
        mu = (1.0 - ex) ** 0.5
        dmu = -0.5 * dex * (1.0 - ex) ** -0.5
        ddmu = -0.5 * ddex * (1.0 - ex) ** -0.5 \
            - 0.25 * dex * dex * (1.0 - ex) ** -1.5
        lg = np.log(mu / V2)
        dl = dmu / mu
        ddl = ddmu / mu - dl * dl
        p = 1.0 / 16.0 + V3 / V0 + lg * lg
        dp = 2.0 * dl * lg
        ddp = 2.0 * ddl * lg + 2.0 * dl * dl
        pref = V0 / 4.0 / (8.0 * math.pi) ** 2 / V1 / V1
        V = pref * p * mu**4
        dV = pref * (dp * mu**4 + 4.0 * p * dmu * mu**3)
        ddV = pref * (ddp * mu**4 + 8.0 * dp * dmu * mu**3
                      + 4.0 * p * ddmu * mu**3 + 12.0 * p * (dmu * mu) ** 2)
    else:
        raise ValueError(f"unknown inflation potential {kind!r}")
    return V, dV, ddV


def _epsilon_V(phi, pot):
    """First slow-roll parameter epsilon = (dV/V)^2 / 16 pi
    (primordial_inflation_get_epsilon, primordial_module.cpp:2860)."""
    V, dV, _ = potential_V(phi, pot)
    return float(dV) ** 2 / float(V) ** 2 / 16.0 / math.pi


def _find_attractor(phi_0, pot, precision, maxit=10):
    """Slow-roll attractor dphi/dt at phi_0 (primordial_inflation_find_attractor
    :1781-1860): start integrations at phi_0 - n*dphi with the slow-roll IC
    dphi/dt = -dV/(3H) and iterate until dphi/dt(phi_0) is stable."""
    V0, dV0, _ = potential_V(phi_0, pot)
    H_0 = math.sqrt(_8PI / 3.0 * float(V0))
    dphidt = -float(dV0) / 3.0 / H_0
    # step back (uphill) roughly one e-fold per iteration (:1822)
    dphi = float(dV0) / float(V0) / 16.0 / math.pi

    def evolve_to_phi0(phi_start):
        # proper-time integration of (phi, dphi/dt) until phi = phi_0
        V_s, dV_s, _ = potential_V(phi_start, pot)
        H_s = math.sqrt(_8PI / 3.0 * float(V_s))
        y = np.array([float(phi_start), -float(dV_s) / 3.0 / H_s])
        sign = 1.0 if phi_0 > phi_start else -1.0

        def deriv(y):
            V, dV, _ = potential_V(y[0], pot)
            H = math.sqrt(max(_8PI / 3.0 * (0.5 * y[1] ** 2 + float(V)), 1e-300))
            return np.array([y[1], -3.0 * H * y[1] - float(dV)])

        # adaptive RK4 in proper time with step ~ small fraction of 1/H
        for _ in range(200000):
            V, _, _ = potential_V(y[0], pot)
            H = math.sqrt(max(_8PI / 3.0 * (0.5 * y[1] ** 2 + float(V)), 1e-300))
            h = 0.002 / H
            if (phi_0 - y[0]) * sign <= 0:
                break
            k1 = deriv(y)
            k2 = deriv(y + h / 2 * k1)
            k3 = deriv(y + h / 2 * k2)
            k4 = deriv(y + h * k3)
            y = y + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        return y[1]

    old = dphidt
    for n in range(1, maxit + 1):
        cand = evolve_to_phi0(phi_0 + n * dphi)
        if abs(cand / old - 1.0) < precision:
            V, _, _ = potential_V(phi_0, pot)
            H = math.sqrt(_8PI / 3.0 * (0.5 * cand**2 + float(V)))
            return H, cand
        old = cand
    raise RuntimeError("inflationary attractor not found (no slow-roll?)")


def _evolve_background_np(a0, phi0, dphi0, pot, aH_stop, forward=True,
                          stepsize=0.005, max_steps=2000000):
    """Conformal-time background integration until aH crosses aH_stop
    (primordial_inflation_evolve_background :1902). Returns (a, phi, dphi).
    Backward integration uses the 1st-order slow-roll system (:2899)."""
    y = np.array([float(a0), float(phi0), float(dphi0)])

    if forward:
        def aH_of(y):
            V, _, _ = potential_V(y[1], pot)
            return math.sqrt(_8PI / 3.0 * (0.5 * y[2] ** 2 + y[0] ** 2 * float(V)))

        def deriv(y):
            V, dV, _ = potential_V(y[1], pot)
            aH = math.sqrt(_8PI / 3.0 * (0.5 * y[2] ** 2 + y[0] ** 2 * float(V)))
            return np.array([y[0] * aH, y[2], -2.0 * aH * y[2] - y[0] ** 2 * float(dV)])
    else:
        # 1st-order slow-roll system, negative time step (:2899-2925)
        def aH_of(y):
            V, _, _ = potential_V(y[1], pot)
            return math.sqrt(_8PI / 3.0 * y[0] ** 2 * float(V))

        def deriv(y):
            V, dV, _ = potential_V(y[1], pot)
            aH = math.sqrt(_8PI / 3.0 * y[0] ** 2 * float(V))
            return np.array([y[0] * aH, -y[0] ** 2 * float(dV) / 3.0 / aH, 0.0])

    for _ in range(max_steps):
        aH = aH_of(y)
        if (forward and aH >= aH_stop) or ((not forward) and aH <= aH_stop):
            break
        h = stepsize / aH if forward else -stepsize / aH
        k1 = deriv(y)
        k2 = deriv(y + h / 2 * k1)
        k3 = deriv(y + h / 2 * k2)
        k4 = deriv(y + h * k3)
        y = y + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
    return y


def _evolve_until_np(a0, phi0, dphi0, pot, stop, val, forward=True,
                     stepsize=0.005, max_steps=4000000):
    """Conformal-time background integration with a general stop condition
    (primordial_inflation_evolve_background targets, primordial_module.cpp
    :1996-2060): stop = 'aH' | 'a' | 'phi' | 'end' (end of accelerated
    expansion: -(a'/a)^2 + 4 pi phi'^2 >= 0). Backward integration uses the
    1st-order slow-roll system like the reference (:2899). Returns
    (a, phi, dphi_conformal, aH)."""
    y = np.array([float(a0), float(phi0), float(dphi0)])
    phi_dir = None

    for _ in range(max_steps):
        V, dV, _ = potential_V(y[1], pot)
        V, dV = float(V), float(dV)
        if forward:
            aH = math.sqrt(_8PI / 3.0 * (0.5 * y[2] ** 2 + y[0] ** 2 * V))
        else:
            aH = math.sqrt(_8PI / 3.0 * y[0] ** 2 * V)
        if stop == "aH":
            done = aH >= val if forward else aH <= val
        elif stop == "a":
            done = y[0] >= val if forward else y[0] <= val
        elif stop == "phi":
            if phi_dir is None:
                phi_dir = 1.0 if val > y[1] else -1.0
            done = (val - y[1]) * phi_dir <= 0.0
        elif stop == "end":
            done = (-aH * aH + 4.0 * math.pi * y[2] ** 2) >= 0.0
        else:
            raise ValueError(stop)
        if done:
            return y[0], y[1], y[2], aH
        h = stepsize / aH if forward else -stepsize / aH

        if forward:
            def deriv(y):
                V, dV, _ = potential_V(y[1], pot)
                aH = math.sqrt(_8PI / 3.0
                               * (0.5 * y[2] ** 2 + y[0] ** 2 * float(V)))
                return np.array([y[0] * aH, y[2],
                                 -2.0 * aH * y[2] - y[0] ** 2 * float(dV)])
        else:
            def deriv(y):
                V, dV, _ = potential_V(y[1], pot)
                aH = math.sqrt(_8PI / 3.0 * y[0] ** 2 * float(V))
                return np.array([y[0] * aH,
                                 -y[0] ** 2 * float(dV) / 3.0 / aH, 0.0])

        k1 = deriv(y)
        k2 = deriv(y + h / 2 * k1)
        k3 = deriv(y + h / 2 * k2)
        k4 = deriv(y + h * k3)
        y = y + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
    raise RuntimeError(f"background evolution never reached {stop}={val}")


def find_phi_pivot(pot, phi_end, method, target_val, pr):
    """phi at which k_pivot crosses the horizon, for inflation_V_end
    (primordial_inflation_find_phi_pivot, primordial_module.cpp:2324-2750).

    method: 'ln_aH_ratio' (target = ln(a_end H_end / a_* H_*)),
    'ln_aH_ratio_auto' (target from the energy scale at the end of
    inflation, :2424-2436), or 'N_star' (target = ln(a_end/a_*)).

    Mirrors the reference's epsilon>1 branch exactly. For epsilon(phi_end)<1
    the reference's own branch reads the uninitialized `target` and
    `aH_ratio_after_small_epsilon` variables (:2615-2710 vs :2420 — both are
    only assigned inside the epsilon>1 branch), so no reference behavior
    exists to match; we implement the documented intent (inflation ends AT
    phi_end, ratio_after = 1) instead.
    """
    step = pr.primordial_inflation_bg_stepsize
    small = pr.primordial_inflation_small_epsilon

    eps_near_end = _epsilon_V(phi_end - pr.primordial_inflation_end_dphi, pot)
    if eps_near_end > 1.0:
        # inflation ends naturally before phi_end: find phi_small_epsilon
        # with epsilon = small_epsilon by log-step bracketing + bisection
        dphi = pr.primordial_inflation_end_dphi
        while _epsilon_V(phi_end - dphi, pot) > small:
            dphi *= pr.primordial_inflation_end_logstep
        left, right = phi_end - dphi, phi_end
        for _ in range(200):
            mid = 0.5 * (left + right)
            e = _epsilon_V(mid, pot)
            if e < small:
                left = mid
            else:
                right = mid
            if abs(e - small) <= pr.primordial_inflation_small_epsilon_tol:
                break
        phi_se = mid
        end_stop, end_val = "end", 0.0
    else:
        # reference bug branch (see docstring): treat phi_end as the exact
        # end of inflation
        phi_se = phi_end
        end_stop, end_val = "phi", phi_end

    H_se, dphidt_se = _find_attractor(
        phi_se, pot, pr.primordial_inflation_attractor_precision_initial)

    # amount of inflation between phi_small_epsilon and the end
    if end_stop == "end":
        a_end, _, _, aH_end = _evolve_until_np(
            1.0, phi_se, 1.0 * dphidt_se, pot, "end", 0.0, True, step)
        aH_ratio_after = aH_end / H_se
        a_ratio_after = a_end
    else:
        aH_end = H_se
        aH_ratio_after = 1.0
        a_ratio_after = 1.0

    if method == "ln_aH_ratio_auto":
        # target from the inflationary energy scale (:2424-2436), with the
        # reference's literal h=0.7 / T=2.726 bookkeeping constants
        rho_end = 2.0 / _8PI * aH_end**2
        G_SI, h_P, c_SI = 6.67428e-11, 6.62606896e-34, 2.99792458e8
        Mpc_m = 3.085677581282e22
        rho_end = _8PI / 3.0 * rho_end / (G_SI * h_P / c_SI**3) * Mpc_m**2
        h = 0.7
        H0 = h * 1.0e5 / c_SI
        rho_c0 = H0**2
        k_B, sigma_B = 1.3806504e-23, None
        sigma_B = 2.0 * math.pi**5 * k_B**4 / 15.0 / h_P**3 / c_SI**2
        Omega_g0 = (4.0 * sigma_B / c_SI * 2.726**4) / (
            3.0 * c_SI**2 * 1.0e10 * h * h / Mpc_m**2 / 8.0 / math.pi / G_SI)
        Omega_r0 = 3.046 * 7.0 / 8.0 * (4.0 / 11.0) ** (4.0 / 3.0) * Omega_g0
        target = math.log(H0 / 0.05 * Omega_r0**0.5 * (2.0 / 100.0) ** (1.0 / 12.0)
                          * (rho_end / rho_c0) ** 0.25)
    else:
        target = float(target_val)

    extra = pr.primordial_inflation_extra_efolds
    # rough backward estimate phi_try slightly below phi_pivot (:2462-2496)
    if method == "N_star":
        _, phi_try, _, _ = _evolve_until_np(
            1.0, phi_se, 0.0, pot, "a",
            a_ratio_after / math.exp(target + extra), False, step)
    else:
        _, phi_try, _, _ = _evolve_until_np(
            1.0, phi_se, 0.0, pot, "aH",
            H_se / math.exp(target + extra) * aH_ratio_after, False, step)

    H_try, dphidt_try = _find_attractor(
        phi_try, pot, pr.primordial_inflation_attractor_precision_initial)

    # exact amount of inflation from phi_try to the end (:2506-2540)
    a_stop, _, _, aH_stop = _evolve_until_np(
        1.0, phi_try, 1.0 * dphidt_try, pot, end_stop, end_val, True, step)
    ratio_try = a_stop if method == "N_star" else aH_stop / H_try
    if math.log(ratio_try) < target:
        raise RuntimeError(
            f"inflation_V_end pivot search: only {math.log(ratio_try):.3f} "
            f"e-folds(-equivalents) available after phi_try, need {target:.3f}"
            " — increase primordial_inflation_extra_efolds")

    # walk forward until exactly `target` e-folds remain (:2556-2590)
    if method == "N_star":
        _, phi_pivot, _, _ = _evolve_until_np(
            1.0, phi_try, 1.0 * dphidt_try, pot, "a",
            ratio_try / math.exp(target), True, step)
    else:
        _, phi_pivot, _, _ = _evolve_until_np(
            1.0, phi_try, 1.0 * dphidt_try, pot, "aH",
            H_try * ratio_try / math.exp(target), True, step)
    return phi_pivot


@lru_cache(maxsize=4)
def _ms_solver(n_grid: int, stepsize: float, max_steps: int):
    """Lockstep Mukhanov-Sasaki integrator: vmapped over k, adaptive-step RK4
    in conformal time (dtau = stepsize*2pi/max(k, sqrt|z''/z|), matching the
    reference rule, one_k :1676) inside a bounded while_loop with per-k
    done-masks. The background is shared and splined — the reference's per-k
    background re-integration (:1543) disappears."""

    def solve(tau_grid, zpp_grid, app_grid, k_arr, tau_ini, tau_end):
        def coef(tau):
            i = jnp.clip(jnp.searchsorted(tau_grid, tau) - 1, 0, n_grid - 2)
            w = (tau - tau_grid[i]) / (tau_grid[i + 1] - tau_grid[i])
            w = jnp.clip(w, 0.0, 1.0)
            zpp = (1.0 - w) * zpp_grid[i] + w * zpp_grid[i + 1]
            app = (1.0 - w) * app_grid[i] + w * app_grid[i + 1]
            return zpp, app

        def one_k(k, t_ini, t_end):
            # Bunch-Davies (one_k :1650-1660)
            amp = 1.0 / jnp.sqrt(2.0 * k)
            y0 = jnp.array([amp, 0.0, 0.0, -k * amp,   # ksi re/im, dksi re/im
                            amp, 0.0, 0.0, -k * amp])  # ah  re/im, dah  re/im

            def rhs(tau, y):
                zpp, app = coef(tau)
                ks = k * k - zpp
                kt = k * k - app
                return jnp.array([y[2], y[3], -ks * y[0], -ks * y[1],
                                  y[6], y[7], -kt * y[4], -kt * y[5]])

            def cond(st):
                tau, y, n = st
                return (tau < t_end) & (n < max_steps)

            def body(st):
                tau, y, n = st
                zpp, _ = coef(tau)
                dt = stepsize * 2.0 * math.pi / jnp.maximum(
                    k, jnp.sqrt(jnp.abs(zpp)))
                dt = jnp.minimum(dt, t_end - tau)
                k1 = rhs(tau, y)
                k2 = rhs(tau + dt / 2, y + dt / 2 * k1)
                k3 = rhs(tau + dt / 2, y + dt / 2 * k2)
                k4 = rhs(tau + dt, y + dt * k3)
                y = y + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
                return (tau + dt, y, n + 1)

            _, y, _ = jax.lax.while_loop(cond, body, (t_ini, y0, 0))
            return y

        return jax.vmap(one_k)(k_arr, tau_ini, tau_end)

    return jax.jit(solve)


def compute_inflation_spectrum(pot_kind, V_params, k_pivot, lnk, pr,
                               phi_pivot=0.0):
    """P_R(k), P_h(k) on the lnk grid for an inflation_V(_end) model.

    Follows primordial_inflation_solve_inflation (:1087): attractor at
    phi_pivot (0 for inflation_V; from find_phi_pivot for inflation_V_end),
    a_pivot = k_pivot/H_pivot, backward search for phi_ini with
    aH_ini = k_min/ratio_min, then one dense forward background
    integration and a lockstep MS solve per k.
    """
    pot = (pot_kind, tuple(float(v) for v in V_params))
    phi_pivot = float(phi_pivot)
    H_pivot, dphidt_pivot = _find_attractor(
        phi_pivot, pot, pr.primordial_inflation_attractor_precision_pivot)
    a_pivot = float(k_pivot) / H_pivot

    k_min = math.exp(float(lnk[0]))
    k_max = math.exp(float(lnk[-1]))
    aH_ini = k_min / pr.primordial_inflation_ratio_min
    aH_end = k_max / pr.primordial_inflation_ratio_max

    # find phi_ini via backward slow-roll + exact forward correction (:1240)
    a_cur, phi_cur = a_pivot, phi_pivot
    for _ in range(int(pr.primordial_inflation_phi_ini_maxit)):
        y_b = _evolve_background_np(a_cur, phi_cur, 0.0, pot,
                                    aH_ini * pr.primordial_inflation_aH_ini_target,
                                    forward=False,
                                    stepsize=pr.primordial_inflation_bg_stepsize)
        phi_try = y_b[1]
        H_try, dphidt_try = _find_attractor(
            phi_try, pot, pr.primordial_inflation_attractor_precision_initial)
        # forward until phi = phi_pivot to normalize a
        a_try = _forward_to_phi(1.0, phi_try, dphidt_try, pot, phi_pivot,
                                pr.primordial_inflation_bg_stepsize)
        a_ini = a_pivot / a_try
        a_cur, phi_cur = a_ini, phi_try
        if a_ini * H_try <= aH_ini:
            break
    else:
        raise RuntimeError("not enough inflation before the pivot scale")

    # dense forward background integration from (a_ini, phi_try) to aH_end,
    # recording the trajectory
    tau, a_t, aH_t, zpp_t, app_t, z_t = _record_background(
        a_ini, phi_try, a_ini * dphidt_try, pot, aH_end,
        pr.primordial_inflation_bg_stepsize)

    # per-k integration window: tau where aH = k/ratio_min .. aH = k*(1/ratio_max)
    lnaH = np.log(aH_t)
    lntau = np.log(tau)
    k_arr = np.exp(np.asarray(lnk))
    t_ini = np.exp(np.interp(np.log(k_arr / pr.primordial_inflation_ratio_min),
                             lnaH, lntau))
    t_end = np.exp(np.interp(np.log(k_arr / pr.primordial_inflation_ratio_max),
                             lnaH, lntau))

    solver = _ms_solver(len(tau), float(pr.primordial_inflation_pt_stepsize),
                        200000)
    yf = solver(jnp.asarray(tau), jnp.asarray(zpp_t), jnp.asarray(app_t),
                jnp.asarray(k_arr), jnp.asarray(t_ini), jnp.asarray(t_end))
    yf = np.asarray(yf)

    # curvature P_R = k^3/(2 pi^2) |ksi|^2 / z^2 at the end point (:1752)
    z_end = np.interp(np.log(t_end), lntau, z_t)
    a_end = np.exp(np.interp(np.log(t_end), lntau, np.log(a_t)))
    ksi2 = yf[:, 0] ** 2 + yf[:, 1] ** 2
    ah2 = yf[:, 4] ** 2 + yf[:, 5] ** 2
    pk_s = k_arr**3 / (2.0 * math.pi**2) * ksi2 / z_end**2
    pk_t = 32.0 * k_arr**3 / math.pi * ah2 / a_end**2
    return pk_s, pk_t


def hubble_H(phi, hp):
    """(H, dH, ddH, dddH) for the Taylor H(phi)
    (primordial_inflation_hubble, primordial_module.cpp:1019)."""
    H0, H1, H2, H3, H4 = hp
    H = H0 + phi * H1 + phi**2 / 2.0 * H2 + phi**3 / 6.0 * H3 + phi**4 / 24.0 * H4
    dH = H1 + phi * H2 + phi**2 / 2.0 * H3 + phi**3 / 6.0 * H4
    ddH = H2 + phi * H3 + phi**2 / 2.0 * H4
    dddH = H3 + phi * H4
    return H, dH, ddH, dddH


def _record_background_H(a0, phi0, hp, aH_stop, stepsize):
    """Hamilton-Jacobi background for inflation_H (conformal time):
    da/dtau = a^2 H(phi), dphi/dtau = -a dH/(4 pi)
    (primordial_inflation_derivs inflation_H branch, :2940-2970), with the
    closed-form z''/z and a''/a of that branch. First-order system: the
    backward branch is the exact time reversal (no attractor search)."""
    y = np.array([a0, phi0])
    tau = 1.0 / (a0 * hubble_H(phi0, hp)[0])
    rows = []
    for _ in range(4000000):
        a, phi = y
        H, dH, ddH, dddH = hubble_H(phi, hp)
        a2 = a * a
        aH = a * H
        dphi = -a * dH / (4.0 * math.pi)
        pi = math.pi
        zpp = a2 * (2.0 * H * H
                    - 3.0 / (4.0 * pi) * H * ddH
                    + 1.0 / (16.0 * pi * pi) * (ddH * ddH + dH * dddH)
                    - 1.0 / (4.0 * pi * pi) * dH * dH * ddH / H
                    + 1.0 / (2.0 * pi) * dH * dH
                    + 1.0 / (8.0 * pi * pi) * dH**4 / (H * H))
        app = 2.0 * a2 * H * H - 4.0 * math.pi * dphi * dphi
        z = dphi / H            # a dphi/dtau / (aH)
        rows.append((tau, a, aH, zpp, app, z))
        if aH >= aH_stop:
            break
        h = stepsize / aH

        def deriv(y):
            H, dH, _, _ = hubble_H(y[1], hp)
            return np.array([y[0] ** 2 * H, -y[0] * dH / (4.0 * math.pi)])

        k1 = deriv(y)
        k2 = deriv(y + h / 2 * k1)
        k3 = deriv(y + h / 2 * k2)
        k4 = deriv(y + h * k3)
        y = y + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        tau += h
    arr = np.asarray(rows)
    return (arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], arr[:, 4], arr[:, 5])


def compute_inflation_spectrum_H(H_params, k_pivot, lnk, pr):
    """P_R(k), P_h(k) for inflation_H (H(phi) Taylor coefficients):
    phi_pivot = 0, a_pivot = k_pivot/H(0), exact backward evolution to
    aH_ini, one forward record, lockstep MS solve (reference
    inflation_H branches of primordial_inflation_solve_inflation)."""
    hp = tuple(float(v) for v in H_params)
    if hp[0] <= 0.0:
        raise ValueError("inflation_H requires H_0 > 0")
    H_pivot = hubble_H(0.0, hp)[0]
    a_pivot = float(k_pivot) / H_pivot

    k_min = math.exp(float(lnk[0]))
    k_max = math.exp(float(lnk[-1]))
    aH_ini = k_min / pr.primordial_inflation_ratio_min
    aH_end = k_max / pr.primordial_inflation_ratio_max

    # exact backward to aH_ini (:1331-1349); first-order system, so the
    # time reversal needs no attractor iteration
    y = np.array([a_pivot, 0.0])
    for _ in range(4000000):
        H, dH, _, _ = hubble_H(y[1], hp)
        aH = y[0] * H
        if aH <= aH_ini:
            break
        h = -pr.primordial_inflation_bg_stepsize / aH

        def deriv(y):
            H, dH, _, _ = hubble_H(y[1], hp)
            return np.array([y[0] ** 2 * H, -y[0] * dH / (4.0 * math.pi)])

        k1 = deriv(y)
        k2 = deriv(y + h / 2 * k1)
        k3 = deriv(y + h / 2 * k2)
        k4 = deriv(y + h * k3)
        y = y + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
    a_ini, phi_ini = y[0], y[1]

    tau, a_t, aH_t, zpp_t, app_t, z_t = _record_background_H(
        a_ini, phi_ini, hp, aH_end, pr.primordial_inflation_bg_stepsize)

    lnaH = np.log(aH_t)
    lntau = np.log(tau)
    k_arr = np.exp(np.asarray(lnk))
    t_ini = np.exp(np.interp(np.log(k_arr / pr.primordial_inflation_ratio_min),
                             lnaH, lntau))
    t_end = np.exp(np.interp(np.log(k_arr / pr.primordial_inflation_ratio_max),
                             lnaH, lntau))
    solver = _ms_solver(len(tau), float(pr.primordial_inflation_pt_stepsize),
                        200000)
    yf = np.asarray(solver(jnp.asarray(tau), jnp.asarray(zpp_t),
                           jnp.asarray(app_t), jnp.asarray(k_arr),
                           jnp.asarray(t_ini), jnp.asarray(t_end)))
    z_end = np.interp(np.log(t_end), lntau, z_t)
    a_end = np.exp(np.interp(np.log(t_end), lntau, np.log(a_t)))
    ksi2 = yf[:, 0] ** 2 + yf[:, 1] ** 2
    ah2 = yf[:, 4] ** 2 + yf[:, 5] ** 2
    pk_s = k_arr**3 / (2.0 * math.pi**2) * ksi2 / z_end**2
    pk_t = 32.0 * k_arr**3 / math.pi * ah2 / a_end**2
    return pk_s, pk_t


def _forward_to_phi(a0, phi0, dphidt0, pot, phi_stop, stepsize):
    """Forward conformal integration until phi crosses phi_stop; returns a."""
    y = np.array([a0, phi0, a0 * dphidt0])
    sign = 1.0 if phi_stop > phi0 else -1.0
    for _ in range(2000000):
        if (phi_stop - y[1]) * sign <= 0:
            break
        V, dV, _ = potential_V(y[1], pot)
        aH = math.sqrt(_8PI / 3.0 * (0.5 * y[2] ** 2 + y[0] ** 2 * float(V)))
        h = stepsize / aH

        def deriv(y):
            V, dV, _ = potential_V(y[1], pot)
            aH = math.sqrt(_8PI / 3.0 * (0.5 * y[2] ** 2 + y[0] ** 2 * float(V)))
            return np.array([y[0] * aH, y[2], -2.0 * aH * y[2] - y[0] ** 2 * float(dV)])

        k1 = deriv(y)
        k2 = deriv(y + h / 2 * k1)
        k3 = deriv(y + h / 2 * k2)
        k4 = deriv(y + h * k3)
        y = y + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
    return y[0]


def _record_background(a0, phi0, dphi0, pot, aH_stop, stepsize):
    """Forward conformal background integration recording (tau, a, aH,
    z''/z, a''/a, z) on every step (coefficients per :2884-2894)."""
    y = np.array([a0, phi0, dphi0])
    tau = 1.0 / (a0 * math.sqrt(_8PI / 3.0 * float(potential_V(phi0, pot)[0])))
    rows = []
    for _ in range(4000000):
        a, phi, dphi = y
        V, dV, ddV = potential_V(phi, pot)
        V, dV, ddV = float(V), float(dV), float(ddV)
        a2 = a * a
        aH = math.sqrt(_8PI / 3.0 * (0.5 * dphi**2 + a2 * V))
        zpp = (2.0 * aH * aH - a2 * ddV
               - 4.0 * math.pi * (7.0 * dphi**2 + 4.0 * dphi / aH * a2 * dV)
               + 32.0 * math.pi**2 * dphi**4 / aH**2)
        app = 2.0 * aH * aH - 4.0 * math.pi * dphi**2
        z = a * dphi / aH
        rows.append((tau, a, aH, zpp, app, z))
        if aH >= aH_stop:
            break
        h = stepsize / aH

        def deriv(y):
            V, dV, _ = potential_V(y[1], pot)
            aH = math.sqrt(_8PI / 3.0 * (0.5 * y[2] ** 2 + y[0] ** 2 * float(V)))
            return np.array([y[0] * aH, y[2], -2.0 * aH * y[2] - y[0] ** 2 * float(dV)])

        k1 = deriv(y)
        k2 = deriv(y + h / 2 * k1)
        k3 = deriv(y + h / 2 * k2)
        k4 = deriv(y + h * k3)
        y = y + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        tau += h
    arr = np.asarray(rows)
    return (arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], arr[:, 4], arr[:, 5])
