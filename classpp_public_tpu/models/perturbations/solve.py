"""Batched perturbation solve: the whole k-grid in lockstep.

This replaces the reference's thread pool of per-k adaptive ndf15 solves
(perturb_init task loop, perturbations_module.cpp:668-718; perturb_solve,
:2463) with ONE vmapped program: every k-mode runs the same lax.scan over the
shared source-sampling grid, with per-k adaptive RKCK45 sub-stepping inside
each interval (lax.while_loop) and per-k approximation switch times handled by
splitting intervals at the (clipped, sorted) switch instants. Under vmap the
switch logic is pure data flow — no shape changes, no branching.

The result is the source table S[k, tau, type] (reference sources_ layout,
perturbations_module.h:152-155).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from functools import lru_cache

from ...config.params import CosmoParams
from ...config.precision import PrecisionParams
from ...ops.export_cache import export_cached
from ...ops.ode import rkck_integrate
from ..background import BackgroundResult, BgIdx
from ..thermodynamics import ThermoResult
from . import equations as eq
from .grids import KSchedule, get_k_list, get_k_schedule, get_tau_sampling
from .indices import PtIdx, SrcIdx


def make_ncdm_ctx(params, bg, idx, bidx=None):
    """Build the shared ncdm phase-space context: Gauss-Laguerre momentum
    NODES shared across species, with PER-SPECIES weights w = GLweight e^q
    f~0(q) and dln f0/dln q — the general-PSD redesign of the reference's
    per-species adaptive q-grids (tools/quadrature.c get_qsampling). The
    default FD path reproduces the analytic weights exactly; tabulated-file
    or chemical-potential PSDs ride the same static shapes
    (background.ncdm_psd_weights)."""
    import math

    from ... import constants as const
    from ..background import ncdm_psd_weights

    qn, wf, dlnf0 = ncdm_psd_weights(params, idx.q_size_ncdm,
                                     gauss=idx.q_gauss, qmax=idx.q_max_ncdm)
    I0 = 7.0 * math.pi**4 / 120.0
    rho_g0 = const.rho_gamma_class_units(params.T_cmb)
    x_fac, pref = [], []
    n_std = idx.n_ncdm - getattr(idx, "n_dncdm", 0)
    deg_eff = getattr(bg, "deg_dncdm_eff", None)
    for i in range(idx.n_ncdm):
        T_ratio = params.T_ncdm_of(i)
        deg = params.deg_ncdm_of(i)
        if i >= n_std and deg_eff is not None:
            # Omega_dncdmdr shooting rescaled the degeneracy in-background
            deg = deg_eff[i - n_std]
        T0_eV = const.k_B * params.T_cmb * T_ratio / const.eV_SI
        x_fac.append(params.m_ncdm[i] / T0_eV)
        pref.append(deg * (7.0 / 8.0) * T_ratio**4 * rho_g0 / I0)
    gamma = None
    ker_x = ker_G = None
    if getattr(idx, "n_dncdm", 0):
        gamma = jnp.asarray([params.gamma_dncdm_of(i) / 299792.458
                             for i in range(idx.n_ncdm)])
        ker_x, ker_G = eq.dr_kernel_table(idx.l_max_dr)
    return eq.NcdmCtx(q=jnp.asarray(qn), w=jnp.asarray(wf),
                      dlnf0=jnp.asarray(dlnf0),
                      x_fac=jnp.asarray(x_fac), pref=jnp.asarray(pref),
                      gamma=gamma, ker_x=ker_x, ker_G=ker_G)


class SolverScalars(NamedTuple):
    """Per-run scalar knobs passed as TRACED jit arguments (not closure
    constants): tolerance classes (CMB vs P(k)-tail chunks) and per-cosmology
    scalars then share ONE compiled executable per static (idx, ic, evolver)
    configuration. Baking these into the lru_cache key was the r2 compile-time
    blowup: 2 tolerance classes x per-cosmology floats retraced the full
    Boltzmann graph each time."""

    rtol: jnp.ndarray       # PER-LANE (vmapped axis 0): CMB lanes tight,
    atol: jnp.ndarray       # P(k)-tail lanes loose — one launch, two classes
    wa_fld: jnp.ndarray
    cs2_fld: jnp.ndarray
    K: jnp.ndarray
    Gamma_dcdm: jnp.ndarray
    H0: jnp.ndarray
    eta_flag: jnp.ndarray   # 1.0 = adiabatic+synchronous eta-1 storage offset
    # temperature-contribution switches (sw, eisw, lisw, dop, pol) + the
    # early/late ISW split redshift (perturb_sources :6826-6895; defaults
    # all-on + z_split = 120)
    tswitch: jnp.ndarray = None
    # PPF knobs: c_gamma_over_c_fld (input :3212) and the
    # c_gamma_k_H_square_max branch cap (precisions.h:245)
    c_gamma: jnp.ndarray = None
    c_gamma_cap: jnp.ndarray = None

    @staticmethod
    def make(rtol, atol=1e-11, wa_fld=0.0, cs2_fld=1.0, K=0.0, Gamma_dcdm=0.0,
             H0=1.0, eta_flag=1.0, lanes=None, tswitch=None, c_gamma=0.4,
             c_gamma_cap=1.0e3):
        """rtol/atol may be scalars (broadcast to `lanes`) or per-lane
        arrays; the rest are cosmology scalars."""
        f = jnp.float64
        rtol = jnp.asarray(rtol, f)
        atol = jnp.asarray(atol, f)
        if lanes is not None:
            rtol = jnp.broadcast_to(rtol, (lanes,))
            atol = jnp.broadcast_to(atol, (lanes,))
        if tswitch is None:
            tswitch = (1.0, 1.0, 1.0, 1.0, 1.0, 120.0)
        return SolverScalars(rtol, atol,
                             *(jnp.asarray(v, f) for v in
                               (wa_fld, cs2_fld, K, Gamma_dcdm, H0, eta_flag)),
                             jnp.asarray(tswitch, f),
                             jnp.asarray(c_gamma, f), jnp.asarray(c_gamma_cap, f))

    @classmethod
    def axes(cls):
        """vmap in_axes spec: rtol/atol ride the lane axis, the rest are
        broadcast cosmology scalars."""
        return cls(rtol=0, atol=0, wa_fld=None, cs2_fld=None, K=None,
                   Gamma_dcdm=None, H0=None, eta_flag=None, tswitch=None,
                   c_gamma=None, c_gamma_cap=None)


def _sc_kwargs(sc: SolverScalars):
    return dict(rtol=sc.rtol, atol=sc.atol, wa_fld=sc.wa_fld, cs2_fld=sc.cs2_fld,
                K=sc.K, Gamma_dcdm=sc.Gamma_dcdm, H0=sc.H0, eta_flag=sc.eta_flag,
                tswitch=sc.tswitch, c_gamma=sc.c_gamma, c_gamma_cap=sc.c_gamma_cap)


@lru_cache(maxsize=16)
def get_batch_solver(bidx_key, idx, ic="ad", evolver="imex"):
    """jitted vmapped per-k solver head (ICs + pre-phase + first window)."""
    from ..background import BgIdx

    bidx = BgIdx(*bidx_key)

    def fn(k, tau_ini, t_tca, t_ufa, t_rsa, t_ncfa, taus, bg_spline, th_spline,
           ncdm, sc):
        return solve_one_k(k, tau_ini, t_tca, t_ufa, t_rsa, t_ncfa, taus,
                           bg_spline, th_spline, ncdm, bidx, idx, ic=ic,
                           evolver=evolver, **_sc_kwargs(sc))

    return export_cached(jax.jit(jax.vmap(
        fn, in_axes=(0, 0, 0, 0, 0, 0, None, None, None, None,
                     SolverScalars.axes()))),
        tag="pt_batch", static_key=(bidx_key, idx, ic, evolver))


@lru_cache(maxsize=16)
def get_window_solver(bidx_key, idx, evolver="imex"):
    """jitted vmapped continuation solver: resumes from a carried (y, h).
    ic-independent: initial conditions never run here and the eta offset is
    the traced sc.eta_flag, so all ICs share this executable."""
    from ..background import BgIdx

    bidx = BgIdx(*bidx_key)

    def fn(k, tau_ini, t_tca, t_ufa, t_rsa, t_ncfa, taus, bg_spline, th_spline,
           ncdm, y, h, sc):
        return solve_one_k(k, tau_ini, t_tca, t_ufa, t_rsa, t_ncfa, taus,
                           bg_spline, th_spline, ncdm, bidx, idx,
                           y_carry=(y, h), evolver=evolver, **_sc_kwargs(sc))

    return export_cached(jax.jit(jax.vmap(
        fn, in_axes=(0, 0, 0, 0, 0, 0, None, None, None, None, 0, 0,
                     SolverScalars.axes()))),
        tag="pt_window", static_key=(bidx_key, idx, evolver))


class PerturbResult(NamedTuple):
    k: jnp.ndarray            # (nk,)
    tau: jnp.ndarray          # (ntau,)
    sources: jnp.ndarray      # (nk, ntau, SrcIdx.n) - adiabatic mode
    tau0: jnp.ndarray
    k_size_cmb: int           # number of k used for CMB transfer
    stats_steps: jnp.ndarray  # (nk,) accepted RKCK steps per mode
    sources_iso: dict = None  # {ic_name: (nk, ntau, nsrc)} isocurvature modes
    # host (numpy) copies of the grids, which are *built* on host anyway:
    # downstream stages (transfer q-list, nonlinear halofit grid) read grid
    # scalars during their host prologue, and pulling them from the
    # accelerator would block on the whole in-flight solver queue — killing
    # the host-prep/device-exec overlap that hides the solve latency
    k_np: np.ndarray = None
    tau_np: np.ndarray = None


K_ETA_SPLIT = 0.02  # 1/Mpc: below this, adiabatic lanes store eta - 1


def _stepper(k, t_tca, t_ufa, t_rsa, t_ncfa, bg_spline, th_spline, ncdm,
             bidx, idx, rtol, atol, wa_fld, cs2_fld, ic="ad", evolver="imex",
             K=0.0, Gamma_dcdm=0.0, H0=1.0, eta_flag=None, tswitch=None,
             c_gamma=0.4, c_gamma_cap=1.0e3):
    # eta_flag: 1.0 when the low-k eta-1 storage offset applies (adiabatic
    # synchronous); traced so isocurvature modes share the adiabatic
    # executable instead of retracing the full Boltzmann graph per ic
    if eta_flag is None:
        eta_flag = 1.0 if (ic == "ad" and idx.gauge == "synchronous") else 0.0
    eta_off = (jnp.asarray(eta_flag) * (k < K_ETA_SPLIT)).astype(k.dtype)
    # working dtype follows k (float32 path: time/step control stays f64;
    # tau and the cosmology scalars are cast at the physics boundary so no
    # f64 leaks back into the state math and promotes the whole RHS)
    wd = k.dtype

    def _t(t):
        return jnp.asarray(t, wd)

    def _cast_ctx(c):
        if wd == jnp.float64:
            return c
        rep = {f: jnp.asarray(getattr(c, f), wd)
               for f in ("wa_fld", "cs2_fld", "K", "Gamma_dcdm", "H0",
                         "c_gamma_over_c_fld", "c_gamma_k_H_square_max")}
        if c.tswitch is not None:
            rep["tswitch"] = jnp.asarray(c.tswitch, wd)
        return c._replace(**rep)
    """Shared per-k integration machinery: flag context + adaptive interval
    integrator with in-loop approximation-switch remaps.

    ONE lax.while_loop per interval: approximation flags are evaluated per
    step from the current time, steps are clipped so they never straddle a
    switch time, and the state remaps fire inside the loop when a step lands
    on a switch boundary. (A single loop keeps the compiled graph small: the
    RHS appears once per interval instead of once per sub-segment.)

    evolver: "imex" (default) = ARK3(2) with the Thomson terms implicit —
    the ndf15-equivalent stiff path (steps limited by acoustic accuracy, not
    by kappa' stability); "rkck" = fully explicit Cash-Karp 45.
    """
    from ...ops.ode import ark43_step, rkck_step

    switch_list = [t_tca, t_ufa, t_rsa] + ([t_ncfa] if idx.n_ncdm else [])
    switches = jnp.stack(switch_list)

    def ctx_at(t):
        return _cast_ctx(eq.PertCtx(
            k=k, tca_on=t < t_tca, rsa_on=t >= t_rsa, ufa_on=t >= t_ufa,
            bg_spline=bg_spline, th_spline=th_spline, bidx=bidx, idx=idx,
            ncdmfa_on=t >= t_ncfa, ncdm=ncdm,
            wa_fld=wa_fld, cs2_fld=cs2_fld, eta_off=eta_off, K=K,
            Gamma_dcdm=Gamma_dcdm, H0=H0, tswitch=tswitch,
            c_gamma_over_c_fld=c_gamma,
            c_gamma_k_H_square_max=c_gamma_cap))

    if wd == jnp.float64:
        _rhs, _sapply, _ssolve = eq.rhs, eq.stiff_apply, eq.stiff_solve
    else:
        def _rhs(t, y, c):
            return eq.rhs(_t(t), y, c)

        def _sapply(t, y, c):
            return eq.stiff_apply(_t(t), y, c)

        def _ssolve(t, gh, r, c):
            return eq.stiff_solve(_t(t), _t(gh), r, c)

    # embedded-error order sets the controller exponent
    err_exp = -0.25 if evolver == "imex" else -0.2

    def integrate_interval(y, h, t_a, t_b):
        def cond(st):
            t, y, h, n, done = st
            return jnp.logical_and(~done, n < 100000)

        def body(st):
            t, y, h, n, done = st
            # never step across a switch boundary
            cand = jnp.where(switches > t * (1.0 + 1e-14), switches, jnp.inf)
            t_stop = jnp.minimum(jnp.min(cand), t_b)
            h_eff = jnp.minimum(h, t_stop - t)
            c = ctx_at(t)
            if evolver == "imex":
                y_new, err, k1 = ark43_step(_rhs, _sapply, _ssolve,
                                            t, y, h_eff, c)
            else:
                y_new, err, k1 = rkck_step(_rhs, t, y, h_eff, c)
            scale = rtol * (jnp.abs(y) + jnp.abs(h_eff * k1) + 1e-30) + atol
            ratio = jnp.max(jnp.abs(err) / scale)
            ratio = jnp.where(jnp.isfinite(ratio), ratio, jnp.inf)
            accept = ratio <= 1.0
            fac = jnp.clip(0.9 * jnp.where(ratio > 0, ratio ** err_exp, 5.0), 0.2, 5.0)
            clipped = h_eff < h
            h_next = jnp.where(accept & clipped, jnp.maximum(h, h_eff * fac), h_eff * fac)
            t_new = jnp.where(accept, t + h_eff, t)
            y_out = jnp.where(accept, y_new, y)
            # state remaps when landing on a switch boundary
            crossed = accept & (t_new >= switches) & (t < switches)
            y_out = jnp.where(crossed[0], eq.remap_tca_off(y_out, _t(t_new), ctx_at(t_new)), y_out)
            y_out = jnp.where(crossed[1], eq.remap_ufa_on(y_out, ctx_at(t_new)), y_out)
            y_out = jnp.where(crossed[2], eq.remap_rsa_on(y_out, ctx_at(t_new)), y_out)
            if idx.n_ncdm:
                y_out = jnp.where(crossed[3], eq.remap_ncdmfa_on(y_out, _t(t_new), ctx_at(t_new)), y_out)
            done_new = t_new >= t_b * (1.0 - 1e-15)
            return (t_new, y_out, jnp.maximum(h_next, 1e-300), n + 1, done_new)

        # derive every scalar carry from the (mesh-varying) step size h so the
        # while_loop carry keeps consistent varying-axis types under shard_map
        # (t_a/t_b come from the replicated tau grid and would otherwise start
        # invariant and become varying after the first where(accept, ...))
        zero_v = h * 0.0
        n0 = zero_v.astype(jnp.int32)
        st = (t_a + zero_v, y, h, n0, (t_b + zero_v) <= t_a)
        t, y, h, n, _ = jax.lax.while_loop(cond, body, st)
        return y, h, n

    return ctx_at, integrate_interval


def solve_one_k(k, tau_ini, t_tca, t_ufa, t_rsa, t_ncfa, taus, bg_spline, th_spline, ncdm, bidx, idx, rtol,
                wa_fld=0.0, cs2_fld=1.0, ic="ad", y_carry=None, atol=1e-11,
                evolver="imex", K=0.0, Gamma_dcdm=0.0, H0=1.0, eta_flag=None,
                tswitch=None, c_gamma=0.4, c_gamma_cap=1.0e3):
    """Integrate one k-mode over all sampling intervals, emitting sources."""
    ctx_at, integrate_interval = _stepper(
        k, t_tca, t_ufa, t_rsa, t_ncfa, bg_spline, th_spline, ncdm,
        bidx, idx, rtol, atol, wa_fld, cs2_fld, ic=ic, evolver=evolver, K=K,
        Gamma_dcdm=Gamma_dcdm, H0=H0, eta_flag=eta_flag, tswitch=tswitch,
        c_gamma=c_gamma, c_gamma_cap=c_gamma_cap)

    if y_carry is None:
        # initial conditions at tau_ini (always deep in tight coupling),
        # then pre-phase up to the first sampling point
        y0 = eq.initial_conditions(ic, k, jnp.asarray(tau_ini, k.dtype),
                                   ctx_at(tau_ini))
        h0 = 0.1 * tau_ini
        y, h, n0 = integrate_interval(y0, h0, tau_ini, taus[0])
        srcs0 = [eq.compute_sources(jnp.asarray(taus[0], k.dtype), y,
                                    ctx_at(taus[0]))[None]]
    else:
        y, h = y_carry
        n0 = (tau_ini * 0).astype(jnp.int32)
        srcs0 = []

    def step(carry, tpair):
        y, h, ns = carry
        t_a, t_b = tpair
        y, h, n = integrate_interval(y, h, t_a, t_b)
        src = eq.compute_sources(jnp.asarray(t_b, k.dtype), y, ctx_at(t_b))
        return (y, h, ns + n), src

    (y, h, ntot), srcs = jax.lax.scan(step, (y, h, n0), (taus[:-1], taus[1:]))
    return jnp.concatenate(srcs0 + [srcs], axis=0), ntot, (y, h)


# --- split-phase solvers -----------------------------------------------------
# The pre-sampling integration (tau_ini -> taus[0]) holds nearly ALL the work
# for high-k P(k) modes (oscillation-limited stepping is uniform per unit tau
# until the streaming approximation kicks in), so it must be windowed too:
# init sets ICs only, advance integrates a bounded per-lane [t_a, t_b] span,
# emit evaluates the source row at a sampling point. Each device launch is
# then bounded in wall-clock regardless of k.

def init_one_k(k, tau_ini, t_tca, t_ufa, t_rsa, t_ncfa, bg_spline, th_spline,
               ncdm, bidx, idx, rtol, wa_fld=0.0, cs2_fld=1.0, ic="ad", atol=1e-11,
               evolver="imex", K=0.0, Gamma_dcdm=0.0, H0=1.0, eta_flag=None,
               tswitch=None, c_gamma=0.4, c_gamma_cap=1.0e3):
    ctx_at, _ = _stepper(k, t_tca, t_ufa, t_rsa, t_ncfa, bg_spline, th_spline,
                         ncdm, bidx, idx, rtol, atol, wa_fld, cs2_fld, ic=ic,
                         evolver=evolver, K=K, Gamma_dcdm=Gamma_dcdm, H0=H0,
                         eta_flag=eta_flag, tswitch=tswitch,
                         c_gamma=c_gamma, c_gamma_cap=c_gamma_cap)
    y0 = eq.initial_conditions(ic, k, jnp.asarray(tau_ini, k.dtype),
                               ctx_at(tau_ini))
    return y0, 0.1 * tau_ini


def advance_one_k(k, t_tca, t_ufa, t_rsa, t_ncfa, t_a, t_b, bg_spline, th_spline,
                  ncdm, y, h, bidx, idx, rtol, wa_fld=0.0, cs2_fld=1.0, ic="ad",
                  atol=1e-11, evolver="imex", K=0.0, Gamma_dcdm=0.0, H0=1.0,
                  eta_flag=None, tswitch=None, c_gamma=0.4, c_gamma_cap=1.0e3):
    _, integrate_interval = _stepper(k, t_tca, t_ufa, t_rsa, t_ncfa, bg_spline,
                                     th_spline, ncdm, bidx, idx, rtol, atol,
                                     wa_fld, cs2_fld, ic=ic, evolver=evolver, K=K,
                                     Gamma_dcdm=Gamma_dcdm, H0=H0,
                                     eta_flag=eta_flag, tswitch=tswitch,
                                     c_gamma=c_gamma, c_gamma_cap=c_gamma_cap)
    return integrate_interval(y, h, t_a, t_b)


def emit_one_k(k, t_tca, t_ufa, t_rsa, t_ncfa, t, bg_spline, th_spline, ncdm, y,
               bidx, idx, rtol, wa_fld=0.0, cs2_fld=1.0, ic="ad", atol=1e-11,
               evolver="imex", K=0.0, Gamma_dcdm=0.0, H0=1.0, eta_flag=None,
               tswitch=None, c_gamma=0.4, c_gamma_cap=1.0e3):
    ctx_at, _ = _stepper(k, t_tca, t_ufa, t_rsa, t_ncfa, bg_spline, th_spline,
                         ncdm, bidx, idx, rtol, atol, wa_fld, cs2_fld, ic=ic,
                         evolver=evolver, K=K, Gamma_dcdm=Gamma_dcdm, H0=H0,
                         eta_flag=eta_flag, tswitch=tswitch,
                         c_gamma=c_gamma, c_gamma_cap=c_gamma_cap)
    return eq.compute_sources(jnp.asarray(t, k.dtype), y, ctx_at(t))


@lru_cache(maxsize=16)
def get_init_solver(bidx_key, idx, ic="ad", evolver="imex"):
    bidx = BgIdx(*bidx_key)

    def fn(k, tau_ini, t_tca, t_ufa, t_rsa, t_ncfa, bg_spline, th_spline,
           ncdm, sc):
        return init_one_k(k, tau_ini, t_tca, t_ufa, t_rsa, t_ncfa, bg_spline,
                          th_spline, ncdm, bidx, idx, ic=ic, evolver=evolver,
                          **_sc_kwargs(sc))

    return export_cached(jax.jit(jax.vmap(
        fn, in_axes=(0, 0, 0, 0, 0, 0, None, None, None,
                     SolverScalars.axes()))),
        tag="pt_init", static_key=(bidx_key, idx, ic, evolver))


@lru_cache(maxsize=16)
def get_advance_solver(bidx_key, idx, evolver="imex"):
    bidx = BgIdx(*bidx_key)

    def fn(k, t_tca, t_ufa, t_rsa, t_ncfa, t_a, t_b, bg_spline, th_spline,
           ncdm, y, h, sc):
        return advance_one_k(k, t_tca, t_ufa, t_rsa, t_ncfa, t_a, t_b,
                             bg_spline, th_spline, ncdm, y, h, bidx, idx,
                             evolver=evolver, **_sc_kwargs(sc))

    return export_cached(jax.jit(jax.vmap(
        fn, in_axes=(0, 0, 0, 0, 0, 0, 0, None, None, None, 0, 0,
                     SolverScalars.axes()))),
        tag="pt_advance", static_key=(bidx_key, idx, evolver))


@lru_cache(maxsize=16)
def get_emit_solver(bidx_key, idx, evolver="imex"):
    bidx = BgIdx(*bidx_key)

    def fn(k, t_tca, t_ufa, t_rsa, t_ncfa, t, bg_spline, th_spline, ncdm, y,
           sc):
        return emit_one_k(k, t_tca, t_ufa, t_rsa, t_ncfa, t, bg_spline,
                          th_spline, ncdm, y, bidx, idx, evolver=evolver,
                          **_sc_kwargs(sc))

    return export_cached(jax.jit(jax.vmap(
        fn, in_axes=(0, 0, 0, 0, 0, None, None, None, None, 0,
                     SolverScalars.axes()))),
        tag="pt_emit", static_key=(bidx_key, idx, evolver))


def compute_perturbations(params: CosmoParams, pr: PrecisionParams,
                          bg: BackgroundResult, bidx: BgIdx, th: ThermoResult,
                          l_scalar_max: int = 2500, k_max_for_pk: float = 10.0,
                          has_cls: bool = True, has_pk: bool = True,
                          z_max_pk: float = 5.0, ics=("ad",),
                          gauge: str = "synchronous",
                          k_max_cl_extra: float = 0.0,
                          has_nc: bool = False,
                          nbody: bool = False,
                          has_lcmb: bool = False) -> PerturbResult:
    """Full scalar perturbation stage: grids + schedule + batched solve."""
    # number counts behave like C_l's for the k grid and tau sampling
    # (reference has_cls includes nCl/sCl, perturbations_module.cpp:1700:
    # k_max_cmb = 2.4 l_scalar_max/tau0 applies even without tCl)
    ks = get_k_list(params, pr, bg, th, l_scalar_max=l_scalar_max,
                    k_max_for_pk=k_max_for_pk, has_cls=has_cls or has_nc,
                    has_pk=has_pk, k_max_cl_extra=k_max_cl_extra)
    taus = get_tau_sampling(params, pr, bg, bidx, th,
                            has_cmb=has_cls or has_nc, z_max_pk=z_max_pk)

    n_ncdm = params.N_ncdm

    k_max_cmb = (pr.k_max_tau0_over_l_max * l_scalar_max / float(bg.tau0)
                 if has_cls else 0.0)
    k_max_cmb = max(k_max_cmb, k_max_cl_extra)
    sched = get_k_schedule(ks, pr, bg, bidx, th, tau_first_sample=float(taus[0]),
                           n_ncdm=params.N_ncdm,
                           tol_ncdm_initial_w=pr.tol_ncdm_initial_w,
                           k_max_cmb=k_max_cmb)
    k_size_cmb = int(np.searchsorted(ks, k_max_cmb, side="right")) if has_cls else 0
    k_size_cmb = min(k_size_cmb + 1, len(ks))

    # curvature: K = -Omega_k H0^2 (reference input_module Omega_k -> K)
    K_curv = float(-params.Omega_k * float(bg.H0) ** 2)
    sgnK = 0 if params.Omega_k == 0.0 else (1 if K_curv > 0 else -1)
    has_dcdm = (params.Omega_ini_dcdm > 0.0) or (params.Omega_dcdmdr > 0.0)
    # momentum grid: strategy-aware rule (qm_auto minimal-N Laguerre search,
    # forced Laguerre/trapezoid sizes, or the default 16/32-node Laguerre;
    # background.ncdm_q_rule <- tools/quadrature.c get_qsampling)
    from ..background import ncdm_q_rule
    nq_ncdm, q_gauss, q_max_ncdm = ncdm_q_rule(params, pr)
    idx = PtIdx(l_max_g=pr.l_max_g, l_max_pol_g=pr.l_max_pol_g, l_max_ur=pr.l_max_ur,
                n_ncdm=n_ncdm, l_max_ncdm=pr.l_max_ncdm, has_fld=params.use_fld,
                gauge=gauge, sgnK=sgnK, has_dcdm=has_dcdm, l_max_dr=pr.l_max_dr,
                l_max_dr_col=pr.l_max_dr_col,
                has_scf=params.Omega_scf != 0.0,
                use_ppf=params.use_fld and params.use_ppf,
                has_idm_dr=params.Omega_idm_dr > 0.0,
                l_max_idr=pr.l_max_idr,
                idr_fluid=params.idr_nature == "fluid",
                alpha_idm_dr=tuple(params.alpha_idm_dr),
                beta_idr=tuple(params.beta_idr),
                q_size_ncdm=nq_ncdm, q_gauss=q_gauss, q_max_ncdm=q_max_ncdm,
                n_dncdm=params.N_ncdm_decay_dr if n_ncdm else 0,
                dec_col0=(bidx["rho_dr_ncdm0"]
                          if (n_ncdm and params.N_ncdm_decay_dr) else -1),
                nbody=nbody)
    taus_j = jnp.asarray(taus)
    ncdm_ctx = make_ncdm_ctx(params, bg, idx, bidx) if n_ncdm else None
    if idx.n_dncdm:
        # the ncdm fluid approximation forgets the Psi information the
        # decay collision term needs (the reference falls back to a dcdm-like
        # form there, :8470); keep the full hierarchy for decay runs
        sched = sched._replace(
            tau_ncdmfa_on=np.full_like(np.asarray(sched.tau_ncdmfa_on), 1e30))

    def run_ic(ic_name):
        """Chunked + windowed batched solve: the k-grid is processed in
        fixed-size chunks (sorted k => similar step counts per chunk, minimal
        lockstep waste) and the tau range in windows (bounded per-launch
        execution for device watchdogs); (y, h) carries across windows."""
        nk = len(sched.k)
        # multi-device: shard the lane axis over the mesh (GSPMD splits the
        # one jitted lockstep program across chips with no collectives); the
        # lane count is padded to a multiple of 8*n_dev so every device gets
        # equal lanes and small config tweaks reuse the compiled shapes
        from ...parallel.mesh import make_mesh, n_compute_devices, shard_lanes
        n_dev = n_compute_devices()
        mesh = make_mesh() if n_dev > 1 else None
        cs = min(pr.k_chunk_size * n_dev, nk + (-nk) % n_dev)
        ntau = len(taus)
        out_src = []
        out_steps = []
        per_k = [np.asarray(sched.k), np.asarray(sched.tau_ini),
                 np.asarray(sched.tau_tca_off), np.asarray(sched.tau_ufa_on),
                 np.asarray(sched.tau_rsa_on), np.asarray(sched.tau_ncdmfa_on)]
        rtol = pr.tol_perturb_integration
        bsp, tsp = bg.lntau_spline, th.lntau_spline
        ncdm_d = ncdm_ctx
        # "auto": f32 on accelerators (TPU f64 is software-emulated, ~4x
        # slower + ~25x slower compiles), f64 on CPU (native, and the golden
        # test contract runs there)
        use_f32 = (pr.perturb_dtype == "float32"
                   or (pr.perturb_dtype == "auto"
                       and jax.default_backend() != "cpu"))
        if use_f32:
            # below ~1e-4 the f32 state gains nothing: C_l error is set by
            # source/transfer discretization (measured identical at 1e-5 vs
            # 1e-4 against the g1 golden) while the step count pays 2.8x
            rtol = max(rtol, pr.tol_perturb_f32_floor)
        if use_f32:
            # f32 working state: the jitted solvers retrace on input dtype, so
            # casting k/tables here switches the whole compute path; time,
            # switch clipping and step control stay f64.
            def _c32(tree):
                return jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.float32)
                    if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, tree)
            bsp, tsp, ncdm_d = _c32(bsp), _c32(tsp), _c32(ncdm_ctx)
        if mesh is None and jax.default_backend() != "cpu":
            # tables are built on the pinned host stage: commit them to the
            # accelerator ONCE instead of re-transferring per launch
            dev0 = jax.local_devices(backend=jax.default_backend())[0]
            bsp, tsp, ncdm_d = jax.device_put((bsp, tsp, ncdm_d), dev0)
        elif mesh is not None:
            # replicate shared tables over the mesh: upstream stages may
            # return device-committed arrays (trace-cache calls commit their
            # outputs), and jit refuses sharded-lane args mixed with
            # single-device-committed ones
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(mesh, P())
            bsp, tsp, ncdm_d = jax.device_put((bsp, tsp, ncdm_d), rep)
        import os as _os
        import time as _time
        _dbg = bool(_os.environ.get("CLASSPP_TPU_DEBUG"))

        def _tick(tag, x):
            if _dbg:
                t0 = _time.time()
                jax.block_until_ready(x)
                print(f"[pert] {tag}: {_time.time() - t0:.2f}s", flush=True)
        # chunk boundaries: never mix CMB lanes with the P(k)-only tail in
        # one chunk (the tail's looser tolerances would be pinned by the CMB
        # class). Chunks stay at k_chunk_size lanes — measured on TPU v5e,
        # per-step cost grows beyond one (8,128) VPU register tile, so a
        # single merged launch over the whole k-grid LOSES (59.7 s vs 40.7 s
        # on the Planck config) despite halving the sequential step count.
        # Tolerances ride per-lane/per-component as traced arrays:
        #   rtol (cs,), atol (cs, nstate) — so every chunk still shares ONE
        # compiled executable per solver head.
        # k_max_cmb > 0 also for nCl-only configs (k_max_cl_extra); lanes
        # below it keep the tight C_l-class tolerances
        n_cmb_lanes = int(np.searchsorted(np.asarray(sched.k), k_max_cmb,
                                          side="right")) if k_max_cmb > 0 else 0
        starts = sorted({*range(0, min(n_cmb_lanes, nk), cs),
                         *range(min(n_cmb_lanes, nk), nk, cs)})
        nstate = idx.size
        # P(k)-tail per-component error floor: the relativistic hierarchies
        # are Silk-damped to sub-1e-4 amplitudes at k >> k_D and only feed
        # delta_m through the radiation-suppressed late metric; a 1e-4
        # absolute floor stops the controller resolving those oscillations
        # (measured: 8117 -> 1823 steps on the k = 11.3 lane with delta_m
        # moving by 1.3e-4, far inside the 1e-2 P(k) contract).
        # Newtonian gauge keeps the tail TIGHT: psi is algebraic in the
        # photon/ur shear (perturb_einstein, newtonian branch), so loosened
        # radiation rows leak straight into delta_cdm/delta_b and P(k) —
        # measured 4.2% at k=3.6 vs the g9 golden with the synchronous
        # tuning, 0.46% with the tail tight (round-5 fix). Synchronous
        # integrates matter against h' (a time integral of the loosened
        # noise), which self-averages inside the 1e-2 contract.
        newt = gauge == "newtonian"
        tail_factor = 1.0 if newt else pr.tol_perturb_tail_factor
        tail_atol = 1e-11 if newt else pr.atol_perturb_tail_radiation
        atol_rad = np.full(nstate, 3e-8)
        for s0, s1 in idx.radiation_slices:
            atol_rad[s0:s1] = tail_atol
        # rtol loosening zones for the tail: rows that feed the late-time
        # phi+psi (metric, cdm, baryons, fld/scf) KEEP the tight rtol up to
        # k_pp_max when the lensing potential is requested — C_l^phiphi at
        # l >~ 1000 is dominated (via Limber, chi = (l+1/2)/k) by exactly
        # these lanes; the lensing kernel is negligible inside chi < 900 Mpc,
        # so lanes beyond l_max/900 can't reach any requested l and go fully
        # loose. Radiation-hierarchy rows are loosened everywhere in the tail
        # (their Silk-damped oscillations dominate the step count; their
        # late-time metric feedback is negligible).
        k_pp_max = (l_scalar_max + 0.5) / 900.0 if has_lcmb else 0.0
        rtol_tail = np.full(nstate, rtol)
        for s0, s1 in idx.radiation_slices:
            rtol_tail[s0:s1] = rtol * tail_factor
        for i0 in starts:
            i1 = min(i0 + cs, nk if i0 >= n_cmb_lanes else max(n_cmb_lanes, i0 + 1))
            i1 = min(i1, nk)
            sl = [a[i0:i1] for a in per_k]
            pad = cs - len(sl[0])
            if pad:
                sl = [np.pad(a, (0, pad), mode="edge") for a in sl]
            args = [jnp.asarray(a) for a in sl]
            if use_f32:
                args[0] = args[0].astype(jnp.float32)
            if mesh is not None:
                args = shard_lanes(mesh, args)
            any_heavy = sl[0][-1] > k_max_cmb
            all_heavy = sl[0][0] > k_max_cmb
            # P(k)-only lanes answer to the 1e-2 P(k) contract, not the 3e-3
            # C_l one: looser rtol + the radiation atol floor cut the step
            # count of the k > k_cmb tail (the most expensive chunk). Both
            # rtol and atol ride PER-LANE, PER-COMPONENT (cs, nstate): CMB
            # lanes tight, phiphi-feeding mid-tail lanes tight except on the
            # radiation hierarchies, far tail fully loose.
            if all_heavy:
                lane_k = sl[0]
                rtol_c = np.where((lane_k <= k_pp_max)[:, None],
                                  rtol_tail[None, :],
                                  rtol * tail_factor)
                atol_c = np.broadcast_to(atol_rad, (cs, nstate)).copy()
            else:
                rtol_c = np.full((cs, nstate), rtol)
                atol_c = np.full((cs, nstate), 1e-11)
            if _dbg:
                print(f"[pert] chunk {i0}: k=[{sl[0][0]:.3f},{sl[0][-1]:.3f}] "
                      f"all_heavy={all_heavy}", flush=True)
            if pr.evolver == "imex":
                # stiff path: step counts are oscillation-limited
                # (~1e3/lane), so a couple of windows bound launch wall-clock
                n_pre = 2 if any_heavy else 1
                nwin = max(1, pr.tau_windows // 2)
            else:
                n_pre = 12 if any_heavy else 1
                nwin = max(1, pr.tau_windows * (8 if any_heavy else 1))
            sc = SolverScalars.make(
                rtol_c, atol=atol_c, wa_fld=params.wa_fld,
                cs2_fld=params.cs2_fld, K=K_curv,
                Gamma_dcdm=params.Gamma_dcdm / 299792.458, H0=float(bg.H0),
                eta_flag=1.0 if (ic_name == "ad" and gauge == "synchronous")
                else 0.0,
                tswitch=tuple(getattr(params, "temp_contributions",
                                      (1.0,) * 5))
                + (getattr(params, "eisw_lisw_split_z", 120.0),),
                c_gamma=params.c_gamma_over_c_fld,
                c_gamma_cap=pr.c_gamma_k_H_square_max)
            if mesh is not None:
                sc = sc._replace(**dict(zip(
                    ("rtol", "atol"), shard_lanes(mesh, [sc.rtol, sc.atol]))))
            init = get_init_solver(bidx.key, idx, ic=ic_name, evolver=pr.evolver)
            adv = get_advance_solver(bidx.key, idx, evolver=pr.evolver)
            emit = get_emit_solver(bidx.key, idx, evolver=pr.evolver)
            cont = get_window_solver(bidx.key, idx, evolver=pr.evolver)
            sw = list(args[2:6])
            # pre-phase: ICs at per-lane tau_ini, then advance in shared
            # tau-windows (per-lane spans clamped so late starters wait)
            y, h = init(*args, bsp, tsp, ncdm_d, sc)
            pts = np.linspace(min(float(sl[1].min()), taus[0]), taus[0], n_pre + 1)
            st = jnp.zeros((cs,), dtype=jnp.int32)
            for j in range(n_pre):
                t_a = jnp.maximum(args[1], pts[j])
                t_b = jnp.maximum(args[1], pts[j + 1])
                y, h, n = adv(args[0], *sw, t_a, t_b, bsp, tsp, ncdm_d, y, h, sc)
                _tick(f"chunk {i0} pre {j}", y)
                st = st + n
            pieces = [emit(args[0], *sw, taus_j[0], bsp, tsp, ncdm_d, y, sc)[:, None, :]]
            # uniform window length: every window runs the SAME
            # length-(wlen+1) tau slice (tail padded by repeating the last
            # tau; the padded zero-length intervals integrate trivially and
            # their duplicate source rows are trimmed) so all windows share
            # one executable
            taus_np = np.asarray(taus)
            wlen = max(1, -(-(ntau - 1) // nwin))
            # bucket the window length to a multiple of 256 intervals: the
            # tau-grid size varies by a few % across cosmologies/outputs, and
            # an exact-ntau window would retrace + recompile the (huge)
            # continuation head per config; padded tail intervals are
            # zero-length and integrate trivially
            wlen = -(-wlen // 256) * 256
            for b0 in range(0, ntau - 1, wlen):
                b1 = min(b0 + wlen, ntau - 1)
                tw = taus_np[b0: b0 + wlen + 1]
                if len(tw) < wlen + 1:
                    tw = np.pad(tw, (0, wlen + 1 - len(tw)), mode="edge")
                src, stw, (y, h) = cont(*args, jnp.asarray(tw),
                                        bsp, tsp, ncdm_d, y, h, sc)
                _tick(f"chunk {i0} win {b0}", src)
                st = st + stw
                pieces.append(src[:, : b1 - b0])
            n_keep = i1 - i0
            chunk_src = jnp.concatenate(pieces, axis=1)
            if mesh is not None:
                # gather each chunk's lane-sharded result to one device with
                # an explicit device_put COPY. Leaving the result sharded
                # makes every downstream eager op (concatenate here, the
                # transfer stage's spline_eval) compile an implicit
                # all-gather whose 8-thread rendezvous ABORTS the process
                # after 40 s on hosts with fewer cores than mesh devices
                # (xla/.../rendezvous.cc:127 termination timeout).
                dev0 = mesh.devices.flat[0]
                chunk_src = jax.device_put(chunk_src, dev0)
                st = jax.device_put(st, dev0)
            out_src.append(chunk_src[:n_keep])
            out_steps.append(st[:n_keep])
        src_all = jnp.concatenate(out_src, axis=0).astype(jnp.float64)
        return src_all, jnp.concatenate(out_steps, axis=0)

    sources, nsteps = run_ic("ad")
    # IC normalization knobs (precisions.h:219-220): the Boltzmann system is
    # linear in the initial amplitude, so scaling the sources post-solve is
    # exactly equivalent to scaling the ICs (and costs no retrace)
    if pr.curvature_ini != 1.0:
        sources = sources * pr.curvature_ini
    sources_iso = None
    iso = [ic for ic in ics if ic != "ad"]
    if iso:
        e_amp = pr.entropy_ini
        sources_iso = {ic: (run_ic(ic)[0] * e_amp if e_amp != 1.0
                            else run_ic(ic)[0]) for ic in iso}

    return PerturbResult(k=jnp.asarray(ks), tau=taus_j, sources=sources,
                         tau0=bg.tau0, k_size_cmb=k_size_cmb, stats_steps=nsteps,
                         sources_iso=sources_iso,
                         k_np=np.asarray(ks), tau_np=np.asarray(taus))
