"""Tensor-mode perturbations (gravitational waves).

Reference physics: perturb_derivs tensor block (perturbations_module.cpp:
9045-9228), Einstein equation gw'' = -2 aH gw' - k^2 gw + gw_source
(perturb_einstein :6036), source assembly (perturb_total_stress_energy
:6620-6650), tensor sources S_T2 = -gw' e^-kappa + g P and S_P = sqrt(6) g P
(perturb_sources :7243-7273), adiabatic IC gw = 1/sqrt(6) (:5387), tensor
TCA-off remap (:4657) and the tm_massless_approximation neutrino treatment
(rho_ur + 3 p_ncdm driving an explicitly evolved massless hierarchy).

Same lockstep design as the scalar solver: one static state, masked TCA/RSA,
vmapped RKCK over the tensor k-grid.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config.precision import PrecisionParams
from ...ops.ode import rkck_integrate
from ..thermodynamics import ThIdx

_SQRT6 = math.sqrt(6.0)


@dataclass(frozen=True)
class TnIdx:
    """Tensor state layout: gw, gw', photon temperature F~_l (l=0..l_max_g_ten),
    photon polarization G~_l, ur hierarchy, and (tensor method = exact) the
    per-species massive-ncdm Psi_l(q) hierarchies.

    method selects the neutrino treatment (input 'tensor method',
    input_module.cpp:2911-2920; dispatch perturbations_module.cpp:594-609):
    'photons' = no neutrino contribution at all, 'massless' (default) = one
    explicitly evolved massless hierarchy driven by rho_ur + 3 p_ncdm,
    'exact' = massless hierarchy for ur only + full Psi_l(q) ncdm hierarchies
    (perturb_derivs :9158-9205, gw source :6700-6745)."""

    l_max_g_ten: int = 5
    l_max_pol_g_ten: int = 5
    l_max_ur: int = 17
    n_ncdm: int = 0
    sgnK: int = 0
    method: str = "massless"     # photons | massless | exact
    q_size_ncdm: int = 0
    l_max_ncdm: int = 17

    gw = 0
    gwdot = 1

    @property
    def F(self):
        return 2

    @property
    def n_F(self):
        return self.l_max_g_ten + 1

    @property
    def G(self):
        return self.F + self.n_F

    @property
    def n_G(self):
        return self.l_max_pol_g_ten + 1

    @property
    def ur(self):
        return self.G + self.n_G

    @property
    def n_ur(self):
        # tm_photons_only evolves no neutrino hierarchy at all
        # (perturb_vector_init :3552 gates the ur block on evolve_tensor_ur)
        return 0 if self.method == "photons" else self.l_max_ur + 1

    @property
    def n_l_ncdm(self):
        return self.l_max_ncdm + 1

    @property
    def ncdm(self):
        return self.ur + self.n_ur

    @property
    def n_ncdm_block(self):
        if self.method != "exact":
            return 0
        return self.n_ncdm * self.q_size_ncdm * self.n_l_ncdm

    @property
    def size(self):
        return self.ncdm + self.n_ncdm_block


class TensorCtx(NamedTuple):
    k: jnp.ndarray
    tca_on: jnp.ndarray
    rsa_on: jnp.ndarray
    bg_spline: object
    th_spline: object
    bidx: object
    idx: TnIdx
    rho_rel_extra: jnp.ndarray   # 3*sum_s p_ncdm columns? passed as 0 for now
    K: float = 0.0               # curvature [Mpc^-2]
    ncdm: object = None          # NcdmCtx when method == "exact" and n_ncdm


def _hier_deriv(Fv, k, tau, kap=None, s_of_l=None, cotKgen=None):
    """Generic tensor hierarchy derivative for F_l, l=0..lmax, with the CLASS
    variable convention (F0=delta, F1 s.t. theta=(3k/4)F1 handled by caller)
    and the curvature coefficients s_l / cotKgen (flat: 1 and 1/(k tau)).
    Used for the l>=3 tail; low moments are set explicitly by the caller."""
    nl = Fv.shape[0]
    ls = jnp.arange(0, nl, dtype=Fv.dtype)
    sl = s_of_l(ls) if s_of_l is not None else 1.0
    sl1 = s_of_l(ls + 1.0) if s_of_l is not None else 1.0
    Fm1 = jnp.concatenate([jnp.zeros((1,)), Fv[:-1]])
    Fp1 = jnp.concatenate([Fv[1:], jnp.zeros((1,))])
    d = k / (2.0 * ls + 1.0) * (ls * sl * Fm1 - (ls + 1.0) * sl1 * Fp1)
    sl_last = s_of_l(float(nl - 1)) if s_of_l is not None else 1.0
    ck = cotKgen if cotKgen is not None else 1.0 / (k * tau)
    d = d.at[-1].set(k * (sl_last * Fv[-2] - nl * ck * Fv[-1]))
    if kap is not None:
        d = d - kap * Fv
    return d


def rhs_full(tau, y, ctx: TensorCtx):
    idx = ctx.idx
    bidx = ctx.bidx
    k = ctx.k
    k2 = k * k
    bgv = ctx.bg_spline.eval(jnp.log(tau))
    thv = ctx.th_spline.eval(jnp.log(tau))
    a = bgv[bidx["a"]]
    aH = a * bgv[bidx["H"]]
    a2 = a * a
    rho_g = bgv[bidx["rho_g"]]
    rho_ur = bgv[bidx["rho_ur"]]
    kap = thv[ThIdx.ix["dkappa"]]
    g = thv[ThIdx.ix["g"]]
    emk = thv[ThIdx.ix["exp_m_kappa"]]

    tca = ctx.tca_on
    rsa = ctx.rsa_on
    hier_on = (~tca) & (~rsa)

    # curvature coefficients (shared s_l array, perturb_workspace :2532)
    K = ctx.K

    def s_of_l(lv):
        return jnp.sqrt(jnp.maximum(1.0 - K * (lv * lv - 1.0) / k2, 0.0))

    s_l2 = s_of_l(2.0)
    s_l3 = s_of_l(3.0)
    s_l4 = s_of_l(4.0)
    s2 = s_l2 * s_l2
    if ctx.idx.sgnK == 0:
        cotKgen = 1.0 / (k * tau)
    else:
        sab = jnp.sqrt(jnp.abs(K))
        tanK = jnp.tan(sab * tau) if ctx.idx.sgnK > 0 else jnp.tanh(sab * tau)
        cotKgen = sab / (k * tanK)

    gw = y[idx.gw]
    gwdot = y[idx.gwdot]
    F = jax.lax.dynamic_slice(y, (idx.F,), (idx.n_F,))
    G = jax.lax.dynamic_slice(y, (idx.G,), (idx.n_G,))

    delta_g, theta_g, shear_g = F[0], F[1], F[2]   # F[1] stores theta_g

    gw_src_g = jnp.where(hier_on,
                         -_SQRT6 * 4.0 * a2 * rho_g * (delta_g / 15.0 + 4.0 / 21.0 * shear_g + F[4] / 35.0),
                         0.0)

    # gw source from neutrinos (perturb_total_stress_energy :6625-6650):
    # tm_photons_only has none; in the default tm_massless_approximation the
    # massive species contribute their relativistic part 3 p_ncdm to the
    # density driving the explicitly evolved massless hierarchy; tm_exact
    # drives it with rho_ur only and integrates the ncdm Psi_l(q) exactly.
    if idx.n_ur:
        U = jax.lax.dynamic_slice(y, (idx.ur,), (idx.n_ur,))
        delta_ur, theta_ur, shear_ur = U[0], U[1], U[2]
        rho_rel = rho_ur
        if idx.method == "massless":
            for i in range(idx.n_ncdm):
                rho_rel = rho_rel + 3.0 * bgv[bidx[f"p_ncdm{i}"]]
        gw_src_ur = -_SQRT6 * 4.0 * a2 * rho_rel * (delta_ur / 15.0 + 4.0 / 21.0 * shear_ur + U[4] / 35.0)
    else:
        gw_src_ur = 0.0

    gw_src_nc = 0.0
    if idx.n_ncdm_block:
        # exact ncdm contribution (perturb_total_stress_energy :6700-6745):
        # sum_q q^4/eps w_q (Psi0/15 + 2/21 Psi2 + 1/35 Psi4) per species,
        # with the same pref/a^4 normalization as the scalar stress tensor
        nc = ctx.ncdm
        ns, nq, nl = idx.n_ncdm, idx.q_size_ncdm, idx.n_l_ncdm
        Psi = jax.lax.dynamic_slice(y, (idx.ncdm,), (idx.n_ncdm_block,)).reshape(ns, nq, nl)
        eps = jnp.sqrt(nc.q[None, :] ** 2 + (a * nc.x_fac[:, None]) ** 2)
        qw = nc.w * nc.q[None, :] ** 2
        integ = jnp.sum(qw * nc.q[None, :] ** 2 / eps *
                        (Psi[:, :, 0] / 15.0 + 2.0 / 21.0 * Psi[:, :, 2]
                         + Psi[:, :, 4] / 35.0), axis=1)
        gw_src_nc = -_SQRT6 * 4.0 * a2 * jnp.sum(nc.pref / (a2 * a2) * integ)

    # single tensor Einstein equation (perturb_einstein :6039): note the
    # curvature shift k^2 -> k^2 + 2K
    gw_pp = -2.0 * aH * gwdot - (k2 + 2.0 * K) * gw \
        + gw_src_g + gw_src_ur + gw_src_nc

    # tensor polarization combo P2 (perturb_derivs :9050-9062)
    P2 = -(1.0 / _SQRT6) * (delta_g / 10.0 + 2.0 / 7.0 * shear_g + 3.0 / 70.0 * F[4]
                            - 3.0 / 5.0 * G[0] + 6.0 / 7.0 * G[2] - 3.0 / 70.0 * G[4])

    dy = jnp.zeros_like(y)
    dy = dy.at[idx.gw].set(gwdot)
    dy = dy.at[idx.gwdot].set(gw_pp)

    # photon temperature hierarchy (perturb_derivs tensor block :9075-9110)
    dF = _hier_deriv(F, k, tau, kap, s_of_l, cotKgen)
    dF = dF.at[0].set(-4.0 / 3.0 * theta_g - kap * (delta_g + _SQRT6 * P2) + _SQRT6 * gwdot)
    dF = dF.at[1].set(k2 * (delta_g / 4.0 - s_l2 * shear_g) - kap * theta_g)
    dF = dF.at[2].set(4.0 / 15.0 * s_l2 * theta_g - 3.0 / 10.0 * k * s_l3 * F[3] - kap * shear_g)
    dF = dF.at[3].set(k / 7.0 * (6.0 * s_l3 * shear_g - 4.0 * s_l4 * F[4]) - kap * F[3])
    dy = jax.lax.dynamic_update_slice(dy, jnp.where(hier_on, dF, jnp.zeros_like(dF)), (idx.F,))

    # photon polarization
    dG = _hier_deriv(G, k, tau, kap, s_of_l, cotKgen)
    dG = dG.at[0].set(-k * G[1] - kap * (G[0] - _SQRT6 * P2))
    dy = jax.lax.dynamic_update_slice(dy, jnp.where(hier_on, dG, jnp.zeros_like(dG)), (idx.G,))

    # ur hierarchy (no scattering; evolved unless tm_photons_only, :9133-9155)
    if idx.n_ur:
        dU = _hier_deriv(U, k, tau, None, s_of_l, cotKgen)
        dU = dU.at[0].set(-4.0 / 3.0 * theta_ur + _SQRT6 * gwdot)
        dU = dU.at[1].set(k2 * (delta_ur / 4.0 - s2 * shear_ur))
        dU = dU.at[2].set(4.0 / 15.0 * theta_ur - 3.0 / 10.0 * k * s_l3 / s_l2 * U[3])
        dU = dU.at[3].set(k / 7.0 * (6.0 * s_l3 * s_l2 * shear_ur - 4.0 * s_l4 * U[4]))
        dy = jax.lax.dynamic_update_slice(dy, dU, (idx.ur,))

    if idx.n_ncdm_block:
        # exact ncdm Psi_l(q) hierarchy (perturb_derivs :9158-9205):
        # dPsi0 = -(qk/eps) Psi1 - sqrt(6)/4 gw' dlnf0/dlnq;
        # dPsi_l = (qk/eps)/(2l+1) (l s_l Psi_{l-1} - (l+1) s_{l+1} Psi_{l+1});
        # truncation dPsi_L = (qk/eps) Psi_{L-1} - (L+1) k cotKgen Psi_L
        nc = ctx.ncdm
        ns, nq, nl = idx.n_ncdm, idx.q_size_ncdm, idx.n_l_ncdm
        Psi = jax.lax.dynamic_slice(y, (idx.ncdm,), (idx.n_ncdm_block,)).reshape(ns, nq, nl)
        eps = jnp.sqrt(nc.q[None, :] ** 2 + (a * nc.x_fac[:, None]) ** 2)
        qke = k * nc.q[None, :] / eps                         # (ns, nq)
        ls = jnp.arange(nl, dtype=y.dtype)
        sl = s_of_l(ls)
        sl1 = s_of_l(ls + 1.0)
        Pm1 = jnp.concatenate([jnp.zeros((ns, nq, 1), y.dtype), Psi[:, :, :-1]], axis=2)
        Pp1 = jnp.concatenate([Psi[:, :, 1:], jnp.zeros((ns, nq, 1), y.dtype)], axis=2)
        dP = qke[:, :, None] / (2.0 * ls + 1.0) * (
            ls * sl * Pm1 - (ls + 1.0) * sl1 * Pp1)
        dP = dP.at[:, :, 0].set(-qke * Psi[:, :, 1]
                                - 0.25 * _SQRT6 * gwdot * nc.dlnf0)
        dP = dP.at[:, :, -1].set(qke * Psi[:, :, -2]
                                 - nl * k * cotKgen * Psi[:, :, -1])
        dy = jax.lax.dynamic_update_slice(dy, dP.reshape(-1), (idx.ncdm,))

    # sources (perturb_sources :7243-7273)
    P_src = jnp.where(rsa, 0.0,
                      jnp.where(tca, 2.0 / 5.0 * _SQRT6 * gwdot / kap, P2))
    s_t2 = -gwdot * emk + g * P_src
    s_p = _SQRT6 * g * P_src
    return dy, (s_t2, s_p)


def rhs(tau, y, ctx):
    return rhs_full(tau, y, ctx)[0]


def tensor_ic(idx: TnIdx, gw_ini: float = 1.0, k=None, K: float = 0.0):
    """Adiabatic tensor IC gw = gw_ini/sqrt(6) (:5387); in curved space the
    eigentensor-contraction factor F(k^2/K) and, for open models, the bubble-
    nucleation tanh factor are absorbed here so that the primordial P_h(k)
    stays flat-form (perturb_initial_conditions :5387-5404)."""
    y = jnp.zeros((idx.size,))
    amp = gw_ini / _SQRT6
    if idx.sgnK != 0 and k is not None:
        k2 = k * k
        amp = amp * jnp.sqrt(k2 * (k2 - K) / ((k2 + 3.0 * K) * (k2 + 2.0 * K)))
        if idx.sgnK < 0:
            q2 = jnp.maximum(k2 + 3.0 * K, 0.0)
            amp = amp * jnp.sqrt(jnp.tanh(math.pi / 2.0 * jnp.sqrt(q2)
                                          / jnp.sqrt(-K)))
            amp = jnp.where(k2 + 3.0 * K >= 0.0, amp, 0.0)
    return y.at[idx.gw].set(amp)


def remap_tca_off(y, tau, ctx: TensorCtx):
    """perturb_vector_init :4657: seed delta_g and G0 from gw'."""
    idx = ctx.idx
    thv = ctx.th_spline.eval(jnp.log(tau))
    kap = thv[ThIdx.ix["dkappa"]]
    gwdot = y[idx.gwdot]
    y = y.at[idx.F + 0].set(-4.0 / 3.0 * gwdot / kap)
    y = y.at[idx.G + 0].set(1.0 / 3.0 * gwdot / kap)
    return y


def remap_rsa_on(y, ctx: TensorCtx):
    idx = ctx.idx
    y = jax.lax.dynamic_update_slice(y, jnp.zeros((idx.n_F,)), (idx.F,))
    y = jax.lax.dynamic_update_slice(y, jnp.zeros((idx.n_G,)), (idx.G,))
    return y


def solve_one_k(k, tau_ini, t_tca, t_ufa_unused, t_rsa, taus, bg_spline, th_spline,
                bidx, idx, rtol, K=0.0, ncdm=None):
    """Integrate one tensor k-mode, emitting (S_T2, S_P) at every sample.
    Single while_loop per interval with per-step flags (see scalar solver)."""
    from ...ops.ode import rkck_step

    switches = jnp.stack([t_tca, t_rsa])

    def ctx_at(t):
        return TensorCtx(k=k, tca_on=t < t_tca, rsa_on=t >= t_rsa,
                         bg_spline=bg_spline, th_spline=th_spline, bidx=bidx,
                         idx=idx, rho_rel_extra=jnp.asarray(0.0), K=K,
                         ncdm=ncdm)

    def integrate_interval(y, h, t_a, t_b):
        def cond(st):
            t, y, h, n, done = st
            return jnp.logical_and(~done, n < 100000)

        def body(st):
            t, y, h, n, done = st
            cand = jnp.where(switches > t * (1.0 + 1e-14), switches, jnp.inf)
            t_stop = jnp.minimum(jnp.min(cand), t_b)
            h_eff = jnp.minimum(h, t_stop - t)
            y_new, err, k1 = rkck_step(rhs, t, y, h_eff, ctx_at(t))
            scale = rtol * (jnp.abs(y) + jnp.abs(h_eff * k1) + 1e-30) + 1e-11
            ratio = jnp.max(jnp.abs(err) / scale)
            ratio = jnp.where(jnp.isfinite(ratio), ratio, jnp.inf)
            accept = ratio <= 1.0
            fac = jnp.clip(0.9 * jnp.where(ratio > 0, ratio ** -0.2, 5.0), 0.2, 5.0)
            clipped = h_eff < h
            h_next = jnp.where(accept & clipped, jnp.maximum(h, h_eff * fac), h_eff * fac)
            t_new = jnp.where(accept, t + h_eff, t)
            y_out = jnp.where(accept, y_new, y)
            crossed = accept & (t_new >= switches) & (t < switches)
            y_out = jnp.where(crossed[0], remap_tca_off(y_out, t_new, ctx_at(t_new)), y_out)
            y_out = jnp.where(crossed[1], remap_rsa_on(y_out, ctx_at(t_new)), y_out)
            done_new = t_new >= t_b * (1.0 - 1e-15)
            return (t_new, y_out, jnp.maximum(h_next, 1e-300), n + 1, done_new)

        # scalar carries derived from h: consistent vma types under shard_map
        zero_v = h * 0.0
        n0 = zero_v.astype(jnp.int32)
        t, y, h, n, _ = jax.lax.while_loop(
            cond, body, (t_a + zero_v, y, h, n0, (t_b + zero_v) <= t_a))
        return y, h, n

    y = tensor_ic(idx, k=k, K=K)
    h = 0.1 * tau_ini
    y, h, n0 = integrate_interval(y, h, tau_ini, taus[0])
    _, s0 = rhs_full(taus[0], y, ctx_at(taus[0]))

    def step(carry, tpair):
        y, h, n = carry
        t_a, t_b = tpair
        y, h, nj = integrate_interval(y, h, t_a, t_b)
        _, (s_t2, s_p) = rhs_full(t_b, y, ctx_at(t_b))
        return (y, h, n + nj), jnp.stack([s_t2, s_p])

    (_, _, ntot), srcs = jax.lax.scan(step, (y, h, n0), (taus[:-1], taus[1:]))
    return jnp.concatenate([jnp.stack(s0)[None], srcs], axis=0), ntot


@lru_cache(maxsize=4)
def get_tensor_solver(bidx_key, idx):
    """rtol and K ride as TRACED trailing args so different cosmologies /
    precision settings share one executable (see scalar SolverScalars)."""
    from ..background import BgIdx

    bidx = BgIdx(*bidx_key)

    def fn(k, tau_ini, t_tca, t_ufa, t_rsa, taus, bg_spline, th_spline, rtol,
           K, ncdm):
        return solve_one_k(k, tau_ini, t_tca, t_ufa, t_rsa, taus, bg_spline,
                           th_spline, bidx, idx, rtol, K=K, ncdm=ncdm)

    from ...ops.export_cache import export_cached
    return export_cached(jax.jit(jax.vmap(
        fn, in_axes=(0, 0, 0, 0, 0, None, None, None, None, None, None))),
        tag="pt_tensor", static_key=(bidx_key, idx))


class TensorResult(NamedTuple):
    k: jnp.ndarray
    tau: jnp.ndarray
    sources: jnp.ndarray     # (nk, ntau, 2): S_T2, S_P
    tau0: jnp.ndarray
    k_np: "np.ndarray" = None  # host copy (see PerturbResult.k_np)


def compute_tensor_perturbations(params, pr: PrecisionParams, bg, bidx, th,
                                 l_tensor_max: int = 500) -> TensorResult:
    from .grids import get_k_list, get_k_schedule, get_tau_sampling

    ks = get_k_list(params, pr, bg, th, l_scalar_max=l_tensor_max,
                    k_max_for_pk=0.0, has_cls=True, has_pk=False, m_mode=2)
    taus = get_tau_sampling(params, pr, bg, bidx, th, has_cmb=True)
    sched = get_k_schedule(ks, pr, bg, bidx, th, tau_first_sample=float(taus[0]))
    K_curv = float(-params.Omega_k * float(bg.H0) ** 2)
    sgnK = 0 if params.Omega_k == 0.0 else (1 if K_curv > 0 else -1)
    method = getattr(params, "tensor_method", "massless")
    ncdm_ctx = None
    nq_t = 0
    if method == "exact" and params.N_ncdm:
        from ...classy import CosmoSevereError
        if getattr(params, "N_ncdm_decay_dr", 0):
            raise CosmoSevereError(
                "tensor method = exact with decaying ncdm not implemented")
        from ..background import ncdm_q_rule
        from .solve import make_ncdm_ctx
        nq_t, q_gauss, q_max = ncdm_q_rule(params, pr)
        shim = TnIdx(pr.l_max_g_ten, pr.l_max_pol_g_ten, pr.l_max_ur,
                     params.N_ncdm, sgnK=sgnK, method=method,
                     q_size_ncdm=nq_t, l_max_ncdm=pr.l_max_ncdm)
        # make_ncdm_ctx reads q_size/q_gauss/q_max + n_ncdm off the idx
        shim_ns = type("QS", (), dict(q_size_ncdm=nq_t, q_gauss=q_gauss,
                                      q_max_ncdm=q_max, n_ncdm=params.N_ncdm,
                                      n_dncdm=0))
        ncdm_ctx = make_ncdm_ctx(params, bg, shim_ns)
    idx = TnIdx(pr.l_max_g_ten, pr.l_max_pol_g_ten, pr.l_max_ur, params.N_ncdm,
                sgnK=sgnK, method=method, q_size_ncdm=nq_t,
                l_max_ncdm=pr.l_max_ncdm)
    solve = get_tensor_solver(bidx.key, idx)
    srcs, _ = solve(jnp.asarray(sched.k), jnp.asarray(sched.tau_ini),
                    jnp.asarray(sched.tau_tca_off), jnp.asarray(sched.tau_ufa_on),
                    jnp.asarray(sched.tau_rsa_on),
                    jnp.asarray(taus), bg.lntau_spline, th.lntau_spline,
                    jnp.float64(pr.tol_perturb_integration), jnp.float64(K_curv),
                    ncdm_ctx)
    if pr.gw_ini != 1.0:
        # linear system: scaling sources post-solve == scaling the tensor IC
        # amplitude gw_ini (precisions.h:221)
        srcs = srcs * pr.gw_ini
    return TensorResult(k=jnp.asarray(ks), tau=jnp.asarray(taus), sources=srcs,
                        tau0=bg.tau0, k_np=np.asarray(ks))
