"""k-grid, tau-sampling and per-k approximation switch times.

Mirrors the grid heuristics of the reference (perturb_get_k_list,
perturbations_module.cpp:1628-2251; perturb_timesampling_for_sources, :1247)
but computes every per-k quantity *vectorized*: switch times come from
inverting precomputed monotone trigger functions on the dense ln(tau) grid
(searchsorted/interp) instead of per-k bisection loops
(perturb_find_approximation_switches, :3006).

Grid construction is host-side setup (numpy): it fixes static shapes for the
jitted solve.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np

from ...config.params import CosmoParams
from ...config.precision import PrecisionParams
from ..background import BackgroundResult, BgIdx
from ..thermodynamics import ThermoResult, ThIdx


def get_k_list(params: CosmoParams, pr: PrecisionParams, bg, th,
               l_scalar_max: int = 2500, k_max_for_pk: float = 10.0,
               has_cls: bool = True, has_pk: bool = True,
               k_max_cl_extra: float = 0.0, m_mode: int = 0) -> np.ndarray:
    """Scalar k grid [1/Mpc]. Reference perturb_get_k_list (:1628):
    tanh step transition around k_rec below k_max_cmb, log spacing with BAO
    densification above. k_max_cl_extra raises the densely-sampled CMB-style
    region for number counts (ref :1728: k up to 2.4 l_lss/(tau0-tau(z_bin)))."""
    tau0 = float(bg.tau0)
    rs_rec = float(th.rs_rec)
    k_rec = 2.0 * math.pi / rs_rec

    # curvature: open models have k >= sqrt(-K) (q = sqrt(k^2+K) real;
    # perturb_get_k_list :1682), and the angular rescaling shrinks the flat
    # k_min/k_max mapping
    K = -params.Omega_k * float(bg.H0) ** 2
    ang = float(th.angular_rescaling)
    if K < 0.0:
        # q^2 = k^2 + (1+m)K must stay positive (m=0 scalars, 2 tensors)
        k_min = math.sqrt(-(1.0 + m_mode) * K + (pr.k_min_tau0 / tau0 / ang) ** 2)
    elif K > 0.0:
        # closed: the discrete spectrum starts at nu=3, q=3 sqrt(K), i.e.
        # k = sqrt((8-m)K) (reference perturb_get_k_list :1689; the transfer
        # module later interpolates sources at the exact integer-nu k's)
        k_min = math.sqrt((8.0 - m_mode - 1.0e-4) * K)
    else:
        k_min = pr.k_min_tau0 / tau0
    k_max_cmb = pr.k_max_tau0_over_l_max * l_scalar_max / tau0 / ang if has_cls else k_min
    k_max_cmb = max(k_max_cmb, k_max_cl_extra)
    k_max = max(k_max_cmb, k_max_for_pk if has_pk else 0.0)

    scale2 = float(bg.H0) ** 2 + abs(K)

    ks = [k_min]
    k = k_min
    while k < k_max_cmb:
        step = (pr.k_step_super
                + 0.5 * (math.tanh((k - k_rec) / k_rec / pr.k_step_transition) + 1.0)
                * (pr.k_step_sub - pr.k_step_super)) * k_rec
        step *= (k * k / scale2 + 1.0) / (k * k / scale2 + 1.0 / pr.k_step_super_reduction)
        k += step
        ks.append(k)
    # dark-acoustic-oscillation boost: interacting idm-idr with a steep
    # scattering index needs a denser P(k) tail (perturbations :1856)
    kpd_pk = pr.k_per_decade_for_pk
    if params.Omega_idm_dr > 0.0 and params.nindex_idm_dr >= 2.0:
        kpd_pk *= pr.idmdr_boost_k_per_decade_for_pk * params.nindex_idm_dr
    while k < k_max:
        k *= 10.0 ** (1.0 / (kpd_pk
                             + (pr.k_per_decade_for_bao - kpd_pk)
                             * (1.0 - math.tanh(((math.log(k) - math.log(pr.k_bao_center * k_rec))
                                                 / math.log(pr.k_bao_width)) ** 4))))
        ks.append(k)
    return np.array(ks)


def get_tau_sampling(params: CosmoParams, pr: PrecisionParams,
                     bg: BackgroundResult, bidx: BgIdx, th: ThermoResult,
                     has_cmb: bool = True, z_max_pk: float = 5.0) -> np.ndarray:
    """Source sampling times (reference perturb_timesampling_for_sources,
    :1247): start when aH/kappa' = start_sources_at_tau_c_over_tau_h, then
    step by perturb_sampling_stepsize / sqrt(rate_thermo^2 + rate_isw^2)."""
    # dense table in lntau for rate evaluation
    spl = th.lntau_spline
    n = spl.y.shape[0]
    lntau = np.asarray(spl.x0 + spl.dx * np.arange(n), dtype=np.float64)
    tau_grid = np.exp(lntau)
    # host-side grid construction is always f64 (device tables may be f32)
    thy = np.asarray(spl.y, dtype=np.float64)
    bgy = np.asarray(bg.lntau_spline.eval(lntau), dtype=np.float64)

    a = bgy[:, bidx["a"]]
    H = bgy[:, bidx["H"]]
    Hp = bgy[:, bidx["H_prime"]]
    aH = a * H
    app_a = Hp * a + 2.0 * aH * aH  # a''/a

    dk = thy[:, ThIdx.ix["dkappa"]]
    ddk = thy[:, ThIdx.ix["ddkappa"]]
    dddk = thy[:, ThIdx.ix["dddkappa"]]
    rate_thermo = np.sqrt(dk**2 + (ddk / dk) ** 2 + np.abs(dddk / dk))
    rate_isw2 = np.abs(2.0 * app_a - aH * aH)
    rate_cmb = np.sqrt(rate_thermo**2 + rate_isw2)

    if has_cmb:
        # tau_ini: aH/kappa' crossing of start_sources_at_tau_c_over_tau_h
        ratio = aH / dk
        i0 = np.searchsorted(ratio > pr.start_sources_at_tau_c_over_tau_h, True)
        i0 = int(np.clip(i0, 1, len(ratio) - 1))
        # linear refine in lntau
        r0, r1 = ratio[i0 - 1], ratio[i0]
        w = (pr.start_sources_at_tau_c_over_tau_h - r0) / (r1 - r0)
        tau_ini = float(np.exp(lntau[i0 - 1] + w * (lntau[i0] - lntau[i0 - 1])))
        rate = rate_cmb
    else:
        from ..background import tau_of_z
        tau_ini = float(tau_of_z(bg, z_max_pk + 1.0))
        rate = aH

    tau0 = float(bg.tau0)
    taus = [tau_ini]
    tau = tau_ini
    lr = np.log(tau_grid)
    while tau < tau0:
        r = np.interp(np.log(tau), lr, rate)
        tau = tau + pr.perturb_sampling_stepsize / r
        taus.append(min(tau, tau0))
    return np.array(taus)


class KSchedule(NamedTuple):
    """Per-k integration schedule: start time and approximation switch times."""

    k: np.ndarray            # (nk,)
    tau_ini: np.ndarray      # (nk,) integration start
    tau_tca_off: np.ndarray  # (nk,) tight coupling -> full hierarchy
    tau_ufa_on: np.ndarray   # (nk,) ur fluid approximation on
    tau_rsa_on: np.ndarray   # (nk,) radiation streaming on
    tau_ncdmfa_on: np.ndarray = None  # (nk,) ncdm fluid approximation on


def get_k_schedule(ks: np.ndarray, pr: PrecisionParams,
                   bg: BackgroundResult, bidx: BgIdx, th: ThermoResult,
                   tau_first_sample: float, n_ncdm: int = 0,
                   tol_ncdm_initial_w: float = 1.0e-3,
                   k_max_cmb: float = np.inf) -> KSchedule:
    """Vectorized computation of tau_ini (perturb_solve bisection, :2541) and
    approximation switch times (perturb_approximations triggers, :5443):
      TCA off  when tau_c/tau_h > trigger_h  OR  k*tau_c > trigger_k
      UFA on   when k*tau > ur_fluid_trigger
      RSA on   when k*tau > rs_trigger AND tau > tau_free_streaming
      start    when aH/kappa' > start_small_k  OR  k/aH > start_large_k
    All triggers are monotone in tau in the relevant era, so crossings are
    searchsorted inversions on the dense ln(tau) grid."""
    spl = th.lntau_spline
    n = spl.y.shape[0]
    lntau = np.asarray(spl.x0 + spl.dx * np.arange(n), dtype=np.float64)
    tau_grid = np.exp(lntau)
    # host-side grid construction is always f64 (device tables may be f32)
    thy = np.asarray(spl.y, dtype=np.float64)
    bgy = np.asarray(bg.lntau_spline.eval(lntau), dtype=np.float64)
    aH = bgy[:, bidx["a"]] * bgy[:, bidx["H"]]
    dk = thy[:, ThIdx.ix["dkappa"]]

    # restrict to the pre-recombination-to-recombination era where triggers
    # are monotone (kappa' decreasing, aH decreasing)
    i_rec = int(np.searchsorted(tau_grid, float(th.tau_rec) * 3.0))
    tg, aHg, dkg = tau_grid[:i_rec], aH[:i_rec], dk[:i_rec]

    def crossing_increasing(f, target):
        """first tau where monotonically-increasing f > target (log interp)"""
        i = np.searchsorted(f, target)
        i = np.clip(i, 1, len(f) - 1)
        w = (target - f[i - 1]) / (f[i] - f[i - 1])
        return np.exp(np.log(tg[i - 1]) + np.clip(w, 0, 1) * (np.log(tg[i]) - np.log(tg[i - 1])))

    # k-independent crossings
    ratio_h = aHg / dkg  # increasing
    tau_A = crossing_increasing(ratio_h, pr.tight_coupling_trigger_tau_c_over_tau_h)
    tau_C = crossing_increasing(ratio_h, pr.start_small_k_at_tau_c_over_tau_h)

    # k-dependent: k/kappa' > trig  <=>  kappa' < k/trig  (kappa' decreasing)
    # invert kappa'(tau): dkg decreasing -> flip for searchsorted
    logdk = np.log(dkg[::-1])
    logtg = np.log(tg[::-1])
    # P(k)-only modes (k above the CMB range) keep tight coupling longer:
    # the TCA slip/shear expansion is accurate to O((k tau_c)^2) and only the
    # matter transfer (1e-2 contract) is consumed at these k, while the
    # explicit-solver stiff phase after the switch costs steps ~ sqrt(k/trig).
    trig_k = np.where(ks > k_max_cmb,
                      pr.tight_coupling_trigger_tau_c_over_tau_k_pkonly,
                      pr.tight_coupling_trigger_tau_c_over_tau_k)
    kappa_target = np.log(ks / trig_k)
    tau_B = np.exp(np.interp(kappa_target, logdk, logtg))
    tau_tca_off = np.minimum(tau_A, tau_B)

    # start_large_k: k/aH > 0.07  <=>  aH < k/0.07 (aH decreasing)
    logaH = np.log(aHg[::-1])
    tau_D = np.exp(np.interp(np.log(ks / pr.start_large_k_at_tau_h_over_tau_k), logaH, logtg))
    tau_ini = np.minimum(tau_C, tau_D)
    tau_ini = np.minimum(tau_ini, tau_first_sample)
    # never before the background table starts
    tau_ini = np.maximum(tau_ini, tau_grid[0] * 1.0001)

    # free streaming time: first tau > tau_rec with 1/(kappa' tau) >= trigger
    i_after_rec = int(np.searchsorted(tau_grid, float(th.tau_rec)))
    fs_ratio = 1.0 / (dk[i_after_rec:] * tau_grid[i_after_rec:])
    j = np.searchsorted(fs_ratio > pr.radiation_streaming_trigger_tau_c_over_tau, True)
    tau_fs = tau_grid[i_after_rec + min(j, len(fs_ratio) - 1)]

    tau_rsa_on = np.maximum(pr.radiation_streaming_trigger_tau_over_tau_k / ks, tau_fs)
    tau_ufa_on = pr.ur_fluid_trigger_tau_over_tau_k / ks
    tau_ncdmfa_on = pr.ncdm_fluid_trigger_tau_over_tau_k / ks

    # ncdm must still be ultra-relativistic at the start (reference
    # perturb_solve :2568: |p/rho - 1/3| < tol_ncdm_initial_w)
    if n_ncdm:
        wdev = np.zeros_like(tau_grid)
        for i in range(n_ncdm):
            p_i = bgy[:, bidx[f"p_ncdm{i}"]]
            r_i = bgy[:, bidx[f"rho_ncdm{i}"]]
            # guard rows where the background table has not been filled yet
            # (rho=0): treat them as exactly relativistic instead of letting
            # NaN flow through the comparison below
            with np.errstate(invalid="ignore", divide="ignore"):
                dev_i = np.abs(3.0 * p_i / np.where(r_i > 0.0, r_i, 1.0) - 1.0)
            wdev = np.maximum(wdev, np.where(r_i > 0.0, dev_i, 0.0))
        j = np.searchsorted(wdev > 3.0 * tol_ncdm_initial_w, True)
        tau_rel = tau_grid[max(j - 1, 1)]
        tau_ini = np.minimum(tau_ini, tau_rel)

    return KSchedule(
        k=ks, tau_ini=tau_ini, tau_tca_off=tau_tca_off,
        tau_ufa_on=tau_ufa_on, tau_rsa_on=tau_rsa_on,
        tau_ncdmfa_on=tau_ncdmfa_on,
    )
