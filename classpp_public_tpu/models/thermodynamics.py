"""Thermodynamics (L4): recombination + reionization history.

TPU-native rebuild of the reference ThermodynamicsModule
(source/thermodynamics_module.cpp). Recombination follows the published
RECFAST 1.5 physics (Seager, Sasselov & Scott 1999; Wong, Moss & Scott 2008)
exactly as configured by the reference precision registry
(thermodynamics_recombination_with_recfast, :3335 and
thermodynamics_derivs_with_recfast, :3727) — but as a single lax.scan over the
fixed 20000-point z grid with fixed RK4 substeps, instead of a C loop around
an adaptive integrator. The staged Saha approximations and their smoothed
transitions (f1/f2 smoothsteps, source/thermodynamics.h:46-47) become masked
selects inside the scan.

Reionization (reio_camb tanh parametrization,
thermodynamics_reionization_function :1893) is evaluated on a dense fixed z
grid; the tau_reio -> z_reio inversion (reference: bisection, :2159) is done
by evaluating tau(z_reio) for a whole *vector* of candidate redshifts at once
and inverting by monotone interpolation — no sequential root-find.

Outputs are resampled onto the shared uniform-ln(tau) runtime grid used by the
perturbation hot loop.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial
from pathlib import Path
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as const
from ..config.params import CosmoParams
from ..config.precision import PrecisionParams
from ..ops.splines import (UniformSpline, spline_d2, spline_eval,
                           spline_integrate, spline_integrate_reverse)
from .background import BackgroundResult, BgIdx

# ---------------------------------------------------------------------------
# RECFAST atomic data (public values, reference source/thermodynamics.h:360-420)

_Lambda_H = 8.2245809          # 2s->1s two-photon rate [1/s]
_Lambda_He = 51.3
_L_H_ion = 1.096787737e7       # level energies in 1/m
_L_H_alpha = 8.225916453e6
_L_He1_ion = 1.98310772e7
_L_He2_ion = 4.389088863e7
_L_He_2s = 1.66277434e7
_L_He_2p = 1.71134891e7
_A2P_s = 1.798287e9
_A2P_t = 177.58
_L_He_2Pt = 1.690871466e7
_L_He_2St = 1.5985597526e7
_L_He2St_ion = 3.8454693845e6
_sigma_He_2Ps = 1.436289e-22
_sigma_He_2Pt = 1.484872e-22
_a_PPB, _b_PPB, _c_PPB, _d_PPB = 4.309, -0.6166, 0.6703, 0.5300
_T_0 = 10.0 ** 0.477121
_a_VF, _b_VF = 10.0 ** (-16.744), 0.711
_T_1 = 10.0 ** 5.114
_a_trip, _b_trip = 10.0 ** (-16.306), 0.761


def _f1(x):
    """Smoothstep 0->1 for x in [-1, 1] (reference thermodynamics.h:46)."""
    return -0.75 * x * (x * x / 3.0 - 1.0) + 0.5


def _f2(x):
    """Smoothstep 0->1 for x in [0, 1] (reference thermodynamics.h:47)."""
    return x * x * (0.5 - x / 3.0) * 6.0


class RecfastCtx(NamedTuple):
    """Precomputed constants for the recfast ODE (one per cosmology)."""

    fHe: jnp.ndarray
    Nnow: jnp.ndarray       # hydrogen number density today [1/m^3]
    Tnow: jnp.ndarray       # K
    fu: jnp.ndarray         # H fudge
    H0_s: jnp.ndarray       # H0 in 1/s
    CDB: jnp.ndarray
    CDB_He: jnp.ndarray
    CB1: jnp.ndarray
    CB1_He1: jnp.ndarray
    CB1_He2: jnp.ndarray
    CR: jnp.ndarray
    CK: jnp.ndarray
    CK_He: jnp.ndarray
    CL: jnp.ndarray
    CL_He: jnp.ndarray
    CT: jnp.ndarray
    Bfact: jnp.ndarray
    H_of_z: UniformSpline   # H [1/Mpc] and H' on uniform loga grid (cols: H, H_prime)
    YHe: jnp.ndarray
    # DM energy injection (annihilation [m^3/s/kg], decay [1/s], shape params,
    # and rho_cdm today in J/m^3): thermodynamics_onthespot_energy_injection
    # (thermodynamics_module.cpp:1755-1795)
    inj: tuple = (0.0,) * 8
    rho_cdm_J: jnp.ndarray = 0.0
    # beyond-on-the-spot deposition: UniformSpline of ln(energy_rate) on the
    # x = -log1p(z) axis (None means on-the-spot; thermodynamics_module.cpp
    # :1810-1870 delayed-deposition redshift convolution)
    inj_conv: object = None


# ---------------------------------------------------------------------------
# BBN helium abundance


@lru_cache(maxsize=4)
def _bbn_table(fname: str = "sBBN_2017.dat"):
    """sBBN_*.dat layout: header line "n_omegab n_dneff", then rows
    (omega_b, DeltaNeff, YHe) grouped by DeltaNeff with omega_b varying
    fastest. fname: shipped table name (sBBN.dat / sBBN_2017.dat /
    sBBN_2017_marcucci.dat; reference precisions.h:76 sBBN_file) or an
    absolute path."""
    path = Path(fname) if fname.startswith("/") \
        else Path(__file__).parent.parent / "data" / fname
    rows = []
    with open(path) as f:
        for line in f:
            s = line.split("#")[0].split()
            if len(s) == 3:
                rows.append([float(v) for v in s])
    raw = np.array(rows)
    omegab = np.unique(raw[:, 0])
    dneff = np.unique(raw[:, 1])
    yp = raw[:, 2].reshape(len(dneff), len(omegab))
    return omegab, dneff, yp


def helium_from_bbn_np(omega_b: float, N_eff: float,
                       fname: str = "sBBN_2017.dat") -> float:
    """YHe from the standard BBN table by bilinear interpolation (reference
    thermodynamics_helium_from_bbn, thermodynamics_module.cpp:1535;
    data table bbn/sBBN_2017.dat). N_eff must count ALL relativistic species
    at BBN, including (then-relativistic) ncdm."""
    omegab_g, dneff_g, yp = _bbn_table(fname)
    dneff = N_eff - 3.046
    # bilinear interpolation
    i = np.clip(np.searchsorted(omegab_g, omega_b) - 1, 0, len(omegab_g) - 2)
    j = np.clip(np.searchsorted(dneff_g, dneff) - 1, 0, len(dneff_g) - 2)
    tx = (omega_b - omegab_g[i]) / (omegab_g[i + 1] - omegab_g[i])
    ty = (dneff - dneff_g[j]) / (dneff_g[j + 1] - dneff_g[j])
    return float(
        yp[j, i] * (1 - tx) * (1 - ty)
        + yp[j, i + 1] * tx * (1 - ty)
        + yp[j + 1, i] * (1 - tx) * ty
        + yp[j + 1, i + 1] * tx * ty
    )


# ---------------------------------------------------------------------------


def make_recfast_ctx(params: CosmoParams, pr: PrecisionParams, bg: BackgroundResult, idx: BgIdx) -> RecfastCtx:
    YHe = params.YHe if params.YHe is not None else helium_from_bbn_np(
        params.omega_b, params.N_eff, getattr(pr, "sBBN_file", "sBBN_2017.dat"))
    H0_s = params.H0 * const.c_SI / const.Mpc_over_m
    mu_H = 1.0 / (1.0 - YHe)
    fHe = YHe / (const.not4 * (1.0 - YHe))
    Nnow = 3.0 * H0_s**2 * float(bg.Omega0_b) / (8.0 * math.pi * const.G_SI * mu_H * const.m_H)
    fu = pr.recfast_fudge_H + (pr.recfast_delta_fudge_H if pr.recfast_Hswitch else 0.0)

    Lalpha = 1.0 / _L_H_alpha
    Lalpha_He = 1.0 / _L_He_2p
    CDB = const.h_P * const.c_SI * (_L_H_ion - _L_H_alpha) / const.k_B
    CDB_He = const.h_P * const.c_SI * (_L_He1_ion - _L_He_2s) / const.k_B
    CB1 = const.h_P * const.c_SI * _L_H_ion / const.k_B
    CB1_He1 = const.h_P * const.c_SI * _L_He1_ion / const.k_B
    CB1_He2 = const.h_P * const.c_SI * _L_He2_ion / const.k_B
    CR = 2.0 * math.pi * (const.m_e / const.h_P) * (const.k_B / const.h_P)
    CK = Lalpha**3 / (8.0 * math.pi)
    CK_He = Lalpha_He**3 / (8.0 * math.pi)
    CL = const.c_SI * const.h_P / (const.k_B * Lalpha)
    CL_He = const.c_SI * const.h_P / (const.k_B / _L_He_2s)
    CT = (8.0 / 3.0) * (const.sigma_T / (const.m_e * const.c_SI)) * (
        8.0 * math.pi**5 * const.k_B**4 / 15.0 / const.h_P**3 / const.c_SI**3
    )
    Bfact = const.h_P * const.c_SI * (_L_He_2p - _L_He_2s) / const.k_B

    # H(z) lookup: uniform loga spline of (H, H') columns
    dloga = bg.loga[1] - bg.loga[0]
    Hcols = jnp.stack([bg.table[:, idx["H"]], bg.table[:, idx["H_prime"]]], axis=1)
    H_of_z = UniformSpline.build(bg.loga[0], dloga, Hcols)

    f = jnp.asarray
    # DM energy injection: rho_cdm today in J/m^3 (:1783)
    rho_cdm_J = (H0_s ** 2 * 3.0 / (8.0 * math.pi * const.G_SI)
                 * float(bg.Omega0_cdm) * const.c_SI ** 2)
    inj = (float(params.annihilation), float(params.decay),
           float(params.annihilation_variation), float(params.annihilation_z),
           float(params.annihilation_zmax), float(params.annihilation_zmin),
           float(params.annihilation_f_halo), float(params.annihilation_z_halo))
    # beyond-on-the-spot deposition: precompute the delayed-deposition
    # convolution E(z) = int dz' G(z,z') E_ots(z') on a dense z grid
    # (thermodynamics_energy_injection :1810-1870; Green's function
    # G = factor (1+z)^8/(1+z')^7.5 exp(2/3 factor ((1+z)^1.5-(1+z')^1.5))).
    # Vectorized via z' = (1+z)u - 1:
    # E(z) = int_1 du (3A/2) u^-7.5 e^{-A(u^1.5-1)} E_ots((1+z)u-1),
    # A = 2/3 factor (1+z)^1.5 — one (nz, nu) weighted sum instead of the
    # reference's per-evolver-step dz'=1 trapezoid loop.
    inj_conv = None
    if not getattr(params, "on_the_spot", True) and inj[0] > 0.0:
        om_m = float(bg.Omega0_b) + float(bg.Omega0_cdm)
        factor = (const.sigma_T * Nnow / (float(bg.H0) / const.Mpc_over_m)
                  / math.sqrt(om_m))
        # exact replica of the reference's discrete loop, vectorized over a
        # dense z grid: trapezoid with dz' = 1 (half weight on the first
        # point), STOPPING after the first step whose integrand drops to
        # <= 2% of the first — the truncation is part of the reference
        # result (E differs by up to 4x at z~1500 without it)
        nz_c, nstep = 1024, 4096
        zg = np.expm1(np.linspace(0.0, math.log1p(2.0e4), nz_c))
        zc = zg[:, None]

        def integrand(zp):
            ots = np.asarray(_ots_rate(inj, rho_cdm_J, jnp.asarray(zp)))
            return (factor * (1.0 + zc) ** 8 / (1.0 + zp) ** 7.5
                    * np.exp(np.minimum(
                        2.0 / 3.0 * factor
                        * ((1.0 + zc) ** 1.5 - (1.0 + zp) ** 1.5), 700.0))
                    * ots)

        first = integrand(zc)[:, 0]
        zp = zc + np.arange(1.0, nstep + 1.0)[None, :]
        integ = integrand(zp)                                 # (nz, nstep)
        below = integ <= 0.02 * first[:, None]
        stop = np.argmax(below, axis=1)                       # first True
        stop = np.where(below.any(axis=1), stop, nstep - 1)
        keep = np.arange(nstep)[None, :] <= stop[:, None]     # inclusive
        E = 0.5 * first + np.sum(np.where(keep, integ, 0.0), axis=1)
        # resample ln E on the uniform -log1p(z) axis the runtime eval uses
        x = -np.log1p(zg)
        xu = np.linspace(x[-1], x[0], nz_c)
        lnE = np.interp(xu, x[::-1], np.log(np.maximum(E, 1e-300))[::-1])
        inj_conv = UniformSpline.build(
            jnp.asarray(xu[0]), jnp.asarray(xu[1] - xu[0]),
            jnp.asarray(lnE)[:, None])
    return RecfastCtx(
        fHe=f(fHe), Nnow=f(Nnow), Tnow=f(params.T_cmb), fu=f(fu), H0_s=f(H0_s),
        CDB=f(CDB), CDB_He=f(CDB_He), CB1=f(CB1), CB1_He1=f(CB1_He1), CB1_He2=f(CB1_He2),
        CR=f(CR), CK=f(CK), CK_He=f(CK_He), CL=f(CL), CL_He=f(CL_He), CT=f(CT),
        Bfact=f(Bfact), H_of_z=H_of_z, YHe=f(YHe),
        inj=inj, rho_cdm_J=f(rho_cdm_J), inj_conv=inj_conv,
    )


def _energy_injection_rate(ctx: RecfastCtx, z):
    """DM annihilation/decay energy injection rate [J/m^3/s]: on-the-spot
    analytic form, or the precomputed delayed-deposition convolution when
    `on the spot = no` (thermodynamics_energy_injection :1810-1870)."""
    if ctx.inj_conv is not None:
        return jnp.exp(ctx.inj_conv.eval(-jnp.log1p(z))[..., 0])
    return _ots_rate(ctx.inj, ctx.rho_cdm_J, z)


def _ots_rate(inj, rho_cdm_J, z):
    """On-the-spot injection rate [J/m^3/s]
    (thermodynamics_onthespot_energy_injection, :1755-1795). jnp-only: the
    injection parameters are traced leaves of the jitted recfast call."""
    ann, dec, var, z0, zmax, zmin, f_halo, z_halo = inj
    lz0 = jnp.log((z0 + 1.0) / (zmax + 1.0))
    ann_z = jnp.where(
        z > zmax,
        ann * jnp.exp(-var * lz0 ** 2),
        jnp.where(
            z > zmin,
            ann * jnp.exp(var * (-lz0 ** 2 + jnp.log((z + 1.0) / (zmax + 1.0)) ** 2)),
            ann * jnp.exp(var * (-lz0 ** 2
                                 + jnp.log((zmin + 1.0) / (zmax + 1.0)) ** 2))))
    u_min = (1.0 + z) / (1.0 + z_halo)
    erfc = (1.0 + 0.278393 * u_min + 0.230389 * u_min ** 2
            + 0.000972 * u_min ** 3 + 0.078108 * u_min ** 4) ** -4
    zp3 = (1.0 + z) ** 3
    return (rho_cdm_J ** 2 / const.c_SI ** 2 * zp3
            * (zp3 * ann_z + f_halo * erfc)
            + rho_cdm_J * zp3 * dec)


def _hubble_si(ctx: RecfastCtx, z):
    """H in 1/s and dH/dz in 1/s at redshift z."""
    vals = ctx.H_of_z.eval(-jnp.log1p(z))
    H_mpc, Hp_mpc = vals[..., 0], vals[..., 1]
    conv = const.c_SI / const.Mpc_over_m
    Hz = H_mpc * conv
    dHdz = -Hp_mpc / H_mpc * conv  # dH/dz = -H'/H (H' = dH/dtau in Mpc^-2)
    return Hz, dHdz


def recfast_derivs(z, y, args):
    """RECFAST 1.5 derivatives d(x_H, x_He, Tmat)/dz.

    Physics per reference thermodynamics_derivs_with_recfast
    (thermodynamics_module.cpp:3727-3960), Heswitch=6, Hswitch=True, no energy
    injection (added separately).
    """
    ctx, pr_tuple, *rest = args
    inj_on = rest[0] if rest else False
    (x_H0_trigger, x_H0_trigger2, x_He0_trigger2, AG1, AG2, zG1, zG2, wG1, wG2, H_frac, fudge_He) = pr_tuple

    x_H = jnp.clip(y[0], 0.0, 1.0)
    x_He = jnp.clip(y[1], 0.0, 1.0)
    Tmat = jnp.maximum(y[2], 1e-3)
    x = x_H + ctx.fHe * x_He

    n = ctx.Nnow * (1.0 + z) ** 3
    n_He = ctx.fHe * n
    Trad = ctx.Tnow * (1.0 + z)
    Hz, dHdz = _hubble_si(ctx, z)

    Rdown = 1e-19 * _a_PPB * (Tmat / 1e4) ** _b_PPB / (1.0 + _c_PPB * (Tmat / 1e4) ** _d_PPB)
    Rup = Rdown * (ctx.CR * Tmat) ** 1.5 * jnp.exp(-ctx.CDB / Tmat)

    sq_0 = jnp.sqrt(Tmat / _T_0)
    sq_1 = jnp.sqrt(Tmat / _T_1)
    Rdown_He = _a_VF / (sq_0 * (1.0 + sq_0) ** (1.0 - _b_VF) * (1.0 + sq_1) ** (1.0 + _b_VF))
    Rup_He = 4.0 * Rdown_He * (ctx.CR * Tmat) ** 1.5 * jnp.exp(-ctx.CDB_He / Tmat)

    K = ctx.CK / Hz * (
        1.0
        + AG1 * jnp.exp(-(((jnp.log1p(z) - zG1) / wG1) ** 2))
        + AG2 * jnp.exp(-(((jnp.log1p(z) - zG2) / wG2) ** 2))
    )

    Rdown_trip = _a_trip / (sq_0 * (1.0 + sq_0) ** (1.0 - _b_trip) * (1.0 + sq_1) ** (1.0 + _b_trip))
    Rup_trip = Rdown_trip * jnp.exp(-const.h_P * const.c_SI * _L_He2St_ion / (const.k_B * Tmat)) * (ctx.CR * Tmat) ** 1.5 * 4.0 / 3.0

    # Helium K_He with Heswitch=6 (full), gated by he_active mask
    he_active = jnp.logical_and(x_He >= 5e-9, x_He <= x_He0_trigger2)
    one_m_xHe = jnp.clip(1.0 - x_He, 1e-30, None)
    tauHe_s = _A2P_s * ctx.CK_He * 3.0 * n_He * one_m_xHe / Hz
    pHe_s = (1.0 - jnp.exp(-tauHe_s)) / jnp.maximum(tauHe_s, 1e-30)

    Doppler_s = const.c_SI * _L_He_2p * jnp.sqrt(2.0 * const.k_B * Tmat / (const.m_H * const.not4 * const.c_SI**2))
    one_m_xH = jnp.clip(1.0 - x_H, 1e-30, None)
    gamma_2Ps = (
        3.0 * _A2P_s * ctx.fHe * one_m_xHe * const.c_SI**2
        / (jnp.sqrt(math.pi) * _sigma_He_2Ps * 8.0 * math.pi * Doppler_s * one_m_xH)
        / (const.c_SI * _L_He_2p) ** 2
    )
    AHcon = _A2P_s / (1.0 + 0.36 * gamma_2Ps**fudge_He)
    use_doppler_s = x_H < 0.9999999
    K_He_denom = jnp.where(use_doppler_s, (_A2P_s * pHe_s + AHcon), _A2P_s * pHe_s) * 3.0 * n_He * one_m_xHe
    K_He = jnp.where(he_active, 1.0 / jnp.maximum(K_He_denom, 1e-300), ctx.CK_He / Hz)

    # triplet correction (Heflag >= 3)
    tauHe_t = _A2P_t * n_He * one_m_xHe * 3.0 / (8.0 * math.pi * Hz * _L_He_2Pt**3)
    pHe_t = (1.0 - jnp.exp(-tauHe_t)) / jnp.maximum(tauHe_t, 1e-30)
    CL_PSt = const.h_P * const.c_SI * (_L_He_2Pt - _L_He_2St) / const.k_B
    Doppler_t = const.c_SI * _L_He_2Pt * jnp.sqrt(2.0 * const.k_B * Tmat / (const.m_H * const.not4 * const.c_SI**2))
    gamma_2Pt = (
        3.0 * _A2P_t * ctx.fHe * one_m_xHe * const.c_SI**2
        / (jnp.sqrt(math.pi) * _sigma_He_2Pt * 8.0 * math.pi * Doppler_t * one_m_xH)
        / (const.c_SI * _L_He_2Pt) ** 2
    )
    AHcon_t = _A2P_t / (1.0 + 0.66 * gamma_2Pt**0.9) / 3.0
    simple_t = x_H >= 0.99999
    CfHe_t_num = jnp.where(simple_t, _A2P_t * pHe_t, (_A2P_t * pHe_t + AHcon_t)) * jnp.exp(-CL_PSt / Tmat)
    CfHe_t = CfHe_t_num / (Rup_trip + CfHe_t_num)
    CfHe_t = jnp.where(he_active, CfHe_t, 0.0)

    # --- hydrogen
    C_peebles = jnp.where(
        x_H < x_H0_trigger2,
        (1.0 + K * _Lambda_H * n * one_m_xH)
        / (1.0 / ctx.fu + K * _Lambda_H * n * one_m_xH / ctx.fu + K * Rup * n * one_m_xH),
        1.0,
    )
    dxH = (x * x_H * n * Rdown - Rup * one_m_xH * jnp.exp(-ctx.CL / Tmat)) * C_peebles / (Hz * (1.0 + z))
    if inj_on:
        # DM energy injection -> extra ionization (:3894-3904, Slatyer/Poulin
        # chi_ion fit); note the dz sign: dy are d/dz so injection SUBTRACTS
        energy_rate = _energy_injection_rate(ctx, z)
        xc = jnp.clip(x, 0.0, 1.0)
        chi_ion_H = jnp.where(x < 1.0,
                              0.369202 * (1.0 - xc ** 0.463929) ** 1.70237, 0.0)
        dxH = dxH - energy_rate * chi_ion_H / n \
            * (1.0 / _L_H_ion + (1.0 - C_peebles) / _L_H_alpha) \
            / (const.h_P * const.c_SI * Hz * (1.0 + z))
    dxH = jnp.where(x_H > x_H0_trigger, 0.0, dxH)

    # --- helium
    He_Boltz = jnp.exp(jnp.minimum(ctx.Bfact / Tmat, 680.0))
    dxHe = (
        (x * x_He * n * Rdown_He - Rup_He * one_m_xHe * jnp.exp(-ctx.CL_He / Tmat))
        * (1.0 + K_He * _Lambda_He * n_He * one_m_xHe * He_Boltz)
    ) / (Hz * (1.0 + z) * (1.0 + K_He * (_Lambda_He + Rup_He) * n_He * one_m_xHe * He_Boltz))
    dxHe = dxHe + (
        x * x_He * n * Rdown_trip
        - one_m_xHe * 3.0 * Rup_trip * jnp.exp(-const.h_P * const.c_SI * _L_He_2St / (const.k_B * Tmat))
    ) * CfHe_t / (Hz * (1.0 + z))
    dxHe = jnp.where(x_He < 1e-15, 0.0, dxHe)

    # --- matter temperature
    timeTh = (1.0 / (ctx.CT * Trad**4)) * (1.0 + x + ctx.fHe) / jnp.maximum(x, 1e-30)
    timeH = 2.0 / (3.0 * ctx.H0_s * (1.0 + z) ** 1.5)
    epsilon = Hz * (1.0 + x + ctx.fHe) / (ctx.CT * Trad**3 * jnp.maximum(x, 1e-30))
    dT_steady = (
        ctx.Tnow
        + epsilon * ((1.0 + ctx.fHe) / (1.0 + ctx.fHe + x)) * ((dxH + ctx.fHe * dxHe) / jnp.maximum(x, 1e-30))
        - epsilon * dHdz / Hz
        + 3.0 * epsilon / (1.0 + z)
    )
    dT_full = ctx.CT * Trad**4 * x / (1.0 + x + ctx.fHe) * (Tmat - Trad) / (Hz * (1.0 + z)) + 2.0 * Tmat / (1.0 + z)
    if inj_on:
        # injection heating (:3952-3962, Slatyer/Poulin chi_heat fit)
        xc = jnp.clip(x, 0.0, 1.0)
        chi_heat = jnp.where(
            x < 1.0,
            jnp.minimum(0.996857 * (1.0 - (1.0 - xc ** 0.300134) ** 1.51035), 1.0),
            1.0)
        dT_full = dT_full - 2.0 / (3.0 * const.k_B) * energy_rate * chi_heat \
            / n / (1.0 + ctx.fHe + x) / (Hz * (1.0 + z))
    dT = jnp.where(timeTh < H_frac * timeH, dT_steady, dT_full)

    return jnp.array([dxH, dxHe, dT])


class RecoTable(NamedTuple):
    z: jnp.ndarray          # ascending
    xe: jnp.ndarray
    Tb: jnp.ndarray
    wb: jnp.ndarray
    cb2: jnp.ndarray
    dkappadtau: jnp.ndarray


def compute_recombination(params: CosmoParams, pr: PrecisionParams, ctx: RecfastCtx,
                          inj_on: bool = False) -> RecoTable:
    """Trace-cached wrapper (statics bound into the closure; see
    _compute_recombination_impl for the physics)."""
    return _reco_core(pr, inj_on)(params, ctx)


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=8)
def _reco_core(pr: PrecisionParams, inj_on: bool):
    from ..ops.export_cache import export_cached

    def fn(params, ctx):
        return _compute_recombination_impl(params, pr, ctx, inj_on)

    return export_cached(jax.jit(fn), tag="recfast", static_key=(pr, inj_on))


def _compute_recombination_impl(params: CosmoParams, pr: PrecisionParams,
                                ctx: RecfastCtx, inj_on: bool = False) -> RecoTable:
    """RECFAST history as one lax.scan over the fixed z grid (descending),
    mirroring the staged approximation scheme of
    thermodynamics_recombination_with_recfast (:3461-3647).

    Jitted with `pr` static: the scan body is a closure, so an un-jitted call
    would re-trace and re-compile it on every invocation (a fresh XLA compile
    per Class instance)."""
    Nz = pr.recfast_Nz0
    z_init = pr.recfast_z_initial
    i_arr = jnp.arange(Nz)
    zstart = z_init * (Nz - i_arr) / Nz
    zend = z_init * (Nz - i_arr - 1) / Nz

    pr_tuple = (
        pr.recfast_x_H0_trigger, pr.recfast_x_H0_trigger2, pr.recfast_x_He0_trigger2,
        pr.recfast_AGauss1, pr.recfast_AGauss2, pr.recfast_zGauss1, pr.recfast_zGauss2,
        pr.recfast_wGauss1, pr.recfast_wGauss2, pr.recfast_H_frac, pr.recfast_fudge_He,
    )
    args = (ctx, pr_tuple, inj_on)

    def rk4_interval(y, za, zb, nsub=4):
        h = (zb - za) / nsub

        def sub(i, yy):
            zz = za + i * h
            k1 = recfast_derivs(zz, yy, args)
            k2 = recfast_derivs(zz + h / 2, yy + h / 2 * k1, args)
            k3 = recfast_derivs(zz + h / 2, yy + h / 2 * k2, args)
            k4 = recfast_derivs(zz + h, yy + h * k3, args)
            return yy + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

        return jax.lax.fori_loop(0, nsub, sub, y)

    fHe = ctx.fHe

    def saha_rhs(z, CB1_x, factor=1.0):
        return factor * jnp.exp(1.5 * jnp.log(ctx.CR * ctx.Tnow / (1.0 + z)) - CB1_x / (ctx.Tnow * (1.0 + z))) / ctx.Nnow

    def step(y, zs):
        za, zb = zs
        z = zb
        Trad = ctx.Tnow * (1.0 + z)

        # candidate: full integration from carry
        y_int = rk4_interval(y, za, zb)

        # Saha values at zb
        rhs_He2 = saha_rhs(z, ctx.CB1_He2)
        x0_He3 = 0.5 * (jnp.sqrt((rhs_He2 - 1.0 - fHe) ** 2 + 4.0 * (1.0 + 2.0 * fHe) * rhs_He2) - (rhs_He2 - 1.0 - fHe))
        rhs_He1 = saha_rhs(z, ctx.CB1_He1, 4.0)
        x0_He1 = 0.5 * (jnp.sqrt((rhs_He1 - 1.0) ** 2 + 4.0 * (1.0 + fHe) * rhs_He1) - (rhs_He1 - 1.0))
        rhs_H = saha_rhs(z, ctx.CB1)
        x_H0_saha = 0.5 * (jnp.sqrt(rhs_H**2 + 4.0 * rhs_H) - rhs_H)

        # regime flags from carry y (pre-integration, as in the reference)
        in_A = z > pr.recfast_z_He_1 + pr.recfast_delta_z_He_1
        in_B = jnp.logical_and(~in_A, z > pr.recfast_z_He_2 + pr.recfast_delta_z_He_2)
        in_C = jnp.logical_and(~(in_A | in_B), z > pr.recfast_z_He_3 + pr.recfast_delta_z_He_3)
        in_D = jnp.logical_and(~(in_A | in_B | in_C), y[1] > pr.recfast_x_He0_trigger)
        in_E = jnp.logical_and(~(in_A | in_B | in_C | in_D), y[0] > pr.recfast_x_H0_trigger)
        in_F = ~(in_A | in_B | in_C | in_D | in_E)

        # --- regime A: fully ionized
        x0_A = 1.0 + 2.0 * fHe

        # --- regime B: HeIII Saha, smoothed from A
        sB = (pr.recfast_z_He_1 - z) / pr.recfast_delta_z_He_1
        wB = _f1(jnp.clip(sB, -1.0, 1.0))
        x0_B = jnp.where(z > pr.recfast_z_He_1 - pr.recfast_delta_z_He_1, wB * x0_He3 + (1.0 - wB) * x0_A, x0_He3)

        # --- regime C: HeIII done, smoothed from B
        sC = (pr.recfast_z_He_2 - z) / pr.recfast_delta_z_He_2
        wC = _f1(jnp.clip(sC, -1.0, 1.0))
        x0_C = jnp.where(z > pr.recfast_z_He_2 - pr.recfast_delta_z_He_2, wC * (1.0 + fHe) + (1.0 - wC) * x0_He3, 1.0 + fHe)

        # --- regime D: HeI Saha, smoothed from C
        sD = (pr.recfast_z_He_3 - z) / pr.recfast_delta_z_He_3
        wD = _f1(jnp.clip(sD, -1.0, 1.0))
        x0_D = jnp.where(z > pr.recfast_z_He_3 - pr.recfast_delta_z_He_3, wD * x0_He1 + (1.0 - wD) * (1.0 + fHe), x0_He1)
        xHe_D = (x0_D - 1.0) / fHe

        # --- regime E: integrate He, H from Saha; smooth x0 between HeI Saha and integrated
        yE = y_int.at[0].set(x_H0_saha)
        sE = jnp.clip((pr.recfast_x_He0_trigger - y_int[1]) / pr.recfast_x_He0_trigger_delta, 0.0, 1.0)
        wE = _f2(sE)
        x0_E_new = yE[0] + fHe * yE[1]
        x0_E = jnp.where(
            pr.recfast_x_He0_trigger - y_int[1] < pr.recfast_x_He0_trigger_delta,
            wE * x0_E_new + (1.0 - wE) * x0_He1,
            x0_E_new,
        )

        # --- regime F: full integration; smooth with H Saha
        sF = jnp.clip((pr.recfast_x_H0_trigger - y_int[0]) / pr.recfast_x_H0_trigger_delta, 0.0, 1.0)
        wF = _f2(sF)
        x0_F = jnp.where(
            pr.recfast_x_H0_trigger - y_int[0] < pr.recfast_x_H0_trigger_delta,
            wF * y_int[0] + (1.0 - wF) * x_H0_saha + fHe * y_int[1],
            y_int[0] + fHe * y_int[1],
        )

        # select y_new and x0 by regime
        y_pinned = jnp.array([1.0, 1.0, Trad])
        y_D = jnp.array([1.0, 1.0, Trad])
        y_D = y_D.at[1].set(xHe_D)
        y_new = jnp.where(in_A | in_B | in_C, y_pinned, jnp.where(in_D, y_D, jnp.where(in_E, yE, y_int)))
        x0 = jnp.where(
            in_A, x0_A,
            jnp.where(in_B, x0_B, jnp.where(in_C, x0_C, jnp.where(in_D, x0_D, jnp.where(in_E, x0_E, x0_F)))),
        )

        # derived columns at zb (reference stores these per row, :3647-3680)
        dy = recfast_derivs(z, y_new, args)
        Tb = y_new[2]
        wb = const.k_B / (const.c_SI**2 * const.m_H) * (1.0 + (1.0 / const.not4 - 1.0) * ctx.YHe + x0 * (1.0 - ctx.YHe)) * Tb
        cb2 = wb * (1.0 + (1.0 + z) * dy[2] / Tb / 3.0)
        dkappadtau = (1.0 + z) ** 2 * ctx.Nnow * x0 * const.sigma_T * const.Mpc_over_m

        out = jnp.array([z, x0, Tb, wb, cb2, dkappadtau])
        return y_new, out

    y0 = jnp.array([1.0, 1.0, ctx.Tnow * (1.0 + z_init)])
    _, rows = jax.lax.scan(step, y0, (zstart, zend))
    rows = rows[::-1]  # ascending z
    return RecoTable(z=rows[:, 0], xe=rows[:, 1], Tb=rows[:, 2], wb=rows[:, 3], cb2=rows[:, 4], dkappadtau=rows[:, 5])


# ---------------------------------------------------------------------------
# Reionization (reio_camb) + merge + runtime table


class ThIdx:
    """Column indices of the thermodynamics runtime table (analog of
    index_th_*, source/thermodynamics_module.h)."""

    names = ["xe", "dkappa", "ddkappa", "dddkappa", "exp_m_kappa", "g", "dg", "ddg",
             "Tb", "cb2", "tau_d_depth", "kappa",
             # idm_dr scattering rates + idm sound speed (zeros without idm_dr)
             "dmu_idm_dr", "dmu_idr", "cidm_dr2"]
    ix = {n: i for i, n in enumerate(names)}
    n = len(names)

    def __class_getitem__(cls, name):
        return cls.ix[name]


class ThermoResult(NamedTuple):
    lntau_spline: UniformSpline   # runtime table, columns per ThIdx
    # merged z-grid tables (for output / inspection)
    z_grid: jnp.ndarray
    xe_of_z: jnp.ndarray
    Tb_of_z: jnp.ndarray
    cb2_of_z: jnp.ndarray
    dkappa_of_z: jnp.ndarray
    # derived scalars
    YHe: jnp.ndarray
    fHe: jnp.ndarray
    z_reio: jnp.ndarray
    tau_reio: jnp.ndarray
    z_rec: jnp.ndarray
    tau_rec: jnp.ndarray
    rs_rec: jnp.ndarray
    z_star: jnp.ndarray
    tau_star: jnp.ndarray
    rs_star: jnp.ndarray
    ra_star: jnp.ndarray          # comoving angular distance to z_star
    z_d: jnp.ndarray
    tau_d: jnp.ndarray
    rs_d: jnp.ndarray
    angular_rescaling: jnp.ndarray
    # time above which visibility is negligible (ref tau_cut_,
    # thermodynamics_module.cpp:1219); drives transfer late-source neglect
    tau_cut: jnp.ndarray = None
    # comoving angular distance to recombination (ra_rec_, :1047)
    ra_rec: jnp.ndarray = None
    # photon damping scale r_d at the derived epochs (rd_rec_/rd_star_,
    # :1054/:1158; table column per :598-676)
    rd_rec: jnp.ndarray = None
    rd_star: jnp.ndarray = None
    # electron number density today [1/m^3] (n_e_, :3194)
    n_e: jnp.ndarray = None

    def at_tau(self, tau):
        return self.lntau_spline.eval(jnp.log(tau))


def _xe_reio_camb(z, z_reio, z_start, xe_before, xe_after, fHe, params: CosmoParams,
                  half: bool = False):
    """reio_camb / reio_half_tanh ionization function (reference
    thermodynamics_reionization_function, thermodynamics_module.cpp:1893).
    half_tanh: xe_after = 1 (He neglected), plain tanh, no He term (:1936)."""
    ex = params.reionization_exponent
    arg = ((1.0 + z_reio) ** ex - (1.0 + z) ** ex) / (ex * (1.0 + z_reio) ** (ex - 1.0)) / params.reionization_width
    if half:
        xe = (xe_after - xe_before) * jnp.tanh(arg) + xe_before
    else:
        xe = (xe_after - xe_before) * (jnp.tanh(arg) + 1.0) / 2.0 + xe_before
        arg_he = (params.helium_fullreio_redshift - z) / params.helium_fullreio_width
        xe = xe + fHe * (jnp.tanh(arg_he) + 1.0) / 2.0
    return jnp.where(z > z_start, xe_before, xe)


def _xe_reio_bins_tanh(z, params: CosmoParams, xe_top, fHe):
    """reio_bins_tanh profile (astro-ph/0606552 style,
    thermodynamics_module.cpp:1958-2016 + bin-array setup :2358-2446).
    Returns (xe(z), z_start). xe_top = recombination xe at z_start."""
    zi = list(params.binned_reio_z)
    xi = list(params.binned_reio_xe)
    if len(zi) < 2:
        raise ValueError("binned reio requires at least two bin centers")
    z_top = zi[-1] + 2.0 * (zi[-1] - zi[-2])
    z_bot = max(2.0 * zi[0] - zi[1], 0.0)
    z_arr = [z_bot] + zi + [z_top]
    xe_arr = [1.0 + fHe] + xi + [xe_top]   # xe after reio at low z
    n = len(z_arr)
    sharp = params.binned_reio_step_sharpness
    xe = jnp.full_like(z, xe_arr[0])
    for i in range(n - 1):
        if i == n - 2:
            z_jump = z_arr[i] + 0.5 * (z_arr[i] - z_arr[i - 1])
        else:
            z_jump = 0.5 * (z_arr[i + 1] + z_arr[i])
        val = xe_arr[i] + 0.5 * (jnp.tanh((z - z_jump) / sharp) + 1.0) \
            * (xe_arr[i + 1] - xe_arr[i])
        xe = jnp.where((z >= z_arr[i]) & (z < z_arr[i + 1]), val, xe)
    xe = jnp.where(z >= z_arr[-1], xe_arr[-1], xe)
    return xe, z_top


def _xe_reio_many_tanh(z, params: CosmoParams, pr, xe_top, fHe):
    """reio_many_tanh profile (thermodynamics_module.cpp:2021-2060 + setup
    :2448-2560): sum of tanh jumps walking down from the recombination value."""
    zi = list(params.many_tanh_z)
    xi = []
    for v in params.many_tanh_xe:
        if v >= 0.0:
            xi.append(v)
        elif -1.1 < v < -0.9:      # -1: H + singly-ionized He
            xi.append(1.0 + fHe)
        elif -2.1 < v < -1.9:      # -2: H + doubly-ionized He
            xi.append(1.0 + 2.0 * fHe)
        else:
            raise ValueError(f"many_tanh_xe entry {v} invalid (>=0, -1 or -2)")
    if not zi:
        raise ValueError("reio_many_tanh requires at least one jump center")
    width = params.many_tanh_width
    z_top = zi[-1] + pr.reionization_start_factor * width
    z_bot = max(zi[0] - pr.reionization_start_factor * width, 0.0)
    z_arr = [z_bot] + zi + [z_top]
    xe_arr = [xi[0]] + xi + [xe_top]
    n = len(z_arr)
    xe = jnp.full_like(z, xe_arr[-1])
    for jump in range(1, n - 1):
        center = z_arr[n - 1 - jump]
        before = xe_arr[n - 1 - jump] - xe_arr[n - jump]
        xe = xe + before * (1.0 - jnp.tanh((z - center) / width)) / 2.0
    xe = jnp.where(z <= z_arr[0], xe_arr[0], xe)
    xe = jnp.where(z >= z_arr[-1], xe_arr[-1], xe)
    return xe, z_top


def _xe_reio_inter(z, params: CosmoParams, xe_top, fHe):
    """reio_inter profile (thermodynamics_module.cpp:2063-2110 + setup
    :2562-2640): piecewise-linear xe(z); last input xe must be 0 and is
    replaced by the recombination value at the last z node."""
    zi = list(params.reio_inter_z)
    xi_in = list(params.reio_inter_xe)
    if not zi or zi[0] != 0.0:
        raise ValueError("reio_inter_z must start at z=0")
    if xi_in[-1] != 0.0:
        raise ValueError("last reio_inter_xe must be 0 (recombination value)")
    xi = []
    for v in xi_in[:-1]:
        if v >= 0.0:
            xi.append(v)
        elif -1.1 < v < -0.9:
            xi.append(1.0 + fHe)
        elif -2.1 < v < -1.9:
            xi.append(1.0 + 2.0 * fHe)
        else:
            raise ValueError(f"reio_inter_xe entry {v} invalid (>=0, -1 or -2)")
    z_nodes = jnp.asarray(zi)
    xe_nodes = jnp.concatenate([jnp.asarray(xi), jnp.reshape(xe_top, (1,))])
    xe = jnp.interp(z, z_nodes, xe_nodes)
    return xe, zi[-1]


def _tb_march(*args):
    """Trace-cached dispatcher for _tb_march_impl."""
    global _tb_march_cached
    if _tb_march_cached is None:
        from ..ops.export_cache import export_cached

        _tb_march_cached = export_cached(jax.jit(_tb_march_impl),
                                         tag="tb_march")
    return _tb_march_cached(*args)


_tb_march_cached = None


def _tb_march_impl(z_fine, xe_fine, H_fine, rho_g_fine, rho_b_fine, Tb_start,
                   idx_start, kappa_fac, YHe, T_cmb):
    """Backward-Euler Tb march through reionization on the fine z grid
    (thermodynamics_reionization_sample :2880-2960). Module-level jit: the
    scan body is a closure, so an unjitted call would recompile per run."""
    n_fine = z_fine.shape[0]

    def dTdz_fn(i, Tb):
        z = z_fine[i]
        xe = xe_fine[i]
        opacity = (1.0 + z) ** 2 * kappa_fac * xe
        mu = const.m_H / (1.0 + (1.0 / const.not4 - 1.0) * YHe + xe * (1.0 - YHe))
        return (
            2.0 / (1.0 + z) * Tb
            - 2.0 * mu / const.m_e * 4.0 * rho_g_fine[i] / 3.0 / rho_b_fine[i] * opacity
            * (T_cmb * (1.0 + z) - Tb) / H_fine[i]
        )

    dzf = z_fine[1] - z_fine[0]

    def tb_step(carry, i):
        Tb = carry
        active = i < idx_start
        dT = dTdz_fn(i + 1, Tb)
        Tb_new = jnp.where(active, Tb - dT * dzf, Tb)
        return Tb_new, Tb_new

    idxs = jnp.arange(n_fine - 2, -1, -1)
    _, Tb_marched = jax.lax.scan(tb_step, Tb_start, idxs)
    Tb_fine = Tb_marched[::-1]
    Tb_fine = jnp.concatenate([Tb_fine, jnp.array([Tb_start])])
    dTdz_fine = jax.vmap(lambda i: dTdz_fn(i, Tb_fine[i]))(jnp.arange(n_fine))
    return Tb_fine, dTdz_fine


def compute_thermodynamics(params: CosmoParams, pr: PrecisionParams,
                           bg: BackgroundResult, bidx: BgIdx) -> ThermoResult:
    """Full thermodynamics pipeline: recfast scan -> reio_camb (vectorized
    tau_reio inversion) -> Tb/cb2 through reionization -> merge -> runtime
    uniform-ln(tau) table with optical depth, visibility and derivatives.

    Reference: thermodynamics_init (thermodynamics_module.cpp:293-1297).
    Runs on the host CPU backend (sequential 20k-step scan; utils/device.py).
    """
    from ..utils.device import on_host_cpu

    with on_host_cpu():
        return _compute_thermodynamics_impl(params, pr, bg, bidx)


def _compute_thermodynamics_impl(params: CosmoParams, pr: PrecisionParams,
                                 bg: BackgroundResult, bidx: BgIdx) -> ThermoResult:
    ctx = make_recfast_ctx(params, pr, bg, bidx)
    reco_opt = getattr(params, "recombination", "recfast")
    if reco_opt in ("hyrec", "hyrec_full"):
        from .hyrec import compute_recombination_hyrec

        reco = compute_recombination_hyrec(
            params, pr, ctx, bg,
            model="full" if reco_opt == "hyrec_full" else "recfast")
    else:
        reco = compute_recombination(
            params, pr, ctx,
            inj_on=bool(params.annihilation != 0.0 or params.decay != 0.0))
    fHe = ctx.fHe
    xe_after = 1.0 + fHe

    # --- fine reio z grid
    n_fine = 4096
    z_fine = jnp.linspace(0.0, pr.reionization_z_start_max, n_fine)
    H_fine = ctx.H_of_z.eval(-jnp.log1p(z_fine))[:, 0]  # [1/Mpc]
    # recombination xe on the fine grid (residual ionization, pre-reio)
    xe_reco_fine = jnp.interp(z_fine, reco.z, reco.xe)
    kappa_fac = ctx.Nnow * const.sigma_T * const.Mpc_over_m  # (1+z)^2 * xe * this = kappa' [1/Mpc]

    scheme = getattr(params, "reio_parametrization", "reio_camb")
    half = scheme == "reio_half_tanh"
    if half:
        xe_after = jnp.asarray(1.0)   # He ionization neglected (:2246)

    def _tau_of_profile(xe_profile, z_start_p):
        integrand = (1.0 + z_fine) ** 2 * kappa_fac * xe_profile / H_fine
        mask = z_fine <= z_start_p
        return jnp.trapezoid(jnp.where(mask, integrand, 0.0), z_fine)

    def tau_reio_of_zreio(z_reio):
        z_start = z_reio + pr.reionization_start_factor * params.reionization_width
        z_start = jnp.maximum(z_start, params.helium_fullreio_redshift
                              + pr.reionization_start_factor * params.helium_fullreio_width)
        xe_before = jnp.interp(z_start, reco.z, reco.xe)
        xe = _xe_reio_camb(z_fine, z_reio, z_start, xe_before, xe_after, fHe,
                           params, half=half)
        return _tau_of_profile(xe, z_start)

    if scheme in ("reio_camb", "reio_half_tanh"):
        if params.z_reio is not None:
            z_reio = jnp.asarray(params.z_reio)
            tau_reio = tau_reio_of_zreio(z_reio)
        else:
            # vectorized inversion: tau(z_reio) is monotone increasing
            z_cand = jnp.linspace(0.0, pr.reionization_z_start_max
                                  - pr.reionization_start_factor * params.reionization_width - 1e-3, 512)
            tau_cand = jax.vmap(tau_reio_of_zreio)(z_cand)
            z_reio = jnp.interp(params.tau_reio, tau_cand, z_cand)
            # one secant refinement
            t0 = tau_reio_of_zreio(z_reio)
            t1 = tau_reio_of_zreio(z_reio + 0.01)
            z_reio = z_reio + (params.tau_reio - t0) * 0.01 / (t1 - t0)
            tau_reio = tau_reio_of_zreio(z_reio)

        z_start = jnp.maximum(
            z_reio + pr.reionization_start_factor * params.reionization_width,
            params.helium_fullreio_redshift + pr.reionization_start_factor * params.helium_fullreio_width,
        )
        xe_before = jnp.interp(z_start, reco.z, reco.xe)
        xe_fine = _xe_reio_camb(z_fine, z_reio, z_start, xe_before, xe_after,
                                fHe, params, half=half)
    else:
        # fixed-profile schemes: tau_reio is derived, not shot for
        # (thermodynamics_module.cpp:2358-2640)
        if scheme == "reio_bins_tanh":
            z_top_guess = params.binned_reio_z[-1] + 2.0 * (
                params.binned_reio_z[-1] - params.binned_reio_z[-2])
            xe_top = jnp.interp(jnp.asarray(z_top_guess), reco.z, reco.xe)
            xe_fine, z_start = _xe_reio_bins_tanh(z_fine, params, xe_top, float(fHe))
        elif scheme == "reio_many_tanh":
            z_top_guess = params.many_tanh_z[-1] \
                + pr.reionization_start_factor * params.many_tanh_width
            xe_top = jnp.interp(jnp.asarray(z_top_guess), reco.z, reco.xe)
            xe_fine, z_start = _xe_reio_many_tanh(z_fine, params, pr, xe_top, float(fHe))
        elif scheme == "reio_inter":
            xe_top = jnp.interp(jnp.asarray(params.reio_inter_z[-1]), reco.z, reco.xe)
            xe_fine, z_start = _xe_reio_inter(z_fine, params, xe_top, float(fHe))
        elif scheme == "reio_none":
            xe_fine, z_start = xe_reco_fine, jnp.asarray(0.0)
        else:
            raise ValueError(f"unknown reio_parametrization {scheme!r}")
        z_start = jnp.asarray(z_start)
        tau_reio = _tau_of_profile(xe_fine, z_start)
        # half-maximum crossing as the reported z_reio
        xe_mid = 0.5 * (xe_fine[0] + jnp.interp(z_start, z_fine, xe_reco_fine))
        z_reio = z_fine[jnp.argmin(jnp.abs(xe_fine - xe_mid))]

    # above z_start the merged table keeps the recombination history (the
    # xe_before constant is only the tanh baseline, reference
    # thermodynamics_merge_reco_and_reio)
    xe_fine = jnp.where(z_fine > z_start, xe_reco_fine, xe_fine)

    # --- Tb through reionization: backward Euler march on the fine grid
    # (reference thermodynamics_reionization_sample, :2880-2960)
    Tb_start = jnp.interp(z_start, reco.z, reco.Tb)
    rho_g_fine = bg.Omega0_g * bg.H0**2 * (1.0 + z_fine) ** 4
    rho_b_fine = bg.Omega0_b * bg.H0**2 * (1.0 + z_fine) ** 3

    idx_start = jnp.searchsorted(z_fine, z_start)  # integrate from idx_start down to 0
    Tb_fine, dTdz_fine = _tb_march(z_fine, xe_fine, H_fine, rho_g_fine,
                                   rho_b_fine, Tb_start, idx_start,
                                   jnp.asarray(kappa_fac), jnp.asarray(ctx.YHe),
                                   jnp.asarray(params.T_cmb))
    # above z_start use reco
    Tb_fine = jnp.where(z_fine >= z_start, jnp.interp(z_fine, reco.z, reco.Tb), Tb_fine)

    mu_fine = const.m_H / (1.0 + (1.0 / const.not4 - 1.0) * ctx.YHe + xe_fine * (1.0 - ctx.YHe))
    wb_fine = const.k_B / (const.c_SI**2) / mu_fine * Tb_fine
    cb2_fine = wb_fine * (1.0 + (1.0 + z_fine) / 3.0 * dTdz_fine / Tb_fine)
    cb2_fine = jnp.where(z_fine >= z_start, jnp.interp(z_fine, reco.z, reco.cb2), cb2_fine)
    dkappa_fine = (1.0 + z_fine) ** 2 * kappa_fac * xe_fine

    # --- merged z tables: fine grid below z_start_max, reco grid above
    hi = reco.z > pr.reionization_z_start_max
    z_merged = jnp.concatenate([z_fine, reco.z[hi]])
    xe_merged = jnp.concatenate([xe_fine, reco.xe[hi]])
    Tb_merged = jnp.concatenate([Tb_fine, reco.Tb[hi]])
    cb2_merged = jnp.concatenate([cb2_fine, reco.cb2[hi]])
    dkappa_merged = jnp.concatenate([dkappa_fine, reco.dkappadtau[hi]])

    # --- runtime uniform-ln(tau) grid
    n_rt = 32768
    lntau0 = jnp.log(bg.tau_of_loga[0])
    lntau1 = jnp.log(bg.tau0)
    lntau_u = jnp.linspace(lntau0, lntau1, n_rt)
    dlntau = lntau_u[1] - lntau_u[0]
    tau_u = jnp.exp(lntau_u)
    bgvals = bg.lntau_spline.eval(lntau_u)
    a_u = bgvals[:, bidx["a"]]
    z_u = 1.0 / a_u - 1.0

    # interpolate merged z tables -> tau grid (above recfast_z_initial, early-
    # universe: xe frozen at its high-z table value, Tb ~ Tcmb(1+z))
    loz = jnp.log1p(jnp.clip(z_u, 0.0, None))
    lom = jnp.log1p(z_merged)
    xe_u = jnp.interp(loz, lom, xe_merged)
    Tb_u = jnp.where(z_u > z_merged[-1], params.T_cmb * (1.0 + z_u), jnp.interp(loz, lom, Tb_merged))
    cb2_u = jnp.where(
        z_u > z_merged[-1],
        const.k_B / (const.c_SI**2) * (1.0 + (1.0 / const.not4 - 1.0) * ctx.YHe + xe_merged[-1] * (1.0 - ctx.YHe))
        / const.m_H * params.T_cmb * (1.0 + z_u) * 4.0 / 3.0,
        jnp.interp(loz, lom, cb2_merged),
    )
    dkappa_u = jnp.where(
        z_u > z_merged[-1],
        (1.0 + z_u) ** 2 * kappa_fac * xe_merged[-1],
        jnp.interp(loz, lom, dkappa_merged),
    )

    # optical depth kappa(tau) = int_tau^tau0 kappa' dtau (integrate in lntau)
    integrand = dkappa_u * tau_u  # dtau = tau dlntau
    d2i = spline_d2(lntau_u, integrand)
    kappa_u = spline_integrate_reverse(lntau_u, integrand, d2i)

    exp_m_kappa = jnp.exp(-kappa_u)
    g_u = dkappa_u * exp_m_kappa

    # derivatives of kappa' and g w.r.t. tau via spline on lntau
    spl_dk = UniformSpline.build(lntau_u[0], dlntau, dkappa_u)
    ddkappa_u = spl_dk.eval_deriv(lntau_u) / tau_u
    spl_ddk = UniformSpline.build(lntau_u[0], dlntau, ddkappa_u)
    dddkappa_u = spl_ddk.eval_deriv(lntau_u) / tau_u
    # g = kappa' e^-kappa with dkappa/dtau = -kappa' (kappa integrates from
    # tau to today), hence d(e^-kappa)/dtau = +kappa' e^-kappa:
    dg_u = (ddkappa_u + dkappa_u**2) * exp_m_kappa
    ddg_u = (dddkappa_u + 3.0 * dkappa_u * ddkappa_u + dkappa_u**3) * exp_m_kappa

    # baryon drag depth tau_d(tau) = int_tau^tau0 kappa'/R dtau, R = 3 rho_b/(4 rho_g)
    R_u = 3.0 * bgvals[:, bidx["rho_b"]] / (4.0 * bgvals[:, bidx["rho_g"]])
    integrand_d = dkappa_u / R_u * tau_u
    d2d = spline_d2(lntau_u, integrand_d)
    taud_u = spline_integrate_reverse(lntau_u, integrand_d, d2d)

    # photon damping scale r_d(tau) = 2 pi sqrt(I), I = 16/(15*6*3) *
    # tau_ini/kappa'_ini + int_{tau_ini}^tau dtau (1/kappa') *
    # (R^2 + 16/15 (1+R)) / (6 (1+R)^2)  (thermodynamics_module.cpp:598-676;
    # the first term is the analytic radiation-era contribution below the
    # table start, :662-667)
    integrand_rd = (1.0 / dkappa_u) * (R_u**2 + 16.0 / 15.0 * (1.0 + R_u)) \
        / (6.0 * (1.0 + R_u) ** 2) * tau_u
    d2rd = spline_d2(lntau_u, integrand_rd)
    from ..ops.splines import spline_integrate
    I_rd = spline_integrate(lntau_u, integrand_rd, d2rd)
    I_rd = I_rd + 16.0 / (15.0 * 6.0 * 3.0) * tau_u[0] / dkappa_u[0]
    rd_u = 2.0 * jnp.pi * jnp.sqrt(jnp.maximum(I_rd, 0.0))

    # --- interacting DM <-> dark radiation scattering rates + idm sound speed
    # (thermodynamics_module.cpp:191-216 + the T_idm_dr march :845-985);
    # columns are always present (zeros without idm_dr) so ThIdx stays static
    if params.Omega_idm_dr > 0.0:
        h2p = params.h * params.h
        Omega0_idr_v = params.stat_f_idr * params.xi_idr ** 4 * float(bg.Omega0_g)
        zfac = ((1.0 + z_u) / 1.0e7) ** params.nindex_idm_dr
        dmu_idm_dr_u = params.a_idm_dr * zfac * params.Omega_idm_dr * h2p
        dmu_idr_u = params.b_idr * zfac * Omega0_idr_v * h2p
        # T_idm march, implicit Euler in z (descending z = ascending tau):
        # dT/dz = 2 a T - (Gamma_heat/H)(T_idr - T), unconditionally stable
        # across the tight/intermediate/adiabatic regimes of the reference
        T_idr_u = params.xi_idr * params.T_cmb * (1.0 + z_u)
        a_u_v = 1.0 / (1.0 + z_u)
        H_u = bgvals[:, bidx["H"]]
        Gam_u = (2.0 * Omega0_idr_v * h2p * params.a_idm_dr
                 * (1.0 + z_u) ** (params.nindex_idm_dr + 1.0)
                 / 1.0e7 ** params.nindex_idm_dr)

        def t_step(T, i):
            dz = z_u[i] - z_u[i - 1]
            gh = Gam_u[i] / H_u[i]
            T_new = (T - dz * gh * T_idr_u[i]) / (1.0 - 2.0 * a_u_v[i] * dz + gh * dz * -1.0)
            return T_new, T_new

        _, T_rest = jax.lax.scan(t_step, T_idr_u[0], jnp.arange(1, n_rt))
        T_idm_u = jnp.concatenate([T_idr_u[:1], T_rest])
        dTdz_u = 2.0 * a_u_v * T_idm_u - Gam_u / H_u * (T_idr_u - T_idm_u)
        cidm2_u = const.k_B * T_idm_u / const.eV_SI / params.m_idm \
            * (1.0 + dTdz_u / (3.0 * T_idm_u))
    else:
        dmu_idm_dr_u = jnp.zeros_like(xe_u)
        dmu_idr_u = jnp.zeros_like(xe_u)
        cidm2_u = jnp.zeros_like(xe_u)

    cols = [xe_u, dkappa_u, ddkappa_u, dddkappa_u, exp_m_kappa, g_u, dg_u, ddg_u,
            Tb_u, cb2_u, taud_u, kappa_u, dmu_idm_dr_u, dmu_idr_u, cidm2_u]
    table_u = jnp.stack(cols, axis=1)
    lntau_spline = UniformSpline.build(lntau_u[0], dlntau, table_u)

    # --- derived epochs
    # z_rec: maximum of visibility g
    i_rec = jnp.argmax(g_u)
    # quadratic refinement in lntau
    gm, g0, gp = g_u[i_rec - 1], g_u[i_rec], g_u[i_rec + 1]
    dl = 0.5 * (gm - gp) / (gm - 2.0 * g0 + gp)
    lntau_rec = lntau_u[i_rec] + dl * dlntau
    tau_rec = jnp.exp(lntau_rec)
    bg_rec = bg.lntau_spline.eval(lntau_rec)
    z_rec = 1.0 / bg_rec[bidx["a"]] - 1.0
    rs_rec = bg_rec[bidx["rs"]]

    # z_star: kappa = 1
    # kappa decreases with tau; find crossing
    i_star = jnp.searchsorted(-kappa_u, -1.0)
    k0, k1 = kappa_u[i_star - 1], kappa_u[i_star]
    w = (k0 - 1.0) / (k0 - k1)
    lntau_star = lntau_u[i_star - 1] + w * dlntau
    tau_star = jnp.exp(lntau_star)
    bg_star = bg.lntau_spline.eval(lntau_star)
    z_star = 1.0 / bg_star[bidx["a"]] - 1.0
    rs_star = bg_star[bidx["rs"]]
    def _comoving_ang(chi):
        """Comoving angular diameter distance r(chi) per curvature."""
        K = -params.Omega_k * float(bg.H0) ** 2
        if params.Omega_k > 1e-12:      # open, K < 0
            sab = jnp.sqrt(-K)
            return jnp.sinh(sab * chi) / sab
        if params.Omega_k < -1e-12:     # closed, K > 0
            sab = jnp.sqrt(K)
            return jnp.sin(sab * chi) / sab
        return chi

    ra_star = _comoving_ang(bg.tau0 - tau_star)
    ra_rec = _comoving_ang(bg.tau0 - tau_rec)

    # damping scale at the derived epochs (rd_rec_/rd_star_,
    # thermodynamics_module.cpp:1054/:1158) — always computed here (the
    # integral is one cumulative sum; no 'compute damping scale' gate needed)
    rd_rec = jnp.interp(lntau_rec, lntau_u, rd_u)
    rd_star = jnp.interp(lntau_star, lntau_u, rd_u)

    # electron number density today [1/m^3] (preco->Nnow,
    # thermodynamics_module.cpp:3183; classy.pyx n_e)
    H0_SI = params.h * 1.0e5 / const.Mpc_over_m
    n_e = 3.0 * H0_SI**2 * params.omega_b / params.h**2 \
        * (1.0 - ctx.YHe) / (8.0 * math.pi * const.G_SI * const.m_H)

    # tau_cut: time above which visibility falls below a fraction of its
    # maximum (thermodynamics_module.cpp:1219-1229); used by the transfer
    # late-source neglect heuristic
    vis_ok = g_u > g_u[i_rec] * pr.neglect_CMB_sources_below_visibility
    i_cut = n_rt - 1 - jnp.argmax(vis_ok[::-1])
    tau_cut = tau_u[i_cut]

    # z_d: baryon drag depth = 1
    i_d = jnp.searchsorted(-taud_u, -1.0)
    t0d, t1d = taud_u[i_d - 1], taud_u[i_d]
    wd = (t0d - 1.0) / (t0d - t1d)
    lntau_d = lntau_u[i_d - 1] + wd * dlntau
    tau_d = jnp.exp(lntau_d)
    bg_d = bg.lntau_spline.eval(lntau_d)
    z_d = 1.0 / bg_d[bidx["a"]] - 1.0
    rs_d = bg_d[bidx["rs"]]

    return ThermoResult(
        lntau_spline=lntau_spline,
        z_grid=z_merged, xe_of_z=xe_merged, Tb_of_z=Tb_merged, cb2_of_z=cb2_merged,
        dkappa_of_z=dkappa_merged,
        YHe=ctx.YHe, fHe=fHe,
        z_reio=z_reio, tau_reio=tau_reio,
        z_rec=z_rec, tau_rec=tau_rec, rs_rec=rs_rec,
        z_star=z_star, tau_star=tau_star, rs_star=rs_star, ra_star=ra_star,
        z_d=z_d, tau_d=tau_d, rs_d=rs_d,
        # ra_rec/(tau0 - tau_rec): 1 when flat (thermodynamics_module.cpp:1048)
        angular_rescaling=ra_rec / (bg.tau0 - tau_rec),
        tau_cut=tau_cut,
        ra_rec=ra_rec, rd_rec=rd_rec, rd_star=rd_star, n_e=jnp.asarray(n_e),
    )
