"""Linear and nonlinear matter power spectra (L7).

Reference NonlinearModule (nonlinear_module.cpp): the linear P(k,tau) table
from sources x primordial (nonlinear_pk_linear :1886), sigma(R,z) integrals
(nonlinear_sigmas :2041), and the Takahashi-2012 Halofit with Bird massive-
neutrino corrections (nonlinear_halofit :2291).

TPU-native reshaping: the reference solves sigma(R_nl)=1 by per-redshift
bisection with spline quadratures (:2546-2583); here sigma^2(R, z) for a whole
log-R grid x all requested redshifts is one pair of matmuls over the halofit
k-grid, and R_nl comes from a vectorized monotone inversion + Newton polish.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.precision import PrecisionParams
from ..ops.special import si_ci
from ..ops.splines import spline_d2, spline_eval
from .perturbations.indices import SrcIdx
from .primordial import PrimordialResult

# HMcode baryonic feedback presets (nonlinear_module.cpp:3424-3474
# nonlinear_hmcode_baryonic_feedback): name -> (eta_0, c_min)
HMCODE_FEEDBACK = {
    "emu_dmonly": (0.603, 3.13),
    "owls_dmonly": (0.64, 3.43),
    "owls_ref": (0.68, 3.91),
    "owls_agn": (0.76, 2.32),
    "owls_dblim": (0.70, 3.01),
}


class PkResult(NamedTuple):
    k: jnp.ndarray           # (nk,)
    z: jnp.ndarray           # (nz,) requested redshifts
    pk_lin: jnp.ndarray      # (nz, nk) linear P_m(k,z) [Mpc^3]
    pk_nl: jnp.ndarray       # (nz, nk) halofit P_m(k,z)
    pk_cb_lin: jnp.ndarray   # (nz, nk) cdm+baryon
    pk_cb_nl: jnp.ndarray
    k_nl: jnp.ndarray        # (nz,) nonlinearity scale
    k_nl_cb: jnp.ndarray     # (nz,) cb nonlinearity scale (classy.pyx :1678)
    sigma8: jnp.ndarray      # scalar sigma8(z=0)


def _interp_sources_at_z(pert, bg, z, col):
    """delta(k) at redshift z from the source table (spline in tau)."""
    from .background import tau_of_z

    tau_q = tau_of_z(bg, z)
    taus = pert.tau
    S = pert.sources[:, :, col]          # (nk, ntau)
    d2 = spline_d2(taus, S.T)
    return spline_eval(taus, S.T, d2, tau_q)   # (..., nk)


def pk_ic_deltas(pert, bg, z, col="delta_m"):
    """{ic_name: delta(k, z)} for every evolved initial condition."""
    ds = {"ad": _interp_sources_at_z(pert, bg, jnp.asarray(z), SrcIdx.ix[col])}
    for ic, src in (getattr(pert, "sources_iso", None) or {}).items():
        ds[ic] = _interp_sources_at_z(pert._replace(sources=src), bg,
                                      jnp.asarray(z), SrcIdx.ix[col])
    return ds


def pair_primordial_pk(pm: PrimordialResult, n1, n2, k):
    """Primordial spectrum of an (ic1, ic2) pair; None when uncorrelated."""
    if n1 == "ad" and n2 == "ad":
        return pm.scalar_pk(k)
    if n1 == n2:
        return pm.iso_pk(n1, k)
    return pm.cross_pk(n1, n2, k)


def pk_linear_at_z(pert, bg, pm: PrimordialResult, z, col="delta_m"):
    """P(k,z) = 2 pi^2 / k^3 sum_pairs P_R^{12}(k) delta_1 delta_2
    (nonlinear_pk_linear :1886; off-diagonal ic pairs count twice,
    spectra_module.cpp:305-308)."""
    k = pert.k
    if not getattr(pert, "sources_iso", None):
        delta = _interp_sources_at_z(pert, bg, jnp.asarray(z), SrcIdx.ix[col])
        return 2.0 * math.pi**2 / k**3 * pm.scalar_pk(k) * delta**2
    ds = pk_ic_deltas(pert, bg, z, col)
    names = list(ds)
    total = jnp.zeros_like(k)
    for i1, n1 in enumerate(names):
        for i2 in range(i1, len(names)):
            n2 = names[i2]
            pk12 = pair_primordial_pk(pm, n1, n2, k)
            if pk12 is None:
                continue
            total = total + (1.0 if i1 == i2 else 2.0) * pk12 * ds[n1] * ds[n2]
    return 2.0 * math.pi**2 / k**3 * total


def sigma_R(k, pk, R):
    """Top-hat sigma(R): reference nonlinear_sigmas (:2041). Trapezoid in lnk."""
    x = k[None, :] * jnp.atleast_1d(R)[:, None]
    W = 3.0 * (jnp.sin(x) - x * jnp.cos(x)) / x**3
    integrand = k[None, :] ** 3 * pk[None, :] / (2.0 * math.pi**2) * W**2
    lnk = jnp.log(k)
    return jnp.sqrt(jnp.trapezoid(integrand, lnk, axis=-1))


def _halofit_one_z(k_hf, pk_hf, k_out, pk_lin_out, Omega_m, Omega_v, w0, fnu, Omega0_m,
                   h, min_k_nl):
    """Halofit ratio at one redshift. k_hf: dense log grid; pk_hf: linear P on it."""
    anorm = 1.0 / (2.0 * math.pi**2)
    base = pk_hf * k_hf**2 * anorm       # common integrand factor
    lnk = jnp.log(k_hf)

    def sums(R):
        x2 = (k_hf * R) ** 2
        g = jnp.exp(-x2)
        s1 = jnp.trapezoid(base * g * k_hf, lnk)          # note dk = k dlnk
        s2 = jnp.trapezoid(base * 2.0 * x2 * g * k_hf, lnk)
        s3 = jnp.trapezoid(base * 4.0 * x2 * (1.0 - x2) * g * k_hf, lnk)
        return s1, s2, s3

    # vectorized sigma(R) on a log grid, invert sigma = 1
    nR = 160
    lgR = jnp.linspace(jnp.log10(1.0 / k_hf[-1] * 0.3), jnp.log10(1.0 / min_k_nl), nR)
    Rg = 10.0 ** lgR
    x2g = (k_hf[None, :] * Rg[:, None]) ** 2
    s1g = jnp.trapezoid(base[None, :] * jnp.exp(-x2g) * k_hf[None, :], lnk, axis=-1)
    lnsig = 0.5 * jnp.log(s1g)           # ln sigma(R), decreasing in R
    # first crossing of 0
    lgR_nl = jnp.interp(0.0, -lnsig, lgR)
    R_nl = 10.0 ** lgR_nl
    # Newton polish (2 iterations) on ln sigma(R)
    for _ in range(2):
        s1, s2, _ = sums(R_nl)
        # d ln sigma / d ln R = -s2/(2 s1)... note s2 = -d s1/dlnR / ... :
        # ds1/dR: d/dR exp(-k2R2) = -2k2R exp -> dlns1/dlnR = -s2/s1
        f = 0.5 * jnp.log(s1)
        fprime = -0.5 * s2 / s1
        R_nl = R_nl * jnp.exp(-f / fprime * 0.0 + (0.0 - f) / fprime)

    s1, s2, s3 = sums(R_nl)
    sigma = jnp.sqrt(s1)
    d1 = -s2 / s1
    d2 = -(s2 / s1) ** 2 - s3 / s1
    rknl = 1.0 / R_nl
    rneff = -3.0 - d1
    rncur = -d2

    # Takahashi 2012 + Bird corrections (nonlinear_halofit :2655-2710)
    gam = 0.1971 - 0.0843 * rneff + 0.8460 * rncur
    a = 10.0 ** (1.5222 + 2.8553 * rneff + 2.3706 * rneff**2 + 0.9903 * rneff**3
                 + 0.2250 * rneff**4 - 0.6038 * rncur + 0.1749 * Omega_v * (1.0 + w0))
    b = 10.0 ** (-0.5642 + 0.5864 * rneff + 0.5716 * rneff**2 - 1.5474 * rncur
                 + 0.2279 * Omega_v * (1.0 + w0))
    c = 10.0 ** (0.3698 + 2.0404 * rneff + 0.8161 * rneff**2 + 0.5869 * rncur)
    xmu = 0.0
    xnu = 10.0 ** (5.2105 + 3.6902 * rneff)
    alpha = jnp.abs(6.0835 + 1.3373 * rneff - 0.1959 * rneff**2 - 5.5274 * rncur)
    beta = (2.0379 - 0.7354 * rneff + 0.3157 * rneff**2 + 1.2490 * rneff**3
            + 0.3980 * rneff**4 - 0.1682 * rncur + fnu * (1.081 + 0.395 * rneff**2))

    frac = Omega_v / (1.0 - Omega_m)
    f1 = jnp.where(jnp.abs(1.0 - Omega_m) > 0.01,
                   frac * Omega_m**-0.0307 + (1 - frac) * Omega_m**-0.0732, 1.0)
    f2 = jnp.where(jnp.abs(1.0 - Omega_m) > 0.01,
                   frac * Omega_m**-0.0585 + (1 - frac) * Omega_m**-0.1423, 1.0)
    f3 = jnp.where(jnp.abs(1.0 - Omega_m) > 0.01,
                   frac * Omega_m**0.0743 + (1 - frac) * Omega_m**0.0725, 1.0)

    rk = k_out
    pk_lin_dimless = pk_lin_out * rk**3 * anorm
    y = rk / rknl
    pk_halo = a * y ** (f1 * 3.0) / (1.0 + b * y**f2 + (f3 * c * y) ** (3.0 - gam))
    pk_halo = pk_halo / (1.0 + xmu / y + xnu / y**2) * (1.0 + fnu * (0.977 - 18.015 * (Omega0_m - 0.3)))
    pk_linaa = pk_lin_dimless * (1.0 + fnu * 47.48 * (rk / h) ** 2 / (1.0 + 1.5 * (rk / h) ** 2))
    pk_quasi = pk_lin_dimless * (1.0 + pk_linaa) ** beta / (1.0 + pk_linaa * alpha) \
        * jnp.exp(-y / 4.0 - y**2 / 8.0)
    pk_nl = (pk_halo + pk_quasi) / rk**3 / anorm
    pk_nl = jnp.where(rk > min_k_nl, pk_nl, pk_lin_out)
    return pk_nl, rknl


def _extend_pk(k, pk_z, pm: PrimordialResult, k_max_extra, per_decade=10.0):
    """Extrapolate the linear P(k,z) beyond the source k_max, HMcode-style.

    Reference nonlinear_get_source (nonlinear_module.cpp:1750-1835),
    default method extrap_max_scaled: the *source* (transfer function)
    is continued as S(k) = S_max * ln(a k)/ln(a k_max) with a fixed by
    the last two tabulated points; the primordial spectrum stays analytic.
    Returns (k_ext, pk_ext) with k_ext = [k, logspaced tail up to k_max_extra].
    """
    n_extra = int(math.log10(k_max_extra / float(k[-1])) * per_decade) + 1
    k_tail = np.asarray(k[-1]) * 10.0 ** ((np.arange(n_extra) + 1.0) / per_decade)
    k_tail = jnp.asarray(k_tail)
    # recover |S| on the last two points:  P = 2 pi^2/k^3 P_R S^2
    anorm = 1.0 / (2.0 * math.pi**2)
    S = jnp.sqrt(pk_z[-2:] * k[-2:] ** 3 * anorm / pm.scalar_pk(k[-2:]))
    s_prev, s_max = S[0], S[1]
    lnk_max, lnk_prev = jnp.log(k[-1]), jnp.log(k[-2])
    ln_a = (s_prev * lnk_max - s_max * lnk_prev) / (s_max - s_prev)
    S_tail = s_max * (ln_a + jnp.log(k_tail)) / (ln_a + lnk_max)
    pk_tail = S_tail**2 * pm.scalar_pk(k_tail) / (k_tail**3 * anorm)
    return jnp.concatenate([k, k_tail]), jnp.concatenate([pk_z, pk_tail])


def _sigma_integrals(k_s, pk_s, R, lnk_s):
    """(sigma, dsigma^2/dR) for an array of R over a presampled log-k grid.

    Matches nonlinear_sigmas out_sigma / out_sigma_prime (:2041): top-hat
    window, trapezoid in ln k (the reference's t=1/(1+k) spline quadrature
    agrees to ~1e-6 at sigma_k_per_decade=80).
    """
    x = k_s[None, :] * jnp.atleast_1d(R)[:, None]
    small = x < 0.01
    W = jnp.where(small, 1.0 - x * x / 10.0,
                  3.0 / jnp.where(small, 1.0, x) ** 3
                  * (jnp.sin(x) - x * jnp.cos(x)))
    Wp = jnp.where(small, -0.2 * x,
                   3.0 / jnp.where(small, 1.0, x) ** 2 * jnp.sin(x)
                   - 9.0 / jnp.where(small, 1.0, x) ** 4
                   * (jnp.sin(x) - x * jnp.cos(x)))
    anorm = 1.0 / (2.0 * math.pi**2)
    base = k_s[None, :] ** 3 * pk_s[None, :] * anorm    # k^2 pk dk = k^3 pk dlnk
    sig2 = jnp.trapezoid(base * W * W, lnk_s, axis=-1)
    dsig2_dR = jnp.trapezoid(base * 2.0 * k_s[None, :] * W * Wp, lnk_s, axis=-1)
    return jnp.sqrt(sig2), dsig2_dR


def _sigma_disp(k_s, pk_s, R, lnk_s):
    """1D displacement dispersion sigma_d(R) (out_sigma_disp, :2131-2141)."""
    x = k_s[None, :] * jnp.atleast_1d(R)[:, None]
    small = x < 0.01
    W = jnp.where(small, 1.0 - x * x / 10.0,
                  3.0 / jnp.where(small, 1.0, x) ** 3
                  * (jnp.sin(x) - x * jnp.cos(x)))
    anorm = 1.0 / (2.0 * math.pi**2)
    integ = k_s[None, :] * pk_s[None, :] * anorm / 3.0 * W * W   # pk dk = k pk dlnk
    return jnp.sqrt(jnp.trapezoid(integ, lnk_s, axis=-1))


def _window_nfw(kx, rv, c):
    """Fourier transform of the NFW profile (nonlinear_hmcode_window_nfw
    :3718-3765): analytic in Si/Ci."""
    ks = kx * rv / c
    si1, ci1 = si_ci(ks)
    si2, ci2 = si_ci(ks * (1.0 + c))
    p1 = jnp.cos(ks) * (ci2 - ci1)
    p2 = jnp.sin(ks) * (si2 - si1)
    p3 = jnp.sin(ks * c) / (ks * (1.0 + c))
    return (p1 + p2 - p3) / (jnp.log(1.0 + c) - c / (1.0 + c))


def _growint(Omega0_m, Omega0_k, Omega0_de, w0, wa):
    """Linder & Cahn 2007 approximate growth, D = exp(-int Omega_m(a)^gamma dlna)
    (nonlinear_hmcode_growint :3623-3712), from a=1/(1+z_inf) to 1."""
    z_inf = 10.0
    a = jnp.linspace(1.0 / (1.0 + z_inf), 1.0, 1024)
    z = 1.0 / a - 1.0
    X_de = a ** (-3.0 * (1.0 + w0 + wa)) * jnp.exp(-3.0 * wa * (1.0 - a))
    H2 = Omega0_m * (1.0 + z) ** 3 + Omega0_k * (1.0 + z) ** 2 + Omega0_de * X_de
    Om = Omega0_m * (1.0 + z) ** 3 / H2
    gamma = jnp.where(w0 == -1.0, 0.55,
                      jnp.where(w0 < -1.0, 0.55 + 0.02 * (1.0 + w0),
                                0.55 + 0.05 * (1.0 + w0)))
    return jnp.exp(jnp.trapezoid(-(Om**gamma) / a, a))


def _hmcode_one_z(k, pk_m_z, pk_cb_z, pm, D_z, z, Omega_m_z, fnu, Omega0_m_eff,
                  h, eta_0, c_min, de_corr, growtable, ztable, pr: PrecisionParams):
    """HMcode-2016 nonlinear P(k) at one redshift (nonlinear_hmcode :2811).

    pk_m_z is the spectrum being corrected (_m or _cb); pk_cb_z is the
    cb spectrum used for the nonlinear-scale solve (reference index_pk_cb).
    Omega0_m_eff is Omega0_m for _m and Omega0_cb for _cb (ref :2889-2893).
    """
    # extended linear spectra, resampled at sigma_k_per_decade per decade
    k_ext, pk_ext = _extend_pk(k, pk_m_z, pm, pr.hmcode_max_k_extra)
    _, pkcb_ext = _extend_pk(k, pk_cb_z, pm, pr.hmcode_max_k_extra)
    n_s = int(math.log10(pr.hmcode_max_k_extra / float(k[0])) * pr.sigma_k_per_decade) + 1
    lnk_s = jnp.log(k[0]) + jnp.arange(n_s) / pr.sigma_k_per_decade * math.log(10.0)
    lnk_ext = jnp.log(k_ext)
    d2m = spline_d2(lnk_ext, jnp.log(pk_ext))
    d2cb = spline_d2(lnk_ext, jnp.log(pkcb_ext))
    k_samp = jnp.exp(lnk_s)
    pk_samp = jnp.exp(spline_eval(lnk_ext, jnp.log(pk_ext), d2m, lnk_s))
    pkcb_samp = jnp.exp(spline_eval(lnk_ext, jnp.log(pkcb_ext), d2cb, lnk_s))

    # scalars: sigma8(z), displacement dispersions (ref :2924-2955)
    sigma8, _ = _sigma_integrals(k_samp, pk_samp, 8.0 / h, lnk_s)
    sigma8 = sigma8[0]
    sigma_disp = _sigma_disp(k_samp, pk_samp, 1e-12, lnk_s)[0]
    sigma_disp100 = _sigma_disp(k_samp, pk_samp, 100.0 / h, lnk_s)[0]

    # spherical-collapse thresholds (ref :2973-2981)
    delta_c = 1.59 + 0.0314 * jnp.log(sigma8)
    delta_c = delta_c * (1.0 + 0.0123 * jnp.log10(Omega_m_z))
    delta_c = delta_c * (1.0 + 0.262 * fnu)
    Delta_v = 418.0 * Omega_m_z ** (-0.352) * (1.0 + 0.916 * fnu)
    fraction = 0.01 ** (1.0 / 3.0)

    # mass grid (ref :2958-3021)
    nm = pr.nsteps_for_p1h_integral
    rho_crit = 2.7754e11 * h * h            # M_sun / Mpc^3 (3 H0^2/8 pi G)
    mmin = pr.mmin_for_p1h_integral / h
    mmax = pr.mmax_for_p1h_integral / h
    m = jnp.exp(jnp.linspace(jnp.log(mmin), jnp.log(mmax), nm))
    r_real = (3.0 * m / (4.0 * math.pi * rho_crit * Omega0_m_eff)) ** (1.0 / 3.0)
    r_virial = r_real / Delta_v ** (1.0 / 3.0)
    sigma_r, _ = _sigma_integrals(k_samp, pk_samp, r_real, lnk_s)
    sigmaf_r, _ = _sigma_integrals(k_samp, pk_samp, r_real * fraction, lnk_s)
    nu = delta_c / sigma_r

    # nonlinear scale: sigma_cb(r_nl) = delta_c (ref :3024-3119): monotone
    # inversion of ln sigma_cb on the mass grid + 2 Newton polishes
    sig_cb, dsig2_cb = _sigma_integrals(k_samp, pkcb_samp, r_real, lnk_s)
    ln_r_nl = jnp.interp(jnp.log(delta_c), -jnp.log(sig_cb), jnp.log(r_real))
    r_nl = jnp.exp(ln_r_nl)
    for _ in range(2):
        s, ds2 = _sigma_integrals(k_samp, pkcb_samp, r_nl, lnk_s)
        s, ds2 = s[0], ds2[0]
        f = jnp.log(s / delta_c)
        fp = r_nl * ds2 / (2.0 * s * s)     # dln sigma/dln R
        r_nl = r_nl * jnp.exp(-f / fp)
    k_nl = 1.0 / r_nl

    # effective index at r_nl (ref :3122-3140); the reference's
    # sigma_prime = d sigma^2/dR and n_eff = -3 - r sigma'^2-normalized
    s_nl, ds2_nl = _sigma_integrals(k_samp, pkcb_samp, r_nl, lnk_s)
    dlnsig = r_nl * ds2_nl[0] / (s_nl[0] ** 2)
    n_eff = -3.0 - dlnsig
    alpha = 3.24 * 1.85**n_eff

    # halo concentrations, Bullock et al. (ref :3143-3165)
    g_form = jnp.minimum(delta_c * D_z / sigmaf_r, 1.0)
    z_form = jnp.interp(g_form, growtable, ztable)
    conc = jnp.where(z_form < z, c_min,
                     c_min * (1.0 + z_form) / (1.0 + z) * de_corr)

    # damping parameters (ref :3168-3174)
    eta = eta_0 - 0.3 * sigma8
    k_star = 0.584 / sigma_disp
    fdamp = jnp.clip(0.0095 * (sigma_disp100 * h) ** 1.37, 1e-3, 0.99)

    # one-halo integral over nu (ref :3186-3243): (nk, nm) -> trapz in nu
    anorm = 1.0 / (2.0 * math.pi**2)
    gst = 0.21616 * (1.0 + (0.707 * nu * nu) ** -0.3) * jnp.exp(-0.707 * nu * nu / 2.0)
    kx = nu[None, :] ** eta * k[:, None]
    Wn = _window_nfw(kx, r_virial[None, :], conc[None, :])
    integ = m[None, :] * gst[None, :] * Wn * Wn
    integ = jnp.where(nu[None, :] <= 10.0, integ, 0.0)      # nu_cut (ref :3181)
    p1h = jnp.trapezoid(integ, nu, axis=-1)
    fac = jnp.where((k / k_star) ** 2 > 7.0, 0.0, jnp.exp(-((k / k_star) ** 2)))
    pk_1h = p1h * anorm * k**3 * (1.0 - fac) / (rho_crit * Omega0_m_eff)

    # two-halo term + blend (ref :3246-3258)
    pk_lin_dimless = pk_m_z * k**3 * anorm
    pk_2h = pk_lin_dimless * (1.0 - fdamp * jnp.tanh(k * sigma_disp / jnp.sqrt(fdamp)) ** 2)
    pk_2h = jnp.maximum(pk_2h, 0.0)
    pk_nl = (pk_1h**alpha + pk_2h**alpha) ** (1.0 / alpha) / k**3 / anorm
    return pk_nl, k_nl


def compute_hmcode(pert, bg, bidx, pm: PrimordialResult, pr: PrecisionParams,
                   params, z_pk=(0.0,), eta_0=0.603, c_min=3.13) -> PkResult:
    """HMcode-2016 (Mead et al.) nonlinear spectra at the requested redshifts.

    Reference nonlinear_hmcode (nonlinear_module.cpp:2811-3258) plus its
    workspace tables (:3310-3712). TPU-native reshaping: every per-mass /
    per-k loop is a dense array op; the sigma quadratures for all radii are
    one (nR, nk) matrix contraction; the growth table comes straight from
    the background's D column.
    """
    from .background import tau_of_z

    k = pert.k
    z_arr = jnp.asarray(z_pk)
    pk_lin = jax.vmap(lambda z: pk_linear_at_z(pert, bg, pm, z, "delta_m"))(z_arr)
    pk_cb = jax.vmap(lambda z: pk_linear_at_z(pert, bg, pm, z, "delta_cb"))(z_arr)

    # growth table D(z) on a linear a-grid (nonlinear_hmcode_fill_growtab :3573)
    a_g = jnp.linspace(pr.ainit_for_growtab, pr.amax_for_growtab, pr.n_hmcode_tables)
    z_g = 1.0 / a_g - 1.0
    tau_g = tau_of_z(bg, z_g)
    growtable = bg.lntau_spline.eval(jnp.log(tau_g))[:, bidx["D"]]
    ztable = z_g

    # dark-energy correction (nonlinear_hmcode_dark_energy_correction :3377)
    Omega0_de = 1.0 - float(bg.Omega0_m) - float(getattr(bg, "Omega0_r", 0.0)) \
        - params.Omega_k
    if params.use_fld:
        g_lcdm = _growint(bg.Omega0_m, params.Omega_k, Omega0_de, -1.0, 0.0)
        # growint's w(a) = w0 + (1-a) wa == CLP, so wa passes through
        # (reference passes dw_over_da_fld * (-1) = +wa, :3404)
        g_wcdm = _growint(bg.Omega0_m, params.Omega_k, Omega0_de,
                          params.w0_fld, params.wa_fld)
        de_corr = (g_wcdm / g_lcdm) ** 1.5
    else:
        de_corr = jnp.asarray(1.0)

    taus = tau_of_z(bg, z_arr)
    bgv = bg.lntau_spline.eval(jnp.log(taus))
    Om_z = bgv[:, bidx["Omega_m"]]
    D_z = bgv[:, bidx["D"]]
    fnu = jnp.asarray(float(bg.Omega0_ncdm_tot) / float(bg.Omega0_m))
    Om0 = jnp.asarray(float(bg.Omega0_m))
    Om0_cb = Om0 - float(bg.Omega0_ncdm_tot)

    def one_m(pk_z, pkcb_z, Dz, zz, Omz):
        return _hmcode_one_z(k, pk_z, pkcb_z, pm, Dz, zz, Omz, fnu, Om0,
                             params.h, eta_0, c_min, de_corr, growtable, ztable, pr)

    def one_cb(pk_z, Dz, zz, Omz):
        return _hmcode_one_z(k, pk_z, pk_z, pm, Dz, zz, Omz, jnp.asarray(0.0),
                             Om0_cb if float(bg.Omega0_ncdm_tot) else Om0,
                             params.h, eta_0, c_min, de_corr, growtable, ztable, pr)

    pk_nl, k_nl = jax.vmap(one_m)(pk_lin, pk_cb, D_z, z_arr, Om_z)
    pk_cb_nl, k_nl_cb = jax.vmap(one_cb)(pk_cb, D_z, z_arr, Om_z)

    pk0 = pk_linear_at_z(pert, bg, pm, 0.0, "delta_m")
    sigma8 = sigma_R(k, pk0, 8.0 / params.h)[0]
    return PkResult(k=k, z=z_arr, pk_lin=pk_lin, pk_nl=pk_nl,
                    pk_cb_lin=pk_cb, pk_cb_nl=pk_cb_nl, k_nl=k_nl,
                    k_nl_cb=k_nl_cb, sigma8=sigma8)


@lru_cache(maxsize=8)
def _halofit_core(min_k_nl: float, iOm: int, iOr: int, pk_eq: bool = False):
    """One jitted XLA program for the whole halofit stage: source-table
    interpolation at every z, the sigma(R) inversion, both total/cb ratios
    and sigma8. Eager dispatch is a network round-trip per op on remote
    accelerators, so the stage must be a single call.

    pk_eq: consume per-z effective (w0, Omega_m) tables (Pk_equal method,
    0810.0190 / 1601.07230; reference nonlinear_halofit :2372-2402 uses
    Omega_v = 1 - Omega_m_eff) instead of the true background columns."""

    def core(S_dm, S_cb, taus, k, k_hf, pk_prim, loga, tau_of_loga, spl,
             z_arr, w0_z, fnu, Omega0_m, h, om_eff_z):
        tau_q = jnp.interp(-jnp.log1p(z_arr), loga, tau_of_loga)
        anorm_k = 2.0 * math.pi**2 / k**3 * pk_prim

        def pk_of(S):
            d2s = spline_d2(taus, S.T)
            delta = spline_eval(taus, S.T, d2s, tau_q)      # (nz, nk)
            return anorm_k[None, :] * delta**2

        pk_lin = pk_of(S_dm)
        pk_cb = pk_of(S_cb)

        lnk_grid = jnp.log(k)
        if pk_eq:
            Om = om_eff_z
            Ov = 1.0 - Om
        else:
            bgv = spl.eval(jnp.log(tau_q))
            Om = bgv[:, iOm]
            Ov = 1.0 - Om - bgv[:, iOr]

        def one_z(pk_lin_z, pk_target_z, Om_z, Ov_z, w0_1, fnu_z):
            d2 = spline_d2(lnk_grid, jnp.log(pk_lin_z))
            pk_hf = jnp.exp(spline_eval(lnk_grid, jnp.log(pk_lin_z), d2,
                                        jnp.log(k_hf)))
            return _halofit_one_z(k_hf, pk_hf, k, pk_target_z, Om_z, Ov_z,
                                  w0_1, fnu_z, Omega0_m, h, min_k_nl)

        pk_nl, k_nl = jax.vmap(lambda p, om, ov, w1: one_z(p, p, om, ov, w1,
                                                           fnu))(
            pk_lin, Om, Ov, w0_z)
        pk_cb_nl, k_nl_cb = jax.vmap(
            lambda p, pc, om, ov, w1: one_z(p, pc, om, ov, w1,
                                            jnp.asarray(0.0)))(
            pk_lin, pk_cb, Om, Ov, w0_z)
        # note: reference computes the cb ratio from the cb spectrum with fnu=0

        # sigma8 at z=0
        tau_q0 = jnp.interp(jnp.zeros(()), loga, tau_of_loga)
        d2s = spline_d2(taus, S_dm.T)
        delta0 = spline_eval(taus, S_dm.T, d2s, tau_q0)
        pk0 = anorm_k * delta0**2
        sigma8 = sigma_R(k, pk0, 8.0 / h)[0]
        return pk_lin, pk_cb, pk_nl, pk_cb_nl, k_nl, k_nl_cb, sigma8

    from ..ops.export_cache import export_cached
    return export_cached(jax.jit(core), tag="halofit",
                         static_key=(min_k_nl, iOm, iOr, pk_eq))


def _pk_eq_tables(params, bg, pr, tau_rec, z_pk):
    """Pk_equal effective (w0, Omega_m)(z) tables (prepare_pk_eq,
    nonlinear_module.cpp:4064-4190): for 10 nodes z_i up to pk_eq_z_max,
    find the constant-w model (w0_eff, wa=0) whose conformal distance
    z_i -> recombination matches the true (w0, wa) model, then store its
    Omega_m(z_i). Host numpy: each iteration is a 4k-point trapezoid of
    1/(a^2 H), not a pipeline rebuild (the reference rebuilds background +
    thermodynamics per trial model; z_rec is fixed here — recombination
    physics does not feel late dark energy)."""
    N = 10
    zs = np.exp(np.log(1.0 + pr.pk_eq_z_max) / (N - 1) * np.arange(N)) - 1.0
    loga_t = np.asarray(bg.loga)
    tau_t = np.asarray(bg.tau_of_loga)
    tau_z_true = np.interp(-np.log1p(zs), loga_t, tau_t)
    a_rec = np.exp(np.interp(tau_rec, tau_t, loga_t))
    Om_m = float(bg.Omega0_m)
    Om_r = float(bg.Omega0_r)
    Om_k = float(params.Omega_k)
    Om_de = 1.0 - Om_m - Om_r - Om_k

    def chi_to_rec(a_i, w0):
        la = np.linspace(np.log(a_rec), np.log(a_i), 4096)
        a = np.exp(la)
        E = np.sqrt(Om_m * a**-3 + Om_r * a**-4 + Om_k * a**-2
                    + Om_de * a ** (-3.0 * (1.0 + w0)))
        return np.trapezoid(1.0 / (a * E), la) / float(bg.H0)

    w_eff = np.empty(N)
    om_eff = np.empty(N)
    for i, z in enumerate(zs):
        a_i = 1.0 / (1.0 + z)
        chi_true = tau_z_true[i] - tau_rec
        w0 = float(params.w0_fld)
        for _ in range(100):
            err = 1.0 - chi_to_rec(a_i, w0) / chi_true
            if abs(err) <= pr.pk_eq_tol:
                break
            w0 *= (1.0 + err) ** 10.0
        w_eff[i] = w0
        E2 = (Om_m * a_i**-3 + Om_r * a_i**-4 + Om_k * a_i**-2
              + Om_de * a_i ** (-3.0 * (1.0 + w0)))
        om_eff[i] = Om_m * a_i**-3 / E2
    # interpolate at the requested z_pk values
    zq = np.asarray(z_pk, dtype=np.float64)
    w0_z = np.interp(zq, zs, w_eff)
    om_z = np.interp(zq, zs, om_eff)
    return jnp.asarray(w0_z), jnp.asarray(om_z)


def compute_nonlinear(pert, bg, bidx, pm: PrimordialResult, pr: PrecisionParams,
                      params, z_pk=(0.0,), method="halofit",
                      hm_eta0=0.603, hm_cmin=3.13, tau_rec=None) -> PkResult:
    if method == "hmcode":
        return compute_hmcode(pert, bg, bidx, pm, pr, params, z_pk=z_pk,
                              eta_0=hm_eta0, c_min=hm_cmin)
    k = pert.k
    # ZERO-eager prologue: every scalar/grid below is host numpy (an eager op
    # on the remote accelerator costs a ~1 s round-trip; r2 spent 9.5 s here).
    # The k grid comes from the host copy carried by PerturbResult — pulling
    # the device array would block on the whole in-flight solver queue.
    k_np = pert.k_np if getattr(pert, "k_np", None) is not None \
        else np.asarray(k)
    z_arr = jnp.asarray(z_pk)

    # halofit k grid: log-spaced at halofit_k_per_decade between k bounds
    n_hf = int(math.log10(k_np[-1] / k_np[0]) * pr.halofit_k_per_decade) + 1
    k_hf = jnp.asarray(k_np[0] * 10.0 ** (np.arange(n_hf) / pr.halofit_k_per_decade))

    nz = len(np.atleast_1d(np.asarray(z_pk)))
    use_pk_eq = bool(getattr(params, "pk_eq", False) and params.use_fld
                     and params.wa_fld != 0.0 and tau_rec is not None)
    if use_pk_eq:
        w0_z, om_eff_z = _pk_eq_tables(params, bg, pr, tau_rec, z_pk)
    else:
        w0_z = jnp.full((nz,), params.w0_fld if params.use_fld else -1.0)
        om_eff_z = jnp.zeros((nz,))
    fnu = jnp.asarray(float(bg.Omega0_ncdm_tot) / float(bg.Omega0_m))
    Omega0_m = jnp.asarray(float(bg.Omega0_m))

    # primordial P_R(k) in host numpy (analytic: pure math; external/inflation:
    # small-table interp) — pm.scalar_pk(jnp) would issue ~5 eager device ops
    if pm.external is not None:
        lnk_t, lnp_s, _ = (np.asarray(a) for a in pm.external)
        pk_prim = jnp.asarray(np.exp(np.interp(np.log(k_np), lnk_t, lnp_s)))
    else:
        lnk = np.log(k_np / float(pm.k_pivot))
        pk_prim = jnp.asarray(
            float(pm.A_s) * np.exp((float(pm.n_s) - 1.0) * lnk
                                   + 0.5 * float(pm.alpha_s) * lnk**2))

    core = _halofit_core(float(pr.halofit_min_k_nonlinear),
                         int(bidx["Omega_m"]), int(bidx["Omega_r"]),
                         pk_eq=use_pk_eq)
    S_dm = pert.sources[:, :, SrcIdx.ix["delta_m"]]
    S_cb = pert.sources[:, :, SrcIdx.ix["delta_cb"]]
    if getattr(pert, "sources_iso", None):
        # multi-IC: the core computes P = P_R^ad(k) delta^2, so fold every
        # ic pair into an EFFECTIVE delta with delta_eff^2 = sum_pairs
        # P_R^{12}/P_R^{ad} delta_1 delta_2 (off-diagonal twice,
        # nonlinear_pk_linear sums ic_ic pairs the same way)
        def _eff(col):
            d = {"ad": pert.sources[:, :, SrcIdx.ix[col]]}
            for icn, src in pert.sources_iso.items():
                d[icn] = src[:, :, SrcIdx.ix[col]]
            names = list(d)
            kj = jnp.asarray(k)
            p_ad = pm.scalar_pk(kj)
            tot = jnp.zeros_like(d["ad"])
            for i1, n1 in enumerate(names):
                for i2 in range(i1, len(names)):
                    p12 = pair_primordial_pk(pm, n1, names[i2], kj)
                    if p12 is None:
                        continue
                    f = (1.0 if i1 == i2 else 2.0)
                    tot = tot + f * (p12 / p_ad)[:, None] * d[n1] * d[names[i2]]
            return jnp.sign(d["ad"]) * jnp.sqrt(jnp.maximum(tot, 0.0))

        S_dm = _eff("delta_m")
        S_cb = _eff("delta_cb")
    # pin every input to the accelerator holding the source table: the
    # background tables are host-CPU-committed (pipeline pins setup stages
    # there) and mixed-device args would force the jit onto the host,
    # shipping the large source slices back over the device link each call
    dev = getattr(S_dm, "device", None) or jax.devices()[0]
    args = jax.device_put(
        (S_dm, S_cb, jnp.asarray(pert.tau), jnp.asarray(k), k_hf, pk_prim,
         bg.loga, bg.tau_of_loga, bg.lntau_spline, z_arr, w0_z, fnu, Omega0_m,
         jnp.asarray(params.h), om_eff_z), dev)
    pk_lin, pk_cb, pk_nl, pk_cb_nl, k_nl, k_nl_cb, sigma8 = core(*args)

    return PkResult(k=k, z=z_arr, pk_lin=pk_lin, pk_nl=pk_nl,
                    pk_cb_lin=pk_cb, pk_cb_nl=pk_cb_nl, k_nl=k_nl,
                    k_nl_cb=k_nl_cb, sigma8=sigma8)
