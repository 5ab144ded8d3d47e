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
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.precision import PrecisionParams
from ..ops.splines import spline_d2, spline_eval
from .perturbations.indices import SrcIdx
from .primordial import PrimordialResult


class PkResult(NamedTuple):
    k: jnp.ndarray           # (nk,)
    z: jnp.ndarray           # (nz,) requested redshifts
    pk_lin: jnp.ndarray      # (nz, nk) linear P_m(k,z) [Mpc^3]
    pk_nl: jnp.ndarray       # (nz, nk) halofit P_m(k,z)
    pk_cb_lin: jnp.ndarray   # (nz, nk) cdm+baryon
    pk_cb_nl: jnp.ndarray
    k_nl: jnp.ndarray        # (nz,) nonlinearity scale
    sigma8: jnp.ndarray      # scalar sigma8(z=0)


def _interp_sources_at_z(pert, bg, z, col):
    """delta(k) at redshift z from the source table (spline in tau)."""
    from .background import tau_of_z

    tau_q = tau_of_z(bg, z)
    taus = pert.tau
    S = pert.sources[:, :, col]          # (nk, ntau)
    d2 = spline_d2(taus, S.T)
    return spline_eval(taus, S.T, d2, tau_q)   # (..., nk)


def pk_linear_at_z(pert, bg, pm: PrimordialResult, z, col="delta_m"):
    """P(k,z) = 2 pi^2 / k^3 P_R(k) delta_m(k,z)^2 (nonlinear_pk_linear :1886)."""
    delta = _interp_sources_at_z(pert, bg, jnp.asarray(z), SrcIdx.ix[col])
    k = pert.k
    pk_prim = pm.scalar_pk(k)
    return 2.0 * math.pi**2 / k**3 * pk_prim * delta**2


def sigma_R(k, pk, R):
    """Top-hat sigma(R): reference nonlinear_sigmas (:2041). Trapezoid in lnk."""
    x = k[None, :] * jnp.atleast_1d(R)[:, None]
    W = 3.0 * (jnp.sin(x) - x * jnp.cos(x)) / x**3
    integrand = k[None, :] ** 3 * pk[None, :] / (2.0 * math.pi**2) * W**2
    lnk = jnp.log(k)
    return jnp.sqrt(jnp.trapezoid(integrand, lnk, axis=-1))


def _halofit_one_z(k_hf, pk_hf, k_out, pk_lin_out, Omega_m, Omega_v, w0, fnu, Omega0_m,
                   h, pr: PrecisionParams):
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
    lgR = jnp.linspace(jnp.log10(1.0 / k_hf[-1] * 0.3), jnp.log10(1.0 / pr.halofit_min_k_nonlinear), nR)
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
    pk_nl = jnp.where(rk > pr.halofit_min_k_nonlinear, pk_nl, pk_lin_out)
    return pk_nl, rknl


def compute_nonlinear(pert, bg, bidx, pm: PrimordialResult, pr: PrecisionParams,
                      params, z_pk=(0.0,)) -> PkResult:
    from .background import tau_of_z

    k = pert.k
    z_arr = jnp.asarray(z_pk)
    pk_lin = jax.vmap(lambda z: pk_linear_at_z(pert, bg, pm, z, "delta_m"))(z_arr)
    pk_cb = jax.vmap(lambda z: pk_linear_at_z(pert, bg, pm, z, "delta_cb"))(z_arr)

    # halofit k grid: log-spaced at halofit_k_per_decade between k bounds
    n_hf = int(math.log10(float(k[-1]) / float(k[0])) * pr.halofit_k_per_decade) + 1
    k_hf = np.asarray(k[0]) * 10.0 ** (np.arange(n_hf) / pr.halofit_k_per_decade)
    k_hf = jnp.asarray(k_hf)
    lnk_grid = jnp.log(k)

    # background quantities at each z
    taus = tau_of_z(bg, z_arr)
    bgv = bg.lntau_spline.eval(jnp.log(taus))
    Om = bgv[:, bidx["Omega_m"]]
    Ov = 1.0 - bgv[:, bidx["Omega_m"]] - bgv[:, bidx["Omega_r"]]
    w0 = jnp.asarray(params.w0_fld if params.use_fld else -1.0)
    fnu = jnp.asarray(float(bg.Omega0_ncdm_tot) / float(bg.Omega0_m))
    Omega0_m = jnp.asarray(float(bg.Omega0_m))

    def one_z(pk_lin_z, pk_target_z, Om_z, Ov_z, fnu_z):
        d2 = spline_d2(lnk_grid, jnp.log(pk_lin_z))
        pk_hf = jnp.exp(spline_eval(lnk_grid, jnp.log(pk_lin_z), d2, jnp.log(k_hf)))
        return _halofit_one_z(k_hf, pk_hf, k, pk_target_z, Om_z, Ov_z, w0,
                              fnu_z, Omega0_m, params.h, pr)

    pk_nl, k_nl = jax.vmap(lambda p, om, ov: one_z(p, p, om, ov, fnu))(pk_lin, Om, Ov)
    pk_cb_nl, _ = jax.vmap(lambda p, pc, om, ov: one_z(p, pc, om, ov, jnp.asarray(0.0)))(
        pk_lin, pk_cb, Om, Ov)
    # note: reference computes the cb ratio from the cb spectrum itself with fnu=0

    # sigma8 at z=0
    pk0 = pk_linear_at_z(pert, bg, pm, 0.0, "delta_m")
    sigma8 = sigma_R(k, pk0, 8.0 / params.h)[0]

    return PkResult(k=k, z=z_arr, pk_lin=pk_lin, pk_nl=pk_nl,
                    pk_cb_lin=pk_cb, pk_cb_nl=pk_cb_nl, k_nl=k_nl, sigma8=sigma8)
