"""Number-count and galaxy-lensing angular spectra (nCl / sCl).

Reference: transfer_module.cpp — selection windows
(transfer_precompute_selection :4031, transfer_selection_sampling :2288,
transfer_selection_compute :2490), density/lensing source assembly
(transfer_sources :1845, integrated kernel :4238), Limber switches
(transfer_compute_for_each_l :2681/:2721); spectra_module d_size types.

Scope this round: the reference's *default* number-count contribution set
(density term; `number count contributions` extensions rsd/lensing/gr are
not yet wired) plus the sCl galaxy lensing potential, flat geometry,
gaussian/tophat/dirac selections.

TPU-native design: all bins and observables ride ONE Bessel-recurrence scan
over l (same pattern as transfer.py) — the per-(bin, type) windowed sources
are rows of a single (nrow, nk, ntau) tensor on a shared padded tau grid,
so each emitted l is one fused contraction; the high-l tail switches to
Limber per the reference's z-scaled thresholds.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.precision import PrecisionParams
from ..ops.quadrature import trapz_weights
from ..ops.splines import spline_d2, spline_eval
from .perturbations.indices import SrcIdx
from .transfer import get_l_list

N_TAU_NC = 512


class NumberCountsResult(NamedTuple):
    ell: jnp.ndarray          # integer multipoles 2..l_max
    dd: jnp.ndarray           # (n_dd_pairs, nl) density auto/cross
    ll: jnp.ndarray           # (n_dd_pairs, nl) lensing-potential auto/cross
    dl: jnp.ndarray           # (nbin*nbin, nl) density x lensing
    dd_pairs: tuple           # [(i, j)] orderings for dd/ll
    dl_pairs: tuple           # [(i, j)] for dl


def _selection_dndz(z, mean, width, kind):
    if kind == "gaussian":
        return jnp.exp(-0.5 * ((z - mean) / width) ** 2)
    if kind == "tophat":
        # smoothed tophat (transfer_selection_function :2560)
        return 1.0 / (1.0 + jnp.exp((jnp.abs(z - mean) / width - 1.0) * 10.0))
    raise ValueError(f"unknown selection {kind!r}")


def _bin_windows(bg, bidx, sel_means, sel_widths, kind, pr, tau0):
    """Per-bin density windows W(tau) (normalized dN/dtau) and lensing
    kernels W_L(tau) on per-row tau grids of N_TAU_NC points.

    Returns (tau_rows, W_rows, row_kind) with one row per (bin, type):
    first all density rows, then all lensing rows."""
    from .background import tau_of_z

    nbin = len(sel_means)
    cut = pr.selection_cut_at_sigma
    taus_rows, w_rows = [], []

    # density windows
    for b in range(nbin):
        z_hi = sel_means[b] + cut * sel_widths[b]
        z_lo = max(sel_means[b] - cut * sel_widths[b], 0.0)
        tau_min = float(tau_of_z(bg, jnp.asarray(z_hi)))
        tau_max = float(tau_of_z(bg, jnp.asarray(z_lo)))
        tau = jnp.linspace(tau_min, min(tau_max, float(tau0) * (1.0 - 1e-8)), N_TAU_NC)
        bgv = bg.lntau_spline.eval(jnp.log(tau))
        a = bgv[:, bidx["a"]]
        H = bgv[:, bidx["H"]]
        z = 1.0 / a - 1.0
        W = _selection_dndz(z, sel_means[b], sel_widths[b], kind) * H
        W = W / jnp.trapezoid(W, tau)
        taus_rows.append(tau)
        w_rows.append(W)

    # lensing kernels: W_L(tau) = int_{chi}^{chi_max} dchi_s W(chi_s)
    #                             (chi_s - chi)/(chi_s chi)   [flat K=0]
    for b in range(nbin):
        tau_s = taus_rows[b]
        W_s = w_rows[b]
        chi_s = tau0 - tau_s                      # (nsel,)
        tau = jnp.linspace(float(tau_of_z(bg, jnp.asarray(
            sel_means[b] + cut * sel_widths[b]))),
            float(tau0) * (1.0 - 1e-8), N_TAU_NC)
        chi = tau0 - tau                          # (ntau,)
        ker = (chi_s[None, :] - chi[:, None]) / (chi_s[None, :] * chi[:, None])
        ker = jnp.where(chi_s[None, :] > chi[:, None], ker, 0.0)
        wq = trapz_weights(tau_s)
        WL = jnp.sum(ker * (W_s * wq)[None, :], axis=1)   # (ntau,)
        taus_rows.append(tau)
        w_rows.append(WL)

    return jnp.stack(taus_rows), jnp.stack(w_rows)


def _resample_sources(pert, col, tau_rows):
    """Source column (nk, ntau_pert) resampled onto each row's tau grid:
    (nrow, nk, N_TAU_NC)."""
    S = pert.sources[:, :, SrcIdx.ix[col]]        # (nk, ntau)
    taus = pert.tau
    d2 = spline_d2(taus, S.T)                     # spline in tau

    def one_row(tr):
        return spline_eval(taus, S.T, d2, tr).T   # (nk, N_TAU_NC)

    return jax.vmap(one_row)(tau_rows)


@lru_cache(maxsize=4)
def _nc_core(lmax_scan, n_l, n_row, nk, ntau):
    def core(x, Wrow, l_emit, emit_idx):
        return _nc_scan(x, Wrow, l_emit, emit_idx, lmax_scan, n_l, n_row, nk)

    return jax.jit(core)


def _nc_scan(x, Wrow, l_emit, emit_idx, lmax_scan, n_l, n_row, nk):
    """Bessel-recurrence LOS scan: x, Wrow (nrow, nk, ntau) ->
    Delta (nl, nrow, nk). Radial function is plain j_l for both density and
    lensing types (transfer_select_radial_function :3540)."""
    from jax.scipy.special import gammaln

    x = jnp.maximum(x, 1e-12)
    inv_x = 1.0 / x
    small = x < 0.3
    x2 = x * x
    j0 = jnp.where(small, 1.0 - x2 / 6.0 * (1.0 - x2 / 20.0 * (1.0 - x2 / 42.0)),
                   jnp.sin(x) * inv_x)
    j1 = jnp.where(small, x / 3.0 * (1.0 - x2 / 10.0 * (1.0 - x2 / 28.0)),
                   (jnp.sin(x) * inv_x - jnp.cos(x)) * inv_x)

    def body(carry, l_int):
        jm1, jm2, acc = carry
        l = l_int.astype(x.dtype)
        jl = (2.0 * l - 1.0) * inv_x * jm1 - jm2
        mask = l <= x + 6.0 * jnp.cbrt(x) + 2.0
        jl = jnp.where(mask, jl, 0.0)
        ei = emit_idx[l_int]

        def do_emit(acc):
            lnx = jnp.log(x)
            ln2 = math.log(2.0)
            lndf = gammaln(2.0 * l + 2.0) - l * ln2 - gammaln(l + 1.0)
            c1 = 2.0 * l + 3.0
            corr = 1.0 - x2 / (2.0 * c1) * (1.0 - x2 / (4.0 * (c1 + 2.0))
                                            * (1.0 - x2 / (6.0 * (c1 + 4.0))))
            js = jnp.exp(l * lnx - lndf) * corr
            jl_e = jnp.where(x < 1.0, js, jl)
            row = jnp.sum(Wrow * jl_e, axis=-1)   # (nrow, nk)
            z32 = jnp.zeros((), ei.dtype)
            return jax.lax.dynamic_update_slice(acc, row[None], (ei, z32, z32))

        acc = jax.lax.cond(ei >= 0, do_emit, lambda a: a, acc)
        return (jl, jm1, acc), None

    acc0 = jnp.zeros((n_l, n_row, nk))
    (_, _, acc), _ = jax.lax.scan(body, (j1, j0, acc0), jnp.arange(2, lmax_scan + 1))
    return acc


def compute_number_counts(pert, bg, bidx, pm, pr: PrecisionParams,
                          sel_means, sel_widths, kind="gaussian",
                          l_max=300, non_diag=0, want_dd=True,
                          want_ll=True) -> NumberCountsResult:
    nbin = len(sel_means)
    tau0 = pert.tau0
    tau_rows, W_rows = _bin_windows(bg, bidx, sel_means, sel_widths, kind, pr, tau0)

    # windowed sources: density rows use delta_m, lensing rows phi+psi.
    # Sign: our source normalization has delta_m of the opposite sign
    # relative to (phi+psi) compared to the reference's (their matter
    # transfer functions are negative w.r.t. curvature_ini, ours positive);
    # flip the density rows so the dens x lens cross-spectra match the
    # reference convention (validated against the g7 golden).
    S_d = -_resample_sources(pert, "delta_m", tau_rows[:nbin])
    S_l = _resample_sources(pert, "phi_plus_psi", tau_rows[nbin:])
    S = jnp.concatenate([S_d, S_l], axis=0)       # (2*nbin, nk, ntau)
    WS = S * W_rows[:, None, :]

    # trapezoid weights per row (uniform grids)
    dtau = tau_rows[:, 1] - tau_rows[:, 0]        # (nrow,)
    wt = jnp.full((tau_rows.shape[0], N_TAU_NC), 1.0).at[:, 0].set(0.5).at[:, -1].set(0.5)
    Wrow = WS * (wt * dtau[:, None])[:, None, :]

    k = pert.k
    x = k[None, :, None] * (tau0 - tau_rows)[:, None, :]

    ls = get_l_list(pr, l_max)
    lmax_scan = int(ls[-1])
    emit_idx_np = np.full(lmax_scan + 1, -1, dtype=np.int32)
    for i, lv in enumerate(ls):
        emit_idx_np[lv] = i
    core = _nc_core(lmax_scan, len(ls), 2 * nbin, len(k), N_TAU_NC)
    delta = core(x, Wrow, jnp.asarray(ls), jnp.asarray(emit_idx_np))  # (nl, nrow, nk)

    # --- Limber tail (transfer_limber :2912): Delta_l(k) =
    # sqrt(pi/(2l+1)) WS(k, tau0-(l+1/2)/k)/k, per the reference's z-scaled
    # switch thresholds
    lf = jnp.asarray(ls, jnp.float64)
    ipg = jnp.sqrt(math.pi / (2.0 * lf + 1.0))
    tau_lim = tau0 - (lf[:, None] + 0.5) / k[None, :]     # (nl, nk)

    def limber_row(ws_row, tau_row):
        """ws_row (nk, ntau) on uniform tau_row -> (nl, nk) Limber values."""
        dt = tau_row[1] - tau_row[0]
        fi = (jnp.clip(tau_lim, tau_row[0], tau_row[-1]) - tau_row[0]) / dt
        i0 = jnp.clip(jnp.floor(fi).astype(jnp.int32), 0, N_TAU_NC - 2)
        wf = fi - i0
        lo = jnp.take_along_axis(ws_row[None, :, :].repeat(len(ls), 0),
                                 i0[:, :, None], axis=2)[..., 0]
        hi = jnp.take_along_axis(ws_row[None, :, :].repeat(len(ls), 0),
                                 (i0 + 1)[:, :, None], axis=2)[..., 0]
        S_at = (1.0 - wf) * lo + wf * hi
        inside = (tau_lim > tau_row[0]) & (tau_lim < tau_row[-1])
        return jnp.where(inside, ipg[:, None] * S_at / k[None, :], 0.0)

    d_limber = jax.vmap(limber_row)(WS, tau_rows)          # (nrow, nl, nk)
    d_limber = d_limber.transpose(1, 0, 2)                 # (nl, nrow, nk)

    # per-row switch: density rows at l >= 100*z_mean, lensing at 30*z_mean
    # (precisions.h:400/:406)
    z_means = np.asarray(list(sel_means) + list(sel_means))
    switch = np.concatenate([
        pr.l_switch_limber_for_nc_local_over_z * z_means[:nbin],
        pr.l_switch_limber_for_nc_los_over_z * z_means[nbin:]])
    use_lim = lf[:, None] >= jnp.asarray(switch)[None, :]
    delta = jnp.where(use_lim[:, :, None], d_limber, delta)

    # --- C_l quadrature over k (spectra_compute_cl :958)
    w = trapz_weights(k)
    meas = 4.0 * jnp.pi / k * pm.scalar_pk(k) * w

    def quad(a, b):
        return jnp.sum(meas[None, :] * a * b, axis=-1)     # (nl,)

    dd_pairs = tuple((i, j) for i in range(nbin) for j in range(i, min(i + non_diag, nbin - 1) + 1))
    dl_pairs = tuple((i, j) for i in range(nbin) for j in range(nbin))

    cl_dd = jnp.stack([quad(delta[:, i], delta[:, j]) for i, j in dd_pairs])
    cl_ll = jnp.stack([quad(delta[:, nbin + i], delta[:, nbin + j]) for i, j in dd_pairs])
    cl_dl = jnp.stack([quad(delta[:, i], delta[:, nbin + j]) for i, j in dl_pairs])

    # spline to all integer l
    ells = jnp.arange(2, l_max + 1)
    l_f = jnp.asarray(ls, jnp.float64)

    def to_all(cl_list):
        d2 = spline_d2(l_f, cl_list.T)
        return spline_eval(l_f, cl_list.T, d2, ells.astype(jnp.float64)).T

    return NumberCountsResult(ell=ells, dd=to_all(cl_dd), ll=to_all(cl_ll),
                              dl=to_all(cl_dl), dd_pairs=dd_pairs, dl_pairs=dl_pairs)
