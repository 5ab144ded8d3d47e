"""Number-count and galaxy-lensing angular spectra (nCl / sCl).

Reference: transfer_module.cpp — selection windows
(transfer_precompute_selection :4031, transfer_selection_sampling :2288,
transfer_selection_compute :2490), density/RSD/Doppler/gravity/lensing
source assembly (transfer_sources :1845, window factors :4031-4440,
f_evo :4442), radial functions (transfer_select_radial_function :3540:
j_l for density/d0/g1-g3, j_l' for d1/g5, j_l'' for rsd), Limber variants
(transfer_limber :2912: T0/T1/NC_RSD forms), and the spectra assembly
Delta_nc = dens + rsd + d0 + d1 + l(l+1) lens + g1..g5
(spectra_module.cpp spectra_compute_cl nc block).

TPU-native design: all (bin, contribution) pairs ride ONE Bessel-recurrence
scan over l (same pattern as transfer.py) — each row of a single
(nrow, nk, ntau) tensor carries its windowed source on a shared padded tau
grid with a per-row radial code (j / j' / j''), so each emitted l is one
fused contraction; the high-l tail switches to the row's Limber form at the
reference's z-scaled thresholds.
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


def _n_tau_nc(pr):
    """Static per-row tau-grid length. The reference sizes each window's tau
    grid from selection_sampling / selection_sampling_bessel(_los)
    (transfer_selection_sampling :2288, :1473); the TPU-native redesign keeps
    ONE static padded length for all rows and scales it with the same knobs
    relative to their defaults (50 / 20 / 20), rounded to a multiple of 64."""
    scale = max(pr.selection_sampling / 50.0,
                pr.selection_sampling_bessel / 20.0,
                pr.selection_sampling_bessel_los / 20.0)
    return max(int(-(-N_TAU_NC * scale // 64) * 64), 128)

# per-contribution static description:
#   source column, k-power rescale, radial code (0=j, 1=j', 2=j''),
#   integrated? (lensing-kernel tau grid). Our delta_m/theta_m/metric
#   sources carry the reference's own signs (verified against the
#   reference tk output at z=0.5: sign(delta_m*phi) identical), so no
#   per-row sign flips: every matter x metric cross term follows the
#   reference convention (transfer_get_source_correspondence :1210-1240).
_CONTRIB = {
    #          src            kpow radial integ
    "density": ("delta_m",      0,   0,  False),
    "rsd":     ("theta_m",      0,   2,  False),
    "d0":      ("theta_m",     -2,   0,  False),
    "d1":      ("theta_m",     -1,   1,  False),
    "g1":      ("psi",          0,   0,  False),
    "g2":      ("phi",          0,   0,  False),
    "g3":      ("phi_prime",    0,   0,  False),
    "lens":    ("phi_plus_psi", 0,   0,  True),
    "g4":      ("phi_plus_psi", 0,   0,  True),
    "g5":      ("phi_plus_psi", 1,   1,  True),
}


class NumberCountsResult(NamedTuple):
    ell: jnp.ndarray          # integer multipoles 2..l_max
    dd: jnp.ndarray           # (n_dd_pairs, nl) density auto/cross
    ll: jnp.ndarray           # (n_dd_pairs, nl) lensing-potential auto/cross
    dl: jnp.ndarray           # (nbin*nbin, nl) density x lensing
    dd_pairs: tuple           # [(i, j)] orderings for dd/ll
    dl_pairs: tuple           # [(i, j)] for dl


class CmbNcCrossResult(NamedTuple):
    """CMB x large-scale-structure cross spectra (spectra_module.cpp
    :1201-1256). The reference computes pd (lensing potential x density)
    and hard-disables td/tl as too expensive for its per-l sampling
    (spectra_module.cpp:649-663, :685-700 comment them out); here the
    dense-q transfer scan makes them cheap, so they ship as extensions."""

    ell: jnp.ndarray          # integer multipoles 2..l_lss_max
    pd: jnp.ndarray           # (nbin, nl) phi_CMB x density
    td: jnp.ndarray = None    # (nbin, nl) T x density (extension)
    tl: jnp.ndarray = None    # (nbin, nl) T x galaxy lensing (extension)


def _selection_dndz(z, mean, width, kind, pr, dndz=None):
    """Raw selection shape (transfer_selection_function :2129-2230):
    gaussian normalized to unit dz integral, smoothed tophat with
    selection_tophat_edge, optional dN/dz multiplication from file."""
    if kind == "gaussian":
        W = jnp.exp(-0.5 * ((z - mean) / width) ** 2) \
            / width / math.sqrt(2.0 * math.pi)
    elif kind == "tophat":
        W = 0.5 * (1.0 - jnp.tanh((jnp.abs(z - mean) - width)
                                  / (pr.selection_tophat_edge * width)))
    else:
        raise ValueError(f"unknown selection {kind!r}")
    if dndz is not None:
        W = W * dndz(z)
    return W


def _dndz_analytic(z):
    """Euclid-IST photometric ansatz (transfer_dNdz_analytic :2252)."""
    z0 = 0.9 / math.sqrt(2.0)
    return (z / z0) ** 2.0 * jnp.exp(-((z / z0) ** 1.5))


def _dln_dndz_dz_analytic(z):
    z0 = 0.9 / math.sqrt(2.0)
    return (2.0 - 1.5 * (z / z0) ** 1.5) / z


def make_dndz_from_file(path):
    """(dndz, dln_dndz_dz) interpolators from a 2-column z, dN/dz file
    (reference has_nz_file spline tables)."""
    tab = np.loadtxt(path)
    zt, nt = tab[:, 0], tab[:, 1]
    lnn = np.log(np.maximum(nt, 1e-300))
    dln = np.gradient(lnn, zt)

    def dndz(z):
        return jnp.interp(z, jnp.asarray(zt), jnp.asarray(nt))

    def dlnd(z):
        return jnp.interp(z, jnp.asarray(zt), jnp.asarray(dln))

    return dndz, dlnd


def _row_specs(contributions, nbin, want_ll):
    """Flattened (type, bin) row order: all non-integrated contribution rows
    first, then integrated ones, then the sCl lensing-potential rows."""
    active = [t for t in ("density", "rsd", "d0", "d1", "g1", "g2", "g3",
                          "lens", "g4", "g5")
              if (t in contributions)
              or (t in ("rsd", "d0", "d1") and "rsd" in contributions)
              or (t in ("g1", "g2", "g3", "g4", "g5") and "gr" in contributions)
              or (t == "lens" and "lensing" in contributions)]
    rows = [(t, b) for t in active for b in range(nbin)]
    if want_ll:
        rows += [("sl", b) for b in range(nbin)]
    return rows


def compute_number_counts(pert, bg, bidx, pm, pr: PrecisionParams,
                          sel_means, sel_widths, kind="gaussian",
                          l_max=300, non_diag=0, want_dd=True,
                          want_ll=True, contributions=("density",),
                          selection_bias=None, magnification_bias=None,
                          dndz=None, dndz_evo=None) -> NumberCountsResult:
    """nCl/sCl spectra.

    contributions: subset of {"density", "rsd", "lensing", "gr"} (reference
    `number count contributions`; default density-only, input_module :1699).
    dndz / dndz_evo: None, "analytic", or a file path — selection dN/dz
    multiplier and the evolution term entering f_evo (reference
    has_nz_file/has_nz_analytic and has_nz_evo_*).
    """
    R = _assemble_rows(bg, bidx, pr, sel_means, sel_widths, kind,
                       contributions, selection_bias, magnification_bias,
                       dndz, dndz_evo, pert.tau0, want_ll)
    nbin = len(sel_means)
    rows = R.rows

    k = pert.k
    taus_p = pert.tau
    S_by_col = {}
    for col in set(R.src_cols):
        S = pert.sources[:, :, SrcIdx.ix[col]]        # (nk, ntau_pert)
        d2 = spline_d2(taus_p, S.T)
        S_by_col[col] = (S, d2)

    def s_eval(col, tr):
        S, d2 = S_by_col[col]
        return spline_eval(taus_p, S.T, d2, tr).T     # (nk, N_TAU_NC)

    ls = get_l_list(pr, l_max)
    delta = _delta_from_rows(k, s_eval, R, ls)        # (nl, nrow, nk)

    # --- assemble Delta_nc per bin: sum of contribution rows, with the
    # l(l+1) factor on nc_lens (spectra_compute_cl nc block)
    lf = jnp.asarray(ls, jnp.float64)
    llp1 = lf * (lf + 1.0)
    d_nc = jnp.zeros((len(ls), nbin, len(k)))
    d_sl = jnp.zeros((len(ls), nbin, len(k)))
    for i, (t, b) in enumerate(rows):
        if t == "sl":
            d_sl = d_sl.at[:, b].add(delta[:, i])
        elif t == "lens":
            d_nc = d_nc.at[:, b].add(llp1[:, None] * delta[:, i])
        else:
            d_nc = d_nc.at[:, b].add(delta[:, i])

    # --- C_l quadrature over k (spectra_compute_cl :958)
    w = trapz_weights(k)
    meas = 4.0 * jnp.pi / k * pm.scalar_pk(k) * w

    def quad(a, b):
        return jnp.sum(meas[None, :] * a * b, axis=-1)     # (nl,)

    dd_pairs = tuple((i, j) for i in range(nbin)
                     for j in range(i, min(i + non_diag, nbin - 1) + 1))
    dl_pairs = tuple((i, j) for i in range(nbin) for j in range(nbin))

    cl_dd = jnp.stack([quad(d_nc[:, i], d_nc[:, j]) for i, j in dd_pairs])
    cl_ll = jnp.stack([quad(d_sl[:, i], d_sl[:, j]) for i, j in dd_pairs])
    cl_dl = jnp.stack([quad(d_nc[:, i], d_sl[:, j]) for i, j in dl_pairs])

    # spline to all integer l
    ells = jnp.arange(2, l_max + 1)
    to_all = _spline_to_all_l(ls, ells)

    return NumberCountsResult(ell=ells, dd=to_all(cl_dd), ll=to_all(cl_ll),
                              dl=to_all(cl_dl), dd_pairs=dd_pairs,
                              dl_pairs=dl_pairs)


class _RowInfo(NamedTuple):
    rows: tuple               # [(type, bin)] in stacking order
    tau_rows: jnp.ndarray     # (nrow, N_TAU_NC)
    W_rows: jnp.ndarray       # (nrow, N_TAU_NC) windowed weights
    src_cols: tuple           # source column names per row
    kpow: tuple               # k-power rescale per row
    radial: tuple             # radial code per row (0=j, 1=j', 2=j'')
    lim_switch: tuple         # per-row Limber switch multipole
    tau0: float


def _spline_to_all_l(ls, ells):
    l_f = jnp.asarray(ls, jnp.float64)

    def to_all(cl_list):
        d2 = spline_d2(l_f, cl_list.T)
        return spline_eval(l_f, cl_list.T, d2, ells.astype(jnp.float64)).T

    return to_all


def _assemble_rows(bg, bidx, pr, sel_means, sel_widths, kind, contributions,
                   selection_bias, magnification_bias, dndz, dndz_evo,
                   tau0, want_ll) -> _RowInfo:
    """Selection windows, bias/evolution factors and per-row tau grids —
    everything about the LSS side that does not depend on the k grid."""
    from .background import tau_of_z

    nbin = len(sel_means)
    cut = pr.selection_cut_at_sigma
    bias = list(selection_bias) if selection_bias is not None else [1.0] * nbin
    magn = list(magnification_bias) if magnification_bias is not None \
        else [0.0] * nbin
    if len(bias) < nbin:
        bias = bias + [bias[-1]] * (nbin - len(bias))
    if len(magn) < nbin:
        magn = magn + [magn[-1]] * (nbin - len(magn))

    if dndz == "analytic":
        dndz_f = _dndz_analytic
    elif isinstance(dndz, str):
        dndz_f = make_dndz_from_file(dndz)[0]
    else:
        dndz_f = dndz
    if dndz_evo == "analytic":
        dlnevo_f = _dln_dndz_dz_analytic
    elif isinstance(dndz_evo, str):
        dlnevo_f = make_dndz_from_file(dndz_evo)[1]
    else:
        dlnevo_f = None

    rows = _row_specs(contributions, nbin, want_ll)

    # --- per-bin selection windows W(tau) (dN/dtau, unit tau-integral) on
    # selection tau grids, with background factors
    sel_tau, sel_W, sel_bgf = [], [], []
    for b in range(nbin):
        z_hi = sel_means[b] + cut * sel_widths[b]
        z_lo = max(sel_means[b] - cut * sel_widths[b], 0.0)
        tau_min = float(tau_of_z(bg, jnp.asarray(z_hi)))
        tau_max = float(tau_of_z(bg, jnp.asarray(z_lo)))
        tau = jnp.linspace(tau_min, min(tau_max, float(tau0) * (1.0 - 1e-8)),
                           _n_tau_nc(pr))
        bgv = bg.lntau_spline.eval(jnp.log(tau))
        a = bgv[:, bidx["a"]]
        H = bgv[:, bidx["H"]]
        Hp = bgv[:, bidx["H_prime"]]
        z = 1.0 / a - 1.0
        # dN/dtau = dN/dz |dz/dtau| = dN/dz H_proper, then unit tau-integral
        # (transfer_selection_compute :2490)
        W = _selection_dndz(z, sel_means[b], sel_widths[b], kind, pr, dndz_f) \
            * H
        W = W / jnp.trapezoid(W, tau)
        sel_tau.append(tau)
        sel_W.append(W)
        sel_bgf.append((a, H, Hp, z))

    # f_evo(tau) per bin (transfer_f_evo :4442; zero unless evolution given)
    def f_evo_of(b, tau, a, H, Hp, z):
        if dlnevo_f is None:
            return jnp.zeros_like(tau)
        chi = jnp.maximum(tau0 - tau, 1e-8)
        return (2.0 / (a * H * chi) + Hp / (a * H * H)
                - dlnevo_f(jnp.maximum(z, 1e-8)) / a)

    # integrated (lensing-kernel) tau grids per bin: from far edge of the
    # bin to today (transfer_lensing_sampling :2337)
    int_tau = []
    for b in range(nbin):
        tau = jnp.linspace(float(sel_tau[b][0]), float(tau0) * (1.0 - 1e-8),
                           _n_tau_nc(pr))
        int_tau.append(tau)

    # --- assemble per-row tau grids + windows
    taus_rows, w_rows, src_cols, kpow, radial = [], [], [], [], []
    lim_switch = []
    for (t, b) in rows:
        a, H, Hp, z = sel_bgf[b]
        aH = a * H
        tau = sel_tau[b]
        W = sel_W[b]
        chi = jnp.maximum(tau0 - tau, 1e-8)
        fe = f_evo_of(b, tau, a, H, Hp, z)
        s = magn[b]
        if t == "density":
            wrow = bias[b] * W
        elif t == "rsd":
            wrow = W / aH
        elif t == "d0":
            wrow = (fe - 3.0) * W * aH
        elif t == "d1":
            wrow = W * (1.0 + Hp / (a * H * H) + (2.0 - 5.0 * s) / (chi * aH)
                        + 5.0 * s - fe)
        elif t == "g1":
            wrow = W
        elif t == "g2":
            wrow = -W * (3.0 + Hp / (a * H * H)
                         + (2.0 - 5.0 * s) / (chi * aH) - fe)
        elif t == "g3":
            wrow = W / aH
        else:
            # integrated rows: kernel K(tau) = sum over selection sources
            # tau_s < tau of W(tau_s) x geometric factor (flat K = 0;
            # transfer_precompute_selection :4240-4400)
            tau_i = int_tau[b]
            chi_l = jnp.maximum(tau0 - tau_i, 1e-8)      # lens distance
            tau_s = sel_tau[b]
            chi_s = jnp.maximum(tau0 - tau_s, 1e-8)      # source distance
            wq = trapz_weights(tau_s)
            Wsw = sel_W[b] * wq                           # (nsel,)
            beyond = chi_s[None, :] > chi_l[:, None]      # sources beyond lens
            if t == "sl":
                # reference lensing_ rescaling += (chi_l-chi_s)/(chi_l chi_s)
                # (transfer :4351) — i.e. the stored sCl source is
                # -W(phi+psi), negative kernel
                ker = (chi_l[:, None] - chi_s[None, :]) \
                    / (chi_s[None, :] * chi_l[:, None])
                wrow = jnp.sum(jnp.where(beyond, ker, 0.0) * Wsw[None, :],
                               axis=1)
            elif t == "lens":
                # reference stores -(2-5s)/2 (chi_l-chi_s)/(chi_l chi_s);
                # equals +(2-5s)/2 (chi_s-chi_l)/(chi_l chi_s)
                ker = (chi_s[None, :] - chi_l[:, None]) \
                    / (chi_s[None, :] * chi_l[:, None])
                wrow = 0.5 * (2.0 - 5.0 * s) * jnp.sum(
                    jnp.where(beyond, ker, 0.0) * Wsw[None, :], axis=1)
            elif t == "g4":
                wrow = (2.0 - 5.0 * s) * jnp.sum(
                    jnp.where(beyond, (1.0 / chi_s)[None, :], 0.0)
                    * Wsw[None, :], axis=1)
            elif t == "g5":
                a_s, H_s, Hp_s, z_s = sel_bgf[b]
                fe_s = f_evo_of(b, tau_s, a_s, H_s, Hp_s, z_s)
                fac_s = (1.0 + Hp_s / (a_s * H_s * H_s)
                         + (2.0 - 5.0 * s) / (chi_s * a_s * H_s)
                         + 5.0 * s - fe_s)
                wrow = jnp.sum(jnp.where(beyond, fac_s[None, :], 0.0)
                               * Wsw[None, :], axis=1)
            # zero the tau0 end (reference sets rescaling=0 at tau_size-1)
            wrow = wrow.at[-1].set(0.0)
            tau = tau_i
        taus_rows.append(tau)
        w_rows.append(wrow)
        if t == "sl":
            src_cols.append("phi_plus_psi")
            kpow.append(0)
            radial.append(0)
            lim_switch.append(pr.l_switch_limber_for_nc_los_over_z
                              * max(sel_means[b], 1e-3))
        else:
            sc, kp, rd, integ = _CONTRIB[t]
            src_cols.append(sc)
            kpow.append(kp)
            radial.append(rd)
            # g5 is integrated but uses the LOCAL switch — its j_l'
            # radial makes the los-type Limber criterion invalid
            # (transfer_module.cpp:2717-2718)
            sw = (pr.l_switch_limber_for_nc_los_over_z
                  if (integ and t != "g5")
                  else pr.l_switch_limber_for_nc_local_over_z) \
                * max(sel_means[b], 1e-3)
            lim_switch.append(sw)

    return _RowInfo(rows=tuple(rows), tau_rows=jnp.stack(taus_rows),
                    W_rows=jnp.stack(w_rows), src_cols=tuple(src_cols),
                    kpow=tuple(kpow), radial=tuple(radial),
                    lim_switch=tuple(lim_switch), tau0=tau0)


def _delta_from_rows(k, s_eval, R: _RowInfo, ls):
    """Delta rows (nl, nrow, nk) on an arbitrary k grid: windowed source
    resampling, the Bessel-recurrence scan, and the Limber tail.
    s_eval(col, tau_row) -> (nk, N_TAU_NC) source values on the k grid."""
    tau_rows, W_rows = R.tau_rows, R.W_rows
    tau0 = R.tau0

    S_rows = []
    for i, (col, kp) in enumerate(zip(R.src_cols, R.kpow)):
        Sr = s_eval(col, tau_rows[i])
        if kp:
            Sr = Sr * k[:, None] ** kp
        S_rows.append(Sr)
    S = jnp.stack(S_rows)                             # (nrow, nk, ntau)
    WS = S * W_rows[:, None, :]

    # trapezoid weights per row (uniform grids)
    dtau = tau_rows[:, 1] - tau_rows[:, 0]
    wt = jnp.full(tau_rows.shape, 1.0)
    wt = wt.at[:, 0].set(0.5).at[:, -1].set(0.5)
    Wrow = WS * (wt * dtau[:, None])[:, None, :]

    x = k[None, :, None] * (tau0 - tau_rows)[:, None, :]
    rad_onehot = jnp.asarray(np.eye(3)[np.asarray(R.radial)])  # (nrow, 3)

    rows, radial, lim_switch = R.rows, R.radial, R.lim_switch
    lmax_scan = int(ls[-1])
    emit_idx_np = np.full(lmax_scan + 1, -1, dtype=np.int32)
    for i, lv in enumerate(ls):
        emit_idx_np[lv] = i
    n_row = len(rows)
    core = _nc_core(lmax_scan, len(ls), n_row, len(k), tau_rows.shape[1])
    delta = core(x, Wrow, rad_onehot, jnp.asarray(ls),
                 jnp.asarray(emit_idx_np))            # (nl, nrow, nk)

    # --- Limber tail (transfer_limber :2912): interpolate P = WS * chi at
    # chi = (l+c)/k and combine with the radial-specific coefficients
    lf = jnp.asarray(ls, jnp.float64)
    P_rows = WS * (tau0 - tau_rows)[:, None, :]       # (nrow, nk, ntau)

    def p_at(c):
        """P interpolated at chi = (l+c)/k -> (nrow, nl, nk)."""
        tau_lim = tau0 - (lf[:, None] + c) / k[None, :]      # (nl, nk)

        def one_row(p_row, tau_row):
            dt = tau_row[1] - tau_row[0]
            fi = (jnp.clip(tau_lim, tau_row[0], tau_row[-1]) - tau_row[0]) / dt
            i0 = jnp.clip(jnp.floor(fi).astype(jnp.int32), 0, tau_rows.shape[1] - 2)
            wf = fi - i0
            lo = jnp.take_along_axis(
                p_row[None].repeat(len(ls), 0), i0[:, :, None], axis=2)[..., 0]
            hi = jnp.take_along_axis(
                p_row[None].repeat(len(ls), 0),
                (i0 + 1)[:, :, None], axis=2)[..., 0]
            S_at = (1.0 - wf) * lo + wf * hi
            inside = (tau_lim > tau_row[0]) & (tau_lim < tau_row[-1])
            return jnp.where(inside, S_at, 0.0)

        return jax.vmap(one_row)(P_rows, tau_rows)

    def spi(shift):
        return jnp.sqrt(math.pi / (2.0 * lf + 1.0 + 2.0 * shift)) \
            / (lf + 0.5 + shift)

    # T0: j_l peak;  T1: j_l' = [l j_{l-1} - (l+1) j_{l+1}]/(2l+1);
    # NC_RSD: j_l'' three-term form (transfer_limber :2985-3040)
    P_m15, P_m05, P_p05, P_p15, P_p25 = (p_at(c) for c in
                                         (-1.5, -0.5, 0.5, 1.5, 2.5))
    lim_T0 = spi(0.0)[None, :, None] * P_p05
    lim_T1 = (-spi(1.0)[None, :, None] * P_p15 * ((lf + 1.0) / (2.0 * lf + 1.0))[None, :, None]
              + spi(-1.0)[None, :, None] * P_m05 * (lf / (2.0 * lf + 1.0))[None, :, None])
    c_p = (lf * (lf + 2.0) / (2.0 * lf + 1.0) / (2.0 * lf + 3.0))
    c_0 = (lf / (2.0 * lf + 1.0) * (lf / (2.0 * lf - 1.0)
                                    + (lf + 1.0) / (2.0 * lf + 3.0)))
    c_m = (lf * (lf - 1.0) / (2.0 * lf + 1.0) / (2.0 * lf - 1.0))
    lim_RSD = (spi(2.0)[None, :, None] * P_p25 * c_p[None, :, None]
               - spi(0.0)[None, :, None] * P_p05 * c_0[None, :, None]
               + spi(-2.0)[None, :, None] * P_m15 * c_m[None, :, None])
    d_limber = (rad_onehot[:, 0, None, None] * lim_T0
                + rad_onehot[:, 1, None, None] * lim_T1
                + rad_onehot[:, 2, None, None] * lim_RSD)     # (nrow, nl, nk)
    d_limber = d_limber.transpose(1, 0, 2)

    use_lim = lf[:, None] >= jnp.asarray(np.asarray(lim_switch))[None, :]
    return jnp.where(use_lim[:, :, None], d_limber, delta)


def compute_cmb_nc_cross(pert, th, bg, bidx, pm, pr: PrecisionParams,
                         sel_means, sel_widths, kind="gaussian",
                         l_max=300, contributions=("density",),
                         selection_bias=None, magnification_bias=None,
                         dndz=None, dndz_evo=None, want_td=False,
                         want_tl=False) -> CmbNcCrossResult:
    """CMB x LSS cross spectra (spectra_module.cpp :1201-1256):
    pd = 0.5(Delta_lcmb Delta_nc + Delta_nc Delta_lcmb) per bin, plus the
    td/tl extensions the reference disables (:649-663).

    Grid: the shared perturbation k grid, whose nc branch is densely
    sampled out to k_max_tau0_over_l_max * l_lss_max / chi(bin 1)
    (pipeline k_max_cl_extra, mirroring perturbations_module.cpp:1732) —
    the nc side's support sits at k ~ l/chi_sel, a factor tau0/chi_sel
    above the CMB side's. The Delta_lcmb factor rides the same transfer
    scan core the CMB stage uses (exact below l_switch_limber, its smooth
    low-z Limber kernel above); the Delta_T rows are exact with the usual
    neglect masks (their support k ~ l/tau0 ends far below the grid max)."""
    from .transfer import (TT_TYPES, _transfer_core, _weighted_sources,
                           get_l_list)

    nbin = len(sel_means)
    tau0 = float(pert.tau0)
    # nc support limit (perturbations_module.cpp:1732 rule)
    from .background import tau_of_z

    tau1 = float(tau_of_z(bg, jnp.asarray(sel_means[0])))
    k_max_cross = max(
        pr.k_max_tau0_over_l_max * l_max / (tau0 - tau1),
        pr.k_max_tau0_over_l_max * l_max / tau0
        / float(th.angular_rescaling))
    k_cmb = (pert.k_np if getattr(pert, "k_np", None) is not None
             else np.asarray(pert.k))[: pert.k_size_cmb]
    n_q = min(int(np.searchsorted(k_cmb, k_max_cross)) + 1, len(k_cmb))
    q = k_cmb[:n_q]
    qj = jnp.asarray(q)

    ls = get_l_list(pr, l_max)
    lmax_scan = int(ls[-1])
    emit_idx_np = np.full(lmax_scan + 1, -1, dtype=np.int32)
    for i, lv in enumerate(ls):
        emit_idx_np[lv] = i

    # --- CMB transfer rows on the shared grid (identity k->q interpolation)
    W_c, Sq_c, taus_c = _weighted_sources(pert, th, pr, q, k_of_q=q,
                                          k_size=n_q)
    neglect_dk = (pr.transfer_neglect_delta_k_S_t0,
                  pr.transfer_neglect_delta_k_S_t1,
                  pr.transfer_neglect_delta_k_S_t2,
                  pr.transfer_neglect_delta_k_S_e)
    ang = float(th.angular_rescaling)
    ra_rec = (tau0 - float(th.tau_rec)) * ang
    l_late = pr.transfer_neglect_late_source * ang
    late_mask = (pert.tau <= th.tau_cut) if th.tau_cut is not None \
        else jnp.ones_like(pert.tau, bool)
    core = _transfer_core(lmax_scan, len(ls), len(TT_TYPES), n_q,
                          W_c.shape[-1], pr.l_switch_limber, neglect_dk,
                          l_late, 0)
    acc = core(W_c, Sq_c, taus_c, pert.tau0, qj, jnp.asarray(ls),
               jnp.asarray(emit_idx_np), jnp.asarray(ra_rec), late_mask,
               jnp.asarray(0.0), qj)                         # (nl, ntt, nq)

    want_ll = want_tl
    R = _assemble_rows(bg, bidx, pr, sel_means, sel_widths, kind,
                       contributions, selection_bias, magnification_bias,
                       dndz, dndz_evo, pert.tau0, want_ll)

    taus_p = pert.tau
    S_by_col = {}
    for col in set(R.src_cols):
        S = pert.sources[:n_q, :, SrcIdx.ix[col]]     # (nq, ntau_pert)
        d2 = spline_d2(taus_p, S.T)
        S_by_col[col] = (S, d2)

    def s_eval(col, tau_row):
        S, d2 = S_by_col[col]
        return spline_eval(taus_p, S.T, d2, tau_row).T       # (nq, N_TAU_NC)

    delta = _delta_from_rows(qj, s_eval, R, ls)              # (nl, nrow, nq)

    lf = jnp.asarray(ls, jnp.float64)
    llp1 = lf * (lf + 1.0)
    d_nc = jnp.zeros((len(ls), nbin, len(q)))
    d_sl = jnp.zeros((len(ls), nbin, len(q)))
    for i, (t, b) in enumerate(R.rows):
        if t == "sl":
            d_sl = d_sl.at[:, b].add(delta[:, i])
        elif t == "lens":
            d_nc = d_nc.at[:, b].add(llp1[:, None] * delta[:, i])
        else:
            d_nc = d_nc.at[:, b].add(delta[:, i])

    # CMB transfer rows at the same sparse l list (identical get_l_list)
    ix = {n: i for i, n in enumerate(TT_TYPES)}
    t_total = acc[:, ix["t0"]] + acc[:, ix["t1"]] + acc[:, ix["t2"]]
    p_lcmb = acc[:, ix["lcmb"]]

    w = trapz_weights(qj)
    meas = 4.0 * jnp.pi / qj * pm.scalar_pk(qj) * w

    def quad(a, b):
        return jnp.sum(meas[None, :] * a * b, axis=-1)       # (nl,)

    ells = jnp.arange(2, l_max + 1)
    to_all = _spline_to_all_l(ls, ells)

    cl_pd = to_all(jnp.stack([quad(p_lcmb, d_nc[:, b]) for b in range(nbin)]))
    cl_td = to_all(jnp.stack([quad(t_total, d_nc[:, b])
                              for b in range(nbin)])) if want_td else None
    cl_tl = to_all(jnp.stack([quad(t_total, d_sl[:, b])
                              for b in range(nbin)])) if want_tl else None
    return CmbNcCrossResult(ell=ells, pd=cl_pd, td=cl_td, tl=cl_tl)


@lru_cache(maxsize=4)
def _nc_core(lmax_scan, n_l, n_row, nk, ntau):
    def core(x, Wrow, rad_onehot, l_emit, emit_idx):
        return _nc_scan(x, Wrow, rad_onehot, l_emit, emit_idx, lmax_scan,
                        n_l, n_row, nk)

    from ..ops.export_cache import export_cached
    return export_cached(jax.jit(core), tag="nc_core",
                         static_key=(lmax_scan, n_l, n_row, nk, ntau))


def _nc_scan(x, Wrow, rad_onehot, l_emit, emit_idx, lmax_scan, n_l, n_row, nk):
    """Bessel-recurrence LOS scan: x, Wrow (nrow, nk, ntau) ->
    Delta (nl, nrow, nk). Per-row radial function selected by rad_onehot:
    j_l (density/lensing/g-terms), j_l' (d1/g5), j_l'' (rsd)."""
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
            lndf1 = gammaln(2.0 * l + 4.0) - (l + 1.0) * ln2 - gammaln(l + 2.0)
            c1 = 2.0 * l + 3.0
            corr = 1.0 - x2 / (2.0 * c1) * (1.0 - x2 / (4.0 * (c1 + 2.0))
                                            * (1.0 - x2 / (6.0 * (c1 + 4.0))))
            c1b = 2.0 * l + 5.0
            corr1 = 1.0 - x2 / (2.0 * c1b) * (1.0 - x2 / (4.0 * (c1b + 2.0))
                                              * (1.0 - x2 / (6.0 * (c1b + 4.0))))
            js = jnp.exp(l * lnx - lndf) * corr
            js1 = jnp.exp((l + 1.0) * lnx - lndf1) * corr1
            use_series = x < 1.0
            jl_e = jnp.where(use_series, js, jl)
            jp_e = jnp.where(use_series, l * inv_x * js - js1,
                             jm1 - (l + 1.0) * inv_x * jl)
            jpp = -2.0 * inv_x * jp_e - (1.0 - l * (l + 1.0) * inv_x * inv_x) * jl_e
            rad = (rad_onehot[:, 0, None, None] * jl_e
                   + rad_onehot[:, 1, None, None] * jp_e
                   + rad_onehot[:, 2, None, None] * jpp)
            row = jnp.sum(Wrow * rad, axis=-1)   # (nrow, nk)
            z32 = jnp.zeros((), ei.dtype)
            return jax.lax.dynamic_update_slice(acc, row[None], (ei, z32, z32))

        acc = jax.lax.cond(ei >= 0, do_emit, lambda a: a, acc)
        return (jl, jm1, acc), None

    acc0 = jnp.zeros((n_l, n_row, nk))
    (_, _, acc), _ = jax.lax.scan(body, (j1, j0, acc0),
                                  jnp.arange(2, lmax_scan + 1))
    return acc
