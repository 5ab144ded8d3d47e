"""Transfer functions Delta_l(q) by line-of-sight integration (L8).

TPU-native redesign of the reference TransferModule (transfer_module.cpp):
instead of per-(q,l) calls interpolating precomputed Bessel tables and running
a trapezoidal convolution in C (transfer_integrate :2750 +
array_trapezoidal_convolution), the whole LOS stage is ONE lax.scan over
multipole order: spherical Bessel functions j_l(x) on the full (q, tau) grid
advance by the three-term recurrence, and at every l in the output l-list the
radial functions (j, j', j'' combinations; transfer_radial_function :3274-3439)
contract against the weighted sources in a single fused reduction. No Bessel
tables, no gathers, no inner loops.

Flat geometry in round 1 (x = q (tau0 - tau), nu = 1); curved K != 0 comes
with the hyperspherical extension.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln

from ..config.precision import PrecisionParams
from ..ops.splines import spline_d2, spline_eval
from .perturbations.indices import SrcIdx


# transfer type order in the output array
TT_TYPES = ["t0", "t1", "t2", "e", "lcmb"]
RADIAL = {"t0": "j", "t1": "jp", "t2": "T2", "e": "E", "lcmb": "j"}


def get_l_list(pr: PrecisionParams, l_max: int, rescaling: float = 1.0) -> np.ndarray:
    """Multipole list: log spacing turning linear (transfer_get_l_list :694)."""
    ls = [2]
    current = 2
    inc = max(int(current * (pr.l_logstep**rescaling - 1.0)), 1)
    while current + inc < l_max and inc < pr.l_linstep * rescaling:
        current += inc
        ls.append(current)
        inc = max(int(current * (pr.l_logstep**rescaling - 1.0)), 1)
    inc = int(pr.l_linstep * rescaling)
    while current + inc <= l_max:
        current += inc
        ls.append(current)
    if current != l_max:
        ls.append(l_max)
    return np.array(ls, dtype=np.int64)


def get_q_list(pr: PrecisionParams, k_min: float, k_max: float,
               tau0: float, tau_rec: float, ang: float = 1.0) -> np.ndarray:
    """Flat/open-case q sampling: log step turning linear with scale
    q_period = 2 pi/(tau0 - tau_rec) (transfer_get_q_list :884-1010). In open
    models the log step is divided by angular_rescaling^q_logstep_open
    (transfer_module.cpp:941): geometry stretches the Bessel oscillations, so
    low q needs denser sampling."""
    q_period = 2.0 * math.pi / (tau0 - tau_rec)
    q_logstep = pr.q_logstep_spline / ang ** pr.q_logstep_open
    qs = [k_min]
    q = k_min
    while q < k_max:
        q = q + q_period * pr.q_linstep * q / (q + pr.q_linstep / q_logstep)
        qs.append(q)
    if qs[-1] > k_max:
        qs.pop()
    return np.array(qs)


def get_q_list_closed(pr: PrecisionParams, q_max: float, tau0: float,
                      tau_rec: float, K: float) -> np.ndarray:
    """Closed-case q sampling (transfer_get_q_list :1013-1060): the physical
    spectrum is discrete, q = nu sqrt(K) with integer nu >= 3. Below
    hyper_flat_approximation_nu the list keeps exact integer nu's (with the
    finer q_logstep_trapzd subsampling step); above it the step blends over
    q_numstep_transition points into the flat/open spline stepping, where
    non-integer nu's are fine because the sum over modes is indistinguishable
    from an integral."""
    sqK = math.sqrt(K)
    q_period = 2.0 * math.pi / (tau0 - tau_rec)
    qs = [3.0 * sqK]
    nu = 3
    last_step, last_index = sqK, 1
    i = 1
    while qs[-1] < q_max:
        qp = qs[-1]
        if nu < pr.hyper_flat_approximation_nu:
            q = qp + q_period * pr.q_linstep * qp \
                / (qp + pr.q_linstep / pr.q_logstep_trapzd)
            nu_prop = int(q / sqK)
            nu = nu + 1 if nu_prop <= nu + 1 else nu_prop
            q = nu * sqK
            last_step = q - qp
            last_index = i + 1
        else:
            q_step = q_period * pr.q_linstep * qp \
                / (qp + pr.q_linstep / pr.q_logstep_spline)
            f = (i - last_index) / pr.q_numstep_transition
            q = qp + ((1.0 - f) * last_step + f * q_step if f < 1.0
                      else q_step)
        qs.append(q)
        i += 1
    if qs[-1] > q_max and len(qs) > 2:
        qs.pop()
    return np.array(qs)


class TransferResult(NamedTuple):
    l: jnp.ndarray          # (nl,) multipoles
    q: jnp.ndarray          # (nq,) generalized wavenumber
    delta: jnp.ndarray      # (nl, ntt, nq) transfer functions, TT_TYPES order
    tau0: jnp.ndarray
    k: jnp.ndarray = None   # (nq,) k(q) = sqrt(q^2 - K); equals q when flat


def _weighted_sources(pert, th, pr, q: np.ndarray, k_of_q=None, K=0.0, sgnK=0,
                      k_size=None):
    """Interpolate CMB sources k->q (spline over k; reference
    transfer_interpolate_sources :1767) and fold in the trapezoidal tau
    weights and per-type rescalings (transfer_sources :1845)."""
    taus = pert.tau
    tau0 = pert.tau0
    n_k = k_size if k_size is not None else pert.k_size_cmb
    k = pert.k[:n_k]
    S = pert.sources[:n_k]                       # (nk, ntau, nsrc)
    six = SrcIdx.ix
    if k_of_q is None:
        k_of_q = np.asarray(q)

    # trapezoidal weights over tau
    dt = jnp.diff(taus)
    z = jnp.zeros((1,))
    w_tau = jnp.concatenate([dt / 2, z]) + jnp.concatenate([z, dt / 2])

    # lcmb source: -W(tau)(phi+psi)Theta(tau - tau_rec), W per :1920-1950
    # with the curved sinK generalization (:1933-1950)
    tau_rec = th.tau_rec
    if sgnK == 0:
        resc = (tau_rec - taus) / (tau0 - taus) / (tau0 - tau_rec)
    else:
        sab = jnp.sqrt(jnp.abs(K))
        sinK = jnp.sin if sgnK > 0 else jnp.sinh
        resc = sab * sinK(sab * (tau_rec - taus)) \
            / sinK(sab * (tau0 - taus)) / sinK(sab * (tau0 - tau_rec))
    resc = jnp.where(taus > tau_rec, resc, 0.0)
    resc = resc.at[-1].set(0.0)

    src_cols = jnp.stack([
        S[:, :, six["t0"]],
        S[:, :, six["t1"]],
        S[:, :, six["t2"]],
        S[:, :, six["p"]],
        S[:, :, six["phi_plus_psi"]] * resc[None, :],
    ], axis=0)                                   # (ntt, nk, ntau)

    # spline along k, evaluate at k(q)
    lnk = jnp.log(k)
    y = src_cols.transpose(1, 0, 2).reshape(S.shape[0], -1)          # (nk, ntt*ntau)
    d2 = spline_d2(lnk, y)
    yq = spline_eval(lnk, y, d2, jnp.log(jnp.asarray(k_of_q)))       # (nq, ntt*ntau)
    Sq = yq.reshape(len(q), len(TT_TYPES), S.shape[1]).transpose(1, 0, 2)  # (ntt, nq, ntau)

    W = Sq * w_tau[None, None, :]
    return W, Sq, taus


from functools import lru_cache


@lru_cache(maxsize=8)
def _transfer_core(lmax_scan: int, n_l: int, n_tt: int, nq: int, ntau: int,
                   l_switch_limber: float, neglect_dk: tuple, l_late: float,
                   sgnK: int = 0):
    """jitted LOS core, cached on static shapes (reused across cosmologies)."""

    def core(W, Sq, taus, tau0, qj, l_emit, emit_idx, ra_rec, late_mask, K, kq):
        return _transfer_scan(W, Sq, taus, tau0, qj, l_emit, emit_idx,
                              lmax_scan, n_l, n_tt, nq, l_switch_limber,
                              neglect_dk, l_late, ra_rec, late_mask, sgnK, K, kq)

    from ..ops.export_cache import export_cached
    return export_cached(jax.jit(core), tag="tr_core",
                         static_key=(lmax_scan, n_l, n_tt, nq, ntau,
                                     l_switch_limber, neglect_dk, l_late, sgnK))


def compute_transfer(pert, th, pr: PrecisionParams, l_max: int,
                     K: float = 0.0, sgnK: int = 0,
                     k_max: float = None) -> TransferResult:
    """Delta_l^X(q) for X in TT_TYPES via the Bessel-recurrence scan.
    For K != 0 the scan advances hyperspherical Phi_l^nu by the curved
    three-term recurrence (tools/hyperspherical.c:472) instead of j_l.
    k_max truncates the CMB k range below the perturbation module's
    (grids.py k_max_cmb for the session l_scalar_max) — used by the
    l <= l_lss_max CMB x nc cross, whose support ends far earlier."""
    tau0 = float(pert.tau0)
    ls = get_l_list(pr, l_max)
    # host copy of the k grid: reading scalars off the device array would
    # block on the in-flight perturbation solve (see PerturbResult.k_np)
    k_host = getattr(pert, "k_np", None)
    if k_host is None:
        k_host = np.asarray(pert.k)
    k = k_host[: pert.k_size_cmb]
    k_size = None
    if k_max is not None and k_max < float(k[-1]):
        k_size = max(int(np.searchsorted(k, k_max)) + 1, 8)
        k = k[:k_size]
    # open case: q = sqrt(k^2 + K) (transfer_get_q_list :911-925); the grid
    # generator runs in q with the same stepping
    if sgnK == 0:
        q = get_q_list(pr, float(k[0]), float(k[-1]), tau0, float(th.tau_rec))
        k_of_q = q
    elif sgnK > 0:
        # discrete closed spectrum: q = nu sqrt(K), nu = 3, 4, ... (subsampled)
        q_max = math.sqrt(float(k[-1]) ** 2 + K)
        q = get_q_list_closed(pr, q_max, tau0, float(th.tau_rec), K)
        k_of_q = np.sqrt(np.maximum(q * q - K, float(k[0]) ** 2))
    else:
        q_min = math.sqrt(max(float(k[0]) ** 2 + K, 1e-12 * float(k[0]) ** 2))
        q_max = math.sqrt(float(k[-1]) ** 2 + K)
        q = get_q_list(pr, q_min, q_max, tau0, float(th.tau_rec),
                       ang=float(th.angular_rescaling))
        k_of_q = np.sqrt(np.maximum(q * q - K, float(k[0]) ** 2))

    W, Sq, taus = _weighted_sources(pert, th, pr, q, k_of_q=k_of_q, K=K,
                                    sgnK=sgnK, k_size=k_size)
    qj = jnp.asarray(q)

    lmax_scan = int(ls[-1])
    emit_idx_np = np.full(lmax_scan + 1, -1, dtype=np.int32)
    for i, lv in enumerate(ls):
        emit_idx_np[lv] = i
    # neglect heuristics (transfer_can_be_neglected :3187 +
    # transfer_late_source_can_be_neglected :3230)
    neglect_dk = (pr.transfer_neglect_delta_k_S_t0, pr.transfer_neglect_delta_k_S_t1,
                  pr.transfer_neglect_delta_k_S_t2, pr.transfer_neglect_delta_k_S_e)
    ang = float(th.angular_rescaling)
    ra_rec = (tau0 - float(th.tau_rec)) * ang
    l_late = pr.transfer_neglect_late_source * ang
    late_mask = (pert.tau <= th.tau_cut) if th.tau_cut is not None \
        else jnp.ones_like(pert.tau, bool)
    core = _transfer_core(lmax_scan, len(ls), len(TT_TYPES), len(q), W.shape[-1],
                          pr.l_switch_limber, neglect_dk, l_late, sgnK)
    # multi-device: shard the q axis over the mesh — the LOS scan is
    # elementwise over q, so GSPMD splits the one compiled program across
    # chips with no collectives (SURVEY 2.5; the reference threads this loop
    # per q, transfer_module.cpp:287-319). The result is gathered to one
    # device with an explicit COPY before the eager downstream stages, for
    # the same rendezvous-timeout reason as the solve (solve.py run_ic).
    kq_j = jnp.asarray(k_of_q)
    from ..parallel.mesh import make_mesh, n_compute_devices, pad_to_multiple
    tr_mesh = make_mesh() if n_compute_devices() > 1 else None
    nq_orig = len(q)
    if tr_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        nd = tr_mesh.devices.size
        # q grids are not device-count aligned: edge-pad (replicating the
        # last q keeps the padded lanes numerically benign), drop after
        W_p, _ = pad_to_multiple(np.asarray(W), nd, axis=1)
        Sq_p, _ = pad_to_multiple(np.asarray(Sq), nd, axis=1)
        qj_p, _ = pad_to_multiple(np.asarray(qj), nd)
        kq_p, _ = pad_to_multiple(np.asarray(k_of_q), nd)
        sh_q3 = NamedSharding(tr_mesh, P(None, "k", None))
        sh_q1 = NamedSharding(tr_mesh, P("k"))
        W = jax.device_put(W_p, sh_q3)
        Sq = jax.device_put(Sq_p, sh_q3)
        qj_run = jax.device_put(qj_p, sh_q1)
        kq_j = jax.device_put(kq_p, sh_q1)
        core = _transfer_core(lmax_scan, len(ls), len(TT_TYPES), W_p.shape[1],
                              W.shape[-1], pr.l_switch_limber, neglect_dk,
                              l_late, sgnK)
    else:
        qj_run = qj
    acc = core(W, Sq, taus, pert.tau0, qj_run, jnp.asarray(ls),
               jnp.asarray(emit_idx_np), jnp.asarray(ra_rec), late_mask,
               jnp.asarray(K), kq_j)
    if tr_mesh is not None:
        dev0 = tr_mesh.devices.flat[0]
        acc = jax.device_put(acc, dev0)[:, :, :nq_orig]
        qj = jax.device_put(qj, dev0)

    # --- lensing-potential q extension (Limber-only, OFF by default).
    # Delta_l^phi(q) keeps support at q beyond the CMB block (chi = (l+1/2)/q
    # still inside the lensing kernel), but the reference truncates its
    # transfer q-list at the CMB k block (transfer_get_q_list :903/:918 use
    # k_size_cl_) so the goldens — and the 3e-3 parity contract — carry that
    # truncation (measured: enabling this adds ~24% to C_l^phiphi at l=2500
    # on the Planck config, i.e. the reference underestimates the high-l
    # phiphi tail at default precision). With phi_q_per_decade > 0 the phi
    # row is extended by pure Limber (O(1) per (l, q), smooth in q -> a
    # coarse log grid suffices) up to the full source k_max; T/E rows are
    # zero there, consistent with transfer_can_be_neglected (:3187).
    k_full = pert.k_np if getattr(pert, "k_np", None) is not None \
        else np.asarray(pert.k)
    q_end = math.sqrt(max(float(k_full[-1]) ** 2 + (K if sgnK else 0.0), 0.0))
    q_start = float(q[-1])
    if (ls[-1] > pr.l_switch_limber and q_end > 1.02 * q_start
            and pr.phi_q_per_decade > 0.0):
        n_ext = max(int(math.log10(q_end / q_start) * pr.phi_q_per_decade), 8)
        q_ext = np.geomspace(q_start, q_end, n_ext + 1)[1:]
        k_ext = np.sqrt(np.maximum(q_ext ** 2 - K, 1e-30)) if sgnK else q_ext
        _, Sq_ext, _ = _weighted_sources(pert, th, pr, q_ext, k_of_q=k_ext,
                                         K=K, sgnK=sgnK, k_size=len(k_full))
        ext_core = _phi_limber_ext_core(len(ls), len(q_ext), sgnK)
        d_ext = ext_core(Sq_ext[4], taus, pert.tau0, jnp.asarray(q_ext),
                         jnp.asarray(ls).astype(jnp.float64),
                         jnp.asarray(pr.l_switch_limber), jnp.asarray(K))
        acc_ext = jnp.zeros((len(ls), len(TT_TYPES), len(q_ext)))
        acc_ext = acc_ext.at[:, 4, :].set(d_ext)
        acc = jnp.concatenate([acc, acc_ext], axis=2)
        qj = jnp.concatenate([qj, jnp.asarray(q_ext)])
        k_of_q = np.concatenate([np.asarray(k_of_q), k_ext])

    return TransferResult(l=jnp.asarray(ls), q=qj, delta=acc, tau0=pert.tau0,
                          k=jnp.asarray(k_of_q))


@lru_cache(maxsize=8)
def _phi_limber_ext_core(n_l: int, nq: int, sgnK: int):
    """jitted Limber evaluation of the lcmb transfer row on an extension q
    grid — the same formulas as the in-scan Limber blocks (_transfer_scan /
    _transfer_scan_curved; transfer_limber :2912-2970)."""

    def core(S_phi, taus, tau0, qj, lf, l_switch_limber, K):
        ipg = jnp.sqrt(math.pi / (2.0 * lf)) \
            * (1.0 - 0.25 / lf + 1.0 / (32.0 * lf * lf))
        if sgnK == 0:
            tau_lim = tau0 - (lf[:, None] + 0.5) / qj[None, :]
            S_at = _limber_parabola(taus, tau0, S_phi, tau_lim, nq)
            inside = (tau_lim > taus[0]) & (tau_lim < taus[-1])
            d = jnp.where(inside, ipg[:, None] * S_at / (lf[:, None] + 0.5),
                          0.0)
        else:
            sab = jnp.sqrt(jnp.abs(K))
            if sgnK > 0:
                x_lim = jnp.arcsin(jnp.clip(
                    jnp.sqrt(lf[:, None] * (lf[:, None] + 1.0))
                    / qj[None, :] * sab, 0.0, 1.0))
            else:
                x_lim = jnp.arcsinh((lf[:, None] + 0.5) / qj[None, :] * sab)
            tau_lim = tau0 - x_lim / sab
            S_at = _limber_parabola(taus, tau0, S_phi, tau_lim, nq)
            inside = (tau_lim > taus[0]) & (tau_lim < taus[-1])
            curv_fac = (1.0 - K * lf[:, None] ** 2
                        / qj[None, :] ** 2) ** (-0.25)
            chi_lim = jnp.maximum(tau0 - tau_lim, 1e-30)
            d = jnp.where(inside, ipg[:, None] * curv_fac * S_at
                          / (chi_lim * qj[None, :]), 0.0)
        return jnp.where((lf > l_switch_limber)[:, None], d, 0.0)

    from ..ops.export_cache import export_cached
    return export_cached(jax.jit(core), tag="tr_phi_ext",
                         static_key=(n_l, nq, sgnK))


def _transfer_scan(W, Sq, taus, tau0, qj, l_emit, emit_idx,
                   lmax_scan, n_l, n_tt, nq, l_switch_limber,
                   neglect_dk, l_late, ra_rec, late_mask, sgnK=0, K=None, kq=None):

    if sgnK != 0:
        return _transfer_scan_curved(W, Sq, taus, tau0, qj, l_emit, emit_idx,
                                     lmax_scan, n_l, n_tt, nq, l_switch_limber,
                                     neglect_dk, l_late, ra_rec, late_mask,
                                     sgnK, K, kq)
    # x grid: (nq, ntau)
    chi = tau0 - taus                                # (ntau,)
    x = jnp.maximum(qj[:, None] * chi[None, :], 1e-12)
    inv_x = 1.0 / x

    # seed values j_0, j_1 with series protection at small x
    small = x < 0.3
    x2 = x * x
    j0 = jnp.where(small, 1.0 - x2 / 6.0 * (1.0 - x2 / 20.0 * (1.0 - x2 / 42.0)),
                   jnp.sin(x) * inv_x)
    j1 = jnp.where(small, x / 3.0 * (1.0 - x2 / 10.0 * (1.0 - x2 / 28.0)),
                   (jnp.sin(x) * inv_x - jnp.cos(x)) * inv_x)

    e_fac = jnp.sqrt(3.0 / 8.0 * (l_emit + 2.0) * (l_emit + 1.0) * l_emit * (l_emit - 1.0))

    def body(carry, l_int):
        jm1, jm2, acc = carry          # j_{l-1}, j_{l-2}, (nl, ntt, nq)
        l = l_int.astype(x.dtype)
        jl = (2.0 * l - 1.0) * inv_x * jm1 - jm2
        # kill exponentially-small forbidden-region values before the upward
        # recurrence amplifies roundoff along the Neumann solution (the 1/x
        # factor per step explodes roundoff at small x within a few steps)
        mask = l <= x + 6.0 * jnp.cbrt(x) + 2.0
        jl = jnp.where(mask, jl, 0.0)

        ei = emit_idx[l_int]

        def do_emit(acc):
            # small-x branch: ascending series j_l = x^l/(2l+1)!! (1 - ...),
            # evaluated in log space; the recurrence loses all accuracy for
            # x << l while the series is exact there.
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
            jp_e = jnp.where(use_series, l * inv_x * js - js1, jm1 - (l + 1.0) * inv_x * jl)
            jpp = -2.0 * inv_x * jp_e - (1.0 - l * (l + 1.0) * inv_x * inv_x) * jl_e
            rad_t2 = 0.5 * (3.0 * jpp + jl_e)
            rad_e = e_fac[ei] * jl_e * inv_x * inv_x
            # late-source neglect: above l_late, drop post-visibility
            # (reionization-era) sources for t1/t2/e
            # (transfer_late_source_can_be_neglected :3230)
            late = jnp.where(l > l_late, late_mask.astype(x.dtype), 1.0)[None, :]
            # contractions over tau: (nq, ntau) x (ntt, nq, ntau) -> (ntt, nq)
            d_t0 = jnp.sum(W[0] * jl_e, axis=-1)
            d_t1 = jnp.sum(W[1] * late * jp_e, axis=-1)
            d_t2 = jnp.sum(W[2] * late * rad_t2, axis=-1)
            d_e = jnp.sum(W[3] * late * rad_e, axis=-1)
            d_l = jnp.sum(W[4] * jl_e, axis=-1)
            # per-type q-neglect masks (transfer_can_be_neglected :3187):
            # Delta ~ 0 when l is far below the Bessel peak l ~ k*ra_rec
            keep = [l >= (qj - dk) * ra_rec for dk in neglect_dk]
            row = jnp.stack([jnp.where(keep[0], d_t0, 0.0),
                             jnp.where(keep[1], d_t1, 0.0),
                             jnp.where(keep[2], d_t2, 0.0),
                             jnp.where(keep[3], d_e, 0.0),
                             d_l], axis=0)  # (ntt, nq)
            z32 = jnp.zeros((), ei.dtype)
            return jax.lax.dynamic_update_slice(acc, row[None], (ei, z32, z32))

        acc = jax.lax.cond(ei >= 0, do_emit, lambda a: a, acc)
        return (jl, jm1, acc), None

    acc0 = jnp.zeros((n_l, n_tt, nq))
    (jm1, jm2, acc), _ = jax.lax.scan(
        body, (j1, j0, acc0), jnp.arange(2, lmax_scan + 1))

    # --- Limber approximation for the lensing potential at l > l_switch_limber
    # (reference transfer_use_limber :2678 + transfer_limber :2912): the
    # reference never integrates lcmb against Bessels above l=10, and the
    # smooth lensing kernel makes Limber the accurate choice there.
    lf = l_emit.astype(jnp.float64)
    pert_tau0 = tau0
    ipg = jnp.sqrt(math.pi / (2.0 * lf)) * (1.0 - 0.25 / lf + 1.0 / (32.0 * lf * lf))
    tau_lim = pert_tau0 - (lf[:, None] + 0.5) / qj[None, :]        # (nl, nq)
    # parabolic interpolation of S*(tau0-tau) — regular at tau -> tau0 where
    # the lcmb rescaling diverges (transfer_limber_interpolate :3085-3140)
    S_at = _limber_parabola(taus, pert_tau0, Sq[4], tau_lim, nq)
    inside = (tau_lim > taus[0]) & (tau_lim < taus[-1])
    # trsf = IPhiFlat * [S*chi](chi_lim) / (l+1/2)   (flat, :2958-2966)
    d_limber = jnp.where(inside, ipg[:, None] * S_at / (lf[:, None] + 0.5), 0.0)
    use_limber = (lf > l_switch_limber)[:, None]
    acc = acc.at[:, 4, :].set(jnp.where(use_limber, d_limber, acc[:, 4, :]))

    return acc


def _limber_parabola(taus, tau0, S_row, tau_lim, nq):
    """Interpolate S*(tau0-tau) at tau_lim by the 3-point parabola the
    reference uses (transfer_limber_interpolate :3085: nodes index_tau-1,
    index_tau, index_tau+1 with chi[index_tau] <= chi_lim, and the tau=tau0
    edge handled by repeating the regular product S*chi). S_row: (nq, ntau);
    tau_lim: (nl, nq). Returns [S*chi](tau_lim), shape (nl, nq)."""
    chi = tau0 - taus                                  # (ntau,) descending
    V = S_row * chi[None, :]                           # (nq, ntau)
    ntau = len(taus)
    jst = jnp.clip(jnp.searchsorted(taus, tau_lim, side="left"), 1, ntau - 2)
    x1 = chi[jst - 1]
    x2 = chi[jst]
    x3 = chi[jst + 1]

    def g(i):
        return V[jnp.arange(nq), i]

    V1 = jax.vmap(g)(jst - 1)
    V2 = jax.vmap(g)(jst)
    V3 = jax.vmap(g)(jst + 1)
    # stored source at tau0 is zero but S*chi is constant there: repeat V2
    V3 = jnp.where(jst == ntau - 2, V2, V3)
    xl = tau0 - tau_lim
    return (V1 * (xl - x2) * (xl - x3) / ((x1 - x2) * (x1 - x3))
            + V2 * (xl - x1) * (xl - x3) / ((x2 - x1) * (x2 - x3))
            + V3 * (xl - x1) * (xl - x2) / ((x3 - x1) * (x3 - x2)))


def _curved_series_phi(l, x, bx, lnx_df_C, Ktilde, beta2):
    """Small-x series of the hyperspherical Phi_l^nu and its x-derivative:

        Phi_l = exp(lnx_df_C) * (1 + c1 x^2 + c2 x^4 + c3 x^6)

    with lnx_df_C = l ln(beta x) - ln(2l+1)!! + ln prod sqrtK(n)/beta, and
    c1..c3 the exact curved coefficients solving the hyperspherical ODE
    Phi'' + 2 cotK Phi' + (beta^2 - Ktilde - l(l+1)/sinK^2) Phi = 0 order by
    order in x (derived symbolically; flat Bessel limit is the beta^2-only
    part). The flat j_l(beta x) series used before round 5 misses the
    curvature terms — at Omega_k = 0.1, l=2, x~0.4 that bias is +5% on Phi_2
    and +2.6% on the scalar C_2 (round-5 g29/g30 fix). Accuracy here:
    <=1e-4 for bx <= 1.3 over the full relevant (l, beta) range."""
    l2 = l * l
    c1 = (Ktilde * (l2 + 3.0 * l + 3.0) - 3.0 * beta2) / (6.0 * (2.0 * l + 3.0))
    c2 = (5.0 * l2 * l2 + 30.0 * l2 * l + 95.0 * l2 + 150.0 * l + 105.0
          - Ktilde * beta2 * (30.0 * l2 + 90.0 * l + 150.0) + 45.0 * beta2 * beta2
          + (12.0 * l2 * l + 38.0 * l2 + 30.0 * l)
          ) / (360.0 * (4.0 * l2 + 16.0 * l + 15.0))
    b2, b4, b6 = beta2, beta2 * beta2, beta2 * beta2 * beta2
    l3, l4, l5, l6 = l2 * l, l2 * l2, l2 * l2 * l, l2 * l2 * l2
    c3 = (Ktilde * (35.0 * l6 + 315.0 * l5 + 1680.0 * l4 + 5355.0 * l3
                    + 11200.0 * l2 + 13755.0 * l + 8085.0)
          - b2 * (315.0 * l4 + 1890.0 * l3 + 7245.0 * l2
                  + 13230.0 * l + 13755.0)
          + Ktilde * b4 * (945.0 * l2 + 2835.0 * l + 6615.0)
          + Ktilde * (252.0 * l5 + 2042.0 * l4 + 7188.0 * l3 + 11980.0 * l2
                      + 8442.0 * l + 1680.0)
          - 945.0 * b6
          - b2 * (756.0 * l3 + 2898.0 * l2 + 3402.0 * l + 1680.0)
          ) / (45360.0 * (8.0 * l3 + 60.0 * l2 + 142.0 * l + 105.0))
    x2 = x * x
    base = jnp.exp(lnx_df_C)
    poly = 1.0 + x2 * (c1 + x2 * (c2 + x2 * c3))
    dpoly = x * (2.0 * c1 + x2 * (4.0 * c2 + x2 * 6.0 * c3))
    phi = base * poly
    dphi = base * (l / x * poly + dpoly)
    return phi, dphi


def _transfer_scan_curved(W, Sq, taus, tau0, qj, l_emit, emit_idx,
                          lmax_scan, n_l, n_tt, nq, l_switch_limber,
                          neglect_dk, l_late, ra_rec, late_mask, sgnK, K, kq):
    """Curved-sky LOS scan: hyperspherical Phi_l^nu(x) advanced by the
    three-term recurrence in l (tools/hyperspherical.c:472-485), with the
    forbidden region masked and the small-argument series seeded through a
    running log-prefactor; radial combinations per transfer_radial_function
    (:3413-3445). x = sqrt|K| chi, beta = q/sqrt|K|."""
    sab = jnp.sqrt(jnp.abs(K))
    chi = tau0 - taus                                 # (ntau,)
    x = jnp.maximum(sab * chi, 1e-12)[None, :]        # (1, ntau)
    beta = (qj / sab)[:, None]                        # (nq, 1)
    if sgnK > 0:
        sinK = jnp.sin(x)
        cotK = jnp.cos(x) / sinK
        Ktilde = 1.0
    else:
        sinK = jnp.sinh(x)
        cotK = jnp.cosh(x) / sinK
        Ktilde = -1.0
    beta2 = beta * beta

    def sqK(lv):
        return jnp.sqrt(jnp.maximum(beta2 - Ktilde * lv * lv, 1e-30))

    bx = jnp.maximum(beta * x, 1e-12)                 # flat-equivalent argument
    inv_bx = 1.0 / bx
    small = bx < 0.3
    bx2 = bx * bx
    # seeds Phi_0, Phi_1 (hyperspherical.c:482-483) with series protection:
    # Phi_0 = sin(beta x)/(beta sinK); as x->0 this is j_0(beta x) * x/sinK
    x_over_sinK = x / sinK
    j0f = jnp.where(small, 1.0 - bx2 / 6.0 * (1.0 - bx2 / 20.0 * (1.0 - bx2 / 42.0)),
                    jnp.sin(bx) * inv_bx)
    Phi0 = j0f * x_over_sinK
    # Phi_1 = Phi_0 (cotK - beta/tan(beta x)) / sqrtK[1]
    tan_bx = jnp.tan(bx)
    Phi1 = Phi0 * (cotK - beta / tan_bx) / sqK(1.0)

    e_fac = jnp.sqrt(3.0 / 8.0 * (l_emit + 2.0) * (l_emit + 1.0) * l_emit * (l_emit - 1.0))
    k2 = (kq * kq)[:, None]
    s_l2 = jnp.sqrt(1.0 - 3.0 * K / k2)                # (nq, 1)
    absK_over_k2 = jnp.abs(K) / k2
    csc2 = jnp.abs(K) / (k2 * sinK * sinK)             # cscKgen^2
    sab_over_k = sab / kq[:, None]

    def body(carry, l_int):
        pm1, pm2, lnC, acc = carry     # Phi_{l-1}, Phi_{l-2}, (nq,1), acc
        l = l_int.astype(x.dtype)
        sq_l = sqK(l)
        sq_lm1 = sqK(l - 1.0)
        pl = ((2.0 * l - 1.0) * cotK * pm1 - sq_lm1 * pm2) / sq_l
        # forbidden-region mask in the flat-equivalent variable beta sinK;
        # closed universe: Phi_l^nu = 0 for l >= nu = beta (discrete spectrum
        # truncation, hyperspherical.c closed case). The cutoff uses a
        # half-integer guard: beta is integer-nu only up to float roundoff
        # (nu*sqrt(K)/sqrt(K) = 11.000000000000002), and at l = nu the
        # recurrence divides by sqrtK(l) ~ 1e-7, so a bare l < beta lets one
        # exploded lane through per integer nu = l
        xf = beta * sinK
        # forbidden-region mask. Closed universe: near l -> nu each upward
        # step amplifies the unphysical growing solution by
        # (2l-1) cotK / sqrt(beta^2 - l^2) (>>1 when l approaches beta), so
        # the flat-style 6 cbrt(xf) buffer lets O(100) garbage through a
        # marginal window at the largest x (round-5 g30 fix: the buffer is
        # capped by the distance to beta; the true Phi there is
        # WKB-suppressed by e^-40, so zeroing it is exact at double
        # precision)
        if sgnK > 0:
            buf = jnp.minimum(6.0 * jnp.cbrt(xf) + 2.0,
                              0.5 * (beta - l) + 2.0)
            mask = (l <= xf + buf) & (l + 0.5 < beta)
        else:
            mask = l <= xf + 6.0 * jnp.cbrt(xf) + 2.0
        pl = jnp.where(mask, pl, 0.0)
        # series prefactor ln prod_{n<=l} (sqrtK[n]/beta); clamp keeps the
        # log real when l >= beta in the closed case (the factor is then 0)
        lnC_new = lnC + 0.5 * jnp.log1p(
            jnp.maximum(-Ktilde * l * l / beta2, -1.0 + 1e-14))
        ei = emit_idx[l_int]

        def do_emit(acc):
            # small-argument CURVED series (see _curved_series_phi)
            ln2 = math.log(2.0)
            lndf = gammaln(2.0 * l + 2.0) - l * ln2 - gammaln(l + 1.0)
            js, djs = _curved_series_phi(l, x, bx, l * jnp.log(bx) - lndf
                                         + lnC_new, Ktilde, beta2)
            use_series = bx < 1.0
            pl_e = jnp.where(use_series, js, pl)
            # dPhi/dx: recurrence sqrtK[l] Phi_{l-1} - (l+1) cotK Phi_l;
            # series: analytic derivative of the curved series
            dp_rec = sq_l * pm1 - (l + 1.0) * cotK * pl
            dp_e = jnp.where(use_series, djs, dp_rec)
            # d2Phi/dx2 from the hyperspherical ODE (hyperspherical.c:389)
            d2p = -2.0 * dp_e * cotK + pl_e * (l * (l + 1.0) / (sinK * sinK)
                                               - beta2 + Ktilde)
            rad_t0 = pl_e
            rad_t1 = sab_over_k * dp_e
            rad_t2 = (3.0 * absK_over_k2 * d2p + pl_e) / (2.0 * s_l2)
            rad_e = (e_fac[ei] / s_l2) * csc2 * pl_e
            late = jnp.where(l > l_late, late_mask.astype(x.dtype), 1.0)[None, :]
            d_t0 = jnp.sum(W[0] * rad_t0, axis=-1)
            d_t1 = jnp.sum(W[1] * late * rad_t1, axis=-1)
            d_t2 = jnp.sum(W[2] * late * rad_t2, axis=-1)
            d_e = jnp.sum(W[3] * late * rad_e, axis=-1)
            d_l = jnp.sum(W[4] * rad_t0, axis=-1)
            keep = [l >= (kq - dk) * ra_rec for dk in neglect_dk]
            row = jnp.stack([jnp.where(keep[0], d_t0, 0.0),
                             jnp.where(keep[1], d_t1, 0.0),
                             jnp.where(keep[2], d_t2, 0.0),
                             jnp.where(keep[3], d_e, 0.0),
                             d_l], axis=0)
            z32 = jnp.zeros((), ei.dtype)
            return jax.lax.dynamic_update_slice(acc, row[None], (ei, z32, z32))

        acc = jax.lax.cond(ei >= 0, do_emit, lambda a: a, acc)
        return (pl, pm1, lnC_new, acc), None

    acc0 = jnp.zeros((n_l, n_tt, nq))
    lnC1 = 0.5 * jnp.log1p(-Ktilde * 1.0 / beta2)      # ln(sqrtK[1]/beta)
    (_, _, _, acc), _ = jax.lax.scan(
        body, (Phi1, Phi0, lnC1, acc0), jnp.arange(2, lmax_scan + 1))

    # Limber for the lensing potential (transfer_limber :2926-2970 curved):
    # flat formula evaluated at the curved tau*(l, q), times (1-K l^2/q^2)^-1/4
    lf = l_emit.astype(jnp.float64)
    ipg = jnp.sqrt(math.pi / (2.0 * lf)) * (1.0 - 0.25 / lf + 1.0 / (32.0 * lf * lf))
    if sgnK > 0:
        x_lim = jnp.arcsin(jnp.clip(jnp.sqrt(lf[:, None] * (lf[:, None] + 1.0))
                                    / qj[None, :] * sab, 0.0, 1.0))
    else:
        x_lim = jnp.arcsinh((lf[:, None] + 0.5) / qj[None, :] * sab)
    tau_lim = tau0 - x_lim / sab                       # (nl, nq)
    # parabolic interpolation of S*chi, then /(chi_lim * q)
    # (transfer_limber :2966-2969 curved branch)
    S_at = _limber_parabola(taus, tau0, Sq[4], tau_lim, nq)
    inside = (tau_lim > taus[0]) & (tau_lim < taus[-1])
    curv_fac = (1.0 - K * lf[:, None] ** 2 / qj[None, :] ** 2) ** (-0.25)
    chi_lim = jnp.maximum(tau0 - tau_lim, 1e-30)
    d_limber = jnp.where(inside, ipg[:, None] * curv_fac * S_at
                         / (chi_lim * qj[None, :]), 0.0)
    use_limber = (lf > l_switch_limber)[:, None]
    acc = acc.at[:, 4, :].set(jnp.where(use_limber, d_limber, acc[:, 4, :]))
    return acc


# ---------------------------------------------------------------------------
# Tensor transfer functions


TT_TYPES_TENSOR = ["t2", "e", "b"]


@lru_cache(maxsize=8)
def _transfer_tensor_core(lmax_scan: int, n_l: int, nq: int, ntau: int,
                          neglect_dk: tuple, sgnK: int = 0):
    def core(W, taus, tau0, qj, l_emit, emit_idx, ra_rec, K, kq):
        if sgnK != 0:
            return _tensor_scan_curved(W, taus, tau0, qj, l_emit, emit_idx,
                                       lmax_scan, n_l, nq, neglect_dk, ra_rec,
                                       sgnK, K, kq)
        return _tensor_scan(W, taus, tau0, qj, l_emit, emit_idx, lmax_scan, n_l,
                            nq, neglect_dk, ra_rec)

    from ..ops.export_cache import export_cached
    return export_cached(jax.jit(core), tag="tr_tensor",
                         static_key=(lmax_scan, n_l, nq, ntau, neglect_dk, sgnK))


def compute_transfer_tensor(tpert, th, pr: PrecisionParams, l_max: int,
                            K: float = 0.0, sgnK: int = 0) -> TransferResult:
    """Tensor Delta_l^{T2,E,B}(q): Bessel-recurrence scan with the tensor
    radial functions (transfer_radial_function TENSOR_* cases,
    transfer_module.cpp:3480-3540). For K != 0 the hyperspherical scan runs
    at nu = q/sqrt|K| with q^2 = k^2 + 3K (tensor m = 2)."""
    tau0 = float(tpert.tau0)
    ls = get_l_list(pr, l_max)
    k = tpert.k_np if getattr(tpert, "k_np", None) is not None \
        else np.asarray(tpert.k)
    if sgnK == 0:
        q = get_q_list(pr, float(k[0]), float(k[-1]), tau0, float(th.tau_rec))
        k_of_q = q
    elif sgnK > 0:
        # closed tensors: q^2 = k^2 + 3K, discrete nu >= 3
        q_max = math.sqrt(float(k[-1]) ** 2 + 3.0 * K)
        q = get_q_list_closed(pr, q_max, tau0, float(th.tau_rec), K)
        k_of_q = np.sqrt(np.maximum(q * q - 3.0 * K, float(k[0]) ** 2))
    else:
        q_min = math.sqrt(max(float(k[0]) ** 2 + 3.0 * K, 1e-10 * float(k[0]) ** 2))
        q_max = math.sqrt(float(k[-1]) ** 2 + 3.0 * K)
        q = get_q_list(pr, q_min, q_max, tau0, float(th.tau_rec),
                       ang=float(th.angular_rescaling))
        k_of_q = np.sqrt(np.maximum(q * q - 3.0 * K, float(k[0]) ** 2))

    taus = tpert.tau
    S = tpert.sources                          # (nk, ntau, 2)
    dt = jnp.diff(taus)
    z = jnp.zeros((1,))
    w_tau = jnp.concatenate([dt / 2, z]) + jnp.concatenate([z, dt / 2])

    lnk = jnp.log(jnp.asarray(k))
    y = S.reshape(S.shape[0], -1)
    d2 = spline_d2(lnk, y)
    yq = spline_eval(lnk, y, d2, jnp.log(jnp.asarray(k_of_q)))
    Sq = yq.reshape(len(q), S.shape[1], 2).transpose(2, 0, 1)   # (2, nq, ntau)
    W = Sq * w_tau[None, None, :]

    lmax_scan = int(ls[-1])
    emit_idx_np = np.full(lmax_scan + 1, -1, dtype=np.int32)
    for i, lv in enumerate(ls):
        emit_idx_np[lv] = i
    neglect_dk = (pr.transfer_neglect_delta_k_T_t2, pr.transfer_neglect_delta_k_T_e,
                  pr.transfer_neglect_delta_k_T_b)
    ra_rec = (tau0 - float(th.tau_rec)) * float(th.angular_rescaling)
    core = _transfer_tensor_core(lmax_scan, len(ls), len(q), W.shape[-1],
                                 neglect_dk, sgnK)
    acc = core(W, taus, tpert.tau0, jnp.asarray(q), jnp.asarray(ls),
               jnp.asarray(emit_idx_np), jnp.asarray(ra_rec), jnp.asarray(K),
               jnp.asarray(k_of_q))
    return TransferResult(l=jnp.asarray(ls), q=jnp.asarray(q), delta=acc,
                          tau0=tpert.tau0, k=jnp.asarray(k_of_q))


def _tensor_scan_curved(W, taus, tau0, qj, l_emit, emit_idx, lmax_scan, n_l,
                        nq, neglect_dk, ra_rec, sgnK, K, kq):
    """Curved tensor LOS scan: hyperspherical Phi_l^nu with the tensor
    radial functions (transfer_radial_function TENSOR_* :3486-3520)."""
    sab = jnp.sqrt(jnp.abs(K))
    chi = tau0 - taus
    x = jnp.maximum(sab * chi, 1e-12)[None, :]
    beta = (qj / sab)[:, None]
    if sgnK > 0:
        sinK = jnp.sin(x)
        cotK_x = jnp.cos(x) / sinK
        Ktilde = 1.0
    else:
        sinK = jnp.sinh(x)
        cotK_x = jnp.cosh(x) / sinK
        Ktilde = -1.0
    beta2 = beta * beta

    def sqK(lv):
        return jnp.sqrt(jnp.maximum(beta2 - Ktilde * lv * lv, 1e-30))

    bx = jnp.maximum(beta * x, 1e-12)
    inv_bx = 1.0 / bx
    small = bx < 0.3
    bx2 = bx * bx
    x_over_sinK = x / sinK
    j0f = jnp.where(small, 1.0 - bx2 / 6.0 * (1.0 - bx2 / 20.0 * (1.0 - bx2 / 42.0)),
                    jnp.sin(bx) * inv_bx)
    Phi0 = j0f * x_over_sinK
    Phi1 = Phi0 * (cotK_x - beta / jnp.tan(bx)) / sqK(1.0)

    k2 = (kq * kq)[:, None]
    ssqrt2 = jnp.sqrt(1.0 - K / k2)
    si = jnp.sqrt(1.0 + 2.0 * K / k2)
    ssqrt2i = jnp.sqrt(1.0 + 3.0 * K / k2)
    cscKgen = sab / (kq[:, None] * sinK)
    cotKgen = cscKgen * (jnp.cos(x) if sgnK > 0 else jnp.cosh(x))
    absK_over_k2 = jnp.abs(K) / k2
    sab_over_k = sab / kq[:, None]
    t2_fac = jnp.sqrt(3.0 / 8.0 * (l_emit + 2.0) * (l_emit + 1.0) * l_emit * (l_emit - 1.0))

    def body(carry, l_int):
        pm1, pm2, lnC, acc = carry
        l = l_int.astype(x.dtype)
        sq_l = sqK(l)
        pl = ((2.0 * l - 1.0) * cotK_x * pm1 - sqK(l - 1.0) * pm2) / sq_l
        xf = beta * sinK
        # closed: cap the forbidden-region buffer near l -> beta (see the
        # scalar scan; identical round-5 g30 fix)
        if sgnK > 0:
            buf = jnp.minimum(6.0 * jnp.cbrt(xf) + 2.0,
                              0.5 * (beta - l) + 2.0)
            mask = (l <= xf + buf) & (l + 0.5 < beta)
        else:
            mask = l <= xf + 6.0 * jnp.cbrt(xf) + 2.0
        pl = jnp.where(mask, pl, 0.0)
        lnC_new = lnC + 0.5 * jnp.log1p(
            jnp.maximum(-Ktilde * l * l / beta2, -1.0 + 1e-14))
        ei = emit_idx[l_int]

        def do_emit(acc):
            ln2 = math.log(2.0)
            lndf = gammaln(2.0 * l + 2.0) - l * ln2 - gammaln(l + 1.0)
            js, djs = _curved_series_phi(l, x, bx, l * jnp.log(bx) - lndf
                                         + lnC_new, Ktilde, beta2)
            use_series = bx < 1.0
            pl_e = jnp.where(use_series, js, pl)
            dp_rec = sq_l * pm1 - (l + 1.0) * cotK_x * pl
            dp_e = jnp.where(use_series, djs, dp_rec)
            d2p = -2.0 * dp_e * cotK_x + pl_e * (l * (l + 1.0) / (sinK * sinK)
                                                 - beta2 + Ktilde)
            rad_t2 = t2_fac[ei] / (si * ssqrt2) * cscKgen * cscKgen * pl_e
            rad_e = 0.25 / (si * ssqrt2) * (
                absK_over_k2 * d2p + 4.0 * cotKgen * sab_over_k * dp_e
                - (1.0 + 4.0 * K / k2 - 2.0 * cotKgen * cotKgen) * pl_e)
            rad_b = 0.5 * ssqrt2i / (ssqrt2 * si) * (
                sab_over_k * dp_e + 2.0 * cotKgen * pl_e)
            d_t2 = jnp.sum(W[0] * rad_t2, axis=-1)
            d_e = jnp.sum(W[1] * rad_e, axis=-1)
            d_b = jnp.sum(W[1] * rad_b, axis=-1)
            keep = [l >= (kq - dk) * ra_rec for dk in neglect_dk]
            row = jnp.stack([jnp.where(keep[0], d_t2, 0.0),
                             jnp.where(keep[1], d_e, 0.0),
                             jnp.where(keep[2], d_b, 0.0)], axis=0)
            z32 = jnp.zeros((), ei.dtype)
            return jax.lax.dynamic_update_slice(acc, row[None], (ei, z32, z32))

        acc = jax.lax.cond(ei >= 0, do_emit, lambda a: a, acc)
        return (pl, pm1, lnC_new, acc), None

    acc0 = jnp.zeros((n_l, 3, nq))
    lnC1 = 0.5 * jnp.log1p(-Ktilde * 1.0 / beta2)
    (_, _, _, acc), _ = jax.lax.scan(
        body, (Phi1, Phi0, lnC1, acc0), jnp.arange(2, lmax_scan + 1))
    return acc


def _tensor_scan(W, taus, tau0, qj, l_emit, emit_idx, lmax_scan, n_l, nq,
                 neglect_dk, ra_rec):
    chi = tau0 - taus
    x = jnp.maximum(qj[:, None] * chi[None, :], 1e-12)
    inv_x = 1.0 / x
    small = x < 0.3
    x2 = x * x
    j0 = jnp.where(small, 1.0 - x2 / 6.0 * (1.0 - x2 / 20.0 * (1.0 - x2 / 42.0)),
                   jnp.sin(x) * inv_x)
    j1 = jnp.where(small, x / 3.0 * (1.0 - x2 / 10.0 * (1.0 - x2 / 28.0)),
                   (jnp.sin(x) * inv_x - jnp.cos(x)) * inv_x)

    t2_fac = jnp.sqrt(3.0 / 8.0 * (l_emit + 2.0) * (l_emit + 1.0) * l_emit * (l_emit - 1.0))

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
            jp_e = jnp.where(use_series, l * inv_x * js - js1, jm1 - (l + 1.0) * inv_x * jl)
            jpp = -2.0 * inv_x * jp_e - (1.0 - l * (l + 1.0) * inv_x * inv_x) * jl_e
            # tensor radial functions, flat K=0 (transfer_module.cpp:3480-3540)
            rad_t2 = t2_fac[ei] * jl_e * inv_x * inv_x
            rad_e = 0.25 * (jpp + 4.0 * inv_x * jp_e - (1.0 - 2.0 * inv_x * inv_x) * jl_e)
            rad_b = 0.5 * (jp_e + 2.0 * inv_x * jl_e)
            d_t2 = jnp.sum(W[0] * rad_t2, axis=-1)
            d_e = jnp.sum(W[1] * rad_e, axis=-1)
            d_b = jnp.sum(W[1] * rad_b, axis=-1)
            keep = [l >= (qj - dk) * ra_rec for dk in neglect_dk]
            row = jnp.stack([jnp.where(keep[0], d_t2, 0.0),
                             jnp.where(keep[1], d_e, 0.0),
                             jnp.where(keep[2], d_b, 0.0)], axis=0)
            z32 = jnp.zeros((), ei.dtype)
            return jax.lax.dynamic_update_slice(acc, row[None], (ei, z32, z32))

        acc = jax.lax.cond(ei >= 0, do_emit, lambda a: a, acc)
        return (jl, jm1, acc), None

    acc0 = jnp.zeros((n_l, 3, nq))
    (_, _, acc), _ = jax.lax.scan(body, (j1, j0, acc0), jnp.arange(2, lmax_scan + 1))
    return acc
