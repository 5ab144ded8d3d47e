"""Harmonic spectra C_l (L9).

Reference SpectraModule (spectra_module.cpp): C_l^XY = int dk (4 pi/k)
P_R(k) Delta_l^X(q) Delta_l^Y(q) as a trapezoid over the transfer q grid
(spectra_compute_cl :958), then cubic spline over the sparse l-list to every
integer l (spectra_cls :804, spectra_cl_at_l :220). Here the quadrature over
(l-list x spectra x q) is one fused einsum.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.splines import spline_d2, spline_eval


from .primordial import PrimordialResult
from .transfer import TT_TYPES, TransferResult

CT_TYPES = ["tt", "ee", "te", "bb", "pp", "tp", "ep"]


def cl_quad_weights(x, sgnK: int = 0, q0_over_k0: float = 1.0,
                    sqrtK: float = 0.0, q_flat_idx: int = 0):
    """Quadrature weights of the reference C_l integrator
    (array_integrate_all_trapzd_or_spline, tools/arrays.c:1382, called from
    spectra_module.cpp:1313): cubic-spline integral with _SPLINE_EST_DERIV_
    boundary conditions over the full q range. In the closed case the low-q
    region (below the flat-approximation index, where nu is integer and dq
    jumps) is integrated by trapezoid, and the discrete sum's first-mode
    weight is restored exactly (spectra_module.cpp:1326-1337:
    += I[0] * q0/k0 * sqrt(K)/2).

    The integral is a LINEAR functional of the integrand, so the whole
    integrator collapses to a weight vector w with sum(w * y) == integral:
    computed as jax.grad of the scalar integral — ONE reverse pass through
    the tridiagonal spline solve instead of a sequential solve per integrand
    column. The quadrature over all (l x spectra-pair) columns then becomes
    a single MXU-friendly contraction, and under a q-sharded mesh a
    local-partial-sum + psum (parallel/mesh.sharded_cl_quadrature).

    The +h^3/24 correction sign follows the reference (tools/arrays.c:1419)
    — parity with the binary that produced the goldens takes precedence over
    the textbook exact-spline segment (which carries -h^3/24).
    """

    def total(y):
        y2 = spline_d2(x, y, bc="est_deriv")
        h = jnp.diff(x)
        seg_tr = h * (y[:-1] + y[1:]) / 2.0
        seg_sp = seg_tr + h**3 * (y2[:-1] + y2[1:]) / 24.0
        if sgnK == 1:
            i = jnp.arange(seg_sp.shape[0])
            seg = jnp.where(i < q_flat_idx, seg_tr, seg_sp)
            return seg.sum() + y[0] * (q0_over_k0 * sqrtK / 2.0)
        return seg_sp.sum()

    return jax.grad(total)(jnp.zeros_like(x))


def cl_spline_quad(x, I, **quad_kw):
    """Spline-integrate integrand columns I (nq, ncols) over x (nq,) with
    the reference's integrator semantics — see cl_quad_weights. Trapz at low
    l in curved space is NOT equivalent: the integrand peak sits on a few
    grid points and the h^3/24 spline correction moves C_2 by percents (the
    round-5 g29 open-universe fix)."""
    return cl_quad_weights(x, **quad_kw) @ I


class SpectraResult(NamedTuple):
    ell: jnp.ndarray        # (nl_out,) integer multipoles 2..l_max
    cl: jnp.ndarray         # (nl_out, nct) raw C_l per CT_TYPES
    l_list: jnp.ndarray     # sparse computation multipoles
    cl_list: jnp.ndarray    # (nl_list, nct)
    # multi-IC runs: raw per-pair C_l on the sparse l-list, keyed
    # ("ad","cdi")... — diagonal pairs enter the total once, off-diagonal
    # pairs twice (spectra_module.cpp:305-308); feeds the per-ic cl output
    # files (output_module.cpp:340-470)
    cl_pairs: dict = None
    # tensor-mode-only C_l at the output multipoles (s,t runs write per-mode
    # cls.dat/clt.dat, output_module.cpp:300-330)
    cl_tensor: jnp.ndarray = None

    def cl_dict(self) -> Dict[str, jnp.ndarray]:
        out = {"ell": self.ell}
        for i, name in enumerate(CT_TYPES):
            out[name] = self.cl[:, i]
        return out


def compute_spectra(tr: TransferResult, pm: PrimordialResult, l_max: int,
                    tr_tensor: TransferResult = None, tr_iso: dict = None,
                    sgnK: int = 0, K: float = 0.0,
                    q_flat_nu: float = 0.0) -> SpectraResult:
    import math

    # curved case: quadrature over k(q) with the primordial spectrum at k
    # (spectra_compute_cl :958: cl_integrand column 0 is k, P at k)
    q = tr.k if tr.k is not None else tr.q
    pk = pm.scalar_pk(q)
    meas = 4.0 * jnp.pi / q * pk            # (nq,) reference factor 4pi/k

    # closed case: index below which nu is integer and the q steps jump
    # (trapz there; spectra_module.cpp:1309-1311)
    quad_kw = {"sgnK": sgnK}
    if sgnK == 1:
        sqrtK = math.sqrt(K)
        q_np = np.asarray(tr.q)
        quad_kw.update(
            q0_over_k0=float(q_np[0]) / float(np.asarray(q)[0]), sqrtK=sqrtK,
            q_flat_idx=int(np.searchsorted(q_np, q_flat_nu * sqrtK)))

    ix = {n: i for i, n in enumerate(TT_TYPES)}
    d = tr.delta                             # (nl, ntt, nq)
    t_total = d[:, ix["t0"]] + d[:, ix["t1"]] + d[:, ix["t2"]]  # (nl, nq)
    e = d[:, ix["e"]]
    p = d[:, ix["lcmb"]]

    # the spline-integrator weight vector, computed ONCE per q grid (one
    # tridiagonal pass); each C_l block is then a single contraction
    wq = cl_quad_weights(q, **quad_kw)

    def quad_block(rows_pairs, meas_row):
        """Spline-integrate a list of (a, b) transfer products sharing one
        measure: returns (n_pairs, nl) totals."""
        prods = jnp.stack([a * b for a, b in rows_pairs], axis=0)  # (np, nl, nq)
        return jnp.einsum("pln,n->pl", prods, wq * meas_row)

    tt, ee, te, pp, tp, ep = quad_block(
        [(t_total, t_total), (e, e), (t_total, e),
         (p, p), (t_total, p), (e, p)], meas)
    cl_list = jnp.stack([
        tt, ee, te,
        jnp.zeros((d.shape[0],)),           # BB: tensors/lensing only
        pp, tp, ep,
    ], axis=1)                               # (nl, nct)

    if tr_iso:
        # isocurvature ic pairs (spectra_cls ic1-ic2 loop, spectra_module.cpp
        # :856 + cl_total :305-308: C_l = sum_diag + 2 sum_offdiag, with the
        # TE/Tphi/Ephi products symmetrized 0.5(X1 Y2 + X2 Y1), :1155-1183)
        rows = {"ad": (t_total, e, p)}
        for ic, tri in tr_iso.items():
            di = tri.delta
            rows[ic] = (di[:, ix["t0"]] + di[:, ix["t1"]] + di[:, ix["t2"]],
                        di[:, ix["e"]], di[:, ix["lcmb"]])

        def add_pair(pk_pair, r1, r2, factor):
            t1, e1, p1 = rows[r1]
            t2, e2, p2 = rows[r2]
            meas_i = factor * 4.0 * jnp.pi / q * pk_pair
            sym = [(0.5 * (a * b2 + a2 * b), jnp.ones_like(a))
                   for (a, b, a2, b2) in
                   [(t1, t1, t2, t2), (e1, e1, e2, e2), (t1, e1, t2, e2),
                    (p1, p1, p2, p2), (t1, p1, t2, p2), (e1, p1, e2, p2)]]
            tt_i, ee_i, te_i, pp_i, tp_i, ep_i = quad_block(sym, meas_i)
            return jnp.stack([
                tt_i, ee_i, te_i,
                jnp.zeros((t1.shape[0],)),
                pp_i, tp_i, ep_i,
            ], axis=1)

        cl_pairs = {("ad", "ad"): cl_list}
        for ic in tr_iso:
            cl_pairs[(ic, ic)] = add_pair(pm.iso_pk(ic, q), ic, ic, 1.0)
            cl_list = cl_list + cl_pairs[(ic, ic)]
        names = ["ad"] + list(tr_iso.keys())
        for i1 in range(len(names)):
            for i2 in range(i1 + 1, len(names)):
                pk12 = pm.cross_pk(names[i1], names[i2], q)
                if pk12 is not None:
                    pair = add_pair(pk12, names[i1], names[i2], 1.0)
                    cl_pairs[(names[i1], names[i2])] = pair
                    cl_list = cl_list + 2.0 * pair

    # spline over l to all integer multipoles
    l_f = tr.l.astype(jnp.float64)
    ells = jnp.arange(2, l_max + 1)
    d2 = spline_d2(l_f, cl_list)
    cl_all = spline_eval(l_f, cl_list, d2, ells.astype(jnp.float64))

    if tr_tensor is not None:
        # tensor contributions (spectra_compute_cl tensor branch: temperature
        # uses Delta_t2 only; BB is purely tensor before lensing)
        qt = tr_tensor.k if tr_tensor.k is not None else tr_tensor.q
        pk_h = pm.tensor_pk(qt)
        meas_t = 4.0 * jnp.pi / qt * pk_h
        quad_kw_t = {"sgnK": sgnK}
        if sgnK == 1:
            qt_np = np.asarray(tr_tensor.q)
            quad_kw_t.update(
                q0_over_k0=float(qt_np[0]) / float(np.asarray(qt)[0]),
                sqrtK=math.sqrt(K),
                q_flat_idx=int(np.searchsorted(qt_np, q_flat_nu * math.sqrt(K))))
        dt = tr_tensor.delta                  # (nl_t, 3, nq_t): t2, e, b
        t2, e_t, b_t = dt[:, 0], dt[:, 1], dt[:, 2]
        prods_t = jnp.stack([t2 * t2, e_t * e_t, t2 * e_t, b_t * b_t], axis=0)
        wq_t = cl_quad_weights(qt, **quad_kw_t)
        tot_t = jnp.einsum("pln,n->pl", prods_t, wq_t * meas_t)
        cl_t_list = jnp.stack([
            tot_t[0],
            tot_t[1],
            tot_t[2],
            tot_t[3],
            jnp.zeros((dt.shape[0],)),
            jnp.zeros((dt.shape[0],)),
            jnp.zeros((dt.shape[0],)),
        ], axis=1)
        lt_f = tr_tensor.l.astype(jnp.float64)
        d2t = spline_d2(lt_f, cl_t_list)
        l_t_max = tr_tensor.l[-1]
        ells_f = ells.astype(jnp.float64)
        cl_t_all = spline_eval(lt_f, cl_t_list, d2t, jnp.minimum(ells_f, lt_f[-1]))
        cl_t_all = jnp.where((ells <= l_t_max)[:, None], cl_t_all, 0.0)
        cl_all = cl_all + cl_t_all

    return SpectraResult(ell=ells, cl=cl_all, l_list=tr.l, cl_list=cl_list,
                         cl_pairs=cl_pairs if tr_iso else None,
                         cl_tensor=cl_t_all if tr_tensor is not None else None)
