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

from ..ops.quadrature import trapz_weights
from ..ops.splines import spline_d2, spline_eval
from .primordial import PrimordialResult
from .transfer import TT_TYPES, TransferResult

CT_TYPES = ["tt", "ee", "te", "bb", "pp", "tp", "ep"]


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
                    tr_tensor: TransferResult = None, tr_iso: dict = None) -> SpectraResult:
    # curved case: quadrature over k(q) with the primordial spectrum at k
    # (spectra_compute_cl :958: cl_integrand column 0 is k, P at k)
    q = tr.k if tr.k is not None else tr.q
    w = trapz_weights(q)
    pk = pm.scalar_pk(q)
    meas = 4.0 * jnp.pi / q * pk * w        # (nq,)

    ix = {n: i for i, n in enumerate(TT_TYPES)}
    d = tr.delta                             # (nl, ntt, nq)
    t_total = d[:, ix["t0"]] + d[:, ix["t1"]] + d[:, ix["t2"]]  # (nl, nq)
    e = d[:, ix["e"]]
    p = d[:, ix["lcmb"]]

    def quad(a, b):
        return jnp.sum(meas[None, :] * a * b, axis=-1)

    cl_list = jnp.stack([
        quad(t_total, t_total),
        quad(e, e),
        quad(t_total, e),
        jnp.zeros((d.shape[0],)),           # BB: tensors/lensing only
        quad(p, p),
        quad(t_total, p),
        quad(e, p),
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
            meas_i = factor * 4.0 * jnp.pi / q * pk_pair * w

            def quad_i(a, b, a2, b2):
                return jnp.sum(meas_i[None, :]
                               * 0.5 * (a * b2 + a2 * b), axis=-1)

            return jnp.stack([
                quad_i(t1, t1, t2, t2), quad_i(e1, e1, e2, e2),
                quad_i(t1, e1, t2, e2),
                jnp.zeros((t1.shape[0],)),
                quad_i(p1, p1, p2, p2), quad_i(t1, p1, t2, p2),
                quad_i(e1, p1, e2, p2),
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
        wt = trapz_weights(qt)
        pk_h = pm.tensor_pk(qt)
        meas_t = 4.0 * jnp.pi / qt * pk_h * wt
        dt = tr_tensor.delta                  # (nl_t, 3, nq_t): t2, e, b
        t2, e_t, b_t = dt[:, 0], dt[:, 1], dt[:, 2]

        def quad_t(a, b):
            return jnp.sum(meas_t[None, :] * a * b, axis=-1)

        cl_t_list = jnp.stack([
            quad_t(t2, t2),
            quad_t(e_t, e_t),
            quad_t(t2, e_t),
            quad_t(b_t, b_t),
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
