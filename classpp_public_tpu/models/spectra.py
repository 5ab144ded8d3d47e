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
        # uncorrelated isocurvature modes: add each auto-spectrum with its
        # primordial amplitude (spectra_cls ic-pair loop, spectra_module.cpp:856)
        for ic, tri in tr_iso.items():
            pki = pm.iso_pk(ic, q)
            meas_i = 4.0 * jnp.pi / q * pki * w
            di = tri.delta
            t_i = di[:, ix["t0"]] + di[:, ix["t1"]] + di[:, ix["t2"]]
            e_i = di[:, ix["e"]]
            p_i = di[:, ix["lcmb"]]

            def quad_i(a, b):
                return jnp.sum(meas_i[None, :] * a * b, axis=-1)

            cl_list = cl_list + jnp.stack([
                quad_i(t_i, t_i), quad_i(e_i, e_i), quad_i(t_i, e_i),
                jnp.zeros((di.shape[0],)),
                quad_i(p_i, p_i), quad_i(t_i, p_i), quad_i(e_i, p_i),
            ], axis=1)

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

    return SpectraResult(ell=ells, cl=cl_all, l_list=tr.l, cl_list=cl_list)
