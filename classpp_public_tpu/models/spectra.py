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


def compute_spectra(tr: TransferResult, pm: PrimordialResult, l_max: int) -> SpectraResult:
    q = tr.q
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

    # spline over l to all integer multipoles
    l_f = tr.l.astype(jnp.float64)
    ells = jnp.arange(2, l_max + 1)
    d2 = spline_d2(l_f, cl_list)
    cl_all = spline_eval(l_f, cl_list, d2, ells.astype(jnp.float64))

    return SpectraResult(ell=ells, cl=cl_all, l_list=tr.l, cl_list=cl_list)
