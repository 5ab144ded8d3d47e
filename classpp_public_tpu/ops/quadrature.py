"""Quadrature rules.

Replaces the reference quadrature kit (tools/quadrature.c): Gauss-Legendre
(used for the lensing mu-grid, tools/quadrature.c:752), Gauss-Laguerre (ncdm
momentum grids), and trapezoidal weights/convolutions (tools/arrays.c:2823).

Node/weight generation runs in numpy at setup time (static shapes); evaluation
is JAX.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


def gauss_legendre(n: int, a: float = -1.0, b: float = 1.0):
    """n-point Gauss-Legendre nodes/weights on [a, b] (float64 numpy).
    Cached: leggauss(n~3000) costs ~1 s (companion-matrix eigensolve) and
    lensing asks for the same grid on every pipeline instance."""
    x, w = _leggauss_cached(n)
    x = 0.5 * (b - a) * x + 0.5 * (b + a)
    w = 0.5 * (b - a) * w
    return x, w


@lru_cache(maxsize=8)
def _leggauss_cached(n: int):
    x, w = np.polynomial.legendre.leggauss(n)
    x.setflags(write=False)
    w.setflags(write=False)
    return x, w


def gauss_laguerre(n: int, alpha: float = 0.0):
    """n-point generalized Gauss-Laguerre nodes/weights: ∫ x^a e^-x f(x) dx."""
    x, w = np.polynomial.laguerre.laggauss(n) if alpha == 0.0 else _gen_laguerre(n, alpha)
    return x, w


def _gen_laguerre(n: int, alpha: float):
    from numpy.polynomial import Polynomial
    # Golub-Welsch for generalized Laguerre
    i = np.arange(n)
    d = 2 * i + alpha + 1
    e = -np.sqrt((i[1:]) * (i[1:] + alpha))
    J = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    vals, vecs = np.linalg.eigh(J)
    from math import gamma
    w = vecs[0] ** 2 * gamma(alpha + 1)
    return vals, w


def ncdm_momentum_grid(n: int = 150, qmax: float = 30.0):
    """Fixed momentum grid + weights for Fermi-Dirac integrals ∫ q^2 f0(q) g(q) dq.

    TPU-native replacement for the adaptive Gauss-Kronrod tree of
    tools/quadrature.c:69 (get_qsampling): a dense fixed trapezoidal grid is
    cheap on TPU and accurate to <1e-9 for FD-weighted integrands at n=150.
    Returns (q, w) with w including the q^2/(e^q+1) FD factor *excluded*
    (caller applies its own f0).
    """
    q = np.linspace(1e-4, qmax, n)
    w = trapz_weights_np(q)
    return q, w


def trapz_weights_np(x: np.ndarray) -> np.ndarray:
    w = np.zeros_like(x)
    dx = np.diff(x)
    w[:-1] += dx / 2
    w[1:] += dx / 2
    return w


def trapz_weights(x: jnp.ndarray) -> jnp.ndarray:
    """Trapezoidal weights for a (possibly non-uniform) grid.

    Equivalent of array_trapezoidal_weights (tools/arrays.c:2823).
    """
    dx = jnp.diff(x)
    z = jnp.zeros((1,), x.dtype)
    return jnp.concatenate([dx / 2, z]) + jnp.concatenate([z, dx / 2])


# --- adaptive Gauss-Kronrod (host-side, setup time) ------------------------
# Equivalent of the gk_adapt/reduce_tree machinery of tools/quadrature.c
# (:200-520): used by the qm_auto momentum-sampling strategy to produce a
# reference integral and, if Laguerre fails to converge, an adaptive node set.
# Runs once per configuration in numpy — the chosen static-shape grid then
# feeds the jitted Boltzmann hierarchy.

# 15-point Kronrod nodes on [-1, 1] and weights, with the embedded 7-point
# Gauss weights on the odd-index nodes (QUADPACK qk15 constants).
_GK15_X = np.array([
    -0.991455371120813, -0.949107912342759, -0.864864423359769,
    -0.741531185599394, -0.586087235467691, -0.405845151377397,
    -0.207784955007898, 0.0, 0.207784955007898, 0.405845151377397,
    0.586087235467691, 0.741531185599394, 0.864864423359769,
    0.949107912342759, 0.991455371120813])
_GK15_WK = np.array([
    0.022935322010529, 0.063092092629979, 0.104790010322250,
    0.140653259715525, 0.169004726639267, 0.190350578064785,
    0.204432940075298, 0.209482141084728, 0.204432940075298,
    0.190350578064785, 0.169004726639267, 0.140653259715525,
    0.104790010322250, 0.063092092629979, 0.022935322010529])
_GK15_WG = np.zeros(15)
_GK15_WG[1::2] = [0.129484966168870, 0.279705391489277, 0.381830050505119,
                  0.417959183673469, 0.381830050505119, 0.279705391489277,
                  0.129484966168870]


def gk_adapt(f, a: float = 0.0, b: float = 1.0, rtol: float = 1e-6,
             max_intervals: int = 256):
    """Adaptive 7-15 Gauss-Kronrod on [a, b] (vectorized f: numpy->numpy).

    Bisects the interval with the largest |GK15 - G7| error until the summed
    error estimate is below rtol * |I| (the flattened equivalent of the
    reference's binary gk_adapt tree + reduce_tree level search,
    tools/quadrature.c:200-420). Returns (nodes, weights, I): the surviving
    intervals' Kronrod nodes/weights, usable to integrate *other* smooth
    integrands on [a, b] — exactly how qm_auto reuses the reduced tree.
    """
    def rule(lo, hi):
        c, h = 0.5 * (lo + hi), 0.5 * (hi - lo)
        x = c + h * _GK15_X
        y = np.asarray(f(x), dtype=np.float64)
        ik = h * float(np.dot(_GK15_WK, y))
        ig = h * float(np.dot(_GK15_WG, y))
        return {"lo": lo, "hi": hi, "I": ik, "err": abs(ik - ig),
                "x": x, "w": h * _GK15_WK}

    segs = [rule(a, b)]
    while len(segs) < max_intervals:
        I = sum(s["I"] for s in segs)
        err = sum(s["err"] for s in segs)
        if err <= rtol * max(abs(I), 1e-300):
            break
        worst = max(range(len(segs)), key=lambda i: segs[i]["err"])
        s = segs.pop(worst)
        mid = 0.5 * (s["lo"] + s["hi"])
        segs.extend([rule(s["lo"], mid), rule(mid, s["hi"])])
    segs.sort(key=lambda s: s["lo"])
    x = np.concatenate([s["x"] for s in segs])
    w = np.concatenate([s["w"] for s in segs])
    return x, w, sum(s["I"] for s in segs)


def _ncdm_test_function(q):
    """The qm_auto convergence-test integrand of the reference
    (NonColdDarkMatter::background_ncdm_test_function,
    tools/non_cold_dark_matter.cpp:179-194): a fixed combination of the
    number/energy/entropy-like moments c q^2 - d q^3 - e q^4 (avoiding a
    constant/linear term, which breaks PSDs divergent at q -> 0)."""
    zeta3, zeta5 = 1.2020569031595943, 1.0369277551433699
    c = 2.0 / (3.0 * zeta3)
    d = 120.0 / (7.0 * np.pi**4)
    e = 2.0 / (45.0 * zeta5)
    return (2.0 * np.pi) ** 3 / 6.0 * (c * q * q - d * q**3 - e * q**4)


def auto_qsampling(f0, rtol: float = 1e-3, N_max: int = 95):
    """qm_auto (tools/quadrature.c get_qsampling :69): the fewest momentum
    nodes integrating test(q) * f0(q) over [0, inf) to relative accuracy rtol.

    Strategy, as in the reference: build a reference integral with adaptive
    Gauss-Kronrod at rtol*1e-4 (on q = t/(1-t), mapping [0,inf) to [0,1)),
    then walk the Gauss-Laguerre ladder upward and return the smallest N
    that matches; if no N <= N_max converges (pathological tabulated PSDs),
    fall back to the adaptive grid's own nodes mapped back to q-space.

    f0: vectorized normalized PSD (numpy -> numpy).
    Returns (q, w, N, method) with w such that sum(w * g(q)) ~ int g f0-free
    (w already contains f0, matching ncdm_psd_weights' convention *
    f0-included base weights are returned separately by callers).
    Here w *includes* f0(q): sum(w * T(q)) approximates int T(q) f0(q) dq.
    """
    def g(t):
        t = np.clip(t, 0.0, 1.0 - 1e-12)
        q = t / (1.0 - t)
        return _ncdm_test_function(q) * f0(q) / (1.0 - t) ** 2

    ts, wt, I_ref = gk_adapt(g, 0.0, 1.0, rtol=rtol * 1e-4)
    for N in range(2, N_max + 1):
        qn, wn = gauss_laguerre(N)
        w = wn * np.exp(qn) * f0(qn)
        I = float(np.dot(w, _ncdm_test_function(qn)))
        if abs(I - I_ref) <= rtol * abs(I_ref):
            return qn, w, N, "laguerre"
    # adaptive fallback: q-space nodes/weights of the GK grid
    q = ts / (1.0 - ts)
    wq = wt / (1.0 - ts) ** 2 * f0(q)
    return q, wq, len(q), "adaptive"
