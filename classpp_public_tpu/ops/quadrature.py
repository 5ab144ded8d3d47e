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
