"""Cubic-spline and interpolation ops.

TPU-native replacement of the reference array kit (tools/arrays.c:514-2328):
instead of stateful "hunt" searches, tables that must be queried inside jitted
hot loops live on *uniform* grids (in x or log x), so the bracketing index is
pure arithmetic — no searchsorted, no data-dependent control flow. Non-uniform
tables (build-time only) use vectorized searchsorted.

All functions are pure, jit-safe, and batched via vmap over leading axes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


@jax.jit
def tridiag_solve(dl: jnp.ndarray, d: jnp.ndarray, du: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Thomas algorithm for a tridiagonal system, via lax.scan.

    dl: sub-diagonal (n,), dl[0] unused; d: diagonal (n,); du: super-diagonal
    (n,), du[-1] unused; b: rhs (n,) or (n, m).
    """
    n = d.shape[0]
    b2 = b if b.ndim > 1 else b[:, None]

    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        dl_i, d_i, du_i, b_i = inp
        denom = d_i - dl_i * cp_prev
        cp = du_i / denom
        dp = (b_i - dl_i * dp_prev) / denom
        return (cp, dp), (cp, dp)

    init = (jnp.zeros((), b2.dtype), jnp.zeros((b2.shape[1],), b2.dtype))
    _, (cp, dp) = jax.lax.scan(fwd, init, (dl, d, du, b2))

    def bwd(x_next, inp):
        cp_i, dp_i = inp
        x = dp_i - cp_i * x_next
        return x, x

    _, xs = jax.lax.scan(bwd, jnp.zeros((b2.shape[1],), b2.dtype), (cp, dp), reverse=True)
    return xs if b.ndim > 1 else xs[:, 0]


@partial(jax.jit, static_argnames=("bc",))
def spline_d2(x: jnp.ndarray, y: jnp.ndarray, bc: str = "natural") -> jnp.ndarray:
    """Second derivatives of the cubic spline through (x, y).

    Equivalent of array_spline_table_lines (tools/arrays.c:514). y may be
    (n,) or (n, m) — splined along axis 0. bc: 'natural', 'not_a_knot'
    (approximation of the reference _SPLINE_EST_DERIV_), or 'est_deriv'
    (the exact reference BC: clamped with 3-point end-derivative estimates,
    tools/arrays.c array_spline _SPLINE_EST_DERIV_ branch).
    """
    n = x.shape[0]
    h = jnp.diff(x)  # (n-1,)
    y2d = y if y.ndim > 1 else y[:, None]
    dy = jnp.diff(y2d, axis=0) / h[:, None]

    # interior equations: h[i-1] y2[i-1] + 2(h[i-1]+h[i]) y2[i] + h[i] y2[i+1] = 6(dy[i]-dy[i-1])
    dl = jnp.concatenate([jnp.zeros(1, x.dtype), h[:-1], jnp.zeros(1, x.dtype)])
    d = jnp.concatenate([jnp.ones(1, x.dtype), 2.0 * (h[:-1] + h[1:]), jnp.ones(1, x.dtype)])
    du = jnp.concatenate([jnp.zeros(1, x.dtype), h[1:], jnp.zeros(1, x.dtype)])
    rhs = jnp.concatenate(
        [jnp.zeros((1, y2d.shape[1]), y2d.dtype), 6.0 * (dy[1:] - dy[:-1]), jnp.zeros((1, y2d.shape[1]), y2d.dtype)],
        axis=0,
    )
    if bc == "est_deriv":
        # clamped spline, end slopes from the quadratic through the 3
        # outermost points (reference dy_first/dy_last, tools/arrays.c)
        x0, x1, x2 = x[0], x[1], x[2]
        dy_first = (((x2 - x0) ** 2 * (y2d[1] - y2d[0])
                     - (x1 - x0) ** 2 * (y2d[2] - y2d[0]))
                    / ((x2 - x0) * (x1 - x0) * (x2 - x1)))
        xm0, xm1, xm2 = x[-1], x[-2], x[-3]
        dy_last = (((xm2 - xm0) ** 2 * (y2d[-2] - y2d[-1])
                    - (xm1 - xm0) ** 2 * (y2d[-3] - y2d[-1]))
                   / ((xm2 - xm0) * (xm1 - xm0) * (xm2 - xm1)))
        # clamped rows: 2 y2[0] + y2[1] = 6 (dy[0] - A)/h0;
        #               y2[n-2] + 2 y2[n-1] = 6 (B - dy[-1])/h_{n-2}
        d = d.at[0].set(2.0)
        du = du.at[0].set(1.0)
        rhs = rhs.at[0].set(6.0 * (dy[0] - dy_first) / h[0])
        dl = dl.at[-1].set(1.0)
        d = d.at[-1].set(2.0)
        rhs = rhs.at[-1].set(6.0 * (dy_last - dy[-1]) / h[-1])
    if bc == "not_a_knot":
        # y2 continuity of third derivative at x1 and x_{n-2}
        # d0: y2[0]*h1 - y2[1]*(h0+h1) + y2[2]*h0 = 0  -> fold into first row via
        # standard trick: replace first row with (h1, -(h0+h1), h0) — but tridiag
        # solver needs tridiagonal structure; use the equivalent formulation:
        # y2[0] = ((h0+h1) y2[1] - h0 y2[2]) / h1 — eliminate into row 1.
        h0, h1 = h[0], h[1]
        hm0, hm1 = h[-1], h[-2]
        # row 1 (interior i=1): dl*y2[0] + d*y2[1] + du*y2[2] = rhs
        # substitute y2[0]:
        d = d.at[1].add(dl[1] * (h0 + h1) / h1)
        du = du.at[1].add(-dl[1] * h0 / h1)
        dl = dl.at[1].set(0.0)
        d = d.at[-2].add(du[-2] * (hm0 + hm1) / hm1)
        dl = dl.at[-2].add(-du[-2] * hm0 / hm1)
        du = du.at[-2].set(0.0)

    y2 = tridiag_solve(dl, d, du, rhs)
    if bc == "not_a_knot":
        h0, h1 = h[0], h[1]
        hm0, hm1 = h[-1], h[-2]
        y2 = y2.at[0].set(((h0 + h1) * y2[1] - h0 * y2[2]) / h1)
        y2 = y2.at[-1].set(((hm0 + hm1) * y2[-2] - hm0 * y2[-3]) / hm1)
    return y2 if y.ndim > 1 else y2[:, 0]


def spline_eval(x: jnp.ndarray, y: jnp.ndarray, y2: jnp.ndarray, xq: jnp.ndarray) -> jnp.ndarray:
    """Evaluate cubic spline at xq (any shape). Non-uniform x, searchsorted based.

    Equivalent of array_interpolate_spline (tools/arrays.c:1565).
    y, y2: (n,) or (n, m); returns xq.shape or xq.shape + (m,).
    """
    idx = jnp.clip(jnp.searchsorted(x, xq, side="right") - 1, 0, x.shape[0] - 2)
    xl, xr = x[idx], x[idx + 1]
    h = xr - xl
    a = (xr - xq) / h
    b = (xq - xl) / h
    if y.ndim > 1:
        a, b, h = a[..., None], b[..., None], h[..., None]
    yl, yr, y2l, y2r = y[idx], y[idx + 1], y2[idx], y2[idx + 1]
    return a * yl + b * yr + ((a**3 - a) * y2l + (b**3 - b) * y2r) * h * h / 6.0


def spline_eval_deriv(x, y, y2, xq):
    """First derivative of the cubic spline at xq."""
    idx = jnp.clip(jnp.searchsorted(x, xq, side="right") - 1, 0, x.shape[0] - 2)
    xl, xr = x[idx], x[idx + 1]
    h = xr - xl
    a = (xr - xq) / h
    b = (xq - xl) / h
    if y.ndim > 1:
        a, b, h = a[..., None], b[..., None], h[..., None]
    yl, yr, y2l, y2r = y[idx], y[idx + 1], y2[idx], y2[idx + 1]
    return (yr - yl) / h + ((3.0 * b**2 - 1.0) * y2r - (3.0 * a**2 - 1.0) * y2l) * h / 6.0


def spline_integrate(x: jnp.ndarray, y: jnp.ndarray, y2: jnp.ndarray) -> jnp.ndarray:
    """Cumulative integral of the spline from x[0]; returns array shaped like y.

    Exact per-interval spline integral (replaces array_integrate_spline,
    tools/arrays.c).
    """
    h = jnp.diff(x)
    if y.ndim > 1:
        h = h[:, None]
    seg = h * (y[:-1] + y[1:]) / 2.0 - h**3 * (y2[:-1] + y2[1:]) / 24.0
    out = jnp.concatenate([jnp.zeros_like(y[:1]), jnp.cumsum(seg, axis=0)], axis=0)
    return out


def spline_integrate_reverse(x: jnp.ndarray, y: jnp.ndarray, y2: jnp.ndarray) -> jnp.ndarray:
    """Cumulative integral of the spline from each x[i] to x[-1]: out[i] =
    int_{x[i]}^{x[-1]} y dx. Accumulates from the upper end, avoiding the
    catastrophic cancellation of `total - forward_cumsum` when the integrand
    spans many orders of magnitude (e.g. optical depth kappa(tau))."""
    h = jnp.diff(x)
    if y.ndim > 1:
        h = h[:, None]
    seg = h * (y[:-1] + y[1:]) / 2.0 - h**3 * (y2[:-1] + y2[1:]) / 24.0
    rev = jnp.cumsum(seg[::-1], axis=0)[::-1]
    return jnp.concatenate([rev, jnp.zeros_like(y[:1])], axis=0)


class UniformSpline(NamedTuple):
    """Cubic spline on a uniform grid: O(1) arithmetic lookup, gather-light eval.

    This is the TPU-native workhorse replacing the reference's
    'growing_hunt' interpolation (tools/arrays.c:2233) in hot loops.
    """

    x0: jnp.ndarray    # scalar
    dx: jnp.ndarray    # scalar
    y: jnp.ndarray     # (n,) or (n, m)
    y2: jnp.ndarray    # same shape as y

    @property
    def n(self) -> int:
        return self.y.shape[0]

    @classmethod
    def build(cls, x0, dx, y, bc: str = "natural") -> "UniformSpline":
        n = y.shape[0]
        x = x0 + dx * jnp.arange(n, dtype=jnp.result_type(float))
        return cls(jnp.asarray(x0), jnp.asarray(dx), y, spline_d2(x, y, bc=bc))

    def eval(self, xq: jnp.ndarray) -> jnp.ndarray:
        t = (xq - self.x0) / self.dx
        idx = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, self.n - 2)
        b = t - idx
        a = 1.0 - b
        if self.y.ndim > 1:
            a, b = a[..., None], b[..., None]
        yl, yr, y2l, y2r = self.y[idx], self.y[idx + 1], self.y2[idx], self.y2[idx + 1]
        h2 = self.dx * self.dx
        return a * yl + b * yr + ((a**3 - a) * y2l + (b**3 - b) * y2r) * h2 / 6.0

    def eval_deriv(self, xq: jnp.ndarray) -> jnp.ndarray:
        t = (xq - self.x0) / self.dx
        idx = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, self.n - 2)
        b = t - idx
        a = 1.0 - b
        if self.y.ndim > 1:
            a, b = a[..., None], b[..., None]
        yl, yr, y2l, y2r = self.y[idx], self.y[idx + 1], self.y2[idx], self.y2[idx + 1]
        return (yr - yl) / self.dx + ((3.0 * b**2 - 1.0) * y2r - (3.0 * a**2 - 1.0) * y2l) * self.dx / 6.0


def linear_interp_uniform(x0, dx, y, xq):
    """Linear interpolation on a uniform grid (cheapest possible lookup)."""
    t = (xq - x0) / dx
    idx = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, y.shape[0] - 2)
    w = t - idx
    if y.ndim > 1:
        w = w[..., None]
    return (1.0 - w) * y[idx] + w * y[idx + 1]
