"""ODE integrators.

TPU-native replacements for the reference evolvers:
  - `rkck_step` / `rkck_integrate`: embedded Cash-Karp RK45 with adaptive step
    control — functional equivalent of generic_integrator (tools/dei_rkck.c)
    and evolver_rk (tools/evolver_rkck.c:3), written as lax.while_loop so the
    whole k-grid integrates in lockstep under vmap (each lane keeps its own
    adaptive step).
  - `rk4_fixed`: classic RK4 over a fixed grid via lax.scan (thermo history).

No per-k adaptive *order* control (reference ndf15): stiff transients are
removed by the tight-coupling approximation mask instead, which is what makes
the explicit lockstep solve viable (see models/perturbations).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

# Cash-Karp tableau (A as a dense lower-triangular matrix so the six stages
# run as ONE lax.scan — the RHS then appears exactly once in the compiled
# graph instead of six times, which matters a lot for XLA compile time)
_CK_C = jnp.array([0.0, 1 / 5, 3 / 10, 3 / 5, 1.0, 7 / 8])
_CK_A_MAT = jnp.array([
    [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
    [1 / 5, 0.0, 0.0, 0.0, 0.0, 0.0],
    [3 / 40, 9 / 40, 0.0, 0.0, 0.0, 0.0],
    [3 / 10, -9 / 10, 6 / 5, 0.0, 0.0, 0.0],
    [-11 / 54, 5 / 2, -70 / 27, 35 / 27, 0.0, 0.0],
    [1631 / 55296, 175 / 512, 575 / 13824, 44275 / 110592, 253 / 4096, 0.0],
])
_CK_B5 = jnp.array([37 / 378, 0.0, 250 / 621, 125 / 594, 0.0, 512 / 1771])
_CK_B4 = jnp.array([2825 / 27648, 0.0, 18575 / 48384, 13525 / 55296, 277 / 14336, 1 / 4])

_SAFETY = 0.9
_MIN_SCALE = 0.2
_MAX_SCALE = 5.0


def rkck_step(rhs: Callable, t, y, h, args):
    """One Cash-Karp embedded step as a scan over the six stages.
    Returns (y5, err, k1). Mixed precision: the state y sets the working
    dtype; t and h may be f64 (time bookkeeping) with a cast at the stage."""
    dt = y.dtype
    h_c = jnp.asarray(h, dt)
    A = _CK_A_MAT.astype(dt)
    B5 = _CK_B5.astype(dt)
    B4 = _CK_B4.astype(dt)

    # HIGHEST: TPU f32 dots otherwise route through bf16 MXU passes, which
    # wrecks the embedded error estimate (y5-y4) and stalls the controller
    hp = jax.lax.Precision.HIGHEST

    def stage(K, i):
        y_i = y + h_c * jnp.tensordot(A[i], K, axes=1, precision=hp)
        k_i = rhs(t + _CK_C[i] * h, y_i, args)
        return K.at[i].set(k_i), None

    K0 = jnp.zeros((6,) + y.shape, dt)
    K, _ = jax.lax.scan(stage, K0, jnp.arange(6))
    y5 = y + h_c * jnp.tensordot(B5, K, axes=1, precision=hp)
    y4 = y + h_c * jnp.tensordot(B4, K, axes=1, precision=hp)
    return y5, y5 - y4, K[0]


class OdeStats(NamedTuple):
    steps: jnp.ndarray      # accepted steps
    failed: jnp.ndarray     # rejected steps


def rkck_integrate(
    rhs: Callable,
    y0: jnp.ndarray,
    t0,
    t1,
    args,
    rtol: float = 1e-5,
    atol=1e-12,
    h0=None,
    max_steps: int = 100_000,
    y_scale=None,
):
    """Adaptive RKCK45 from t0 to t1 (t1 >= t0). Returns (y(t1), h_last, stats).

    Error control mirrors the reference evolver_rk/generic_integrator
    (tools/evolver_rkck.c:3, include/dei_rkck.h:50): per-component
    |err| / (rtol*|y| + atol), step accepted when max ratio <= 1.
    vmap-safe: all control flow is lax.while_loop.
    """
    dtype = y0.dtype
    t0 = jnp.asarray(t0, dtype)
    t1 = jnp.asarray(t1, dtype)
    span = t1 - t0
    # NOTE: h is the *desired* step carried across calls — never clip it to
    # the span (zero-length segments must pass h through unchanged, and a
    # span-truncated final step must not shrink the carried h).
    h_init = jnp.maximum(jnp.asarray(span if h0 is None else h0, dtype), 1e-300)

    def cond(state):
        t, y, h, n_acc, n_rej, done = state
        return jnp.logical_and(~done, n_acc + n_rej < max_steps)

    def body(state):
        t, y, h, n_acc, n_rej, done = state
        h_eff = jnp.minimum(h, t1 - t)
        y_new, err, k1 = rkck_step(rhs, t, y, h_eff, args)
        # error scale as in the reference generic_integrator (dei_rkck.c):
        # yscal = |y| + |h dy/dt| + TINY  (pure relative control, robust for
        # oscillatory components crossing zero)
        scale = rtol * (jnp.abs(y) + jnp.abs(h_eff * k1) + 1e-30) + atol
        ratio = jnp.max(jnp.abs(err) / scale)
        ratio = jnp.where(jnp.isfinite(ratio), ratio, jnp.inf)
        accept = ratio <= 1.0
        # PI-free classical controller (matches dei_rkck)
        fac = _SAFETY * jnp.where(ratio > 0, ratio ** (-0.2), _MAX_SCALE)
        fac = jnp.clip(fac, _MIN_SCALE, _MAX_SCALE)
        # if the step was truncated by the interval end and accepted, keep the
        # larger desired step instead of growing from the truncated one
        clipped = h_eff < h
        h_next = jnp.where(jnp.logical_and(accept, clipped),
                           jnp.maximum(h, h_eff * fac), h_eff * fac)
        t_new = jnp.where(accept, t + h_eff, t)
        y_out = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, b, a), y, y_new)
        done_new = t_new >= t1 * (1.0 - 1e-15)
        return (
            t_new,
            y_out,
            jnp.maximum(h_next, 1e-300),
            n_acc + accept.astype(jnp.int32),
            n_rej + (~accept).astype(jnp.int32),
            done_new,
        )

    # derive the step counters from traced values so that under shard_map the
    # while_loop carry has consistent varying-axis types (see shard_map vma docs)
    n0 = (t0 * 0).astype(jnp.int32)
    state0 = (t0, y0, h_init, n0, n0, span <= 0.0)
    t, y, h, n_acc, n_rej, _ = jax.lax.while_loop(cond, body, state0)
    return y, h, OdeStats(n_acc, n_rej)


def rk4_fixed(rhs: Callable, y0: jnp.ndarray, ts: jnp.ndarray, args, substeps: int = 1):
    """Classic RK4 over the fixed grid ts, with `substeps` sub-steps per
    interval. Returns ys with ys[i] = y(ts[i]) (ys[0] = y0). lax.scan based."""

    def one_rk4(t, y, h):
        k1 = rhs(t, y, args)
        k2 = rhs(t + h / 2, y + h / 2 * k1, args)
        k3 = rhs(t + h / 2, y + h / 2 * k2, args)
        k4 = rhs(t + h, y + h * k3, args)
        return y + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

    def step(y, t_pair):
        ta, tb = t_pair
        h = (tb - ta) / substeps

        def sub(i, yy):
            return one_rk4(ta + i * h, yy, h)

        y_new = jax.lax.fori_loop(0, substeps, sub, y)
        return y_new, y_new

    _, ys = jax.lax.scan(step, y0, (ts[:-1], ts[1:]))
    return jnp.concatenate([y0[None], ys], axis=0)
