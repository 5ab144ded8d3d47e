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

    # derive the stage carry from y so it keeps y's varying mesh axes under
    # shard_map (a plain jnp.zeros carry is mesh-invariant and trips the
    # while/scan carry vma check)
    K0 = jnp.zeros((6,) + y.shape, dt) + (y * 0)[None]
    K, _ = jax.lax.scan(stage, K0, jnp.arange(6))
    y5 = y + h_c * jnp.tensordot(B5, K, axes=1, precision=hp)
    y4 = y + h_c * jnp.tensordot(B4, K, axes=1, precision=hp)
    return y5, y5 - y4, K[0]


# --- ARK3(2)4L[2]SA additive (IMEX) Runge-Kutta, Kennedy & Carpenter 2003 ---
# Explicit table advances the non-stiff physics; the ESDIRK table (L-stable,
# stiffly accurate, gamma diagonal) absorbs the stiff part implicitly. This is
# the TPU-native replacement for the reference's ndf15 stiff evolver
# (tools/evolver_ndf15.cpp:62): the perturbation ODE is LINEAR and its only
# stiff couplings (Thomson drag) have a closed-form (I - gamma*h*J)^-1, so no
# Newton iteration, no numjac, no LU — every stage is elementwise VPU work and
# the whole k-grid steps in lockstep under vmap.
_ARK_G = 1767732205903.0 / 4055673282236.0   # 0.435866521508459
_ARK_C = (0.0, 2.0 * _ARK_G, 3.0 / 5.0, 1.0)
_ARK_AE = (
    (0.0, 0.0, 0.0),
    (2.0 * _ARK_G, 0.0, 0.0),
    (5535828885825.0 / 10492691773637.0, 788022342437.0 / 10882634858940.0, 0.0),
    (6485989280629.0 / 16251701735622.0, -4246266847089.0 / 9704473918619.0,
     10755448449292.0 / 10357097424841.0),
)
_ARK_AI = (
    (0.0, 0.0, 0.0),
    (_ARK_G, 0.0, 0.0),
    (2746238789719.0 / 10658868560708.0, -640167445237.0 / 6845629431997.0, 0.0),
    (1471266399579.0 / 7840856788654.0, -4482444167858.0 / 7529755066697.0,
     11266239266428.0 / 11593286722821.0),
)
_ARK_B = (1471266399579.0 / 7840856788654.0, -4482444167858.0 / 7529755066697.0,
          11266239266428.0 / 11593286722821.0, _ARK_G)
_ARK_BH = (2756255671327.0 / 12835298489170.0, -10771552573575.0 / 22201958757719.0,
           9247589265047.0 / 10645013368117.0, 2193209047091.0 / 5459859503100.0)


# --- ARK4(3)6L[2]SA (Kennedy & Carpenter 2003): 6-stage, 4th order, embedded
# 3rd order; implicit ESDIRK part L-stable with gamma = 1/4. Order-4 additive
# coupling conditions verified exactly (tests/test_ode.py). Same RHS-eval
# count per step as Cash-Karp 45 but stiff-capable.
_ARK4_G = 0.25
_ARK4_C = (0.0, 1.0 / 2.0, 83.0 / 250.0, 31.0 / 50.0, 17.0 / 20.0, 1.0)
_ARK4_AE = (
    (),
    (1.0 / 2.0,),
    (13861.0 / 62500.0, 6889.0 / 62500.0),
    (-116923316275.0 / 2393684061468.0, -2731218467317.0 / 15368042101831.0,
     9408046702089.0 / 11113171139209.0),
    (-451086348788.0 / 2902428689909.0, -2682348792572.0 / 7519795681897.0,
     12662868775082.0 / 11960479115383.0, 3355817975965.0 / 11060851509271.0),
    (647845179188.0 / 3216320057751.0, 73281519250.0 / 8382639484533.0,
     552539513391.0 / 3454668386233.0, 3354512671639.0 / 8306763924573.0,
     4040.0 / 17871.0),
)
_ARK4_AI = (
    (),
    (1.0 / 4.0,),
    (8611.0 / 62500.0, -1743.0 / 31250.0),
    (5012029.0 / 34652500.0, -654441.0 / 2922500.0, 174375.0 / 388108.0),
    (15267082809.0 / 155376265600.0, -71443401.0 / 120774400.0,
     730878875.0 / 902184768.0, 2285395.0 / 8070912.0),
    (82889.0 / 524892.0, 0.0, 15625.0 / 83664.0, 69875.0 / 102672.0,
     -2260.0 / 8211.0),
)
_ARK4_B = (82889.0 / 524892.0, 0.0, 15625.0 / 83664.0, 69875.0 / 102672.0,
           -2260.0 / 8211.0, 1.0 / 4.0)
_ARK4_BH = (4586570599.0 / 29645900160.0, 0.0, 178811875.0 / 945068544.0,
            814220225.0 / 1159782912.0, -3700637.0 / 11593932.0,
            61727.0 / 225920.0)

_ARK3_TABLEAU = (_ARK_G, _ARK_C, _ARK_AE, _ARK_AI, _ARK_B, _ARK_BH)
_ARK4_TABLEAU = (_ARK4_G, _ARK4_C, _ARK4_AE, _ARK4_AI, _ARK4_B, _ARK4_BH)


def _ark_step(tableau, rhs, stiff_apply, stiff_solve, t, y, h, args):
    """One additive (IMEX) RK step for y' = f(t,y) = f_E + J(t)·y, where
    stiff_apply(t, y, args) = J(t)·y and stiff_solve(t, gh, r, args) solves
    (I - gh·J(t)) x = r in closed form. rhs returns the FULL f; the explicit
    part is f - J·y. Returns (y_new, err, f(t,y)) like rkck_step.

    The implicit table is L-stable so the Thomson-drag stiffness never limits
    the step — steps are set by acoustic-oscillation accuracy alone (the
    reference needs ndf15's variable-order BDF for the same reason,
    tools/evolver_ndf15.cpp:62).

    The s stages run as ONE lax.scan over dense (strictly lower triangular)
    tableau rows, so rhs/stiff_apply/stiff_solve each appear exactly once in
    the compiled graph — same trick as rkck_step above; with the large
    Boltzmann RHS this is the difference between a ~20 s and a ~2 min XLA
    compile per solver head. The ESDIRK diagonal is the constant gamma, so
    the per-stage implicit solve uses one shared gh. Stage 0 is explicit
    (Y_0 = y, standard ESDIRK): the scan computes the solve anyway and
    discards it via a select. fI is evaluated as stiff_apply(t_i, Y_i), which
    equals (Y_i - r)/gh exactly because the solve is an exact closed-form
    inverse of the same J used by stiff_apply (and avoids the cancellation in
    the subtraction).
    """
    gamma, C, AE, AI, B, BH = tableau
    s = len(C)
    dt = y.dtype
    h_c = jnp.asarray(h, dt)
    gh = gamma * h_c

    import numpy as _np
    AE_m = _np.zeros((s, s))
    AI_m = _np.zeros((s, s))
    for i in range(s):
        for j, a in enumerate(AE[i]):
            AE_m[i, j] = a
        for j, a in enumerate(AI[i]):
            AI_m[i, j] = a
    AE_j = jnp.asarray(AE_m, dt)
    AI_j = jnp.asarray(AI_m, dt)
    C_v = jnp.asarray(C)
    hp = jax.lax.Precision.HIGHEST

    def stage(carry, inp):
        FE, FI = carry
        i, c_i, aE_row, aI_row = inp
        r = y + h_c * (jnp.tensordot(aE_row, FE, axes=1, precision=hp)
                       + jnp.tensordot(aI_row, FI, axes=1, precision=hp))
        t_i = t + c_i * h
        Y_i = stiff_solve(t_i, gh, r, args)
        Y_i = jnp.where(i == 0, y, Y_i)
        fI_i = stiff_apply(t_i, Y_i, args)
        fE_i = rhs(t_i, Y_i, args) - fI_i
        return (FE.at[i].set(fE_i), FI.at[i].set(fI_i)), None

    # derive the stage carries from y so they keep y's varying mesh axes
    # under shard_map (see rkck_step)
    # unroll: 1 = smallest graph (fastest compile), s = fully unrolled
    # (fastest runtime: XLA fuses across stages); CLASSPP_ARK_UNROLL tunes it
    import os as _os
    unroll = int(_os.environ.get("CLASSPP_ARK_UNROLL", "1"))
    Z = jnp.zeros((s,) + y.shape, dt) + (y * 0)[None]
    (FE, FI), _ = jax.lax.scan(stage, (Z, Z), (jnp.arange(s), C_v, AE_j, AI_j),
                               unroll=min(max(unroll, 1), s))
    F = FE + FI
    B_v = jnp.asarray(B, dt)
    BH_v = jnp.asarray(BH, dt)
    y_new = y + h_c * jnp.tensordot(B_v, F, axes=1, precision=hp)
    err = h_c * jnp.tensordot(B_v - BH_v, F, axes=1, precision=hp)
    # stiffness-filtered error estimate: the embedded pair is not stiffly
    # accurate, so the raw (b - bhat) combination is O(kap h y) on slaved
    # components and would collapse the step back to explicit sizes; passing
    # it through (I - gamma h J)^-1 restores a sharp estimate (same filter as
    # SUNDIALS ARKODE applies for ESDIRK embeddings)
    err = stiff_solve(t + h, gh, err, args)
    return y_new, err, F[0]


def ark32_step(rhs, stiff_apply, stiff_solve, t, y, h, args):
    """ARK3(2)4L[2]SA additive step (4 stages, order 3(2))."""
    return _ark_step(_ARK3_TABLEAU, rhs, stiff_apply, stiff_solve, t, y, h, args)


def ark43_step(rhs, stiff_apply, stiff_solve, t, y, h, args):
    """ARK4(3)6L[2]SA additive step (6 stages, order 4(3)) — the default
    stiff evolver of the framework."""
    return _ark_step(_ARK4_TABLEAU, rhs, stiff_apply, stiff_solve, t, y, h, args)


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
