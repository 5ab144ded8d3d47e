"""Special functions: sine/cosine integrals Si(x), Ci(x).

Reference: tools/trigonometric_integrals.c:8 (cosine_integral) / :54
(sine_integral) — series + asymptotic split. Here we use the standard
series + modified-Lentz continued fraction for E1(ix) instead (the
asymptotic split loses ~1e-4 absolute near the crossover; the CF is
machine-accurate), with the complex arithmetic carried as explicit
(re, im) pairs so the kernel stays in plain f64 on TPU.

Vectorized over arbitrary array shapes; both branches are evaluated and
masked (fixed iteration counts, no data-dependent control flow) so the
function jits to straight-line VPU code.
"""

from __future__ import annotations

import jax.numpy as jnp

_EULER = 0.57721566490153286060651209008240243104215933593992

_N_SERIES = 30     # series terms: x<4 -> max term x^30/30! < 1e-15 rel
_N_CF = 60         # Lentz iterations: converged to 1e-16 for x>=4


def si_ci(x):
    """Return (Si(x), Ci(x)) for x > 0, elementwise.

    Si(x) = int_0^x sin t / t dt,  Ci(x) = gamma + ln x + int_0^x (cos t - 1)/t dt.
    """
    x = jnp.asarray(x)
    xs = jnp.where(x < 4.0, x, 1.0)          # series argument (masked)
    xc = jnp.where(x < 4.0, 4.0, x)          # CF argument (masked)

    # --- power series (x < 4):
    #   Si = sum_{n>=0} (-1)^n x^{2n+1} / ((2n+1)(2n+1)!)
    #   Cin = sum_{n>=1} (-1)^{n+1} x^{2n} / (2n (2n)!);  Ci = g + ln x - Cin
    x2 = xs * xs
    si_s = jnp.zeros_like(xs)
    cin_s = jnp.zeros_like(xs)
    t_odd = xs                                # x^{2n+1}/(2n+1)!
    t_even = x2 / 2.0                         # x^{2n+2}/(2n+2)!
    for n in range(_N_SERIES):
        sign = (-1) ** n
        si_s = si_s + sign * t_odd / (2 * n + 1)
        cin_s = cin_s + sign * t_even / (2 * n + 2)
        t_odd = t_odd * x2 / ((2 * n + 2) * (2 * n + 3))
        t_even = t_even * x2 / ((2 * n + 3) * (2 * n + 4))
    ci_s = _EULER + jnp.log(xs) - cin_s

    # --- modified Lentz continued fraction for E1(ix) (x >= 4):
    # E1(ix) = e^{-ix} * h,  h = 1/(b0 - 1^2/(b1 - 2^2/(b2 - ...))),
    # b_j = (2j+1) + ix.  Then Ci = -Re E1(ix), Si = pi/2 + Im(-E1(ix)).
    br, bi = 1.0 + jnp.zeros_like(xc), xc     # b = 1 + ix
    d_den = br * br + bi * bi
    dr, di = br / d_den, -bi / d_den
    hr, hi = dr, di
    # first Lentz iteration unrolled with c0 = infinity => c1 = b (avoids the
    # usual 1/FPMIN initializer, which overflows TPU's f32-exponent-range
    # float64 emulation when squared)
    a = -1.0
    br = br + 2.0
    tr, ti = a * dr + br, a * di + bi
    den = tr * tr + ti * ti
    dr, di = tr / den, -ti / den
    cr, ci_ = br, bi
    er, ei = cr * dr - ci_ * di, cr * di + ci_ * dr
    hr, hi = hr * er - hi * ei, hr * ei + hi * er
    for i in range(3, _N_CF + 2):
        a = -((i - 1.0) ** 2)
        br = br + 2.0
        # d = 1/(a*d + b)
        tr, ti = a * dr + br, a * di + bi
        den = tr * tr + ti * ti
        dr, di = tr / den, -ti / den
        # c = b + a/c
        den_c = cr * cr + ci_ * ci_
        cr, ci_ = br + a * cr / den_c, bi - a * ci_ / den_c
        # h *= c*d
        er, ei = cr * dr - ci_ * di, cr * di + ci_ * dr
        hr, hi = hr * er - hi * ei, hr * ei + hi * er
    # E1(ix) = (cos x - i sin x) * h
    cx, sx = jnp.cos(xc), jnp.sin(xc)
    e1r = cx * hr + sx * hi
    e1i = cx * hi - sx * hr
    ci_c = -e1r
    si_c = jnp.pi / 2.0 + e1i

    small = x < 4.0
    return jnp.where(small, si_s, si_c), jnp.where(small, ci_s, ci_c)
