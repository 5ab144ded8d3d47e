"""Primordial spectra (L6).

Analytic power-law spectra with runnings (reference
primordial_analytic_spectrum_init, primordial_module.cpp:675). The inflaton
ODE solver and external-command spectra (primordial_module.cpp:1087, :3022)
are later-round additions; the analytic path covers the default and Planck
configurations.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config.params import CosmoParams


class PrimordialResult(NamedTuple):
    A_s: jnp.ndarray
    n_s: jnp.ndarray
    alpha_s: jnp.ndarray
    k_pivot: jnp.ndarray
    r: jnp.ndarray
    n_t: jnp.ndarray
    alpha_t: jnp.ndarray
    iso: dict = None          # {ic: (f_amp, n_index)} uncorrelated isocurvature

    def iso_pk(self, ic, k):
        """P_iso(k) = A_s f_i^2 (k/k*)^{n_i - 1} (reference
        primordial_analytic_spectrum_init, primordial_module.cpp:675)."""
        f, n = self.iso[ic]
        return self.A_s * f**2 * (k / self.k_pivot) ** (n - 1.0)

    def scalar_pk(self, k):
        """Dimensionless curvature spectrum P_R(k) (primordial_module.cpp:69)."""
        lnk = jnp.log(k / self.k_pivot)
        return self.A_s * jnp.exp((self.n_s - 1.0) * lnk + 0.5 * self.alpha_s * lnk**2)

    def tensor_pk(self, k):
        lnk = jnp.log(k / self.k_pivot)
        return self.r * self.A_s * jnp.exp(self.n_t * lnk + 0.5 * self.alpha_t * lnk**2)


def compute_primordial(params: CosmoParams, iso: dict = None) -> PrimordialResult:
    # tensor tilt: inflationary consistency n_t = -r/8 (1 - n_s/... ) is the
    # 'scc' option; round-1 uses the user-provided n_t (default 0 when r=0).
    return PrimordialResult(
        A_s=jnp.asarray(params.A_s), n_s=jnp.asarray(params.n_s),
        alpha_s=jnp.asarray(params.alpha_s), k_pivot=jnp.asarray(params.k_pivot),
        r=jnp.asarray(params.r), n_t=jnp.asarray(params.n_t),
        alpha_t=jnp.asarray(params.alpha_t), iso=iso,
    )
