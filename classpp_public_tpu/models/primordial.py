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
import numpy as np

from ..config.params import CosmoParams


class PrimordialResult(NamedTuple):
    A_s: jnp.ndarray
    n_s: jnp.ndarray
    alpha_s: jnp.ndarray
    k_pivot: jnp.ndarray
    r: jnp.ndarray
    n_t: jnp.ndarray
    alpha_t: jnp.ndarray
    iso: dict = None          # {ic: (f_amp, n_index[, alpha_run])} isocurvature
    external: tuple = None    # (lnk, lnP_s, lnP_t) tabulated external spectrum
    iso_corr: dict = None     # {(ic1, ic2): (c_12, n_12, alpha_12)} correlations

    def _amp_tilt_run(self, ic):
        """Diagonal (amplitude, tilt, running) per ic
        (primordial_analytic_spectrum_init, primordial_module.cpp:675-758)."""
        if ic == "ad":
            return self.A_s, self.n_s, self.alpha_s
        ent = self.iso[ic]
        f, n = ent[0], ent[1]
        a = ent[2] if len(ent) > 2 else 0.0
        return self.A_s * f**2, n, a

    def iso_pk(self, ic, k):
        """P_iso(k) = A_s f_i^2 (k/k*)^{n_i - 1 + alpha_i/2 ln(k/k*)}."""
        amp, n, a = self._amp_tilt_run(ic)
        lnk = jnp.log(k / self.k_pivot)
        return amp * jnp.exp((n - 1.0) * lnk + 0.5 * a * lnk**2)

    def cross_pk(self, ic1, ic2, k):
        """Correlated ic1 x ic2 spectrum (primordial_module.cpp:860-890):
        amplitude sqrt(A1 A2) c_12, tilt (n1+n2)/2 + n_12, running
        (a1+a2)/2 + alpha_12. Returns None when the pair is uncorrelated."""
        key = (ic1, ic2) if (ic1, ic2) in (self.iso_corr or {}) else (ic2, ic1)
        if not self.iso_corr or key not in self.iso_corr:
            return None
        c, n12, a12 = self.iso_corr[key]
        if c == 0.0:
            return None
        A1, n1, a1 = self._amp_tilt_run(ic1)
        A2, n2, a2 = self._amp_tilt_run(ic2)
        amp = np.sqrt(A1 * A2) * c
        tilt = 0.5 * (n1 + n2) + n12
        run = 0.5 * (a1 + a2) + a12
        lnk = jnp.log(k / self.k_pivot)
        return amp * jnp.exp((tilt - 1.0) * lnk + 0.5 * run * lnk**2)

    def scalar_pk(self, k):
        """Dimensionless curvature spectrum P_R(k) (primordial_module.cpp:69)."""
        if self.external is not None:
            lnk_t, lnp_s, _ = self.external
            return jnp.exp(jnp.interp(jnp.log(k), lnk_t, lnp_s))
        lnk = jnp.log(k / self.k_pivot)
        return self.A_s * jnp.exp((self.n_s - 1.0) * lnk + 0.5 * self.alpha_s * lnk**2)

    def tensor_pk(self, k):
        if self.external is not None and self.external[2] is not None:
            lnk_t, _, lnp_t = self.external
            return jnp.exp(jnp.interp(jnp.log(k), lnk_t, lnp_t))
        lnk = jnp.log(k / self.k_pivot)
        return self.r * self.A_s * jnp.exp(self.n_t * lnk + 0.5 * self.alpha_t * lnk**2)


def external_spectrum(command: str):
    """Run an external P(k) generator command and tabulate its output
    (reference primordial_external_spectrum_init, primordial_module.cpp:3022:
    command prints lines "k P_s(k) [P_t(k)]")."""
    import subprocess

    out = subprocess.run(command, shell=True, capture_output=True, text=True, check=True)
    rows = [[float(v) for v in line.split()] for line in out.stdout.splitlines() if line.strip()]
    arr = jnp.asarray(rows)
    lnk = jnp.log(arr[:, 0])
    lnp_s = jnp.log(arr[:, 1])
    lnp_t = jnp.log(arr[:, 2]) if arr.shape[1] > 2 else None
    return (lnk, lnp_s, lnp_t)


def compute_primordial(params: CosmoParams, iso: dict = None,
                       external: tuple = None,
                       iso_corr: dict = None) -> PrimordialResult:
    # tensor tilt: inflationary consistency n_t = -r/8 (1 - n_s/... ) is the
    # 'scc' option; round-1 uses the user-provided n_t (default 0 when r=0).
    # host numpy scalars, NOT device arrays: downstream stages read these with
    # float(...) (a per-scalar round-trip on remote accelerators) and pass
    # them into jitted calls (where numpy scalars are equally valid operands)
    return PrimordialResult(
        A_s=np.float64(params.A_s), n_s=np.float64(params.n_s),
        alpha_s=np.float64(params.alpha_s), k_pivot=np.float64(params.k_pivot),
        r=np.float64(params.r), n_t=np.float64(params.n_t),
        alpha_t=np.float64(params.alpha_t), iso=iso, external=external,
        iso_corr=iso_corr,
    )
