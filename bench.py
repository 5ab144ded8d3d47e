#!/usr/bin/env python
"""Headline benchmark: lensed C_l^{TT,TE,EE} + phiphi + linear P(k) end-to-end.

Mirrors BASELINE.md row 2 (Planck-2018-like lensed TT/TE/EE + mPk): the
reference C++ build does this in 9.58 s on one CPU core. We report the
end-to-end wall-clock of the full pipeline (background -> thermo ->
perturbations -> transfer -> spectra -> lensing -> P(k)), second run
(compile-cached), on whatever accelerator JAX exposes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

BASELINE_SECONDS = 9.58  # reference wall-clock, BASELINE.md row 2

# NOTE: no persistent XLA compile cache here: under remote-compile setups the
# host-CPU stages produce AOT artifacts targeted at the compile machine, and
# reloading them on this machine is unsafe (SIGILL risk). The reported value
# is min(first, second) so in-process jit reuse already removes compile time.


def run_once():
    from classpp_public_tpu import Class

    cosmo = Class()
    cosmo.set({
        "h": 0.6736, "omega_b": 0.02237, "omega_cdm": 0.1200,
        "A_s": 2.0989e-9, "n_s": 0.9649, "tau_reio": 0.0544,
        "output": "tCl,pCl,lCl,mPk", "lensing": "yes",
        "l_max_scalars": 2500, "P_k_max_1/Mpc": 10.0, "z_pk": "0.",
    })
    cosmo.compute(["lensing"])
    cl = cosmo.lensed_cl(2500)
    pk = cosmo.pk_lin(0.1, 0.0)
    return cl["tt"][2500], pk


def main():
    t0 = time.time()
    run_once()
    first = time.time() - t0

    t0 = time.time()
    run_once()
    second = time.time() - t0

    value = min(first, second)
    print(json.dumps({
        "metric": "lensed_cl_TTTEEE_pk_end_to_end_wallclock",
        "value": round(value, 3),
        "unit": "seconds",
        "vs_baseline": round(BASELINE_SECONDS / value, 3),
    }))


if __name__ == "__main__":
    main()
