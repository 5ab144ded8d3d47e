#!/usr/bin/env python
"""Headline benchmark: lensed C_l^{TT,TE,EE} + phiphi + linear P(k) end-to-end.

Mirrors BASELINE.md row 2 (Planck-2018-like lensed TT/TE/EE + mPk): the
reference C++ build does this in 9.58 s on one CPU core. We report the
end-to-end wall-clock of the full pipeline (background -> thermo ->
perturbations -> transfer -> spectra -> lensing -> P(k)), second run
(compile-cached), on whatever accelerator JAX exposes.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.
A per-stage breakdown plus extra BASELINE rows (1: default tCl+mPk,
3: 3x ncdm) is written to BENCH_DETAIL.json and echoed on stderr.
"""

import json
import os
import sys
import time

BASELINE_SECONDS = 9.58   # reference wall-clock, BASELINE.md row 2
BASELINE_ROW1 = 2.94      # flat LCDM tCl,mPk defaults
BASELINE_ROW3 = 20.23     # 3x massive ncdm lensed TTTEEE + mPk

# The package enables a persistent XLA compile cache by default (repo-local
# .xla_cache, see classpp_public_tpu/__init__.py): entries are produced and
# consumed on this same machine, so the cross-machine AOT concern does not
# apply, and a cold *process* only pays compile the first time a program
# shape is ever seen on this host. first_s below is tracked explicitly so a
# compile-time regression is visible in BENCH_DETAIL.json.

PLANCK = {
    "h": 0.6736, "omega_b": 0.02237, "omega_cdm": 0.1200,
    "A_s": 2.0989e-9, "n_s": 0.9649, "tau_reio": 0.0544,
    "output": "tCl,pCl,lCl,mPk", "lensing": "yes",
    "l_max_scalars": 2500, "P_k_max_1/Mpc": 10.0, "z_pk": "0.",
}


def run_planck(stage_times=None):
    from classpp_public_tpu import Class

    cosmo = Class()
    cosmo.set(dict(PLANCK))
    if stage_times is None:
        cosmo.compute(["lensing"])
    else:
        c = cosmo.cosmo
        order = ["background", "thermodynamics", "perturbations", "primordial",
                 "nonlinear", "transfer", "spectra", "lensing"]
        for st in order:
            t0 = time.time()
            getattr(c, st)
            stage_times[st] = round(time.time() - t0, 3)
    cl = cosmo.lensed_cl(2500)
    pk = cosmo.pk_lin(0.1, 0.0)
    return cl["tt"][2500], pk


def run_row1():
    from classpp_public_tpu import Class

    cosmo = Class()
    cosmo.set({"output": "tCl,mPk", "l_max_scalars": 2500,
               "P_k_max_1/Mpc": 1.0, "z_pk": "0."})
    cosmo.compute(["spectra"])
    cl = cosmo.raw_cl(2500)
    return cl["tt"][2500]


def run_row3():
    from classpp_public_tpu import Class

    cosmo = Class()
    cosmo.set({
        "h": 0.6736, "omega_b": 0.02237, "omega_cdm": 0.1200,
        "A_s": 2.0989e-9, "n_s": 0.9649, "tau_reio": 0.0544,
        "N_ur": 0.00641, "N_ncdm": 3,
        "m_ncdm": "0.021934, 0.023582, 0.054485",
        "output": "tCl,pCl,lCl,mPk", "lensing": "yes",
        "l_max_scalars": 2500, "P_k_max_1/Mpc": 10.0, "z_pk": "0.",
    })
    cosmo.compute(["lensing"])
    return cosmo.lensed_cl(2500)["tt"][2500]


def _timed(fn, n=2):
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def _probe_backend(timeout_s=150):
    """The remote-TPU (axon) platform HANGS indefinitely inside
    jax.devices() when its tunnel is down — probe it in a subprocess with a
    timeout and fall back to CPU so the bench always emits a parseable
    result instead of timing out (BENCH rc:124)."""
    import subprocess

    try:
        subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print(jax.default_backend())"],
            timeout=timeout_s, check=True, capture_output=True)
        return "default"
    except Exception:
        import jax

        jax.config.update("jax_platforms", "cpu")
        return "cpu-fallback"


def main():
    detail = {}
    detail["backend"] = _probe_backend()
    t_start = time.time()
    # headline: Planck row 2, min of two runs (second is compile-cached)
    t0 = time.time()
    run_planck()
    first = time.time() - t0
    stages = {}
    t0 = time.time()
    run_planck(stage_times=stages)
    second = time.time() - t0
    value = min(first, second)
    detail["planck_row2"] = {"first_s": round(first, 3), "second_s": round(second, 3),
                             "stages_s": stages, "baseline_s": BASELINE_SECONDS}

    # extra rows only if the headline left budget: row 3 (ncdm) compiles a
    # fresh solver-head family (~minutes cold) and must never push the whole
    # bench past the driver's wall-clock cap — the headline metric is row 2
    budget_s = float(os.environ.get("CLASSPP_BENCH_BUDGET", "540"))

    def over_budget(need):
        return time.time() - t_start + need > budget_s

    # Extra rows change the k/tau grid shapes, so each pays fresh compiles
    # (measured ~70 s for row 1 and worse for row 3's ncdm solver heads even
    # with the persistent cache) — 2.5x/10x the warm runtime badly
    # underestimated that and blew the driver's wall-clock cap (rc 124).
    # Budget them at their measured compile-inclusive cost instead.
    if not os.environ.get("CLASSPP_BENCH_FAST") and not over_budget(150.0):
        try:
            t = _timed(run_row1)
            detail["lcdm_row1"] = {"warm_s": round(t, 3), "baseline_s": BASELINE_ROW1,
                                   "vs_baseline": round(BASELINE_ROW1 / t, 3)}
        except Exception as e:  # pragma: no cover
            detail["lcdm_row1"] = {"error": f"{type(e).__name__}: {e}"}
        # row 3 compiles new (ncdm) solver heads: needs a much bigger margin
        if not over_budget(400.0):
            try:
                t = _timed(run_row3)
                detail["ncdm_row3"] = {"warm_s": round(t, 3), "baseline_s": BASELINE_ROW3,
                                       "vs_baseline": round(BASELINE_ROW3 / t, 3)}
            except Exception as e:  # pragma: no cover
                detail["ncdm_row3"] = {"error": f"{type(e).__name__}: {e}"}
        else:
            detail["ncdm_row3"] = {"skipped": "over time budget"}
    else:
        detail["lcdm_row1"] = {"skipped": "over time budget"}

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps(detail, indent=1), file=sys.stderr)

    print(json.dumps({
        "metric": "lensed_cl_TTTEEE_pk_end_to_end_wallclock",
        "value": round(value, 3),
        "unit": "seconds",
        "vs_baseline": round(BASELINE_SECONDS / value, 3),
    }))


if __name__ == "__main__":
    main()
