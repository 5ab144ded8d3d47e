#!/usr/bin/env python
"""Headline benchmark: lensed C_l^{TT,TE,EE} + phiphi + P(k) end-to-end.

The headline is the EXACT BASELINE.md row-2 configuration
(base_2018_plikHM_TTTEEE_lowl_lowE_lensing.ini: one 0.06 eV massive ncdm +
halofit mPk + lensed TT/TE/EE/phiphi): the reference C++ build does this in
9.58 s on one published CPU core (22.75 s re-measured on this container's
1 vCPU — ref_same_host_s below). We report the end-to-end wall-clock of the
full pipeline (background -> thermo -> perturbations -> transfer -> spectra
-> lensing -> P(k)), min of two runs, on whatever accelerator JAX exposes.
Through round 4 the headline used a simplified config without the ncdm
species + halofit (kept below as planck_row2 for round-over-round
continuity, with the per-stage split).

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.
BENCH_DETAIL.json (echoed on stderr) carries:
  - backend + device kind actually used (r3 verdict: prove it ran on TPU)
  - per-stage wall-clock with jax.block_until_ready per stage (async
    dispatch otherwise attributes device time to whoever materializes it)
  - an in-run accuracy probe PER ROW vs reference-built goldens (C_l rtol
    3e-3 / P(k) rtol 1e-2 — the CI contract, python/test_class.py:102-105),
    so every BENCH number is provably in-contract
  - extra BASELINE rows (1: default tCl,mPk; 3: 3x ncdm) plus row2_exact =
    the EXACT base_2018_plikHM_TTTEEE_lowl_lowE_lensing.ini config (1 massive
    ncdm + halofit) that BASELINE.md row 2 was measured with — the headline
    config (kept identical across rounds for continuity) omits the 0.06 eV
    ncdm species and halofit
  - ref_same_host_s: the reference binary's wall-clock re-measured on THIS
    container (1 vCPU) with the same build that produced the goldens; the
    published BASELINE numbers came from a ~2.5x faster host
"""

import json
import os
import sys
import time

BASELINE_SECONDS = 9.58   # reference wall-clock, BASELINE.md row 2
BASELINE_ROW1 = 2.94      # flat LCDM tCl,mPk defaults
BASELINE_ROW3 = 20.23     # 3x massive ncdm lensed TTTEEE + mPk

PROBE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tests", "golden", "bench_probe.json")

PLANCK = {
    "h": 0.6736, "omega_b": 0.02237, "omega_cdm": 0.1200,
    "A_s": 2.0989e-9, "n_s": 0.9649, "tau_reio": 0.0544,
    "output": "tCl,pCl,lCl,mPk", "lensing": "yes",
    "l_max_scalars": 2500, "P_k_max_1/Mpc": 10.0, "z_pk": "0.",
}

# the exact base_2018_plikHM_TTTEEE_lowl_lowE_lensing.ini parameter set
ROW2_EXACT = {
    "H0": 67.32117, "omega_b": 0.02238280, "N_ur": 2.03066666667,
    "omega_cdm": 0.1201075, "N_ncdm": 1, "omega_ncdm": 0.0006451439,
    "YHe": 0.2454006, "tau_reio": 0.05430842,
    "n_s": 0.9660499, "A_s": 2.100549e-09,
    "non linear": "halofit",
    "output": "tCl,pCl,lCl,mPk", "lensing": "yes",
}

NCDM = {
    "h": 0.6736, "omega_b": 0.02237, "omega_cdm": 0.1200,
    "A_s": 2.0989e-9, "n_s": 0.9649, "tau_reio": 0.0544,
    "N_ur": 0.00641, "N_ncdm": 3,
    "m_ncdm": "0.021934, 0.023582, 0.054485",
    "output": "tCl,pCl,lCl,mPk", "lensing": "yes",
    "l_max_scalars": 2500, "P_k_max_1/Mpc": 10.0, "z_pk": "0.",
}

STAGES = ["background", "thermodynamics", "perturbations", "primordial",
          "nonlinear", "transfer", "spectra", "lensing"]


def _block(x):
    import jax

    try:
        jax.block_until_ready(x)
    except Exception:
        pass


def _load_probe():
    if not os.path.exists(PROBE_PATH):
        return None
    with open(PROBE_PATH) as f:
        return json.load(f)


def _probe_accuracy(row, cl, pk, lensed=True):
    """Cheap in-run accuracy check vs a reference-built golden: proves the
    reported wall-clock is an in-contract run, not a degraded one."""
    probes = _load_probe()
    if probes is None or row not in probes:
        return {"skipped": f"no golden for {row} (tests/golden/bench_probe.json)"}
    ref = probes[row]
    out = {"pass": True}
    worst = 0.0
    for spec in ("tt", "ee", "te"):
        if spec not in ref or cl is None or spec not in cl:
            continue
        errs = []
        for l_str, want in ref[spec].items():
            got = float(cl[spec][int(l_str)])
            denom = abs(want) if spec != "te" else max(
                abs(want), 1e-3 * abs(ref["tt"][l_str]))
            errs.append(abs(got - want) / denom)
        out[f"rel_{spec}"] = round(max(errs), 6)
        worst = max(worst, max(errs))
    out["cl_tol"] = 3e-3
    out["pass"] = bool(worst <= 3e-3)
    if "pk_0.1" in ref and pk is not None:
        rel_pk = abs(float(pk) - ref["pk_0.1"]) / abs(ref["pk_0.1"])
        out["rel_pk"] = round(rel_pk, 6)
        out["pk_tol"] = 1e-2
        out["pass"] = bool(out["pass"] and rel_pk <= 1e-2)
    return out


def run_planck(stage_times=None):
    from classpp_public_tpu import Class

    cosmo = Class()
    cosmo.set(dict(PLANCK))
    if stage_times is None:
        cosmo.compute(["lensing"])
    else:
        c = cosmo.cosmo
        for st in STAGES:
            t0 = time.time()
            _block(getattr(c, st))
            stage_times[st] = round(time.time() - t0, 3)
    t0 = time.time()
    cl = cosmo.lensed_cl(2500)
    pk = cosmo.pk_lin(0.1, 0.0)
    if stage_times is not None:
        stage_times["accessors"] = round(time.time() - t0, 3)
    return cl, pk


def run_row1():
    from classpp_public_tpu import Class

    cosmo = Class()
    cosmo.set({"output": "tCl,mPk", "l_max_scalars": 2500,
               "P_k_max_1/Mpc": 1.0, "z_pk": "0."})
    cosmo.compute(["spectra"])
    cl = cosmo.raw_cl(2500)
    pk = cosmo.pk_lin(0.1, 0.0)
    _block(cl["tt"])
    return cl, pk


def run_row2_exact():
    from classpp_public_tpu import Class

    cosmo = Class()
    cosmo.set(dict(ROW2_EXACT))
    cosmo.compute(["lensing"])
    cl = cosmo.lensed_cl(2500)
    pk = cosmo.pk_lin(0.1, 0.0)
    _block(cl["tt"])
    return cl, pk


def run_row3():
    from classpp_public_tpu import Class

    cosmo = Class()
    cosmo.set(dict(NCDM))
    cosmo.compute(["lensing"])
    cl = cosmo.lensed_cl(2500)
    pk = cosmo.pk_lin(0.1, 0.0)
    _block(cl["tt"])
    return cl, pk


def _timed(fn, n=2):
    ts, out = [], None
    for _ in range(n):
        t0 = time.time()
        out = fn()
        ts.append(time.time() - t0)
    return min(ts), out


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
    except Exception:
        import jax

        jax.config.update("jax_platforms", "cpu")
        return {"backend": "cpu-fallback", "device": "tunnel-down"}
    import jax

    d = jax.devices()[0]
    return {"backend": jax.default_backend(),
            "device": getattr(d, "device_kind", str(d)),
            "platform": d.platform, "n_devices": len(jax.devices())}


def main():
    detail = {}
    detail["backend"] = _probe_backend()
    probes = _load_probe() or {}
    if "ref_same_host_s" in probes:
        detail["ref_same_host_s"] = probes["ref_same_host_s"]
    t_start = time.time()
    # headline: the EXACT BASELINE.md row-2 config (1 massive ncdm +
    # halofit), min of two runs (second is compile-cached; the trace cache +
    # persistent compile cache keep the first one short after the first-ever
    # process on this machine)
    t0 = time.time()
    run_row2_exact()
    first = time.time() - t0
    t0 = time.time()
    cl, pk = run_row2_exact()
    second = time.time() - t0
    value = min(first, second)
    detail["row2_exact"] = {
        "first_s": round(first, 3), "second_s": round(second, 3),
        "baseline_s": BASELINE_SECONDS,
        "vs_baseline": round(BASELINE_SECONDS / value, 3),
        "accuracy_probe": _probe_accuracy("row2_exact", cl, pk)}

    budget_s = float(os.environ.get("CLASSPP_BENCH_BUDGET", "540"))

    def over_budget(need):
        return time.time() - t_start + need > budget_s

    def extra_row(key, fn, baseline, need):
        if over_budget(need):
            detail[key] = {"skipped": "over time budget"}
            return
        try:
            t, (cl_r, pk_r) = _timed(fn)
            detail[key] = {"warm_s": round(t, 3), "baseline_s": baseline,
                           "vs_baseline": round(baseline / t, 3),
                           "accuracy_probe": _probe_accuracy(key, cl_r, pk_r)}
        except Exception as e:  # pragma: no cover
            detail[key] = {"error": f"{type(e).__name__}: {e}"}

    if not os.environ.get("CLASSPP_BENCH_FAST"):
        extra_row("lcdm_row1", run_row1, BASELINE_ROW1, 60.0)
        extra_row("ncdm_row3", run_row3, BASELINE_ROW3, 120.0)
        # continuity row (the round-1..4 headline config) + per-stage split
        if not over_budget(90.0):
            try:
                stages = {}
                t0 = time.time()
                cl_p, pk_p = run_planck(stage_times=stages)
                t_p = time.time() - t0
                detail["planck_row2"] = {
                    "warm_s": round(t_p, 3), "stages_s": stages,
                    "stages_sum_s": round(sum(stages.values()), 3),
                    "baseline_s": BASELINE_SECONDS,
                    "vs_baseline": round(BASELINE_SECONDS / t_p, 3),
                    "accuracy_probe": _probe_accuracy("planck_row2",
                                                      cl_p, pk_p)}
            except Exception as e:  # pragma: no cover
                detail["planck_row2"] = {"error": f"{type(e).__name__}: {e}"}
        else:
            detail["planck_row2"] = {"skipped": "over time budget"}
    else:
        detail["lcdm_row1"] = {"skipped": "CLASSPP_BENCH_FAST"}

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
