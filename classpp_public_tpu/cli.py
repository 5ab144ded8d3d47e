"""Command-line interface: `python -m classpp_public_tpu params.ini [prec.pre]`.

Mirrors the reference CLI (main/class.cpp:9-24): parse the .ini (+ optional
precision file), run the requested pipeline stages, write .dat outputs under
the `root` prefix.
"""

from __future__ import annotations

import sys
import time


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m classpp_public_tpu params.ini [precision.pre]")
        return 1

    from .classy import Class
    from .config.ini import read_config
    from .models import output as om

    pars = read_config(argv[0], argv[1] if len(argv) > 1 else None)
    root = pars.pop("root", "output/run_")

    cosmo = Class()
    cosmo.set(pars)
    t0 = time.time()
    want_cls = "Cl" in pars.get("output", "tCl")
    cosmo.compute(["lensing"] if want_cls else ["nonlinear"])
    print(f"pipeline computed in {time.time() - t0:.2f} s")

    c = cosmo.cosmo
    fmt = str(pars.get("format", "class")).strip().lower()
    if fmt not in ("class", "camb"):
        raise SystemExit(f"unknown format {fmt!r} (class or camb)")
    if want_cls:
        om.output_cl(c, root, fmt=fmt)
    if c.out.has_pk:
        c.nonlinear
        om.output_pk(c, root)
    if c.out.dTk or c.out.vTk:
        om.output_tk(c, root, fmt=fmt)
    if getattr(cosmo, "_k_output_values", ()):
        om.output_perturbations(cosmo, root)
    if pars.get("write background", "no").lower() in ("yes", "y", "true"):
        om.output_background(c, root)
    if pars.get("write primordial", "no").lower() in ("yes", "y", "true"):
        om.output_primordial(c, root)
    if pars.get("write thermodynamics", "no").lower() in ("yes", "y", "true"):
        om.output_thermodynamics(c, root)
    if pars.get("write parameters", "no").lower() in ("yes", "y", "true"):
        # <root>parameters.ini (input_module.cpp:475-493): the list of
        # input/precision parameters actually read, re-usable as an input
        # file. The reference also writes <root>unused_parameters; here
        # unknown keys are a hard error at Class.set, so that file is
        # always empty — written anyway for drop-in parity.
        with open(root + "parameters.ini", "w") as f:
            f.write("# List of input/precision parameters actually read\n")
            f.write("# (all other parameters set to default values)\n")
            f.write("# This file can be used as the input file of another "
                    "run\n#\n")
            for k, v in pars.items():
                f.write(f"{k} = {v}\n")
            f.write(f"root = {root}\n")
        with open(root + "unused_parameters", "w") as f:
            f.write("# List of input/precision parameters passed but not "
                    "used\n")
            f.write("# (unknown parameters are a hard error here, so this "
                    "list is always empty)\n")
    print(f"output written under {root}*")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
