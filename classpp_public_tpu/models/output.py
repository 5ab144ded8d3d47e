"""Output files (reference OutputModule, source/output_module.cpp).

Writes <root>cl.dat, <root>cl_lensed.dat, <root>z*_pk(_nl).dat, background and
thermodynamics tables in the reference's 'class' format (headers + column
layout compatible with plot_CLASS_output.m and the notebooks).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _write_table(path, header_lines, col_names, data):
    with open(path, "w") as f:
        for line in header_lines:
            f.write(f"# {line}\n")
        cols = "".join(f"{i + 1}:{n:<24s}" for i, n in enumerate(col_names))
        f.write(f"# {cols}\n")
        np.savetxt(f, data, fmt="% .12e")


def output_cl(cosmo, root: str, lensed: bool = True):
    """Write raw (and lensed) [l(l+1)/2pi] C_l tables (output_cl :214)."""
    from ..models.spectra import CT_TYPES

    cl = cosmo if isinstance(cosmo, dict) else None
    sp = cosmo.spectra
    ell = np.asarray(sp.ell, dtype=float)
    fac = ell * (ell + 1.0) / (2.0 * np.pi)
    names = ["l", "TT", "EE", "TE", "BB", "phiphi", "TPhi", "Ephi"]
    order = ["tt", "ee", "te", "bb", "pp", "tp", "ep"]
    ct = {n: i for i, n in enumerate(CT_TYPES)}
    data = np.column_stack([ell] + [fac * np.asarray(sp.cl[:, ct[n]]) for n in order])
    _write_table(Path(root + "cl.dat"),
                 ["dimensionless total [l(l+1)/2pi] C_l's",
                  f"for l=2 to {int(ell[-1])}"], names, data)

    if lensed and cosmo.out.lensing:
        le = cosmo.lensing
        ell = np.asarray(le.ell, dtype=float)
        fac = ell * (ell + 1.0) / (2.0 * np.pi)
        data = np.column_stack([ell] + [fac * np.asarray(le.cl[:, ct[n]]) for n in order])
        _write_table(Path(root + "cl_lensed.dat"),
                     ["dimensionless total lensed [l(l+1)/2pi] C_l's",
                      f"for l=2 to {int(ell[-1])}"], names, data)


def output_pk(cosmo, root: str):
    """Write P(k) per requested redshift, CLASS units (h/Mpc, (Mpc/h)^3)."""
    nl = cosmo.nonlinear
    h = cosmo.params.h
    k_h = np.asarray(nl.k) / h
    for iz, z in enumerate(np.asarray(nl.z)):
        for tab, suffix in [(nl.pk_lin, "pk"), (nl.pk_nl, "pk_nl")]:
            if suffix == "pk_nl" and cosmo.out.non_linear not in ("halofit", "hmcode"):
                continue
            pk = np.asarray(tab[iz]) * h**3
            _write_table(Path(f"{root}z{iz + 1}_{suffix}.dat"),
                         [f"Matter power spectrum P(k) at redshift z={z}",
                          "for k=... in h/Mpc, P in (Mpc/h)^3"],
                         ["k (h/Mpc)", "P (Mpc/h)^3"],
                         np.column_stack([k_h, pk]))


def output_tk(cosmo, root: str):
    """Write transfer functions per requested redshift, class format
    (reference output_tk, output_module.cpp:832)."""
    from ..classy import Class

    shim = Class.__new__(Class)
    shim._cosmo = cosmo
    shim.parameters_changed = False
    for iz, z in enumerate(cosmo.out.z_pk):
        tk = Class.get_transfer(shim, z=float(z))
        names = list(tk.keys())
        data = np.column_stack([tk[n] for n in names])
        _write_table(Path(f"{root}z{iz + 1}_tk.dat"),
                     [f"Transfer functions T_i(k) at redshift z={z}",
                      "for k in h/Mpc (class format: gauge-dependent species "
                      "fractions + gauge-invariant d_m/d_cb)"],
                     names, data)


def output_background(cosmo, root: str):
    bg, bidx = cosmo.background
    t = np.asarray(bg.table)
    z = 1.0 / t[:, bidx["a"]] - 1.0
    cols = ["z", "proper time [Gyr]", "conf. time [Mpc]", "H [1/Mpc]",
            "comov. dist.", "ang.diam.dist.", "lum. dist.", "comov.snd.hrz.",
            "(.)rho_g", "(.)rho_b", "(.)rho_cdm", "(.)rho_lambda", "(.)rho_ur",
            "(.)rho_crit", "gr.fac. D", "gr.fac. f"]
    data = np.column_stack([
        z, t[:, bidx["time"]], np.asarray(bg.tau_of_loga), t[:, bidx["H"]],
        t[:, bidx["conf_distance"]], t[:, bidx["ang_distance"]],
        t[:, bidx["lum_distance"]], t[:, bidx["rs"]],
        t[:, bidx["rho_g"]], t[:, bidx["rho_b"]], t[:, bidx["rho_cdm"]],
        t[:, bidx["rho_lambda"]], t[:, bidx["rho_ur"]], t[:, bidx["rho_crit"]],
        t[:, bidx["D"]], t[:, bidx["f"]],
    ])[::-1]
    _write_table(Path(root + "background.dat"),
                 ["Table of selected background quantities",
                  "All densities are multiplied by (8piG/3)"], cols, data)


def output_thermodynamics(cosmo, root: str):
    th = cosmo.thermodynamics
    cols = ["z", "x_e", "kappa' [Mpc^-1]", "Tb [K]", "c_b^2"]
    data = np.column_stack([
        np.asarray(th.z_grid), np.asarray(th.xe_of_z), np.asarray(th.dkappa_of_z),
        np.asarray(th.Tb_of_z), np.asarray(th.cb2_of_z),
    ])
    _write_table(Path(root + "thermodynamics.dat"),
                 ["Table of selected thermodynamics quantities"], cols, data)
