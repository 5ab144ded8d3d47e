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


def _cl_table(ell, cl_rows, ct, T_cmb, fmt):
    """Assemble one C_l output table in class or camb format.

    camb format (output_one_line_of_cl, output_module.cpp:1360-1395):
    order TT,EE,BB,TE,dd,dT,dE; temperature columns in [microK]^2, the
    lensing column is the deflection C_l^dd = l(l+1) C_l^pp."""
    fac = ell * (ell + 1.0) / (2.0 * np.pi)
    if fmt == "camb":
        muk2 = (T_cmb * 1.0e6) ** 2
        names = ["l", "TT", "EE", "BB", "TE", "dd", "dT", "dE"]
        cols = [fac * muk2 * cl_rows[:, ct["tt"]],
                fac * muk2 * cl_rows[:, ct["ee"]],
                fac * muk2 * cl_rows[:, ct["bb"]],
                fac * muk2 * cl_rows[:, ct["te"]],
                ell * (ell + 1.0) * fac * cl_rows[:, ct["pp"]],
                np.sqrt(ell * (ell + 1.0)) * fac * T_cmb * 1.0e6 * cl_rows[:, ct["tp"]],
                np.sqrt(ell * (ell + 1.0)) * fac * T_cmb * 1.0e6 * cl_rows[:, ct["ep"]]]
    else:
        names = ["l", "TT", "EE", "TE", "BB", "phiphi", "TPhi", "Ephi"]
        cols = [fac * cl_rows[:, ct[n]] for n in ["tt", "ee", "te", "bb", "pp", "tp", "ep"]]
    return names, np.column_stack([ell] + cols)


def _nc_columns(cosmo, ell):
    """Number-count / lensing / cross C_l columns zero-padded onto the file's
    l grid, in the reference column order: dd, (td), pd, ll, (tl), dl
    (output_module.cpp:1278-1340 column titles)."""
    names, cols = [], []
    fac = ell * (ell + 1.0) / (2.0 * np.pi)

    def pad(row, ell_nc):
        arr = np.zeros_like(ell)
        n = min(len(row), len(ell))
        # both grids start at l=2 and step by 1
        arr[: len(ell_nc[:n])] = np.asarray(row)[:n]
        return arr * fac

    out = cosmo.out
    if out.has_nc:
        nc = cosmo.number_counts
        ell_nc = np.asarray(nc.ell, dtype=float)
        if out.nCl:
            for p, (i, j) in enumerate(nc.dd_pairs):
                names.append(f"dens[{i + 1}]-dens[{j + 1}]")
                cols.append(pad(nc.dd[p], ell_nc))
        ncx = None
        if out.nCl and out.lCl and out.has_cls:
            ncx = cosmo.nc_cross
            for b in range(len(out.selection_mean)):
                names.append(f"phi-dens[{b + 1}]")
                cols.append(pad(ncx.pd[b], np.asarray(ncx.ell, dtype=float)))
        if out.sCl:
            for p, (i, j) in enumerate(nc.dd_pairs):
                names.append(f"lens[{i + 1}]-lens[{j + 1}]")
                cols.append(pad(nc.ll[p], ell_nc))
        if out.nCl and out.sCl:
            nd = out.non_diagonal
            for p, (i, j) in enumerate(nc.dl_pairs):
                if abs(i - j) <= nd:
                    names.append(f"dens[{i + 1}]-lens[{j + 1}]")
                    cols.append(pad(nc.dl[p], ell_nc))
    return names, cols


def output_cl(cosmo, root: str, lensed: bool = True, fmt: str = "class"):
    """Write raw (and lensed) [l(l+1)/2pi] C_l tables (output_cl :214);
    fmt='camb' switches to CAMB/HealPix units and column order (:1227)."""
    from ..models.spectra import CT_TYPES

    T_cmb = float(cosmo.params.T_cmb)
    unit = "[microK]^2" if fmt == "camb" else "dimensionless"
    if cosmo.out.has_cls:
        sp = cosmo.spectra
        ct = {n: i for i, n in enumerate(CT_TYPES)}
        ell = np.asarray(sp.ell, dtype=float)
        names, data = _cl_table(ell, np.asarray(sp.cl), ct, T_cmb, fmt)
    else:
        # nCl/sCl-only run: the file covers l=2..l_lss_max
        ell = np.arange(2.0, cosmo.out.l_lss_max + 1.0)
        names, data = ["l"], ell[:, None]
    nc_names, nc_cols = _nc_columns(cosmo, ell)
    if nc_cols:
        names = list(names) + nc_names
        data = np.column_stack([data] + nc_cols)
    _write_table(Path(root + "cl.dat"),
                 [f"{unit} total [l(l+1)/2pi] C_l's",
                  f"for l=2 to {int(ell[-1])}"], names, data)

    if cosmo.out.has_cls and "t" in cosmo.out.modes:
        # per-mode files when md_size > 1 (output_cl, output_module.cpp
        # :300-330): cls.dat = scalar sum over ics, clt.dat = tensor
        sp = cosmo.spectra
        cl_t = np.asarray(sp.cl_tensor) if sp.cl_tensor is not None \
            else np.zeros_like(np.asarray(sp.cl))
        for rows, nm, label in [(np.asarray(sp.cl) - cl_t, "cls", "scalar"),
                                (cl_t, "clt", "tensor")]:
            names_m, data_m = _cl_table(ell, rows, ct, T_cmb, fmt)
            _write_table(Path(root + f"{nm}.dat"),
                         [f"{unit} [l(l+1)/2pi] C_l's for {label} mode",
                          f"for l=2 to {int(ell[-1])}"], names_m, data_m)

    if cosmo.out.has_cls and getattr(cosmo.spectra, "cl_pairs", None):
        # per-ic-pair files when ic_size > 1 (output_module.cpp:340-470):
        # cls_ad.dat, cls_cdi.dat, cls_ad_cdi.dat, ... Off-diagonal files
        # hold the raw symmetrized cross (the total counts it twice).
        from ..ops.splines import spline_d2, spline_eval
        import jax.numpy as jnp

        IC_LABEL = {"ad": "adiabatic (AD)", "bi": "baryon isocurvature (BI)",
                    "cdi": "CDM isocurvature (CDI)",
                    "nid": "neutrino density isocurvature (NID)",
                    "niv": "neutrino velocity isocurvature (NIV)"}
        sp = cosmo.spectra
        l_f = jnp.asarray(sp.l_list, jnp.float64)
        for (n1, n2), rows in sp.cl_pairs.items():
            d2 = spline_d2(l_f, jnp.asarray(rows))
            vals = np.asarray(spline_eval(l_f, jnp.asarray(rows), d2,
                                          jnp.asarray(ell)))
            if n1 == n2:
                suffix, label = n1, f"scalar {IC_LABEL[n1]} mode"
            else:
                suffix = f"{n1}_{n2}"
                label = (f"scalar cross {IC_LABEL[n1].split(' (')[1][:-1]}"
                         f"x{IC_LABEL[n2].split(' (')[1][:-1]} mode")
            names_i, data_i = _cl_table(ell, vals, ct, T_cmb, fmt)
            _write_table(Path(root + f"cls_{suffix}.dat"),
                         [f"{unit} [l(l+1)/2pi] C_l's for {label}",
                          f"for l=2 to {int(ell[-1])}"], names_i, data_i)

    if lensed and cosmo.out.lensing:
        le = cosmo.lensing
        ell = np.asarray(le.ell, dtype=float)
        names, data = _cl_table(ell, np.asarray(le.cl), ct, T_cmb, fmt)
        _write_table(Path(root + "cl_lensed.dat"),
                     [f"{unit} total lensed [l(l+1)/2pi] C_l's",
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
        pert = cosmo.perturbations
        if getattr(pert, "sources_iso", None):
            # per-ic-pair linear P(k) files (output_module.cpp:670-795):
            # z*_pk_ad.dat = P_ad, z*_pk_ad_cdi.dat = the CROSS entry, which
            # the reference stores logarithmically as the correlation-angle
            # cosine and its writer then exponentiates — reproduced verbatim
            # (exp(cos theta_12) * h^3), quirk and all.
            from .nonlinear import pair_primordial_pk, pk_ic_deltas

            bg, _ = cosmo.background
            pm = cosmo.primordial
            ds = {n: np.asarray(v) for n, v in
                  pk_ic_deltas(pert, bg, float(z)).items()}
            k = np.asarray(pert.k)
            fac = 2.0 * np.pi**2 / k**3
            names = list(ds)
            pk_diag = {n: fac * np.asarray(pair_primordial_pk(pm, n, n, k))
                       * ds[n] ** 2 for n in names}
            for i1, n1 in enumerate(names):
                for i2 in range(i1, len(names)):
                    n2 = names[i2]
                    if n1 == n2:
                        col = np.interp(k_h * h, k, pk_diag[n1]) * h**3
                        sfx, label = n1, f"for {n1.upper()} mode"
                    else:
                        p12 = pair_primordial_pk(pm, n1, n2, k)
                        if p12 is None:
                            continue
                        cross = fac * np.asarray(p12) * ds[n1] * ds[n2]
                        cos12 = cross / np.sqrt(pk_diag[n1] * pk_diag[n2])
                        col = np.exp(np.interp(k_h * h, k, cos12)) * h**3
                        sfx = f"{n1}_{n2}"
                        label = f"for cross {n1.upper()}x{n2.upper()} mode"
                    _write_table(
                        Path(f"{root}z{iz + 1}_pk_{sfx}.dat"),
                        [f"Matter power spectrum P(k) {label} "
                         f"at redshift z={z}",
                         "for k=... in h/Mpc, P in (Mpc/h)^3"],
                        ["k (h/Mpc)", "P (Mpc/h)^3"],
                        np.column_stack([k_h, col]))


def output_tk(cosmo, root: str, fmt: str = "class"):
    """Write transfer functions per requested redshift (reference output_tk,
    output_module.cpp:832). fmt='camb': columns -T_i/k^2 with k in 1/Mpc,
    order cdm, b, g, ur, ncdm, tot (perturb_output_data camb branch,
    perturbations_module.cpp:289-299)."""
    from ..classy import Class

    shim = Class.__new__(Class)
    shim._cosmo = cosmo
    shim.parameters_changed = False
    for iz, z in enumerate(cosmo.out.z_pk):
        tk = Class.get_transfer(shim, z=float(z))
        if fmt == "camb":
            k = np.asarray(tk["k (h/Mpc)"]) * cosmo.params.h   # 1/Mpc
            k2 = k * k
            zero = np.zeros_like(k)

            def col(name):
                return -np.asarray(tk[name]) / k2 if name in tk else zero

            names = ["k (h/Mpc)", "-T_cdm/k2", "-T_b/k2", "-T_g/k2",
                     "-T_ur/k2", "-T_ncdm/k2", "-T_tot/k2"]
            data = np.column_stack([tk["k (h/Mpc)"], col("d_cdm"), col("d_b"),
                                    col("d_g"), col("d_ur"), col("d_ncdm[0]"),
                                    col("d_tot")])
            header = [f"Rescaled matter transfer functions [-T_i(k)/k^2] at redshift z={z}",
                      "The rescaling factor [-1/k^2] with k in 1/Mpc matches the CMBFAST/CAMB convention"]
        else:
            names = list(tk.keys())
            data = np.column_stack([tk[n] for n in names])
            header = [f"Transfer functions T_i(k) at redshift z={z}",
                      "for k in h/Mpc (class format: gauge-dependent species "
                      "fractions + gauge-invariant d_m/d_cb)"]
        _write_table(Path(f"{root}z{iz + 1}_tk.dat"), header, names, data)


def output_perturbations(shim, root: str):
    """Write perturbations_k{i}_s.dat files for each requested
    k_output_values entry (reference perturb_output files,
    perturbations_module.cpp:2797 + output_module.cpp)."""
    per_k = shim.get_perturbations()["scalar"]
    for i, d in enumerate(per_k):
        names = list(d.keys())
        rows = []
        ntau = len(d["tau [Mpc]"])
        for n in names:
            v = np.asarray(d[n], dtype=float)
            rows.append(np.full(ntau, v) if v.ndim == 0 else v)
        _write_table(Path(f"{root}perturbations_k{i}_s.dat"),
                     [f"scalar perturbations for k = {float(d['k (1/Mpc)']):.6g} 1/Mpc"],
                     names, np.column_stack(rows))


def output_primordial(cosmo, root: str):
    """Write primordial_Pk.dat: dimensionless P_s(k), P_t(k)
    (output_module.cpp primordial file)."""
    pert = cosmo.perturbations
    pm = cosmo.primordial
    k = np.asarray(pert.k)
    pk_s = np.asarray(pm.scalar_pk(k))
    pk_t = np.asarray(pm.tensor_pk(k))
    _write_table(Path(root + "primordial_Pk.dat"),
                 ["Dimensionless primordial spectrum, equal to [k^3/2pi^2] P(k)"],
                 ["k [1/Mpc]", "P_scalar(k)", "P_tensor(k)"],
                 np.column_stack([k, pk_s, pk_t]))


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
