#!/usr/bin/env python
"""CPU — a CLASS Plotting Utility (classpp_public_tpu re-implementation).

Superimpose spectra files, or plot their ratio, straight from the command
line (reference CPU.py interface; rebuilt from scratch around the class
output-file headers this package writes).

Examples:
    python CPU.py out/lcdm_z1_pk.dat out/ncdm_z1_pk.dat
    python CPU.py out/lcdm_cl_lensed.dat out/other_cl_lensed.dat -r
    python CPU.py out/run_cl.dat -y TT EE --scale loglog
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np


def extract_headers(path):
    """Column names from the '# 1:name1  2:name2 ...' header line the class
    format writes (reference output_module headers)."""
    names = []
    with open(path) as f:
        for line in f:
            if not line.startswith("#"):
                break
            m = re.findall(r"(\d+):([^\s][^:]*?)(?=\s+\d+:|\s*$)", line)
            if m:
                names = [c.strip() for _, c in m]
    return names


def parser():
    p = argparse.ArgumentParser(
        description="CPU, a CLASS Plotting Utility: superimpose spectra "
                    "files or plot their ratio.")
    p.add_argument("files", nargs="+", help="data files (class format)")
    p.add_argument("-r", "--ratio", action="store_true",
                   help="plot ratios against the first file")
    p.add_argument("-y", "--y-axis", nargs="+", default=[],
                   help="column names to plot (default: all but the first)")
    p.add_argument("-x", "--x-axis", type=str, default=None,
                   help="x column name (default: first column)")
    p.add_argument("--scale", type=str, default="lin",
                   choices=["lin", "loglog", "loglin", "george"],
                   help="axis scaling")
    p.add_argument("--xlim", nargs="+", type=float, default=[])
    p.add_argument("--ylim", nargs="+", type=float, default=[])
    p.add_argument("-p", "--print", dest="printfile", default="",
                   help="save the figure (path, or '.' for <file>.pdf)")
    p.add_argument("--repeat", action="store_true",
                   help=argparse.SUPPRESS)
    return p


def load(path):
    names = extract_headers(path)
    data = np.loadtxt(path)
    if not names:
        names = [f"col{i}" for i in range(data.shape[1])]
    return names, data


def main(argv=None):
    args = parser().parse_args(argv)
    import matplotlib

    if args.printfile:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    tables = [load(f) for f in args.files]
    names0, data0 = tables[0]
    xcol = args.x_axis or names0[0]
    ycols = args.y_axis or [n for n in names0[1:]]

    fig, ax = plt.subplots(figsize=(9, 5))
    if args.ratio:
        x0 = data0[:, names0.index(xcol)]
        for (names, data), fname in list(zip(tables, args.files))[1:]:
            x = data[:, names.index(xcol)]
            for yc in ycols:
                if yc not in names or yc not in names0:
                    continue
                ref = np.interp(x, x0, data0[:, names0.index(yc)])
                with np.errstate(divide="ignore", invalid="ignore"):
                    ax.plot(x, data[:, names.index(yc)] / ref - 1.0,
                            label=f"{os.path.basename(fname)} {yc}")
        ax.set_ylabel("relative difference")
    else:
        for (names, data), fname in zip(tables, args.files):
            x = data[:, names.index(xcol)]
            for yc in ycols:
                if yc not in names:
                    continue
                ax.plot(x, data[:, names.index(yc)],
                        label=f"{os.path.basename(fname)} {yc}")
    if args.scale == "loglog":
        ax.set_xscale("log")
        ax.set_yscale("log")
    elif args.scale in ("loglin", "george"):
        ax.set_xscale("log")
    if args.xlim:
        ax.set_xlim(*args.xlim[:2])
    if args.ylim:
        ax.set_ylim(*args.ylim[:2])
    ax.set_xlabel(xcol)
    ax.legend(fontsize=8)
    fig.tight_layout()
    if args.printfile:
        out = args.printfile
        if out == ".":
            out = os.path.splitext(args.files[-1])[0] + ".pdf"
        fig.savefig(out)
        print(f"saved {out}")
    else:
        plt.show()
    return 0


if __name__ == "__main__":
    sys.exit(main())
