#!/usr/bin/env python
"""Convert reference CLASS .dat outputs into compressed .npz golden files.

Usage: python convert.py <src_dir> <prefix> <dst.npz>

Each .dat file becomes two entries in the npz:
  <name>          : (nrow, ncol) float64 data
  <name>__cols    : array of column-name strings parsed from the header
where <name> is the filename with prefix and .dat stripped.
"""
import re
import sys
from pathlib import Path

import numpy as np


def parse_dat(path: Path):
    cols = []
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                # header lines like "#  1:z   2:proper time [Gyr] ..."
                m = re.findall(r"\d+:([^\s][^:]*?)(?=\s+\d+:|\s*$)", line)
                if m and ":" in line:
                    cols = [c.strip() for c in m]
            else:
                break
    data = np.loadtxt(path)
    return data, cols


def main():
    src, prefix, dst = Path(sys.argv[1]), sys.argv[2], Path(sys.argv[3])
    out = {}
    for p in sorted(src.glob(prefix + "*.dat")):
        name = p.name[len(prefix):-len(".dat")]
        data, cols = parse_dat(p)
        out[name] = data
        out[name + "__cols"] = np.array(cols)
    np.savez_compressed(dst, **out)
    print(f"wrote {dst} with {len(out)//2} tables: {[k for k in out if not k.endswith('__cols')]}")


if __name__ == "__main__":
    main()
