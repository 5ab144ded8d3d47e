#!/usr/bin/env python
"""Example external primordial-spectrum command with tensors: prints
"k P_s(k) P_t(k)" per line (r = 0.1 with the slow-roll consistency tilt)."""
import math
import sys

A_s, n_s, k_pivot, r = 2.100549e-9, 0.9660499, 0.05, 0.1
n_t = -r / 8.0 * (2.0 - r / 8.0 - n_s)

k_min, k_max, per_dec = float(sys.argv[1]), float(sys.argv[2]), float(sys.argv[3])
n = max(int(math.log10(k_max / k_min) * per_dec) + 1, 2)
for i in range(n):
    k = k_min * (k_max / k_min) ** (i / (n - 1))
    ps = A_s * (k / k_pivot) ** (n_s - 1.0)
    pt = r * A_s * (k / k_pivot) ** n_t
    print(f"{k:.18e} {ps:.18e} {pt:.18e}")
