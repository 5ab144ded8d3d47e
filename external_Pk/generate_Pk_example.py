#!/usr/bin/env python
"""Example external primordial-spectrum command: tilted power law.

Usage (invoked by the primordial module): generate_Pk_example.py k_min k_max
k_per_decade. Prints "k P_s(k)" per line, k in 1/Mpc.
"""
import math
import sys

A_s, n_s, k_pivot = 2.100549e-9, 0.9660499, 0.05

k_min, k_max, per_dec = float(sys.argv[1]), float(sys.argv[2]), float(sys.argv[3])
n = max(int(math.log10(k_max / k_min) * per_dec) + 1, 2)
for i in range(n):
    k = k_min * (k_max / k_min) ** (i / (n - 1))
    print(f"{k:.18e} {A_s * (k / k_pivot) ** (n_s - 1.0):.18e}")
