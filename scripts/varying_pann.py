"""Effect of DM annihilation on the CMB (analog of the reference
scripts/varying_pann.py): vary p_ann = <sigma v>/m and plot the TT/EE
response — energy injection delays recombination and damps the peaks
while boosting large-angle EE.

Run:  python scripts/varying_pann.py
"""
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from classpp_public_tpu import Class

PANNS = [0.0, 1.0e-7, 1.0e-6]      # m^3/s/kg
BASE = {
    "omega_b": 0.02237, "omega_cdm": 0.1200, "h": 0.6736,
    "A_s": 2.0989e-9, "n_s": 0.9649, "tau_reio": 0.0544,
    "output": "tCl,pCl,lCl", "lensing": "yes", "l_max_scalars": 2500,
}

results = {}
for pann in PANNS:
    c = Class()
    c.set(dict(BASE, annihilation=pann))
    c.compute(["lensing"])
    results[pann] = c.lensed_cl(2500)

fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
cl0 = results[0.0]
ell = cl0["ell"][2:]
for pann in PANNS:
    cl = results[pann]
    ax1.semilogx(ell, cl["tt"][2:] / cl0["tt"][2:],
                 label=rf"$p_{{\rm ann}}$={pann:g}")
    ax2.semilogx(ell, cl["ee"][2:] / cl0["ee"][2:],
                 label=rf"$p_{{\rm ann}}$={pann:g}")
ax1.set_xlabel(r"$\ell$"); ax1.set_ylabel("TT ratio")
ax2.set_xlabel(r"$\ell$"); ax2.set_ylabel("EE ratio")
ax1.legend(); ax2.legend()
fig.tight_layout()
fig.savefig(__file__.replace(".py", ".png"), dpi=120)
print("wrote", __file__.replace(".py", ".png"))
