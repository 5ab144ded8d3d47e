"""Recombination history (analog of scripts/thermo.py): free-electron
fraction x_e(z) and visibility for RECFAST vs HyRec."""
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from classpp_public_tpu import Class

fig, ax = plt.subplots(figsize=(6, 4))
for reco in ["RECFAST", "HyRec"]:
    c = Class()
    c.set({"h": 0.676, "omega_b": 0.0224, "omega_cdm": 0.120,
           "tau_reio": 0.054, "recombination": reco,
           "output": "tCl", "l_max_scalars": 100})
    c.compute(["thermodynamics"])
    th = c.get_thermodynamics()
    sel = th["z"] < 3000
    ax.semilogy(th["z"][sel], th["x_e"][sel], label=reco)
ax.set_xlabel("z")
ax.set_ylabel(r"$x_e$")
ax.legend()
fig.tight_layout()
fig.savefig(__file__.replace(".py", ".png"), dpi=120)
print("wrote", __file__.replace(".py", ".png"))
