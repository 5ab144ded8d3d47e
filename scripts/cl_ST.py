"""Scalar vs tensor C_l (analog of scripts/cl_ST.py)."""
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from classpp_public_tpu import Class

c = Class()
c.set({"h": 0.676, "omega_b": 0.0224, "omega_cdm": 0.120,
       "tau_reio": 0.054, "output": "tCl,pCl,lCl", "lensing": "yes",
       "modes": "s,t", "r": 0.1, "n_t": "scc",
       "l_max_scalars": 1500, "l_max_tensors": 500})
c.compute(["lensing"])
cl = c.lensed_cl(1500)
ell = cl["ell"][2:]
fac = ell * (ell + 1) / (2 * np.pi)
fig, ax = plt.subplots(figsize=(6, 4))
for name in ["tt", "ee", "bb"]:
    ax.loglog(ell, fac * np.abs(cl[name][2:]), label=name.upper())
ax.set_xlabel(r"$\ell$")
ax.set_ylabel(r"$\ell(\ell+1)C_\ell/2\pi$")
ax.legend()
fig.tight_layout()
fig.savefig(__file__.replace(".py", ".png"), dpi=120)
print("wrote", __file__.replace(".py", ".png"))
