"""Growth through the epochs (analog of the reference
scripts/many_times.py): the matter density transfer function at a ladder
of redshifts, showing the BAO wiggles and the scale-dependent growth
suppression before matter domination.

Run:  python scripts/many_times.py
"""
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from classpp_public_tpu import Class

ZS = [0.0, 1.0, 3.0, 10.0, 30.0, 100.0, 300.0, 1000.0]

c = Class()
c.set({
    "omega_b": 0.02237, "omega_cdm": 0.1200, "h": 0.6736,
    "A_s": 2.0989e-9, "n_s": 0.9649, "tau_reio": 0.0544,
    "output": "mTk", "P_k_max_1/Mpc": 10.0,
    "z_pk": ", ".join(str(z) for z in ZS),
})
c.compute(["perturbations"])

fig, ax = plt.subplots(figsize=(7, 5))
cmap = plt.get_cmap("viridis")
for i, z in enumerate(ZS):
    tk = c.get_transfer(z=z)
    ax.loglog(tk["k (h/Mpc)"], np.abs(tk["d_m"]),
              color=cmap(i / (len(ZS) - 1)), label=f"z={z:g}")
ax.set_xlabel(r"$k\ [h/{\rm Mpc}]$")
ax.set_ylabel(r"$|\delta_m(k, z)|$")
ax.legend(fontsize=8, ncol=2)
fig.tight_layout()
fig.savefig(__file__.replace(".py", ".png"), dpi=120)
print("wrote", __file__.replace(".py", ".png"))
