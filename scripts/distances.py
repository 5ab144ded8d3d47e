"""Background distances vs redshift (analog of scripts/distances.py):
luminosity, angular-diameter and comoving distances for three cosmologies.
"""
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from classpp_public_tpu import Class

fig, ax = plt.subplots(figsize=(6, 4))
for label, extra in [("flat", {}), ("open $\\Omega_k=0.05$", {"Omega_k": 0.05}),
                     ("$w_0=-0.9$", {"Omega_Lambda": 0.0, "w0_fld": -0.9,
                                     "wa_fld": 0.0, "cs2_fld": 1.0})]:
    c = Class()
    c.set(dict({"h": 0.676, "omega_b": 0.0224, "omega_cdm": 0.120,
                "output": "mPk", "P_k_max_1/Mpc": 0.1}, **extra))
    c.compute(["background"])
    zs = np.linspace(0.01, 3.0, 100)
    dl = [c.luminosity_distance(z) for z in zs]
    ax.plot(zs, dl, label=label)
ax.set_xlabel("z")
ax.set_ylabel(r"$d_L$ [Mpc]")
ax.legend()
fig.tight_layout()
fig.savefig(__file__.replace(".py", ".png"), dpi=120)
print("wrote", __file__.replace(".py", ".png"))
