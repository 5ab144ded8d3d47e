"""Transfer functions at one instant (analog of the reference
scripts/one_time.py): all species' density transfer functions T_i(k) at
recombination, showing the baryon acoustic oscillations frozen into the
baryons and the smooth cdm envelope.

Run:  python scripts/one_time.py
"""
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from classpp_public_tpu import Class

c = Class()
c.set({
    "omega_b": 0.02237, "omega_cdm": 0.1200, "h": 0.6736,
    "A_s": 2.0989e-9, "n_s": 0.9649, "tau_reio": 0.0544,
    "output": "mTk", "P_k_max_1/Mpc": 10.0, "z_pk": "1089.",
})
c.compute(["perturbations"])
tk = c.get_transfer(z=1089.0)
k = tk["k (h/Mpc)"]

fig, ax = plt.subplots(figsize=(7, 5))
for name in ("d_g", "d_b", "d_cdm", "d_ur"):
    ax.loglog(k, np.abs(tk[name]), label=name)
ax.set_xlabel(r"$k\ [h/{\rm Mpc}]$")
ax.set_ylabel(r"$|\delta_i(k, z_{\rm rec})|$")
ax.set_title("transfer functions at recombination")
ax.legend()
fig.tight_layout()
fig.savefig(__file__.replace(".py", ".png"), dpi=120)
print("wrote", __file__.replace(".py", ".png"))
