"""Evolution of one Fourier mode through the epochs (analog of the
reference scripts/one_k.py): request k_output_values and plot the
photon/baryon/cdm density contrasts and the metric potentials against
conformal time, marking horizon crossing and recombination.

Run:  python scripts/one_k.py
"""
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from classpp_public_tpu import Class

K = 0.5  # 1/Mpc

c = Class()
c.set({
    "omega_b": 0.02237, "omega_cdm": 0.1200, "h": 0.6736,
    "A_s": 2.0989e-9, "n_s": 0.9649, "tau_reio": 0.0544,
    "output": "tCl,mPk", "P_k_max_1/Mpc": 1.0, "z_pk": "0.",
    "k_output_values": f"{K}",
})
c.compute(["perturbations"])
pt = c.get_perturbations()["scalar"][0]
tau = pt["tau [Mpc]"]

th = c.get_thermodynamics()
# conformal time at recombination (max of the visibility function)
gi = np.argmax(th["g [Mpc^-1]"])
tau_rec = np.interp(th["z"][gi], th["z"][::-1], th["conf. time [Mpc]"][::-1])

fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(7, 8), sharex=True)
for name in ("delta_g", "delta_b", "delta_cdm"):
    ax1.loglog(tau, np.abs(pt[name]), label=name)
ax1.axvline(1.0 / K, ls=":", c="k", label=r"$\tau = 1/k$")
ax1.axvline(tau_rec, ls="--", c="gray", label=r"$\tau_{\rm rec}$")
ax1.set_ylabel(r"$|\delta_i|$"); ax1.legend(fontsize=8)
for name in ("phi", "psi"):
    if name in pt:
        ax2.semilogx(tau, pt[name], label=name)
ax2.axvline(1.0 / K, ls=":", c="k")
ax2.axvline(tau_rec, ls="--", c="gray")
ax2.set_xlabel(r"$\tau$ [Mpc]"); ax2.set_ylabel("metric")
ax2.legend(fontsize=8)
fig.tight_layout()
fig.savefig(__file__.replace(".py", ".png"), dpi=120)
print("wrote", __file__.replace(".py", ".png"))
