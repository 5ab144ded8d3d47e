"""Massive-neutrino effect on P(k) (analog of scripts/neutrinohierarchy.py):
ratio of linear spectra for 3 degenerate massive neutrinos vs massless."""
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from classpp_public_tpu import Class

base = {"h": 0.676, "omega_b": 0.0224, "omega_cdm": 0.120,
        "output": "mPk", "P_k_max_1/Mpc": 3.0, "z_pk": "0."}

c0 = Class(); c0.set(dict(base)); c0.compute(["perturbations"])
c1 = Class(); c1.set(dict(base, N_ncdm=3, m_ncdm="0.02, 0.02, 0.02",
                          N_ur=0.00641)); c1.compute(["perturbations"])

ks = np.geomspace(1e-3, 2.0, 150)
r = np.array([c1.pk_lin(k, 0.0) / c0.pk_lin(k, 0.0) for k in ks])
fig, ax = plt.subplots(figsize=(6, 4))
ax.semilogx(ks, r)
ax.axhline(1.0, color="k", lw=0.5)
ax.set_xlabel(r"$k$ [1/Mpc]")
ax.set_ylabel(r"$P^{\nu}(k)/P(k)$")
fig.tight_layout()
fig.savefig(__file__.replace(".py", ".png"), dpi=120)
print("suppression at k=1/Mpc:", r[np.argmin(np.abs(ks-1.0))])
print("wrote", __file__.replace(".py", ".png"))
