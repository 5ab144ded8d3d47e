"""Minimal end-to-end run (analog of the reference scripts/warmup.py):
compute lensed C_l's and P(k) for a Planck-like LambdaCDM cosmology and
save a figure next to this script.

Run:  python scripts/warmup.py        (first run pays jit compile)
"""
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from classpp_public_tpu import Class

params = {
    "h": 0.6736, "omega_b": 0.02237, "omega_cdm": 0.1200,
    "A_s": 2.0989e-9, "n_s": 0.9649, "tau_reio": 0.0544,
    "output": "tCl,pCl,lCl,mPk", "lensing": "yes",
    "l_max_scalars": 2500, "P_k_max_1/Mpc": 10.0, "z_pk": "0.",
}

cosmo = Class()
cosmo.set(params)
cosmo.compute(["lensing"])

cl = cosmo.lensed_cl(2500)
ell = cl["ell"][2:]
dl = ell * (ell + 1) / (2 * np.pi) * cl["tt"][2:]

ks = np.geomspace(1e-4, 3.0, 200)
pk = np.array([cosmo.pk_lin(k, 0.0) for k in ks])

fig, (a1, a2) = plt.subplots(1, 2, figsize=(10, 4))
a1.plot(ell, dl)
a1.set_xlabel(r"$\ell$")
a1.set_ylabel(r"$\ell(\ell+1)C_\ell^{TT}/2\pi$")
a1.set_xscale("log")
a2.loglog(ks, pk)
a2.set_xlabel(r"$k$ [1/Mpc]")
a2.set_ylabel(r"$P(k)$ [Mpc$^3$]")
fig.tight_layout()
fig.savefig(__file__.replace(".py", ".png"), dpi=120)
print("sigma8 =", cosmo.sigma8())
print("wrote", __file__.replace(".py", ".png"))
