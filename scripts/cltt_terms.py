"""Decomposition of the TT spectrum into physical terms (analog of the
reference scripts/cltt_terms.py): Sachs-Wolfe, early/late ISW, Doppler and
polarization contributions via the `temperature contributions` switches
(perturb_sources :6826-6895).

Run:  python scripts/cltt_terms.py
"""
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from classpp_public_tpu import Class

BASE = {
    "omega_b": 0.02237, "omega_cdm": 0.1200, "h": 0.6736,
    "A_s": 2.0989e-9, "n_s": 0.9649, "tau_reio": 0.0544,
    "output": "tCl", "l_max_scalars": 2500,
}

TERMS = {
    "total": "tsw, eisw, lisw, dop, pol",
    "T-SW": "tsw",
    "early-ISW": "eisw",
    "late-ISW": "lisw",
    "Doppler": "dop",
}

cls = {}
for name, contrib in TERMS.items():
    c = Class()
    c.set(dict(BASE, **{"temperature contributions": contrib}))
    c.compute(["spectra"])
    cls[name] = c.raw_cl(2500)

fig, ax = plt.subplots(figsize=(7, 5))
for name, cl in cls.items():
    ell = cl["ell"][2:]
    dl = ell * (ell + 1) / (2 * np.pi) * cl["tt"][2:]
    ax.loglog(ell, dl, lw=2 if name == "total" else 1, label=name)
ax.set_xlabel(r"$\ell$")
ax.set_ylabel(r"$\ell(\ell+1)C_\ell^{TT}/2\pi$")
ax.legend()
fig.tight_layout()
fig.savefig(__file__.replace(".py", ".png"), dpi=120)
print("wrote", __file__.replace(".py", ".png"))
