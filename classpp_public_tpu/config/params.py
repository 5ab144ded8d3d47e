"""Cosmological parameter set.

TPU-native analog of the reference's `background`/`thermo`/`perturbs`/... input
structs filled by InputModule (reference source/input_module.h:32-41). Here the
user-facing cosmology lives in one frozen dataclass registered as a JAX pytree,
so the whole pipeline is differentiable w.r.t. it and jit-cacheable on its
static fields.

Densities follow CLASS conventions: omega_x = Omega_x h^2; internal "class
units" densities are (8 pi G/3) rho / c^2 in Mpc^-2.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .. import constants as const


def _pytree_dataclass(cls):
    """Register a frozen dataclass as a pytree; float fields are leaves, the
    rest (ints/strings/bools/tuples-of-static) are aux data."""
    cls = dataclass(frozen=True)(cls)
    float_fields = [f.name for f in dataclasses.fields(cls)
                    if f.metadata.get("leaf", True) and f.type == "float"]
    static_fields = [f.name for f in dataclasses.fields(cls) if f.name not in float_fields]

    def flatten(obj):
        children = tuple(getattr(obj, n) for n in float_fields)
        aux = tuple(getattr(obj, n) for n in static_fields)
        return children, aux

    def unflatten(aux, children):
        kwargs = dict(zip(float_fields, children))
        kwargs.update(dict(zip(static_fields, aux)))
        return cls(**kwargs)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    cls._leaf_fields = tuple(float_fields)
    return cls


@_pytree_dataclass
class CosmoParams:
    """User-level cosmological parameters (reference explanatory.ini semantics)."""

    # background. Defaults replicate the reference's built-in
    # `input_default_params` (input_module.cpp:3150-3400): the Planck 2013+WP
    # best fit with massless neutrinos and h raised to 0.67556 to keep
    # 100*theta_s = 1.042143 (comment at input_module.cpp:3168-3182) — NOT the
    # Planck-2018 values, so an unpinned run reproduces the reference binary.
    h: float = 0.67556               # input_module.cpp:3183
    T_cmb: float = 2.7255            # K (:3185)
    omega_b: float = 0.022032        # Omega_b h^2 (:3192)
    omega_cdm: float = 0.12038       # Omega_cdm h^2 (:3193)
    N_ur: float = 3.046              # effective number of massless neutrinos
    Omega_k: float = 0.0
    # dark energy: cosmological constant by default; CLP fluid if w0 != -1 or wa != 0
    w0_fld: float = -1.0
    wa_fld: float = 0.0
    use_fld: bool = False            # if True, close budget with fld instead of Lambda
    # fluid equation of state: "CLP" (w0 + wa(1-a)) or "EDE" (early dark
    # energy tracker, eq. 10-11 of 1706.00730; background_module.cpp:612)
    fluid_eos: str = "CLP"
    Omega_EDE: float = 0.0           # EDE plateau amplitude (input :1314)
    cs2_fld: float = 1.0
    pk_eq: bool = False              # Pk_equal halofit extension for (w0,wa)
                                     # models (nonlinear_module.cpp:4064)
    use_ppf: bool = False            # PPF formalism (reference default yes;
                                     # here opt-in: non-PPF matches it away
                                     # from w = -1 crossings)
    c_gamma_over_c_fld: float = 0.4
    # massive neutrinos / ncdm (round-1: degenerate species described by mass list)
    m_ncdm: Tuple[float, ...] = ()   # masses in eV (one per species)
    deg_ncdm: Tuple[float, ...] = () # degeneracy per species (default 1)
    T_ncdm: Tuple[float, ...] = ()   # per-species T_ncdm/T_cmb (default 0.71611)
    ksi_ncdm: Tuple[float, ...] = ()       # chemical potential / T (default 0)
    ncdm_psd_files: Tuple[str, ...] = ()   # per-species tabulated f0(q) file
                                           # ("" = analytic FD), 2 columns
                                           # q, f0 in reference units
                                           # (psd_FD_single.dat format)
    # momentum-grid strategy (reference 'Quadrature strategy' 0-3 /
    # 'Number of momentum bins' / 'Maximum q', tools/quadrature.c:69,
    # non_cold_dark_matter.cpp:600-660). Empty tuple = default rule
    # (16-node Gauss-Laguerre; 32 for non-standard PSDs). All species share
    # one static-shape node set, so mixed strategies are rejected — see
    # models.background.ncdm_q_rule.
    ncdm_quadrature_strategy: Tuple[int, ...] = ()
    ncdm_input_q_size: Tuple[int, ...] = ()
    ncdm_maximum_q: Tuple[float, ...] = ()
    # decaying ncdm -> dark radiation (this fork's DNCDM species,
    # tools/non_cold_dark_matter.cpp decay_dr_map_): the LAST
    # N_ncdm_decay_dr entries of the ncdm tuples are decay species (the
    # reference appends them the same way, :376). Gamma in km/s/Mpc.
    N_ncdm_decay_dr: int = 0
    Gamma_dncdm: Tuple[float, ...] = ()    # one per decay species
    Omega_dncdmdr: Tuple[float, ...] = ()  # per-species (rho_dncdm+rho_dr)/
                                           # rho_crit today target (0 = use
                                           # deg as given; input :3715)
    # decaying cold dark matter -> dark radiation (reference
    # background_module.cpp dcdm block + tools/dark_radiation.cpp).
    # Either Omega_ini_dcdm ("would-be" Omega today without decay) or
    # Omega_dcdmdr (today's Omega_dcdm + Omega_dr) fixes the initial density;
    # Gamma_dcdm is the decay rate in km/s/Mpc (input_module.cpp:860-910)
    Omega_ini_dcdm: float = 0.0
    Omega_dcdmdr: float = 0.0

    # scalar-field dark energy (quintessence): V = (phi-B)^alpha + A times
    # exp(-lambda phi); scf_parameters = (lambda, alpha, A, B, phi_ini,
    # phi_prime_ini), the tuning entry is shot for to hit Omega_scf
    # (background_module.cpp:2065-2150, input_module.cpp:1322-1366)
    Omega_scf: float = 0.0           # >0 target; <0 means "close the budget"
    scf_parameters: Tuple[float, ...] = ()
    scf_tuning_index: int = 0
    attractor_ic_scf: bool = True
    Gamma_dcdm: float = 0.0

    # primordial (analytic power law; defaults input_module.cpp:3328-3331)
    A_s: float = 2.215e-09
    n_s: float = 0.9619
    alpha_s: float = 0.0
    k_pivot: float = 0.05            # 1/Mpc
    # tensor defaults (input_module.cpp:3375-3378): r = 1 with the slow-roll
    # self-consistency tilt n_t = -r/8 (2 - r/8 - n_s) and running
    # alpha_t = r/8 (r/8 + n_s - 1) evaluated at the default (r, n_s);
    # classy.set() re-derives them for user-supplied r/n_s ('scc')
    r: float = 1.0                   # tensor-to-scalar ratio
    n_t: float = -0.1141375          # = -1/8 (2 - 1/8 - 0.9619)
    alpha_t: float = 0.0108625       # = 1/8 (1/8 + 0.9619 - 1)
    # neutrino treatment in the tensor hierarchy ('tensor method',
    # input_module.cpp:2911-2920): photons | massless | exact
    tensor_method: str = "massless"

    # thermodynamics
    YHe: Optional[float] = None      # None => BBN table interpolation
    # reference default reionization: reio_z mode at z_reio = 11.357
    # (input_module.cpp:3228-3230 sets reio_z_or_tau=reio_z, z_reio=11.357,
    # tau_reio=0.0925). z_reio is not None here, so it wins; classy.set()
    # nulls it when the user pins tau_reio instead.
    tau_reio: float = 0.0925
    z_reio: Optional[float] = 11.357  # alternative to tau_reio
    reio_parametrization: str = "reio_camb"
    reionization_exponent: float = 1.5
    reionization_width: float = 0.5
    helium_fullreio_redshift: float = 3.5
    helium_fullreio_width: float = 0.5
    # binned / multi-jump / interpolated reionization histories
    # (input_module.cpp:1469-1487; profiles at thermodynamics_module.cpp:1958)
    binned_reio_z: Tuple[float, ...] = ()
    binned_reio_xe: Tuple[float, ...] = ()
    binned_reio_step_sharpness: float = 0.3
    many_tanh_z: Tuple[float, ...] = ()
    many_tanh_xe: Tuple[float, ...] = ()
    many_tanh_width: float = 0.5
    reio_inter_z: Tuple[float, ...] = ()
    reio_inter_xe: Tuple[float, ...] = ()

    # interacting dark matter <-> dark radiation (ETHOS; input :822-1010)
    Omega_idm_dr: float = 0.0
    xi_idr: float = 0.0              # T_idr / T_cmb
    stat_f_idr: float = 0.875        # 7/8 fermionic
    a_idm_dr: float = 0.0            # scattering amplitude [1/Mpc]
    b_idr: float = 0.0               # idr self-interaction amplitude
    nindex_idm_dr: float = 4.0       # ETHOS power-law index
    m_idm: float = 1.0e11            # idm mass [eV] (input_module.cpp:3260)
    idr_nature: str = "free_streaming"   # or "fluid"
    # ETHOS per-l angular coefficients for the l>=2 idr collision damping
    # (input_module.cpp:988-1031): entries for l = 2..l_max_idr; shorter
    # lists are padded by repeating the last entry, () = all 1.5 (default)
    alpha_idm_dr: Tuple[float, ...] = ()
    beta_idr: Tuple[float, ...] = ()

    # DM energy injection (thermodynamics_module.cpp:1755; input :3240-3248)
    annihilation: float = 0.0        # <sigma v>/m_dm [m^3/s/kg]
    decay: float = 0.0               # Gamma_dm [1/s]
    annihilation_variation: float = 0.0
    annihilation_z: float = 1000.0
    annihilation_zmax: float = 2500.0
    annihilation_zmin: float = 30.0
    annihilation_f_halo: float = 0.0
    annihilation_z_halo: float = 30.0
    # on-the-spot energy deposition; False enables the delayed-deposition
    # redshift convolution (thermodynamics_energy_injection, :1810-1870)
    on_the_spot: bool = True

    # temperature contributions (tsw, eisw, lisw, dop, pol) switches and the
    # early/late ISW split redshift (perturb_sources :6826-6895; input
    # "temperature contributions" / "early/late isw redshift")
    temp_contributions: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0, 1.0)
    eisw_lisw_split_z: float = 120.0

    # fixed physics options (static / hashable)
    gauge: str = "synchronous"       # or "newtonian"
    recombination: str = "recfast"

    @property
    def H0(self) -> float:
        """H0 in 1/Mpc."""
        return self.h * const.H0_h_to_inv_Mpc

    @property
    def Omega0_g(self) -> float:
        return const.rho_gamma_class_units(self.T_cmb) / (self.H0 * self.H0)

    @property
    def Omega0_b(self) -> float:
        return self.omega_b / (self.h * self.h)

    @property
    def Omega0_cdm(self) -> float:
        return self.omega_cdm / (self.h * self.h)

    @property
    def Omega0_ur(self) -> float:
        return self.N_ur * const.ur_over_g_factor * self.Omega0_g

    @property
    def N_ncdm(self) -> int:
        return len(self.m_ncdm)

    def T_ncdm_of(self, i: int) -> float:
        # 0.71611 is the CLASS default accounting for non-instantaneous decoupling
        return self.T_ncdm[i] if i < len(self.T_ncdm) else 0.71611

    def deg_ncdm_of(self, i: int) -> float:
        return self.deg_ncdm[i] if i < len(self.deg_ncdm) else 1.0

    def gamma_dncdm_of(self, i: int) -> float:
        """Decay rate [km/s/Mpc] of GLOBAL ncdm species i (0 = stable).
        Decay species occupy the last N_ncdm_decay_dr slots."""
        j = i - (self.N_ncdm - self.N_ncdm_decay_dr)
        if 0 <= j < len(self.Gamma_dncdm):
            return self.Gamma_dncdm[j]
        return 0.0

    @property
    def N_eff(self) -> float:
        """Effective relativistic species count in the early universe:
        N_ur plus each (then-relativistic) ncdm species weighted by
        deg*(T_ncdm/(4/11)^{1/3})^4 times its massless-limit density integral
        relative to standard FD (reference NonColdDarkMatter::GetNeff,
        tools/non_cold_dark_matter.cpp:1010 — the rho integral carries the
        full f0, so chemical potential / tabulated PSDs boost Neff, e.g.
        ksi != 0 by 1 + 30/7 (ksi/pi)^2 + 15/7 (ksi/pi)^4). Used for the BBN
        YHe table lookup."""
        t_std = (4.0 / 11.0) ** (1.0 / 3.0)
        psd_nonstd = any(getattr(self, "ksi_ncdm", ()) or ()) \
            or any(getattr(self, "ncdm_psd_files", ()) or ())
        if self.N_ncdm and psd_nonstd:
            import math

            import numpy as np

            from ..models.background import ncdm_psd_weights

            qn, wn, _ = ncdm_psd_weights(self, 256, gauss=False)
            I0 = 7.0 * math.pi**4 / 120.0
            fac = [float(np.sum(qn**3 * wn[i])) / I0
                   for i in range(self.N_ncdm)]
        else:
            fac = [1.0] * self.N_ncdm
        return self.N_ur + sum(
            self.deg_ncdm_of(i) * (self.T_ncdm_of(i) / t_std) ** 4 * fac[i]
            for i in range(self.N_ncdm))

    def replace(self, **kw) -> "CosmoParams":
        return dataclasses.replace(self, **kw)
