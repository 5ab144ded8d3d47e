"""Static state-vector layout for scalar perturbations.

TPU-native redesign of the reference's dynamically-resized perturbation vector
(perturb_vector_init, perturbations_module.cpp:3271-4696): instead of growing/
shrinking the ODE state at approximation switches, the state has one fixed
maximal layout; slots inactive under the current approximation (e.g. the
photon hierarchy during tight coupling) simply carry zero derivative and are
re-initialized by a remap at the switch (see equations.remap_*). Fixed shapes
are what allow the whole k-grid to integrate in lockstep under vmap.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PtIdx:
    """Index layout, parametrized by hierarchy truncations (precision params
    l_max_g, l_max_pol_g, l_max_ur, l_max_ncdm; include/precisions.h:209-215)
    and the ncdm phase-space discretization (species x momentum x multipole)."""

    l_max_g: int = 12
    l_max_pol_g: int = 10
    l_max_ur: int = 17
    has_ur: bool = True
    n_ncdm: int = 0
    q_size_ncdm: int = 16
    # momentum-node rule behind q_size_ncdm (background.ncdm_q_rule):
    # Gauss-Laguerre nodes, or a linear [0, q_max] trapezoid grid when the
    # input forces 'Quadrature strategy' 2/3
    q_gauss: bool = True
    q_max_ncdm: float = 32.0
    l_max_ncdm: int = 17
    has_fld: bool = False
    # "synchronous" | "newtonian" (reference ppt->gauge): in newtonian gauge
    # the state gains theta_cdm (perturbations_module.cpp:3369) and the eta
    # slot holds the Bardeen potential phi (:3479)
    gauge: str = "synchronous"
    # sign of the spatial curvature (reference pba->sgnK): 0 flat, -1 open,
    # +1 closed; static so the trig/hyperbolic branch is resolved at trace time
    sgnK: int = 0
    # decaying cold dark matter -> dark radiation (delta+theta for dcdm and a
    # dr hierarchy F_0..F_lmax; reference perturb_vector_init :3380-3390)
    has_dcdm: bool = False
    l_max_dr: int = 17
    # decay-collision cutoff: dncdm source terms feed the dr hierarchy only
    # for l <= l_max_dr_col (precisions.h:212, perturbations :8498)
    l_max_dr_col: int = 17
    # scalar-field dark energy (quintessence) perturbations
    has_scf: bool = False
    # PPF formalism for the fld (Hu 2008): one Gamma variable in the
    # delta_fld slot, constrained delta/theta (perturb :6484-6570)
    use_ppf: bool = False
    # interacting dark matter <-> dark radiation (ETHOS; perturb :8252-8620)
    has_idm_dr: bool = False
    l_max_idr: int = 17
    idr_fluid: bool = False      # idr_nature = fluid: no shear/hierarchy
    # ETHOS per-l angular coefficients for the l>=2 idr collision damping
    # (alpha_idm_dr/beta_idr lists, input_module.cpp:988-1031): entries for
    # l = 2..l_max_idr, shorter lists padded with their last entry; () means
    # the all-1.5 reference default. Static so the damping vector is a
    # trace-time constant.
    alpha_idm_dr: tuple = ()
    beta_idr: tuple = ()

    def idr_damping_coeffs(self):
        """(alpha_l, beta_l) tuples of length l_max_idr-1 (l = 2..l_max)."""
        n = self.l_max_idr - 1

        def pad(t):
            t = tuple(float(x) for x in t) or (1.5,)
            return (t + (t[-1],) * (n - len(t)))[:n]

        return pad(self.alpha_idm_dr), pad(self.beta_idr)
    # decaying ncdm -> dr: the LAST n_dncdm ncdm species decay; each gets a
    # dark-radiation hierarchy F_0..F_l_max_dr after the ncdm block
    # (reference index_pt_F0_dr_species, perturbations_module.cpp:3384)
    n_dncdm: int = 0
    # background-table column of rho_dr_ncdm0 (static: used to slice the
    # per-species [rho_dr, lnfdec, dsep] column blocks at trace time)
    dec_col0: int = -1
    # N-body gauge transfer functions (1811.00904): shift the delta/theta
    # source outputs by the H_T' terms. NOTE: the reference's own
    # implementation is unreachable — it force-enables k2gamma_Nb whose
    # branch class_stops ("not yet propagated", perturbations_module.cpp
    # :6926) — so this is implemented from the paper, with the (aH/k^2)
    # factor Eq. A.3 requires (the reference's dormant code drops the 1/k^2)
    nbody: bool = False

    # --- photons
    @property
    def delta_g(self):
        return 0

    @property
    def theta_g(self):
        return 1

    @property
    def shear_g(self):
        return 2

    @property
    def F_g(self):  # F_g[l] for l=3..l_max_g lives at F_g + (l-3)
        return 3

    @property
    def n_F_g(self):
        return self.l_max_g - 2  # l = 3..l_max_g

    @property
    def G_g(self):  # polarization G_l, l=0..l_max_pol_g
        return self.F_g + self.n_F_g - 1 + 1

    @property
    def n_G_g(self):
        return self.l_max_pol_g + 1

    # --- baryons / cdm
    @property
    def delta_b(self):
        return self.G_g + self.n_G_g

    @property
    def theta_b(self):
        return self.delta_b + 1

    @property
    def delta_cdm(self):
        return self.theta_b + 1

    @property
    def theta_cdm(self):
        # newtonian gauge only (synchronous fixes theta_cdm = 0)
        return self.delta_cdm + 1

    @property
    def n_theta_cdm(self):
        return 1 if self.gauge == "newtonian" else 0

    # --- massless neutrinos
    @property
    def delta_ur(self):
        return self.delta_cdm + 1 + self.n_theta_cdm

    @property
    def theta_ur(self):
        return self.delta_ur + 1

    @property
    def shear_ur(self):
        return self.theta_ur + 1

    @property
    def F_ur(self):  # l=3..l_max_ur
        return self.shear_ur + 1

    @property
    def n_F_ur(self):
        return self.l_max_ur - 2

    # --- dcdm + dr (after the ur block)
    @property
    def delta_dcdm(self):
        return self.F_ur + self.n_F_ur

    @property
    def theta_dcdm_pt(self):
        return self.delta_dcdm + 1

    @property
    def F_dr(self):   # dr hierarchy F_l, l=0..l_max_dr (density-weighted)
        return self.delta_dcdm + 2

    @property
    def n_F_dr(self):
        return self.l_max_dr + 1 if self.has_dcdm else 0

    @property
    def n_dcdm_dr(self):
        return (2 + self.n_F_dr) if self.has_dcdm else 0

    # --- interacting dark matter + dark radiation (after dcdm/dr)
    @property
    def delta_idm_dr(self):
        return self.F_ur + self.n_F_ur + self.n_dcdm_dr

    @property
    def theta_idm_dr_pt(self):
        return self.delta_idm_dr + 1

    @property
    def delta_idr(self):
        return self.delta_idm_dr + 2

    @property
    def theta_idr(self):
        return self.delta_idm_dr + 3

    @property
    def shear_idr(self):
        return self.delta_idm_dr + 4

    @property
    def F_idr(self):     # l=3..l_max_idr
        return self.delta_idm_dr + 5

    @property
    def n_F_idr(self):
        if not self.has_idm_dr or self.idr_fluid:
            return 0
        return self.l_max_idr - 2

    @property
    def n_idm_dr(self):
        # the shear slot is allocated (and kept zero) in fluid mode too, so
        # the offsets stay fixed
        return (5 + self.n_F_idr) if self.has_idm_dr else 0

    # --- ncdm: per species a (q_size x (l_max_ncdm+1)) block; under the fluid
    # approximation only the first three slots (delta, theta, sigma) evolve
    @property
    def ncdm(self):
        return self.F_ur + self.n_F_ur + self.n_dcdm_dr + self.n_idm_dr

    @property
    def n_l_ncdm(self):
        return self.l_max_ncdm + 1

    @property
    def n_ncdm_block(self):
        return self.n_ncdm * self.q_size_ncdm * self.n_l_ncdm

    # --- dncdm dark-radiation hierarchies (after the ncdm block)
    @property
    def F_dr_ncdm(self):
        return self.ncdm + self.n_ncdm_block

    @property
    def n_F_dr_ncdm(self):
        return self.n_dncdm * (self.l_max_dr + 1)

    # --- dark-energy fluid (w0-wa CLP, reference perturb_derivs fld block)
    @property
    def delta_fld(self):
        return self.ncdm + self.n_ncdm_block + self.n_F_dr_ncdm

    @property
    def theta_fld(self):
        return self.delta_fld + 1

    @property
    def n_fld(self):
        return 2 if self.has_fld else 0

    # --- scalar-field dark energy: delta phi and its conformal derivative
    # (perturb_vector_init :3399-3400)
    @property
    def phi_scf_pt(self):
        return self.ncdm + self.n_ncdm_block + self.n_F_dr_ncdm + self.n_fld

    @property
    def phi_prime_scf_pt(self):
        return self.phi_scf_pt + 1

    @property
    def n_scf(self):
        return 2 if self.has_scf else 0

    # --- metric
    @property
    def eta(self):
        return (self.ncdm + self.n_ncdm_block + self.n_F_dr_ncdm
                + self.n_fld + self.n_scf)

    @property
    def size(self):
        return self.eta + 1

    @property
    def radiation_slices(self):
        """(start, stop) index ranges of the relativistic hierarchies
        (photons + polarization, ur, dr, idr). Used by the P(k)-tail
        per-component error floor: these components are Silk-damped to
        sub-1e-4 amplitudes at k >> k_D and feed back on delta_m only
        through the (radiation-suppressed) late-time metric, so their
        oscillations need not be resolved to rtol for the 1e-2 P(k)
        contract."""
        out = [(self.delta_g, self.G_g + self.n_G_g),
               (self.delta_ur, self.F_ur + self.n_F_ur)]
        if self.has_dcdm:
            out.append((self.F_dr, self.F_dr + self.n_F_dr))
        if self.has_idm_dr:
            out.append((self.delta_idr, self.F_idr + self.n_F_idr))
        if self.n_dncdm:
            out.append((self.F_dr_ncdm, self.F_dr_ncdm + self.n_F_dr_ncdm))
        return tuple(out)


class SrcIdx:
    """Source-type columns (analog of index_tp_*, perturbations_module.h)."""

    names = ["t0", "t1", "t2", "p", "phi", "psi", "phi_plus_psi", "phi_prime",
             "delta_m", "theta_m", "delta_cb", "theta_cb", "h_prime", "eta_src",
             # per-species transfer functions (tk outputs / get_transfer)
             "delta_g", "theta_g", "delta_b", "theta_b", "delta_cdm",
             "theta_cdm", "delta_ur", "theta_ur", "delta_ncdm", "theta_ncdm",
             "delta_tot", "H_T_Nb_prime", "theta_tot"]
    ix = {n: i for i, n in enumerate(names)}
    n = len(names)
