"""Precision-parameter registry.

TPU-native analog of the reference's X-macro precision registry
(include/precisions.h + include/precision_macros.h): one frozen dataclass whose
defaults mirror the reference values so that default-precision runs are
comparable. All fields are static (they determine trace-time shapes/grids), so
the dataclass is hashable and usable as a jit static argument.

Only parameters consumed by implemented stages are present; the set grows with
the framework. Names follow the reference (include/precisions.h line refs in
comments).

Reference parameters deliberately OBVIATED by the TPU-native design (absent
here because no code path could consume them, not because the feature is
missing):

- back_integration_stepsize / tol_background_integration: the background is
  a fixed dense ln(a) grid with exact cumulative integrals (background_Nloga
  is the density knob), not an adaptive RKCK march.
- perturb_integration_stepsize: the batched IMEX/RKCK evolvers are
  error-controlled by tol_perturb_integration; there is no timescale-scaled
  initial step.
- hyper_x_min / hyper_x_tol / hyper_phi_min_abs / hyper_sampling_flat /
  hyper_sampling_curved_low_nu / hyper_sampling_curved_high_nu /
  hyper_nu_sampling_step: hyperspherical Bessel values are generated inside
  the line-of-sight scan at exactly the x values needed (recurrence +
  log-series seeds), so there are no sampled Phi tables to size; the only
  surviving table knob is hyper_flat_approximation_nu (closed q-list).
- idm_dr_tight_coupling_trigger_tau_c_over_tau_{h,k} /
  idr_streaming_approximation / idr_streaming_trigger_*: the idm-idr
  scattering terms are handled IMPLICITLY by the IMEX stiff solve
  (equations.stiff_apply/stiff_solve), so the reference's tca_idm_dr / rsa_idr
  stiffness-avoidance approximations have no equivalent switching to trigger.
- thermo_Nz1_idm_dr / thermo_Nz2_idm_dr / thermo_z_initial_idm_dr: idm_dr
  scattering rates ride the shared thermodynamics z-grid (recfast_Nz0).
- hmcode_tol_sigma: sigma(R) = 1 is inverted by a vectorized monotone
  inversion + Newton polish on the full R grid, not a tolerance-terminated
  scalar iteration.
- tol_ncdm_synchronous / tol_ncdm_newtonian: parsed-and-ignored, exactly like
  the reference fork (declared precisions.h:44-49, but input_module.cpp:1092
  always feeds tol_ncdm to the q-sampling); accepted as inert inputs.
- transfer_neglect_delta_k_V_*: vector modes — the reference itself aborts
  with "Vectors not coded yet" (perturbations_module.cpp:581).
- safe_phi_scf: commented out in the reference registry (precisions.h:71).
- entropy_ini / gw_ini / curvature_ini ARE present (below): applied as exact
  post-solve source scalings (the system is linear in the IC amplitude).
"""

from __future__ import annotations

from dataclasses import dataclass, replace


@dataclass(frozen=True)
class PrecisionParams:
    # --- background (precisions.h:12-67)
    a_ini_over_a_today_default: float = 1.0e-14
    # (no back_integration_stepsize / tol_background_integration here: the
    # background runs on a fixed dense ln(a) grid with exact cumulative
    # integrals, not an adaptive ODE march; background_Nloga is the knob)
    tol_initial_Omega_r: float = 1.0e-4
    tol_ncdm_bg: float = 1.0e-5
    # perturbation momentum-grid accuracy: drives the qm_auto minimal-N
    # Gauss-Laguerre search (background.ncdm_q_rule; reference tol_ncdm,
    # precisions.h + tools/quadrature.c get_qsampling)
    tol_ncdm: float = 1.0e-3
    # Omega_ncdm -> M Newton/bisection relative tolerance
    # (background_ncdm_M_from_Omega, tools/non_cold_dark_matter.cpp:893)
    tol_M_ncdm: float = 1.0e-7
    # guard: perturbations must start while every ncdm species is still
    # relativistic, |p/rho - 1/3| < tol (perturbations_module.cpp:2576)
    tol_ncdm_initial_w: float = 1.0e-3
    tol_tau_eq: float = 1.0e-6
    # synchronous gauge is defined in the CDM frame: with Omega_cdm == 0 the
    # reference substitutes this floor (input_module.cpp:872)
    Omega0_cdm_min_synchronous: float = 1.0e-10
    # grid size for the fixed log(a) background table (TPU-native choice:
    # dense fixed grid instead of adaptive; 1+ points per back_integration_stepsize)
    background_Nloga: int = 4096

    # --- thermodynamics / recfast (precisions.h:86-156)
    recfast_z_initial: float = 1.0e4
    recfast_Nz0: int = 20000
    tol_thermo_integration: float = 1.0e-2
    recfast_Heswitch: int = 6
    recfast_fudge_He: float = 0.86
    recfast_Hswitch: bool = True
    recfast_fudge_H: float = 1.14
    recfast_delta_fudge_H: float = -0.015
    recfast_AGauss1: float = -0.14
    recfast_AGauss2: float = 0.079
    recfast_zGauss1: float = 7.28
    recfast_zGauss2: float = 6.73
    recfast_wGauss1: float = 0.18
    recfast_wGauss2: float = 0.33
    recfast_z_He_1: float = 8000.0
    recfast_delta_z_He_1: float = 50.0
    recfast_z_He_2: float = 5000.0
    recfast_delta_z_He_2: float = 100.0
    recfast_z_He_3: float = 3500.0
    recfast_delta_z_He_3: float = 50.0
    recfast_x_He0_trigger: float = 0.995
    recfast_x_He0_trigger2: float = 0.995
    recfast_x_He0_trigger_delta: float = 0.05
    recfast_x_H0_trigger: float = 0.995
    recfast_x_H0_trigger2: float = 0.995
    recfast_x_H0_trigger_delta: float = 0.05
    recfast_H_frac: float = 1.0e-3
    reionization_z_start_max: float = 50.0
    reionization_sampling: float = 5.0e-2
    reionization_optical_depth_tol: float = 1.0e-4
    reionization_start_factor: float = 8.0
    thermo_rate_smoothing_radius: int = 50
    # HyRec rate-table overrides: empty = the tables shipped in
    # classpp_public_tpu/data/hyrec (precisions.h hyrec_*_file,
    # thermodynamics_module.cpp:3119-3152)
    hyrec_Alpha_inf_file: str = ""
    hyrec_R_inf_file: str = ""
    hyrec_two_photon_tables_file: str = ""

    # --- perturbations: k sampling (precisions.h:162-182)
    k_min_tau0: float = 0.1
    k_max_tau0_over_l_max: float = 2.4
    k_step_sub: float = 0.05
    k_step_super: float = 0.002
    k_step_transition: float = 0.2
    k_step_super_reduction: float = 0.1
    k_per_decade_for_pk: float = 10.0
    # idm_dr dark-acoustic-oscillation runs need a denser P(k) grid: the
    # effective density is k_per_decade_for_pk * boost * nindex_idm_dr
    # (perturbations_module.cpp:1772,1856)
    idmdr_boost_k_per_decade_for_pk: float = 1.0
    k_per_decade_for_bao: float = 70.0
    k_bao_center: float = 3.0
    k_bao_width: float = 4.0
    start_small_k_at_tau_c_over_tau_h: float = 0.0015
    start_large_k_at_tau_h_over_tau_k: float = 0.07
    tight_coupling_trigger_tau_c_over_tau_h: float = 0.015
    tight_coupling_trigger_tau_c_over_tau_k: float = 0.01
    # TPU-native: optional later TCA switch for P(k)-only modes (k above the
    # CMB range). With the IMEX stiff evolver the post-TCA phase is no longer
    # stability-limited, so the default now matches the reference trigger;
    # raising it (e.g. 0.1) trades O((k tau_c)^2) accuracy for fewer steps.
    tight_coupling_trigger_tau_c_over_tau_k_pkonly: float = 0.01
    start_sources_at_tau_c_over_tau_h: float = 0.008
    tight_coupling_approximation: str = "compromise_CLASS"

    # --- Boltzmann hierarchy truncation (precisions.h:209-217)
    l_max_g: int = 12
    l_max_pol_g: int = 10
    l_max_ur: int = 17
    l_max_ncdm: int = 17
    l_max_dr: int = 17
    # number of collision terms fed into the decay-radiation hierarchy by a
    # decaying-ncdm source (<= l_max_dr and l_max_ncdm; precisions.h:212,
    # applied at perturbations_module.cpp:8498)
    l_max_dr_col: int = 17
    l_max_idr: int = 17
    l_max_g_ten: int = 5
    l_max_pol_g_ten: int = 5

    # --- perturbation integration (precisions.h:219-299)
    # initial-condition normalizations (precisions.h:219-221). The solution
    # is linear in them, so they are applied as exact post-solve source
    # scalings (no retrace): adiabatic modes scale with curvature_ini,
    # isocurvature with entropy_ini, tensors with gw_ini.
    curvature_ini: float = 1.0
    entropy_ini: float = 1.0
    gw_ini: float = 1.0
    # PPF: cap on (c_gamma k / aH)^2 selecting the large-scale vs
    # small-scale Gamma equation branch (precisions.h:245, used in the fld
    # block of perturb_derivs :6520)
    c_gamma_k_H_square_max: float = 1.0e3
    # (no perturb_integration_stepsize: the batched evolvers are
    # error-controlled by tol_perturb_integration, not timescale-scaled)
    perturb_sampling_stepsize: float = 0.1
    tol_perturb_integration: float = 1.0e-5
    # P(k)-only tail lanes (k > k_max_cmb) answer to the 1e-2 P(k) contract —
    # except their phi+psi source, which feeds C_l^phiphi at l >~ 1000 through
    # the Limber integral (chi = (l+1/2)/k sits at the z~1-3 lensing-kernel
    # peak exactly for these k). rtol on the tail is loosened only on the
    # radiation-hierarchy rows (whose Silk-damped oscillations dominate the
    # step count there) via this factor + the 1e-4 absolute floor; the
    # metric/cdm/baryon rows that set phi+psi keep the tight C_l tolerance.
    tol_perturb_tail_factor: float = 30.0
    # rtol floor applied on the float32 working-state path (see
    # perturb_dtype "auto"): tighter control only multiplies the step count
    # against a discretization-limited C_l error budget
    tol_perturb_f32_floor: float = 1.0e-4
    atol_perturb_tail_radiation: float = 1.0e-4
    tol_tau_approx: float = 1.0e-10
    radiation_streaming_approximation: str = "rsa_MD_with_reio"
    radiation_streaming_trigger_tau_over_tau_k: float = 45.0
    radiation_streaming_trigger_tau_c_over_tau: float = 5.0
    ur_fluid_approximation: str = "ufa_CLASS"
    ur_fluid_trigger_tau_over_tau_k: float = 30.0
    ncdm_fluid_approximation: str = "ncdmfa_CLASS"
    ncdm_fluid_trigger_tau_over_tau_k: float = 31.0
    neglect_CMB_sources_below_visibility: float = 1.0e-3
    # "imex" = ARK3(2) additive scheme with the Thomson-drag terms implicit
    # (closed-form solve; the ndf15-equivalent stiff path, ops/ode.py);
    # "rkck" = fully explicit Cash-Karp 45 (reference evolver_rk analog).
    evolver: str = "imex"
    # modes per device launch (per device when a mesh is present). Measured on
    # TPU v5e with the imex evolver: 128 is ~1.7x faster than 64 (better VPU
    # occupancy); 256/512 are SLOWER — beyond one (8,128) register tile the
    # per-step cost grows with lane count, so merging chunks loses more than
    # the saved dispatches (512: 22 s -> 26 s on the Planck config). The old
    # 128-wide device faults were an artifact of the explicit evolver's
    # 100k-iteration launches and are gone.
    k_chunk_size: int = 128
    # tau-range splits per launch (bounds execution time). With the imex
    # evolver each launch is a few seconds, and every extra launch costs a
    # ~0.3 s dispatch round-trip on remote accelerators: keep it minimal.
    tau_windows: int = 2
    # working dtype of the perturbation state ("auto" | "float64" |
    # "float32"): time bookkeeping, step control and all other pipeline
    # stages stay f64. "auto" = float32 on accelerators, float64 on CPU:
    # TPUs have no f64 hardware — XLA software-emulates it, measured 4.2x
    # slower at runtime and ~25x slower to compile on v5e (20.7 s -> 4.9 s
    # warm, 761 s -> 31 s cold for the Planck bench). Accuracy vs the
    # reference goldens is unchanged: TT 8.8e-4, EE 2.0e-3, P(k) 3.4e-4 at
    # rtol 1e-5 — identical to the f64 path, whose C_l error budget is set
    # by source/transfer discretization, not state roundoff. (An earlier
    # note here claimed f32 controller thrash; that was an f64->f32
    # promotion leak in the RHS — fixed by the central dtype shim in
    # perturbations/solve.py _stepper.)
    perturb_dtype: str = "auto"

    # --- primordial (precisions.h:311)
    k_per_decade_primordial: float = 10.0
    # inflation solver (precisions.h:313-328)
    primordial_inflation_ratio_min: float = 100.0
    primordial_inflation_ratio_max: float = 1.0 / 50.0
    primordial_inflation_phi_ini_maxit: int = 10000
    primordial_inflation_pt_stepsize: float = 0.01
    primordial_inflation_bg_stepsize: float = 0.005
    primordial_inflation_tol_integration: float = 1.0e-3
    primordial_inflation_attractor_precision_pivot: float = 0.001
    primordial_inflation_attractor_precision_initial: float = 0.1
    primordial_inflation_attractor_maxit: int = 10
    primordial_inflation_tol_curvature: float = 1.0e-3
    primordial_inflation_aH_ini_target: float = 0.9
    # inflation_V_end pivot search (precisions.h:324-328)
    primordial_inflation_end_dphi: float = 1.0e-10
    primordial_inflation_end_logstep: float = 10.0
    primordial_inflation_small_epsilon: float = 0.1
    primordial_inflation_small_epsilon_tol: float = 0.01
    primordial_inflation_extra_efolds: float = 2.0

    # --- transfer / bessel (precisions.h:335-406)
    l_linstep: int = 40
    l_logstep: float = 1.12
    # closed-universe q-list (precisions.h:346,365-378): integer-nu sampling
    # below hyper_flat_approximation_nu with the q_logstep_trapzd step, then
    # a q_numstep_transition-step blend into the flat/open spline stepping
    hyper_flat_approximation_nu: float = 4000.0
    q_logstep_trapzd: float = 20.0
    q_numstep_transition: float = 250.0
    q_linstep: float = 0.45
    q_logstep_spline: float = 170.0
    # open universe: q_logstep_spline is divided by the thermodynamics
    # angular rescaling raised to this power (transfer_module.cpp:941) —
    # open geometries need denser low-q sampling
    q_logstep_open: float = 6.0
    # lensing-potential q-extension density (TPU-native accuracy knob; see
    # models/transfer.py). The reference truncates its transfer q-list at
    # the CMB k block (transfer_get_q_list :903 uses k_size_cl_), which
    # loses 10-25% of C_l^phiphi at l ~ 2500 (the Limber kernel still has
    # support at chi < 6000 Mpc, i.e. q > k_max_cmb). DEFAULT 0 = off for
    # reference parity (the goldens carry the same truncation); set e.g.
    # 1200 points/decade to append a Limber-only phi extension up to the
    # full source k_max for the physically-complete high-l phiphi tail.
    phi_q_per_decade: float = 0.0
    transfer_neglect_delta_k_S_t0: float = 0.15
    transfer_neglect_delta_k_S_t1: float = 0.04
    transfer_neglect_delta_k_S_t2: float = 0.15
    transfer_neglect_delta_k_S_e: float = 0.11
    transfer_neglect_delta_k_T_t2: float = 0.2
    transfer_neglect_delta_k_T_e: float = 0.25
    transfer_neglect_delta_k_T_b: float = 0.1
    transfer_neglect_late_source: float = 400.0
    l_switch_limber: float = 10.0
    # number counts / selection windows (precisions.h:400-411)
    selection_tophat_edge: float = 0.1
    l_switch_limber_for_nc_local_over_z: float = 100.0
    l_switch_limber_for_nc_los_over_z: float = 30.0
    selection_cut_at_sigma: float = 5.0
    selection_sampling: float = 50.0
    selection_sampling_bessel: float = 20.0
    # tau sampling of integrated (line-of-sight) number-count contributions:
    # lensing/GR kernels vary slower than the Bessels, so they get their own
    # density knob (precisions.h:411, transfer_module.cpp:1473)
    selection_sampling_bessel_los: float = 20.0

    # --- nonlinear (precisions.h:418-449)
    sigma_k_per_decade: float = 80.0
    nonlinear_min_k_max: float = 20.0
    # deprecated per-method aliases of nonlinear_min_k_max, still honored:
    # k_max_for_pk = max(k_max, nonlinear_min_k_max, halofit/hmcode_min_k_max)
    # (input_module.cpp:2806-2811)
    halofit_min_k_max: float = 5.0
    hmcode_min_k_max: float = 5.0
    halofit_min_k_nonlinear: float = 1.0e-4
    halofit_k_per_decade: float = 80.0
    # Pk_equal method (precisions.h:454-455): effective (w0, Omega_m)(z)
    # tables for halofit in (w0, wa) models
    pk_eq_z_max: float = 5.0
    pk_eq_tol: float = 1.0e-7
    # BBN table for YHe=BBN (precisions.h:76): name of a file shipped in
    # classpp_public_tpu/data (sBBN.dat, sBBN_2017.dat,
    # sBBN_2017_marcucci.dat) or an absolute path
    sBBN_file: str = "sBBN_2017.dat"
    halofit_sigma_precision: float = 0.05
    halofit_tol_sigma: float = 1.0e-6

    # --- hmcode (precisions.h:459-485)
    hmcode_max_k_extra: float = 1.0e6
    n_hmcode_tables: int = 64
    rmin_for_sigtab: float = 1.0e-5
    rmax_for_sigtab: float = 1.0e3
    ainit_for_growtab: float = 1.0e-3
    amax_for_growtab: float = 1.0
    nsteps_for_p1h_integral: int = 256
    mmin_for_p1h_integral: float = 1.0e3
    mmax_for_p1h_integral: float = 1.0e18

    # --- lensing (precisions.h:492-495)
    accurate_lensing: bool = False
    num_mu_minus_lmax: int = 70
    delta_l_max: int = 500
    tol_gauss_legendre: float = 1.0e-13  # f64 eps scale

    def replace(self, **kw) -> "PrecisionParams":
        return replace(self, **kw)
