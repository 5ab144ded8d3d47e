"""Pipeline orchestrator: the staged, lazily-cached computation DAG.

Analog of the reference Cosmology class (source/cosmology.cpp:12-86): each
stage is computed exactly once per parameter set and memoized; downstream
stages pull upstream ones on demand. `compute(level)` semantics match
classy.pyx:251-273.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config.params import CosmoParams
from .config.precision import PrecisionParams

_LEVELS = ["background", "thermodynamics", "perturbations", "primordial",
           "nonlinear", "transfer", "spectra", "lensing"]


@dataclass
class OutputSelection:
    """What to compute (reference 'output=' parsing, input_module.cpp)."""

    # reference defaults: every output flag OFF (input_default_params,
    # input_module.cpp:3266-3290, ple->has_lensed_cls=_FALSE_ :3434)
    tCl: bool = False
    pCl: bool = False
    lCl: bool = False
    mPk: bool = False
    dTk: bool = False
    vTk: bool = False
    lensing: bool = False
    l_scalar_max: int = 2500
    P_k_max: float = 1.0         # 1/Mpc (ref k_max_for_pk, input_module.cpp:3309)
    z_pk: tuple = (0.0,)
    z_max_pk: float = 0.0        # ref z_max_pk default = z_pk[0] = 0 (:3321,3429)
    non_linear: str = ""        # "", "halofit", "hmcode"
    hm_eta0: float = 0.603      # HMcode feedback (default nl_emu_dmonly,
    hm_cmin: float = 3.13       #  input_module.cpp:3411)
    modes: tuple = ("s",)
    l_tensor_max: int = 500
    ics: tuple = ("ad",)
    gauge: str = "synchronous"
    # number counts / galaxy lensing (nCl / sCl)
    nCl: bool = False
    sCl: bool = False
    selection_mean: tuple = (1.0,)
    selection_width: tuple = (0.1,)
    selection_kind: str = "gaussian"
    l_lss_max: int = 300
    non_diagonal: int = 0
    nc_contributions: tuple = ("density",)
    selection_bias: tuple = (1.0,)
    magnification_bias: tuple = (0.0,)
    dndz: str = None          # None | "analytic" | file path
    dndz_evo: str = None
    # N-body gauge transfer functions (1811.00904; 'Nbody gauge transfer
    # functions = yes')
    nbody: bool = False

    @property
    def has_cls(self) -> bool:
        return self.tCl or self.pCl or self.lCl

    @property
    def has_nc(self) -> bool:
        return self.nCl or self.sCl

    @property
    def has_pk(self) -> bool:
        return self.mPk or self.dTk or self.vTk


# --- cross-instance stage memos --------------------------------------------
# The reference's Cosmology memoizes per instance; samplers (MontePython /
# Cobaya) and the bench construct a FRESH Class per point, so the background
# and thermodynamics tables — which do not depend on the primordial /
# perturbation-only parameters below — are re-built needlessly whenever only
# (A_s, n_s, ...) move (the classic "fast parameters" split). Key = the
# params pytree with those fields normalized out, plus the precision set.
_PRIMORDIAL_ONLY = dict(A_s=2.215e-09, n_s=0.9619, alpha_s=0.0, k_pivot=0.05,
                        r=1.0, n_t=-0.1141375, alpha_t=0.0108625,
                        tensor_method="massless", gauge="synchronous",
                        temp_contributions=(1.0, 1.0, 1.0, 1.0, 1.0),
                        eisw_lisw_split_z=120.0)
_STAGE_MEMO: dict = {}
_STAGE_MEMO_MAX = 8


def _bg_th_key(params: CosmoParams, pr: PrecisionParams, stage: str):
    import dataclasses as _dc

    try:
        norm = _dc.replace(params, **_PRIMORDIAL_ONLY)
        return (stage, norm, pr)
    except Exception:
        return None


def _memo_get(key):
    return _STAGE_MEMO.get(key) if key is not None else None


def _memo_put(key, value):
    if key is None:
        return
    if len(_STAGE_MEMO) >= _STAGE_MEMO_MAX:
        _STAGE_MEMO.pop(next(iter(_STAGE_MEMO)))
    _STAGE_MEMO[key] = value


class Cosmology:
    """Lazy pipeline over (CosmoParams, PrecisionParams, OutputSelection)."""

    def __init__(self, params: CosmoParams, precision: Optional[PrecisionParams] = None,
                 output: Optional[OutputSelection] = None):
        self.params = params
        self.pr = precision or PrecisionParams()
        self.out = output or OutputSelection()
        self.sigma8_target = None
        self._cache = {}

    # --- stages ------------------------------------------------------------

    @staticmethod
    def _host_device():
        """Table-building stages run as many small eager ops; on accelerator
        platforms each eager op is a dispatch round-trip, so pin these stages
        to the local CPU backend. The jitted hot stages then pull the tables
        onto the accelerator once."""
        try:
            return jax.local_devices(backend="cpu")[0]
        except Exception:
            return jax.devices()[0]

    @property
    def background(self):
        if "bg" not in self._cache:
            from .models.background import compute_background

            key = _bg_th_key(self.params, self.pr, "bg")
            hit = _memo_get(key)
            if hit is None:
                with jax.default_device(self._host_device()):
                    hit = compute_background(self.params, self.pr)
                _memo_put(key, hit)
            self._cache["bg"] = hit
        return self._cache["bg"]

    @property
    def thermodynamics(self):
        if "th" not in self._cache:
            from .models.thermodynamics import compute_thermodynamics

            bg, bidx = self.background
            key = _bg_th_key(self.params, self.pr, "th")
            hit = _memo_get(key)
            if hit is None:
                with jax.default_device(self._host_device()):
                    hit = compute_thermodynamics(self.params, self.pr,
                                                 bg, bidx)
                _memo_put(key, hit)
            self._cache["th"] = hit
        return self._cache["th"]

    @property
    def l_max_internal(self) -> int:
        # lensing needs unlensed spectra beyond the output l_max
        # (reference: l_scalar_max += delta_l_max, input_module.cpp)
        return self.out.l_scalar_max + (self.pr.delta_l_max if self.out.lensing else 0)

    @property
    def perturbations(self):
        if "pt" not in self._cache:
            from .models.perturbations import compute_perturbations

            bg, bidx = self.background
            k_max_cl_extra = 0.0
            if self.out.has_nc or self.out.lCl:
                # ref perturbations_module.cpp:1726-1733: resolve l_lss_max
                # at the comoving distance of the nearest selection bin —
                # applied for number counts AND the lensing potential (the
                # reference default selection_mean[0]=1.0 / l_lss_max=300
                # makes this a no-op for lCl unless l_max_lss is raised)
                from .models.background import tau_of_z

                tau1 = float(tau_of_z(bg, jnp.asarray(self.out.selection_mean[0])))
                k_max_cl_extra = self.pr.k_max_tau0_over_l_max * self.out.l_lss_max \
                    / (float(bg.tau0) - tau1)
            self._cache["pt"] = compute_perturbations(
                self.params, self.pr, bg, bidx, self.thermodynamics,
                l_scalar_max=self.l_max_internal,
                k_max_for_pk=self.out.P_k_max,
                has_cls=self.out.has_cls, has_pk=self.out.has_pk,
                z_max_pk=self.out.z_max_pk, ics=self.out.ics,
                gauge=self.out.gauge, k_max_cl_extra=k_max_cl_extra,
                has_nc=self.out.has_nc, nbody=self.out.nbody,
                has_lcmb=self.out.lCl and self.out.has_cls)
        return self._cache["pt"]

    @property
    def primordial(self):
        if "pm" not in self._cache:
            from .models.primordial import compute_primordial

            ext = None
            cmd = getattr(self, "external_pk_command", None)
            if cmd:
                from .models.primordial import external_spectrum

                # reference convention: append "k_min k_max k_per_decade"
                # to the command line (primordial_module.cpp:3078-3088)
                pert = self.perturbations
                kh = pert.k_np if pert.k_np is not None else np.asarray(pert.k)
                k_min = float(kh[0]) * 0.99
                k_max = float(kh[-1]) * 1.01
                ext = external_spectrum(
                    f"{cmd} {k_min:.12e} {k_max:.12e} "
                    f"{self.pr.k_per_decade_primordial:g}")
            infl = getattr(self, "inflation_model", None)
            if infl:
                # inflation_V: numerical P_R/P_h from the inflaton ODEs
                # (primordial_module.cpp:1087); tabulated like external_Pk
                import numpy as np

                from .models.inflation import (compute_inflation_spectrum,
                                               compute_inflation_spectrum_H)

                pert = self.perturbations
                kh = pert.k_np if pert.k_np is not None else np.asarray(pert.k)
                k_min = float(kh[0]) * 0.8
                k_max = float(kh[-1]) * 1.2
                n_lnk = int(np.log10(k_max / k_min)
                            * self.pr.k_per_decade_primordial) + 2
                lnk = np.linspace(np.log(k_min), np.log(k_max), n_lnk)
                if infl[0] == "hubble":
                    pk_s, pk_t = compute_inflation_spectrum_H(
                        infl[1], self.params.k_pivot, lnk, self.pr)
                elif infl[0] == "V_end":
                    # inflation_V_end: pivot field value from the end of
                    # inflation (primordial_inflation_find_phi_pivot :2324)
                    from .models.inflation import find_phi_pivot

                    pot_kind, Vs, phi_end, method, target = infl[1]
                    phi_piv = find_phi_pivot((pot_kind, Vs), phi_end, method,
                                             target, self.pr)
                    pk_s, pk_t = compute_inflation_spectrum(
                        pot_kind, Vs, self.params.k_pivot, lnk, self.pr,
                        phi_pivot=phi_piv)
                else:
                    pk_s, pk_t = compute_inflation_spectrum(
                        infl[0], infl[1], self.params.k_pivot, lnk, self.pr)
                ext = (jnp.asarray(lnk), jnp.log(jnp.asarray(pk_s)),
                       jnp.log(jnp.asarray(pk_t)))
            pm = compute_primordial(self.params, iso=getattr(self, "iso_primordial", None),
                                    external=ext,
                                    iso_corr=getattr(self, "iso_corr", None))
            if self.sigma8_target is not None:
                # sigma8 -> A_s rescaling (reference Cosmology::GetPrimordialModule,
                # cosmology.cpp:39-54). The source functions are A_s-independent
                # (normalized to curvature_ini), so this costs one sigma integral.
                from .models.nonlinear import pk_linear_at_z, sigma_R

                bg, _ = self.background
                pert = self.perturbations
                pk0 = pk_linear_at_z(pert, bg, pm, 0.0)
                s8 = float(sigma_R(pert.k, pk0, 8.0 / self.params.h)[0])
                new_As = float(pm.A_s) * (self.sigma8_target / s8) ** 2
                pm = compute_primordial(self.params.replace(A_s=new_As),
                                        iso=getattr(self, "iso_primordial", None),
                                        iso_corr=getattr(self, "iso_corr", None))
            self._cache["pm"] = pm
        return self._cache["pm"]

    @property
    def nonlinear(self):
        if "nl" not in self._cache:
            from .models.nonlinear import compute_nonlinear

            bg, bidx = self.background
            self._cache["nl"] = compute_nonlinear(
                self.perturbations, bg, bidx, self.primordial, self.pr,
                self.params, z_pk=self.out.z_pk,
                method=self.out.non_linear or "halofit",
                hm_eta0=self.out.hm_eta0, hm_cmin=self.out.hm_cmin,
                tau_rec=float(self.thermodynamics.tau_rec)
                if getattr(self.params, "pk_eq", False) else None)
        return self._cache["nl"]

    @property
    def tensor_perturbations(self):
        if "tpt" not in self._cache:
            from .models.perturbations.tensors import compute_tensor_perturbations

            bg, bidx = self.background
            self._cache["tpt"] = compute_tensor_perturbations(
                self.params, self.pr, bg, bidx, self.thermodynamics,
                l_tensor_max=self.out.l_tensor_max)
        return self._cache["tpt"]

    @property
    def tensor_transfer(self):
        if "ttr" not in self._cache:
            from .models.transfer import compute_transfer_tensor

            self._cache["ttr"] = compute_transfer_tensor(
                self.tensor_perturbations, self.thermodynamics, self.pr,
                l_max=self.out.l_tensor_max, K=self.curvature_K, sgnK=self.sgnK)
        return self._cache["ttr"]

    @property
    def curvature_K(self) -> float:
        """K = -Omega_k H0^2 [Mpc^-2] (reference pba->K)."""
        bg, _ = self.background
        return float(-self.params.Omega_k * float(bg.H0) ** 2)

    @property
    def sgnK(self) -> int:
        if self.params.Omega_k == 0.0:
            return 0
        return 1 if self.curvature_K > 0 else -1

    @property
    def nl_source_ratio(self):
        """sqrt(P_nl/P_lin)(tau, k) on the source sampling — the reference's
        nl_corr_density, which transfer_perturbation_copy_sources_and_nl_
        corrections multiplies into the metric/density transfer sources
        whenever a nonlinear method is on (transfer_module.cpp:542-597).
        Computed on a fixed 24-point z grid (z <= 10; the lensing kernel's
        weight beyond is negligible and halofit is unreliable there, so the
        ratio clamps to 1) and linearly interpolated in tau per k column."""
        if "nlr" not in self._cache:
            from .models.nonlinear import compute_nonlinear

            bg, bidx = self.background
            pert = self.perturbations
            z_grid = np.concatenate([[0.0], np.geomspace(0.05, 10.0, 23)])
            nl = compute_nonlinear(
                pert, bg, bidx, self.primordial, self.pr, self.params,
                z_pk=tuple(z_grid), method=self.out.non_linear or "halofit",
                hm_eta0=self.out.hm_eta0, hm_cmin=self.out.hm_cmin,
                tau_rec=float(self.thermodynamics.tau_rec)
                if getattr(self.params, "pk_eq", False) else None)
            ratio = np.sqrt(np.asarray(nl.pk_nl)
                            / np.maximum(np.asarray(nl.pk_lin), 1e-300))
            ratio = np.where(np.isfinite(ratio) & (ratio > 0), ratio, 1.0)
            loga = np.asarray(bg.loga)
            tau_z = np.interp(-np.log1p(z_grid), loga,
                              np.asarray(bg.tau_of_loga))
            order = np.argsort(tau_z)
            tau_s, r_s = tau_z[order], ratio[order]       # (nz,), (nz, nk)
            taus = np.asarray(pert.tau_np)
            j = np.clip(np.searchsorted(tau_s, taus) - 1, 0, len(tau_s) - 2)
            f = np.clip((taus - tau_s[j]) / (tau_s[j + 1] - tau_s[j]), 0.0, 1.0)
            out = (1.0 - f)[:, None] * r_s[j] + f[:, None] * r_s[j + 1]
            out[taus < tau_s[0]] = 1.0                    # z > 10: linear
            self._cache["nlr"] = out                      # (ntau, nk)
        return self._cache["nlr"]

    def _pert_for_transfer(self, pert):
        """Scalar-source table entering the CMB transfer integrals: with a
        nonlinear method on, phi+psi (the lensing/lcmb source) carries the
        halofit/hmcode correction exactly as the reference's copied sources
        do (transfer_module.cpp:566-588); without one it is the linear table."""
        if not self.out.non_linear:
            return pert
        from .models.perturbations.indices import SrcIdx

        col = SrcIdx.ix["phi_plus_psi"]
        r = jnp.asarray(self.nl_source_ratio.T)           # (nk, ntau)
        src = pert.sources.at[:, :, col].mul(r[: pert.sources.shape[0]])
        return pert._replace(sources=src)

    @property
    def transfer(self):
        if "tr" not in self._cache:
            from .models.transfer import compute_transfer

            self._cache["tr"] = compute_transfer(
                self._pert_for_transfer(self.perturbations),
                self.thermodynamics, self.pr,
                l_max=self.l_max_internal, K=self.curvature_K, sgnK=self.sgnK)
        return self._cache["tr"]

    @property
    def transfer_iso(self):
        if "tr_iso" not in self._cache:
            from .models.transfer import compute_transfer

            pert = self.perturbations
            out = {}
            if pert.sources_iso:
                for ic, src in pert.sources_iso.items():
                    # the same IC-summed nl_corr scales every ic's sources
                    # (reference copies + corrects per (ic, tp) with one
                    # nl_corr_density table, transfer_module.cpp:556-588)
                    pert_ic = self._pert_for_transfer(pert._replace(sources=src))
                    out[ic] = compute_transfer(pert_ic, self.thermodynamics,
                                               self.pr, l_max=self.l_max_internal)
            self._cache["tr_iso"] = out
        return self._cache["tr_iso"]

    @property
    def spectra(self):
        if "sp" not in self._cache:
            from .models.spectra import compute_spectra

            tr_tensor = self.tensor_transfer if "t" in self.out.modes else None
            tr_iso = self.transfer_iso if len(self.out.ics) > 1 else None
            self._cache["sp"] = compute_spectra(
                self.transfer, self.primordial, l_max=self.l_max_internal,
                tr_tensor=tr_tensor, tr_iso=tr_iso,
                sgnK=self.sgnK, K=self.curvature_K,
                q_flat_nu=self.pr.hyper_flat_approximation_nu)
        return self._cache["sp"]

    @property
    def number_counts(self):
        if "nc" not in self._cache:
            from .models.numbercounts import compute_number_counts

            bg, bidx = self.background
            self._cache["nc"] = compute_number_counts(
                self.perturbations, bg, bidx, self.primordial, self.pr,
                self.out.selection_mean, self.out.selection_width,
                kind=self.out.selection_kind, l_max=self.out.l_lss_max,
                non_diag=self.out.non_diagonal,
                contributions=self.out.nc_contributions,
                selection_bias=self.out.selection_bias,
                magnification_bias=self.out.magnification_bias,
                dndz=self.out.dndz, dndz_evo=self.out.dndz_evo)
        return self._cache["nc"]

    @property
    def nc_cross(self):
        """CMB x number-count cross spectra (phi-dens, reference
        spectra_module.cpp :1211; plus T-dens/T-lens extensions)."""
        if "ncx" not in self._cache:
            from .models.numbercounts import compute_cmb_nc_cross

            bg, bidx = self.background
            self._cache["ncx"] = compute_cmb_nc_cross(
                self.perturbations, self.thermodynamics, bg, bidx,
                self.primordial, self.pr,
                self.out.selection_mean, self.out.selection_width,
                kind=self.out.selection_kind, l_max=self.out.l_lss_max,
                contributions=self.out.nc_contributions,
                selection_bias=self.out.selection_bias,
                magnification_bias=self.out.magnification_bias,
                dndz=self.out.dndz, dndz_evo=self.out.dndz_evo,
                want_td=self.out.tCl,
                want_tl=self.out.tCl and self.out.sCl)
        return self._cache["ncx"]

    @property
    def lensing(self):
        if "le" not in self._cache:
            from .models.lensing import compute_lensing

            self._cache["le"] = compute_lensing(self.spectra, self.pr,
                                                l_lensed_max=self.out.l_scalar_max)
        return self._cache["le"]

    # --- on-disk checkpoint/resume ----------------------------------------
    # (SURVEY §5: stage cache keyed by parameter hash; the reference has no
    # analog — module construction is its only persistence)

    def state_key(self) -> str:
        import hashlib

        from . import __version__

        # the version tag invalidates cached stages across code changes —
        # a stale pickle otherwise silently serves results from old physics
        blob = repr((__version__, self.params, self.pr, self.out,
                     getattr(self, "inflation_model", None),
                     getattr(self, "iso_primordial", None),
                     getattr(self, "iso_corr", None)))
        return hashlib.sha256(blob.encode()).hexdigest()[:24]

    def save_state(self, path: str):
        """Pickle every computed stage (arrays pulled to host numpy)."""
        import pickle

        host = jax.tree_util.tree_map(
            lambda x: np.asarray(x) if isinstance(x, jnp.ndarray) else x,
            self._cache)
        with open(path, "wb") as f:
            pickle.dump({"key": self.state_key(), "cache": host}, f)

    def load_state(self, path: str) -> bool:
        """Restore a stage cache if its parameter hash matches. Returns
        whether the restore happened."""
        import pickle

        try:
            with open(path, "rb") as f:
                blob = pickle.load(f)
        except (OSError, pickle.PickleError, EOFError):
            return False
        if blob.get("key") != self.state_key():
            return False
        self._cache.update(blob["cache"])
        return True

    def _auto_cache_path(self):
        import os

        d = os.environ.get("CLASSPP_CACHE_DIR")
        if not d:
            return None
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"state_{self.state_key()}.pkl")

    # stage summaries, analog of the reference's *_verbose prints
    # (e.g. background_module.cpp "-> age = ... Gyr"); level from the
    # `*_verbose` input keys (max of them), stored by classy into `verbosity`
    verbosity: int = 0

    def _announce(self, lv: str):
        if self.verbosity < 1:
            return
        import sys

        try:
            if lv == "background":
                bg = self._cache["bg"][0]
                print(f" -> age = {float(bg.age):.6f} Gyr, conformal age = "
                      f"{float(bg.tau0):.4f} Mpc, Omega0_m = {float(bg.Omega0_m):.6f}",
                      file=sys.stderr)
            elif lv == "thermodynamics":
                th = self._cache["th"]
                print(f" -> recombination at z = {float(th.z_rec):.2f} "
                      f"(tau = {float(th.tau_rec):.3f} Mpc), rs_rec = "
                      f"{float(th.rs_rec):.4f} Mpc, reionization optical depth "
                      f"= {float(th.tau_reio):.5f} (z_reio = {float(th.z_reio):.3f})",
                      file=sys.stderr)
            elif lv == "perturbations":
                pt = self._cache["pt"]
                import numpy as np

                print(f" -> evolved {len(np.asarray(pt.k))} scalar k-modes "
                      f"({int(np.asarray(pt.stats_steps).sum())} total solver steps)",
                      file=sys.stderr)
            elif lv == "primordial":
                pm = self._cache["pm"]
                print(f" -> primordial spectrum: A_s = {float(pm.A_s):.6e}, "
                      f"n_s = {float(pm.n_s):.4f}", file=sys.stderr)
            elif lv == "nonlinear" and "nl" in self._cache:
                nl = self._cache["nl"]
                print(f" -> sigma8 = {float(nl.sigma8):.6f} "
                      f"({len(np.asarray(nl.k)) if hasattr(nl, 'k') else 0} "
                      f"k-points x {len(np.asarray(nl.z))} redshifts)",
                      file=sys.stderr)
            elif lv == "transfer" and "tr" in self._cache:
                tr = self._cache["tr"]
                print(f" -> transfer functions at {tr.delta.shape[0]} "
                      f"multipoles x {tr.delta.shape[-1]} wavenumbers",
                      file=sys.stderr)
            elif lv == "spectra" and "sp" in self._cache:
                sp = self._cache["sp"]
                print(f" -> harmonic C_l up to l = {int(sp.ell[-1])}",
                      file=sys.stderr)
            elif lv == "lensing" and "le" in self._cache:
                le = self._cache["le"]
                print(f" -> lensed C_l up to l = {int(le.ell[-1])}",
                      file=sys.stderr)
        except Exception:
            pass

    def compute(self, level: Sequence[str] = ("lensing",)):
        """Pull all stages up to the requested level (classy.pyx compute()).
        Set CLASSPP_PROFILE=<dir> to capture a JAX profiler trace of the run."""
        import os

        cache_path = self._auto_cache_path()
        if cache_path and not self._cache:
            self.load_state(cache_path)
        prof_dir = os.environ.get("CLASSPP_PROFILE")
        if prof_dir:
            import jax.profiler

            with jax.profiler.trace(prof_dir):
                out = self._compute_impl(level)
        else:
            out = self._compute_impl(level)
        if cache_path:
            self.save_state(cache_path)
        return out

    def _compute_impl(self, level: Sequence[str] = ("lensing",)):
        want = max(_LEVELS.index(lv) for lv in level)
        for lv in _LEVELS[: want + 1]:
            if lv == "nonlinear" and not self.out.has_pk:
                continue
            if lv == "spectra" and self.out.has_nc:
                self.number_counts
                if self.out.nCl and self.out.lCl and self.out.has_cls:
                    self.nc_cross
            if lv in ("transfer", "spectra") and not self.out.has_cls:
                continue
            if lv == "lensing" and not (self.out.lensing and self.out.has_cls):
                continue
            if self.verbosity >= 2:
                # per-stage wall-clock with a device sync (the analog of the
                # reference's "Running CLASS version ..." stage chatter at
                # *_verbose >= 2; async dispatch otherwise charges device
                # time to whoever first materializes a value)
                import sys
                import time

                import jax

                t0 = time.time()
                res = getattr(self, lv)
                try:
                    jax.block_until_ready(res)
                except Exception:
                    pass
                print(f"[{lv}] {time.time() - t0:.3f} s", file=sys.stderr)
            else:
                getattr(self, lv)
            self._announce(lv)
        return self
