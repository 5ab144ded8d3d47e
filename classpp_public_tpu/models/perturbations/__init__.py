"""Scalar perturbations (L5) — see solve.compute_perturbations."""

from .indices import PtIdx, SrcIdx
from .solve import PerturbResult, compute_perturbations

__all__ = ["PtIdx", "SrcIdx", "PerturbResult", "compute_perturbations"]
