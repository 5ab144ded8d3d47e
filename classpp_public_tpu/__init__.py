"""classpp_public_tpu — TPU-native JAX Einstein-Boltzmann framework.

A ground-up rebuild of the capabilities of CLASS++ (AarhusCosmology/
CLASSpp_public, CLASS v2.9.0 lineage) designed for TPU: the whole k-grid
integrates in lockstep under vmap/shard_map instead of one adaptive ODE solve
per wavenumber, tables live on uniform grids for O(1) branch-free lookup, and
the line-of-sight transfer integrals are a single Bessel-recurrence scan with
fused contractions.

Double precision is required for sub-permille C_ell accuracy.
"""

import os as _os

import jax

# f64 is the validated default; CLASSPP_X32=1 switches the whole pipeline to
# f32 (experimental: faster on TPU VPUs, accuracy under evaluation).
jax.config.update("jax_enable_x64", _os.environ.get("CLASSPP_X32", "") != "1")

# optional persistent compilation cache (opt-in: cross-machine AOT artifacts
# from remote-compile services can be incompatible with the local host).
_cache_dir = _os.environ.get("CLASSPP_TPU_CACHE")
if _cache_dir:
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

from .config.params import CosmoParams  # noqa: E402
from .config.precision import PrecisionParams  # noqa: E402
from .pipeline import Cosmology, OutputSelection  # noqa: E402
from .classy import Class, CosmoComputationError, CosmoSevereError  # noqa: E402

__version__ = "0.1.0"

__all__ = ["CosmoParams", "PrecisionParams", "Cosmology", "OutputSelection",
           "Class", "CosmoSevereError", "CosmoComputationError", "__version__"]
