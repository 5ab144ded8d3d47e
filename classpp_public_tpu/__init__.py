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

# XLA:CPU logs a spurious per-cache-load ERROR when deserializing its own AOT
# executables (the +prefer-no-gather/scatter compile OPTIONS are embedded as
# pseudo-features that never appear in the host probe). The load succeeds;
# suppress below-FATAL C++ logging unless the user asked for it.
_os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

# f64 is the validated default; CLASSPP_X32=1 switches the whole pipeline to
# f32 (experimental: faster on TPU VPUs, accuracy under evaluation).
jax.config.update("jax_enable_x64", _os.environ.get("CLASSPP_X32", "") != "1")

# Persistent compilation cache, ON by default (CLASSPP_TPU_CACHE=off to
# disable, or =path to relocate). Entries are written and read on the same
# machine — the cross-machine AOT concern does not apply — and a stale/foreign
# entry is a cache miss, not a crash (verified against the axon remote-TPU
# platform: second-process compile drops ~10x). This is the XLA analog of the
# reference's one-time `make -j`: compile once per program shape, every later
# process pays runtime only.
_cache_dir = _os.environ.get("CLASSPP_TPU_CACHE", "")
if _cache_dir.lower() not in ("off", "0", "none", "disable"):
    if not _cache_dir:
        _root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        _cache_dir = (_os.path.join(_root, ".xla_cache")
                      if _os.access(_root, _os.W_OK)
                      else _os.path.expanduser("~/.cache/classpp_tpu/xla"))
    # per-machine subdirectory: XLA:CPU entries are AOT-compiled against the
    # build host's exact CPU features and can SIGILL elsewhere — a cache dir
    # shared across machines (shared FS, repo checkout moved) must never serve
    # another host's binaries
    try:
        import hashlib as _hl
        import platform as _pf

        try:
            with open("/proc/cpuinfo") as _f:
                _flags = [ln for ln in _f if ln.startswith("flags")][0]
        except Exception:
            _flags = _pf.processor()
        _tag = _hl.sha256(f"{_pf.machine()}-{_flags}".encode()).hexdigest()[:12]
        _cache_dir = _os.path.join(_cache_dir, _tag)
    except Exception:
        pass
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # cache EVERYTHING: on remote-compile platforms even a "fast" compile
        # pays a tunnel round-trip, and dozens of small jitted helpers add up
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        # JAX-level executable serialization only: the XLA:CPU AOT sub-cache
        # embeds compile-preference pseudo-features (+prefer-no-gather) that
        # never appear in the host feature probe, so its entries fail the
        # strict feature check on EVERY load (cpu_aot_loader "SIGILL" spam)
        # and the cache degrades to a miss + warning per program
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:
        pass

from .config.params import CosmoParams  # noqa: E402
from .config.precision import PrecisionParams  # noqa: E402
from .pipeline import Cosmology, OutputSelection  # noqa: E402
from .classy import Class, CosmoComputationError, CosmoSevereError  # noqa: E402

__version__ = "0.1.0"

__all__ = ["CosmoParams", "PrecisionParams", "Cosmology", "OutputSelection",
           "Class", "CosmoSevereError", "CosmoComputationError", "__version__"]
