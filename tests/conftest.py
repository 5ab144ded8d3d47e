import os

# Tests run on a virtual 8-device CPU mesh: sharding logic is validated without
# TPU hardware; the driver separately dry-runs the multi-chip path.
os.environ["JAX_PLATFORMS"] = "cpu"  # the shell presets a TPU platform plugin
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
# XLA:CPU logs a spurious per-cache-hit ERROR when deserializing its own AOT
# executables: the compile-feature set embeds the +prefer-no-scatter/gather
# compile *options* as pseudo-features which never appear in the host feature
# probe, so every persistent-cache load warns about a machine mismatch that
# is not one. Suppress below-FATAL C++ logging in tests to keep logs readable.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

# env var alone is not enough when a platform plugin (axon) is preloaded via
# sitecustomize — the config flag wins.
jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


class Golden:
    """Loader for reference golden tables with column-name access."""

    def __init__(self, npz_path):
        self._z = np.load(npz_path)

    def table(self, name):
        return self._z[name]

    def cols(self, name):
        return list(self._z[name + "__cols"])

    def col(self, name, col_substr):
        cols = self.cols(name)
        exact = [i for i, c in enumerate(cols) if str(c) == col_substr]
        if len(exact) == 1:
            return self._z[name][:, exact[0]]
        matches = [i for i, c in enumerate(cols) if col_substr in str(c)]
        if len(matches) != 1:
            raise KeyError(f"column {col_substr!r} in {name}: matches {[cols[i] for i in matches]}")
        return self._z[name][:, matches[0]]


@pytest.fixture(scope="session")
def g1():
    return Golden(GOLDEN_DIR / "g1_lcdm.npz")


@pytest.fixture(scope="session")
def g1_params():
    """CosmoParams matching tests/golden/gen/g1_lcdm.ini."""
    from classpp_public_tpu import CosmoParams

    return CosmoParams(
        h=0.67810,
        T_cmb=2.7255,
        omega_b=0.02238280,
        omega_cdm=0.1201075,
        N_ur=3.046,
        Omega_k=0.0,
        A_s=2.100549e-09,
        n_s=0.9660499,
        tau_reio=0.05430842,
    )
