"""Device-placement helpers.

The pipeline splits work by hardware affinity: the batched k-grid Boltzmann
solve, transfer contraction and C_l quadratures run on the accelerator, while
the small sequential setup stages (background ODEs over a 4k-point ln(a) grid,
the 20k-step RECFAST scan) run on the HOST CPU backend — they are latency-
dominated (many small sequential ops, native f64) and would otherwise pay a
device round-trip per op, which is especially costly over remote-TPU tunnels.

Reference analog: the C++ code runs everything on the CPU; only the hot
per-k loops are threaded (tools/thread_pool.h). Here the same split maps the
hot loops to the TPU and keeps the scalar setup native.
"""

from __future__ import annotations

import contextlib
import os
from functools import lru_cache

import jax


@lru_cache(maxsize=1)
def _host_cpu_device():
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def on_host_cpu():
    """Context manager placing computations on the host CPU backend (no-op if
    the process is already CPU-only, e.g. under the test conftest)."""
    dev = _host_cpu_device()
    if dev is None or jax.default_backend() == "cpu":
        return contextlib.nullcontext()
    return jax.default_device(dev)
