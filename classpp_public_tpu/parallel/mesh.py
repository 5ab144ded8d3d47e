"""Multi-chip k-mode sharding.

The reference's only parallelism is a shared-memory thread pool over
independent wavenumbers (tools/thread_pool.h, perturbations_module.cpp:668).
The TPU-native equivalent (SURVEY.md 2.5): shard the k-grid over the device
mesh with shard_map — every chip integrates its k-slice in vmapped lockstep —
then all_gather the source table S(k,tau) before the transfer stage, and
reduce C_l quadratures over the sharded q axis with psum.

ICI carries one all_gather of ~50 MB and one psum of the (l x spectra) block;
DCN is only ever needed for parameter-level sweeps (many cosmologies).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "k") -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devs), (axis,))


def n_compute_devices() -> int:
    """Devices on the default backend (the k-sharding width)."""
    return len(jax.devices())


def shard_lanes(mesh: Mesh, arrays, axis: str = "k"):
    """Place per-lane (leading-axis) arrays with the lane axis sharded over
    the mesh. The batched Boltzmann solve is embarrassingly parallel over k,
    so sharding its vmapped lane axis lets GSPMD split the one jitted program
    across all chips with no collectives — the TPU-native equivalent of the
    reference's thread pool over k (tools/thread_pool.h:83,
    perturbations_module.cpp:668)."""
    sh = NamedSharding(mesh, P(axis))
    return [jax.device_put(jnp.asarray(a), sh) for a in arrays]


def pad_to_multiple(arr: np.ndarray, m: int, axis: int = 0, pad_value=None):
    """Pad axis length to a multiple of m (k-grids are not device-count
    aligned; padded modes replicate the last k and are dropped after)."""
    n = arr.shape[axis]
    rem = (-n) % m
    if rem == 0:
        return arr, n
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, rem)
    mode = "edge" if pad_value is None else "constant"
    out = np.pad(arr, pad, mode=mode)
    return out, n


def sharded_solve(mesh: Mesh, solve_one_k, k, tau_ini, t_tca, t_ufa, t_rsa, t_ncfa):
    """Run the vmapped per-k solve with the k axis sharded over the mesh.

    solve_one_k: the closure from models/perturbations/solve.py with
    (taus, bg, th, idx, rtol) bound. Returns (sources, steps) with the leading
    k axis sharded; callers typically all_gather (implicitly, by using the
    result unsharded) before the transfer stage.
    """
    nd = mesh.devices.size
    arrs = [np.asarray(a) for a in (k, tau_ini, t_tca, t_ufa, t_rsa, t_ncfa)]
    padded = [pad_to_multiple(a, nd)[0] for a in arrs]
    n_orig = len(arrs[0])

    vsolve = jax.vmap(solve_one_k)

    def local(k_, ti_, tc_, tu_, tr_, tn_):
        srcs, steps, _ = vsolve(k_, ti_, tc_, tu_, tr_, tn_)
        return srcs, steps

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("k"), P("k"), P("k"), P("k"), P("k"), P("k")),
        out_specs=(P("k"), P("k")),
    ))
    srcs, steps = fn(*[jnp.asarray(a) for a in padded])
    return srcs[:n_orig], steps[:n_orig]


def sharded_cl_quadrature(mesh: Mesh, x, meas, delta_t, delta_e, delta_p,
                          **quad_kw):
    """C_l quadrature with the q axis sharded: per-device partial sums + psum.

    Numerically identical to the production integrator (the reference's
    array_integrate_all_trapzd_or_spline, see spectra.cl_quad_weights): the
    spline integral is a linear functional of the integrand, so the sharded
    form is a local weighted partial sum over each device's q slice plus one
    psum over the mesh — the SURVEY 2.5 design (reference threads the same
    loop, spectra_module.cpp:856).

    x: (nq,) integration variable; meas: (nq,) measure 4 pi/q P(q);
    delta_*: (nl, nq); quad_kw: closed-case options of cl_quad_weights.
    """
    from ..models.spectra import cl_quad_weights

    nd = mesh.devices.size
    w = np.asarray(cl_quad_weights(jnp.asarray(x), **quad_kw))
    meas_p, _ = pad_to_multiple(w * np.asarray(meas), nd, pad_value=0.0)
    dts = []
    for d in (delta_t, delta_e, delta_p):
        dp, _ = pad_to_multiple(np.asarray(d), nd, axis=1, pad_value=0.0)
        dts.append(jnp.asarray(dp))

    def local(m, t, e, p):
        def q2(a, b):
            return jax.lax.psum(jnp.sum(m[None, :] * a * b, axis=-1), "q")

        return jnp.stack([q2(t, t), q2(e, e), q2(t, e), q2(p, p), q2(t, p), q2(e, p)], axis=1)

    mesh_q = Mesh(mesh.devices, ("q",))
    fn = jax.jit(jax.shard_map(
        local, mesh=mesh_q,
        in_specs=(P("q"), P(None, "q"), P(None, "q"), P(None, "q")),
        out_specs=P(None),
    ))
    return fn(jnp.asarray(meas_p), *dts)
