"""Multi-device sharding tests on the virtual 8-device CPU mesh (conftest).

Validates that the k-sharded paths reproduce the unsharded lockstep solve
(identical step sequences, roundoff-level sources) — the contract for the
TPU-native replacement of the reference thread pool over k (thread_pool.h:83,
perturbations_module.cpp:668-718).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def small_pipeline():
    from classpp_public_tpu import CosmoParams, PrecisionParams
    from classpp_public_tpu.models import background as bgm
    from classpp_public_tpu.models import thermodynamics as thm

    params = CosmoParams()
    pr = PrecisionParams(background_Nloga=1024, recfast_Nz0=4000,
                         perturb_sampling_stepsize=1.0,
                         tol_perturb_integration=1e-4)
    bg, bidx = bgm.compute_background(params, pr)
    th = thm.compute_thermodynamics(params, pr, bg, bidx)
    return params, pr, bg, bidx, th


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_solve_matches_unsharded(small_pipeline):
    from functools import partial

    from classpp_public_tpu.models.perturbations import grids as pg
    from classpp_public_tpu.models.perturbations import solve as ps
    from classpp_public_tpu.models.perturbations.indices import PtIdx
    from classpp_public_tpu.parallel.mesh import make_mesh, sharded_solve

    params, pr, bg, bidx, th = small_pipeline
    taus = pg.get_tau_sampling(params, pr, bg, bidx, th)
    ks = np.geomspace(1e-4, 0.2, 16)
    sched = pg.get_k_schedule(ks, pr, bg, bidx, th, tau_first_sample=float(taus[0]))
    idx = PtIdx(pr.l_max_g, pr.l_max_pol_g, pr.l_max_ur)

    solve = partial(ps.solve_one_k, taus=jnp.asarray(taus),
                    bg_spline=bg.lntau_spline, th_spline=th.lntau_spline,
                    ncdm=None, bidx=bidx, idx=idx, rtol=1e-4)
    args = tuple(jnp.asarray(a) for a in
                 (sched.k, sched.tau_ini, sched.tau_tca_off, sched.tau_ufa_on,
                  sched.tau_rsa_on, sched.tau_ncdmfa_on))

    src_ref, steps_ref, _ = jax.vmap(solve)(*args)
    mesh = make_mesh(8)
    src_sh, steps_sh = sharded_solve(mesh, solve, *args)

    assert np.asarray(steps_sh).tolist() == np.asarray(steps_ref).tolist()
    # identical step sequences; shard_map only reorders fusion, so agreement
    # is at roundoff of the smallest source entries
    np.testing.assert_allclose(np.asarray(src_sh), np.asarray(src_ref),
                               rtol=3e-8, atol=1e-18)


def test_sharded_cl_quadrature_matches_production():
    """The psum quadrature must reproduce the production spline integrator
    (spectra.cl_spline_quad = the reference array_integrate_all_trapzd_or_
    spline) exactly: the integral is a linear functional, so local weighted
    partial sums + psum commute with it up to roundoff."""
    from classpp_public_tpu.models.spectra import cl_spline_quad
    from classpp_public_tpu.parallel.mesh import make_mesh, sharded_cl_quadrature

    nl, nq = 8, 37       # deliberately not a multiple of 8 (padding path)
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0.01, 1.0, nq))
    meas = rng.uniform(size=nq)
    dt = rng.normal(size=(nl, nq))
    de = rng.normal(size=(nl, nq))
    dp = rng.normal(size=(nl, nq))
    mesh = make_mesh(8)
    cls = np.asarray(sharded_cl_quadrature(mesh, x, meas, dt, de, dp))

    def q2(a, b):
        I = (meas[None, :] * a * b).T      # (nq, nl)
        return np.asarray(cl_spline_quad(jnp.asarray(x), jnp.asarray(I)))

    expect = np.stack([q2(dt, dt), q2(de, de), q2(dt, de),
                       q2(dp, dp), q2(dt, dp), q2(de, dp)], axis=1)
    np.testing.assert_allclose(cls, expect, rtol=1e-10, atol=1e-14)


def test_full_pipeline_sharded_matches_unsharded():
    """End-to-end C_l parity: the full production pipeline (perturbations ->
    transfer -> spectra -> lensing) under the 8-device mesh must match a
    single-device run. Perturbations shard lanes, transfer runs GSPMD with
    the q axis sharded, spectra contracts against the quadrature weights
    (XLA inserts the reduction collective)."""
    from unittest import mock

    from classpp_public_tpu import (Cosmology, CosmoParams, OutputSelection,
                                    PrecisionParams)

    pr = PrecisionParams(background_Nloga=1024, recfast_Nz0=4000,
                         perturb_sampling_stepsize=1.0,
                         tol_perturb_integration=1e-4, k_chunk_size=8)
    out = OutputSelection(tCl=True, pCl=True, lCl=True, lensing=True,
                          l_scalar_max=100, P_k_max=0.2)

    cos = Cosmology(CosmoParams(), precision=pr, output=out)
    cl_multi = np.asarray(cos.lensing.cl)

    with mock.patch("classpp_public_tpu.parallel.mesh.n_compute_devices",
                    return_value=1):
        cos1 = Cosmology(CosmoParams(), precision=pr.replace(k_chunk_size=64),
                         output=out)
        cl_single = np.asarray(cos1.lensing.cl)

    assert np.isfinite(cl_multi).all()
    np.testing.assert_allclose(cl_multi, cl_single, rtol=5e-6, atol=1e-300)


def test_pipeline_shards_over_devices(small_pipeline):
    """compute_perturbations auto-shards lanes over all 8 CPU devices and
    must agree with a single-device run to lockstep determinism."""
    from unittest import mock

    from classpp_public_tpu.models.perturbations import solve as ps

    params, pr, bg, bidx, th = small_pipeline
    kwargs = dict(l_scalar_max=100, k_max_for_pk=0.5, has_cls=True, has_pk=True)
    # chunk layouts must coincide (chunk boundaries set shared window splits),
    # so pick k_chunk_size * n_dev equal in both runs
    res_multi = ps.compute_perturbations(params, pr.replace(k_chunk_size=8),
                                         bg, bidx, th, **kwargs)
    with mock.patch("classpp_public_tpu.parallel.mesh.n_compute_devices",
                    return_value=1):
        res_single = ps.compute_perturbations(params, pr.replace(k_chunk_size=64),
                                              bg, bidx, th, **kwargs)
    assert res_multi.sources.shape == res_single.sources.shape
    # sharded-lane fusion reorders float ops; agreement is at roundoff of the
    # smallest source entries, far below the 3e-3 physics contract
    np.testing.assert_allclose(np.asarray(res_multi.sources),
                               np.asarray(res_single.sources),
                               rtol=1e-7, atol=1e-300)
