"""Perturbation module vs reference golden per-k evolution files.

The golden files (k_output_values in tests/golden/gen/g1_lcdm.ini) hold the
full synchronous-gauge evolution of each mode; phi/psi exercise the complete
Einstein + hierarchy + TCA/UFA/RSA pipeline.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from classpp_public_tpu import CosmoParams, PrecisionParams
from classpp_public_tpu.models import background as bgm
from classpp_public_tpu.models import thermodynamics as thm
from classpp_public_tpu.models.perturbations import grids as pg
from classpp_public_tpu.models.perturbations import solve as ps
from classpp_public_tpu.models.perturbations.indices import PtIdx, SrcIdx

K_OUTPUT = [1e-4, 1e-3, 1e-2, 0.05, 0.1, 0.5]  # matches g1_lcdm.ini k_output_values


@pytest.fixture(scope="module")
def pipeline(g1_params):
    pr = PrecisionParams()
    bg, bidx = bgm.compute_background(g1_params, pr)
    th = thm.compute_thermodynamics(g1_params, pr, bg, bidx)
    return pr, bg, bidx, th


@pytest.fixture(scope="module")
def sources_at_koutput(pipeline):
    pr, bg, bidx, th = pipeline
    taus = pg.get_tau_sampling(None, pr, bg, bidx, th)
    ks = np.array(K_OUTPUT)
    sched = pg.get_k_schedule(ks, pr, bg, bidx, th, tau_first_sample=float(taus[0]))
    idx = PtIdx(pr.l_max_g, pr.l_max_pol_g, pr.l_max_ur)
    solve = ps.get_batch_solver(bidx.key, idx)
    sc = ps.SolverScalars.make(pr.tol_perturb_integration, lanes=len(sched.k))
    srcs, nsteps, _ = solve(jnp.asarray(sched.k), jnp.asarray(sched.tau_ini),
                            jnp.asarray(sched.tau_tca_off), jnp.asarray(sched.tau_ufa_on),
                            jnp.asarray(sched.tau_rsa_on), jnp.asarray(sched.tau_ncdmfa_on),
                            jnp.asarray(taus), bg.lntau_spline, th.lntau_spline, None, sc)
    return taus, np.asarray(srcs), np.asarray(nsteps)


def test_metric_potentials_vs_golden(sources_at_koutput, g1):
    taus, srcs, _ = sources_at_koutput
    six = SrcIdx.ix
    for i, k in enumerate(K_OUTPUT):
        cols = [str(c) for c in g1.cols(f"perturbations_k{i}_s")]
        T = g1.table(f"perturbations_k{i}_s")
        taur = T[:, cols.index("tau [Mpc]")]
        m = (taur > taus[0] * 1.02) & (taur < 14000)
        for name in ["phi", "psi"]:
            mine = np.interp(taur, taus, srcs[i, :, six[name]])
            ref = T[:, cols.index(name)]
            err = np.max(np.abs(mine[m] - ref[m])) / np.max(np.abs(ref[m]))
            assert err < 1e-3, (k, name, err)


def test_step_counts_reasonable(sources_at_koutput):
    _, _, nsteps = sources_at_koutput
    # lockstep RKCK should stay within a few thousand steps per mode
    assert nsteps.max() < 12000
    assert nsteps.min() > 100


def test_external_pk_generator_matches_analytic():
    """external_Pk: the shipped example generator (external_Pk/
    generate_Pk_example.py) reproduces the analytic tilted power law, and
    the command receives the reference's appended "k_min k_max
    k_per_decade" arguments (primordial_module.cpp:3078)."""
    import sys

    import numpy as np

    from classpp_public_tpu.models.primordial import external_spectrum

    lnk, lnp_s, lnp_t = external_spectrum(
        f"{sys.executable} external_Pk/generate_Pk_example.py 1e-4 1.0 10")
    k = np.exp(np.asarray(lnk))
    ps = np.exp(np.asarray(lnp_s))
    ref = 2.100549e-9 * (k / 0.05) ** (0.9660499 - 1.0)
    assert np.max(np.abs(ps / ref - 1)) < 1e-12
    assert lnp_t is None
