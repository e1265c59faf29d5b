"""The in-scan fused likelihood must equal the unfused pipeline
(materialize PL -> clamp-log10 -> SSE with magnitude offset) exactly."""
import numpy as np
import jax.numpy as jnp
import pytest

from bayesian_inference_trpl_tpu import physics
from bayesian_inference_trpl_tpu.models import FusedObs, SimParams, pl_log_scale, pvsim
from bayesian_inference_trpl_tpu.ops import likelihood as lk

from conftest import sample_mat_par


def _setup(rng, batch=3):
    mat = sample_mat_par(rng, batch)
    mat[:, 11] = 0.1 * physics.UNIT_CONVERSIONS[11]  # weak coupling: fast Newton
    sim = SimParams(length=311.0, time=1.0, L=128, T=40, pl_stride=1,
                    tol_exp=7, max_iters=2000)
    a = 1e18 / 1e7 ** 3
    xg = (np.arange(sim.L) + 0.5) * sim.dx
    init_dn = a * np.exp(-xg / 100.0)
    return mat, sim, init_dn


def test_fused_equals_unfused(rng):
    mat, sim, init_dn = _setup(rng)
    batch = len(mat)
    num_exp = 2
    obs = rng.uniform(-8, -2, (num_exp, sim.num_pl))
    mag = rng.uniform(-0.5, 0.5, batch)

    # Unfused: PL trace -> log10 -> SSE.
    res_pl = pvsim(mat, sim, init_dn, init_mode="points")
    pl_log = np.asarray(lk.fastlog(jnp.asarray(np.asarray(res_pl.pl))))
    expected = np.stack([
        np.asarray(lk.log_likelihood(jnp.asarray(pl_log), jnp.asarray(obs[e]),
                                     jnp.asarray(mag)))
        for e in range(num_exp)])

    # Fused: running sums in the scan + closed-form offset.
    fobs = FusedObs(values=jnp.asarray(obs), log_scale=jnp.asarray(pl_log_scale(sim)),
                    min_val=lk.FLOAT_MIN)
    res_f = pvsim(mat, sim, init_dn, init_mode="points", obs=fobs, record_pl=False)
    got = np.asarray(lk.log_likelihood_from_terms(
        res_f.sse, res_f.err_sum, sim.num_pl, jnp.asarray(mag)[None, :]))

    np.testing.assert_allclose(got, expected, rtol=1e-8, atol=1e-8)


def test_fused_self_normalize(rng):
    mat, sim, init_dn = _setup(rng, batch=2)
    obs = rng.uniform(-4, 0, (1, sim.num_pl))

    res_pl = pvsim(mat, sim, init_dn, init_mode="points")
    pl = np.asarray(res_pl.pl)
    pl_log = np.asarray(lk.fastlog(jnp.asarray(pl / pl[:, 0:1])))
    expected = -np.sum((pl_log - obs[0][None, :]) ** 2, axis=1)

    fobs = FusedObs(values=jnp.asarray(obs), log_scale=jnp.asarray(0.0),
                    min_val=lk.FLOAT_MIN, normalize=True)
    res_f = pvsim(mat, sim, init_dn, init_mode="points", obs=fobs, record_pl=False)
    got = np.asarray(lk.log_likelihood_from_terms(
        res_f.sse, res_f.err_sum, sim.num_pl, 0.0))[0]
    np.testing.assert_allclose(got, expected, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("method", [
    pytest.param("coupled_newton", marks=pytest.mark.smoke),
    "fused_horizon_chord"])
def test_fused_likelihood_finite_at_pl_floor(method):
    """PL that decays to (or starts at) exact zero in float32 must yield
    FINITE likelihood terms, not NaN: min_val = sys.float_info.min rounds
    to 0.0 in f32, log10(0) = -inf, and the coarse-phase Lagrange dense
    output (mixed-sign weights) turns that into NaN sse on CONVERGED
    samples — the bulk of the r2/r3 production "non-converged" NaN
    populations (tau_n-bottom corner; docs/PRECISION.md).  The clamp floor
    is now dtype-aware in _log_pl / the horizon kernel / fastlog.

    Parametrized so the fast scan-path variant can run in the smoke tier
    while the Mosaic-interpreted kernel variant (minutes on one core)
    stays in the full suite."""
    import sys
    import jax.numpy as jnp
    from bayesian_inference_trpl_tpu import physics
    from bayesian_inference_trpl_tpu.models.driver import (
        SimParams, pl_log_scale)
    from bayesian_inference_trpl_tpu.models.solver import (
        FusedObs, SolverConfig)
    from bayesian_inference_trpl_tpu.models.twophase import solve_multiphase
    from bayesian_inference_trpl_tpu.ops.likelihood import fastlog

    rng = np.random.default_rng(7)
    mat = sample_mat_par(rng, 4)
    T = 48
    sim = SimParams(length=311.0, time=2000.0 * T / 80000, L=128, T=T)
    dtype = jnp.float32
    mat_nd = jnp.asarray(physics.nondimensionalize(mat, sim.dx, sim.dt),
                         dtype)
    # Equilibrium initial state: dn = 0 -> pl_observable == 0.0 exactly.
    n0 = jnp.broadcast_to(mat_nd[:, 0:1], (4, sim.L)).astype(dtype)
    p0 = jnp.broadcast_to(mat_nd[:, 1:2], (4, sim.L)).astype(dtype)
    obs = FusedObs(values=jnp.asarray(rng.uniform(-4, -2, (1, T + 1)), dtype),
                   log_scale=jnp.asarray(pl_log_scale(sim), dtype),
                   min_val=sys.float_info.min)
    sched = ((1, 16), (8, 32))
    cfg = SolverConfig(num_steps=T, pl_stride=1, tol=1e-4, max_iters=8,
                       method=method, predictor="linear", step_tol=1e-6)
    r = solve_multiphase(mat_nd, n0, p0, jnp.zeros_like(n0), cfg, obs,
                         sched)
    assert np.asarray(r.converged).all(), method
    assert np.isfinite(np.asarray(r.sse)).all(), method
    assert np.isfinite(np.asarray(r.err_sum)).all(), method

    # fastlog (interp path) with an exact-zero f32 PL value.
    out = np.asarray(fastlog(jnp.zeros((2, 3), jnp.float32)))
    assert np.isfinite(out).all()
