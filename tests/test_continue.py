"""init_mode="continue" / segmented-run support.

The reference declares a "continue" init mode but leaves it unimplemented
(pvSimPCR.py:357 is `pass`, and the README's [new|new+|load] CLI modes are
never read).  Here it is a real capability: bit-exact segmentation via
history carry at the solver level, and a physical-unit full-state restart
at the pvsim level.
"""
import numpy as np
import jax.numpy as jnp

from bayesian_inference_trpl_tpu import physics
from bayesian_inference_trpl_tpu.models.driver import (
    SimParams, initial_excess_density, nondim_state, pl_log_scale, pvsim,
    redim_state)
from bayesian_inference_trpl_tpu.models.solver import (
    FusedObs, SolverConfig, solve)

from conftest import sample_mat_par


def _problem(T, batch=2, seed=7):
    rng = np.random.default_rng(seed)
    mat = sample_mat_par(rng, batch)
    sim = SimParams(length=311.0, time=2000.0 * T / 80000, L=128, T=T,
                    pl_stride=1)
    mat_nd = jnp.asarray(physics.nondimensionalize(mat, sim.dx, sim.dt))
    dn = initial_excess_density(sim, (1e18 / 1e7 ** 3, 100.0), "exp")
    n0 = mat_nd[:, 0:1] + dn[None, :]
    p0 = mat_nd[:, 1:2] + dn[None, :]
    e0 = jnp.zeros_like(n0)
    cfg = SolverConfig(num_steps=T, pl_stride=1, tol=1e-9, max_iters=100,
                       method="coupled_newton")
    return sim, mat, mat_nd, n0, p0, e0, cfg


def test_segmented_run_bit_exact():
    """T/2 + history-carried continuation reproduces the single run
    bitwise: state, PL trace, and fused likelihood accumulators."""
    T, T1 = 40, 20
    sim, mat, mat_nd, n0, p0, e0, cfg = _problem(T)
    obs = FusedObs(values=jnp.full((1, T + 1), -3.0),
                   log_scale=jnp.asarray(pl_log_scale(sim)), min_val=1e-300)

    r_full = solve(mat_nd, n0, p0, e0, cfg, obs=obs, record_pl=True)

    cfg1 = cfg._replace(num_steps=T1)
    obs1 = FusedObs(values=obs.values[:, :T1 + 1], log_scale=obs.log_scale,
                    min_val=obs.min_val)
    r1 = solve(mat_nd, n0, p0, e0, cfg1, obs=obs1, record_pl=True,
               return_hist=True)
    obs2 = FusedObs(values=obs.values[:, T1:], log_scale=obs.log_scale,
                    min_val=obs.min_val)
    r2 = solve(mat_nd, n0, p0, e0, cfg._replace(num_steps=T - T1), obs=obs2,
               record_pl=True, start_step=T1, init_hist=r1.hist,
               acc0=(r1.sse, r1.err_sum))

    np.testing.assert_array_equal(np.asarray(r2.n), np.asarray(r_full.n))
    np.testing.assert_array_equal(np.asarray(r2.p), np.asarray(r_full.p))
    np.testing.assert_array_equal(np.asarray(r2.e), np.asarray(r_full.e))
    # PL: segment 2 trace starts at the boundary point.
    pl_split = np.concatenate([np.asarray(r1.pl), np.asarray(r2.pl)[:, 1:]],
                              axis=1)
    np.testing.assert_array_equal(pl_split, np.asarray(r_full.pl))
    np.testing.assert_array_equal(np.asarray(r2.sse), np.asarray(r_full.sse))
    np.testing.assert_array_equal(np.asarray(r2.err_sum),
                                  np.asarray(r_full.err_sum))
    assert np.asarray(r2.converged).all()


def test_segmented_run_normalized_anchor():
    """obs.normalize=True continuation: the run-t=0 PL anchor must be
    carried across segments (pl0=); re-deriving it from the segment-start
    state would offset every log-PL by log10(pl_seg0/pl_t0)."""
    import pytest
    from bayesian_inference_trpl_tpu.models.solver import pl_observable
    from bayesian_inference_trpl_tpu.models.trpl import MatParams

    T, T1 = 40, 20
    sim, mat, mat_nd, n0, p0, e0, cfg = _problem(T)
    obs = FusedObs(values=jnp.full((1, T + 1), -3.0),
                   log_scale=jnp.asarray(pl_log_scale(sim)), min_val=1e-300,
                   normalize=True)

    r_full = solve(mat_nd, n0, p0, e0, cfg, obs=obs, record_pl=False)

    cfg1 = cfg._replace(num_steps=T1)
    obs1 = FusedObs(values=obs.values[:, :T1 + 1], log_scale=obs.log_scale,
                    min_val=obs.min_val, normalize=True)
    r1 = solve(mat_nd, n0, p0, e0, cfg1, obs=obs1, record_pl=False,
               return_hist=True)
    obs2 = FusedObs(values=obs.values[:, T1:], log_scale=obs.log_scale,
                    min_val=obs.min_val, normalize=True)
    pl0 = pl_observable(n0, p0, MatParams.from_array(mat_nd))
    r2 = solve(mat_nd, n0, p0, e0, cfg._replace(num_steps=T - T1), obs=obs2,
               record_pl=False, start_step=T1, init_hist=r1.hist,
               acc0=(r1.sse, r1.err_sum), pl0=pl0)
    np.testing.assert_array_equal(np.asarray(r2.sse), np.asarray(r_full.sse))
    np.testing.assert_array_equal(np.asarray(r2.err_sum),
                                  np.asarray(r_full.err_sum))

    # Without the anchor the call must refuse rather than silently offset.
    with pytest.raises(ValueError, match="pl0"):
        solve(mat_nd, n0, p0, e0, cfg._replace(num_steps=T - T1), obs=obs2,
              record_pl=False, start_step=T1, init_hist=r1.hist,
              acc0=(r1.sse, r1.err_sum))


def test_pvsim_continue_mode():
    """Physical-unit full-state restart: half run -> redim_state ->
    continue.  The BDF order ramp restarts at the boundary, so agreement is
    to discretization accuracy, not bitwise."""
    T, T1 = 60, 30
    sim, mat, mat_nd, n0, p0, e0, cfg = _problem(T)

    r_full = pvsim(mat, sim, (1e18 / 1e7 ** 3, 100.0), init_mode="exp")

    sim1 = SimParams(length=sim.length, time=sim.time * T1 / T, L=sim.L, T=T1)
    r1 = pvsim(mat, sim1, (1e18 / 1e7 ** 3, 100.0), init_mode="exp")
    state = redim_state(r1, sim1)
    r2 = pvsim(mat, sim1, state, init_mode="continue")

    pl_full = np.asarray(r_full.pl)[:, T1:]
    pl_cont = np.asarray(r2.pl)
    # log-PL agreement to solver (dt-ramp) accuracy.
    dev = np.abs(np.log10(pl_cont) - np.log10(pl_full))
    assert dev.max() < 2e-3, dev.max()
    # The boundary sample itself is exact up to the unit round-trip.
    np.testing.assert_allclose(pl_cont[:, 0], np.asarray(r_full.pl)[:, T1],
                               rtol=1e-12)


def test_nondim_state_round_trip():
    T = 8
    sim, mat, mat_nd, n0, p0, e0, cfg = _problem(T)
    r = solve(mat_nd, n0, p0, e0, cfg)
    n_d, p_d, e_d = redim_state(r, sim)
    n_b, p_b, e_b = nondim_state(n_d, p_d, e_d, sim)
    np.testing.assert_allclose(np.asarray(n_b), np.asarray(r.n), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(p_b), np.asarray(r.p), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(e_b), np.asarray(r.e), rtol=1e-14)
