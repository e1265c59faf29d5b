"""Two-phase fast solver: dt-rescaling exactness and likelihood agreement
with the single-phase (reference-equivalent) solver."""
import numpy as np
import jax.numpy as jnp
import pytest

from bayesian_inference_trpl_tpu import physics
from bayesian_inference_trpl_tpu.models.driver import (
    SimParams, initial_excess_density, pl_log_scale)
from bayesian_inference_trpl_tpu.models.solver import FusedObs, SolverConfig, solve
from bayesian_inference_trpl_tpu.models.twophase import (
    _lagrange_weight_table, geometric_schedule, rescale_dt, solve_multiphase,
    solve_two_phase)

from conftest import sample_mat_par


def test_rescale_dt_matches_nondim():
    mat = np.array([[1e8, 1e15, 20.0, 35.0, 5e-10, 50.0, 10.0, 1e-29, 1e-29,
                     500.0, 800.0, 0.1]]) * physics.UNIT_CONVERSIONS[:12]
    dx, dt = 311 / 128, 0.025
    a = physics.nondimensionalize(mat, dx, dt)
    b = physics.nondimensionalize(mat, dx, 8 * dt)
    c = np.asarray(rescale_dt(jnp.asarray(a), 8))
    np.testing.assert_allclose(b, c, rtol=1e-13)


def test_weight_table_reproduces_polynomials():
    """Cubic row must reproduce any cubic exactly; node offset is exact in
    every row."""
    S = 8
    tab = _lagrange_weight_table(S)
    nodes = np.array([0.0, 1.0, 2.0, 3.0])
    for coeffs in ([1, 0, 0, 0], [0, 1, 0, 0], [1, -2, 0.5, 0.1]):
        poly = np.polynomial.polynomial.Polynomial(coeffs)
        vals = poly(nodes)
        for j in range(1, S + 1):
            x = 2.0 + j / S
            got = tab[2, j - 1] @ vals
            np.testing.assert_allclose(got, poly(x), rtol=1e-12, atol=1e-12)
    # linear row: exact for linear functions on nodes {2, 3}
    for j in range(1, S + 1):
        got = tab[0, j - 1] @ np.array([0, 0, 2.0, 3.0])
        np.testing.assert_allclose(got, 2.0 + j / S, rtol=1e-12)
    # node offset j = S is the identity in all rows
    for r in range(3):
        w = tab[r, S - 1]
        np.testing.assert_allclose(w, [0, 0, 0, 1], atol=1e-12)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(3)
    B, T = 2, 240
    mat = sample_mat_par(rng, B)
    mat[:, 11] = 0.1 * physics.UNIT_CONVERSIONS[11]
    sim = SimParams(length=311.0, time=2000.0 * T / 80000, L=128, T=T, pl_stride=1)
    mat_nd = jnp.asarray(physics.nondimensionalize(mat, sim.dx, sim.dt))
    dn = initial_excess_density(sim, (1e18 / 1e7 ** 3, 100.0), "exp")
    n0 = mat_nd[:, 0:1] + dn[None, :]
    p0 = mat_nd[:, 1:2] + dn[None, :]
    e0 = jnp.zeros_like(n0)
    cfg = SolverConfig(num_steps=T, pl_stride=1, tol=1e-9, max_iters=100,
                       method="coupled_newton")
    # observation = sample 0's own fine-solver curve
    r_pl = solve(mat_nd, n0, p0, e0, cfg, record_pl=True)
    lp = np.log10(np.asarray(r_pl.pl) / (sim.dx ** 2 * sim.dt))
    obs = FusedObs(values=jnp.asarray(lp[0:1]),
                   log_scale=jnp.asarray(pl_log_scale(sim)), min_val=1e-300)
    return sim, mat_nd, n0, p0, e0, cfg, obs


def test_two_phase_matches_single_phase(problem):
    sim, mat_nd, n0, p0, e0, cfg, obs = problem
    r_fine = solve(mat_nd, n0, p0, e0, cfg, obs=obs, record_pl=False)
    r_two = solve_two_phase(mat_nd, n0, p0, e0, cfg, obs,
                            fine_steps=112, coarse_stride=8)
    assert np.asarray(r_two.converged).all()
    n_obs = sim.num_pl
    # Sample 0 fits its own observation exactly in the fine solver; the
    # two-phase sse for it measures the coarse+interp deviation directly.
    rms_dev = np.sqrt(np.asarray(r_two.sse)[0, 0] / n_obs)
    assert rms_dev < 5e-5, rms_dev
    # For genuinely mismatched samples the likelihood terms agree closely.
    sse_f = np.asarray(r_fine.sse)[0, 1]
    sse_t = np.asarray(r_two.sse)[0, 1]
    assert abs(sse_t - sse_f) / max(sse_f, 1.0) < 1e-3
    es_f = np.asarray(r_fine.err_sum)[0, 1]
    es_t = np.asarray(r_two.err_sum)[0, 1]
    assert abs(es_t - es_f) < 0.05


def test_two_phase_shape_validation(problem):
    sim, mat_nd, n0, p0, e0, cfg, obs = problem
    with pytest.raises(ValueError):
        solve_two_phase(mat_nd, n0, p0, e0, cfg, obs,
                        fine_steps=111, coarse_stride=8)  # (240-111) % 8 != 0


def test_geometric_schedule_covers_horizon():
    # Production shape: ladder 8 -> 16 -> 32 -> 64, final phase absorbs rest.
    sched = geometric_schedule(80000, 2048, base_stride=8, growth=2,
                               coarse_steps_per_phase=1024, max_stride=64)
    assert sched[0][0] == 1
    assert [s for s, _ in sched] == [1, 8, 16, 32, 64]
    assert sum(n for _, n in sched) == 80000
    assert all(n % s == 0 for s, n in sched)
    # Leftover folding: a horizon that is not stride-aligned still sums.
    sched = geometric_schedule(80001, 2048, base_stride=8, max_stride=64)
    assert sum(n for _, n in sched) == 80001
    assert all(n % s == 0 for s, n in sched)
    # Short horizons degrade to a single fine phase.
    assert geometric_schedule(100, 2048) == ((1, 100),)
    assert geometric_schedule(2053, 2048, base_stride=8) == ((1, 2053),)


def test_multiphase_matches_single_phase(problem):
    """The stride ladder must agree with reference-equivalent stepping at
    the same fidelity as the plain two-phase split."""
    sim, mat_nd, n0, p0, e0, cfg, obs = problem
    r_fine = solve(mat_nd, n0, p0, e0, cfg, obs=obs, record_pl=False)
    sched = ((1, 112), (8, 32), (16, 64), (32, 32))
    r_m = solve_multiphase(mat_nd, n0, p0, e0, cfg, obs, sched)
    assert np.asarray(r_m.converged).all()
    n_obs = sim.num_pl
    rms_dev = np.sqrt(np.asarray(r_m.sse)[0, 0] / n_obs)
    assert rms_dev < 5e-5, rms_dev
    sse_f = np.asarray(r_fine.sse)[0, 1]
    sse_m = np.asarray(r_m.sse)[0, 1]
    assert abs(sse_m - sse_f) / max(sse_f, 1.0) < 1e-3
    es_f = np.asarray(r_fine.err_sum)[0, 1]
    es_m = np.asarray(r_m.err_sum)[0, 1]
    assert abs(es_m - es_f) < 0.05


def test_multiphase_fused_horizon_fine_phase(problem, monkeypatch):
    """cfg.method="fused_horizon" routes the FINE phase through the Pallas
    kernel; its fine-step count (112) is not a multiple of the kernel time
    block, so this gates the real-horizon state snapshot: the coarse
    phases consume r1.n/p/e as the exact phase-boundary state, and a
    padded-horizon state would silently shift every coarse observation."""
    from bayesian_inference_trpl_tpu.ops.pallas import horizon_kernel
    monkeypatch.setattr(horizon_kernel, "TIME_BLOCK", 12)
    sim, mat_nd, n0, p0, e0, cfg, obs = problem
    sched = ((1, 112), (8, 64), (16, 64))
    r_ref = solve_multiphase(mat_nd, n0, p0, e0, cfg, obs, sched)
    cfg_f = cfg._replace(method="fused_horizon")
    r_f = solve_multiphase(mat_nd, n0, p0, e0, cfg_f, obs, sched)
    np.testing.assert_allclose(np.asarray(r_f.sse), np.asarray(r_ref.sse),
                               rtol=1e-7)
    np.testing.assert_allclose(np.asarray(r_f.err_sum),
                               np.asarray(r_ref.err_sum), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(r_f.converged),
                                  np.asarray(r_ref.converged))
    for a, b in ((r_f.n, r_ref.n), (r_f.p, r_ref.p), (r_f.e, r_ref.e)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-12)


def test_multiphase_fused_horizon_normalized_masked(problem, monkeypatch):
    """Coarse phases through the kernel with self-normalization (the
    external run-t=0 anchor, scaled by the stride to coarse-dt units) and a
    zero-weight mask tail (bucket_horizons padding semantics): likelihood
    terms must match the scan path and masked-tail Newton failures must not
    flip conv."""
    from bayesian_inference_trpl_tpu.ops.pallas import horizon_kernel
    monkeypatch.setattr(horizon_kernel, "TIME_BLOCK", 12)
    sim, mat_nd, n0, p0, e0, cfg, obs = problem
    # Normalized observations: self-normalize the fixture curve; mask off
    # the last 40 fine points (a shorter "real" curve padded to the grid).
    vals = np.asarray(obs.values)
    mask = np.ones_like(vals)
    mask[:, -40:] = 0.0
    obs_n = FusedObs(values=jnp.asarray(vals - vals[:, :1]),
                     log_scale=obs.log_scale, min_val=1e-12,
                     normalize=True, mask=jnp.asarray(mask))
    sched = ((1, 112), (8, 64), (16, 64))
    r_ref = solve_multiphase(mat_nd, n0, p0, e0, cfg, obs_n, sched)
    cfg_f = cfg._replace(method="fused_horizon")
    r_f = solve_multiphase(mat_nd, n0, p0, e0, cfg_f, obs_n, sched)
    np.testing.assert_allclose(np.asarray(r_f.sse), np.asarray(r_ref.sse),
                               rtol=1e-7)
    np.testing.assert_allclose(np.asarray(r_f.err_sum),
                               np.asarray(r_ref.err_sum), rtol=1e-6,
                               atol=1e-9)
    np.testing.assert_array_equal(np.asarray(r_f.converged),
                                  np.asarray(r_ref.converged))


def test_multiphase_schedule_validation(problem):
    sim, mat_nd, n0, p0, e0, cfg, obs = problem
    with pytest.raises(ValueError):   # does not sum to T
        solve_multiphase(mat_nd, n0, p0, e0, cfg, obs, ((1, 112), (8, 64)))
    with pytest.raises(ValueError):   # phase not divisible by stride
        solve_multiphase(mat_nd, n0, p0, e0, cfg, obs, ((1, 113), (8, 127)))
    with pytest.raises(ValueError):   # missing fine phase
        solve_multiphase(mat_nd, n0, p0, e0, cfg, obs, ((8, 240),))


def test_linear_predictor_steep_profile_converges():
    """Positivity safeguard: on steep excitation profiles (measured laser
    profiles decay ~5 decades across the film) the first stiff steps change
    small-density cells by O(100%) and naive linear extrapolation overshoots
    them negative, making the undamped Newton oscillate (production
    Power_scan high-power curves failed 100% at step t=1 before the
    safeguard).  The predictor must fall back per-cell and converge."""
    rng = np.random.default_rng(9)
    B, T = 4, 16
    mat = sample_mat_par(rng, B)
    sim = SimParams(length=311.0, time=2000.0 * T / 80000, L=128, T=T,
                    pl_stride=1)
    mat_nd = jnp.asarray(physics.nondimensionalize(mat, sim.dx, sim.dt))
    # ~5 decades of decay across the film, like the measured profiles.
    dn = initial_excess_density(sim, (1.6e18 / 1e7 ** 3, 27.0), "exp")
    n0 = mat_nd[:, 0:1] + dn[None, :]
    p0 = mat_nd[:, 1:2] + dn[None, :]
    cfg = SolverConfig(num_steps=T, pl_stride=1, tol=1e-7, max_iters=30,
                       method="coupled_newton", predictor="linear")
    r = solve(mat_nd, n0, p0, jnp.zeros_like(n0), cfg, record_pl=False)
    assert np.asarray(r.converged).all(), np.asarray(r.sample_iters)


@pytest.mark.parametrize("predictor", ["previous", "linear", "quadratic",
                                       "geometric"])
def test_predictor_parity(problem, predictor):
    """Every predictor converges to the same fixed point (the predictor
    only moves the Newton STARTING iterate; acceptance is tol-gated), so
    sse must agree across predictors to the f32 acceptance budget.
    Geometric is the shipped exact-mode bench default (r4: +4.1% —
    1.018 tile iters/step vs 1.067 for quadratic)."""
    sim, mat_nd, n0, p0, e0, cfg, obs = problem
    base = solve(mat_nd, n0, p0, e0,
                 cfg._replace(predictor="previous", tol=1e-7, max_iters=60),
                 obs=obs, record_pl=False)
    r = solve(mat_nd, n0, p0, e0,
              cfg._replace(predictor=predictor, tol=1e-7, max_iters=60),
              obs=obs, record_pl=False)
    assert np.asarray(r.converged).all()
    # atol floor: a perfectly-fit experiment's sse sits at f64 noise
    # (~1e-15), where pure-rtol comparison measures only the compiler's
    # reduction order (the r5 weight-linear accumulation changed the
    # reduction graph and shifted these noise-level sums).
    np.testing.assert_allclose(np.asarray(r.sse), np.asarray(base.sse),
                               rtol=5e-4, atol=1e-9)
