"""Off-grid fused likelihood (models/offgrid.py).

Gates: (1) observation times that happen to sit ON fine nodes reproduce
the on-grid fused path exactly (slot weights collapse to the node value);
(2) genuinely off-grid (log-spaced) times agree with the reference-style
materialize-and-interpolate path to interpolation tolerance; (3) the
stride-ladder schedule agrees with single-phase off-grid; (4) the
pipeline routes off-grid curves through the fused path and matches the
interp fallback.
"""
import numpy as np
import jax
import jax.numpy as jnp

from bayesian_inference_trpl_tpu import physics
from bayesian_inference_trpl_tpu.models.driver import (
    SimParams, initial_excess_density, pl_log_scale, pvsim)
from bayesian_inference_trpl_tpu.models.offgrid import (
    build_offgrid_tables, solve_offgrid, OffGridTables)
from bayesian_inference_trpl_tpu.models.solver import (
    FusedObs, SolverConfig, solve)
from bayesian_inference_trpl_tpu.ops.likelihood import FLOAT_MIN

from conftest import sample_mat_par


def _problem(T, batch=3, seed=11):
    rng = np.random.default_rng(seed)
    mat = sample_mat_par(rng, batch)
    sim = SimParams(length=311.0, time=2000.0 * T / 80000, L=128, T=T,
                    pl_stride=1)
    mat_nd = jnp.asarray(physics.nondimensionalize(mat, sim.dx, sim.dt))
    dn = initial_excess_density(sim, (1e18 / 1e7 ** 3, 100.0), "exp")
    n0 = mat_nd[:, 0:1] + dn[None, :]
    p0 = mat_nd[:, 1:2] + dn[None, :]
    cfg = SolverConfig(num_steps=T, pl_stride=1, tol=1e-9, max_iters=100,
                       method="coupled_newton")
    return sim, mat, mat_nd, n0, p0, cfg


def test_on_node_times_match_fused_path():
    """Times at exact fine nodes via the off-grid machinery == on-grid
    fused likelihood (weights collapse to [..., 1])."""
    T = 30
    sim, mat, mat_nd, n0, p0, cfg = _problem(T)
    rng = np.random.default_rng(0)
    obs_vals = rng.uniform(-4.0, -2.0, (1, T + 1))
    obs = FusedObs(values=jnp.asarray(obs_vals),
                   log_scale=jnp.asarray(pl_log_scale(sim)),
                   min_val=FLOAT_MIN)
    r_ref = solve(mat_nd, n0, p0, jnp.zeros_like(n0), cfg, obs=obs,
                  record_pl=False)

    times = [np.arange(T + 1) * sim.dt]
    tables = build_offgrid_tables(times, [obs_vals[0]], ((1, T),), sim.dt)
    r_og = solve_offgrid(mat_nd, n0, p0, jnp.zeros_like(n0), cfg, tables,
                         ((1, T),), pl_log_scale(sim), FLOAT_MIN)
    np.testing.assert_allclose(np.asarray(r_og.sse), np.asarray(r_ref.sse),
                               rtol=5e-9)
    np.testing.assert_allclose(np.asarray(r_og.err_sum),
                               np.asarray(r_ref.err_sum), rtol=5e-9, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(r_og.converged),
                                  np.asarray(r_ref.converged))


def test_offgrid_times_match_interp_reference():
    """Log-spaced times: fused slot tables vs materialize+interp (linear in
    log space, the reference scheme).  Cubic vs linear interpolation over a
    smooth decay agree to well below the likelihood's meaningful scale."""
    T = 400
    sim, mat, mat_nd, n0, p0, cfg = _problem(T, batch=2)
    # Log-spaced observation times (plus t=0), like measured TRPL data.
    t_obs = np.concatenate([[0.0], np.geomspace(sim.dt * 0.37, sim.time, 60)])
    rng = np.random.default_rng(5)
    v_obs = rng.uniform(-4.0, -2.0, t_obs.shape)

    tables = build_offgrid_tables([t_obs], [v_obs], ((1, T),), sim.dt)
    r_og = solve_offgrid(mat_nd, n0, p0, jnp.zeros_like(n0), cfg, tables,
                         ((1, T),), pl_log_scale(sim), FLOAT_MIN)

    # Reference-style: full PL trace -> log10 -> linear interp -> SSE.
    res = pvsim(mat, sim, (1e18 / 1e7 ** 3, 100.0), init_mode="exp")
    lp = np.log10(np.maximum(np.asarray(res.pl), FLOAT_MIN))
    lp_i = np.stack([np.interp(t_obs, sim.pl_times, row) for row in lp])
    sse_ref = np.sum((lp_i - v_obs) ** 2, axis=-1)
    np.testing.assert_allclose(np.asarray(r_og.sse)[0], sse_ref,
                               rtol=2e-4)


def test_offgrid_ladder_matches_single_phase():
    T = 512
    sim, mat, mat_nd, n0, p0, cfg = _problem(T, batch=2)
    t_obs = np.geomspace(sim.dt * 3.0, sim.time, 40)
    rng = np.random.default_rng(7)
    v_obs = rng.uniform(-4.0, -2.0, t_obs.shape)
    schedule = ((1, 128), (8, 128), (16, 256))

    tab1 = build_offgrid_tables([t_obs], [v_obs], ((1, T),), sim.dt)
    r1 = solve_offgrid(mat_nd, n0, p0, jnp.zeros_like(n0), cfg, tab1,
                       ((1, T),), pl_log_scale(sim), FLOAT_MIN)
    tab2 = build_offgrid_tables([t_obs], [v_obs], schedule, sim.dt)
    r2 = solve_offgrid(mat_nd, n0, p0, jnp.zeros_like(n0), cfg, tab2,
                       schedule, pl_log_scale(sim), FLOAT_MIN)
    # Ladder vs fine-dt solution: solver coarsening accuracy (log-PL level
    # differences well below 1e-3 on the decayed tail).
    np.testing.assert_allclose(np.asarray(r2.sse), np.asarray(r1.sse),
                               rtol=2e-3)
    assert np.asarray(r2.converged).all()


def test_interior_nonconvergence_not_forgiven(monkeypatch):
    """A Newton failure at an interior UNOBSERVED step corrupts the
    trajectory that later observation points are scored from, so it must
    mark the sample non-converged; only padded-tail steps (past the last
    real observation) are forgiven (solver.py pad_only semantics)."""
    T = 16
    sim, mat, mat_nd, n0, p0, cfg = _problem(T, batch=2)
    # t=0 plus observations at fine steps 2 and 6; steps 7..15 are tail.
    t_obs = np.array([0.0, 2.0 * sim.dt, 6.0 * sim.dt])
    v_obs = np.array([-3.0, -3.1, -3.2])
    tables = build_offgrid_tables([t_obs], [v_obs], ((1, T),), sim.dt)

    import bayesian_inference_trpl_tpu.models.offgrid as og
    orig = og.bdf_step

    def make_failing(fail_at):
        def failing(t, *a, **k):
            nh, ph, eh, state, iters, ok = orig(t, *a, **k)
            return nh, ph, eh, state, iters, ok & (t != fail_at)
        return failing

    def run():
        return solve_offgrid(mat_nd, n0, p0, jnp.zeros_like(n0), cfg, tables,
                             ((1, T),), pl_log_scale(sim), FLOAT_MIN)

    # Step 4 carries no observation but precedes the last one (step 6).
    monkeypatch.setattr(og, "bdf_step", make_failing(4))
    assert not np.asarray(run().converged).any()
    # Step 10 lies past every observation: padded-tail failures are forgiven.
    monkeypatch.setattr(og, "bdf_step", make_failing(10))
    assert np.asarray(run().converged).all()


def test_table_builder_slots():
    """Slot bookkeeping: points land in the correct phase/step, padding is
    masked, t=0 splits out, counts are right."""
    dt = 1.0
    schedule = ((1, 4), (2, 4))
    times = [np.array([0.0, 0.4, 0.5, 3.5, 5.0, 7.3])]
    values = [np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])]
    tab = build_offgrid_tables(times, values, schedule, dt)
    assert tab.m0[0] == 1.0 and tab.v0[0] == 1.0
    assert tab.n_obs[0] == 6
    W1, V1, M1 = tab.phases[0]
    assert M1.sum() == 3              # 0.4, 0.5 (step 0), 3.5 (step 3)
    assert M1[0, 0].sum() == 2        # two points in fine interval (0, 1]
    assert M1[3, 0].sum() == 1
    W2, V2, M2 = tab.phases[1]
    assert M2.sum() == 2              # 5.0 -> coarse step 0, 7.3 -> step 1
    assert M2[0, 0].sum() == 1 and M2[1, 0].sum() == 1
    # Node-exact point (5.0 = fine step 5 = phase2 local 1.0 -> frac 0.5
    # of stride 2): weights sum to 1 everywhere a point exists.
    np.testing.assert_allclose(W2.sum(axis=-1), M2, atol=1e-12)


def test_offgrid_kernel_phase_matches_scan(monkeypatch):
    """The r5 off-grid horizon-kernel path (interpret mode on CPU) == the
    XLA scan path to f32 reassociation, weighted and unweighted
    (ops/pallas/horizon_kernel.solve_phase_offgrid_fused)."""
    from bayesian_inference_trpl_tpu.models.driver import pl_log_scale
    from bayesian_inference_trpl_tpu.ops.pallas import horizon_kernel as hk

    monkeypatch.setattr(hk, "TIME_BLOCK", 24)
    T = 24
    rng = np.random.default_rng(4)
    sim, mat, mat_nd, n0, p0, _ = _problem(T, batch=8)
    schedule = ((1, 12), (2, 12))      # fine + one coarse kernel launch
    t_obs = np.concatenate([[0.0], np.geomspace(sim.dt * 0.7,
                                                sim.time * 0.9, 7)])
    v_obs = np.log10(1e-3 * np.exp(-t_obs / 200.0))
    w_obs = rng.uniform(0.5, 2.0, len(t_obs))   # sigma weights: the
    #   weighted path exercises the unweighted accumulation too (the
    #   math is weight-linear; an all-ones run is a strict subset).
    ls = jnp.asarray(pl_log_scale(sim), jnp.float32)
    mat32 = mat_nd.astype(jnp.float32)
    n32, p32 = n0.astype(jnp.float32), p0.astype(jnp.float32)
    cfg32 = SolverConfig(num_steps=T, pl_stride=1, tol=1e-4, max_iters=8,
                         method="coupled_newton", predictor="quadratic",
                         step_tol=1e-6)
    tables = build_offgrid_tables([t_obs], [v_obs], schedule, sim.dt,
                                  weights=[w_obs])
    res = {}
    for method in ("coupled_newton", "fused_horizon_chord"):
        r = solve_offgrid(mat32, n32, p32, jnp.zeros_like(n32),
                          cfg32._replace(method=method), tables,
                          schedule, ls, FLOAT_MIN)
        res[method] = (np.asarray(r.sse), np.asarray(r.err_sum),
                       np.asarray(r.converged))
    a, b = res["coupled_newton"], res["fused_horizon_chord"]
    np.testing.assert_array_equal(a[2], b[2])
    np.testing.assert_allclose(b[0], a[0], rtol=2e-5)
    np.testing.assert_allclose(b[1], a[1], rtol=2e-4, atol=1e-4)
