"""Pallas fused Newton kernel: tolerance-equivalence with the XLA op-chain
path (models/newton.py + ops/block_tridiag.py).

On CPU the kernel runs under the Mosaic interpreter; on a real TPU (the
bench/production path) it was verified bitwise-identical to the XLA path.
Reference CUDA counterparts: iterate/pcreduce/norm2 (pvSimPCR.py:93-225,
42-81, 14-40).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from bayesian_inference_trpl_tpu import physics
from bayesian_inference_trpl_tpu.models.driver import (
    SimParams, initial_excess_density)
from bayesian_inference_trpl_tpu.models.newton import coupled_newton_step
from bayesian_inference_trpl_tpu.models.trpl import MatParams
from bayesian_inference_trpl_tpu.ops.pallas import pallas_newton_step

from conftest import sample_mat_par


def _inputs(batch, seed=3):
    rng = np.random.default_rng(seed)
    mat = sample_mat_par(rng, batch)
    sim = SimParams(length=311.0, time=2000.0 * 16 / 80000, L=128, T=16)
    mat_nd = jnp.asarray(physics.nondimensionalize(mat, sim.dx, sim.dt),
                         jnp.float32)
    dn = initial_excess_density(sim, (1e18 / 1e7 ** 3, 100.0), "exp",
                                dtype=jnp.float32)
    n0 = mat_nd[:, 0:1] + dn[None, :]
    p0 = mat_nd[:, 1:2] + dn[None, :]
    mp = MatParams.from_array(mat_nd)
    # BDF1 step from the initial state.
    return n0, p0, -n0, -p0, jnp.zeros_like(n0), mp


@pytest.mark.parametrize("batch", [8, 12])   # 12 exercises tile padding
def test_pallas_newton_matches_xla(batch):
    n0, p0, bN, bP, bE, mp = _inputs(batch)
    a0, tol, iters = 1.0, 1e-4, 6
    e0 = jnp.zeros_like(n0)
    ref = coupled_newton_step(n0, p0, e0, bN, bP, bE, mp, a0, tol, iters)
    out = pallas_newton_step(n0, p0, e0, bN, bP, bE, mp, a0, tol, iters,
                             interpret=True)
    # Check-then-solve accepts the first iterate whose residual passes tol;
    # the two compilations (jitted XLA vs interpreted Mosaic) round f32
    # slightly differently, so near-boundary samples may accept one solve
    # apart — both endpoints are valid fixed points within tol.  N/P agree
    # to f32 noise; E is a difference of near-equal fluxes (cancellation-
    # amplified), so it gets an absolute tolerance.
    for name, a, b, atol in zip("NPE", ref[:3], out[:3], (0, 0, 1e-4)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(b, a, rtol=5e-4, atol=atol,
                                   err_msg=f"field {name}")
    assert np.abs(np.asarray(out[3]) - np.asarray(ref[3])).max() <= 1
    np.testing.assert_array_equal(np.asarray(out[4]), np.asarray(ref[4]))
    assert np.asarray(out[4]).all()


def test_pallas_solver_method(monkeypatch):
    """End-to-end: SolverConfig(method='coupled_newton_pallas') solves a
    short horizon and matches the XLA method's fused likelihood terms."""
    from bayesian_inference_trpl_tpu.models.driver import pl_log_scale
    from bayesian_inference_trpl_tpu.models.solver import (
        FusedObs, SolverConfig, solve)

    rng = np.random.default_rng(11)
    mat = sample_mat_par(rng, 8)
    T = 12
    sim = SimParams(length=311.0, time=2000.0 * T / 80000, L=128, T=T)
    mat_nd = jnp.asarray(physics.nondimensionalize(mat, sim.dx, sim.dt),
                         jnp.float32)
    dn = initial_excess_density(sim, (1e18 / 1e7 ** 3, 100.0), "exp",
                                dtype=jnp.float32)
    n0 = mat_nd[:, 0:1] + dn[None, :]
    p0 = mat_nd[:, 1:2] + dn[None, :]
    e0 = jnp.zeros_like(n0)
    obs = FusedObs(values=jnp.full((1, T + 1), -3.0, jnp.float32),
                   log_scale=jnp.asarray(pl_log_scale(sim), jnp.float32),
                   min_val=1e-30)
    out = {}
    for method in ("coupled_newton", "coupled_newton_pallas"):
        cfg = SolverConfig(num_steps=T, pl_stride=1, tol=1e-4, max_iters=6,
                           method=method)
        out[method] = solve(mat_nd, n0, p0, e0, cfg, obs=obs, record_pl=False)
    a, b = out["coupled_newton"], out["coupled_newton_pallas"]
    assert np.asarray(b.converged).all()
    np.testing.assert_allclose(np.asarray(b.sse), np.asarray(a.sse),
                               rtol=1e-4)
    # Per-sample solve totals may drift by a near-boundary acceptance per
    # step across the two compilations (see test_pallas_newton_matches_xla).
    assert np.abs(np.asarray(b.sample_iters)
                  - np.asarray(a.sample_iters)).max() <= T // 4
