"""Multi-device tests on the 8-way virtual CPU mesh: sharded execution must
be bitwise-consistent with single-device execution, and chunking must not
change results."""
import numpy as np
import jax
import pytest

from bayesian_inference_trpl_tpu import physics
from bayesian_inference_trpl_tpu.models import SimParams
from bayesian_inference_trpl_tpu.parallel.mesh import make_mesh, sample_sharding
from bayesian_inference_trpl_tpu.parallel.runner import ShardedRunner

from conftest import sample_mat_par


def _problem(rng, n):
    X = np.zeros((n, 13))
    X[:, :12] = sample_mat_par(rng, n)
    X[:, 11] = 0.1 * physics.UNIT_CONVERSIONS[11]
    X[:, 12] = rng.uniform(-0.3, 0.3, n)
    sim = SimParams(length=311.0, time=1.0, L=128, T=20, pl_stride=1,
                    tol_exp=6, max_iters=1000)
    a = 1e18 / 1e7 ** 3
    xg = (np.arange(sim.L) + 0.5) * sim.dx
    init_dn = a * np.exp(-xg / 100.0)
    obs = rng.uniform(-8, -2, (2, sim.num_pl))
    return X, sim, init_dn, obs


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device(rng):
    X, sim, init_dn, obs = _problem(rng, 16)
    r8 = ShardedRunner(make_mesh(), chunk_per_device=2)
    P8, conv8 = r8.run_curve(X, sim, init_dn, obs)
    r1 = ShardedRunner(make_mesh(n_devices=1), chunk_per_device=16)
    P1, conv1 = r1.run_curve(X, sim, init_dn, obs)
    assert conv8.all() and conv1.all()
    np.testing.assert_allclose(P8, P1, rtol=1e-9, atol=1e-9)


def test_chunking_invariance(rng):
    X, sim, init_dn, obs = _problem(rng, 12)
    r_small = ShardedRunner(make_mesh(n_devices=4), chunk_per_device=1)
    P_small, _ = r_small.run_curve(X, sim, init_dn, obs)
    r_big = ShardedRunner(make_mesh(n_devices=4), chunk_per_device=3)
    P_big, _ = r_big.run_curve(X, sim, init_dn, obs)
    np.testing.assert_allclose(P_small, P_big, rtol=1e-9, atol=1e-9)


def test_ragged_tail_padding(rng):
    """n not divisible by the chunk: padded lanes must not leak into results."""
    X, sim, init_dn, obs = _problem(rng, 10)
    r = ShardedRunner(make_mesh(n_devices=4), chunk_per_device=2)  # chunk=8
    P, conv = r.run_curve(X, sim, init_dn, obs)
    assert P.shape == (2, 10)
    assert np.isfinite(P).all()
    r1 = ShardedRunner(make_mesh(n_devices=1), chunk_per_device=10)
    P1, _ = r1.run_curve(X, sim, init_dn, obs)
    np.testing.assert_allclose(P, P1, rtol=1e-9, atol=1e-9)


def test_solver_output_sharding_propagates(rng):
    """The chunk program keeps the sample axis sharded end to end (no
    accidental all-to-one gather inside jit)."""
    from bayesian_inference_trpl_tpu.models.solver import SolverConfig, solve
    import jax.numpy as jnp

    X, sim, init_dn, _ = _problem(rng, 8)
    mesh = make_mesh()
    mat_nd = physics.nondimensionalize(X[:, :12], sim.dx, sim.dt)
    mat_nd = jax.device_put(jnp.asarray(mat_nd), sample_sharding(mesh))
    dn = jnp.asarray(init_dn)
    n0 = mat_nd[:, 0:1] + dn[None, :]
    p0 = mat_nd[:, 1:2] + dn[None, :]
    cfg = SolverConfig(num_steps=4, pl_stride=1, tol=1e-6, max_iters=500)
    res = jax.jit(lambda m, a, b, c: solve(m, a, b, c, cfg))(
        mat_nd, n0, p0, jnp.zeros_like(n0))
    shard_shapes = [s.data.shape for s in res.n.addressable_shards]
    assert all(s == (1, 128) for s in shard_shapes)
