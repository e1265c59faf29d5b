"""The coupled-Newton inner solver must reproduce the Gauss-Seidel
(reference-scheme) fixed point and converge where Gauss-Seidel cannot."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesian_inference_trpl_tpu import physics
from bayesian_inference_trpl_tpu.models.driver import SimParams, initial_excess_density
from bayesian_inference_trpl_tpu.models.solver import SolverConfig, solve
from bayesian_inference_trpl_tpu.ops.block_tridiag import (
    b_inv, b_mul, block_matvec, block_pcr_apply, block_pcr_reduce,
    block_pcr_solve)

from conftest import sample_mat_par


def test_block_pcr_matches_dense(rng):
    batch, L = 3, 32
    # Build a well-conditioned block tridiagonal system.
    def blocks():
        m = rng.uniform(-1, 1, (batch, L))
        return m
    A = tuple(blocks() * 0.3 for _ in range(4))
    C = tuple(blocks() * 0.3 for _ in range(4))
    B = (4.0 + blocks(), blocks() * 0.5, blocks() * 0.5, 4.0 + blocks())
    for M in (A,):
        for c in M:
            c[:, 0] = 0.0
    for M in (C,):
        for c in M:
            c[:, -1] = 0.0
    r = (rng.uniform(-1, 1, (batch, L)), rng.uniform(-1, 1, (batch, L)))

    Aj = tuple(jnp.asarray(c) for c in A)
    Bj = tuple(jnp.asarray(c) for c in B)
    Cj = tuple(jnp.asarray(c) for c in C)
    rj = tuple(jnp.asarray(c) for c in r)
    x = block_pcr_solve(Aj, Bj, Cj, rj)

    # Dense verification.
    for b in range(batch):
        M = np.zeros((2 * L, 2 * L))
        rhs = np.zeros(2 * L)
        for i in range(L):
            M[2*i:2*i+2, 2*i:2*i+2] = [[B[0][b, i], B[1][b, i]],
                                       [B[2][b, i], B[3][b, i]]]
            if i > 0:
                M[2*i:2*i+2, 2*i-2:2*i] = [[A[0][b, i], A[1][b, i]],
                                           [A[2][b, i], A[3][b, i]]]
            if i < L - 1:
                M[2*i:2*i+2, 2*i+2:2*i+4] = [[C[0][b, i], C[1][b, i]],
                                             [C[2][b, i], C[3][b, i]]]
            rhs[2*i] = r[0][b, i]
            rhs[2*i+1] = r[1][b, i]
        sol = np.linalg.solve(M, rhs)
        np.testing.assert_allclose(np.asarray(x[0][b]), sol[0::2], rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(x[1][b]), sol[1::2], rtol=1e-8, atol=1e-10)


def test_block_pcr_reduce_apply_matches_solve(rng):
    """The cached-coefficient path (reduce once, apply per RHS — the chord
    Newton building block) is bitwise the staged form of block_pcr_solve,
    and one cache serves many right-hand sides."""
    batch, L = 4, 128
    A = tuple(rng.uniform(-0.3, 0.3, (batch, L)) for _ in range(4))
    C = tuple(rng.uniform(-0.3, 0.3, (batch, L)) for _ in range(4))
    B = (4.0 + rng.uniform(-1, 1, (batch, L)),
         rng.uniform(-0.5, 0.5, (batch, L)),
         rng.uniform(-0.5, 0.5, (batch, L)),
         4.0 + rng.uniform(-1, 1, (batch, L)))
    for c in A:
        c[:, 0] = 0.0
    for c in C:
        c[:, -1] = 0.0
    Aj, Bj, Cj = (tuple(jnp.asarray(c) for c in M) for M in (A, B, C))
    cache = block_pcr_reduce(Aj, Bj, Cj)
    for _ in range(3):
        r = tuple(jnp.asarray(rng.uniform(-1, 1, (batch, L)))
                  for _ in range(2))
        x_solve = block_pcr_solve(Aj, Bj, Cj, r)
        x_apply = block_pcr_apply(cache, r)
        np.testing.assert_array_equal(np.asarray(x_apply[0]),
                                      np.asarray(x_solve[0]))
        np.testing.assert_array_equal(np.asarray(x_apply[1]),
                                      np.asarray(x_solve[1]))
        # And it actually solves the system.
        y = block_matvec(Aj, Bj, Cj, x_apply)
        np.testing.assert_allclose(np.asarray(y[0]), np.asarray(r[0]),
                                   rtol=2e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(y[1]), np.asarray(r[1]),
                                   rtol=2e-7, atol=1e-9)


@pytest.fixture(scope="module")
def both_methods():
    rng = np.random.default_rng(3)
    B, T = 3, 60
    mat = sample_mat_par(rng, B)
    mat[:, 11] = 0.1 * physics.UNIT_CONVERSIONS[11]
    sim = SimParams(length=311.0, time=2000.0 * T / 80000, L=128, T=T, pl_stride=1)
    mat_nd = jnp.asarray(physics.nondimensionalize(mat, sim.dx, sim.dt))
    dn = initial_excess_density(sim, (1e18 / 1e7 ** 3, 100.0), "exp")
    n0 = mat_nd[:, 0:1] + dn[None, :]
    p0 = mat_nd[:, 1:2] + dn[None, :]
    e0 = jnp.zeros_like(n0)
    out = {}
    for method in ("gauss_seidel", "coupled_newton"):
        cfg = SolverConfig(num_steps=T, pl_stride=1, tol=1e-7, max_iters=2000,
                           record_iters=True, method=method)
        out[method] = solve(mat_nd, n0, p0, e0, cfg)
    return out, (mat_nd, n0, p0, e0, sim)


def test_newton_matches_gauss_seidel_pl(both_methods):
    out, _ = both_methods
    pl_gs = np.asarray(out["gauss_seidel"].pl)
    pl_nw = np.asarray(out["coupled_newton"].pl)
    rel = np.abs(pl_nw - pl_gs) / np.abs(pl_gs)
    # Check-then-solve accepts the first iterate whose relative residual
    # passes tol (1e-7 here) without a final polish solve, so the two
    # fixed points agree to O(tol) accumulated over the horizon — the
    # contract is "residual < tol", identical to the reference's norm2
    # criterion, not "residual < tol then one extra solve".
    assert rel.max() < 2e-6
    assert np.asarray(out["coupled_newton"].converged).all()


def test_newton_quadratic_iteration_counts(both_methods):
    out, _ = both_methods
    it_nw = np.asarray(out["coupled_newton"].iters)
    it_gs = np.asarray(out["gauss_seidel"].iters)
    assert it_nw.max() <= 6                 # quadratic convergence
    assert it_nw.sum() < 0.25 * it_gs.sum()  # at least 4x fewer iterations


def test_newton_handles_strong_coupling(both_methods):
    """lambda_rel = 10 (100x the production field coupling): Gauss-Seidel
    stalls (the reference would hit MAX and abort globally,
    pvSimPCR.py:269-292); coupled Newton converges in a handful of
    iterations."""
    _, (mat_nd, n0, p0, e0, sim) = both_methods
    mat_strong = np.asarray(mat_nd).copy()
    mat_strong[:, 11] *= 100.0
    cfg = SolverConfig(num_steps=20, pl_stride=1, tol=1e-7, max_iters=50,
                       record_iters=True, method="coupled_newton")
    r = solve(jnp.asarray(mat_strong), n0, p0, e0, cfg)
    assert np.asarray(r.converged).all()
    assert np.asarray(r.iters).max() <= 8
    cfg_gs = cfg._replace(method="gauss_seidel")
    r_gs = solve(jnp.asarray(mat_strong), n0, p0, e0, cfg_gs)
    assert not np.asarray(r_gs.converged).all()
