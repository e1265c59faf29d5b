import numpy as np
import jax.numpy as jnp

import pytest

from bayesian_inference_trpl_tpu.ops.tridiag import (
    pcr_solve, residual_l1, thomas_solve, tridiag_matvec)

pytestmark = pytest.mark.smoke   # fast tier: pure numerics/io


def make_system(rng, batch, L, dominance=2.5):
    ld = rng.uniform(-1, 1, (batch, L))
    ud = rng.uniform(-1, 1, (batch, L))
    ld[:, 0] = 0.0
    ud[:, -1] = 0.0
    d = dominance + np.abs(ld) + np.abs(ud) + rng.uniform(0, 1, (batch, L))
    b = rng.uniform(-1, 1, (batch, L))
    return ld, d, ud, b


def dense_solve(ld, d, ud, b):
    batch, L = d.shape
    out = np.empty_like(b)
    for i in range(batch):
        A = np.diag(d[i]) + np.diag(ld[i, 1:], -1) + np.diag(ud[i, :-1], 1)
        out[i] = np.linalg.solve(A, b[i])
    return out


def test_pcr_matches_dense(rng):
    ld, d, ud, b = make_system(rng, 6, 128)
    expected = dense_solve(ld, d, ud, b)
    got = np.asarray(pcr_solve(*map(jnp.asarray, (ld, d, ud, b))))
    np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-12)


def test_thomas_matches_dense(rng):
    for L in (7, 128, 200):
        ld, d, ud, b = make_system(rng, 3, L)
        expected = dense_solve(ld, d, ud, b)
        got = np.asarray(thomas_solve(*map(jnp.asarray, (ld, d, ud, b))))
        np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-12)


def test_pcr_small_powers_of_two(rng):
    for L in (2, 4, 8, 16):
        ld, d, ud, b = make_system(rng, 2, L)
        expected = dense_solve(ld, d, ud, b)
        got = np.asarray(pcr_solve(*map(jnp.asarray, (ld, d, ud, b))))
        np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-12)


def test_residual_of_exact_solution_is_zero(rng):
    ld, d, ud, b = make_system(rng, 4, 64)
    x = pcr_solve(*map(jnp.asarray, (ld, d, ud, b)))
    res = np.asarray(residual_l1(jnp.asarray(ld), jnp.asarray(d), jnp.asarray(ud), x, jnp.asarray(b)))
    assert np.all(res < 1e-12)


def test_matvec_roundtrip(rng):
    ld, d, ud, b = make_system(rng, 4, 32)
    x = dense_solve(ld, d, ud, b)
    got = np.asarray(tridiag_matvec(*map(jnp.asarray, (ld, d, ud, x))))
    np.testing.assert_allclose(got, b, rtol=1e-9, atol=1e-12)
