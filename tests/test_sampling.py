import numpy as np
import jax
import pytest

from bayesian_inference_trpl_tpu.utils import sampling

pytestmark = pytest.mark.smoke   # fast tier: pure numerics/io


MIN_X = np.array([1e8, 1e14, 0.0, 20.0, 1e-11, 0.1, 0.1, 1e-30, 1e-30, 1.0, 1.0, 0.1, 0.0])
MAX_X = np.array([1e8, 1e16, 50.0, 20.0, 1e-9, 100.0, 100.0, 1e-28, 1e-28, 1000.0, 2000.0, 0.1, 0.0])
DO_LOG = np.array([1, 1, 0, 0, 1, 1, 1, 1, 1, 0, 0, 1, 0])


def test_random_grid_bounds_and_pinning():
    X = sampling.random_grid(MIN_X, MAX_X, DO_LOG, 500,
                             rng=np.random.RandomState(42))
    assert X.shape == (500, 13)
    assert np.all(X[:, 0] == 1e8)       # pinned (min == max)
    assert np.all(X[:, 3] == 20.0)
    assert np.all(X[:, 12] == 0.0)
    assert np.all(X[:, 1] >= 1e14) and np.all(X[:, 1] <= 1e16)
    assert np.all(X[:, 2] >= 0.0) and np.all(X[:, 2] <= 50.0)


def test_random_grid_matches_reference_stream():
    """Draw-order compatibility: same seed + draw order as the reference
    sampler (bayeslib.py:18-32 under np.random.seed(42))."""
    np.random.seed(42)
    expected = np.empty((100, 13))
    for i in range(13):
        if MIN_X[i] == MAX_X[i]:
            expected[:, i] = MIN_X[i]
        elif DO_LOG[i]:
            expected[:, i] = 10 ** np.random.uniform(
                np.log10(MIN_X[i]), np.log10(MAX_X[i]), 100)
        else:
            expected[:, i] = np.random.uniform(MIN_X[i], MAX_X[i], 100)
    got = sampling.random_grid(MIN_X, MAX_X, DO_LOG, 100,
                               rng=np.random.RandomState(42))
    np.testing.assert_array_equal(got, expected)


def test_device_sampler_bounds():
    key = jax.random.key(7)
    X = np.asarray(sampling.random_grid_device(key, MIN_X, MAX_X, DO_LOG, 1000))
    assert np.all(X[:, 0] == 1e8)
    assert np.all(X[:, 1] >= 1e14) and np.all(X[:, 1] <= 1e16)
    assert np.all(X[:, 12] == 0.0)
    # log-uniform: median of p0 near geometric mean 1e15
    med = np.median(X[:, 1])
    assert 3e14 < med < 3.3e15


def test_overrides():
    flags = {"override_equal_mu": True, "override_equal_s": True,
             "override_equal_auger": True}
    X = sampling.random_grid(MIN_X, MAX_X, DO_LOG, 50,
                             rng=np.random.RandomState(1))
    X = sampling.apply_overrides(X, flags)
    np.testing.assert_array_equal(X[:, 2], X[:, 3])   # mu_n = mu_p
    np.testing.assert_array_equal(X[:, 6], X[:, 5])   # Sb = Sf
    np.testing.assert_array_equal(X[:, 8], X[:, 7])   # Cp = Cn


def test_make_grid_shapes():
    flags = {"random_sample": True, "num_points": 64}
    N, P, X = sampling.make_grid(2, MIN_X, MAX_X, DO_LOG, flags,
                                 rng=np.random.RandomState(0))
    assert X.shape == (64, 13)
    assert P.shape == (2, 64)
    assert np.all(P == 0)


def test_legacy_grid_sampler():
    """Grid mode capability parity (reference: Legacy/legacy.py)."""
    flags = {"random_sample": False, "num_points": 3}
    min_x = np.array([1.0, 10.0, 5.0])
    max_x = np.array([2.0, 1000.0, 5.0])
    do_log = np.array([0, 1, 0])
    N, P, X = sampling.make_grid(1, min_x, max_x, do_log, flags)
    assert X.shape == (9, 3)           # 3 x 3 x 1 grid
    assert np.all(X[:, 2] == 5.0)      # pinned dim has one cell
    # log dim: cell centers at 10^(1 + (i+0.5)*2/3)
    expected_log = 10 ** (1 + (np.arange(3) + 0.5) * 2 / 3)
    assert np.allclose(np.unique(X[:, 1]), np.sort(expected_log))
    expected_lin = 1 + (np.arange(3) + 0.5) / 3
    assert np.allclose(np.unique(X[:, 0]), expected_lin)
