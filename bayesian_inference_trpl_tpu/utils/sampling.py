"""Parameter-space samplers.

Two implementations of the random sampler with identical semantics
(reference: bayeslib.py:18-76):

* ``random_grid``: host-side numpy sampler, draw-order-compatible with the
  reference (per-dimension sequential draws from one RNG stream; with
  ``np.random.RandomState(42)`` it reproduces the reference's streams).
* ``random_grid_device``: on-device ``jax.random`` sampler for sharded
  generation — each shard folds its index into the key, removing the
  reference's host-RNG bottleneck and SLURM-stride coupling.

Both honor: pinned dimensions (min == max), per-dimension log10-uniform
draws, and the equality overrides mu_n = mu_p, S_b = S_f, C_p = C_n
(reference: bayeslib.py:68-75).  The legacy coarse-grid sampler
(indexGrid/paramGrid/refineGrid, reference: Legacy/legacy.py:11-37) is kept
for capability parity.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

# Parameter-column contract (physics.PARAM_NAMES): equality overrides by index.
IDX_MUN, IDX_MUP = 2, 3
IDX_SF, IDX_SB = 5, 6
IDX_CN, IDX_CP = 7, 8


def random_grid(min_x, max_x, do_log, num_points: int, rng=None) -> np.ndarray:
    """Draw num_points samples from the box [min_x, max_x] on the host."""
    if rng is None:
        rng = np.random.RandomState(42)  # reference stream (parallel_bayes_gpu.py:35)
    min_x, max_x = np.asarray(min_x, float), np.asarray(max_x, float)
    grid = np.empty((num_points, len(min_x)))
    for i in range(len(min_x)):
        if min_x[i] == max_x[i]:
            grid[:, i] = min_x[i]
        elif do_log[i]:
            grid[:, i] = 10 ** rng.uniform(np.log10(min_x[i]), np.log10(max_x[i]),
                                           num_points)
        else:
            grid[:, i] = rng.uniform(min_x[i], max_x[i], num_points)
    return grid


def random_grid_device(key, min_x, max_x, do_log, num_points: int) -> jax.Array:
    """On-device log/linear-uniform sampler; jit/shard_map friendly."""
    min_x = jnp.asarray(min_x, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    max_x = jnp.asarray(max_x, min_x.dtype)
    do_log = jnp.asarray(do_log, bool)
    u = jax.random.uniform(key, (num_points, min_x.shape[0]), dtype=min_x.dtype)
    safe_min = jnp.where(min_x > 0, min_x, 1.0)
    safe_max = jnp.where(max_x > 0, max_x, 1.0)
    log_draw = 10 ** (jnp.log10(safe_min)
                      + u * (jnp.log10(safe_max) - jnp.log10(safe_min)))
    lin_draw = min_x + u * (max_x - min_x)
    draw = jnp.where(do_log, log_draw, lin_draw)
    return jnp.where(min_x == max_x, min_x, draw)


def apply_overrides(X, sim_flags: dict):
    """Equality-constraint overrides (reference: bayeslib.py:68-75)."""
    is_np = isinstance(X, np.ndarray)
    if sim_flags.get("override_equal_mu"):
        if is_np:
            X[:, IDX_MUN] = X[:, IDX_MUP]
        else:
            X = X.at[:, IDX_MUN].set(X[:, IDX_MUP])
    if sim_flags.get("override_equal_s"):
        if is_np:
            X[:, IDX_SB] = X[:, IDX_SF]
        else:
            X = X.at[:, IDX_SB].set(X[:, IDX_SF])
    if sim_flags.get("override_equal_auger"):
        if is_np:
            X[:, IDX_CP] = X[:, IDX_CN]
        else:
            X = X.at[:, IDX_CP].set(X[:, IDX_CN])
    return X


def make_grid(num_exp: int, min_x, max_x, do_log, sim_flags: dict,
              rng=None):
    """Build the sampling grid and empty likelihood table
    (reference: bayeslib.py:34-76).

    Returns (N, P, X): sample indices, (num_exp, n) zero likelihoods, and
    the (n, 13) sample matrix.
    """
    if sim_flags.get("random_sample", True):
        n = int(sim_flags["num_points"])
        X = random_grid(min_x, max_x, do_log, n, rng=rng)
    else:
        refs = [np.array([sim_flags["num_points"] if min_x[i] != max_x[i] else 1
                          for i in range(len(min_x))])]
        N0 = refine_grid(np.array([0]), refs[0])
        ind = index_grid(N0, refs)
        X = param_grid(ind, refs, np.asarray(min_x, float),
                       np.asarray(max_x, float), np.asarray(do_log))
        n = len(X)
    X = apply_overrides(X, sim_flags)
    P = np.zeros((num_exp, n))
    return np.arange(n), P, X


# --- Legacy coarse-grid sampler (capability parity) ------------------------

def index_grid(N, refs):
    """Flat cell ids -> per-dimension grid coordinates.

    Semantics (behavior parity with Legacy/legacy.py:11-26, re-derived):
    ``refine_grid`` encodes a cell id as a mixed-radix number whose
    digits are, from least significant, the per-dimension sub-indices of
    each refinement level (latest level in the low digits, dimensions
    minor within a level).  The coordinate of a cell along dimension m is
    then the level digits for m weighted by the resolution of all FINER
    levels along m.  Fully vectorized: one divmod broadcast over the
    (K*M,) radix sequence, one weighted sum over levels.
    """
    N = np.asarray(N)
    refs = np.asarray(refs, dtype=int)            # (K levels, M dims)
    K, M = refs.shape
    radices = refs[::-1].reshape(-1)              # innermost level first
    place = np.concatenate(([1], np.cumprod(radices[:-1])))
    digits = (N[:, None] // place[None, :]) % radices[None, :]
    digits = digits.reshape(len(N), K, M)         # (n, level, dim)
    # Weight of level k's digit along dim m = prod of finer levels' radix.
    weight = np.concatenate(
        [np.ones((1, M), dtype=int), np.cumprod(refs[::-1], axis=0)[:-1]])
    return np.einsum("nkm,km->nm", digits, weight)


def param_grid(ind, refs, min_x, max_x, do_log):
    """Grid coordinates -> cell-center parameter values; log-spaced
    dimensions interpolate geometrically (behavior parity with
    Legacy/legacy.py:28-32; a log dimension with a degenerate zero lower
    bound collapses to 0 exactly as the original's nan_to_num did)."""
    frac = (ind + 0.5) / np.prod(refs, axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_log = np.nan_to_num(min_x * (max_x / min_x) ** frac)
    x_lin = min_x + (max_x - min_x) * frac
    return np.where(do_log, x_log, x_lin)


def refine_grid(N, ref):
    """Split each cell id into ``prod(ref)`` consecutive subcell ids
    (behavior parity with Legacy/legacy.py:34-37): cell n maps to
    n*siz .. n*siz+siz-1, ordered cell-major."""
    siz = int(np.prod(ref))
    return (np.asarray(N)[:, None] * siz + np.arange(siz)[None, :]).ravel()
