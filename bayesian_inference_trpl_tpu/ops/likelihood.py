"""Log-likelihood ops over simulated PL curves.

The reference splits this across three GPU round-trips — an in-place
clamp+log10 kernel (probs.py:64-85), host-side time interpolation
(bayeslib.py:182-191), and a sum-of-squares kernel with a per-sample
magnitude offset (probs.py:20-62).  Here each piece is a jitted XLA op, and
the production path fuses them into the solver scan entirely
(models/solver.py) with the magnitude offset applied in closed form:

    sum_i (e_i + m)^2 = sum_i e_i^2 + 2 m sum_i e_i + n m^2
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

FLOAT_MIN = sys.float_info.min


def fastlog(pl, min_val: float = FLOAT_MIN):
    """Clamp-to-min then log10 (reference: probs.py:64-85, applied at
    bayeslib.py:157).  Values below ``min_val`` (including negatives) clamp.
    The floor stays strictly positive in the input's dtype (FLOAT_MIN is
    f64-tiny, which rounds to 0.0 in f32 — log10(0) = -inf downstream)."""
    pl = jnp.asarray(pl)
    floor = jnp.maximum(jnp.asarray(min_val, pl.dtype),
                        jnp.finfo(pl.dtype).tiny)
    return jnp.log10(jnp.maximum(pl, floor))


def sse_terms(pl_log, values):
    """Running sums needed for the offset-closed-form likelihood.

    Args:
      pl_log: (batch, n) log10 simulated PL.
      values: (n,) log10 observed PL.
    Returns (sse, esum): (batch,) sums of e^2 and e with e = pl_log - values.
    """
    e = pl_log - values[None, :]
    return jnp.sum(e * e, axis=-1), jnp.sum(e, axis=-1)


def log_likelihood_from_terms(sse, esum, n_obs, mag_offset):
    """-(sum (e + m)^2) given running sums (exact closed form in m)."""
    return -(sse + 2.0 * mag_offset * esum + n_obs * mag_offset ** 2)


@jax.jit
def log_likelihood(pl_log, values, mag_offset):
    """Direct SSE likelihood: P[j] = -sum_i (pl_log[j,i] + m[j] - values[i])^2
    (reference: probs.py:20-47; ``uncertainty`` is accepted there but unused —
    the sigma division is commented out at probs.py:40)."""
    sse, esum = sse_terms(pl_log, values)
    return log_likelihood_from_terms(sse, esum, pl_log.shape[-1], mag_offset)


def lnP_reference(P, plI, values, mag_grid, bval_cutoff, t_factor):
    """Vectorized numpy oracle of the reference CPU likelihood
    (reference: probs.py:5-18), kept as a test fixture.  Modifies P in place:
    P[:, m] accumulates over the magnitude grid."""
    for m, mag in enumerate(mag_grid):
        err = plI + mag
        cutoff = np.log10(bval_cutoff)
        err = np.where(err < cutoff, cutoff, err)
        err = err - values
        P[:, m] -= np.sum(err ** 2, axis=1) / t_factor
        P[:, m] -= np.log(np.pi * t_factor) / 2 * len(values)
    return P


def interp_pl(sim_times, pl, obs_times):
    """Linear time interpolation of simulated PL onto observation times,
    batched; out-of-range times produce NaN, matching scipy ``griddata``
    (reference: bayeslib.py:182-191)."""
    def one(curve):
        return jnp.interp(obs_times, sim_times, curve, left=jnp.nan, right=jnp.nan)
    return jax.vmap(one)(pl)
