"""Hierarchical grid-refinement inference (legacy pipeline parity).

Port of the reference's deprecated serial pipeline
(Legacy/parallel_bayes.py:44-142): instead of one flat random sample set,
the parameter box is covered by a coarse Cartesian grid, each refinement
level keeps only cells whose posterior mass exceeds a floor and subdivides
them, and the likelihood adds a *model-error* variance estimated from
grid-neighbor PL differences (modelErr, Legacy/parallel_bayes.py:44-55) —
so coarse levels are forgiving and fine levels sharpen.

The forward model here is a callable returning PL curves for a parameter
block — production use plugs in the batched TPU solver (see
:func:`make_trpl_forward`), replacing the reference's serial per-cell RK4
stepping (simulate_tstep); the grid bookkeeping stays on host (tiny).

Column contract: this port uses THIS framework's 12/13-column parameter
order (physics.PARAM_NAMES), not the legacy 11-column one — the legacy
order died with the legacy script, and every other subsystem here shares
one contract.
"""
from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

from .sampling import index_grid, param_grid, refine_grid


def model_err(F, ref):
    """Per-axis max |PL difference| between grid neighbors at one time
    point (reference: Legacy/parallel_bayes.py:44-55).  F is the flat
    (block,) PL vector of one refined block; ref the per-axis subdivision.
    """
    F = np.asarray(F)
    N = int(np.prod(ref))
    pN = 1
    err = []
    for m in range(len(ref)):
        dF = np.abs(F - np.roll(F, -pN))
        dk = ref[m] * pN
        for n in range(pN):
            dF[dk - pN + n:N:dk] = 0
        err.append(dF.max())
        pN *= ref[m]
    return np.array(err)


def forward_lnp(F, values, std, ref):
    """Log-likelihood of one block's PL curves with model-error variance
    (reference: Legacy/parallel_bayes.py:57-102, likelihood at 90-101).

    F: (block, n_times) PL; values/std: (n_times,) observations.
    """
    F = np.asarray(F)
    lnp = np.zeros(len(F))
    for n in range(F.shape[1]):
        sig = model_err(F[:, n], ref)
        sg2 = 2.0 * (sig.max() ** 2 + std[n] ** 2)
        lnp -= (F[:, n] - values[n]) ** 2 / sg2 + np.log(np.pi * sg2) / 2.0
    return lnp


def marginal_p(N, P, refs):
    """Marginal posterior per axis over occupied cells
    (reference: Legacy/parallel_bayes.py:104-114)."""
    pN = np.prod(refs, axis=0)
    ind = index_grid(N, refs)
    out = []
    for m in range(len(refs[0])):
        Pm = np.zeros(pN[m])
        for n in np.unique(ind[:, m]):
            Pm[n] = P[ind[:, m] == n].sum()
        out.append(Pm)
    return out


def grid_refine_bayes(forward: Callable, refs: Sequence, min_x, max_x,
                      min_p: Sequence[float], data, do_log=None,
                      logger=None):
    """Refinement-loop driver (reference: Legacy/parallel_bayes.py:127-142).

    Args:
      forward: callable(X (n, K)) -> PL (n, n_times) in the observation's
        units; typically :func:`make_trpl_forward`.
      refs: per-level per-axis subdivisions, shape (levels, K).
      min_p: per-level posterior-mass floor below which cells are dropped.
      data: (times, values, std) observation tuple.
      do_log: per-axis log-spacing flags (extension over the reference's
        linear-only paramGrid; pass zeros for exact legacy behavior).

    Returns (N, P): occupied cell ids (finest level) and normalized
    posterior masses.
    """
    refs = [np.asarray(r, int) for r in refs]
    min_x = np.asarray(min_x, float)
    max_x = np.asarray(max_x, float)
    if do_log is None:
        do_log = np.zeros(len(min_x), int)
    do_log = np.asarray(do_log, int)
    _, values, std = data

    N = np.array([0])
    P = np.ones(1)
    for nref in range(len(refs)):
        N = N[P > min_p[nref]]
        N = refine_grid(N, refs[nref])
        Np = int(np.prod(refs[nref]))
        lnp = np.zeros(len(N))
        if logger:
            logger.info("refinement level %d: %d cells", nref, len(N))
        for n in range(0, len(N), Np):
            Nn = N[n:n + Np]
            ind = index_grid(Nn, refs[:nref + 1])
            X = param_grid(ind, refs[:nref + 1], min_x, max_x, do_log)
            F = forward(X)
            lnp[n:n + Np] = forward_lnp(F, values, std, refs[nref])
        # Underflow-safe normalization (reference: parallel_bayes.py:140-141).
        P = np.exp(lnp - np.max(lnp))
        P /= P.sum()
    return N, P


def make_trpl_forward(sim, ini_par, init_mode="exp", dtype=None,
                      log_pl: bool = False):
    """Batched TPU forward model for :func:`grid_refine_bayes`: full
    13-column X (mag_offset ignored), returns (n, num_pl) PL curves in
    physical units (log10 when ``log_pl``)."""
    from ..models.driver import pvsim

    def forward(X):
        res = pvsim(np.asarray(X)[:, :12], sim, ini_par,
                    init_mode=init_mode, dtype=dtype)
        pl = np.asarray(res.pl)
        if log_pl:
            pl = np.log10(np.maximum(pl, 1e-300))
        return pl
    return forward
