"""Batched tridiagonal solvers, TPU-first.

Layout: systems are batched along leading axes with the system dimension L
last, i.e. on the TPU lane dimension (L == 128 fills the vector lanes
exactly).  The production solver is parallel cyclic reduction (PCR), which
exposes log2(L) fully vectorized sweeps of lane-shifted elementwise work —
the TPU-native replacement for the reference's shared-memory PCR CUDA kernel
(reference: pvSimPCR.py:42-81).  A sequential Thomas solver is provided as a
correctness fallback for arbitrary L.

Conventions: the system is

    ld[i] * x[i-1] + d[i] * x[i] + ud[i] * x[i+1] = b[i],  i = 0..L-1

with ld[..., 0] == 0 and ud[..., -1] == 0.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def shift_right(x, k: int, fill=0.0):
    """y[..., i] = x[..., i-k] for i >= k else fill (static k > 0)."""
    pad = [(0, 0)] * (x.ndim - 1) + [(k, 0)]
    return jnp.pad(x[..., :-k], pad, constant_values=fill)


def shift_left(x, k: int, fill=0.0):
    """y[..., i] = x[..., i+k] for i < L-k else fill (static k > 0)."""
    pad = [(0, 0)] * (x.ndim - 1) + [(0, k)]
    return jnp.pad(x[..., k:], pad, constant_values=fill)


def pcr_solve(ld, d, ud, b):
    """Parallel cyclic reduction solve; L must be a power of two.

    Each sweep halves the coupling stride; after log2(L)-1 sweeps the system
    decouples into L/2 independent 2x2 systems.  Rows i < rf have ld == 0 and
    rows i >= L-rf have ud == 0 by induction, so the update is written
    unconditionally (shifted denominators fill with 1 to stay finite), which
    keeps everything as pure lane-wise vector ops.
    """
    L = ld.shape[-1]
    if L & (L - 1):
        raise ValueError(f"pcr_solve requires power-of-two L, got {L}")
    rf = 1
    while L > 2 * rf:
        k1 = ld / shift_right(d, rf, 1.0)
        k2 = ud / shift_left(d, rf, 1.0)
        d = d - shift_right(ud, rf) * k1 - shift_left(ld, rf) * k2
        b = b - shift_right(b, rf) * k1 - shift_left(b, rf) * k2
        ld, ud = -shift_right(ld, rf) * k1, -shift_left(ud, rf) * k2
        rf *= 2
    # 2x2 solve between rows i and i+rf (reference: pvSimPCR.py:74-79)
    d_lo, d_hi = d[..., :rf], d[..., rf:]
    b_lo, b_hi = b[..., :rf], b[..., rf:]
    ld_hi = ld[..., rf:]
    k = ud[..., :rf] / d_hi
    x_lo = (b_lo - b_hi * k) / (d_lo - ld_hi * k)
    x_hi = (b_hi - ld_hi * x_lo) / d_hi
    return jnp.concatenate([x_lo, x_hi], axis=-1)


def thomas_solve(ld, d, ud, b):
    """Sequential Thomas algorithm along the last axis (any L).

    Used as the reference/correctness path and for non-power-of-two grids;
    the scan runs over L with the batch dims vectorized.
    """
    ld_t = jnp.moveaxis(ld, -1, 0)
    d_t = jnp.moveaxis(d, -1, 0)
    ud_t = jnp.moveaxis(ud, -1, 0)
    b_t = jnp.moveaxis(b, -1, 0)

    def fwd(carry, row):
        cp_prev, dp_prev = carry
        ldi, di, udi, bi = row
        denom = di - ldi * cp_prev
        cp = udi / denom
        dp = (bi - ldi * dp_prev) / denom
        return (cp, dp), (cp, dp)

    zero = jnp.zeros_like(d_t[0])
    _, (cp, dp) = jax.lax.scan(fwd, (zero, zero), (ld_t, d_t, ud_t, b_t))

    def bwd(x_next, row):
        cpi, dpi = row
        x = dpi - cpi * x_next
        return x, x

    _, x_t = jax.lax.scan(bwd, zero, (cp, dp), reverse=True)
    return jnp.moveaxis(x_t, 0, -1)


def residual_l1(ld, d, ud, x, b):
    """Relative L1 residual ||A x - b||_1 / ||b||_1 along the last axis.

    This is the convergence metric of the reference's ``norm2`` kernel
    (reference: pvSimPCR.py:14-40).
    """
    ax = ld * shift_right(x, 1) + d * x + ud * shift_left(x, 1)
    return jnp.sum(jnp.abs(ax - b), axis=-1) / jnp.sum(jnp.abs(b), axis=-1)


def tridiag_matvec(ld, d, ud, x):
    return ld * shift_right(x, 1) + d * x + ud * shift_left(x, 1)
