"""Batched 2x2-block tridiagonal solver by parallel cyclic reduction.

Used by the coupled Newton solver (models/newton.py): the exact Jacobian of
the (N, P) system with the field E eliminated analytically is block
tridiagonal with 2x2 blocks.  Blocks are carried as four separate
(batch, L) component arrays so the spatial axis stays on the TPU lane
dimension and every operation remains a lane-wise vector op — no tiny
matmuls, no layout changes.

System: A[i] x[i-1] + B[i] x[i] + C[i] x[i+1] = r[i], with A[0] = C[L-1] = 0
(blockwise), x[i] and r[i] 2-vectors.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .tridiag import shift_left, shift_right

# A 2x2 block M is the tuple (m11, m12, m21, m22); a 2-vector v is (v1, v2).


def b_zero_like(x):
    z = jnp.zeros_like(x)
    return (z, z, z, z)


def b_mul(A, B):
    a11, a12, a21, a22 = A
    b11, b12, b21, b22 = B
    return (a11 * b11 + a12 * b21, a11 * b12 + a12 * b22,
            a21 * b11 + a22 * b21, a21 * b12 + a22 * b22)


def b_mulvec(A, v):
    a11, a12, a21, a22 = A
    v1, v2 = v
    return (a11 * v1 + a12 * v2, a21 * v1 + a22 * v2)


def b_inv(A, recip=None):
    a11, a12, a21, a22 = A
    det = a11 * a22 - a12 * a21
    inv = (1.0 / det) if recip is None else recip(det)
    return (a22 * inv, -a12 * inv, -a21 * inv, a11 * inv)


def b_sub(A, B):
    return tuple(a - b for a, b in zip(A, B))


def b_neg(A):
    return tuple(-a for a in A)


def _shift_block(M, rf, direction, diag_fill=0.0):
    """Shift all components along the lane axis; diagonal components fill
    with diag_fill (1 for identity when shifting the diagonal blocks)."""
    sh = shift_right if direction > 0 else shift_left
    m11, m12, m21, m22 = M
    return (sh(m11, rf, diag_fill), sh(m12, rf, 0.0),
            sh(m21, rf, 0.0), sh(m22, rf, diag_fill))


def _shift_vec(v, rf, direction):
    sh = shift_right if direction > 0 else shift_left
    return (sh(v[0], rf, 0.0), sh(v[1], rf, 0.0))


def block_pcr_reduce(A, B, C, use_barrier: bool = True, recip=None):
    """Factorization half of :func:`block_pcr_solve`: run the cyclic
    reduction on the MATRIX only and return the coefficient cache that
    :func:`block_pcr_apply` needs to solve any right-hand side.

    Returns ``(k1s, k2s, fin)`` where ``k1s[s]``/``k2s[s]`` are the sweep-s
    elimination multipliers (2x2 blocks, full width) and ``fin`` =
    ``(k, inv_lhs, inv_B_hi, A_hi)`` are the final pair-solve blocks (half
    width).  Splitting reduce/apply is what makes frozen-Jacobian (chord)
    Newton cheap: the reduce is ~90% of the solve's flops and all of its
    divides, and a cached reduce turns each further solve into a few
    divide-free multiply-adds per sweep (ops/pallas/horizon_kernel.py).
    """
    L = B[0].shape[-1]
    if L & (L - 1):
        raise ValueError(f"block_pcr_reduce requires power-of-two L, got {L}")
    b_inv_ = lambda M: b_inv(M, recip)        # noqa: E731
    k1s = []
    k2s = []
    rf = 1
    while L > 2 * rf:
        Bm = _shift_block(B, rf, +1, diag_fill=1.0)
        Bp = _shift_block(B, rf, -1, diag_fill=1.0)
        k1 = b_mul(A, b_inv_(Bm))
        k2 = b_mul(C, b_inv_(Bp))
        B = b_sub(B, b_mul(k1, _shift_block(C, rf, +1)))
        B = b_sub(B, b_mul(k2, _shift_block(A, rf, -1)))
        A = b_neg(b_mul(k1, _shift_block(A, rf, +1)))
        C = b_neg(b_mul(k2, _shift_block(C, rf, -1)))
        # Stop cross-sweep fusion: without a barrier XLA's producer
        # duplication recomputes earlier sweeps inside later ones
        # (catastrophic on the CPU backend, ~100x).  The cached k1/k2 sit
        # inside the barrier too so the r-sweeps of block_pcr_apply reuse
        # them instead of rematerializing the eliminations.
        if use_barrier:
            A, B, C, k1, k2 = jax.lax.optimization_barrier((A, B, C, k1, k2))
        k1s.append(k1)
        k2s.append(k2)
        rf *= 2

    def lo(M):
        return tuple(m[..., :rf] for m in M)

    def hi(M):
        return tuple(m[..., rf:] for m in M)

    B_lo, B_hi = lo(B), hi(B)
    A_hi = hi(A)
    C_lo = lo(C)
    inv_B_hi = b_inv_(B_hi)
    k = b_mul(C_lo, inv_B_hi)
    lhs = b_sub(B_lo, b_mul(k, A_hi))
    fin = (k, b_inv_(lhs), inv_B_hi, A_hi)
    return tuple(k1s), tuple(k2s), fin


def block_pcr_apply(cache, r, use_barrier: bool = True):
    """Solve for one right-hand side using a :func:`block_pcr_reduce`
    cache.  No divides; ~2 block mul-vecs per sweep per row."""
    k1s, k2s, fin = cache
    rf = 1
    for k1, k2 in zip(k1s, k2s):
        r = tuple(r[i] - b_mulvec(k1, _shift_vec(r, rf, +1))[i]
                  - b_mulvec(k2, _shift_vec(r, rf, -1))[i] for i in range(2))
        if use_barrier:
            r = jax.lax.optimization_barrier(r)
        rf *= 2
    k, inv_lhs, inv_B_hi, A_hi = fin
    r_lo = tuple(x[..., :rf] for x in r)
    r_hi = tuple(x[..., rf:] for x in r)
    rhs = tuple(r_lo[i] - b_mulvec(k, r_hi)[i] for i in range(2))
    x_lo = b_mulvec(inv_lhs, rhs)
    rhs_hi = tuple(r_hi[i] - b_mulvec(A_hi, x_lo)[i] for i in range(2))
    x_hi = b_mulvec(inv_B_hi, rhs_hi)
    return (jnp.concatenate([x_lo[0], x_hi[0]], axis=-1),
            jnp.concatenate([x_lo[1], x_hi[1]], axis=-1))


def block_pcr_solve(A, B, C, r, use_barrier: bool = True, recip=None):
    """Solve the block tridiagonal system; L (last axis) a power of two.

    Same reduction as ops.tridiag.pcr_solve lifted to 2x2 blocks: rows
    i < rf carry A == 0 and rows i >= L-rf carry C == 0 by induction, so
    the sweep is unconditional (shifted diagonal blocks fill with the
    identity to stay invertible).

    ``use_barrier=False`` drops the cross-sweep optimization_barrier for
    contexts that control codegen themselves (the Pallas kernel — Mosaic
    does not duplicate producers across sweeps the way XLA:CPU does).
    ``recip``: optional fast-reciprocal function for the block inverses
    (e.g. the Pallas approximate reciprocal + Newton refinement).
    """
    L = r[0].shape[-1]
    if L & (L - 1):
        raise ValueError(f"block_pcr_solve requires power-of-two L, got {L}")
    cache = block_pcr_reduce(A, B, C, use_barrier=use_barrier, recip=recip)
    return block_pcr_apply(cache, r, use_barrier=use_barrier)


def block_matvec(A, B, C, x):
    """Residual helper: y[i] = A[i] x[i-1] + B[i] x[i] + C[i] x[i+1]."""
    xm = _shift_vec(x, 1, +1)
    xp = _shift_vec(x, 1, -1)
    ya = b_mulvec(A, xm)
    yb = b_mulvec(B, x)
    yc = b_mulvec(C, xp)
    return (ya[0] + yb[0] + yc[0], ya[1] + yb[1] + yc[1])
