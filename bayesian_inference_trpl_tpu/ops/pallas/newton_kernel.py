"""Pallas TPU kernel: fused coupled-Newton inner solve for one BDF step.

The TPU-native replacement for the reference's CUDA kernel inventory — the
per-step ``iterate`` device function with its tridiagonal assembly
(pvSimPCR.py:93-225), the ``pcreduce`` PCR solver (pvSimPCR.py:42-81), and
the ``norm2`` residual reduction (pvSimPCR.py:14-40) — fused into ONE
kernel so every Newton iteration's intermediates (residuals, the exact
2x2-block Jacobian, all log2(L) PCR sweeps) stay resident in VMEM.  The
XLA op-chain path (models/newton.py driving ops/block_tridiag.py) remains
the portable fallback and the f64 parity reference.

Layout: a grid over sample tiles; each kernel instance owns a
(tile, L) block with the L=128 spatial axis on the TPU lanes, so every
operation — including the lane-shifted PCR sweeps — is a plain VPU vector
op.  The Newton loop is a fixed ``max_iters`` fori_loop with per-sample
masking (TPU predication beats data-dependent exit for the 2-4 iterations
the exact-Jacobi an Newton needs); per-sample convergence and iteration
counts are returned exactly like the XLA path.

The numerical core is literally the shared code: the kernel body calls
``models.newton.residuals_and_jacobian`` and ``ops.block_tridiag
.block_pcr_solve`` — Mosaic compiles the same jnp graph that XLA fuses,
so the two paths agree to f32 reassociation (gated in tests/test_pallas.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SAMPLE_TILE = 256          # samples per kernel instance (sublane dim)


def _kernel(mat_ref, n_ref, p_ref, bn_ref, bp_ref, be_ref, a0_ref, tol_ref,
            stol_ref, n_out, p_out, e_out, its_out, done_out, *,
            max_iters: int):
    # The inner solve is shared with the full-horizon kernel (one
    # check-then-solve masked Newton; see horizon_kernel._newton_solve for
    # the semantics and the Mosaic f32-mask layout rationale).
    from ...models.trpl import MatParams
    from .horizon_kernel import _newton_solve

    mp = MatParams(*(mat_ref[i, :] for i in range(12)))
    a0 = a0_ref[0, 0]
    tol = tol_ref[0, 0]
    step_tol = stol_ref[0, 0]
    Nn, Pn, En, done, its = _newton_solve(
        n_ref[:], p_ref[:], bn_ref[:], bp_ref[:], be_ref[:], mp, a0, tol,
        step_tol, max_iters)
    n_out[:] = Nn
    p_out[:] = Pn
    e_out[:] = En
    its_out[:] = its[:, :1].astype(jnp.int32)
    done_out[:] = done[:, :1].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("max_iters", "interpret"))
def _call(mat_t, Nk0, Pk0, bN, bP, bE, a0, tol, stol, max_iters, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, L = Nk0.shape
    tile = min(SAMPLE_TILE, batch)    # batch pre-padded to a tile multiple
    grid = (batch // tile,)
    dtype = Nk0.dtype

    # Index-map literals must be i32: under jax_enable_x64 a bare Python 0
    # lowers as an i64 constant and Mosaic rejects the mixed-width
    # func.return of the index map.  (numpy scalar: index maps may not
    # capture traced values.)
    import numpy as np
    zero = np.int32(0)
    row = lambda i: (i, zero)                    # noqa: E731
    field_spec = pl.BlockSpec((tile, L), row, memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((12, tile), lambda i: (zero, i),
                            memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((1, 1), lambda i: (zero, zero),
                               memory_space=pltpu.SMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((batch, L), dtype),       # N
        jax.ShapeDtypeStruct((batch, L), dtype),       # P
        jax.ShapeDtypeStruct((batch, L), dtype),       # E
        jax.ShapeDtypeStruct((batch, 1), jnp.int32),   # iters
        jax.ShapeDtypeStruct((batch, 1), jnp.int32),   # done
    )
    out_specs = (
        field_spec, field_spec, field_spec,
        pl.BlockSpec((tile, 1), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), row, memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel, max_iters=max_iters),
        grid=grid,
        in_specs=[mat_spec, field_spec, field_spec, field_spec, field_spec,
                  field_spec, scalar_spec, scalar_spec, scalar_spec],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(mat_t, Nk0, Pk0, bN, bP, bE, a0, tol, stol)


def _pad_to(x, n, axis=0):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    edge = jnp.take(x, jnp.full((pad,), x.shape[axis] - 1), axis=axis)
    return jnp.concatenate([x, edge], axis=axis)


def pallas_newton_step(Nk0, Pk0, Ek0, bN, bP, bE, mp, a0, tol,
                       max_iters: int, step_tol=0.0, interpret: bool = False):
    """Drop-in replacement for models.newton.coupled_newton_step backed by
    the fused Pallas kernel.  Ek0 is accepted for interface parity (E is a
    function of N, P in the eliminated system).

    Returns (N, P, E, iters, converged) — iters per-sample, as the XLA path.

    Intended for the f32 fast path with a modest ``max_iters`` (the masked
    fixed-count loop always runs max_iters iterations; the exact-Jacobian
    Newton needs 2-4).  ``interpret=True`` runs the Mosaic interpreter
    (CPU testing).
    """
    batch, L = Nk0.shape
    tile = min(SAMPLE_TILE, -(-batch // 8) * 8)   # sublane-aligned tile
    padded = -(-batch // tile) * tile
    mat_t = jnp.stack(tuple(mp))                # (12, batch)
    a0v = jnp.asarray(a0, Nk0.dtype).reshape(1, 1)
    tolv = jnp.asarray(tol, Nk0.dtype).reshape(1, 1)
    stolv = jnp.asarray(step_tol, Nk0.dtype).reshape(1, 1)
    if padded != batch:
        mat_t = _pad_to(mat_t, padded, axis=1)
        Nk0, Pk0, bN, bP, bE = (
            _pad_to(x, padded) for x in (Nk0, Pk0, bN, bP, bE))
    n, p, e, its, done = _call(mat_t, Nk0, Pk0, bN, bP, bE, a0v, tolv, stolv,
                               int(max_iters), bool(interpret))
    n, p, e = n[:batch], p[:batch], e[:batch]
    its = its[:batch, 0]
    conv = done[:batch, 0].astype(bool)
    return n, p, e, its, conv
