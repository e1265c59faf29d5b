"""Core numerics of the 1-D electron/hole drift-diffusion-decay TRPL model.

Everything here operates on nondimensionalized, batched arrays of shape
(batch, L) with the spatial axis last (TPU lane dimension).  The implicit
scheme reproduces the reference kernel's math — BDF1->5 coefficient ramp,
Gauss-Seidel N-then-P Newton linearization with surface-recombination
boundary rows, explicit E update — re-derived as pure vectorized JAX
(reference: pvSimPCR.py:93-306), not a translation of its CUDA thread code.

State layout:
  N, P: (batch, L) carrier densities at cell centers [carriers/cell].
  E:    (batch, L) field at cell edges 0..L-1; edge 0 is identically zero
        (never updated) and edge L (also zero) is implicit, so L lanes
        suffice (reference stores L+1: pvSimPCR.py:341).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.tridiag import pcr_solve, residual_l1, shift_left, shift_right

# BDF startup ramp: row t (0..3) is the order-(t+1) method used at step t;
# row 4 is BDF5, used for all later steps (reference: pvSimPCR.py:241-250).
# Columns: a0 (new state), a1..a5 (history, newest first).
BDF_TABLE = np.array([
    [1.0,      -1.0, 0.0,  0.0,     0.0,  0.0],
    [1.5,      -2.0, 0.5,  0.0,     0.0,  0.0],
    [11.0 / 6, -3.0, 1.5, -1.0 / 3, 0.0,  0.0],
    [25.0 / 12, -4.0, 3.0, -4.0 / 3, 0.25, 0.0],
    [137.0 / 60, -5.0, 5.0, -10.0 / 3, 1.25, -0.2],
])
HISTORY = 6  # rolling history slots: new state + 5 back (reference: pvSimPCR.py:339)

# State-settled (step_tol) acceptance additionally requires the residual to
# be within this factor of tol: a stalled Newton (near-singular Jacobian,
# tiny steps, large residual) must surface as non-convergence, not be
# reported converged because its iterates stopped moving.
STEP_TOL_RESIDUAL_GUARD = 1e3

# Check-then-solve Newton (models/newton.py, ops/pallas/horizon_kernel.py):
# an iterate may be accepted WITHOUT a Newton update (the cheap skip path)
# only when its residual is this factor BELOW tol.  An iterate whose
# residual merely passes tol gets one final "polish" update before it is
# frozen — so accepted-iterate quality matches the always-update round-1
# loop (post-Newton residual ~ tol^2), which the multi-phase fast path's
# accuracy budget depends on (tools/accuracy_gate.py: raw residual-at-tol
# acceptance at tol=1e-4 accumulates to 2.5e-2 rms log10-PL over the
# horizon; polished acceptance holds ~1e-4).
SKIP_ACCEPT_FACTOR = float(__import__("os").environ.get(
    "TRPL_SKIP_ACCEPT_FACTOR", "3e-2"))


class MatParams(NamedTuple):
    """Nondimensionalized per-sample material parameters, each (batch,)."""
    n0: jax.Array
    p0: jax.Array
    dn: jax.Array      # electron diffusivity
    dp: jax.Array      # hole diffusivity
    rate: jax.Array    # radiative B
    sr0: jax.Array     # front-surface recombination velocity (Sf)
    srL: jax.Array     # back-surface recombination velocity (Sb)
    cn: jax.Array      # electron Auger
    cp: jax.Array      # hole Auger
    tau_n: jax.Array
    tau_p: jax.Array
    lam: jax.Array     # relative dielectric coupling Lambda

    @classmethod
    def from_array(cls, mat_nd):
        """Split a (batch, 12) nondimensionalized parameter matrix."""
        return cls(*(mat_nd[:, i] for i in range(12)))

    def astype(self, dtype):
        return MatParams(*(f.astype(dtype) for f in self))


def _col(v):
    """(batch,) -> (batch, 1) for broadcasting against (batch, L)."""
    return v[:, None]


def _onehot(L, idx, dtype):
    """One-hot (1, L) row vector; used for scatter-free column updates
    (XLA's scatter lowering is pathologically slow on CPU and suboptimal on
    TPU — one-hot multiply-adds fuse into the surrounding elementwise
    work).  Built from a broadcasted iota rather than a host constant so it
    is legal inside Pallas kernels (closure constants must be inputs); XLA
    constant-folds it either way."""
    i = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    return (i == idx).astype(dtype)


def _zero_col(x, idx=0):
    return x * (1.0 - _onehot(x.shape[-1], idx, x.dtype))


def _zero_col0(x):
    return _zero_col(x, 0)


def _add_col(x, idx, v):
    """x[..., idx] += v[..., 0] without scatter; v is (batch, 1)."""
    return x + v * _onehot(x.shape[-1], idx, x.dtype)


def recombination(Nk, Pk, mp: MatParams):
    """Total bulk recombination R(N, P): radiative + SRH + Auger."""
    np_ = Nk * Pk - _col(mp.n0 * mp.p0)
    tp = Nk * _col(mp.tau_p) + Pk * _col(mp.tau_n)
    return (_col(mp.cn) * Nk + _col(mp.cp) * Pk + _col(mp.rate) + 1.0 / tp) * np_


def assemble_n(Nk, Pk, Ek, bN, mp: MatParams, a0):
    """Tridiagonal Newton system for N (reference: pvSimPCR.py:148-170).

    Returns (ld, d, ud, rhs) with ld[...,0] == ud[...,-1] == 0.
    """
    dn = _col(mp.dn)
    L = Nk.shape[-1]
    n0p0 = _col(mp.n0 * mp.p0)
    Er = shift_left(Ek, 1)                      # Er[n] = E[n+1]
    # Flux coupling coefficients; the reference writes A0[n-1] (upper) and
    # A2[n] (lower) from the edge field E[n].
    ud = _zero_col(dn * (-Er / 2.0 - 1.0), L - 1)
    ld = _zero_col(dn * (Ek / 2.0 - 1.0), 0)
    # Source-term Jacobian dR/dN at the current iterate.
    np_ = Nk * Pk - n0p0
    tp = Nk * _col(mp.tau_p) + Pk * _col(mp.tau_n)
    ds = (-_col(mp.rate) * Pk
          - (Pk * tp - _col(mp.tau_p) * np_) / tp ** 2
          - (_col(mp.cn) * Nk * Pk + _col(mp.cp) * Pk ** 2 + _col(mp.cn) * np_))
    # Diagonal: a0 minus the two flux terms that exist for this row.
    left = _zero_col(dn * (-Ek / 2.0 - 1.0), 0)      # row 0 has no left edge
    right = _zero_col(dn * (Er / 2.0 - 1.0), L - 1)  # row L-1 has no right edge
    d = a0 - left - right - ds
    rhs = -recombination(Nk, Pk, mp) - ds * Nk - bN
    # Surface recombination rows (reference: pvSimPCR.py:164-170).
    s_num0 = _col(mp.sr0) * (Nk[..., 0] * Pk[..., 0] - n0p0[..., 0])[:, None]
    s_numL = _col(mp.srL) * (Nk[..., -1] * Pk[..., -1] - n0p0[..., 0])[:, None]
    denom0 = (Nk[..., 0] + Pk[..., 0])[:, None]
    denomL = (Nk[..., -1] + Pk[..., -1])[:, None]
    ds0 = -_col(mp.sr0) * (Pk[..., 0:1] ** 2 + n0p0) / denom0 ** 2
    dsL = -_col(mp.srL) * (Pk[..., -1:] ** 2 + n0p0) / denomL ** 2
    d = _add_col(d, 0, -ds0)
    d = _add_col(d, L - 1, -dsL)
    rhs = _add_col(rhs, 0, -(s_num0 / denom0 + ds0 * Nk[..., 0:1]))
    rhs = _add_col(rhs, L - 1, -(s_numL / denomL + dsL * Nk[..., -1:]))
    return ld, d, ud, rhs


def assemble_p(Nk, Pk, Ek, bP, mp: MatParams, a0):
    """Tridiagonal Newton system for P (reference: pvSimPCR.py:178-198)."""
    dp = _col(mp.dp)
    L = Nk.shape[-1]
    n0p0 = _col(mp.n0 * mp.p0)
    Er = shift_left(Ek, 1)
    ud = _zero_col(dp * (Er / 2.0 - 1.0), L - 1)
    ld = _zero_col(dp * (-Ek / 2.0 - 1.0), 0)
    np_ = Nk * Pk - n0p0
    tp = Nk * _col(mp.tau_p) + Pk * _col(mp.tau_n)
    ds = (-_col(mp.rate) * Nk
          - (Nk * tp - _col(mp.tau_n) * np_) / tp ** 2
          - (_col(mp.cp) * Nk * Pk + _col(mp.cn) * Nk ** 2 + _col(mp.cp) * np_))
    left = _zero_col(dp * (Ek / 2.0 - 1.0), 0)
    right = _zero_col(dp * (-Er / 2.0 - 1.0), L - 1)
    d = a0 - left - right - ds
    rhs = -recombination(Nk, Pk, mp) - ds * Pk - bP
    s_num0 = _col(mp.sr0) * (Nk[..., 0] * Pk[..., 0] - n0p0[..., 0])[:, None]
    s_numL = _col(mp.srL) * (Nk[..., -1] * Pk[..., -1] - n0p0[..., 0])[:, None]
    denom0 = (Nk[..., 0] + Pk[..., 0])[:, None]
    denomL = (Nk[..., -1] + Pk[..., -1])[:, None]
    ds0 = -_col(mp.sr0) * (Nk[..., 0:1] ** 2 + n0p0) / denom0 ** 2
    dsL = -_col(mp.srL) * (Nk[..., -1:] ** 2 + n0p0) / denomL ** 2
    d = _add_col(d, 0, -ds0)
    d = _add_col(d, L - 1, -dsL)
    rhs = _add_col(rhs, 0, -(s_num0 / denom0 + ds0 * Pk[..., 0:1]))
    rhs = _add_col(rhs, L - 1, -(s_numL / denomL + dsL * Pk[..., -1:]))
    return ld, d, ud, rhs


def update_e(Nk, Pk, bE, mp: MatParams, a0):
    """Explicit (diagonal) BDF update of the edge field E
    (reference: pvSimPCR.py:205-209).  Edge 0 stays zero."""
    dn, dp, lam = _col(mp.dn), _col(mp.dp), _col(mp.lam)
    Nm = shift_right(Nk, 1)
    Pm = shift_right(Pk, 1)
    denom = lam * (dp * (Pk + Pm) + dn * (Nk + Nm)) / 2.0 + a0
    num = lam * (dp * (Pk - Pm) - dn * (Nk - Nm)) - bE
    return _zero_col0(num / denom)


def newton_iteration(Nk, Pk, Ek, bN, bP, bE, mp: MatParams, a0):
    """One Gauss-Seidel Newton sweep: solve N, then P with the new N, then
    update E explicitly.  Returns the new iterate and the *pre-solve*
    relative residuals, which is the reference's convergence metric
    (norm2 is evaluated on the current iterate before pcreduce;
    reference: pvSimPCR.py:172-175, 200-202)."""
    ld, d, ud, rhs = assemble_n(Nk, Pk, Ek, bN, mp, a0)
    err_n = residual_l1(ld, d, ud, Nk, rhs)
    Nk1 = pcr_solve(ld, d, ud, rhs)
    ld, d, ud, rhs = assemble_p(Nk1, Pk, Ek, bP, mp, a0)
    err_p = residual_l1(ld, d, ud, Pk, rhs)
    Pk1 = pcr_solve(ld, d, ud, rhs)
    Ek1 = update_e(Nk1, Pk1, bE, mp, a0)
    return Nk1, Pk1, Ek1, err_n, err_p


def implicit_step(Nk0, Pk0, Ek0, bN, bP, bE, mp: MatParams, a0, tol,
                  max_iters: int, step_tol=0.0):
    """Advance one BDF step with a per-sample masked Newton fixed-point loop.

    Replaces the reference's all-or-nothing block convergence and global
    abort (reference: pvSimPCR.py:147-216, 269-292) with per-sample
    convergence: a sample freezes once its pre-solve residuals pass ``tol``
    (identical semantics to the reference at max_sims_per_block=1), and
    non-convergence is surfaced as a per-sample flag instead of a kernel-wide
    abort.  ``step_tol`` adds state-settled acceptance
    (max|dX| <= step_tol*max|X|) for f32 runs where the relative-residual
    metric stalls at the rounding floor; 0 disables (reference semantics).

    Returns (N, P, E, iters, converged) with iters the (batch,) per-sample
    count of Newton updates actually applied (convergence diagnostics the
    reference surfaced per launch; SURVEY.md section 5).
    """
    batch = Nk0.shape[0]
    done0 = jnp.zeros((batch,), dtype=bool)
    its0 = jnp.zeros((batch,), dtype=jnp.int32)

    def cond(carry):
        _, _, _, done, _, it = carry
        return (it < max_iters) & jnp.logical_not(jnp.all(done))

    def body(carry):
        Nk, Pk, Ek, done, its, it = carry
        Nk1, Pk1, Ek1, err_n, err_p = newton_iteration(Nk, Pk, Ek, bN, bP, bE, mp, a0)
        ok_step = (jnp.max(jnp.abs(Nk1 - Nk), axis=-1)
                   <= step_tol * jnp.max(jnp.abs(Nk1), axis=-1)) & \
                  (jnp.max(jnp.abs(Pk1 - Pk), axis=-1)
                   <= step_tol * jnp.max(jnp.abs(Pk1), axis=-1)) & \
                  (err_n < tol * STEP_TOL_RESIDUAL_GUARD) & \
                  (err_p < tol * STEP_TOL_RESIDUAL_GUARD)
        upd = jnp.logical_not(done)
        Nk = jnp.where(upd[:, None], Nk1, Nk)
        Pk = jnp.where(upd[:, None], Pk1, Pk)
        Ek = jnp.where(upd[:, None], Ek1, Ek)
        its = its + upd.astype(jnp.int32)
        done = done | ((err_n < tol) & (err_p < tol)) | ok_step
        return Nk, Pk, Ek, done, its, it + 1

    Nk, Pk, Ek, done, its, _ = jax.lax.while_loop(
        cond, body, (Nk0, Pk0, Ek0, done0, its0, jnp.int32(0)))
    return Nk, Pk, Ek, its, done
