"""Fully-coupled Newton solver for the implicit BDF step.

The reference's inner iteration is a Gauss-Seidel fixed point — solve N
with (P, E) lagged, then P, then update E explicitly (pvSimPCR.py:93-225).
Because the ambipolar field E is O(1) in nondimensional units and feeds
back into the transport matrices with O(1) gain, that fixed point contracts
at rho ~ 0.8-0.97 on the stiff early transient and burns hundreds of
iterations per step (the reference ships MAX=10000 for exactly this
reason).

This module replaces it with an exact Newton method on the *coupled*
(N, P) system, with E eliminated analytically: the BDF relation for E is
diagonal given (N, P),

    E[e] = g(N[e-1], N[e], P[e-1], P[e])
         = (Lam (DP dP - DN dN) - bE) / (a0 + Lam (DN Nbar + DP Pbar)),

so substituting g into the fluxes keeps nearest-neighbor coupling and the
exact Jacobian is 2x2-block tridiagonal over nodes.  Newton then converges
quadratically (2-4 iterations everywhere, including the transient and
strong-coupling regimes where the reference aborts).

The converged solution satisfies the same discrete equations to the same
tolerance — the convergence metric below is algebraically identical to the
reference's norm2 criterion (||A x - bb|| / ||bb|| on the linearized
system equals ||F_N|| / ||bb_N|| on the nonlinear residual; the ds terms
cancel), so results are interchangeable with the Gauss-Seidel path within
tol.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.block_tridiag import block_pcr_solve
from ..ops.tridiag import shift_left, shift_right
from .trpl import (MatParams, SKIP_ACCEPT_FACTOR, STEP_TOL_RESIDUAL_GUARD,
                   _add_col, _col,
                   _onehot, _zero_col0, update_e)


def _edge_quantities(Nk, Pk, bE, mp: MatParams, a0, derivs: bool = True):
    """Per-edge field g, fluxes, and (with ``derivs``) their N/P derivatives.

    Edge arrays are length L with column 0 unused (zero); edge e couples
    nodes e-1 and e.  Returns a dict of (batch, L) arrays.  ``derivs=False``
    computes only the values needed for the residual — the cheap pass of
    the check-then-solve Newton (see :func:`coupled_newton_step`).
    """
    dn, dp, lam = _col(mp.dn), _col(mp.dp), _col(mp.lam)
    Nm = shift_right(Nk, 1)
    Pm = shift_right(Pk, 1)
    nbar = 0.5 * (Nk + Nm)
    pbar = 0.5 * (Pk + Pm)
    dN = Nk - Nm
    dP = Pk - Pm
    v = a0 + lam * (dn * nbar + dp * pbar)
    g = (lam * (dp * dP - dn * dN) - bE) / v
    jn = dn * (g * nbar + dN)
    jp = dp * (g * pbar - dP)
    d = dict(g=g, jn=jn, jp=jp)
    if derivs:
        inv_v = 1.0 / v
        gNm = lam * dn * (1.0 - 0.5 * g) * inv_v
        gNp = -lam * dn * (1.0 + 0.5 * g) * inv_v
        gPm = -lam * dp * (1.0 + 0.5 * g) * inv_v
        gPp = lam * dp * (1.0 - 0.5 * g) * inv_v
        d.update(
            jn_Nm=dn * (gNm * nbar + 0.5 * g - 1.0),
            jn_Np=dn * (gNp * nbar + 0.5 * g + 1.0),
            jn_Pm=dn * gPm * nbar,
            jn_Pp=dn * gPp * nbar,
            jp_Pm=dp * (gPm * pbar + 0.5 * g + 1.0),
            jp_Pp=dp * (gPp * pbar + 0.5 * g - 1.0),
            jp_Nm=dp * gNm * pbar,
            jp_Np=dp * gNp * pbar,
        )
    # Zero out the non-existent edge 0 (and edge L is handled by shifts).
    for k in d:
        d[k] = _zero_col0(d[k])
    return d


def _recomb_terms(Nk, Pk, mp: MatParams):
    """R and its exact partials dR/dN, dR/dP at each node."""
    n0p0 = _col(mp.n0 * mp.p0)
    np_ = Nk * Pk - n0p0
    tp = Nk * _col(mp.tau_p) + Pk * _col(mp.tau_n)
    R = (_col(mp.cn) * Nk + _col(mp.cp) * Pk + _col(mp.rate) + 1.0 / tp) * np_
    dR_dN = (_col(mp.rate) * Pk
             + (Pk * tp - _col(mp.tau_p) * np_) / tp ** 2
             + (_col(mp.cn) * Nk * Pk + _col(mp.cp) * Pk ** 2 + _col(mp.cn) * np_))
    dR_dP = (_col(mp.rate) * Nk
             + (Nk * tp - _col(mp.tau_n) * np_) / tp ** 2
             + (_col(mp.cp) * Nk * Pk + _col(mp.cn) * Nk ** 2 + _col(mp.cp) * np_))
    return R, dR_dN, dR_dP


def _surface_terms(Nk, Pk, mp: MatParams):
    """Boundary recombination Sft/Sbt and their partials, as (batch, 1)
    columns.  Static lane-slices (``[..., :1]`` / ``[..., -1:]``) rather
    than scalar extraction so the same code lowers inside Pallas kernels
    (Mosaic has no dynamic_slice)."""
    n0p0 = _col(mp.n0 * mp.p0)
    sr0, srL = _col(mp.sr0), _col(mp.srL)
    N0, P0 = Nk[..., :1], Pk[..., :1]
    NL, PL_ = Nk[..., -1:], Pk[..., -1:]
    s0 = sr0 * (N0 * P0 - n0p0) / (N0 + P0)
    sL = srL * (NL * PL_ - n0p0) / (NL + PL_)
    s0_N = sr0 * (P0 ** 2 + n0p0) / (N0 + P0) ** 2
    s0_P = sr0 * (N0 ** 2 + n0p0) / (N0 + P0) ** 2
    sL_N = srL * (PL_ ** 2 + n0p0) / (NL + PL_) ** 2
    sL_P = srL * (NL ** 2 + n0p0) / (NL + PL_) ** 2
    return s0, sL, s0_N, s0_P, sL_N, sL_P


def _assemble_F(Nk, Pk, bN, bP, e, R, s0, sL, a0):
    """Nonlinear residuals from precomputed edge fluxes / recombination /
    surface terms.  Flux divergence uses virtual boundary edges:
    jn[0] := Sft, jn[L] := -Sbt."""
    L = Nk.shape[-1]
    jn_r = _add_col(shift_left(e["jn"], 1), L - 1, -sL)   # jn[n+1]
    jn_l = _add_col(e["jn"], 0, s0)                       # jn[n]; edge 0 = Sft
    jp_r = _add_col(shift_left(e["jp"], 1), L - 1, sL)
    jp_l = _add_col(e["jp"], 0, -s0)
    F_N = a0 * Nk + bN - (jn_r - jn_l) + R
    F_P = a0 * Pk + bP + (jp_r - jp_l) + R
    return F_N, F_P


def residuals_and_errors(Nk, Pk, bN, bP, bE, mp: MatParams, a0):
    """The CHEAP residual pass: (F_N, F_P) plus the reference-metric
    relative errors (err_n, err_p), with no Jacobian assembly.

    ~7% of the flops of a full Jacobian+solve iteration — the
    check-then-solve Newton evaluates this first and only assembles/solves
    when some sample's residual still exceeds tol (on the smooth majority
    of a fixed-dt horizon the extrapolated predictor already passes)."""
    e = _edge_quantities(Nk, Pk, bE, mp, a0, derivs=False)
    R, dR_dN, dR_dP = _recomb_terms(Nk, Pk, mp)
    s = _surface_terms(Nk, Pk, mp)
    s0, sL = s[0], s[1]
    F_N, F_P = _assemble_F(Nk, Pk, bN, bP, e, R, s0, sL, a0)
    aux = (R, dR_dN, dR_dP) + s
    den_n, den_p = _reference_denominators(Nk, Pk, bN, bP, aux)
    err_n = jnp.sum(jnp.abs(F_N), axis=-1) / den_n
    err_p = jnp.sum(jnp.abs(F_P), axis=-1) / den_p
    return (F_N, F_P), (err_n, err_p)


def residuals_and_jacobian(Nk, Pk, bN, bP, bE, mp: MatParams, a0):
    """Nonlinear residuals (F_N, F_P) and the exact 2x2-block tridiagonal
    Jacobian of the E-eliminated coupled system."""
    e = _edge_quantities(Nk, Pk, bE, mp, a0)
    R, dR_dN, dR_dP = _recomb_terms(Nk, Pk, mp)
    s0, sL, s0_N, s0_P, sL_N, sL_P = _surface_terms(Nk, Pk, mp)
    F_N, F_P = _assemble_F(Nk, Pk, bN, bP, e, R, s0, sL, a0)
    L = Nk.shape[-1]

    # Jacobian blocks; per-node components (rows: N, P; cols: N, P).
    # Diagonal block B_n:
    B_NN = a0 - shift_left(e["jn_Nm"], 1) + e["jn_Np"] + dR_dN
    B_NP = -shift_left(e["jn_Pm"], 1) + e["jn_Pp"] + dR_dP
    B_PP = a0 + shift_left(e["jp_Pm"], 1) - e["jp_Pp"] + dR_dP
    B_PN = shift_left(e["jp_Nm"], 1) - e["jp_Np"] + dR_dN
    # Surface contributions (rows 0 and L-1; all four components get the
    # same-sign derivative because Sft enters F_N and F_P with + sign).
    sN_term = s0_N * _onehot(L, 0, B_NN.dtype) + \
        sL_N * _onehot(L, L - 1, B_NN.dtype)
    sP_term = s0_P * _onehot(L, 0, B_NN.dtype) + \
        sL_P * _onehot(L, L - 1, B_NN.dtype)
    B_NN = B_NN + sN_term
    B_NP = B_NP + sP_term
    B_PN = B_PN + sN_term
    B_PP = B_PP + sP_term

    # Super-diagonal block C_n (couples node n+1 through edge n+1):
    C_NN = -shift_left(e["jn_Np"], 1)
    C_NP = -shift_left(e["jn_Pp"], 1)
    C_PP = shift_left(e["jp_Pp"], 1)
    C_PN = shift_left(e["jp_Np"], 1)
    # Sub-diagonal block A_n (couples node n-1 through edge n):
    A_NN = e["jn_Nm"]
    A_NP = e["jn_Pm"]
    A_PP = -e["jp_Pm"]
    A_PN = -e["jp_Nm"]

    A = (A_NN, A_NP, A_PN, A_PP)
    B = (B_NN, B_NP, B_PN, B_PP)
    C = (C_NN, C_NP, C_PN, C_PP)
    return (F_N, F_P), (A, B, C), (R, dR_dN, dR_dP, s0, sL, s0_N, s0_P, sL_N, sL_P)


def _reference_denominators(Nk, Pk, bN, bP, aux):
    """||bb||_1 denominators matching the reference's norm2 metric
    (pvSimPCR.py:161,169-170,190,197-198): bb = -R - ds*X - b with the
    surface adjustments; ds = -dR/dX - surface derivative at the rows."""
    R, dR_dN, dR_dP, s0, sL, s0_N, s0_P, sL_N, sL_P = aux
    L = Nk.shape[-1]
    bbN = -R + dR_dN * Nk - bN
    bbN = _add_col(bbN, 0, -(s0 - s0_N * Nk[..., :1]))
    bbN = _add_col(bbN, L - 1, -(sL - sL_N * Nk[..., -1:]))
    bbP = -R + dR_dP * Pk - bP
    bbP = _add_col(bbP, 0, -(s0 - s0_P * Pk[..., :1]))
    bbP = _add_col(bbP, L - 1, -(sL - sL_P * Pk[..., -1:]))
    return jnp.sum(jnp.abs(bbN), axis=-1), jnp.sum(jnp.abs(bbP), axis=-1)


def coupled_newton_step(Nk0, Pk0, Ek0, bN, bP, bE, mp: MatParams, a0, tol,
                        max_iters: int, step_tol=0.0):
    """Advance one BDF step by check-then-solve exact Newton on the coupled
    system.  Same signature as trpl.implicit_step; Ek0 is ignored (E is a
    function of N, P) but accepted for interface parity.

    Check-then-solve with TWO-TIER acceptance: each iteration first
    evaluates the CHEAP residual pass (:func:`residuals_and_errors`, ~7%
    of a full iteration).  A sample is frozen WITHOUT an update only when
    its residual is already ``SKIP_ACCEPT_FACTOR`` below ``tol`` (with the
    extrapolation predictor this is the common case on the smooth majority
    of a fixed-dt horizon, so most steps never assemble a Jacobian at
    all).  A sample whose residual merely passes ``tol`` gets one final
    POLISH update before freezing — accepted-iterate quality (which feeds
    the BDF history) then matches the always-update loop: post-Newton
    residual ~ tol^2, not tol.  Only when some sample still needs work
    does the iteration assemble the exact Jacobian and solve (lax.cond,
    skipped entirely otherwise).  The reported ``converged`` flag keeps
    the reference criterion — relative residual of the accepted iterate
    < tol, the reference's norm2 metric.

    ``step_tol``: additional state-settled acceptance — a sample is also
    converged when max|dN| <= step_tol*max|N| (and same for P) AND its
    residual is within STEP_TOL_RESIDUAL_GUARD x tol.  In f32 the
    relative-residual metric can stall at the rounding floor while the
    Newton update has shrunk to nothing; 0 disables.

    Returns (N, P, E, iters, converged) with iters the (batch,) per-sample
    count of Newton updates actually applied (0 when the predictor already
    satisfies the residual).
    """
    batch = Nk0.shape[0]
    done0 = jnp.zeros((batch,), dtype=bool)
    its0 = jnp.zeros((batch,), dtype=jnp.int32)

    def cond(carry):
        _, _, done, _, it = carry
        # max_iters solves + the final acceptance check.
        return (it < max_iters + 1) & jnp.logical_not(jnp.all(done))

    def solve_branch(args):
        Nk, Pk, done, polish, F_N, F_P, err_n, err_p = args
        _, (A, B, C), _ = residuals_and_jacobian(Nk, Pk, bN, bP, bE, mp, a0)
        dN, dP = block_pcr_solve(A, B, C, (-F_N, -F_P))
        # Positivity projection: a Newton update that would wipe out > 95%
        # of a cell's density (or turn it negative) is clamped — extreme
        # parameter corners on steep profiles otherwise oscillate through
        # the 1/(N tau_p + P tau_n) term and never converge (the reference
        # aborts the whole launch on these; pvSimPCR.py:269-292).
        upd = jnp.logical_not(done)[:, None]
        Nk = jnp.where(upd, jnp.maximum(Nk + dN, 0.05 * Nk), Nk)
        Pk = jnp.where(upd, jnp.maximum(Pk + dP, 0.05 * Pk), Pk)
        its_new = upd[:, 0].astype(jnp.int32)
        ok_step = (jnp.max(jnp.abs(dN), axis=-1)
                   <= step_tol * jnp.max(jnp.abs(Nk), axis=-1)) & \
                  (jnp.max(jnp.abs(dP), axis=-1)
                   <= step_tol * jnp.max(jnp.abs(Pk), axis=-1)) & \
                  (err_n < tol * STEP_TOL_RESIDUAL_GUARD) & \
                  (err_p < tol * STEP_TOL_RESIDUAL_GUARD)
        # ``polish`` samples just received their final update: freeze.
        return Nk, Pk, done | polish | ok_step, its_new

    def body(carry):
        Nk, Pk, done, its, it = carry
        (F_N, F_P), (err_n, err_p) = residuals_and_errors(
            Nk, Pk, bN, bP, bE, mp, a0)
        ok_res = (err_n < tol) & (err_p < tol)
        skip = (err_n < tol * SKIP_ACCEPT_FACTOR) & \
               (err_p < tol * SKIP_ACCEPT_FACTOR)
        final = it >= max_iters
        # Tight residual -> freeze as-is; at iteration exhaustion a plain
        # tol pass still counts as converged (no update left to give).
        done = done | skip | (ok_res & final)
        polish = ok_res & jnp.logical_not(done)
        Nk, Pk, done, its_new = jax.lax.cond(
            jnp.all(done) | final,
            lambda args: (args[0], args[1], args[2],
                          jnp.zeros((batch,), jnp.int32)),
            solve_branch,
            (Nk, Pk, done, polish, F_N, F_P, err_n, err_p))
        return Nk, Pk, done, its + its_new, it + 1

    Nk, Pk, done, its, _ = jax.lax.while_loop(
        cond, body, (Nk0, Pk0, done0, its0, jnp.int32(0)))
    Ek = update_e(Nk, Pk, bE, mp, a0)
    return Nk, Pk, Ek, its, done
