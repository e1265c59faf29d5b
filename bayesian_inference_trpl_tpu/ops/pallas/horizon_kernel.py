"""Pallas TPU kernel: the ENTIRE fixed-dt BDF horizon in one launch.

The reference's ``tEvol`` kernel keeps all solver state resident in shared
memory for all 80,000 steps of one launch (pvSimPCR.py:227-306, loop at
:237).  Round 1's Pallas path instead launched one kernel per BDF step
(ops/pallas/newton_kernel.py), so the 6-slot N/P/E histories round-tripped
HBM ~80,000 times per simulation and every step paid XLA-side glue (the
history weighted sums, the rolling-slot updates, the PL/likelihood math).
This kernel is the TPU design point the reference occupies:

* grid = (sample_tiles, time_blocks) with time innermost; the rolling
  histories (6, tile, L), the fused-likelihood accumulators, and the
  convergence flags live in VMEM **scratch that persists across the time
  blocks of a tile** — state never touches HBM between step 0 and step T.
* each time block advances TB steps (TB % 6 == 0) with a 6-step unrolled
  inner loop, so every rolling-slot index is STATIC; the BDF startup ramp
  (order 1->5) comes from a (5, 6) SMEM table with a dynamic min(t, 4)
  row index.
* observations stream in per time block as an SMEM scalar table —
  HBM traffic per sample-step drops from ~15 KB (round 1) to ~4 bytes.
* the likelihood (log10-PL residual vs the observation curve, with
  optional self-normalization and zero-weight mask padding) accumulates
  in VMEM exactly as the XLA fused path does (models/solver.py).

The Newton inner solve is literally the shared code: the step body calls
``models.newton.residuals_and_jacobian`` and ``ops.block_tridiag
.block_pcr_solve`` — the same math as the XLA op-chain and the per-step
kernel, so all three agree to f32 reassociation (tests/test_horizon.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

import os

SAMPLE_TILE = 256          # samples per kernel instance (sublane dim)
TIME_BLOCK = 384           # BDF steps per grid step (must be % 6 == 0)

# Chord-mode refresh policy (see _newton_solve_chord). Env-overridable for
# on-TPU tuning sweeps; the defaults are the shipped, gate-validated values.
CHORD_BUDGET = int(os.environ.get("TRPL_CHORD_BUDGET", "3"))
# Stall threshold is PER-PROFILE (r4 sweep, BENCH_EXACT_BATCH=256): the
# looser 0.7 gains +1.5% in exact mode (13,457 -> 13,657 sims/min/chip:
# fewer Jacobian refreshes, and the throughput profile's settle guard
# still accepts the stalled-at-floor tail) but costs -3.5% on the fast
# path (strict acceptance makes the extra stalled chord iterations pure
# waste there: 213.4k -> 206.0k) — so the strict profile keeps 0.5.
CHORD_STALL = float(os.environ.get("TRPL_CHORD_STALL", "0.7"))
CHORD_STALL_STRICT = float(os.environ.get("TRPL_CHORD_STALL_STRICT", "0.5"))
# Chord acceptance is tighter than the full path's SKIP_ACCEPT_FACTOR:
# chord converges linearly, so the accepted residual sits just under the
# threshold instead of quadratically below it (the full path's polish
# update); a 10x tighter gate restores the polished-acceptance accuracy
# budget at the cost of ~2 extra (cheap) chord iterations per solve step
# (gate: seed-1 rms 5.5e-4 -> 3.6e-4 at identical wall time).
CHORD_SKIP_TIGHTEN = float(os.environ.get("TRPL_CHORD_SKIP_TIGHTEN", "1.0"))
# State-settled (step_tol) acceptance on CHORD iterations requires the
# residual within CHORD_SETTLE_GUARD x tol — far tighter than the full
# step's STEP_TOL_RESIDUAL_GUARD (1e3).  Rationale: a tiny FULL Newton
# step implies proximity to the solution, but a tiny CHORD step can mean
# the frozen Jacobian merely stopped contracting; accepting those at
# residuals up to 1e3 x tol drifted the trajectory (seed-1 gate rms
# 1.19e-3).  Requiring a full solve for every settled sample instead
# made every step pay a Jacobian refresh (exact mode 12.1k -> 6.9k
# sims/min).  The defaults here are the exact-mode throughput profile:
# the genuinely settled decayed tail (residual stalled at the f32 floor,
# just above tol) freezes on cheap chord steps, while far-from-solution
# frozen-Jacobian stalls (residual >> tol) still force a refresh.  The
# gate-validated STRICT profile (solve_multiphase /
# SolverConfig.chord_strict) disables chord settle acceptance and
# tightens the chord skip threshold 10x — seed-1 accuracy gate 3.6e-4
# vs 1.2e-3 for the throughput profile, which the 5e-4-gated fast path
# cannot afford but the exact mode can (f32 single-phase stepping is
# already ~1e-3 off f64; the reference's own f32 scheme sits at 4.7e-3).
CHORD_SETTLE_GUARD = float(os.environ.get("TRPL_CHORD_SETTLE_GUARD", "10.0"))
# Hoist the first chord/Newton iteration out of the while loop (measured
# SLOWER — see the refutation note at the hoist site; default off).
CHORD_SPECULATE = os.environ.get("TRPL_CHORD_SPECULATE", "0") == "1"
# Keep the four (tile, L) Newton-loop arrays (Nk, Pk, F_N, F_P) in VMEM
# scratch instead of the while carry — DEFAULT ON since r5: outputs are
# bitwise identical and the measured gain is +4.3-5.4% on the fast path
# (A/B both orders: 231.7k vs 219.8k, 230.0k vs 220.5k sims/min/chip)
# and +1.0% in exact mode (14,148 vs 14,012, 3 reps each) — the carry
# traffic the refuted SPECULATE restructure targeted, removed without
# duplicating the body.  TRPL_CHORD_SCRATCH_CARRY=0 restores the carry.
CHORD_SCRATCH_CARRY = os.environ.get("TRPL_CHORD_SCRATCH_CARRY", "1") == "1"
STRICT_SETTLE_GUARD = 0.0
STRICT_SKIP_TIGHTEN = 0.1


def _chord_knobs(cfg):
    """(settle_guard, skip_tighten, stall) for a SolverConfig's chord
    profile."""
    if getattr(cfg, "chord_strict", False):
        return STRICT_SETTLE_GUARD, STRICT_SKIP_TIGHTEN, CHORD_STALL_STRICT
    return CHORD_SETTLE_GUARD, CHORD_SKIP_TIGHTEN, CHORD_STALL
_TILE_ENV = os.environ.get("TRPL_HORIZON_TILE")


def _chord_tile(cfg):
    """Sample tile for the chord kernel, per profile (r4 A/B, 3 reps):
    the STRICT profile (fast-path phases) runs best at the full 256-lane
    tile (216.2-217.7k vs 212.1-213.8k sims/min/chip at 128: +1.8%),
    while the throughput profile (exact mode) collapses there (13.5k ->
    11.3k: the ~56 (tile, L) chord-scratch arrays at tile 256 leave too
    little VMEM for the time-block pipeline at its much higher
    solve-iteration density) — so exact keeps the halved tile.  Tiles
    below 128 are unrepresentable (the mat block's lane dim must be 128
    or the full array)."""
    return SAMPLE_TILE if getattr(cfg, "chord_strict", False) else SAMPLE_TILE // 2


def _approx_recip(x):
    """Fast reciprocal: hardware approximate + one Newton refinement
    (~2^-23 relative after refine, f32-exact for this solver's purposes).
    Divides are the single most expensive VPU op in the PCR sweeps (17 per
    Newton iteration)."""
    from jax.experimental import pallas as pl
    r = pl.reciprocal(x, approx=True)
    return r * (2.0 - x * r)


def _newton_solve(Nk, Pk, bN, bP, bE, mp, a0, tol, step_tol, max_iters,
                  approx_inv: bool = False):
    """Masked-while Newton on the coupled (N, P) system; returns
    (N, P, E, done (tile, 1) f32, iters (tile, 1) f32).

    Same two-tier acceptance semantics as models.newton.coupled_newton_step
    (check-then-solve: a sample is frozen WITHOUT an update only when its
    residual is SKIP_ACCEPT_FACTOR below tol; a plain tol pass gets one
    final polish update first).  Masks are carried as full-width f32 arrays
    (see ops/pallas/newton_kernel.py for the Mosaic layout rationale)."""
    from ...models.newton import (residuals_and_errors, residuals_and_jacobian)
    from ...models.trpl import (SKIP_ACCEPT_FACTOR, STEP_TOL_RESIDUAL_GUARD,
                                update_e)
    from ..block_tridiag import block_pcr_solve

    # Check-then-solve, mirroring models.newton.coupled_newton_step, with
    # the CHEAP residual pass (residuals_and_errors, no Jacobian) HOISTED
    # out of the while loop: on the smooth majority of the horizon the
    # extrapolated predictor already passes the tight skip threshold, the
    # outer lax.cond skips the loop entirely, and the step costs one cheap
    # pass with ZERO while-carry traffic (measured: the while_loop's carry
    # copies cost ~2x the cheap pass's vector math).  On solve steps the
    # loop body consumes the CARRIED residual (computed by the previous
    # check), assembles the Jacobian, solves, updates, then re-checks at
    # the new state — so each Newton update still pays exactly one cheap
    # pass and one Jacobian+PCR, and the acceptance sequence (tight check
    # -> freeze | polish -> solve -> step_tol accept) is identical to the
    # XLA path.
    skip_tol = tol * SKIP_ACCEPT_FACTOR
    (F_N0, F_P0), (err_n0, err_p0) = residuals_and_errors(
        Nk, Pk, bN, bP, bE, mp, a0)
    err_n0 = err_n0[:, None]
    err_p0 = err_p0[:, None]
    ok0 = ((err_n0 < skip_tol) & (err_p0 < skip_tol)).astype(Nk.dtype)
    col0 = err_n0 * 0.0                 # (tile, 1) zeros

    def skip_branch(args):
        Nk, Pk = args[0], args[1]
        return Nk, Pk, col0 + 1.0, col0

    def solve_loop(args):
        Nk, Pk, F_N, F_P, err_n, err_p = args
        done0 = col0 + ok0

        def cond(carry):
            _, _, _, _, _, _, done, _, it = carry
            return (it < max_iters) & (jnp.min(done) < 0.5)

        def body(carry):
            Nk, Pk, F_N, F_P, err_n, err_p, done, its, it = carry
            # Plain tol pass at the entering state -> this update is the
            # final polish; freeze after applying it.
            polish = (((err_n < tol) & (err_p < tol)).astype(done.dtype)
                      * (1.0 - done))
            _, (A, B, C), _ = residuals_and_jacobian(
                Nk, Pk, bN, bP, bE, mp, a0)
            dN, dP = block_pcr_solve(
                A, B, C, (-F_N, -F_P), use_barrier=False,
                recip=_approx_recip if approx_inv else None)
            upd = 1.0 - done
            Nk = Nk + upd * (jnp.maximum(Nk + dN, 0.05 * Nk) - Nk)
            Pk = Pk + upd * (jnp.maximum(Pk + dP, 0.05 * Pk) - Pk)
            its = its + upd
            guard = tol * STEP_TOL_RESIDUAL_GUARD   # stalls stay flagged
            ok_step = (jnp.max(jnp.abs(dN), axis=-1, keepdims=True)
                       <= step_tol * jnp.max(jnp.abs(Nk), axis=-1,
                                             keepdims=True)) & \
                      (jnp.max(jnp.abs(dP), axis=-1, keepdims=True)
                       <= step_tol * jnp.max(jnp.abs(Pk), axis=-1,
                                             keepdims=True)) & \
                      (err_n < guard) & (err_p < guard)
            done = jnp.maximum(done, jnp.maximum(
                polish, ok_step.astype(done.dtype)))
            # Re-check at the updated state (the next iteration's entering
            # residual; also the exit-time convergence check below).
            (F_N, F_P), (err_n, err_p) = residuals_and_errors(
                Nk, Pk, bN, bP, bE, mp, a0)
            err_n = err_n[:, None]
            err_p = err_p[:, None]
            ok_skip = ((err_n < skip_tol) & (err_p < skip_tol)).astype(
                done.dtype)
            done = jnp.maximum(done, ok_skip)
            return Nk, Pk, F_N, F_P, err_n, err_p, done, its, it + 1

        Nk, Pk, _, _, err_n, err_p, done, its, _ = jax.lax.while_loop(
            cond, body,
            (Nk, Pk, F_N, F_P, err_n, err_p, done0, col0, jnp.int32(0)))
        # Iteration exhaustion: a plain tol pass at the final state still
        # counts as converged (matches the XLA path's final check).
        ok_fin = ((err_n < tol) & (err_p < tol)).astype(done.dtype)
        return Nk, Pk, jnp.maximum(done, ok_fin), its

    Nk, Pk, done, its = jax.lax.cond(
        jnp.min(ok0) >= 0.5, skip_branch, solve_loop,
        (Nk, Pk, F_N0, F_P0, err_n0, err_p0))
    Ek = update_e(Nk, Pk, bE, mp, a0)
    return Nk, Pk, Ek, done, its


def _newton_solve_chord(Nk, Pk, bN, bP, bE, mp, a0, tol, step_tol, max_iters,
                        cache_refs, approx_inv: bool,
                        settle_guard: float, skip_tighten: float,
                        stall: float):
    """Frozen-Jacobian (chord) Newton with a VMEM-resident cached PCR
    factorization that PERSISTS ACROSS TIME STEPS.

    The full Newton solve is ~1100 flops/cell (Jacobian assembly + 6-sweep
    2x2-block PCR with its divides); the Jacobian drifts only O(dt)
    between BDF steps, so a factorization cached from an earlier step
    still contracts the residual.  A chord iteration is one cheap residual
    pass (~75 flops/cell) plus one divide-free ``block_pcr_apply``
    (~130 flops/cell) — ~5x cheaper than full Newton.  This attacks the
    exact fixed-dt bottleneck directly: per-sample skip cannot save tile
    wall-clock (the VPU executes the whole tile), but a cheaper solve
    saves it on every step.

    ``cache_refs`` = (kc1, kc2, fin, dxn, dxp, cval, fulls, execs) scratch:
      kc1/kc2 (NS*4, tile, L)  sweep elimination multipliers,
      fin (16, tile, L//2)     final pair-solve blocks,
      dxn/dxp (tile, L)        branch-output mailboxes,
      cval (1, 1) SMEM         cache-valid flag (reset each tile),
      fulls (1, 1) SMEM        tile-wide full (Jacobian-refresh) solve
                               counter,
      execs (1, 1) SMEM        tile-wide executed Newton body iterations
                               (chord + full) — with fulls, the telemetry
                               the bench roofline estimate consumes.
    Refresh policy: full Newton (+cache rewrite) when the cache is invalid,
    when any active sample's residual fails to halve under a chord step
    (stall), or when the per-step iteration count exceeds the chord budget.
    Acceptance matches the two-tier gate semantics: freeze at residual
    < SKIP_ACCEPT_FACTOR x tol (chord iterations are cheap enough to
    iterate there directly — no polish dance), state-settled step_tol with
    residual guard, plain tol at iteration exhaustion."""
    from ...models.newton import (residuals_and_errors, residuals_and_jacobian)
    from ...models.trpl import (SKIP_ACCEPT_FACTOR, STEP_TOL_RESIDUAL_GUARD,
                                update_e)
    from ..block_tridiag import block_pcr_apply, block_pcr_reduce

    if CHORD_SCRATCH_CARRY:
        (kc1, kc2, fin, dxn, dxp, nk_s, pk_s, fn_s, fp_s, cval, fulls,
         execs) = cache_refs
    else:
        kc1, kc2, fin, dxn, dxp, cval, fulls, execs = cache_refs
    tile, L = Nk.shape
    NS = max(L.bit_length() - 2, 0)        # sweeps: L=128 -> 6
    rf = L // 2

    skip_tol = tol * SKIP_ACCEPT_FACTOR * skip_tighten
    (F_N0, F_P0), (err_n0, err_p0) = residuals_and_errors(
        Nk, Pk, bN, bP, bE, mp, a0)
    err_n0 = err_n0[:, None]
    err_p0 = err_p0[:, None]
    ok0 = ((err_n0 < skip_tol) & (err_p0 < skip_tol)).astype(Nk.dtype)
    col0 = err_n0 * 0.0

    def skip_branch(args):
        Nk, Pk = args[0], args[1]
        return Nk, Pk, col0 + 1.0, col0

    def solve_loop(args):
        Nk, Pk, F_N, F_P, err_n, err_p = args
        done0 = col0 + ok0
        ffull0 = jnp.where(cval[0, 0] < 0.5, 1.0, 0.0)

        def cond(carry):
            done, it = carry[6], carry[8]
            return (it < max_iters) & (jnp.min(done) < 0.5)

        def body_core(Nk, Pk, F_N, F_P, err_n, err_p, done, its, it, ffull):
            do_full = ffull > 0.5
            # Tile-wide executed body iterations (chord OR full): the VPU
            # runs every lane of the tile regardless of per-sample masks,
            # so this — not the per-sample mean of `its` — is what the
            # bench roofline's flop estimate must consume.
            execs[0, 0] = execs[0, 0] + 1.0

            @pl.when(do_full)
            def _full():
                _, (A, B, C), _ = residuals_and_jacobian(
                    Nk, Pk, bN, bP, bE, mp, a0)
                cache = block_pcr_reduce(
                    A, B, C, use_barrier=False,
                    recip=_approx_recip if approx_inv else None)
                k1s, k2s, (kf, inv_lhs, inv_B_hi, A_hi) = cache
                for s in range(NS):
                    for c in range(4):
                        kc1[s * 4 + c] = k1s[s][c]
                        kc2[s * 4 + c] = k2s[s][c]
                for c in range(4):
                    fin[c] = kf[c]
                    fin[4 + c] = inv_lhs[c]
                    fin[8 + c] = inv_B_hi[c]
                    fin[12 + c] = A_hi[c]
                cval[0, 0] = 1.0
                fulls[0, 0] = fulls[0, 0] + 1.0
                dN, dP = block_pcr_apply(cache, (-F_N, -F_P),
                                         use_barrier=False)
                dxn[:] = dN
                dxp[:] = dP

            @pl.when(jnp.logical_not(do_full))
            def _chord():
                k1s = tuple(tuple(kc1[s * 4 + c] for c in range(4))
                            for s in range(NS))
                k2s = tuple(tuple(kc2[s * 4 + c] for c in range(4))
                            for s in range(NS))
                fcache = (k1s, k2s,
                          (tuple(fin[c] for c in range(4)),
                           tuple(fin[4 + c] for c in range(4)),
                           tuple(fin[8 + c] for c in range(4)),
                           tuple(fin[12 + c] for c in range(4))))
                dN, dP = block_pcr_apply(fcache, (-F_N, -F_P),
                                         use_barrier=False)
                dxn[:] = dN
                dxp[:] = dP

            dN = dxn[:]
            dP = dxp[:]
            upd = 1.0 - done
            Nk = Nk + upd * (jnp.maximum(Nk + dN, 0.05 * Nk) - Nk)
            Pk = Pk + upd * (jnp.maximum(Pk + dP, 0.05 * Pk) - Pk)
            its = its + upd
            # State-settled acceptance: full Newton steps get the loose
            # STEP_TOL_RESIDUAL_GUARD (a tiny full step implies proximity
            # to the solution); chord steps get the much tighter
            # settle_guard (a tiny chord step under a stale Jacobian does
            # not — see the module constants' rationale; 0.0 in the strict
            # profile disables chord settle acceptance entirely).
            guard = tol * jnp.where(do_full, STEP_TOL_RESIDUAL_GUARD,
                                    settle_guard)
            ok_step = (jnp.max(jnp.abs(dN), axis=-1, keepdims=True)
                       <= step_tol * jnp.max(jnp.abs(Nk), axis=-1,
                                             keepdims=True)) & \
                      (jnp.max(jnp.abs(dP), axis=-1, keepdims=True)
                       <= step_tol * jnp.max(jnp.abs(Pk), axis=-1,
                                             keepdims=True)) & \
                      (err_n < guard) & (err_p < guard)
            (F_N, F_P), (err_n2, err_p2) = residuals_and_errors(
                Nk, Pk, bN, bP, bE, mp, a0)
            err_n2 = err_n2[:, None]
            err_p2 = err_p2[:, None]
            ok_skip = ((err_n2 < skip_tol) & (err_p2 < skip_tol))
            done = jnp.maximum(done, jnp.maximum(
                ok_step.astype(done.dtype), ok_skip.astype(done.dtype)))
            # Stall detection: an ACTIVE sample whose residual failed to
            # contract by CHORD_STALL under a chord step means the frozen
            # Jacobian has drifted too far (or the problem is genuinely
            # hard) -> full Newton next iteration.
            act = 1.0 - done
            bad = jnp.max(act * ((err_n2 > stall * err_n) |
                                 (err_p2 > stall * err_p)).astype(
                                     act.dtype))
            ffull = jnp.where((bad > 0.5) | (it + 1 >= CHORD_BUDGET),
                              1.0, 0.0)
            return (Nk, Pk, F_N, F_P, err_n2, err_p2, done, its, it + 1,
                    ffull)

        def body(carry):
            return body_core(*carry)

        # Speculative first iteration OUTSIDE the while loop (the "no
        # while-carry on the common 1-iteration step" restructure
        # PRECISION.md's r4 sweep proposed): solve_loop only runs when at
        # least one sample failed the cheap check, so the while body
        # always executed >= once — hoisting that first execution into
        # straight-line code is bitwise-identical math.  MEASURED SLOWER
        # (r5, batch 256 T=80k: 9.4k vs 14.0k sims/min/chip): the body
        # duplication roughly doubles the per-step instruction footprint
        # and Mosaic's scheduling of the big straight-line block loses
        # more than the saved loop-carry traffic.  Kept behind
        # TRPL_CHORD_SPECULATE=1 as the recorded refutation; default off.
        carry = (Nk, Pk, F_N, F_P, err_n, err_p, done0, col0,
                 jnp.int32(0), ffull0)
        if CHORD_SPECULATE:
            carry = body(carry)
        if CHORD_SCRATCH_CARRY:
            # Scratch-resident loop state (r5 experiment): the four
            # (tile, L) arrays live in VMEM scratch between iterations;
            # the while carry holds only (tile, 1) columns and scalars.
            Nk0, Pk0, F_N0c, F_P0c, err_n, err_p, done0c, its0, it0, \
                ffull0c = carry
            nk_s[:] = Nk0
            pk_s[:] = Pk0
            fn_s[:] = F_N0c
            fp_s[:] = F_P0c

            def cond_s(carry):
                done, it = carry[2], carry[4]
                return (it < max_iters) & (jnp.min(done) < 0.5)

            def body_s(carry):
                err_n, err_p, done, its, it, ffull = carry
                out = body_core(nk_s[:], pk_s[:], fn_s[:], fp_s[:],
                                err_n, err_p, done, its, it, ffull)
                (Nk2, Pk2, F_N2, F_P2, err_n2, err_p2, done, its, it2,
                 ffull) = out
                nk_s[:] = Nk2
                pk_s[:] = Pk2
                fn_s[:] = F_N2
                fp_s[:] = F_P2
                return (err_n2, err_p2, done, its, it2, ffull)

            err_n, err_p, done, its, _, _ = jax.lax.while_loop(
                cond_s, body_s,
                (err_n, err_p, done0c, its0, it0, ffull0c))
            Nk = nk_s[:]
            Pk = pk_s[:]
        else:
            Nk, Pk, _, _, err_n, err_p, done, its, _, _ = \
                jax.lax.while_loop(cond, body, carry)
        ok_fin = ((err_n < tol) & (err_p < tol)).astype(done.dtype)
        return Nk, Pk, jnp.maximum(done, ok_fin), its

    Nk, Pk, done, its = jax.lax.cond(
        jnp.min(ok0) >= 0.5, skip_branch, solve_loop,
        (Nk, Pk, F_N0, F_P0, err_n0, err_p0))
    Ek = update_e(Nk, Pk, bE, mp, a0)
    return Nk, Pk, Ek, done, its


def _kernel(mat_ref, n0_ref, p0_ref, e0_ref, obs_ref, msk_ref, *in_rest,
            max_iters: int, tb: int, num_exp: int, normalize: bool,
            has_mask: bool, n_blocks: int, pred_order: int,
            approx_inv: bool, t_real: int, chord: bool = False,
            stride: int = 1, ext_pl0: bool = False,
            settle_guard: float = 0.0, skip_tighten: float = 1.0,
            stall: float = 0.5, offgrid_k: int = 0):
    from ...models.trpl import MatParams

    # Optional inputs (static layout): dense-output weight table + optional
    # per-fine-point mask table (coarse phases) and an external
    # normalization anchor.  OFF-GRID mode (offgrid_k = K > 0; r5):
    # obs_ref/msk_ref are reinterpreted as the slot-table values
    # (num_exp, tb, K) and the per-step LIVENESS row, and wtab_ref holds
    # the per-slot Lagrange weights (num_exp, tb, 4K, [a*K+k] layout)
    # instead of the static (3, S, 4) uniform-offset table
    # (models/offgrid.build_offgrid_tables).
    offgrid = offgrid_k > 0
    in_rest = list(in_rest)
    wtab_ref = in_rest.pop(0) if (stride > 1 or offgrid) else None
    vmask_ref = in_rest.pop(0) if ((stride > 1 and has_mask) or offgrid) \
        else None
    pl0_ref = in_rest.pop(0) if ext_pl0 else None
    bdf_ref, sc_ref = in_rest[0], in_rest[1]
    rest = in_rest[2:]

    # Outputs precede scratch in the pallas_call ref order; chord mode
    # appends fulls_out / execs_out telemetry outputs (tile-wide full-solve
    # and executed-body-iteration counts).
    n_outs = 10 if chord else 8
    if chord:
        (sse_out, esum_out, conv_out, its_out, maxit_out, n_out, p_out,
         e_out, fulls_out, execs_out) = rest[:n_outs]
    else:
        (sse_out, esum_out, conv_out, its_out, maxit_out, n_out, p_out,
         e_out) = rest[:n_outs]
    (nh, ph, eh, snap_n, snap_p, snap_e, pl0_s, sse_s, esum_s, conv_s,
     its_s, maxit_s, *extra_scratch) = rest[n_outs:]
    # Coarse phases (stride > 1) and off-grid phases prepend the
    # dense-output window scratch (lpw) to the chord scratch.
    if stride > 1 or offgrid:
        lpw, extra_scratch = extra_scratch[0], extra_scratch[1:]
    chord_scratch = extra_scratch

    t_blk = pl.program_id(1)
    tile, L = n0_ref.shape
    mp = MatParams(*(mat_ref[i, :] for i in range(12)))
    tol = sc_ref[0, 0]
    step_tol = sc_ref[0, 1]
    log_scale = sc_ref[0, 2]
    min_val = sc_ref[0, 3]

    if stride > 1 and not offgrid:
        # Cubic/quadratic/linear dense-output weight rows, streamed in as a
        # (3, S, 4) VMEM table (models/twophase._lagrange_weight_table —
        # Pallas kernels cannot capture dense constants): W[r] is (S, 4);
        # row r = min(c, 2) is selected per step with two scalar-broadcast
        # selects (the early rows only matter for c < 2).
        W0 = wtab_ref[0]
        W1 = wtab_ref[1]
        W2 = wtab_ref[2]

    def _log_pl_col(pl_col):
        # Clamp floor strictly positive in-dtype: min_val may round to 0.0
        # in f32 (models/solver._log_pl — log10(0) = -inf would NaN the
        # mixed-sign dense-output sum).
        mv = jnp.maximum(min_val, jnp.finfo(pl_col.dtype).tiny)
        if normalize:
            return jnp.log10(jnp.maximum(pl_col / pl0_s[:], mv))
        return jnp.log10(jnp.maximum(pl_col, mv)) + log_scale

    # ---- First time block of a tile: initialize the persistent scratch.
    @pl.when(t_blk == 0)
    def _init():
        n0 = n0_ref[:]
        p0 = p0_ref[:]
        z = n0 * 0.0
        for s in range(6):
            nh[s] = n0 if s == 0 else z
            ph[s] = p0 if s == 0 else z
            eh[s] = z if s != 0 else e0_ref[:]
        if chord:
            # New sample tile -> the cached factorization is foreign;
            # telemetry counters restart with the tile.
            chord_scratch[-3][0, 0] = 0.0       # cval
            chord_scratch[-2][0, 0] = 0.0       # fulls
            chord_scratch[-1][0, 0] = 0.0       # execs
        # t=0 PL (normalization anchor; the t=0 observation term is added
        # by the wrapper — it owns obs.values[:, 0]).  Coarse phases pass
        # the RUN-t=0 anchor in instead (phase-start PL is not the run
        # start; models/solver.py pl0 semantics).
        pl00 = mp.rate[:, None] * (
            jnp.sum(n0 * p0, axis=-1, keepdims=True)
            - L * (mp.n0 * mp.p0)[:, None])
        pl0_s[:] = pl0_ref[:] if ext_pl0 else pl00
        sse_s[:] = jnp.zeros_like(sse_s)
        esum_s[:] = jnp.zeros_like(esum_s)
        conv_s[:] = jnp.ones_like(conv_s)
        its_s[:] = jnp.zeros_like(its_s)
        maxit_s[:] = jnp.zeros_like(maxit_s)
        if stride > 1 or offgrid:
            # Dense-output window over the trailing 4 coarse log-PL nodes
            # (models/twophase._coarse_phase lp_win0): slots 0..2 start at
            # zero (their weights are zero while r < 2), slot 3 holds the
            # phase-start log-PL.
            zc = pl00 * 0.0
            for s in range(3):
                lpw[s] = zc
            lpw[3] = _log_pl_col(pl00)

    def one_step(t, slot_new, slots_hist):
        """Advance step t -> t+1.  slot_new = (t+1) % 6 and
        slots_hist[m] = (t - m) % 6 are STATIC (6-step unroll)."""
        row = jnp.minimum(t, 4)
        a0 = bdf_ref[row, 0]
        bN = bP = bE = None
        for m, s in enumerate(slots_hist):
            w = bdf_ref[row, m + 1]
            bN = w * nh[s] if bN is None else bN + w * nh[s]
            bP = w * ph[s] if bP is None else bP + w * ph[s]
            bE = w * eh[s] if bE is None else bE + w * eh[s]
        Nk = nh[slots_hist[0]]
        Pk = ph[slots_hist[0]]
        if pred_order:
            # Extrapolated initial iterate with positivity fallback
            # (models/solver.py bdf_step, predictor="linear"/"quadratic"):
            # same fixed point, far fewer Newton solves on smooth stretches.
            ramp = (t > 0).astype(Nk.dtype)
            d1n = Nk - nh[slots_hist[1]]
            d1p = Pk - ph[slots_hist[1]]
            Nx = Nk + ramp * d1n
            Px = Pk + ramp * d1p
            if pred_order == 2:
                ramp2 = (t > 1).astype(Nk.dtype)
                Nx = Nx + ramp2 * (d1n - (nh[slots_hist[1]] - nh[slots_hist[2]]))
                Px = Px + ramp2 * (d1p - (ph[slots_hist[1]] - ph[slots_hist[2]]))
            if pred_order == 3:
                # Geometric: X * (X / X_prev) — exact for local exponential
                # decay and free of the f32 cancellation that makes the
                # quadratic difference predictor WORSE than linear.
                Nm = nh[slots_hist[1]]
                Pm = ph[slots_hist[1]]
                Nx = jnp.where(Nm > 0, Nk * (Nk / jnp.where(Nm > 0, Nm, 1.0)), Nx)
                Px = jnp.where(Pm > 0, Pk * (Pk / jnp.where(Pm > 0, Pm, 1.0)), Px)
            Nk = jnp.where(Nx > 0, Nx, Nk)
            Pk = jnp.where(Px > 0, Px, Pk)
        if max_iters < 0:      # timing-only skeleton mode (bench A/B)
            Nn, Pn, En = Nk, Pk, eh[slots_hist[0]]
            done = jnp.ones_like(Nk)
            its = jnp.zeros_like(Nk)
        elif chord:
            Nn, Pn, En, done, its = _newton_solve_chord(
                Nk, Pk, bN, bP, bE, mp, a0, tol, step_tol, max_iters,
                chord_scratch, approx_inv=approx_inv,
                settle_guard=settle_guard, skip_tighten=skip_tighten,
                stall=stall)
        else:
            Nn, Pn, En, done, its = _newton_solve(
                Nk, Pk, bN, bP, bE, mp, a0, tol, step_tol, max_iters,
                approx_inv=approx_inv)
        nh[slot_new] = Nn
        ph[slot_new] = Pn
        eh[slot_new] = En
        # The published final state is the state at the REAL horizon
        # (cfg.num_steps): the kernel's mask-padded tail (up to tb-1 extra
        # steps when T % tb != 0) keeps stepping, but callers like
        # solve_multiphase consume n/p/e as the exact phase-boundary
        # state, so step t_real-1's output is snapshotted once.  A
        # one-shot pl.when copy costs a scalar compare per step — unlike
        # a per-step select over the (tile, L) fields, it leaves the hot
        # loop's vector op count untouched.
        @pl.when(t == t_real - 1)
        def _snap():
            snap_n[:] = Nn
            snap_p[:] = Pn
            snap_e[:] = En
        # Iteration telemetry likewise stops at the real horizon ((tile, 1)
        # column ops — negligible).
        livef = (t < t_real).astype(Nn.dtype)
        its_live = its[:, :1] * livef
        its_s[:] = its_s[:] + its_live
        maxit_s[:] = jnp.maximum(maxit_s[:], its_live)

        # ---- Fused likelihood at observation point t+1 (stride 1) or at
        # the `stride` fine observation points of coarse interval t
        # (dense output, models/twophase._coarse_phase).
        c = t - t_blk * tb          # column in this block's obs table
        pl_t = mp.rate[:, None] * (
            jnp.sum(Nn * Pn, axis=-1, keepdims=True)
            - L * (mp.n0 * mp.p0)[:, None])
        lp = _log_pl_col(pl_t)
        ok_col = done[:, :1]
        w_any = None
        if offgrid:
            # Off-grid slot scoring (models/offgrid._phase_offgrid): roll
            # the 4-node log-PL window, evaluate the K observation slots
            # of this step from the streamed per-slot Lagrange weights
            # (ramp row min(c,2) baked in host-side), accumulate
            # weight-linearly.  Unobserved steps carry weight 0 slots.
            K = offgrid_k
            lpw[0] = lpw[1]
            lpw[1] = lpw[2]
            lpw[2] = lpw[3]
            lpw[3] = lp
            for e_i in range(num_exp):
                wk = wtab_ref[e_i, c]                       # (4K,)
                lp_at = (lpw[0] * wk[0 * K:1 * K][None, :]
                         + lpw[1] * wk[1 * K:2 * K][None, :]
                         + lpw[2] * wk[2 * K:3 * K][None, :]
                         + lpw[3] * wk[3 * K:4 * K][None, :])  # (tile, K)
                err = lp_at - obs_ref[e_i, c][None, :]
                wg = vmask_ref[e_i, c][None, :]
                sse_s[e_i] = sse_s[e_i] + wg * err * err
                esum_s[e_i] = esum_s[e_i] + wg * err
            # Liveness gate (offgrid conv semantics): interior unobserved
            # steps still gate conv — their trajectory feeds later
            # observation points; only the padded tail past the LAST real
            # observation is forgiven (msk_ref row 0 = liveness flags).
            live = msk_ref[0, c]
            ok_col = jnp.where(live > 0.0, ok_col, jnp.ones_like(ok_col))
        elif stride == 1:
            for e_i in range(num_exp):
                o = obs_ref[e_i, c]
                err = lp - o
                if has_mask:
                    # Weight-linear accumulation (w e^2, w e): bitwise
                    # identical for 0/1 masks, and exact for the
                    # sigma-weighted likelihood (FusedObs.mask docs).
                    m = msk_ref[e_i, c]
                    w_any = m if w_any is None else jnp.maximum(w_any, m)
                    sse_s[e_i, :] = sse_s[e_i, :] + (m * err * err)[:, 0]
                    esum_s[e_i, :] = esum_s[e_i, :] + (m * err)[:, 0]
                else:
                    sse_s[e_i, :] = sse_s[e_i, :] + (err * err)[:, 0]
                    esum_s[e_i, :] = esum_s[e_i, :] + err[:, 0]
        else:
            # Roll the window, append the new coarse node, reconstruct
            # log-PL at the S fine offsets as a (tile, S) lane-dim op:
            # lp_fine = sum_a lpw[a] * W[r, :, a].
            lpw[0] = lpw[1]
            lpw[1] = lpw[2]
            lpw[2] = lpw[3]
            lpw[3] = lp
            Wr = jnp.where(t < 1, W0, jnp.where(t < 2, W1, W2))   # (S, 4)
            lp_fine = (lpw[0] * Wr[:, 0][None, :]
                       + lpw[1] * Wr[:, 1][None, :]
                       + lpw[2] * Wr[:, 2][None, :]
                       + lpw[3] * Wr[:, 3][None, :])              # (tile, S)
            for e_i in range(num_exp):
                o = obs_ref[e_i, c]                               # (S,)
                err = lp_fine - o[None, :]
                if has_mask:
                    vm = vmask_ref[e_i, c][None, :]
                    m = msk_ref[e_i, c]       # step weight = max over S
                    w_any = m if w_any is None else jnp.maximum(w_any, m)
                    sse_s[e_i] = sse_s[e_i] + vm * err * err
                    esum_s[e_i] = esum_s[e_i] + vm * err
                else:
                    sse_s[e_i] = sse_s[e_i] + err * err
                    esum_s[e_i] = esum_s[e_i] + err
        if has_mask:
            # Padding-only steps (zero weight in every experiment) cannot
            # poison convergence (models/solver.py pad_only semantics).
            # where, not 1-w: weights may exceed 1 (sigma-weighting).
            ok_col = jnp.where(w_any > 0.0, ok_col, 1.0)
        conv_s[:] = conv_s[:] * jnp.maximum(ok_col, 0.0)

    # ---- TB steps: fori over 6-step sub-blocks with static slot layout.
    # Block start t0 = t_blk * tb with tb % 6 == 0, so (t0 + k) % 6 == k % 6.
    def six_steps(sub, _):
        t0 = t_blk * tb + sub * 6
        for k in range(6):
            one_step(t0 + k, slot_new=(k + 1) % 6,
                     slots_hist=tuple((k - m) % 6 for m in range(5)))
        return 0

    jax.lax.fori_loop(0, tb // 6, six_steps, 0)

    # ---- Last time block: publish results.
    @pl.when(t_blk == n_blocks - 1)
    def _publish():
        if stride > 1 or offgrid:
            sse_out[:] = jnp.sum(sse_s[:], axis=-1)
            esum_out[:] = jnp.sum(esum_s[:], axis=-1)
        else:
            sse_out[:] = sse_s[:]
            esum_out[:] = esum_s[:]
        conv_out[:] = conv_s[:].astype(jnp.int32)
        its_out[:] = its_s[:].astype(jnp.int32)
        maxit_out[:] = maxit_s[:].astype(jnp.int32)
        # The snapshot holds the state at the REAL horizon (written by
        # step t_real-1; equal to the final rolling slot when T % tb == 0).
        n_out[:] = snap_n[:]
        p_out[:] = snap_p[:]
        e_out[:] = snap_e[:]
        if chord:
            fulls_out[:] = (jnp.zeros_like(its_s[:])
                            + chord_scratch[-2][0, 0]).astype(jnp.int32)
            execs_out[:] = (jnp.zeros_like(its_s[:])
                            + chord_scratch[-1][0, 0]).astype(jnp.int32)


# pl is referenced inside _kernel at trace time; import at module level so
# interpret-mode tracing sees it.
from jax.experimental import pallas as pl              # noqa: E402
from jax.experimental.pallas import tpu as pltpu       # noqa: E402


@functools.partial(
    jax.jit, static_argnames=("max_iters", "tb", "normalize", "has_mask",
                              "pred_order", "tile", "approx_inv",
                              "chord", "t_real", "interpret", "stride",
                              "settle_guard", "skip_tighten", "stall",
                              "offgrid_k"))
def _call(mat_t, n0, p0, e0, obs_sc, msk_sc, vmask_sc, pl0_in, bdf_tab,
          scalars, wt_sc=None, *,
          max_iters: int, tb: int, normalize: bool, has_mask: bool,
          pred_order: int, tile: int, approx_inv: bool, chord: bool,
          t_real: int, interpret: bool, stride: int,
          settle_guard: float = 0.0, skip_tighten: float = 1.0,
          stall: float = 0.5, offgrid_k: int = 0):
    batch, L = n0.shape
    num_exp = obs_sc.shape[0]
    n_tiles = batch // tile
    T = obs_sc.shape[1]
    n_blocks = T // tb
    grid = (n_tiles, n_blocks)
    dtype = n0.dtype
    ext_pl0 = pl0_in is not None
    offgrid = offgrid_k > 0

    zero = np.int32(0)
    tile_row = lambda i, t: (i, zero)                  # noqa: E731
    field_spec = pl.BlockSpec((tile, L), tile_row, memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((12, tile), lambda i, t: (zero, i),
                            memory_space=pltpu.VMEM)
    obs_spec = pl.BlockSpec((num_exp, tb), lambda i, t: (zero, t),
                            memory_space=pltpu.SMEM)
    # Coarse phases stream the per-fine-point observation/mask tables as
    # (num_exp, tb, S) VMEM blocks (lane dim = the S fine offsets); the
    # SMEM msk table then carries the per-STEP weights for conv freezing.
    # Off-grid phases stream (num_exp, tb, K) slot value/weight tables
    # plus a (num_exp, tb, 4K) per-slot Lagrange-weight table instead.
    slot_dim = offgrid_k if offgrid else stride
    obs3_spec = pl.BlockSpec((num_exp, tb, slot_dim),
                             lambda i, t: (zero, t, zero),
                             memory_space=pltpu.VMEM)
    wt_spec = pl.BlockSpec((num_exp, tb, 4 * offgrid_k),
                           lambda i, t: (zero, t, zero),
                           memory_space=pltpu.VMEM)
    bdf_spec = pl.BlockSpec((5, 6), lambda i, t: (zero, zero),
                            memory_space=pltpu.SMEM)
    sc_spec = pl.BlockSpec((1, 4), lambda i, t: (zero, zero),
                           memory_space=pltpu.SMEM)
    col_spec = pl.BlockSpec((tile, 1), tile_row, memory_space=pltpu.VMEM)
    exp_spec = pl.BlockSpec((num_exp, tile), lambda i, t: (zero, i),
                            memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((num_exp, batch), dtype),   # sse
        jax.ShapeDtypeStruct((num_exp, batch), dtype),   # err_sum
        jax.ShapeDtypeStruct((batch, 1), jnp.int32),     # converged
        jax.ShapeDtypeStruct((batch, 1), jnp.int32),     # sample iters
        jax.ShapeDtypeStruct((batch, 1), jnp.int32),     # max per-step iters
        jax.ShapeDtypeStruct((batch, L), dtype),         # N
        jax.ShapeDtypeStruct((batch, L), dtype),         # P
        jax.ShapeDtypeStruct((batch, L), dtype),         # E
    )
    out_specs = (exp_spec, exp_spec, col_spec, col_spec, col_spec,
                 field_spec, field_spec, field_spec)
    if chord:
        # Tile-wide full (Jacobian-refresh) solve and executed-body
        # iteration counts, broadcast to every sample of the tile
        # (telemetry: the full:chord mix for the bench roofline).
        out_shapes += (jax.ShapeDtypeStruct((batch, 1), jnp.int32),
                       jax.ShapeDtypeStruct((batch, 1), jnp.int32))
        out_specs += (col_spec, col_spec)
    scratch = [
        pltpu.VMEM((6, tile, L), dtype),    # nh
        pltpu.VMEM((6, tile, L), dtype),    # ph
        pltpu.VMEM((6, tile, L), dtype),    # eh
        pltpu.VMEM((tile, L), dtype),       # snapshot N at the real horizon
        pltpu.VMEM((tile, L), dtype),       # snapshot P
        pltpu.VMEM((tile, L), dtype),       # snapshot E
        pltpu.VMEM((tile, 1), dtype),       # pl0
        (pltpu.VMEM((num_exp, tile, slot_dim), dtype)
         if (stride > 1 or offgrid)
         else pltpu.VMEM((num_exp, tile), dtype)),           # sse
        (pltpu.VMEM((num_exp, tile, slot_dim), dtype)
         if (stride > 1 or offgrid)
         else pltpu.VMEM((num_exp, tile), dtype)),           # err_sum
        pltpu.VMEM((tile, 1), dtype),       # conv (1.0 = converged)
        pltpu.VMEM((tile, 1), dtype),       # iteration counts
        pltpu.VMEM((tile, 1), dtype),       # max per-step iterations
    ]
    if stride > 1 or offgrid:
        scratch.append(pltpu.VMEM((4, tile, 1), dtype))      # lp window
    if chord:
        ns = max(L.bit_length() - 2, 0)     # PCR sweeps (L=128 -> 6)
        scratch += [
            pltpu.VMEM((ns * 4, tile, L), dtype),   # kc1 multipliers
            pltpu.VMEM((ns * 4, tile, L), dtype),   # kc2 multipliers
            pltpu.VMEM((16, tile, L // 2), dtype),  # final pair-solve blocks
            pltpu.VMEM((tile, L), dtype),           # dx_n mailbox
            pltpu.VMEM((tile, L), dtype),           # dx_p mailbox
        ]
        if CHORD_SCRATCH_CARRY:
            scratch += [pltpu.VMEM((tile, L), dtype)] * 4   # Nk/Pk/F_N/F_P
        scratch += [
            pltpu.SMEM((1, 1), dtype),              # cache-valid flag
            pltpu.SMEM((1, 1), dtype),              # full-solve counter
            pltpu.SMEM((1, 1), dtype),              # executed-body counter
        ]
    kernel = functools.partial(
        _kernel, max_iters=max_iters, tb=tb, num_exp=num_exp,
        normalize=normalize, has_mask=has_mask, n_blocks=n_blocks,
        pred_order=pred_order, approx_inv=approx_inv, t_real=t_real,
        chord=chord, stride=stride, ext_pl0=ext_pl0,
        settle_guard=settle_guard, skip_tighten=skip_tighten,
        stall=stall, offgrid_k=offgrid_k)
    in_specs = [mat_spec, field_spec, field_spec, field_spec,
                obs3_spec if (stride > 1 or offgrid) else obs_spec,
                obs_spec]
    args = [mat_t, n0, p0, e0, obs_sc, msk_sc]
    if offgrid:
        in_specs += [wt_spec, obs3_spec]      # Lagrange table + weights
        args += [wt_sc, vmask_sc]
    elif stride > 1:
        from ...models.twophase import _lagrange_weight_table
        in_specs.append(pl.BlockSpec((3, stride, 4),
                                     lambda i, t: (zero, zero, zero),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.asarray(_lagrange_weight_table(stride), dtype))
        if has_mask:
            in_specs.append(obs3_spec)
            args.append(vmask_sc)
    if ext_pl0:
        in_specs.append(col_spec)
        args.append(pl0_in)
    in_specs += [bdf_spec, sc_spec]
    args += [bdf_tab, scalars]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
        # The full-Newton body's PCR temporaries stack-allocate past the
        # 16 MB default scoped-VMEM budget at tile=256; the explicit
        # scratch above is small (<8 MB non-chord), so raising the scoped
        # limit is free real estate on a 128 MB-VMEM v5e core.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)


def _pad_axis(x, n, axis=0, edge=True):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    if edge:
        fill = jnp.take(x, jnp.full((pad,), x.shape[axis] - 1), axis=axis)
    else:
        shape = list(x.shape)
        shape[axis] = pad
        fill = jnp.zeros(shape, x.dtype)
    return jnp.concatenate([x, fill], axis=axis)


def solve_horizon_fused(mat_nd, n_init, p_init, cfg, obs,
                        tb: int = None, tile: int = None,
                        approx_inv: bool = None, chord: bool = False,
                        interpret: bool = False, e_init=None):
    """Fused full-horizon solve + likelihood; drop-in for the
    ``solve(..., obs=obs, record_pl=False)`` chunk program
    (models/solver.py) on the fixed-dt path.

    Args:
      mat_nd: (batch, 12) nondimensionalized parameters.
      n_init/p_init: (batch, L) initial state (e_init defaults to zero, as
        every production init mode does; multiphase coarse phases pass the
        carried field).
      cfg: SolverConfig; num_steps need not divide tb (the horizon is
        mask-padded up to a multiple, and convergence freezes at the real
        horizon).
      obs: FusedObs on the fine step grid (values (num_exp, T+1)).

    Returns a SolveResult with sse/err_sum/converged/sample_iters and the
    final state at the REAL horizon (cfg.num_steps): when T % tb != 0 the
    kernel still runs mask-padded steps up to the block boundary, but the
    published state, iteration counts, and likelihood terms freeze at
    step T, so callers (solve_multiphase phase boundaries, continue-style
    segmentation) see exactly the scan path's semantics.  pl is None
    (fused likelihood only).
    """
    from ...models.solver import SolveResult
    if tb is None:
        tb = TIME_BLOCK        # module attr, resolved at call time so the
        #                        solve() dispatch path is testable with a
        #                        small block (monkeypatch TIME_BLOCK)
    if tb % 6:
        raise ValueError(f"time block {tb} must be divisible by 6")
    if cfg.pl_stride != 1:
        raise ValueError("fused horizon kernel requires pl_stride == 1")
    from ...models.trpl import BDF_TABLE

    dtype = n_init.dtype
    batch, L = n_init.shape
    T = cfg.num_steps
    Tp = -(-T // tb) * tb

    if tile is None:
        # Chord mode carries the cached PCR factorization (~56 extra
        # (tile, L) scratch arrays); halve the tile to stay inside VMEM.
        tile = min(int(_TILE_ENV) if _TILE_ENV
                   else (_chord_tile(cfg) if chord else SAMPLE_TILE),
                   -(-batch // 8) * 8)
    padded = -(-batch // tile) * tile

    values = jnp.asarray(obs.values, dtype)
    num_exp = values.shape[0]
    # Per-step tables: column j holds the observation at step j+1.
    obs_sc = _pad_axis(values[:, 1:T + 1], Tp, axis=1, edge=False)
    if obs.mask is not None:
        msk_sc = _pad_axis(jnp.asarray(obs.mask, dtype)[:, 1:T + 1], Tp,
                           axis=1, edge=False)
        has_mask = True
    elif Tp != T:
        msk_sc = _pad_axis(jnp.ones((num_exp, T), dtype), Tp, axis=1,
                           edge=False)
        has_mask = True
    else:
        msk_sc = jnp.ones((num_exp, Tp), dtype)
        has_mask = False

    bdf_tab = jnp.asarray(BDF_TABLE, dtype)
    step_tol = 0.0 if cfg.step_tol is None else float(cfg.step_tol)
    # log_scale may be a traced scalar (the production runner passes it as
    # a jitted argument) — never float() it; assemble scalars with jnp.
    log_scale = (jnp.zeros((), dtype) if obs.normalize
                 else jnp.asarray(obs.log_scale, dtype).reshape(()))
    scalars = jnp.stack([jnp.asarray(cfg.tol, dtype),
                         jnp.asarray(step_tol, dtype),
                         log_scale,
                         jnp.asarray(obs.min_val, dtype)]).reshape(1, 4)

    mat_t = jnp.transpose(jnp.asarray(mat_nd, dtype))      # (12, batch)
    n0 = n_init.astype(dtype)
    p0 = p_init.astype(dtype)
    if padded != batch:
        mat_t = _pad_axis(mat_t, padded, axis=1)
        n0 = _pad_axis(n0, padded)
        p0 = _pad_axis(p0, padded)

    e0 = (jnp.zeros_like(n0) if e_init is None
          else _pad_axis(e_init.astype(dtype), padded))
    if approx_inv is None:
        # pl.reciprocal is TPU-hardware-backed; interpret mode (CPU
        # testing) keeps exact divides so parity gates stay strict.
        approx_inv = not interpret
    settle_guard, skip_tighten, stall = _chord_knobs(cfg)
    outs = _call(
        mat_t, n0, p0, e0, obs_sc, msk_sc, None, None, bdf_tab, scalars,
        max_iters=int(cfg.max_iters), tb=int(tb),
        normalize=bool(obs.normalize), has_mask=has_mask,
        pred_order={"previous": 0, "linear": 1, "quadratic": 2,
                    "geometric": 3}[cfg.predictor],
        tile=int(tile),
        approx_inv=bool(approx_inv), chord=bool(chord),
        t_real=int(T), interpret=bool(interpret), stride=1,
        settle_guard=settle_guard, skip_tighten=skip_tighten,
        stall=stall)
    sse, esum, conv, its, maxit, n_f, p_f, e_f = outs[:8]
    fulls = outs[8][:, 0] if chord else None
    execs = outs[9][:, 0] if chord else None

    # t=0 observation term (the kernel owns steps 1..T).
    from ...models.solver import _log_pl, pl_observable
    from ...models.trpl import MatParams
    mp = MatParams.from_array(jnp.asarray(mat_nd, dtype))
    pl0 = pl_observable(n0[:batch], p0[:batch], mp)
    e0 = _log_pl(pl0, obs, pl0) - values[:, 0:1]
    if obs.mask is not None:
        # Weight-linear t=0 term (bitwise identical for 0/1 masks).
        m0 = jnp.asarray(obs.mask, dtype)[:, 0:1]
        sse = sse[:, :batch] + m0 * e0 ** 2
        esum = esum[:, :batch] + m0 * e0
    else:
        sse = sse[:, :batch] + e0 ** 2
        esum = esum[:, :batch] + e0
    its_b = its[:batch, 0]
    return SolveResult(
        pl=None, n=n_f[:batch], p=p_f[:batch], e=e_f[:batch],
        converged=conv[:batch, 0].astype(bool),
        max_newton_iters=jnp.max(maxit[:batch, 0]),
        sse=sse, err_sum=esum, sample_iters=its_b,
        full_solves=None if fulls is None else fulls[:batch],
        tile_body_iters=None if execs is None else execs[:batch])


def _coarse_time_block(C: int) -> int:
    """Time block for a C-coarse-step phase.

    Coarse phases are short (production ladder: C <= ~1300), so the whole
    phase runs as ONE time block: tb = C rounded up to a multiple of 24
    (the rolling-slot unroll needs %6, the (num_exp, tb, S) VMEM
    observation block's sublane dim needs %8) — when the block covers the
    whole array every Mosaic tiling constraint is satisfied by equality,
    and mask-padded tail steps are minimal (e.g. C=1024 -> 8).  Very long
    phases fall back to multi-block streaming at tb=384 = lcm(6, 128)
    (the per-step SMEM tables' lane dim needs %128 when blocked)."""
    if C <= 4096:
        return -(-C // 24) * 24
    return 384


def solve_coarse_phase_fused(mat_nd, n_init, p_init, e_init, cfg, obs, pl0,
                             t_off: int, n_fine: int, S: int,
                             tb: int = None, tile: int = None,
                             approx_inv: bool = None, chord: bool = False,
                             interpret: bool = False):
    """One coarse phase of the multiphase stride ladder in a single Pallas
    launch; drop-in for ``models.twophase._coarse_phase`` (same dt
    rescaling, BDF order-ramp restart, and in-log-space cubic dense output
    of the likelihood at every fine observation point — see that function
    for the semantics this kernel mirrors).

    The scan path launches per-BDF-step XLA programs, so the rolling
    histories round-trip HBM every coarse step; here they stay VMEM-resident
    for the whole phase and the dense-output window (4 trailing log-PL
    nodes) lives in a (4, tile, 1) scratch, with the (num_exp, C, S)
    fine-point observation table streamed per time block.

    Args:
      mat_nd: (batch, 12) FINE-dt nondimensionalized parameters (rescaled
        to the coarse step internally, twophase.rescale_dt).
      n_init/p_init/e_init: (batch, L) phase-start state.
      obs: FusedObs on the FINE grid covering the full run (values
        (num_exp, T_total+1)); this phase consumes points
        (t_off, t_off + n_fine].
      pl0: (batch,) run-t=0 fine-dt PL (self-normalization anchor).

    Returns a SolveResult for THIS phase only (likelihood terms over the
    phase's observation points, conv starting fresh); the caller merges
    with the carried accumulators.
    """
    from ...models.solver import SolveResult
    from ...models.trpl import BDF_TABLE
    from ...models.twophase import rescale_dt

    if n_fine % S:
        raise ValueError(f"phase length {n_fine} not divisible by S={S}")
    C = n_fine // S
    dtype = n_init.dtype
    batch, L = n_init.shape
    if tb is None:
        tb = _coarse_time_block(C)
    if tb % 24:
        raise ValueError(f"coarse time block {tb} must be divisible by 24")
    Cp = -(-C // tb) * tb

    if tile is None:
        tile = min(int(_TILE_ENV) if _TILE_ENV
                   else (_chord_tile(cfg) if chord else SAMPLE_TILE),
                   -(-batch // 8) * 8)
    padded = -(-batch // tile) * tile

    # Phase observation table: (num_exp, C, S) fine points, zero-padded to
    # the block boundary; the SMEM per-step weights carry max-over-S.
    values = jnp.asarray(obs.values, dtype)
    num_exp = values.shape[0]
    sl = values[:, t_off + 1:t_off + n_fine + 1].reshape(num_exp, C, S)
    obs_sc = _pad_axis(sl, Cp, axis=1, edge=False)
    if obs.mask is not None:
        vm = jnp.asarray(obs.mask, dtype)[:, t_off + 1:t_off + n_fine + 1]
        vm = vm.reshape(num_exp, C, S)
    elif Cp != C:
        vm = jnp.ones((num_exp, C, S), dtype)
    else:
        vm = None
    has_mask = vm is not None
    if has_mask:
        vmask_sc = _pad_axis(vm, Cp, axis=1, edge=False)
        msk_sc = jnp.max(vmask_sc, axis=-1)                # (num_exp, Cp)
    else:
        vmask_sc = None
        msk_sc = jnp.ones((num_exp, Cp), dtype)

    # Coarse-dt units: rate columns rescale; nondimensional PL scales with
    # dt, so the log offset (and the normalization anchor) shift by S.
    mat_c = rescale_dt(jnp.asarray(mat_nd, dtype), S)
    bdf_tab = jnp.asarray(BDF_TABLE, dtype)
    step_tol = 0.0 if cfg.step_tol is None else float(cfg.step_tol)
    if obs.normalize:
        log_scale = jnp.zeros((), dtype)
    else:
        log_scale = (jnp.asarray(obs.log_scale, dtype).reshape(())
                     - jnp.asarray(np.log10(S), dtype))
    scalars = jnp.stack([jnp.asarray(cfg.tol, dtype),
                         jnp.asarray(step_tol, dtype),
                         log_scale,
                         jnp.asarray(obs.min_val, dtype)]).reshape(1, 4)

    mat_t = jnp.transpose(mat_c)                           # (12, batch)
    n0 = n_init.astype(dtype)
    p0 = p_init.astype(dtype)
    e0 = e_init.astype(dtype)
    pl0_in = None
    if obs.normalize:
        pl0_in = (jnp.asarray(pl0, dtype) * S).reshape(batch, 1)
    if padded != batch:
        mat_t = _pad_axis(mat_t, padded, axis=1)
        n0 = _pad_axis(n0, padded)
        p0 = _pad_axis(p0, padded)
        e0 = _pad_axis(e0, padded)
        if pl0_in is not None:
            pl0_in = _pad_axis(pl0_in, padded)

    if approx_inv is None:
        approx_inv = not interpret
    settle_guard, skip_tighten, stall = _chord_knobs(cfg)
    outs = _call(
        mat_t, n0, p0, e0, obs_sc, msk_sc, vmask_sc, pl0_in, bdf_tab,
        scalars,
        max_iters=int(cfg.max_iters), tb=int(tb),
        normalize=bool(obs.normalize), has_mask=has_mask,
        pred_order={"previous": 0, "linear": 1, "quadratic": 2,
                    "geometric": 3}[cfg.predictor],
        tile=int(tile),
        approx_inv=bool(approx_inv), chord=bool(chord),
        t_real=int(C), interpret=bool(interpret), stride=int(S),
        settle_guard=settle_guard, skip_tighten=skip_tighten,
        stall=stall)
    sse, esum, conv, its, maxit, n_f, p_f, e_f = outs[:8]
    fulls = outs[8][:, 0] if chord else None
    execs = outs[9][:, 0] if chord else None
    return SolveResult(
        pl=None, n=n_f[:batch], p=p_f[:batch], e=e_f[:batch],
        converged=conv[:batch, 0].astype(bool),
        max_newton_iters=jnp.max(maxit[:batch, 0]),
        sse=sse[:, :batch], err_sum=esum[:, :batch],
        sample_iters=its[:batch, 0],
        full_solves=None if fulls is None else fulls[:batch],
        tile_body_iters=None if execs is None else execs[:batch])


def solve_phase_offgrid_fused(mat_nd, n_init, p_init, e_init, cfg, obs_meta,
                              tbl, pl0, S: int, live,
                              tb: int = None, tile: int = None,
                              approx_inv: bool = None, chord: bool = False,
                              interpret: bool = False):
    """One OFF-GRID phase in a single Pallas launch; drop-in for
    ``models.offgrid._phase_offgrid`` (same dt rescaling, BDF order-ramp
    restart, per-slot Lagrange dense output, weight-linear accumulation,
    and liveness-gated convergence — see that function for the semantics
    this kernel mirrors; r5, closing the off-grid fast-path gap VERDICT
    r4 named: coarse phases previously ran per-step XLA/Pallas launches).

    Args:
      mat_nd: (batch, 12) FINE-dt nondimensionalized parameters.
      obs_meta: FusedObs carrying only scalars (log_scale, min_val,
        normalize) — values live in the slot tables.
      tbl: (W (C, E, K, 4), V (C, E, K), M (C, E, K)) phase slot tables
        (models/offgrid.build_offgrid_tables; M carries the per-point
        weights, sigma-weighted or 0/1).
      pl0: (batch,) run-t=0 fine-dt PL (self-normalization anchor).
      S: this phase's stride (1 for the fine phase).
      live: (C,) liveness flags — steps at or before the last real
        observation gate convergence; the padded tail is forgiven.

    Returns a SolveResult for THIS phase only; the caller merges with the
    carried accumulators exactly as for ``solve_coarse_phase_fused``.
    """
    from ...models.solver import SolveResult
    from ...models.trpl import BDF_TABLE
    from ...models.twophase import rescale_dt

    W_all, V_all, M_all = tbl
    C, num_exp, K = np.asarray(V_all.shape)
    C, num_exp, K = int(C), int(num_exp), int(K)
    dtype = n_init.dtype
    batch, L = n_init.shape
    if tb is None:
        tb = _coarse_time_block(C)
    if tb % 24:
        raise ValueError(f"time block {tb} must be divisible by 24")
    Cp = -(-C // tb) * tb

    if tile is None:
        tile = min(int(_TILE_ENV) if _TILE_ENV
                   else (_chord_tile(cfg) if chord else SAMPLE_TILE),
                   -(-batch // 8) * 8)
    padded = -(-batch // tile) * tile

    # Slot tables -> kernel layout: values/weights (E, Cp, K); Lagrange
    # weights (E, Cp, 4K) with [a*K + k] lane layout (static in-kernel
    # slices).  Zero padding past C contributes nothing.
    V = _pad_axis(jnp.transpose(jnp.asarray(V_all, dtype), (1, 0, 2)),
                  Cp, axis=1, edge=False)
    Mw = _pad_axis(jnp.transpose(jnp.asarray(M_all, dtype), (1, 0, 2)),
                   Cp, axis=1, edge=False)
    Wt = jnp.transpose(jnp.asarray(W_all, dtype), (1, 0, 3, 2))  # (E,C,4,K)
    Wt = _pad_axis(Wt.reshape(num_exp, C, 4 * K), Cp, axis=1, edge=False)
    # Liveness row (read as msk_ref[0, c]); zero-padded tail is forgiven.
    live_sc = _pad_axis(
        jnp.broadcast_to(jnp.asarray(live, dtype)[None, :], (num_exp, C)),
        Cp, axis=1, edge=False)

    mat_c = rescale_dt(jnp.asarray(mat_nd, dtype), S) if S != 1 \
        else jnp.asarray(mat_nd, dtype)
    bdf_tab = jnp.asarray(BDF_TABLE, dtype)
    step_tol = 0.0 if cfg.step_tol is None else float(cfg.step_tol)
    if obs_meta.normalize:
        log_scale = jnp.zeros((), dtype)
    else:
        log_scale = (jnp.asarray(obs_meta.log_scale, dtype).reshape(())
                     - jnp.asarray(np.log10(S), dtype))
    scalars = jnp.stack([jnp.asarray(cfg.tol, dtype),
                         jnp.asarray(step_tol, dtype),
                         log_scale,
                         jnp.asarray(obs_meta.min_val, dtype)]).reshape(1, 4)

    mat_t = jnp.transpose(mat_c)                           # (12, batch)
    n0 = n_init.astype(dtype)
    p0 = p_init.astype(dtype)
    e0 = e_init.astype(dtype)
    pl0_in = None
    if obs_meta.normalize:
        pl0_in = (jnp.asarray(pl0, dtype) * S).reshape(batch, 1)
    if padded != batch:
        mat_t = _pad_axis(mat_t, padded, axis=1)
        n0 = _pad_axis(n0, padded)
        p0 = _pad_axis(p0, padded)
        e0 = _pad_axis(e0, padded)
        if pl0_in is not None:
            pl0_in = _pad_axis(pl0_in, padded)

    if approx_inv is None:
        approx_inv = not interpret
    settle_guard, skip_tighten, stall = _chord_knobs(cfg)
    outs = _call(
        mat_t, n0, p0, e0, V, live_sc, Mw, pl0_in, bdf_tab, scalars, Wt,
        max_iters=int(cfg.max_iters), tb=int(tb),
        normalize=bool(obs_meta.normalize), has_mask=False,
        pred_order={"previous": 0, "linear": 1, "quadratic": 2,
                    "geometric": 3}[cfg.predictor],
        tile=int(tile),
        approx_inv=bool(approx_inv), chord=bool(chord),
        t_real=int(C), interpret=bool(interpret), stride=1,
        settle_guard=settle_guard, skip_tighten=skip_tighten,
        stall=stall, offgrid_k=int(K))
    sse, esum, conv, its, maxit, n_f, p_f, e_f = outs[:8]
    fulls = outs[8][:, 0] if chord else None
    execs = outs[9][:, 0] if chord else None
    return SolveResult(
        pl=None, n=n_f[:batch], p=p_f[:batch], e=e_f[:batch],
        converged=conv[:batch, 0].astype(bool),
        max_newton_iters=jnp.max(maxit[:batch, 0]),
        sse=sse[:, :batch], err_sum=esum[:, :batch],
        sample_iters=its[:batch, 0],
        full_solves=None if fulls is None else fulls[:batch],
        tile_body_iters=None if execs is None else execs[:batch])
