"""Multi-phase fast solver: fine BDF steps through the stiff excitation
transient, then progressively coarser BDF phases with high-order dense
output of log-PL at every fine observation time.

The reference integrates the full 2000 ns horizon at dt = 25 ps (80,000
steps; parallel_bayes_gpu.py:74-75) because its CUDA kernel has a fixed
step and emits PL every step.  Physically, the PL transient is stiff only
for the first few ns after excitation; beyond that the solution decays on
~ns-to-us scales and dt = 25 ps oversamples it by orders of magnitude —
and the oversampling factor *grows* with delay time, which is what the
geometric stride ladder (8 -> 16 -> 32 -> 64 ...) exploits.

Each coarse phase restarts BDF (order ramp) at step size S*dt and
reconstructs log10-PL at the S-1 skipped fine times per coarse interval by
cubic Lagrange interpolation *in log space* (PL decays ~exponentially, so
log-PL is nearly linear and the cubic error is far below the float32 floor
— gated against the single-phase solver in tests/test_twophase.py).  The
fused likelihood consumes every one of the T+1 fine observation points,
exactly like the single-phase solver, so the work product is identical
within solver accuracy.

State carries over unchanged between phases: the nondimensional N', P'
(carriers/cell) and E' (q E dx / kB T) do not depend on dt; only the rate
columns of the parameter matrix rescale (rescale_dt).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .solver import (FusedObs, HISTORY, SolveResult, SolverConfig, _log_pl,
                     bdf_step, init_history, pl_observable, solve)
from .trpl import MatParams

# Columns of the nondimensionalized parameter matrix that scale with dt
# (see physics.nondim_scales): diffusivities, B, surface S, Auger ~ dt;
# lifetimes ~ 1/dt.
_DT_SCALING = np.array([0, 0, 1, 1, 1, 1, 1, 1, 1, -1, -1, 0])

# (stride, num_fine_steps) pairs; stride 1 first (the fine phase).
Schedule = Tuple[Tuple[int, int], ...]


def rescale_dt(mat_nd, factor: float):
    """Rescale nondimensional parameters from step dt to step factor*dt."""
    scale = jnp.asarray(float(factor) ** _DT_SCALING, mat_nd.dtype)
    return mat_nd * scale[None, :]


def _lagrange_weight_table(S: int) -> np.ndarray:
    """(3, S, 4) interpolation weights for the S fine offsets of one coarse
    interval, over the trailing window of coarse log-PL nodes.

    Row r = min(c, 2) selects the order used at coarse step c:
      r=0: linear on nodes {c, c+1}            (window cols 2, 3)
      r=1: quadratic on nodes {c-1, c, c+1}    (window cols 1, 2, 3)
      r=2: cubic on nodes {c-2 .. c+1}         (window cols 0..3)
    Offsets j=1..S evaluate at the fine times inside (c, c+1]; j=S lands on
    the node and every row reduces to the exact value.
    """
    tab = np.zeros((3, S, 4))
    for r, nodes in enumerate(([2.0, 3.0], [1.0, 2.0, 3.0], [0.0, 1.0, 2.0, 3.0])):
        cols = list(range(4 - len(nodes), 4))
        for j in range(1, S + 1):
            x = 2.0 + j / S
            for a, xa in enumerate(nodes):
                w = 1.0
                for b, xb in enumerate(nodes):
                    if a != b:
                        w *= (x - xb) / (xa - xb)
                tab[r, j - 1, cols[a]] = w
    return tab


def geometric_schedule(T: int, fine_steps: int = 2048, base_stride: int = 8,
                       growth: int = 2, coarse_steps_per_phase: int = 1024,
                       max_stride: int = 64) -> Schedule:
    """Build a fine-then-geometric phase schedule covering T fine steps.

    Phase 1 covers ``fine_steps`` at stride 1; subsequent phases run
    ``coarse_steps_per_phase`` coarse steps at strides base_stride,
    base_stride*growth, ... capped at ``max_stride``; the final phase (at
    max_stride, or earlier if T is short) absorbs the remainder.  Any
    sub-stride leftover is folded into the fine phase, so the schedule sums
    exactly to T.
    """
    if fine_steps >= T:
        return ((1, T),)
    rem = T - fine_steps
    parts = []
    s = base_stride
    while rem >= s:
        if s >= max_stride or coarse_steps_per_phase * s >= rem:
            take = (rem // s) * s             # final phase absorbs the rest
        else:
            take = coarse_steps_per_phase * s
        parts.append((s, take))
        rem -= take
        s = min(s * growth, max_stride)
    return ((1, fine_steps + rem),) + tuple(parts)


def _validate_schedule(schedule: Schedule, T: int) -> None:
    if not schedule or schedule[0][0] != 1:
        raise ValueError("schedule must start with a stride-1 fine phase")
    total = 0
    for s, n in schedule:
        if n % s:
            raise ValueError(f"phase length {n} not divisible by stride {s}")
        total += n
    if total != T:
        raise ValueError(f"schedule covers {total} steps, expected {T}")


def _coarse_phase(mat_nd, n0, p0, e0, cfg: SolverConfig, obs: FusedObs,
                  pl0, acc, t_off: int, n_fine: int, S: int):
    """Run one coarse phase of n_fine//S steps at stride S starting from
    state (n0, p0, e0), accumulating the fused likelihood over the fine
    observation points in (t_off, t_off + n_fine].

    ``acc`` = (converged, max_iters, sse, err_sum) carried across phases;
    ``pl0`` is the t=0 fine-dt PL (for self-normalization).  Returns
    (n, p, e, acc).
    """
    C = n_fine // S
    dtype = n0.dtype
    mat_c = rescale_dt(mat_nd, S)
    mp = MatParams.from_array(mat_c).astype(dtype)
    # Nondimensional PL scales with dt: adjust the log offset (and pl0 for
    # self-normalization) to coarse units.  Keep the offset in the compute
    # dtype: a bare np.float64 scalar would promote the whole likelihood
    # chain to f64 under x64 (scan carry dtype mismatch).
    obs_c = FusedObs(values=obs.values,
                     log_scale=(jnp.asarray(obs.log_scale, dtype)
                                - jnp.asarray(np.log10(S), dtype)),
                     min_val=obs.min_val, normalize=obs.normalize)
    pl0_c = pl0 * S
    tol = jnp.asarray(cfg.tol, dtype)

    nh, ph, eh = init_history(n0, p0, e0, dtype)
    lp_start = _log_pl(pl_observable(n0, p0, mp), obs_c, pl0_c)
    batch = n0.shape[0]
    lp_win0 = jnp.zeros((4, batch), dtype).at[3].set(lp_start)

    wtab = jnp.asarray(_lagrange_weight_table(S), dtype)
    # Observation slices for this phase: (C, num_exp, S).
    def slice_phase(v):
        out = v[:, t_off + 1:t_off + n_fine + 1].reshape(v.shape[0], C, S)
        return jnp.moveaxis(out, 1, 0)
    obs_sl = slice_phase(obs.values)
    mask_sl = slice_phase(obs.mask) if obs.mask is not None else None
    has_mask = mask_sl is not None

    def step(carry, xs):
        nh, ph, eh, lp_win, conv, max_it, samp_it, sse, esum = carry
        if has_mask:
            c, obs_slice, mask_slice = xs
        else:
            (c, obs_slice), mask_slice = xs, None
        nh, ph, eh, state, iters, ok = bdf_step(c, nh, ph, eh, mp, cfg, tol, dtype)
        Nn, Pn, _ = state
        lp_new = _log_pl(pl_observable(Nn, Pn, mp), obs_c, pl0_c)
        lp_win = jnp.concatenate([lp_win[1:], lp_new[None]], axis=0)
        W = wtab[jnp.minimum(c, 2)]                       # (S, 4)
        # Broadcast multiply-sum, NOT tensordot/matmul: XLA:TPU miscompiles
        # the tiny (S,4)x(4,batch) dot inside this scan (returns a constant
        # per step — caught by tools/accuracy_gate.py at full scale; the
        # identical dot traced outside the scan is fine).  The elementwise
        # form lowers to plain VPU ops and is immune.
        lp_fine = jnp.sum(W[:, :, None] * lp_win[None, :, :], axis=1)  # (S, batch)
        e = lp_fine[None, :, :] - obs_slice[:, :, None]   # (num_exp, S, batch)
        if mask_slice is not None:
            # Weight-linear accumulation (w e^2, w e) — bitwise identical
            # for 0/1 masks, exact for sigma weights (FusedObs.mask docs).
            m = mask_slice[:, :, None]
            # Padding-only coarse steps (bucket_horizons tail) carry no
            # likelihood weight; Newton failures there must not NaN the
            # sample (conv freezes at the end of the real horizon).
            ok = ok | (jnp.sum(mask_slice) == 0)
            sse = sse + jnp.sum(m * e * e, axis=1)
            esum = esum + jnp.sum(m * e, axis=1)
        else:
            sse = sse + jnp.sum(e * e, axis=1)
            esum = esum + jnp.sum(e, axis=1)
        return (nh, ph, eh, lp_win, conv & ok,
                jnp.maximum(max_it, jnp.max(iters)), samp_it + iters,
                sse, esum), None

    conv, max_it, samp_it, sse, esum = acc
    carry0 = (nh, ph, eh, lp_win0, conv, max_it, samp_it, sse, esum)
    xs = ((jnp.arange(C), obs_sl, mask_sl) if has_mask
          else (jnp.arange(C), obs_sl))
    (nh, ph, eh, _, conv, max_it, samp_it, sse, esum), _ = jax.lax.scan(
        step, carry0, xs)

    k_final = jnp.mod(C, HISTORY)
    n_f, p_f, e_f = (jax.lax.dynamic_index_in_dim(h, k_final, keepdims=False)
                     for h in (nh, ph, eh))
    return n_f, p_f, e_f, (conv, max_it, samp_it, sse, esum)


def solve_multiphase(mat_nd, n_init, p_init, e_init, cfg: SolverConfig,
                     obs: FusedObs, schedule: Schedule) -> SolveResult:
    """Fused-likelihood solve of cfg.num_steps fine-dt steps via the given
    fine/coarse phase schedule.  Requires fused observations (record_pl is
    the single-phase solver's job)."""
    if cfg.pl_stride != 1:
        raise ValueError("multi-phase solver requires pl_stride == 1")
    # The fast path's 5e-4 accuracy gate requires the STRICT chord
    # acceptance profile (settle on full Newton steps only, 10x tighter
    # chord skip); the exact single-phase mode keeps the throughput
    # profile (SolverConfig.chord_strict, horizon_kernel._chord_knobs).
    if cfg.method == "fused_horizon_chord" and not cfg.chord_strict:
        cfg = cfg._replace(chord_strict=True)
    schedule = tuple((int(s), int(n)) for s, n in schedule)
    _validate_schedule(schedule, cfg.num_steps)
    dtype = n_init.dtype
    mp_fine = MatParams.from_array(mat_nd).astype(dtype)

    # ---- Phase 1: fine steps, standard fused solve over obs[:, :T1+1].
    T1 = schedule[0][1]
    obs1 = FusedObs(values=obs.values[:, :T1 + 1], log_scale=obs.log_scale,
                    min_val=obs.min_val, normalize=obs.normalize,
                    mask=None if obs.mask is None else obs.mask[:, :T1 + 1])
    cfg1 = cfg._replace(num_steps=T1, record_state_stride=None,
                        record_iters=False)
    r1 = solve(mat_nd, n_init, p_init, e_init, cfg1, obs=obs1, record_pl=False)

    pl0 = pl_observable(n_init.astype(dtype), p_init.astype(dtype), mp_fine)

    n, p, e = r1.n, r1.p, r1.e
    acc = (r1.converged, r1.max_newton_iters, r1.sample_iters,
           r1.sse, r1.err_sum)
    t_off = T1
    # cfg.method="fused_horizon[_chord]" routes the coarse phases through
    # the persistent-VMEM Pallas kernel too (one launch per phase; the
    # fine phase already dispatched inside solve()); the scan path below
    # is the reference implementation it is gated against
    # (tests/test_twophase.py).
    from .solver import _horizon_kernel_ok
    use_kernel = (cfg.method in ("fused_horizon", "fused_horizon_chord")
                  and _horizon_kernel_ok())
    for S, n_fine in schedule[1:]:
        if use_kernel:
            from ..ops.pallas.horizon_kernel import solve_coarse_phase_fused
            r = solve_coarse_phase_fused(
                mat_nd, n, p, e, cfg, obs, pl0, t_off, n_fine, S,
                chord=cfg.method == "fused_horizon_chord",
                interpret=jax.default_backend() != "tpu")
            n, p, e = r.n, r.p, r.e
            conv, max_it, samp_it, sse, esum = acc
            acc = (conv & r.converged,
                   jnp.maximum(max_it, r.max_newton_iters),
                   samp_it + r.sample_iters,
                   sse + r.sse, esum + r.err_sum)
        else:
            n, p, e, acc = _coarse_phase(mat_nd, n, p, e, cfg, obs, pl0,
                                         acc, t_off, n_fine, S)
        t_off += n_fine
    conv, max_it, samp_it, sse, esum = acc
    return SolveResult(pl=None, n=n, p=p, e=e, converged=conv,
                       max_newton_iters=max_it, sse=sse, err_sum=esum,
                       sample_iters=samp_it)


def solve_two_phase(mat_nd, n_init, p_init, e_init, cfg: SolverConfig,
                    obs: FusedObs, fine_steps: int, coarse_stride: int) -> SolveResult:
    """Two-phase special case of :func:`solve_multiphase` (kept as the
    stable API used by the runner when no stride ladder is configured)."""
    T1, S = int(fine_steps), int(coarse_stride)
    T = cfg.num_steps
    if (T - T1) % S:
        raise ValueError(f"(T - fine_steps) = {T - T1} not divisible by S={S}")
    return solve_multiphase(mat_nd, n_init, p_init, e_init, cfg, obs,
                            ((1, T1), (S, T - T1)))
