"""BDF time-evolution of the TRPL model as a single fused XLA computation.

TPU-first design decisions (vs the reference GPU kernel, pvSimPCR.py:227-306):

* The sample axis is the leading batch dimension; the L=128 spatial axis sits
  on the TPU lanes.  One ``jax.lax.scan`` covers the whole time horizon with
  no per-step host synchronization (the reference re-launches kernels and
  round-trips PL through the host per 1024-sample block).
* PL is emitted by an outer scan whose step advances ``pl_stride`` BDF steps
  (inner ``fori_loop``), so memory for the PL trace is exactly
  (T // pl_stride, batch) and per-sample state recording stays bounded.
* The observation log-likelihood can be *fused into the scan*: instead of
  materializing a (batch, T+1) PL matrix, log10-ing it, and reducing it in a
  separate kernel (reference: bayeslib.py:157-201 -> probs.py), the scan
  carries running sums of the log-residual and its square.  The sampled
  ``mag_offset`` enters the likelihood in closed form afterwards:
  sum((e + m)^2) = sum(e^2) + 2 m sum(e) + n m^2.
* Non-convergence is a per-sample flag, not a global abort
  (reference: pvSimPCR.py:269-292).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .newton import coupled_newton_step
from .trpl import BDF_TABLE, HISTORY, MatParams, implicit_step


class SolverConfig(NamedTuple):
    """Static solve configuration (nondimensional grid: dt == 1)."""
    num_steps: int                 # T: number of BDF steps
    pl_stride: int = 1             # plT: record PL every pl_stride steps
    tol: float = 1e-7              # Newton convergence tolerance (10^-tol_exp)
    max_iters: int = 10000         # Newton iteration cap per step
    step_tol: Optional[float] = None  # also accept max|dX| <= step_tol*max|X|
    #                                   (f32: the relative-residual metric can
    #                                   stall at the rounding floor while the
    #                                   state has stopped changing; None = off,
    #                                   reference semantics)
    record_state_stride: Optional[int] = None  # emit (N, P, E) snapshots
    record_iters: bool = False     # emit per-outer-step Newton iteration counts
    predictor: str = "previous"    # "previous" (reference) | "linear" extrapolation
    method: str = "gauss_seidel"   # "gauss_seidel" (reference scheme) |
    #                                "coupled_newton" (exact Jacobian, E eliminated) |
    #                                "coupled_newton_pallas" (same math, fused
    #                                Pallas TPU kernel; f32, modest max_iters) |
    #                                "fused_horizon" (whole fixed-dt horizon in
    #                                ONE Pallas launch, VMEM-resident history;
    #                                falls back to coupled_newton stepping when
    #                                the call needs features the kernel lacks —
    #                                PL traces, segmentation, state recording) |
    #                                "fused_horizon_chord" (fused_horizon with a
    #                                VMEM-cached frozen-Jacobian PCR
    #                                factorization reused across steps; same
    #                                residual acceptance gates, ~1.4x faster —
    #                                the production exact-mode method)
    chord_strict: bool = False     # chord acceptance profile (fused_horizon_chord
    #                                only).  False (default): state-settled
    #                                samples freeze on cheap chord steps when
    #                                their residual is within
    #                                CHORD_SETTLE_GUARD x tol — the exact-mode
    #                                throughput configuration (~1.75x; adds
    #                                ~1e-3 rms log10-PL drift vs full-Newton
    #                                f32, still 3x below the reference's own
    #                                f32 scheme).  True: settle acceptance
    #                                requires a full-Newton step and the
    #                                chord skip threshold tightens 10x — the
    #                                gate-validated profile solve_multiphase
    #                                forces for the production fast path.


@jax.tree_util.register_pytree_node_class
class FusedObs:
    """Observations for in-scan likelihood accumulation.

    ``values``: (num_exp, T // pl_stride + 1) log10 PL observations on the
    simulation PL grid.  ``log_scale``: log10 of the PL redimensionalization
    factor 1/(dx^2 dt); added to log10 of the nondimensional PL.
    ``min_val``: clamp floor applied to PL before log10
    (reference: probs.py:64-76 via bayeslib.py:157).

    ``mask``: optional (num_exp, n_pl) NONNEGATIVE per-point weights w_i:
    the accumulated terms are sse = sum w_i e_i^2 and esum = sum w_i e_i,
    so the closed-form magnitude offset yields sum w_i (e_i + m)^2.
    Weight 0 = padding (points contribute nothing; used when experiments
    have different curve lengths).  Weight 1/sigma_i^2 = the sigma-weighted
    likelihood (sim_flags.use_uncertainty — the division the reference
    left commented out at probs.py:40).  For 0/1 masks the sums are
    bitwise identical to the unweighted accumulation.

    Registered as a pytree with (min_val, normalize) as static aux data so
    jitted callers can branch on ``normalize`` at trace time.
    """

    def __init__(self, values, log_scale, min_val: float, normalize: bool = False,
                 mask=None):
        self.values = values
        self.log_scale = log_scale
        self.min_val = float(min_val)
        self.normalize = bool(normalize)
        self.mask = mask

    def tree_flatten(self):
        return (self.values, self.log_scale, self.mask), (self.min_val, self.normalize)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1], children[2])


class SolveResult(NamedTuple):
    pl: Optional[jax.Array]        # (batch, T // pl_stride + 1) nondim PL
    n: jax.Array                   # final N (batch, L)
    p: jax.Array
    e: jax.Array
    converged: jax.Array           # (batch,) bool: no step hit max_iters
    max_newton_iters: jax.Array    # scalar int32: worst-case iterations
    sse: Optional[jax.Array]       # (num_exp, batch) running sum of e^2
    err_sum: Optional[jax.Array]   # (num_exp, batch) running sum of e
    states: Optional[tuple] = None  # optional (N, P, E) snapshot stacks
    iters: Optional[jax.Array] = None  # (n_outer,) Newton iterations per step
    hist: Optional[tuple] = None   # final (nh, ph, eh) rolling histories
    sample_iters: Optional[jax.Array] = None  # (batch,) total Newton iters
    full_solves: Optional[jax.Array] = None  # (batch,) full (Jacobian-refresh)
    #                                          solves of the sample's tile —
    #                                          chord-mode telemetry only
    tile_body_iters: Optional[jax.Array] = None  # (batch,) executed Newton
    #                                          body iterations of the sample's
    #                                          tile (chord + full; the tile
    #                                          runs every lane regardless of
    #                                          per-sample masks) — chord-mode
    #                                          telemetry for the bench roofline


def pl_observable(N, P, mp: MatParams):
    """Nondimensional PL: rate * sum_n(N P - n0 p0) (reference: pvSimPCR.py:276-281)."""
    L = N.shape[-1]
    return mp.rate * (jnp.sum(N * P, axis=-1) - L * mp.n0 * mp.p0)


def _bdf_coeffs(t, dtype):
    """(a0, slot-weight vector) for step t -> t+1 with rolling slot layout."""
    a = jnp.asarray(BDF_TABLE, dtype)[jnp.minimum(t, 4)]
    slots = jnp.mod(t - jnp.arange(5), HISTORY)        # k, ko, ko2, ko3, ko4
    w = jnp.zeros((HISTORY,), dtype=dtype).at[slots].set(a[1:])
    return a[0], w


def _log_pl(pl, obs: FusedObs, pl0):
    val = pl / pl0 if obs.normalize else pl
    # The clamp floor must stay strictly positive IN THE COMPUTE DTYPE:
    # min_val = sys.float_info.min (2.2e-308) rounds to 0.0 in float32, and
    # log10(0) = -inf poisons the coarse-phase Lagrange dense output (mixed-
    # sign weights -> inf - inf = NaN) — the r2/r3 production "non-converged"
    # populations were mostly THIS: converged samples whose PL decayed to
    # f32 zero (the tau_n-bottom corner signature, docs/PRECISION.md).
    floor = jnp.maximum(jnp.asarray(obs.min_val, val.dtype),
                        jnp.finfo(val.dtype).tiny)
    val = jnp.maximum(val, floor)
    out = jnp.log10(val)
    return out if obs.normalize else out + obs.log_scale


def _horizon_kernel_ok() -> bool:
    """Whether fused-horizon dispatch may use the Pallas kernel: compiled on
    TPU always; elsewhere only under TRPL_HORIZON_INTERPRET=1 (test parity —
    Mosaic-interpreter emulation of an 80k-step horizon is orders of
    magnitude slower than the coupled-Newton scan fallback, so a CPU/GPU
    user running the shipped exact-mode config must not land on it)."""
    import os
    return (jax.default_backend() == "tpu"
            or os.environ.get("TRPL_HORIZON_INTERPRET") == "1")


def bdf_step(t, nh, ph, eh, mp: MatParams, cfg: SolverConfig, tol, dtype):
    """One BDF step on the rolling histories; shared by the single-phase
    solver below and the two-phase fast solver (models/twophase.py)."""
    a0, w = _bdf_coeffs(t, dtype)
    # Broadcast multiply-sum rather than tensordot: XLA:TPU has been seen
    # miscompiling tiny dots inside scans (twophase.py dense output; caught
    # by tools/accuracy_gate.py) — the elementwise form lowers to plain VPU
    # ops at identical cost.
    wc = w[:, None, None]
    bn = jnp.sum(wc * nh, axis=0)
    bp = jnp.sum(wc * ph, axis=0)
    be = jnp.sum(wc * eh, axis=0)
    k = jnp.mod(t, HISTORY)
    kp = jnp.mod(t + 1, HISTORY)
    Nk = jax.lax.dynamic_index_in_dim(nh, k, keepdims=False)
    Pk = jax.lax.dynamic_index_in_dim(ph, k, keepdims=False)
    Ek = jax.lax.dynamic_index_in_dim(eh, k, keepdims=False)
    if cfg.predictor in ("linear", "quadratic", "geometric"):
        # Extrapolated initial iterate: same fixed point (convergence is
        # still measured against the assembled BDF system), fewer
        # iterations than the reference's previous-state predictor.
        # "quadratic" extrapolates through three back states (3X - 3X1 + X2,
        # ramping previous -> linear -> quadratic over t = 0, 1, 2+): the
        # implicit trajectory is smooth, so the O(dt^3) predictor drops the
        # entering residual below tol on most of the fixed-dt horizon —
        # measured ~2x fewer Newton solves than "linear" in exact mode.
        ko = jnp.mod(t - 1, HISTORY)
        ramp = jnp.minimum(t, 1).astype(nh.dtype)  # t=0 has no history
        d1n = Nk - jax.lax.dynamic_index_in_dim(nh, ko, keepdims=False)
        d1p = Pk - jax.lax.dynamic_index_in_dim(ph, ko, keepdims=False)
        Nx = Nk + ramp * d1n
        Px = Pk + ramp * d1p
        if cfg.predictor == "quadratic":
            ko2 = jnp.mod(t - 2, HISTORY)
            ramp2 = (t >= 2).astype(nh.dtype)
            d2n = d1n - (jax.lax.dynamic_index_in_dim(nh, ko, keepdims=False)
                         - jax.lax.dynamic_index_in_dim(nh, ko2, keepdims=False))
            d2p = d1p - (jax.lax.dynamic_index_in_dim(ph, ko, keepdims=False)
                         - jax.lax.dynamic_index_in_dim(ph, ko2, keepdims=False))
            Nx = Nx + ramp2 * d2n
            Px = Px + ramp2 * d2p
        if cfg.predictor == "geometric":
            # Geometric: X * (X / X_prev) — exact for local exponential
            # decay (the PL tail's regime) and free of the f32 cancellation
            # that makes the quadratic difference predictor worse than
            # linear there.  Falls back to the linear extrapolation where
            # the previous state is non-positive.  Mirrors the Pallas
            # horizon kernel's pred_order=3 (ops/pallas/horizon_kernel.py).
            Nm = jax.lax.dynamic_index_in_dim(nh, ko, keepdims=False)
            Pm = jax.lax.dynamic_index_in_dim(ph, ko, keepdims=False)
            Nx = jnp.where(Nm > 0, Nk * (Nk / jnp.where(Nm > 0, Nm, 1.0)), Nx)
            Px = jnp.where(Pm > 0, Pk * (Pk / jnp.where(Pm > 0, Pm, 1.0)), Px)
        # Positivity safeguard: on steep measured excitation profiles the
        # first stiff steps change the small-density cells by O(100%), and
        # extrapolation overshoots them negative — the undamped Newton then
        # oscillates through the 1/(N tau_p + P tau_n) recombination term
        # and the whole step fails (seen on the Power_scan high-power
        # curves: conv 0 percent at step t=1).  Where the extrapolated
        # carrier densities go non-positive, fall back to the previous
        # state for that cell.
        Nk = jnp.where(Nx > 0, Nx, Nk)
        Pk = jnp.where(Px > 0, Px, Pk)
        Ek = Ek + ramp * (Ek - jax.lax.dynamic_index_in_dim(eh, ko, keepdims=False))
    # Fused-horizon methods reaching per-step dispatch (the off-grid solver
    # or a non-fusable solve() call) step via their per-step equivalent: the
    # Pallas Newton kernel on TPU, the XLA coupled-Newton path elsewhere
    # (same math; the whole-horizon kernel itself only applies to fusable
    # on-grid calls, see solve()).
    if cfg.method == "gauss_seidel":
        step_impl = implicit_step
    elif cfg.method == "coupled_newton_pallas" or (
            cfg.method in ("fused_horizon", "fused_horizon_chord")
            and jax.default_backend() == "tpu"):
        from ..ops.pallas.newton_kernel import pallas_newton_step
        from functools import partial
        step_impl = partial(pallas_newton_step,
                            interpret=jax.default_backend() != "tpu")
    elif cfg.method in ("coupled_newton", "fused_horizon",
                        "fused_horizon_chord"):
        step_impl = coupled_newton_step
    else:
        raise ValueError(f"unknown solver method {cfg.method!r}")
    step_tol = 0.0 if cfg.step_tol is None else float(cfg.step_tol)
    Nn, Pn, En, iters, ok = step_impl(
        Nk, Pk, Ek, bn, bp, be, mp, a0, tol, cfg.max_iters,
        step_tol=jnp.asarray(step_tol, dtype))
    nh = jax.lax.dynamic_update_index_in_dim(nh, Nn, kp, 0)
    ph = jax.lax.dynamic_update_index_in_dim(ph, Pn, kp, 0)
    eh = jax.lax.dynamic_update_index_in_dim(eh, En, kp, 0)
    return nh, ph, eh, (Nn, Pn, En), iters, ok


def init_history(n_init, p_init, e_init, dtype):
    batch, L = n_init.shape
    nh = jnp.zeros((HISTORY, batch, L), dtype).at[0].set(n_init.astype(dtype))
    ph = jnp.zeros((HISTORY, batch, L), dtype).at[0].set(p_init.astype(dtype))
    eh = jnp.zeros((HISTORY, batch, L), dtype).at[0].set(e_init.astype(dtype))
    return nh, ph, eh


def solve(mat_nd, n_init, p_init, e_init, cfg: SolverConfig,
          obs: Optional[FusedObs] = None, record_pl: bool = True,
          start_step: int = 0, init_hist: Optional[tuple] = None,
          acc0: Optional[tuple] = None, return_hist: bool = False,
          pl0: Optional[jax.Array] = None) -> SolveResult:
    """Evolve a batch of TRPL simulations for cfg.num_steps BDF steps.

    Args:
      mat_nd: (batch, 12) nondimensionalized material parameters.
      n_init/p_init/e_init: (batch, L) initial state (E on edges 0..L-1).
      obs: optional fused observations (enables in-scan likelihood).
      record_pl: emit the PL trace (can be False when obs is fused).
      start_step/init_hist/acc0/return_hist: bit-exact segmentation support
        (the working ``continue`` mode the reference only stubbed,
        pvSimPCR.py:357): pass ``return_hist=True`` on one segment and feed
        the resulting ``hist`` (and, for fused likelihood, ``(sse, err_sum)``
        as ``acc0`` plus the obs slice from the segment boundary) into the
        next call with ``start_step`` = steps already taken.  The BDF order
        ramp, rolling slot layout, and likelihood accumulators continue
        exactly where the previous segment stopped.
      pl0: normalization anchor for ``obs.normalize`` runs: the *run-t=0*
        PL sample, (batch,).  Required for continued segments with
        normalization (the segment-start state yields a different PL than
        the run start, so re-deriving the anchor would offset every
        ``_log_pl`` by log10(pl_seg0 / pl_t0)); ignored otherwise.
    """
    if cfg.method in ("fused_horizon", "fused_horizon_chord"):
        fusable = (obs is not None and not record_pl and init_hist is None
                   and acc0 is None and not return_hist and start_step == 0
                   and pl0 is None and cfg.pl_stride == 1
                   and cfg.record_state_stride is None and not cfg.record_iters
                   and _horizon_kernel_ok())
        if fusable:
            from ..ops.pallas.horizon_kernel import solve_horizon_fused
            return solve_horizon_fused(
                mat_nd, n_init, p_init, cfg, obs,
                chord=cfg.method == "fused_horizon_chord",
                interpret=jax.default_backend() != "tpu",
                e_init=e_init)
        cfg = cfg._replace(method="coupled_newton")

    mp = MatParams.from_array(mat_nd)
    dtype = n_init.dtype
    mp = mp.astype(dtype)
    batch, L = n_init.shape
    T, stride = cfg.num_steps, cfg.pl_stride
    if T % stride:
        raise ValueError(f"num_steps={T} not divisible by pl_stride={stride}")
    if start_step % stride:
        raise ValueError(f"start_step={start_step} not divisible by pl_stride")
    n_outer = T // stride
    tol = jnp.asarray(cfg.tol, dtype)

    if init_hist is not None:
        nh, ph, eh = init_hist
        k0 = start_step % HISTORY
        n_cur, p_cur = (jax.lax.dynamic_index_in_dim(h, k0, keepdims=False)
                        for h in (nh, ph))
    else:
        nh, ph, eh = init_history(n_init, p_init, e_init, dtype)
        n_cur, p_cur = n_init.astype(dtype), p_init.astype(dtype)

    # Normalization anchor (run-t=0 PL).  For a fresh run it is the
    # segment-start PL; a continued segment must carry the original run's
    # anchor in explicitly — re-deriving it from the carried history would
    # offset every normalized log-PL by log10(pl_seg0 / pl_t0).
    if init_hist is not None and obs is not None and obs.normalize and pl0 is None:
        raise ValueError(
            "continued segment with obs.normalize=True requires the run-t=0 "
            "PL anchor: pass pl0= from the first segment "
            "(pl_observable(n0, p0, mp))")
    if pl0 is None:
        pl0 = pl_observable(n_cur, p_cur, mp)
    else:
        pl0 = jnp.asarray(pl0, dtype)

    if acc0 is not None:
        sse0, esum0 = acc0
    elif obs is not None:
        e0 = _log_pl(pl0, obs, pl0) - obs.values[:, 0:1]      # (num_exp, batch)
        if obs.mask is not None:
            # Weight-linear accumulation (w e^2, w e) — see FusedObs.mask.
            m0 = obs.mask[:, 0:1]
            sse0, esum0 = m0 * e0 ** 2, m0 * e0
        else:
            sse0, esum0 = e0 ** 2, e0
    else:
        sse0 = esum0 = jnp.zeros((1, batch), dtype)

    def outer_step(carry, j):
        nh, ph, eh, conv, max_it, samp_it, sse, esum = carry
        t0 = start_step + j * stride
        if stride == 1:
            nh, ph, eh, state, iters, ok = bdf_step(t0, nh, ph, eh, mp, cfg, tol, dtype)
            samp_it = samp_it + iters
            outer_iters = jnp.max(iters)
            max_it = jnp.maximum(max_it, outer_iters)
        else:
            def inner(i, acc):
                nh, ph, eh, okw, samp_it, lmax = acc
                nh, ph, eh, _, iters, ok = bdf_step(t0 + i, nh, ph, eh, mp, cfg, tol, dtype)
                return (nh, ph, eh, okw & ok, samp_it + iters,
                        jnp.maximum(lmax, jnp.max(iters)))
            ok0 = jnp.ones_like(conv)
            nh, ph, eh, ok, samp_it, outer_iters = jax.lax.fori_loop(
                0, stride, inner, (nh, ph, eh, ok0, samp_it, jnp.int32(0)))
            max_it = jnp.maximum(max_it, outer_iters)
            kp = jnp.mod(t0 + stride, HISTORY)
            state = tuple(jax.lax.dynamic_index_in_dim(h, kp, keepdims=False)
                          for h in (nh, ph, eh))
        # A step whose observation points are entirely mask-padding (the
        # bucket_horizons tail beyond a curve's real horizon) cannot NaN a
        # sample: its Newton failures carry no likelihood weight, so conv
        # freezes once the real (masked) horizon ends.
        pad_only = None
        Nn, Pn, En = state
        pl = pl_observable(Nn, Pn, mp)
        if obs is not None:
            e = _log_pl(pl, obs, pl0) - jax.lax.dynamic_index_in_dim(
                obs.values, j + 1, axis=1, keepdims=True)
            if obs.mask is not None:
                mcol = jax.lax.dynamic_index_in_dim(
                    obs.mask, j + 1, axis=1, keepdims=True)
                pad_only = jnp.sum(mcol) == 0
                sse = sse + mcol * e ** 2
                esum = esum + mcol * e
            else:
                sse = sse + e ** 2
                esum = esum + e
        conv = conv & (ok if pad_only is None else (ok | pad_only))
        ys = []
        if record_pl:
            ys.append(pl)
        if cfg.record_state_stride is not None:
            rec = jnp.mod((j + 1) * stride, cfg.record_state_stride) == 0
            ys.append(tuple(jnp.where(rec, s, jnp.nan) for s in state))
        if cfg.record_iters:
            ys.append(outer_iters)
        return (nh, ph, eh, conv, max_it, samp_it, sse, esum), tuple(ys)

    conv0 = jnp.ones((batch,), dtype=bool)
    samp_it0 = jnp.zeros((batch,), dtype=jnp.int32)
    carry0 = (nh, ph, eh, conv0, jnp.int32(0), samp_it0, sse0, esum0)
    (nh, ph, eh, conv, max_it, samp_it, sse, esum), ys = jax.lax.scan(
        outer_step, carry0, jnp.arange(n_outer))

    yi = 0
    pl_trace = None
    if record_pl:
        pl_trace = jnp.concatenate([pl0[None], ys[yi]], axis=0).T  # (batch, n_outer+1)
        yi += 1
    states = None
    if cfg.record_state_stride is not None:
        states = ys[yi]
        yi += 1
    iters_trace = ys[yi] if cfg.record_iters else None

    k_final = jnp.mod(start_step + T, HISTORY)
    n_f, p_f, e_f = (jax.lax.dynamic_index_in_dim(h, k_final, keepdims=False)
                     for h in (nh, ph, eh))
    return SolveResult(
        pl=pl_trace, n=n_f, p=p_f, e=e_f, converged=conv,
        max_newton_iters=max_it,
        sse=sse if obs is not None else None,
        err_sum=esum if obs is not None else None,
        states=states,
        iters=iters_trace,
        hist=(nh, ph, eh) if return_hist else None,
        sample_iters=samp_it,
    )
