"""Time-shift alignment test for the gate's raw full-horizon rms.

Claim under test (r3's asserted explanation): the measured-profile
gate's raw full-horizon rms comes from steep-decay samples whose f32
trajectory time-shifts by a fraction of a step against f64 while
log10-PL falls 30+ decades — so aligning the EXACT curve by one fitted
sub-step shift should collapse the raw rms to the windowed level.

VERDICT (r4, running this tool): **refuted** — the best global shift
collapses nothing (sample 27: 7.277 -> 7.277 at +30 ps; sample 9:
1.886e-2 -> 1.880e-2).  The deviation is the coarse-phase ladder
discretization error, measured IDENTICAL in an f64 ladder run — see
docs/PRECISION.md "The raw-rms tail, attributed" for the per-decade
band analysis that replaced the time-shift story.  The tool stays in
tree as the instrument of that refutation and as a regression probe.

Method: the fast path never materializes PL, so the fit runs through the
same fused-likelihood machinery production uses — ONE multiphase solve
scores a whole grid of time-shifted exact curves as `num_exp`
observation rows (sse[shift, sample] in a single pass), and the best
shift per sample is read off the sse diagonal slice.  rms(delta=0)
reproduces the gate's raw number exactly.

Usage (TPU; uses the bundled batch-32 power_scan exact cache):

    python -m bayesian_inference_trpl_tpu.tools.timeshift_demo
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def shifted_curves(lp, deltas):
    """(n_shifts, T+1) copies of log-PL curve ``lp`` resampled at
    t + delta (linear interpolation in log space, clamped at the ends —
    the first/last few points are inside the measurement window where
    the curve is flat-peaked, so clamping is inert at the rms level)."""
    T = lp.shape[-1] - 1
    t = np.arange(T + 1, dtype=np.float64)
    return np.stack([np.interp(t + d, t, lp) for d in deltas])


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--T", type=int, default=80000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--profile", default="power_scan")
    ap.add_argument("--shift-max", type=float, default=2.0,
                    help="max |shift| in fine steps")
    ap.add_argument("--shift-points", type=int, default=41)
    ap.add_argument("--top", type=int, default=3,
                    help="demonstrate on the worst N raw-rms samples")
    args = ap.parse_args(argv)
    from . import apply_platform_env
    apply_platform_env()

    import jax
    import jax.numpy as jnp
    from .. import physics
    from ..models.driver import SimParams, pl_log_scale
    from ..models.solver import FusedObs, SolverConfig
    from ..models.twophase import geometric_schedule, solve_multiphase
    from .accuracy_gate import (excitation_profiles, load_exact,
                                sample_production_box)

    bundled = os.path.join(
        os.path.dirname(__file__), "exact_cache",
        f"exact_T{args.T}_b{args.batch}_s{args.seed}_{args.profile}.npz")
    lp64 = load_exact(bundled, args.batch, args.T, args.seed, args.profile)

    T, batch = args.T, args.batch
    mat = sample_production_box(batch, args.seed)
    sim = SimParams(length=311.0, time=2000.0 * T / 80000, L=128, T=T)
    log_scale = pl_log_scale(sim)
    floor = -30.0 + float(np.asarray(log_scale))
    lp64 = np.maximum(lp64, floor)
    dtype = jnp.float32
    mat32 = jnp.asarray(physics.nondimensionalize(mat, sim.dx, sim.dt), dtype)
    dn32 = excitation_profiles(args.profile, batch, sim, dtype)
    # The SHIPPED fast configuration (same as the gate's default).
    schedule = geometric_schedule(T, 256, base_stride=16,
                                  coarse_steps_per_phase=512, max_stride=64)
    cfg32 = SolverConfig(num_steps=T, pl_stride=1, tol=1e-4, max_iters=8,
                         method=("fused_horizon_chord"
                                 if jax.default_backend() == "tpu"
                                 else "coupled_newton"),
                         predictor="quadratic", step_tol=1e-6)

    @jax.jit
    def score(obs_values):
        obs = FusedObs(values=obs_values, log_scale=jnp.asarray(log_scale,
                                                                dtype),
                       min_val=1e-30)
        n0 = mat32[:, 0:1] + dn32
        p0 = mat32[:, 1:2] + dn32
        r = solve_multiphase(mat32, n0, p0, jnp.zeros_like(n0), cfg32, obs,
                             schedule)
        return r.sse, r.converged

    # Pass 1: the gate itself — per-sample raw rms, worst samples.
    sse, conv = score(jnp.asarray(lp64, dtype))
    rms_full = np.sqrt(np.diagonal(np.asarray(sse)) / (T + 1))
    order = np.argsort(-rms_full)
    print(f"raw full-horizon rms: max {rms_full.max():.3e} "
          f"(sample {order[0]}), median {np.median(rms_full):.3e}; "
          f"non-converged {int((~np.asarray(conv)).sum())}")

    deltas = np.linspace(-args.shift_max, args.shift_max, args.shift_points)
    results = []
    for i in order[:args.top]:
        shifts = shifted_curves(lp64[i], deltas)       # (n_shifts, T+1)
        sse_s, _ = score(jnp.asarray(shifts, dtype))
        rms_s = np.sqrt(np.asarray(sse_s)[:, i] / (T + 1))
        k = int(np.argmin(rms_s))
        results.append(dict(
            sample=int(i), raw_rms=float(rms_full[i]),
            best_shift_steps=float(deltas[k]),
            best_shift_ps=float(deltas[k] * sim.dt * 1000),
            aligned_rms=float(rms_s[k]),
            collapse_factor=float(rms_full[i] / rms_s[k]),
        ))
        print(f"sample {i}: raw rms {rms_full[i]:.3e} -> aligned "
              f"{rms_s[k]:.3e} at shift {deltas[k]:+.2f} steps "
              f"({deltas[k] * sim.dt * 1e3:+.1f} ps)  "
              f"[{rms_full[i] / rms_s[k]:.0f}x collapse]")
    print(json.dumps(dict(batch=batch, T=T, profile=args.profile,
                          worst=results)))


if __name__ == "__main__":
    main()
