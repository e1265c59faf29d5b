"""Headline benchmark: full TRPL parameter-sample simulations per minute.

Workload = the reference's production configuration (SURVEY.md section 6):
L = 128 spatial nodes, T = 80,000 BDF steps over 2000 ns (dt = 25 ps),
fused log-likelihood against an 80,001-point observation curve, sampled
material parameters from the production box (parallel_bayes_gpu.py:91-92).

Runs on whatever accelerator is attached (one TPU chip here); prints ONE
JSON line.  vs_baseline compares the measured whole-run rate, scaled to a
v5e-8 (x num_devices_assumed), against the 1e5 sims/min north star from
BASELINE.md.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_SIMS_PER_MIN_V5E8 = 1.0e5
V5E8_CHIPS = 8


def main():
    import jax
    import jax.numpy as jnp
    from bayesian_inference_trpl_tpu import physics
    from bayesian_inference_trpl_tpu.models.driver import (
        SimParams, initial_excess_density, pl_log_scale)
    from bayesian_inference_trpl_tpu.models.solver import (
        FusedObs, SolverConfig, solve)

    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    T = int(os.environ.get("BENCH_T", "80000"))
    # Two-phase fast solver (see models/twophase.py): fine dt through the
    # stiff transient, 8x-coarse BDF steps with dense log-PL output after.
    # BENCH_MODE=exact forces reference-equivalent fixed-dt stepping.
    fast_mode = os.environ.get("BENCH_MODE", "fast") != "exact"
    fine_steps = min(T // 2, int(os.environ.get("BENCH_FINE_STEPS", "2048")))
    stride = int(os.environ.get("BENCH_STRIDE", "8"))
    while (T - fine_steps) % stride:
        fine_steps += 1
    dtype = jnp.float32

    rng = np.random.default_rng(0)
    minx = np.array([1e8, 1e14, 0.0, 0.0, 1e-11, 0.1, 0.1, 1e-30, 1e-30,
                     1.0, 1.0, 0.1, 0.0])
    maxx = np.array([1e8, 1e16, 50.0, 50.0, 1e-9, 100.0, 100.0, 1e-28, 1e-28,
                     1000.0, 2000.0, 0.1, 0.0])
    do_log = np.array([0, 1, 0, 0, 1, 1, 1, 1, 1, 0, 0, 0, 0], dtype=bool)
    u = rng.uniform(size=(batch, 13))
    with np.errstate(divide="ignore"):
        lo = np.log10(np.where(minx > 0, minx, 1))
        hi = np.log10(np.where(maxx > 0, maxx, 1))
    x = np.where(do_log, 10 ** (lo + u * (hi - lo)), minx + u * (maxx - minx))
    mat = x[:, :12] * physics.UNIT_CONVERSIONS[:12]

    sim = SimParams(length=311.0, time=2000.0 * T / 80000, L=128, T=T,
                    pl_stride=1)
    mat_nd = jnp.asarray(physics.nondimensionalize(mat, sim.dx, sim.dt), dtype)
    dn = initial_excess_density(sim, (1e18 / 1e7 ** 3, 100.0), "exp",
                                dtype=dtype)
    obs_curve = jnp.zeros((1, sim.num_pl), dtype)
    obs = FusedObs(values=obs_curve,
                   log_scale=jnp.asarray(pl_log_scale(sim), dtype),
                   min_val=1e-30)
    cfg = SolverConfig(num_steps=T, pl_stride=1, tol=1e-4, max_iters=6,
                       method="coupled_newton")

    from bayesian_inference_trpl_tpu.models.twophase import solve_two_phase

    @jax.jit
    def run(mat_nd, dn):
        n0 = mat_nd[:, 0:1] + dn[None, :]
        p0 = mat_nd[:, 1:2] + dn[None, :]
        if fast_mode:
            r = solve_two_phase(mat_nd, n0, p0, jnp.zeros_like(n0), cfg, obs,
                                fine_steps, stride)
        else:
            r = solve(mat_nd, n0, p0, jnp.zeros_like(n0), cfg, obs=obs,
                      record_pl=False)
        return r.sse, r.err_sum, r.converged

    out = jax.block_until_ready(run(mat_nd, dn))  # compile + warm
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(mat_nd, dn))
    elapsed = time.perf_counter() - t0

    sims = batch * (T / 80000.0)
    per_min_chip = sims / elapsed * 60.0
    per_min_v5e8 = per_min_chip * V5E8_CHIPS
    print(json.dumps({
        "metric": "trpl_full_sims_per_min_v5e8_projected",
        "value": round(per_min_v5e8, 1),
        "unit": "sims/min (80k-step L=128 sim + fused likelihood; "
                f"measured {round(per_min_chip,1)}/min on "
                f"{jax.devices()[0].platform}x1, x{V5E8_CHIPS} chips)",
        "vs_baseline": round(per_min_v5e8 / BASELINE_SIMS_PER_MIN_V5E8, 3),
    }))


if __name__ == "__main__":
    main()
