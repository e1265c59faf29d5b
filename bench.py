"""Headline benchmark: full TRPL parameter-sample simulations per minute.

Workload = the reference's production configuration (SURVEY.md section 6):
L = 128 spatial nodes, T = 80,000 BDF steps over 2000 ns (dt = 25 ps),
fused log-likelihood against an 80,001-point observation curve, sampled
material parameters from the production box (parallel_bayes_gpu.py:91-92).

Runs on whatever accelerator is attached (one TPU chip here); prints ONE
JSON line.  vs_baseline compares the measured whole-run rate, scaled to a
v5e-8 (x num_devices_assumed), against the 1e5 sims/min north star from
BASELINE.md.  The line also records the reference-equivalent fixed-dt
("exact") throughput measured in the same session, unless BENCH_SKIP_EXACT
is set.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_SIMS_PER_MIN_V5E8 = 1.0e5
V5E8_CHIPS = 8


def _measure(fn, *args):
    """Compile + warm, then time one run; returns (elapsed_s, outputs) so
    callers can read telemetry without re-executing the workload."""
    import jax
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    return time.perf_counter() - t0, out


def _measure_e2e(n_samples, T, method):
    """Wall-clock a full bayes() inference run (sampling, nondim, shard
    placement, double-buffered solve, export) on synthesized observations
    (BASELINE.md row 3).

    Three measurements:
      * cold (in-process first call) — pays whatever the disk caches
        (utils/{program_cache,compile_cache}.py, default ON) cannot
        cover; `build` reports the program trace/lower/compile seconds
        inside it, so the split is first-class (VERDICT r4 item 1);
      * warm (second call) — in-process jit cache, the steady-state rate;
      * coldproc — a FRESH subprocess running one bayes() on the same
        config: the true cold-start a user sees on every run after the
        first (disk caches hot).  The r4 cold number was 18x warm; the
        caches target <= 3x.
    Returns (cold_s, warm_s, rate_cold, rate_warm, stages, build_s,
    coldproc dict or None)."""
    import subprocess
    import tempfile

    import numpy as np
    from bayesian_inference_trpl_tpu.config import (
        DeviceConfig, GridConfig, IcFlags, InferenceConfig, ParamSpace,
        Paths, SimFlags, dump_config)
    from bayesian_inference_trpl_tpu.models.driver import SimParams
    from bayesian_inference_trpl_tpu.pipeline import bayes

    sim = SimParams(length=311.0, time=2000.0 * T / 80000, L=128, T=T)
    with tempfile.TemporaryDirectory() as td:
        times = sim.pl_times
        pl = 1e-3 * np.exp(-times / 200.0)        # synthetic decay curve
        obs_path = os.path.join(td, "obs.csv")
        exc_path = os.path.join(td, "exc.csv")
        with open(obs_path, "w") as f:
            for t, p in zip(times, pl):
                f.write(f"{t},{p / 1e-23:.8e},1e13\n")
            f.write("END,,\n")
        with open(exc_path, "w") as f:
            prof = 1e18 / 1e7 ** 3 * np.exp(-np.arange(128) * sim.dx / 100.0)
            f.write(",".join(f"{v / 1e-21:.8e}" for v in prof) + "\n")
        cfg = InferenceConfig(
            grid=GridConfig(thickness=311.0, time=sim.time, num_nodes=128,
                            num_steps=T, pl_stride=1, tol_exp=4.0,
                            max_iters=8, method=method, predictor="quadratic",
                            step_tol=1e-6,
                            fast_fine_steps=min(256, T // 2),
                            fast_coarse_stride=16,
                            fast_steps_per_phase=512),
            params=ParamSpace(),
            ic_flags=IcFlags(time_cutoff=None),
            sim_flags=SimFlags(num_points=n_samples, seed=42),
            device=DeviceConfig(chunk_per_device=1024, dtype="float32"),
            paths=Paths(init_file=exc_path, observation_files=[obs_path],
                        out_dirs=[os.path.join(td, "OUT")]),
            checkpoint=False)
        t0 = time.perf_counter()
        _, _, info_cold = bayes(cfg)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        _, _, info_warm = bayes(cfg)
        warm = time.perf_counter() - t0
        coldproc = None
        if not bool(int(os.environ.get("BENCH_SKIP_COLDPROC", "0"))):
            cfg_path = os.path.join(td, "e2e.toml")
            with open(cfg_path, "w") as f:
                f.write(dump_config(cfg))
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--e2e-child", cfg_path],
                    capture_output=True, text=True, timeout=1800, check=True,
                    cwd=os.path.dirname(os.path.abspath(__file__)))
                coldproc = json.loads(out.stdout.strip().splitlines()[-1])
            except Exception as e:
                coldproc = {"error": f"{type(e).__name__}: {e}"[:200]}
    sims = n_samples * (T / 80000.0)
    # Stage attribution for the warm run (each bayes() call creates a fresh
    # runner, so timers are per-run): solver = dispatch + device sync,
    # err_sq/misc = host-side accumulation, the remainder = sampling + IO +
    # nondim + export.
    stages = {k: round(info_warm[k], 2)
              for k in ("solver_time", "err_sq_time", "misc_time")}
    stages["other_time"] = round(
        info_warm["runtime"] - sum(stages.values()), 2)
    return (cold, warm, sims / cold * 60.0, sims / warm * 60.0, stages,
            info_cold.get("program_build_time", 0.0), coldproc)


def _e2e_child(cfg_path):
    """Fresh-process cold measurement: device contact, then ONE bayes()."""
    t_start = time.perf_counter()
    import jax
    from bayesian_inference_trpl_tpu.config import load_config
    from bayesian_inference_trpl_tpu.pipeline import bayes

    cfg = load_config(cfg_path)
    jax.devices()
    connect = time.perf_counter() - t_start
    t0 = time.perf_counter()
    _, _, info = bayes(cfg)
    print(json.dumps(dict(
        connect_s=round(connect, 2),
        bayes_s=round(time.perf_counter() - t0, 2),
        build_s=round(info.get("program_build_time", 0.0), 2))))


def main():
    from bayesian_inference_trpl_tpu.utils.compile_cache import (
        enable_compile_cache)
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from bayesian_inference_trpl_tpu import physics
    from bayesian_inference_trpl_tpu.models.driver import (
        SimParams, initial_excess_density, pl_log_scale)
    from bayesian_inference_trpl_tpu.models.solver import (
        FusedObs, SolverConfig, solve)
    from bayesian_inference_trpl_tpu.models.twophase import (
        geometric_schedule, solve_multiphase)

    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    T = int(os.environ.get("BENCH_T", "80000"))
    # Multi-phase fast solver (see models/twophase.py): fine dt through the
    # stiff transient, then a geometric stride ladder with dense log-PL
    # output.  BENCH_MODE=exact makes reference-equivalent fixed-dt stepping
    # the headline number instead.
    headline_fast = os.environ.get("BENCH_MODE", "fast") != "exact"
    # r3-tuned production ladder (256, 16, 64, 512) + quadratic predictor:
    # 2,142 steps/horizon, gate PASS on all three profiles (s0 1.1e-4,
    # power_scan 4.8e-5, s1 2.3e-4), 208.7k sims/min/chip (vs 141k at the
    # r2 ladder 1024/8 + linear under the same chord kernel).
    fine_steps = min(T // 2, int(os.environ.get("BENCH_FINE_STEPS", "256")))
    stride = int(os.environ.get("BENCH_STRIDE", "16"))
    max_stride = int(os.environ.get("BENCH_MAX_STRIDE", "64"))
    steps_per_phase = int(os.environ.get("BENCH_STEPS_PER_PHASE", "512"))
    skip_exact = bool(int(os.environ.get("BENCH_SKIP_EXACT", "0")))
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
    # The fused-horizon chord kernel is the production TPU path for BOTH
    # modes since the r3 A/B (fast 141.2k vs 121.9k sims/min/chip for the
    # per-step pallas kernel, 113.8k for the non-chord horizon kernel;
    # accuracy gate PASS on synthetic s0/s1 + power_scan s0).
    # BENCH_METHOD overrides for A/B runs.
    method = os.environ.get(
        "BENCH_METHOD",
        "fused_horizon_chord" if jax.default_backend() == "tpu"
        else "coupled_newton")
    # Linear-extrapolation Newton predictor: ~1 iteration/step on smooth
    # stretches vs 2 for the reference's previous-state start (same fixed
    # point; gated by tools/accuracy_gate.py).
    predictor = os.environ.get("BENCH_PREDICTOR", "quadratic")
    # State-settled acceptance: in f32 the relative-residual metric stalls
    # at the rounding floor on late decayed states; max|dX| <= 1e-6 max|X|
    # also counts as converged (sse verified bitwise-identical vs off).
    step_tol = float(os.environ.get("BENCH_STEP_TOL", "1e-6")) or None
    cfg = SolverConfig(num_steps=T, pl_stride=1, tol=1e-4, max_iters=6,
                       method=method, predictor=predictor, step_tol=step_tol)
    schedule = geometric_schedule(T, fine_steps, base_stride=stride,
                                  coarse_steps_per_phase=steps_per_phase,
                                  max_stride=max_stride)

    @jax.jit
    def run_fast(mat_nd, dn):
        n0 = mat_nd[:, 0:1] + dn[None, :]
        p0 = mat_nd[:, 1:2] + dn[None, :]
        r = solve_multiphase(mat_nd, n0, p0, jnp.zeros_like(n0), cfg, obs,
                             schedule)
        return r.sse, r.err_sum, r.converged

    # Exact fixed-dt mode: the full-horizon fused Pallas kernel (ONE launch
    # per horizon, VMEM-resident history + likelihood; the reference's
    # one-launch design point, pvSimPCR.py:227-306) with a cheap-residual
    # pre-check that skips the Newton solve on smooth steps entirely, plus
    # the chord policy (VMEM-cached PCR factorization reused across steps,
    # refreshed on residual stall — ops/pallas/horizon_kernel.py).
    exact_method = os.environ.get("BENCH_EXACT_METHOD", "fused_horizon_chord")
    # Geometric predictor (X * X/X_prev — exact for local exponential
    # decay) for exact mode: r4 A/B at BENCH_EXACT_BATCH=256 measured
    # 14,008.6 sims/min/chip vs 13,457.5 for quadratic (+4.1%; tile body
    # iters/step 1.067 -> 1.018).  The FAST path keeps quadratic
    # (geometric measured -1.2% there: the ladder's coarse phases are not
    # locally exponential at stride 64).  Same fixed point either way —
    # the predictor only moves the Newton starting iterate.
    exact_predictor = os.environ.get("BENCH_EXACT_PREDICTOR", "geometric")
    cfg_exact = cfg._replace(method=exact_method, predictor=exact_predictor)

    @jax.jit
    def run_exact(mat_nd, dn):
        n0 = mat_nd[:, 0:1] + dn[None, :]
        p0 = mat_nd[:, 1:2] + dn[None, :]
        r = solve(mat_nd, n0, p0, jnp.zeros_like(n0), cfg_exact, obs=obs,
                  record_pl=False)
        return (r.sse, r.err_sum, r.converged, r.sample_iters,
                r.full_solves, r.tile_body_iters)

    sims = batch * (T / 80000.0)
    fast_s, _ = _measure(run_fast, mat_nd, dn)
    fast_per_min = sims / fast_s * 60.0
    exact_per_min = exact_iters = exact_fulls = exact_execs = None
    if not skip_exact or not headline_fast:
        # Exact (fixed-dt) stepping is ~8x the work; measure on a reduced
        # batch to bound bench wall-clock, normalizing to sims/min.
        eb = int(os.environ.get("BENCH_EXACT_BATCH", str(max(batch // 4, 1))))
        e_sims = eb * (T / 80000.0)
        exact_s, e_out = _measure(run_exact, mat_nd[:eb], dn)
        exact_per_min = e_sims / exact_s * 60.0
        exact_iters = float(np.asarray(e_out[3]).mean()) / T
        if e_out[4] is not None:      # chord telemetry: tile full-solve count
            exact_fulls = float(np.asarray(e_out[4]).mean()) / T
            exact_execs = float(np.asarray(e_out[5]).mean()) / T

    # Off-grid case (VERDICT r2 item 3): ~100 log-spaced observation times
    # over the horizon — the realistic shape of measured TRPL data — scored
    # by the in-scan slot-table likelihood (models/offgrid.py) under the
    # same fast stride ladder.  Reference equivalent: full-horizon solve +
    # host interpolation (bayeslib.py:182-191).
    offgrid = offgrid_points = None
    if not bool(int(os.environ.get("BENCH_SKIP_OFFGRID", "0"))):
        from bayesian_inference_trpl_tpu.models.offgrid import (
            build_offgrid_tables, solve_offgrid)
        offgrid_points = int(os.environ.get("BENCH_OFFGRID_POINTS", "100"))
        t_obs = np.geomspace(sim.dt, sim.time, offgrid_points)
        t_obs[-1] = sim.time
        v_obs = np.log10(1e-3 * np.exp(-t_obs / 200.0))
        tables = build_offgrid_tables([t_obs], [v_obs], schedule, sim.dt)
        log_scale = jnp.asarray(pl_log_scale(sim), dtype)

        @jax.jit
        def run_offgrid(mat_nd, dn):
            n0 = mat_nd[:, 0:1] + dn[None, :]
            p0 = mat_nd[:, 1:2] + dn[None, :]
            r = solve_offgrid(mat_nd, n0, p0, jnp.zeros_like(n0), cfg,
                              tables, schedule, log_scale, 1e-30)
            return r.sse, r.err_sum, r.converged
        og_s, _ = _measure(run_offgrid, mat_nd, dn)
        offgrid = sims / og_s * 60.0

    # Difficulty-sorted tiling A/B (VERDICT r2 item 7): the masked-while
    # tile synchronization makes every kernel tile run until its SLOWEST
    # sample converges, so sorting samples by a difficulty proxy (Newton
    # iterations over the stiff transient) packs hard samples into shared
    # tiles and stops one hard sample stalling 127 fast lanes.  The probe
    # costs ~2.5% of a full horizon and is reported separately.
    exact_sorted = None
    if (os.environ.get("BENCH_EXACT_SORTED", "0") == "1"
            and exact_per_min is not None):
        T_probe = 2048
        obs_probe = FusedObs(values=jnp.zeros((1, T_probe + 1), dtype),
                             log_scale=obs.log_scale, min_val=1e-30)
        cfg_probe = cfg_exact._replace(num_steps=T_probe)

        @jax.jit
        def run_probe(mat_nd, dn):
            n0 = mat_nd[:, 0:1] + dn[None, :]
            p0 = mat_nd[:, 1:2] + dn[None, :]
            r = solve(mat_nd, n0, p0, jnp.zeros_like(n0), cfg_probe,
                      obs=obs_probe, record_pl=False)
            return r.sample_iters
        eb = int(os.environ.get("BENCH_EXACT_BATCH", str(max(batch // 4, 1))))
        probe_s, probe_iters = _measure(run_probe, mat_nd[:eb], dn)
        order = np.argsort(-np.asarray(probe_iters))
        mat_sorted = jnp.asarray(np.asarray(mat_nd[:eb])[order])
        sorted_s, _ = _measure(run_exact, mat_sorted, dn)
        e_sims = eb * (T / 80000.0)
        exact_sorted = dict(
            exact_sorted_sims_per_min_chip=round(e_sims / sorted_s * 60.0, 1),
            exact_probe_seconds=round(probe_s, 2))

    e2e_samples = int(os.environ.get("BENCH_E2E_SAMPLES", "32768"))
    e2e = None
    if e2e_samples:
        e2e = _measure_e2e(e2e_samples, T, method)

    per_min_chip = fast_per_min if headline_fast else exact_per_min
    per_min_v5e8 = per_min_chip * V5E8_CHIPS
    total_steps = sum(n // s for s, n in schedule)
    out = {
        "metric": "trpl_full_sims_per_min_v5e8_projected",
        "value": round(per_min_v5e8, 1),
        "unit": "sims/min (80k-step L=128 sim + fused likelihood; "
                f"measured {round(per_min_chip, 1)}/min on "
                f"{jax.devices()[0].platform}x1, x{V5E8_CHIPS} chips)",
        "vs_baseline": round(per_min_v5e8 / BASELINE_SIMS_PER_MIN_V5E8, 3),
        "fast_sims_per_min_chip": round(fast_per_min, 1),
        "schedule": [[s, n] for s, n in schedule],
        "solver_steps": total_steps,
    }
    if exact_per_min is not None:
        out["exact_sims_per_min_chip"] = round(exact_per_min, 1)
        out["exact_sims_per_min_v5e8_projected"] = round(
            exact_per_min * V5E8_CHIPS, 1)
        # Utilization evidence (see docs/PRECISION.md "Roofline"): the
        # workload is all-VPU (no matmuls) with near-zero HBM traffic in
        # the fused-horizon kernel, so the roofline axis is VPU flops.
        # Analytic op counts per sample-step, using TILE-wide counters
        # (the VPU executes every lane of a tile regardless of per-sample
        # masks, so per-sample means would undercount): hoisted cheap
        # residual check ~75 vector ops x L lanes every step; each
        # executed Newton body iteration ~205 (divide-free
        # block_pcr_apply + re-check); each full Jacobian refresh adds
        # ~930 (assembly + 6-sweep 2x2-block PCR reduction with divides).
        ss_per_s = exact_per_min / 60.0 * 80000.0
        if exact_execs is not None:
            flops_per_step = 128 * (75 + 205 * exact_execs
                                    + 930 * exact_fulls)
            out["exact_full_solves_per_step"] = round(exact_fulls, 4)
            out["exact_tile_iters_per_step"] = round(exact_execs, 4)
        else:
            flops_per_step = 128 * (75 + 1060 * (exact_iters or 1.0))
        VPU_PEAK_F32 = 3.9e12   # v5e: 8x128 lanes x 4 ALUs x 0.94 GHz
        out["exact_sample_steps_per_s"] = round(ss_per_s, 0)
        out["exact_newton_solves_per_step"] = round(exact_iters, 3)
        out["exact_est_vpu_tflops"] = round(ss_per_s * flops_per_step / 1e12, 2)
        out["exact_est_vpu_util_pct"] = round(
            ss_per_s * flops_per_step / VPU_PEAK_F32 * 100.0, 1)
    if e2e is not None:
        # Whole bayes() run: sampling, IO, nondim, sharding, double-buffered
        # solve, export (BASELINE.md row 3).  Cold pays whatever the disk
        # caches can't cover (build_s = program trace/lower/compile inside
        # it); warm is the steady-state rate with a per-stage breakdown;
        # coldproc is a fresh subprocess with hot disk caches — the true
        # recurring cold start, gated informally at <= 3x warm (VERDICT r4).
        cold_s, warm_s, cold_rate, warm_rate, stages, build_s, coldproc = e2e
        out["e2e_wallclock_s"] = round(cold_s, 1)
        out["e2e_samples"] = e2e_samples
        out["e2e_sims_per_min_chip"] = round(cold_rate, 1)
        out["e2e_build_s"] = round(build_s, 1)
        out["e2e_warm_wallclock_s"] = round(warm_s, 1)
        out["e2e_warm_sims_per_min_chip"] = round(warm_rate, 1)
        out["e2e_warm_stages_s"] = stages
        if coldproc is not None:
            out["e2e_coldproc"] = coldproc
            if "bayes_s" in coldproc:
                out["e2e_cold_multiple"] = round(
                    coldproc["bayes_s"] / warm_s, 2)
    if offgrid is not None:
        out["offgrid_sims_per_min_chip"] = round(offgrid, 1)
        out["offgrid_points"] = offgrid_points
    if exact_sorted is not None:
        out.update(exact_sorted)
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--e2e-child":
        _e2e_child(sys.argv[2])
    else:
        main()
