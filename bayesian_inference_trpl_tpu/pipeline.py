"""End-to-end Bayesian inference pipeline.

The TPU-native equivalent of the reference driver chain
``parallel_bayes_gpu.py -> bayeslib.bayes -> bayeslib.simulate``: load
observations and excitations, draw the sample grid, evaluate the
log-likelihood of every sample against every experiment and excitation
curve on the device mesh, and export BAYRAN (X, P) arrays.

Differences by design:
  * likelihood is fused into the solver scan whenever observation times sit
    on the simulation grid (the common case; the reference always
    materializes PL, logs it on device, and re-uploads it twice —
    bayeslib.py:144-201);
  * sharding replaces SLURM array tasks; results are merged here rather
    than left as per-task strides;
  * chunk-level checkpoint/resume is real (the reference's [new|new+|load]
    CLI mode was never wired up).
"""
from __future__ import annotations

import logging
import time
from typing import Optional

import numpy as np

from . import physics
from .config import InferenceConfig
from .models.driver import SimParams
from .parallel.checkpoint import CheckpointManager
from .parallel.mesh import make_mesh
from .parallel.runner import ShardedRunner
from .utils import io as bio
from .utils import sampling, validate


def almost_equal(x, x0, threshold: float = 1e-10) -> bool:
    """Grid-identity test (reference: bayeslib.py:78-81)."""
    x, x0 = np.asarray(x), np.asarray(x0)
    if x.shape != x0.shape:
        return False
    with np.errstate(divide="ignore", invalid="ignore"):
        return bool(np.abs(np.nanmax((x - x0) / x0)) < threshold)


def is_uniform_prefix(times, dt: float, threshold: float = 1e-9) -> bool:
    """True when ``times`` is exactly the uniform grid 0, dt, 2 dt, ...

    Observation curves on a dt-grid prefix of the simulation horizon can be
    scored by the fused likelihood on a *shortened* simulation — the
    reference instead always integrates the full horizon and interpolates
    down (bayeslib.py:115, 182-191); on matching grids its linear
    interpolation returns the node values, so the shortened run is exactly
    equivalent.
    """
    times = np.asarray(times)
    if len(times) < 2 or times[0] != 0.0:
        return False
    expected = dt * np.arange(len(times))
    return bool(np.max(np.abs(times - expected)) <= threshold * max(dt, 1.0))


def plan_fused_horizon(cfg: InferenceConfig, sim: SimParams, e_data, ic_num: int):
    """Decide the fused strategy for one curve.

    Returns (sim', obs_values (num_exp, n), obs_mask or None) when every
    experiment's curve for this ic is either the full simulation grid or a
    uniform dt-prefix of it; returns None when interpolation is required.
    """
    num_exp = len(e_data)
    lengths = []
    for e in range(num_exp):
        times = np.asarray(e_data[e][0][ic_num])
        if len(times) > sim.T + 1 or not is_uniform_prefix(times, sim.dt):
            return None
        lengths.append(len(times))
    # The multi-phase schedule folds any sub-stride remainder into the fine
    # phase (twophase.geometric_schedule), so the shortened horizon needs no
    # padding; SimParams.fast_phases degrades to None on short horizons.
    T_c = min(max(lengths) - 1, sim.T)
    sim_c = SimParams(length=sim.length, time=T_c * sim.dt, L=sim.L, T=T_c,
                      pl_stride=1, tol_exp=sim.tol_exp, max_iters=sim.max_iters,
                      method=sim.method, predictor=sim.predictor,
                      step_tol=sim.step_tol,
                      fast_fine_steps=sim.fast_fine_steps,
                      fast_coarse_stride=sim.fast_coarse_stride,
                      fast_max_stride=sim.fast_max_stride,
                      fast_steps_per_phase=sim.fast_steps_per_phase)
    n = T_c + 1
    values = np.zeros((num_exp, n))
    weighted = cfg.sim_flags.use_uncertainty
    need_mask = weighted or any(l != n for l in lengths)
    mask = np.zeros((num_exp, n)) if need_mask else None
    for e in range(num_exp):
        v = np.asarray(e_data[e][1][ic_num])
        values[e, :len(v)] = v
        if mask is not None:
            mask[e, :len(v)] = (_sigma_weights(e_data[e][2][ic_num])
                                if weighted else 1.0)
    return sim_c, values, mask


def _sigma_weights(sigma):
    """Per-point weights 1/sigma^2 for the sigma-weighted SSE
    (sim_flags.use_uncertainty).  sigma is the loaded log-space
    uncertainty (sigma/PL/2.3, utils/io.py); NaN or ~zero entries
    (missing third column, zero-count bins) get weight 1 so a sparse
    sigma column degrades to the unweighted SSE point-by-point instead
    of an inf-weighted likelihood; sigma=inf (an explicit "no
    information" marker) gets weight 0."""
    s = np.asarray(sigma, dtype=float)
    w = np.ones_like(s)
    good = s > 1e-30          # False for NaN and for ~zero sigmas
    with np.errstate(divide="ignore"):
        w[good] = 1.0 / s[good] ** 2
    return w


def plan_offgrid(cfg: InferenceConfig, sim: SimParams, e_data, ic_num: int):
    """Build the off-grid fused plan for one curve: a shortened SimParams,
    the phase schedule, and the slot tables (models/offgrid.py).

    Returns None when the curve cannot be fused off-grid (observation times
    beyond the simulated horizon keep the reference's interpolate-to-NaN
    semantics via ``ShardedRunner.run_curve_interp``)."""
    from .models.offgrid import build_offgrid_tables

    num_exp = len(e_data)
    times = [np.asarray(e_data[e][0][ic_num], dtype=float)
             for e in range(num_exp)]
    values = [np.asarray(e_data[e][1][ic_num], dtype=float)
              for e in range(num_exp)]
    tmax = max((t.max() if len(t) else 0.0) for t in times)
    if tmax > sim.time * (1 + 1e-9):
        return None
    if any(np.any(t < 0) for t in times):
        return None
    # Shortened horizon covering the latest observation (same idea as
    # plan_fused_horizon; the reference always integrates the full horizon,
    # bayeslib.py:115).
    T_c = min(max(int(np.ceil(tmax / sim.dt - 1e-9)), 1), sim.T)
    sim_c = SimParams(length=sim.length, time=T_c * sim.dt, L=sim.L, T=T_c,
                      pl_stride=1, tol_exp=sim.tol_exp,
                      max_iters=sim.max_iters, method=sim.method,
                      predictor=sim.predictor, step_tol=sim.step_tol,
                      fast_fine_steps=sim.fast_fine_steps,
                      fast_coarse_stride=sim.fast_coarse_stride,
                      fast_max_stride=sim.fast_max_stride,
                      fast_steps_per_phase=sim.fast_steps_per_phase)
    schedule = sim_c.fast_phases or ((1, T_c),)
    weights = ([_sigma_weights(e_data[e][2][ic_num]) for e in range(num_exp)]
               if cfg.sim_flags.use_uncertainty else None)
    try:
        tables = build_offgrid_tables(times, values, schedule, sim_c.dt,
                                      weights=weights)
    except ValueError as exc:
        # Malformed-but-loadable observation data (e.g. duplicate t=0 rows)
        # keeps the documented contract: fall back to the interpolated
        # likelihood rather than aborting the whole inference run.
        import logging
        logging.getLogger(__name__).warning(
            "off-grid fusion unavailable for curve %d (%s); "
            "falling back to interpolated likelihood", ic_num, exc)
        return None
    return sim_c, schedule, tables


def _adaptive_split(cfg: InferenceConfig, sim_c: SimParams, X):
    """Adaptive tau routing (GridConfig.adaptive_fine_tau): split sample
    indices into (bulk, fine-bucket) and build the fine bucket's
    SimParams (finer fine phase, tighter stride cap).  Returns None when
    routing is off, the curve is not on the multi-phase fast path, or no
    sample falls in the bucket.

    Rationale (docs/PRECISION.md "The raw-rms tail, attributed"): the
    deep-window ladder discretization error concentrates in the
    tau_n-bottom samples (coarse strides vs a ~25 ns decay); routing that
    ~5% of the production box through a 512/16/32 ladder cuts their
    deep-window rms below the 5e-4 hard bound at ~2.6% total cost.  The
    threshold is a pure function of X and the config, so checkpoint
    resume replays the identical split."""
    tau = cfg.grid.adaptive_fine_tau
    if not tau or sim_c.fast_phases is None:
        return None
    fine_sel = np.asarray(X)[:, 9] < float(tau)        # tau_n [ns]
    if not fine_sel.any():
        return None
    fine_idx = np.where(fine_sel)[0]
    bulk_idx = np.where(~fine_sel)[0]
    g = cfg.grid
    sim_f = SimParams(
        length=sim_c.length, time=sim_c.time, L=sim_c.L, T=sim_c.T,
        pl_stride=1, tol_exp=sim_c.tol_exp, max_iters=sim_c.max_iters,
        method=sim_c.method, predictor=sim_c.predictor,
        step_tol=sim_c.step_tol,
        fast_fine_steps=min(int(g.adaptive_fine_steps), sim_c.T // 2),
        fast_coarse_stride=sim_c.fast_coarse_stride,
        fast_max_stride=min(int(g.adaptive_max_stride),
                            sim_c.fast_max_stride),
        fast_steps_per_phase=sim_c.fast_steps_per_phase)
    return bulk_idx, fine_idx, sim_f


def sim_params_for_curve(cfg: InferenceConfig, ic_num: int, num_curves: int) -> SimParams:
    g = cfg.grid
    return SimParams(length=g.thickness_for_curve(ic_num, num_curves),
                     time=g.time, L=g.num_nodes, T=g.num_steps,
                     pl_stride=g.pl_stride, tol_exp=g.tol_exp,
                     max_iters=g.max_iters, method=g.method,
                     predictor=g.predictor, step_tol=g.step_tol,
                     fast_fine_steps=g.fast_fine_steps,
                     fast_coarse_stride=g.fast_coarse_stride,
                     fast_max_stride=g.fast_max_stride,
                     fast_steps_per_phase=g.fast_steps_per_phase)


def _resolve_dtype(name: str):
    import jax
    import jax.numpy as jnp
    if name == "float64":
        return jnp.float64
    if name == "float32":
        return jnp.float32
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def bucket_horizons(plans, logger=None):
    """Pad every fused curve plan to the run's longest horizon with
    zero-weight masks so all curves share ONE compiled chunk program.

    Different per-curve observation lengths otherwise force a recompile per
    curve (the scan length is static); with three Power_scan curves the
    compiles dominated end-to-end wall-clock ~4:1.  The padded steps carry
    mask 0 and contribute nothing to the likelihood; per-curve thickness
    stays a host-side (nondimensionalization) input, so the shared shapes
    compile once.
    """
    fused = [p for p in plans if p is not None]
    if len(fused) < 2:
        return plans
    T_shared = max(p[0].T for p in fused)
    out = []
    for p in plans:
        if p is None:
            out.append(None)
            continue
        sim_c, values, mask = p
        if sim_c.T == T_shared and mask is not None:
            out.append(p)
            continue
        # NOTE: every bucketed plan must carry a mask — a None-mask curve
        # would trace a different chunk program and defeat the sharing.
        n_old = values.shape[1]
        n_new = T_shared + 1
        v = np.zeros((values.shape[0], n_new))
        v[:, :n_old] = values
        m = np.zeros((values.shape[0], n_new))
        m[:, :n_old] = 1.0 if mask is None else mask
        sim_b = SimParams(
            length=sim_c.length, time=T_shared * sim_c.dt, L=sim_c.L,
            T=T_shared, pl_stride=1, tol_exp=sim_c.tol_exp,
            max_iters=sim_c.max_iters, method=sim_c.method,
            predictor=sim_c.predictor, step_tol=sim_c.step_tol,
            fast_fine_steps=sim_c.fast_fine_steps,
            fast_coarse_stride=sim_c.fast_coarse_stride,
            fast_max_stride=sim_c.fast_max_stride,
            fast_steps_per_phase=sim_c.fast_steps_per_phase)
        if logger and sim_c.T != T_shared:
            logger.info("Bucketing curve horizon %d -> %d steps (masked)",
                        sim_c.T, T_shared)
        out.append((sim_b, v, m))
    return out


def simulate(cfg: InferenceConfig, e_data, init_params, X, P,
             runner: ShardedRunner, logger=None,
             ckpt: Optional[CheckpointManager] = None, start=(0, 0),
             P_start=None):
    """Evaluate likelihoods for all curves/experiments into P (in place).

    Mirrors the reference ``simulate`` control flow (bayeslib.py:83-205)
    with the per-GPU stride replaced by mesh sharding inside the runner.
    """
    num_curves = len(init_params)
    num_exp = len(e_data)
    dtype = _resolve_dtype(cfg.device.dtype)
    conv_all = np.ones(len(X), dtype=bool)
    start_curve, start_chunk = start

    plans = [plan_fused_horizon(cfg, sim_params_for_curve(cfg, ic, num_curves),
                                e_data, ic) for ic in range(num_curves)]
    if cfg.grid.bucket_horizons:
        plans = bucket_horizons(plans, logger)

    for ic_num in range(start_curve, num_curves):
        sim = sim_params_for_curve(cfg, ic_num, num_curves)
        if logger:
            logger.info("Curve #%d: thickness=%s, %d timesteps to %s ns",
                        ic_num, sim.length, sim.T, sim.time)
        plan = plans[ic_num]

        def _ckpt_chunk(ci, _ll, _ic=ic_num):
            if ckpt is not None:
                from .parallel.checkpoint import CheckpointState
                state = CheckpointState(
                    num_samples=len(X), num_exp=num_exp, num_curves=num_curves,
                    chunk=runner.chunk, curve_index=_ic, chunk_index=ci + 1)
                ckpt.save_progress(state, P)

        def _ckpt_retry(_ic=ic_num):
            # Re-checkpoint after the retry pass repairs failed samples:
            # without this, resuming after a curve's retry reverts its
            # repairs to the pre-retry NaN sums (ADVICE r3).
            if ckpt is not None:
                n_chunks = -(-len(X) // runner.chunk)
                _ckpt_chunk(n_chunks - 1, None, _ic=_ic)

        first_chunk = start_chunk if ic_num == start_curve else 0
        # Snapshot the accumulator at the true start of each curve: the
        # retry pass's repair baseline on resume (a failed sample's
        # running sum is NaN, so the pre-curve value is unrecoverable
        # from P itself).  On a mid-curve resume the snapshot on disk is
        # already this curve's — do not overwrite it.
        if ckpt is not None and first_chunk == 0:
            ckpt.save_curve_start(P)
        curve_P_start = (P_start if (ic_num == start_curve and first_chunk)
                         else None)
        if plan is not None:
            sim_c, obs_vals, obs_mask = plan
            if logger:
                logger.info(
                    "Observation times on simulation grid: fused likelihood "
                    "(horizon %d steps%s)", sim_c.T,
                    ", masked" if obs_mask is not None else "")
            routing = _adaptive_split(cfg, sim_c, X)
            common = dict(normalize=cfg.sim_flags.self_normalize,
                          dtype=dtype, chunk_done=_ckpt_chunk, out=P,
                          obs_mask=obs_mask, P_start=curve_P_start,
                          retry_done=_ckpt_retry)
            prog = ((lambda ci, nc: logger.info(
                "Curve #%d: chunk %d of %d", ic_num, ci, nc))
                if logger else None)
            if routing is None:
                _, conv = runner.run_curve(
                    X, sim_c, init_params[ic_num], obs_vals,
                    progress=prog, start_chunk=first_chunk, **common)
            else:
                # Adaptive tau routing (GridConfig.adaptive_fine_tau): the
                # short-tau_n bucket runs a finer ladder; the two passes
                # share one checkpoint chunk sequence (bulk chunks first).
                bulk_idx, fine_idx, sim_f = routing
                if logger:
                    logger.info(
                        "Adaptive ladder: %d of %d samples in the "
                        "tau_n < %g ns fine bucket", len(fine_idx), len(X),
                        cfg.grid.adaptive_fine_tau)
                nb_chunks = -(-len(bulk_idx) // runner.chunk)
                nf_chunks = -(-len(fine_idx) // runner.chunk)
                conv = np.ones(len(X), dtype=bool)
                # Each pass's retry re-checkpoints at ITS last chunk of
                # the shared sequence — the total-chunk index the plain
                # path uses would overstate progress mid-sequence.
                if len(bulk_idx) and first_chunk < nb_chunks:
                    _, cb = runner.run_curve(
                        X, sim_c, init_params[ic_num], obs_vals,
                        progress=prog, start_chunk=first_chunk,
                        sample_idx=bulk_idx,
                        **dict(common,
                               retry_done=lambda: _ckpt_chunk(
                                   nb_chunks - 1, None)))
                    conv &= cb
                if len(fine_idx):
                    _, cf = runner.run_curve(
                        X, sim_f, init_params[ic_num], obs_vals,
                        progress=prog,
                        start_chunk=max(0, first_chunk - nb_chunks),
                        sample_idx=fine_idx, chunk_index_offset=nb_chunks,
                        **dict(common,
                               retry_done=lambda: _ckpt_chunk(
                                   nb_chunks + nf_chunks - 1, None)))
                    conv &= cf
        else:
            og = (plan_offgrid(cfg, sim, e_data, ic_num)
                  if cfg.grid.offgrid_fused else None)
            if og is not None:
                sim_c, schedule, tables = og
                if logger:
                    logger.info(
                        "Observation times off-grid: fused slot-table "
                        "likelihood (horizon %d steps, %d phases)",
                        sim_c.T, len(schedule))
                _, conv = runner.run_curve_offgrid(
                    X, sim_c, init_params[ic_num], tables, schedule,
                    normalize=cfg.sim_flags.self_normalize, dtype=dtype,
                    progress=(lambda ci, nc: logger.info(
                        "Curve #%d: chunk %d of %d", ic_num, ci, nc))
                    if logger else None,
                    chunk_done=_ckpt_chunk, start_chunk=first_chunk, out=P,
                    P_start=curve_P_start, retry_done=_ckpt_retry)
            else:
                if logger:
                    logger.info(
                        "Observation times off-grid: interpolating likelihood")
                _, conv = runner.run_curve_interp(
                    X, sim, init_params[ic_num],
                    [np.asarray(e_data[e][0][ic_num]) for e in range(num_exp)],
                    [np.asarray(e_data[e][1][ic_num]) for e in range(num_exp)],
                    normalize=cfg.sim_flags.self_normalize,
                    log_pl=cfg.sim_flags.log_pl,
                    obs_weights=(
                        [_sigma_weights(e_data[e][2][ic_num])
                         for e in range(num_exp)]
                        if cfg.sim_flags.use_uncertainty else None),
                    dtype=dtype,
                    progress=(lambda ci, nc: logger.info(
                        "Curve #%d: chunk %d of %d", ic_num, ci, nc))
                    if logger else None,
                    chunk_done=_ckpt_chunk, start_chunk=first_chunk, out=P,
                    P_start=curve_P_start, retry_done=_ckpt_retry)
        conv_all &= conv
    P[:, ~conv_all] = np.nan
    return conv_all


def bayes(cfg: InferenceConfig, logger: Optional[logging.Logger] = None):
    """Top-level driver (reference: bayeslib.bayes, bayeslib.py:207-252).

    Returns (P, X, info): per-experiment log-likelihoods (num_exp, n),
    the sample matrix in user units (n, 13), and run diagnostics.
    """
    t_start = time.perf_counter()
    from .utils import program_cache as _pcache
    build_t0 = _pcache.build_seconds()
    # Multi-host: join the global runtime when the coordinator env vars are
    # set (the SLURM-array replacement; parallel/distributed.py).  Every
    # process runs this same function; host-side RNG state is identical
    # (same seed), per-chunk results are allgathered, and only the primary
    # process writes checkpoints/exports.
    from .parallel import distributed as dist
    dist.maybe_initialize_from_env()
    primary = dist.is_primary()
    rng = np.random.default_rng(cfg.sim_flags.seed)

    init_params = bio.get_initpoints(cfg.paths.init_file, cfg.ic_flags.as_dict())
    e_data = bio.get_data(cfg.paths.observation_files, cfg.ic_flags.as_dict(),
                          cfg.sim_flags.as_dict(), logger=logger, rng=rng)

    num_exp = len(e_data)
    for exp in e_data:
        if len(init_params) != len(exp[0]):
            raise ValueError("Num. ICs mismatch num. datasets")
    validate.validate_ic(init_params, cfg.grid.num_nodes)
    validate.validate_ic_flags(cfg.ic_flags)
    validate.validate_params(physics.NUM_PARAMS, physics.UNIT_CONVERSIONS,
                             cfg.params.do_log, cfg.params.min_x, cfg.params.max_x)
    validate.validate_solver(cfg.grid.method, cfg.grid.predictor)

    min_x, max_x = cfg.params.bounds_converted()
    ckpt = None
    start = (0, 0)
    resumed = False
    P_start = None
    if cfg.checkpoint and cfg.paths.out_dirs and primary:
        ckpt = CheckpointManager(cfg.paths.out_dirs[0])
        if cfg.resume:
            loaded = ckpt.load()
            if loaded is not None:
                state, P, X, P_start = loaded
                start = (state.curve_index, state.chunk_index)
                resumed = True
                if logger:
                    logger.info("Resuming at curve %d chunk %d", *start)

    if not resumed:
        _, P, X = sampling.make_grid(
            num_exp, min_x, max_x, cfg.params.do_log, cfg.sim_flags.as_dict(),
            rng=np.random.RandomState(cfg.sim_flags.seed))
    if cfg.checkpoint and cfg.paths.out_dirs and cfg.resume:
        # Multi-process: every process must agree on the primary's resume
        # point and accumulated P, or the per-chunk collectives desync
        # (only the primary reads the checkpoint).  Single-process: no-op.
        start_a, P, X, P_start_b, resumed_f = dist.broadcast_from_primary(
            (np.asarray(start), P, X,
             P_start if P_start is not None else P, np.float64(resumed)))
        start = (int(start_a[0]), int(start_a[1]))
        resumed = bool(resumed_f)
        P_start = P_start_b if resumed else None
    if logger:
        logger.info("Initialized %d random samples", len(X))

    devices = validate.connect_to_devices(cfg.device)
    mesh = make_mesh(devices)
    runner = ShardedRunner(mesh, chunk_per_device=cfg.device.chunk_per_device,
                           retries=cfg.device.retry_nonconverged)
    if ckpt is not None and not resumed:
        ckpt.init(X, num_exp, len(init_params), runner.chunk)

    profiling = bool(cfg.device.profile_dir)
    if profiling:
        import jax
        jax.profiler.start_trace(cfg.device.profile_dir)
    try:
        simulate(cfg, e_data, init_params, X, P, runner, logger=logger,
                 ckpt=ckpt, start=start, P_start=P_start)
    finally:
        if profiling:
            jax.profiler.stop_trace()
            if logger:
                logger.info("jax.profiler trace written to %s",
                            cfg.device.profile_dir)

    X_user = X / physics.UNIT_CONVERSIONS
    if primary:
        for i, out_dir in enumerate(cfg.paths.out_dirs):
            bio.export(out_dir, P[i], X_user, logger=logger)

    info = dict(runtime=time.perf_counter() - t_start, **runner.timers.as_dict(),
                num_samples=len(X), num_devices=runner.n_devices,
                program_build_time=_pcache.build_seconds() - build_t0)
    if logger:
        logger.info("Total tEvol time: %.2fs; err_sq: %.2fs; misc: %.2fs",
                    runner.timers.solver_time, runner.timers.err_sq_time,
                    runner.timers.misc_time)
        logger.info("Bayesim took %.2fs", info["runtime"])
    return P, X_user, info
