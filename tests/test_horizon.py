"""Full-horizon fused Pallas kernel vs the XLA op-chain solver.

The kernel (ops/pallas/horizon_kernel.py) runs the whole fixed-dt horizon
in one launch with VMEM-resident history; these tests gate it (in Mosaic
interpret mode on CPU) against ``solve(..., method="coupled_newton")`` —
the same math, so agreement is to summation-order rounding only.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesian_inference_trpl_tpu import physics
from bayesian_inference_trpl_tpu.models.driver import (
    SimParams, initial_excess_density, pl_log_scale)
from bayesian_inference_trpl_tpu.models.solver import (
    FusedObs, SolverConfig, solve)
from bayesian_inference_trpl_tpu.ops.pallas.horizon_kernel import (
    solve_horizon_fused)

from conftest import sample_mat_par


def _problem(T, batch=4, seed=3, num_exp=1):
    rng = np.random.default_rng(seed)
    mat = sample_mat_par(rng, batch)
    sim = SimParams(length=311.0, time=2000.0 * T / 80000, L=128, T=T,
                    pl_stride=1)
    mat_nd = jnp.asarray(physics.nondimensionalize(mat, sim.dx, sim.dt))
    dn = initial_excess_density(sim, (1e18 / 1e7 ** 3, 100.0), "exp")
    n0 = mat_nd[:, 0:1] + dn[None, :]
    p0 = mat_nd[:, 1:2] + dn[None, :]
    obs_vals = jnp.asarray(rng.uniform(-4.0, -2.0, (num_exp, T + 1)))
    obs = FusedObs(values=obs_vals, log_scale=jnp.asarray(pl_log_scale(sim)),
                   min_val=1e-300)
    cfg = SolverConfig(num_steps=T, pl_stride=1, tol=1e-8, max_iters=40,
                       method="coupled_newton")
    return mat_nd, n0, p0, obs, cfg


def _compare(r_ker, r_ref, state_tol=1e-6):
    np.testing.assert_allclose(np.asarray(r_ker.sse), np.asarray(r_ref.sse),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(r_ker.err_sum),
                               np.asarray(r_ref.err_sum), rtol=1e-9)
    np.testing.assert_array_equal(np.asarray(r_ker.converged),
                                  np.asarray(r_ref.converged))
    if state_tol is not None:
        for a, b in ((r_ker.n, r_ref.n), (r_ker.p, r_ref.p),
                     (r_ker.e, r_ref.e)):
            # The kernel sums the BDF history in newest-first coefficient
            # order (static-slot unroll); the scan path sums in slot order.
            # f64 agreement is to reassociation rounding (~1e-15 abs on E).
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=state_tol, atol=1e-12)


def test_horizon_matches_solve():
    T = 36
    mat_nd, n0, p0, obs, cfg = _problem(T)
    r_ref = solve(mat_nd, n0, p0, jnp.zeros_like(n0), cfg, obs=obs,
                  record_pl=False)
    r_ker = solve_horizon_fused(mat_nd, n0, p0, cfg, obs, tb=12,
                                interpret=True)
    _compare(r_ker, r_ref)
    np.testing.assert_array_equal(np.asarray(r_ker.sample_iters),
                                  np.asarray(r_ref.sample_iters))


def test_horizon_padding_and_mask():
    """T not a multiple of the time block: the padded tail carries zero
    weight and cannot poison convergence; results match the exact-T run."""
    T = 40
    mat_nd, n0, p0, obs, cfg = _problem(T, num_exp=2)
    mask = np.ones((2, T + 1))
    mask[1, T - 5:] = 0.0        # second experiment's curve ends early
    obs_m = FusedObs(values=obs.values, log_scale=obs.log_scale,
                     min_val=obs.min_val, mask=jnp.asarray(mask))
    r_ref = solve(mat_nd, n0, p0, jnp.zeros_like(n0), cfg, obs=obs_m,
                  record_pl=False)
    r_ker = solve_horizon_fused(mat_nd, n0, p0, cfg, obs_m, tb=12,
                                interpret=True)
    # The kernel freezes the published state (and iteration telemetry) at
    # the REAL horizon, so the padded tail is invisible to callers —
    # solve_multiphase consumes n/p/e as the exact phase-boundary state.
    _compare(r_ker, r_ref)
    np.testing.assert_array_equal(np.asarray(r_ker.sample_iters),
                                  np.asarray(r_ref.sample_iters))
    np.testing.assert_array_equal(np.asarray(r_ker.max_newton_iters),
                                  np.asarray(r_ref.max_newton_iters))


def test_horizon_traced_log_scale_jits():
    """log_scale arrives as a TRACED scalar on the production runner path
    (a jitted positional argument); the kernel wrapper must not float() it."""
    T = 12
    mat_nd, n0, p0, obs, cfg = _problem(T)

    @jax.jit
    def run(mat_nd, n0, p0, values, log_scale):
        o = FusedObs(values=values, log_scale=log_scale, min_val=1e-300)
        r = solve_horizon_fused(mat_nd, n0, p0, cfg, o, tb=12,
                                interpret=True)
        return r.sse
    sse = run(mat_nd, n0, p0, obs.values, obs.log_scale)
    r_ref = solve(mat_nd, n0, p0, jnp.zeros_like(n0), cfg, obs=obs,
                  record_pl=False)
    np.testing.assert_allclose(np.asarray(sse), np.asarray(r_ref.sse),
                               rtol=1e-9)


def test_horizon_normalize():
    T = 24
    mat_nd, n0, p0, obs, cfg = _problem(T)
    obs_n = FusedObs(values=obs.values, log_scale=obs.log_scale,
                     min_val=1e-300, normalize=True)
    r_ref = solve(mat_nd, n0, p0, jnp.zeros_like(n0), cfg, obs=obs_n,
                  record_pl=False)
    r_ker = solve_horizon_fused(mat_nd, n0, p0, cfg, obs_n, tb=12,
                                interpret=True)
    _compare(r_ker, r_ref)


def test_horizon_chord_matches_solve():
    """Frozen-Jacobian (chord) mode solves the same nonlinear systems to
    the same two-tier acceptance quality: sse agrees with exact Newton to
    accepted-residual accumulation (~skip_tol), convergence flags equal.
    Iteration counts differ by design (linear vs quadratic convergence)."""
    T = 36
    mat_nd, n0, p0, obs, cfg = _problem(T)
    r_ref = solve(mat_nd, n0, p0, jnp.zeros_like(n0), cfg, obs=obs,
                  record_pl=False)
    r_ch = solve_horizon_fused(mat_nd, n0, p0, cfg, obs, tb=12, chord=True,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(r_ch.sse), np.asarray(r_ref.sse),
                               rtol=1e-7)
    np.testing.assert_allclose(np.asarray(r_ch.err_sum),
                               np.asarray(r_ref.err_sum), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(r_ch.converged),
                                  np.asarray(r_ref.converged))
    for a, b in ((r_ch.n, r_ref.n), (r_ch.p, r_ref.p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-12)
    # Full-solve telemetry: the tile must have refreshed the Jacobian at
    # least once (first step) and no more often than it updated.
    fulls = np.asarray(r_ch.full_solves)
    assert fulls.shape == (mat_nd.shape[0],)
    assert (fulls >= 1).all()
    assert fulls.max() <= T * cfg.max_iters
    # fulls is a tile-wide count: every sample in the (single) tile sees
    # the same value.
    assert (fulls == fulls[0]).all()
    assert r_ref.full_solves is None      # telemetry is chord-only
    # method routing
    cfg_c = cfg._replace(method="fused_horizon_chord")
    r_rt = solve(mat_nd, n0, p0, jnp.zeros_like(n0), cfg_c, obs=obs,
                 record_pl=False)
    np.testing.assert_array_equal(np.asarray(r_rt.sse), np.asarray(r_ch.sse))


def test_solve_routes_fused_horizon():
    """method="fused_horizon" on solve() dispatches to the kernel when the
    call shape allows and falls back to coupled_newton stepping otherwise."""
    T = 12
    mat_nd, n0, p0, obs, cfg = _problem(T)
    cfg_f = cfg._replace(method="fused_horizon")
    r_ref = solve(mat_nd, n0, p0, jnp.zeros_like(n0), cfg, obs=obs,
                  record_pl=False)
    r_fh = solve(mat_nd, n0, p0, jnp.zeros_like(n0), cfg_f, obs=obs,
                 record_pl=False)
    np.testing.assert_allclose(np.asarray(r_fh.sse), np.asarray(r_ref.sse),
                               rtol=1e-9)
    # Fallback: PL trace requested -> op-chain path, same results.
    r_fb = solve(mat_nd, n0, p0, jnp.zeros_like(n0), cfg_f, obs=obs,
                 record_pl=True)
    assert r_fb.pl is not None
    np.testing.assert_allclose(np.asarray(r_fb.sse), np.asarray(r_ref.sse),
                               rtol=1e-12)


def test_horizon_chord_multitile_cache_reset():
    """Two sample tiles in one launch: the chord cache (cval) and the
    fulls/execs telemetry counters are per-tile scratch that MUST reset on
    tile re-entry (horizon_kernel._init) — a stale factorization leaking
    from tile 0 into tile 1 would silently corrupt tile 1's chord steps.
    Gate: tile 1's results inside the 2-tile launch are BITWISE identical
    to solving tile 1's samples alone (VERDICT r2, weak #8a)."""
    T = 36
    mat_nd, n0, p0, obs, cfg = _problem(T, batch=16, seed=11)
    r_ref = solve(mat_nd, n0, p0, jnp.zeros_like(n0), cfg, obs=obs,
                  record_pl=False)
    r_2t = solve_horizon_fused(mat_nd, n0, p0, cfg, obs, tb=12, tile=8,
                               chord=True, interpret=True)
    np.testing.assert_allclose(np.asarray(r_2t.sse), np.asarray(r_ref.sse),
                               rtol=1e-7)
    np.testing.assert_array_equal(np.asarray(r_2t.converged),
                                  np.asarray(r_ref.converged))
    # Telemetry is tile-wide: uniform within each tile, and the counts are
    # each tile's own (both tiles start from a fresh cache, so both must
    # pay at least the first-step Jacobian refresh).
    fulls = np.asarray(r_2t.full_solves)
    execs = np.asarray(r_2t.tile_body_iters)
    assert (fulls[:8] == fulls[0]).all() and (fulls[8:] == fulls[8]).all()
    assert (execs[:8] == execs[0]).all() and (execs[8:] == execs[8]).all()
    assert fulls[0] >= 1 and fulls[8] >= 1
    # Bitwise: tile 1 solved alone == tile 1 inside the 2-tile launch.
    r_t1 = solve_horizon_fused(mat_nd[8:], n0[8:], p0[8:], cfg, obs, tb=12,
                               tile=8, chord=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(r_t1.sse),
                                  np.asarray(r_2t.sse)[:, 8:])
    np.testing.assert_array_equal(np.asarray(r_t1.n),
                                  np.asarray(r_2t.n)[8:])
    np.testing.assert_array_equal(np.asarray(r_t1.p),
                                  np.asarray(r_2t.p)[8:])
    np.testing.assert_array_equal(np.asarray(r_t1.full_solves),
                                  fulls[8:])
    np.testing.assert_array_equal(np.asarray(r_t1.tile_body_iters),
                                  execs[8:])


def test_coarse_phase_multiblock_multitile():
    """Coarse-phase kernel with n_blocks > 1 (streamed observation blocks,
    the production tb=384 path) AND two sample tiles, vs the scan
    reference (twophase._coarse_phase), in both full-Newton and chord
    modes (VERDICT r2, weak #8a).  The dense-output window (lpw), chord
    cache, and accumulators must all persist across a tile's time blocks
    and reset between tiles."""
    from bayesian_inference_trpl_tpu.models.solver import pl_observable
    from bayesian_inference_trpl_tpu.models.trpl import MatParams
    from bayesian_inference_trpl_tpu.models.twophase import _coarse_phase
    from bayesian_inference_trpl_tpu.ops.pallas.horizon_kernel import (
        solve_coarse_phase_fused)

    T1, S, C = 12, 2, 48
    n_fine = C * S
    T = T1 + n_fine
    mat_nd, n0, p0, obs, cfg = _problem(T, batch=16, seed=13)

    # Fine phase (scan path), exactly as solve_multiphase stages it.
    obs1 = FusedObs(values=obs.values[:, :T1 + 1], log_scale=obs.log_scale,
                    min_val=obs.min_val)
    r1 = solve(mat_nd, n0, p0, jnp.zeros_like(n0),
               cfg._replace(num_steps=T1), obs=obs1, record_pl=False)
    mp = MatParams.from_array(mat_nd)
    pl0 = pl_observable(n0, p0, mp)

    acc0 = (r1.converged, r1.max_newton_iters, r1.sample_iters,
            jnp.zeros_like(r1.sse), jnp.zeros_like(r1.err_sum))
    _, _, _, acc_ref = _coarse_phase(mat_nd, r1.n, r1.p, r1.e, cfg, obs,
                                     pl0, acc0, T1, n_fine, S)
    sse_ref = np.asarray(acc_ref[3])

    for chord in (False, True):
        r_k = solve_coarse_phase_fused(
            mat_nd, r1.n, r1.p, r1.e, cfg._replace(chord_strict=True), obs,
            pl0, T1, n_fine, S, tb=24, tile=8, chord=chord, interpret=True)
        assert np.asarray(r_k.converged).all()
        np.testing.assert_allclose(np.asarray(r_k.sse), sse_ref,
                                   rtol=1e-6 if chord else 1e-9)
        np.testing.assert_allclose(np.asarray(r_k.err_sum),
                                   np.asarray(acc_ref[4]),
                                   rtol=1e-5 if chord else 1e-9, atol=1e-9)
        if chord:
            # Per-tile telemetry reset, as in the full-horizon test.
            fulls = np.asarray(r_k.full_solves)
            assert (fulls[:8] == fulls[0]).all()
            assert (fulls[8:] == fulls[8]).all()
            assert fulls[0] >= 1 and fulls[8] >= 1
