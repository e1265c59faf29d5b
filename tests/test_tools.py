"""Verification-instrument pipeline: sweep -> run (solver + oracle) ->
compare -> overlay, all through the CLIs (reference counterparts:
Testing/pvSetup.py, PV_tester2.py, compare.py, pvPlt_interface.py)."""
import os

import numpy as np
import pytest

from bayesian_inference_trpl_tpu.tools import compare, overlay, run_sweep, sweep


@pytest.mark.slow
def test_tools_pipeline(tmp_path):
    sweep_f = str(tmp_path / "sweep.npz")
    solver_f = str(tmp_path / "solver.npz")
    oracle_f = str(tmp_path / "oracle.npz")
    sweep.main([sweep_f, "--mun", "3.89", "--mup", "3.89",
                "--B", "1e-10,1e-11", "--Sf", "1e3", "--Sb", "1e3",
                "--taun", "50", "--taup", "50",
                "--T", "200", "--time", "5", "--max-iters", "500",
                "--tol-exp", "7"])
    data = dict(np.load(sweep_f))
    assert data["mat_par"].shape == (2, 12)

    run_sweep.main([sweep_f, solver_f, "--backend", "solver",
                    "--dtype", "float64"])
    run_sweep.main([sweep_f, oracle_f, "--backend", "oracle"])

    a, b = dict(np.load(solver_f)), dict(np.load(oracle_f))
    assert a["N"].shape == (2, 6, 128) and b["N"].shape == (2, 6, 128)
    errs = compare.field_errors(a, b)
    # discretization-level agreement on the stiff window (docs/PRECISION.md)
    assert errs["N"] < 1e-2 and errs["P"] < 1e-2 and errs["PL"] < 2e-2
    # E is the loosest field (secular O(dt^0.7) error, and the relative
    # norm is ill-conditioned on short windows where E ~ 0); tracked only.
    assert errs["E"] < 2.0

    # comparator CLI gate: must exit 1 on an absurd tolerance
    with pytest.raises(SystemExit):
        compare.main([solver_f, oracle_f, "--tol", "1e-12"])
    compare.main([solver_f, oracle_f, "--tol", "2.0"])

    out_dir = str(tmp_path / "ov")
    overlay.main([solver_f, oracle_f, "--out-dir", out_dir, "--samples", "0"])
    assert os.path.exists(os.path.join(out_dir, "overlay_0000.png"))


def test_sweep_combinations():
    vals = [[1.0], [2.0, 3.0], [4.0, 5.0]] + [[0.0]] * 9
    mat = sweep.make_sweep(vals)
    assert mat.shape == (4, 12)
    assert sorted(map(tuple, mat[:, 1:3].tolist())) == [
        (2.0, 4.0), (2.0, 5.0), (3.0, 4.0), (3.0, 5.0)]


@pytest.mark.smoke
def test_load_exact_validates_shape_rows_and_metadata(tmp_path):
    """The exact-cache loader must reject shards, truncated assemblies,
    and wrong-profile files instead of silently gating wrong rows
    (ADVICE r3)."""
    from bayesian_inference_trpl_tpu.tools.accuracy_gate import load_exact

    lp = np.random.default_rng(0).normal(size=(8, 101))
    full = str(tmp_path / "full.npy")
    np.save(full, lp)
    assert load_exact(full, 8, 100).shape == (8, 101)
    with pytest.raises(SystemExit):
        load_exact(full, 16, 100)          # wrong batch
    with pytest.raises(SystemExit):
        load_exact(full, 8, 200)           # wrong T

    shard = str(tmp_path / "shard.npz")
    np.savez(shard, lp64=lp[2:6], rows=np.array([2, 6]), batch=8, T=100,
             seed=0, profile="power_scan")
    with pytest.raises(SystemExit):
        load_exact(shard, 8, 100)          # partial rows must fail

    ok = str(tmp_path / "ok.npz")
    np.savez(ok, lp64=lp, rows=np.array([0, 8]), batch=8, T=100,
             seed=0, profile="power_scan")
    assert load_exact(ok, 8, 100, seed=0, profile="power_scan").shape == (8, 101)
    with pytest.raises(SystemExit):
        load_exact(ok, 8, 100, seed=1)     # wrong seed
    with pytest.raises(SystemExit):
        load_exact(ok, 8, 100, profile="synthetic")


@pytest.mark.smoke
def test_shifted_curves_interpolation():
    from bayesian_inference_trpl_tpu.tools.timeshift_demo import shifted_curves

    t = np.arange(11, dtype=float)
    lp = -0.5 * t
    s = shifted_curves(lp, [0.0, 0.5, -0.5])
    np.testing.assert_allclose(s[0], lp, atol=1e-12)
    # +0.5-step shift samples the curve half a step later (interior).
    np.testing.assert_allclose(s[1][3], -0.5 * 3.5, atol=1e-12)
    # Ends clamp rather than extrapolate.
    assert s[1][-1] == lp[-1]
    assert s[2][0] == lp[0]
