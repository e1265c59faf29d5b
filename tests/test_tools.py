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
