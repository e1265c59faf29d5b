"""Corner-sweep parity gate: solver vs independent scipy oracle over the
Cartesian CORNERS of the production parameter box, with a REAL E-field
tolerance derived from dt-refinement.

Replaces the ``errs["E"] < 2.0`` placebo: the E-field discrepancy against
the oracle is pure discretization error, so it must (a) shrink under dt
refinement with a measurable order, and (b) be bounded at the refined dt
by a tolerance computed FROM the fitted order — a gate that can actually
fail if the field assembly ever regresses.

Reference counterpart: Testing/pvSetup.py:49-90 (Cartesian sweep) +
compare.py:41-57 (relative norms); the reference repo never gated E.
"""
import numpy as np
import pytest

from bayesian_inference_trpl_tpu.tools import compare, run_sweep
from bayesian_inference_trpl_tpu.tools.corner_cache import (
    T0, corner_matrix as _corner_matrix, corner_sweep as _sweep, load_oracle)


@pytest.mark.slow
def test_corner_sweep_parity_with_dt_refined_e_gate():
    mat = _corner_matrix()
    # rtol 1e-8 puts the oracle's own error ~4 orders below the smallest
    # discretization error being gated (refined-dt E ~1e-3).  The oracle
    # result SHIPS with the repo (tools/exact_cache/corner_oracle_*.npz);
    # load_oracle fails fast with regeneration instructions if it is
    # absent rather than silently starting the ~2 h integration.
    oracle = load_oracle(_sweep(mat, T0 * 4), rtol=1e-8, atol=1e-12)

    errs_by_T = {}
    for T in (T0, T0 * 2, T0 * 4):
        sol = run_sweep.run_solver(_sweep(mat, T), "coupled_newton",
                                   "float64")
        assert sol["converged"].all(), \
            f"non-converged corners at T={T}: {np.where(~sol['converged'])}"
        errs_by_T[T] = compare.field_errors(sol, oracle, reduce="none")

    # --- N/P/PL gates at the production dt, worst corner (not mean).
    e0 = errs_by_T[T0]
    assert np.nanmax(e0["N"]) < 2e-2, e0["N"]
    assert np.nanmax(e0["P"]) < 2e-2, e0["P"]
    assert np.nanmax(e0["PL"]) < 4e-2, e0["PL"]

    # --- E gate via dt-refinement: per-corner error must shrink under
    # refinement (median ratio well below 1 -> discretization-dominated),
    # and the refined-dt worst error must be bounded by the extrapolation
    # the fitted order implies.
    E0 = np.asarray(errs_by_T[T0]["E"])
    E1 = np.asarray(errs_by_T[T0 * 2]["E"])
    E2 = np.asarray(errs_by_T[T0 * 4]["E"])
    # Only corners where E is numerically meaningful (the relative norm is
    # ill-conditioned when E ~ 0 everywhere).
    sig = E0 > 1e-12
    assert sig.sum() >= 16, f"too few meaningful-E corners: {sig.sum()}"
    r1 = E1[sig] / E0[sig]
    r2 = E2[sig] / E1[sig]
    med_ratio = float(np.median(np.concatenate([r1, r2])))
    assert med_ratio < 0.75, (
        f"E error not shrinking under dt refinement (median ratio "
        f"{med_ratio:.3f}) — not discretization error; investigate")
    order = -np.log2(med_ratio)
    # Gate: at the refined dt, no corner's E error may exceed what one
    # more refinement level of the fitted order would still leave from the
    # base level (x4 safety).  With med_ratio <= 0.75 this ceiling is at
    # most 2.25x the base error — a bound a broken field assembly (O(1)
    # error, non-shrinking) cannot pass.
    ceil = 4.0 * np.nanmax(E0) * med_ratio ** 2
    assert np.nanmax(E2) < ceil, (E2.max(), ceil, order)
    print(f"E refinement: order ~{order:.2f}, base worst {E0.max():.3e}, "
          f"refined worst {E2.max():.3e} < ceil {ceil:.3e}")
