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
import hashlib
import itertools
import os

import numpy as np
import pytest

from bayesian_inference_trpl_tpu import physics
from bayesian_inference_trpl_tpu.tools import compare, run_sweep

_CACHE_DIR = os.path.join(os.path.dirname(run_sweep.__file__), "exact_cache")


def _oracle_cached(sweep: dict, rtol: float, atol: float) -> dict:
    """Disk-cached run_oracle: the 32-corner scipy BDF integration takes
    ~2 h on one CPU core, so the result ships with the repo (keyed on the
    corner matrix + grid + tolerances; any change recomputes)."""
    key = hashlib.sha1(
        np.ascontiguousarray(np.asarray(sweep["mat_par"])).tobytes()
        + f'{sweep["T"]}_{sweep["time"]}_{sweep["L"]}_{rtol}_{atol}'.encode()
    ).hexdigest()[:10]
    path = os.path.join(_CACHE_DIR, f"corner_oracle_T{sweep['T']}_{key}.npz")
    if os.path.exists(path):
        return dict(np.load(path))
    out = run_sweep.run_oracle(sweep, rtol=rtol, atol=atol)
    os.makedirs(_CACHE_DIR, exist_ok=True)
    np.savez_compressed(path, **out)
    return out

L = 128
TIME = 5.0          # ns — the stiff window, where all fields move
T0 = 200            # base refinement level (dt = 25 ps, production dt)


def _corner_matrix():
    """32 production-box corners: Sf/Sb in {0.1, 1e5} cm/s (1e5 = the
    Highsurf regime, beyond the sampling box's 100 — the hard corner),
    B in {1e-11, 1e-9}, tau_n=tau_p in {1, 2000} ns, lambda in {0.1, 10}."""
    corners = []
    for Sf, Sb, B, tau, lam in itertools.product(
            (0.1, 1e5), (0.1, 1e5), (1e-11, 1e-9), (1.0, 2000.0), (0.1, 10.0)):
        corners.append([1e8, 1e15, 20.0, 20.0, B, Sf, Sb, 1e-29, 1e-29,
                        tau, tau, lam])
    mat_user = np.asarray(corners)
    return mat_user * physics.UNIT_CONVERSIONS[:12]


def _sweep(mat, T):
    return dict(mat_par=mat, length=311.0, time=TIME, L=L, T=T,
                tol_exp=9.0, max_iters=500, init_mode="exp",
                ini_par=np.array([1e18 / 1e7 ** 3, 100.0]))


@pytest.mark.slow
def test_corner_sweep_parity_with_dt_refined_e_gate():
    mat = _corner_matrix()
    # rtol 1e-8 puts the oracle's own error ~4 orders below the smallest
    # discretization error being gated (refined-dt E ~1e-3).
    oracle = _oracle_cached(_sweep(mat, T0 * 4), rtol=1e-8, atol=1e-12)

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
