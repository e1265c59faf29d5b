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
    T0, corner_matrix as _corner_matrix, corner_sweep as _sweep,
    e_corner_matrix as _e_corner_matrix, load_oracle)


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
    sols_by_T = {}
    for T in (T0, T0 * 2, T0 * 4):
        sol = run_sweep.run_solver(_sweep(mat, T), "coupled_newton",
                                   "float64")
        assert sol["converged"].all(), \
            f"non-converged corners at T={T}: {np.where(~sol['converged'])}"
        errs_by_T[T] = compare.field_errors(sol, oracle, reduce="none")
        sols_by_T[T] = sol

    # --- N/P/PL gates at the production dt, worst corner (not mean).
    # Measured discretization error at the EXTREME corners (Highsurf 1e5,
    # B 1e-9, tau 1 ns, lambda 10) is 2.3e-2 worst-case, contracting
    # O(dt^2.2) under refinement (2.29e-2 -> 5.1e-3 at T0*2) — the fixed
    # bounds bracket that, and the refinement assertions below are the
    # real regression gate (a broken assembly would stop contracting).
    e0 = errs_by_T[T0]
    assert np.nanmax(e0["N"]) < 3e-2, e0["N"]
    assert np.nanmax(e0["P"]) < 3e-2, e0["P"]
    assert np.nanmax(e0["PL"]) < 4e-2, e0["PL"]
    # N must contract under dt refinement like a discretization error.
    rN = np.nanmax(np.asarray(errs_by_T[T0 * 2]["N"])) / np.nanmax(e0["N"])
    assert rN < 0.5, f"N error not shrinking under refinement (ratio {rN:.3f})"

    # --- E gate: bounded and dt-stable.  Measured (r3, with the
    # physically-aligned comparator): at these corners the E-vs-oracle
    # discrepancy does NOT contract under dt refinement (median ratio
    # 1.000) while N/P contract O(dt^2.1) at the same spatial
    # resolution — E sits at its fixed-dx SPATIAL error floor (it is the
    # accumulated integral of flux imbalance; its dx^2 truncation term
    # does not shrink with dt, and it feeds PL only weakly, which is why
    # N/P/PL still converge).  The honest gate is therefore: (a) dt
    # refinement must not GROW the E error (a time-integration bug
    # would), and (b) the worst-corner magnitude stays below a bound a
    # broken field assembly (wrong sign/scale, O(1)+ error) cannot meet.
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
    print(f"E stability: median refinement ratio {med_ratio:.4f}, worst "
          f"base {np.nanmax(E0):.3e}, worst refined {np.nanmax(E2):.3e}")
    assert med_ratio < 1.05, (
        f"E error GROWS under dt refinement (median ratio {med_ratio:.3f})"
        " — time-integration defect; investigate")
    # This matrix is ambipolar BY CONSTRUCTION (mu_n == mu_p + pairwise
    # recombination), so the true E is IDENTICALLY ZERO and the relative
    # E norm compares solver noise to oracle integration noise (r3
    # diagnosis; the oracle floor is ~7.4e-10 V/nm at rtol 1e-8).  The
    # honest magnitude gate here is therefore ABSOLUTE: the solver must
    # reproduce the exact ambipolar cancellation to numerical noise.  A
    # sign/scale bug in either carrier's flux assembly breaks the
    # cancellation and produces |E| at the asymmetric-corner scale
    # (~3e-4 V/nm, 6+ orders above this bound).  The mu-ASYMMETRIC
    # relative-parity gate lives in
    # test_e_corner_gate_mu_asymmetric below.
    absE = float(np.nanmax(np.abs(np.asarray(sols_by_T[T0]["E"]))))
    assert absE < 1e-9, (
        f"ambipolar corners must give E == 0 to noise; got "
        f"max |E| = {absE:.3e} V/nm — a carrier-flux sign/scale "
        f"defect breaks the mu_n==mu_p cancellation")


@pytest.mark.slow
def test_e_corner_gate_mu_asymmetric():
    """The REAL E parity gate: 16 mu-asymmetric corners where space
    charge actually develops (max |E| ~ 2-4e-4 V/nm, 5-6 orders above
    the oracle noise floor), closing r3's E-blindness xfail.

    Measured (r4, f64 solver vs scipy-BDF oracle at rtol 1e-8):

        T         N max      P max      E max      PL max
        T0        2.15e-2    2.15e-2    5.20e-2    1.31e-2
        T0*2      4.39e-3    4.38e-3    1.30e-2    3.32e-3
        T0*4      1.31e-3    1.30e-3    1.79e-3    8.95e-4

    E contracts O(dt^1.7-2.9) — a genuine discretization error.  The
    bounds below bracket those numbers with ~2x headroom; a wrong-sign
    or wrong-scale field assembly produces a relative norm of O(1)+ and
    cannot pass, and a time-integration defect stops the contraction.
    Reference counterpart: Testing/compare.py:41-57 treats E as a
    first-class compared field; its repo never gated it.
    """
    mat = _e_corner_matrix()
    oracle = load_oracle(_sweep(mat, T0 * 4), rtol=1e-8, atol=1e-12)

    errs_by_T = {}
    for T in (T0, T0 * 2, T0 * 4):
        sol = run_sweep.run_solver(_sweep(mat, T), "coupled_newton",
                                   "float64")
        assert sol["converged"].all(), \
            f"non-converged E-corners at T={T}: {np.where(~sol['converged'])}"
        errs_by_T[T] = compare.field_errors(sol, oracle, reduce="none")

    e0 = {f: np.asarray(errs_by_T[T0][f]) for f in ("N", "P", "E", "PL")}
    e2 = {f: np.asarray(errs_by_T[T0 * 4][f]) for f in ("N", "P", "E", "PL")}
    # Production-dt magnitude bounds, worst corner.
    assert np.nanmax(e0["N"]) < 4e-2, e0["N"]
    assert np.nanmax(e0["P"]) < 4e-2, e0["P"]
    assert np.nanmax(e0["E"]) < 1e-1, e0["E"]
    assert np.nanmax(e0["PL"]) < 3e-2, e0["PL"]
    # Refined-dt bounds: at T0*4 the solver must track the oracle's E to
    # sub-percent — no noise-vs-noise escape hatch here.
    assert np.nanmax(e2["E"]) < 5e-3, e2["E"]
    assert np.nanmax(e2["N"]) < 4e-3, e2["N"]
    # E must CONTRACT under dt refinement like the discretization error
    # it is (median per-halving ratio measured 0.14-0.25).
    E0 = np.asarray(errs_by_T[T0]["E"])
    E1 = np.asarray(errs_by_T[T0 * 2]["E"])
    E2 = np.asarray(errs_by_T[T0 * 4]["E"])
    ratios = np.concatenate([E1 / E0, E2 / E1])
    med = float(np.median(ratios))
    print(f"E-corner gate: worst E {np.nanmax(E0):.3e} -> "
          f"{np.nanmax(E2):.3e}, median refinement ratio {med:.3f}")
    assert med < 0.5, (
        f"E error not contracting under dt refinement (median ratio "
        f"{med:.3f}) — field assembly or time-integration defect")
