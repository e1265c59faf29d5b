"""Grid-refinement (legacy) pipeline: model-error math and end-to-end
truth recovery with the TPU solver as forward model."""
import numpy as np
import pytest

from bayesian_inference_trpl_tpu import physics
from bayesian_inference_trpl_tpu.models.driver import SimParams
from bayesian_inference_trpl_tpu.utils.legacy_pipeline import (
    forward_lnp, grid_refine_bayes, make_trpl_forward, marginal_p, model_err)
from bayesian_inference_trpl_tpu.utils.sampling import index_grid, param_grid


def test_model_err_neighbor_differences():
    # 1-D grid of 4: differences ignore the wrap-around pair.
    F = np.array([1.0, 2.0, 4.0, 8.0])
    err = model_err(F, [4])
    assert err.shape == (1,)
    assert err[0] == 4.0                      # max of |1-2|,|2-4|,|4-8|
    # 2-D 2x2 grid, F = axis0 + 10*axis1 -> per-axis errors 1 and 10.
    F = np.array([0.0, 1.0, 10.0, 11.0])
    err = model_err(F, [2, 2])
    np.testing.assert_allclose(err, [1.0, 10.0])


def test_forward_lnp_prefers_match():
    values = np.array([1.0, 0.5])
    std = np.array([0.01, 0.01])
    F = np.stack([np.array([1.0, 0.5]),        # exact match
                  np.array([1.3, 0.8])])       # off
    lnp = forward_lnp(F, values, std, [2])
    assert lnp[0] > lnp[1]


def test_grid_refine_recovers_truth():
    TRUE_P0, TRUE_B = 1e15, 5e-10
    min_x = np.array([1e8, 1e14, 20.0, 20.0, 1e-11, 10.0, 10.0, 1e-29,
                      1e-29, 500.0, 800.0, 0.1, 0.0])
    max_x = np.array([1e8, 1e16, 20.0, 20.0, 1e-9, 10.0, 10.0, 1e-29,
                      1e-29, 500.0, 800.0, 0.1, 0.0])
    do_log = np.array([0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0])
    sim = SimParams(length=311.0, time=0.5, L=128, T=10, pl_stride=1,
                    tol_exp=7, max_iters=1000)
    conv = np.concatenate([physics.UNIT_CONVERSIONS[:12], [1.0]])
    fwd_user = make_trpl_forward(sim, (1e18 / 1e7 ** 3, 100.0), "exp")
    forward = lambda X: fwd_user(np.asarray(X) * conv)   # noqa: E731

    true_x = min_x.copy()
    true_x[1], true_x[4] = TRUE_P0, TRUE_B
    values = forward(true_x[None])[0]
    data = (sim.pl_times, values, np.full(sim.num_pl, 1e-8))

    refs = [np.array([1, 4, 1, 1, 4, 1, 1, 1, 1, 1, 1, 1, 1]),
            np.array([1, 2, 1, 1, 2, 1, 1, 1, 1, 1, 1, 1, 1])]
    N, P = grid_refine_bayes(forward, refs, min_x, max_x,
                             min_p=[0.0, 1e-3], data=data, do_log=do_log)
    assert np.isclose(P.sum(), 1.0)
    best = np.argmax(P)
    ind = index_grid(N[best:best + 1], refs)
    X = param_grid(ind, refs, min_x, max_x, do_log)[0]
    # B is strongly identified (PL scales with B); p0 is nearly
    # unidentifiable at this high excitation (PL ~ B*dn^2 for dn >> p0),
    # exactly the degeneracy the reference pipeline surfaces via flat
    # marginals — so the gate is on B only.
    assert abs(np.log10(X[4] / TRUE_B)) < 0.5
    marg = marginal_p(N, P, refs)
    # B marginal (axis 4, final grid 8 cells over [1e-11, 1e-9]): mass
    # concentrates in the cells bracketing the truth.
    b_centers = 10 ** (-11 + 2 * (np.arange(8) + 0.5) / 8)
    near = np.abs(np.log10(b_centers / TRUE_B)) < 0.5
    assert marg[4][near].sum() > 0.8, marg[4]
