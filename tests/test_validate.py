"""Startup-validation unit tests (reference: bayes_validate.py:10-55)."""
import numpy as np
import pytest

from bayesian_inference_trpl_tpu.utils import validate

pytestmark = pytest.mark.smoke   # fast tier: pure numerics/io


def test_validate_ic_rejects_wrong_length():
    validate.validate_ic([np.zeros(128)], 128)
    with pytest.raises(ValueError):
        validate.validate_ic([np.zeros(64)], 128)


def test_validate_params_rejects_inverted_bounds():
    n = 13
    ones = np.ones(n)
    validate.validate_params(n, ones, ones, ones, 2 * ones)
    with pytest.raises(ValueError):
        validate.validate_params(n, ones, ones, 2 * ones, ones)
    with pytest.raises(ValueError):
        validate.validate_params(n, ones[:-1], ones, ones, ones)


def test_validate_solver_accepts_known_knobs():
    for m in validate.SOLVER_METHODS:
        for p in validate.PREDICTORS:
            validate.validate_solver(m, p)


def test_validate_solver_rejects_typos():
    with pytest.raises(ValueError, match="solver method"):
        validate.validate_solver("fused_horizons", "previous")
    with pytest.raises(ValueError, match="predictor"):
        validate.validate_solver("fused_horizon", "cubic")


def test_validate_solver_lists_match_solver_dispatch():
    """The fail-fast lists must stay in sync with SolverConfig's accepted
    values (models/solver.py dispatch)."""
    import inspect

    from bayesian_inference_trpl_tpu.models import solver

    src = inspect.getsource(solver)
    for m in validate.SOLVER_METHODS:
        assert f'"{m}"' in src, m
    for p in validate.PREDICTORS:
        assert f'"{p}"' in src, p
