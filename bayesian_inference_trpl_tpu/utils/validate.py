"""Startup validation of inputs and device configuration
(reference: bayes_validate.py:10-55, re-targeted from CUDA detection to the
JAX device mesh)."""
from __future__ import annotations

import numpy as np


def validate_ic(ics, L: int):
    for ic in ics:
        if len(ic) != L:
            raise ValueError(f"IC length {len(ic)} != declared L {L}")


def validate_ic_flags(ic_flags):
    tc = ic_flags.time_cutoff if hasattr(ic_flags, "time_cutoff") else ic_flags["time_cutoff"]
    if tc is not None:
        if not isinstance(tc, (int, float)) or tc <= 0:
            raise ValueError("invalid time cutoff")
    sel = ic_flags.select_obs_sets if hasattr(ic_flags, "select_obs_sets") else ic_flags["select_obs_sets"]
    if sel is not None and not isinstance(sel, list):
        raise ValueError("invalid observation set selection")
    nl = ic_flags.noise_level if hasattr(ic_flags, "noise_level") else ic_flags["noise_level"]
    if nl is not None and not isinstance(nl, (int, float)):
        raise ValueError("invalid noise level")


def validate_params(num_params: int, unit_conversions, do_log, min_x, max_x):
    if len(unit_conversions) != num_params:
        raise ValueError("unit conversion array is missing entries")
    if len(do_log) != num_params:
        raise ValueError("do_log mask is missing values")
    if len(min_x) != num_params or len(max_x) != num_params:
        raise ValueError("missing min/max param values")
    if not np.all(np.asarray(min_x) <= np.asarray(max_x)):
        raise ValueError("min params larger than max params")


SOLVER_METHODS = ("gauss_seidel", "coupled_newton", "coupled_newton_pallas",
                  "fused_horizon", "fused_horizon_chord")
PREDICTORS = ("previous", "linear", "quadratic", "geometric")


def validate_solver(method: str, predictor: str):
    """Fail fast on typo'd solver knobs (the solver itself also raises, but
    only at trace time, after sampling/IO work has been done)."""
    if method not in SOLVER_METHODS:
        raise ValueError(f"unknown solver method {method!r}; "
                         f"choose one of {SOLVER_METHODS}")
    if predictor not in PREDICTORS:
        raise ValueError(f"unknown Newton predictor {predictor!r}; "
                         f"choose one of {PREDICTORS}")


def connect_to_devices(device_cfg):
    """Resolve the accelerator mesh; replaces ``connect_to_gpu``
    (reference: bayes_validate.py:45-55)."""
    import jax
    devs = jax.devices()
    n = device_cfg.n_devices or len(devs)
    if n > len(devs):
        raise RuntimeError(f"requested {n} devices, only {len(devs)} present")
    return devs[:n]
