"""End-to-end run on the reference's bundled Example Data (3 observation
files x 3 power-scan curves, truncated to 5 ns for test speed) — exercises
the real CSV formats, per-experiment curve-length masking, and the
prefix-grid fused path."""
import os

import numpy as np
import pytest

from bayesian_inference_trpl_tpu.config import (
    DeviceConfig, GridConfig, IcFlags, InferenceConfig, ParamSpace, Paths, SimFlags)
from bayesian_inference_trpl_tpu.pipeline import (
    bayes, is_uniform_prefix, plan_fused_horizon, sim_params_for_curve)
from bayesian_inference_trpl_tpu.utils import io as bio

DATA = "/root/reference/Example Data"
OBS_FILES = [
    os.path.join(DATA, "Highbacksurf_Power_scan_Observations.csv"),
    os.path.join(DATA, "Highfrontsurf_Power_scan_Observations.csv"),
    os.path.join(DATA, "Balancedhighsurf_Power_scan_Observations.csv"),
]
EXC = os.path.join(DATA, "Power_scan_Excitations.csv")

pytestmark = pytest.mark.skipif(not os.path.isdir(DATA),
                                reason="example data absent")


def test_is_uniform_prefix():
    assert is_uniform_prefix(np.arange(11) * 0.025, 0.025)
    assert not is_uniform_prefix(np.arange(1, 11) * 0.025, 0.025)  # no t=0
    assert not is_uniform_prefix(np.array([0.0, 0.3, 0.35]), 0.025)


def _cfg(tmp_path, time_cutoff=5.0, num_steps=200):
    return InferenceConfig(
        grid=GridConfig(thickness=311.0, time=num_steps * 0.025,
                        num_nodes=128, num_steps=num_steps, pl_stride=1,
                        tol_exp=7.0, max_iters=500, method="coupled_newton"),
        params=ParamSpace(),
        ic_flags=IcFlags(time_cutoff=time_cutoff),
        sim_flags=SimFlags(num_points=8, seed=42),
        device=DeviceConfig(chunk_per_device=4, n_devices=2),
        paths=Paths(init_file=EXC, observation_files=OBS_FILES,
                    out_dirs=[str(tmp_path / f"OUT{i}") for i in range(3)]),
        checkpoint=False)


def test_plan_fused_horizon_detects_prefix_grids(tmp_path):
    cfg = _cfg(tmp_path)
    e_data = bio.get_data(OBS_FILES, cfg.ic_flags.as_dict(),
                          cfg.sim_flags.as_dict())
    sim = sim_params_for_curve(cfg, 0, 3)
    plan = plan_fused_horizon(cfg, sim, e_data, 0)
    assert plan is not None
    sim_c, values, mask = plan
    assert sim_c.T <= sim.T
    assert values.shape[0] == 3


@pytest.mark.slow
def test_example_data_end_to_end(tmp_path):
    cfg = _cfg(tmp_path)
    P, X, info = bayes(cfg)
    assert P.shape == (3, 8)
    assert np.isfinite(P).all()
    assert np.all(P < 0)          # SSE likelihoods are negative
    assert X.shape == (8, 13)
    # user-units round trip: n0 pinned at 1e8 cm^-3
    np.testing.assert_allclose(X[:, 0], 1e8)
    for i in range(3):
        P2, X2 = bio.load_bayran(str(tmp_path / f"OUT{i}"))
        np.testing.assert_allclose(P2, P[i])


@pytest.mark.slow
def test_masked_vs_unmasked_consistency(tmp_path):
    """Scoring each experiment alone (unmasked horizons) must equal the
    jointly-masked multi-experiment run."""
    cfg = _cfg(tmp_path)
    P_joint, X, _ = bayes(cfg)
    for e in range(3):
        cfg_e = _cfg(tmp_path)
        cfg_e.paths.observation_files = [OBS_FILES[e]]
        cfg_e.paths.out_dirs = [str(tmp_path / f"SOLO{e}")]
        P_solo, X_solo, _ = bayes(cfg_e)
        np.testing.assert_allclose(X_solo, X)
        np.testing.assert_allclose(P_solo[0], P_joint[e], rtol=1e-9, atol=1e-7)
