"""Adaptive tau-ladder routing (GridConfig.adaptive_fine_tau): the
short-tau_n bucket runs a finer ladder, the bulk keeps the fast one, and
the composition is exactly equivalent to running each bucket alone —
including across a mid-fine-pass checkpoint resume."""
import numpy as np
import pytest

from bayesian_inference_trpl_tpu.config import (
    DeviceConfig, GridConfig, IcFlags, InferenceConfig, ParamSpace, Paths,
    SimFlags)
from bayesian_inference_trpl_tpu.pipeline import bayes

L = 128
T = 48
TIME = 2000.0 * T / 80000


def _write_synthetic(tmp_path):
    times = np.linspace(0.0, TIME, T + 1)
    pl = 1e-3 * np.exp(-times / 200.0)
    obs = tmp_path / "obs.csv"
    with open(obs, "w") as f:
        for t, p in zip(times, pl):
            f.write(f"{t},{p / 1e-23:.8e},1e13\n")
        f.write("END,,\n")
    exc = tmp_path / "exc.csv"
    with open(exc, "w") as f:
        prof = 1e18 / 1e7 ** 3 * np.exp(-np.arange(L) * (311.0 / L) / 100.0)
        f.write(",".join(f"{v / 1e-21:.8e}" for v in prof) + "\n")
    return obs, exc


def _cfg(tmp_path, obs, exc, out, adaptive_tau=None, fine=16, max_stride=4,
         n_points=24, checkpoint=False):
    return InferenceConfig(
        grid=GridConfig(thickness=311.0, time=TIME, num_nodes=L, num_steps=T,
                        pl_stride=1, tol_exp=6.0, max_iters=100,
                        method="coupled_newton", predictor="linear",
                        step_tol=1e-6, fast_fine_steps=fine,
                        fast_coarse_stride=2, fast_max_stride=max_stride,
                        fast_steps_per_phase=4,
                        adaptive_fine_tau=adaptive_tau,
                        adaptive_fine_steps=24, adaptive_max_stride=2),
        params=ParamSpace(), ic_flags=IcFlags(time_cutoff=None),
        sim_flags=SimFlags(num_points=n_points, seed=11),
        device=DeviceConfig(chunk_per_device=1, dtype="float64"),
        paths=Paths(init_file=str(exc), observation_files=[str(obs)],
                    out_dirs=[str(tmp_path / out)]),
        checkpoint=checkpoint, resume=False)


def test_adaptive_routing_matches_per_bucket_runs(tmp_path):
    obs, exc = _write_synthetic(tmp_path)
    # All-bulk, all-fine, and routed runs over the same seed/sample draw.
    P_bulk, X, _ = bayes(_cfg(tmp_path, obs, exc, "B"))
    P_fine, X2, _ = bayes(_cfg(tmp_path, obs, exc, "F", fine=24, max_stride=2))
    np.testing.assert_array_equal(X, X2)
    tau_thresh = float(np.median(X[:, 9]))
    P_ad, X3, _ = bayes(_cfg(tmp_path, obs, exc, "A",
                             adaptive_tau=tau_thresh))
    np.testing.assert_array_equal(X, X3)
    fine_sel = X[:, 9] < tau_thresh          # X is in user units; tau [ns]
    assert 0 < fine_sel.sum() < len(X)
    # Routed == per-bucket composition, bitwise (XLA path is sample-
    # independent; chunk-layout invariance is test_sharding's gate).
    np.testing.assert_array_equal(P_ad[:, ~fine_sel], P_bulk[:, ~fine_sel])
    np.testing.assert_array_equal(P_ad[:, fine_sel], P_fine[:, fine_sel])
    # The two ladders genuinely differ on this problem.
    assert not np.allclose(P_bulk[:, fine_sel], P_fine[:, fine_sel])


def test_adaptive_resume_mid_fine_pass(tmp_path, monkeypatch):
    from bayesian_inference_trpl_tpu.parallel import runner as runner_mod

    obs, exc = _write_synthetic(tmp_path)
    cfg_ref = _cfg(tmp_path, obs, exc, "R1", checkpoint=True)
    P_ref, X, _ = bayes(cfg_ref)
    tau_thresh = float(np.median(X[:, 9]))
    cfg_ref2 = _cfg(tmp_path, obs, exc, "R2", adaptive_tau=tau_thresh,
                    checkpoint=True)
    P_full, _, _ = bayes(cfg_ref2)

    cfg = _cfg(tmp_path, obs, exc, "CKPT", adaptive_tau=tau_thresh,
               checkpoint=True)
    calls = {"n": 0}
    orig = runner_mod._chunk_dispatch

    def interrupting(statics, *args):
        calls["n"] += 1
        # 24 samples, chunk 8 -> bulk pass has 2 chunks, fine pass 2; die
        # inside the fine pass.
        if calls["n"] == 4:
            raise KeyboardInterrupt("simulated preemption mid-fine-pass")
        return orig(statics, *args)

    monkeypatch.setattr(runner_mod, "_chunk_dispatch", interrupting)
    with pytest.raises(KeyboardInterrupt):
        bayes(cfg)
    monkeypatch.setattr(runner_mod, "_chunk_dispatch", orig)

    cfg.resume = True
    P_res, X_res, _ = bayes(cfg)
    np.testing.assert_array_equal(P_res, P_full)
