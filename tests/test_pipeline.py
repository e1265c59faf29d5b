"""End-to-end pipeline tests on synthetic observation/excitation files:
full bayes() run, posterior sanity (true parameters score best), checkpoint
resume, and the interpolating (off-grid observation times) path."""
import os

import numpy as np
import pytest

from bayesian_inference_trpl_tpu import physics
from bayesian_inference_trpl_tpu.config import (
    DeviceConfig, GridConfig, IcFlags, InferenceConfig, ParamSpace, Paths, SimFlags)
from bayesian_inference_trpl_tpu.models import SimParams, pvsim
from bayesian_inference_trpl_tpu.pipeline import bayes
from bayesian_inference_trpl_tpu.utils import io as bio

L = 128
TIME = 1.0
T = 20
TRUE = dict(n0=1e8, p0=1e15, mun=20.0, mup=20.0, B=5e-10, Sf=10.0, Sb=10.0,
            CN=1e-29, CP=1e-29, taun=500.0, taup=800.0, lam=0.1)


def _write_synthetic(tmp_path, obs_times=None, num_curves=2):
    """Generate observations from the solver itself at the TRUE parameters."""
    mat_user = np.array([[TRUE["n0"], TRUE["p0"], TRUE["mun"], TRUE["mup"],
                          TRUE["B"], TRUE["Sf"], TRUE["Sb"], TRUE["CN"],
                          TRUE["CP"], TRUE["taun"], TRUE["taup"], TRUE["lam"]]])
    mat = mat_user * physics.UNIT_CONVERSIONS[:12]
    sim = SimParams(length=311.0, time=TIME, L=L, T=T, pl_stride=1,
                    tol_exp=7, max_iters=2000)
    profiles = []
    rng = np.random.default_rng(5)
    for c in range(num_curves):
        a = (0.5 + c) * 1e18 / 1e7 ** 3
        xg = (np.arange(L) + 0.5) * sim.dx
        profiles.append(a * np.exp(-xg / 100.0))

    obs_path = tmp_path / "obs.csv"
    exc_path = tmp_path / "exc.csv"
    with open(exc_path, "w") as f:
        for dn in profiles:
            f.write(",".join(f"{v / 1e-21:.8e}" for v in dn) + "\n")
    with open(obs_path, "w") as f:
        for dn in profiles:
            res = pvsim(mat, sim, dn, init_mode="points")
            pl = np.asarray(res.pl)[0]                 # [nm^-2 ns^-1]
            t = sim.pl_times if obs_times is None else obs_times
            pl_t = pl if obs_times is None else np.interp(obs_times, sim.pl_times, pl)
            for ti, pi in zip(t, pl_t):
                f.write(f"{ti},{pi / 1e-23:.10e},1e13\n")
        f.write("END,,\n")
    return str(obs_path), str(exc_path)


def _config(tmp_path, obs_path, exc_path, n_points=24):
    return InferenceConfig(
        grid=GridConfig(thickness=311.0, time=TIME, num_nodes=L, num_steps=T,
                        pl_stride=1, tol_exp=7, max_iters=2000),
        params=ParamSpace(
            min_x=[1e8, 1e14, 20.0, 20.0, 1e-11, 10.0, 10.0, 1e-29, 1e-29,
                   500.0, 800.0, 0.1, 0.0],
            max_x=[1e8, 1e16, 20.0, 20.0, 1e-9, 10.0, 10.0, 1e-29, 1e-29,
                   500.0, 800.0, 0.1, 0.0],
            do_log=[1, 1, 0, 0, 1, 1, 1, 1, 1, 0, 0, 1, 0]),
        ic_flags=IcFlags(time_cutoff=None),
        sim_flags=SimFlags(num_points=n_points, seed=42),
        device=DeviceConfig(chunk_per_device=4, n_devices=2),
        paths=Paths(init_file=exc_path, observation_files=[obs_path],
                    out_dirs=[str(tmp_path / "OUT")]),
        checkpoint=False)


@pytest.fixture(scope="module")
def synthetic(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("e2e")
    obs, exc = _write_synthetic(tmp_path)
    return tmp_path, obs, exc


def test_end_to_end_and_posterior_peak(synthetic):
    tmp_path, obs, exc = synthetic
    cfg = _config(tmp_path, obs, exc)
    P, X, info = bayes(cfg)
    assert P.shape == (1, 24) and X.shape == (24, 13)
    assert np.isfinite(P).all()
    # The sample whose (p0, B) lies closest to the truth must score best.
    d_true = (np.log10(X[:, 1] / TRUE["p0"]) ** 2
              + np.log10(X[:, 4] / TRUE["B"]) ** 2)
    assert abs(P.argmax() - d_true.argmin()) == 0 or \
        P[0, d_true.argmin()] >= np.sort(P[0])[-3]
    # Export files exist and round-trip.
    P2, X2 = bio.load_bayran(str(tmp_path / "OUT"))
    np.testing.assert_allclose(P2, P[0])
    np.testing.assert_allclose(X2, X)
    assert info["num_devices"] == 2


def test_true_params_near_zero_error(synthetic):
    """Likelihood at the generating parameters is ~0 (self-consistency)."""
    tmp_path, obs, exc = synthetic
    cfg = _config(tmp_path, obs, exc)
    cfg.params.min_x = cfg.params.max_x = [
        TRUE["n0"], TRUE["p0"], TRUE["mun"], TRUE["mup"], TRUE["B"],
        TRUE["Sf"], TRUE["Sb"], TRUE["CN"], TRUE["CP"], TRUE["taun"],
        TRUE["taup"], TRUE["lam"], 0.0]
    cfg.sim_flags.num_points = 2
    P, X, _ = bayes(cfg)
    assert np.all(P > -1e-8)


def test_interp_path(synthetic, tmp_path):
    """Observations on a different time grid exercise the unfused
    interpolation path (reference: bayeslib.py:182-191)."""
    obs_times = np.linspace(0.0, TIME, 11)
    obs2, exc2 = _write_synthetic(tmp_path, obs_times=obs_times, num_curves=1)
    cfg = _config(tmp_path, obs2, exc2, n_points=6)
    cfg.grid.offgrid_fused = False     # force the interp fallback
    cfg.params.min_x = cfg.params.max_x = [
        TRUE["n0"], TRUE["p0"], TRUE["mun"], TRUE["mup"], TRUE["B"],
        TRUE["Sf"], TRUE["Sb"], TRUE["CN"], TRUE["CP"], TRUE["taun"],
        TRUE["taup"], TRUE["lam"], 0.0]
    cfg.sim_flags.num_points = 2
    P, X, _ = bayes(cfg)
    # interpolation error only: still near-perfect match
    assert np.all(P > -1e-4)


def test_offgrid_fused_path_matches_interp(tmp_path):
    """Off-grid observation times through the fused slot-table path agree
    with the interp fallback to interpolation tolerance (the only
    difference: in-scan cubic vs host-side linear interpolation in log
    space), with identical samples and NaN filtering."""
    obs_times = np.concatenate([[0.0], np.geomspace(0.013, TIME, 13)])
    obs2, exc2 = _write_synthetic(tmp_path, obs_times=obs_times, num_curves=2)
    cfg = _config(tmp_path, obs2, exc2, n_points=8)
    P_f, X_f, _ = bayes(cfg)
    cfg2 = _config(tmp_path, obs2, exc2, n_points=8)
    cfg2.grid.offgrid_fused = False
    P_i, X_i, _ = bayes(cfg2)
    np.testing.assert_allclose(X_f, X_i)
    # T=20 is a deliberately coarse grid, so cubic-vs-linear interpolation
    # differences are at their largest here (~1%); real horizons (T=80k)
    # are gated much tighter in test_offgrid.py.
    np.testing.assert_allclose(P_f, P_i, rtol=0.02, atol=0.02)


def test_offgrid_checkpoint_resume(tmp_path, monkeypatch):
    """Preemption mid-curve on the fused off-grid path resumes exactly."""
    from bayesian_inference_trpl_tpu.parallel.runner import ShardedRunner

    obs_times = np.concatenate([[0.0], np.geomspace(0.013, TIME, 9)])
    obs2, exc2 = _write_synthetic(tmp_path, obs_times=obs_times, num_curves=2)
    cfg_ref = _config(tmp_path, obs2, exc2, n_points=16)
    cfg_ref.paths.out_dirs = [str(tmp_path / "OGREF")]
    cfg_ref.checkpoint = True
    P_full, X_full, _ = bayes(cfg_ref)

    cfg = _config(tmp_path, obs2, exc2, n_points=16)
    cfg.paths.out_dirs = [str(tmp_path / "OGCKPT")]
    cfg.checkpoint = True
    calls = {"n": 0}
    orig = ShardedRunner.run_curve_offgrid

    def interrupting(self, *a, **k):
        if calls["n"] == 1:
            raise KeyboardInterrupt("simulated preemption")
        calls["n"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(ShardedRunner, "run_curve_offgrid", interrupting)
    with pytest.raises(KeyboardInterrupt):
        bayes(cfg)
    monkeypatch.setattr(ShardedRunner, "run_curve_offgrid", orig)

    cfg.resume = True
    P_res, X_res, _ = bayes(cfg)
    np.testing.assert_allclose(X_res, X_full)
    np.testing.assert_allclose(P_res, P_full, rtol=1e-12, atol=1e-12)


def test_checkpoint_resume(synthetic, monkeypatch):
    """Kill the run after the first curve; a resumed run must reproduce an
    uninterrupted run exactly."""
    from bayesian_inference_trpl_tpu.parallel.runner import ShardedRunner

    tmp_path, obs, exc = synthetic
    cfg_ref = _config(tmp_path, obs, exc, n_points=8)
    cfg_ref.paths.out_dirs = [str(tmp_path / "CKPT_REF")]
    cfg_ref.checkpoint = True
    P_full, X_full, _ = bayes(cfg_ref)

    cfg = _config(tmp_path, obs, exc, n_points=8)
    cfg.paths.out_dirs = [str(tmp_path / "CKPT")]
    cfg.checkpoint = True

    calls = {"n": 0}
    orig = ShardedRunner.run_curve

    def interrupting(self, *a, **k):
        if calls["n"] == 1:
            raise KeyboardInterrupt("simulated preemption")
        calls["n"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(ShardedRunner, "run_curve", interrupting)
    with pytest.raises(KeyboardInterrupt):
        bayes(cfg)
    monkeypatch.setattr(ShardedRunner, "run_curve", orig)

    cfg.resume = True
    P_res, X_res, _ = bayes(cfg)
    np.testing.assert_allclose(X_res, X_full)
    np.testing.assert_allclose(P_res, P_full, rtol=1e-12, atol=1e-12)


def test_checkpoint_resume_interp(tmp_path, monkeypatch):
    """Preemption mid-curve on the interpolating (off-grid) path: the
    resumed run must pick up at the interrupted chunk and reproduce an
    uninterrupted run exactly."""
    from bayesian_inference_trpl_tpu.parallel import runner as runner_mod

    obs_times = np.linspace(0.0, TIME, 11)
    obs2, exc2 = _write_synthetic(tmp_path, obs_times=obs_times, num_curves=2)
    cfg_ref = _config(tmp_path, obs2, exc2, n_points=16)
    cfg_ref.grid.offgrid_fused = False
    cfg_ref.paths.out_dirs = [str(tmp_path / "IREF")]
    cfg_ref.checkpoint = True
    P_full, X_full, _ = bayes(cfg_ref)

    cfg = _config(tmp_path, obs2, exc2, n_points=16)
    cfg.grid.offgrid_fused = False
    cfg.paths.out_dirs = [str(tmp_path / "ICKPT")]
    cfg.checkpoint = True
    calls = {"n": 0}
    orig = runner_mod._chunk_dispatch_interp

    def interrupting(statics, *args):
        calls["n"] += 1
        if calls["n"] == 2:    # second chunk of curve 0
            raise KeyboardInterrupt("simulated preemption mid-interp")
        return orig(statics, *args)

    monkeypatch.setattr(runner_mod, "_chunk_dispatch_interp", interrupting)
    with pytest.raises(KeyboardInterrupt):
        bayes(cfg)
    monkeypatch.setattr(runner_mod, "_chunk_dispatch_interp", orig)

    cfg.resume = True
    P_res, X_res, _ = bayes(cfg)
    np.testing.assert_allclose(X_res, X_full)
    np.testing.assert_allclose(P_res, P_full, rtol=1e-12, atol=1e-12)


def test_bucket_horizons_pads_and_masks():
    """All fused plans share one horizon; padded region carries zero mask
    and existing masks/values are preserved (one compiled chunk program for
    multi-curve runs)."""
    from bayesian_inference_trpl_tpu.models.driver import SimParams
    from bayesian_inference_trpl_tpu.pipeline import bucket_horizons

    def mk(T_c, mask=None):
        sim = SimParams(length=311.0, time=T_c * 0.025, L=128, T=T_c,
                        pl_stride=1)
        vals = np.arange(2 * (T_c + 1), dtype=float).reshape(2, T_c + 1)
        return (sim, vals, mask)

    p0 = mk(100)
    p1 = mk(200)
    m2 = np.zeros((2, 151)); m2[:, :120] = 1.0
    p2 = mk(150, m2)
    out = bucket_horizons([p0, None, p1, p2])
    assert out[1] is None
    for q, orig_T in zip((out[0], out[2], out[3]), (100, 200, 150)):
        sim_b, v, m = q
        assert sim_b.T == 200 and v.shape == (2, 201) and m.shape == (2, 201)
        assert np.all(m[:, orig_T + 1:] == 0.0)
    # original values survive; original masks survive
    np.testing.assert_array_equal(out[0][1][:, :101], p0[1])
    assert np.all(out[0][2][:, :101] == 1.0)
    np.testing.assert_array_equal(out[3][2][:, :151], m2)
    # single fused plan: no-op
    assert bucket_horizons([mk(100), None]) [0][2] is None
