"""Mixed-thickness (Twothick) batched inference end-to-end.

The reference supports a per-curve thickness list (bayeslib.py:109-119,
thicknesses at :186-190; BASELINE.json config #5 "two-thickness scan") —
each excitation curve is simulated at its own absorber thickness within
one inference run.  These tests exercise that capability end-to-end:
observations for two curves are generated at two different thicknesses,
and the mixed-thickness run must (a) recover the generating parameters,
(b) beat a wrong-uniform-thickness run, and (c) compile ONE chunk program
for both thicknesses (thickness enters through host-side
nondimensionalization only; bucket_horizons shares the traced shapes).
"""
import numpy as np
import pytest

from bayesian_inference_trpl_tpu import physics
from bayesian_inference_trpl_tpu.config import (
    DeviceConfig, GridConfig, IcFlags, InferenceConfig, ParamSpace, Paths,
    SimFlags)
from bayesian_inference_trpl_tpu.models import SimParams, pvsim
from bayesian_inference_trpl_tpu.pipeline import bayes

L = 128
TIME = 1.0
T = 20
THICKS = [311.0, 622.0]
TRUE = dict(n0=1e8, p0=1e15, mun=20.0, mup=20.0, B=5e-10, Sf=10.0, Sb=10.0,
            CN=1e-29, CP=1e-29, taun=500.0, taup=800.0, lam=0.1)


def _write_twothick(tmp_path):
    """Two excitation curves; observations generated at per-curve
    thicknesses THICKS from the solver itself at the TRUE parameters."""
    mat_user = np.array([[TRUE[k] for k in
                          ("n0", "p0", "mun", "mup", "B", "Sf", "Sb", "CN",
                           "CP", "taun", "taup", "lam")]])
    mat = mat_user * physics.UNIT_CONVERSIONS[:12]
    profiles = []
    for c, thick in enumerate(THICKS):
        sim = SimParams(length=thick, time=TIME, L=L, T=T, pl_stride=1,
                        tol_exp=7, max_iters=2000)
        xg = (np.arange(L) + 0.5) * sim.dx
        profiles.append((0.7 + 0.6 * c) * 1e18 / 1e7 ** 3 * np.exp(-xg / 100.0))

    obs_path = tmp_path / "obs.csv"
    exc_path = tmp_path / "exc.csv"
    with open(exc_path, "w") as f:
        for dn in profiles:
            f.write(",".join(f"{v / 1e-21:.8e}" for v in dn) + "\n")
    with open(obs_path, "w") as f:
        for dn, thick in zip(profiles, THICKS):
            sim = SimParams(length=thick, time=TIME, L=L, T=T, pl_stride=1,
                            tol_exp=7, max_iters=2000)
            res = pvsim(mat, sim, dn, init_mode="points")
            pl = np.asarray(res.pl)[0]
            for ti, pi in zip(sim.pl_times, pl):
                f.write(f"{ti},{pi / 1e-23:.10e},1e13\n")
        f.write("END,,\n")
    return str(obs_path), str(exc_path)


def _cfg(tmp_path, obs, exc, thickness, n_points=12):
    return InferenceConfig(
        grid=GridConfig(thickness=thickness, time=TIME, num_nodes=L,
                        num_steps=T, pl_stride=1, tol_exp=7, max_iters=2000),
        params=ParamSpace(
            min_x=[1e8, 1e14, 20.0, 20.0, 1e-11, 10.0, 10.0, 1e-29, 1e-29,
                   500.0, 800.0, 0.1, 0.0],
            max_x=[1e8, 1e16, 20.0, 20.0, 1e-9, 10.0, 10.0, 1e-29, 1e-29,
                   500.0, 800.0, 0.1, 0.0],
            do_log=[1, 1, 0, 0, 1, 1, 1, 1, 1, 0, 0, 1, 0]),
        ic_flags=IcFlags(time_cutoff=None),
        sim_flags=SimFlags(num_points=n_points, seed=42),
        device=DeviceConfig(chunk_per_device=4, n_devices=2),
        paths=Paths(init_file=exc, observation_files=[obs],
                    out_dirs=[str(tmp_path / "OUT")]),
        checkpoint=False)


@pytest.fixture(scope="module")
def twothick(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("twothick")
    obs, exc = _write_twothick(tmp_path)
    return tmp_path, obs, exc


def test_twothick_true_params_recovered(twothick):
    """At the generating parameters, BOTH curves' likelihoods are ~0 only
    when each curve is simulated at its own thickness."""
    tmp_path, obs, exc = twothick
    cfg = _cfg(tmp_path, obs, exc, thickness=list(THICKS))
    cfg.params.min_x = cfg.params.max_x = [
        TRUE["n0"], TRUE["p0"], TRUE["mun"], TRUE["mup"], TRUE["B"],
        TRUE["Sf"], TRUE["Sb"], TRUE["CN"], TRUE["CP"], TRUE["taun"],
        TRUE["taup"], TRUE["lam"], 0.0]
    cfg.sim_flags.num_points = 2
    P, X, _ = bayes(cfg)
    assert np.all(P > -1e-8), P


def test_twothick_wrong_thickness_scores_worse(twothick):
    """A uniform-thickness run on the same data must score the true
    parameters clearly worse — per-curve thickness is load-bearing."""
    tmp_path, obs, exc = twothick
    pinned = [TRUE["n0"], TRUE["p0"], TRUE["mun"], TRUE["mup"], TRUE["B"],
              TRUE["Sf"], TRUE["Sb"], TRUE["CN"], TRUE["CP"], TRUE["taun"],
              TRUE["taup"], TRUE["lam"], 0.0]
    cfg = _cfg(tmp_path, obs, exc, thickness=THICKS[0])   # wrong for curve 2
    cfg.params.min_x = cfg.params.max_x = pinned
    cfg.sim_flags.num_points = 2
    P_wrong, _, _ = bayes(cfg)
    assert np.all(P_wrong < -1.0), P_wrong


def test_twothick_posterior_peak_and_single_compile(twothick):
    """Full mixed-thickness inference: the sample nearest the truth scores
    best, and both thickness curves share ONE compiled chunk program."""
    from bayesian_inference_trpl_tpu.parallel import runner as runner_mod

    tmp_path, obs, exc = twothick
    cfg = _cfg(tmp_path, obs, exc, thickness=list(THICKS), n_points=16)
    # Compiled-program count = jit cache + the program-cache memo
    # (whichever layer dispatched; utils/program_cache.py).
    def _programs():
        return (runner_mod._chunk_likelihood._cache_size()
                + len(runner_mod._chunk_dispatch._memo))
    cache_before = _programs()
    P, X, _ = bayes(cfg)
    compiles = _programs() - cache_before
    assert compiles <= 1, f"expected one shared chunk program, got {compiles}"
    assert P.shape == (1, 16)
    assert np.isfinite(P).all()
    d_true = (np.log10(X[:, 1] / TRUE["p0"]) ** 2
              + np.log10(X[:, 4] / TRUE["B"]) ** 2)
    assert P[0, d_true.argmin()] >= np.sort(P[0])[-3]
