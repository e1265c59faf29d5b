import numpy as np
import pytest

from bayesian_inference_trpl_tpu.posterior import PosteriorData, stats
from bayesian_inference_trpl_tpu.posterior.vizconfig import (
    VizConfig, load_vizconfig, save_vizconfig)

pytestmark = pytest.mark.smoke   # fast tier: pure numerics/io


def make_data(rng, n=2000):
    X = np.zeros((n, 13))
    X[:, 0] = 1e8
    X[:, 1] = 10 ** rng.uniform(14, 16, n)        # p0
    X[:, 2] = rng.uniform(10, 30, n)              # mu_n
    X[:, 3] = rng.uniform(10, 30, n)              # mu_p
    X[:, 4] = 10 ** rng.uniform(-11, -9, n)       # B
    X[:, 5] = 10 ** rng.uniform(-1, 2, n)         # Sf
    X[:, 6] = 10 ** rng.uniform(-1, 2, n)         # Sb
    X[:, 7] = X[:, 8] = 1e-29
    X[:, 9] = rng.uniform(100, 1000, n)           # tau_n
    X[:, 10] = rng.uniform(100, 2000, n)
    X[:, 11] = 0.1
    # likelihood peaked at p0 = 1e15
    LL = -((np.log10(X[:, 1]) - 15.0) ** 2) * 50.0
    LL[::97] = np.nan                              # some failed samples
    return LL, X


def test_nan_filter_and_load(rng):
    LL, X = make_data(rng)
    d = PosteriorData.from_arrays(LL, X)
    assert len(d.LL) == np.sum(~np.isnan(LL))
    assert set(["p0", "B", "tau_n"]).issubset(d.X)


def test_normalize_safe():
    lnp = np.array([-1e6, -1e6 + 3.0, -2e6])
    P = stats.normalize(lnp)
    assert np.isfinite(P).all()
    np.testing.assert_allclose(P.sum(), 1.0, rtol=1e-12)
    assert P[1] > P[0] > P[2]


def test_posterior_recovers_peak(rng):
    LL, X = make_data(rng, 5000)
    d = PosteriorData.from_arrays(LL, X, num_observations=100)
    d.compute_secondary()
    d.normalize()
    s = d.stats_summary()
    mean_log_p0 = stats.w_mean(np.log10(d.X["p0"]), d.P)
    assert abs(mean_log_p0 - 15.0) < 0.1
    lo, hi = d.credible_intervals()["p0"]
    assert lo < 1e15 < hi


def test_secondary_params(rng):
    LL, X = make_data(rng, 500)
    d = PosteriorData.from_arrays(LL, X).compute_secondary()
    assert "tau_eff" in d.X and "mu_eff" in d.X
    # mu_eff is the harmonic-ish mean: between min and max of mu_n, mu_p
    assert np.all(d.X["mu_eff"] <= np.maximum(d.X["mu_n"], d.X["mu_p"]) + 1e-9)
    assert np.all(d.X["tau_eff"] > 0)
    np.testing.assert_allclose(d.X["Sf+Sb"], d.X["Sf"] + d.X["Sb"])
    np.testing.assert_allclose(d.X["epsilon"], 1.0 / d.X["lambda"])


def test_marginals(rng):
    LL, X = make_data(rng, 3000)
    d = PosteriorData.from_arrays(LL, X).normalize()
    h, edges = d.marginal_1d("p0", bounds=(14, 16), bins=32, log=True)
    assert h.shape == (32,)
    peak_bin = np.argmax(h)
    assert 12 <= peak_bin <= 20          # peaked near log10 p0 = 15
    h2, Xg, Yg = d.marginal_2d("p0", "B", bounds_x=(14, 16), bounds_y=(-11, -9),
                               bins=16, log_x=True, log_y=True)
    assert h2.shape == (16, 16)


def test_covariance_and_weighted_stats(rng):
    x = rng.normal(size=4000)
    y = 2 * x + rng.normal(size=4000) * 0.1
    w = np.ones(4000) / 4000
    cov = stats.covariance(x, y, w)
    assert abs(cov - 2.0) < 0.2
    assert abs(stats.w_skew(x, w)) < 0.2
    assert abs(stats.w_kurtosis(x, w) - 3.0) < 0.5


def test_find_best_tf(rng):
    LL, X = make_data(rng, 800)
    d = PosteriorData.from_arrays(LL, X, num_observations=10)
    tf, q = stats.find_best_tf(np.log10(d.X["p0"]), d.LL, 10 / 2000.0)
    assert tf > 0 and np.isfinite(q)


def test_vizconfig_reference_format_roundtrip(tmp_path):
    ref = "/root/reference/Visualization/config.txt"
    import os
    if os.path.exists(ref):
        cfg = load_vizconfig(ref)
        assert cfg.thickness == 311.0
        assert cfg.num_observations == 360
        assert cfg.do_log["p0"] is True and cfg.do_log["mu_n"] is False
        assert cfg.ranges["p0"] == (1e14, 1e16)
        assert cfg.enabled["p0"] and not cfg.enabled["n0"]
        assert cfg.marks["tau_n"] == 511.0
        assert cfg.marks["n0"] is None
    else:
        cfg = VizConfig(do_log={"p0": True}, ranges={"p0": (1e14, 1e16)},
                        enabled={"p0": True}, marks={"p0": 1e15},
                        thickness=311.0, num_observations=360)
    out = tmp_path / "config.txt"
    save_vizconfig(cfg, str(out))
    cfg2 = load_vizconfig(str(out))
    assert cfg2.do_log == cfg.do_log
    assert cfg2.ranges == cfg.ranges
    assert cfg2.enabled == cfg.enabled
    assert cfg2.marks == cfg.marks
    assert cfg2.thickness == cfg.thickness


def test_plotting_smoke(rng, tmp_path):
    from bayesian_inference_trpl_tpu.posterior.plotting import (
        corner_plot, covariance_heatmap)
    LL, X = make_data(rng, 600)
    d = PosteriorData.from_arrays(LL, X).compute_secondary().normalize()
    f = corner_plot(d, ["p0", "B", "tau_n"], do_log={"p0": True, "B": True},
                    marks={"p0": 1e15}, bins=16,
                    out_file=str(tmp_path / "corner.png"))
    assert (tmp_path / "corner.png").exists()
    covariance_heatmap(d, ["p0", "B"], out_file=str(tmp_path / "cov.png"))
    assert (tmp_path / "cov.png").exists()
