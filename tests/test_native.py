"""Native C++ library: builds, matches numpy bit-for-bit where promised,
and the Python fallbacks stay equivalent."""
import os

import numpy as np
import pytest

from bayesian_inference_trpl_tpu import native

HAVE_NATIVE = native.load() is not None
REF_OBS = "/root/reference/Example Data/Highbacksurf_Power_scan_Observations.csv"


@pytest.mark.skipif(not HAVE_NATIVE, reason="native lib unavailable")
def test_hist1d_matches_numpy(rng):
    x = rng.uniform(0, 10, 50000)
    w = rng.uniform(size=50000)
    hw, hc = native.hist1d_weighted(x, w, 0.0, 10.0, 48)
    ref, _ = np.histogram(x, bins=48, range=(0, 10), weights=w)
    refc, _ = np.histogram(x, bins=48, range=(0, 10))
    np.testing.assert_allclose(hw, ref, rtol=1e-12, atol=1e-10)
    np.testing.assert_array_equal(hc, refc)


@pytest.mark.skipif(not HAVE_NATIVE, reason="native lib unavailable")
def test_hist2d_matches_numpy(rng):
    x = rng.uniform(0, 1, 30000)
    y = rng.normal(size=30000)
    w = rng.uniform(size=30000)
    h = native.hist2d_weighted(x, y, w, 0, 1, 24, -4, 4, 24)
    ref, _, _ = np.histogram2d(x, y, bins=[24, 24], range=[[0, 1], [-4, 4]],
                               weights=w)
    np.testing.assert_allclose(h, ref, rtol=1e-12, atol=1e-10)


@pytest.mark.skipif(not HAVE_NATIVE, reason="native lib unavailable")
def test_weighted_moments(rng):
    x = rng.normal(size=10000)
    w = rng.uniform(size=10000)
    m = native.weighted_moments(x, w)
    expected = [w.sum(), (w * x).sum(), (w * x ** 2).sum(),
                (w * x ** 3).sum(), (w * x ** 4).sum()]
    np.testing.assert_allclose(m, expected, rtol=1e-10)


@pytest.mark.skipif(not HAVE_NATIVE, reason="native lib unavailable")
def test_csv_parse_matches_python(tmp_path):
    p = tmp_path / "obs.csv"
    rows = [(0.0, 1e16, 1e14), (0.5, 5.5e15, 1e14), (0.0, 2e16, 2e14),
            (0.25, 1.25e16, 2e14)]
    with open(p, "w") as f:
        for r in rows:
            f.write(",".join(f"{v:.10e}" for v in r) + "\n")
        f.write("END,,\n")
        f.write("9,9,9\n")  # after sentinel: ignored
    t, pl, unc = native.parse_obs_csv(str(p))
    assert len(t) == 4
    np.testing.assert_allclose(t, [r[0] for r in rows])
    np.testing.assert_allclose(pl, [r[1] for r in rows])
    np.testing.assert_allclose(unc, [r[2] for r in rows])


@pytest.mark.skipif(not (HAVE_NATIVE and os.path.exists(REF_OBS)),
                    reason="native lib or example data unavailable")
def test_native_get_data_matches_python_path():
    from bayesian_inference_trpl_tpu.utils import io as bio
    flags = {"time_cutoff": 2000, "select_obs_sets": None, "noise_level": None}
    sflags = {"log_pl": True, "self_normalize": False}
    d_nat = bio.get_data([REF_OBS], flags, sflags, use_native=True)
    d_py = bio.get_data([REF_OBS], flags, sflags, use_native=False)
    assert len(d_nat[0][0]) == len(d_py[0][0])
    for a, b in zip(d_nat[0][1], d_py[0][1]):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(d_nat[0][2], d_py[0][2]):
        np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not HAVE_NATIVE, reason="native lib unavailable")
def test_stats_marginals_native_vs_numpy(rng):
    from bayesian_inference_trpl_tpu.posterior import stats
    x = rng.uniform(14, 16, 20000)
    w = np.abs(rng.normal(size=20000))
    w /= w.sum()
    h_nat, bins = stats.marginalize_1d(w, (14, 16), 32, x)
    ref, _ = np.histogram(x, bins=bins, weights=w, density=True)
    np.testing.assert_allclose(h_nat, ref, rtol=1e-9, atol=1e-12)
