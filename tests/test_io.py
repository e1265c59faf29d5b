import os

import numpy as np
import pytest

from bayesian_inference_trpl_tpu.utils import io as bio

pytestmark = pytest.mark.smoke   # fast tier: pure numerics/io

REF_DATA = "/root/reference/Example Data"

IC_FLAGS = {"time_cutoff": 2000, "select_obs_sets": None, "noise_level": None}
SIM_FLAGS = {"log_pl": True, "self_normalize": False}


def _write_obs(tmp_path, curves, end=True):
    p = tmp_path / "obs.csv"
    with open(p, "w") as f:
        for t, pl, u in curves:
            for row in zip(t, pl, u):
                f.write(",".join(str(v) for v in row) + "\n")
        if end:
            f.write("END,,\n")
    return str(p)


def test_curve_splitting_and_log(tmp_path):
    c1 = ([0.0, 0.5, 1.0], [1e16, 5e15, 2e15], [1e14, 1e14, 1e14])
    c2 = ([0.0, 0.5], [2e16, 1e16], [2e14, 2e14])
    path = _write_obs(tmp_path, [c1, c2])
    data = bio.get_data([path], IC_FLAGS, SIM_FLAGS)
    t, pl, unc = data[0]
    assert len(t) == 2 and len(t[0]) == 3 and len(t[1]) == 2
    expected = np.log10(np.array(c1[1]) * 1e-23)
    np.testing.assert_allclose(pl[0], expected, rtol=1e-12)
    # sigma -> sigma / PL / 2.3 in log mode (bayes_io.py:75-76)
    expected_unc = (np.array(c1[2]) * 1e-23) / (np.array(c1[1]) * 1e-23) / 2.3
    np.testing.assert_allclose(unc[0], expected_unc, rtol=1e-12)


def test_time_cutoff(tmp_path):
    c = ([0.0, 1.0, 2.0, 3.0], [1e16] * 4, [1e14] * 4)
    path = _write_obs(tmp_path, [c])
    flags = dict(IC_FLAGS, time_cutoff=1.5)
    data = bio.get_data([path], flags, SIM_FLAGS)
    assert len(data[0][0][0]) == 2


def test_select_obs_sets(tmp_path):
    curves = [([0.0, 1.0], [1e16, 1e15], [1e14, 1e14]) for _ in range(3)]
    curves[2] = ([0.0, 1.0], [7e16, 7e15], [1e14, 1e14])
    path = _write_obs(tmp_path, curves)
    flags = dict(IC_FLAGS, select_obs_sets=[2])
    data = bio.get_data([path], flags, SIM_FLAGS)
    assert len(data[0][0]) == 1
    np.testing.assert_allclose(data[0][1][0], np.log10(np.array([7e16, 7e15]) * 1e-23))


def test_self_normalize(tmp_path):
    c = ([0.0, 1.0], [4e16, 1e16], [1e14, 1e14])
    path = _write_obs(tmp_path, [c])
    data = bio.get_data([path], IC_FLAGS, dict(SIM_FLAGS, self_normalize=True))
    np.testing.assert_allclose(data[0][1][0], np.log10([1.0, 0.25]), rtol=1e-12)


def test_noise_injection_deterministic(tmp_path):
    c = ([0.0, 1.0], [1e16, 1e15], [1e14, 1e14])
    path = _write_obs(tmp_path, [c])
    flags = dict(IC_FLAGS, noise_level=1e13)
    d1 = bio.get_data([path], flags, SIM_FLAGS, rng=np.random.default_rng(0))
    d2 = bio.get_data([path], flags, SIM_FLAGS, rng=np.random.default_rng(0))
    np.testing.assert_array_equal(d1[0][1][0], d2[0][1][0])
    d3 = bio.get_data([path], IC_FLAGS, SIM_FLAGS)
    assert not np.allclose(d1[0][1][0], d3[0][1][0])


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="example data absent")
def test_example_data_loads():
    obs = os.path.join(REF_DATA, "Highbacksurf_Power_scan_Observations.csv")
    exc = os.path.join(REF_DATA, "Power_scan_Excitations.csv")
    data = bio.get_data([obs], IC_FLAGS, SIM_FLAGS)
    ini = bio.get_initpoints(exc, IC_FLAGS)
    t, pl, unc = data[0]
    assert len(t) == len(ini)          # one excitation per observation curve
    assert ini.shape[1] == 128         # L = 2**7 nodes
    for curve_t in t:
        assert curve_t[0] == 0.0
        assert curve_t[-1] <= 2000.0
    # reference scaling: 1e-21 cm^-3 -> nm^-3
    assert 0 < ini.max() < 1.0


def test_initpoints(tmp_path):
    p = tmp_path / "exc.csv"
    with open(p, "w") as f:
        f.write(",".join(["1e15"] * 4) + "\n\n")
        f.write(",".join(["2e15"] * 4) + "\n")
    pts = bio.get_initpoints(str(p), IC_FLAGS)
    assert pts.shape == (2, 4)
    np.testing.assert_allclose(pts[0], 1e15 * 1e-21)


def test_export_roundtrip(tmp_path):
    out = str(tmp_path / "RUN1")
    P = np.arange(10.0)
    X = np.arange(130.0).reshape(10, 13)
    bio.export(out, P, X)
    assert os.path.exists(os.path.join(out, "RUN1_BAYRAN_P.npy"))
    P2, X2 = bio.load_bayran(out)
    np.testing.assert_array_equal(P, P2)
    np.testing.assert_array_equal(X, X2)
    # loading via member-file path (reference loader style, utils.py:22-28)
    P3, _ = bio.load_bayran(os.path.join(out, "RUN1_BAYRAN_P.npy"))
    np.testing.assert_array_equal(P, P3)
