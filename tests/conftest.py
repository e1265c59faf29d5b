"""Test configuration: CPU backend with 8 virtual devices (multi-chip
sharding tests) and float64 enabled (parity vs the scipy oracle).

NOTE: the session's sitecustomize imports jax and pins the TPU platform
before conftest runs, so env vars alone don't switch backends — the
``jax.config.update`` calls below are the authoritative override.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Kernel-parity tests exercise the fused-horizon Pallas kernel under the
# Mosaic interpreter on CPU; production dispatch only does that when asked
# (off-TPU it falls back to the compiled scan — see solver._horizon_kernel_ok).
os.environ["TRPL_HORIZON_INTERPRET"] = "1"
# The serialized-program cache (ON by default) would export + re-compile
# every chunk program a test traces — pure overhead at test shapes.  The
# dedicated tests (test_program_cache.py) re-enable it via monkeypatch.
os.environ["TRPL_PROGRAM_CACHE"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from bayesian_inference_trpl_tpu import physics  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_memory_between_modules():
    """Drop compiled programs between test modules.

    A full-suite run accumulates every module's jitted programs in one
    process (~10 GB RSS by the 115th test on this host), after which an
    ordinary XLA:CPU compile (test_twophase's T=240 scan — fine in
    isolation: <2 min, <4 GB) degenerates into a ~30-minute allocation
    storm ending in a compiler segfault.  Reproduced twice at the same
    test before this fixture; modules don't share programs, so the only
    cost is a handful of intra-module recompiles."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def sample_mat_par(rng, batch=4):
    """Random physically-plausible parameter sets in (V, nm, ns) units.

    Ranges follow the reference's sampling bounds (parallel_bayes_gpu.py:91-92)
    after unit conversion.
    """
    minx = np.array([1e8, 1e14, 1.0, 1.0, 1e-11, 1e0, 1e0, 1e-30, 1e-30, 20.0, 20.0, 1e-1])
    maxx = np.array([1e8, 1e16, 50.0, 50.0, 1e-9, 1e2, 1e2, 1e-28, 1e-28, 1000.0, 2000.0, 1e1])
    do_log = np.array([0, 1, 0, 0, 1, 1, 1, 1, 1, 0, 0, 1], dtype=bool)
    u = rng.uniform(size=(batch, 12))
    lo, hi = np.log10(minx), np.log10(maxx)
    x = np.where(do_log, 10 ** (lo + u * (hi - lo)), minx + u * (maxx - minx))
    return x * physics.UNIT_CONVERSIONS[:12]
