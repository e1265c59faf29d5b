import numpy as np
import jax.numpy as jnp

from bayesian_inference_trpl_tpu.ops import likelihood as lk
import pytest

pytestmark = pytest.mark.smoke   # fast tier: pure numerics/io


def test_fastlog_matches_reference_semantics(rng):
    pl = rng.uniform(-1, 5, (4, 50))
    out = np.asarray(lk.fastlog(jnp.asarray(pl), 1e-10))
    expected = np.log10(np.where(pl < 1e-10, 1e-10, pl))
    np.testing.assert_allclose(out, expected, rtol=1e-12)


def test_log_likelihood_matches_direct_sse(rng):
    pl_log = rng.uniform(-10, 0, (6, 40))
    values = rng.uniform(-10, 0, 40)
    mag = rng.uniform(-1, 1, 6)
    got = np.asarray(lk.log_likelihood(jnp.asarray(pl_log), jnp.asarray(values),
                                       jnp.asarray(mag)))
    expected = -np.sum((pl_log + mag[:, None] - values[None, :]) ** 2, axis=1)
    np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-9)


def test_closed_form_offset_identity(rng):
    """sum((e+m)^2) == sse + 2 m esum + n m^2 exactly."""
    pl_log = rng.uniform(-10, 0, (3, 25))
    values = rng.uniform(-10, 0, 25)
    mag = rng.uniform(-2, 2, 3)
    sse, esum = lk.sse_terms(jnp.asarray(pl_log), jnp.asarray(values))
    got = np.asarray(lk.log_likelihood_from_terms(sse, esum, 25, jnp.asarray(mag)))
    expected = -np.sum((pl_log + mag[:, None] - values[None, :]) ** 2, axis=1)
    np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-9)


def test_lnp_reference_oracle(rng):
    """The numpy port of the reference CPU lnP (probs.py:5-18) behaves as
    the original: accumulation over a magnitude grid with cutoff."""
    plI = rng.uniform(-100, 0, (10, 30))
    values = rng.uniform(-100, 0, 30)
    mags = rng.uniform(-100, 100, 4)
    P = np.zeros((10, 4))
    lk.lnP_reference(P, plI, values, mags, 1e-50, 2.0)
    for m, mag in enumerate(mags):
        err = np.maximum(plI + mag, np.log10(1e-50)) - values
        expected = -np.sum(err ** 2, axis=1) / 2.0 - np.log(np.pi * 2.0) / 2 * 30
        np.testing.assert_allclose(P[:, m], expected, rtol=1e-10)


def test_interp_matches_numpy(rng):
    sim_times = np.linspace(0, 10, 101)
    pl = rng.uniform(-5, 0, (3, 101))
    obs_times = np.sort(rng.uniform(0, 10, 37))
    got = np.asarray(lk.interp_pl(jnp.asarray(sim_times), jnp.asarray(pl),
                                  jnp.asarray(obs_times)))
    for i in range(3):
        np.testing.assert_allclose(got[i], np.interp(obs_times, sim_times, pl[i]),
                                   rtol=1e-12)


def test_interp_out_of_range_nan():
    sim_times = np.linspace(0, 1, 11)
    pl = np.zeros((1, 11))
    got = np.asarray(lk.interp_pl(jnp.asarray(sim_times), jnp.asarray(pl),
                                  jnp.asarray([-0.5, 0.5, 1.5])))
    assert np.isnan(got[0, 0]) and np.isnan(got[0, 2]) and got[0, 1] == 0.0
