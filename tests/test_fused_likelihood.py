"""The in-scan fused likelihood must equal the unfused pipeline
(materialize PL -> clamp-log10 -> SSE with magnitude offset) exactly."""
import numpy as np
import jax.numpy as jnp

from bayesian_inference_trpl_tpu import physics
from bayesian_inference_trpl_tpu.models import FusedObs, SimParams, pl_log_scale, pvsim
from bayesian_inference_trpl_tpu.ops import likelihood as lk

from conftest import sample_mat_par


def _setup(rng, batch=3):
    mat = sample_mat_par(rng, batch)
    mat[:, 11] = 0.1 * physics.UNIT_CONVERSIONS[11]  # weak coupling: fast Newton
    sim = SimParams(length=311.0, time=1.0, L=128, T=40, pl_stride=1,
                    tol_exp=7, max_iters=2000)
    a = 1e18 / 1e7 ** 3
    xg = (np.arange(sim.L) + 0.5) * sim.dx
    init_dn = a * np.exp(-xg / 100.0)
    return mat, sim, init_dn


def test_fused_equals_unfused(rng):
    mat, sim, init_dn = _setup(rng)
    batch = len(mat)
    num_exp = 2
    obs = rng.uniform(-8, -2, (num_exp, sim.num_pl))
    mag = rng.uniform(-0.5, 0.5, batch)

    # Unfused: PL trace -> log10 -> SSE.
    res_pl = pvsim(mat, sim, init_dn, init_mode="points")
    pl_log = np.asarray(lk.fastlog(jnp.asarray(np.asarray(res_pl.pl))))
    expected = np.stack([
        np.asarray(lk.log_likelihood(jnp.asarray(pl_log), jnp.asarray(obs[e]),
                                     jnp.asarray(mag)))
        for e in range(num_exp)])

    # Fused: running sums in the scan + closed-form offset.
    fobs = FusedObs(values=jnp.asarray(obs), log_scale=jnp.asarray(pl_log_scale(sim)),
                    min_val=lk.FLOAT_MIN)
    res_f = pvsim(mat, sim, init_dn, init_mode="points", obs=fobs, record_pl=False)
    got = np.asarray(lk.log_likelihood_from_terms(
        res_f.sse, res_f.err_sum, sim.num_pl, jnp.asarray(mag)[None, :]))

    np.testing.assert_allclose(got, expected, rtol=1e-8, atol=1e-8)


def test_fused_self_normalize(rng):
    mat, sim, init_dn = _setup(rng, batch=2)
    obs = rng.uniform(-4, 0, (1, sim.num_pl))

    res_pl = pvsim(mat, sim, init_dn, init_mode="points")
    pl = np.asarray(res_pl.pl)
    pl_log = np.asarray(lk.fastlog(jnp.asarray(pl / pl[:, 0:1])))
    expected = -np.sum((pl_log - obs[0][None, :]) ** 2, axis=1)

    fobs = FusedObs(values=jnp.asarray(obs), log_scale=jnp.asarray(0.0),
                    min_val=lk.FLOAT_MIN, normalize=True)
    res_f = pvsim(mat, sim, init_dn, init_mode="points", obs=fobs, record_pl=False)
    got = np.asarray(lk.log_likelihood_from_terms(
        res_f.sse, res_f.err_sum, sim.num_pl, 0.0))[0]
    np.testing.assert_allclose(got, expected, rtol=1e-8, atol=1e-8)
