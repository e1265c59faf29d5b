"""tools/nonconverged: corner signature of NaN-likelihood samples."""
import numpy as np

from bayesian_inference_trpl_tpu.config import ParamSpace
from bayesian_inference_trpl_tpu.tools.nonconverged import (
    axis_positions, characterize)


def _samples(n, rng):
    ps = ParamSpace()
    lo = np.asarray(ps.min_x)
    hi = np.asarray(ps.max_x)
    do_log = np.asarray(ps.do_log, bool)
    u = rng.uniform(size=(n, 13))
    with np.errstate(divide="ignore"):
        la = np.log10(np.where(lo > 0, lo, 1.0))
        ha = np.log10(np.where(hi > 0, hi, 1.0))
    X = np.where(do_log, 10 ** (la + u * (ha - la)), lo + u * (hi - lo))
    return X, u, ps


def test_axis_positions_roundtrip(rng):
    X, u, ps = _samples(512, rng)
    got = axis_positions(X, ps.min_x, ps.max_x, ps.do_log)
    free = np.asarray(ps.max_x) != np.asarray(ps.min_x)
    np.testing.assert_allclose(got[:, free], u[:, free], atol=1e-9)
    # pinned parameters (n0, lambda here have min == max? n0 yes) -> 0.5
    pinned = ~free
    if pinned.any():
        assert (got[:, pinned] == 0.5).all()


def test_characterize_finds_planted_corner(rng):
    X, u, ps = _samples(4096, rng)
    # Plant a failure corner: samples with Sf (idx 5) in its top decade AND
    # tau_n (idx 9) in its bottom fifth fail.
    bad = (u[:, 5] > 0.75) & (u[:, 9] < 0.2)
    assert bad.sum() > 30
    P = np.zeros((3, len(X)))
    P[:, bad] = np.nan
    rep = characterize(X, P, ps.min_x, ps.max_x, ps.do_log, z_threshold=5.0)
    assert rep["num_nonconverged"] == int(bad.sum())
    assert "Sf:top" in rep["signature"]
    assert "tau_n:bottom" in rep["signature"]
    # Uninvolved parameters stay out of the signature.
    assert not any(s.startswith(("B:", "Sb:", "p0:")) for s in rep["signature"])
    # Enrichment telemetry points at the right deciles.
    assert rep["params"]["Sf"]["top_decile_enrichment"] > 2.0
    assert rep["params"]["tau_n"]["bottom_decile_enrichment"] > 2.0


def test_characterize_clean_run(rng):
    X, _, ps = _samples(256, rng)
    rep = characterize(X, np.zeros((2, len(X))), ps.min_x, ps.max_x,
                       ps.do_log)
    assert rep["num_nonconverged"] == 0
    assert rep["signature"] == []
