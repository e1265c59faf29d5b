"""Weighted posterior statistics.

Headless port of the reference's post-processing math
(reference: Visualization/utils.py:157-284): underflow-safe normalization
of log-likelihoods, weighted moments, covariance, credible intervals,
marginal histograms with nonuniform-sampling correction, and the
max-uncertainty temperature-factor search.
"""
from __future__ import annotations

import numpy as np
from scipy.optimize import fmin


def normalize(lnP):
    """exp-normalize log-likelihoods without mass underflow
    (reference: Visualization/utils.py:157-166): shift so the max is at a
    large-but-safe exponent, then normalize by the sum."""
    lnP = np.asarray(lnP, dtype=float)
    out = np.exp(lnP - np.nanmax(lnP) + 1000 * np.log(2) - np.log(lnP.size))
    return out / np.nansum(out)


def w_mean(val, wts):
    return np.average(val, weights=wts)


def w_variance(val, wts):
    return np.average((val - w_mean(val, wts)) ** 2, weights=wts)


def w_skew(val, wts):
    return np.average((val - w_mean(val, wts)) ** 3, weights=wts) / w_variance(val, wts) ** 1.5


def w_kurtosis(val, wts):
    return np.average((val - w_mean(val, wts)) ** 4, weights=wts) / w_variance(val, wts) ** 2


def w_sample_var(val, wts, ws):
    """sqrt(sum(w^2) * weighted variance) (reference: utils.py:168-170)."""
    return np.sqrt(ws * w_variance(val, wts))


def covariance(X, Y, weights):
    ax = np.average(X, weights=weights)
    ay = np.average(Y, weights=weights)
    return np.average((X - ax) * (Y - ay), weights=weights)


def covariance_matrix(columns, weights):
    """Symmetric covariance over a dict/list of parameter columns."""
    cols = list(columns)
    n = len(cols)
    cov = np.zeros((n, n))
    for i in range(n):
        for j in range(i, n):
            cov[i, j] = cov[j, i] = covariance(cols[i], cols[j], weights)
    return cov


def credible_interval(X, P, lo: float = 0.025, hi: float = 0.975):
    """Equal-tail credible interval from normalized weights
    (reference: utils.py:185-197)."""
    order = np.argsort(X)
    X_s, P_s = X[order], P[order]
    s = np.cumsum(P_s)
    below = np.where(s < lo)[0]
    above = np.where(s > hi)[0]
    i_lo = below[-1] if len(below) else 0
    i_hi = above[0] if len(above) else len(X_s) - 1
    return X_s[i_lo], X_s[i_hi]


def _tf_driver(tf, xi, P):
    Pt = normalize(P / np.exp(tf))
    ws = np.sum(Pt ** 2)
    return -w_sample_var(xi, Pt, ws)


def find_best_tf(xi, P, u0):
    """Max-uncertainty search over the likelihood temperature factor
    (reference: utils.py:172-183).  Starts the simplex at the caller's
    ``u0`` exactly like the reference (where u0 is the GUI-typed value)."""
    opt = fmin(_tf_driver, np.log(u0), args=(xi, P), full_output=True, disp=False)
    return np.exp(opt[0][0]), -opt[1]


def find_best_tf_bracketed(xi, P):
    """Robust max-uncertainty temperature: bracket on a log grid spanning
    the likelihood spread, then polish with the reference's fmin.

    The raw fmin stalls when started in the degenerate region (weights a
    delta -> sample uncertainty identically 0 -> Nelder-Mead sees a flat
    objective and terminates at the start; measured on the r3 Power_scan
    artifacts, where the per-point heuristic start 1.5e-3 is ~7 orders
    below the responsive range for LL spreads of ~1e5)."""
    P = np.asarray(P, dtype=float)
    spread = float(np.nanmax(P) - np.nanmedian(P))
    if not np.isfinite(spread) or spread <= 0:
        return 1.0, 0.0
    taus = spread * np.logspace(-6.0, 1.0, 36)
    vals = [-_tf_driver(np.log(t), xi, P) for t in taus]
    t0 = taus[int(np.argmax(vals))]
    return find_best_tf(xi, P, t0)


def _native():
    try:
        from .. import native
        return native if native.load() is not None else None
    except Exception:  # pragma: no cover
        return None


def marginalize_1d(P, bounds, bin_count, X, density_correct: bool = False):
    """Weighted 1-D histogram marginal (reference: utils.py:239-262).

    density_correct divides by the raw sampling histogram to undo a
    nonuniform sampling density (used for secondary/derived parameters).
    Uses the OpenMP native histogram when available (numpy-identical).
    """
    lo, hi = bounds
    bins = lo + (hi - lo) * np.arange(bin_count + 1) / bin_count
    nat = _native()
    if nat is not None and hi > lo:
        w_sum, counts = nat.hist1d_weighted(X, P, lo, hi, bin_count)
        width = (hi - lo) / bin_count
        total = w_sum.sum()
        marP = w_sum / (total * width) if total != 0 else w_sum
        marH = counts
    else:
        marP, bins = np.histogram(X, weights=P, bins=bins, density=True)
        marH = None
    if density_correct:
        if marH is None:
            marH, _ = np.histogram(X, bins=bins)
        corr = np.zeros_like(marP)
        nz = marH != 0
        corr[nz] = marP[nz] / marH[nz]
        area = np.sum(np.diff(bins) * corr)
        if area != 0:
            corr = corr / area
        marP = corr
    return marP, bins


def marginalize_2d(P, bounds_x, bounds_y, bin_count, X, Y):
    """Weighted 2-D histogram marginal (reference: utils.py:264-284)."""
    bx = bounds_x[0] + (bounds_x[1] - bounds_x[0]) * np.arange(bin_count + 1) / bin_count
    by = bounds_y[0] + (bounds_y[1] - bounds_y[0]) * np.arange(bin_count + 1) / bin_count
    nat = _native()
    if (nat is not None and bounds_x[1] > bounds_x[0]
            and bounds_y[1] > bounds_y[0]):
        h = nat.hist2d_weighted(X, Y, P, bounds_x[0], bounds_x[1], bin_count,
                                bounds_y[0], bounds_y[1], bin_count)
        # numpy density normalization: w / (total_w * dx * dy)
        total = h.sum()
        if total != 0:
            dx = (bounds_x[1] - bounds_x[0]) / bin_count
            dy = (bounds_y[1] - bounds_y[0]) / bin_count
            h = h / (total * dx * dy)
    else:
        h, _, _ = np.histogram2d(X, Y, bins=[bx, by], weights=P, density=True)
    Yg, Xg = np.meshgrid(bx, by)
    return h, Xg, Yg
