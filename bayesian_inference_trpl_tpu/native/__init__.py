"""ctypes bindings for the native host-side library (CSV ingest, parallel
weighted histograms, fused weighted moments).

The library is optional: ``load()`` builds it on first use if a toolchain
is available and falls back to None otherwise — every caller has a numpy
fallback, so the framework is fully functional without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libtrpl_native.so")
_lib = None
_tried = False


def build() -> bool:
    """Compile the native library in place.  Returns success."""
    try:
        subprocess.run(["make", "-C", _HERE], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load(auto_build: bool = True):
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried and not os.path.exists(_LIB_PATH):
        return None
    _tried = True
    if not os.path.exists(_LIB_PATH) and auto_build:
        if not build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    c_dp = ctypes.POINTER(ctypes.c_double)
    c_ip = ctypes.POINTER(ctypes.c_int64)
    lib.trpl_count_rows.restype = ctypes.c_long
    lib.trpl_count_rows.argtypes = [ctypes.c_char_p]
    lib.trpl_parse_obs_csv.restype = ctypes.c_long
    lib.trpl_parse_obs_csv.argtypes = [ctypes.c_char_p, c_dp, c_dp, c_dp]
    lib.trpl_hist1d_weighted.restype = None
    lib.trpl_hist1d_weighted.argtypes = [c_dp, c_dp, ctypes.c_int64,
                                         ctypes.c_double, ctypes.c_double,
                                         ctypes.c_int64, c_dp, c_ip]
    lib.trpl_hist2d_weighted.restype = None
    lib.trpl_hist2d_weighted.argtypes = [c_dp, c_dp, c_dp, ctypes.c_int64,
                                         ctypes.c_double, ctypes.c_double,
                                         ctypes.c_int64, ctypes.c_double,
                                         ctypes.c_double, ctypes.c_int64, c_dp]
    lib.trpl_weighted_moments.restype = None
    lib.trpl_weighted_moments.argtypes = [c_dp, c_dp, ctypes.c_int64, c_dp]
    _lib = lib
    return _lib


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def parse_obs_csv(path: str):
    """Fast parse of a 3-column observation CSV (up to the END sentinel).
    Returns (t, pl, unc) float64 arrays, or None if native lib unavailable."""
    lib = load()
    if lib is None:
        return None
    rows = lib.trpl_count_rows(path.encode())
    if rows < 0:
        raise FileNotFoundError(path)
    t = np.empty(rows)
    pl = np.empty(rows)
    unc = np.empty(rows)
    n = lib.trpl_parse_obs_csv(path.encode(), _dp(t), _dp(pl), _dp(unc))
    if n < 0:
        raise ValueError(f"failed to parse {path} (code {n})")
    return t[:n].copy(), pl[:n].copy(), unc[:n].copy()


def hist1d_weighted(x, w, lo: float, hi: float, bins: int):
    """Weighted + raw-count histograms; None if native lib unavailable."""
    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float64)
    w = np.ascontiguousarray(w, dtype=np.float64)
    out_w = np.zeros(bins)
    out_c = np.zeros(bins, dtype=np.int64)
    lib.trpl_hist1d_weighted(_dp(x), _dp(w), len(x), float(lo), float(hi),
                             bins, _dp(out_w),
                             out_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out_w, out_c


def hist2d_weighted(x, y, w, lox, hix, bx, loy, hiy, by):
    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    w = np.ascontiguousarray(w, dtype=np.float64)
    out = np.zeros((bx, by))
    lib.trpl_hist2d_weighted(_dp(x), _dp(y), _dp(w), len(x), float(lox),
                             float(hix), bx, float(loy), float(hiy), by,
                             _dp(out))
    return out


def weighted_moments(x, w):
    """Returns (sum w, sum wx, sum wx^2, sum wx^3, sum wx^4) in one pass."""
    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float64)
    w = np.ascontiguousarray(w, dtype=np.float64)
    out = np.zeros(5)
    lib.trpl_weighted_moments(_dp(x), _dp(w), len(x), _dp(out))
    return out
