"""Resolution-based rounding rule (SURVEY.md M17).

Reference: mapper.py:130-144 — the number of decimals kept for bounds and
transform values is derived from the raster resolution:

    precision = abs(int(log10(abs(res_x * 0.001))))   # default 6

e.g. res 1.0 deg -> 0.001 -> precision 3; res 0.00625 -> 6.25e-6 -> 5.
"""

from __future__ import annotations

import numpy as np


def resolution_precision(res_x) -> np.ndarray:
    """Vectorized decimals-to-keep from x-resolution; 6 where res is 0/nan
    (the reference's non-numeric fallback, mapper.py:135-136)."""
    r = np.abs(np.asarray(res_x, dtype=np.float64) * 0.001)
    with np.errstate(divide="ignore", invalid="ignore"):
        p = np.abs(np.log10(r).astype(np.int64))
    bad = ~np.isfinite(np.log10(r, where=r > 0, out=np.full(r.shape or (1,), np.nan)))
    p = np.where(bad | (r <= 0), 6, p)
    return p


def round_half_away(values, decimals: int = 0):
    """Round half away from zero — matching SQL ROUND (DuckDB), unlike
    numpy/python banker's rounding.  Used by every query whose oracle does
    ``ROUND(x, d)`` so 0.03125 -> 0.0313 on both sides."""
    v = np.asarray(values, dtype=np.float64)
    scale = 10.0**decimals
    return np.sign(v) * np.floor(np.abs(v) * scale + 0.5) / scale


def round_to_precision(values: np.ndarray, precision: np.ndarray) -> np.ndarray:
    """Row-wise round-half-even to per-row decimal counts, vectorized:
    multiply by 10^p, round, divide.  Matches Python ``round(v, p)`` (both
    are banker's rounding on the scaled value, up to float representation)."""
    v = np.asarray(values, dtype=np.float64)
    p = np.asarray(precision, dtype=np.int64)
    scale = np.power(10.0, p)
    if v.ndim > p.ndim:
        scale = scale.reshape(scale.shape + (1,) * (v.ndim - p.ndim))
    return np.round(v * scale) / scale
