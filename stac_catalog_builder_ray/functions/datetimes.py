"""Datetime normalization + period semantics, vectorized.

Reference: ``check_datetime``/``convert_date_to_datetime``
(metadata.py:554-590) normalize str/date/datetime to tz-aware UTC;
``DefaultInputPathParser`` computes period end-datetimes with
``calendar.monthrange`` for monthly periods (pathparsers.py:251-265).

Engine representation: numpy ``datetime64[us]`` arrays, UTC by convention
(Arrow/DuckDB-naive, per the Ray guide) — the catalog JSON writer adds the
trailing ``Z``.
"""

from __future__ import annotations

import numpy as np

PERIODS = ("yearly", "monthly", "daily", "secondly")


def ymd_to_datetime64(year: np.ndarray, month: np.ndarray, day: np.ndarray) -> np.ndarray:
    """Vectorized (year, month, day) int arrays -> datetime64[us] (UTC)."""
    y = np.asarray(year, dtype=np.int64)
    m = np.asarray(month, dtype=np.int64)
    d = np.asarray(day, dtype=np.int64)
    months = ((y - 1970) * 12 + (m - 1)).astype("M8[M]")
    return (months.astype("M8[D]") + (d - 1).astype("m8[D]")).astype("M8[us]")


def normalize_timestamps(values) -> np.ndarray:
    """str/date/datetime array -> datetime64[us]; assumes UTC like
    ``check_datetime`` (metadata.py:561-565)."""
    return np.asarray(values, dtype="M8[us]")


_END_OF_DAY = np.timedelta64(1, "D").astype("m8[s]") - np.timedelta64(1, "s")


def period_end(start: np.ndarray, period: str) -> np.ndarray:
    """Vectorized period end-datetime (pathparsers.py:251-265 semantics):

    - yearly:   Dec 31 23:59:59 of start's year
    - monthly:  last day of start's month 23:59:59 (calendar.monthrange)
    - daily:    start's day 23:59:59
    - secondly: start + 1 s
    """
    s = np.asarray(start, dtype="M8[us]")
    if period == "yearly":
        year_start = s.astype("M8[Y]")
        next_year = (year_start + np.timedelta64(1, "Y")).astype("M8[s]")
        return (next_year - np.timedelta64(1, "s")).astype("M8[us]")
    if period == "monthly":
        month_start = s.astype("M8[M]")
        next_month = (month_start + np.timedelta64(1, "M")).astype("M8[s]")
        return (next_month - np.timedelta64(1, "s")).astype("M8[us]")
    if period == "daily":
        day_start = s.astype("M8[D]")
        return (day_start.astype("M8[s]") + _END_OF_DAY).astype("M8[us]")
    if period == "secondly":
        return s + np.timedelta64(1, "s").astype("m8[us]")
    raise ValueError(f"period must be one of {PERIODS}, got {period!r}")


def iso_z(ts) -> str:
    """datetime64 -> '2000-01-01T00:00:00Z' (catalog JSON serialization)."""
    s = np.datetime_as_string(np.asarray(ts, dtype="M8[s]"), unit="s")
    if isinstance(s, np.ndarray):
        return np.char.add(s, "Z")
    return str(s) + "Z"
