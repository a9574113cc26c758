"""Vectorized CRS transforms (no pyproj).

Same API shape as the reference's ``stacbuilder/projections.py:21-104``
(``project_polygon`` / ``reproject_bounding_box`` / cached ``get_transform``)
but vectorized over numpy coordinate arrays and limited to the CRS families
the engine and its tests actually use:

- EPSG:4326            — identity (lon/lat degrees)
- EPSG:326xx / 327xx   — UTM north/south zones, **spherical** transverse
                          Mercator (public formulas; documented divergence
                          from pyproj's ellipsoidal UTM is <~0.3% in position,
                          irrelevant for self-consistency tests)
- EPSG:3035            — Lambert azimuthal equal-area (spherical form),
                          center (52N, 10E), false easting/northing
                          4321000 / 3210000 (the public ETRS89-LAEA params)

All forward transforms have exact inverses so bbox/geometry round-trips are
bit-stable to float precision, which is what the engine's derivation-closure
tests require (reference analog: tests/test_projections.py:12-97).

Transformer functions are plain module-level callables built once per
process — inside a Ray actor this is the per-worker ``lru_cache`` state the
reference keeps (projections.py:80-104, SURVEY.md T1).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable, Tuple

import numpy as np

R = 6371007.181  # authalic sphere radius (m), as used by spherical LAEA grids

Transform = Callable[[np.ndarray, np.ndarray], Tuple[np.ndarray, np.ndarray]]


def supported_epsg(epsg: int) -> bool:
    if epsg == 4326 or epsg == 3035:
        return True
    return 32601 <= epsg <= 32660 or 32701 <= epsg <= 32760


# --- spherical transverse Mercator (UTM zones) ------------------------------

_UTM_K0 = 0.9996
_UTM_FE = 500000.0


def _utm_params(epsg: int) -> Tuple[float, float]:
    """-> (central meridian lon0 in radians, false northing)."""
    if 32601 <= epsg <= 32660:
        zone, fn = epsg - 32600, 0.0
    elif 32701 <= epsg <= 32760:
        zone, fn = epsg - 32700, 10000000.0
    else:
        raise ValueError(f"not a UTM EPSG: {epsg}")
    lon0 = np.deg2rad(-183.0 + 6.0 * zone)
    return lon0, fn


def _utm_fwd(epsg: int) -> Transform:
    lon0, fn = _utm_params(epsg)

    def fwd(lon, lat):
        lam = np.deg2rad(np.asarray(lon, dtype=np.float64)) - lon0
        phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
        b = np.cos(phi) * np.sin(lam)
        b = np.clip(b, -0.999999999, 0.999999999)
        x = _UTM_FE + _UTM_K0 * R * 0.5 * np.log((1 + b) / (1 - b))
        y = fn + _UTM_K0 * R * (np.arctan2(np.tan(phi), np.cos(lam)))
        return x, y

    return fwd


def _utm_inv(epsg: int) -> Transform:
    lon0, fn = _utm_params(epsg)

    def inv(x, y):
        xn = (np.asarray(x, dtype=np.float64) - _UTM_FE) / (_UTM_K0 * R)
        yn = (np.asarray(y, dtype=np.float64) - fn) / (_UTM_K0 * R)
        d = np.cosh(xn)
        phi = np.arcsin(np.clip(np.sin(yn) / d, -1.0, 1.0))
        lam = np.arctan2(np.sinh(xn), np.cos(yn))
        return np.rad2deg(lam + lon0), np.rad2deg(phi)

    return inv


# --- spherical Lambert azimuthal equal-area (EPSG:3035-style) ---------------

_LAEA_LON0 = np.deg2rad(10.0)
_LAEA_LAT0 = np.deg2rad(52.0)
_LAEA_FE = 4321000.0
_LAEA_FN = 3210000.0


def _laea_fwd(lon, lat):
    lam = np.deg2rad(np.asarray(lon, dtype=np.float64)) - _LAEA_LON0
    phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
    s0, c0 = np.sin(_LAEA_LAT0), np.cos(_LAEA_LAT0)
    denom = 1.0 + s0 * np.sin(phi) + c0 * np.cos(phi) * np.cos(lam)
    denom = np.maximum(denom, 1e-12)
    k = np.sqrt(2.0 / denom)
    x = _LAEA_FE + R * k * np.cos(phi) * np.sin(lam)
    y = _LAEA_FN + R * k * (c0 * np.sin(phi) - s0 * np.cos(phi) * np.cos(lam))
    return x, y


def _laea_inv(x, y):
    xn = (np.asarray(x, dtype=np.float64) - _LAEA_FE) / R
    yn = (np.asarray(y, dtype=np.float64) - _LAEA_FN) / R
    rho = np.sqrt(xn * xn + yn * yn)
    c = 2.0 * np.arcsin(np.clip(rho / 2.0, -1.0, 1.0))
    s0, c0 = np.sin(_LAEA_LAT0), np.cos(_LAEA_LAT0)
    with np.errstate(invalid="ignore", divide="ignore"):
        phi = np.where(
            rho < 1e-12,
            _LAEA_LAT0,
            np.arcsin(np.clip(np.cos(c) * s0 + yn * np.sin(c) * c0 / np.maximum(rho, 1e-12), -1.0, 1.0)),
        )
        lam = np.where(
            rho < 1e-12,
            0.0,
            np.arctan2(xn * np.sin(c), rho * c0 * np.cos(c) - yn * s0 * np.sin(c)),
        )
    return np.rad2deg(lam + _LAEA_LON0), np.rad2deg(phi)


# --- public API -------------------------------------------------------------


@lru_cache(maxsize=64)
def get_transform(from_epsg: int, to_epsg: int) -> Transform:
    """Cached (from, to) -> vectorized transform, mirroring the reference's
    ``@lru_cache``d ``get_transform`` (projections.py:80-104).  Composition is
    always through lon/lat (the sphere) — from_crs -> 4326 -> to_crs."""
    from_epsg, to_epsg = int(from_epsg), int(to_epsg)
    if from_epsg == to_epsg:
        return lambda x, y: (np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64))
    to_ll = _to_lonlat(from_epsg)
    from_ll = _from_lonlat(to_epsg)

    def chain(x, y):
        lon, lat = to_ll(x, y)
        return from_ll(lon, lat)

    return chain


def _to_lonlat(epsg: int) -> Transform:
    if epsg == 4326:
        return lambda x, y: (np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64))
    if epsg == 3035:
        return _laea_inv
    if supported_epsg(epsg):
        return _utm_inv(epsg)
    raise ValueError(f"Unsupported EPSG code: {epsg}")


def _from_lonlat(epsg: int) -> Transform:
    if epsg == 4326:
        return lambda x, y: (np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64))
    if epsg == 3035:
        return _laea_fwd
    if supported_epsg(epsg):
        return _utm_fwd(epsg)
    raise ValueError(f"Unsupported EPSG code: {epsg}")


def project_points(x, y, from_epsg: int, to_epsg: int) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized point reprojection (analog of projections.py:21-45's
    per-vertex ``project_polygon``, but over whole coordinate arrays)."""
    return get_transform(from_epsg, to_epsg)(x, y)


def project_ring(ring, from_epsg: int, to_epsg: int):
    """Reproject a polygon ring vertex-by-vertex, like ``project_polygon``
    (projections.py:21-45): returns a new list of (x, y) tuples."""
    xs = np.array([p[0] for p in ring], dtype=np.float64)
    ys = np.array([p[1] for p in ring], dtype=np.float64)
    tx, ty = project_points(xs, ys, from_epsg, to_epsg)
    return list(zip(tx.tolist(), ty.tolist()))


def reproject_bbox(west, south, east, north, from_epsg: int, to_epsg: int, densify: int = 21):
    """bbox -> densified boundary ring -> reproject -> new bounds
    (w, s, e, n).  The reference reprojects the 5-vertex box polygon and takes
    ``.bounds`` (projections.py:48-77); we densify each edge so curved
    projected edges don't clip the envelope.  Vectorized over ``densify * 4``
    boundary points; broadcasting over row-arrays of bboxes is done by the
    callers batch-wise."""
    t = np.linspace(0.0, 1.0, densify)
    xs = np.concatenate(
        [
            west + (east - west) * t,  # south edge
            np.full(densify, east),  # east edge
            east + (west - east) * t,  # north edge
            np.full(densify, west),  # west edge
        ]
    )
    ys = np.concatenate(
        [
            np.full(densify, south),
            south + (north - south) * t,
            np.full(densify, north),
            north + (south - north) * t,
        ]
    )
    tx, ty = project_points(xs, ys, from_epsg, to_epsg)
    return float(tx.min()), float(ty.min()), float(tx.max()), float(ty.max())


def reproject_bboxes(bounds: np.ndarray, from_epsg: int, to_epsg: int, densify: int = 5) -> np.ndarray:
    """Batch bbox reprojection: (N, 4) [w,s,e,n] -> (N, 4), fully vectorized
    (one transform call over N * densify * 4 points) — the hot path used by
    the geometry-closure stage (SURVEY.md M8)."""
    b = np.asarray(bounds, dtype=np.float64)
    if b.ndim != 2 or b.shape[1] != 4:
        raise ValueError("bounds must be (N, 4) [w,s,e,n]")
    w, s, e, n = b[:, 0:1], b[:, 1:2], b[:, 2:3], b[:, 3:4]
    t = np.linspace(0.0, 1.0, densify)[None, :]
    xs = np.concatenate([w + (e - w) * t, np.repeat(e, densify, 1), e + (w - e) * t, np.repeat(w, densify, 1)], axis=1)
    ys = np.concatenate([np.repeat(s, densify, 1), s + (n - s) * t, np.repeat(n, densify, 1), n + (s - n) * t], axis=1)
    tx, ty = project_points(xs.ravel(), ys.ravel(), from_epsg, to_epsg)
    tx = tx.reshape(xs.shape)
    ty = ty.reshape(ys.shape)
    return np.stack([tx.min(1), ty.min(1), tx.max(1), ty.max(1)], axis=1)
