"""Vectorized ELLIPSOIDAL CRS transforms (no pyproj).

Same API shape as the reference's ``stacbuilder/projections.py:21-104``
(``project_polygon`` / ``reproject_bounding_box`` / cached ``get_transform``)
but vectorized over numpy coordinate arrays.  Round 3 replaced the round-1/2
spherical formulas with the standard ellipsoidal ones (public formulas:
Krüger flattening series for transverse Mercator as in Karney 2011 /
Snyder 1987; EPSG guidance-note-7-2 methods 9820 LAEA and 9802 LCC-2SP),
matching pyproj to well under the reference's own tolerance
(tests/test_projections.py:12-97: 1e-4 deg / 10 m):

- EPSG:4326            — identity (lon/lat degrees)
- EPSG:326xx / 327xx   — WGS84 UTM north/south zones, ellipsoidal
                          transverse Mercator (Krüger series, err << 1 mm)
- EPSG:3043            — ETRS89 / UTM zone 31N (GRS80; identical zone
                          params, easting/northing semantics like the
                          reference's always-xy usage)
- EPSG:3035            — ETRS89-extended / LAEA Europe, ellipsoidal
                          Lambert azimuthal equal-area (EPSG method 9820)
                          center (52N, 10E), FE/FN 4321000 / 3210000
- EPSG:3812            — ETRS89 / Belgian Lambert 2008, Lambert conic
                          conformal 2SP (EPSG method 9802)
- EPSG:28992           — Amersfoort / RD New, oblique (double)
                          stereographic on Bessel 1841 (EPSG method 9809)
                          + 7-parameter position-vector Helmert to WGS84

All forward transforms have exact (or fast-converging series) inverses so
bbox/geometry round-trips are stable to ~1e-9 deg, which is what the
engine's derivation-closure tests require.

Transformer functions are plain module-level callables built once per
process — inside a Ray actor this is the per-worker ``lru_cache`` state the
reference keeps (projections.py:80-104, SURVEY.md T1).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable, Tuple

import numpy as np

# kept for backward compatibility (spherical-LAEA grid constant used by the
# round-1/2 kernels; no transform below uses it)
R = 6371007.181

Transform = Callable[[np.ndarray, np.ndarray], Tuple[np.ndarray, np.ndarray]]


# --- ellipsoids -------------------------------------------------------------


class _Ellipsoid:
    def __init__(self, a: float, inv_f: float):
        self.a = a
        self.f = 1.0 / inv_f
        self.e2 = self.f * (2.0 - self.f)
        self.e = np.sqrt(self.e2)
        n = self.f / (2.0 - self.f)
        self.n = n
        # rectifying radius (Krüger): A = a/(1+n) (1 + n^2/4 + n^4/64 + ...)
        self.A = self.a / (1.0 + n) * (1.0 + n**2 / 4.0 + n**4 / 64.0)
        # Krüger forward/inverse series coefficients to n^4 (truncation
        # error ~n^5 ≈ 1e-14 rad for Earth flattening — below float noise)
        self.alpha = (
            n / 2.0 - 2.0 * n**2 / 3.0 + 5.0 * n**3 / 16.0 + 41.0 * n**4 / 180.0,
            13.0 * n**2 / 48.0 - 3.0 * n**3 / 5.0 + 557.0 * n**4 / 1440.0,
            61.0 * n**3 / 240.0 - 103.0 * n**4 / 140.0,
            49561.0 * n**4 / 161280.0,
        )
        self.beta = (
            n / 2.0 - 2.0 * n**2 / 3.0 + 37.0 * n**3 / 96.0 - n**4 / 360.0,
            n**2 / 48.0 + n**3 / 15.0 - 437.0 * n**4 / 1440.0,
            17.0 * n**3 / 480.0 - 37.0 * n**4 / 840.0,
            4397.0 * n**4 / 161280.0,
        )
        e2 = self.e2
        # conformal -> geodetic latitude series (Snyder eq. 3-5)
        self.chi_series = (
            e2 / 2.0 + 5.0 * e2**2 / 24.0 + e2**3 / 12.0 + 13.0 * e2**4 / 360.0,
            7.0 * e2**2 / 48.0 + 29.0 * e2**3 / 240.0 + 811.0 * e2**4 / 11520.0,
            7.0 * e2**3 / 120.0 + 81.0 * e2**4 / 1120.0,
            4279.0 * e2**4 / 161280.0,
        )
        # authalic -> geodetic latitude series (Snyder eq. 3-18)
        self.auth_series = (
            e2 / 3.0 + 31.0 * e2**2 / 180.0 + 517.0 * e2**3 / 5040.0,
            23.0 * e2**2 / 360.0 + 251.0 * e2**3 / 3780.0,
            761.0 * e2**3 / 45360.0,
        )

    def q(self, phi: np.ndarray) -> np.ndarray:
        """Authalic q function (Snyder eq. 3-12)."""
        e, e2 = self.e, self.e2
        s = np.sin(phi)
        return (1.0 - e2) * (s / (1.0 - e2 * s * s) - np.log((1.0 - e * s) / (1.0 + e * s)) / (2.0 * e))


_WGS84 = _Ellipsoid(6378137.0, 298.257223563)
_GRS80 = _Ellipsoid(6378137.0, 298.257222101)


def supported_epsg(epsg: int) -> bool:
    if epsg in (4326, 3035, 3043, 3812, 28992):
        return True
    return 32601 <= epsg <= 32660 or 32701 <= epsg <= 32760


# --- ellipsoidal transverse Mercator (UTM zones; Krüger series) -------------

_UTM_K0 = 0.9996
_UTM_FE = 500000.0


def _utm_params(epsg: int) -> Tuple[float, float, _Ellipsoid]:
    """-> (central meridian lon0 in radians, false northing, ellipsoid)."""
    if 32601 <= epsg <= 32660:
        zone, fn, ell = epsg - 32600, 0.0, _WGS84
    elif 32701 <= epsg <= 32760:
        zone, fn, ell = epsg - 32700, 10000000.0, _WGS84
    elif epsg == 3043:  # ETRS89 / UTM zone 31N
        zone, fn, ell = 31, 0.0, _GRS80
    else:
        raise ValueError(f"not a UTM EPSG: {epsg}")
    lon0 = np.deg2rad(-183.0 + 6.0 * zone)
    return lon0, fn, ell


def _utm_fwd(epsg: int) -> Transform:
    lon0, fn, ell = _utm_params(epsg)
    e, A, alpha = ell.e, ell.A, ell.alpha

    def fwd(lon, lat):
        lam = np.deg2rad(np.asarray(lon, dtype=np.float64)) - lon0
        phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
        s = np.clip(np.sin(phi), -1.0 + 1e-15, 1.0 - 1e-15)
        # conformal latitude, exact: t = sinh(atanh(sin φ) − e atanh(e sin φ))
        t = np.sinh(np.arctanh(s) - e * np.arctanh(e * s))
        xi = np.arctan2(t, np.cos(lam))
        eta = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
        x = eta.copy()
        y = xi.copy()
        for j, a_j in enumerate(alpha, start=1):
            x += a_j * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
            y += a_j * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        return _UTM_FE + _UTM_K0 * A * x, fn + _UTM_K0 * A * y

    return fwd


def _utm_inv(epsg: int) -> Transform:
    lon0, fn, ell = _utm_params(epsg)
    e, A, beta, chi_s = ell.e, ell.A, ell.beta, ell.chi_series

    def inv(x, y):
        eta = (np.asarray(x, dtype=np.float64) - _UTM_FE) / (_UTM_K0 * A)
        xi = (np.asarray(y, dtype=np.float64) - fn) / (_UTM_K0 * A)
        xi_p = xi.copy()
        eta_p = eta.copy()
        for j, b_j in enumerate(beta, start=1):
            xi_p -= b_j * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            eta_p -= b_j * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        chi = np.arcsin(np.clip(np.sin(xi_p) / np.cosh(eta_p), -1.0, 1.0))
        phi = chi.copy()
        for j, c_j in enumerate(chi_s, start=1):
            phi += c_j * np.sin(2 * j * chi)
        lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        return np.rad2deg(lam + lon0), np.rad2deg(phi)

    return inv


# --- ellipsoidal Lambert azimuthal equal-area (EPSG:3035, method 9820) ------

_LAEA_LON0 = np.deg2rad(10.0)
_LAEA_LAT0 = np.deg2rad(52.0)
_LAEA_FE = 4321000.0
_LAEA_FN = 3210000.0


@lru_cache(maxsize=1)
def _laea_consts():
    ell = _GRS80
    qP = float(ell.q(np.asarray(np.pi / 2.0)))
    q0 = float(ell.q(np.asarray(_LAEA_LAT0)))
    beta0 = np.arcsin(q0 / qP)
    Rq = ell.a * np.sqrt(qP / 2.0)
    m0 = np.cos(_LAEA_LAT0) / np.sqrt(1.0 - ell.e2 * np.sin(_LAEA_LAT0) ** 2)
    D = ell.a * m0 / (Rq * np.cos(beta0))
    return ell, qP, beta0, Rq, D


def _laea_fwd(lon, lat):
    ell, qP, beta0, Rq, D = _laea_consts()
    lam = np.deg2rad(np.asarray(lon, dtype=np.float64)) - _LAEA_LON0
    phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
    beta = np.arcsin(np.clip(ell.q(phi) / qP, -1.0, 1.0))
    sb0, cb0 = np.sin(beta0), np.cos(beta0)
    denom = 1.0 + sb0 * np.sin(beta) + cb0 * np.cos(beta) * np.cos(lam)
    B = Rq * np.sqrt(2.0 / np.maximum(denom, 1e-12))
    x = _LAEA_FE + B * D * np.cos(beta) * np.sin(lam)
    y = _LAEA_FN + (B / D) * (cb0 * np.sin(beta) - sb0 * np.cos(beta) * np.cos(lam))
    return x, y


def _laea_inv(x, y):
    ell, qP, beta0, Rq, D = _laea_consts()
    xn = (np.asarray(x, dtype=np.float64) - _LAEA_FE) / D
    yn = (np.asarray(y, dtype=np.float64) - _LAEA_FN) * D
    rho = np.sqrt(xn * xn + yn * yn)
    C = 2.0 * np.arcsin(np.clip(rho / (2.0 * Rq), -1.0, 1.0))
    sb0, cb0 = np.sin(beta0), np.cos(beta0)
    with np.errstate(invalid="ignore", divide="ignore"):
        beta = np.where(
            rho < 1e-9,
            beta0,
            np.arcsin(np.clip(np.cos(C) * sb0 + yn * np.sin(C) * cb0 / np.maximum(rho, 1e-12), -1.0, 1.0)),
        )
        lam = np.where(
            rho < 1e-9,
            0.0,
            np.arctan2(xn * np.sin(C), rho * cb0 * np.cos(C) - yn * sb0 * np.sin(C)),
        )
    phi = beta.copy()
    for j, c_j in enumerate(ell.auth_series, start=1):
        phi += c_j * np.sin(2 * j * beta)
    return np.rad2deg(lam + _LAEA_LON0), np.rad2deg(phi)


# --- oblique stereographic + datum shift (EPSG:28992, method 9809) ----------
#
# Amersfoort / RD New: double (conformal-sphere) stereographic on Bessel
# 1841, then the published 7-parameter position-vector Helmert to
# WGS84/ETRS89 (the towgs84 set PROJ registers for Amersfoort).  Public
# formulas: EPSG guidance note 7-2 method 9809, Bowring XYZ->geodetic.

_BESSEL = _Ellipsoid(6377397.155, 299.1528128)
_RD_PHI0 = np.deg2rad(52.0 + 9.0 / 60.0 + 22.178 / 3600.0)
_RD_LAM0 = np.deg2rad(5.0 + 23.0 / 60.0 + 15.5 / 3600.0)
_RD_K0 = 0.9999079
_RD_FE, _RD_FN = 155000.0, 463000.0
# Amersfoort -> WGS84 position-vector parameters (tx ty tz m; rx ry rz arc-sec; ds ppm)
_AMERSFOORT_HELMERT = (565.417, 50.3319, 465.552, -0.398957, 0.343988, -1.8774, 4.0725)


@lru_cache(maxsize=1)
def _rd_consts():
    ell = _BESSEL
    e, e2 = ell.e, ell.e2
    s0, c0 = np.sin(_RD_PHI0), np.cos(_RD_PHI0)
    rho0 = ell.a * (1.0 - e2) / (1.0 - e2 * s0 * s0) ** 1.5
    nu0 = ell.a / np.sqrt(1.0 - e2 * s0 * s0)
    Rc = np.sqrt(rho0 * nu0)  # conformal sphere radius
    n = np.sqrt(1.0 + e2 * c0**4 / (1.0 - e2))
    S1 = (1.0 + s0) / (1.0 - s0)
    S2 = (1.0 - e * s0) / (1.0 + e * s0)
    w1 = (S1 * S2**e) ** n
    sin_chi0 = (w1 - 1.0) / (w1 + 1.0)
    c = (n + s0) * (1.0 - sin_chi0) / ((n - s0) * (1.0 + sin_chi0))
    w2 = c * w1
    chi0 = np.arcsin((w2 - 1.0) / (w2 + 1.0))
    return ell, Rc, n, c, chi0


def _rd_fwd_bessel(lon, lat):
    """(Bessel geodetic lon/lat deg) -> RD easting/northing."""
    ell, Rc, n, c, chi0 = _rd_consts()
    e = ell.e
    lam = np.deg2rad(np.asarray(lon, dtype=np.float64))
    phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
    s = np.sin(phi)
    Sa = (1.0 + s) / (1.0 - s)
    Sb = (1.0 - e * s) / (1.0 + e * s)
    w = c * (Sa * Sb**e) ** n
    chi = np.arcsin((w - 1.0) / (w + 1.0))
    L = n * (lam - _RD_LAM0)
    B = 1.0 + np.sin(chi) * np.sin(chi0) + np.cos(chi) * np.cos(chi0) * np.cos(L)
    x = _RD_FE + 2.0 * Rc * _RD_K0 * np.cos(chi) * np.sin(L) / B
    y = _RD_FN + 2.0 * Rc * _RD_K0 * (np.sin(chi) * np.cos(chi0) - np.cos(chi) * np.sin(chi0) * np.cos(L)) / B
    return x, y


def _rd_inv_bessel(x, y):
    """RD easting/northing -> (Bessel geodetic lon/lat deg)."""
    ell, Rc, n, c, chi0 = _rd_consts()
    e = ell.e
    dx = np.asarray(x, dtype=np.float64) - _RD_FE
    dy = np.asarray(y, dtype=np.float64) - _RD_FN
    g = 2.0 * Rc * _RD_K0 * np.tan(np.pi / 4.0 - chi0 / 2.0)
    h = 4.0 * Rc * _RD_K0 * np.tan(chi0) + g
    i = np.arctan2(dx, h + dy)
    j = np.arctan2(dx, g - dy) - i
    chi = chi0 + 2.0 * np.arctan((dy - dx * np.tan(j / 2.0)) / (2.0 * Rc * _RD_K0))
    L = j + 2.0 * i
    lam = L / n + _RD_LAM0
    # geodetic latitude from conformal: isometric-latitude iteration (9809)
    sin_chi = np.sin(chi)
    psi = 0.5 * np.log((1.0 + sin_chi) / (c * (1.0 - sin_chi))) / n
    phi = 2.0 * np.arctan(np.exp(psi)) - np.pi / 2.0
    for _ in range(6):
        s = np.sin(phi)
        psi_i = np.log(np.tan(phi / 2.0 + np.pi / 4.0) * ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0))
        phi = phi - (psi_i - psi) * np.cos(phi) * (1.0 - ell.e2 * s * s) / (1.0 - ell.e2)
    return np.rad2deg(lam), np.rad2deg(phi)


def _geodetic_to_xyz(ell, lon_deg, lat_deg):
    lam = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    phi = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    s, cph = np.sin(phi), np.cos(phi)
    nu = ell.a / np.sqrt(1.0 - ell.e2 * s * s)
    return nu * cph * np.cos(lam), nu * cph * np.sin(lam), nu * (1.0 - ell.e2) * s


def _xyz_to_geodetic(ell, X, Y, Z):
    b = ell.a * (1.0 - ell.f)
    ep2 = (ell.a**2 - b**2) / b**2
    p = np.sqrt(X * X + Y * Y)
    theta = np.arctan2(Z * ell.a, p * b)
    phi = np.arctan2(Z + ep2 * b * np.sin(theta) ** 3, p - ell.e2 * ell.a * np.cos(theta) ** 3)
    lam = np.arctan2(Y, X)
    return np.rad2deg(lam), np.rad2deg(phi)


def _helmert_pv(X, Y, Z, params, inverse=False):
    """7-parameter position-vector transform (EPSG 9606)."""
    tx, ty, tz, rx_s, ry_s, rz_s, ds_ppm = params
    rx, ry, rz = (np.deg2rad(v / 3600.0) for v in (rx_s, ry_s, rz_s))
    m = 1.0 + ds_ppm * 1e-6
    if not inverse:
        Xp = tx + m * (X - rz * Y + ry * Z)
        Yp = ty + m * (rz * X + Y - rx * Z)
        Zp = tz + m * (-ry * X + rx * Y + Z)
        return Xp, Yp, Zp
    X, Y, Z = (X - tx) / m, (Y - ty) / m, (Z - tz) / m  # exact small-angle inverse = transpose rotation
    return X + rz * Y - ry * Z, -rz * X + Y + rx * Z, ry * X - rx * Y + Z


def _rd_inv(x, y):
    """RD New -> WGS84 lon/lat (projection inverse + datum shift)."""
    lon_b, lat_b = _rd_inv_bessel(x, y)
    X, Y, Z = _geodetic_to_xyz(_BESSEL, lon_b, lat_b)
    X, Y, Z = _helmert_pv(X, Y, Z, _AMERSFOORT_HELMERT)
    return _xyz_to_geodetic(_WGS84, X, Y, Z)


def _rd_fwd(lon, lat):
    """WGS84 lon/lat -> RD New (datum shift + projection forward)."""
    X, Y, Z = _geodetic_to_xyz(_WGS84, lon, lat)
    X, Y, Z = _helmert_pv(X, Y, Z, _AMERSFOORT_HELMERT, inverse=True)
    lon_b, lat_b = _xyz_to_geodetic(_BESSEL, X, Y, Z)
    return _rd_fwd_bessel(lon_b, lat_b)


# --- Lambert conic conformal 2SP (EPSG:3812, method 9802) -------------------

_LCC_PARAMS = {
    # Belgian Lambert 2008 (ETRS89): false-origin lat/lon, SP1, SP2, FE, FN
    3812: (
        50.0 + 47.0 / 60.0 + 52.134 / 3600.0,
        4.0 + 21.0 / 60.0 + 33.177 / 3600.0,
        49.0 + 50.0 / 60.0,
        51.0 + 10.0 / 60.0,
        649328.0,
        665262.0,
    ),
}


def _lcc_m(ell, phi):
    return np.cos(phi) / np.sqrt(1.0 - ell.e2 * np.sin(phi) ** 2)


def _lcc_t(ell, phi):
    e = ell.e
    s = np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)


@lru_cache(maxsize=8)
def _lcc_consts(epsg: int):
    lat_f, lon_f, sp1, sp2, fe, fn = _LCC_PARAMS[epsg]
    ell = _GRS80
    phi_f, lam_f = np.deg2rad(lat_f), np.deg2rad(lon_f)
    p1, p2 = np.deg2rad(sp1), np.deg2rad(sp2)
    m1, m2 = _lcc_m(ell, p1), _lcc_m(ell, p2)
    t1, t2, tf = _lcc_t(ell, p1), _lcc_t(ell, p2), _lcc_t(ell, phi_f)
    n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
    F = m1 / (n * t1**n)
    rho_f = ell.a * F * tf**n
    return ell, lam_f, n, F, rho_f, fe, fn


def _lcc_fwd(epsg: int) -> Transform:
    ell, lam_f, n, F, rho_f, fe, fn = _lcc_consts(epsg)

    def fwd(lon, lat):
        lam = np.deg2rad(np.asarray(lon, dtype=np.float64))
        phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
        rho = ell.a * F * _lcc_t(ell, phi) ** n
        theta = n * (lam - lam_f)
        return fe + rho * np.sin(theta), fn + rho_f - rho * np.cos(theta)

    return fwd


def _lcc_inv(epsg: int) -> Transform:
    ell, lam_f, n, F, rho_f, fe, fn = _lcc_consts(epsg)
    e = ell.e

    def inv(x, y):
        dx = np.asarray(x, dtype=np.float64) - fe
        dy = rho_f - (np.asarray(y, dtype=np.float64) - fn)
        rho = np.sign(n) * np.sqrt(dx * dx + dy * dy)
        t = (rho / (ell.a * F)) ** (1.0 / n)
        theta = np.arctan2(dx, dy)
        lam = theta / n + lam_f
        phi = np.pi / 2.0 - 2.0 * np.arctan(t)
        for _ in range(6):  # converges to <1e-14 rad in ~4 iterations
            s = np.sin(phi)
            phi = np.pi / 2.0 - 2.0 * np.arctan(t * ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0))
        return np.rad2deg(lam), np.rad2deg(phi)

    return inv


# --- public API -------------------------------------------------------------


@lru_cache(maxsize=64)
def get_transform(from_epsg: int, to_epsg: int) -> Transform:
    """Cached (from, to) -> vectorized transform, mirroring the reference's
    ``@lru_cache``d ``get_transform`` (projections.py:80-104).  Composition is
    always through lon/lat — from_crs -> 4326 -> to_crs (WGS84 and ETRS89
    lon/lat are treated as identical, exactly like pyproj's zero-op datum
    path for these CRSs)."""
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
    if epsg == 28992:
        return _rd_inv
    if epsg in _LCC_PARAMS:
        return _lcc_inv(epsg)
    if supported_epsg(epsg):
        return _utm_inv(epsg)
    raise ValueError(f"Unsupported EPSG code: {epsg}")


def _from_lonlat(epsg: int) -> Transform:
    if epsg == 4326:
        return lambda x, y: (np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64))
    if epsg == 3035:
        return _laea_fwd
    if epsg == 28992:
        return _rd_fwd
    if epsg in _LCC_PARAMS:
        return _lcc_fwd(epsg)
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
