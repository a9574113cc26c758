"""H3-lite hierarchical cell index (quadtree over lon/lat).

The north rule requires an H3/S2-style cell index as the partition key for
the spatial shuffles (PIP join, kNN, tile grouping).  Real ``h3`` is not
installable here, so this is a deterministic quadtree with the same operator
surface (encode, parent, children, ring neighbours) — and, deliberately,
**SQL-expressible encoding** so the DuckDB oracle can compute identical cell
ids:

    res r in [0, 28]; grid is 2^r x 2^r over lon in [-180, 180], lat in [-90, 90]
    x = min(floor((lon + 180) / 360 * 2^r), 2^r - 1)
    y = min(floor((lat + 90) / 180 * 2^r), 2^r - 1)
    cell = (r << 58) | (x << 29) | y          (fits in a positive int64)

Divergence from real H3 (documented per SURVEY.md §7): square cells, no
icosahedron, no pentagon special-cases; ring neighbours wrap in longitude and
clamp in latitude.  All functions are vectorized over numpy arrays.

Reference analog: the reference partitions by driver-side dict on item_id
(builder.py:765-778); the cell index replaces that with a distributed,
spatially-meaningful partition key.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

RES_SHIFT = 58
XY_BITS = 29
XY_MASK = (1 << XY_BITS) - 1
MAX_RES = 28


def _as_i64(v) -> np.ndarray:
    return np.asarray(v, dtype=np.int64)


def cell_encode(lon, lat, res: int) -> np.ndarray:
    """Vectorized (lon, lat) -> int64 cell id at resolution ``res``."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    n = np.int64(1) << res
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = np.minimum(np.floor((lon + 180.0) / 360.0 * n).astype(np.int64), n - 1)
    y = np.minimum(np.floor((lat + 90.0) / 180.0 * n).astype(np.int64), n - 1)
    x = np.maximum(x, 0)
    y = np.maximum(y, 0)
    return (np.int64(res) << RES_SHIFT) | (x << XY_BITS) | y


def cell_encode_sql(lon_expr: str, lat_expr: str, res: int) -> str:
    """The exact encoding as an ANSI-SQL (DuckDB) expression — used by the
    driver oracle so Ray and SQL compute byte-identical cell ids."""
    n = 1 << res
    x = (
        f"GREATEST(0, LEAST(CAST(floor((({lon_expr}) + 180.0) / 360.0 * {n}) AS BIGINT), {n - 1}))"
    )
    y = (
        f"GREATEST(0, LEAST(CAST(floor((({lat_expr}) + 90.0) / 180.0 * {n}) AS BIGINT), {n - 1}))"
    )
    return f"((CAST({res} AS BIGINT) << {RES_SHIFT}) | ({x} << {XY_BITS}) | {y})"


def cell_res(cell) -> np.ndarray:
    return _as_i64(cell) >> RES_SHIFT


def cell_decode(cell) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id -> (res, x, y) arrays."""
    c = _as_i64(cell)
    res = c >> RES_SHIFT
    x = (c >> XY_BITS) & XY_MASK
    y = c & XY_MASK
    return res, x, y


def cell_parent(cell, parent_res: int | None = None) -> np.ndarray:
    """Ancestor cell at ``parent_res`` (default: res-1)."""
    res, x, y = cell_decode(cell)
    if parent_res is None:
        pres = res - 1
    else:
        pres = np.full_like(res, parent_res)
    if np.any(pres < 0) or np.any(pres > res):
        raise ValueError("parent_res must be in [0, res]")
    shift = res - pres
    return (pres << RES_SHIFT) | ((x >> shift) << XY_BITS) | (y >> shift)


def cell_children(cell: int) -> np.ndarray:
    """The 4 direct children of one scalar cell."""
    res, x, y = cell_decode(cell)
    res, x, y = int(res), int(x), int(y)
    if res >= MAX_RES:
        raise ValueError("cell already at max resolution")
    r = res + 1
    kids = []
    for dx in (0, 1):
        for dy in (0, 1):
            kids.append((np.int64(r) << RES_SHIFT) | (np.int64(2 * x + dx) << XY_BITS) | np.int64(2 * y + dy))
    return np.array(kids, dtype=np.int64)


def cell_ring(cell: int, k: int = 1) -> np.ndarray:
    """All cells within Chebyshev distance ``k`` of one scalar cell
    (including itself) — the candidate-generation primitive for kNN (J5).
    Longitude wraps; latitude clamps at the poles."""
    res, x, y = cell_decode(cell)
    res, x, y = int(res), int(x), int(y)
    n = 1 << res
    out = set()
    for dx in range(-k, k + 1):
        for dy in range(-k, k + 1):
            nx = (x + dx) % n
            ny = y + dy
            if ny < 0 or ny >= n:
                continue
            out.add((np.int64(res) << RES_SHIFT) | (np.int64(nx) << XY_BITS) | np.int64(ny))
    return np.array(sorted(out), dtype=np.int64)


def cell_to_bbox(cell) -> np.ndarray:
    """cell id(s) -> (N, 4) array of [west, south, east, north] in degrees."""
    res, x, y = cell_decode(cell)
    n = (np.int64(1) << res).astype(np.float64)
    w = x / n * 360.0 - 180.0
    s = y / n * 180.0 - 90.0
    out = np.stack(
        [w, s, w + 360.0 / n, s + 180.0 / n],
        axis=-1,
    )
    return out


def cells_covering_bbox(west: float, south: float, east: float, north: float, res: int) -> np.ndarray:
    """All cells at ``res`` whose area intersects the bbox — the raster->
    vector tile-assignment primitive (J6; reference analog: tile_id parsing,
    terracatalog.py:644-649,773-791)."""
    n = 1 << res
    x0 = max(0, min(int(np.floor((west + 180.0) / 360.0 * n)), n - 1))
    x1 = max(0, min(int(np.floor((east + 180.0) / 360.0 * n)), n - 1))
    y0 = max(0, min(int(np.floor((south + 90.0) / 180.0 * n)), n - 1))
    y1 = max(0, min(int(np.floor((north + 90.0) / 180.0 * n)), n - 1))
    xs = np.arange(x0, x1 + 1, dtype=np.int64)
    ys = np.arange(y0, y1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return (np.int64(res) << RES_SHIFT) | (gx.ravel() << XY_BITS) | gy.ravel()
