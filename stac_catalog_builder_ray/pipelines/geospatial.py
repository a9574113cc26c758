"""Geospatial operator suite with SQL-expressible oracles.

The driver's DuckDB oracle can only see the testdata tables, so these
queries derive deterministic points from ``events`` by pure arithmetic
(identical in SQL) and run the engine's spatial operators on them:

    lon = (event_id % 3600) / 10.0 - 180.0 + 0.05
    lat = ((event_id * 7) % 1800) / 10.0 - 90.0 + 0.05

The cell encoding is the engine's SQL-expressible quadtree (geo/cell.py);
PIP uses inclusive rectangle AOIs (matching SQL BETWEEN); kNN uses Euclidean
distance on degrees with (dist, id) tie-break; tile assignment explodes a
±(0.8, 0.6)-degree footprint.  The same operator implementations back the
flagship catalog pipeline — these entries exist so the driver can
hash-verify them against SQL.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min

from ..geo.cell import cell_encode, cell_encode_sql
from ..stages.spatial import assign_tiles, knn_join, pip_join

CELL_RES = 6
KNN_K = 3
KNN_QUERY_MOD = 97
FOOT_DLON = 0.8
FOOT_DLAT = 0.6

# the 3 fixed AOI rectangles (inclusive bounds), mirrored literally in SQL
AOIS = [
    {"aoi_id": "aoi_world", "west": -180.0, "south": -90.0, "east": 180.0, "north": 90.0},
    {"aoi_id": "aoi_mid", "west": -30.0, "south": -20.0, "east": 30.0, "north": 20.0},
    {"aoi_id": "aoi_ne", "west": 100.0, "south": 40.0, "east": 170.0, "north": 85.0},
]


def lonlat_sql(event_col: str = "event_id"):
    lon = f"(({event_col} % 3600) / 10.0 - 180.0 + 0.05)"
    lat = f"((({event_col} * 7) % 1800) / 10.0 - 90.0 + 0.05)"
    return lon, lat


def events_points(sf_dir: str):
    """events -> (event_id, lon, lat) Dataset (column-pruned read)."""
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def fn(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon = (eid % 3600) / 10.0 - 180.0 + 0.05
        lat = ((eid * 7) % 1800) / 10.0 - 90.0 + 0.05
        return pa.table({"event_id": t["event_id"], "lon": pa.array(lon), "lat": pa.array(lat)})

    return ds.map_batches(fn, batch_format="pyarrow")


def q_cell_index(sf_dir: str):
    """lon/lat -> quadtree cell id at res 6 (the partition key of every
    spatial shuffle)."""
    pts = events_points(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        cells = cell_encode(
            t["lon"].to_numpy(zero_copy_only=False), t["lat"].to_numpy(zero_copy_only=False), CELL_RES
        )
        return pa.table({"event_id": t["event_id"], "cell": pa.array(cells)})

    return pts.map_batches(fn, batch_format="pyarrow")


def q_pip_join(sf_dir: str):
    """J4 point-in-polygon broadcast join -> (event_id, aoi_id) rows."""
    return pip_join(events_points(sf_dir), AOIS, id_col="event_id", concurrency=(1, 4))


def q_knn(sf_dir: str):
    """J5 kNN: for every query point (event_id % 97 == 0) its 3 nearest
    other points -> (event_id, neighbor_id).  The engine computes kNN for
    all points via the cell-ring shuffle; queries are filtered after (the
    oracle's QUALIFY does the same restriction)."""
    # exact=True: the ring-widening backstop guarantees the oracle match at
    # ANY scale factor / point density, not just where the ring assumption
    # happens to hold.  query_ids: only the (event_id % 97 == 0) subset is
    # ranked — every point stays a candidate, but the ring explode, rerank
    # and widen stages carry ~1/97th of the rows (round-3: 5.1 s -> see
    # BENCH; round 1-2 computed kNN for all 10k points then filtered)
    def pick(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(eid % KNN_QUERY_MOD == 0)).select(["event_id"])

    pts = events_points(sf_dir)
    qids = pts.map_batches(pick, batch_format="pyarrow").to_pandas()["event_id"]
    got = knn_join(pts, k=KNN_K, res=4, id_col="event_id", exact=True,
                   query_ids=qids.tolist())
    return got.map_batches(
        lambda t: pa.table({"event_id": t["event_id"], "neighbor_id": t["neighbor_id"]}),
        batch_format="pyarrow",
    )


def q_tile_assign(sf_dir: str):
    """J6 raster->vector: ±(0.8, 0.6) deg footprints exploded to covering
    res-6 cells -> (event_id, tile_cell)."""
    pts = events_points(sf_dir)

    def foot(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": t["event_id"],
                "west": pa.array(lon - FOOT_DLON),
                "south": pa.array(lat - FOOT_DLAT),
                "east": pa.array(lon + FOOT_DLON),
                "north": pa.array(lat + FOOT_DLAT),
            }
        )

    return assign_tiles(pts.map_batches(foot, batch_format="pyarrow"), res=CELL_RES, id_col="event_id")


def q_cell_extents(sf_dir: str):
    """A1 per-cell extent aggregate: count + lon/lat envelope per res-4 cell
    (the grouped-collection extent fold over the spatial partition key)."""
    pts = events_points(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        cells = cell_encode(
            t["lon"].to_numpy(zero_copy_only=False), t["lat"].to_numpy(zero_copy_only=False), 4
        )
        return t.append_column("cell", pa.array(cells))

    return (
        pts.map_batches(fn, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(
            Count(alias_name="n_points"),
            Min("lon", alias_name="west"),
            Min("lat", alias_name="south"),
            Max("lon", alias_name="east"),
            Max("lat", alias_name="north"),
        )
    )


def q_zonal_stats(sf_dir: str):
    """Raster x vector zonal statistics (rows-only: pixel decode is not
    SQL-expressible): per-AOI pixel count/mean/min/max over the
    deterministic images table derived from the documents rowcount (the
    same derivation ``entry()`` uses — no external data).  Independent
    numpy oracle: tests/test_spatial.py::TestZonalStats."""
    from ..datagen import generate_aois
    from ..pipelines.spatial_catalog import images_from_documents
    from ..stages.zonal import zonal_stats
    import ray.data as rd

    images = images_from_documents(sf_dir, "/tmp/scbr-query-cache")
    ds = rd.read_parquet(images)
    out = zonal_stats(ds, generate_aois())
    pdf = out.to_pandas().sort_values("aoi_id").reset_index(drop=True)
    return pdf


# --- J7: within-radius self-join --------------------------------------------

RADIUS = 0.5


def _sqmod61(h: np.ndarray) -> np.ndarray:
    """``h*h mod P`` (P = 2^61-1) int64-safe, vectorized.  Squaring is the
    NONLINEAR step that makes derived points genuinely pair-dense: the KMV
    hash is (piecewise) affine, so over sequential ids its values run an
    arithmetic progression mod P and any digit-split projection of them is
    a 2-D lattice with a large minimum gap — measured ZERO pairs within
    0.5 deg out of a Poisson-expected ~606 at sf0.01.  A quadratic residue
    sequence has no such lattice (measured 622 pairs ~ expectation).
    Identity: with lo = h & (2^31-1), hi = h >> 31,
    h^2 = hi^2*2^62 + hi*lo*2^32 + lo^2, and 2^61 === 1 (mod P); every
    intermediate stays < 2^63.  SQL twin: one HUGEINT multiply."""
    P = np.int64((1 << 61) - 1)
    lo = h & ((1 << 31) - 1)
    hi = h >> 31
    term1 = (2 * ((hi * hi) % P)) % P          # hi^2 * 2^62 === 2*hi^2
    m = hi * lo                                # < P already (30b x 31b)
    m_hi = m >> 29
    m_lo = m & ((1 << 29) - 1)
    term2 = (m_hi + (m_lo << 32)) % P          # m * 2^32 === m_hi + m_lo*2^32
    term3 = (lo * lo) % P
    return (term1 + term2 + term3) % P


def hashed_points(sf_dir: str):
    """Pseudo-uniform points derived from events, int64/BIGINT-exact in SQL:
    ``G = kmv_hash(id)^2 mod P``; lon from the low digits, lat from the
    HIGH digits of G — ``lon = (G % 36000)/100 - 180``,
    ``lat = ((G // 36000) % 18000)/100 - 90``.  The squaring (see
    ``_sqmod61``) breaks the affine hash's 2-D lattice; without it the
    derived set has NO pairs within the join radius (and two separate
    affine hash calls are worse still: H(id+salt) - H(id) is constant, so
    the points collapse onto a single lattice line)."""
    from .relational import _kmv_hash

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def fn(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = _sqmod61(_kmv_hash(eid))
        lon = (g % 36000) / 100.0 - 180.0
        lat = ((g // 36000) % 18000) / 100.0 - 90.0
        return pa.table({"event_id": t["event_id"], "lon": pa.array(lon), "lat": pa.array(lat)})

    return ds.map_batches(fn, batch_format="pyarrow")


# --- shared proximity-edge cache ---------------------------------------------
# The graph family (radius_join / dbscan / triangles at eps=RADIUS;
# kcore / degree_hist at eps=KCORE_RADIUS) all consume the SAME epsilon-join
# edge list over hashed_points(sf_dir).  Rebuilding it per query dominated
# their wall time (kcore: 7.6 of 7.8 s was the edge build), so the
# materialized edges memoize per (Ray session, sf_dir, radius, id_col).
# Keyed by GCS address so a ray.shutdown()+re-init can never serve object
# refs from a dead session; bounded (few radii x few sf dirs per session).
_EDGE_CACHE: dict = {}


def _ray_session_key():
    import ray

    if not ray.is_initialized():
        return None
    try:
        return ray.get_runtime_context().gcs_address
    except Exception:  # pragma: no cover - very old ray
        return "ray"


def proximity_edges(sf_dir: str, radius: float, id_col: str = "event_id"):
    """Session-cached MATERIALIZED epsilon-join edge list (id_a < id_b)
    over ``hashed_points(sf_dir)``.  First call per (session, sf_dir,
    radius) pays the grid join; subsequent graph queries reuse the blocks
    already in the object store."""
    from ..stages.spatial import radius_join

    key = (_ray_session_key(), os.path.realpath(sf_dir), float(radius), id_col)
    if key[0] is not None and key in _EDGE_CACHE:
        return _EDGE_CACHE[key]
    edges = radius_join(hashed_points(sf_dir), radius,
                        id_col=id_col).materialize()
    # materialize() auto-initialized Ray if needed - re-key on the live session
    key = (_ray_session_key(), key[1], key[2], key[3])
    _EDGE_CACHE[key] = edges
    return edges


def clear_proximity_edge_cache() -> None:
    _EDGE_CACHE.clear()


def q_radius_join(sf_dir: str):
    """J7 fixed-radius distance self-join: all point pairs within 0.5 deg
    Euclidean -> (id_a, id_b), id_a < id_b.  Grid-partitioned (cell side ==
    radius, 4-neighbour ghosting, pair owned by the smaller cell); the
    DuckDB oracle is the brute-force IEJoin over the same hashed points."""
    out = proximity_edges(sf_dir, RADIUS).to_pandas()
    if "id_a" not in out.columns:  # 0 pairs: Ray to_pandas drops the schema
        out = pd.DataFrame({"id_a": np.array([], np.int64),
                            "id_b": np.array([], np.int64)})
    return out


def _kmv_sql_cte(expr: str) -> str:
    """CTE chain computing the engine's two-round Mersenne hash of ``expr``
    then its mod-P square -> column g (mirrors relational._kmv_hash +
    _sqmod61; the square is one exact HUGEINT multiply in DuckDB)."""
    from .relational import _KMV_A, _KMV_A2, _KMV_B, _KMV_P

    return (
        f"ha AS (SELECT event_id, ({expr} * {_KMV_A} + {_KMV_B}) % {_KMV_P} AS h FROM events), "
        f"tb AS (SELECT event_id, ((h % 1073741824) * {_KMV_A2}) % {_KMV_P} AS t1, "
        f"((h // 1073741824) * {_KMV_A2}) % {_KMV_P} AS tt FROM ha), "
        f"hh AS (SELECT event_id, "
        f"(t1 + ((tt % 2147483648) * 1073741824 + tt // 2147483648) % {_KMV_P}) % {_KMV_P} AS hha FROM tb), "
        f"sq AS (SELECT event_id, "
        f"CAST((CAST(hha AS HUGEINT) * hha) % {_KMV_P} AS BIGINT) AS g FROM hh)"
    )


def radius_join_sql() -> str:
    return (
        "WITH " + _kmv_sql_cte("event_id") + ", "
        "pts AS (SELECT event_id, (g % 36000) / 100.0 - 180.0 AS lon, "
        "((g // 36000) % 18000) / 100.0 - 90.0 AS lat FROM sq) "
        "SELECT a.event_id AS id_a, b.event_id AS id_b FROM pts a JOIN pts b "
        "ON a.event_id < b.event_id "
        f"AND b.lon >= a.lon - {RADIUS} AND b.lon <= a.lon + {RADIUS} "
        f"AND b.lat >= a.lat - {RADIUS} AND b.lat <= a.lat + {RADIUS} "
        "AND (a.lon - b.lon) * (a.lon - b.lon) + (a.lat - b.lat) * (a.lat - b.lat) "
        f"<= {RADIUS} * {RADIUS}"
    )


# --- J8: rectangle-overlap join ---------------------------------------------

RECT_CELL = 0.6  # >= max rect extent (2 * 0.25 + quantization)


def hashed_rects(sf_dir: str):
    """Axis-aligned rectangles derived from events, int64/BIGINT-exact:
    center from the low digit fields of G = kmv_hash(id)^2 mod P (same
    lattice-free derivation as `hashed_points`), half-extents from the next
    digit fields — ``hw = ((G // (36000*18000)) % 50 + 1) / 200``,
    ``hh = ((G // (36000*18000*50)) % 50 + 1) / 200`` (0.005..0.25 deg)."""
    from .relational import _kmv_hash

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def fn(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = _sqmod61(_kmv_hash(eid))
        lon = (g % 36000) / 100.0 - 180.0
        lat = ((g // 36000) % 18000) / 100.0 - 90.0
        rest = g // (36000 * 18000)
        hw = (rest % 50 + 1) / 200.0
        hh = ((rest // 50) % 50 + 1) / 200.0
        return pa.table({
            "event_id": t["event_id"],
            "xmin": pa.array(lon - hw), "xmax": pa.array(lon + hw),
            "ymin": pa.array(lat - hh), "ymax": pa.array(lat + hh),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def q_rect_join(sf_dir: str):
    """J8 rectangle-intersection self-join (PBSM, reference-point dedup) →
    (id_a, id_b), id_a < id_b.  DuckDB oracle: brute-force overlap join
    over the same hashed rectangles."""
    from ..stages.spatial import rect_overlap_join

    out = rect_overlap_join(hashed_rects(sf_dir), RECT_CELL, id_col="event_id").to_pandas()
    if "id_a" not in out.columns:  # 0 pairs: Ray to_pandas drops the schema
        out = pd.DataFrame({"id_a": np.array([], np.int64),
                            "id_b": np.array([], np.int64)})
    return out


def rect_join_sql() -> str:
    return (
        "WITH " + _kmv_sql_cte("event_id") + ", "
        "rects AS (SELECT event_id, "
        "(g % 36000) / 100.0 - 180.0 - ((g // 648000000) % 50 + 1) / 200.0 AS xmin, "
        "(g % 36000) / 100.0 - 180.0 + ((g // 648000000) % 50 + 1) / 200.0 AS xmax, "
        "((g // 36000) % 18000) / 100.0 - 90.0 - ((g // 32400000000) % 50 + 1) / 200.0 AS ymin, "
        "((g // 36000) % 18000) / 100.0 - 90.0 + ((g // 32400000000) % 50 + 1) / 200.0 AS ymax "
        "FROM sq) "
        "SELECT a.event_id AS id_a, b.event_id AS id_b FROM rects a JOIN rects b "
        "ON a.event_id < b.event_id "
        "AND a.xmin <= b.xmax AND b.xmin <= a.xmax "
        "AND a.ymin <= b.ymax AND b.ymin <= a.ymax"
    )


def q_pixel_histogram(sf_dir: str):
    """Corpus-wide per-atype pixel histogram (rows-only: pixel decode is not
    SQL-expressible) over the deterministic images table.  Independent
    numpy oracle: tests/test_spatial.py::TestPixelHistogram."""
    from ..pipelines.spatial_catalog import images_from_documents
    from ..stages.zonal import pixel_histogram

    images = images_from_documents(sf_dir, "/tmp/scbr-query-cache")
    ds = rd.read_parquet(images)
    out = pixel_histogram(ds).to_pandas()
    out["n_px"] = out["n_px"].astype("int64")
    return out.sort_values(["atype", "bin"]).reset_index(drop=True)


def q_patch_stats(sf_dir: str):
    """Corpus-wide per-grid-position patch statistics over the ViT-style
    patch fan-out (rows-only: pixel decode is not SQL-expressible):
    patches are extracted distributed, then reduced to one row per
    (patch_row, patch_col) with integer pixel sums — int64 arithmetic, so
    the result is independent of partial-aggregation order.  Independent
    numpy oracle: tests/test_operators.py::TestPatchExtract."""
    from ray.data.aggregate import Count, Sum

    from ..pipelines.spatial_catalog import images_from_documents
    from ..stages.multimodal import extract_patches

    images = images_from_documents(sf_dir, "/tmp/scbr-query-cache")
    patches = extract_patches(rd.read_parquet(images), patch=16)
    out = (
        patches.map_batches(
            lambda t: t.select(["patch_row", "patch_col", "px_sum"]),
            batch_format="pyarrow")
        .groupby(["patch_row", "patch_col"])
        .aggregate(Count(alias_name="n_patches"), Sum("px_sum", alias_name="px_sum"))
    )
    pdf = out.to_pandas()
    pdf["n_patches"] = pdf["n_patches"].astype("int64")
    pdf["px_sum"] = pdf["px_sum"].astype("int64")
    return pdf.sort_values(["patch_row", "patch_col"]).reset_index(drop=True)


def q_caption_check(sf_dir: str):
    """North-rule row-invariant validator (rows-only): caption equality
    against the caption re-derived from the parsed image_id, corpus-wide.
    One row out: (n_rows, n_missing_parse, n_mismatch) — all zeros in the
    mismatch columns on a healthy table."""
    from ..pipelines.spatial_catalog import images_from_documents
    from ..stages.extract import validate_captions

    images = images_from_documents(sf_dir, "/tmp/scbr-query-cache")
    sums = validate_captions(rd.read_parquet(images))
    return pd.DataFrame({
        "n_rows": [int(sums["sum(n_rows)"])],
        "n_missing_parse": [int(sums["sum(n_missing_parse)"])],
        "n_mismatch": [int(sums["sum(n_mismatch)"])],
    })


# --- hierarchical cell compaction (H3 compact_cells analog) -------------------


def compact_cells(cells: "rd.Dataset", levels: int = 1) -> "rd.Dataset":
    """Quadtree CELL-SET COMPACTION (the H3 ``compact_cells`` operator over
    the engine's cell index): replace every complete 4-child sibling set by
    its parent cell, ``levels`` times.  The compacted set covers exactly the
    same area with the minimum number of cells — the standard trick for
    shipping coverage masks / AOI indexes at a fraction of the size.

    Input: a Dataset with a distinct int64 ``cell`` column (one resolution).
    Scale shape: distinct cells at res r are bounded by 4^r (res 10 ≈ 1M),
    orders of magnitude below the point corpus, but the operator still
    avoids the driver: one ``groupby(parent)`` per level, each group at most
    4 rows, emitted as parent or passed through vectorized."""
    from ..geo.cell import cell_parent

    for _ in range(levels):
        def add_parent(t: pa.Table) -> pa.Table:
            c = t["cell"].to_numpy(zero_copy_only=False)
            return pa.table({"cell": t["cell"], "parent": pa.array(cell_parent(c))})

        def compact(g: pd.DataFrame) -> pd.DataFrame:
            if len(g) == 4:
                return pd.DataFrame({"cell": [np.int64(g["parent"].iloc[0])]})
            return g[["cell"]]

        cells = (
            cells.map_batches(add_parent, batch_format="pyarrow")
            .groupby("parent")
            .map_groups(compact, batch_format="pandas")
        )
    return cells


def q_cell_compact(sf_dir: str):
    """Occupied res-6 cells of the HASHED points (pseudo-uniform — the
    lattice-structured ``events_points`` never completes a sibling set, see
    ``_sqmod61``), compacted one level: every fully-occupied res-5 parent
    (all 4 children present) replaces its children.  Distinctness comes
    from a count groupby (per-batch unique partials bound the shuffle);
    the SQL twin mirrors the parent bit surgery literally."""
    pts = hashed_points(sf_dir)

    def encode(t: pa.Table) -> pa.Table:
        cells = cell_encode(
            t["lon"].to_numpy(zero_copy_only=False),
            t["lat"].to_numpy(zero_copy_only=False), CELL_RES)
        u = np.unique(cells)  # per-batch distinct partial
        return pa.table({"cell": pa.array(u)})

    occupied = (
        pts.map_batches(encode, batch_format="pyarrow")
        .groupby("cell").aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
    out = compact_cells(occupied).to_pandas()
    out["cell"] = out["cell"].astype("int64")
    return out.sort_values("cell").reset_index(drop=True)


def cell_compact_sql() -> str:
    from ..geo.cell import RES_SHIFT, XY_BITS, XY_MASK, cell_encode_sql

    cell6 = cell_encode_sql("lon", "lat", CELL_RES)
    parent = (
        f"((CAST({CELL_RES - 1} AS BIGINT) << {RES_SHIFT}) | "
        f"((((cell6 >> {XY_BITS}) & {XY_MASK}) >> 1) << {XY_BITS}) | "
        f"((cell6 & {XY_MASK}) >> 1))"
    )
    return (
        "WITH " + _kmv_sql_cte("event_id") + ", "
        "pts AS (SELECT event_id, (g % 36000) / 100.0 - 180.0 AS lon, "
        "((g // 36000) % 18000) / 100.0 - 90.0 AS lat FROM sq), "
        f"occ AS (SELECT DISTINCT {cell6} AS cell6 FROM pts), "
        f"par AS (SELECT cell6, {parent} AS p FROM occ), "
        "cnt AS (SELECT p, COUNT(*) AS nc FROM par GROUP BY p) "
        "SELECT p AS cell FROM cnt WHERE nc = 4 "
        "UNION ALL "
        "SELECT cell6 AS cell FROM par JOIN cnt USING (p) WHERE nc < 4"
    )


def q_overview(sf_dir: str):
    """Per-tile OVERVIEW mosaic (rows-only: pixel decode is not
    SQL-expressible): block-mean pyramid level over every tile's images,
    long format (tile, r, c, n_img, mean_e4), integer-exact.  Independent
    numpy oracle: tests/test_spatial.py::TestOverviewPyramid."""
    from ..pipelines.spatial_catalog import images_from_documents
    from ..stages.zonal import overview_pyramid

    images = images_from_documents(sf_dir, "/tmp/scbr-query-cache")
    out = overview_pyramid(rd.read_parquet(images)).to_pandas()
    for c in ("r", "c", "n_img", "mean_e4"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["tile", "r", "c"]).reset_index(drop=True)


def q_coverage_gaps(sf_dir: str):
    """COVERAGE-GAP detection (acquisition QA: which cells of the target
    region have NO observations?): all res-6 cells whose grid range
    intersects the aoi_ne rectangle, anti-joined against the occupied cell
    set of the event points.  The occupied side stays a distributed
    distinct; the candidate grid is bounded by the AOI cell count (a few
    hundred at res 6, 4^res worst case — never the corpus), so it rides
    broadcast and the anti-join is one vectorized isin per batch."""
    aoi = AOIS[2]  # aoi_ne
    n = 1 << CELL_RES
    x0 = min(max(int((aoi["west"] + 180.0) / 360.0 * n), 0), n - 1)
    x1 = min(max(int((aoi["east"] + 180.0) / 360.0 * n), 0), n - 1)
    y0 = min(max(int((aoi["south"] + 90.0) / 180.0 * n), 0), n - 1)
    y1 = min(max(int((aoi["north"] + 90.0) / 180.0 * n), 0), n - 1)
    xs, ys = np.meshgrid(np.arange(x0, x1 + 1, dtype=np.int64),
                         np.arange(y0, y1 + 1, dtype=np.int64))
    cand = ((np.int64(CELL_RES) << 58) | (xs.ravel() << 29) | ys.ravel())

    pts = events_points(sf_dir)

    def encode(t: pa.Table) -> pa.Table:
        cells = cell_encode(t["lon"].to_numpy(zero_copy_only=False),
                            t["lat"].to_numpy(zero_copy_only=False), CELL_RES)
        return pa.table({"cell": pa.array(np.unique(cells))})

    occupied = (
        pts.map_batches(encode, batch_format="pyarrow")
        .groupby("cell").aggregate(Count(alias_name="_n"))
        .to_pandas()["cell"].to_numpy()
    )  # bounded by 4^CELL_RES cells, not by the corpus
    gaps = np.setdiff1d(cand, occupied)
    return pd.DataFrame({"cell": gaps.astype(np.int64)})


def coverage_gaps_sql() -> str:
    lon, lat = lonlat_sql("event_id")
    from ..geo.cell import cell_encode_sql

    cell6 = cell_encode_sql(lon, lat, CELL_RES)
    aoi = AOIS[2]
    n = 1 << CELL_RES
    x0 = int((aoi["west"] + 180.0) / 360.0 * n)
    x1 = int((aoi["east"] + 180.0) / 360.0 * n)
    y0 = int((aoi["south"] + 90.0) / 180.0 * n)
    y1 = int((aoi["north"] + 90.0) / 180.0 * n)
    return (
        f"WITH xs AS (SELECT unnest(generate_series({x0}, {min(x1, n - 1)})) AS x), "
        f"ys AS (SELECT unnest(generate_series({y0}, {min(y1, n - 1)})) AS y), "
        f"cand AS (SELECT ((CAST({CELL_RES} AS BIGINT) << 58) | (x << 29) | y) AS cell "
        "FROM xs CROSS JOIN ys), "
        f"occ AS (SELECT DISTINCT {cell6} AS cell FROM events) "
        "SELECT cell FROM cand WHERE cell NOT IN (SELECT cell FROM occ)"
    )


# --- k-ring neighborhood smoothing ------------------------------------------

KRING_RES = 6


def q_kring_smooth(sf_dir: str):
    """K-RING NEIGHBORHOOD SMOOTHING over the cell index (the H3 k-ring /
    focal-statistics primitive of raster-style analytics on a discrete
    global grid): per-cell (count, sum) aggregates are SCATTERED to their
    3x3 neighborhood and re-summed, yielding for every touched cell the
    smoothed count and value sum of its ring.

    Scale shape: the corpus reduces FIRST (per-batch partials -> one
    groupby bounded by 4^res cells); only per-cell aggregate rows — never
    points — are replicated 9x (vectorized repeat + offset add, bounds
    clipped at the grid edge) into a second tiny groupby.  Both shuffles
    move O(#occupied cells) rows, so the operator costs the same at 100 TB
    as the plain per-cell aggregate.  Integer-exact: value folds as e4
    integers (the money-cents discipline), so the DuckDB twin hashes
    bit-identically."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away
    from ..geo.cell import RES_SHIFT, XY_BITS, XY_MASK

    n_side = 1 << KRING_RES
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "value"])

    def percell(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon = (eid % 3600) / 10.0 - 180.0 + 0.05
        lat = ((eid * 7) % 1800) / 10.0 - 90.0 + 0.05
        cells = cell_encode(lon, lat, KRING_RES)
        e4 = round_half_away(t["value"].to_numpy(zero_copy_only=False) * 1e4).astype(np.int64)
        g = pd.DataFrame({"cell": cells, "e4": e4}).groupby("cell", sort=False)
        agg = g.agg(n_pts=("e4", "size"), s_e4=("e4", "sum")).reset_index()
        return pa.table({"cell": pa.array(agg["cell"].to_numpy()),
                         "n_pts": pa.array(agg["n_pts"].to_numpy(dtype=np.int64)),
                         "s_e4": pa.array(agg["s_e4"].to_numpy(dtype=np.int64))})

    percell_agg = (ds.map_batches(percell, batch_format="pyarrow")
                   .groupby("cell")
                   .aggregate(Sum("n_pts", alias_name="n"), Sum("s_e4", alias_name="s")))

    offs = np.array([(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], dtype=np.int64)

    def scatter(t: pa.Table) -> pa.Table:
        c = t["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = (c >> XY_BITS) & XY_MASK
        y = c & XY_MASK
        m = len(c)
        tx = np.repeat(x, 9) + np.tile(offs[:, 0], m)
        ty = np.repeat(y, 9) + np.tile(offs[:, 1], m)
        ok = (tx >= 0) & (tx < n_side) & (ty >= 0) & (ty < n_side)
        tgt = (np.int64(KRING_RES) << RES_SHIFT) | (tx[ok] << XY_BITS) | ty[ok]
        return pa.table({"cell": pa.array(tgt),
                         "n_pts": pa.array(np.repeat(n, 9)[ok]),
                         "s_e4": pa.array(np.repeat(s, 9)[ok])})

    out = (percell_agg.map_batches(scatter, batch_format="pyarrow")
           .groupby("cell")
           .aggregate(Sum("n_pts", alias_name="n_ring"), Sum("s_e4", alias_name="sum_ring_e4")))
    pdf = out.to_pandas()
    for col in ("cell", "n_ring", "sum_ring_e4"):
        pdf[col] = pdf[col].astype("int64")
    return pdf


def kring_smooth_sql() -> str:
    from ..geo.cell import RES_SHIFT, XY_BITS, XY_MASK, cell_encode_sql

    lon, lat = lonlat_sql("event_id")
    cell = cell_encode_sql(lon, lat, KRING_RES)
    n_side = 1 << KRING_RES
    return (
        f"WITH c AS (SELECT {cell} AS cell, COUNT(*) AS n, "
        f"CAST(SUM(CAST(ROUND(value * 10000, 0) AS BIGINT)) AS BIGINT) AS s "
        f"FROM events GROUP BY 1), "
        f"d AS (SELECT cell, n, s, (cell >> {XY_BITS}) & {XY_MASK} AS x, "
        f"cell & {XY_MASK} AS y FROM c), "
        f"nb AS (SELECT ((CAST({KRING_RES} AS BIGINT) << {RES_SHIFT}) | "
        f"((x + dx) << {XY_BITS}) | (y + dy)) AS cell, n, s "
        f"FROM d CROSS JOIN (VALUES (-1), (0), (1)) AS dxs(dx) "
        f"CROSS JOIN (VALUES (-1), (0), (1)) AS dys(dy) "
        f"WHERE x + dx BETWEEN 0 AND {n_side - 1} AND y + dy BETWEEN 0 AND {n_side - 1}) "
        f"SELECT cell, CAST(SUM(n) AS BIGINT) AS n_ring, "
        f"CAST(SUM(s) AS BIGINT) AS sum_ring_e4 FROM nb GROUP BY 1"
    )


def q_image_stats(sf_dir: str):
    """Per-image integer-exact quality statistics over the documents-derived
    images table (rows-only: pixel decode is not SQL-expressible) — the
    image-corpus filter pass (flat/washed-out/low-information detection).
    Independent numpy oracle: tests/test_operators.py::TestImageStats."""
    from ..pipelines.spatial_catalog import images_from_documents
    from ..stages.multimodal import image_stats

    images = images_from_documents(sf_dir, "/tmp/scbr-query-cache")
    out = image_stats(rd.read_parquet(images))
    return out.to_pandas().sort_values("image_id").reset_index(drop=True)


def q_change_detect(sf_dir: str):
    """RASTER CHANGE DETECTION over the image time series (the temporal
    analytics step of an EO catalog: per (tile, asset-type) day-over-day
    total-radiance delta).  Rows-only (pixel decode is not
    SQL-expressible); planted-step test + independent local-decode oracle
    in tests/test_spatial.py::TestChangeDetect.

    Shape: actor-pool decode reduces every image to ONE int64 pixel sum in
    the read tasks (pixels never shuffle); (tile, atype, date) metadata is
    regex-parsed vectorized; recurring image_ids aggregate by SUM + count
    (deterministic whatever the duplication); the per-series diff runs in a
    crc-bucketed map_groups over series keys — O(#images) rows through one
    small shuffle."""
    from ..pipelines.spatial_catalog import images_from_documents

    images = images_from_documents(sf_dir, "/tmp/scbr-query-cache")
    return change_detect(rd.read_parquet(images))


def change_detect(images):
    """images Dataset -> per-(tile, atype, date) px_sum + day-over-day
    delta Dataset (see q_change_detect)."""
    import re as _re
    import zlib as _z

    from ray.data.aggregate import Count, Sum

    from ..stages.multimodal import DecodeStage

    class PxSum:
        def __init__(self):
            self._decode = DecodeStage(strict=False)._decode
            self._pat = _re.compile(
                r"tiles/([^/]+)/\d+/[^_]+_(.+)_\1_(\d{4}-\d{2}-\d{2})\.tif$")

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["image_id"].to_pylist()
            fmts = t["fmt"].to_pylist()
            ws = t["w"].to_pylist()
            hs = t["h"].to_pylist()
            bts = t["bytes"]
            n = t.num_rows
            sums = np.empty(n, np.int64)
            for i in range(n):
                px = self._decode(bts[i].as_py(), fmts[i], ws[i], hs[i])
                sums[i] = int(np.asarray(px, dtype=np.int64).sum()) if (
                    np.issubdtype(np.asarray(px).dtype, np.integer)) else int(
                    np.round(np.asarray(px, dtype=np.float64)).sum())
            tiles, atypes, dates = [], [], []
            for s in ids:
                m = self._pat.search(s)
                tiles.append(m.group(1) if m else "")
                atypes.append(m.group(2) if m else "")
                dates.append(m.group(3) if m else "")
            return pa.table({"tile": pa.array(tiles, pa.string()),
                             "atype": pa.array(atypes, pa.string()),
                             "date": pa.array(dates, pa.string()),
                             "px_sum": pa.array(sums)})

    per_img = images.map_batches(
        PxSum, batch_format="pyarrow", batch_size=256, concurrency=(1, 8))
    per_date = (per_img.groupby(["tile", "atype", "date"])
                .aggregate(Sum("px_sum", alias_name="px_sum"),
                           Count(alias_name="n_img")))

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = [f"{a}|{b}" for a, b in zip(t["tile"].to_pylist(),
                                           t["atype"].to_pylist())]
        b = np.fromiter((_z.crc32(k.encode()) % 16 for k in keys),
                        dtype=np.int64, count=len(keys))
        return t.append_column("bucket", pa.array(b))

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tile", "atype", "date"], kind="stable")
        key = g["tile"] + "|" + g["atype"]
        prev = g["px_sum"].shift(1)
        same = key == key.shift(1)
        delta = np.where(same, g["px_sum"] - prev.fillna(0), 0).astype(np.int64)
        out = g.drop(columns=["bucket"]).copy()
        out["delta"] = delta
        out["px_sum"] = out["px_sum"].astype("int64")
        out["n_img"] = out["n_img"].astype("int64")
        return out

    return (per_date.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(diff, batch_format="pandas"))


def q_image_sim(sf_dir: str):
    """End-to-end IMAGE SIMILARITY SEARCH from pixels (the retrieval path
    of a multimodal corpus): actor-pool decode -> histogram+moment feature
    vectors (the engine-native stand-in for batched model inference) ->
    brute-force cosine top-5 against a deterministic query subset
    (crc32(image_id) % 50 == 0).  Rows-only (pixel decode + float matmul);
    independent local-decode numpy oracle in
    tests/test_spatial.py::TestImageSim.

    Scale shape: features extract in-task (pixels never shuffle), the
    corpus streams ONCE through the broadcast query matrix with per-batch
    partial top-k; recurring image_ids reduce to one corpus row first
    (identical payload -> identical features) so top-k lists never contain
    duplicate neighbors."""
    import zlib as _z

    from ..pipelines.spatial_catalog import images_from_documents
    from ..stages.ann import brute_force_topk
    from ..stages.multimodal import FeatureExtractStage

    images = images_from_documents(sf_dir, "/tmp/scbr-query-cache")
    feats = rd.read_parquet(images).map_batches(
        FeatureExtractStage, fn_constructor_kwargs={"bins": 16},
        batch_format="pyarrow", batch_size=256, concurrency=(1, 8))

    def first_per_id(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates("image_id")

    uniq = feats.groupby("image_id").map_groups(first_per_id,
                                                batch_format="pandas").materialize()

    def pick(t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        m = np.fromiter((_z.crc32(s.encode()) % 50 == 0 for s in ids),
                        dtype=bool, count=len(ids))
        return t.filter(pa.array(m))

    qdf = uniq.map_batches(pick, batch_format="pyarrow").to_pandas()
    out = brute_force_topk(uniq, qdf, k=5, id_col="image_id", vec_col="features")
    return (out.to_pandas().sort_values(["query_id", "neighbor_id"])
            .reset_index(drop=True))


DBSCAN_MIN_NBRS = 2  # core iff >= 2 eps-neighbors (classic minPts=3 w/ self)


def q_dbscan(sf_dir: str):
    """Distributed DBSCAN over the hashed point set (eps = RADIUS,
    minPts = 3 incl. the point): the density-clustering composite of two
    verified primitives — the grid epsilon-join supplies the neighbor
    graph, connected components over CORE-CORE edges supply cluster ids
    (min core id), border points attach to the MIN label among their core
    neighbors (the deterministic tie-rule that makes classic DBSCAN's
    order-dependent border assignment well-defined for the SQL twin),
    everything else is noise (-1).

    Scale shape: epsilon-join is the only quadratic-risk step (cell-
    bounded, see radius_join); degrees/core flags are one explode +
    groupby; component labels ride ``neardup_cluster_labels`` (auto-routed
    driver union-find / distributed min-label propagation); the final
    labeling AUTO-ROUTES on core-point count — a broadcast sorted-array
    lookup below ``driver_state_limit``, a chain of partitioned left-outer
    joins above it (nothing driver-held, the ``neardup_cluster_labels``
    pattern) — both paths equality-tested."""
    return dbscan_labels(hashed_points(sf_dir), RADIUS, DBSCAN_MIN_NBRS,
                         edges=proximity_edges(sf_dir, RADIUS))


def _sorted_lookup(keys: np.ndarray, vals: np.ndarray, q: np.ndarray):
    """Vectorized dict-lookup over int64 arrays: ``keys`` sorted ascending.
    Returns (found_mask, values) with values undefined where not found."""
    if len(keys) == 0:
        return np.zeros(len(q), dtype=bool), np.zeros(len(q), dtype=np.int64)
    idx = np.searchsorted(keys, q)
    idx_c = np.minimum(idx, len(keys) - 1)
    found = keys[idx_c] == q
    return found, vals[idx_c]


def dbscan_labels(points, eps: float, min_nbrs: int = DBSCAN_MIN_NBRS,
                  driver_state_limit: int = 5_000_000, edges=None):
    """(event_id, lon, lat) points Dataset -> (event_id, label) DBSCAN
    labels (see q_dbscan for the algorithm).

    AUTO-ROUTED by core-point count (round-3 review: the label maps were
    always collected to the driver):

    - <= ``driver_state_limit`` cores: core/border label maps are gathered
      once as SORTED int64 key/value arrays, broadcast via ``ray.put``,
      and every lookup is a vectorized ``np.searchsorted`` (no per-row
      dict probes — round-3 review item #2).
    - beyond it: core filtering, border attachment and the final labeling
      are partitioned joins — core ids never leave the cluster, matching
      ``neardup_cluster_labels``' distributed path.

    Both paths produce identical labels (parametrized equality test in
    tests/test_operators.py)."""
    import ray
    from ray.data.aggregate import Count

    from ..stages.dedup import neardup_cluster_labels
    from ..stages.spatial import radius_join

    pts = points.materialize()
    if edges is None:  # callers with a cached epsilon-join pass it in
        edges = radius_join(pts, eps, id_col="event_id").materialize()

    def explode(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        return pa.table({"id": pa.array(np.concatenate([a, b]))})

    deg_ds = (edges.map_batches(explode, batch_format="pyarrow")
              .groupby("id").aggregate(Count(alias_name="deg")))
    core_ds = deg_ds.map_batches(
        lambda t: pa.table({"id": t["id"].filter(
            pc.greater_equal(t["deg"], min_nbrs))}),
        batch_format="pyarrow",
    ).materialize()
    n_core = core_ds.count()

    if n_core <= driver_state_limit:
        return _dbscan_labels_broadcast(pts, edges, core_ds,
                                        neardup_cluster_labels)
    return _dbscan_labels_joined(pts, edges, core_ds, neardup_cluster_labels)


def _dbscan_labels_broadcast(pts, edges, core_ds, neardup_cluster_labels):
    """Small-core path: sorted-array label maps broadcast once, all lookups
    vectorized searchsorted."""
    import ray
    from ray.data.aggregate import Min

    cdf = core_ds.to_pandas()
    core_ids = np.sort(cdf["id"].to_numpy(dtype=np.int64)) if len(cdf) \
        else np.array([], dtype=np.int64)
    core_arr = pa.array(core_ids)
    core_ref = ray.put(core_arr)

    def core_core(t: pa.Table) -> pa.Table:
        ca = ray.get(core_ref)
        m = (pc.is_in(t["id_a"], value_set=ca).to_numpy(zero_copy_only=False)
             & pc.is_in(t["id_b"], value_set=ca).to_numpy(zero_copy_only=False))
        return t.filter(pa.array(m))

    core_edges = edges.map_batches(core_core, batch_format="pyarrow")

    def core_pts(t: pa.Table) -> pa.Table:
        ca = ray.get(core_ref)
        m = pc.is_in(t["event_id"], value_set=ca).to_numpy(zero_copy_only=False)
        return pa.table({"event_id": t["event_id"].filter(pa.array(m))})

    core_pts_ds = pts.map_batches(core_pts, batch_format="pyarrow")
    labels = neardup_cluster_labels(core_pts_ds, core_edges, id_col="event_id",
                                    pair_cols=("id_a", "id_b")).to_pandas()
    if "event_id" not in labels.columns:  # 0 cores: to_pandas drops schema
        labels = pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                               "keep_id": pd.Series(dtype="int64")})
    labels = labels.sort_values("event_id")
    lab_k = labels["event_id"].to_numpy(dtype=np.int64)
    lab_v = labels["keep_id"].to_numpy(dtype=np.int64)
    lab_ref = ray.put((lab_k, lab_v))

    # border points: min core-neighbor component label (vectorized: a
    # sorted-array lookup per direction, boolean-masked — no row loop)
    def border_partial(t: pa.Table) -> pa.Table:
        lk, lv = ray.get(lab_ref)
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_id, out_lb = [], []
        for x, y in ((a, b), (b, a)):
            fx, _ = _sorted_lookup(lk, lv, x)
            fy, vy = _sorted_lookup(lk, lv, y)
            m = ~fx & fy
            out_id.append(x[m])
            out_lb.append(vy[m])
        return pa.table({"id": pa.array(np.concatenate(out_id)),
                         "lbl": pa.array(np.concatenate(out_lb))})

    border = (edges.map_batches(border_partial, batch_format="pyarrow")
              .groupby("id").aggregate(Min("lbl", alias_name="lbl")).to_pandas())
    border = border.sort_values("id") if len(border) else border
    bor_k = border["id"].to_numpy(dtype=np.int64) if len(border) \
        else np.array([], dtype=np.int64)
    bor_v = border["lbl"].to_numpy(dtype=np.int64) if len(border) \
        else np.array([], dtype=np.int64)
    bor_ref = ray.put((bor_k, bor_v))

    def assign(t: pa.Table) -> pa.Table:
        lk, lv = ray.get(lab_ref)
        bk, bv = ray.get(bor_ref)
        ids = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = np.full(len(ids), -1, dtype=np.int64)
        fb, vb = _sorted_lookup(bk, bv, ids)
        out[fb] = vb[fb]
        fl, vl = _sorted_lookup(lk, lv, ids)
        out[fl] = vl[fl]  # core label wins over border
        return pa.table({"event_id": pa.array(ids), "label": pa.array(out)})

    return pts.map_batches(assign, batch_format="pyarrow")


def _dbscan_labels_joined(pts, edges, core_ds, neardup_cluster_labels):
    """Large-core path: core membership, border attachment and the final
    labeling are partitioned hash joins — no O(#cores) driver state."""
    from ray.data.aggregate import Min

    from ..stages.dedup import _compact_nonempty
    from .relational import cluster_partitions

    nparts = cluster_partitions(per_cpu=0.5, floor=4)
    core = _compact_nonempty(core_ds,
                             fallback_schema=pa.schema([("id", pa.int64())]))

    # core-core edges: two semi joins (inner on unique core ids)
    e = _compact_nonempty(
        edges.select_columns(["id_a", "id_b"]).materialize(),
        fallback_schema=pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())]))
    ce = (e.join(core, join_type="inner", num_partitions=nparts,
                 on=("id_a",), right_on=("id",))
          .join(core, join_type="inner", num_partitions=nparts,
                on=("id_b",), right_on=("id",)))
    core_pts_ds = core.map_batches(
        lambda t: pa.table({"event_id": t["id"]}), batch_format="pyarrow")
    labels = _compact_nonempty(
        neardup_cluster_labels(core_pts_ds, ce, id_col="event_id",
                               pair_cols=("id_a", "id_b"),
                               driver_edge_limit=0).materialize(),
        fallback_schema=pa.schema([("event_id", pa.int64()),
                                   ("keep_id", pa.int64())]))

    # border: non-core endpoint u with a core neighbour v -> min(label(v))
    bi = e.map_batches(
        lambda t: pa.table({
            "u": pa.concat_arrays([t["id_a"].combine_chunks(),
                                   t["id_b"].combine_chunks()]),
            "v": pa.concat_arrays([t["id_b"].combine_chunks(),
                                   t["id_a"].combine_chunks()])}),
        batch_format="pyarrow")
    cand = (bi.join(labels, join_type="inner", num_partitions=nparts,
                    on=("v",), right_on=("event_id",))
            .map_batches(lambda t: pa.table({"u": t["u"],
                                             "nlbl": t["keep_id"]}),
                         batch_format="pyarrow"))
    ucore = labels.map_batches(
        lambda t: pa.table({"cid": t["event_id"],
                            "is_core": pa.array(np.ones(len(t), np.int8))}),
        batch_format="pyarrow")
    cand = _compact_nonempty(cand.materialize(),
                             fallback_schema=pa.schema([("u", pa.int64()),
                                                        ("nlbl", pa.int64())]))
    border = (cand.join(ucore, join_type="left_outer", num_partitions=nparts,
                        on=("u",), right_on=("cid",))
              .map_batches(lambda t: t.filter(pc.is_null(t["is_core"]))
                           .select(["u", "nlbl"]), batch_format="pyarrow")
              .groupby("u").aggregate(Min("nlbl", alias_name="blbl")))
    border = _compact_nonempty(border.materialize(),
                               fallback_schema=pa.schema([("u", pa.int64()),
                                                          ("blbl", pa.int64())]))

    # final: pts left join core labels, left join border labels, coalesce
    out = (pts.select_columns(["event_id"])
           .join(labels, join_type="left_outer", num_partitions=nparts,
                 on=("event_id",), right_on=("event_id",))
           .join(border, join_type="left_outer", num_partitions=nparts,
                 on=("event_id",), right_on=("u",)))
    return out.map_batches(
        lambda t: pa.table({
            "event_id": t["event_id"],
            "label": pc.coalesce(t["keep_id"], t["blbl"],
                                 pa.scalar(-1, pa.int64()))}),
        batch_format="pyarrow")


def dbscan_sql() -> str:
    base = radius_join_sql()
    return (
        f"WITH RECURSIVE e AS ({base}), "
        "bi AS (SELECT id_a AS u, id_b AS v FROM e "
        "UNION ALL SELECT id_b, id_a FROM e), "
        "deg AS (SELECT u AS id, COUNT(*) AS d FROM bi GROUP BY 1), "
        f"core AS (SELECT id FROM deg WHERE d >= {DBSCAN_MIN_NBRS}), "
        "ce AS (SELECT u, v FROM bi WHERE u IN (SELECT id FROM core) "
        "AND v IN (SELECT id FROM core)) "
        ", reach(src, dst) AS (SELECT id, id FROM core "
        "UNION SELECT r.src, c.v FROM reach r JOIN ce c ON c.u = r.dst), "
        "lbl AS (SELECT src AS id, MIN(dst) AS label FROM reach GROUP BY 1), "
        "border AS (SELECT b.u AS id, MIN(l.label) AS label FROM bi b "
        "JOIN lbl l ON b.v = l.id WHERE b.u NOT IN (SELECT id FROM core) GROUP BY 1) "
        "SELECT event_id, COALESCE(l.label, bo.label, -1) AS label "
        "FROM (SELECT DISTINCT event_id FROM events) p "
        "LEFT JOIN lbl l ON p.event_id = l.id "
        "LEFT JOIN border bo ON p.event_id = bo.id"
    )


def q_triangles(sf_dir: str):
    """TRIANGLE COUNTING over the spatial neighbor graph (the clustering-
    coefficient / cohesion primitive of graph analytics): per node, how
    many triangles of the epsilon-graph it belongs to.

    Engine shape: the epsilon-join emits each undirected edge once
    (id_a < id_b); the adjacency index (bounded by the PAIR count, not the
    corpus) broadcasts via ``ray.put`` and edges stream through a
    compact-node-iterator pass — for edge (u, v) count common neighbors
    w > v (each triangle found exactly once at its smallest edge), 3
    per-node partial rows per triangle, one tiny groupby.  At graph sizes
    where adjacency outgrows a node, the same count is two partitioned
    joins (wedge enumeration on the shared vertex); documented swap, same
    result.  Zero triangles at sf0.001 — semantics carried by the planted
    test; nonvacuous at the sf0.01 gate (14 triangles)."""
    import ray
    from ray.data.aggregate import Sum

    edges = proximity_edges(sf_dir, RADIUS)
    ep = edges.to_pandas()
    if "id_a" not in ep.columns or not len(ep):
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "n_tri": pd.Series(dtype="int64")})
    adj: dict = {}
    for a, b in zip(ep["id_a"].to_numpy(dtype=np.int64),
                    ep["id_b"].to_numpy(dtype=np.int64)):
        adj.setdefault(int(a), []).append(int(b))
        adj.setdefault(int(b), []).append(int(a))
    adj = {k: np.unique(np.array(v, dtype=np.int64)) for k, v in adj.items()}
    adj_ref = ray.put(adj)

    def tri_partial(t: pa.Table) -> pa.Table:
        A = ray.get(adj_ref)
        ua = t["id_a"].to_numpy(zero_copy_only=False)
        va = t["id_b"].to_numpy(zero_copy_only=False)
        out: list = []
        for u, v in zip(ua, va):
            common = np.intersect1d(A[int(u)], A[int(v)], assume_unique=True)
            for w in common[common > v]:
                out.extend((int(u), int(v), int(w)))
        arr = np.array(out, dtype=np.int64)
        return pa.table({"node": pa.array(arr),
                         "one": pa.array(np.ones(len(arr), np.int64))})

    out = (edges.map_batches(tri_partial, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("one", alias_name="n_tri")))
    pdf = out.to_pandas()
    if "node" not in pdf.columns:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "n_tri": pd.Series(dtype="int64")})
    return pdf.astype({"node": "int64", "n_tri": "int64"})


def triangles_sql() -> str:
    return (
        f"WITH e AS ({radius_join_sql()}), "
        "und AS (SELECT id_a AS u, id_b AS v FROM e), "
        "tri AS (SELECT a.u AS x, a.v AS y, b.v AS z FROM und a "
        "JOIN und b ON b.u = a.v JOIN und c ON c.u = a.u AND c.v = b.v), "
        "n3 AS (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri "
        "UNION ALL SELECT z FROM tri) "
        "SELECT node, COUNT(*) AS n_tri FROM n3 GROUP BY 1"
    )


def q_clustering_coeff(sf_dir: str):
    """LOCAL CLUSTERING COEFFICIENT per node of the radius-0.5 proximity
    graph — the neighborhood-density statistic of graph curation (how
    close each node's neighborhood is to a clique):
    ``cc = 2 * n_tri / (deg * (deg - 1))`` for nodes with deg >= 2,
    published INTEGER-EXACT as ``cc_e6 = 2*n_tri*1_000_000 //
    (deg*(deg-1))`` so the SQL twin hashes bit-for-bit (no float
    division on either side).

    Scale shape: the epsilon-join edge list comes from the SESSION CACHE
    (``proximity_edges`` — shared with radius_join/dbscan/triangles);
    degrees are per-batch ``np.unique`` partials + one groupby-sum over
    O(nodes) rows; per-node triangle counts ride ``q_triangles``
    (adjacency-broadcast with the documented partitioned-wedge swap at
    sizes where adjacency outgrows a node); the left-merge of the two
    node-bounded tables happens once.  -> (node, deg, n_tri, cc_e6) for
    deg >= 2."""
    from ray.data.aggregate import Sum

    edges = proximity_edges(sf_dir, RADIUS)

    def deg_partial(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        u, c = np.unique(np.concatenate([a, b]), return_counts=True)
        return pa.table({"node": pa.array(u.astype(np.int64)),
                         "deg": pa.array(c.astype(np.int64))})

    deg = (edges.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("deg", alias_name="deg"))
           .to_pandas())
    empty = pd.DataFrame({"node": pd.Series(dtype="int64"),
                          "deg": pd.Series(dtype="int64"),
                          "n_tri": pd.Series(dtype="int64"),
                          "cc_e6": pd.Series(dtype="int64")})
    if "node" not in deg.columns or not len(deg):
        return empty
    deg = deg[deg["deg"] >= 2]
    if not len(deg):
        return empty
    tri = q_triangles(sf_dir)
    out = deg.merge(tri, on="node", how="left")
    out["n_tri"] = out["n_tri"].fillna(0).astype("int64")
    d = out["deg"].to_numpy(dtype=np.int64)
    t3 = out["n_tri"].to_numpy(dtype=np.int64)
    out["cc_e6"] = 2 * t3 * 1_000_000 // (d * (d - 1))
    return (out.astype({"node": "int64", "deg": "int64"})
            .sort_values("node").reset_index(drop=True)
            [["node", "deg", "n_tri", "cc_e6"]])


def clustering_coeff_sql() -> str:
    return (
        f"WITH e AS ({radius_join_sql()}), "
        "bi AS (SELECT id_a AS u, id_b AS v FROM e "
        "UNION ALL SELECT id_b, id_a FROM e), "
        "d AS (SELECT u, COUNT(*) AS deg FROM bi GROUP BY 1), "
        "ori AS (SELECT id_a AS u, id_b AS v FROM e), "
        "tri AS (SELECT a.u AS x, a.v AS y, b.v AS z FROM ori a "
        "JOIN ori b ON b.u = a.v JOIN ori c ON c.u = a.u AND c.v = b.v), "
        "n3 AS (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri "
        "UNION ALL SELECT z FROM tri), "
        "t AS (SELECT node, COUNT(*) AS n_tri FROM n3 GROUP BY 1) "
        "SELECT d.u AS node, d.deg, COALESCE(t.n_tri, 0) AS n_tri, "
        "2 * COALESCE(t.n_tri, 0) * 1000000 // (d.deg * (d.deg - 1)) AS cc_e6 "
        "FROM d LEFT JOIN t ON t.node = d.u WHERE d.deg >= 2"
    )


# --- skewed points: hotspot / IoU / dwell operators --------------------------

# integer micro-degree coordinates of the events_points grid (exact in SQL:
# pure int64 arithmetic on event_id, no float rounding on either side)
_X_SQL = "((event_id % 3600) * 100000 - 179950000)"
_Y_SQL = "(((event_id * 7) % 1800) * 100000 - 89950000)"


def _points_e6(sf_dir: str):
    """events -> (event_id, x, y) int64 micro-degree points (the
    events_points grid with zero float involvement)."""
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def fn(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = (eid % 3600) * 100000 - 179950000
        y = ((eid * 7) % 1800) * 100000 - 89950000
        return pa.table({"event_id": t["event_id"], "x": pa.array(x), "y": pa.array(y)})

    return ds.map_batches(fn, batch_format="pyarrow")


def skewed_points(sf_dir: str):
    """Deterministically SKEWED points: 30% of events (event_id % 10 < 3)
    land in a 5x5-degree 'city' at the origin (position from the hash low
    digits), the rest spread pseudo-uniformly like ``hashed_points`` — the
    SQL-expressible analogue of the datagen HOT_TILE skew, so density
    operators have a real hotspot to find."""
    from .relational import _kmv_hash

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def fn(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = _sqmod61(_kmv_hash(eid))
        city = (eid % 10) < 3
        lon = np.where(city, (g % 500) / 100.0, (g % 36000) / 100.0 - 180.0)
        lat = np.where(city, ((g // 500) % 500) / 100.0,
                       ((g // 36000) % 18000) / 100.0 - 90.0)
        return pa.table({"event_id": t["event_id"], "lon": pa.array(lon),
                         "lat": pa.array(lat)})

    return ds.map_batches(fn, batch_format="pyarrow")


def _skewed_pts_sql() -> str:
    """WITH-chain ending in ``spts(event_id, lon, lat)`` for skewed_points."""
    return (
        _kmv_sql_cte("event_id") + ", "
        "spts AS (SELECT event_id, "
        "CASE WHEN event_id % 10 < 3 THEN (g % 500) / 100.0 "
        "ELSE (g % 36000) / 100.0 - 180.0 END AS lon, "
        "CASE WHEN event_id % 10 < 3 THEN ((g // 500) % 500) / 100.0 "
        "ELSE ((g // 36000) % 18000) / 100.0 - 90.0 END AS lat FROM sq)"
    )


def q_hotspot_cells(sf_dir: str):
    """Grid-density HOTSPOT detection (Getis-Ord-style, integer-exact):
    count per res-4 cell over the skewed point set; a cell is hot iff its
    count exceeds mean + 2 population-std across occupied cells, evaluated
    in pure int64 arithmetic — with k cells, total S and sum-of-squares SS,
    hot ⟺ d = k*n - S > 0 AND d*d > 4*(k*SS - S*S) — so the oracle matches
    bit-exactly (no float sqrt on either side).

    Scale shape: per-cell counts are partial-combined inside map_batches
    (the shuffle moves #cells-per-batch rows, not points); the hot rule
    runs on the cell table, bounded by the GRID (4^res cells), not the
    corpus.  int64 overflows the d*d term at ~1e9 rows/cell — lift to
    float z-scores past that."""
    pts = skewed_points(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        cells = cell_encode(t["lon"].to_numpy(zero_copy_only=False),
                            t["lat"].to_numpy(zero_copy_only=False), 4)
        u, c = np.unique(cells, return_counts=True)
        return pa.table({"cell": pa.array(u), "n": pa.array(c.astype(np.int64))})

    from ray.data.aggregate import Sum

    counts = (pts.map_batches(partial, batch_format="pyarrow")
              .groupby("cell").aggregate(Sum("n", alias_name="n")).to_pandas())
    n = counts["n"].to_numpy(dtype=np.int64)
    k, s, ss = np.int64(len(n)), n.sum(), (n * n).sum()
    d = k * n - s
    hot = ((d > 0) & (d * d > 4 * (k * ss - s * s))).astype(np.int64)
    return pd.DataFrame({"cell": counts["cell"].astype("int64"),
                         "n": n, "hot": hot})


def hotspot_cells_sql() -> str:
    cell = cell_encode_sql("lon", "lat", 4)
    return (
        "WITH " + _skewed_pts_sql() + ", "
        f"c AS (SELECT {cell} AS cell, COUNT(*) AS n FROM spts GROUP BY 1), "
        "w AS (SELECT cell, n, COUNT(*) OVER () AS k, SUM(n) OVER () AS s, "
        "SUM(n * n) OVER () AS ss FROM c) "
        "SELECT cell, n, CAST(CASE WHEN k * n - s > 0 AND "
        "(k * n - s) * (k * n - s) > 4 * (k * ss - s * s) "
        "THEN 1 ELSE 0 END AS BIGINT) AS hot FROM w"
    )


MOSAIC_RES = 3  # bounded 4^res selection grid


def q_cell_mosaic(sf_dir: str):
    """BEST-OBSERVATION-PER-CELL mosaic selection — the "greenest pixel"
    compositing primitive of satellite mosaicking (per grid cell keep the
    single best-scored observation): cell = res-3 quadkey of the hashed
    point, winner = MAX ``value_e4`` with MIN ``event_id`` tie-break.

    Scale shape: the argmax is ONE PACKED int64 MAX —
    ``packed = (value_e4 << 32) + (2^31 - 1 - event_id)`` (value spacing
    2^32 strictly dominates the 2^31-bounded tie component, so packed
    order == (value DESC, event_id ASC); requires event_id < 2^31, the
    64-bit repack is the documented wider-id path) — per-batch pandas
    groupby-max partials, then one groupby-Max over O(cells) rows.  No
    row ever shuffles; the cell table is bounded by the GRID, not the
    corpus.  -> (cell, event_id, value_e4)."""
    from ray.data.aggregate import Max

    from ..functions.rounding import round_half_away
    from .relational import _kmv_hash

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "value"])
    TIE = np.int64(2**31 - 1)

    def prep(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = _sqmod61(_kmv_hash(eid))
        lon = (g % 36000) / 100.0 - 180.0
        lat = ((g // 36000) % 18000) / 100.0 - 90.0
        cells = cell_encode(lon, lat, MOSAIC_RES)
        v4 = round_half_away(
            t["value"].to_numpy(zero_copy_only=False) * 10000.0
        ).astype(np.int64)
        packed = (v4 << np.int64(32)) + (TIE - eid)
        p = (pd.DataFrame({"cell": cells, "packed": packed})
             .groupby("cell", sort=False)["packed"].max().reset_index())
        return pa.table({"cell": pa.array(p["cell"].to_numpy(np.int64)),
                         "packed": pa.array(p["packed"].to_numpy(np.int64))})

    out = (ds.map_batches(prep, batch_format="pyarrow")
           .groupby("cell").aggregate(Max("packed", alias_name="packed"))
           .to_pandas())
    if "cell" not in out.columns or not len(out):
        return pd.DataFrame({"cell": pd.Series(dtype="int64"),
                             "event_id": pd.Series(dtype="int64"),
                             "value_e4": pd.Series(dtype="int64")})
    packed = out["packed"].to_numpy(np.int64)
    return (pd.DataFrame({
        "cell": out["cell"].to_numpy(np.int64),
        "event_id": TIE - (packed & np.int64(0xFFFFFFFF)),
        "value_e4": packed >> np.int64(32),
    }).sort_values("cell").reset_index(drop=True))


def cell_mosaic_sql() -> str:
    cell = cell_encode_sql("lon", "lat", MOSAIC_RES)
    return (
        "WITH " + _kmv_sql_cte("event_id") + ", "
        "pts AS (SELECT event_id, (g % 36000) / 100.0 - 180.0 AS lon, "
        "((g // 36000) % 18000) / 100.0 - 90.0 AS lat FROM sq), "
        f"ev AS (SELECT p.event_id, {cell} AS cell, "
        "CAST(ROUND(e.value * 10000, 0) AS BIGINT) AS value_e4 "
        "FROM pts p JOIN events e ON e.event_id = p.event_id) "
        "SELECT cell, event_id, value_e4 FROM (SELECT *, ROW_NUMBER() OVER ("
        "PARTITION BY cell ORDER BY value_e4 DESC, event_id) AS rn FROM ev) "
        "WHERE rn = 1"
    )


IOU_MIN_E6 = 200_000
IOU_HALF_W = 800_000  # half-extents of the fixed footprint, micro-degrees
IOU_HALF_H = 600_000


def iou_pairs(sf_dir: str) -> "rd.Dataset":
    """DATASET-RETURNING bounding-box IoU self-join — the dedup/NMS
    primitive of detection pipelines: every event gets a fixed ±0.8°x0.6°
    footprint in integer micro-degrees; pairs whose CENTERS share a res-4
    cell and whose IoU ≥ 0.2 emit (id_a, id_b, iou_e6), IoU exact integer
    (inter*1e6 // union).  Returns a streaming Dataset (Arrow blocks) so
    the primitive composes into pipelines without driver materialization;
    ``q_iou_join`` is the DataFrame boundary for the oracle harness.

    Scale shape: ONE cell-keyed shuffle, per-cell all-pairs with
    vectorized triu indices.  The cell res is the density knob — raise it
    with point density so per-cell candidates stay bounded; boxes spanning
    cell borders pair only via their center cell (the documented
    predicate, mirrored exactly in SQL)."""
    pts = _points_e6(sf_dir)

    def prep(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        cells = cell_encode(x / 1e6, y / 1e6, 4)
        return t.append_column("cell", pa.array(cells))

    area2 = np.int64(2) * (2 * IOU_HALF_W) * (2 * IOU_HALF_H)

    def pairs_in_cell(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id", kind="stable")
        ids = g["event_id"].to_numpy(dtype=np.int64)
        x = g["x"].to_numpy(dtype=np.int64)
        y = g["y"].to_numpy(dtype=np.int64)
        m = len(g)
        if m < 2:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "iou_e6": pd.Series(dtype="int64")})
        i, j = np.triu_indices(m, 1)
        iw = np.maximum(0, 2 * IOU_HALF_W - np.abs(x[i] - x[j]))
        ih = np.maximum(0, 2 * IOU_HALF_H - np.abs(y[i] - y[j]))
        inter = iw * ih
        union = area2 - inter
        keep = inter * 1_000_000 >= IOU_MIN_E6 * union
        return pd.DataFrame({"id_a": ids[i[keep]], "id_b": ids[j[keep]],
                             "iou_e6": inter[keep] * 1_000_000 // union[keep]})

    return (pts.map_batches(prep, batch_format="pyarrow")
            .groupby("cell").map_groups(pairs_in_cell, batch_format="pandas")
            # re-block to Arrow: map_groups emits pandas blocks, which feed
            # downstream groupbys ~25x slower than Arrow (measured, see
            # q_copurchase) — the primitive should compose cheaply
            .map_batches(lambda t: t, batch_format="pyarrow"))


def q_iou_join(sf_dir: str):
    """DataFrame boundary over :func:`iou_pairs` (the oracle-comparable
    queries() surface; the primitive itself streams)."""
    pdf = iou_pairs(sf_dir).to_pandas()
    if "id_a" not in pdf.columns:  # 0 pairs: Ray to_pandas drops the schema
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                             "id_b": pd.Series(dtype="int64"),
                             "iou_e6": pd.Series(dtype="int64")})
    return pdf.astype({"id_a": "int64", "id_b": "int64", "iou_e6": "int64"})


def iou_join_sql() -> str:
    cell = cell_encode_sql("x / 1000000.0", "y / 1000000.0", 4)
    w2, h2 = 2 * IOU_HALF_W, 2 * IOU_HALF_H
    return (
        f"WITH p AS (SELECT event_id, {_X_SQL} AS x, {_Y_SQL} AS y FROM events), "
        f"pc AS (SELECT event_id, x, y, {cell} AS cell FROM p), "
        "j AS (SELECT a.event_id AS id_a, b.event_id AS id_b, "
        f"GREATEST(CAST(0 AS BIGINT), {w2} - ABS(a.x - b.x)) "
        f"* GREATEST(CAST(0 AS BIGINT), {h2} - ABS(a.y - b.y)) AS inter "
        "FROM pc a JOIN pc b ON a.cell = b.cell AND a.event_id < b.event_id) "
        "SELECT id_a, id_b, "
        f"inter * 1000000 // (CAST(2 AS BIGINT) * {w2} * {h2} - inter) AS iou_e6 "
        f"FROM j WHERE inter * 1000000 >= {IOU_MIN_E6} "
        f"* (CAST(2 AS BIGINT) * {w2} * {h2} - inter)"
    )


DWELL_EPS_E6 = 60_000_000  # 60 degrees in micro-degrees


def q_dwell_points(sf_dir: str):
    """Trajectory DWELL / stay-point detection: a point is a dwell iff both
    its predecessor and successor (per user, ordered by ts with event_id
    tie-break) lie within 60° Euclidean distance — the stop-detection
    primitive of movement analytics.  ONE user-bucketed shuffle; inside
    each bucket the prev/next coordinates come from a vectorized
    pandas groupby-shift (no per-row loop).  -> (event_id, user_id) of
    dwell points."""
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "user_id", "ts"])
    eps2 = np.int64(DWELL_EPS_E6) ** 2

    def add_xy(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = (eid % 3600) * 100000 - 179950000
        y = ((eid * 7) % 1800) * 100000 - 89950000
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"event_id": t["event_id"], "user_id": t["user_id"],
                         "ts": t["ts"], "x": pa.array(x), "y": pa.array(y),
                         "ub": pa.array(uid % 64)})

    def dwell_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        by = g.groupby("user_id", sort=False)
        px, py = by["x"].shift(1), by["y"].shift(1)
        nx, ny = by["x"].shift(-1), by["y"].shift(-1)
        dp = (g["x"] - px) ** 2 + (g["y"] - py) ** 2
        dn = (g["x"] - nx) ** 2 + (g["y"] - ny) ** 2
        keep = (dp <= eps2) & (dn <= eps2)  # NaN (no prev/next) -> False
        out = g.loc[keep.fillna(False), ["event_id", "user_id"]]
        return out.astype({"event_id": "int64", "user_id": "int64"})

    out = (ds.map_batches(add_xy, batch_format="pyarrow")
           .groupby("ub").map_groups(dwell_bucket, batch_format="pandas"))
    pdf = out.to_pandas()
    if "event_id" not in pdf.columns:
        return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                             "user_id": pd.Series(dtype="int64")})
    return pdf.astype({"event_id": "int64", "user_id": "int64"})


def dwell_points_sql() -> str:
    e2 = DWELL_EPS_E6 * DWELL_EPS_E6
    return (
        f"WITH p AS (SELECT event_id, user_id, ts, {_X_SQL} AS x, {_Y_SQL} AS y "
        "FROM events), "
        "w AS (SELECT event_id, user_id, x, y, "
        "LAG(x) OVER u AS px, LAG(y) OVER u AS py, "
        "LEAD(x) OVER u AS nx, LEAD(y) OVER u AS ny "
        "FROM p WINDOW u AS (PARTITION BY user_id ORDER BY ts, event_id)) "
        "SELECT event_id, user_id FROM w "
        "WHERE px IS NOT NULL AND nx IS NOT NULL "
        f"AND (x - px) * (x - px) + (y - py) * (y - py) <= {e2} "
        f"AND (x - nx) * (x - nx) + (y - ny) * (y - ny) <= {e2}"
    )


OD_RES = 2  # 4^2 = coarse flow grid; raise with point density


def q_od_matrix(sf_dir: str):
    """ORIGIN-DESTINATION FLOW MATRIX (the movement-analytics aggregate:
    for every user's consecutive event pair, count transitions between
    res-2 grid cells, stays included): -> (cell_from, cell_to, n_trips).

    Scale shape: ONE user-bucketed shuffle (crc-free ``user_id % 64``
    buckets like dwell_points); inside each bucket the next-event
    coordinates come from a vectorized pandas groupby-shift (no row
    loop), and each bucket emits value_counts PARTIALS over (from, to)
    cells — the final groupby moves O(occupied cell-pairs) rows, bounded
    by the GRID squared, not the event corpus."""
    from ray.data.aggregate import Sum as _Sum

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "user_id", "ts"])

    def add_xy(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = (eid % 3600) * 100000 - 179950000
        y = ((eid * 7) % 1800) * 100000 - 89950000
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"event_id": t["event_id"], "user_id": t["user_id"],
                         "ts": t["ts"], "x": pa.array(x), "y": pa.array(y),
                         "ub": pa.array(uid % 64)})

    def flows_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        by = g.groupby("user_id", sort=False)
        nx, ny = by["x"].shift(-1), by["y"].shift(-1)
        m = nx.notna()
        if not m.any():
            return pd.DataFrame({"cell_from": pd.Series(dtype="int64"),
                                 "cell_to": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        cf = cell_encode(g.loc[m, "x"].to_numpy(np.int64) / 1e6,
                         g.loc[m, "y"].to_numpy(np.int64) / 1e6, OD_RES)
        ct = cell_encode(nx[m].to_numpy(np.int64) / 1e6,
                         ny[m].to_numpy(np.int64) / 1e6, OD_RES)
        p = (pd.DataFrame({"cell_from": cf, "cell_to": ct})
             .value_counts().reset_index(name="n"))
        return p.astype({"cell_from": "int64", "cell_to": "int64",
                         "n": "int64"})

    out = (ds.map_batches(add_xy, batch_format="pyarrow")
           .groupby("ub").map_groups(flows_bucket, batch_format="pandas")
           .map_batches(lambda t: t, batch_format="pyarrow")
           .groupby(["cell_from", "cell_to"])
           .aggregate(_Sum("n", alias_name="n_trips"))
           .to_pandas())
    if "cell_from" not in out.columns or not len(out):
        return pd.DataFrame({"cell_from": pd.Series(dtype="int64"),
                             "cell_to": pd.Series(dtype="int64"),
                             "n_trips": pd.Series(dtype="int64")})
    return (out.astype({"cell_from": "int64", "cell_to": "int64",
                        "n_trips": "int64"})
            .sort_values(["cell_from", "cell_to"], kind="stable")
            .reset_index(drop=True))


def od_matrix_sql() -> str:
    cf = cell_encode_sql("x / 1000000.0", "y / 1000000.0", OD_RES)
    ct = cell_encode_sql("nx / 1000000.0", "ny / 1000000.0", OD_RES)
    return (
        f"WITH p AS (SELECT user_id, ts, event_id, {_X_SQL} AS x, "
        f"{_Y_SQL} AS y FROM events), "
        "w AS (SELECT user_id, x, y, LEAD(x) OVER u AS nx, "
        "LEAD(y) OVER u AS ny FROM p "
        "WINDOW u AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        f"t AS (SELECT {cf} AS cell_from, {ct} AS cell_to FROM w "
        "WHERE nx IS NOT NULL) "
        "SELECT cell_from, cell_to, COUNT(*) AS n_trips FROM t GROUP BY 1, 2"
    )


def q_augment_digest(sf_dir: str):
    """Deterministic per-epoch AUGMENTATION audit over the documents-derived
    images table (rows-only: pixel decode is not SQL-expressible): run the
    training-loader transform (seeded hflip + random crop, all randomness
    from splitmix64(image_id, epoch) so any worker/retry/cluster-size
    reproduces byte-identical pixels) and reduce each augmented image to an
    integer digest (crop params, flip, augmented pixel sum) — the audit
    record a reproducible-training pipeline ships with every epoch.
    Independent oracle: tests/test_operators.py::TestAugment (determinism +
    epoch sensitivity) and TestAugmentDigest (local-decode recompute)."""
    from ..codec.raster import decode_image
    from ..pipelines.spatial_catalog import images_from_documents
    from ..stages.multimodal import augment_images

    images = images_from_documents(sf_dir, "/tmp/scbr-query-cache")
    aug = augment_images(rd.read_parquet(images), epoch=3)

    def digest(t: pa.Table) -> pa.Table:
        sums = np.empty(t.num_rows, dtype=np.int64)
        for i in range(t.num_rows):  # per-row opaque binary decode
            px = decode_image(t["bytes"][i].as_py(), "raw")
            sums[i] = int(px.astype(np.int64).sum())
        return pa.table({
            "image_id": t["image_id"],
            "h": pc.cast(t["h"], pa.int64()),
            "w": pc.cast(t["w"], pa.int64()),
            "flip": pc.cast(t["flip"], pa.int64()),
            "crop_y": pc.cast(t["crop_y"], pa.int64()),
            "crop_x": pc.cast(t["crop_x"], pa.int64()),
            "px_sum": pa.array(sums),
        })

    out = aug.map_batches(digest, batch_format="pyarrow").to_pandas()
    return out.sort_values("image_id").reset_index(drop=True)


# the two non-global AOIs (aoi_world covers every point, which would make
# nearest-AOI degenerate) in integer micro-degrees, mirrored in SQL
NEAREST_AOIS = [("aoi_mid", -30_000_000, -20_000_000, 30_000_000, 20_000_000),
                ("aoi_ne", 100_000_000, 40_000_000, 170_000_000, 85_000_000)]


def q_nearest_aoi(sf_dir: str):
    """NEAREST-AOI assignment: each event point gets the closest AOI
    rectangle by exact integer squared distance-to-box (0 inside; ties
    break on aoi_id) — the proximity-join that routes observations to
    their operating region.  The AOI set broadcasts (tiny); one
    embarrassingly-parallel vectorized pass, no shuffle.
    -> (event_id, aoi_id, d2)."""
    pts = _points_e6(sf_dir)

    def assign(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        best_d = np.full(len(x), np.iinfo(np.int64).max, dtype=np.int64)
        best_a = np.empty(len(x), dtype=object)
        for aid, w, s, e, n in NEAREST_AOIS:  # ascending aoi_id == tie order
            dx = np.maximum(0, np.maximum(w - x, x - e))
            dy = np.maximum(0, np.maximum(s - y, y - n))
            d2 = dx * dx + dy * dy
            m = d2 < best_d
            best_d[m] = d2[m]
            best_a[m] = aid
        return pa.table({"event_id": t["event_id"],
                         "aoi_id": pa.array(list(best_a), pa.string()),
                         "d2": pa.array(best_d)})

    return pts.map_batches(assign, batch_format="pyarrow")


def nearest_aoi_sql() -> str:
    vals = ", ".join(f"('{a}', CAST({w} AS BIGINT), CAST({s} AS BIGINT), "
                     f"CAST({e} AS BIGINT), CAST({n} AS BIGINT))"
                     for a, w, s, e, n in NEAREST_AOIS)
    return (
        f"WITH p AS (SELECT event_id, {_X_SQL} AS x, {_Y_SQL} AS y FROM events), "
        f"aois(aoi_id, w, s, e, n) AS (VALUES {vals}), "
        "d AS (SELECT p.event_id, a.aoi_id, "
        "GREATEST(CAST(0 AS BIGINT), a.w - p.x, p.x - a.e) AS dx, "
        "GREATEST(CAST(0 AS BIGINT), a.s - p.y, p.y - a.n) AS dy "
        "FROM p CROSS JOIN aois a) "
        "SELECT event_id, aoi_id, dx*dx + dy*dy AS d2 FROM d "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY event_id "
        "ORDER BY dx*dx + dy*dy, aoi_id) = 1"
    )


KCORE_K = 3
KCORE_RADIUS = 4.0
KCORE_SQL_ROUNDS = 12  # oracle unroll; Ray iterates to convergence (peel
# rounds measured 2 @sf0.001 / 8 @sf0.01; extra rounds are no-ops because
# peeling is monotone, so a generous unroll stays exact)


def kcore_members(sf_dir: str, driver_edge_limit: int = 5_000_000,
                  driver_node_limit: int = 50_000_000) -> "rd.Dataset":
    """k-CORE decomposition (k=3) of the radius-4 proximity graph — the
    density filter of graph curation (drop every node whose degree inside
    the surviving subgraph is < k, to a fixpoint).  Completes the graph
    family (pagerank / components / triangles) with the iterative-PEELING
    archetype.

    THREE-TIER AUTO-ROUTE (like ``neardup_cluster_labels``/``kmeans``):

    1. edges <= ``driver_edge_limit``: local peel (bincount degrees +
       boolean masks — each Ray round costs ~1 s of job launch vs
       microseconds of compute at that size; measured 43 s -> ~4 s at
       sf0.01).
    2. nodes <= ``driver_node_limit``: DEGREE-VECTOR route — the edge list
       stays distributed (materialized once) and the driver holds only the
       O(#nodes) degree table; each round broadcasts the surviving-node
       set (``ray.put`` once, read per actor) and one map-batches pass
       re-counts filtered degrees with per-batch partials + a tiny
       groupby.  No per-round edge materialization, no joins — the right
       shape for DENSE graphs (edges >> nodes), which is exactly when
       k-core pruning is wanted.  Replaced the join-per-round path after
       it measured 17 s for a single round on 7.7M edges at sf0.1 (three
       full-shuffle materializations per round) vs ~2 s per re-count pass.
    3. else: fully-distributed loop — every round one degree groupby +
       two partitioned semi-joins (edges ⋈ surviving nodes per endpoint),
       nothing driver-held but the round's drop COUNT.

    Rounds are data-bounded (monotone peel); all paths equality-tested.
    Oracle: the same peel unrolled ``KCORE_SQL_ROUNDS`` times in SQL
    (extra rounds no-op).  Returns a DATASET of (node, core_deg) k-core
    members so the primitive composes into pipelines (tier 3's result
    never touches the driver; tiers 1-2 wrap their route-bounded driver
    frames); ``q_kcore`` is the DataFrame boundary for the harness."""
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    from ..stages.dedup import _compact_nonempty
    from .relational import cluster_partitions

    def _empty_core() -> "rd.Dataset":
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "core_deg": pa.array([], pa.int64())}))

    edges = proximity_edges(sf_dir, KCORE_RADIUS)

    def explode(t: pa.Table) -> pa.Table:
        a = t["id_a"].combine_chunks()
        b = t["id_b"].combine_chunks()
        return pa.table({"u": pa.concat_arrays([a, b]),
                         "v": pa.concat_arrays([b, a])})

    bi_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])
    bi = _compact_nonempty(
        edges.map_batches(explode, batch_format="pyarrow").materialize(),
        fallback_schema=bi_schema)
    if bi.count() <= driver_edge_limit:
        pdf = bi.to_pandas()
        if pdf.empty:
            return _empty_core()
        ids, inv = np.unique(
            np.concatenate([pdf["u"].to_numpy(np.int64),
                            pdf["v"].to_numpy(np.int64)]), return_inverse=True)
        ui, vi = inv[:len(pdf)], inv[len(pdf):]
        alive_e = np.ones(len(ui), dtype=bool)
        while True:
            deg = np.bincount(ui[alive_e], minlength=len(ids))
            keep = deg >= KCORE_K
            ne = alive_e & keep[ui] & keep[vi]
            if ne.sum() == alive_e.sum():
                break
            alive_e = ne
        deg = np.bincount(ui[alive_e], minlength=len(ids))
        m = deg >= KCORE_K
        return rd.from_pandas(
            pd.DataFrame({"node": ids[m], "core_deg": deg[m]})
            .astype({"node": "int64", "core_deg": "int64"})
            .sort_values("node").reset_index(drop=True))

    deg_schema = pa.schema([("u", pa.int64()), ("deg", pa.int64())])

    def _degree_table(ds, keep_ref=None) -> pd.DataFrame:
        """One pass over the distributed edge list -> (u, deg) frame.
        ``keep_ref`` broadcasts the surviving-node array; per-batch partial
        value_counts keep the groupby input O(batches x nodes-in-batch)."""

        class DegPartial:
            def __init__(self):
                self.keep = (None if keep_ref is None
                             else ray.get(keep_ref))

            def __call__(self, t: pa.Table) -> pa.Table:
                u, v = t["u"], t["v"]
                if self.keep is not None:
                    m = pc.and_(pc.is_in(u, value_set=self.keep),
                                pc.is_in(v, value_set=self.keep))
                    u = u.filter(m)
                vc = pd.Series(u.to_numpy(zero_copy_only=False)).value_counts()
                return pa.table({"u": pa.array(vc.index.to_numpy(np.int64)),
                                 "deg": pa.array(vc.to_numpy(np.int64))})

        out = _compact_nonempty(
            ds.map_batches(DegPartial, batch_format="pyarrow",
                           concurrency=(1, 8))
            .groupby("u").aggregate(_Sum("deg", alias_name="deg"))
            .materialize(),
            fallback_schema=deg_schema)
        pdf = out.to_pandas()
        if pdf.empty:
            return pd.DataFrame({"u": pd.Series(dtype="int64"),
                                 "deg": pd.Series(dtype="int64")})
        return pdf.astype({"u": "int64", "deg": "int64"})

    deg0 = _degree_table(bi)
    if len(deg0) <= driver_node_limit:
        deg = deg0
        while True:
            survivors = deg.loc[deg["deg"] >= KCORE_K, "u"]
            if len(survivors) == len(deg):  # fixpoint: nothing peeled
                return rd.from_pandas(
                    pd.DataFrame({"node": deg["u"], "core_deg": deg["deg"]})
                    .sort_values("node").reset_index(drop=True))
            if survivors.empty:
                return _empty_core()
            keep_ref = ray.put(pa.array(survivors.to_numpy(np.int64)))
            deg = _degree_table(bi, keep_ref)
    nparts = cluster_partitions()
    deg_schema = pa.schema([("u", pa.int64()), ("deg", pa.int64())])
    while True:
        deg = _compact_nonempty(
            bi.groupby("u").aggregate(_Count(alias_name="deg")).materialize(),
            fallback_schema=deg_schema)
        n_nodes = deg.count()
        keep = _compact_nonempty(
            deg.map_batches(
                lambda t: pa.table({"ku": t["u"].filter(
                    pc.greater_equal(t["deg"], KCORE_K))}),
                batch_format="pyarrow").materialize(),
            fallback_schema=pa.schema([("ku", pa.int64())]))
        n_keep = keep.count()
        if n_keep == 0:
            return _empty_core()
        if n_keep == n_nodes:  # fixpoint: nothing peeled this round
            # distributed result stays distributed: one rename pass, no
            # driver gather (round-4 directive #7)
            return deg.map_batches(
                lambda t: pa.table({"node": t["u"], "core_deg": t["deg"]}),
                batch_format="pyarrow")
        bi = _compact_nonempty(
            (bi.join(keep, join_type="inner", num_partitions=nparts,
                     on=("u",), right_on=("ku",))
             .join(keep, join_type="inner", num_partitions=nparts,
                   on=("v",), right_on=("ku",))
             .select_columns(["u", "v"])).materialize(),
            fallback_schema=bi_schema)


def q_kcore(sf_dir: str, driver_edge_limit: int = 5_000_000,
            driver_node_limit: int = 50_000_000):
    """DataFrame boundary over :func:`kcore_members` (the oracle-comparable
    queries() surface; the primitive itself returns a Dataset)."""
    pdf = kcore_members(sf_dir, driver_edge_limit=driver_edge_limit,
                        driver_node_limit=driver_node_limit).to_pandas()
    if "node" not in pdf.columns:  # 0 members: Ray to_pandas drops schema
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "core_deg": pd.Series(dtype="int64")})
    return (pdf.astype({"node": "int64", "core_deg": "int64"})
            .sort_values("node").reset_index(drop=True))


def kcore_sql() -> str:
    sql = (
        "WITH " + _kmv_sql_cte("event_id") + ", "
        "pts AS (SELECT event_id, (g % 36000) / 100.0 - 180.0 AS lon, "
        "((g // 36000) % 18000) / 100.0 - 90.0 AS lat FROM sq), "
        "e AS MATERIALIZED (SELECT a.event_id AS u, b.event_id AS v "
        "FROM pts a JOIN pts b ON a.event_id < b.event_id "
        "AND (a.lon-b.lon)*(a.lon-b.lon)+(a.lat-b.lat)*(a.lat-b.lat) "
        f"<= {KCORE_RADIUS * KCORE_RADIUS}), "
        "e0 AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e)"
    )
    prev = "e0"
    for r in range(1, KCORE_SQL_ROUNDS + 1):
        sql += (f", a{r} AS MATERIALIZED (SELECT u FROM {prev} "
                f"GROUP BY u HAVING COUNT(*) >= {KCORE_K})"
                f", e{r} AS MATERIALIZED (SELECT x.u, x.v FROM {prev} x "
                f"JOIN a{r} p ON p.u = x.u JOIN a{r} q ON q.u = x.v)")
        prev = f"e{r}"
    return (sql + f" SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS core_deg "
            f"FROM {prev} GROUP BY 1")


BFS_SEED_MOD = 97   # seeds: event_id % 97 == 0 (hop 0)
BFS_MAX_HOPS = 6    # bounded horizon == the SQL twin's unroll depth


def q_bfs_hops(sf_dir: str, driver_edge_limit: int = 5_000_000):
    """BOUNDED-HOP BFS (seed-set shortest hop distance) over the radius-4
    proximity graph: seeds are events with ``event_id % 97 == 0`` (hop
    0); every node within <= ``BFS_MAX_HOPS`` hops gets its EXACT hop —
    the reachability/expansion primitive, and the FRONTIER-ITERATION
    archetype completing the graph family (pagerank = fixed rounds,
    components = label fixpoint, kcore = monotone peel).

    AUTO-ROUTE like kcore (both routes equality-tested):
    - edges <= ``driver_edge_limit``: LOCAL numpy BFS — sorted edge
      arrays, each round one fully-vectorized ragged gather
      (searchsorted bounds + np.repeat index arithmetic, no per-node
      loop); Ray round-launch overhead dominates compute at this size.
    - else: DISTRIBUTED bounded Bellman-Ford — exactly ``BFS_MAX_HOPS``
      rounds of (edges ⋈ frontier on u -> candidate v at hop r) + a
      min-groupby union; nothing driver-held.  Frontier-only expansion
      is an optimization of the same recurrence (settled nodes can only
      re-derive larger hops), so it matches the SQL unroll exactly.

    The shared epsilon-join comes from the session edge cache.
    -> (node, hop), hop <= 6, seeds included even when isolated."""
    import ray
    from ray.data.aggregate import Min as _Min

    from ..stages.dedup import _compact_nonempty

    edges = proximity_edges(sf_dir, KCORE_RADIUS)

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id"])

    def seed_batch(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = ids[ids % BFS_SEED_MOD == 0]
        return pa.table({"node": pa.array(s),
                         "hop": pa.array(np.zeros(len(s), np.int64))})

    hop_schema = pa.schema([("node", pa.int64()), ("hop", pa.int64())])
    seeds_ds = _compact_nonempty(
        ev.map_batches(seed_batch, batch_format="pyarrow").materialize(),
        fallback_schema=hop_schema)

    if edges.count() <= driver_edge_limit:
        ep = edges.to_pandas()
        sp = seeds_ds.to_pandas()
        seeds = (np.unique(sp["node"].to_numpy(np.int64)) if len(sp)
                 else np.array([], np.int64))
        if len(ep):
            a = ep["id_a"].to_numpy(np.int64)
            b = ep["id_b"].to_numpy(np.int64)
            u = np.concatenate([a, b])
            v = np.concatenate([b, a])
            order = np.argsort(u, kind="stable")
            us, vs = u[order], v[order]
        else:
            us = vs = np.array([], np.int64)
        nodes, hops = [seeds], [np.zeros(len(seeds), np.int64)]
        visited, frontier = seeds, seeds
        for r in range(1, BFS_MAX_HOPS + 1):
            if not len(frontier):
                break
            lo = np.searchsorted(us, frontier, "left")
            hi = np.searchsorted(us, frontier, "right")
            cnt = hi - lo
            total = int(cnt.sum())
            if total == 0:
                break
            # vectorized ragged gather of every frontier node's neighbors
            starts = np.repeat(lo, cnt)
            offs = np.arange(total) - np.repeat(
                np.concatenate([[0], cnt.cumsum()[:-1]]), cnt)
            neigh = np.unique(vs[starts + offs])
            new = neigh[~np.isin(neigh, visited, assume_unique=True)]
            if not len(new):
                break
            nodes.append(new)
            hops.append(np.full(len(new), r, np.int64))
            visited = np.union1d(visited, new)
            frontier = new
        return (pd.DataFrame({"node": np.concatenate(nodes),
                              "hop": np.concatenate(hops)})
                .astype({"node": "int64", "hop": "int64"})
                .sort_values("node").reset_index(drop=True))

    def explode(t: pa.Table) -> pa.Table:
        a = t["id_a"].combine_chunks()
        b = t["id_b"].combine_chunks()
        return pa.table({"u": pa.concat_arrays([a, b]),
                         "v": pa.concat_arrays([b, a])})

    bi = _compact_nonempty(
        edges.map_batches(explode, batch_format="pyarrow").materialize(),
        fallback_schema=pa.schema([("u", pa.int64()), ("v", pa.int64())]))
    hops = seeds_ds
    for r in range(1, BFS_MAX_HOPS + 1):
        rr = np.int64(r)

        def front(t: pa.Table, rr=rr) -> pa.Table:
            m = pc.equal(t["hop"], pa.scalar(int(rr) - 1, pa.int64()))
            return pa.table({"fu": t["node"].filter(m)})

        frontier = _compact_nonempty(
            hops.map_batches(front, batch_format="pyarrow").materialize(),
            fallback_schema=pa.schema([("fu", pa.int64())]))
        if frontier.count() == 0:
            break
        from .relational import cluster_partitions

        cand = (bi.join(frontier, join_type="inner",
                        num_partitions=cluster_partitions(),
                        on=("u",), right_on=("fu",)))

        def as_hop(t: pa.Table, rr=rr) -> pa.Table:
            n = len(t)
            return pa.table({"node": t["v"],
                             "hop": pa.array(np.full(n, rr, np.int64))})

        cand = _compact_nonempty(
            cand.map_batches(as_hop, batch_format="pyarrow").materialize(),
            fallback_schema=hop_schema)
        hops = _compact_nonempty(
            hops.union(cand).groupby("node")
            .aggregate(_Min("hop", alias_name="hop")).materialize(),
            fallback_schema=hop_schema)
    out = hops.to_pandas()
    if "node" not in out.columns:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "hop": pd.Series(dtype="int64")})
    return (out.astype({"node": "int64", "hop": "int64"})
            .sort_values("node").reset_index(drop=True))


def bfs_hops_sql() -> str:
    sql = (
        "WITH " + _kmv_sql_cte("event_id") + ", "
        "pts AS (SELECT event_id, (g % 36000) / 100.0 - 180.0 AS lon, "
        "((g // 36000) % 18000) / 100.0 - 90.0 AS lat FROM sq), "
        "e AS MATERIALIZED (SELECT a.event_id AS u, b.event_id AS v "
        "FROM pts a JOIN pts b ON a.event_id < b.event_id "
        "AND (a.lon-b.lon)*(a.lon-b.lon)+(a.lat-b.lat)*(a.lat-b.lat) "
        f"<= {KCORE_RADIUS * KCORE_RADIUS}), "
        "bi AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e), "
        "h0 AS (SELECT event_id AS node, CAST(0 AS BIGINT) AS hop "
        f"FROM events WHERE event_id % {BFS_SEED_MOD} = 0)"
    )
    prev = "h0"
    for r in range(1, BFS_MAX_HOPS + 1):
        sql += (f", h{r} AS MATERIALIZED (SELECT node, MIN(hop) AS hop "
                f"FROM (SELECT node, hop FROM {prev} UNION ALL "
                f"SELECT bi.v AS node, p.hop + 1 AS hop FROM bi "
                f"JOIN {prev} p ON bi.u = p.node) GROUP BY node)")
        prev = f"h{r}"
    return sql + f" SELECT node, hop FROM {prev}"


def q_frame_sample(sf_dir: str):
    """VIDEO-style frame sampling made driver-visible (rows-only: binary
    payload layout is not SQL-expressible): each documents-derived image
    becomes a 4-frame clip (the raw frame repeated with a per-frame integer
    brightness step — deterministic, no codecs), FrameSampleStage explodes
    every 2nd frame to its own row, and each kept frame reduces to an
    integer digest.  The container-format path (ffmpeg) stays a documented
    capability gate; this exercises the REAL plumbing: payload slicing,
    flat-map explode, per-frame schema.  Independent oracle:
    tests/test_operators.py::TestFrameSampleQuery (local recompute)."""
    from ..codec.raster import decode_image
    from ..pipelines.spatial_catalog import images_from_documents
    from ..stages.multimodal import FrameSampleStage

    images = images_from_documents(sf_dir, "/tmp/scbr-query-cache")
    ds = rd.read_parquet(images)

    def to_clip(t: pa.Table) -> pa.Table:
        ids, bufs, ws, hs = [], [], [], []
        for i in range(t.num_rows):  # per-row opaque binary decode
            px = decode_image(t["bytes"][i].as_py(), t["fmt"][i].as_py())
            h, w = px.shape
            frames = [((px.astype(np.int64) + 7 * f) % 65536).astype("<u2")
                      for f in range(4)]
            ids.append(t["image_id"][i].as_py())
            bufs.append(b"".join(f.tobytes() for f in frames))
            ws.append(w)
            hs.append(h)
        return pa.table({"image_id": pa.array(ids, pa.string()),
                         "bytes": pa.array(bufs, pa.binary()),
                         "w": pa.array(ws, pa.int32()),
                         "h": pa.array(hs, pa.int32())})

    sampled = ds.map_batches(to_clip, batch_format="pyarrow").map_batches(
        FrameSampleStage, fn_constructor_kwargs={"stride": 2},
        batch_format="pyarrow", concurrency=(1, 4))

    def digest(t: pa.Table) -> pa.Table:
        sums = np.empty(t.num_rows, dtype=np.int64)
        for i in range(t.num_rows):
            arr = np.frombuffer(t["bytes"][i].as_py(), dtype="<u2")
            sums[i] = int(arr.astype(np.int64).sum())
        return pa.table({"image_id": t["image_id"],
                         "frame": pc.cast(t["frame"], pa.int64()),
                         "px_sum": pa.array(sums)})

    out = sampled.map_batches(digest, batch_format="pyarrow").to_pandas()
    return out.sort_values(["image_id", "frame"]).reset_index(drop=True)


IDW_RADIUS = 15.0  # degrees: search radius of the interpolation
IDW_GRID_LONS = 6
IDW_GRID_LATS = 4


def q_idw(sf_dir: str):
    """INVERSE-DISTANCE-WEIGHTED interpolation of the event value field at a
    fixed query grid (the gridding/resampling primitive of geospatial
    analytics: estimate a surface from scattered observations).  For each of
    the 24 grid nodes, value = sum(w_i * v_i) / sum(w_i) over points within
    ``IDW_RADIUS``, w = 1/d^2.

    Distribution shape: the GRID is broadcast (it is tiny and fixed); each
    batch computes its (batch x grid) distance block vectorized and emits
    per-node partial sums; one tiny groupby folds them.  EXACTNESS: the
    weighted terms are quantized per row to integers (num * 1e4, den * 1e8
    — bounds checked against the value range and worst-case point density)
    so the sums are order-independent int64 and the final ratio is computed
    once from exact integers; per-row float arithmetic (hash -> lon/lat ->
    d2 -> w) is IEEE-identical across engines.  Grid nodes are offset by
    0.005 deg so no point (0.01-deg lattice) can sit at distance zero."""
    from ray.data.aggregate import Sum as _Sum

    from ..functions.rounding import round_half_away
    from .relational import _kmv_hash

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "value"])
    gx = -150.005 + 60.0 * np.arange(IDW_GRID_LONS)
    gy = -60.005 + 40.0 * np.arange(IDW_GRID_LATS)
    gxx, gyy = np.meshgrid(gx, gy)           # shape (lats, lons)
    gid = (np.arange(IDW_GRID_LONS)[None, :]
           + IDW_GRID_LONS * np.arange(IDW_GRID_LATS)[:, None])
    gxf, gyf, gidf = gxx.ravel(), gyy.ravel(), gid.ravel()

    def partials(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = _sqmod61(_kmv_hash(eid))
        lon = (g % 36000) / 100.0 - 180.0
        lat = ((g // 36000) % 18000) / 100.0 - 90.0
        v = t["value"].to_numpy(zero_copy_only=False)
        dx = lon[:, None] - gxf[None, :]
        dy = lat[:, None] - gyf[None, :]
        d2 = dx * dx + dy * dy
        m = d2 <= IDW_RADIUS * IDW_RADIUS
        rows = []
        for j in range(len(gidf)):
            mj = m[:, j]
            if not mj.any():
                continue
            w = 1.0 / d2[mj, j]
            num = round_half_away(w * v[mj] * 10000.0).astype(np.int64)
            den = round_half_away(w * 100000000.0).astype(np.int64)
            rows.append((int(gidf[j]), int(num.sum()), int(den.sum()),
                         int(mj.sum())))
        if not rows:
            return pa.table({"grid_id": pa.array([], pa.int64()),
                             "num_e4": pa.array([], pa.int64()),
                             "den_e8": pa.array([], pa.int64()),
                             "n_pts": pa.array([], pa.int64())})
        a = np.array(rows, dtype=np.int64)
        return pa.table({"grid_id": pa.array(a[:, 0]),
                         "num_e4": pa.array(a[:, 1]),
                         "den_e8": pa.array(a[:, 2]),
                         "n_pts": pa.array(a[:, 3])})

    agg = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby("grid_id")
           .aggregate(_Sum("num_e4", alias_name="num_e4"),
                      _Sum("den_e8", alias_name="den_e8"),
                      _Sum("n_pts", alias_name="n_pts"))
           .to_pandas())
    agg = agg.astype({"grid_id": "int64", "num_e4": "int64",
                      "den_e8": "int64", "n_pts": "int64"})
    agg["idw_value"] = (agg["num_e4"].to_numpy(np.float64) * 10000.0
                        / agg["den_e8"].to_numpy(np.float64))
    return (agg[["grid_id", "n_pts", "idw_value"]]
            .sort_values("grid_id").reset_index(drop=True))


def idw_sql() -> str:
    return (
        "WITH " + _kmv_sql_cte("event_id") + ", "
        "pts AS (SELECT s.event_id, (g % 36000) / 100.0 - 180.0 AS lon, "
        "((g // 36000) % 18000) / 100.0 - 90.0 AS lat, e.value "
        "FROM sq s JOIN events e USING (event_id)), "
        f"grid AS (SELECT i + {IDW_GRID_LONS} * j AS grid_id, "
        "-150.005 + 60.0 * i AS gx, -60.005 + 40.0 * j AS gy "
        f"FROM range({IDW_GRID_LONS}) r1(i), range({IDW_GRID_LATS}) r2(j)), "
        "d AS (SELECT grid_id, "
        "(p.lon - g.gx) * (p.lon - g.gx) + (p.lat - g.gy) * (p.lat - g.gy) AS d2, "
        "p.value FROM pts p CROSS JOIN grid g), "
        "f AS (SELECT grid_id, "
        "CAST(ROUND(1.0 / d2 * value * 10000.0, 0) AS BIGINT) AS num_e4, "
        "CAST(ROUND(1.0 / d2 * 100000000.0, 0) AS BIGINT) AS den_e8 FROM d "
        f"WHERE d2 <= {IDW_RADIUS * IDW_RADIUS}) "
        "SELECT grid_id, COUNT(*) AS n_pts, "
        "CAST(SUM(num_e4) AS DOUBLE) * 10000.0 / SUM(den_e8) AS idw_value "
        "FROM f GROUP BY 1"
    )


def q_degree_hist(sf_dir: str):
    """DEGREE-DISTRIBUTION HISTOGRAM of the radius-4 proximity graph (the
    first diagnostic of any graph pipeline — skew here predicts shuffle
    skew everywhere downstream): one degree groupby over the bidirectional
    edge list, then a tiny count-of-counts.  Isolated points (degree 0)
    are absent on both sides by construction (the edge list defines the
    node set)."""
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    from ..stages.dedup import _compact_nonempty

    edges = proximity_edges(sf_dir, KCORE_RADIUS)

    def explode(t: pa.Table) -> pa.Table:
        a = t["id_a"].combine_chunks()
        b = t["id_b"].combine_chunks()
        return pa.table({"u": pa.concat_arrays([a, b])})

    deg = _compact_nonempty(
        edges.map_batches(explode, batch_format="pyarrow")
        .groupby("u").aggregate(_Count(alias_name="deg")).materialize(),
        fallback_schema=pa.schema([("u", pa.int64()), ("deg", pa.int64())]))

    def hist_part(t: pa.Table) -> pa.Table:
        vc = pd.Series(t["deg"].to_numpy(zero_copy_only=False)).value_counts()
        return pa.table({"deg": pa.array(vc.index.to_numpy(np.int64)),
                         "n_nodes": pa.array(vc.to_numpy(np.int64))})

    out = (deg.map_batches(hist_part, batch_format="pyarrow")
           .groupby("deg").aggregate(_Sum("n_nodes", alias_name="n_nodes"))
           .to_pandas())
    return (out.astype({"deg": "int64", "n_nodes": "int64"})
            .sort_values("deg").reset_index(drop=True))


def degree_hist_sql() -> str:
    return (
        "WITH " + _kmv_sql_cte("event_id") + ", "
        "pts AS (SELECT event_id, (g % 36000) / 100.0 - 180.0 AS lon, "
        "((g // 36000) % 18000) / 100.0 - 90.0 AS lat FROM sq), "
        "e AS (SELECT a.event_id AS u, b.event_id AS v "
        "FROM pts a JOIN pts b ON a.event_id < b.event_id "
        "AND (a.lon-b.lon)*(a.lon-b.lon)+(a.lat-b.lat)*(a.lat-b.lat) "
        f"<= {KCORE_RADIUS * KCORE_RADIUS}), "
        "d AS (SELECT u, COUNT(*) AS deg FROM "
        "(SELECT u FROM e UNION ALL SELECT v FROM e) GROUP BY u) "
        "SELECT deg, COUNT(*) AS n_nodes FROM d GROUP BY 1"
    )


# --- global Moran's I spatial autocorrelation --------------------------------

MORAN_RES = 6


def q_morans_i(sf_dir: str):
    """GLOBAL MORAN'S I spatial autocorrelation (the canonical "is this
    variable spatially clustered?" statistic of geospatial analytics —
    ESDA / Getis-style global test) over the per-cell value field, rook
    (4-neighbour) adjacency, binary weights:

        I = (N / W) * sum_ij w_ij d_i d_j / sum_i d_i^2,  d_i = x_i - mean

    Scale shape: the corpus reduces FIRST (per-batch per-cell e4-sum
    partials -> one groupby bounded by 4^res cells); the neighbour sums
    come from a kring-style VECTORIZED 4-offset scatter of the per-cell
    AGGREGATE rows into a second tiny groupby (both shuffles move
    O(#occupied cells) rows — points never replicate).  The final fold
    runs on the driver over <= 4^res rows in PYTHON BIGNUM (exact — the
    deviations are kept as integers scaled by N: d_i ~ N*x_i - S, so
    numerator and denominator are exact integers and the DuckDB twin
    reproduces them HUGEINT-bit-identically; one float divide at the
    end).  Driver state is grid-bounded, independent of corpus size.

    Reference anchor: the reference's per-collection spatial summaries
    (stacbuilder/metadata.py extent rollups) stop at bbox unions; this is
    the statistic layer above them on the same cell index."""
    from ray.data.aggregate import Sum as _Sum

    from ..functions.rounding import round_half_away
    from ..geo.cell import RES_SHIFT, XY_BITS, XY_MASK

    n_side = 1 << MORAN_RES
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "value"])

    def percell(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon = (eid % 3600) / 10.0 - 180.0 + 0.05
        lat = ((eid * 7) % 1800) / 10.0 - 90.0 + 0.05
        cell = cell_encode(lon, lat, MORAN_RES)
        e4 = round_half_away(
            t["value"].to_numpy(zero_copy_only=False) * 1e4).astype(np.int64)
        g = (pd.DataFrame({"cell": cell, "e4": e4})
             .groupby("cell", sort=False)["e4"].sum().reset_index())
        return pa.table({"cell": pa.array(g["cell"].to_numpy(np.int64)),
                         "x": pa.array(g["e4"].to_numpy(np.int64))})

    occ = (ds.map_batches(percell, batch_format="pyarrow")
           .groupby("cell").aggregate(_Sum("x", alias_name="x")))

    offs = np.array([(-1, 0), (1, 0), (0, -1), (0, 1)], dtype=np.int64)

    def scatter(t: pa.Table) -> pa.Table:
        c = t["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx = (c >> XY_BITS) & XY_MASK
        cy = c & XY_MASK
        m = len(c)
        tx = np.repeat(cx, 4) + np.tile(offs[:, 0], m)
        ty = np.repeat(cy, 4) + np.tile(offs[:, 1], m)
        ok = (tx >= 0) & (tx < n_side) & (ty >= 0) & (ty < n_side)
        tgt = (np.int64(MORAN_RES) << RES_SHIFT) | (tx[ok] << XY_BITS) | ty[ok]
        return pa.table({"cell": pa.array(tgt),
                         "nb_x": pa.array(np.repeat(x, 4)[ok]),
                         "one": pa.array(np.ones(int(ok.sum()), dtype=np.int64))})

    nb = (occ.map_batches(scatter, batch_format="pyarrow")
          .groupby("cell").aggregate(_Sum("nb_x", alias_name="nb_x"),
                                     _Sum("one", alias_name="nb_n")))

    cdf = occ.to_pandas()          # <= 4^res rows by construction
    ndf = nb.to_pandas()
    # inner merge drops scatter targets that are UNoccupied cells, so nb_n
    # counts exactly the occupied-occupied rook pairs (twice, once per
    # direction) — the standard symmetric binary W.
    j = cdf.merge(ndf, on="cell", how="inner")
    n = int(len(cdf))
    sx = int(cdf["x"].astype("int64").sum())
    num = 0
    for xi, bx, bn in zip(j["x"].astype("int64").to_numpy(),
                          j["nb_x"].astype("int64").to_numpy(),
                          j["nb_n"].astype("int64").to_numpy()):
        num += int(n * int(xi) - sx) * (n * int(bx) - int(bn) * sx)
    den = 0
    for xi in cdf["x"].astype("int64").to_numpy():
        den += int(n * int(xi) - sx) ** 2
    w = int(j["nb_n"].astype("int64").sum())
    morans_i = (float(n) * float(num)) / (float(w) * float(den))
    return pd.DataFrame({"n_cells": pd.Series([n], dtype="int64"),
                         "w_pairs": pd.Series([w], dtype="int64"),
                         "morans_i": pd.Series([morans_i], dtype="float64")})


def morans_i_sql() -> str:
    from ..geo.cell import XY_BITS, XY_MASK

    lon, lat = lonlat_sql("event_id")
    cell = cell_encode_sql(lon, lat, MORAN_RES)
    return (
        f"WITH c AS (SELECT {cell} AS cell, "
        "CAST(SUM(CAST(ROUND(value * 10000, 0) AS BIGINT)) AS BIGINT) AS x "
        "FROM events GROUP BY 1), "
        "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x) AS BIGINT) AS sx FROM c), "
        f"d AS (SELECT cell, x, (cell >> {XY_BITS}) & {XY_MASK} AS cx, "
        f"cell & {XY_MASK} AS cy FROM c), "
        "nb AS (SELECT a.cell, CAST(COUNT(*) AS BIGINT) AS nb_n, "
        "CAST(SUM(b.x) AS BIGINT) AS nb_x FROM d a JOIN d b "
        "ON abs(a.cx - b.cx) + abs(a.cy - b.cy) = 1 GROUP BY 1), "
        "t AS (SELECT SUM(CAST(s.n * d.x - s.sx AS HUGEINT) * "
        "CAST(s.n * nb.nb_x - nb.nb_n * s.sx AS HUGEINT)) AS num "
        "FROM d JOIN nb USING (cell) CROSS JOIN s), "
        "e AS (SELECT SUM(CAST(s.n * d.x - s.sx AS HUGEINT) * "
        "CAST(s.n * d.x - s.sx AS HUGEINT)) AS den FROM d CROSS JOIN s), "
        "w AS (SELECT CAST(SUM(nb_n) AS BIGINT) AS wp FROM nb) "
        "SELECT s.n AS n_cells, w.wp AS w_pairs, "
        "(CAST(s.n AS DOUBLE) * CAST(t.num AS DOUBLE)) / "
        "(CAST(w.wp AS DOUBLE) * CAST(e.den AS DOUBLE)) AS morans_i "
        "FROM s CROSS JOIN t CROSS JOIN e CROSS JOIN w"
    )


# --- Z-order (Morton) locality partitioning ---------------------------------

ZORDER_RES = 8          # 256 x 256 grid -> 16-bit z codes
ZORDER_PART_SHIFT = 10  # 64 partitions of 1024 consecutive z values


def _morton_interleave(x: np.ndarray, y: np.ndarray, bits: int) -> np.ndarray:
    """z = x-bits at odd positions, y-bits at even — vectorized over int64."""
    z = np.zeros_like(x)
    for k in range(bits):
        z |= ((x >> k) & 1) << (2 * k + 1)
        z |= ((y >> k) & 1) << (2 * k)
    return z


def q_zorder_index(sf_dir: str):
    """Z-ORDER (Morton-curve) LOCALITY PARTITIONING with per-partition
    pruning statistics — the lakehouse data-layout operator (Delta/Iceberg
    Z-ordering): points keyed by the interleaved bits of their grid cell
    sort NEARBY-IN-SPACE into NEARBY-IN-KEY, so fixed z-ranges make file
    partitions whose bounding boxes are compact, and a bbox query can skip
    every partition whose (x, y) min/max envelope misses it.  Output: per
    z-range partition the row count, distinct-cell count, z span and the
    integer bbox envelope — exactly the footer stats a 100 TB
    cell-partitioned catalog write (state/checkpoint.py sinks) would store
    for partition pruning.

    Scale shape: per-batch value_counts partials over z (bounded by the
    4^res grid, 65 536 codes) → one grid-bounded groupby → vectorized
    bit de-interleave → final groupby over 64 partition rows.  The corpus
    never shuffles; both aggregation legs are grid-bounded."""
    from ray.data.aggregate import Count as _Count, Max as _Max, Min as _Min, Sum as _Sum

    from ..geo.cell import XY_BITS, XY_MASK

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id"])

    def zpart(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon = (eid % 3600) / 10.0 - 180.0 + 0.05
        lat = ((eid * 7) % 1800) / 10.0 - 90.0 + 0.05
        cell = cell_encode(lon, lat, ZORDER_RES)
        x = (cell >> XY_BITS) & XY_MASK
        y = cell & XY_MASK
        z = _morton_interleave(x, y, ZORDER_RES)
        vc = pd.Series(z).value_counts()
        return pa.table({"z": pa.array(vc.index.to_numpy(np.int64)),
                         "c": pa.array(vc.to_numpy(np.int64))})

    perz = (ds.map_batches(zpart, batch_format="pyarrow")
            .groupby("z").aggregate(_Sum("c", alias_name="n")))

    def decode(t: pa.Table) -> pa.Table:
        z = t["z"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = np.zeros_like(z)
        y = np.zeros_like(z)
        for k in range(ZORDER_RES):
            x |= ((z >> (2 * k + 1)) & 1) << k
            y |= ((z >> (2 * k)) & 1) << k
        return pa.table({"p": pa.array(z >> ZORDER_PART_SHIFT),
                         "z": t["z"], "n": t["n"],
                         "x": pa.array(x), "y": pa.array(y)})

    out = (perz.map_batches(decode, batch_format="pyarrow")
           .groupby("p")
           .aggregate(_Sum("n", alias_name="n_rows"),
                      _Count(alias_name="n_cells"),
                      _Min("z", alias_name="z_min"),
                      _Max("z", alias_name="z_max"),
                      _Min("x", alias_name="x_min"),
                      _Max("x", alias_name="x_max"),
                      _Min("y", alias_name="y_min"),
                      _Max("y", alias_name="y_max"))
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("p", kind="stable").reset_index(drop=True)


def zorder_index_sql() -> str:
    from ..geo.cell import XY_BITS, XY_MASK

    lon, lat = lonlat_sql("event_id")
    cell = cell_encode_sql(lon, lat, ZORDER_RES)
    zterms = " + ".join(
        f"(((x >> {k}) & 1) * {1 << (2 * k + 1)}) + "
        f"(((y >> {k}) & 1) * {1 << (2 * k)})"
        for k in range(ZORDER_RES))
    return (
        f"WITH c AS (SELECT {cell} AS cell FROM events), "
        f"d AS (SELECT (cell >> {XY_BITS}) & {XY_MASK} AS x, "
        f"cell & {XY_MASK} AS y FROM c), "
        f"zz AS (SELECT ({zterms}) AS z, x, y FROM d) "
        f"SELECT z >> {ZORDER_PART_SHIFT} AS p, COUNT(*) AS n_rows, "
        "COUNT(DISTINCT z) AS n_cells, MIN(z) AS z_min, MAX(z) AS z_max, "
        "MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max "
        "FROM zz GROUP BY 1"
    )


def q_blob_count(sf_dir: str):
    """Per-image BLOB COUNT over the documents-derived images table
    (rows-only: pixel decode + connected-component labeling are not
    SQL-expressible) — threshold at the integer pixel mean, 4-connected
    min-label-propagation components inside the decode actor (the per-image
    twin of the engine's distributed connected components).  Independent
    flood-fill oracle: tests/test_operators.py::TestBlobCount."""
    from ..pipelines.spatial_catalog import images_from_documents
    from ..stages.multimodal import blob_count

    images = images_from_documents(sf_dir, "/tmp/scbr-query-cache")
    out = blob_count(rd.read_parquet(images))
    return out.to_pandas().sort_values("image_id").reset_index(drop=True)


# --- Local Outlier Factor ----------------------------------------------------

LOF_K = 5
LOF_RES = 5


def lof_scores(pts, k: int = LOF_K, res: int = LOF_RES,
               driver_state_limit: int = 20_000_000) -> pd.DataFrame:
    """LOCAL OUTLIER FACTOR (Breunig et al. 2000) — the density-ratio
    anomaly detector of the classic ML toolkit — over a (event_id, lon,
    lat) point Dataset, exact kNN from the cell-ring ``knn_join`` with its
    widening backstop.

    Determinism discipline: distances quantize to e6 integers BEFORE any
    distributed Sum (float sums are combine-order dependent; integer sums
    are not), lrd is an exact integer ratio (n·10^15 // sum_reach_e6), so
    both routes and every rerun produce BIT-IDENTICAL rows.  The three
    passes over the O(N·k) pair table need the per-point k-dist / lrd as a
    side lookup; that lookup AUTO-ROUTES — <= ``driver_state_limit``
    points ships as sorted arrays (vectorized searchsorted, the dbscan
    pattern), above it partitioned ``Dataset.join``s keyed on neighbor_id
    (no driver state) — both routes equality-tested.

    A zero reach-sum (>= k coincident points) gets the documented sentinel
    lrd of 10^18 instead of a division error."""
    from ray.data.aggregate import Count as _Count, Max as _Max, Sum as _Sum

    from ..functions.rounding import round_half_away
    from ..stages.spatial import knn_join

    nn = knn_join(pts, k=k, res=res, id_col="event_id", exact=True)

    def quant(t: pa.Table) -> pa.Table:
        d6 = round_half_away(
            t["dist"].to_numpy(zero_copy_only=False) * 1e6).astype(np.int64)
        return pa.table({"event_id": t["event_id"],
                         "neighbor_id": t["neighbor_id"],
                         "d_e6": pa.array(d6)})

    nn = nn.map_batches(quant, batch_format="pyarrow").materialize()
    kd = (nn.groupby("event_id")
          .aggregate(_Max("d_e6", alias_name="k_dist_e6")).materialize())
    n_pts = kd.count()

    def _lrd_from(sdf: pd.DataFrame) -> np.ndarray:
        sr = sdf["sum_reach_e6"].to_numpy(np.int64)
        nb = sdf["n_nb"].to_numpy(np.int64)
        out = np.full(len(sr), 10 ** 18, dtype=np.int64)
        nz = sr > 0
        out[nz] = nb[nz] * 10 ** 15 // sr[nz]
        return out

    if n_pts <= driver_state_limit:
        kdf = kd.to_pandas().sort_values("event_id").reset_index(drop=True)
        ids = np.ascontiguousarray(kdf["event_id"].to_numpy(np.int64))
        kda = np.ascontiguousarray(kdf["k_dist_e6"].to_numpy(np.int64))
        ids_ref, kd_ref = ray.put(ids), ray.put(kda)

        def reach_part(t: pa.Table) -> pa.Table:
            ia, ka = ray.get(ids_ref), ray.get(kd_ref)
            nb = t["neighbor_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            reach = np.maximum(
                t["d_e6"].to_numpy(zero_copy_only=False),
                ka[np.searchsorted(ia, nb)])
            return pa.table({"event_id": t["event_id"],
                             "reach_e6": pa.array(reach)})

        sdf = (nn.map_batches(reach_part, batch_format="pyarrow")
               .groupby("event_id")
               .aggregate(_Sum("reach_e6", alias_name="sum_reach_e6"),
                          _Count(alias_name="n_nb"))
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        lrd = _lrd_from(sdf)
        lrd_ref = ray.put(lrd)

        def lrdnb_part(t: pa.Table) -> pa.Table:
            ia, la = ray.get(ids_ref), ray.get(lrd_ref)
            nb = t["neighbor_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"event_id": t["event_id"],
                             "lrd_nb_e9": pa.array(la[np.searchsorted(ia, nb)])})

        ln = (nn.map_batches(lrdnb_part, batch_format="pyarrow")
              .groupby("event_id")
              .aggregate(_Sum("lrd_nb_e9", alias_name="sum_lrd_nb_e9"),
                         _Count(alias_name="n_nb"))
              .to_pandas().sort_values("event_id").reset_index(drop=True))
        pos = np.searchsorted(ids, ln["event_id"].to_numpy(np.int64))
        lof = (ln["sum_lrd_nb_e9"].to_numpy(np.float64)
               / (ln["n_nb"].to_numpy(np.float64) * lrd[pos].astype(np.float64)))
        return pd.DataFrame({"event_id": ln["event_id"].astype("int64"),
                             "k_dist_e6": kda[pos],
                             "lrd_e9": lrd[pos],
                             "lof": lof}).sort_values("event_id") \
            .reset_index(drop=True)

    # distributed route: partitioned joins keyed on neighbor_id
    from .relational import cluster_partitions

    nparts = cluster_partitions(per_cpu=0.5, floor=8)
    kd_nb = kd.map_batches(
        lambda t: pa.table({"nbid": t["event_id"],
                            "nb_kdist_e6": t["k_dist_e6"]}),
        batch_format="pyarrow")
    p1 = nn.join(kd_nb, join_type="inner", num_partitions=nparts,
                 on=("neighbor_id",), right_on=("nbid",))

    def reach_j(t: pa.Table) -> pa.Table:
        reach = np.maximum(t["d_e6"].to_numpy(zero_copy_only=False),
                           t["nb_kdist_e6"].to_numpy(zero_copy_only=False))
        return pa.table({"event_id": t["event_id"],
                         "reach_e6": pa.array(reach)})

    sr = (p1.map_batches(reach_j, batch_format="pyarrow")
          .groupby("event_id")
          .aggregate(_Sum("reach_e6", alias_name="sum_reach_e6"),
                     _Count(alias_name="n_nb")))

    def lrd_j(t: pa.Table) -> pa.Table:
        sdf = pd.DataFrame({
            "sum_reach_e6": t["sum_reach_e6"].to_numpy(zero_copy_only=False),
            "n_nb": t["n_nb"].to_numpy(zero_copy_only=False)})
        return pa.table({"event_id": t["event_id"],
                         "n_nb": t["n_nb"],
                         "lrd_e9": pa.array(_lrd_from(sdf))})

    lrd_ds = sr.map_batches(lrd_j, batch_format="pyarrow").materialize()
    lrd_nb = lrd_ds.map_batches(
        lambda t: pa.table({"nbid": t["event_id"], "nb_lrd_e9": t["lrd_e9"]}),
        batch_format="pyarrow")
    p2 = nn.join(lrd_nb, join_type="inner", num_partitions=nparts,
                 on=("neighbor_id",), right_on=("nbid",))
    agg2 = (p2.groupby("event_id")
            .aggregate(_Sum("nb_lrd_e9", alias_name="sum_lrd_nb_e9"),
                       _Count(alias_name="n_nb")))
    final = agg2.join(lrd_ds.select_columns(["event_id", "lrd_e9"]),
                      join_type="inner", num_partitions=nparts,
                      on=("event_id",), right_on=("event_id",))
    fin = final.to_pandas().sort_values("event_id").reset_index(drop=True)
    kpd = kd.to_pandas().sort_values("event_id").reset_index(drop=True)
    lof = (fin["sum_lrd_nb_e9"].to_numpy(np.float64)
           / (fin["n_nb"].to_numpy(np.float64)
              * fin["lrd_e9"].to_numpy(np.int64).astype(np.float64)))
    return pd.DataFrame({"event_id": fin["event_id"].astype("int64"),
                         "k_dist_e6": kpd["k_dist_e6"].astype("int64"),
                         "lrd_e9": fin["lrd_e9"].astype("int64"),
                         "lof": lof}).sort_values("event_id") \
        .reset_index(drop=True)


def q_lof(sf_dir: str):
    """LOF anomaly scores over the lattice-free hash-derived points (the
    kcore-family derivation — collision-free in practice, so reach sums
    are positive).  Rows-only: the reach/lrd recursion has no bounded SQL
    expression; independent O(n^2) numpy oracle + planted-outlier test in
    tests/test_spatial.py::TestLof."""
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id"])
    from .relational import _kmv_hash

    def pts_fn(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = _sqmod61(_kmv_hash(eid))
        lon = (g % 36000) / 100.0 - 180.0
        lat = ((g // 36000) % 18000) / 100.0 - 90.0
        return pa.table({"event_id": pa.array(eid),
                         "lon": pa.array(lon), "lat": pa.array(lat)})

    return lof_scores(ds.map_batches(pts_fn, batch_format="pyarrow"))


# cell-aligned query box for the z-range scan (res-8 cell units, half-open)
ZQ_X0, ZQ_X1 = 37, 201
ZQ_Y0, ZQ_Y1 = 93, 160


def zrange_decompose(x0: int, x1: int, y0: int, y1: int,
                     bits: int) -> list:
    """Quadtree decomposition of a half-open cell-aligned box into DISJOINT
    SORTED z-code intervals [lo, hi) — the query-planning half of Z-order
    indexing (the zorder_index operator is the layout half): a quadrant
    fully inside the box emits one interval covering its whole subtree;
    partial overlaps recurse; leaf cells emit unit intervals.  Adjacent
    intervals merge, so range count stays O(perimeter)."""

    out = []


    def rec(qx: int, qy: int, level: int, prefix: int):
        size = 1 << (bits - level)
        cx0, cy0 = qx * size, qy * size
        cx1, cy1 = cx0 + size, cy0 + size
        if cx1 <= x0 or cx0 >= x1 or cy1 <= y0 or cy0 >= y1:
            return
        if x0 <= cx0 and cx1 <= x1 and y0 <= cy0 and cy1 <= y1:
            span = 1 << (2 * (bits - level))
            out.append((prefix * span, (prefix + 1) * span))
            return
        for code in range(4):
            dx, dy = code >> 1, code & 1
            rec(qx * 2 + dx, qy * 2 + dy, level + 1, prefix * 4 + code)

    rec(0, 0, 0, 0)
    out.sort()
    merged = []
    for lo, hi in out:
        if merged and merged[-1][1] == lo:
            merged[-1][1] = hi
        else:
            merged.append([lo, hi])
    return [(lo, hi) for lo, hi in merged]


def q_zrange_query(sf_dir: str):
    """Z-ORDER RANGE-SCAN QUERY (the read path of the Morton index: answer
    a spatial bbox query by scanning ONLY covering z-code intervals —
    never comparing lon/lat): events whose res-8 cell falls in the
    cell-aligned box x in [37, 201), y in [93, 160).

    The driver decomposes the box into disjoint z-intervals (quadtree,
    O(perimeter) ranges); each batch then answers membership with ONE
    vectorized searchsorted against the broadcast interval starts — this
    is exactly how a 100 TB z-partitioned table would prune row groups by
    footer z-ranges and scan the survivors.  The DuckDB twin answers the
    same query geometrically (half-open lon/lat BETWEEN on the aligned
    edges), so a hash match PROVES the decomposition + scan equal the
    geometric truth."""
    from ..geo.cell import XY_BITS, XY_MASK

    ranges = zrange_decompose(ZQ_X0, ZQ_X1, ZQ_Y0, ZQ_Y1, ZORDER_RES)
    los = np.array([r[0] for r in ranges], dtype=np.int64)
    his = np.array([r[1] for r in ranges], dtype=np.int64)

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id"])

    def scan(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon = (eid % 3600) / 10.0 - 180.0 + 0.05
        lat = ((eid * 7) % 1800) / 10.0 - 90.0 + 0.05
        cell = cell_encode(lon, lat, ZORDER_RES)
        x = (cell >> XY_BITS) & XY_MASK
        y = cell & XY_MASK
        z = _morton_interleave(x, y, ZORDER_RES)
        # interval membership: one searchsorted over the range starts
        pos = np.searchsorted(los, z, side="right") - 1
        ok = (pos >= 0) & (z < his[np.clip(pos, 0, len(his) - 1)])
        return pa.table({"event_id": pa.array(eid[ok]),
                         "z": pa.array(z[ok])})

    out = ds.map_batches(scan, batch_format="pyarrow").to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    out["z"] = out["z"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def zrange_query_sql() -> str:
    from ..geo.cell import XY_BITS, XY_MASK

    lon, lat = lonlat_sql("event_id")
    cell = cell_encode_sql(lon, lat, ZORDER_RES)
    zterms = " + ".join(
        f"(((x >> {k}) & 1) * {1 << (2 * k + 1)}) + "
        f"(((y >> {k}) & 1) * {1 << (2 * k)})"
        for k in range(ZORDER_RES))
    w = -180.0 + ZQ_X0 * (360.0 / 256.0)
    e = -180.0 + ZQ_X1 * (360.0 / 256.0)
    s = -90.0 + ZQ_Y0 * (180.0 / 256.0)
    n = -90.0 + ZQ_Y1 * (180.0 / 256.0)
    return (
        f"WITH p AS (SELECT event_id, {lon} AS plon, {lat} AS plat "
        "FROM events), "
        f"q AS (SELECT event_id FROM p WHERE plon >= {w} AND plon < {e} "
        f"AND plat >= {s} AND plat < {n}), "
        f"c AS (SELECT event_id, {cell} AS cell FROM events), "
        f"d AS (SELECT event_id, (cell >> {XY_BITS}) & {XY_MASK} AS x, "
        f"cell & {XY_MASK} AS y FROM c) "
        f"SELECT q.event_id, ({zterms}) AS z FROM q JOIN d USING (event_id)"
    )


def q_otsu(sf_dir: str):
    """Per-image OTSU THRESHOLD stats over the documents-derived images
    table (rows-only: pixel decode + the histogram argmax are not
    SQL-expressible) — exact-integer between-class-variance maximization
    inside the decode actor.  Independent oracle:
    tests/test_operators.py::TestOtsu (bignum recompute + planted bimodal
    image with a known split)."""
    from ..pipelines.spatial_catalog import images_from_documents
    from ..stages.multimodal import otsu_threshold

    images = images_from_documents(sf_dir, "/tmp/scbr-query-cache")
    out = otsu_threshold(rd.read_parquet(images))
    return out.to_pandas().sort_values("image_id").reset_index(drop=True)
