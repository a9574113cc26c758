"""Deterministic synthetic input tables (no external data; seed-free by design
— every field is pure arithmetic on the row index, so generation is identical
regardless of chunking or process count).

Produces the Lance-style image+caption table from BASELINE.json input_hint:

    (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
     caption:string, phash:int64)

Two flavours (FIXTURES.md §1):

- **smoke set** (12 rows) — mirrors the reference's mock GeoTIFF corpus
  exactly (tests/conftest.py:54-70,139-173): ids
  ``2000/observations_2m-temp-monthly_2000-01-01.tif`` ..., 240x180 pixels of
  the 2-Gaussian gradient ``Z = 10 * (Z2 - Z1)`` quantized to uint16,
  identity transform (rasterio's default when no transform is given, which
  is what produces the golden ``proj:bbox [0.0, 180.0, 240.0, 0.0]``).
- **scale set** (any N) — ids carry a tile component
  ``tiles/{tile}/{year}/observations_{atype}_{tile}_{Y}-{M:02d}-01.tif``;
  30% of rows land on one hot tile (skew injection for the salting tests);
  tiles with ``easting % 5 == 0`` are georeferenced in their UTM zone
  (exercises the CRS kernel), the rest in EPSG:4326.

Everything the extract stage derives (georef, captions, phash) is recomputable
from ``image_id`` + pixels alone, so the per-row invariant (decoded-pixel
PSNR >= 40 dB + caption equality) has an exact oracle.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .codec.raster import FORMATS, encode_image
from .codec.phash import phash64
from .geo.crs import reproject_bbox

ASSET_TYPES = ("2m-temp-monthly", "tot-precip-monthly")
ASSET_TITLES = {
    "2m-temp-monthly": "2m temperature",
    "tot-precip-monthly": "total precipitation",
}

IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

# --- scale-set tile grid ----------------------------------------------------

TILE_DEG = 1.5
TILE_E0_LON = -18.0  # tile E00 west edge
TILE_N0_LAT = -18.0  # tile N00 south edge
N_TILES = 24
HOT_TILE = (7, 12)  # 30% of scale-set rows land here (skew)


def tile_name(e: int, n: int) -> str:
    return f"E{e:02d}N{n:02d}"


def parse_tile_id(tile: str) -> Tuple[int, int]:
    """'E09N27' -> (easting, northing); mirrors terracatalog.py:773-791."""
    if not (len(tile) == 6 and tile[0] == "E" and tile[3] == "N"):
        raise ValueError(f"invalid tile id {tile!r}")
    return int(tile[1:3]), int(tile[4:6])


def tile_epsg(e: int, lon_west: float) -> int:
    """Deterministic EPSG rule: every 5th easting column is georeferenced in
    its (northern) UTM zone, the rest in 4326."""
    if e % 5 == 0:
        zone = int((lon_west + 180.0) // 6.0) + 1
        return 32600 + min(max(zone, 1), 60)
    return 4326


def tile_geo(tile: str) -> Dict[str, float]:
    """tile id -> georeferencing: WGS84 bbox, EPSG, projected bbox, affine
    transform [a, b, c, d, e, f] (x = a*col + b*row + c; y = d*col + e*row + f,
    north-up so e < 0), for the fixed 240x180 raster shape."""
    e, n = parse_tile_id(tile)
    west = TILE_E0_LON + e * TILE_DEG
    south = TILE_N0_LAT + n * TILE_DEG
    east, north = west + TILE_DEG, south + TILE_DEG
    epsg = tile_epsg(e, west)
    if epsg == 4326:
        pw, ps, pe, pn = west, south, east, north
    else:
        pw, ps, pe, pn = reproject_bbox(west, south, east, north, 4326, epsg)
    w_px, h_px = 240, 180
    transform = [(pe - pw) / w_px, 0.0, pw, 0.0, -(pn - ps) / h_px, pn]
    return {
        "west": west,
        "south": south,
        "east": east,
        "north": north,
        "epsg": epsg,
        "proj_bounds": (pw, ps, pe, pn),
        "transform": transform,
    }


# --- pixel generation -------------------------------------------------------


def gradient_field(w: int = 240, h: int = 180, cx1: float = 0.5, cy1: float = 0.5,
                   cx2: float = -0.5, cy2: float = -0.5) -> np.ndarray:
    """The reference's mock-raster gradient VERBATIM (tests/conftest.py:
    146-160): float64 ``Z = 10 * (Z2 - Z1)`` — the smoke corpus carries these
    exact values so extracted ``raster:bands.data_type`` is ``float64`` like
    the reference goldens, with no test-side normalization."""
    x = np.linspace(-4.0, 4.0, w)
    y = np.linspace(-3.0, 3.0, h)
    X, Y = np.meshgrid(x, y)
    Z1 = np.exp(-2 * np.log(2) * ((X - cx1) ** 2 + (Y - cy1) ** 2) / 1**2)
    Z2 = np.exp(-3 * np.log(2) * ((X + cx2) ** 2 + (Y + cy2) ** 2) / 2.5**2)
    return 10.0 * (Z2 - Z1)


def gradient_pixels(w: int = 240, h: int = 180, cx1: float = 0.5, cy1: float = 0.5,
                    cx2: float = -0.5, cy2: float = -0.5) -> np.ndarray:
    """:func:`gradient_field` quantized to uint16 (the scale set's pixel
    payload; the uint16 containers can't carry floats)."""
    Z = gradient_field(w, h, cx1, cy1, cx2, cy2)
    return np.round((Z + 10.0) / 20.0 * 65535.0).astype(np.uint16)


def row_pixel_params(i: int) -> Tuple[float, float, float, float]:
    """Per-row Gaussian centers — pure arithmetic on the row index."""
    return (
        -1.0 + ((i * 31) % 97) / 48.0,
        -1.0 + ((i * 57) % 89) / 44.0,
        -1.0 + ((i * 13) % 83) / 41.0,
        -1.0 + ((i * 71) % 79) / 39.0,
    )


# --- row synthesis ----------------------------------------------------------


def smoke_row_ids() -> List[str]:
    ids = []
    for year in (2000, 2001):
        for atype in ASSET_TYPES:
            for month in (1, 2, 3):
                ids.append(f"{year}/observations_{atype}_{year}-{month:02d}-01.tif")
    return sorted(ids)


def scale_row_fields(i: int) -> Dict:
    # rows pair up: d = i // 2 fixes (tile, date); the two asset types of a
    # pair share one item — mirroring the reference corpus (2 assets/item)
    # while keeping ~n/2 DISTINCT item ids at any scale
    d = i // 2
    year = 2000 + d // 372  # unbounded: item-id entropy scales with table size
    month = 1 + (d // 31) % 12
    day = 1 + d % 28
    atype = ASSET_TYPES[i % 2]
    if d % 10 < 3:
        e, n = HOT_TILE
    else:
        e, n = (d * 7919) % N_TILES, (d * 104729) % N_TILES
    tile = tile_name(e, n)
    fmt = FORMATS[i % 3]
    image_id = (
        f"tiles/{tile}/{year}/observations_{atype}_{tile}_{year}-{month:02d}-{day:02d}.tif"
    )
    return {"image_id": image_id, "tile": tile, "fmt": fmt,
            "year": year, "month": month, "day": day, "atype": atype}


def caption_for(atype: str, tile: str, year: int, month: int, day: int = 1) -> str:
    return f"{ASSET_TITLES[atype]} over tile {tile} on {year}-{month:02d}-{day:02d}"


def _make_rows(indices: Iterator[int], smoke: bool, w: int, h: int) -> Dict[str, list]:
    cols: Dict[str, list] = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
    smoke_ids = smoke_row_ids() if smoke else None
    for i in indices:
        if smoke:
            image_id = smoke_ids[i]
            fmt = "mbnd"  # float64-capable container (reference mocks are float64)
            stem = os.path.splitext(os.path.basename(image_id))[0]
            parts = stem.split("_")  # observations, atype, date
            atype, date = parts[1], parts[2]
            year, month, day = int(date[0:4]), int(date[5:7]), int(date[8:10])
            tile = "global"
            px = gradient_field(w, h)  # all smoke rasters identical, like the reference
        else:
            f = scale_row_fields(i)
            image_id, fmt, tile = f["image_id"], f["fmt"], f["tile"]
            atype, year, month, day = f["atype"], f["year"], f["month"], f["day"]
            px = gradient_pixels(w, h, *row_pixel_params(i))
        cols["image_id"].append(image_id)
        if fmt == "mbnd":
            from .codec.raster import encode_multiband

            cols["bytes"].append(encode_multiband([px], cloud_optimized=True))
        else:
            cols["bytes"].append(encode_image(px, fmt))
        cols["w"].append(w)
        cols["h"].append(h)
        cols["fmt"].append(fmt)
        cols["caption"].append(caption_for(atype, tile, year, month, day))
        cols["phash"].append(phash64(px))
    return cols


def _default_rows_per_file(out_dir: str, w: int, h: int) -> int:
    """Payload-aware part sizing (the measured wide-payload rule from
    sources/partsize.py, applied at WRITE time where it actually controls
    read-task granularity — Ray 2.49 schedules one read task per part):
    ~40 MB of raw pixel payload per part, capped at the historical 2048 so
    narrow tables keep their existing layout bit-for-bit.  RESUME SAFETY:
    if the dir already has a part-00000, its footer row count wins — a
    default change can never mis-index an existing partitioned table."""
    first = os.path.join(out_dir, "part-00000.parquet")
    if os.path.exists(first):
        try:
            n = pq.ParquetFile(first).metadata.num_rows
            if n > 0:
                return n
        except Exception:
            pass
    row_bytes = max(1, w * h * 2)  # uint16 raster payload dominates the row
    return max(64, min(2048, (40 * 1024 * 1024) // row_bytes))


def generate_images_table(
    out_dir: str,
    n_rows: int | None = None,
    smoke: bool = False,
    w: int = 240,
    h: int = 180,
    rows_per_file: int | None = None,
    overwrite: bool = False,
) -> str:
    """Write the images table as partitioned Parquet under ``out_dir``
    (``part-{k:05d}.parquet``), resumable: existing complete parts are kept
    unless ``overwrite``.  Returns ``out_dir``.  Smoke sets use the fixed
    240x180 reference shape; scale sets default to the caller's (w, h).
    ``rows_per_file`` defaults to :func:`_default_rows_per_file` (payload-
    aware <= ~40 MB parts; footer-derived for existing dirs)."""
    if smoke:
        n_rows = 12
        w, h = 240, 180
    if n_rows is None:
        raise ValueError("n_rows required for non-smoke tables")
    os.makedirs(out_dir, exist_ok=True)
    if rows_per_file is None:
        rows_per_file = _default_rows_per_file(out_dir, w, h)
    for k, start in enumerate(range(0, n_rows, rows_per_file)):
        path = os.path.join(out_dir, f"part-{k:05d}.parquet")
        if os.path.exists(path) and not overwrite:
            continue
        stop = min(start + rows_per_file, n_rows)
        cols = _make_rows(range(start, stop), smoke, w, h)
        table = pa.table(
            {
                "image_id": pa.array(cols["image_id"], pa.string()),
                "bytes": pa.array(cols["bytes"], pa.binary()),
                "w": pa.array(cols["w"], pa.int32()),
                "h": pa.array(cols["h"], pa.int32()),
                "fmt": pa.array(cols["fmt"], pa.string()),
                "caption": pa.array(cols["caption"], pa.string()),
                "phash": pa.array(cols["phash"], pa.int64()),
            }
        )
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)  # atomic publish (resumable-output contract)
    return out_dir


def generate_images_table_parallel(
    out_dir: str,
    n_rows: int,
    w: int = 240,
    h: int = 180,
    rows_per_file: int | None = None,
    concurrency: int = 16,
) -> str:
    """Ray-parallel variant of :func:`generate_images_table` for bench-scale
    tables: one Ray task per part file, same deterministic bytes (generation
    is pure arithmetic on the row index), same atomic-rename resume.
    ``rows_per_file`` defaults like the serial writer (payload-aware,
    footer-derived for existing dirs)."""
    import ray

    os.makedirs(out_dir, exist_ok=True)
    if rows_per_file is None:
        rows_per_file = _default_rows_per_file(out_dir, w, h)
    parts = [
        (k, start, min(start + rows_per_file, n_rows))
        for k, start in enumerate(range(0, n_rows, rows_per_file))
        if not os.path.exists(os.path.join(out_dir, f"part-{k:05d}.parquet"))
    ]
    if not parts:
        return out_dir

    @ray.remote(num_cpus=1)
    def make_part(k: int, start: int, stop: int) -> str:
        path = os.path.join(out_dir, f"part-{k:05d}.parquet")
        cols = _make_rows(range(start, stop), False, w, h)
        table = pa.table(
            {
                "image_id": pa.array(cols["image_id"], pa.string()),
                "bytes": pa.array(cols["bytes"], pa.binary()),
                "w": pa.array(cols["w"], pa.int32()),
                "h": pa.array(cols["h"], pa.int32()),
                "fmt": pa.array(cols["fmt"], pa.string()),
                "caption": pa.array(cols["caption"], pa.string()),
                "phash": pa.array(cols["phash"], pa.int64()),
            }
        )
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
        return path

    ray.get([make_part.remote(*p) for p in parts])
    return out_dir


# --- AOI polygons for the PIP join (FIXTURES.md §3) -------------------------


def generate_aois(n_aois: int = 8) -> List[Dict]:
    """Deterministic rectangular AOIs in WGS84.  aoi_0 covers the whole
    world (the reference's default collection extent, builder.py:596-611),
    aoi_1 covers exactly the hot tile, the rest stagger across the grid;
    the last is empty-sea (matches nothing in the tile grid)."""
    aois: List[Dict] = [
        {"aoi_id": "aoi_0", "west": -180.0, "south": -90.0, "east": 180.0, "north": 90.0}
    ]
    hg = tile_geo(tile_name(*HOT_TILE))
    aois.append({"aoi_id": "aoi_1", "west": hg["west"], "south": hg["south"],
                 "east": hg["east"], "north": hg["north"]})
    for k in range(2, n_aois - 1):
        west = TILE_E0_LON + ((k * 5) % N_TILES) * TILE_DEG
        south = TILE_N0_LAT + ((k * 7) % N_TILES) * TILE_DEG
        aois.append({"aoi_id": f"aoi_{k}", "west": west, "south": south,
                     "east": west + 4 * TILE_DEG, "north": south + 3 * TILE_DEG})
    aois.append({"aoi_id": f"aoi_{n_aois - 1}", "west": 150.0, "south": -60.0,
                 "east": 160.0, "north": -50.0})
    return aois
