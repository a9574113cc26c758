"""Item assembly: asset-metadata rows -> item rows via the central
``groupby(item_id)`` shuffle.

Reference semantics (driver-side dict in builder.py:726-793 +
``ItemBuilder.create_item`` builder.py:183-246), re-expressed as
``ds.groupby("item_id").map_groups(...)``:

- drop assets whose ``asset_type`` is not in the collection config (M19;
  whole group -> no item when none are known, builder.py:191-198)
- split each group by identical lat-lon bbox (``_split_group_by_latlon``,
  builder.py:780-793)
- assert epsg/transform/bbox/shape consistency within each sub-group
  (builder.py:203-217)
- item carries the first asset's geometry/projection + an assets map keyed by
  asset_type

Output: one row per item, ~200 bytes — bbox unpacked to scalar
west/south/east/north columns so the downstream extent aggregation is a plain
``Min/Max`` (A1) and the PIP join reads centroids without list unpacking.
"""

from __future__ import annotations

import json
from typing import FrozenSet, Optional

import numpy as np
import pandas as pd

ITEM_COLUMNS = [
    "item_id",
    "west",
    "south",
    "east",
    "north",
    "bbox_lat_lon",
    "bbox_projected",
    "transform",
    "shape",
    "proj_epsg",
    "datetime",
    "start_datetime",
    "end_datetime",
    "year",
    "cell",
    "lon",
    "lat",
    "tile_id",
    "assets_json",
    "n_assets",
]


def assemble_items(group: pd.DataFrame, known_asset_types: Optional[FrozenSet[str]] = None) -> pd.DataFrame:
    """Per-item_id group -> item rows (pandas in/out for map_groups)."""
    if known_asset_types is not None:
        known = group[group["asset_type"].isin(known_asset_types)]
    else:
        known = group
    if len(known) == 0:
        return pd.DataFrame({c: pd.Series([], dtype=object) for c in ITEM_COLUMNS})

    rows = []
    # _split_group_by_latlon: sub-group on the exact lat-lon bbox tuple
    keys = known["bbox_lat_lon"].map(tuple)
    for _, sub in known.groupby(keys, sort=True):
        sub = sub.sort_values("asset_id", kind="stable")  # O1 determinism
        first = sub.iloc[0]
        # consistency asserts (builder.py:203-217)
        for col in ("proj_epsg",):
            if sub[col].nunique() != 1:
                raise ValueError(f"inconsistent {col} within item {first['item_id']}")
        for col in ("transform", "bbox_projected", "shape"):
            arrs = sub[col].map(tuple)
            if arrs.nunique() != 1:
                raise ValueError(f"inconsistent {col} within item {first['item_id']}")
        assets = {
            r["asset_type"]: {
                "href": r["href"],
                "file_size": int(r["file_size"]),
                "media_type": r["media_type"],
                "bands": json.loads(r["bands_json"]),
            }
            for _, r in sub.iterrows()
        }
        bbox = list(map(float, first["bbox_lat_lon"]))
        dt = pd.Timestamp(first["datetime"])
        rows.append(
            {
                "item_id": first["item_id"],
                "west": bbox[0],
                "south": bbox[1],
                "east": bbox[2],
                "north": bbox[3],
                "bbox_lat_lon": bbox,
                "bbox_projected": list(map(float, first["bbox_projected"])),
                "transform": list(map(float, first["transform"])),
                "shape": list(map(int, first["shape"])),
                "proj_epsg": int(first["proj_epsg"]),
                "datetime": first["datetime"],
                "start_datetime": first["start_datetime"],
                "end_datetime": first["end_datetime"],
                "year": int(dt.year),
                "cell": int(first["cell"]),
                "lon": float(first["lon"]),
                "lat": float(first["lat"]),
                "tile_id": first["tile_id"],
                "assets_json": json.dumps(assets, sort_keys=True),
                "n_assets": len(sub),
            }
        )
    return pd.DataFrame(rows, columns=ITEM_COLUMNS)


def assemble_bucket(g: pd.DataFrame, known_asset_types: Optional[FrozenSet[str]] = None) -> pd.DataFrame:
    """Vectorized assembly over a whole BUCKET of items (thousands of groups
    per call): pandas C-speed groupby instead of a Python call per item.

    Semantics identical to :func:`assemble_items` (filter unknown asset
    types, split by lat-lon bbox, consistency asserts, first-asset geometry,
    assets map sorted by asset_type)."""
    if known_asset_types is not None:
        g = g[g["asset_type"].isin(known_asset_types)]
    if len(g) == 0:
        return pd.DataFrame({c: pd.Series([], dtype=object) for c in ITEM_COLUMNS})
    g = g.assign(_latlon=g["bbox_lat_lon"].map(tuple))
    # one sort makes every (item_id, latlon) group contiguous IN KEY ORDER,
    # with assets ordered by asset_id inside each group (O1 determinism)
    g = g.sort_values(["item_id", "_latlon", "asset_id"], kind="stable").reset_index(drop=True)

    grouped = g.groupby(["item_id", "_latlon"], sort=False)  # appearance order == key order
    n_groups = grouped.ngroups
    # consistency asserts, vectorized (builder.py:203-217): a group is
    # consistent iff adding the column to the key creates no extra groups
    if (grouped["proj_epsg"].nunique() != 1).any():
        raise ValueError("inconsistent proj_epsg within an item group")
    for col in ("transform", "bbox_projected", "shape"):
        distinct = pd.DataFrame(
            {"item_id": g["item_id"], "_latlon": g["_latlon"], "v": g[col].map(tuple)}
        ).drop_duplicates()
        if len(distinct) != n_groups:
            raise ValueError(f"inconsistent {col} within an item group")

    firsts = grouped.head(1).copy()  # first asset per group; df order == group order
    sizes = grouped.size().to_numpy()

    # assets map: itertuples once over the bucket (cheap), then join per group
    assets_per_group: list = []
    cur: dict = {}
    boundaries = np.cumsum(sizes)
    next_b = 0
    bands_cache: dict = {}  # bands_json strings are near-constant; parse once
    for pos, r in enumerate(g.itertuples(index=False)):
        bands = bands_cache.get(r.bands_json)
        if bands is None:
            bands = bands_cache[r.bands_json] = json.loads(r.bands_json)
        cur[r.asset_type] = {
            "href": r.href,
            "file_size": int(r.file_size),
            "media_type": r.media_type,
            "bands": bands,
        }
        if pos + 1 == boundaries[next_b]:
            assets_per_group.append(json.dumps(cur, sort_keys=True))
            cur = {}
            next_b += 1

    bbox = np.stack(firsts["bbox_lat_lon"].to_numpy())
    dt = pd.to_datetime(firsts["datetime"])
    out = pd.DataFrame(
        {
            "item_id": firsts["item_id"].to_numpy(),
            "west": bbox[:, 0],
            "south": bbox[:, 1],
            "east": bbox[:, 2],
            "north": bbox[:, 3],
            "bbox_lat_lon": firsts["bbox_lat_lon"].map(list).to_numpy(),
            "bbox_projected": firsts["bbox_projected"].map(list).to_numpy(),
            "transform": firsts["transform"].map(list).to_numpy(),
            "shape": firsts["shape"].map(list).to_numpy(),
            "proj_epsg": firsts["proj_epsg"].astype("int64").to_numpy(),
            "datetime": firsts["datetime"].to_numpy(),
            "start_datetime": firsts["start_datetime"].to_numpy(),
            "end_datetime": firsts["end_datetime"].to_numpy(),
            "year": dt.dt.year.to_numpy(),
            "cell": firsts["cell"].astype("int64").to_numpy(),
            "lon": firsts["lon"].to_numpy(),
            "lat": firsts["lat"].to_numpy(),
            "tile_id": firsts["tile_id"].to_numpy(),
            "assets_json": assets_per_group,
            "n_assets": sizes,
        }
    )
    return out[ITEM_COLUMNS]


N_ASSEMBLY_BUCKETS = 64

# the only columns assembly consumes — projected out BEFORE the shuffle so
# captions/phash/pixel-stat columns never enter the exchange
ASSEMBLY_INPUT_COLUMNS = [
    "item_id", "asset_id", "asset_type", "href", "media_type", "file_size",
    "bands_json", "bbox_lat_lon", "bbox_projected", "transform", "shape",
    "proj_epsg", "datetime", "start_datetime", "end_datetime",
    "cell", "lon", "lat", "tile_id",
]


def items_dataset(md, known_asset_types: Optional[FrozenSet[str]] = None,
                  n_buckets: int = N_ASSEMBLY_BUCKETS,
                  coalesce_blocks="auto"):
    """asset-metadata Dataset -> item Dataset.  THE central shuffle (A6).

    Grouping is BUCKETED: rows shuffle once on ``item_bucket =
    crc32(item_id) % n_buckets`` and each bucket assembles thousands of
    items with one vectorized pandas pass — a Python call per item would
    dominate the pipeline (measured 10x slower).  Two further measured
    shuffle optimizations: only ASSEMBLY_INPUT_COLUMNS enter the exchange,
    and blocks are coalesced first (hundreds of tiny decode-output blocks
    quadratically inflate sort-shuffle task count: 10.6s -> 1.6s at 50k
    rows)."""
    import pyarrow as pa

    if coalesce_blocks == "auto":
        # scale the pre-shuffle block count with the cluster instead of a
        # constant (a fixed 32 over-fragments small runs and caps big ones)
        from ..pipelines.relational import cluster_partitions

        coalesce_blocks = cluster_partitions(per_cpu=1.0, floor=16)

    def add_bucket(t: pa.Table) -> pa.Table:
        # C-level fixed-key siphash over the id strings (the er_join
        # add_vbucket pattern) — the previous per-row Python crc32 loop was
        # the one remaining row-loop in the flagship hot path.  Bucket
        # assignment is internal to the shuffle, so the swap changes no
        # output: items group identically whichever bucket they land in.
        ids = t["item_id"].to_pandas().fillna("")
        buckets = (pd.util.hash_array(ids.to_numpy(dtype=object))
                   % n_buckets).astype(np.int64)
        return t.append_column("item_bucket", pa.array(buckets))

    ds = md.select_columns(ASSEMBLY_INPUT_COLUMNS).map_batches(add_bucket, batch_format="pyarrow")
    if coalesce_blocks:
        ds = ds.repartition(coalesce_blocks)
    fn = lambda g: assemble_bucket(g, known_asset_types)  # noqa: E731
    return ds.groupby("item_bucket").map_groups(fn, batch_format="pandas")
