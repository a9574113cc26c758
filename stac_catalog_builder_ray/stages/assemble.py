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


def items_dataset(md, known_asset_types: Optional[FrozenSet[str]] = None):
    """asset-metadata Dataset -> item Dataset.  THE central shuffle (A6).

    The group key is ``item_id``; payload rows are small (bytes column was
    consumed by DecodeExtract), so the shuffle moves metadata only."""
    fn = lambda g: assemble_items(g, known_asset_types)  # noqa: E731
    return md.groupby("item_id").map_groups(fn, batch_format="pandas")
