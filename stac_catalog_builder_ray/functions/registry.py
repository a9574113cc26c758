"""User-extension registries (SURVEY.md §2.8): item postprocessors and
group-key functions, registered by string name so configs stay declarative.

Reference extension points mirrored:
- ``item_postprocessor: Callable[[Item], Item]`` (builder.py:646,753-754) —
  engine form: a batch function over item ROWS (pandas in/out), applied after
  assembly; the real-world example (LCM-10 antimeridian split / property
  rename, configs-datasets/lcfm/LCM-10_utm/workflow.py:124-157) maps to a
  row-wise transform of the same power.
- ``_func_find_item_group`` (builder.py:671,843-863) — pluggable group key,
  default year.
"""

from __future__ import annotations

from typing import Callable, Dict

import pandas as pd

ItemPostprocessor = Callable[[pd.DataFrame], pd.DataFrame]
GroupKeyFn = Callable[[pd.DataFrame], pd.Series]

POSTPROCESSORS: Dict[str, ItemPostprocessor] = {}
GROUP_KEYS: Dict[str, GroupKeyFn] = {}


def register_postprocessor(name: str):
    def deco(fn: ItemPostprocessor):
        POSTPROCESSORS[name] = fn
        return fn

    return deco


def register_group_key(name: str):
    def deco(fn: GroupKeyFn):
        GROUP_KEYS[name] = fn
        return fn

    return deco


def get_postprocessor(name: str) -> ItemPostprocessor:
    if name not in POSTPROCESSORS:
        raise ValueError(f"Unknown postprocessor {name!r}; registered: {sorted(POSTPROCESSORS)}")
    return POSTPROCESSORS[name]


def get_group_key(name: str) -> GroupKeyFn:
    if name not in GROUP_KEYS:
        raise ValueError(f"Unknown group key {name!r}; registered: {sorted(GROUP_KEYS)}")
    return GROUP_KEYS[name]


@register_group_key("year")
def _group_by_year(items: pd.DataFrame) -> pd.Series:
    """The reference default: item.datetime.year (builder.py:863)."""
    return pd.to_datetime(items["datetime"]).dt.year


@register_group_key("tile")
def _group_by_tile(items: pd.DataFrame) -> pd.Series:
    return items["tile_id"]


@register_postprocessor("identity")
def _identity(items: pd.DataFrame) -> pd.DataFrame:
    return items


@register_postprocessor("title_prefix")
def _title_prefix(items: pd.DataFrame) -> pd.DataFrame:
    """Example postprocessor in the spirit of the LCM-10 property rewrite:
    prefixes item ids — demonstrates arbitrary row rewriting after assembly."""
    items = items.copy()
    items["item_id"] = "pp_" + items["item_id"].astype(str)
    return items


@register_postprocessor("antimeridian_split")
def _antimeridian_split(items: pd.DataFrame) -> pd.DataFrame:
    """The reference's motivating real-world postprocessor (LCM-10 UTM,
    configs-datasets/lcfm/LCM-10_utm/workflow.py:124-145): UTM zone 01/60
    tiles straddle the antimeridian, so their reprojected corners land near
    BOTH +180 and -180 and the naive min/max lat-lon bbox wrongly spans the
    whole world.  Fix: re-project the PROJECTED bbox corners vertex-by-
    vertex, split the lons by hemisphere, and keep the part on the zone's
    own side (zone 01 -> the negative-lon part, zone 60 -> the positive-lon
    part — the reference's ``geom_index`` rule).  Centroid + cell are
    recomputed so downstream spatial partitioning uses the fixed bbox."""
    import numpy as np

    from ..geo.cell import cell_encode, cell_res
    from ..geo.crs import project_points

    wrapped = (
        ((items["east"] - items["west"]) > 180.0)  # world-spanning min/max artifact
        | (items["west"] < -180.0)  # out-of-range unwrapped lons (engine CRS
        | (items["east"] > 180.0)  # keeps continuity instead of sign-flipping)
    )
    def _is_edge_utm(e) -> bool:
        # both hemispheres: 326xx (north) AND 327xx (south) zone 01/60 —
        # the reference keys on the tile prefix regardless of hemisphere;
        # null / non-numeric proj_epsg rows are skipped, not crashed on.
        try:
            epsg = int(e)
        except (TypeError, ValueError):
            return False
        return (32600 < epsg <= 32660 or 32700 < epsg <= 32760) and epsg % 100 in (1, 60)

    utm = items["proj_epsg"].map(_is_edge_utm)
    idx = items.index[wrapped & utm]
    if len(idx) == 0:
        return items
    items = items.copy()
    for i in idx:
        r = items.loc[i]
        pw, ps, pe, pn = r["bbox_projected"]
        epsg = int(r["proj_epsg"])
        zone = epsg % 100
        xs = np.array([pw, pe, pe, pw], dtype=np.float64)
        ys = np.array([ps, ps, pn, pn], dtype=np.float64)
        lons, lats = project_points(xs, ys, epsg, 4326)
        lons = ((lons + 180.0) % 360.0) - 180.0  # normalize to [-180, 180)
        side = lons < 0 if zone == 1 else lons > 0
        if not side.any() or side.all():
            continue  # nothing to split
        w, e = float(lons[side].min()), float(lons[side].max())
        s, n = float(lats.min()), float(lats.max())
        items.at[i, "west"], items.at[i, "south"] = w, s
        items.at[i, "east"], items.at[i, "north"] = e, n
        items.at[i, "bbox_lat_lon"] = [w, s, e, n]
        lon_c, lat_c = (w + e) / 2.0, (s + n) / 2.0
        items.at[i, "lon"], items.at[i, "lat"] = lon_c, lat_c
        res = int(cell_res(np.array([r["cell"]]))[0])
        items.at[i, "cell"] = int(cell_encode(np.array([lon_c]), np.array([lat_c]), res)[0])
    return items
