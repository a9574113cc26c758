"""STAC catalog sink: distributed item-JSON writer + driver-side collection
finalize.

Reference: per-item JSON save (builder.py:470-481,515-519, S5), collection
save (builder.py:545-555, S6), ``normalize_hrefs`` with the
``${collection}/${year}`` template layout (builder.py:521-528, config.py:291,
S7), grouped collections (builder.py:858-889, A3).

Engine split:
- ``WriteItems`` — actor-pool ``map_batches`` stage: serializes item rows to
  STAC Item JSON and writes them partitioned by year (linked/grouped) or
  y/m/d (unlinked).  Hrefs are deterministic functions of
  (collection_id, year, item_id) — a column computation, not pystac link
  resolution.  Emits manifest rows (item_id, path) so the pipeline output is
  a Dataset, resumable and countable.
- ``build_collection_json`` / ``build_root_collection_json`` — tiny
  driver-side finalizers fed by the extent aggregate (A1/A2).

Layouts produced match the reference goldens
(tests/data/reference/{basic,grouped,unlinked}) byte-for-byte after the
reference's own normalization (created blanked, hrefs relativized — ours are
already relative).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import pandas as pd
import pyarrow as pa

from ..config import AssetConfig, CollectionConfig
from ..functions.datetimes import iso_z
from ..geo.bbox import box_ring
from ..geo.crs import project_ring

ITEM_EXTENSIONS = [
    "https://stac-extensions.github.io/projection/v1.1.0/schema.json",
    "https://stac-extensions.github.io/file/v2.1.0/schema.json",
    "https://stac-extensions.github.io/raster/v1.1.0/schema.json",
    "https://stac-extensions.github.io/eo/v1.1.0/schema.json",
]
COLLECTION_EXTENSIONS = [
    "https://stac-extensions.github.io/item-assets/v1.0.0/schema.json",
    "https://stac-extensions.github.io/raster/v1.1.0/schema.json",
    "https://stac-extensions.github.io/eo/v1.1.0/schema.json",
]


def _ring_coords(w: float, s: float, e: float, n: float) -> List[List[float]]:
    return [[float(x), float(y)] for x, y in box_ring(w, s, e, n)]


def item_to_stac_dict(
    row: dict,
    collection_id: str,
    collection_title: str,
    asset_configs: Dict[str, AssetConfig],
    mode: str = "linked",
    root_title: Optional[str] = None,
    created: str = "",
) -> dict:
    """One item row (assemble.py schema) -> STAC Item JSON dict, matching the
    reference goldens field-for-field."""
    pw, ps, pe, pn = row["bbox_projected"]
    epsg = int(row["proj_epsg"])
    # geometry_lat_lon = the projected box ring reprojected VERTEX-BY-VERTEX
    # (project_polygon, projections.py:21-45) — not a re-boxed bbox; for 4326
    # this preserves the identity-transform ring orientation of the goldens
    ll_ring = project_ring(box_ring(pw, ps, pe, pn), epsg, 4326)
    properties = {
        "start_datetime": iso_z(row["start_datetime"]),
        "end_datetime": iso_z(row["end_datetime"]),
        "created": created,
        "proj:epsg": int(row["proj_epsg"]),
        "proj:geometry": {"type": "Polygon", "coordinates": [_ring_coords(pw, ps, pe, pn)]},
        "proj:bbox": [float(v) for v in row["bbox_projected"]],
        "proj:shape": [int(v) for v in row["shape"]],
        "proj:transform": [float(v) for v in row["transform"]],
        "datetime": iso_z(row["datetime"]),
    }
    assets = {}
    for atype, a in sorted(json.loads(row["assets_json"]).items()):
        cfg = asset_configs.get(atype)
        entry = {"href": a["href"], "type": a["media_type"]}
        if cfg:
            entry["title"] = cfg.title
            entry["description"] = cfg.description
            entry["eo:bands"] = [
                {"name": b.name, "description": b.description} for b in cfg.eo_bands
            ]
        entry["file:size"] = a["file_size"]
        entry["raster:bands"] = [{"data_type": b["data_type"]} for b in a["bands"]]
        entry["roles"] = list(cfg.roles) if cfg else ["data"]
        assets[atype] = entry

    if mode == "unlinked":
        links = []
    elif mode == "grouped":
        links = [
            {"rel": "collection", "href": "../../collection.json", "type": "application/json", "title": collection_title},
            {"rel": "parent", "href": "../../collection.json", "type": "application/json", "title": collection_title},
            {"rel": "root", "href": "../../../collection.json", "type": "application/json", "title": root_title or collection_title},
        ]
    else:  # linked
        links = [
            {"rel": "collection", "href": "../../collection.json", "type": "application/json", "title": collection_title},
            {"rel": "parent", "href": "../../collection.json", "type": "application/json", "title": collection_title},
            {"rel": "root", "href": "../../collection.json", "type": "application/json", "title": collection_title},
        ]

    doc = {
        "type": "Feature",
        "stac_version": "1.0.0",
        "stac_extensions": ITEM_EXTENSIONS,
        "id": row["item_id"],
        "geometry": {"type": "Polygon", "coordinates": [[[float(x), float(y)] for x, y in ll_ring]]},
        "bbox": [float(v) for v in row["bbox_lat_lon"]],
        "properties": properties,
        "links": links,
        "assets": assets,
    }
    if mode != "unlinked":
        # unlinked items carry no collection membership (no links either) —
        # golden tests/data/reference/unlinked item files have neither
        doc["collection"] = collection_id
    return doc


def item_rel_path(row: dict, collection_id: str, mode: str) -> str:
    """Deterministic item href under the output root (S7 normalize_hrefs as a
    column computation).  linked: ``{cid}/{year}/{item}.json`` (template
    ${collection}/${year}); unlinked: ``{cid}/{y}/{m}/{d}/...``
    (builder.py:515-519); grouped: ``{cid}_{y}/{cid}_{y}/{y}/{item}.json``
    (child-collection output dirs, builder.py:815-841)."""
    dt = pd.Timestamp(row["datetime"])
    if mode == "unlinked":
        return f"{collection_id}/{dt.year}/{dt.month:02d}/{dt.day:02d}/{row['item_id']}.json"
    if mode == "grouped":
        cid_g = f"{collection_id}_{dt.year}"
        return f"{cid_g}/{cid_g}/{dt.year}/{row['item_id']}.json"
    return f"{collection_id}/{dt.year}/{row['item_id']}.json"


class WriteItems:
    """Actor-pool map_batches stage: item rows -> JSON files + manifest rows.

    Writes are atomic (tmp + rename) so a partition-level rerun is idempotent
    (the resumable-output contract, SURVEY.md §4)."""

    def __init__(
        self,
        out_dir: str,
        config: CollectionConfig,
        mode: str = "linked",
        root_title: Optional[str] = None,
        created: str = "",
    ):
        self.out_dir = out_dir
        self.config = config
        self.mode = mode
        self.root_title = root_title
        self.created = created

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        cid = self.config.collection_id
        paths, ids = [], []
        for _, row in batch.iterrows():
            rel = item_rel_path(row, cid, self.mode)
            path = os.path.join(self.out_dir, rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            if self.mode == "grouped":
                # child collection id/title are suffixed _{group} (builder.py:567-569)
                year = pd.Timestamp(row["datetime"]).year
                row_cid = f"{cid}_{year}"
                row_title = f"{self.config.title} {year}"
            else:
                row_cid, row_title = cid, self.config.title
            doc = item_to_stac_dict(
                row, row_cid, row_title, self.config.item_assets,
                mode=self.mode, root_title=self.root_title or self.config.title,
                created=self.created,
            )
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(doc, f)
            os.replace(tmp, path)
            paths.append(rel)
            ids.append(row["item_id"])
        return pd.DataFrame({"item_id": ids, "path": paths, "year": batch["year"].values})


def build_collection_json(
    config: CollectionConfig,
    extent_bbox: List[float],
    extent_interval: List[str],
    item_rel_hrefs: List[str],
    mode: str = "linked",
    parent_rel: Optional[str] = None,
    root_rel_title: Optional[str] = None,
) -> dict:
    """Driver-side collection document (S6).  ``item_rel_hrefs`` are sorted
    for deterministic link order (O2, builder.py:549)."""
    links = [
        {"rel": "item", "href": f"./{h}", "type": "application/json"}
        for h in sorted(item_rel_hrefs)
    ]
    if parent_rel:  # child collection in a grouped build
        links.append({"rel": "parent", "href": parent_rel, "type": "application/json", "title": root_rel_title})
        links.append({"rel": "root", "href": parent_rel, "type": "application/json", "title": root_rel_title})
    else:
        links.append({"rel": "root", "href": "./collection.json", "type": "application/json", "title": config.title})

    item_assets = {
        atype: {
            "type": cfg.media_type,
            "title": cfg.title,
            "description": cfg.description,
            "roles": list(cfg.roles),
            "eo:bands": [{"name": b.name, "description": b.description} for b in cfg.eo_bands],
        }
        for atype, cfg in sorted(config.item_assets.items())
    }
    return {
        "type": "Collection",
        "id": config.collection_id,
        "stac_version": "1.0.0",
        "description": config.description,
        "links": links,
        "stac_extensions": COLLECTION_EXTENSIONS,
        "item_assets": item_assets,
        "title": config.title,
        "extent": {
            "spatial": {"bbox": [[float(v) for v in extent_bbox]]},
            "temporal": {"interval": [list(extent_interval)]},
        },
        "license": config.license,
        "keywords": list(config.keywords),
        "providers": list(config.providers),
    }


def build_root_collection_json(
    config: CollectionConfig,
    extent_bbox: List[float],
    extent_interval: List[str],
    child_ids: List[str],
    child_titles: Dict[str, str],
) -> dict:
    """Grouped-build root: child links only (builder.py:867-888)."""
    links = [
        {"rel": "child", "href": f"./{cid}/collection.json", "type": "application/json", "title": child_titles[cid]}
        for cid in sorted(child_ids)
    ]
    links.append({"rel": "root", "href": "./collection.json", "type": "application/json", "title": config.title})
    doc = build_collection_json(config, extent_bbox, extent_interval, [], mode="linked")
    doc["links"] = links
    return doc


def save_json(doc: dict, path: str) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=2)
    os.replace(tmp, path)
    return path
