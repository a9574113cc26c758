"""Flagship pipeline: index the image table, spatially join it, checkpoint it.

This is the benchmark headline ("items indexed + spatially joined/sec",
BASELINE.json) — the full §3.4 spine:

    read_parquet(images)
      -> DecodeExtract actor pool        (decode + metadata + cell encode)
      -> groupby(item_id) item assembly  (central shuffle, small rows)
      -> [fan-out, shared via one materialize of the small item table]
           a) PIP join vs broadcast AOI polygons     (J4, no shuffle)
           b) raster->vector tile assignment          (J6, vectorized explode)
           c) spatial+temporal extent aggregate       (A1/A2)
           d) checkpointed partitioned write by cell  (resume + lineage)
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min

from ..config import CollectionConfig, tiled_collection_config
from ..datagen import generate_aois
from ..stages.spatial import assign_tiles, knn_join, pip_join
from ..state.checkpoint import checkpointed_write
from .catalog import asset_metadata_dataset, items_dataset


def index_and_join(
    images_path: str,
    out_root: Optional[str] = None,
    config: Optional[CollectionConfig] = None,
    aois: Optional[List[dict]] = None,
    cell_res: int = 6,
    tile_res: int = 7,
    knn_k: int = 0,
    extract_concurrency=(1, 8),
    batch_size: int = 256,
    checkpoint: bool = True,
) -> Dict:
    """Returns summary stats + the materialized item Dataset under ``items``.

    ``knn_k > 0`` additionally runs the kNN self-join over item centroids
    (off by default in the headline: tile centroids are degenerate for kNN —
    the operator is benchmarked separately over distinct points)."""
    config = config or tiled_collection_config()
    aois = aois if aois is not None else generate_aois()

    md = asset_metadata_dataset(
        images_path, config, cell_res=cell_res,
        batch_size=batch_size, concurrency=extract_concurrency,
    )
    items = items_dataset(md, config).materialize()  # small rows, 4 consumers

    matches = pip_join(items, aois)
    n_matches = matches.count()

    tiles = assign_tiles(items, res=tile_res)
    n_tile_pairs = tiles.count()

    agg = items.aggregate(
        Min("west", alias_name="west"),
        Min("south", alias_name="south"),
        Max("east", alias_name="east"),
        Max("north", alias_name="north"),
        Count(alias_name="n_items"),
    )

    n_knn_pairs = 0
    if knn_k:
        n_knn_pairs = knn_join(items, k=knn_k, res=cell_res).count()

    summary = None
    if checkpoint and out_root:
        summary = checkpointed_write(
            items.drop_columns(["bbox_lat_lon", "bbox_projected", "transform", "shape"]),
            os.path.join(out_root, "items_by_cell"),
            "cell",
        )

    return {
        "items": items,
        "n_items": int(agg["n_items"]),
        "n_pip_matches": int(n_matches),
        "n_tile_pairs": int(n_tile_pairs),
        "n_knn_pairs": int(n_knn_pairs),
        "extent": [agg["west"], agg["south"], agg["east"], agg["north"]],
        "partitions_written": int((~summary["skipped"]).sum()) if summary is not None and len(summary) else 0,
    }


def images_from_documents(sf_dir: str, cache_dir: str, w: int = 64, h: int = 48) -> str:
    """Derive a deterministic images table from the driver's ``documents``
    parquet (one image per doc_id) — entry()'s way of running the flagship
    over the provided testdata without external data.  Cached in
    ``cache_dir`` (atomic parts, resumable)."""
    import pyarrow.parquet as pq

    from ..datagen import generate_images_table

    n = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    out = os.path.join(cache_dir, f"images-docs-{n}-{w}x{h}")
    generate_images_table(out, n_rows=n, w=w, h=h)
    return out
