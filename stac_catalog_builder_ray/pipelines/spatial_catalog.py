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
    extract_concurrency=None,
    batch_size: int = 256,
    checkpoint: bool = True,
    verify_phash: bool = False,
    salt_hot_threshold: Optional[int] = None,
) -> Dict:
    """Returns summary stats + the materialized item Dataset under ``items``.

    Decode runs READ-FUSED (task pool, scales with the scheduler) unless
    ``extract_concurrency`` explicitly requests a fixed actor pool — a fixed
    pool equal to the session's CPU count starves the downstream shuffle
    (actors hold their CPUs while idle), so size explicit pools at most
    ~cpus/2.  ``knn_k > 0`` additionally runs the kNN self-join over item
    centroids (off by default in the headline: tile centroids are
    degenerate for kNN — the operator is benchmarked separately over
    distinct points).  ``salt_hot_threshold``: rows per cell above which the
    checkpointed cell-partitioned write splits hot cells into
    ``cell#salt`` sub-partitions (SURVEY §4 hot-cell salting; content-hash
    salts keep resume exactly-once — see ``checkpointed_write``)."""
    config = config or tiled_collection_config()
    aois = aois if aois is not None else generate_aois()

    md = asset_metadata_dataset(
        images_path, config, cell_res=cell_res,
        batch_size=batch_size,
        concurrency=extract_concurrency or (1, 8),
        verify_phash=verify_phash,
        fused=extract_concurrency is None,
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
            salt_hot_threshold=salt_hot_threshold,
            salt_id_col="item_id" if salt_hot_threshold is not None else None,
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


_PARTIAL_POLYS: Dict[str, object] = {}


def _join_partials_batch(t, aois_json: str, tile_res: int):
    """Task-pool join/extent partials (fuses with the assembly stage output):
    PIP match count vs the AOI set, covering-tile count (arithmetic, no
    explode needed for counts), extent partials.  The PolygonSet+STRtree is
    built once per worker process from the (tiny) JSON-encoded AOI list."""
    import json

    import numpy as np
    import pyarrow as pa

    from ..geo.geometry import PolygonSet

    cached = _PARTIAL_POLYS.get(aois_json)
    if cached is None:
        a = json.loads(aois_json)
        rings = [
            np.array([(x["east"], x["south"]), (x["east"], x["north"]),
                      (x["west"], x["north"]), (x["west"], x["south"]),
                      (x["east"], x["south"])], dtype=np.float64)
            for x in a
        ]
        cached = _PARTIAL_POLYS[aois_json] = PolygonSet(rings)
    polys = cached
    lon = t["lon"].to_numpy(zero_copy_only=False)
    lat = t["lat"].to_numpy(zero_copy_only=False)
    pi, _ = polys.contains_points(lon, lat)
    w = t["west"].to_numpy(zero_copy_only=False)
    s = t["south"].to_numpy(zero_copy_only=False)
    e = t["east"].to_numpy(zero_copy_only=False)
    n = t["north"].to_numpy(zero_copy_only=False)
    g = np.int64(1 << tile_res)
    x0 = np.clip(np.floor((w + 180.0) / 360.0 * g), 0, g - 1)
    x1 = np.clip(np.floor((e + 180.0) / 360.0 * g), 0, g - 1)
    y0 = np.clip(np.floor((s + 90.0) / 180.0 * g), 0, g - 1)
    y1 = np.clip(np.floor((n + 90.0) / 180.0 * g), 0, g - 1)
    n_tiles = int(((x1 - x0 + 1) * (y1 - y0 + 1)).sum())
    return pa.table(
        {
            "n_items": pa.array([t.num_rows]),
            "n_pip_matches": pa.array([int(len(pi))]),
            "n_tile_pairs": pa.array([n_tiles]),
            "west": pa.array([float(w.min()) if len(w) else 180.0]),
            "south": pa.array([float(s.min()) if len(s) else 90.0]),
            "east": pa.array([float(e.max()) if len(e) else -180.0]),
            "north": pa.array([float(n.max()) if len(n) else -90.0]),
        }
    )


def index_and_join_fused(
    images_path: str,
    config: Optional[CollectionConfig] = None,
    aois: Optional[List[dict]] = None,
    cell_res: int = 6,
    tile_res: int = 7,
    batch_size: int = 512,
    assembly_blocks: Optional[int] = None,
) -> Dict:
    """ONE streaming pass for the benchmark headline: decode -> assembly ->
    (PIP match count + tile-pair count + extent) computed as per-batch
    partials folded by a single tiny aggregate.

    Every map stage is a TASK-POOL function, so Ray fuses the chain into
    read tasks (decode) and shuffle-output tasks (partials): the wide
    ``bytes`` column never leaves the read task, no fixed actor pool holds
    CPUs while draining, and parallelism at every stage follows the
    scheduler — the properties the N-vs-4N scaling criterion needs.  This is
    the shape a 100 TB run would use when only join/extent summaries (not
    the full match list) are required."""
    import json

    import ray
    from ray.data.aggregate import Max, Min, Sum

    config = config or tiled_collection_config()
    aois = aois if aois is not None else generate_aois()
    if assembly_blocks is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        assembly_blocks = max(16, cpus)

    md = asset_metadata_dataset(
        images_path, config, cell_res=cell_res,
        batch_size=batch_size, verify_phash=True, fused=True,
    )
    from ..stages.assemble import items_dataset as _items

    items = _items(md, frozenset(config.item_assets), coalesce_blocks=assembly_blocks)

    partials = items.map_batches(
        _join_partials_batch,
        fn_kwargs={"aois_json": json.dumps(aois, sort_keys=True), "tile_res": tile_res},
        batch_format="pyarrow",
    )
    agg = partials.aggregate(
        Sum("n_items", alias_name="n_items"),
        Sum("n_pip_matches", alias_name="n_pip_matches"),
        Sum("n_tile_pairs", alias_name="n_tile_pairs"),
        Min("west", alias_name="west"),
        Min("south", alias_name="south"),
        Max("east", alias_name="east"),
        Max("north", alias_name="north"),
    )
    return {
        "n_items": int(agg["n_items"]),
        "n_pip_matches": int(agg["n_pip_matches"]),
        "n_tile_pairs": int(agg["n_tile_pairs"]),
        "extent": [agg["west"], agg["south"], agg["east"], agg["north"]],
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
