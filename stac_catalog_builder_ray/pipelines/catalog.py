"""The flagship catalog pipelines: images table -> STAC collection tree.

Ray-Data-first re-expression of the reference's three entry points
(commandapi.build_collection §3.1, build_grouped_collections §3.2, unlinked
mode builder.py:470-510) along the §3.4 spine:

    read_parquet(images) --> map_batches(DecodeExtract actor pool)
        --> groupby(item_id).map_groups(assemble)  [central shuffle, A6]
        --> map_batches(WriteItems actor pool)     [partitioned JSON sink, S5]
    extent = items.aggregate(Min/Max)              [A1/A2 partial+final]
    collection.json finalized driver-side          [tiny, S6]

No driver-held row state: the reference's in-memory ``List[AssetMetadata]``
and group dict (collector.py:119, builder.py:765-778) become streamed blocks.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import pandas as pd
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min

from ..config import CollectionConfig, test_collection_config
from ..functions.datetimes import iso_z
from ..sources.catalog_sink import (
    WriteItems,
    build_collection_json,
    build_root_collection_json,
    save_json,
)
from ..sources.images import read_images
from ..stages.extract import DecodeExtract

DEFAULT_EXTRACT_CONCURRENCY = (1, 8)
DEFAULT_BATCH_SIZE = 256


def asset_metadata_dataset(
    images_path: str,
    config: Optional[CollectionConfig] = None,
    cell_res: int = 6,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency=DEFAULT_EXTRACT_CONCURRENCY,
    max_rows: Optional[int] = None,
    verify_phash: bool = False,
    num_cpus: float = 1.0,
    fused: bool = False,
) -> Dataset:
    """images table -> asset-metadata Dataset (§3.1 steps a-b, distributed).

    Pool sizing for mixed pipelines (measured on the 200k-row bench table):
    a full-width actor pool HOLDS its CPUs while idle and starves the
    downstream shuffle (26 actors -> 76 s vs 24 actors at num_cpus=0.5 ->
    14.6 s end-to-end).  Callers running decode+shuffle together should pass
    ``concurrency ~= 0.75 * total_cpus`` with ``num_cpus=0.5``."""
    config = config or test_collection_config()
    ds = read_images(images_path, max_rows=max_rows)
    if fused:
        # task-pool decode FUSES with the read (ReadParquet->MapBatches is one
        # operator): bytes never enter the object store, and parallelism
        # follows the scheduler instead of a sized actor pool — the scaling
        # path (see stages/extract.decode_extract_batch)
        from ..stages.extract import decode_extract_batch

        # NO batch_size here: an explicit batch_size sets
        # min_rows_per_bundled_input, which Ray's fusion rule rejects for
        # Read->MapBatches — the whole point is to fuse.  The batch is then
        # one read block (one parquet file/fragment), which callers control
        # via the table's part size.
        return ds.map_batches(
            decode_extract_batch,
            fn_kwargs={"parser": config.input_path_parser, "cell_res": cell_res,
                       "verify_phash": verify_phash},
            batch_format="pyarrow",
        )
    return ds.map_batches(
        DecodeExtract,
        fn_constructor_kwargs={"parser": config.input_path_parser, "cell_res": cell_res,
                               "verify_phash": verify_phash},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


def items_dataset(
    md: Dataset,
    config: Optional[CollectionConfig] = None,
    postprocessor: Optional[str] = None,
) -> Dataset:
    """asset metadata -> item rows via the central groupby(item_id) shuffle.

    ``postprocessor`` names a registered item postprocessor (§2.8 ext point;
    builder.py:753-754) applied batch-wise after assembly."""
    from ..stages.assemble import items_dataset as _bucketed_items

    config = config or test_collection_config()
    known = frozenset(config.item_assets) if config.item_assets else None
    items = _bucketed_items(md, known)
    if postprocessor:
        from ..functions.registry import get_postprocessor

        fn = get_postprocessor(postprocessor)
        items = items.map_batches(fn, batch_format="pandas")
    return items


def _extent_from_items(items: Dataset) -> Dict:
    """A1/A2: spatial + temporal extent union as a distributed aggregate."""
    agg = items.aggregate(
        Min("west", alias_name="west"),
        Min("south", alias_name="south"),
        Max("east", alias_name="east"),
        Max("north", alias_name="north"),
        Min("start_datetime", alias_name="t0"),
        Max("end_datetime", alias_name="t1"),
        Count(alias_name="n_items"),
    )
    return agg


def build_collection(
    images_path: str,
    out_dir: str,
    config: Optional[CollectionConfig] = None,
    mode: str = "linked",
    cell_res: int = 6,
    max_rows: Optional[int] = None,
    write_concurrency=2,
) -> Dict:
    """§3.1 end-to-end.  Returns summary stats (paths, counts, extent)."""
    assert mode in ("linked", "unlinked")
    config = config or test_collection_config()
    md = asset_metadata_dataset(images_path, config, cell_res=cell_res, max_rows=max_rows)
    # item rows are ~200 bytes each; materializing lets the write pass and the
    # extent aggregate share one execution instead of re-decoding the images
    items = items_dataset(md, config).materialize()

    manifest = items.map_batches(
        WriteItems,
        fn_constructor_kwargs={"out_dir": out_dir, "config": config, "mode": mode},
        batch_format="pandas",
        concurrency=write_concurrency,
    )
    # one pass: manifest rows are tiny; collect rel paths for collection links
    written = manifest.to_pandas()

    # second (cheap, metadata-only) pass for the extent aggregate
    agg = _extent_from_items(items)
    extent_bbox = [agg["west"], agg["south"], agg["east"], agg["north"]]
    interval = [iso_z(pd.Timestamp(agg["t0"]).to_datetime64()), iso_z(pd.Timestamp(agg["t1"]).to_datetime64())]

    doc = build_collection_json(
        config,
        extent_bbox,
        interval,
        item_rel_hrefs=sorted(written["path"]) if mode == "linked" else [],
        mode=mode,
    )
    coll_path = save_json(doc, os.path.join(out_dir, "collection.json"))
    return {
        "collection_path": coll_path,
        "n_items": int(agg["n_items"]),
        "n_files": len(written),
        "extent_bbox": extent_bbox,
        "interval": interval,
    }


def build_grouped_collections(
    images_path: str,
    out_dir: str,
    config: Optional[CollectionConfig] = None,
    cell_res: int = 6,
    max_rows: Optional[int] = None,
    write_concurrency=2,
) -> Dict:
    """§3.2: one child collection per year + a root collection.

    The reference materializes Dict[group, List[Item]] on the driver
    (builder.py:843-856); here the group key is a column and the per-group
    extents come from ONE distributed groupby aggregate — only the per-group
    summary rows reach the driver."""
    config = config or test_collection_config()
    md = asset_metadata_dataset(images_path, config, cell_res=cell_res, max_rows=max_rows)
    items = items_dataset(md, config).materialize()  # small item rows, two consumers

    manifest = items.map_batches(
        WriteItems,
        fn_constructor_kwargs={"out_dir": out_dir, "config": config, "mode": "grouped",
                               "root_title": config.title},
        batch_format="pandas",
        concurrency=write_concurrency,
    ).to_pandas()

    per_group = (
        items.groupby("year")
        .aggregate(
            Min("west", alias_name="west"),
            Min("south", alias_name="south"),
            Max("east", alias_name="east"),
            Max("north", alias_name="north"),
            Min("start_datetime", alias_name="t0"),
            Max("end_datetime", alias_name="t1"),
            Count(alias_name="n_items"),
        )
        .to_pandas()
        .sort_values("year")  # groups processed in sorted key order (builder.py:873)
    )

    child_ids, child_titles = [], {}
    for _, g in per_group.iterrows():
        year = int(g["year"])
        cid_g = f"{config.collection_id}_{year}"
        title_g = f"{config.title} {year}"
        child_ids.append(cid_g)
        child_titles[cid_g] = title_g
        child_cfg = CollectionConfig(
            collection_id=cid_g, title=title_g, description=config.description,
            item_assets=config.item_assets, keywords=config.keywords,
            providers=config.providers, license=config.license,
        )
        rel_items = sorted(
            p.split("/", 1)[1]  # strip the leading "{cid_g}/" — hrefs are relative to the child dir
            for p in manifest.loc[manifest["year"] == year, "path"]
        )
        doc = build_collection_json(
            child_cfg,
            [g["west"], g["south"], g["east"], g["north"]],
            [iso_z(pd.Timestamp(g["t0"]).to_datetime64()), iso_z(pd.Timestamp(g["t1"]).to_datetime64())],
            rel_items,
            parent_rel="../collection.json",
            root_rel_title=config.title,
        )
        save_json(doc, os.path.join(out_dir, cid_g, "collection.json"))

    root_doc = build_root_collection_json(
        config,
        [per_group["west"].min(), per_group["south"].min(), per_group["east"].max(), per_group["north"].max()],
        [
            iso_z(per_group["t0"].min().to_datetime64()),
            iso_z(per_group["t1"].max().to_datetime64()),
        ],
        child_ids,
        child_titles,
    )
    save_json(root_doc, os.path.join(out_dir, "collection.json"))
    return {
        "n_items": int(per_group["n_items"].sum()),
        "n_groups": len(per_group),
        "children": child_ids,
    }
