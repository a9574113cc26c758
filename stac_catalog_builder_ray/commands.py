"""Command / introspection API — engine equivalents of the reference's
debugging entry points (``commandapi.py:150-286``): the functions real users
live in when testing configs and inspecting intermediate results.

| Reference (commandapi.py)      | Engine                                    |
|--------------------------------|-------------------------------------------|
| ``list_input_files`` (:152)    | :func:`list_input_files`                  |
| ``list_asset_metadata`` (:176) | :func:`list_asset_metadata` (DataFrame)   |
| ``list_stac_items`` (:205)     | :func:`list_stac_items` (+ failed files)  |
| ``load_collection`` (:246)     | :func:`load_collection`                   |
| ``validate_collection`` (:257) | :func:`validate_collection` (structural)  |
| ``build_collection`` (:68)     | ``pipelines.catalog.build_collection``    |
| ``build_grouped_collections``  | ``pipelines.catalog.build_grouped_...``   |
| ``upload_to_stac_api`` (:269)  | ``sources.upload.upload_items``           |

All listing commands run the SAME distributed stages as the full pipeline —
a ``limit`` keeps them interactive; nothing is reimplemented driver-side.
The reference validates via pystac's JSON-schema client (needs network);
:func:`validate_collection` is a self-contained structural validator
covering the same failure classes (missing required fields, dangling links,
extent inconsistencies, malformed items).
"""

from __future__ import annotations

import glob as _glob
import json
import os
from typing import Dict, List, Optional, Tuple

from .config import CollectionConfig, test_collection_config

REQUIRED_COLLECTION_FIELDS = ("type", "stac_version", "id", "description", "license", "extent", "links")
REQUIRED_ITEM_FIELDS = ("type", "stac_version", "id", "geometry", "bbox", "properties", "links", "assets")


def list_input_files(input_dir: str, pattern: str = "*.parquet",
                     max_files: Optional[int] = None) -> List[str]:
    """S1 semantics (collector.py:75-84 via commandapi.py:152-174): glob the
    table directory, files only, optional cap."""
    from .sources.images import list_image_files

    return list_image_files(input_dir, pattern, max_files)


def list_asset_metadata(images_path: str, config: Optional[CollectionConfig] = None,
                        limit: Optional[int] = 20):
    """First ``limit`` asset-metadata rows as a pandas DataFrame — the
    digestion-debugging view (commandapi.py:176-203).  Runs the real
    DecodeExtract stage; ``limit`` keeps it interactive."""
    from .pipelines.catalog import asset_metadata_dataset

    ds = asset_metadata_dataset(images_path, config or test_collection_config())
    if limit:
        ds = ds.limit(limit)
    return ds.to_pandas()


def list_stac_items(images_path: str, config: Optional[CollectionConfig] = None,
                    limit: Optional[int] = None,
                    postprocessor: Optional[str] = None) -> Tuple[List[dict], List[str]]:
    """STAC item dicts + the input files that produced NO item (the
    failed-file anti-projection M20; commandapi.py:205-243)."""
    from .pipelines.catalog import asset_metadata_dataset, items_dataset
    from .sources.catalog_sink import item_to_stac_dict

    config = config or test_collection_config()
    md = asset_metadata_dataset(images_path, config)
    if limit:
        md = md.limit(limit)
    md = md.materialize()  # consumed twice (items + failed-file anti-join)
    items_df = items_dataset(md, config, postprocessor=postprocessor).to_pandas()
    docs = [
        item_to_stac_dict(row, config.collection_id, config.title, config.item_assets)
        for row in items_df.to_dict("records")
    ]
    # failed files: assets whose item_id produced no item (unknown asset_type);
    # an all-filtered run returns a columnless empty frame
    produced = set(items_df["item_id"]) if "item_id" in items_df.columns else set()
    md_df = md.select_columns(["original_href", "item_id"]).to_pandas()
    failed = sorted(md_df.loc[~md_df["item_id"].isin(produced), "original_href"])
    return docs, failed


def load_collection(collection_file: str) -> dict:
    """commandapi.py:246-254."""
    with open(collection_file) as f:
        return json.load(f)


def validate_collection(collection_file: str, check_items: bool = True) -> Dict:
    """Structural validation of a written collection tree
    (commandapi.py:257-265; pystac ``validate_all`` needs network — this is
    the self-contained equivalent).  Raises ``DataValidationError``
    (exceptions.py:40) listing every problem found; returns summary counts when valid."""
    problems: List[str] = []
    base = os.path.dirname(os.path.abspath(collection_file))
    doc = load_collection(collection_file)

    for f in REQUIRED_COLLECTION_FIELDS:
        if f not in doc:
            problems.append(f"collection missing required field {f!r}")
    if doc.get("type") != "Collection":
        problems.append(f"collection type is {doc.get('type')!r}, expected 'Collection'")
    ext = doc.get("extent", {})
    bboxes = ext.get("spatial", {}).get("bbox", [])
    intervals = ext.get("temporal", {}).get("interval", [])
    if not bboxes or len(bboxes[0]) != 4:
        problems.append("collection extent.spatial.bbox malformed")
    if not intervals or len(intervals[0]) != 2:
        problems.append("collection extent.temporal.interval malformed")

    n_items = n_children = 0
    item_boxes = []
    for link in doc.get("links", []):
        rel, href = link.get("rel"), link.get("href", "")
        if rel not in ("item", "child"):
            continue
        target = os.path.normpath(os.path.join(base, href))
        if not os.path.exists(target):
            problems.append(f"dangling {rel} link: {href}")
            continue
        if rel == "child":
            n_children += 1
            continue
        n_items += 1
        if not check_items:
            continue
        item = json.load(open(target))
        for f in REQUIRED_ITEM_FIELDS:
            if f not in item:
                problems.append(f"item {href}: missing field {f!r}")
        props = item.get("properties", {})
        if "datetime" not in props:
            problems.append(f"item {href}: properties.datetime missing")
        for name, a in item.get("assets", {}).items():
            if "href" not in a:
                problems.append(f"item {href}: asset {name} has no href")
        if isinstance(item.get("bbox"), list) and len(item["bbox"]) == 4:
            item_boxes.append(item["bbox"])
        else:
            problems.append(f"item {href}: bbox malformed")

    # extent consistency: every item bbox inside the declared spatial extent
    if bboxes and len(bboxes[0]) == 4 and item_boxes:
        W, S, E, N = bboxes[0]
        for b in item_boxes:
            if b[0] < W - 1e-9 or b[1] < S - 1e-9 or b[2] > E + 1e-9 or b[3] > N + 1e-9:
                problems.append(f"item bbox {b} outside collection extent {bboxes[0]}")

    if problems:
        from .exceptions import DataValidationError

        raise DataValidationError("collection validation failed:\n  " + "\n  ".join(problems))
    return {"valid": True, "n_item_links": n_items, "n_child_links": n_children}


def _main(argv: List[str]) -> int:
    """Tiny CLI: ``python -m stac_catalog_builder_ray <command> ...``
    mirroring the reference's click CLI surface (``__main__`` -> commandapi)."""
    import argparse

    p = argparse.ArgumentParser(prog="stac_catalog_builder_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    lf = sub.add_parser("list-files"); lf.add_argument("input_dir"); lf.add_argument("--glob", default="*.parquet"); lf.add_argument("--max-files", type=int, default=None)
    lm = sub.add_parser("list-metadata"); lm.add_argument("images_path"); lm.add_argument("--limit", type=int, default=20)
    li = sub.add_parser("list-items"); li.add_argument("images_path"); li.add_argument("--limit", type=int, default=None)
    vc = sub.add_parser("validate"); vc.add_argument("collection_file")
    bc = sub.add_parser("build"); bc.add_argument("images_path"); bc.add_argument("out_dir"); bc.add_argument("--mode", default="linked", choices=["linked", "unlinked"])
    bg = sub.add_parser("build-grouped"); bg.add_argument("images_path"); bg.add_argument("out_dir")
    # VPP introspection wrappers (commandapi_vpp.py:131-156)
    for name in ("vpp-count-products", "vpp-count-products-per-slot", "vpp-collection-config"):
        vp = sub.add_parser(name)
        vp.add_argument("--start", default="2020-01-01"); vp.add_argument("--end", default="2020-06-01")
        vp.add_argument("--product-types", default="default")
        if name == "vpp-collection-config":
            vp.add_argument("collection_id")
    cm = sub.add_parser("corpus-manifest")
    cm.add_argument("sf_dir"); cm.add_argument("out_parquet")
    a = p.parse_args(argv)

    if a.cmd == "list-files":
        for f in list_input_files(a.input_dir, a.glob, a.max_files):
            print(f)
        return 0

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        if a.cmd == "list-metadata":
            print(list_asset_metadata(a.images_path, limit=a.limit).to_string())
        elif a.cmd == "list-items":
            docs, failed = list_stac_items(a.images_path, limit=a.limit)
            print(json.dumps(docs, indent=2))
            if failed:
                print(f"# {len(failed)} failed files:", *failed, sep="\n# ")
        elif a.cmd == "validate":
            print(json.dumps(validate_collection(a.collection_file)))
        elif a.cmd == "build":
            from .pipelines.catalog import build_collection

            r = build_collection(a.images_path, a.out_dir, mode=a.mode)
            print(json.dumps({k: v for k, v in r.items() if k != "items"}, default=str))
        elif a.cmd == "build-grouped":
            from .pipelines.catalog import build_grouped_collections

            r = build_grouped_collections(a.images_path, a.out_dir)
            print(json.dumps(r, default=str))
        elif a.cmd == "corpus-manifest":
            from .pipelines.text import q_training_manifest

            pdf = q_training_manifest(a.sf_dir).to_pandas()
            pdf.sort_values("doc_id").to_parquet(a.out_parquet, index=False)
            print(json.dumps({
                "rows": int(len(pdf)),
                "by_reason": {k: int(v) for k, v in
                              pdf["reason"].value_counts().items()},
            }))
        elif a.cmd.startswith("vpp-"):
            from .sources.slots import (
                collection_config_from_products,
                count_products,
                count_products_per_query_slot,
                generate_query_slots,
            )

            slots = generate_query_slots(
                a.start, a.end, product_types=a.product_types.split(","))
            if a.cmd == "vpp-count-products":
                print(json.dumps(count_products(slots)))
            elif a.cmd == "vpp-count-products-per-slot":
                print(count_products_per_query_slot(slots).to_string(index=False))
            else:
                cfg = collection_config_from_products(a.collection_id, slots)
                print(json.dumps({"collection_id": cfg.collection_id,
                                  "item_assets": sorted(cfg.item_assets)}))
    finally:
        if owns_ray:  # never tear down a session we didn't start
            ray.shutdown()
    return 0
