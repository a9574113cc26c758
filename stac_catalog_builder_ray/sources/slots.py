"""Paged-API source: query slots -> parallel fetch -> dedup, with
slot-granular resume (engine twin of the HRVPP OpenSearch collector, S3).

Reference semantics (terracatalog.py):
- slot generation: cartesian(time slots x product types) from the
  collection's temporal extent (terracatalog.py:432-453)
- threadpool fetch per slot, <=10k outstanding (terracatalog.py:493-524)
- dedup against a driver-global ``product_ids`` set (terracatalog.py:517-519)
- per-slice parquet spill + skip-if-exists resume (terracatalog.py:352-370)

Engine shape: ``from_items(slots).flat_map(fetch)`` — each slot is a read
task scheduled by Ray (replaces the manual pool + outstanding-futures cap);
dedup is a hash-partitioned keep-first (no global set); resume skips slots
whose output partition is already checkpointed, BEFORE any fetch happens.

No network exists here, so the fetcher is pluggable; the default
``synthetic_product_fetcher`` deterministically derives products per slot
(same product can appear in adjacent slots — exercising the dedup path,
like overlapping OpenSearch time windows do).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterator, List, Optional

import pandas as pd

from ..state.checkpoint import CheckpointStore


def generate_query_slots(
    start: str, end: str, freq: str = "MS", product_types: Optional[List[str]] = None
) -> List[Dict]:
    """Cartesian(time windows x product types) — terracatalog.py:432-453."""
    product_types = product_types or ["default"]
    bounds = pd.date_range(start=start, end=end, freq=freq)
    slots = []
    for i in range(len(bounds) - 1):
        for pt in product_types:
            slots.append(
                {
                    "slot_id": f"{pt}_{bounds[i]:%Y%m%d}",
                    "t0": str(bounds[i]),
                    "t1": str(bounds[i + 1]),
                    "product_type": pt,
                }
            )
    return slots


def synthetic_product_fetcher(slot: Dict) -> Iterator[Dict]:
    """Deterministic mock of one paged-API query: ~days/3 products per slot;
    products on the window edge ALSO appear in the neighbouring slot
    (overlap -> dedup required, mirroring real OpenSearch windows)."""
    t0 = pd.Timestamp(slot["t0"])
    t1 = pd.Timestamp(slot["t1"])
    days = (t1 - t0).days
    def product(ts: pd.Timestamp) -> Dict:
        k = int(ts.toordinal())
        # every third product carries a conformsTo CRS URL, the rest only a
        # tile id, some neither — covering the reference's full EPSG
        # inference chain (terracatalog.py:654-672)
        conforms = f"http://www.opengis.net/def/crs/EPSG/0/{32601 + k % 60}" if k % 3 == 0 else None
        tile_id = f"{k % 60 + 1:02d}ABC" if k % 3 != 2 else None
        return {
            "product_id": f"{slot['product_type']}_{ts:%Y%m%d}",
            "product_type": slot["product_type"],
            "datetime": str(ts),
            "slot_id": slot["slot_id"],
            "conforms_to": conforms,
            "tile_id": tile_id,
        }

    for k in range(0, days, 3):
        yield product(t0 + pd.Timedelta(days=k))
    if days >= 1:  # boundary product duplicated into the next window
        yield product(t1)


def read_slots(
    slots: List[Dict],
    fetcher: Callable[[Dict], Iterator[Dict]] = synthetic_product_fetcher,
    checkpoint_root: Optional[str] = None,
):
    """slots -> deduped product Dataset.

    - resume: slots already finished in the checkpoint store are dropped
      DRIVER-SIDE before any task runs (skip-if-exists, terracatalog
      semantics at slot granularity)
    - fetch: ``flat_map`` over the slot Dataset — one Ray task per slot
      block, streaming, retryable
    - dedup: keep first by (product_id) with deterministic (datetime,
      slot_id) order — hash-partitioned, no driver state
    """
    import ray.data as rd

    if checkpoint_root:
        done = CheckpointStore(checkpoint_root).finished()
        slots = [s for s in slots if s["slot_id"] not in done]
    if not slots:
        return rd.from_items([]).limit(0)

    ds = rd.from_items(slots)
    products = ds.flat_map(fetcher)

    def with_epsg(t):
        # proj_epsg per product during collection, like the reference's
        # get_products_as_dataframe (terracatalog.py:654-672 chain)
        import pyarrow as _pa

        from ..functions.epsg import infer_epsg_batch

        cols = set(t.column_names)
        conforms = t["conforms_to"].to_pylist() if "conforms_to" in cols else [None] * t.num_rows
        tiles = t["tile_id"].to_pylist() if "tile_id" in cols else [None] * t.num_rows
        return t.append_column("proj_epsg", _pa.array(infer_epsg_batch(conforms, tiles)))

    products = products.map_batches(with_epsg, batch_format="pyarrow")

    def first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["product_id", "datetime", "slot_id"], kind="stable")
        return g.drop_duplicates(subset=["product_id"], keep="first")

    # bucket by product_id hash -> vectorized per-bucket dedup
    import numpy as np
    import pyarrow as pa
    import zlib as _z

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = t["product_id"].to_pylist()
        b = np.fromiter((_z.crc32(s.encode()) % 16 for s in ids), dtype=np.int64, count=len(ids))
        return t.append_column("bucket", pa.array(b))

    return (
        products.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(first, batch_format="pandas")
        .drop_columns(["bucket"])
    )


def checkpoint_slots(products_df: pd.DataFrame, checkpoint_root: str) -> int:
    """Mark every slot present in the fetched products as finished (with a
    lineage record of its product count)."""
    store = CheckpointStore(checkpoint_root)
    n = 0
    for slot_id, g in products_df.groupby("slot_id"):
        if not store.is_finished(str(slot_id)):
            store.mark_finished(str(slot_id), {"partition": str(slot_id), "rows": int(len(g))})
            n += 1
    return n


# --- introspection wrappers (commandapi_vpp.py:131-156) ---------------------


def count_products(
    slots: List[Dict],
    fetcher: Callable[[Dict], Iterator[Dict]] = synthetic_product_fetcher,
) -> Dict[str, int]:
    """Distinct-product count per product type — the engine twin of
    ``vpp_count_products`` (commandapi_vpp.py:131-137, catalogue
    ``get_product_count`` per collection).  Runs as a Dataset aggregate
    (fetch -> dedup -> groupby count), never a driver-side list."""
    from ray.data.aggregate import Count

    ds = read_slots(slots, fetcher=fetcher)
    if ds.count() == 0:
        return {}
    out = ds.groupby("product_type").aggregate(Count(alias_name="n")).to_pandas()
    return dict(zip(out["product_type"], out["n"].astype(int)))


def count_products_per_query_slot(
    slots: List[Dict],
    fetcher: Callable[[Dict], Iterator[Dict]] = synthetic_product_fetcher,
) -> pd.DataFrame:
    """Per-slot RAW product counts (before dedup) — the engine twin of
    ``vpp_count_products_per_query_slot`` / ``list_num_prods_per_query_slot``
    (commandapi_vpp.py:139-143): shows window overlap and per-slot load,
    which is exactly what you tune slot frequency with."""
    import ray.data as rd
    from ray.data.aggregate import Count

    if not slots:
        return pd.DataFrame({"slot_id": [], "n_products": []})
    out = (
        rd.from_items(slots)
        .flat_map(fetcher)
        .groupby("slot_id")
        .aggregate(Count(alias_name="n_products"))
        .to_pandas()
    )
    return out.sort_values("slot_id").reset_index(drop=True)


def collection_config_from_products(
    collection_id: str,
    slots: List[Dict],
    fetcher: Callable[[Dict], Iterator[Dict]] = synthetic_product_fetcher,
):
    """Derive a ``CollectionConfig`` from the fetched product stream — the
    engine twin of ``vpp_get_collection_config`` (commandapi_vpp.py:146-154,
    ``CollectionConfigBuilder.get_collection_config``): one item-asset entry
    per distinct product type observed."""
    from ..config import CollectionConfig

    types = sorted(count_products(slots, fetcher=fetcher))
    return CollectionConfig.from_dict(
        {
            "collection_id": collection_id,
            "title": collection_id,
            "description": f"Derived from {len(types)} product type(s)",
            "item_assets": {
                t: {"title": t, "description": f"{t} products", "media_type": "application/json"}
                for t in types
            },
        }
    )
