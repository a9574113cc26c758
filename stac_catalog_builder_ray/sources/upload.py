"""Bulk-upsert API sink (engine twin of the reference's STAC-API uploader).

Reference: items are chunked into bulks (default 20), POSTed as
``bulk_items`` upserts with <=5 retries (upload.py:82-103,
endpoints.py:416-441, S9).  Engine shape: an actor-pool ``map_batches`` stage
whose ``batch_size`` IS the bulk size; per-bulk in-op retry with exponential
backoff on top of Ray's task retry.

No network exists in this sandbox, so the transport is pluggable: the default
``DirectoryTransport`` writes each bulk as an atomic JSON file (doubling as a
fake STAC API for tests); a real ``HttpTransport`` would swap in behind the
same ``send(bulk) -> None`` interface.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, List, Optional

import pandas as pd

DEFAULT_BULK_SIZE = 20
MAX_RETRIES = 5  # upload.py retry cap


class TransportError(RuntimeError):
    pass


class DirectoryTransport:
    """Filesystem stand-in for the STAC API: one JSON file per bulk, atomic.
    ``fail_first`` injects transient failures for retry tests."""

    def __init__(self, out_dir: str, fail_first: int = 0):
        self.out_dir = out_dir
        self.fail_first = fail_first
        self._calls = 0
        os.makedirs(out_dir, exist_ok=True)

    def send(self, collection_id: str, bulk: List[dict]) -> None:
        self._calls += 1
        if self._calls <= self.fail_first:
            raise TransportError(f"injected transient failure #{self._calls}")
        first_id = bulk[0]["item_id"]
        path = os.path.join(self.out_dir, f"bulk-{first_id}.json")
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"collection": collection_id, "items": bulk}, f)
        os.replace(tmp, path)


class BulkUpsert:
    """map_batches actor stage: item rows -> upserted bulks + receipt rows.

    Pass ``batch_size=bulk_size`` at the call site — Ray's batching replaces
    the reference's manual chunking (upload.py:82-87, O7)."""

    def __init__(
        self,
        collection_id: str,
        transport_factory: Callable[[], object],
        max_retries: int = MAX_RETRIES,
        backoff_s: float = 0.05,
    ):
        self.collection_id = collection_id
        self.transport = transport_factory()  # once per actor (connection state)
        self.max_retries = max_retries
        self.backoff_s = backoff_s

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        bulk = [
            {"item_id": r["item_id"], "assets": r.get("assets_json", "{}")}
            for _, r in batch.iterrows()
        ]
        attempts = 0
        while True:
            attempts += 1
            try:
                self.transport.send(self.collection_id, bulk)
                break
            except TransportError:
                if attempts > self.max_retries:
                    raise
                time.sleep(self.backoff_s * (2 ** (attempts - 1)))
        return pd.DataFrame(
            {
                "item_id": [b["item_id"] for b in bulk],
                "attempts": attempts,
            }
        )


def upload_items(
    items,
    collection_id: str,
    out_dir: str,
    bulk_size: int = DEFAULT_BULK_SIZE,
    concurrency=2,
    fail_first: int = 0,
):
    """items Dataset -> upload receipts Dataset (consumes the stream)."""
    factory = lambda: DirectoryTransport(out_dir, fail_first=fail_first)  # noqa: E731
    return items.map_batches(
        BulkUpsert,
        fn_constructor_kwargs={"collection_id": collection_id, "transport_factory": factory},
        batch_format="pandas",
        batch_size=bulk_size,
        concurrency=concurrency,
    )
