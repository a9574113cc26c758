"""Skew handling: hot-key detection + salting (SURVEY.md §4).

The reference has no skew handling (its group-by is a driver dict); at
engine scale a ``groupby(cell)`` over spatially clustered data (the 30%
hot tile in the synthetic sets, or a city in real data) makes one reducer
the straggler.  Pattern:

1. cheap count pass — per-batch partial counts, then a tiny groupby — finds
   keys above ``threshold``
2. ``add_salted_key``: hot keys get ``{key}#{salt}`` with ``salt =
   row_hash % fanout``; cold keys keep ``{key}#0``
3. group on the salted key; a second, tiny aggregate over per-salt partials
   merges the hot key's sub-results (partial + final combine, A-series)
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Sum


def detect_hot_keys(ds, key_col: str, threshold: int, fanout_cap: int = 32) -> Dict[str, int]:
    """-> {hot key -> salt fanout}.  Pre-aggregates inside map_batches (one
    partial row per key per batch) so the groupby shuffles only partials."""

    def partial_counts(batch: pa.Table) -> pa.Table:
        key = pc.cast(batch[key_col], pa.string())
        vc = key.value_counts()
        return pa.table({key_col: vc.field("values"), "cnt": vc.field("counts")})

    totals = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    hot = totals[totals["cnt"] > threshold]
    return {
        str(r[key_col]): int(min(fanout_cap, int(np.ceil(r["cnt"] / threshold))))
        for _, r in hot.iterrows()
    }


def add_salted_key(ds, key_col: str, hot_fanout: Dict[str, int], salted_col: str = "salted_key"):
    """Adds ``{key}#{salt}``; the fanout dict is broadcast via ``ray.put``
    once, not serialized per batch."""
    ref = ray.put(hot_fanout)

    class Salt:
        def __init__(self):
            self.fanout = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            # "None" fill keeps the old f-string rendering of null keys
            key_arr = pc.fill_null(pc.cast(batch[key_col], pa.string()), "None")
            n = len(key_arr)
            # cheap deterministic row hash: stable across runs, spreads rows
            h = np.arange(n, dtype=np.int64) * 2654435761 % (1 << 31)
            # vectorized fanout lookup: the hot-key dict is small, the batch
            # is not — map + fillna, never a per-row .get loop
            f = (pd.Series(key_arr.to_pandas(), dtype=object)
                 .map(self.fanout).fillna(1).to_numpy(dtype=np.int64))
            salts = np.where(f > 1, h % np.maximum(f, 1), 0)
            salted = pc.binary_join_element_wise(
                key_arr, pc.cast(pa.array(salts), pa.string()), "#")
            return batch.append_column(salted_col, salted)

    return ds.map_batches(Salt, batch_format="pyarrow", concurrency=(1, 4))


def add_salted_key_by_id(ds, key_col: str, id_col: str,
                         hot_fanout: Dict[str, int],
                         salted_col: str = "salted_key"):
    """Content-deterministic salting for RESUMABLE sinks: ``salt =
    hash(row[id_col]) % fanout`` with pandas' fixed-key siphash, so a row
    lands in the SAME ``{key}#{salt}`` partition on every run regardless of
    batch boundaries — required for skip-if-finished resume (positional
    salts like :func:`add_salted_key`'s are fine for aggregates, where any
    split merges correctly, but would duplicate/lose rows across a killed
    partitioned write).  Cold keys get ``{key}#0``."""
    ref = ray.put(hot_fanout)

    def salt(batch: pa.Table) -> pa.Table:
        fanout = ray.get(ref)
        key_arr = pc.fill_null(pc.cast(batch[key_col], pa.string()), "None")
        ids = np.asarray(pc.cast(batch[id_col], pa.string()).to_pylist(),
                         dtype=object)
        h = pd.util.hash_array(ids)  # fixed-key siphash: stable across runs
        f = (pd.Series(key_arr.to_pandas(), dtype=object)
             .map(fanout).fillna(1).to_numpy(dtype=np.int64))
        salts = np.where(f > 1, (h % np.maximum(f, 1).astype(np.uint64)).astype(np.int64), 0)
        salted = pc.binary_join_element_wise(
            key_arr, pc.cast(pa.array(salts), pa.string()), "#")
        return batch.append_column(salted_col, salted)

    return ds.map_batches(salt, batch_format="pyarrow")
