"""Checkpoint store: partitioned, atomic, resumable output with per-partition
lineage + metrics (the north rule's "resumable from checkpoint with
per-partition lineage + metrics").

Reference analog: per-slice parquet spill + skip-if-exists resume
(terracatalog.py:352-370,497-505, S8).  Engine contract (SURVEY.md §4):

- output is partitioned by a key column (cell id, year, shard id ...)
- each partition directory is published ATOMICALLY (write tmp, rename)
- a lineage record per partition (`_lineage/{pid}.json`: row counts, bytes,
  wall time, engine version) doubles as the "done" marker
- resume = list finished partitions driver-side (cheap), broadcast the set,
  and FILTER THE INPUT before the shuffle — finished partitions are neither
  recomputed nor rewritten (exactly-once per partition)
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Optional, Set

import pandas as pd

LINEAGE_DIR = "_lineage"


class CheckpointStore:
    """Filesystem-backed manifest of finished partitions + lineage records."""

    def __init__(self, root: str):
        self.root = root
        self.lineage_dir = os.path.join(root, LINEAGE_DIR)
        os.makedirs(self.lineage_dir, exist_ok=True)

    def _pid_path(self, pid: str) -> str:
        return os.path.join(self.lineage_dir, f"{pid}.json")

    def finished(self) -> Set[str]:
        return {
            f[: -len(".json")]
            for f in os.listdir(self.lineage_dir)
            if f.endswith(".json")
        }

    def is_finished(self, pid: str) -> bool:
        return os.path.exists(self._pid_path(pid))

    def mark_finished(self, pid: str, lineage: Dict) -> None:
        path = self._pid_path(pid)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(lineage, f)
        os.replace(tmp, path)  # atomic publish — THE done marker

    def lineage(self, pid: str) -> Dict:
        with open(self._pid_path(pid)) as f:
            return json.load(f)

    def metrics_frame(self) -> pd.DataFrame:
        """All lineage records as one small DataFrame (per-partition metrics)."""
        rows = [self.lineage(pid) for pid in sorted(self.finished())]
        return pd.DataFrame(rows)


def partition_writer(store_root: str, partition_col: str,
                     drop_cols: Optional[list] = None):
    """map_groups callable: writes one partition's rows to
    ``{root}/part={pid}/data.parquet`` atomically, records lineage, and skips
    partitions already finished (idempotent under task retry)."""
    store = CheckpointStore(store_root)

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        pid = str(g[partition_col].iloc[0])
        if drop_cols:
            g = g.drop(columns=drop_cols)
        if store.is_finished(pid):
            return pd.DataFrame({"partition": [pid], "rows": [len(g)], "skipped": [True]})
        t0 = time.monotonic()
        part_dir = os.path.join(store_root, f"part={pid}")
        tmp_dir = f"{part_dir}.tmp.{os.getpid()}"
        os.makedirs(tmp_dir, exist_ok=True)
        g.to_parquet(os.path.join(tmp_dir, "data.parquet"), index=False)
        size = sum(
            os.path.getsize(os.path.join(tmp_dir, f)) for f in os.listdir(tmp_dir)
        )
        if os.path.exists(part_dir):  # a retry raced us; keep the first
            import shutil

            shutil.rmtree(tmp_dir)
        else:
            os.replace(tmp_dir, part_dir)
        store.mark_finished(
            pid,
            {
                "partition": pid,
                "rows": int(len(g)),
                "bytes": int(size),
                "wall_sec": round(time.monotonic() - t0, 4),
                "ts": time.time(),
            },
        )
        return pd.DataFrame({"partition": [pid], "rows": [len(g)], "skipped": [False]})

    return write_group


def checkpointed_write(
    ds,
    store_root: str,
    partition_col: str,
    filter_finished: bool = True,
    salt_hot_threshold: Optional[int] = None,
    salt_id_col: Optional[str] = None,
    salt_fanout_cap: int = 32,
):
    """Write ``ds`` partitioned by ``partition_col`` with checkpoint/resume.

    When resuming, finished partitions are filtered out BEFORE the shuffle
    (broadcast set membership inside map_batches), so their upstream compute
    is skipped too.  Returns the per-partition summary DataFrame.

    HOT-KEY SALTING (SURVEY.md §4: spatially clustered data makes one cell
    the straggler/giant-file): pass ``salt_hot_threshold`` (rows) and
    ``salt_id_col`` (a stable unique column) and keys exceeding the
    threshold split into ``{key}#{salt}`` sub-partitions, ``salt =
    siphash(row[id_col]) % ceil(count/threshold)`` (capped at
    ``salt_fanout_cap``) — per-partition rows stay bounded, the shuffle's
    biggest reducer shrinks by the fanout, and because the salt is a pure
    content hash a row lands in the same sub-partition on every run, so
    skip-if-finished resume stays exactly-once.  The detection pass is one
    cheap count aggregate over ``ds`` (consumed twice — pass a materialized
    Dataset, as the flagship's item table already is).  EVERY partition id
    gains a ``#{salt}`` suffix when salting is on (cold keys ``#0``) so a
    store is never a mix of salted and raw ids."""
    store = CheckpointStore(store_root)
    drop_cols = None
    if salt_hot_threshold is not None:
        if salt_id_col is None:
            raise ValueError("salting a resumable write needs salt_id_col "
                             "(content-hash salts; see add_salted_key_by_id)")
        from .skew import add_salted_key_by_id, detect_hot_keys

        hot = detect_hot_keys(ds, partition_col, salt_hot_threshold,
                              fanout_cap=salt_fanout_cap)
        ds = add_salted_key_by_id(ds, partition_col, salt_id_col, hot,
                                  salted_col="_salted_pid")
        partition_col, drop_cols = "_salted_pid", ["_salted_pid"]
    done = store.finished()
    if filter_finished and done:
        import pyarrow as pa
        import pyarrow.compute as pc

        done_arr = pa.array(sorted(done))

        def drop_done(batch: pa.Table) -> pa.Table:
            key = pc.cast(batch[partition_col], pa.string())
            return batch.filter(pc.invert(pc.is_in(key, value_set=done_arr)))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")
    summary = (
        ds.groupby(partition_col)
        .map_groups(partition_writer(store_root, partition_col, drop_cols),
                    batch_format="pandas")
        .to_pandas()
    )
    return summary


def read_checkpointed(store_root: str, columns: Optional[list] = None):
    """Read back a checkpointed table (all finished partitions) as a Dataset."""
    import glob

    import ray.data

    files = sorted(glob.glob(os.path.join(store_root, "part=*", "*.parquet")))
    return ray.data.read_parquet(files, columns=columns)


def compact_parts(in_dir: str, out_dir: str, target_rows: int = 100_000,
                  columns: Optional[list] = None):
    """Small-files COMPACTION: coalesce a directory of (many, small) parquet
    parts into ~``target_rows``-row output parts — the maintenance operator
    every long-running partitioned sink needs (metadata pressure and
    per-file open cost dominate reads once parts shrink below ~10 MB).

    Streaming + resumable: rows stream through a repartition sized from the
    input's TOTAL rowcount (read from parquet footers — no data pass);
    output parts publish atomically with the same lineage store as
    ``checkpointed_write`` so a killed compaction resumes, and the input
    dir is left untouched (caller swaps dirs on success — compaction must
    never be able to lose data)."""
    import glob as _glob
    import math

    import pyarrow.parquet as _pq
    import ray.data as rd

    files = sorted(_glob.glob(os.path.join(in_dir, "*.parquet")) +
                   _glob.glob(os.path.join(in_dir, "part=*", "*.parquet")))
    if not files:
        raise ValueError(f"no parquet parts under {in_dir}")
    total = sum(_pq.ParquetFile(f).metadata.num_rows for f in files)
    n_out = max(1, math.ceil(total / target_rows))

    ds = rd.read_parquet(files, columns=columns).repartition(n_out)

    store = CheckpointStore(out_dir)

    def write_block(t):
        import hashlib

        import pyarrow as pa

        # block-content-addressed part id -> idempotent under task retry
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, t.schema) as w:
            w.write_table(t.slice(0, 5))
        pid = hashlib.sha256(sink.getvalue().to_pybytes()
                             + str(t.num_rows).encode()).hexdigest()[:16]
        if not store.is_finished(pid):
            path = os.path.join(out_dir, f"part-{pid}.parquet")
            tmp = path + f".tmp.{os.getpid()}"
            import pyarrow.parquet as pq2

            pq2.write_table(t, tmp)
            os.replace(tmp, path)
            store.mark_finished(pid, {"partition": pid, "rows": int(t.num_rows)})
        return pa.table({"part": pa.array([pid]), "rows": pa.array([t.num_rows], pa.int64())})

    os.makedirs(out_dir, exist_ok=True)
    summary = ds.map_batches(write_block, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    return summary


def write_sorted_partitioned(ds, store_root: str, key: str,
                             num_partitions: int = 16,
                             samples_per_block: int = 32):
    """GLOBAL-ORDER range-partitioned write — the sorted-table sink: rows
    are range-partitioned on ``key`` by sampled split points, each range is
    sorted and written as one atomic part, and the manifest records per-part
    (rows, key_min, key_max).  Concatenating parts in pid order yields a
    globally sorted table without any single task ever holding more than
    one range (vs ``ds.sort().write_parquet`` whose final ordering guarantee
    dies with the dataset object).

    Resume contract: the split points are persisted (``splits.json``,
    atomic) on the FIRST run and REUSED on resume — block boundaries (and
    therefore fresh samples) can differ between runs, so re-deriving splits
    would reshuffle rows across parts and break skip-if-finished.  A
    finished part is skipped before the shuffle (checkpointed_write
    discipline); an interrupted run re-does only missing ranges."""
    import json

    import numpy as np
    import pyarrow as pa

    store = CheckpointStore(store_root)
    os.makedirs(store_root, exist_ok=True)
    splits_path = os.path.join(store_root, "splits.json")
    if os.path.exists(splits_path):
        with open(splits_path) as f:
            splits = np.array(json.load(f)["splits"])
    else:
        def sample(t: pa.Table) -> pa.Table:
            v = np.sort(t[key].to_numpy(zero_copy_only=False))
            idx = np.linspace(0, len(v) - 1, min(samples_per_block, len(v))).astype(int)
            return pa.table({key: pa.array(v[idx])})

        sampled = np.sort(ds.map_batches(sample, batch_format="pyarrow")
                          .to_pandas()[key].to_numpy())
        qs = np.linspace(0, 1, num_partitions + 1)[1:-1]
        splits = np.quantile(sampled, qs, method="lower")
        tmp = f"{splits_path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"key": key, "splits": [x.item() for x in splits]}, f)
        os.replace(tmp, splits_path)

    width = len(str(num_partitions))

    def assign(t: pa.Table) -> pa.Table:
        pid = np.searchsorted(splits, t[key].to_numpy(zero_copy_only=False),
                              side="right").astype(np.int64)
        pids = np.char.zfill(pid.astype(str), width)
        return t.append_column("_range", pa.array(pids))

    def write_range(g: pd.DataFrame) -> pd.DataFrame:
        pid = str(g["_range"].iloc[0])
        if store.is_finished(pid):
            return pd.DataFrame({"partition": [pid], "rows": [len(g)], "skipped": [True]})
        t0 = time.monotonic()
        g = g.sort_values(key, kind="stable").drop(columns=["_range"])
        part_dir = os.path.join(store_root, f"part={pid}")
        tmp_dir = f"{part_dir}.tmp.{os.getpid()}"
        os.makedirs(tmp_dir, exist_ok=True)
        g.to_parquet(os.path.join(tmp_dir, "data.parquet"), index=False)
        if os.path.exists(part_dir):
            import shutil

            shutil.rmtree(tmp_dir)
        else:
            os.replace(tmp_dir, part_dir)
        store.mark_finished(pid, {
            "partition": pid, "rows": int(len(g)),
            "key_min": g[key].iloc[0].item() if len(g) else None,
            "key_max": g[key].iloc[-1].item() if len(g) else None,
            "wall_sec": round(time.monotonic() - t0, 4), "ts": time.time(),
        })
        return pd.DataFrame({"partition": [pid], "rows": [len(g)], "skipped": [False]})

    done = store.finished()
    staged = ds.map_batches(assign, batch_format="pyarrow")
    if done:
        import pyarrow.compute as pc

        done_arr = pa.array(sorted(done))

        def drop_done(t: pa.Table) -> pa.Table:
            return t.filter(pc.invert(pc.is_in(t["_range"], value_set=done_arr)))

        staged = staged.map_batches(drop_done, batch_format="pyarrow")
    return (staged.groupby("_range")
            .map_groups(write_range, batch_format="pandas").to_pandas())


def pack_image_shards(ds, store_root: str, budget_bytes: int = 1 << 20,
                      id_col: str = "image_id", payload_col: str = "bytes",
                      ranges: int = 16):
    """WEBDATASET-STYLE SHARD PACKING sink: images in deterministic
    ``id_col`` order fill fixed byte-budget shards (an image belongs to the
    shard where its FIRST byte lands — the seq_pack rule applied to
    payload bytes), each shard publishing atomically with lineage so an
    interrupted run rewrites only missing shards.

    Distributed shape — a global ordered byte-cumsum WITHOUT a global
    sort: ids range-partition by persisted sampled split points
    (reused on resume, like write_sorted_partitioned), pass 1 aggregates
    per-range byte totals (tiny), the driver prefix-sums the offsets,
    pass 2 computes each row's global bytes-before locally and the shard
    groupby moves every payload ONCE into its writer.  Payload bytes
    cross the shuffle exactly once — unavoidable, the write must
    co-locate a shard's members."""
    import json

    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Sum

    store = CheckpointStore(store_root)
    os.makedirs(store_root, exist_ok=True)
    splits_path = os.path.join(store_root, "splits.json")
    if os.path.exists(splits_path):
        with open(splits_path) as f:
            splits = json.load(f)["splits"]
    else:
        def sample(t: pa.Table) -> pa.Table:
            v = sorted(t[id_col].to_pylist())
            idx = np.linspace(0, len(v) - 1, min(32, len(v))).astype(int)
            return pa.table({id_col: pa.array([v[i] for i in idx], pa.string())})

        sampled = sorted(ds.map_batches(sample, batch_format="pyarrow")
                         .to_pandas()[id_col])
        qs = np.linspace(0, len(sampled) - 1, ranges + 1).astype(int)[1:-1]
        splits = sorted({sampled[i] for i in qs})
        tmp = f"{splits_path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"key": id_col, "splits": splits}, f)
        os.replace(tmp, splits_path)

    sp = list(splits)

    def assign_range(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        r = np.searchsorted(np.array(sp, dtype=object), np.array(ids, dtype=object),
                            side="right").astype(np.int64)
        sizes = pa.compute.binary_length(t[payload_col]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return t.append_column("_range", pa.array(r)).append_column(
            "_size", pa.array(sizes))

    staged = ds.map_batches(assign_range, batch_format="pyarrow").materialize()
    totals = (staged.select_columns(["_range", "_size"])
              .groupby("_range").aggregate(Sum("_size", alias_name="total"))
              .to_pandas().sort_values("_range"))
    offsets = {}
    acc = 0
    for _, row in totals.iterrows():
        offsets[int(row["_range"])] = acc
        acc += int(row["total"])

    def assign_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable")
        before = offsets[int(g["_range"].iloc[0])] + (
            g["_size"].cumsum().shift(1, fill_value=0).to_numpy())
        g = g.drop(columns=["_range", "_size"]).copy()
        g["_shard"] = (before // budget_bytes).astype(np.int64)
        return g

    sharded = staged.groupby("_range").map_groups(assign_shard,
                                                  batch_format="pandas")

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        sid = f"{int(g['_shard'].iloc[0]):05d}"
        g = g.sort_values(id_col, kind="stable").drop(columns=["_shard"])
        if store.is_finished(sid):
            return pd.DataFrame({"shard": [sid], "rows": [len(g)],
                                 "skipped": [True]})
        shard_dir = os.path.join(store_root, f"shard={sid}")
        tmp_dir = f"{shard_dir}.tmp.{os.getpid()}"
        os.makedirs(tmp_dir, exist_ok=True)
        g.to_parquet(os.path.join(tmp_dir, "data.parquet"), index=False)
        if os.path.exists(shard_dir):
            import shutil

            shutil.rmtree(tmp_dir)
        else:
            os.replace(tmp_dir, shard_dir)
        store.mark_finished(sid, {
            "shard": sid, "rows": int(len(g)),
            "bytes": int(g[payload_col].map(len).sum()), "ts": time.time()})
        return pd.DataFrame({"shard": [sid], "rows": [len(g)],
                             "skipped": [False]})

    return (sharded.groupby("_shard")
            .map_groups(write_shard, batch_format="pandas").to_pandas())
