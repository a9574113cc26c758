"""Footer-driven read-task sizing for wide-payload parquet tables.

Measured rule (BASELINE.md, wide-payload regime, 2026-08-18): for payloads
of >= ~50 KB/row the fused read->decode stage is scheduled ONE TASK PER
INPUT PART, so coarse parts starve the cpu allocation — 49 x 143 MB parts
over 32 cpus is 1.5 waves (walls swung 15-60 s run to run), while the same
table at ~36 MB parts schedules ~6 waves and is stable (14-21 s).
``target_max_block_size`` is a NON-FACTOR for that path: the fused stage
never puts the bytes column in the object store.

This module automates the rule: inspect parquet FOOTERS (cheap — metadata
only, and only a bounded sample of parts), estimate the per-row bytes of
the columns actually being read, and when the payload is wide AND the
part layout is coarser than ~``TARGET_TASK_BYTES``, return an
``override_num_blocks`` for ``read_parquet``.  Narrow tables and
already-fine part layouts return ``None`` — Ray's default layout is
untouched (hash-neutral for every existing pipeline; the images bench
table is ~6 KB/row).

MEASURED LIMIT (Ray 2.49, tools/wide_bench.py, probe-even window): the
override governs OUTPUT-BLOCK granularity only — ``ReadParquet`` stays at
one READ TASK per parquet file (override 179 over 49 coarse parts →
``ReadParquet->SplitBlocks(4)``, 49 tasks, 388 blocks; the default
size-based heuristic already chose SplitBlocks(5)/485 blocks).  So
downstream stages are wave-balanced either way (coarse-part walls match
the fine layout: 7.4-7.5 s vs 6.2 s min-of-3 at 32 cpus), and this guard
matters when Ray's sampled in-memory size estimate under-reads (it then
pins the block split to the footer-derived payload size).  The read-task
tail itself (one task = one part file) can only be fixed at WRITE time —
the engine's image-table writers (``datagen._default_rows_per_file``)
default to <= ~40 MB parts for exactly this reason.
"""

from __future__ import annotations

import math
import os
from typing import List, Optional

WIDE_ROW_BYTES = 50 * 1024          # >= this per selected row counts as wide
TARGET_TASK_BYTES = 40 * 1024 * 1024  # aim <= ~40 MB of payload per read task
FOOTER_SAMPLE = 16                  # footers inspected (bounded at 1e6 parts)


def wide_payload_num_blocks(paths: List[str],
                            columns: Optional[List[str]] = None,
                            cpus: Optional[int] = None) -> Optional[int]:
    """``override_num_blocks`` for ``read_parquet(paths, columns=...)``, or
    ``None`` to keep Ray's default task layout.

    Only the first ``FOOTER_SAMPLE`` part footers are opened (metadata
    reads, no data pages); per-row bytes counts ONLY the selected columns'
    compressed chunk sizes, so a metadata-only read of a wide table is
    correctly classified narrow.  ``cpus`` is unused by the current rule
    (task count is purely bytes-driven — >=4 waves falls out of the 40 MB
    target whenever the input is big enough for waves to matter) but kept
    in the signature so a wave-floor variant stays source-compatible.
    """
    import pyarrow.parquet as pq

    pq_paths = [p for p in paths
                if os.path.splitext(p)[1].lower() == ".parquet"]
    if not pq_paths:
        return None
    sample = pq_paths[:FOOTER_SAMPLE]
    rows = 0
    sel_bytes = 0
    try:
        for p in sample:
            md = pq.ParquetFile(p).metadata
            rows += md.num_rows
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    root = col.path_in_schema.split(".")[0]
                    if columns is None or root in columns:
                        sel_bytes += col.total_compressed_size
    except Exception:
        return None  # unreadable footer: leave the default layout alone
    if rows == 0 or sel_bytes <= 0:
        return None
    if sel_bytes / rows < WIDE_ROW_BYTES:
        return None  # narrow rows: per-part tasks are fine at any size
    # total selected bytes across ALL parts, extrapolated from the sampled
    # selected fraction (exact when every part was sampled)
    sample_file_bytes = sum(os.path.getsize(p) for p in sample)
    if len(sample) == len(pq_paths):
        total_file_bytes = sample_file_bytes
    else:
        total_file_bytes = sum(os.path.getsize(p) for p in pq_paths)
    total_sel = sel_bytes * (total_file_bytes / max(sample_file_bytes, 1))
    n = math.ceil(total_sel / TARGET_TASK_BYTES)
    if n <= len(pq_paths):
        return None  # parts are already <= target: default layout suffices
    return n
