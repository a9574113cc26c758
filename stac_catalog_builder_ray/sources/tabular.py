"""Format-agnostic tabular source: one entry point for Parquet, JSONL and
CSV corpora (the reference only ever reads its own GeoTIFF/JSON trees —
collector.py:227; an engine ingesting third-party document/event dumps needs
the common interchange formats too).

Everything maps onto Ray Data's native readers, so the result is a normal
streaming ``Dataset`` (block-parallel reads, column pruning where the format
supports it):

- ``.parquet``       -> ``read_parquet`` (predicate/column pushdown)
- ``.jsonl``/``.json`` -> ``read_json`` (arrow JSON reader, newline-delimited)
- ``.csv``           -> ``read_csv`` (arrow CSV reader)

Column pruning is pushed into the read for parquet and applied as an
immediate ``select_columns`` for row-oriented formats (those must parse the
full row regardless — the prune still keeps the downstream pipeline and the
object store narrow).
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional

_READERS = {
    ".parquet": "read_parquet",
    ".jsonl": "read_json",
    ".json": "read_json",
    ".csv": "read_csv",
}


def _detect(paths: List[str]) -> str:
    exts = {os.path.splitext(p)[1].lower() for p in paths}
    unknown = exts - set(_READERS)
    if unknown:
        raise ValueError(f"unsupported tabular extension(s): {sorted(unknown)} "
                         f"(supported: {sorted(_READERS)})")
    if len(exts) != 1:
        raise ValueError(f"mixed tabular formats in one source: {sorted(exts)}")
    return exts.pop()


def read_table_auto(path: str, columns: Optional[List[str]] = None):
    """Path (file, directory, or glob) -> streaming Dataset, format detected
    from the extension.  Directories may hold many part files (the resumable
    sink layout); all parts must share one format."""
    import ray.data as rd

    if os.path.isdir(path):
        paths = sorted(
            p for p in glob.glob(os.path.join(path, "**", "*"), recursive=True)
            if os.path.isfile(p) and os.path.splitext(p)[1].lower() in _READERS
        )
        if not paths:
            raise ValueError(f"no tabular files under {path}")
    elif any(c in path for c in "*?["):
        paths = sorted(glob.glob(path))
        if not paths:
            raise ValueError(f"glob matched nothing: {path}")
    else:
        paths = [path]

    ext = _detect(paths)
    if ext == ".parquet":
        from .partsize import wide_payload_num_blocks

        nb = wide_payload_num_blocks(paths, columns=columns)
        if nb is not None:  # wide-payload rule: see sources/partsize.py
            return rd.read_parquet(paths, columns=columns,
                                   override_num_blocks=nb)
        return rd.read_parquet(paths, columns=columns)
    ds = getattr(rd, _READERS[ext])(paths)
    if columns:
        ds = ds.select_columns(columns)
    return ds
