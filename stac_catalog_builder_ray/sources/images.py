"""Image-table source (Lance-style table emulated as Parquet).

The deployment target reads a Lance table of (image_id, bytes, w, h, fmt,
caption, phash); this sandbox has no ``lance`` package, so the same table is
read from Parquet — Ray's ``read_parquet`` delivers identical zero-copy Arrow
batches (SURVEY.md §1.3).  ``read_images`` keeps a ``read_lance`` call site
behind a capability check for real deployments.

Reference analogs: ``FileCollector.collect`` glob + ``max_files`` cap
(collector.py:75-84, S1) -> ``list_image_files`` + ``limit``.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import List, Optional

import ray.data


def list_image_files(input_dir: str, pattern: str = "*.parquet", max_files: Optional[int] = None) -> List[str]:
    """Glob ``input_dir``, files only, optional cap — S1 semantics
    (collector.py:75-84: ``islice(glob, max_files)``)."""
    paths = sorted(p for p in _glob.glob(os.path.join(input_dir, pattern)) if os.path.isfile(p))
    return paths[:max_files] if max_files is not None else paths


def read_images(
    path: str,
    columns: Optional[List[str]] = None,
    max_rows: Optional[int] = None,
    auto_wide_split: bool = True,
) -> "ray.data.Dataset":
    """Read the image+caption table as a streaming Dataset.

    ``columns`` prunes at the read (never load the wide ``bytes`` column for
    metadata-only pipelines); ``max_rows`` maps the reference's ``max_files``
    dev cap (O3) to ``ds.limit``.  ``auto_wide_split`` applies the measured
    wide-payload part rule (sources/partsize.py): when the selected columns
    are >= ~50 KB/row and the part files are coarser than ~40 MB, the read
    pins its output-block split to the footer-derived payload size so
    downstream stages stay wave-balanced even if Ray's sampled size
    estimate under-reads (narrow tables: no-op; see partsize.py for the
    measured Ray-2.49 task-granularity limit).
    """
    try:  # real deployments: Lance dataset (zero-copy Arrow too)
        import lance  # noqa: F401

        ds = ray.data.read_lance(path, columns=columns)  # pragma: no cover
    except ImportError:
        kwargs = {}
        if auto_wide_split:
            from .partsize import wide_payload_num_blocks

            parts = (list_image_files(path) if os.path.isdir(path)
                     else [path])
            nb = wide_payload_num_blocks(parts, columns=columns)
            if nb is not None:
                kwargs["override_num_blocks"] = nb
        ds = ray.data.read_parquet(path, columns=columns, **kwargs)
    if max_rows is not None:
        ds = ds.limit(max_rows)
    return ds
