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
) -> "ray.data.Dataset":
    """Read the image+caption table as a streaming Dataset.

    ``columns`` prunes at the read (never load the wide ``bytes`` column for
    metadata-only pipelines); ``max_rows`` maps the reference's ``max_files``
    dev cap (O3) to ``ds.limit``.
    """
    try:  # real deployments: Lance dataset (zero-copy Arrow too)
        import lance  # noqa: F401

        ds = ray.data.read_lance(path, columns=columns)  # pragma: no cover
    except ImportError:
        ds = ray.data.read_parquet(path, columns=columns)
    if max_rows is not None:
        ds = ds.limit(max_rows)
    return ds
