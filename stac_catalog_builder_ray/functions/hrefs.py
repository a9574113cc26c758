"""Href projections: asset-URL templating + alternate-href generation.

Reference:
- ``CreateAssetUrlFromPath`` (mapper.py:18-47, M11): href =
  ``url_template.format(relative_to(data_root))``
- ``AlternateHrefGenerator`` (builder.py:54-165, M12): registered callbacks
  producing ``{"alternate": {key: {"href": ...}}}``; built-ins for local
  (``file://``) and S3 (bucket join with slash trimming, builder.py:128-146)

Engine shape: vectorized string projections over Arrow columns + the same
callback-registry surface (register by name, apply all registered)."""

from __future__ import annotations

import posixpath
from typing import Callable, Dict, List

import pyarrow as pa
import pyarrow.compute as pc


def asset_url_from_path(paths: pa.Array, data_root: str, url_template: str) -> pa.Array:
    """Vectorized M11: strip ``data_root`` prefix, format into template
    (template uses ``{path}``)."""
    if isinstance(paths, pa.ChunkedArray):
        paths = paths.combine_chunks()
    root = data_root.rstrip("/") + "/"
    rel = [p[len(root):] if p.startswith(root) else p for p in paths.to_pylist()]
    return pa.array([url_template.format(path=r) for r in rel], pa.string())


def s3_join(bucket: str, *parts: str) -> str:
    """S3 URL join with slash trimming (builder.py:128-146 semantics)."""
    bucket = bucket.strip("/")
    cleaned = [p.strip("/") for p in parts if p and p.strip("/")]
    return "s3://" + posixpath.join(bucket, *cleaned)


AlternateCallback = Callable[[str], str]

_ALTERNATE_REGISTRY: Dict[str, AlternateCallback] = {}


def register_alternate(key: str, fn: AlternateCallback) -> None:
    """Register a named alternate-href callback (builder.py:66-76 surface)."""
    _ALTERNATE_REGISTRY[key] = fn


def clear_alternates() -> None:
    _ALTERNATE_REGISTRY.clear()


def register_local_alternate() -> None:
    register_alternate("local", lambda href: "file://" + href if not href.startswith("file://") else href)


def register_s3_alternate(bucket: str) -> None:
    register_alternate("S3", lambda href: s3_join(bucket, href))


def alternate_hrefs(hrefs: pa.Array) -> List[Dict]:
    """Apply every registered callback: one ``{"alternate": {key: {"href":
    url}}}`` dict per row, JSON-ready (builder.py:92-109 output shape)."""
    if isinstance(hrefs, pa.ChunkedArray):
        hrefs = hrefs.combine_chunks()
    out = []
    for h in hrefs.to_pylist():
        out.append({"alternate": {k: {"href": fn(h)} for k, fn in _ALTERNATE_REGISTRY.items()}})
    return out
