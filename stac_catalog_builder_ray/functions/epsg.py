"""EPSG inference — the reference's product-metadata detection chain
(terracatalog.py:654-672), completed in round 3 (M13 was 'partial'):

1. ``conformsTo`` URL: last ``/``-segment parsed as an int when the URL
   mentions EPSG (e.g. ``http://www.opengis.net/def/crs/EPSG/0/3035`` ->
   3035); unparsable -> fall through (reference logs + continues)
2. tile id: first digit-run ``dd`` -> ``326dd`` (northern UTM zone — the
   HRVPP tiling convention)
3. default 4326
"""

from __future__ import annotations

import re
from typing import Iterable, List, Optional

import numpy as np

_DIGITS = re.compile(r"\d+")

EPSG_4326_LATLON = 4326


def infer_epsg(conforms_to: Optional[str], tile_id: Optional[str]) -> int:
    """One product's EPSG code per the reference chain
    (terracatalog.py:654-672)."""
    if conforms_to and "EPSG" in conforms_to:
        tail = conforms_to.split("/")[-1]
        try:
            return int(tail)
        except (TypeError, ValueError):
            pass  # reference: log + fall through
    if tile_id:
        m = _DIGITS.findall(tile_id)
        if m:
            return int("326" + m[0])
    return EPSG_4326_LATLON


def infer_epsg_batch(conforms_to: Iterable[Optional[str]],
                     tile_ids: Iterable[Optional[str]]) -> np.ndarray:
    """Vectorized column form for ``map_batches`` callers: two aligned
    columns -> int32 EPSG array."""
    out: List[int] = [infer_epsg(c, t) for c, t in zip(conforms_to, tile_ids)]
    return np.asarray(out, dtype=np.int32)
