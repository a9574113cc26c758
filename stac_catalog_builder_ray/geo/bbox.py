"""Bounding-box record + conversions.

Same operator surface as the reference's ``stacbuilder/boundingbox.py:11-171``
(list <-> dict <-> polygon <-> WKT <-> GeoJSON), without shapely: polygons are
represented as closed coordinate rings (list of (x, y) tuples) and WKT is
emitted directly.  Ring orientation matches ``shapely.geometry.box``:
counter-clockwise starting at (east, south) — verified against the expected
WKT in the reference's ``tests/test_metadata.py:280-282``.
"""

from __future__ import annotations

import dataclasses as dc
from typing import Dict, List, Optional, Sequence, Tuple

Ring = List[Tuple[float, float]]


def to_bbox_dict(west: float, south: float, east: float, north: float) -> Dict[str, float]:
    """W,S,E,N floats -> dict (no CRS). Mirrors boundingbox.py:33-44."""
    return {"west": west, "south": south, "east": east, "north": north}


def bbox_list_to_dict(bbox: Sequence[float]) -> Dict[str, float]:
    """[w,s,e,n,...] -> dict, ignoring any Z. Mirrors boundingbox.py:11-20."""
    west, south, east, north = bbox[:4]
    return to_bbox_dict(west, south, east, north)


def bbox_dict_to_list(bbox_dict: Dict[str, float]) -> List[float]:
    """dict -> [w,s,e,n]. Mirrors boundingbox.py:23-30."""
    b = bbox_dict
    return [b["west"], b["south"], b["east"], b["north"]]


def box_ring(west: float, south: float, east: float, north: float) -> Ring:
    """Closed CCW rectangle ring, shapely-``box`` vertex order.

    shapely emits ``POLYGON ((maxx miny, maxx maxy, minx maxy, minx miny,
    maxx miny))``; we reproduce that exactly for WKT parity.
    """
    return [(east, south), (east, north), (west, north), (west, south), (east, south)]


def ring_to_wkt(ring: Ring) -> str:
    coords = ", ".join(f"{x:g} {y:g}" for x, y in ring)
    return f"POLYGON (({coords}))"


def ring_bounds(ring: Ring) -> Tuple[float, float, float, float]:
    xs = [p[0] for p in ring]
    ys = [p[1] for p in ring]
    return (min(xs), min(ys), max(xs), max(ys))


@dc.dataclass
class BoundingBox:
    """Bounding box in an EPSG CRS; field names follow the reference
    (``boundingbox.py:47-171``): west/south/east/north + epsg, with
    min_x/max_x/min_y/max_y aliases.
    """

    west: float
    south: float
    east: float
    north: float
    epsg: Optional[int]

    @staticmethod
    def create_empty() -> "BoundingBox":
        return BoundingBox(0.0, 0.0, 0.0, 0.0, epsg=None)

    # --- aliases -----------------------------------------------------------
    @property
    def min_x(self) -> float:
        return self.west

    @property
    def max_x(self) -> float:
        return self.east

    @property
    def min_y(self) -> float:
        return self.south

    @property
    def max_y(self) -> float:
        return self.north

    # --- conversions -------------------------------------------------------
    def to_dict(self) -> Dict[str, float]:
        return {
            "west": self.west,
            "south": self.south,
            "east": self.east,
            "north": self.north,
            "epsg": self.epsg,
        }

    @staticmethod
    def from_dict(values: Dict[str, float]) -> "BoundingBox":
        return BoundingBox(
            west=values["west"],
            south=values["south"],
            east=values["east"],
            north=values["north"],
            epsg=values.get("epsg"),
        )

    def to_list(self) -> List[float]:
        return [self.west, self.south, self.east, self.north]

    @staticmethod
    def from_list(bbox_list: Sequence[float], epsg: Optional[int]) -> "BoundingBox":
        west, south, east, north = bbox_list[:4]
        return BoundingBox(west=west, south=south, east=east, north=north, epsg=epsg)

    @staticmethod
    def from_any(value, default_epsg: Optional[int] = None) -> Optional["BoundingBox"]:
        """dict | list | tuple | ndarray -> BoundingBox (boundingbox.py:139-159)."""
        if value is None:
            return None
        if isinstance(value, dict):
            return BoundingBox.from_dict(value)
        if isinstance(value, (list, tuple)):
            if default_epsg is None:
                raise ValueError("default_epsg must be provided when constructing from list")
            return BoundingBox.from_list(list(value), epsg=default_epsg)
        try:  # numpy array without importing numpy here
            listed = value.tolist()
        except AttributeError:
            raise TypeError(f"Unsupported type for BoundingBox.from_any: {type(value)}")
        if default_epsg is None:
            raise ValueError("default_epsg must be provided when constructing from numpy array")
        return BoundingBox.from_list(listed, epsg=default_epsg)

    def as_ring(self) -> Ring:
        """Rectangular polygon ring (analog of boundingbox.py:161-165)."""
        return box_ring(self.west, self.south, self.east, self.north)

    def as_wkt(self) -> str:
        return ring_to_wkt(self.as_ring())

    def as_geometry_dict(self) -> Dict:
        """GeoJSON-like mapping (analog of shapely.mapping)."""
        return {
            "type": "Polygon",
            "coordinates": [[list(p) for p in self.as_ring()]],
        }

    def union(self, other: "BoundingBox") -> "BoundingBox":
        """Envelope union (the extent fold of builder.py:493-502)."""
        return BoundingBox(
            west=min(self.west, other.west),
            south=min(self.south, other.south),
            east=max(self.east, other.east),
            north=max(self.north, other.north),
            epsg=self.epsg,
        )

    def contains_point(self, x: float, y: float) -> bool:
        return self.west <= x <= self.east and self.south <= y <= self.north

    def intersects(self, other: "BoundingBox") -> bool:
        return not (
            other.west > self.east
            or other.east < self.west
            or other.south > self.north
            or other.north < self.south
        )
