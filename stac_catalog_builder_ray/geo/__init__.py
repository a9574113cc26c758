"""Pure numpy/stdlib geospatial kernel (no shapely/pyproj/h3).

Modules:
- ``bbox``      — BoundingBox record + list/dict/polygon/WKT conversions
                  (reference: stacbuilder/boundingbox.py)
- ``crs``       — vectorized CRS transforms for the EPSG codes the tests use
                  (reference: stacbuilder/projections.py)
- ``cell``      — H3-lite hierarchical quadtree cell index (encode/parent/
                  children/ring neighbours); SQL-expressible by design
- ``geometry``  — polygon rings, point-in-polygon, WKB, packed STRtree
"""

from .bbox import BoundingBox, bbox_dict_to_list, bbox_list_to_dict, to_bbox_dict
from .cell import (
    cell_decode,
    cell_encode,
    cell_children,
    cell_parent,
    cell_ring,
    cell_res,
    cell_to_bbox,
)
from .crs import project_points, reproject_bbox, supported_epsg

__all__ = [
    "BoundingBox",
    "bbox_dict_to_list",
    "bbox_list_to_dict",
    "to_bbox_dict",
    "cell_encode",
    "cell_decode",
    "cell_parent",
    "cell_children",
    "cell_ring",
    "cell_res",
    "cell_to_bbox",
    "project_points",
    "reproject_bbox",
    "supported_epsg",
]
