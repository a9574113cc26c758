"""Geometry derivation closure (M8/M9): from ANY one of {bbox_projected,
bbox_lat_lon, geometry_proj, geometry_lat_lon} (+ proj_epsg), derive the
other three.

Reference: ``AssetMetadata._ensure_geoms`` (metadata.py:199-236) runs this
per record with shapely/pyproj; here it is one vectorized ``map_batches``
stage over Arrow batches.  Geometries are WKB polygon columns
(geo/geometry.py); bboxes are flat ``list<float64>`` [w, s, e, n].

Derivation rules (exactly metadata.py:201-232):
- bbox_projected set      -> geometry_proj = box(bbox_projected);
                             geometry_lat_lon = project(geometry_proj);
                             bbox_lat_lon = bounds(geometry_lat_lon)
- else bbox_lat_lon set   -> geometry_lat_lon = box(bbox_lat_lon);
                             geometry_proj = project(geometry_lat_lon);
                             bbox_projected = bounds(geometry_proj)
- else geometry_proj      -> bbox_projected = bounds(geometry_proj), recurse
- else geometry_lat_lon   -> bbox_lat_lon = bounds(geometry_lat_lon), recurse
- nothing set             -> error (same as the reference's ValueError)
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from ..geo.bbox import box_ring
from ..geo.crs import project_ring
from ..geo.geometry import ring_bounds_arr, ring_to_wkb, wkb_to_ring


def _row_closure(
    epsg: int,
    bbox_proj: Optional[list],
    bbox_ll: Optional[list],
    geom_proj_wkb: Optional[bytes],
    geom_ll_wkb: Optional[bytes],
):
    if bbox_proj is None and bbox_ll is None and geom_proj_wkb is None and geom_ll_wkb is None:
        raise ValueError(
            "At least one of bbox_lat_lon, bbox_projected, geometry_lat_lon, "
            "or geometry_proj must be set."
        )
    if bbox_proj is None and geom_proj_wkb is not None:
        bbox_proj = ring_bounds_arr(wkb_to_ring(geom_proj_wkb)).tolist()
    if bbox_proj is None and bbox_ll is None and geom_ll_wkb is not None:
        bbox_ll = ring_bounds_arr(wkb_to_ring(geom_ll_wkb)).tolist()

    if bbox_proj is not None:
        if geom_proj_wkb is None:
            geom_proj_wkb = ring_to_wkb(box_ring(*bbox_proj))
        if geom_ll_wkb is None:
            ll_ring = project_ring(wkb_to_ring(geom_proj_wkb), epsg, 4326)
            geom_ll_wkb = ring_to_wkb(ll_ring)
        if bbox_ll is None:
            bbox_ll = ring_bounds_arr(wkb_to_ring(geom_ll_wkb)).tolist()
    else:  # bbox_ll is set
        if epsg is None:
            raise ValueError("proj_epsg must be set if bbox_projected is not set.")
        if geom_ll_wkb is None:
            geom_ll_wkb = ring_to_wkb(box_ring(*bbox_ll))
        if geom_proj_wkb is None:
            proj_ring_pts = project_ring(wkb_to_ring(geom_ll_wkb), 4326, epsg)
            geom_proj_wkb = ring_to_wkb(proj_ring_pts)
        bbox_proj = ring_bounds_arr(wkb_to_ring(geom_proj_wkb)).tolist()
    return bbox_proj, bbox_ll, geom_proj_wkb, geom_ll_wkb


def ensure_geoms_batch(batch: pa.Table) -> pa.Table:
    """Vectorized-dispatch closure over a batch with nullable columns
    ``proj_epsg, bbox_projected, bbox_lat_lon, geometry_proj_wkb,
    geometry_lat_lon_wkb`` — fills every null derivable field."""
    n = batch.num_rows

    def col(name, default=None):
        if name in batch.column_names:
            return batch[name].to_pylist()
        return [default] * n

    epsg = col("proj_epsg")
    bp = col("bbox_projected")
    bl = col("bbox_lat_lon")
    gp = col("geometry_proj_wkb")
    gl = col("geometry_lat_lon_wkb")
    out_bp, out_bl, out_gp, out_gl = [], [], [], []
    for i in range(n):
        a, b, c, d = _row_closure(epsg[i], bp[i], bl[i], gp[i], gl[i])
        out_bp.append([float(v) for v in a])
        out_bl.append([float(v) for v in b])
        out_gp.append(c)
        out_gl.append(d)
    result = {name: batch[name] for name in batch.column_names
              if name not in ("bbox_projected", "bbox_lat_lon", "geometry_proj_wkb", "geometry_lat_lon_wkb")}
    result["bbox_projected"] = pa.array(out_bp, pa.list_(pa.float64()))
    result["bbox_lat_lon"] = pa.array(out_bl, pa.list_(pa.float64()))
    result["geometry_proj_wkb"] = pa.array(out_gp, pa.binary())
    result["geometry_lat_lon_wkb"] = pa.array(out_gl, pa.binary())
    return pa.table(result)
