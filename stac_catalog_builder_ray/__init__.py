"""stac_catalog_builder_ray — a Ray-Data-native STAC-catalog + spatial-join engine.

A from-scratch engine with the query/data-processing capabilities of
VitoTAP/stac-catalog-builder (reference at /root/reference, cited per-module as
file:line), re-expressed Ray-Data-first:

- ``ray.data.Dataset`` pipelines over zero-copy Arrow batches,
- stateful actor pools for raster decode / CRS transform / STRtree probe,
- explicit cell-partitioned shuffles (H3-lite quadtree cells) for the wide
  steps (item assembly, PIP join, kNN, tile assignment, extent aggregation),
- partitioned, resumable Parquet/JSON sinks with per-partition lineage.

No dependency on rasterio/shapely/pyproj/pystac — the ``geo`` and ``codec``
subpackages ship small pure-numpy/stdlib equivalents for exactly the operator
surface the reference exercises.
"""

__version__ = "0.1.0"
