"""Zonal statistics — the raster x vector fusion operator for the
image+geospatial tier: per-AOI statistics over the PIXELS of every raster
that overlaps it (the rasterio/rasterstats ``zonal_stats`` shape, computed
distributed).

Shape: actor-pool ``map_batches`` over the images table (decode + per-pixel
georeferencing once per row, AOI masks vectorized, partial (aoi, sum, count,
min, max) rows out — a few rows per image, never pixels) -> one tiny
``groupby(aoi_id)`` aggregate -> mean/min/max per AOI.  The AOI list is
broadcast via ``ray.put`` once per actor (J1 pattern); the wide ``bytes``
column is consumed in the stage and never shuffled (the same discipline as
the flagship decode, SURVEY.md §4)."""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..codec.raster import decode_image
from ..datagen import tile_geo
from ..functions.pathparse import RegexPathParser, make_parser
from ..geo.crs import project_points


class ZonalPartials:
    """(images batch) -> per-(aoi, batch) partial stat rows."""

    def __init__(self, aois_ref, parser: str = "TiledObservationsParser"):
        from ..geo.geometry import STRtree

        aois = ray.get(aois_ref) if isinstance(aois_ref, ray.ObjectRef) else aois_ref
        self.aoi_ids = [a["aoi_id"] for a in aois]
        self.boxes = np.array(
            [[a["west"], a["south"], a["east"], a["north"]] for a in aois],
            dtype=np.float64,
        )
        # STRtree over AOI bboxes: per-image AOI candidates are a tree
        # query on the tile bbox, not a scan of every AOI (large AOI sets)
        self.tree = STRtree(self.boxes)
        self.parser: RegexPathParser = make_parser(parser)
        self._geo_cache: dict = {}
        self._grid_cache: dict = {}

    def _lonlat_grid(self, tile: str, w: int, h: int):
        """Per-pixel lon/lat centers for a tile's raster grid — cached per
        (tile, shape) per actor (transform + inverse projection once)."""
        key = (tile, w, h)
        g = self._grid_cache.get(key)
        if g is None:
            geo = self._geo_cache.get(tile)
            if geo is None:
                geo = self._geo_cache[tile] = tile_geo(tile)
            a, _, c, _, e, f = geo["transform"]
            cols = (np.arange(w, dtype=np.float64) + 0.5) * a + c
            rows = (np.arange(h, dtype=np.float64) + 0.5) * e + f
            px = np.repeat(rows, w)  # y per pixel, row-major
            py = np.tile(cols, h)  # x per pixel
            lon, lat = project_points(py, px, geo["epsg"], 4326)
            g = self._grid_cache[key] = (lon, lat)
        return g

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"]
        parsed = self.parser.parse_column(ids)
        tiles = parsed.get("tile", pa.nulls(batch.num_rows, pa.string())).to_pylist()
        bufs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        n_aoi = len(self.aoi_ids)
        sums = np.zeros(n_aoi, dtype=np.float64)
        cnts = np.zeros(n_aoi, dtype=np.int64)
        mins = np.full(n_aoi, np.inf)
        maxs = np.full(n_aoi, -np.inf)
        for i, buf in enumerate(bufs):
            tile = tiles[i]
            if tile is None:
                continue
            px = decode_image(buf, fmts[i]).astype(np.float64)
            h, w = px.shape
            lon, lat = self._lonlat_grid(tile, w, h)
            flat = px.ravel()
            geo = self._geo_cache[tile]
            # tile-level AOI candidates from the STRtree (replaces the
            # per-image scan over every AOI)
            qbox = np.array([[geo["west"], geo["south"], geo["east"], geo["north"]]])
            _, cand_j = self.tree.query(qbox)
            for j in cand_j:
                bw, bs, be, bn = self.boxes[j]
                m = (lon >= bw) & (lon <= be) & (lat >= bs) & (lat <= bn)
                if not m.any():
                    continue
                v = flat[m]
                sums[j] += float(v.sum())
                cnts[j] += int(v.size)
                mins[j] = min(mins[j], float(v.min()))
                maxs[j] = max(maxs[j], float(v.max()))
        keep = cnts > 0
        return pa.table(
            {
                "aoi_id": pa.array([a for a, k in zip(self.aoi_ids, keep) if k]),
                "px_sum": pa.array(sums[keep]),
                "n_pixels": pa.array(cnts[keep]),
                "px_min": pa.array(mins[keep]),
                "px_max": pa.array(maxs[keep]),
            }
        )


def zonal_stats(images, aois: List[dict],
                parser: str = "TiledObservationsParser",
                concurrency=(1, 8), batch_size: Optional[int] = 64):
    """images Dataset x AOI list -> per-AOI (n_pixels, px_mean, px_min,
    px_max) over every overlapping raster pixel."""
    from ray.data.aggregate import Max, Min, Sum

    aois_ref = ray.put(aois)
    partials = images.map_batches(
        ZonalPartials,
        fn_constructor_kwargs={"aois_ref": aois_ref, "parser": parser},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    out = partials.groupby("aoi_id").aggregate(
        Sum("px_sum", alias_name="px_sum"),
        Sum("n_pixels", alias_name="n_pixels"),
        Min("px_min", alias_name="px_min"),
        Max("px_max", alias_name="px_max"),
    )

    def finish(t: pa.Table) -> pa.Table:
        s = t["px_sum"].to_numpy(zero_copy_only=False)
        n = t["n_pixels"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "aoi_id": t["aoi_id"],
                "n_pixels": pa.array(n.astype(np.int64)),
                "px_mean": pa.array(s / np.maximum(n, 1)),
                "px_min": t["px_min"],
                "px_max": t["px_max"],
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


class HistogramPartials:
    """(images batch) -> per-(group, bin) partial count rows.  The group is
    the parsed acquisition type (same parser discipline as ZonalPartials);
    one ``np.bincount`` per image over pre-shifted pixel values — pixels
    never leave the stage, only ``n_groups x n_bins`` int64 rows do."""

    def __init__(self, n_bins: int = 64, parser: str = "TiledObservationsParser"):
        assert 65536 % n_bins == 0, "bins must divide the uint16 range"
        self.n_bins = n_bins
        self.shift = int(np.log2(65536 // n_bins))  # value >> shift == bin
        self.parser: RegexPathParser = make_parser(parser)

    def __call__(self, batch: pa.Table) -> pa.Table:
        parsed = self.parser.parse_column(batch["image_id"])
        groups = parsed.get("asset_type", pa.nulls(batch.num_rows, pa.string())).to_pylist()
        bufs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        acc: dict = {}
        for g, buf, fmt in zip(groups, bufs, fmts):
            if g is None:
                continue
            px = decode_image(buf, fmt)
            counts = np.bincount((px.ravel() >> self.shift).astype(np.int64),
                                 minlength=self.n_bins)
            prev = acc.get(g)
            acc[g] = counts if prev is None else prev + counts
        if not acc:
            return pa.table({"atype": pa.array([], pa.string()),
                             "bin": pa.array([], pa.int64()),
                             "n_px": pa.array([], pa.int64())})
        gs, bs, ns = [], [], []
        for g, counts in acc.items():
            nz = np.flatnonzero(counts)  # sparse partials: only occupied bins
            gs.extend([g] * len(nz))
            bs.append(nz.astype(np.int64))
            ns.append(counts[nz].astype(np.int64))
        return pa.table({"atype": pa.array(gs),
                         "bin": pa.array(np.concatenate(bs)),
                         "n_px": pa.array(np.concatenate(ns))})


def pixel_histogram(images, n_bins: int = 64,
                    parser: str = "TiledObservationsParser",
                    concurrency=(1, 8), batch_size: Optional[int] = 64):
    """Corpus-wide per-acquisition-type pixel-value histogram (the
    training-data "intensity distribution" statistic): fixed power-of-two
    bins over the uint16 range, per-batch bincount partials, one tiny
    ``groupby((atype, bin))`` sum.  Shuffle volume is bounded by
    ``n_groups x n_bins`` rows per batch regardless of image sizes."""
    from ray.data.aggregate import Sum

    partials = images.map_batches(
        HistogramPartials,
        fn_constructor_kwargs={"n_bins": n_bins, "parser": parser},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return partials.groupby(["atype", "bin"]).aggregate(Sum("n_px", alias_name="n_px"))


class OverviewPartials:
    """(images batch) -> per-(tile, r, c) integer block-sum partial rows —
    the OVERVIEW/PYRAMID builder (the ``gdaladdo`` analog): every tile's
    images are block-mean downsampled by ``factor`` and averaged into one
    low-resolution mosaic cell grid.  Sums are int64 (uint16 pixels x
    factor^2 x images never overflows below ~2^47 rows), so partials merge
    order-independently; pixels never leave the stage — only
    ``(h//f) x (w//f)`` rows per (tile, shape) per batch do."""

    def __init__(self, factor: int = 8, parser: str = "TiledObservationsParser"):
        self.f = int(factor)
        self.parser: RegexPathParser = make_parser(parser)

    def __call__(self, batch: pa.Table) -> pa.Table:
        parsed = self.parser.parse_column(batch["image_id"])
        tiles = parsed.get("tile", pa.nulls(batch.num_rows, pa.string())).to_pylist()
        bufs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        f = self.f
        acc: dict = {}  # (tile, hf, wf) -> [sum grid int64, n_img]
        for tile, buf, fmt in zip(tiles, bufs, fmts):
            if tile is None:
                continue
            px = decode_image(buf, fmt)
            h, w = px.shape
            hf, wf = h // f, w // f
            if hf == 0 or wf == 0:
                continue  # smaller than one block: ragged drop (ViT-patch rule)
            blocks = px[: hf * f, : wf * f].astype(np.int64).reshape(hf, f, wf, f).sum((1, 3))
            key = (tile, hf, wf)
            prev = acc.get(key)
            if prev is None:
                acc[key] = [blocks, 1]
            else:
                prev[0] += blocks
                prev[1] += 1
        if not acc:
            return pa.table({"tile": pa.array([], pa.string()),
                             "r": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "px_sum": pa.array([], pa.int64()),
                             "n_img": pa.array([], pa.int64())})
        ts, rs, cs, ss, ns = [], [], [], [], []
        for (tile, hf, wf), (grid, n) in acc.items():
            rr, cc = np.divmod(np.arange(hf * wf, dtype=np.int64), wf)
            ts.extend([tile] * (hf * wf))
            rs.append(rr)
            cs.append(cc)
            ss.append(grid.ravel())
            ns.append(np.full(hf * wf, n, dtype=np.int64))
        return pa.table({"tile": pa.array(ts),
                         "r": pa.array(np.concatenate(rs)),
                         "c": pa.array(np.concatenate(cs)),
                         "px_sum": pa.array(np.concatenate(ss)),
                         "n_img": pa.array(np.concatenate(ns))})


def overview_pyramid(images, factor: int = 8,
                     parser: str = "TiledObservationsParser",
                     concurrency=(1, 8), batch_size: Optional[int] = 64):
    """images Dataset -> per-tile low-res overview mosaic in long format:
    (tile, r, c, n_img, mean_e4) where mean_e4 is the block mean across all
    the tile's images scaled by 1e4 and floor-divided (integer-exact, so
    the result is independent of partial-merge order)."""
    from ray.data.aggregate import Sum

    partials = images.map_batches(
        OverviewPartials,
        fn_constructor_kwargs={"factor": factor, "parser": parser},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    out = partials.groupby(["tile", "r", "c"]).aggregate(
        Sum("px_sum", alias_name="px_sum"),
        Sum("n_img", alias_name="n_img"),
    )

    def finish(t: pa.Table) -> pa.Table:
        s = t["px_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n_img"].to_numpy(zero_copy_only=False).astype(np.int64)
        f2 = np.int64(factor * factor)
        return pa.table({"tile": t["tile"], "r": t["r"], "c": t["c"],
                         "n_img": pa.array(n),
                         "mean_e4": pa.array(s * 10000 // (n * f2))})

    return out.map_batches(finish, batch_format="pyarrow")
