"""Polygon geometry: rings, WKB, point-in-polygon, packed STRtree.

Replaces the slice of shapely the reference uses (``box``, ``mapping``,
``to_wkt``, ``.bounds``, polygon reprojection — boundingbox.py:161-171,
metadata.py:199-236) plus the STRtree needed by the north rule's
point-in-polygon join (SURVEY.md J4/T7).  Pure numpy + stdlib ``struct``.

A polygon here is a single closed exterior ring: ``ndarray (K, 2)`` of
(x, y).  Multi-ring/holes are out of scope (the reference only ever builds
rectangles from bboxes).
"""

from __future__ import annotations

import struct
from typing import List, Sequence, Tuple

import numpy as np

# --- WKB (well-known binary), little-endian POLYGON -------------------------

_WKB_POLYGON = 3


def ring_to_wkb(ring: Sequence[Tuple[float, float]]) -> bytes:
    """Closed exterior ring -> WKB POLYGON bytes (little-endian)."""
    pts = np.asarray(ring, dtype=np.float64)
    out = bytearray()
    out += struct.pack("<BII", 1, _WKB_POLYGON, 1)  # byte order, type, n_rings
    out += struct.pack("<I", len(pts))
    out += pts.astype("<f8").tobytes()
    return bytes(out)


def wkb_to_ring(wkb: bytes) -> np.ndarray:
    """WKB POLYGON bytes -> (K, 2) exterior-ring array."""
    byte_order, geom_type, n_rings = struct.unpack_from("<BII", wkb, 0)
    if byte_order != 1 or geom_type != _WKB_POLYGON or n_rings < 1:
        raise ValueError("only little-endian single-ring WKB POLYGON supported")
    (n_pts,) = struct.unpack_from("<I", wkb, 9)
    arr = np.frombuffer(wkb, dtype="<f8", count=n_pts * 2, offset=13)
    return arr.reshape(n_pts, 2).copy()


# --- point-in-polygon -------------------------------------------------------


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized ray-crossing test: N points vs one ring -> bool (N,).

    Boundary points count as inside (closed polygon), matching shapely's
    ``intersects`` semantics the PIP-join oracle uses (>=, <=) for rectangle
    AOIs.  For the general ring the boundary rule is the usual half-open
    crossing rule, adequate because test AOIs avoid vertex-exact points.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x0 = ring[:-1, 0][:, None]  # (E, 1) edge starts
    y0 = ring[:-1, 1][:, None]
    x1 = ring[1:, 0][:, None]
    y1 = ring[1:, 1][:, None]
    # half-open in y to count each crossing once
    cond = (y0 > py[None, :]) != (y1 > py[None, :])
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (py[None, :] - y0) * (x1 - x0) / np.where(y1 == y0, np.inf, (y1 - y0))
    crossings = np.sum(cond & (px[None, :] < xint), axis=0)
    inside = (crossings % 2) == 1
    # boundary: exactly on an axis-aligned edge (covers rectangle AOIs)
    on_h = (y0 == y1) & (py[None, :] == y0) & (px[None, :] >= np.minimum(x0, x1)) & (px[None, :] <= np.maximum(x0, x1))
    on_v = (x0 == x1) & (px[None, :] == x0) & (py[None, :] >= np.minimum(y0, y1)) & (py[None, :] <= np.maximum(y0, y1))
    return inside | on_h.any(axis=0) | on_v.any(axis=0)


def ring_bounds_arr(ring: np.ndarray) -> np.ndarray:
    return np.array([ring[:, 0].min(), ring[:, 1].min(), ring[:, 0].max(), ring[:, 1].max()])


# --- packed STRtree ---------------------------------------------------------


class STRtree:
    """Packed (sort-tile-recursive) R-tree over N bounding boxes.

    Build once (numpy sort + reshape), query many — designed to live inside a
    Ray actor's ``__init__`` (SURVEY.md T7): the AOI polygon set is broadcast
    with ``ray.put`` and each PIP-probe actor builds the tree once.

    ``query(boxes)`` returns candidate (query_idx, tree_idx) pairs whose
    bboxes intersect; exact ring tests happen on the candidates only.
    """

    def __init__(self, bounds: np.ndarray, node_capacity: int = 16):
        bounds = np.asarray(bounds, dtype=np.float64)
        if bounds.ndim != 2 or bounds.shape[1] != 4:
            raise ValueError("bounds must be (N, 4) [minx,miny,maxx,maxy]")
        n = len(bounds)
        self.n = n
        self.node_capacity = node_capacity
        if n == 0:
            self.order = np.empty(0, dtype=np.int64)
            self.leaf_bounds = np.empty((0, 4))
            self.sorted_bounds = np.empty((0, 4))
            return
        # STR packing: sort by cx into vertical slices, then by cy inside
        cx = (bounds[:, 0] + bounds[:, 2]) * 0.5
        cy = (bounds[:, 1] + bounds[:, 3]) * 0.5
        n_leaves = int(np.ceil(n / node_capacity))
        n_slices = int(np.ceil(np.sqrt(n_leaves)))
        slice_size = n_slices * node_capacity
        order = np.argsort(cx, kind="stable")
        for s in range(0, n, slice_size):
            sl = order[s : s + slice_size]
            order[s : s + slice_size] = sl[np.argsort(cy[sl], kind="stable")]
        self.order = order
        self.sorted_bounds = bounds[order]
        # one level of leaf nodes is enough at broadcast-side sizes (<=1e5)
        pad = (-n) % node_capacity
        sb = np.vstack([self.sorted_bounds, np.tile([np.inf, np.inf, -np.inf, -np.inf], (pad, 1))])
        grp = sb.reshape(-1, node_capacity, 4)
        self.leaf_bounds = np.stack(
            [grp[:, :, 0].min(1), grp[:, :, 1].min(1), grp[:, :, 2].max(1), grp[:, :, 3].max(1)], axis=1
        )

    def query(self, boxes: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(Q, 4) query boxes -> (query_idx, tree_idx) candidate pairs."""
        boxes = np.atleast_2d(np.asarray(boxes, dtype=np.float64))
        if self.n == 0 or len(boxes) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        lb = self.leaf_bounds
        # leaf-level intersection: (Q, L)
        hit = (
            (boxes[:, None, 0] <= lb[None, :, 2])
            & (boxes[:, None, 2] >= lb[None, :, 0])
            & (boxes[:, None, 1] <= lb[None, :, 3])
            & (boxes[:, None, 3] >= lb[None, :, 1])
        )
        qi, li = np.nonzero(hit)
        if len(qi) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        cap = self.node_capacity
        # expand leaves to items
        item_start = li * cap
        counts = np.minimum(self.n - item_start, cap)
        rep_q = np.repeat(qi, counts)
        item_idx = np.concatenate([np.arange(s, s + c) for s, c in zip(item_start, counts)])
        sb = self.sorted_bounds[item_idx]
        qb = boxes[rep_q]
        ok = (qb[:, 0] <= sb[:, 2]) & (qb[:, 2] >= sb[:, 0]) & (qb[:, 1] <= sb[:, 3]) & (qb[:, 3] >= sb[:, 1])
        return rep_q[ok], self.order[item_idx[ok]]

    def query_points(self, px: np.ndarray, py: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        boxes = np.stack([px, py, px, py], axis=1)
        return self.query(boxes)


class PolygonSet:
    """A small set of polygons (the broadcast side of the PIP join): rings +
    STRtree over their bounds + exact ring test over candidates."""

    def __init__(self, rings: List[np.ndarray]):
        self.rings = [np.asarray(r, dtype=np.float64) for r in rings]
        bounds = (
            np.stack([ring_bounds_arr(r) for r in self.rings])
            if self.rings
            else np.empty((0, 4))
        )
        self.tree = STRtree(bounds)

    def contains_points(self, px: np.ndarray, py: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """-> (point_idx, polygon_idx) pairs where point is inside polygon."""
        qi, ti = self.tree.query_points(np.asarray(px, float), np.asarray(py, float))
        if len(qi) == 0:
            return qi, ti
        keep = np.zeros(len(qi), dtype=bool)
        for poly in np.unique(ti):
            m = ti == poly
            keep[m] = points_in_ring(np.asarray(px, float)[qi[m]], np.asarray(py, float)[qi[m]], self.rings[poly])
        return qi[keep], ti[keep]
