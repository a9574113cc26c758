"""Polyline simplification kernels (Douglas-Peucker).

Library-surface geometry kernel used by the trajectory-simplification
operator (`pipelines/relational.q_traj_simplify`): pure numpy, no Ray.
The reference has no simplification stage; this is part of the engine's
movement-analytics axis (task brief).  Public algorithm: Douglas & Peucker
1973 — iterative stack form (no recursion limit), vectorized
point-to-segment distances per split.
"""

from __future__ import annotations

import numpy as np


def douglas_peucker_mask(x: np.ndarray, y: np.ndarray, eps: float) -> np.ndarray:
    """Boolean keep-mask for the polyline (x[i], y[i]) under tolerance
    ``eps`` (same units as the coordinates).  Endpoints are always kept;
    interior points are kept when their perpendicular distance to the
    current chord exceeds ``eps``.  Deterministic: ties (equal max
    distance) resolve to the first index via ``argmax``."""
    n = len(x)
    if n != len(y):
        raise ValueError("x and y must have equal length")
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[n - 1] = True
    if n <= 2:
        return keep
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    eps2 = float(eps) * float(eps)
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        dx = x[j] - x[i]
        dy = y[j] - y[i]
        seg2 = dx * dx + dy * dy
        px = x[i + 1:j] - x[i]
        py = y[i + 1:j] - y[i]
        if seg2 == 0.0:
            d2 = px * px + py * py  # degenerate chord: point distance
        else:
            cross = px * dy - py * dx
            d2 = cross * cross / seg2
        k = int(np.argmax(d2))
        if d2[k] > eps2:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def convex_hull_int(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Indices of the convex hull of integer lattice points, counter-
    clockwise from the lexicographically smallest point (Andrew's monotone
    chain, public algorithm).  INTEGER cross products — no float
    comparisons, so the hull is exactly reproducible on any platform.
    Collinear boundary points are excluded (strict turns).  Duplicate
    points must be removed by the caller."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    n = len(x)
    if n != len(y):
        raise ValueError("x and y must have equal length")
    if n <= 2:
        return np.arange(n)
    order = np.lexsort((y, x))

    def half(idx):
        out = []
        for i in idx:
            while len(out) >= 2:
                ax, ay = x[out[-2]], y[out[-2]]
                bx, by = x[out[-1]], y[out[-1]]
                if (bx - ax) * (y[i] - ay) - (by - ay) * (x[i] - ax) <= 0:
                    out.pop()
                else:
                    break
            out.append(i)
        return out

    lower = half(order)
    upper = half(order[::-1])
    return np.array(lower[:-1] + upper[:-1], dtype=np.int64)


def polygon_area2_int(x: np.ndarray, y: np.ndarray) -> int:
    """Twice the signed area of an integer polygon (shoelace), exact int64.
    Positive for counter-clockwise vertex order."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    if len(x) < 3:
        return 0
    xn = np.roll(x, -1)
    yn = np.roll(y, -1)
    return int((x * yn - xn * y).sum())
