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
