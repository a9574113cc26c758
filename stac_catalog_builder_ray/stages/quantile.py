"""Mergeable QUANTILE SKETCH (MRL/KLL-family, deterministic compaction) —
the fixed-memory alternative to the exact two-phase distributed quantiles in
``pipelines/relational.grouped_quantiles`` for when the value domain is too
large to co-locate per group (the "novel sketch" slot of the engine's sketch
family next to KMV distinct, HLL registers and the Count-Min counts).

Structure: level ``i`` holds at most ``capacity`` values each representing
``2**i`` originals.  A full level sorts and keeps the EVEN-indexed half,
promoting it to level ``i+1`` (Manku-Rajagopalan-Lindsay's deterministic
collapse — no RNG, so the sketch is reproducible for a fixed stream order;
the MERGE of two sketches concatenates levels and re-compacts, which keeps
it associative enough for tree-reduction while the rank-error bound below
holds regardless of merge shape).

Rank-error: each compaction at level ``i`` displaces any rank by at most
``2**i``; with ``n`` inputs and capacity ``c`` the total displacement is
bounded by ``n / c * ceil(log2(n / c) + 1)`` — the tests assert the much
tighter empirical error on real data AND the analytic bound.
"""

from __future__ import annotations

from typing import List

import numpy as np


class QuantileSketch:
    __slots__ = ("capacity", "levels", "n")

    def __init__(self, capacity: int = 256):
        self.capacity = int(capacity)
        self.levels: List[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0

    # -- building -------------------------------------------------------
    def update(self, values: np.ndarray) -> "QuantileSketch":
        """Absorb a batch (vectorized; order inside the batch is sorted
        first so the result is independent of intra-batch ordering)."""
        v = np.sort(np.asarray(values, dtype=np.float64))
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()
        return self

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        assert self.capacity == other.capacity
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, lv in enumerate(other.levels):
            self.levels[i] = np.concatenate([self.levels[i], lv])
        self.n += other.n
        self._compress()
        return self

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self.capacity:
                buf = np.sort(self.levels[i])
                keep = buf[::2]  # even ranks survive, weight doubles
                self.levels[i] = np.empty(0, dtype=np.float64)
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[i + 1] = np.concatenate([self.levels[i + 1], keep])
            i += 1

    # -- querying -------------------------------------------------------
    def quantile(self, q: float) -> float:
        """Estimated value at rank ``ceil(q * n)`` (lower quantile)."""
        vals, weights = [], []
        for i, lv in enumerate(self.levels):
            vals.append(lv)
            weights.append(np.full(len(lv), 1 << i, dtype=np.int64))
        v = np.concatenate(vals)
        w = np.concatenate(weights)
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        target = max(1, int(np.ceil(q * self.n)))
        idx = np.searchsorted(np.cumsum(w), target)
        return float(v[min(idx, len(v) - 1)])

    # -- serialization (for shipping partials through Arrow) -------------
    def to_arrays(self):
        return [lv.copy() for lv in self.levels], self.n

    @classmethod
    def from_arrays(cls, levels, n, capacity: int = 256) -> "QuantileSketch":
        s = cls(capacity)
        s.levels = [np.asarray(lv, dtype=np.float64) for lv in levels]
        s.n = int(n)
        return s

    def rank_error_bound(self) -> int:
        """Analytic worst-case rank displacement for this sketch's history:
        each level-i compaction displaces ranks by <= 2**i; bounded by
        n/capacity * (levels)."""
        return int(np.ceil(self.n / self.capacity)) * max(1, len(self.levels))


def sketch_quantiles(ds, value_col: str, quantiles, capacity: int = 256,
                     fan_in: int = 8):
    """Dataset -> {q: estimate}: per-batch sketches, two-level tree merge
    (``fan_in`` intermediate merges, then one driver merge of ``fan_in``
    sketches — the Bloom-build shape), one final quantile read.  Memory per
    task is O(capacity * log(n/capacity)) regardless of data size."""
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        s = QuantileSketch(capacity)
        s.update(t[value_col].to_numpy(zero_copy_only=False))
        levels, n = s.to_arrays()
        return pa.table({
            "levels": pa.array([[list(lv) for lv in levels]],
                               pa.list_(pa.list_(pa.float64()))),
            "n": pa.array([n], pa.int64()),
        })

    def merge_block(t: pa.Table) -> pa.Table:
        acc = QuantileSketch(capacity)
        for i in range(t.num_rows):
            acc.merge(QuantileSketch.from_arrays(
                t["levels"][i].as_py(), t["n"][i].as_py(), capacity))
        levels, n = acc.to_arrays()
        return pa.table({
            "levels": pa.array([[list(lv) for lv in levels]],
                               pa.list_(pa.list_(pa.float64()))),
            "n": pa.array([n], pa.int64()),
        })

    level1 = (ds.map_batches(partial, batch_format="pyarrow")
              .repartition(fan_in)
              .map_batches(merge_block, batch_format="pyarrow", batch_size=None))
    final = QuantileSketch(capacity)
    for row in level1.iter_rows():
        final.merge(QuantileSketch.from_arrays(row["levels"], row["n"], capacity))
    return {q: final.quantile(q) for q in quantiles}, final
