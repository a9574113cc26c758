"""Approximate-nearest-neighbour search over an embedding column.

- ``brute_force_topk``: the exact baseline — the (small) query matrix is
  broadcast with ``ray.put``; every batch does ONE numpy matmul against it
  and emits per-batch partial top-k; a final tiny ``groupby(query)`` merge
  keeps the global top-k.  This is the canonical scale pattern: the corpus
  streams, the queries broadcast, nothing shuffles except k rows per query
  per batch.
- ``ivf_topk``: the scale path — corpus bucketed by nearest of C centroids
  (deterministic k-means-lite on a sample); queries probe ``n_probe``
  buckets.  Recall < 1.0 by construction; used when the corpus is too big
  for exhaustive scan.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _unit(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


_PROBE_CACHE: dict = {}


def brute_force_topk(corpus, queries_df: pd.DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding"):
    """corpus Dataset x (query_id, vector) DataFrame -> top-k cosine matches
    (query_id, neighbor_id) with (sim desc, id) tie-break; self-matches
    excluded."""
    q_ids = queries_df[id_col].to_numpy()
    q_mat = _unit(np.stack(queries_df[vec_col].to_numpy()).astype(np.float64))
    ref = ray.put((q_ids, q_mat))

    class Partial:
        def __init__(self):
            self.q_ids, self.q_mat = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            c_ids = np.asarray(t[id_col].to_pylist())
            c_mat = _unit(np.stack(t[vec_col].to_pylist()).astype(np.float64))
            sims = self.q_mat @ c_mat.T  # (Q, B)
            sims[self.q_ids[:, None] == c_ids[None, :]] = -np.inf  # no self
            kk = min(k, sims.shape[1])
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            qq = np.repeat(self.q_ids, kk)
            nn = c_ids[idx.ravel()]
            ss = np.take_along_axis(sims, idx, axis=1).ravel()
            keep = np.isfinite(ss)
            return pa.table(
                {
                    "query_id": pa.array(qq[keep]),
                    "neighbor_id": pa.array(nn[keep]),
                    "sim": pa.array(ss[keep]),
                }
            )

    partials = corpus.map_batches(Partial, batch_format="pyarrow", concurrency=(1, 8))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True], kind="stable").head(k)
        return g[["query_id", "neighbor_id"]]

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def ivf_topk(corpus, queries_df: pd.DataFrame, k: int = 5, n_centroids: int = 16,
             n_probe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
             train_sample: int = 2048, iters: int = 5):
    """IVF variant: Lloyd-iterate centroids on a deterministic sample (driver
    side, tiny), bucket the corpus by nearest centroid (one pass), probe the
    ``n_probe`` nearest buckets per query."""
    sample = corpus.limit(train_sample).to_pandas()
    x = _unit(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(7)
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-12)
    cents_ref = ray.put(cents)

    class Bucketize:
        def __init__(self):
            self.cents = ray.get(cents_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _unit(np.stack(t[vec_col].to_pylist()).astype(np.float64))
            b = np.argmax(m @ self.cents.T, axis=1)
            return pa.table(
                {id_col: t[id_col], "bucket": pa.array(b.astype(np.int64)),
                 vec_col: t[vec_col]}
            )

    bucketed = corpus.map_batches(Bucketize, batch_format="pyarrow", concurrency=(1, 8))

    q_ids = queries_df[id_col].to_numpy()
    q_mat = _unit(np.stack(queries_df[vec_col].to_numpy()).astype(np.float64))
    q_buckets = np.argsort(-(q_mat @ cents.T), axis=1)[:, :n_probe]
    q_ref = ray.put((q_ids, q_mat, q_buckets))

    def probe(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "bucket" not in g.columns:
            # empty hash partitions reach map_groups as schema-less frames
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "sim": []})
        # per-worker cache: ray.get is zero-copy from plasma but still pays
        # a lookup per call; map_groups calls this once per bucket group
        key = q_ref.hex()
        cached = _PROBE_CACHE.get(key)
        if cached is None:
            # keep only the CURRENT query set: an unbounded dict would pin
            # every past (q_ids, q_mat, q_buckets) copy in each worker
            # process for its lifetime
            _PROBE_CACHE.clear()
            cached = _PROBE_CACHE[key] = ray.get(q_ref)
        ids, mat, buckets = cached
        b = int(g["bucket"].iloc[0])
        q_sel = np.nonzero((buckets == b).any(axis=1))[0]
        if len(q_sel) == 0:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "sim": []})
        c_ids = g[id_col].to_numpy()
        c_mat = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        sims = mat[q_sel] @ c_mat.T
        sims[ids[q_sel][:, None] == c_ids[None, :]] = -np.inf
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        qq = np.repeat(ids[q_sel], kk)
        nn = c_ids[idx.ravel()]
        ss = np.take_along_axis(sims, idx, axis=1).ravel()
        keep = np.isfinite(ss)
        return pd.DataFrame({"query_id": qq[keep], "neighbor_id": nn[keep], "sim": ss[keep]})

    partials = bucketed.groupby("bucket").map_groups(probe, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True], kind="stable").head(k)
        return g[["query_id", "neighbor_id"]]

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")
