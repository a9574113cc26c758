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


# --- product quantization (PQ) ----------------------------------------------


def pq_fit(emb, m: int = 8, k: int = 16, id_col: str = "vec_id",
           vec_col: str = "embedding") -> np.ndarray:
    """PRODUCT-QUANTIZATION codebooks (Jégou et al.'s PQ — the memory-bound
    scale path of ANN: a D-dim float vector becomes m sub-space code ids,
    64 floats -> 8 bytes here): one integer-exact k-means per sub-space
    over the SLICED vectors, reusing the tested adaptive
    ``cluster.kmeans_fit`` (deterministic farthest-point init, bit-identical
    local/distributed paths).  Returns int64 codebooks of shape (m, k, D/m)
    in the engine's QUANT_SCALE fixed-point domain.

    Scale shape: codebook training is bounded by kmeans_fit's internal
    sample cap regardless of corpus size; encoding and search stream."""
    from .cluster import kmeans_fit, quantize_vectors

    def slicer(j: int, d_sub: int):
        def fn(t: pa.Table) -> pa.Table:
            q = quantize_vectors(t, vec_col)
            sub = q[:, j * d_sub:(j + 1) * d_sub].astype(np.float64)
            from .cluster import QUANT_SCALE

            # kmeans_fit re-quantizes internally; hand it floats that land
            # exactly back on the same int64 lattice
            return pa.table({id_col: t[id_col],
                             vec_col: pa.array(list(sub / QUANT_SCALE),
                                               pa.list_(pa.float64()))})
        return fn

    dim = len(emb.take(1)[0][vec_col])
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    d_sub = dim // m
    books = []
    for j in range(m):
        sub = emb.map_batches(slicer(j, d_sub), batch_format="pyarrow")
        cents, _ = kmeans_fit(sub, k=k, id_col=id_col, vec_col=vec_col)
        books.append(cents)
    return np.stack(books)


def pq_encode(emb, books: np.ndarray, id_col: str = "vec_id",
              vec_col: str = "embedding"):
    """Corpus -> (id, codes list<int64> of length m): one streaming
    map_batches against the broadcast codebooks; nearest code per sub-space
    with exact int64 distances (lowest index on ties)."""
    from .cluster import _nearest, quantize_vectors

    ref = ray.put(books)
    m, _, d_sub = books.shape

    def encode(t: pa.Table) -> pa.Table:
        bk = ray.get(ref)
        q = quantize_vectors(t, vec_col)
        codes = np.empty((len(t), m), dtype=np.int64)
        for j in range(m):
            codes[:, j], _ = _nearest(q[:, j * d_sub:(j + 1) * d_sub], bk[j])
        return pa.table({id_col: t[id_col],
                         "codes": pa.array(list(codes), pa.list_(pa.int64()))})

    return emb.map_batches(encode, batch_format="pyarrow")


def pq_topk(codes_ds, books: np.ndarray, queries_df: pd.DataFrame,
            k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding"):
    """ASYMMETRIC-DISTANCE (ADC) top-k: per query ONE (m, k) int64 distance
    table against the codebooks, then every corpus code row scores as m
    table lookups — no vector ever leaves the corpus partition, queries +
    tables broadcast once.  (query_id, neighbor_id) with (dist asc, id asc)
    tie-break; self-matches excluded."""
    from .cluster import quantize_vectors

    m, kk, d_sub = books.shape
    q_ids = queries_df[id_col].to_numpy().astype(np.int64)
    q_mat = quantize_vectors(pa.table({vec_col: pa.array(
        list(np.stack(queries_df[vec_col].to_numpy()).astype(np.float64)),
        pa.list_(pa.float64()))}), vec_col)
    # (Q, m, k) exact int64 squared distances query-subvector <-> codeword
    dt = np.empty((len(q_ids), m, kk), dtype=np.int64)
    for j in range(m):
        d = q_mat[:, None, j * d_sub:(j + 1) * d_sub] - books[None, j]
        dt[:, j, :] = np.einsum("qkd,qkd->qk", d, d)
    ref = ray.put((q_ids, dt))

    def partial(t: pa.Table) -> pa.Table:
        qi, tables = ray.get(ref)
        c_ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        codes = np.stack(t["codes"].to_pylist()).astype(np.int64)
        dist = np.zeros((len(qi), len(c_ids)), dtype=np.int64)
        for j in range(m):
            dist += tables[:, j, :][:, codes[:, j]]
        dist[qi[:, None] == c_ids[None, :]] = np.iinfo(np.int64).max  # no self
        top = min(k, dist.shape[1])
        idx = np.argpartition(dist, top - 1, axis=1)[:, :top]
        qq = np.repeat(qi, top)
        nn = c_ids[idx.ravel()]
        dd = np.take_along_axis(dist, idx, axis=1).ravel()
        keep = dd < np.iinfo(np.int64).max
        return pa.table({"query_id": pa.array(qq[keep]),
                         "neighbor_id": pa.array(nn[keep]),
                         "adc_dist": pa.array(dd[keep])})

    partials = codes_ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["adc_dist", "neighbor_id"],
                          ascending=[True, True], kind="stable").head(k)
        return g[["query_id", "neighbor_id"]]

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def pq_topk_rerank(codes_ds, books: np.ndarray, emb, queries_df: pd.DataFrame,
                   k: int = 5, shortlist: int = 25,
                   id_col: str = "vec_id", vec_col: str = "embedding"):
    """PQ with EXACT RERANK (the production IVFADC shape): ADC produces a
    ``shortlist`` per query, ONE streaming pass over the corpus fetches just
    the shortlisted vectors (candidate-id set broadcast — O(Q·shortlist)
    ids, never vectors), and the exact int64 distances rerank locally.
    Raw ADC on concentrated high-dim data recalls poorly (measured 0.30
    @5 on the 64-dim unit corpus vs 0.62 with shortlist=25 rerank)."""
    from .cluster import quantize_vectors

    short = pq_topk(codes_ds, books, queries_df, k=shortlist,
                    id_col=id_col, vec_col=vec_col).to_pandas()
    if short.empty:
        return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                             "neighbor_id": pd.Series(dtype="int64")})
    cand_ids = np.unique(short["neighbor_id"].to_numpy(dtype=np.int64))
    cref = ray.put(pa.array(cand_ids))

    def fetch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.is_in(pc.cast(t[id_col], pa.int64()), value_set=ray.get(cref))
        t = t.filter(m)
        q = quantize_vectors(t, vec_col)
        return pa.table({id_col: t[id_col],
                         "q": pa.array(list(q), pa.list_(pa.int64()))})

    cand = emb.map_batches(fetch, batch_format="pyarrow").to_pandas()
    cmat = np.stack(cand["q"].to_numpy()).astype(np.int64)
    cid = cand[id_col].to_numpy(dtype=np.int64)
    pos = {int(c): i for i, c in enumerate(cid)}

    qm = quantize_vectors(pa.table({vec_col: pa.array(
        list(np.stack(queries_df[vec_col].to_numpy()).astype(np.float64)),
        pa.list_(pa.float64()))}), vec_col)
    qpos = {int(q): i for i, q in
            enumerate(queries_df[id_col].to_numpy(dtype=np.int64))}

    rows = []
    for qi, g in short.groupby("query_id"):
        cands = g["neighbor_id"].to_numpy(dtype=np.int64)
        sub = cmat[[pos[int(c)] for c in cands]]
        d = ((sub - qm[qpos[int(qi)]]) ** 2).sum(axis=1)
        order = np.lexsort((cands, d))[:k]
        rows.extend((int(qi), int(cands[o])) for o in order)
    return pd.DataFrame(rows, columns=["query_id", "neighbor_id"])
