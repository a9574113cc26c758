"""Deduplication operators for large-scale training-data pipelines.

Five families (task brief "Beyond the reference's own operators"):

- **exact**: content hash -> hash-partitioned ``groupby`` -> keep first.
  No global seen-set (contrast: the reference's driver-side ``set``,
  terracatalog.py:482,517) — scales to any key cardinality.
- **MinHash + LSH**: word-shingle sets -> k permuted min-hashes -> banded
  buckets -> ``groupby(band, bucket)`` -> candidate pairs -> exact-Jaccard
  verify.  One shuffle over (band, bucket, doc) rows; sketches are tiny.
- **SimHash**: 64-bit hyperplane-free sketch from token hashes; near-dup =
  Hamming distance <= t, bucketed by the 4x16-bit band trick.
- **n-gram Jaccard**: exact pairwise similarity for candidate pairs.
- **embedding cosine**: near-dup over an embedding column via normalized
  dot products against LSH-ish random-projection buckets (brute-force within
  bucket).

All hashing uses explicit deterministic mixes (splitmix64) — stable across
processes and runs (no PYTHONHASHSEED dependence).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public splitmix64 constants)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & MASK64
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & MASK64
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & MASK64
    return x ^ (x >> np.uint64(31))


def hash_tokens(tokens: List[str]) -> np.ndarray:
    """Stable per-token 64-bit hashes (blake2b-8 digests — C-speed, stable
    across processes; no PYTHONHASHSEED dependence)."""
    from hashlib import blake2b

    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        out[i] = int.from_bytes(blake2b(t.encode("utf-8"), digest_size=8).digest(), "little")
    return out


def word_shingles(text: str, n: int = 3) -> List[str]:
    toks = text.lower().split()
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


# --- vectorized batch token hashing ----------------------------------------
#
# The round-2 minhash kernel called blake2b once per SHINGLE inside a
# per-doc loop — measured as the dominant CPU of the 11 s minhash_dedup
# stage.  The replacement hashes every token of a whole batch in ONE
# numpy pass: rolling-polynomial prefix hashes over the concatenated byte
# buffer (the classic Rabin-Karp substring-hash identity, made position-
# independent by multiplying with the inverse-power prefix; P is odd so it
# is invertible mod 2^64), finalized with splitmix64.  Shingle hashes are
# then a window-combine of consecutive token hashes — shingle STRINGS are
# never built.  Measured on this environment (1000 docs x 90 tokens,
# shingle_n=3, num_perm=64, min-of-5): per-doc loop+blake2b 0.171 s ->
# batched 0.077 s (2.2x; the full sf0.1 documents table of 5000 docs
# hashes in 0.23 s).  The batched win is bounded because this numpy
# build's big-array passes run at modest bandwidth (same reason the
# simhash64 note below keeps ITS per-doc loop) — profiling the full
# minhash_dedup query showed the stage wall is actually dominated by the
# fixed per-operator cost of the candidate shuffle + verify plan, which
# round 3 cut separately (see verify_jaccard).  Bucket outputs differ
# from the blake2b kernel (different hash family) but the verified-pair
# OUTPUT of the dedup pipeline is unchanged on the golden corpus (the
# exact-Jaccard verify stage is hash-independent).

_POLY_P = np.uint64(0x100000001B3)  # FNV-1a 64 prime, odd
_POLY_PINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))
_LEN_SALT = np.uint64(0xD6E8FEB86659FD93)


def hash_token_array(tokens: List[bytes]) -> np.ndarray:
    """Vectorized stable 64-bit hashes of many byte-strings in one numpy
    pass (no per-token Python hashing).  Position-independent: equal tokens
    hash equal wherever they sit in the batch."""
    m = len(tokens)
    if m == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter((len(t) for t in tokens), count=m, dtype=np.int64)
    buf = b"".join(tokens)
    c = np.frombuffer(buf, dtype=np.uint8).astype(np.uint64) + np.uint64(1)
    n = c.size
    with np.errstate(over="ignore"):
        pinv_pows = np.cumprod(np.full(n, _POLY_PINV, dtype=np.uint64))  # PINV^1..PINV^n
        pinv_pows = np.concatenate([np.ones(1, dtype=np.uint64), pinv_pows[:-1]])  # PINV^0..
        p_pows = np.cumprod(np.full(n, _POLY_P, dtype=np.uint64))  # P^1..P^n
        p_pows = np.concatenate([np.ones(1, dtype=np.uint64), p_pows])  # P^0..P^n
        # S[k] = sum_{t<k} c[t] * PINV^t  (mod 2^64)
        S = np.concatenate([np.zeros(1, dtype=np.uint64), np.cumsum(c * pinv_pows, dtype=np.uint64)])
        ends = np.cumsum(lens)
        starts = ends - lens
        # token [s, e): (S[e]-S[s]) * P^(e-1) = sum c[t] * P^(e-1-t) — the
        # same value the token would get hashed alone
        raw = (S[ends] - S[starts]) * p_pows[ends - 1]
        return splitmix64(raw ^ splitmix64(lens.astype(np.uint64) * _LEN_SALT))


def _grouped_arange(counts: np.ndarray) -> np.ndarray:
    """[3, 0, 2] -> [0, 1, 2, 0, 1] (intra-group position index)."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(counts)
    starts = ends - counts
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def minhash_buckets(texts: List, num_perm: int = 64, num_bands: int = 16,
                    shingle_n: int = 3) -> np.ndarray:
    """Whole-batch minhash: texts -> (len(texts), num_bands) int64 LSH
    bucket matrix, fully vectorized (see the kernel note above).

    Per doc: word shingles of ``shingle_n`` tokens (short docs collapse to
    one all-token shingle, empty docs to the empty signature — same
    semantics as ``word_shingles``), ``num_perm`` permuted min-hashes via
    the splitmix seed mix, bands folded to one bucket each."""
    assert num_perm % num_bands == 0
    rows_per_band = num_perm // num_bands
    tok_lists = [(t or "").lower().split() for t in texts]
    D = len(tok_lists)
    n_toks = np.fromiter((len(t) for t in tok_lists), count=D, dtype=np.int64)
    th = hash_token_array([w.encode("utf-8") for toks in tok_lists for w in toks])
    tok_start = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(n_toks)])

    full_cnt = np.maximum(n_toks - shingle_n + 1, 0)
    short = (n_toks > 0) & (n_toks < shingle_n)
    sh_cnt = np.where(short, 1, full_cnt)
    sh_start = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(sh_cnt)])
    total_sh = int(sh_cnt.sum())
    SH = np.empty(total_sh, dtype=np.uint64)

    # full windows: combine shingle_n consecutive token hashes, vectorized
    # across every window of every doc at once
    fmask = ~short & (full_cnt > 0)
    fcnt = np.where(fmask, full_cnt, 0)
    idx0 = np.repeat(tok_start[:-1], fcnt) + _grouped_arange(fcnt)
    acc = th[idx0]
    for j in range(1, shingle_n):
        acc = splitmix64(acc) ^ th[idx0 + j]
    SH[np.repeat(sh_start[:-1], fcnt) + _grouped_arange(fcnt)] = acc

    # short docs (0 < tokens < shingle_n): one shingle over all tokens
    for d in np.nonzero(short)[0]:
        a = th[tok_start[d]]
        for j in range(1, int(n_toks[d])):
            a = splitmix64(a) ^ th[tok_start[d] + j]
        SH[sh_start[d]] = a

    # signatures: (num_perm, total_sh) permutation mix, segment-min per doc.
    # Multiply-add permutations (a_k odd) instead of a full splitmix per
    # (perm, shingle) cell: the mix is the kernel's largest array and the
    # cheap universal-hash family costs 1 mul + 1 add per cell vs 6 ops —
    # standard minhash practice, same LSH collision behavior.
    sig = np.full((D, num_perm), MASK64, dtype=np.uint64)
    nonempty = sh_cnt > 0
    if nonempty.any():
        ks = np.arange(1, num_perm + 1, dtype=np.uint64)
        a = splitmix64(ks) | np.uint64(1)
        b = splitmix64(ks ^ _LEN_SALT)
        mixed = a[:, None] * SH[None, :] + b[:, None]
        sig[nonempty] = np.minimum.reduceat(mixed, sh_start[:-1][nonempty], axis=1).T

    bands = sig.reshape(D, num_bands, rows_per_band)
    buckets = bands[:, :, 0]
    for r in range(1, rows_per_band):
        buckets = splitmix64(buckets ^ bands[:, :, r])
    return buckets.astype(np.int64)


# --- MinHash ---------------------------------------------------------------


def minhash_signature(shingle_hashes: np.ndarray, num_perm: int = 64) -> np.ndarray:
    """k permutations via (a*x+b) mixes of the base hashes -> (k,) uint64."""
    if len(shingle_hashes) == 0:
        return np.full(num_perm, MASK64, dtype=np.uint64)
    seeds = splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64))
    # broadcast mix: h_perm[k, s] = splitmix64(hash_s ^ seed_k)
    mixed = splitmix64(shingle_hashes[None, :] ^ seeds[:, None])
    return mixed.min(axis=1)


class MinHashStage:
    """map_batches actor stage: text column -> (doc_id, band, bucket) rows,
    ``num_bands`` rows per doc.  Banding: b bands of r rows, bucket = mix of
    the band's slice."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 num_perm: int = 64, num_bands: int = 16, shingle_n: int = 3):
        assert num_perm % num_bands == 0
        self.id_col, self.text_col = id_col, text_col
        self.num_perm, self.num_bands = num_perm, num_bands
        self.rows_per_band = num_perm // num_bands
        self.shingle_n = shingle_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        # whole-batch vectorized kernel (see minhash_buckets note): one
        # numpy pass hashes every token, no per-doc/per-shingle Python
        buckets = minhash_buckets(texts, self.num_perm, self.num_bands, self.shingle_n)
        n = len(texts)
        ids = batch[self.id_col]
        idx = np.repeat(np.arange(n, dtype=np.int64), self.num_bands)
        return pa.table(
            {
                self.id_col: ids.take(pa.array(idx)),
                "band": pa.array(np.tile(np.arange(self.num_bands, dtype=np.int32), n)),
                "bucket": pa.array(buckets.ravel()),
            }
        )


def default_lsh_partitions() -> int:
    """Reduce-side partition count for LSH candidate generation, scaled to
    the cluster (1 per CPU, floor 16).  At the 100 TB design point callers
    override this with ~``total_rows * num_bands / rows_per_partition`` so
    each reducer's input stays bounded regardless of corpus size."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(16, cpus)


def minhash_candidate_pairs(docs, id_col="doc_id", text_col="text",
                            num_perm=64, num_bands=16, shingle_n=3,
                            num_partitions=None):
    """docs Dataset -> candidate near-dup pairs (id_a < id_b), deduplicated.

    The shuffle moves only ~num_bands small (id, band, bucket) rows per doc,
    partitioned by ``hash(band, bucket) % num_partitions`` — every reducer
    receives ~``N * num_bands / num_partitions`` rows (all rows of one
    (band, bucket) land together, so the within-bucket self-merge is exact),
    never the one-row-per-corpus-element fan-in of a plain groupby(band)."""
    num_partitions = num_partitions or default_lsh_partitions()
    exploded = docs.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col,
                               "num_perm": num_perm, "num_bands": num_bands,
                               "shingle_n": shingle_n},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def add_pkey(t: pa.Table) -> pa.Table:
        band = t["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = t["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pk = splitmix64((band << np.uint64(48)) ^ bucket) % np.uint64(num_partitions)
        return t.append_column("pkey", pa.array(pk.astype(np.int64)))

    def pairs_in_part(g: pd.DataFrame) -> pd.DataFrame:
        """One vectorized pass per partition of many (band, bucket) groups:
        self-merge on (band, bucket) yields all within-bucket pairs."""
        id_dtype = g[id_col].dtype  # keep empty outputs schema-stable
        g = g[[id_col, "band", "bucket"]].drop_duplicates()
        # only buckets with >= 2 docs can produce pairs
        g = g[g.duplicated(["band", "bucket"], keep=False)]
        if len(g) == 0:
            return pd.DataFrame({"id_a": pd.Series([], dtype=id_dtype),
                                 "id_b": pd.Series([], dtype=id_dtype)})
        m = g.merge(g, on=["band", "bucket"], suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        return m.rename(columns={f"{id_col}_a": "id_a", f"{id_col}_b": "id_b"})[["id_a", "id_b"]]

    cand = exploded.map_batches(add_pkey, batch_format="pyarrow").repartition(
        min(num_partitions, 64)
    ).groupby("pkey").map_groups(pairs_in_part, batch_format="pandas")
    # dedup pairs surfaced by multiple bands: vectorized grouped count, keys only
    from ray.data.aggregate import Count

    return cand.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="_n")).drop_columns(["_n"])


_SHINGLE_SEP = "\x1f"


def verify_jaccard(pairs, docs, id_col="doc_id", text_col="text",
                   shingle_n=3, threshold=0.7, num_partitions=None,
                   broadcast_limit=2_000_000):
    """Exact-Jaccard verification of candidate pairs — scale-safe.

    Only the texts whose ids appear in the candidate-pair set are gathered:
    the candidate ID SET (O(pairs), small by LSH construction) is broadcast
    once and the corpus streams through a vectorized ``is_in`` filter.  The
    surviving (id, packed-shingles) rows are the same size class as the
    pair table we already hold on the driver, so for up to
    ``broadcast_limit`` candidate ids they are broadcast as ONE id->shingles
    dict and the verify is a single embarrassingly-parallel ``map_batches``
    over the pairs dataset — no joins (round-2 ran two partitioned
    Dataset.joins here, whose aggregator-actor startup dominated the stage
    at small scale: measured 4.7 s -> 1.3 s).  Past the limit the two
    partitioned hash joins (pairs⋈docs on id_a, then id_b) take over, so
    nothing driver-held ever exceeds the O(pairs) edge list + candidate
    shingle set.  The full corpus is never materialized anywhere (contrast
    round 1, which built a whole-corpus text dict on the driver)."""
    import ray

    num_partitions = num_partitions or max(8, default_lsh_partitions() // 4)
    import ray.data as rd

    # The candidate-pair table is O(duplicate pairs) — small by LSH
    # construction — so collect it once: it provides the broadcast id set
    # AND a clean single-block arrow dataset (map_groups output carries
    # empty schema-less blocks that pyarrow's join rejects).
    idtbl = pairs.to_pandas()
    if len(idtbl) == 0 or "id_a" not in idtbl.columns or "id_b" not in idtbl.columns:
        # zero candidate pairs (clean corpus): map_groups' empty output
        # loses its schema, so to_pandas() yields a columnless frame —
        # return an empty TYPED result instead of KeyError'ing downstream.
        try:
            sch = docs.schema()
            id_type = dict(zip(sch.names, sch.types))[id_col]
        except Exception:
            id_type = pa.string()
        empty = pa.table({"id_a": pa.array([], id_type),
                          "id_b": pa.array([], id_type),
                          "jaccard": pa.array([], pa.float64())})
        return rd.from_arrow(empty)
    idtbl = idtbl[["id_a", "id_b"]]
    cand_ids = sorted(set(idtbl["id_a"]) | set(idtbl["id_b"]))
    ids_ref = ray.put(cand_ids)
    pairs = rd.from_arrow(pa.Table.from_pandas(idtbl[["id_a", "id_b"]], preserve_index=False))

    # task-based (not actor-pool) corpus scan: the broadcast id set is a
    # plasma ref fetched zero-copy per task, and a task pool avoids the
    # ~2 s actor-pool startup that dominated this stage at small scale
    def _pack(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        id_set = pa.array(ray.get(ids_ref))
        t = t.filter(pc.is_in(t[id_col], value_set=id_set))
        packed = [
            _SHINGLE_SEP.join(sorted(set(word_shingles(x or "", shingle_n))))
            for x in t[text_col].to_pylist()
        ]
        return pa.table({id_col: t[id_col], "shingles": pa.array(packed, pa.string())})

    docs_f = docs.map_batches(_pack, batch_format="pyarrow").materialize()  # candidate texts only

    from ..functions.rounding import round_half_away

    def _jac_sets(sa_list, sb_list):
        sims = np.empty(len(sa_list), dtype=np.float64)
        for i, (a, b) in enumerate(zip(sa_list, sb_list)):
            sa = set(a.split(_SHINGLE_SEP)) if a else set()
            sb = set(b.split(_SHINGLE_SEP)) if b else set()
            denom = len(sa | sb)
            sims[i] = len(sa & sb) / denom if denom else 0.0
        return sims

    if len(cand_ids) <= broadcast_limit:
        sh_df = docs_f.to_pandas()
        if len(sh_df) == 0:
            sh_ref = ray.put({})
        else:
            sh_ref = ray.put(dict(zip(sh_df[id_col], sh_df["shingles"])))

        def _jac_broadcast(t: pa.Table) -> pa.Table:
            sh = ray.get(sh_ref)  # plasma-local per task
            sa = [sh.get(i, "") for i in t["id_a"].to_pylist()]
            sb = [sh.get(i, "") for i in t["id_b"].to_pylist()]
            sims = _jac_sets(sa, sb)
            out = pa.table({"id_a": t["id_a"], "id_b": t["id_b"],
                            "jaccard": pa.array(round_half_away(sims, 4))})
            return out.filter(pa.array(sims >= threshold))

        return pairs.map_batches(_jac_broadcast, batch_format="pyarrow")

    left = docs_f.map_batches(
        lambda t: pa.table({"id_a": t[id_col], "sh_a": t["shingles"]}),
        batch_format="pyarrow",
    )
    right = docs_f.map_batches(
        lambda t: pa.table({"id_b": t[id_col], "sh_b": t["shingles"]}),
        batch_format="pyarrow",
    )
    j = pairs.join(left, join_type="inner", num_partitions=num_partitions, on=("id_a",))
    j = j.join(right, join_type="inner", num_partitions=num_partitions, on=("id_b",))

    def jac(t: pa.Table) -> pa.Table:
        sims = _jac_sets(t["sh_a"].to_pylist(), t["sh_b"].to_pylist())
        out = pa.table(
            {
                "id_a": t["id_a"],
                "id_b": t["id_b"],
                "jaccard": pa.array(round_half_away(sims, 4)),
            }
        )
        return out.filter(pa.array(sims >= threshold))

    return j.map_batches(jac, batch_format="pyarrow")


# --- SimHash ---------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (sign of per-bit weight sums).

    The per-doc loop is deliberate: a fully batched variant (one
    (total_tokens, 64) bit matrix + cumsum-gather segment sums) was built
    and measured bit-identical but 5-10x SLOWER on this environment — the
    numpy build's integer cumsum and strided transpose copies run at
    ~25 MB/s, so the small per-doc matrices (token_count x 64, cache
    resident) win.  Cost is O(tokens) per doc and bounded; the stage stays
    embarrassingly parallel across batches."""
    toks = (text or "").lower().split()
    if not toks:
        return 0
    h = hash_tokens(toks)  # (n,) uint64
    bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    ones = bits.sum(axis=0, dtype=np.int64)
    pos = (2 * ones) > len(toks)  # vote sum = 2*ones - n > 0
    val = int(np.packbits(pos.astype(np.uint8), bitorder="little").view(np.uint64)[0])
    return val - (1 << 64) if val >= (1 << 63) else val


def simhash64_batch(texts) -> np.ndarray:
    """SimHash for a batch of texts -> int64 array."""
    return np.array([simhash64(t) for t in texts], dtype=np.int64)


class SimHashStage:
    def __init__(self, id_col="doc_id", text_col="text"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = simhash64_batch(batch[self.text_col].to_pylist())
        return pa.table({self.id_col: batch[self.id_col], "simhash": pa.array(vals, pa.int64())})


# --- embedding near-dup ----------------------------------------------------


class EmbeddingLSHStage:
    """map_batches stage: embedding column -> (id, table, bucket) rows,
    ``n_tables`` small rows per vector (the vector itself does NOT enter the
    shuffle).  Each table hashes the unit vector to the sign pattern of
    ``n_planes`` deterministic random hyperplanes (seeded -> identical on
    every worker)."""

    def __init__(self, id_col="vec_id", vec_col="embedding",
                 n_planes=8, n_tables=16):
        self.id_col, self.vec_col = id_col, vec_col
        self.n_planes, self.n_tables = n_planes, n_tables
        self._planes = None  # (n_tables, d, n_planes), built on first batch

    def _get_planes(self, d: int) -> np.ndarray:
        if self._planes is None or self._planes.shape[1] != d:
            rng = np.random.default_rng(1234)
            self._planes = rng.standard_normal((self.n_tables, d, self.n_planes))
        return self._planes

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({self.id_col: t[self.id_col],
                             "table": pa.array([], pa.int32()),
                             "bucket": pa.array([], pa.int64())})
        vecs = np.stack(t[self.vec_col].to_pylist()).astype(np.float64)
        unit = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        planes = self._get_planes(vecs.shape[1])
        ids = t[self.id_col].combine_chunks() if isinstance(t[self.id_col], pa.ChunkedArray) else t[self.id_col]
        out_id, out_tbl, out_bkt = [], [], []
        pow2 = (np.int64(1) << np.arange(self.n_planes, dtype=np.int64))[::-1]
        for ti in range(self.n_tables):
            signs = (unit @ planes[ti]) > 0  # (n, n_planes)
            bucket = signs.astype(np.int64) @ pow2
            out_id.append(ids)
            out_tbl.append(pa.array(np.full(n, ti, dtype=np.int32)))
            out_bkt.append(pa.array(bucket))
        return pa.table(
            {
                self.id_col: pa.concat_arrays([c for c in out_id]),
                "table": pa.concat_arrays(out_tbl),
                "bucket": pa.concat_arrays(out_bkt),
            }
        )


def embedding_neardup_pairs(embeddings, id_col="vec_id", vec_col="embedding",
                            threshold=0.95, n_planes=8, n_tables=16,
                            num_partitions=None):
    """Near-duplicate pairs by cosine >= threshold, with a RECALL GUARANTEE
    from banded multi-table random projection (fixes round 1's single-bucket
    recall hole).

    A pair at angle th agrees with one hyperplane with prob ``1 - th/pi``,
    matches one table's full sign pattern with prob ``q = (1 - th/pi)^p``,
    and is MISSED by all ``T`` independent tables with prob ``(1 - q)^T``.
    At cosine 0.95 (th ~ 18.2 deg, th/pi ~ 0.101) and the default p=8, T=16:
    q ~ 0.426, miss ~ 0.574^16 ~ 1.4e-4 -> recall > 99.98%, improving
    rapidly above the threshold (round 1's single table missed ~57% there).

    Mechanics mirror minhash_candidate_pairs: T small (id, table, bucket)
    rows per vector shuffle partitioned by ``hash(table, bucket) %
    num_partitions`` (bounded reducer fan-in), candidate pairs self-merge
    within (table, bucket), and the exact-cosine verify joins the unit
    vectors of CANDIDATE ids only (packed as fixed-width binary; the corpus
    streams through an is_in filter — nothing driver-held)."""
    import ray
    import ray.data as rd

    num_partitions = num_partitions or default_lsh_partitions()
    exploded = embeddings.map_batches(
        EmbeddingLSHStage,
        fn_constructor_kwargs={"id_col": id_col, "vec_col": vec_col,
                               "n_planes": n_planes, "n_tables": n_tables},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def add_pkey(t: pa.Table) -> pa.Table:
        tbl = t["table"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bkt = t["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pk = splitmix64((tbl << np.uint64(48)) ^ bkt) % np.uint64(num_partitions)
        return t.append_column("pkey", pa.array(pk.astype(np.int64)))

    def pairs_in_part(g: pd.DataFrame) -> pd.DataFrame:
        id_dtype = g[id_col].dtype
        g = g[[id_col, "table", "bucket"]].drop_duplicates()
        g = g[g.duplicated(["table", "bucket"], keep=False)]
        if len(g) == 0:
            return pd.DataFrame({"id_a": pd.Series([], dtype=id_dtype),
                                 "id_b": pd.Series([], dtype=id_dtype)})
        m = g.merge(g, on=["table", "bucket"], suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        return m.rename(columns={f"{id_col}_a": "id_a", f"{id_col}_b": "id_b"})[["id_a", "id_b"]]

    cand = (
        exploded.map_batches(add_pkey, batch_format="pyarrow")
        .repartition(min(num_partitions, 64))
        .groupby("pkey")
        .map_groups(pairs_in_part, batch_format="pandas")
    )
    from ray.data.aggregate import Count

    cand = cand.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="_n")).drop_columns(["_n"])

    # --- exact-cosine verify over candidate ids only ------------------------
    idtbl = cand.select_columns(["id_a", "id_b"]).to_pandas()  # O(pairs)
    if len(idtbl) == 0:
        return rd.from_arrow(pa.table({"id_a": pa.array([], pa.int64()),
                                       "id_b": pa.array([], pa.int64()),
                                       "cosine": pa.array([], pa.float64())}))
    cand_ids = sorted(set(idtbl["id_a"]) | set(idtbl["id_b"]))
    ids_ref = ray.put(cand_ids)
    pairs = rd.from_arrow(pa.Table.from_pandas(idtbl[["id_a", "id_b"]], preserve_index=False))

    class PackUnit:
        def __init__(self):
            self.id_set = pa.array(ray.get(ids_ref))

        def __call__(self, t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = t.filter(pc.is_in(t[id_col], value_set=self.id_set))
            if t.num_rows == 0:
                return pa.table({id_col: t[id_col], "unit": pa.array([], pa.binary())})
            vecs = np.stack(t[vec_col].to_pylist()).astype(np.float64)
            unit = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
            return pa.table({id_col: t[id_col],
                             "unit": pa.array([r.tobytes() for r in unit], pa.binary())})

    units = embeddings.map_batches(PackUnit, batch_format="pyarrow",
                                   concurrency=(1, 8)).materialize()
    left = units.map_batches(
        lambda t: pa.table({"id_a": t[id_col], "u_a": t["unit"]}), batch_format="pyarrow")
    right = units.map_batches(
        lambda t: pa.table({"id_b": t[id_col], "u_b": t["unit"]}), batch_format="pyarrow")
    np_join = max(8, num_partitions // 4)
    j = pairs.join(left, join_type="inner", num_partitions=np_join, on=("id_a",))
    j = j.join(right, join_type="inner", num_partitions=np_join, on=("id_b",))

    def cosine(t: pa.Table) -> pa.Table:
        ua = np.stack([np.frombuffer(b, dtype=np.float64) for b in t["u_a"].to_pylist()]) \
            if t.num_rows else np.zeros((0, 1))
        ub = np.stack([np.frombuffer(b, dtype=np.float64) for b in t["u_b"].to_pylist()]) \
            if t.num_rows else np.zeros((0, 1))
        sims = (ua * ub).sum(axis=1) if t.num_rows else np.zeros(0)
        out = pa.table({"id_a": t["id_a"], "id_b": t["id_b"],
                        "cosine": pa.array(np.round(sims, 4))})
        return out.filter(pa.array(sims >= threshold))

    return j.map_batches(cosine, batch_format="pyarrow")


# --- image near-dedup via perceptual-hash Hamming bands ---------------------


def phash_neardup_pairs(images, id_col: str = "image_id", phash_col: str = "phash",
                        max_hamming: int = 8, n_bands: int = 4,
                        num_partitions=None):
    """Near-duplicate IMAGE pairs by perceptual hash (SURVEY.md O5: "phash
    Hamming bucket + verify").

    Band trick: split the 64-bit hash into ``n_bands`` 16-bit bands; two
    hashes within Hamming distance < n_bands must agree exactly on at least
    one band (pigeonhole), so banding finds ALL pairs with distance <
    n_bands and, probabilistically, most pairs up to ``max_hamming``.  One
    shuffle of 4 small rows per image partitioned by ``hash(band, value) %
    num_partitions`` (all rows of one (band, value) bucket land together, so
    the self-merge is exact, and each reducer receives ~n_bands*N/P rows —
    never the O(N) fan-in of a plain groupby(band)); exact Hamming verify on
    candidates only.
    """
    import pyarrow as pa

    band_bits = 64 // n_bands
    mask = np.uint64((1 << band_bits) - 1)

    def explode(t: pa.Table) -> pa.Table:
        h = t[phash_col].to_numpy(zero_copy_only=False).astype(np.int64).astype(np.uint64)
        n = len(h)
        ids = t[id_col]
        out_id, out_band, out_val, out_hash = [], [], [], []
        for b in range(n_bands):
            vals = ((h >> np.uint64(b * band_bits)) & mask).astype(np.int64)
            out_id.append(ids)
            out_band.append(pa.array(np.full(n, b, dtype=np.int32)))
            out_val.append(pa.array(vals))
            out_hash.append(t[phash_col])
        return pa.table(
            {
                id_col: pa.concat_arrays([pa.array(c.to_pylist()) for c in out_id])
                if isinstance(ids, pa.ChunkedArray)
                else pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in out_id]),
                "band": pa.concat_arrays(out_band),
                "band_val": pa.concat_arrays(out_val),
                phash_col: pa.concat_arrays(
                    [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in out_hash]
                ),
            }
        )

    num_partitions = num_partitions or default_lsh_partitions()

    def add_pkey(t: pa.Table) -> pa.Table:
        band = t["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        val = t["band_val"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pk = splitmix64((band << np.uint64(48)) ^ val) % np.uint64(num_partitions)
        return t.append_column("pkey", pa.array(pk.astype(np.int64)))

    exploded = images.map_batches(explode, batch_format="pyarrow").map_batches(
        add_pkey, batch_format="pyarrow"
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # dedup on (id, band, val, HASH): the same image id can legitimately
        # recur with a different phash (hot tiles re-observed on colliding
        # dates in the synthetic corpus, re-ingests in production) — keying
        # the dedup without the hash dropped the second occurrence and lost
        # its links (measured: 105 of 39 367 true pairs missed at sf0.1)
        g = g[[id_col, "band", "band_val", phash_col]].drop_duplicates(
            subset=[id_col, "band", "band_val", phash_col])
        g = g[g.duplicated(["band", "band_val"], keep=False)]
        if len(g) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        m = g.merge(g, on=["band", "band_val"], suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if len(m) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        from ..codec.phash import hamming64

        d = hamming64(m[f"{phash_col}_a"].to_numpy(), m[f"{phash_col}_b"].to_numpy())
        m = m.assign(hamming=d)
        m = m[m["hamming"] <= max_hamming]
        if len(m) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        # CANONICAL-BAND dedup, shuffle-free: a surviving pair surfaces in
        # every band where its hashes agree; both full hashes are in this
        # partition, so the reducer computes the smallest agreeing band and
        # emits the pair only when it IS that band.  This replaced a global
        # groupby((id_a, id_b)).aggregate(Min) whose string-pair hash
        # aggregation dominated the whole query (156 s of remote time for
        # 39k pairs at sf0.1 — measured; now zero).
        xor = (m[f"{phash_col}_a"].to_numpy().astype(np.int64).astype(np.uint64)
               ^ m[f"{phash_col}_b"].to_numpy().astype(np.int64).astype(np.uint64))
        first_band = np.full(len(m), n_bands, dtype=np.int64)
        for b in range(n_bands - 1, -1, -1):
            agree = ((xor >> np.uint64(b * band_bits)) & mask) == 0
            first_band[agree] = b
        m = m[m["band"].to_numpy() == first_band]
        m = m.rename(columns={f"{id_col}_a": "id_a", f"{id_col}_b": "id_b"})[
            ["id_a", "id_b", "hamming"]]
        # ids can still pair through SEVERAL occurrence-hash combinations
        # (duplicate ids again) — local pre-dedup keeps the per-partition
        # output minimal before the tiny cross-partition pass below
        m = m.sort_values("hamming", kind="stable").drop_duplicates(["id_a", "id_b"])
        return m

    cand = exploded.repartition(min(num_partitions, 64)).groupby("pkey").map_groups(
        pairs, batch_format="pandas"
    )

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        key = pd.util.hash_pandas_object(
            pd.Series(t["id_a"].to_pylist()) + "\x1f" + pd.Series(t["id_b"].to_pylist()),
            index=False).to_numpy()  # fixed-key siphash: process-independent
        return t.append_column("pbucket", pa.array((key % np.uint64(64)).astype(np.int64)))

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("hamming", kind="stable").drop_duplicates(["id_a", "id_b"])
        return g[["id_a", "id_b", "hamming"]]

    # cross-partition id-pair dedup over an INT bucket key: the previous
    # groupby((id_a, id_b)).aggregate(Min) on string-pair keys cost 156 s of
    # remote time for 39k pairs (measured, sf0.1); this int-keyed bucket
    # shuffle of the already-small pair set costs ~1 s
    return cand.map_batches(add_pair_bucket, batch_format="pyarrow").groupby(
        "pbucket").map_groups(dedup_bucket, batch_format="pandas")


# --- near-duplicate clusters: connected components + keep-first -------------


def union_find_min_labels(edges) -> dict:
    """Union-find over an edge list -> {node: min id in its component}.

    Driver-side by design: the edge list is O(duplicate pairs), small by
    LSH/verify construction — the standard shape for industrial dedup
    pipelines (the corpus itself never leaves the cluster; only the tiny
    edge list is gathered).  For an edge list too big for one machine,
    swap in iterative label propagation (join label<-min(neighbor label)
    until fixpoint) over the same inputs."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    seen = set()
    for a, b in edges:
        seen.add(a)
        seen.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN id so the root IS the keep id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in seen}


def neardup_cluster_labels(docs, pairs, id_col: str = "doc_id",
                           pair_cols=("id_a", "id_b"),
                           driver_edge_limit: int = 5_000_000):
    """(docs, verified near-dup pairs) -> (id, keep_id) Dataset covering the
    WHOLE corpus: keep_id = min id of the node's near-dup component (itself
    when unpaired).  The reduction of near-dedup to a usable training-data
    filter: keep rows where id == keep_id, drop the rest.

    AUTO-ROUTED by edge count (round-2 review: the scale path existed but
    nothing switched to it):

    - <= ``driver_edge_limit`` edges: collect the O(duplicates) edge list,
      driver union-find, labels broadcast once, corpus streams through a
      vectorized lookup.
    - beyond it: ``connected_components_distributed`` (min-label + pointer-
      halving over partitioned joins, O(log diameter) rounds) and the corpus
      is labeled by a partitioned left-outer join — nothing driver-held.

    Both paths produce identical labels (equality-tested)."""
    import ray

    pairs = pairs.materialize()  # counted, then consumed by either path
    n_edges = pairs.count()

    if n_edges == 0:
        return docs.map_batches(
            lambda t: pa.table({id_col: t[id_col], "keep_id": t[id_col]}),
            batch_format="pyarrow",
        )

    if n_edges <= driver_edge_limit:
        pdf = pairs.select_columns(list(pair_cols)).to_pandas()
        labels = union_find_min_labels(zip(pdf[pair_cols[0]], pdf[pair_cols[1]]))
        ref = ray.put(labels)

        class Label:
            def __init__(self):
                self.labels = ray.get(ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                ids = t[id_col].to_pylist()
                keep = [self.labels.get(i, i) for i in ids]
                return pa.table({id_col: t[id_col],
                                 "keep_id": pa.array(keep, t[id_col].type)})

        return docs.map_batches(Label, batch_format="pyarrow", concurrency=(1, 4))

    import pyarrow.compute as _pc

    edges = pairs.map_batches(
        lambda t: pa.table({"id_a": t[pair_cols[0]], "id_b": t[pair_cols[1]]}),
        batch_format="pyarrow",
    )
    lbls = connected_components_distributed(edges)
    ids_only = docs.map_batches(
        lambda t: pa.table({id_col: t[id_col]}), batch_format="pyarrow"
    )
    j = ids_only.join(lbls, join_type="left_outer",
                      num_partitions=max(4, default_lsh_partitions() // 4),
                      on=(id_col,), right_on=("node",))
    return j.map_batches(
        lambda t: pa.table({id_col: t[id_col],
                            "keep_id": _pc.coalesce(t["lbl"], t[id_col])}),
        batch_format="pyarrow",
    )


def _compact_nonempty(ds, fallback_schema: "pa.Schema" = None):
    """Drop schema-LESS empty blocks from a small materialized dataset.

    Ray's aggregate/map_groups emit 0-row blocks with EMPTY schemas when a
    hash partition receives no rows; pyarrow's hash join then fails with
    "No match for key field on right side".  This rebuilds the dataset from
    the surviving block REFS (no data moves through the driver — refs
    only).  When every block is empty, returns an empty dataset with
    ``fallback_schema`` so downstream joins still see the key columns."""
    import ray
    import ray.data as rd

    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        empty = pa.table({f.name: pa.array([], f.type) for f in fallback_schema}) \
            if fallback_schema is not None else pa.table({})
        return rd.from_arrow(empty)
    return rd.from_arrow_refs(refs)


def connected_components_distributed(edges, node_ids=None, max_iters: int = 64,
                                     num_partitions=None):
    """Min-label propagation over Dataset joins — the SCALE path for edge
    lists beyond driver memory (union_find_min_labels is the small-edge-list
    fast path; both produce identical labels).

    ``edges``: Dataset with columns (id_a, id_b).  ``node_ids``: optional
    Dataset of (node,) rows to label (defaults to the nodes present in
    edges).  Returns a Dataset (node, lbl) with lbl = component minimum.

    Each round does neighbour propagation (min over adjacent labels, one
    partitioned join + groupby-min) PLUS pointer-halving (lbl <- lbl(lbl),
    a labels-with-labels self join), so convergence is O(log diameter)
    rounds, not O(diameter) — checked with a distributed changed-row count,
    max ``max_iters``.  All shuffles move (node, label) pairs only."""
    import pyarrow.compute as _pc
    import ray.data as rd
    from ray.data.aggregate import Min as _Min, Sum as _Sum

    if num_partitions is None:
        import ray as _ray

        try:
            cpus = int(_ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        # each hash join spawns one aggregator actor per partition; keep the
        # per-round actor count proportional to the session, floor 4
        num_partitions = max(4, cpus // 2)

    bi = edges.map_batches(
        lambda t: pa.table(
            {
                "u": pa.concat_arrays([
                    c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                    for c in (t["id_a"], t["id_b"])
                ]),
                "v": pa.concat_arrays([
                    c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                    for c in (t["id_b"], t["id_a"])
                ]),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    bi = _compact_nonempty(bi)  # pairs datasets can carry schema-less empty blocks

    if node_ids is None:
        node_ids = bi.map_batches(
            lambda t: pa.table({"node": t["u"]}), batch_format="pyarrow"
        ).groupby("node").aggregate(_Min("node", alias_name="_m")).drop_columns(["_m"])
    labels = _compact_nonempty(node_ids.map_batches(
        lambda t: pa.table({"node": t["node"], "lbl": t["node"]}), batch_format="pyarrow"
    ).materialize())

    for _ in range(max_iters):
        # 1. neighbour propagation: for every edge (u, v), v's current label
        cand = (
            bi.join(labels, join_type="inner", num_partitions=num_partitions,
                    on=("v",), right_on=("node",))
            .map_batches(lambda t: pa.table({"node": t["u"], "cand": t["lbl"]}),
                         batch_format="pyarrow")
            .groupby("node")
            .aggregate(_Min("cand", alias_name="cand"))
        )
        # 2. pointer-halving: the label of my label
        hop = labels.map_batches(
            lambda t: pa.table({"node2": t["lbl"], "orig": t["node"]}),
            batch_format="pyarrow",
        ).join(labels, join_type="inner", num_partitions=num_partitions,
               on=("node2",), right_on=("node",)).map_batches(
            lambda t: pa.table({"node": t["orig"], "cand": t["lbl"]}),
            batch_format="pyarrow",
        )
        both = _compact_nonempty(
            cand.union(hop).groupby("node")
            .aggregate(_Min("cand", alias_name="cand")).materialize(),
            fallback_schema=pa.schema([("node", labels.schema().base_schema.field("node").type),
                                       ("cand", labels.schema().base_schema.field("lbl").type)]),
        )
        joined = labels.join(both, join_type="left_outer",
                             num_partitions=num_partitions, on=("node",))

        def step(t: pa.Table) -> pa.Table:
            new = _pc.min_element_wise(t["lbl"], _pc.coalesce(t["cand"], t["lbl"]))
            changed = _pc.cast(_pc.less(new, t["lbl"]), pa.int64())
            return pa.table({"node": t["node"], "lbl": new, "_chg": changed})

        stepped = joined.map_batches(step, batch_format="pyarrow").materialize()
        n_changed = int(stepped.aggregate(_Sum("_chg", alias_name="n"))["n"] or 0)
        labels = _compact_nonempty(stepped.drop_columns(["_chg"]).materialize())
        if n_changed == 0:
            break
    return labels


# --- SemDedup: cluster-then-prune semantic dedup ----------------------------


def semdedup_labels(emb, k: int = 10, tau: float = 0.95, n_iters: int = 25,
                    id_col: str = "vec_id", vec_col: str = "embedding"):
    """SEMANTIC deduplication, SemDedup-style (Abbas et al. 2023, public
    method): k-means clusters the embedding space, then each cluster is
    pruned independently — exact pairwise cosine within the cluster,
    connected components over pairs >= ``tau``, keep the min-id member.

    Complement to the banded-LSH ``embedding_neardup_pairs``: LSH bounds
    recall analytically per pair; SemDedup bounds COST structurally — the
    O(n^2) matrix never forms, only O(sum c_i^2) with c_i the cluster
    sizes, so k is the scale knob (the published recipe uses k ~ n/1000 so
    clusters stay ~1000 rows; cross-cluster near-dups are the documented
    recall loss of the method).  One shuffle (groupby cluster); vectors
    cross it once.

    Returns a pandas frame (vec_id, cluster, keep_id, is_dup)."""
    import pandas as pd

    from .cluster import kmeans_fit

    import ray as _ray

    from .cluster import _nearest, quantize_vectors

    emb = emb.materialize()
    cents, _ = kmeans_fit(emb, k, n_iters, id_col, vec_col)
    cents_ref = _ray.put(cents)

    # assignment rides the SAME pass that carries the vector into the
    # cluster shuffle (Ray's hash join rejects list-typed payload columns,
    # and a join would move the vectors twice anyway)
    def assign_with_vec(t: pa.Table) -> pa.Table:
        c = _ray.get(cents_ref)
        a, _d = _nearest(quantize_vectors(t, vec_col), c)
        return pa.table({id_col: t[id_col], vec_col: t[vec_col],
                         "cluster": pa.array(a)})

    joined = emb.map_batches(assign_with_vec, batch_format="pyarrow")

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable").reset_index(drop=True)
        ids = g[id_col].to_numpy().astype(np.int64)
        V = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        n = len(ids)
        norms = np.sqrt((V * V).sum(axis=1))
        V = V / np.maximum(norms, 1e-12)[:, None]
        S = V @ V.T
        iu, ju = np.triu_indices(n, k=1)
        hit = S[iu, ju] >= tau
        parent = np.arange(n)

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for a, b in zip(iu[hit], ju[hit]):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        keep = ids[[find(i) for i in range(n)]]  # min id: ids ascend w/ index
        return pd.DataFrame({id_col: ids, "cluster": g["cluster"].to_numpy(),
                             "keep_id": keep,
                             "is_dup": (keep != ids).astype(np.int64)})

    out = joined.groupby("cluster").map_groups(prune, batch_format="pandas")
    pdf = out.to_pandas().sort_values(id_col).reset_index(drop=True)
    for c in (id_col, "cluster", "keep_id", "is_dup"):
        pdf[c] = pdf[c].astype("int64")
    return pdf
