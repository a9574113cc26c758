"""Text / dedup / similarity queries over the driver's ``documents`` and
``embeddings`` tables, with DuckDB oracle SQL where expressible.

SQL-semantic alignment notes:
- token counts: python ``str.split()`` == SQL regexp split of trimmed text
  with the empty-string guard
- ratios: int/int double division — bit-identical across engines
- jaccard: DISTINCT word sets, round(…, 4) on both sides
- minhash/simhash/fingerprint/ANN: hash permutations, bit sketches and
  float matmuls — genuinely non-SQL-expressible, rows-only checks
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..stages.ann import brute_force_topk
from ..stages.dedup import (
    SimHashStage,
    embedding_neardup_pairs,
    minhash_candidate_pairs,
    verify_jaccard,
)
from ..stages.text import (
    LangIdStage,
    fingerprint_batch,
    quality_score_batch,
    token_count_batch,
)


def _docs(sf_dir: str, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _emb(sf_dir: str, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=columns)


# --- oracle-checked ---------------------------------------------------------


def q_token_count(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(token_count_batch, batch_format="pyarrow")


SQL_TOKEN_COUNT = (
    "SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 ELSE "
    "length(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens FROM documents"
)


def q_quality_score(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(quality_score_batch, batch_format="pyarrow")


SQL_QUALITY_SCORE = (
    "SELECT doc_id, length(text) AS n_chars, "
    "CASE WHEN trim(text) = '' THEN 0 ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens, "
    "length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct_count, "
    "ROUND((CASE WHEN trim(text) = '' THEN 0 ELSE length(regexp_split_to_array(trim(text), '\\s+')) END) "
    "/ (1.0 + length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))), 4) AS quality "
    "FROM documents"
)


def q_dedup_exact_text(sf_dir: str):
    """Exact text dedup: keep min doc_id per distinct text (hash-partitioned
    groupby, no global seen-set)."""
    import zlib as _z

    import numpy as np

    ds = _docs(sf_dir, ["doc_id", "text"])

    def add_bucket(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        b = np.fromiter(
            ((_z.crc32((s or "").encode()) % 64) for s in texts), dtype=np.int64, count=len(texts)
        )
        return t.append_column("bucket", pa.array(b))

    def first_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # hash-partitioned on content, one vectorized pass per bucket
        g = g.sort_values(["text", "doc_id"], kind="stable")
        agg = g.groupby("text", sort=False).agg(
            keep_id=("doc_id", "first"), n_copies=("doc_id", "size")
        )
        return agg.reset_index()[["keep_id", "n_copies", "text"]]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(first_in_bucket, batch_format="pandas")
    )


SQL_DEDUP_EXACT = (
    "SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies, text FROM documents GROUP BY text"
)


def q_ngram_jaccard_pairs(sf_dir: str):
    """Exact distinct-word Jaccard for consecutive doc pairs (doc_id, doc_id+1)
    — the verification kernel of near-dedup, on an oracle-computable pair set."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def words(t: pa.Table) -> pa.Table:
        # distinct words packed into one space-joined string (Ray's hash join
        # rejects list-typed non-key fields; strings pass through fine)
        s = (
            t["text"].to_pandas().fillna("").str.lower().str.split()
            .map(lambda w: " ".join(sorted(set(w))))
        )
        return pa.table({"doc_id": t["doc_id"], "words": pa.array(s.tolist(), pa.string())})

    w = ds.map_batches(words, batch_format="pyarrow")
    left = w.map_batches(
        lambda t: pa.table({"pair_key": pa.compute.add(t["doc_id"], 1), "doc_a": t["doc_id"], "words_a": t["words"]}),
        batch_format="pyarrow",
    )
    right = w.map_batches(
        lambda t: pa.table({"pair_key": t["doc_id"], "doc_b": t["doc_id"], "words_b": t["words"]}),
        batch_format="pyarrow",
    )
    from ..pipelines.relational import cluster_partitions

    joined = left.join(right, join_type="inner", num_partitions=cluster_partitions(),
                       on=("pair_key",))

    def jac(t: pa.Table) -> pa.Table:
        import numpy as np

        from ..functions.rounding import round_half_away

        wa = t["words_a"].to_pylist()
        wb = t["words_b"].to_pylist()
        sims = []
        for a, b in zip(wa, wb):
            sa, sb = set(a.split()), set(b.split())
            denom = len(sa | sb)
            sims.append(float(round_half_away(len(sa & sb) / denom, 4)) if denom else 0.0)
        return pa.table({"doc_a": t["doc_a"], "doc_b": t["doc_b"], "jaccard": pa.array(np.asarray(sims))})

    return joined.map_batches(jac, batch_format="pyarrow")


SQL_NGRAM_JACCARD = (
    # empty-text guard (same CASE as SQL_LANGID/SQL_TOKEN_COUNT): DuckDB's
    # regexp_split_to_array('', '\s+') yields [''], which would give two
    # adjacent empty docs jaccard 1.0 while the engine's ''.split() -> empty
    # set gives 0.0; the outer CASE keeps the 0/0 case at 0.0 on both sides
    "WITH t AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE "
    "list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) END AS words "
    "FROM documents) "
    "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    "CASE WHEN length(list_distinct(a.words || b.words)) = 0 THEN 0.0 ELSE "
    "ROUND(CAST(length(list_intersect(a.words, b.words)) AS DOUBLE) "
    "/ length(list_distinct(a.words || b.words)), 4) END AS jaccard "
    "FROM t a JOIN t b ON b.doc_id = a.doc_id + 1"
)


def q_langid(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        LangIdStage, batch_format="pyarrow", concurrency=(1, 4)
    )


SQL_LANGID = (
    "WITH t AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE "
    "regexp_split_to_array(lower(trim(text)), '\\s+') END AS toks FROM documents), "
    "s AS (SELECT doc_id, length(toks) AS n_tokens, "
    "length(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of', 'to'))) AS stop_hits FROM t) "
    "SELECT doc_id, n_tokens, stop_hits, "
    "ROUND(CASE WHEN n_tokens > 0 THEN CAST(stop_hits AS DOUBLE) / n_tokens ELSE 0.0 END, 4) AS stop_rate, "
    "CASE WHEN (CASE WHEN n_tokens > 0 THEN CAST(stop_hits AS DOUBLE) / n_tokens ELSE 0.0 END) > 0.05 "
    "THEN 'en' ELSE 'other' END AS pred_lang FROM s"
)


BM25_TERMS = ("window", "merge", "dup", "scan")  # the fixed retrieval query
BM25_K1 = 1.2
BM25_B = 0.75


def q_bm25(sf_dir: str):
    """BM25 RETRIEVAL SCORING of every document against a fixed query
    (the lexical-retrieval primitive of RAG / training-data curation
    pipelines): Lucene-style
    ``score = Σ_t ln((N - df_t + 0.5)/(df_t + 0.5) + 1) *
    tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` with k1=1.2, b=0.75.

    Scale shape (one corpus pass + one narrow pass):
    - pass 1 tokenizes once per batch (vectorized pandas split/explode,
      filtered to the 4 query terms BEFORE the value_counts — rows out
      are O(docs x |query|), never O(tokens)) and emits the NARROW
      (doc_id, dl, tf_t...) table, materialized distributed;
    - corpus stats (N, Σdl, df_t) are ONE tiny aggregate over indicator
      columns — six numbers on the driver, broadcast as plain floats;
    - scoring is a vectorized map over the narrow table; only docs
      containing >= 1 query term are emitted.

    Float parity with the SQL twin: idf uses driver-side ``math.log``
    (libm, like DuckDB's LN); every +,*,/ is written in the SAME
    left-associated order in both engines; avgdl = int-sum / int-count
    in both.  The harness's 6-decimal rounding absorbs last-ulp libm
    variation.  -> (doc_id, score)."""
    import math

    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from ..stages.dedup import _compact_nonempty

    docs = _docs(sf_dir, ["doc_id", "text"])
    terms = list(BM25_TERMS)

    def tf_partial(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().fillna("").str.strip().str.lower()
        toks = s.str.split()
        dl = toks.str.len().fillna(0).astype("int64")
        ex = toks.explode()
        ex = ex[ex.isin(terms)]
        if ex.empty:  # no query term in this batch: all-zero tf columns
            vc = pd.DataFrame(0, index=range(len(s)), columns=terms)
        else:
            vc = (ex.groupby([ex.index, ex]).size().unstack(fill_value=0)
                  .reindex(columns=terms, fill_value=0)
                  .reindex(index=range(len(s)), fill_value=0))
        cols = {"doc_id": pc.cast(t["doc_id"], pa.int64()),
                "dl": pa.array(dl.to_numpy())}
        for term in terms:
            cols[f"tf_{term}"] = pa.array(
                vc[term].to_numpy().astype(np.int64))
        return pa.table(cols)

    tf_schema = pa.schema([("doc_id", pa.int64()), ("dl", pa.int64())]
                          + [(f"tf_{term}", pa.int64()) for term in terms])
    tfd = _compact_nonempty(
        docs.map_batches(tf_partial, batch_format="pyarrow").materialize(),
        fallback_schema=tf_schema)

    stats = tfd.map_batches(
        lambda t: pa.table(
            {"n": pa.array([len(t)], pa.int64()),
             "sdl": pa.array([pc.sum(t["dl"]).as_py() or 0], pa.int64()),
             **{f"df_{term}": pa.array(
                 [pc.sum(pc.cast(pc.greater(t[f"tf_{term}"], 0),
                                 pa.int64())).as_py() or 0], pa.int64())
                for term in terms}}),
        batch_format="pyarrow",
    ).aggregate(Sum("n", alias_name="n"), Sum("sdl", alias_name="sdl"),
                *[Sum(f"df_{term}", alias_name=f"df_{term}")
                  for term in terms])
    n_docs = int(stats["n"] or 0)
    if n_docs == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    avgdl = int(stats["sdl"]) / n_docs  # int/int -> exact IEEE division
    idf = {term: math.log((n_docs - int(stats[f"df_{term}"]) + 0.5)
                          / (int(stats[f"df_{term}"]) + 0.5) + 1.0)
           for term in terms}

    def score_batch(t: pa.Table) -> pa.Table:
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        score = np.zeros(len(t), np.float64)
        any_tf = np.zeros(len(t), bool)
        for term in terms:  # fixed 4-term loop; each step is vectorized
            tf = t[f"tf_{term}"].to_numpy(zero_copy_only=False).astype(
                np.int64)
            denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
            score = score + (idf[term] * (tf * (BM25_K1 + 1.0))) / denom
            any_tf |= tf > 0
        return pa.table({"doc_id": t["doc_id"].filter(pa.array(any_tf)),
                         "score": pa.array(score[any_tf])})

    out = tfd.map_batches(score_batch, batch_format="pyarrow").to_pandas()
    if "doc_id" not in out.columns:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    return (out.astype({"doc_id": "int64", "score": "float64"})
            .sort_values("doc_id").reset_index(drop=True))


def bm25_sql() -> str:
    terms = BM25_TERMS
    k1, b = BM25_K1, BM25_B
    tok = ("CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE "
           "regexp_split_to_array(lower(trim(text)), '\\s+') END")
    tf_cols = ", ".join(
        f"length(list_filter(toks, x -> x = '{t}')) AS tf_{t}"
        for t in terms)
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in terms)
    # same left-associated expression as the engine: (idf * (tf * 2.2))
    # / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)), summed in fixed
    # term order
    score = " + ".join(
        f"(LN((s.n_docs - s.df_{t} + 0.5) / (s.df_{t} + 0.5) + 1.0) "
        f"* (d.tf_{t} * ({k1} + 1.0))) "
        f"/ (d.tf_{t} + {k1} * (1.0 - {b} + {b} * d.dl / s.avgdl))"
        for t in terms)
    any_tf = " + ".join(f"d.tf_{t}" for t in terms)
    return (
        f"WITH tk AS (SELECT doc_id, {tok} AS toks FROM documents), "
        f"d AS (SELECT doc_id, length(toks) AS dl, {tf_cols} FROM tk), "
        f"s AS (SELECT COUNT(*) AS n_docs, "
        f"CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl, {df_cols} FROM d) "
        f"SELECT d.doc_id, {score} AS score FROM d, s WHERE {any_tf} > 0"
    )


def q_bigram_xent(sf_dir: str, broadcast_limit: int = 100_000):
    """PER-DOCUMENT CROSS-ENTROPY under a corpus-trained add-one-smoothed
    BIGRAM model — the perplexity-style quality score LLM data pipelines
    use to rank/filter documents (low xent = in-distribution text):
    ``p(w2|w1) = (c(w1,w2) + 1) / (c(w1,.) + V)``,
    ``xent = -(Σ_bigrams log2 p) / n_bigrams`` over docs with >= 2 tokens.

    Scale shape:
    - ONE tokenize pass emits per-batch (doc, w1, w2, m) bigram
      MULTIPLICITY partials (value_counts — rows are distinct bigrams
      per doc-batch, never raw tokens); one groupby-sum builds the doc
      bigram table; corpus bigram + context counts are aggregates OVER
      THAT TABLE; only the vocab size (it must include single-token
      docs' words, which join no bigram) needs one extra distinct-word
      partial pass.
    - scoring AUTO-ROUTES like tfidf: model <= ``broadcast_limit``
      distinct bigrams ships as two dicts (``ray.put`` once), else two
      PARTITIONED hash joins on (w1, w2) / (w1) — web-scale bigram vocab
      must never be collected.
    - per-doc fold is one groupby-sum of (m*lp, m).

    Float notes: log2 of int-ratio per distinct bigram; per-doc sums are
    order-arbitrary on BOTH engines (DuckDB SUM vs Ray groupby), drift
    ~1e-13 absorbed by the harness's 6-decimal rounding (same contract
    as corr_by_group).  -> (doc_id, n_bigrams, xent)."""
    import numpy as np
    import ray
    from ray.data.aggregate import Count, Sum

    from ..stages.dedup import _compact_nonempty
    from .relational import cluster_partitions

    docs = _docs(sf_dir, ["doc_id", "text"])

    def bigram_partial(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().fillna("").str.strip().str.lower()
        toks = s.str.split()
        doc = pd.Series(t["doc_id"].to_numpy(zero_copy_only=False),
                        index=s.index)
        exw = toks.explode()
        exw = exw[exw.notna()]
        ex = pd.DataFrame({"doc_id": doc.loc[exw.index].to_numpy(),
                           "w1": exw.to_numpy()}, index=exw.index)
        # consecutive-token pairing: explode preserves in-doc order, the
        # index level groups per source row -> shift(-1) is "next token"
        ex["w2"] = ex.groupby(level=0)["w1"].shift(-1)
        ex = ex.dropna(subset=["w2"])
        vc = (ex.value_counts(["doc_id", "w1", "w2"]).reset_index(name="m")
              if len(ex) else
              pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                            "w1": pd.Series(dtype=object),
                            "w2": pd.Series(dtype=object),
                            "m": pd.Series(dtype="int64")}))
        return pa.table({"doc_id": pa.array(vc["doc_id"].to_numpy(np.int64)),
                         "w1": pa.array(vc["w1"].to_numpy(dtype=object),
                                        pa.string()),
                         "w2": pa.array(vc["w2"].to_numpy(dtype=object),
                                        pa.string()),
                         "m": pa.array(vc["m"].to_numpy(np.int64))})

    bg_schema = pa.schema([("doc_id", pa.int64()), ("w1", pa.string()),
                           ("w2", pa.string()), ("m", pa.int64())])
    bg = _compact_nonempty(
        docs.map_batches(bigram_partial, batch_format="pyarrow")
        .groupby(["doc_id", "w1", "w2"])
        .aggregate(Sum("m", alias_name="m")).materialize(),
        fallback_schema=bg_schema)
    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "n_bigrams": pd.Series(dtype="int64"),
                          "xent": pd.Series(dtype="float64")})
    if bg.count() == 0:
        return empty

    bc = _compact_nonempty(  # corpus bigram counts
        bg.groupby(["w1", "w2"]).aggregate(Sum("m", alias_name="c"))
        .materialize(),
        fallback_schema=pa.schema([("w1", pa.string()), ("w2", pa.string()),
                                   ("c", pa.int64())]))
    cc = _compact_nonempty(  # context counts c(w1, .)
        bc.groupby("w1").aggregate(Sum("c", alias_name="cw")).materialize(),
        fallback_schema=pa.schema([("w1", pa.string()), ("cw", pa.int64())]))
    # vocab = distinct unigrams corpus-wide; a single-token doc's word
    # joins neither bigram slot, so V needs its own distinct-word pass

    def uni_partial(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().fillna("").str.strip().str.lower()
        words = pd.unique(s.str.split().explode().dropna())
        return pa.table({"w": pa.array(words, pa.string())})

    vocab = (docs.map_batches(uni_partial, batch_format="pyarrow")
             .groupby("w").aggregate(Count(alias_name="n")).count())

    n_model = bc.count()
    if n_model <= broadcast_limit:
        bcp = bc.to_pandas()
        ccp = cc.to_pandas()
        # pair key packed as one string so the batch-side lookup is a
        # single vectorized Series.map (no per-row tuple-dict probes)
        c_ref = ray.put((dict(zip(bcp["w1"] + "\x00" + bcp["w2"],
                                  bcp["c"].astype(np.int64))),
                         dict(zip(ccp["w1"], ccp["cw"].astype(np.int64)))))

        def score_bcast(t: pa.Table) -> pa.Table:
            cmap, wmap = ray.get(c_ref)
            w1 = t["w1"].to_pandas()
            w2 = t["w2"].to_pandas()
            c = (w1 + "\x00" + w2).map(cmap).to_numpy(np.int64)
            cw = w1.map(wmap).to_numpy(np.int64)
            m = t["m"].to_numpy(zero_copy_only=False).astype(np.int64)
            lp = np.log2((c + 1.0) / (cw + float(vocab)))
            return pa.table({"doc_id": t["doc_id"],
                             "slp": pa.array(m * lp),
                             "m": pa.array(m)})

        scored = bg.map_batches(score_bcast, batch_format="pyarrow")
    else:
        joined = (bg.join(bc, join_type="inner", on=("w1", "w2"),
                          num_partitions=cluster_partitions())
                  .join(cc, join_type="inner", on=("w1",),
                        num_partitions=cluster_partitions()))

        def score_joined(t: pa.Table) -> pa.Table:
            c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
            cw = t["cw"].to_numpy(zero_copy_only=False).astype(np.int64)
            m = t["m"].to_numpy(zero_copy_only=False).astype(np.int64)
            lp = np.log2((c + 1.0) / (cw + float(vocab)))
            return pa.table({"doc_id": t["doc_id"],
                             "slp": pa.array(m * lp),
                             "m": pa.array(m)})

        scored = joined.map_batches(score_joined, batch_format="pyarrow")

    agg = (scored.groupby("doc_id")
           .aggregate(Sum("slp", alias_name="slp"),
                      Sum("m", alias_name="n_bigrams"))
           .to_pandas())
    if "doc_id" not in agg.columns or not len(agg):
        return empty
    agg["xent"] = -(agg["slp"].to_numpy(np.float64)
                    / agg["n_bigrams"].to_numpy(np.int64))
    return (agg.astype({"doc_id": "int64", "n_bigrams": "int64"})
            [["doc_id", "n_bigrams", "xent"]]
            .sort_values("doc_id").reset_index(drop=True))


def bigram_xent_sql() -> str:
    tok = ("CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE "
           "regexp_split_to_array(lower(trim(text)), '\\s+') END")
    return (
        f"WITH tk AS (SELECT doc_id, {tok} AS toks FROM documents), "
        "bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 "
        "FROM tk, UNNEST(range(1, length(toks))) AS u(i) "
        "WHERE length(toks) >= 2), "
        "bc AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY 1, 2), "
        "cc AS (SELECT w1, SUM(c) AS cw FROM bc GROUP BY 1), "
        "v AS (SELECT COUNT(DISTINCT x) AS vocab FROM "
        "(SELECT unnest(toks) AS x FROM tk)), "
        "sc AS (SELECT g.doc_id, "
        "LOG2((bc.c + 1.0) / (cc.cw + v.vocab)) AS lp "
        "FROM bg g JOIN bc ON bc.w1 = g.w1 AND bc.w2 = g.w2 "
        "JOIN cc ON cc.w1 = g.w1, v) "
        "SELECT doc_id, COUNT(*) AS n_bigrams, "
        "-SUM(lp) / COUNT(*) AS xent FROM sc GROUP BY 1"
    )


# --- rows-only (non-SQL-expressible) ---------------------------------------


def q_minhash_dedup(sf_dir: str):
    """MinHash-LSH candidates + exact-Jaccard verify at threshold 0.5."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    cand = minhash_candidate_pairs(docs)
    return verify_jaccard(cand, docs, threshold=0.5)


def q_simhash(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        SimHashStage, batch_format="pyarrow", concurrency=(1, 4)
    )


def q_fingerprint(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fingerprint_batch, batch_format="pyarrow")


def q_ann_cosine(sf_dir: str):
    """Brute-force cosine top-5 for query vectors (vec_id % 50 == 0)."""
    import numpy as np

    emb = _emb(sf_dir, ["vec_id", "embedding"])

    def pick_queries(t: pa.Table) -> pa.Table:
        # vectorized mask (pyarrow.compute has no mod kernel; numpy does)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 50 == 0))

    queries = emb.map_batches(pick_queries, batch_format="pyarrow").to_pandas()
    return brute_force_topk(emb, queries, k=5)


def _planted_embedding_corpus(sf_dir: str):
    """The embeddings table augmented with a deterministic BOUNDARY copy of
    every 25th vector (vec_id + 1_000_000) at cosine EXACTLY 0.96 — the raw
    table has no near-duplicates (max pairwise cosine ~0.51).  Shared by
    the near-dup queries (``embedding_dedup``, ``semdedup``) so both
    exercise the 0.95-threshold boundary, not just near-identical copies."""
    import numpy as np

    emb = _emb(sf_dir, ["vec_id", "embedding"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        keep = ids % 25 == 0
        if not keep.any():
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "embedding": pa.array([], pa.list_(pa.float32()))})
        vecs = np.stack(t.filter(pa.array(keep))["embedding"].to_pylist()).astype(np.float64)
        kept_ids = ids[keep]
        c = 0.96
        out = np.empty_like(vecs)
        for i, vid in enumerate(kept_ids):
            v = vecs[i] / np.linalg.norm(vecs[i])
            w = np.random.default_rng(int(vid)).standard_normal(vecs.shape[1])
            w = w - (w @ v) * v
            w /= np.linalg.norm(w)
            out[i] = c * v + np.sqrt(1.0 - c * c) * w  # cosine(v, out) == c
        return pa.table({
            "vec_id": pa.array(kept_ids + 1_000_000),
            "embedding": pa.array([r.astype(np.float32).tolist() for r in out],
                                  pa.list_(pa.float32())),
        })

    planted = emb.map_batches(plant, batch_format="pyarrow")
    return emb.union(planted)


def q_embedding_dedup(sf_dir: str):
    """Embedding-cosine near-dup pairs at threshold 0.95 over the planted
    boundary corpus — exercises the banded multi-table LSH recall
    guarantee near the threshold (see ``_planted_embedding_corpus``)."""
    return embedding_neardup_pairs(_planted_embedding_corpus(sf_dir), threshold=0.95)


NEARDUP_EDGE_THRESHOLD = 0.85


def q_neardup_cluster(sf_dir: str):
    """Near-duplicate CLUSTER dedup end-to-end (the training-data filter a
    100 TB pipeline actually applies): verified near-dup pairs -> connected
    components -> keep_id = min doc of each component, emitted for EVERY
    doc (itself when unclustered).  Downstream keeps rows where
    doc_id == keep_id.

    Edge set here = consecutive-doc pairs with unrounded distinct-word
    jaccard >= 0.85 — oracle-computable so the whole reduction (pair gen +
    union-find + labeling) hash-checks against DuckDB's recursive-CTE
    reachability."""
    import numpy as np

    from ..stages.dedup import neardup_cluster_labels

    ds = _docs(sf_dir, ["doc_id", "text"])

    def words(t: pa.Table) -> pa.Table:
        s = (
            t["text"].to_pandas().fillna("").str.lower().str.split()
            .map(lambda w: " ".join(sorted(set(w))))
        )
        return pa.table({"doc_id": t["doc_id"], "words": pa.array(s.tolist(), pa.string())})

    w = ds.map_batches(words, batch_format="pyarrow")
    left = w.map_batches(
        lambda t: pa.table({"pair_key": pa.compute.add(t["doc_id"], 1), "id_a": t["doc_id"], "words_a": t["words"]}),
        batch_format="pyarrow",
    )
    right = w.map_batches(
        lambda t: pa.table({"pair_key": t["doc_id"], "id_b": t["doc_id"], "words_b": t["words"]}),
        batch_format="pyarrow",
    )
    from ..pipelines.relational import cluster_partitions

    joined = left.join(right, join_type="inner", num_partitions=cluster_partitions(),
                       on=("pair_key",))

    def edges(t: pa.Table) -> pa.Table:
        # vectorized set-jaccard (round-3 review #5: was a per-pair Python
        # set loop): both sides are per-side DISTINCT sorted tokens, so in
        # the exploded (pair, token) counts a 2 means "in both" —
        # intersection and union sizes fall out of two C-level groupbys
        wa = t["words_a"].to_pandas().str.split()
        wb = t["words_b"].to_pandas().str.split()
        both = pd.concat([wa.explode().dropna(), wb.explode().dropna()])
        n = len(t)
        if len(both):
            cnt = both.groupby([both.index, both.to_numpy()]).size()
            union = cnt.groupby(level=0).size().reindex(range(n), fill_value=0) \
                .to_numpy(dtype=np.int64)
            inter = (cnt == 2).groupby(level=0).sum().reindex(range(n), fill_value=0) \
                .to_numpy(dtype=np.int64)
        else:
            union = inter = np.zeros(n, dtype=np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            j = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        keep = j >= NEARDUP_EDGE_THRESHOLD  # UNROUNDED, like the SQL
        return pa.table({"id_a": t["id_a"], "id_b": t["id_b"]}).filter(pa.array(keep))

    pairs = joined.map_batches(edges, batch_format="pyarrow")
    return neardup_cluster_labels(ds, pairs, id_col="doc_id")


SQL_NEARDUP_CLUSTER = (
    "WITH RECURSIVE t AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE "
    "list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) END AS words FROM documents), "
    "e AS (SELECT a.doc_id AS u, b.doc_id AS v FROM t a JOIN t b ON b.doc_id = a.doc_id + 1 "
    "WHERE (CASE WHEN length(list_distinct(a.words || b.words)) = 0 THEN 0.0 ELSE "
    "CAST(length(list_intersect(a.words, b.words)) AS DOUBLE) "
    "/ length(list_distinct(a.words || b.words)) END) >= 0.85), "
    "bi AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e), "
    "reach(src, dst) AS ("
    "SELECT doc_id, doc_id FROM documents "
    "UNION "
    "SELECT r.src, b.v FROM reach r JOIN bi b ON b.u = r.dst) "
    "SELECT src AS doc_id, MIN(dst) AS keep_id FROM reach GROUP BY src"
)


def q_ann_ivf(sf_dir: str):
    """IVF-bucketed ANN (the documented scale path next to the brute-force
    q_ann_cosine baseline): deterministic Lloyd centroids on a sample,
    corpus bucketed by nearest centroid, n_probe buckets probed per query.
    Rows-only (approximate by design); recall vs the exact baseline is
    asserted in tests/test_operators.py::TestANN::test_ivf_recall and the
    output is golden-pinned (fully deterministic: fixed rng seed, fixed
    sample)."""
    import numpy as np

    from ..stages.ann import ivf_topk

    emb = _emb(sf_dir, ["vec_id", "embedding"])

    def pick_queries(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 50 == 0))

    queries = emb.map_batches(pick_queries, batch_format="pyarrow").to_pandas()
    out = ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=4)
    pdf = out.to_pandas().sort_values(["query_id", "neighbor_id"]).reset_index(drop=True)
    return pdf[["query_id", "neighbor_id"]]


def q_tfidf_top_terms(sf_dir: str):
    """TF-IDF-style top-3 salient terms per document, INTEGER-EXACT so the
    SQL twin matches bit-for-bit: score_e6 = tf * 1_000_000 // df (term
    frequency scaled by inverse document frequency as integer division —
    monotone in tf/df like tf*log(N/df) for ranking, but with no
    transcendental float whose libm rounding could diverge between engines).

    Execution shape (the 100 TB discipline):
    - tf: per-batch (doc, word) value_counts partials -> one groupby-sum
      (rows shuffled = distinct (doc,word) pairs per batch, not tokens);
    - df: per-batch DISTINCT (word, doc) from the tf table -> word groupby
      count — the tf table already holds one row per (doc, word), so df is
      a Count per word with no re-tokenize;
    - score join: tf ⋈ df is a PARTITIONED hash join on word (vocab can be
      larger than driver memory at scale — never broadcast);
    - ranking: ``grouped_topk`` combiner (each batch keeps <= k rows per
      doc before the shuffle).
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count, Sum

    from .relational import cluster_partitions, grouped_topk

    docs = _docs(sf_dir, ["doc_id", "text"])

    def tf_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
                           "text": t["text"].to_pandas().fillna("")})
        s = df.set_index("doc_id")["text"].str.strip()
        s = s[s != ""].str.lower().str.split().explode()
        vc = s.reset_index().value_counts(["doc_id", "text"]).reset_index(name="tf")
        return pa.table({"doc_id": pa.array(vc["doc_id"].to_numpy()),
                         "word": pa.array(vc["text"].to_numpy(dtype=object), pa.string()),
                         "tf": pa.array(vc["tf"].to_numpy().astype(np.int64))})

    from ..stages.dedup import _compact_nonempty

    def add_bucket(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((d * np.uint64(2654435761)) % np.uint64(64)).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    def tf_reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["doc_id", "word"], sort=False)["tf"].sum().reset_index()
        return out

    # int-bucketed reduce: Ray's hash aggregate over the composite
    # (int, string) key measured 5.1 s for 116k rows at sf0.1; one
    # crc-mixed doc bucket groupby + a vectorized pandas sum per bucket
    # is ~4x cheaper and keeps every doc's rows together for the ranker
    tf = (
        docs.map_batches(tf_partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(tf_reduce, batch_format="pandas")
    )
    # consumed twice (df aggregate + join probe); empty hash partitions emit
    # schema-less blocks that break the word join on tiny corpora
    tf_schema = pa.schema([("doc_id", pa.int64()), ("word", pa.string()),
                           ("tf", pa.int64())])
    tf = _compact_nonempty(tf.materialize(), fallback_schema=tf_schema)
    if tf.count() == 0:  # empty corpus: Ray's hash-shuffle join chokes on it
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "word": pd.Series([], dtype=object),
                             "score_e6": pd.Series([], dtype="int64")})

    df_counts = _compact_nonempty(
        tf.groupby("word").aggregate(Count(alias_name="df")).materialize(),
        fallback_schema=pa.schema([("word", pa.string()), ("df", pa.int64())]))

    n_vocab = df_counts.count()
    if n_vocab <= 100_000:
        # ADAPTIVE: a vocabulary this small broadcasts as one dict and the
        # score happens map-side (no join shuffle); above the cutover the
        # partitioned hash join below engages (web-scale vocab + typo/ngram
        # tails can exceed driver memory — never broadcast unconditionally)
        dfp = df_counts.to_pandas()
        df_ref = ray.put(dict(zip(dfp["word"], dfp["df"].astype(np.int64))))

        def score_bcast(t: pa.Table) -> pa.Table:
            lut = ray.get(df_ref)
            tfv = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
            dfv = pd.Series(t["word"].to_pylist()).map(lut).to_numpy(dtype=np.int64)
            return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                             "word": t["word"],
                             "score_e6": pa.array(tfv * 1_000_000 // dfv)})

        scored_ds = tf.map_batches(score_bcast, batch_format="pyarrow")
    else:
        scored = tf.join(df_counts, join_type="inner", on=("word",),
                         num_partitions=cluster_partitions())

        def score(t: pa.Table) -> pa.Table:
            tfv = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
            dfv = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                             "word": t["word"],
                             "score_e6": pa.array(tfv * 1_000_000 // dfv)})

        scored_ds = scored.map_batches(score, batch_format="pyarrow")

    ranked = grouped_topk(scored_ds, ["doc_id"], "score_e6", k=3, tie_cols=["word"])
    pdf = ranked.to_pandas()
    if pdf.empty:  # Ray drops columns on 0-row to_pandas
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "word": pd.Series([], dtype=object),
                             "score_e6": pd.Series([], dtype="int64")})
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf["score_e6"] = pdf["score_e6"].astype("int64")
    return pdf[["doc_id", "word", "score_e6"]]


SQL_TFIDF_TOP_TERMS = (
    "WITH words AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), "
    "'\\s+')) AS word FROM documents WHERE trim(text) <> ''), "
    "tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY 1, 2), "
    "df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1) "
    "SELECT doc_id, word, score_e6 FROM ("
    "SELECT tf.doc_id, tf.word, "
    "CAST(tf.tf * 1000000 // df.df AS BIGINT) AS score_e6, "
    "ROW_NUMBER() OVER (PARTITION BY tf.doc_id "
    "ORDER BY tf.tf * 1000000 // df.df DESC, tf.word) AS rn "
    "FROM tf JOIN df USING (word)) t WHERE rn <= 3"
)


def q_gopher_quality(sf_dir: str):
    """Gopher-rule quality flags per document (stateless vectorized pass,
    integer-exact ratios — see ``stages.text.gopher_quality_batch``)."""
    from ..stages.text import gopher_quality_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        gopher_quality_batch, batch_format="pyarrow")


SQL_GOPHER_QUALITY = (
    "WITH words AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), "
    "'\\s+')) AS word FROM documents WHERE trim(text) <> ''), "
    "st AS (SELECT doc_id, COUNT(*) AS n_tokens, SUM(length(word)) AS wl, "
    "SUM(CASE WHEN word IN ('the','a','and','of','to') THEN 1 ELSE 0 END) AS stop_hits, "
    "SUM(CASE WHEN regexp_matches(word, '[a-z]') THEN 1 ELSE 0 END) AS alpha_hits "
    "FROM words GROUP BY doc_id), "
    "tw AS (SELECT doc_id, MAX(c) AS top_count FROM "
    "(SELECT doc_id, word, COUNT(*) AS c FROM words GROUP BY 1, 2) GROUP BY doc_id) "
    "SELECT d.doc_id, "
    "CAST(COALESCE(st.n_tokens, 0) AS BIGINT) AS n_tokens, "
    "CAST(COALESCE(st.wl * 1000000 // st.n_tokens, 0) AS BIGINT) AS mean_wordlen_e6, "
    "CAST(COALESCE(tw.top_count * 1000000 // st.n_tokens, 0) AS BIGINT) AS top_word_frac_e6, "
    "CAST(COALESCE(st.stop_hits, 0) AS BIGINT) AS stop_hits, "
    "CAST(COALESCE(st.alpha_hits * 1000000 // st.n_tokens, 0) AS BIGINT) AS alpha_frac_e6, "
    "CAST(CASE WHEN COALESCE(st.n_tokens, 0) BETWEEN 20 AND 100000 "
    "AND COALESCE(st.wl * 1000000 // st.n_tokens, 0) BETWEEN 2000000 AND 10000000 "
    "AND COALESCE(tw.top_count * 1000000 // st.n_tokens, 0) <= 200000 "
    "AND COALESCE(st.stop_hits, 0) >= 1 "
    "AND COALESCE(st.alpha_hits * 1000000 // st.n_tokens, 0) >= 800000 "
    "THEN 1 ELSE 0 END AS BIGINT) AS keep "
    "FROM documents d LEFT JOIN st USING (doc_id) LEFT JOIN tw USING (doc_id)"
)


def q_kmeans(sf_dir: str):
    """Distributed k-means cluster assignment over the embeddings table
    (rows-only: iterative float-free Lloyd's — see ``stages.cluster``).
    Deterministic and block-boundary-independent by integer quantization,
    so the output is golden-pinnable."""
    from ..stages.cluster import kmeans

    emb = _emb(sf_dir, ["vec_id", "embedding"])
    asg, _cents, _it = kmeans(emb, k=10, n_iters=25)
    pdf = asg.to_pandas().sort_values("vec_id").reset_index(drop=True)
    return pdf[["vec_id", "cluster"]]


def q_pii_redact(sf_dir: str):
    """Email/phone detection + redaction per document (compiled-regex actor
    pool; see ``stages.text.PiiRedactStage``)."""
    from ..stages.text import PiiRedactStage

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        PiiRedactStage, batch_format="pyarrow", concurrency=(1, 4))


SQL_PII_REDACT = (
    "SELECT doc_id, "
    "CAST(length(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails, "
    "CAST(length(regexp_extract_all(regexp_replace(text, "
    "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
    "'\\+?\\d[\\d\\- ]{7,}\\d')) AS BIGINT) AS n_phones, "
    "regexp_replace(regexp_replace(text, "
    "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
    "'\\+?\\d[\\d\\- ]{7,}\\d', '<PHONE>', 'g') AS redacted "
    "FROM documents"
)


def q_image_neardup_cluster(sf_dir: str):
    """IMAGE near-dup cluster dedup: phash Hamming-band candidate pairs ->
    connected components -> (image_id, keep_id) over the whole images table
    (the image-payload twin of ``neardup_cluster``; rows-only — phash bit
    ops are not SQL-expressible).  Reuses the auto-routed driver/distributed
    component labeling; correctness of the banding is pigeonhole-guaranteed
    (``stages.dedup.phash_neardup_pairs``)."""
    from ..pipelines.spatial_catalog import images_from_documents
    from ..stages.dedup import neardup_cluster_labels, phash_neardup_pairs

    images = rd.read_parquet(
        images_from_documents(sf_dir, "/tmp/scbr-query-cache"),
        columns=["image_id", "phash"])
    pairs = phash_neardup_pairs(images, max_hamming=3)
    out = neardup_cluster_labels(images, pairs, id_col="image_id")
    pdf = out.to_pandas().sort_values("image_id").reset_index(drop=True)
    return pdf[["image_id", "keep_id"]]


def q_bigram_topk(sf_dir: str):
    """Corpus-wide top-50 bigram counts (LM n-gram statistics pass).

    Per-batch (bigram partial-count) combiner -> one groupby-sum over
    distinct bigrams -> tiny driver-side top-k: the shuffle moves distinct
    (bigram, n) partials per batch, never the token stream.  Deterministic
    tie-break (count desc, bigram asc) matches the SQL ORDER BY."""
    import numpy as np
    from ray.data.aggregate import Sum

    docs = _docs(sf_dir, ["doc_id", "text"])

    def bigram_partial(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().fillna("").str.lower().str.strip()
        ex = s.str.split().explode().dropna()
        nxt = ex.groupby(level=0).shift(-1)
        bg = (ex + " " + nxt).dropna()
        vc = bg.value_counts()
        return pa.table({"bigram": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                         "n": pa.array(vc.to_numpy().astype(np.int64))})

    counts = (
        docs.map_batches(bigram_partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
    )
    pdf = counts.to_pandas()
    pdf = pdf.sort_values(["n", "bigram"], ascending=[False, True], kind="stable").head(50)
    return pdf.reset_index(drop=True)[["bigram", "n"]]


SQL_BIGRAM_TOPK = (
    "WITH t AS (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS w "
    "FROM documents WHERE trim(text) <> ''), "
    "b AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1), "
    "i -> w[i] || ' ' || w[i + 1])) AS bigram FROM t) "
    "SELECT bigram, COUNT(*) AS n FROM b GROUP BY bigram "
    "ORDER BY n DESC, bigram LIMIT 50"
)


def q_dup_ngrams(sf_dir: str):
    """Cross-corpus duplicated-5-gram statistics (the RefinedWeb/Gopher
    ``dup_ngram_fraction`` signal computed against the WHOLE corpus, not
    within-document): per doc, how many of its distinct 5-grams appear in
    at least one other document.

    Shape: vectorized per-doc distinct-gram explode (pandas shift chain, no
    Python loop over tokens) -> per-gram document frequency (one groupby
    over distinct (doc, gram) rows — map-side dedup bounds fan-in) -> one
    partitioned join back on gram -> per-doc count aggregate.  Gram text is
    the key here so the DuckDB twin is exact; the 100 TB path keys the same
    shuffle by a 64-bit gram hash (the minhash stage's shingle discipline,
    stages/dedup.py) at ~1/10th the shuffle bytes."""
    import numpy as np
    from ray.data.aggregate import Count, Sum

    from .relational import cluster_partitions

    N = 5
    docs = _docs(sf_dir, ["doc_id", "text"])

    def distinct_grams(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().fillna("").str.lower().str.strip()
        doc_ids = t["doc_id"].to_pandas()
        ex = s.str.split().explode().dropna()
        parts = [ex] + [ex.groupby(level=0).shift(-k) for k in range(1, N)]
        gram = parts[0].str.cat(parts[1:], sep=" ")  # NaN past doc tail
        df = pd.DataFrame({"doc": gram.index, "gram": gram.to_numpy()}).dropna()
        df = df.drop_duplicates()  # per-doc DISTINCT grams
        return pa.table({"doc_id": pa.array(doc_ids.iloc[df["doc"]].to_numpy()),
                         "gram": pa.array(df["gram"].to_numpy(dtype=object), pa.string())})

    dg = docs.map_batches(distinct_grams, batch_format="pyarrow")
    freq = dg.groupby("gram").aggregate(Count(alias_name="n_docs"))
    # aggregate output can carry schema-less empty blocks on empty hash
    # partitions, which pyarrow's join rejects — rebuild from nonempty refs
    from ..stages.dedup import _compact_nonempty

    freq = _compact_nonempty(freq.materialize(),
                             pa.schema([("gram", pa.string()), ("n_docs", pa.int64())]))
    joined = dg.join(freq, join_type="inner", num_partitions=cluster_partitions(),
                     on=("gram",))

    def flag(t: pa.Table) -> pa.Table:
        nd = t["n_docs"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": t["doc_id"],
                         "one": pa.array(np.ones(len(nd), np.int64)),
                         "dup": pa.array((nd >= 2).astype(np.int64))})

    out = (
        joined.map_batches(flag, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("one", alias_name="n_grams"), Sum("dup", alias_name="n_dup"))
    )
    pdf = out.to_pandas()
    pdf["n_grams"] = pdf["n_grams"].astype("int64")
    pdf["n_dup"] = pdf["n_dup"].astype("int64")
    return pdf


SQL_DUP_NGRAMS = (
    "WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w "
    "FROM documents WHERE trim(text) <> ''), "
    "g AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 4), "
    "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS gram FROM t), "
    "dg AS (SELECT DISTINCT doc_id, gram FROM g), "
    "df AS (SELECT gram, COUNT(*) AS n_docs FROM dg GROUP BY 1) "
    "SELECT d.doc_id, COUNT(*) AS n_grams, "
    "CAST(SUM(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup "
    "FROM dg d JOIN df f ON d.gram = f.gram GROUP BY 1"
)


def q_vocab_oov(sf_dir: str):
    """Two-phase tokenizer-style pipeline: (1) corpus pass builds the
    vocabulary — top-16 words by (count desc, word asc), the deterministic
    tie-break a byte-exact SQL twin needs; (2) the vocabulary broadcasts
    via ``ray.put`` and a second pass scores every doc: total tokens,
    out-of-vocabulary tokens, distinct OOV tokens.  This is the shape of
    every fixed-vocab encode at 100 TB: the corpus is read twice (both
    streaming), the driver holds only the k-word vocab, and nothing
    shuffles in phase 2."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    K = 16  # ~half the corpus vocabulary -> OOV is well exercised
    docs = _docs(sf_dir, ["doc_id", "text"])

    def word_partial(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().fillna("").str.lower().str.strip()
        vc = s.str.split().explode().dropna().value_counts()
        return pa.table({"word": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                         "n": pa.array(vc.to_numpy().astype(np.int64))})

    counts = (
        docs.map_batches(word_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    vocab = set(
        counts.sort_values(["n", "word"], ascending=[False, True], kind="stable")
        .head(K)["word"]
    )
    vocab_ref = ray.put(vocab)

    def score(t: pa.Table) -> pa.Table:
        v = ray.get(vocab_ref)
        s = t["text"].to_pandas().fillna("").str.lower().str.strip()
        ex = s.str.split().explode().dropna()
        oov_mask = ~ex.isin(v)
        n_tok = ex.groupby(level=0).size()
        n_oov = oov_mask.groupby(level=0).sum()
        n_oov_distinct = ex[oov_mask].groupby(level=0).nunique()
        idx = pd.RangeIndex(len(s))
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tok.reindex(idx, fill_value=0).to_numpy().astype(np.int64)),
            "n_oov": pa.array(n_oov.reindex(idx, fill_value=0).to_numpy().astype(np.int64)),
            "n_oov_distinct": pa.array(
                n_oov_distinct.reindex(idx, fill_value=0).to_numpy().astype(np.int64)),
        })

    return docs.map_batches(score, batch_format="pyarrow")


SQL_VOCAB_OOV = (
    "WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w "
    "FROM documents), "
    "tok AS (SELECT doc_id, unnest(w) AS word FROM t WHERE trim(lower(text)) <> ''), "
    "vocab AS (SELECT word FROM (SELECT word, COUNT(*) AS n FROM tok GROUP BY 1) "
    "ORDER BY n DESC, word LIMIT 16) "
    "SELECT d.doc_id, COUNT(tok.word) AS n_tokens, "
    "CAST(SUM(CASE WHEN tok.word IS NOT NULL AND v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov, "
    "COUNT(DISTINCT CASE WHEN v.word IS NULL THEN tok.word END) AS n_oov_distinct "
    "FROM documents d LEFT JOIN tok ON d.doc_id = tok.doc_id "
    "LEFT JOIN vocab v ON tok.word = v.word GROUP BY 1"
)


def q_label_centroids(sf_dir: str):
    """Grouped VECTOR aggregate: per-label embedding centroid as exact
    integer-quantized per-dimension sums (round(v*1e6) in float64 — the
    engine's money-cents discipline applied to vectors, so partial
    aggregation order can't move the result).  Per-batch partials emit
    (label, dim, sum_e6, n) rows — D rows per label per batch, never the
    vectors — then one tiny groupby.  The mean is sum_e6 / n, derivable
    exactly; only integers cross the engine/SQL hash."""
    import numpy as np
    from ray.data.aggregate import Sum

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["embedding", "label"])

    def partial(t: pa.Table) -> pa.Table:
        labels = t["label"].to_numpy(zero_copy_only=False)
        mat = np.stack(t["embedding"].to_pandas().to_numpy())  # (n, d) float32
        e6 = np.round(mat.astype(np.float64) * 1_000_000.0).astype(np.int64)
        out_l, out_d, out_s, out_n = [], [], [], []
        for lab in np.unique(labels):
            rows = e6[labels == lab]
            d = rows.shape[1]
            out_l.append(np.full(d, lab, dtype=np.int64))
            out_d.append(np.arange(d, dtype=np.int64))
            out_s.append(rows.sum(axis=0))
            out_n.append(np.full(d, rows.shape[0], dtype=np.int64))
        return pa.table({"label": pa.array(np.concatenate(out_l)),
                         "dim": pa.array(np.concatenate(out_d)),
                         "sum_e6": pa.array(np.concatenate(out_s)),
                         "n_vecs": pa.array(np.concatenate(out_n))})

    out = (
        emb.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("sum_e6", alias_name="sum_e6"), Sum("n_vecs", alias_name="n_vecs"))
    )
    pdf = out.to_pandas()
    for c in ("label", "dim", "sum_e6", "n_vecs"):
        pdf[c] = pdf[c].astype("int64")
    return pdf


SQL_LABEL_CENTROIDS = (
    "WITH e AS (SELECT label, generate_subscripts(embedding, 1) - 1 AS dim, "
    "unnest(embedding) AS v FROM embeddings) "
    "SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim, "
    "CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT)) AS BIGINT) AS sum_e6, "
    "COUNT(*) AS n_vecs FROM e GROUP BY 1, 2"
)


def q_leakage_safe_split(sf_dir: str):
    """LEAKAGE-SAFE train/val/test split: near-duplicate documents must land
    on the SAME side (a near-dup of a training doc inside the test set is
    the classic eval-contamination bug), so the split hash keys on the
    near-dup cluster's keep_id instead of the doc_id.  Composition of two
    oracle-checked operators: the connected-component labeling of
    ``q_neardup_cluster`` and the deterministic KMV split of
    ``q_split_assign`` — the whole composite hash-checks against the
    recursive-CTE + hash-chain SQL twin."""
    import numpy as np

    from .relational import _kmv_hash

    labels = q_neardup_cluster(sf_dir)

    def assign(t: pa.Table) -> pa.Table:
        k = t["keep_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = _kmv_hash(k) % 100
        split = np.where(b < 90, "train", np.where(b < 95, "val", "test"))
        return pa.table({"doc_id": t["doc_id"], "keep_id": t["keep_id"],
                         "split": pa.array(split, pa.string())})

    return labels.map_batches(assign, batch_format="pyarrow")


def sql_leakage_safe_split() -> str:
    from .relational import _KMV_A, _KMV_A2, _KMV_B, _KMV_P

    return (
        f"WITH labels AS ({SQL_NEARDUP_CLUSTER}), "
        f"h1 AS (SELECT doc_id, keep_id, (keep_id * {_KMV_A} + {_KMV_B}) % {_KMV_P} AS h FROM labels), "
        f"t2 AS (SELECT doc_id, keep_id, ((h % 1073741824) * {_KMV_A2}) % {_KMV_P} AS term1, "
        f"(((h // 1073741824) * {_KMV_A2}) % {_KMV_P}) AS tt FROM h1), "
        f"b AS (SELECT doc_id, keep_id, ((term1 + ((tt % 2147483648) * 1073741824 + tt // 2147483648) "
        f"% {_KMV_P}) % {_KMV_P}) % 100 AS bkt FROM t2) "
        "SELECT doc_id, keep_id, CASE WHEN bkt < 90 THEN 'train' WHEN bkt < 95 THEN 'val' "
        "ELSE 'test' END AS split FROM b"
    )


SEQ_PACK_BUDGET = 512
_SEQ_RANGE = 1000  # docs per contiguous range partition


def q_seq_pack(sf_dir: str):
    """Token-budget SEQUENCE PACKING (the LM-training batch-prep operator):
    documents in doc_id order fill fixed 512-token sequences; a doc belongs
    to the sequence where its first token lands — seq_id =
    (running_total_before_doc) // budget.  Deterministic and SQL-twinned
    via SUM() OVER (ORDER BY doc_id).

    Distributed shape: a global ordered cumsum without a global sort —
    docs range-partition by doc_id // 1000 (contiguous ranges), pass 1
    aggregates per-range token totals (one tiny groupby, #ranges rows),
    the driver prefix-sums those offsets (O(#ranges)), pass 2 computes
    each range's local cumsum and adds its broadcast offset.  The corpus
    streams twice; nothing driver-held scales with rows."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    from ..stages.text import token_count_batch

    ds = _docs(sf_dir, ["doc_id", "text"])
    toks = ds.map_batches(token_count_batch, batch_format="pyarrow")

    def add_range(t: pa.Table) -> pa.Table:
        r = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64) // _SEQ_RANGE
        return t.append_column("rkey", pa.array(r))

    toks = toks.map_batches(add_range, batch_format="pyarrow").materialize()

    totals = toks.groupby("rkey").aggregate(Sum("n_tokens", alias_name="tot")).to_pandas()
    totals = totals.sort_values("rkey").reset_index(drop=True)
    offs = dict(zip(totals["rkey"].astype(int),
                    np.concatenate([[0], np.cumsum(totals["tot"].to_numpy())[:-1]]).astype(np.int64)))
    offs_ref = ray.put(offs)

    def pack_range(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offs_ref)[int(g["rkey"].iloc[0])]
        g = g.sort_values("doc_id", kind="stable")
        n = g["n_tokens"].to_numpy().astype(np.int64)
        before = off + np.cumsum(n) - n  # tokens before each doc
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(),
                             "n_tokens": n,
                             "seq_id": before // SEQ_PACK_BUDGET})

    return toks.groupby("rkey").map_groups(pack_range, batch_format="pandas")


SQL_SEQ_PACK = (
    "WITH t AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 ELSE "
    "length(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens FROM documents) "
    "SELECT doc_id, n_tokens, "
    "CAST((SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens) "
    f"// {SEQ_PACK_BUDGET} AS BIGINT) AS seq_id FROM t"
)


def q_lang_confusion(sf_dir: str):
    """Language-ID CONFUSION MATRIX against the stored label (the model-QA
    report: where does the classifier disagree with ground truth?): the
    LangIdStage prediction joins the documents' own ``lang`` column inside
    one pass — the label rides along through the stage, so there is no
    join at all — then a tiny (lang, pred_lang) count aggregate."""
    from ray.data.aggregate import Count

    from ..stages.text import LangIdStage

    ds = _docs(sf_dir, ["doc_id", "text", "lang"])

    class WithLabel(LangIdStage):
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = super().__call__(batch)
            return out.append_column("lang", batch["lang"])

    pred = ds.map_batches(WithLabel, batch_format="pyarrow", concurrency=(1, 4))
    out = pred.groupby(["lang", "pred_lang"]).aggregate(Count(alias_name="n"))
    pdf = out.to_pandas()
    pdf["n"] = pdf["n"].astype("int64")
    return pdf


SQL_LANG_CONFUSION = (
    "WITH t AS (SELECT doc_id, lang, CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE "
    "regexp_split_to_array(lower(trim(text)), '\\s+') END AS toks FROM documents), "
    "s AS (SELECT doc_id, lang, length(toks) AS n_tokens, "
    "length(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of', 'to'))) AS stop_hits FROM t) "
    "SELECT lang, CASE WHEN (CASE WHEN n_tokens > 0 THEN CAST(stop_hits AS DOUBLE) / n_tokens "
    "ELSE 0.0 END) > 0.05 THEN 'en' ELSE 'other' END AS pred_lang, COUNT(*) AS n "
    "FROM s GROUP BY 1, 2"
)


def q_compress_ratio(sf_dir: str):
    """Per-document zlib COMPRESSION RATIO (the cheap boilerplate /
    repetition quality signal: highly-compressible text is template or
    repetition; near-incompressible is noise).  Deterministic — zlib level
    6 output length is a pure function of the bytes — so rows-only with a
    golden pin; ratio_e4 kept integer (len_out*1e4 // len_in)."""
    import zlib

    import numpy as np

    docs = _docs(sf_dir, ["doc_id", "text"])

    def ratio(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n_in, n_out = [], []
        for x in texts:
            b = (x or "").encode()
            n_in.append(len(b))
            n_out.append(len(zlib.compress(b, 6)) if b else 0)
        n_in = np.array(n_in, dtype=np.int64)
        n_out = np.array(n_out, dtype=np.int64)
        ratio_e4 = np.where(n_in > 0, n_out * 10000 // np.maximum(n_in, 1), 0)
        return pa.table({"doc_id": t["doc_id"],
                         "n_bytes": pa.array(n_in),
                         "ratio_e4": pa.array(ratio_e4.astype(np.int64))})

    return docs.map_batches(ratio, batch_format="pyarrow")


def q_per_source_cap(sf_dir: str):
    """PER-DOMAIN CAP (web-pipeline staple: bound any one domain's share of
    the corpus): keep at most 10 documents per source, chosen by the
    deterministic KMV-hash priority of doc_id (reproducible on any cluster
    size — NOT "first 10 seen", which depends on scan order).  Pure
    composition: ``grouped_topk`` ascending on the hash, so each batch
    prunes to <= 10 rows per source before the shuffle."""
    import numpy as np

    from .relational import _kmv_hash, grouped_topk

    docs = _docs(sf_dir, ["doc_id", "source"])

    def pri(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.append_column("h", pa.array(_kmv_hash(ids)))

    kept = grouped_topk(docs.map_batches(pri, batch_format="pyarrow"),
                        ["source"], "h", k=10, tie_cols=["doc_id"],
                        descending=False)
    return kept.select_columns(["doc_id", "source"])


def sql_per_source_cap() -> str:
    from .relational import _KMV_A, _KMV_A2, _KMV_B, _KMV_P

    return (
        f"WITH h1 AS (SELECT doc_id, source, (doc_id * {_KMV_A} + {_KMV_B}) % {_KMV_P} AS h "
        "FROM documents), "
        f"t AS (SELECT doc_id, source, ((h % 1073741824) * {_KMV_A2}) % {_KMV_P} AS term1, "
        f"((h // 1073741824) * {_KMV_A2}) % {_KMV_P} AS tt FROM h1), "
        f"p AS (SELECT doc_id, source, (term1 + ((tt % 2147483648) * 1073741824 + tt // 2147483648) "
        f"% {_KMV_P}) % {_KMV_P} AS h FROM t) "
        "SELECT doc_id, source FROM p "
        "QUALIFY row_number() OVER (PARTITION BY source ORDER BY h, doc_id) <= 10"
    )


def q_embed_quantize(sf_dir: str):
    """Embedding INT8 QUANTIZATION (the storage/serving compression step):
    L2-normalize each vector and emit int8 codes in long format
    (vec_id, dim, code).  Exactness discipline: components quantize to e6
    integers FIRST, the squared norm is an exact int64 sum of those, and
    only then one IEEE-identical sqrt + division + round per element — so
    the result is bit-stable across engines and partial orders.  Pure
    per-row map, no shuffle."""
    import numpy as np

    from ..functions.rounding import round_half_away

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])

    def quant(t: pa.Table) -> pa.Table:
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        n, d = vecs.shape
        q = round_half_away(vecs * 1e6).astype(np.int64)
        s2 = (q * q).sum(axis=1)
        norm = np.sqrt(s2.astype(np.float64))
        code = round_half_away(127.0 * q / np.maximum(norm, 1.0)[:, None]).astype(np.int64)
        vid = np.repeat(t["vec_id"].to_numpy(zero_copy_only=False), d)
        dim = np.tile(np.arange(d, dtype=np.int64), n)
        return pa.table({"vec_id": pa.array(vid), "dim": pa.array(dim),
                         "code": pa.array(code.ravel())})

    return emb.map_batches(quant, batch_format="pyarrow")


SQL_EMBED_QUANTIZE = (
    "WITH q AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim, "
    "CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000, 0) AS BIGINT) AS qv "
    "FROM embeddings), "
    "ss AS (SELECT vec_id, SUM(qv * qv) AS s2 FROM q GROUP BY vec_id) "
    "SELECT q.vec_id, CAST(q.dim AS BIGINT) AS dim, "
    "CAST(ROUND(127.0 * qv / GREATEST(sqrt(CAST(s2 AS DOUBLE)), 1.0), 0) AS BIGINT) AS code "
    "FROM q JOIN ss USING (vec_id)"
)


# --- benchmark decontamination / corpus-learned filtering / mixture ---------


def _word_windows(texts: pd.Series, n: int) -> pd.Series:
    """All word n-gram windows of each text, series indexed by originating
    row (pandas shift-chain explode — vectorized, no token loop)."""
    ex = texts.fillna("").str.lower().str.strip().str.split().explode().dropna()
    parts = [ex] + [ex.groupby(level=0).shift(-k) for k in range(1, n)]
    return parts[0].str.cat(parts[1:], sep=" ").dropna()


BENCH_GRAM_LIMIT = 100_000


def _bench_gram_side(docs, n: int = 3, limit: int = BENCH_GRAM_LIMIT):
    """Benchmark-slice distinct word n-grams, ADAPTIVELY routed (round-3
    review #4: the broadcast previously had no size cutover, so a large
    "benchmark" would have gathered unboundedly to the driver — the same
    cutover shape as q_tfidf_top_terms' vocabulary join).

    Returns ``(bench_ref, bench_ds)``: below ``limit`` per-batch-distinct
    gram rows (an upper bound on global distinct), the grams gather once
    and broadcast via ``ray.put`` (``bench_ds`` is None); above it they
    stay a distributed globally-distinct Dataset (``bench_ref`` is None)
    for the partitioned gram join in :func:`_contam_counts_joined`."""
    import numpy as np
    import ray

    def bench_grams(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        g = _word_windows(t["text"].to_pandas()[ids % 37 == 0], n).drop_duplicates()
        return pa.table({"gram": pa.array(g.to_numpy(dtype=object), pa.string())})

    bg = docs.map_batches(bench_grams, batch_format="pyarrow").materialize()
    if bg.count() <= limit:
        pdf = bg.to_pandas()
        grams = (np.unique(pdf["gram"].to_numpy(dtype=object))
                 if len(pdf) else np.array([], dtype=object))
        return ray.put(pa.array(grams, pa.string())), None
    from ray.data.aggregate import Count

    from ..stages.dedup import _compact_nonempty

    distinct = (bg.groupby("gram").aggregate(Count(alias_name="_c"))
                .select_columns(["gram"]))
    return None, _compact_nonempty(
        distinct.materialize(), fallback_schema=pa.schema([("gram", pa.string())]))


def _contam_counts_joined(docs, bench_ds, n: int = 3):
    """Partitioned contamination counts: per-doc window totals map-side (no
    shuffle), gram hits via an inner hash join of the exploded corpus grams
    against the distributed distinct benchmark grams — nothing driver-held.
    Returns a Dataset of (doc_id, n_windows, n_contam) covering EVERY doc."""
    import numpy as np
    from ray.data.aggregate import Count

    from ..stages.dedup import _compact_nonempty
    from .relational import cluster_partitions

    def window_totals(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = _word_windows(t["text"].to_pandas(), n)
        nw = (g.groupby(level=0).size()
              .reindex(range(len(ids)), fill_value=0)
              .to_numpy(dtype=np.int64))
        return pa.table({"doc_id": pa.array(ids), "n_windows": pa.array(nw)})

    def explode_grams(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = _word_windows(t["text"].to_pandas(), n)
        return pa.table({
            "doc_id": pa.array(ids[g.index.to_numpy()]),
            "gram": pa.array(g.to_numpy(dtype=object), pa.string())})

    nparts = cluster_partitions()
    hits = (docs.map_batches(explode_grams, batch_format="pyarrow")
            .join(bench_ds, join_type="inner", num_partitions=nparts,
                  on=("gram",))
            .groupby("doc_id").aggregate(Count(alias_name="n_contam")))
    hits = _compact_nonempty(
        hits.materialize(),
        fallback_schema=pa.schema([("doc_id", pa.int64()),
                                   ("n_contam", pa.int64())]))
    totals = docs.map_batches(window_totals, batch_format="pyarrow")
    out = totals.join(hits, join_type="left_outer", num_partitions=nparts,
                      on=("doc_id",))

    def fill(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "doc_id": t["doc_id"], "n_windows": t["n_windows"],
            "n_contam": pc.coalesce(t["n_contam"], pa.scalar(0, pa.int64()))})

    return out.map_batches(fill, batch_format="pyarrow")


def q_decontaminate(sf_dir: str, bench_gram_limit: int = BENCH_GRAM_LIMIT):
    """Benchmark n-gram DECONTAMINATION check — the eval-leakage guard every
    LLM training pipeline runs before finalizing a corpus (the 13-gram
    overlap filter of GPT-3 appendix C / The Pile, here with 3-gram windows
    sized to the synthetic docs): a held-out benchmark slice
    (doc_id % 37 == 0) contributes its distinct word 3-grams; every
    remaining training doc is scored by how many of its word windows hit
    that set and flagged when >= 10% collide.

    Scale shape: the benchmark side is SMALL by construction (eval suites
    are MBs while the corpus is TBs), so below ``bench_gram_limit``
    per-batch-distinct grams it gathers once and broadcasts via ``ray.put``,
    and the corpus side is one embarrassingly-parallel vectorized pass
    (pandas shift-chain window explode + ``pc.is_in`` against the broadcast
    set) emitting one row per doc — the corpus never shuffles.  Above the
    limit (someone points this at a corpus-sized "benchmark") the grams stay
    a distributed distinct Dataset and contamination counts come from a
    partitioned gram join (``_contam_counts_joined``) — nothing driver-held
    either way.  Both routes hash-identical (forced-route test).  Operator
    beyond the reference's scope (training-data axis of the task brief)."""
    import numpy as np
    import pyarrow.compute as pc
    import ray

    N = 3
    docs = _docs(sf_dir, ["doc_id", "text"])
    bench_ref, bench_ds = _bench_gram_side(docs, N, bench_gram_limit)

    if bench_ref is None:  # large-benchmark route: partitioned gram join
        counts = _contam_counts_joined(docs, bench_ds, N)

        def finish(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = ids % 37 != 0
            nw = t["n_windows"].to_numpy(zero_copy_only=False)[keep]
            nc = t["n_contam"].to_numpy(zero_copy_only=False)[keep]
            flag = ((nc * 10 >= nw) & (nw > 0)).astype(np.int64)
            return pa.table({"doc_id": pa.array(ids[keep]),
                             "n_windows": pa.array(nw),
                             "n_contam": pa.array(nc),
                             "contaminated": pa.array(flag)})

        return counts.map_batches(finish, batch_format="pyarrow")

    def score(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = ids % 37 != 0
        texts = t["text"].to_pandas()[keep]
        g = _word_windows(texts, N)
        bset = ray.get(bench_ref)
        if len(g):
            hit = pc.is_in(pa.array(g.to_numpy(dtype=object), pa.string()),
                           value_set=bset).to_numpy(zero_copy_only=False)
            nw = g.groupby(level=0).size()
            nc = pd.Series(hit.astype(np.int64), index=g.index).groupby(level=0).sum()
        else:
            nw = nc = pd.Series(dtype=np.int64)
        nw = nw.reindex(texts.index, fill_value=0).to_numpy(dtype=np.int64)
        nc = nc.reindex(texts.index, fill_value=0).to_numpy(dtype=np.int64)
        flag = ((nc * 10 >= nw) & (nw > 0)).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids[keep]), "n_windows": pa.array(nw),
                         "n_contam": pa.array(nc), "contaminated": pa.array(flag)})

    return docs.map_batches(score, batch_format="pyarrow")


SQL_DECONTAMINATE = (
    "WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w "
    "FROM documents WHERE trim(text) <> ''), "
    "g AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 2), "
    "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram FROM t), "
    "bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 37 = 0), "
    "hits AS (SELECT g.doc_id, COUNT(*) AS n_windows, "
    "CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contam "
    "FROM g LEFT JOIN bench b ON g.gram = b.gram WHERE g.doc_id % 37 <> 0 GROUP BY 1) "
    "SELECT d.doc_id, COALESCE(h.n_windows, 0) AS n_windows, "
    "COALESCE(h.n_contam, 0) AS n_contam, "
    "CAST(CASE WHEN COALESCE(h.n_contam, 0) * 10 >= COALESCE(h.n_windows, 0) "
    "AND COALESCE(h.n_windows, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS contaminated "
    "FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id WHERE d.doc_id % 37 <> 0"
)


def q_stopword_filter(sf_dir: str):
    """Corpus-LEARNED boilerplate removal (the CCNet/RefinedWeb idea of
    stripping tokens so common they carry no signal, without a hand-written
    stopword list): phase 1 computes per-word document frequency across the
    corpus (distinct (doc, word) explode -> one small groupby); words in
    more than 80% of documents become the learned stop set, broadcast via
    ``ray.put``; phase 2 rewrites every doc order-preservingly without
    them.  The stop set is bounded by vocabulary size (Heaps' law: ~1e6
    words even at 100 TB), so the broadcast stays small while the corpus
    never shuffles in phase 2."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count

    docs = _docs(sf_dir, ["doc_id", "text"])
    n_docs = docs.count()

    def distinct_words(t: pa.Table) -> pa.Table:
        ex = (t["text"].to_pandas().fillna("").str.lower().str.strip()
              .str.split().explode().dropna())
        df = pd.DataFrame({"doc": ex.index, "word": ex.to_numpy()}).drop_duplicates()
        return pa.table({"word": pa.array(df["word"].to_numpy(dtype=object), pa.string())})

    wdf = (docs.map_batches(distinct_words, batch_format="pyarrow")
           .groupby("word").aggregate(Count(alias_name="nd")).to_pandas())
    stop = wdf.loc[wdf["nd"].to_numpy(dtype=np.int64) * 10 > n_docs * 8, "word"]
    stop_ref = ray.put(pa.array(np.sort(stop.to_numpy(dtype=object)), pa.string()))

    def rewrite(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pandas().fillna("").str.lower().str.strip()
        ex = texts.str.split().explode().dropna()
        sw = ray.get(stop_ref)
        if len(ex):
            hit = pc.is_in(pa.array(ex.to_numpy(dtype=object), pa.string()),
                           value_set=sw).to_numpy(zero_copy_only=False)
            n_tok = ex.groupby(level=0).size()
            n_rm = pd.Series(hit.astype(np.int64), index=ex.index).groupby(level=0).sum()
            clean = ex[~hit].groupby(level=0).agg(" ".join)
        else:
            n_tok = n_rm = pd.Series(dtype=np.int64)
            clean = pd.Series(dtype=object)
        n_tok = n_tok.reindex(texts.index, fill_value=0).to_numpy(dtype=np.int64)
        n_rm = n_rm.reindex(texts.index, fill_value=0).to_numpy(dtype=np.int64)
        clean = clean.reindex(texts.index, fill_value="").to_numpy(dtype=object)
        return pa.table({"doc_id": t["doc_id"], "clean_text": pa.array(clean, pa.string()),
                         "n_kept": pa.array(n_tok - n_rm), "n_removed": pa.array(n_rm)})

    return docs.map_batches(rewrite, batch_format="pyarrow")


SQL_STOPWORD_FILTER = (
    "WITH t AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] "
    "ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END AS w FROM documents), "
    "tok AS (SELECT DISTINCT doc_id, unnest(w) AS word FROM t), "
    "stats AS (SELECT word, COUNT(*) AS nd FROM tok GROUP BY 1), "
    "stop AS (SELECT COALESCE((SELECT list(word) FROM stats "
    "WHERE nd * 10 > (SELECT COUNT(*) FROM documents) * 8), []) AS sw), "
    "f AS (SELECT doc_id, w, list_filter(w, x -> NOT list_contains(s.sw, x)) AS kept "
    "FROM t, stop s) "
    "SELECT doc_id, COALESCE(array_to_string(kept, ' '), '') AS clean_text, "
    "CAST(len(kept) AS BIGINT) AS n_kept, "
    "CAST(len(w) - len(kept) AS BIGINT) AS n_removed FROM f"
)


def q_mixture_sample(sf_dir: str):
    """LANGUAGE-BALANCED mixture sampling (the multilingual rebalancing /
    temperature-sampling step of corpus assembly, at tau=0: equalize to the
    smallest language): phase 1 is one tiny per-lang count; phase 2 keeps a
    doc iff ``kmv_hash(doc_id) % n_lang < n_min`` — a deterministic
    per-row rule (the KMV Mersenne-mod hash, int64/BIGINT-safe), so the
    sample is identical on any cluster size and the SQL twin reproduces the
    exact row set.  No shuffle: counts broadcast as a plain dict."""
    import numpy as np
    from ray.data.aggregate import Count

    from .relational import _kmv_hash

    docs = _docs(sf_dir, ["doc_id", "lang", "source"])
    cnt = docs.groupby("lang").aggregate(Count(alias_name="ns")).to_pandas()
    ns = dict(zip(cnt["lang"], cnt["ns"].astype(np.int64)))
    n_min = int(min(ns.values()))

    def pick(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        mod = np.array([ns[l] for l in t["lang"].to_pylist()], dtype=np.int64)
        return t.filter(pa.array(_kmv_hash(ids) % mod < n_min))

    return docs.map_batches(pick, batch_format="pyarrow")


def _sql_mixture_sample() -> str:
    from .relational import _KMV_A, _KMV_A2, _KMV_B, _KMV_P

    return (
        f"WITH cnt AS (SELECT lang, COUNT(*) AS ns FROM documents GROUP BY 1), "
        f"mn AS (SELECT MIN(ns) AS nmin FROM cnt), "
        f"h1 AS (SELECT doc_id, lang, source, "
        f"(doc_id * {_KMV_A} + {_KMV_B}) % {_KMV_P} AS h FROM documents), "
        f"hh AS (SELECT doc_id, lang, source, "
        f"((h % 1073741824) * {_KMV_A2}) % {_KMV_P} AS term1, "
        f"((h // 1073741824) * {_KMV_A2}) % {_KMV_P} AS tt FROM h1) "
        f"SELECT doc_id, lang, source FROM hh JOIN cnt USING (lang), mn WHERE "
        f"((term1 + ((tt % 2147483648) * 1073741824 + tt // 2147483648) % {_KMV_P}) % {_KMV_P}) "
        f"% ns < nmin"
    )


def q_semdedup(sf_dir: str):
    """SemDedup semantic near-dup pruning over the embeddings table, run on
    the same boundary-planted corpus as ``embedding_dedup`` (the raw table
    has no pairs above 0.51 cosine) so the prune is nonvacuous (rows-only:
    iterative k-means + float matmul).  Planted-pair semantics proven in
    tests/test_operators.py::TestSemDedup; corpus output golden-pinned."""
    from ..stages.dedup import semdedup_labels

    corpus = _planted_embedding_corpus(sf_dir)
    return semdedup_labels(corpus, k=10, tau=0.95)


CHUNK_W, CHUNK_S = 16, 12  # window / stride (overlap = 4 tokens)


def q_chunk_docs(sf_dir: str):
    """Sliding-window DOCUMENT CHUNKING (the RAG / context-window prep
    operator): each doc splits into overlapping word windows of
    ``CHUNK_W`` tokens at stride ``CHUNK_S`` (chunks start at 0, S, 2S, ...
    while the start is inside the doc; the tail chunk may be short).
    Emits (doc_id, chunk_id, chunk_text, n_tokens).

    Embarrassingly parallel — no shuffle; chunk counts/offsets are
    vectorized, only the per-chunk string assembly is per-output-row work
    (string construction is inherently O(len) per emitted row)."""
    import numpy as np

    docs = _docs(sf_dir, ["doc_id", "text"])

    def chunk(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().fillna("").str.lower().str.strip().str.split()
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = s.map(len).to_numpy(dtype=np.int64)
        keep = n > 0
        words = s.to_numpy()[keep]
        ids, n = ids[keep], n[keep]
        n_chunks = (n - 1) // CHUNK_S + 1
        tot = int(n_chunks.sum())
        did = np.repeat(ids, n_chunks)
        first = np.zeros(tot, np.int64)
        first[np.cumsum(n_chunks)[:-1]] = n_chunks[:-1]
        cid = np.arange(tot, dtype=np.int64) - np.cumsum(first)
        n_rep = np.repeat(n, n_chunks)
        n_tok = np.minimum(cid * CHUNK_S + CHUNK_W, n_rep) - cid * CHUNK_S
        texts = [" ".join(w[c * CHUNK_S:c * CHUNK_S + CHUNK_W])
                 for w, nc in zip(words, n_chunks) for c in range(nc)]
        return pa.table({"doc_id": pa.array(did), "chunk_id": pa.array(cid),
                         "chunk_text": pa.array(texts, pa.string()),
                         "n_tokens": pa.array(n_tok)})

    return docs.map_batches(chunk, batch_format="pyarrow")


SQL_CHUNK_DOCS = (
    f"WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w "
    f"FROM documents WHERE trim(text) <> ''), "
    f"c AS (SELECT doc_id, w, unnest(generate_series(0, "
    f"CAST(floor((len(w) - 1) / {CHUNK_S}) AS BIGINT))) AS chunk_id FROM t) "
    f"SELECT doc_id, chunk_id, "
    f"array_to_string(w[chunk_id * {CHUNK_S} + 1 : chunk_id * {CHUNK_S} + {CHUNK_W}], ' ') AS chunk_text, "
    f"LEAST(chunk_id * {CHUNK_S} + {CHUNK_W}, len(w)) - chunk_id * {CHUNK_S} AS n_tokens FROM c"
)


def q_inverted_index(sf_dir: str):
    """INVERTED INDEX build (term -> ordered doc-id posting list, the search
    / retrieval artifact a corpus pipeline materializes alongside training
    shards): distinct (doc, word) pairs explode vectorized, shuffle ONCE on
    a crc word-bucket, and each reducer emits its bucket's postings as
    comma-joined ordered doc ids.  Terms in fewer than 2 or more than 400
    docs are dropped (stop/hapax pruning — the df window every real index
    applies).  Posting-list construction is inherently per-term string
    work; sort + grouping are vectorized per bucket."""
    import zlib as _z

    import numpy as np

    docs = _docs(sf_dir, ["doc_id", "text"])

    def distinct_pairs(t: pa.Table) -> pa.Table:
        ex = (t["text"].to_pandas().fillna("").str.lower().str.strip()
              .str.split().explode().dropna())
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"doc_id": ids[ex.index], "word": ex.to_numpy()}).drop_duplicates()
        w = df["word"].to_numpy(dtype=object)
        b = np.fromiter((_z.crc32(x.encode()) % 64 for x in w),
                        dtype=np.int64, count=len(w))
        return pa.table({"doc_id": pa.array(df["doc_id"].to_numpy(dtype=np.int64)),
                         "word": pa.array(w, pa.string()),
                         "bucket": pa.array(b)})

    def postings(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["word", "doc_id"], kind="stable")
        agg = g.groupby("word", sort=False)["doc_id"].agg(
            [("postings", lambda s: ",".join(map(str, s))), ("df", "size")])
        agg["df"] = agg["df"].astype("int64")
        out = agg.reset_index()
        return out[(out["df"] >= 2) & (out["df"] <= 400)]

    return (
        docs.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(postings, batch_format="pandas")
    )


SQL_INVERTED_INDEX = (
    "WITH tok AS (SELECT DISTINCT doc_id, unnest(regexp_split_to_array("
    "lower(trim(text)), '\\s+')) AS word FROM documents WHERE trim(text) <> '') "
    "SELECT word, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings, "
    "COUNT(*) AS df FROM tok GROUP BY word HAVING COUNT(*) BETWEEN 2 AND 400"
)


def q_training_manifest(sf_dir: str, bench_gram_limit: int = BENCH_GRAM_LIMIT):
    """End-to-end CORPUS ASSEMBLY MANIFEST — the composite pass a training
    run actually ships: every document is routed to exactly one fate with
    fixed precedence
      benchmark (doc_id % 37 == 0, held out) > duplicate (exact-text, keep
      min id) > contaminated (3-gram benchmark overlap >= 10%) >
      low_quality (Gopher rules) > not_sampled (language-balance hash
      rule) > kept
    and ``keep`` = 1 only for 'kept'.  Composes five individually
    oracle-checked operators into one decision column; the SQL twin
    composes their five twins.

    Scale shape: one vectorized flag pass (broadcast bench-gram set +
    lang-count dict ride ``ray.put``), ONE content-bucketed shuffle for the
    exact-dup flag, one partitioned int-key join to merge — nothing
    driver-held scales with the corpus.  The bench-gram set AUTO-ROUTES at
    ``bench_gram_limit`` (round-3 review #4): above it the contamination
    flag comes from ``_contam_counts_joined``'s partitioned gram join and
    rides the merge join instead of a broadcast."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count

    from ..stages.text import gopher_quality_batch
    from .relational import _kmv_hash, cluster_partitions

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])

    # tiny phase 0: language counts + benchmark gram set (auto-routed)
    cnt = docs.groupby("lang").aggregate(Count(alias_name="ns")).to_pandas()
    ns = dict(zip(cnt["lang"], cnt["ns"].astype(np.int64)))
    n_min = int(min(ns.values()))
    bench_ref, bench_ds = _bench_gram_side(docs, 3, bench_gram_limit)

    # exact-dup flag: one content-bucketed shuffle, per-row verdict
    import zlib as _z

    def add_bucket(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        b = np.fromiter(((_z.crc32((s or "").encode()) % 64) for s in texts),
                        dtype=np.int64, count=len(texts))
        return pa.table({"doc_id": t["doc_id"], "text": t["text"],
                         "bucket": pa.array(b)})

    def dup_flag(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("text", sort=False)["doc_id"].transform("min")
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(dtype=np.int64),
                             "dup": (g["doc_id"].to_numpy() != m.to_numpy())
                             .astype(np.int64)})

    dup = (docs.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("bucket").map_groups(dup_flag, batch_format="pandas"))
    # map_groups emits schema-less 0-row blocks on empty hash partitions,
    # which pyarrow's join rejects — rebuild from nonempty refs (small: one
    # int row per doc)
    from ..stages.dedup import _compact_nonempty

    dup = _compact_nonempty(dup.materialize(),
                            pa.schema([("doc_id", pa.int64()),
                                       ("dup", pa.int64())]))

    # one vectorized pass for every per-row signal (contam rides inline on
    # the broadcast route; on the join route it arrives via the merge join)
    def flags(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t["text"].to_pandas()
        is_bench = (ids % 37 == 0).astype(np.int64)
        cols = {"doc_id": pa.array(ids), "is_bench": pa.array(is_bench)}
        if bench_ref is not None:
            g = _word_windows(texts, 3)
            bset = ray.get(bench_ref)
            if len(g):
                hit = pc.is_in(pa.array(g.to_numpy(dtype=object), pa.string()),
                               value_set=bset).to_numpy(zero_copy_only=False)
                nw = g.groupby(level=0).size()
                nc = pd.Series(hit.astype(np.int64), index=g.index).groupby(level=0).sum()
            else:
                nw = nc = pd.Series(dtype=np.int64)
            nw = nw.reindex(texts.index, fill_value=0).to_numpy(dtype=np.int64)
            nc = nc.reindex(texts.index, fill_value=0).to_numpy(dtype=np.int64)
            cols["contam"] = pa.array(((nc * 10 >= nw) & (nw > 0)).astype(np.int64))
        quality = gopher_quality_batch(t)["keep"].to_numpy(zero_copy_only=False)
        mod = np.array([ns[l] for l in t["lang"].to_pylist()], dtype=np.int64)
        sampled = (_kmv_hash(ids) % mod < n_min).astype(np.int64)
        cols["quality"] = pa.array(quality)
        cols["sampled"] = pa.array(sampled)
        return pa.table(cols)

    sig = docs.map_batches(flags, batch_format="pyarrow")
    joined = sig.join(dup, join_type="inner", num_partitions=cluster_partitions(),
                      on=("doc_id",))
    if bench_ref is None:  # large-benchmark route: contam via partitioned join
        contam_ds = _contam_counts_joined(docs, bench_ds, 3).map_batches(
            lambda t: pa.table({
                "doc_id": t["doc_id"],
                "contam": pc.cast(
                    pc.and_(pc.greater_equal(pc.multiply(t["n_contam"],
                                                         pa.scalar(10, pa.int64())),
                                             t["n_windows"]),
                            pc.greater(t["n_windows"], pa.scalar(0, pa.int64()))),
                    pa.int64())}),
            batch_format="pyarrow")
        joined = joined.join(contam_ds, join_type="inner",
                             num_partitions=cluster_partitions(), on=("doc_id",))

    REASONS = np.array(["benchmark", "duplicate", "contaminated", "low_quality",
                        "not_sampled", "kept"])

    def decide(t: pa.Table) -> pa.Table:
        b = t["is_bench"].to_numpy(zero_copy_only=False).astype(bool)
        d = t["dup"].to_numpy(zero_copy_only=False).astype(bool)
        c = t["contam"].to_numpy(zero_copy_only=False).astype(bool)
        q = t["quality"].to_numpy(zero_copy_only=False).astype(bool)
        m = t["sampled"].to_numpy(zero_copy_only=False).astype(bool)
        code = np.select([b, d, c, ~q, ~m], [0, 1, 2, 3, 4], default=5)
        return pa.table({"doc_id": t["doc_id"],
                         "reason": pa.array(REASONS[code], pa.string()),
                         "keep": pa.array((code == 5).astype(np.int64))})

    return joined.map_batches(decide, batch_format="pyarrow")


def _sql_training_manifest() -> str:
    from .relational import _KMV_A, _KMV_A2, _KMV_B, _KMV_P

    return (
        "WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w "
        "FROM documents WHERE trim(text) <> ''), "
        "g AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 2), "
        "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram FROM t), "
        "bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 37 = 0), "
        "hits AS (SELECT g.doc_id, COUNT(*) AS nw, "
        "CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS nc "
        "FROM g LEFT JOIN bench b ON g.gram = b.gram GROUP BY 1), "
        "contam AS (SELECT doc_id, CASE WHEN nc * 10 >= nw AND nw > 0 THEN 1 ELSE 0 END AS c "
        "FROM hits), "
        "dup AS (SELECT doc_id, CASE WHEN doc_id <> MIN(doc_id) OVER (PARTITION BY text) "
        "THEN 1 ELSE 0 END AS d FROM documents), "
        "words AS (SELECT doc_id, unnest(w) AS word FROM t), "
        "st AS (SELECT doc_id, COUNT(*) AS n_tokens, SUM(length(word)) AS wl, "
        "SUM(CASE WHEN word IN ('the','a','and','of','to') THEN 1 ELSE 0 END) AS stop_hits, "
        "SUM(CASE WHEN regexp_matches(word, '[a-z]') THEN 1 ELSE 0 END) AS alpha_hits "
        "FROM words GROUP BY doc_id), "
        "tw AS (SELECT doc_id, MAX(c) AS top_count FROM "
        "(SELECT doc_id, word, COUNT(*) AS c FROM words GROUP BY 1, 2) GROUP BY doc_id), "
        "gq AS (SELECT d.doc_id, CASE WHEN COALESCE(st.n_tokens, 0) BETWEEN 20 AND 100000 "
        "AND COALESCE(st.wl * 1000000 // st.n_tokens, 0) BETWEEN 2000000 AND 10000000 "
        "AND COALESCE(tw.top_count * 1000000 // st.n_tokens, 0) <= 200000 "
        "AND COALESCE(st.stop_hits, 0) >= 1 "
        "AND COALESCE(st.alpha_hits * 1000000 // st.n_tokens, 0) >= 800000 "
        "THEN 1 ELSE 0 END AS q "
        "FROM documents d LEFT JOIN st USING (doc_id) LEFT JOIN tw USING (doc_id)), "
        "cnt AS (SELECT lang, COUNT(*) AS ns FROM documents GROUP BY 1), "
        "mn AS (SELECT MIN(ns) AS nmin FROM cnt), "
        f"h1 AS (SELECT doc_id, lang, (doc_id * {_KMV_A} + {_KMV_B}) % {_KMV_P} AS h "
        "FROM documents), "
        f"hh AS (SELECT doc_id, lang, ((h % 1073741824) * {_KMV_A2}) % {_KMV_P} AS term1, "
        f"((h // 1073741824) * {_KMV_A2}) % {_KMV_P} AS tt FROM h1), "
        f"mix AS (SELECT doc_id, CASE WHEN ((term1 + ((tt % 2147483648) * 1073741824 "
        f"+ tt // 2147483648) % {_KMV_P}) % {_KMV_P}) % c.ns < mn.nmin THEN 1 ELSE 0 END AS m "
        "FROM hh JOIN cnt c USING (lang), mn) "
        "SELECT d.doc_id, "
        "CASE WHEN d.doc_id % 37 = 0 THEN 'benchmark' "
        "WHEN dup.d = 1 THEN 'duplicate' "
        "WHEN COALESCE(contam.c, 0) = 1 THEN 'contaminated' "
        "WHEN gq.q = 0 THEN 'low_quality' "
        "WHEN mix.m = 0 THEN 'not_sampled' ELSE 'kept' END AS reason, "
        "CAST(CASE WHEN d.doc_id % 37 <> 0 AND dup.d = 0 AND COALESCE(contam.c, 0) = 0 "
        "AND gq.q = 1 AND mix.m = 1 THEN 1 ELSE 0 END AS BIGINT) AS keep "
        "FROM documents d JOIN dup USING (doc_id) JOIN gq USING (doc_id) "
        "JOIN mix USING (doc_id) LEFT JOIN contam USING (doc_id)"
    )


def q_dim_stats(sf_dir: str):
    """Per-DIMENSION corpus statistics of the embedding table (the vector-
    column profiling pass: feature drift / dead-dimension detection):
    n, e6-quantized sum, min, max per dimension.  Per-batch vectorized
    partials (one row per dim per batch — D rows cross the shuffle, never
    vectors), one tiny groupby."""
    import numpy as np
    from ray.data.aggregate import Max, Min, Sum

    from ..functions.rounding import round_half_away

    emb = _emb(sf_dir, ["vec_id", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        V = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        q = round_half_away(V * 1e6).astype(np.int64)
        d = V.shape[1]
        return pa.table({"dim": pa.array(np.arange(d, dtype=np.int64)),
                         "n": pa.array(np.full(d, len(V), dtype=np.int64)),
                         "s_e6": pa.array(q.sum(axis=0)),
                         "mn_e6": pa.array(q.min(axis=0)),
                         "mx_e6": pa.array(q.max(axis=0))})

    out = (emb.map_batches(partial, batch_format="pyarrow")
           .groupby("dim")
           .aggregate(Sum("n", alias_name="n"), Sum("s_e6", alias_name="s_e6"),
                      Min("mn_e6", alias_name="mn_e6"),
                      Max("mx_e6", alias_name="mx_e6")))
    pdf = out.to_pandas()
    for c in pdf.columns:
        pdf[c] = pdf[c].astype("int64")
    return pdf


SQL_DIM_STATS = (
    "WITH q AS (SELECT generate_subscripts(embedding, 1) - 1 AS dim, "
    "CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000, 0) AS BIGINT) AS v "
    "FROM embeddings) "
    "SELECT CAST(dim AS BIGINT) AS dim, COUNT(*) AS n, "
    "CAST(SUM(v) AS BIGINT) AS s_e6, MIN(v) AS mn_e6, MAX(v) AS mx_e6 "
    "FROM q GROUP BY 1"
)


def q_pq_ann(sf_dir: str):
    """Product-quantization ANN with exact rerank (rows-only: k-means
    codebooks are not SQL-expressible): fit m=8 x k=16 integer-exact
    codebooks, encode the corpus to 8 code ids per vector (64 floats -> 8
    bytes), ADC-shortlist 25 candidates per query (vec_id % 50 == 0) and
    rerank them with exact distances — the memory-bound production shape
    of similarity search (codebooks train on a bounded sample; encoding,
    ADC and the candidate fetch all stream; only the (Q, m, k) distance
    tables and the O(Q*25) candidate-id set broadcast).  Independent
    oracle: recall@5 vs exact L2 + determinism + planted-structure tests
    in tests/test_operators.py (measured 0.62 here vs 0.30 raw ADC)."""
    from ..stages.ann import pq_encode, pq_fit, pq_topk_rerank

    emb = _emb(sf_dir, ["vec_id", "embedding"])

    def pick_queries(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 50 == 0))

    queries = emb.map_batches(pick_queries, batch_format="pyarrow").to_pandas()
    books = pq_fit(emb, m=8, k=16)
    codes = pq_encode(emb, books).materialize()
    out = pq_topk_rerank(codes, books, emb, queries, k=5, shortlist=25)
    return out.astype({"query_id": "int64", "neighbor_id": "int64"}) \
        .sort_values(["query_id", "neighbor_id"]).reset_index(drop=True)

# --- Misra-Gries heavy hitters (round-4 late addition) ----------------------


def _mg_update(sketch: dict, word: str, inc: int, capacity: int) -> None:
    """Textbook Misra-Gries update generalized to weighted increments."""
    if word in sketch:
        sketch[word] += inc
    elif len(sketch) < capacity:
        sketch[word] = inc
    else:
        dec = min(inc, min(sketch.values()))
        dead = [k for k in sketch if sketch[k] == dec]
        for k in sketch:
            sketch[k] -= dec
        for k in dead:
            del sketch[k]
        if inc > dec:
            sketch[word] = inc - dec


def _mg_merge(a: dict, b: dict, capacity: int) -> dict:
    """Merge two MG sketches preserving the deficit bound (Agarwal et al.,
    'Mergeable Summaries', PODS'12): add counts, then subtract the
    (capacity+1)-th largest and drop non-positive entries."""
    out = dict(a)
    for k, v in b.items():
        out[k] = out.get(k, 0) + v
    if len(out) > capacity:
        kth = sorted(out.values(), reverse=True)[capacity]
        out = {k: v - kth for k, v in out.items() if v - kth > 0}
    return out


_HH_CAPACITY = 512  # default heavy-hitter threshold denominator; the SQL
# oracle below is built from this same constant so a non-default capacity
# cannot silently diverge from it


def q_heavy_hitters(sf_dir: str, capacity: int = _HH_CAPACITY, *,
                    num_blocks: int = None):
    """HEAVY HITTERS over the corpus token stream — the two-pass
    Misra-Gries pattern that finds every word with frequency >
    n_tokens/capacity WITHOUT ever materializing the O(vocab) count table
    on the driver (contrast ``word_freq``, which returns the full table):

    pass 1 (streaming): each batch folds its token counts into an MG
        sketch of 2*capacity counters (value_counts first, so updates are
        per-distinct-word).  The per-batch sketch rows are then folded
        DISTRIBUTEDLY — a ``groupby(word).Sum(weight)`` followed by the
        one-shot mergeable-summaries truncation (keep words whose summed
        weight exceeds the (2*capacity+1)-th largest).  Guarantee: per
        batch, weight >= f_b - tokens_b/(2c+1) (Misra-Gries deficit), so
        the summed weight W >= f - n/(2c+1); a true heavy hitter
        (f > n/c) therefore has W > n/c - n/(2c+1) > n/(2c+1) >= d, the
        truncation cut (d*(2c+1) <= sum(W) <= n) — it always survives.
        Driver state is O(capacity): only the <= 2c+1 top rows ever land
        on the driver (round-4 directive: the previous version
        ``to_pandas()``-ed ALL per-batch partials, O(n_batches x c) rows).
    pass 2 (candidates only): exact counts for the <= 2*capacity candidate
        words (broadcast value_set filter + tiny groupby), then the exact
        integer filter ``count * capacity > n_tokens``.

    The sketch only steers WHICH words get exact-counted; the output is
    computed from exact integers, hence deterministic and SQL-checkable
    (any candidate superset of the true heavy hitters yields the identical
    result).  ``num_blocks`` forces the pass-1 input block count (test
    hook for the many-batches fold path)."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    docs = _docs(sf_dir, ["text"])
    if num_blocks:
        docs = docs.repartition(num_blocks)
    sketch_cap = 2 * capacity

    def batch_sketch(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().fillna("").str.lower().str.split().explode().dropna()
        vc = s.value_counts()
        sk: dict = {}
        for w, c in vc.items():
            _mg_update(sk, w, int(c), sketch_cap)
        words = list(sk.keys())
        # batch token total stamped on the first row only: summing the
        # column recovers the exact global n_tokens after aggregation
        stamp = [int(s.size)] + [0] * (len(words) - 1) if words else []
        return pa.table({"word": pa.array(words, pa.string()),
                         "weight": pa.array(list(sk.values()), pa.int64()),
                         "batch_tokens": pa.array(stamp, pa.int64())})

    # distributed fold: the partial-sketch table (O(n_batches x capacity)
    # rows) never touches the driver — sum weights per word in a shuffle,
    # then keep only the top sketch_cap rows (the one-shot MG truncation)
    folded = (docs.map_batches(batch_sketch, batch_format="pyarrow")
              .groupby("word")
              .aggregate(Sum("weight", alias_name="weight"),
                         Sum("batch_tokens", alias_name="batch_tokens"))
              .materialize())
    n_tokens = folded.sum("batch_tokens") or 0
    n_tokens = int(n_tokens)
    top = (folded.sort("weight", descending=True)
           .limit(sketch_cap + 1).to_pandas())
    if len(top) > sketch_cap:
        d = int(top["weight"].iloc[sketch_cap])
    else:
        d = 0
    cand_words = top["word"][top["weight"] > d]
    candidates = pa.array(sorted(cand_words), pa.string())
    cand_ref = ray.put(candidates)

    class ExactCandidateCounts:
        def __init__(self):
            self.cands = set(ray.get(cand_ref).to_pylist())

        def __call__(self, t: pa.Table) -> pa.Table:
            s = (t["text"].to_pandas().fillna("").str.lower()
                 .str.split().explode().dropna())
            vc = s[s.isin(self.cands)].value_counts()
            return pa.table({"word": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                             "n": pa.array(vc.to_numpy(np.int64))})

    exact = (docs.map_batches(ExactCandidateCounts, batch_format="pyarrow",
                              concurrency=(1, 8))
             .groupby("word")
             .aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    exact["n"] = exact["n"].astype("int64")
    out = exact[exact["n"] * capacity > n_tokens].copy()
    out["n_tokens"] = n_tokens
    return out.sort_values("word", kind="stable").reset_index(drop=True)


SQL_HEAVY_HITTERS = (
    # exact reference: full word counts filtered at the same integer
    # threshold (the engine side never builds this full table — that is the
    # point of the sketch — but the outputs must agree exactly); built from
    # _HH_CAPACITY so a non-default capacity cannot diverge from the oracle
    "WITH w AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) "
    "AS word FROM documents WHERE trim(text) <> ''), "
    "t AS (SELECT COUNT(*) AS n_tokens FROM w), "
    "c AS (SELECT word, COUNT(*) AS n FROM w GROUP BY 1) "
    f"SELECT c.word, c.n, t.n_tokens FROM c, t WHERE c.n * {_HH_CAPACITY} > t.n_tokens"
)


BALANCE_CAP = 16  # max oversample copies per document


def q_balanced_resample(sf_dir: str):
    """CLASS-BALANCED OVERSAMPLING of documents by language (the
    minority-class rebalancing step of training-mixture construction):
    every class is oversampled toward the majority-class count, with the
    per-document copy count CAPPED at ``BALANCE_CAP`` (unbounded
    duplication of a tiny class degrades training — the cap is the
    standard practical guard).

    Deterministic, rank-free replication rule: for a class of size c and
    target t (majority count), a document gets ``t // c`` copies plus one
    extra iff ``doc_id % c < t % c`` — no global rank pass needed, every
    batch computes its own rows' copy counts from the broadcast (class ->
    count) map, and the expansion is one vectorized np.repeat.  Output is
    (doc_id, lang, copy_idx)."""
    import numpy as np
    from ray.data.aggregate import Count

    docs = _docs(sf_dir, ["doc_id", "lang"])
    counts = (docs.groupby("lang").aggregate(Count(alias_name="c"))
              .to_pandas())
    cmap = dict(zip(counts["lang"], counts["c"].astype(int)))
    target = max(cmap.values())

    def expand(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        langs = t["lang"].to_pandas()
        c = langs.map(cmap).to_numpy(np.int64)
        reps = np.minimum(target // c + (ids % c < target % c), BALANCE_CAP)
        total = int(reps.sum())
        if total == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "lang": pa.array([], pa.string()),
                             "copy_idx": pa.array([], pa.int64())})
        idx = np.repeat(np.arange(len(ids)), reps)
        starts = np.repeat(np.cumsum(reps) - reps, reps)
        copy_idx = np.arange(total) - starts
        return pa.table({"doc_id": pa.array(ids[idx]),
                         "lang": pa.array(langs.to_numpy(dtype=object)[idx],
                                          pa.string()),
                         "copy_idx": pa.array(copy_idx.astype(np.int64))})

    return docs.map_batches(expand, batch_format="pyarrow")


SQL_BALANCED_RESAMPLE = (
    "WITH c AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY 1), "
    "t AS (SELECT MAX(c) AS target FROM c), "
    "r AS (SELECT d.doc_id, d.lang, LEAST(t.target // c.c + "
    "CASE WHEN d.doc_id % c.c < t.target % c.c THEN 1 ELSE 0 END, 16) AS reps "
    "FROM documents d JOIN c USING (lang) CROSS JOIN t) "
    "SELECT r.doc_id, r.lang, g.x AS copy_idx "
    "FROM r JOIN range(16) g(x) ON g.x < r.reps"
)


FEATURE_DIM = 64          # hashing-trick output dimensionality
_FH_MOD = 1_000_003       # rolling-hash modulus (prime)


def _word_buckets(words: "np.ndarray") -> "np.ndarray":
    """Codepoint rolling hash (Horner, base 31 mod 1e6+3) % FEATURE_DIM per
    word, vectorized by LENGTH GROUP: words of equal length become a dense
    (n, L) uint32 codepoint matrix (utf-32 reinterpret) and the Horner fold
    runs once per character position, not once per word.  Matches DuckDB's
    ``list_reduce`` over ``ascii()`` codepoints exactly (unicode included —
    parity asserted in the oracle check)."""
    import numpy as np

    out = np.zeros(len(words), dtype=np.int64)
    lens = np.array([len(w) for w in words])
    for ln in np.unique(lens):
        sel = lens == ln
        if ln == 0:
            continue
        arr = np.frombuffer("".join(words[sel]).encode("utf-32-le"),
                            dtype=np.uint32).reshape(-1, int(ln)).astype(np.int64)
        h = np.zeros(arr.shape[0], dtype=np.int64)
        for j in range(int(ln)):
            h = (h * 31 + arr[:, j]) % _FH_MOD
        out[sel] = h
    return out % FEATURE_DIM


def q_feature_hash(sf_dir: str):
    """FEATURE HASHING (the 'hashing trick' of large-scale text ML: fixed
    D-dimensional bag-of-words without a vocabulary pass) — each document's
    tokens are counted into ``FEATURE_DIM`` buckets by a deterministic
    codepoint rolling hash.  One partial pass (per-batch explode + per-batch
    (doc, bucket) counts, hashing each DISTINCT word once) + one bounded
    groupby; no global vocabulary is ever built, which is the entire point
    of the trick at 100 TB."""
    import numpy as np
    from ray.data.aggregate import Sum

    docs = _docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().fillna("").str.lower().str.split()
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        exploded = s.explode().dropna()
        if exploded.empty:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        words = exploded.to_numpy(dtype=object)
        uniq, inv = np.unique(words, return_inverse=True)
        buckets = _word_buckets(uniq)[inv]
        df = pd.DataFrame({"doc_id": doc_ids[exploded.index.to_numpy()],
                           "bucket": buckets, "n": 1})
        agg = df.groupby(["doc_id", "bucket"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    out = (docs.map_batches(partial, batch_format="pyarrow")
           .groupby(["doc_id", "bucket"])
           .aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    return out.astype({"doc_id": "int64", "bucket": "int64", "n": "int64"})


SQL_FEATURE_HASH = (
    "WITH w AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), "
    "'\\s+')) AS word FROM documents WHERE trim(text) <> ''), "
    "h AS (SELECT doc_id, list_reduce(list_prepend(0, "
    "list_transform(string_split(word, ''), c -> ascii(c))), "
    f"(a, b) -> (a * 31 + b) % {_FH_MOD}) % {FEATURE_DIM} AS bucket FROM w) "
    "SELECT doc_id, bucket, COUNT(*) AS n FROM h GROUP BY 1, 2"
)


def q_embed_cov(sf_dir: str):
    """EMBEDDING SECOND-MOMENT (GRAM) MATRIX — the one-pass statistic behind
    PCA / whitening / covariance-conditioned indexes over a vector corpus:
    upper-triangle G[i,j] = sum_v q_i q_j over e6-quantized embeddings,
    plus the per-pair row count.

    Scale shape: each batch computes ONE integer matmul (Q^T Q, d x d) and
    emits d(d+1)/2 partial rows — the shuffle moves O(d^2 x batches) rows,
    never vectors; (i, j) packs into a single int64 key (multi-column
    groupby measured 17x slower, see q_copurchase) for one tiny groupby.
    Integer-exact: e6 products summed as int64 (|q| <= ~2e6, so a 100 TB
    corpus of ~1e12 rows stays under 4e30 — beyond int64; the documented
    scale path splits the fold into per-shard partial Grams reduced as
    float64 or HUGEINT-style two-limb ints).  The DuckDB unnest self-join
    twin reproduces the triangle bit-identically."""
    import numpy as np
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    emb = _emb(sf_dir, ["vec_id", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        V = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        q = round_half_away(V * 1e6).astype(np.int64)
        d = q.shape[1]
        G = q.T @ q
        iu, ju = np.triu_indices(d)
        return pa.table({"k": pa.array(iu.astype(np.int64) * d + ju),
                         "g_e12": pa.array(G[iu, ju]),
                         "n": pa.array(np.full(len(iu), len(q), dtype=np.int64))})

    out = (emb.map_batches(partial, batch_format="pyarrow")
           .groupby("k")
           .aggregate(Sum("g_e12", alias_name="g_e12"),
                      Sum("n", alias_name="n"))
           .to_pandas())
    d = int(np.sqrt(out["k"].max())) + 1
    out["i"] = (out["k"].astype("int64") // d).astype("int64")
    out["j"] = (out["k"].astype("int64") % d).astype("int64")
    out["g_e12"] = out["g_e12"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return (out[["i", "j", "n", "g_e12"]]
            .sort_values(["i", "j"], kind="stable").reset_index(drop=True))


SQL_EMBED_COV = (
    "WITH q AS (SELECT vec_id, "
    "CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim, "
    "CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000, 0) AS BIGINT) AS v "
    "FROM embeddings) "
    "SELECT a.dim AS i, b.dim AS j, COUNT(*) AS n, "
    "CAST(SUM(a.v * b.v) AS BIGINT) AS g_e12 "
    "FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.dim <= b.dim "
    "GROUP BY 1, 2"
)


DISTINCTIVE_SLICE_LANG = "en"
DISTINCTIVE_MIN_TF = 10


def q_distinctive_terms(sf_dir: str):
    """CORPUS KEYNESS (distinctive-terms mining — the slice-vs-rest
    "what characterises this subcorpus?" report of corpus linguistics and
    data-curation audits): per term, its frequency in the ``en`` slice vs
    the rest of the corpus and an INTEGER relative-risk score

        rr_e6 = tf_a * n_b * 10^6 // ((tf_b + 1) * n_a)

    (+1 smoothing on the contrast slice; n_a / n_b are slice token
    totals).  Integer-pure, so the DuckDB twin hashes bit-identically —
    no log-likelihood floats.

    Scale shape: ONE tokenize pass emits per-batch (word, slice) count
    partials (value_counts — vocabulary-bounded, Heaps' law), one
    word-keyed groupby folds both slices simultaneously (conditional
    sums, no second pass), slice token totals ride the same partials as
    two scalar aggregates.  The corpus never shuffles."""
    import numpy as np
    from ray.data.aggregate import Sum

    docs = _docs(sf_dir, ["text", "lang"])

    def part(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"text": t["text"].to_pandas().fillna(""),
                           "is_a": (t["lang"].to_pandas()
                                    == DISTINCTIVE_SLICE_LANG)})
        words = df["text"].str.lower().str.split()
        ex = df.assign(word=words).explode("word").dropna(subset=["word"])
        g = (ex.groupby(["word", "is_a"], sort=False)
             .size().reset_index(name="c"))
        return pa.table({"word": pa.array(g["word"], pa.string()),
                         "tf_a": pa.array(np.where(g["is_a"], g["c"], 0)
                                          .astype(np.int64)),
                         "tf_b": pa.array(np.where(g["is_a"], 0, g["c"])
                                          .astype(np.int64))})

    folded = (docs.map_batches(part, batch_format="pyarrow")
              .groupby("word")
              .aggregate(Sum("tf_a", alias_name="tf_a"),
                         Sum("tf_b", alias_name="tf_b"))
              .to_pandas())
    folded["tf_a"] = folded["tf_a"].astype("int64")
    folded["tf_b"] = folded["tf_b"].astype("int64")
    n_a = int(folded["tf_a"].sum())
    n_b = int(folded["tf_b"].sum())
    keep = folded[folded["tf_a"] >= DISTINCTIVE_MIN_TF].copy()
    # python-int folds: tf * n products exceed neither HUGEINT nor bignum
    keep["rr_e6"] = [
        (int(ta) * n_b * 10 ** 6) // ((int(tb) + 1) * n_a)
        for ta, tb in zip(keep["tf_a"], keep["tf_b"])]
    keep["rr_e6"] = keep["rr_e6"].astype("int64")
    return (keep[["word", "tf_a", "tf_b", "rr_e6"]]
            .sort_values("word", kind="stable").reset_index(drop=True))


def distinctive_terms_sql() -> str:
    return (
        "WITH w AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), "
        "'\\s+')) AS word, "
        f"(lang = '{DISTINCTIVE_SLICE_LANG}') AS is_a "
        "FROM documents WHERE trim(text) <> ''), "
        "f AS (SELECT word, "
        "CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS tf_a, "
        "CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS tf_b "
        "FROM w GROUP BY 1), "
        "tot AS (SELECT CAST(SUM(tf_a) AS BIGINT) AS n_a, "
        "CAST(SUM(tf_b) AS BIGINT) AS n_b FROM f) "
        "SELECT f.word, f.tf_a, f.tf_b, "
        "CAST((CAST(f.tf_a AS HUGEINT) * tot.n_b * 1000000) "
        "// ((f.tf_b + 1) * CAST(tot.n_a AS HUGEINT)) AS BIGINT) AS rr_e6 "
        "FROM f CROSS JOIN tot "
        f"WHERE f.tf_a >= {DISTINCTIVE_MIN_TF}"
    )


BIGRAM_PMI_MIN_N = 5


def q_bigram_pmi(sf_dir: str):
    """BIGRAM ASSOCIATION SCORING (collocation mining — the PMI-style
    lift statistic that finds multi-word expressions for tokenizer /
    phrase-table construction): for every bigram seen >= 5 times,

        lift_e6 = n_ab * N_uni^2 * 10^6 // (N_bi * n_a * n_b)

    i.e. P(ab) / (P(a)P(b)) as an EXACT integer ratio (log-free, so the
    DuckDB twin hashes bit-identically).

    Scale shape: one pass builds bigram partials (the `bigram_topk`
    combiner), one builds unigram partials (`word_freq`); both reduce to
    vocabulary-bounded tables (Heaps' law).  Unigram counts BROADCAST
    (ray.put) into the scoring map over the bigram table — the corpus
    never shuffles, and the python-bignum lift fold only touches the
    >= 5-count tail of each batch (the product exceeds int64 by design;
    HUGEINT twin)."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    docs = _docs(sf_dir, ["doc_id", "text"])

    def uni_partial(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().fillna("").str.lower().str.strip()
        ex = s.str.split().explode().dropna()
        vc = ex.value_counts()
        return pa.table({"word": pa.array(vc.index.to_numpy(dtype=object),
                                          pa.string()),
                         "n": pa.array(vc.to_numpy().astype(np.int64))})

    def bigram_partial(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().fillna("").str.lower().str.strip()
        ex = s.str.split().explode().dropna()
        nxt = ex.groupby(level=0).shift(-1)
        bg = (ex + " " + nxt).dropna()
        vc = bg.value_counts()
        return pa.table({"bigram": pa.array(vc.index.to_numpy(dtype=object),
                                            pa.string()),
                         "n": pa.array(vc.to_numpy().astype(np.int64))})

    uni = (docs.map_batches(uni_partial, batch_format="pyarrow")
           .groupby("word").aggregate(Sum("n", alias_name="n"))
           .to_pandas())          # vocabulary-bounded
    n_uni = int(uni["n"].sum())
    lut_ref = ray.put(dict(zip(uni["word"], uni["n"].astype("int64"))))

    bc = (docs.map_batches(bigram_partial, batch_format="pyarrow")
          .groupby("bigram").aggregate(Sum("n", alias_name="n_ab"))
          .materialize())
    n_bi = int(bc.sum("n_ab"))

    def score(t: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        df = pd.DataFrame({"bigram": t["bigram"].to_pandas(),
                           "n_ab": t["n_ab"].to_numpy(zero_copy_only=False)
                           .astype(np.int64)})
        df = df[df["n_ab"] >= BIGRAM_PMI_MIN_N]
        if not len(df):
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n_ab": pa.array([], pa.int64()),
                             "n_a": pa.array([], pa.int64()),
                             "n_b": pa.array([], pa.int64()),
                             "lift_e6": pa.array([], pa.int64())})
        parts = df["bigram"].str.split(" ", n=1, expand=True)
        na = parts[0].map(lut).to_numpy(np.int64)
        nb = parts[1].map(lut).to_numpy(np.int64)
        # >= 5-count tail only: the N_uni^2 product exceeds int64, so this
        # small fold runs in python bignum (HUGEINT in the twin)
        lift = np.fromiter(
            ((int(ab) * n_uni * n_uni * 10 ** 6) // (n_bi * int(a) * int(b))
             for ab, a, b in zip(df["n_ab"], na, nb)),
            dtype=np.int64, count=len(df))
        return pa.table({"bigram": pa.array(df["bigram"], pa.string()),
                         "n_ab": pa.array(df["n_ab"].to_numpy(np.int64)),
                         "n_a": pa.array(na), "n_b": pa.array(nb),
                         "lift_e6": pa.array(lift)})

    out = bc.map_batches(score, batch_format="pyarrow").to_pandas()
    for c in ("n_ab", "n_a", "n_b", "lift_e6"):
        out[c] = out[c].astype("int64")
    return out.sort_values("bigram", kind="stable").reset_index(drop=True)


def bigram_pmi_sql() -> str:
    return (
        "WITH t AS (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS w "
        "FROM documents WHERE trim(text) <> ''), "
        "uni AS (SELECT unnest(w) AS word FROM t), "
        "uc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM uni GROUP BY 1), "
        "nu AS (SELECT CAST(SUM(n) AS BIGINT) AS n_uni FROM uc), "
        "b AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1), "
        "i -> w[i] || ' ' || w[i + 1])) AS bigram FROM t), "
        "nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bi FROM b), "
        "bc AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n_ab FROM b "
        f"GROUP BY 1 HAVING COUNT(*) >= {BIGRAM_PMI_MIN_N}), "
        "s AS (SELECT bigram, n_ab, split_part(bigram, ' ', 1) AS wa, "
        "split_part(bigram, ' ', 2) AS wb FROM bc) "
        "SELECT s.bigram, s.n_ab, ua.n AS n_a, ub.n AS n_b, "
        "CAST((CAST(s.n_ab AS HUGEINT) * nu.n_uni * nu.n_uni * 1000000) "
        "// (CAST(nb.n_bi AS HUGEINT) * ua.n * ub.n) AS BIGINT) AS lift_e6 "
        "FROM s JOIN uc ua ON ua.word = s.wa JOIN uc ub ON ub.word = s.wb "
        "CROSS JOIN nu CROSS JOIN nb"
    )


def q_embed_pca(sf_dir: str):
    """EMBEDDING PCA PROJECTION (the dimensionality-reduction prep of
    vector-corpus curation: project every embedding onto the top-2
    principal axes of the corpus) — rows-only (eigendecomposition is not
    SQL-expressible); independent numpy oracle in
    tests/test_operators.py::TestEmbedPca.

    Scale shape: the covariance comes EXACTLY from the `q_embed_cov`
    integer Gram pass (one matmul per batch, d^2 partial rows — vectors
    never shuffle); the d x d eigenproblem solves on the DRIVER (constant
    work); the projection is one more stateless map pass with the
    centered eigenbasis BROADCAST.  Deterministic sign convention: each
    axis is flipped so its largest-|coefficient| component is positive
    (eigh is sign-ambiguous; retries/cluster sizes must agree)."""
    import numpy as np
    import ray

    gram = q_embed_cov(sf_dir)           # exact integer upper triangle
    d = int(gram["i"].max()) + 1
    n = int(gram["n"].iloc[0])
    G = np.zeros((d, d), dtype=np.float64)
    G[gram["i"], gram["j"]] = gram["g_e12"].to_numpy(np.int64)
    G = G + np.triu(G, 1).T              # symmetrize
    # dim sums for centering: Gram of q minus n * mean mean^T
    s = _emb_dim_sums(sf_dir, d)
    mean = s / float(n)
    cov = G / float(n) - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    axes = v[:, ::-1][:, :2]             # top-2 by eigenvalue
    for j in range(axes.shape[1]):       # deterministic sign
        k = int(np.argmax(np.abs(axes[:, j])))
        if axes[k, j] < 0:
            axes[:, j] = -axes[:, j]
    axes_ref = ray.put(axes)
    mean_ref = ray.put(mean)

    emb = _emb(sf_dir, ["vec_id", "embedding"])

    def project(t: pa.Table) -> pa.Table:
        from ..functions.rounding import round_half_away

        A = ray.get(axes_ref)
        m = ray.get(mean_ref)
        V = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        q = round_half_away(V * 1e6)
        P = (q - m[None, :]) @ A         # (rows, 2), e6-scaled coords
        return pa.table({"vec_id": t["vec_id"],
                         "pc1_e6": pa.array(P[:, 0]),
                         "pc2_e6": pa.array(P[:, 1])})

    out = emb.map_batches(project, batch_format="pyarrow").to_pandas()
    out["vec_id"] = out["vec_id"].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


def _emb_dim_sums(sf_dir: str, d: int) -> "np.ndarray":
    """Per-dimension e6 sums (one partial-agg pass, D rows per batch)."""
    import numpy as np
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    emb = _emb(sf_dir, ["vec_id", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        V = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        q = round_half_away(V * 1e6).astype(np.int64)
        return pa.table({"dim": pa.array(np.arange(q.shape[1], dtype=np.int64)),
                         "s": pa.array(q.sum(axis=0))})

    pdf = (emb.map_batches(partial, batch_format="pyarrow")
           .groupby("dim").aggregate(Sum("s", alias_name="s")).to_pandas())
    pdf = pdf.sort_values("dim")
    out = np.zeros(d, dtype=np.float64)
    out[pdf["dim"].astype(int)] = pdf["s"].astype("int64").to_numpy()
    return out


def q_vocab_growth(sf_dir: str):
    """VOCABULARY GROWTH CURVE (the Heaps'-law audit of corpus curation:
    distinct vocabulary as a function of corpus prefix — flattening means
    diminishing data value, spikes mean a domain shift): new-word counts
    and the running vocabulary at 256 doc-prefix checkpoints.

    Scale shape: one tokenize pass emits distinct (word, min doc_id)
    partials; a vocabulary-bounded groupby-MIN finds each word's FIRST
    document; first-docs bucket into <= 256 prefix checkpoints (width
    derived from max doc_id, so driver state is 256 rows at any corpus
    size); the cumulative curve is a driver cumsum over those rows.
    Hash-exact vs the window twin."""
    import numpy as np
    from ray.data.aggregate import Min as _Min

    docs = _docs(sf_dir, ["doc_id", "text"])

    def first_partial(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().fillna("").str.lower().str.strip()
        df = pd.DataFrame({"doc_id": t["doc_id"].to_numpy(zero_copy_only=False)
                           .astype(np.int64),
                           "word": s.str.split()})
        ex = df.explode("word").dropna(subset=["word"])
        g = ex.groupby("word", sort=False)["doc_id"].min().reset_index()
        return pa.table({"word": pa.array(g["word"], pa.string()),
                         "fd": pa.array(g["doc_id"].to_numpy(np.int64))})

    firsts = (docs.map_batches(first_partial, batch_format="pyarrow")
              .groupby("word").aggregate(_Min("fd", alias_name="fd"))
              .materialize())
    max_id = int(firsts.max("fd"))
    width = max_id // 256 + 1

    def bucketize(t: pa.Table) -> pa.Table:
        fd = t["fd"].to_numpy(zero_copy_only=False).astype(np.int64)
        vc = pd.Series(fd // width).value_counts()
        return pa.table({"bucket": pa.array(vc.index.to_numpy(np.int64)),
                         "new_words": pa.array(vc.to_numpy(np.int64))})

    from ray.data.aggregate import Sum as _Sum

    curve = (firsts.map_batches(bucketize, batch_format="pyarrow")
             .groupby("bucket").aggregate(_Sum("new_words",
                                               alias_name="new_words"))
             .to_pandas().sort_values("bucket").reset_index(drop=True))
    curve["bucket"] = curve["bucket"].astype("int64")
    curve["new_words"] = curve["new_words"].astype("int64")
    curve["vocab"] = curve["new_words"].cumsum().astype("int64")
    return curve


def vocab_growth_sql() -> str:
    return (
        "WITH w AS (SELECT doc_id, unnest(regexp_split_to_array("
        "lower(trim(text)), '\\s+')) AS word FROM documents "
        "WHERE trim(text) <> ''), "
        "f AS (SELECT word, MIN(doc_id) AS fd FROM w GROUP BY 1), "
        "mx AS (SELECT MAX(fd) AS m FROM f), "
        "c AS (SELECT fd // ((SELECT m FROM mx) // 256 + 1) AS bucket, "
        "COUNT(*) AS new_words FROM f GROUP BY 1) "
        "SELECT bucket, new_words, "
        "CAST(SUM(new_words) OVER (ORDER BY bucket) AS BIGINT) AS vocab "
        "FROM c"
    )


WINNOW_K = 3      # words per shingle
WINNOW_W = 4      # winnowing window (hashes per selection window)
WINNOW_MAX_DF = 20
WINNOW_MIN_SHARED = 3


def _horner_hash_raw(strs: "np.ndarray") -> "np.ndarray":
    """Raw codepoint Horner hash (base 31 mod 1e6+3) per string — the
    `_word_buckets` kernel WITHOUT the FEATURE_DIM reduction, vectorized
    by length group; matches DuckDB list_reduce over ascii() exactly."""
    import numpy as np

    out = np.zeros(len(strs), dtype=np.int64)
    lens = np.array([len(w) for w in strs])
    for ln in np.unique(lens):
        sel = lens == ln
        if ln == 0:
            continue
        arr = np.frombuffer("".join(strs[sel]).encode("utf-32-le"),
                            dtype=np.uint32).reshape(-1, int(ln)).astype(np.int64)
        h = np.zeros(arr.shape[0], dtype=np.int64)
        for j in range(int(ln)):
            h = (h * 31 + arr[:, j]) % _FH_MOD
        out[sel] = h
    return out


def q_winnow_pairs(sf_dir: str):
    """WINNOWING DOCUMENT FINGERPRINTS + plagiarism-candidate pairs (the
    MOSS local-fingerprinting algorithm, Schleimer et al. 2003, in its
    value-winnowing form): per document, hash every 3-word shingle
    (codepoint Horner — the engine's SQL-parity string hash), slide a
    4-hash window and keep the DISTINCT window minima as the document's
    fingerprints; documents sharing >= 3 fingerprints (df-capped at 20 to
    exclude boilerplate grams) become candidate pairs with their shared
    count.

    Scale shape: one tokenize pass per batch builds shingle hashes with a
    pandas shift-chain (no row loops) and window minima with a 4-way
    np.minimum fold guarded at doc boundaries; distinct (fingerprint,
    doc) rows shuffle ONCE keyed by fingerprint; each fingerprint group
    explodes to <= df^2/2 pairs only below the df cap (the dup_ngrams /
    copurchase triangle discipline); pair counts fold on a packed int64
    key.  Hash-exact vs the window-MIN SQL twin."""
    import numpy as np
    from ray.data.aggregate import Sum

    docs = _docs(sf_dir, ["doc_id", "text"])

    def fp_partial(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().fillna("").str.lower().str.strip()
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ex = s.str.split().explode().dropna()
        if ex.empty:
            return pa.table({"fp": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        w1 = ex
        w2 = ex.groupby(level=0).shift(-1)
        w3 = ex.groupby(level=0).shift(-2)
        gram = (w1 + " " + w2 + " " + w3).dropna()
        uniq, inv = np.unique(gram.to_numpy(dtype=object), return_inverse=True)
        h = _horner_hash_raw(uniq)[inv]
        doc_of = gram.index.to_numpy()
        # window minima over 4 consecutive hashes WITHIN a doc: 4-way
        # minimum of shifts, rows 0..2 of each doc excluded
        hs = pd.Series(h, index=doc_of)
        m = hs.copy()
        for k in (1, 2, 3):
            sh = hs.groupby(level=0).shift(k)
            m = np.minimum(m, sh.fillna(np.inf))
        valid = hs.groupby(level=0).cumcount() >= (WINNOW_W - 1)
        sel = pd.DataFrame({"doc_idx": doc_of[valid.to_numpy()],
                            "fp": m[valid.to_numpy()].astype(np.int64)})
        sel = sel.drop_duplicates()
        return pa.table({"fp": pa.array(sel["fp"].to_numpy(np.int64)),
                         "doc_id": pa.array(ids[sel["doc_idx"].to_numpy()])})

    from ray.data.aggregate import Count as _Count

    fps = (docs.map_batches(fp_partial, batch_format="pyarrow")
           .groupby(["fp", "doc_id"])  # cross-batch distinct
           .aggregate(_Count(alias_name="_n"))
           .select_columns(["fp", "doc_id"])
           .materialize())

    def add_fb(t: pa.Table) -> pa.Table:
        fp = t["fp"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("fb", pa.array(fp % 256))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized per BUCKET of fingerprints (never one Python call per
        # fp — the copurchase size-class triangle discipline): sort by
        # (fp, doc), segment, expand each df size class in one fancy-index
        g = g.sort_values(["fp", "doc_id"], kind="stable")
        fp = g["fp"].to_numpy(np.int64)
        did = g["doc_id"].to_numpy(np.int64)
        starts = np.flatnonzero(np.concatenate([[True], fp[1:] != fp[:-1]]))
        sizes = np.diff(np.concatenate([starts, [len(fp)]]))
        keys = []
        for m in np.unique(sizes):
            if m < 2 or m > WINNOW_MAX_DF:
                continue
            seg = starts[sizes == m]
            mat = did[(seg[:, None] + np.arange(m)[None, :])]
            iu, ju = np.triu_indices(int(m), k=1)
            keys.append(((mat[:, iu].astype(np.int64) << 32)
                         | mat[:, ju].astype(np.int64)).ravel())
        if not keys:
            return pd.DataFrame({"key": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        k = np.concatenate(keys)
        return pd.DataFrame({"key": k, "n": np.ones(len(k), np.int64)})

    pc_ = (fps.map_batches(add_fb, batch_format="pyarrow")
           .groupby("fb").map_groups(bucket_pairs, batch_format="pandas")
           .map_batches(lambda t: t, batch_format="pyarrow")
           .groupby("key").aggregate(Sum("n", alias_name="n_shared"))
           .to_pandas())
    pc_ = pc_[pc_["n_shared"] >= WINNOW_MIN_SHARED].copy()
    key_np = pc_["key"].to_numpy(np.int64)
    pc_["doc_a"] = key_np >> 32
    pc_["doc_b"] = key_np & 0xFFFFFFFF
    pc_["n_shared"] = pc_["n_shared"].astype("int64")
    return (pc_[["doc_a", "doc_b", "n_shared"]]
            .sort_values(["doc_a", "doc_b"], kind="stable")
            .reset_index(drop=True))


def winnow_pairs_sql() -> str:
    return (
        "WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), "
        "'\\s+') AS w FROM documents WHERE trim(text) <> ''), "
        "g AS (SELECT doc_id, i AS pos, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram "
        "FROM t, unnest(generate_series(1, len(w) - 2)) AS u(i)), "
        "h AS (SELECT doc_id, pos, list_reduce(list_prepend(0, "
        "list_transform(string_split(gram, ''), c -> ascii(c))), "
        f"(a, b) -> (a * 31 + b) % {_FH_MOD}) AS hv FROM g), "
        "wm AS (SELECT doc_id, pos, MIN(hv) OVER (PARTITION BY doc_id "
        f"ORDER BY pos ROWS BETWEEN {WINNOW_W - 1} PRECEDING AND CURRENT ROW) "
        "AS fp, COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k FROM h), "
        f"f AS (SELECT DISTINCT doc_id, fp FROM wm WHERE k >= {WINNOW_W}), "
        "df AS (SELECT fp, COUNT(*) AS d FROM f GROUP BY 1), "
        f"ok AS (SELECT fp FROM df WHERE d BETWEEN 2 AND {WINNOW_MAX_DF}), "
        "p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM f a "
        "JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id "
        "WHERE a.fp IN (SELECT fp FROM ok)) "
        "SELECT doc_a, doc_b, COUNT(*) AS n_shared FROM p GROUP BY 1, 2 "
        f"HAVING COUNT(*) >= {WINNOW_MIN_SHARED}"
    )


CLUSTER_TERMS_MIN_TF = 5
CLUSTER_TERMS_TOPK = 5


def q_cluster_terms(sf_dir: str):
    """CLUSTER LABELING (the "what is actually in my clusters?" curation
    report: for every embedding-cluster label, the terms most
    over-represented in its documents vs the rest of the corpus) — the
    cross-modal composition of the vector table (labels) with the text
    table (tokens), scored by the integer relative-risk rule of
    `q_distinctive_terms` and cut to the top-5 per cluster.

    Scale shape: the doc -> label side ships as two sorted int64 arrays
    (`ray.put` + searchsorted — the dbscan lookup pattern; a partitioned
    join on doc_id is the documented swap beyond driver scale); one
    tokenize pass emits (label, word) count partials; one
    vocabulary-x-labels-bounded groupby; scoring + ranking fold on the
    driver over that bounded table in python bignum.  Hash-exact vs the
    HUGEINT window twin."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    lab = (_emb(sf_dir, ["vec_id", "label"]).to_pandas()
           .sort_values("vec_id"))
    ids = np.ascontiguousarray(lab["vec_id"].to_numpy(np.int64))
    lbl = np.ascontiguousarray(lab["label"].to_numpy(np.int64))
    ids_ref, lbl_ref = ray.put(ids), ray.put(lbl)

    docs = _docs(sf_dir, ["doc_id", "text"])

    def part(t: pa.Table) -> pa.Table:
        ia, la = ray.get(ids_ref), ray.get(lbl_ref)
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(ia, did)
        ok = (pos < len(ia)) & (ia[np.clip(pos, 0, len(ia) - 1)] == did)
        s = t["text"].to_pandas().fillna("").str.lower().str.strip()
        df = pd.DataFrame({"label": np.where(ok, la[np.clip(pos, 0,
                                                            len(ia) - 1)], -1),
                           "word": s.str.split()})
        df = df[df["label"] >= 0]
        ex = df.explode("word").dropna(subset=["word"])
        g = (ex.groupby(["label", "word"], sort=False)
             .size().reset_index(name="tf"))
        return pa.table({"label": pa.array(g["label"].to_numpy(np.int64)),
                         "word": pa.array(g["word"], pa.string()),
                         "tf": pa.array(g["tf"].to_numpy(np.int64))})

    c = (docs.map_batches(part, batch_format="pyarrow")
         .groupby(["label", "word"])
         .aggregate(Sum("tf", alias_name="tf"))
         .to_pandas())            # labels x vocabulary — bounded
    c["label"] = c["label"].astype("int64")
    c["tf"] = c["tf"].astype("int64")
    tf_all = c.groupby("word")["tf"].transform("sum").astype("int64")
    n_l = c.groupby("label")["tf"].transform("sum").astype("int64")
    n_total = int(c["tf"].sum())
    c["tf_rest"] = (tf_all - c["tf"]).astype("int64")
    n_rest = n_total - n_l
    keep = c[c["tf"] >= CLUSTER_TERMS_MIN_TF].copy()
    keep["score_e6"] = [
        (int(tl) * int(nr) * 10 ** 6) // ((int(tr) + 1) * int(nl))
        for tl, tr, nl, nr in zip(keep["tf"], keep["tf_rest"],
                                  n_l[keep.index], n_rest[keep.index])]
    keep["score_e6"] = keep["score_e6"].astype("int64")
    keep = (keep.sort_values(["label", "score_e6", "word"],
                             ascending=[True, False, True], kind="stable")
            .groupby("label").head(CLUSTER_TERMS_TOPK))
    out = keep.rename(columns={"tf": "tf_l"})[
        ["label", "word", "tf_l", "tf_rest", "score_e6"]]
    return out.sort_values(["label", "word"], kind="stable") \
        .reset_index(drop=True)


def cluster_terms_sql() -> str:
    return (
        "WITH dl AS (SELECT CAST(e.label AS BIGINT) AS label, d.text "
        "FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id), "
        "w AS (SELECT label, unnest(regexp_split_to_array(lower(trim(text)), "
        "'\\s+')) AS word FROM dl WHERE trim(text) <> ''), "
        "c AS (SELECT label, word, CAST(COUNT(*) AS BIGINT) AS tf "
        "FROM w GROUP BY 1, 2), "
        "tot AS (SELECT label, CAST(SUM(tf) AS BIGINT) AS nl "
        "FROM c GROUP BY 1), "
        "g AS (SELECT word, CAST(SUM(tf) AS BIGINT) AS tf_all "
        "FROM c GROUP BY 1), "
        "at AS (SELECT CAST(SUM(tf) AS BIGINT) AS n FROM c), "
        "s AS (SELECT c.label, c.word, c.tf AS tf_l, "
        "g.tf_all - c.tf AS tf_rest, tot.nl, at.n - tot.nl AS n_rest "
        "FROM c JOIN g USING (word) JOIN tot USING (label) CROSS JOIN at "
        f"WHERE c.tf >= {CLUSTER_TERMS_MIN_TF}), "
        "r AS (SELECT label, word, tf_l, tf_rest, "
        "CAST((CAST(tf_l AS HUGEINT) * n_rest * 1000000) "
        "// ((tf_rest + 1) * CAST(nl AS HUGEINT)) AS BIGINT) AS score_e6 "
        "FROM s), "
        "k AS (SELECT label, word, tf_l, tf_rest, score_e6, "
        "ROW_NUMBER() OVER (PARTITION BY label "
        "ORDER BY score_e6 DESC, word) AS rn FROM r) "
        f"SELECT label, word, tf_l, tf_rest, score_e6 FROM k "
        f"WHERE rn <= {CLUSTER_TERMS_TOPK}"
    )


TRENDING_TOPK = 5


def q_trending_terms(sf_dir: str):
    """TRENDING TERMS (the per-window top-k report of monitoring / feed
    pipelines): for every event DAY, the 5 most frequent words across the
    day's documents — documents assigned to days deterministically by
    ``doc_id`` mapped onto the events date domain (the corpus has no
    timestamp column; the mapping rule is mirrored in SQL).

    Scale shape: one tokenize pass emits (day, word) count partials; one
    days x vocabulary-bounded groupby; the top-k cut folds on the driver
    over that bounded table with the (count desc, word asc) tie-break of
    the ROW_NUMBER twin."""
    import numpy as np
    from ray.data.aggregate import Sum

    docs = _docs(sf_dir, ["doc_id", "text"])

    def part(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["text"].to_pandas().fillna("").str.lower().str.strip()
        df = pd.DataFrame({"day": did % 30, "word": s.str.split()})
        ex = df.explode("word").dropna(subset=["word"])
        g = (ex.groupby(["day", "word"], sort=False)
             .size().reset_index(name="n"))
        return pa.table({"day": pa.array(g["day"].to_numpy(np.int64)),
                         "word": pa.array(g["word"], pa.string()),
                         "n": pa.array(g["n"].to_numpy(np.int64))})

    c = (docs.map_batches(part, batch_format="pyarrow")
         .groupby(["day", "word"])
         .aggregate(Sum("n", alias_name="n"))
         .to_pandas())            # days x vocabulary — bounded
    c["day"] = c["day"].astype("int64")
    c["n"] = c["n"].astype("int64")
    out = (c.sort_values(["day", "n", "word"],
                         ascending=[True, False, True], kind="stable")
           .groupby("day").head(TRENDING_TOPK))
    return (out[["day", "word", "n"]]
            .sort_values(["day", "word"], kind="stable")
            .reset_index(drop=True))


def trending_terms_sql() -> str:
    return (
        "WITH w AS (SELECT doc_id % 30 AS day, "
        "unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word "
        "FROM documents WHERE trim(text) <> ''), "
        "c AS (SELECT day, word, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM w GROUP BY 1, 2), "
        "r AS (SELECT day, word, n, ROW_NUMBER() OVER (PARTITION BY day "
        "ORDER BY n DESC, word) AS rn FROM c) "
        f"SELECT day, word, n FROM r WHERE rn <= {TRENDING_TOPK}"
    )
