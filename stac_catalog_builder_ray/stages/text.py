"""Text-analysis operators: token counting, quality scoring, language-ID
heuristic, document fingerprinting (training-data pipeline ops).

All are stateless vectorized ``map_batches`` functions over the ``documents``
schema (doc_id, text, lang, source, n_chars); the language-ID stage is an
actor class because it compiles token tables once (T2-style state).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

EN_STOPWORDS = ("the", "a", "and", "of", "to")
PUNCT_CLASS = ".,!?;:"


def token_count_batch(batch: pa.Table, id_col="doc_id", text_col="text") -> pa.Table:
    """Whitespace token count (pandas str.split at C speed)."""
    s = batch[text_col].to_pandas().fillna("")
    n = s.str.split().str.len().astype("int64")
    return pa.table({id_col: batch[id_col], "n_tokens": pa.array(n.to_numpy())})


def quality_score_batch(batch: pa.Table, id_col="doc_id", text_col="text") -> pa.Table:
    """Length/punctuation quality features + a combined score.

    Semantics mirrored exactly in SQL_QUALITY_SCORE: punct_count counts the
    chars in ``.,!?;:``; score = round(n_tokens / (1 + punct_count), 4)."""
    s = batch[text_col].to_pandas().fillna("")
    n_chars = s.str.len().astype("int64")
    n_tokens = s.str.split().str.len().astype("int64")
    from ..functions.rounding import round_half_away

    punct = s.str.count(r"[.,!?;:]").astype("int64")
    score = pd.Series(round_half_away(n_tokens / (1.0 + punct), 4))
    return pa.table(
        {
            id_col: batch[id_col],
            "n_chars": pa.array(n_chars.to_numpy()),
            "n_tokens": pa.array(n_tokens.to_numpy()),
            "punct_count": pa.array(punct.to_numpy()),
            "quality": pa.array(score.to_numpy()),
        }
    )


class LangIdStage:
    """Stopword-rate language heuristic (n-gram-free variant that is also
    SQL-expressible for the oracle): rate of English stopwords among tokens;
    predicts 'en' above ``threshold``.  Tables built once per actor."""

    def __init__(self, id_col="doc_id", text_col="text", threshold=0.05):
        self.id_col, self.text_col = id_col, text_col
        self.threshold = threshold
        self.stop = frozenset(EN_STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch[self.text_col].to_pandas().fillna("").str.lower()
        toks = s.str.split()
        n_tokens = toks.str.len().astype("int64")
        stop_hits = toks.map(lambda ws: sum(1 for w in ws if w in self.stop)).astype("int64")
        from ..functions.rounding import round_half_away

        with np.errstate(invalid="ignore"):
            rate = np.where(n_tokens > 0, stop_hits / np.maximum(n_tokens, 1), 0.0)
        # classify on the UNROUNDED rate (matches SQL_LANGID's CASE exactly);
        # rounding applies only to the emitted stop_rate column — a doc with
        # rate in (0.05, 0.05005] must still classify 'en'
        pred = np.where(rate > self.threshold, "en", "other")
        rate = round_half_away(rate, 4)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_tokens": pa.array(n_tokens.to_numpy()),
                "stop_hits": pa.array(stop_hits.to_numpy()),
                "stop_rate": pa.array(rate),
                "pred_lang": pa.array(pred.tolist(), pa.string()),
            }
        )


def fingerprint_batch(batch: pa.Table, id_col="doc_id", text_col="text",
                      window: int = 8) -> pa.Table:
    """Winnowing-style document fingerprint: min of rolling-window token-hash
    mixes -> one stable 64-bit fingerprint per doc (near-prefix-robust)."""
    from .dedup import hash_tokens, splitmix64, MASK64

    texts = batch[text_col].to_pylist()
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t or "").lower().split()
        if not toks:
            out[i] = 0
            continue
        h = hash_tokens(toks)
        if len(h) >= window:
            # rolling xor-mix over each window of size `window`
            roll = h.copy()
            for w in range(1, window):
                roll[: len(h) - w] = splitmix64(roll[: len(h) - w] ^ h[w:])
            roll = roll[: len(h) - window + 1]
        else:
            acc = h[0]
            for v in h[1:]:
                acc = splitmix64(np.uint64(acc) ^ np.uint64(v))
            roll = np.array([acc], dtype=np.uint64)
        v = int(roll.min() & MASK64)
        out[i] = v - (1 << 64) if v >= (1 << 63) else v
    return pa.table({id_col: batch[id_col], "fingerprint": pa.array(out)})
