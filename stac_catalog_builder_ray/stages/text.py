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


def gopher_quality_batch(batch: pa.Table, id_col="doc_id", text_col="text") -> pa.Table:
    """Gopher-style document-quality filter flags (Rae et al. 2021 §A1.1
    heuristics adapted to the whitespace-token model shared with the SQL
    oracle).  All ratios are integer-exact (``x * 1e6 // n_tokens``) so the
    DuckDB twin matches bit-for-bit.

    Emitted per doc: n_tokens, mean_wordlen_e6, top_word_frac_e6 (repetition
    signal: most frequent word's share), stop_hits, alpha_frac_e6, and the
    combined ``keep`` flag:
      20 <= n_tokens <= 100_000, mean word length in [2, 10] chars,
      top word <= 20% of tokens, >= 1 stopword, >= 80% words contain a-z.
    One stateless vectorized pass; a doc never spans batches, so no shuffle.
    """
    s = batch[text_col].to_pandas().fillna("").str.lower().str.strip()
    toks = s.str.split()
    n_tokens = toks.str.len().fillna(0).astype("int64")

    ex = toks.explode().dropna()
    idx = np.arange(len(s))

    def per_doc(series, fill=0):
        return series.reindex(idx, fill_value=fill).astype("int64").to_numpy()

    wl_sum = per_doc(ex.str.len().groupby(level=0).sum())
    top_count = per_doc(ex.groupby([ex.index, ex]).size().groupby(level=0).max())
    stop_hits = per_doc(ex.isin(EN_STOPWORDS).groupby(level=0).sum())
    alpha_hits = per_doc(ex.str.contains("[a-z]", regex=True).groupby(level=0).sum())

    nt = n_tokens.to_numpy()
    safe = np.maximum(nt, 1)
    mean_wordlen_e6 = np.where(nt > 0, wl_sum * 1_000_000 // safe, 0)
    top_word_frac_e6 = np.where(nt > 0, top_count * 1_000_000 // safe, 0)
    alpha_frac_e6 = np.where(nt > 0, alpha_hits * 1_000_000 // safe, 0)

    keep = (
        (nt >= 20) & (nt <= 100_000)
        & (mean_wordlen_e6 >= 2_000_000) & (mean_wordlen_e6 <= 10_000_000)
        & (top_word_frac_e6 <= 200_000)
        & (stop_hits >= 1)
        & (alpha_frac_e6 >= 800_000)
    ).astype(np.int64)

    return pa.table({
        id_col: batch[id_col],
        "n_tokens": pa.array(nt),
        "mean_wordlen_e6": pa.array(mean_wordlen_e6.astype(np.int64)),
        "top_word_frac_e6": pa.array(top_word_frac_e6.astype(np.int64)),
        "stop_hits": pa.array(stop_hits),
        "alpha_frac_e6": pa.array(alpha_frac_e6.astype(np.int64)),
        "keep": pa.array(keep),
    })


PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?\d[\d\- ]{7,}\d"


class PiiRedactStage:
    """PII scrub (emails, phone numbers) — the standard pre-training text
    hygiene pass.  Regexes compile once per actor (T2 state); per batch one
    vectorized pandas ``str.count`` / ``str.replace`` pass.  Replacement
    order (emails first, then phones) is part of the contract and mirrored
    in SQL_PII_REDACT; both engines use leftmost-first greedy semantics
    (Python re / RE2), asserted on planted fixtures in
    ``test_operators::TestPiiRedact``."""

    def __init__(self, id_col="doc_id", text_col="text"):
        import re

        self.id_col, self.text_col = id_col, text_col
        self.email = re.compile(PII_EMAIL_RE)
        self.phone = re.compile(PII_PHONE_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch[self.text_col].to_pandas().fillna("")
        n_emails = s.str.count(self.email).astype("int64")
        red = s.str.replace(self.email, "<EMAIL>", regex=True)
        n_phones = red.str.count(self.phone).astype("int64")
        red = red.str.replace(self.phone, "<PHONE>", regex=True)
        return pa.table({
            self.id_col: batch[self.id_col],
            "n_emails": pa.array(n_emails.to_numpy()),
            "n_phones": pa.array(n_phones.to_numpy()),
            "redacted": pa.array(red.tolist(), pa.string()),
        })


def levenshtein_batch(a: "list[str]", b: "list[str]") -> "np.ndarray":
    """Vectorized edit distances for P string pairs: pairs group by their
    (len_a, len_b) combination and each combination runs ONE numpy DP —
    len_a x len_b iterations of P-wide vector ops instead of P Python DP
    tables.  Exact Levenshtein (unit insert/delete/substitute), matching
    DuckDB's ``levenshtein`` for the SQL twin."""
    import numpy as np

    P = len(a)
    out = np.zeros(P, dtype=np.int64)
    by_shape: dict = {}
    for i in range(P):
        by_shape.setdefault((len(a[i]), len(b[i])), []).append(i)
    for (la, lb), idx in by_shape.items():
        idx = np.asarray(idx)
        if la == 0 or lb == 0:
            out[idx] = max(la, lb)
            continue
        A = np.frombuffer("".join(a[i] for i in idx).encode("utf-32-le"),
                          dtype=np.uint32).reshape(len(idx), la)
        B = np.frombuffer("".join(b[i] for i in idx).encode("utf-32-le"),
                          dtype=np.uint32).reshape(len(idx), lb)
        row = np.tile(np.arange(lb + 1, dtype=np.int64), (len(idx), 1))
        for i in range(1, la + 1):
            new = np.empty_like(row)
            new[:, 0] = i
            ai = A[:, i - 1][:, None]
            cost = (ai != B).astype(np.int64)
            for j in range(1, lb + 1):
                new[:, j] = np.minimum(
                    np.minimum(row[:, j] + 1, new[:, j - 1] + 1),
                    row[:, j - 1] + cost[:, j - 1])
            row = new
        out[idx] = row[:, lb]
    return out
