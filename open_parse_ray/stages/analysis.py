"""Text-analysis stages over the ``documents`` table.

Large-scale training-data-pipeline operators: language ID, quality
scoring, token counting, fingerprinting. All are stateless vectorized
``map_batches`` stages; regexes are module-level compiled (once per
process). Column semantics are deliberately chosen to be expressible in
ANSI SQL so the DuckDB oracle can verify them bit-for-bit (integer
outputs only where float accumulation order would differ).
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict

import numpy as np
import pandas as pd

_WS_SPLIT = re.compile(r"\s+")
_ALPHA = re.compile(r"[a-zA-Z]")
_DIGIT = re.compile(r"[0-9]")
_UPPER = re.compile(r"[A-Z]")

# tiny deterministic stopword lists for the n-gram language heuristic
_STOPWORDS = {
    "en": {"the", "of", "and", "to", "in", "for", "with", "on", "is", "a"},
    "de": {"der", "die", "das", "und", "zu", "in", "für", "mit", "auf", "ist"},
    "fr": {"le", "la", "les", "et", "de", "pour", "avec", "sur", "est", "un"},
}


def n_tokens_sql_semantics(text: str) -> int:
    """Whitespace token count matching the SQL oracle exactly:
    0 for blank, else len(regexp_split_to_array(trim(text), '\\s+'))."""
    t = text.strip()
    if not t:
        return 0
    return len(_WS_SPLIT.split(t))


def token_count_batch(batch: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": [n_tokens_sql_semantics(t) for t in batch["text"]],
        }
    )


def fingerprint_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Exact content fingerprint = md5 hex (matches DuckDB md5())."""
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "fp": [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"]],
        }
    )


def rolling_fingerprint_batch(batch: pd.DataFrame, window: int = 16) -> pd.DataFrame:
    """Polynomial rolling-hash fingerprint (Rabin-Karp style) over the
    document — a cheap shift-resistant fingerprint for chunk-level dedup.
    Not SQL-expressible; covered by unit tests instead."""
    B, M = 1_000_003, (1 << 61) - 1
    fps = []
    for t in batch["text"]:
        data = t.encode("utf-8")
        h = 0
        best = 0
        pw = pow(B, window - 1, M) if len(data) >= window else 0
        for i, byte in enumerate(data):
            h = (h * B + byte) % M
            if i >= window:
                h = (h - data[i - window] * pw * B) % M
            if i >= window - 1:
                best = max(best, h)
        fps.append(best if len(data) >= window else (h % M))
    return pd.DataFrame({"doc_id": batch["doc_id"], "rolling_fp": fps})


def quality_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Integer quality metrics (SQL-replicable): char/word/alpha/digit/
    upper counts. Ratios are for the caller to derive."""
    texts = list(batch["text"])
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_chars": [len(t) for t in texts],
            "n_words": [n_tokens_sql_semantics(t) for t in texts],
            "n_alpha": [len(_ALPHA.findall(t)) for t in texts],
            "n_digit": [len(_DIGIT.findall(t)) for t in texts],
            "n_upper": [len(_UPPER.findall(t)) for t in texts],
        }
    )


class LangId:
    """Stopword + character-class language heuristic (stateful stage:
    tables built once per actor in __init__)."""

    def __init__(self):
        self.stopwords = _STOPWORDS
        self.word_re = re.compile(r"[^\W\d_]+", re.UNICODE)

    def predict(self, text: str) -> str:
        # CJK detection first
        n_cjk = sum(1 for ch in text[:400] if "一" <= ch <= "鿿")
        if n_cjk > 5:
            return "zh"
        words = [w.lower() for w in self.word_re.findall(text)]
        if not words:
            return "xx"
        scores = {
            lang: sum(1 for w in words if w in sw) / len(words)
            for lang, sw in self.stopwords.items()
        }
        best = max(scores, key=lambda k: (scores[k], k))
        return best if scores[best] >= 0.03 else "xx"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": [self.predict(t) for t in batch["text"]],
            }
        )


# ---------------------------------------------------------------------------
# Dataset-level wrappers
# ---------------------------------------------------------------------------


def read_documents(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def doc_stats_by_lang(sf_dir: str):
    """Per-language corpus stats. Pre-aggregates per batch (partials),
    then a tiny groupby over ~langs×blocks rows — never shuffles the
    full table."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = read_documents(sf_dir, columns=["lang", "n_chars"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("lang", as_index=False).agg(
            n_docs=("n_chars", "size"),
            total_chars=("n_chars", "sum"),
            min_chars=("n_chars", "min"),
            max_chars=("n_chars", "max"),
        )
        return g

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    out = partials.groupby("lang").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("total_chars", alias_name="total_chars"),
        Min("min_chars", alias_name="min_chars"),
        Max("max_chars", alias_name="max_chars"),
    )
    return out


def token_counts(sf_dir: str):
    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        token_count_batch, batch_format="pandas", batch_size=8192
    )


def fingerprints(sf_dir: str):
    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pandas", batch_size=8192
    )


def quality_scores(sf_dir: str):
    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        quality_batch, batch_format="pandas", batch_size=8192
    )


def langid_preds(sf_dir: str):
    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        LangId, batch_format="pandas", batch_size=8192, concurrency=(1, 4)
    )
