"""Text-analysis operators for training-data pipelines.

These are first-class pipeline components beyond the reference's own
inventory (SURVEY.md §2 extension): language ID, quality scoring, token
counting, and document fingerprinting over a ``documents``-shaped table.
All JVM-side ``pyspark.sql.functions`` except the fingerprint (Arrow UDF).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from ..functions.shingle import shingle_hashes

# -------------------------------------------------------------- token count

_TOKEN_SPLIT = r"\s+"


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/null)."""
    t = F.trim(text)
    return F.when(F.coalesce(F.length(t), F.lit(0)) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, _TOKEN_SPLIT))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish subword proxy: word-boundary pieces + digit runs + punct.

    A regex segmentation (letters runs, digit runs, single punctuation)
    counted JVM-side — the standard cheap token estimator when no real
    tokenizer is shipped.
    """
    pieces = F.regexp_extract_all(
        text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
    )
    return F.coalesce(F.size(pieces), F.lit(0))


# ------------------------------------------------------------ quality score


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / digit / stopword-ratio features, all JVM-side.

    Ratios are rounded to 6dp so results are stable across engines (the
    DuckDB oracle computes identical expressions).
    """
    t = F.col(text_col)
    n = F.length(t).cast("double")
    tokens = token_count(t).cast("double")
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", "")).cast("double")
    digits = F.length(F.regexp_replace(t, r"[^0-9]", "")).cast("double")
    stop = F.size(
        F.regexp_extract_all(
            F.lower(t), F.lit(r"\b(the|a|an|and|or|of|to|in|is|it)\b"), 0
        )
    ).cast("double")
    safe_n = F.greatest(n, F.lit(1.0))
    safe_tok = F.greatest(tokens, F.lit(1.0))
    return df.select(
        "doc_id",
        n.cast("long").alias("n_chars_m"),
        tokens.cast("long").alias("n_tokens"),
        F.round(punct / safe_n, 6).alias("punct_ratio"),
        F.round(digits / safe_n, 6).alias("digit_ratio"),
        F.round(stop / safe_tok, 6).alias("stopword_ratio"),
        F.round(n / safe_tok, 6).alias("mean_token_len"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite 0-1 quality score from the features (documented weights)."""
    feats = quality_features(df, text_col)
    score = (
        F.lit(1.0)
        - F.least(F.col("punct_ratio") * 4.0, F.lit(0.3))
        - F.least(F.col("digit_ratio") * 3.0, F.lit(0.3))
        - F.when(F.col("n_tokens") < 10, 0.4).otherwise(0.0)
    )
    return feats.select(
        "doc_id", F.round(F.greatest(score, F.lit(0.0)), 6).alias("quality")
    )


# ------------------------------------------------------------- language ID

# tiny per-language marker lexicons (n-gram heuristic; deterministic)
_LANG_MARKERS = {
    "en": r"\b(the|and|of|to|is|that|with)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit)\b",
    "fr": r"\b(le|la|les|et|est|que|pour)\b",
    "es": r"\b(el|la|los|y|es|que|para)\b",
}


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of marker-word hit counts (JVM-side).

    Ties / no hits → 'und'.  A production system would swap in fastText;
    the operator contract (doc_id → lang_pred) is the same.
    """
    t = F.lower(F.col(text_col))
    hits = [
        F.size(F.regexp_extract_all(t, F.lit(rx), 0)).alias(f"h_{lang}")
        for lang, rx in _LANG_MARKERS.items()
    ]
    scored = df.select("doc_id", *hits)
    langs = list(_LANG_MARKERS)
    best = F.greatest(*[F.col(f"h_{lang}") for lang in langs])
    pred = F.when(best == 0, F.lit("und"))
    for lang in langs:  # first-match tie-break, fixed order
        pred = pred.when(F.col(f"h_{lang}") == best, F.lit(lang))
    return scored.select("doc_id", pred.otherwise(F.lit("und")).alias("lang_pred"))


# --------------------------------------------------------- fingerprinting


def fingerprint_udf(k: int = 8):
    """Rolling-hash document fingerprint: min k-gram hash (winnowing-style
    1-of-set selection) — a compact content id robust to reordering-free
    edits at the margins.  Arrow-batched; numpy kernel."""

    @F.pandas_udf(T.LongType())
    def _fp(text: pd.Series) -> pd.Series:
        out = np.zeros(len(text), dtype=np.int64)
        for i, t in enumerate(text):
            s = shingle_hashes(t or "", k)
            out[i] = int(s.min().view(np.int64)) if s.shape[0] else 0
        return pd.Series(out)

    return _fp
