"""Corpus-trained n-gram language-model perplexity scoring (CCNet-style).

CCNet (Wenzek et al. 2020) ranks web documents by the perplexity of a
KenLM 5-gram model trained on Wikipedia and keeps the low-perplexity
"head"; the same signal drives quality bucketing in RefinedWeb and
FineWeb.  This operator is that stage re-expressed Spark-first: a
word-bigram LM with additive (Laplace) smoothing, trained on a reference
corpus (``train_df`` — the "clean" corpus; defaults to the scored corpus
itself, which flags statistically unusual documents as high-perplexity
outliers), scored entirely with JVM built-ins.

The reference's analog is its quality-score ladder over read evidence
(``/root/reference/src/pairs.cpp`` scoring); here the "evidence" is the
corpus's own token statistics.

Model (standard bigram with add-alpha smoothing):

    P(w2 | w1) = (C(w1 w2) + alpha) / (C1(w1) + alpha * V)

where ``C(w1 w2)`` is the bigram count in the training corpus, ``C1(w1)``
is w1's count as a *bigram left context* (so the conditional sums to 1
over the vocabulary), and ``V`` is the training vocabulary size.  A doc's
score is the mean log-probability over its bigram occurrences;
``perplexity = exp(-avg_logprob)``.

Scale shape (what survives 100 TB):

* tokens never leave their doc row until the bigram explode; document
  TEXT never shuffles — only (doc_id, w1, w2) triples (or their 8-byte
  hashes, see ``digest``) move;
* the two count tables are plain groupBy aggregations with map-side
  partial combine; at web scale the vocabulary is millions of rows —
  far smaller than the corpus — so AQE turns the scoring joins into
  broadcasts when they fit and falls back to a key-shuffle join when
  they don't.  Either way the join key is the gram, never the doc;
* ``digest="xxhash64"`` replaces token strings with 8-byte hashes the
  moment they are exploded, so the count tables and every shuffle carry
  longs (the same parity pattern as ``operators/containment.py``:
  ``digest="words"`` keeps string keys so a SQL oracle can recompute the
  model exactly — DuckDB has no xxhash64);
* the only driver-side values are two scalars (V and a train row count)
  — 1-row aggregations, not data collects.

Determinism: ``avg_logprob`` is rounded to 6dp and ``perplexity`` is
computed from the ROUNDED average (then rounded to 4dp), so the oracle
and the Spark plan — which sum floats in different orders — agree
bit-for-bit after rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_TOKEN_SPLIT = r"\s+"


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, ws: array<string>) — lowercased whitespace tokens, empties
    dropped (split of '' yields [''], the only empty-token case after
    trim)."""
    ws = F.split(F.lower(F.trim(F.col(text_col))), _TOKEN_SPLIT)
    return df.select(F.col(id_col).alias("__id"), ws.alias("ws")).select(
        "__id", F.filter("ws", lambda w: F.length(w) > 0).alias("ws")
    )


def _bigrams(tok: DataFrame, digest: str) -> DataFrame:
    """Explode (id, w1, w2) bigram occurrences from token arrays.

    The array is already bound to an attribute (``ws``), so the
    higher-order ``transform`` lambda — CodegenFallback, interpreted per
    element — indexes a materialized array instead of re-running the
    regex split per gram (the repetition_signals lesson, COVERAGE.md).
    """
    pairs = tok.select(
        "__id",
        F.when(
            F.size("ws") >= 2,
            F.expr(
                "transform(sequence(0, size(ws) - 2), "
                "i -> struct(ws[i] AS w1, ws[i + 1] AS w2))"
            ),
        ).otherwise(F.expr("array()")).alias("bgs"),
    )
    e = pairs.select("__id", F.explode("bgs").alias("bg")).select(
        "__id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    if digest == "xxhash64":
        # 8-byte keys on every downstream shuffle/join; the strings are
        # dropped here and never move again
        return e.select(
            "__id",
            F.xxhash64("w1").alias("w1"),
            F.xxhash64("w2").alias("w2"),
        )
    if digest != "words":
        raise ValueError(f"digest must be 'words' or 'xxhash64', got {digest!r}")
    return e


def bigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    train_df: DataFrame | None = None,
    digest: str = "words",
) -> DataFrame:
    """Per-document bigram-LM perplexity under a model trained on
    ``train_df`` (default: ``df`` itself — self-perplexity, the
    no-external-model variant that still ranks statistical outliers).

    Output, one row per input document:

    * ``n_tokens``    — token count after normalization;
    * ``n_bigrams``   — bigram occurrences scored (``n_tokens - 1``, 0
      for docs under 2 tokens);
    * ``avg_logprob`` — mean ln P(w2|w1) over occurrences, 6dp (NULL when
      ``n_bigrams = 0``);
    * ``perplexity``  — exp(-avg_logprob) computed from the rounded
      average, 4dp (NULL when ``n_bigrams = 0``).

    Bigrams/contexts unseen in training fall back to the smoothed floor
    (alpha / (alpha * V) = 1/V for a fully unseen context) via the left
    joins + coalesce — so scoring a held-out corpus against a clean
    training corpus (the CCNet deployment shape) needs no special casing.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0 (smoothing floor), got {alpha}")
    tok = _tokens(df, text_col, id_col)
    train_tok = tok if train_df is None else _tokens(train_df, text_col, id_col)
    train_bg = _bigrams(train_tok, digest)

    # training statistics: bigram counts, left-context counts (derived
    # from the bigram table — one aggregation feeding the other, so the
    # conditional normalizes exactly), vocabulary size (1-row collect)
    c12 = train_bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = c12.groupBy("w1").agg(F.sum("n12").alias("n1"))
    vocab_toks = train_tok.select(F.explode("ws").alias("w"))
    if digest == "xxhash64":
        vocab_toks = vocab_toks.select(F.xxhash64("w").alias("w"))
    vocab = vocab_toks.agg(F.countDistinct("w").alias("v")).collect()[0]["v"]

    score_bg = train_bg if train_df is None else _bigrams(tok, digest)
    lp = F.log(
        (F.coalesce(F.col("n12"), F.lit(0)) + F.lit(float(alpha)))
        / (F.coalesce(F.col("n1"), F.lit(0)) + F.lit(float(alpha) * vocab))
    )
    scored = (
        score_bg.join(c12, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.avg(lp).alias("avg_lp"))
    )
    avg6 = F.round(F.col("avg_lp"), 6)
    return (
        tok.select("__id", F.size("ws").alias("n_tokens"))
        .join(scored, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            avg6.alias("avg_logprob"),
            F.round(F.exp(-avg6), 4).alias("perplexity"),
        )
    )
