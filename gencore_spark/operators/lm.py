"""Corpus-trained n-gram language-model perplexity scoring (CCNet-style).

CCNet (Wenzek et al. 2020) ranks web documents by the perplexity of a
KenLM 5-gram model trained on Wikipedia and keeps the low-perplexity
"head"; the same signal drives quality bucketing in RefinedWeb and
FineWeb.  This operator is that stage re-expressed Spark-first: a
word-bigram LM with additive (Laplace) smoothing, trained on a reference
corpus (``train_df`` — the "clean" corpus; defaults to the scored corpus
itself, which flags statistically unusual documents as high-perplexity
outliers), scored entirely with JVM built-ins.

The reference's analog is its per-base quality scoring over read
evidence (``/root/reference/src/pair.cpp:70-88`` ``qual2score`` ladder,
consumed by the consensus vote in ``group.cpp``); here the "evidence" is
the corpus's own token statistics.

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
* ``digest="xxhash64"`` (the default) replaces token strings with 8-byte
  hashes the moment they are exploded, so the count tables and every
  shuffle carry longs.  The SQL oracle computes the same statistics over
  the strings; they diverge only on a 64-bit hash collision — the
  ``duplicate_passage_frac`` adjudication: at 10^12 distinct tokens the
  birthday bound perturbs counts at <1e-7 relative rate, acceptable for
  a quality *signal* (``digest="words"`` keeps string keys for exact
  symbolic parity; equivalence of the two modes is pytest-pinned);
* the only driver-side value is the vocabulary-size scalar — a 1-row
  aggregation, not a data collect;
* the result is eagerly pinned (localCheckpoint) so the operator can
  release its internal caches before returning — output is 5 narrow
  columns per doc.  At full deployment scale you would land it in a
  table instead; the eager pin is the library-call ergonomics choice.

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
    trim).  NULL text counts as empty — without the coalesce a NULL
    propagates to ``ws`` and ``size(NULL)`` is -1, not 0."""
    ws = F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), _TOKEN_SPLIT)
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
    digest: str = "xxhash64",
    eager: bool = True,
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
    # the token frame feeds three consumers (vocab scalar, training counts,
    # per-doc n_tokens) — pin ONE materialization or the regex split +
    # filter lineage re-runs per consumer (measured with the single-join
    # model below: 33.5s → ~5s at 60k docs).  Only the eager path caches:
    # the lazy path (eager=False) deliberately recomputes — the
    # deployment-scale recompute-over-cache choice, since nothing could
    # release the cache after the caller's own terminal action.
    tok = _tokens(df, text_col, id_col)
    train_tok = tok if train_df is None else _tokens(train_df, text_col, id_col)
    if eager:
        tok = tok.persist()
        train_tok = tok if train_df is None else train_tok.persist()
    try:
        train_bg = _bigrams(train_tok, digest)
        # training statistics: bigram counts, left-context counts (derived
        # from the bigram table — one aggregation feeding the other, so
        # the conditional normalizes exactly), vocab size (1-row collect)
        c12 = train_bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
        c1 = c12.groupBy("w1").agg(F.sum("n12").alias("n1"))
        vocab_toks = train_tok.select(F.explode("ws").alias("w"))
        if digest == "xxhash64":
            vocab_toks = vocab_toks.select(F.xxhash64("w").alias("w"))
        vocab = vocab_toks.agg(F.countDistinct("w").alias("v")).collect()[0]["v"]

        # fold the two count tables into ONE logprob model keyed on the
        # bigram: |distinct bigrams| rows ≪ occurrences, AQE broadcasts it
        # when it fits, and scoring needs a single join instead of two
        lp_obs = F.log(
            (F.col("n12") + F.lit(float(alpha)))
            / (F.col("n1") + F.lit(float(alpha) * vocab))
        )
        model = c12.join(c1, "w1").select("w1", "w2", lp_obs.alias("lp"))

        if train_df is None:
            # self-trained: every scored bigram exists in the model by
            # construction — inner single join, no fallback arithmetic
            scored = train_bg.join(model, ["w1", "w2"])
        else:
            # held-out scoring: unseen bigram with a SEEN context backs
            # off to ln(alpha / (n1 + alpha*V)); fully unseen context to
            # ln(1/V) — the coalesce(n1, 0) covers both
            score_bg = _bigrams(tok, digest)
            lp_miss = F.log(
                F.lit(float(alpha))
                / (F.coalesce(F.col("n1"), F.lit(0)) + F.lit(float(alpha) * vocab))
            )
            scored = (
                score_bg.join(model, ["w1", "w2"], "left")
                .join(c1, "w1", "left")
                .withColumn("lp", F.coalesce("lp", lp_miss))
            )
        per_doc = scored.groupBy("__id").agg(
            F.count(F.lit(1)).alias("n_bigrams"), F.avg("lp").alias("avg_lp")
        )
        avg6 = F.round(F.col("avg_lp"), 6)
        out = (
            tok.select("__id", F.size("ws").alias("n_tokens"))
            .join(per_doc, "__id", "left")
            .select(
                F.col("__id").alias(id_col),
                F.col("n_tokens").cast("long").alias("n_tokens"),
                F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
                avg6.alias("avg_logprob"),
                F.round(F.exp(-avg6), 4).alias("perplexity"),
            )
        )
        # eagerly pin the result so the persisted inputs can be released
        # without the caller's later actions recomputing the whole model.
        # eager=False returns the lazy plan instead (plan inspection, or a
        # deployment-scale caller landing the result straight into a table
        # — there the token cache is released by ITS terminal action)
        return out.localCheckpoint(eager=True) if eager else out
    finally:
        if eager:
            tok.unpersist()
            if train_df is not None:
                train_tok.unpersist()
