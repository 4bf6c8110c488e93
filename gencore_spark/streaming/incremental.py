"""Structured Streaming front-end: incremental ingest dedup.

Scope note (SURVEY.md §2.9): the reference is a single-pass BATCH program —
its "streaming" (coordinate watermark + eviction ticks,
``gencore.cpp:318-390``) is a memory-bounding device, which batch shuffle
already subsumes.  What a web-scale ingest pipeline genuinely needs from
Structured Streaming is the *front door*: continuously arriving pages get
exact-deduped and signature-enriched incrementally, then periodic batch runs
of the full LSH/CC/vote pipeline consolidate near-dups (the standard
lambda-ish split — near-dup clustering is a global fixpoint computation and
does not stream).

* :func:`incremental_exact_dedup` — keep the first row per ``text_hash``
  within the watermark window (``dropDuplicatesWithinWatermark``), so
  re-crawls and mirror fetches are dropped at ingest before they ever hit
  storage.
* :func:`signature_stream` — enrich arriving pages with
  (text_hash, minhash, simhash) using the SAME pinned UDFs as the batch
  pipeline, so downstream batch consolidation never recomputes signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import DEFAULT_CONFIG, DedupConfig
from ..functions.udfs import signatures_udf
from ..operators.exact import normalize_expr


def incremental_exact_dedup(
    pages_stream: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Streaming exact dedup: first-seen row per text hash wins.

    State is bounded by the watermark (late re-crawls beyond it are handled
    by the periodic batch consolidation instead — document-level dedup does
    not need exactly-once global uniqueness at the ingest edge).
    """
    return (
        pages_stream.withColumn("text_hash", F.xxhash64("text"))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )


def signature_stream(
    pages_stream: DataFrame, cfg: DedupConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Attach (text_hash, norm_text, minhash, simhash) to arriving pages."""
    sig = signatures_udf(cfg)
    return (
        pages_stream.withColumn("text_hash", F.xxhash64("text"))
        .withColumn("norm_text", normalize_expr(F.col("text")))
        .withColumn("sig", sig(F.col("norm_text")))
        .withColumn("minhash", F.col("sig.minhash"))
        .withColumn("simhash", F.col("sig.simhash"))
        .drop("sig", "norm_text")
    )
