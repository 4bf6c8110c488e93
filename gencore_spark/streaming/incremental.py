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
* :func:`streaming_dup_counter` — custom stateful operator
  (``applyInPandasWithState``): per-text running duplication counter with
  event-time state eviction — the live analog of the reference's
  coordinate-watermark eviction tick (``gencore.cpp:318-390``): state for
  a text hash is dropped once the event-time watermark passes its last
  fetch + the configured gap, emitting the final support count.
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


def streaming_dup_counter(
    pages_stream: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "warc_ts",
    evict_gap_ms: int = 3_600_000,
) -> DataFrame:
    """Per-text running duplication counter with event-time state eviction.

    Output rows (update mode): ``(text_hash, first_url, first_ts, n_seen,
    final)`` — one row per key per microbatch while the key is live
    (``final=false``), plus one closing row (``final=true``) when the
    watermark passes ``last_ts + evict_gap_ms`` and the state is evicted.
    ``n_seen`` is the FR/supporting-reads analog, counted live.

    State per key is three scalars — bounded by the number of distinct
    texts inside the eviction horizon, exactly like the reference's
    in-flight cluster map between eviction ticks.
    """
    import pandas as pd  # local: keep module import light

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # Spark hands the UDF tz-NAIVE timestamps rendered in the session
    # timezone; GroupState timeouts want true epoch ms.  Capture the
    # session tz here (driver side) and localize before .timestamp() —
    # under a non-UTC session (e.g. an operator's spark-submit without the
    # PIPELINE_CONFS tz pin) a naive .timestamp() would shift every
    # eviction by the tz offset.
    session_tz = pages_stream.sparkSession.conf.get(
        "spark.sql.session.timeZone", "UTC"
    )

    out_schema = (
        "text_hash long, first_url string, first_ts timestamp, "
        "n_seen long, final boolean"
    )
    state_schema = "first_url string, first_ts timestamp, n_seen long, last_ms long"

    def update(key, pdfs, state: GroupState):
        (text_hash,) = key
        if state.hasTimedOut:
            first_url, first_ts, n_seen, _last = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "text_hash": [text_hash],
                    "first_url": [first_url],
                    "first_ts": [first_ts],
                    "n_seen": [n_seen],
                    "final": [True],
                }
            )
            return
        first_url, first_ts, n_seen, last_ms = (None, None, 0, 0)
        if state.exists:
            first_url, first_ts, n_seen, last_ms = state.get
        for pdf in pdfs:
            pdf = pdf.sort_values(["warc_ts", "url"])
            if first_url is None:
                first_url = pdf["url"].iloc[0]
                first_ts = pdf["warc_ts"].iloc[0]
            n_seen += len(pdf)
            ts_max = pdf["warc_ts"].max()
            if ts_max.tzinfo is None:
                ts_max = ts_max.tz_localize(session_tz)
            last_ms = max(last_ms, int(ts_max.timestamp() * 1000))
        state.update((first_url, first_ts, n_seen, last_ms))
        state.setTimeoutTimestamp(last_ms + evict_gap_ms)
        yield pd.DataFrame(
            {
                "text_hash": [text_hash],
                "first_url": [first_url],
                "first_ts": [first_ts],
                "n_seen": [n_seen],
                "final": [False],
            }
        )

    return (
        pages_stream.withColumn("text_hash", F.xxhash64("text"))
        .withWatermark(ts_col, watermark)
        .groupBy("text_hash")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
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
