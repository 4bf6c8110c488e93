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
* :func:`streaming_near_dup_gate` — stream-static LSH band join of
  arriving pages against the existing canonical corpus
  (:func:`reps_band_table` of the s2_reps snapshot): probable near-dups of
  ALREADY-consolidated documents are flagged in-flight instead of sitting
  in storage until the next batch run (candidates only — batch re-verifies).
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


def reps_band_table(reps: DataFrame, cfg: DedupConfig = DEFAULT_CONFIG) -> DataFrame:
    """Static side of the near-dup gate: (rep_id, band_id, band_hash) for
    the existing canonical corpus — ``band_explode`` of the s2_reps
    snapshot (one row per distinct text per band).

    100 TB deployment note: this table is |distinct texts| x bands rows and
    is scanned by EVERY microbatch's stream-static join, so it should be
    written out bucketed on the join key (``.write.bucketBy(nb,
    "band_hash").sortBy("band_hash")``) — the per-batch join then reuses
    the bucketing instead of re-shuffling the static side each trigger;
    refresh it from the nightly batch consolidation run.
    """
    from ..operators.lsh import band_explode

    return band_explode(reps.select("rep_id", "minhash"), cfg)


def streaming_near_dup_gate(
    pages_stream: DataFrame,
    reps_bands: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    watermark: str = "1 hour",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Stream-static LSH gate: flag arriving pages that band-collide with
    the EXISTING canonical corpus, before they are ever stored.

    The lambda split (module docstring) leaves one gap: a page that is a
    near-dup of a document already consolidated in a *previous* batch run
    sits in storage until the next consolidation.  This gate closes it
    in-flight: the arriving page's MinHash bands (same pinned UDF + band
    key as the batch pipeline) are inner-joined against the static
    ``reps_bands`` table — any collision means "probable near-dup of an
    existing canonical", emitted as a candidate row for cheap downstream
    handling (quarantine, tag, or drop-and-count).

    Semantics (documented, not hidden):

    * **candidate, not verdict** — a band collision is the banding curve's
      candidate event (P = 1-(1-j^r)^b; >=0.999 at j>=0.8 under the
      pinned 32x4 config).  False positives at the curve's floor are
      expected; the periodic batch run re-verifies (exact Jaccard) exactly
      like batch candidates.  Nothing is silently dropped here.
    * **one row per arriving text** within the watermark horizon:
      ``dropDuplicatesWithinWatermark`` on the stream-side text hash
      collapses the per-band hits (and re-fetches inside the horizon);
      the emitted ``matched_rep`` is the hit that survived the dedup —
      *a* colliding canonical, evidence for the verifier, not an
      assignment.
    * state is bounded by the watermark, like every operator in this
      module.

    Output: ``(text_hash, url, <ts_col>, matched_rep, band_id)``.
    """
    from ..functions.udfs import minhash_udf
    from ..operators.lsh import band_explode

    enriched = (
        pages_stream.filter(F.col("text").isNotNull())
        .withColumn("text_hash", F.xxhash64("text"))
        .withColumn("norm_text", normalize_expr(F.col("text")))
        .withColumn("minhash", minhash_udf(cfg)(F.col("norm_text")))
        .select(F.col("text_hash").alias("rep_id"), "text_hash", "url",
                ts_col, "minhash")
    )
    bands = band_explode(
        enriched, cfg, passthrough=("text_hash", "url", ts_col)
    ).drop("rep_id")
    hits = bands.join(
        reps_bands.select(
            F.col("rep_id").alias("matched_rep"), "band_id", "band_hash"
        ),
        ["band_id", "band_hash"],
    )
    return (
        hits.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
        .select("text_hash", "url", ts_col, "matched_rep", "band_id")
    )
