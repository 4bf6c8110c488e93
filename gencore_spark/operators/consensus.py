"""Stage 6: per-cluster consensus vote — elect one canonical doc.

Reference analog: ``makeConsensus`` per-base weighted majority vote
(``group.cpp:320-579``) + representative-read election
(``group.cpp:196-267``) + duplex merge (``cluster.cpp:119-168``).

Ours votes on whole fields over the cluster's member rows.  Documented
deterministic tie-break (the analog of gencore's score → qual → shorter
ladder, ``group.cpp:394-501``):

1. winning text = most member votes (exact text_hash count) —
   **votes desc**;
2. tie → **shorter text** (gencore: most-contained/shorter read wins);
3. tie → **text_hash asc** (pure determinism);
4. canonical row among winning-text rows: **url asc**, then **warc_ts asc**
   (earliest fetch of the lexicographically-first url form).

Output columns (the FR/RR aux-tag analog, ``pair.cpp:54-68``):

* ``fr``  — cluster size (supporting docs, incl. the canonical);
* ``rr``  — mirror-variant support: member urls that normalize to the
  canonical's mirror key (http/https × www × trailing slash folded), minus
  the canonical itself — the duplex-strand count analog;
* ``n_variants`` — distinct texts in the cluster (the NM-delta analog).

Everything is JVM-side DataFrame ops (two aggregations + one window); no
Python in this stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..config import DedupConfig

def mirror_key(url_col="url"):
    """http/https, leading www., trailing slash folded — the duplex mirror
    key (the normalized-UMI-halves analog, ``cluster.cpp:246-258``)."""
    return F.regexp_replace(
        F.regexp_replace(F.col(url_col), r"^https?://(www\.)?", ""), r"/$", ""
    )


def consensus_vote(
    members: DataFrame, cfg: DedupConfig, min_cluster_size: int | None = None
) -> DataFrame:
    """members (doc_id, url, warc_ts, html, text, lang, text_hash,
    cluster_id) → one canonical row per cluster with fr/rr/n_variants.

    ``min_cluster_size`` (A7 ``supporting_reads`` gate,
    ``cluster.cpp:138-182``): clusters smaller than it are dropped when set.
    """
    m = members.withColumn("mirror_key", mirror_key())

    votes = m.groupBy("cluster_id", "text_hash").agg(
        F.count(F.lit(1)).alias("votes")
    )
    stats = m.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("fr"),
        F.countDistinct("text_hash").alias("n_variants"),
    )

    w = Window.partitionBy("cluster_id").orderBy(
        F.col("votes").desc(),
        F.length("text").asc(),
        F.col("text_hash").asc(),
        F.col("url").asc(),
        F.col("warc_ts").asc(),
    )
    ranked = (
        m.join(votes, ["cluster_id", "text_hash"])
        .withColumn("rn", F.row_number().over(w))
    )
    canonical = ranked.filter(F.col("rn") == 1).drop("rn", "votes")

    mirror_counts = (
        m.groupBy("cluster_id", "mirror_key")
        .agg(F.count(F.lit(1)).alias("mirror_n"))
    )
    out = (
        canonical.join(mirror_counts, ["cluster_id", "mirror_key"])
        .join(stats, "cluster_id")
        .withColumn("rr", (F.col("mirror_n") - F.lit(1)).cast("int"))
        .drop("mirror_n", "mirror_key")
    )
    gate = min_cluster_size if min_cluster_size is not None else cfg.min_cluster_size
    if gate > 1:
        out = out.filter(F.col("fr") >= gate)
    return out
