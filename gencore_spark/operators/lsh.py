"""Stage 3: LSH band bucketing → candidate pair generation, skew-aware.

Reference analog: the coordinate hash-agg that routes reads into
``clusters[tid][left][right]`` (``gencore.cpp:295-316,449-467``) — the
shuffle IS the cluster index — plus the low-complexity-cluster guard
(``group.cpp:142-175``, threshold ``options.cpp:31``) that kills quadratic
blowup on pathological groups.

Skew strategy (explicit, logged — BASELINE.json north_star requires it):

* buckets with ``size <= bucket_size_cap``: all-pairs self-join within the
  bucket (exact candidate semantics);
* buckets larger than the cap (boilerplate mega-buckets): **anchor-star**
  edges — every member is paired with the bucket's min-id member only.
  O(n) edges instead of O(n^2), and connectivity through the anchor means a
  true dup mega-cluster still collapses to ONE component after verify+CC.
  Unlike the reference (which silently drops such clusters,
  ``group.cpp:170-173``), recall is preserved; the choice is logged in the
  metrics (``n_capped_buckets``).

All joins below are equi-joins on ``(band_id, band_hash)``; AQE skew-join
splitting handles residual imbalance inside the cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import DedupConfig


def band_explode(signed: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(rep_id, minhash) → one row per (rep_id, band_id, band_hash).

    Pure JVM: band key = ``xxhash64(band_id, slice(minhash, band))`` —
    whole-stage-codegen'd, no Arrow round trip of the signature arrays.
    (The numpy ``band_hashes`` kernel remains as the tested reference
    implementation of band mixing; the pipeline key only needs to be a
    deterministic injective-ish mix, not that exact one.)
    """
    r = cfg.rows_per_band
    bands_expr = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_id"),
                F.xxhash64(F.lit(i), F.slice(F.col("minhash"), i * r + 1, r)).alias(
                    "band_hash"
                ),
            )
            for i in range(cfg.bands)
        ]
    )
    return signed.select(
        "rep_id", F.explode(bands_expr).alias("b")
    ).select("rep_id", "b.band_id", "b.band_hash")


def candidate_pairs(
    signed: DataFrame, cfg: DedupConfig
) -> tuple[DataFrame, DataFrame]:
    """Distinct candidate edges (id_a < id_b) + bucket-stat metrics df.

    Returns ``(edges, bucket_stats)`` where bucket_stats has one row per
    (band_id, band_hash) with its size and whether it was capped.
    """
    exploded = band_explode(signed, cfg)

    sizes = exploded.groupBy("band_id", "band_hash").agg(
        F.count(F.lit(1)).alias("bucket_size"),
        F.min("rep_id").alias("anchor_id"),
    )
    # singleton buckets generate no pairs — drop them before the join
    # (the dominant case: unique docs)
    active = sizes.filter(F.col("bucket_size") >= 2)

    tagged = exploded.join(
        active.withColumn("capped", F.col("bucket_size") > cfg.bucket_size_cap),
        ["band_id", "band_hash"],
    )

    small = tagged.filter(~F.col("capped"))
    a = small.select(
        "band_id", "band_hash", F.col("rep_id").alias("id_a")
    )
    b = small.select(
        "band_id", "band_hash", F.col("rep_id").alias("id_b")
    )
    pairs_small = (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )

    # anchor-star edges for capped mega-buckets
    pairs_big = (
        tagged.filter(F.col("capped") & (F.col("rep_id") != F.col("anchor_id")))
        .select(
            F.least("anchor_id", "rep_id").alias("id_a"),
            F.greatest("anchor_id", "rep_id").alias("id_b"),
        )
    )

    edges = pairs_small.unionByName(pairs_big).distinct()
    bucket_stats = sizes.withColumn(
        "capped", F.col("bucket_size") > cfg.bucket_size_cap
    )
    return edges, bucket_stats
