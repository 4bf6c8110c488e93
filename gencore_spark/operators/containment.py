"""Containment (truncation) dedup candidates: docs that are near-subsets
of another doc.

A truncated refetch / AMP variant / paywall cutoff shares a PREFIX with
its source: Jaccard(half, whole) ≈ 0.5, far below any near-dup threshold,
so MinHash-LSH — whose collision probability IS the Jaccard — structurally
misses it.  Containment |A∩B|/|A| ≈ 1.0 is the right measure (the
reference's ``isPartOf`` prefix-containment has exactly this asymmetry,
``bamutil.cpp:293-336``; ``functions/similarity.py::containment`` is the
pairwise kernel).  This operator generates the CANDIDATE pairs at corpus
scale with a bottom-k gram sketch:

1. distinct word n-grams per doc, folded to ``md5`` hex digests (the
   bottom-``k`` selection ORDERS BY the digest, so the digest must be
   byte-identical in the DuckDB oracle — md5 is, xxhash64 is not; a
   deployment free of that constraint would fold to xxhash64 and move
   8 bytes per gram instead of 32 — one line, same plan shape);
2. drop grams occurring in > ``max_df`` docs (ubiquitous boilerplate
   grams would otherwise pair everything with everything — the same
   frequency cap every inverted-index joiner needs).  The cap is applied
   BEFORE sketching so probe and posting sides see the same gram set;
3. per doc, the ``k`` smallest gram hashes (a bottom-k sketch: an
   order-statistics uniform sample of the doc's gram set);
4. probe the postings with the sketch grams: for docs A, B the match
   count over A's sketch estimates containment(A in B) as m/k_eff —
   unbiased because bottom-k of A is a uniform sample of A's grams.

Scale shape: two hash aggs (postings df, per-doc sketch via sort+slice in
the agg buffer — never a window), one equi-join keyed on the gram hash
whose fan-out is bounded by ``max_df``, one pair agg.  All JVM.

Emits ``(id_a, id_b, est_containment)`` with est ≥ ``tau`` and
``id_a != id_b`` — A (the contained/truncated doc) on the left.  Exact
re-verification plugs in downstream via the pairwise kernel where the
estimate is not enough (same split as LSH bucketing → verify_pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .decontam import _exploded_grams


def containment_candidates(
    df: DataFrame,
    n: int = 8,
    k: int = 16,
    tau: float = 0.8,
    max_df: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    grams = _exploded_grams(df, [id_col], text_col, n).select(
        id_col, F.md5("gram").alias("gh")
    )
    rare = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("gh")
    )
    postings = grams.join(rare, "gh")
    sketch = postings.groupBy(id_col).agg(
        F.slice(F.array_sort(F.collect_list("gh")), 1, k).alias("bk")
    )
    probes = sketch.select(
        F.col(id_col).alias("id_a"),
        F.least(F.size("bk"), F.lit(k)).alias("k_eff"),
        F.explode("bk").alias("gh"),
    )
    pairs = (
        probes.join(postings.select(F.col(id_col).alias("id_b"), "gh"), "gh")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.first("k_eff").alias("k_eff"),
        )
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.round(F.col("m") / F.col("k_eff").cast("double"), 6).alias(
            "est_containment"
        ),
    ).filter(F.col("est_containment") >= tau)
