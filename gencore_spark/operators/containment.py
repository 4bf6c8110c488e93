"""Containment (truncation) dedup: docs that are near-subsets of another
doc — candidate generation AND the exact-verify + collapse consumer.

A truncated refetch / AMP variant / paywall cutoff shares a PREFIX with
its source: Jaccard(half, whole) ≈ 0.5, far below any near-dup threshold,
so MinHash-LSH — whose collision probability IS the Jaccard — structurally
misses it.  Containment |A∩B|/|A| ≈ 1.0 is the right measure (the
reference's ``isPartOf`` prefix-containment has exactly this asymmetry,
``bamutil.cpp:293-336``; ``functions/similarity.py::containment`` is the
pairwise kernel).  :func:`containment_candidates` generates the CANDIDATE
pairs at corpus scale with a bottom-k gram sketch:

1. distinct word n-grams per doc, folded to a digest — ``xxhash64`` by
   default (8 bytes per gram on the shuffle — the deployment form) or
   ``md5`` hex (32 bytes; the bottom-``k`` selection ORDERS BY the digest,
   so a DuckDB oracle that must reproduce the sketch byte-for-byte needs a
   digest both engines compute identically — md5 is, xxhash64 is not.
   Same plan shape either way; the oracle queries pass ``digest="md5"``,
   pipelines keep the 8-byte default);
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

:func:`containment_dedup` closes the loop (the reference completes the
same circuit: ``isPartOf`` containment feeds the most-contained-read
election, ``group.cpp:196-267``): re-verify every candidate with the
EXACT gram-set containment (full distinct-gram sets, no ``max_df`` cap —
the true measure, computed as a gram-keyed join so no doc's gram set ever
sits in an aggregation buffer), then collapse each verified-contained doc
into its superset — the superset (larger gram set; ties to the smaller
id) wins the election.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .decontam import _exploded_grams


def _gram_digest(col: Column, digest: str) -> Column:
    """Fold a gram string to its shuffle key.  ``xxhash64`` (8-byte long)
    for pipelines; ``md5`` (32-byte hex) when a SQL oracle must reproduce
    the digest BYTES (bottom-k sketches order by them)."""
    if digest == "xxhash64":
        return F.xxhash64(col)
    if digest == "md5":
        return F.md5(col)
    raise ValueError(f"digest must be 'xxhash64' or 'md5', got {digest!r}")


def containment_candidates(
    df: DataFrame,
    n: int = 8,
    k: int = 16,
    tau: float = 0.8,
    max_df: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    digest: str = "xxhash64",
) -> DataFrame:
    """Emits ``(id_a, id_b, est_containment)`` with est ≥ ``tau`` and
    ``id_a != id_b`` — A (the contained/truncated doc) on the left."""
    grams = _exploded_grams(df, [id_col], text_col, n).select(
        id_col, _gram_digest(F.col("gram"), digest).alias("gh")
    )
    rare = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("gh")
    )
    # `grams` is evaluated twice (df stats above, postings below) — a
    # deliberate recompute-over-cache tradeoff: the gram explode is one
    # narrow codegen'd stage off a columnar scan, cheaper to re-run than
    # to pin |corpus|x|grams/doc| rows in cache at deployment scale.
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


def containment_dedup(
    df: DataFrame,
    n: int = 8,
    k: int = 16,
    cand_tau: float = 0.8,
    tau: float = 0.9,
    max_df: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    digest: str = "xxhash64",
) -> DataFrame:
    """Truncation dedup, end to end: one row per input doc,
    ``(doc_id, canonical_id)`` where a doc verified-contained in a LARGER
    doc folds into its best superset and every other doc maps to itself.
    Survivors are exactly the rows with ``canonical_id == doc_id``.

    Stages (mirroring the reference's candidate → exact containment →
    most-contained election ladder, ``group.cpp:196-267``):

    1. **candidates** — :func:`containment_candidates` at ``cand_tau``
       (the sketch estimate; recall margin below the exact gate).
    2. **exact re-verify** — true containment over each doc's FULL
       distinct-gram set (no ``max_df`` cap): ``m = |grams(A) ∩ grams(B)|``
       computed as a gram-keyed equi-join restricted (semi-join) to docs
       that appear in any candidate pair, so the fan-out is proportional
       to the candidate set, not the corpus, and no gram set is ever
       buffered whole.  Keep pairs with ``round(m/|grams(A)|, 6) >= tau``.
    3. **strict larger-wins ladder** — the container must have the larger
       gram set (ties: smaller id), so mutual-containment (near-identical)
       pairs remove exactly one side and the fold is acyclic.
    4. **election** — a doc contained in several supersets folds into the
       largest one (ties: smallest id), a ``min(struct)`` argmax — no
       window.

    A chain (A ⊂ B ⊂ C) folds stepwise: A → B, B → C; compose with
    ``connected_components`` for transitive roots if a consumer needs
    them — survivors are already exact either way.  Docs shorter than
    ``n`` words have no grams, are never candidates, and survive.
    """
    # Pin the candidate pairs: they are referenced 3x below (both sides of
    # the involved union + the m join), and EACH reference re-evaluates
    # the full candidate lineage — which itself explodes the corpus gram
    # table ~4x.  Unpinned, the round-6 plan audit counted ~15 corpus
    # gram-explode evaluations in one 1000-node physical plan (no exchange
    # reuse fires across the differently-pruned copies), with driver-side
    # planning of that tree a second-order cost on top.  The pin is
    # scale-safe: candidate pairs are two ids per row, proportional to the
    # near-dup structure, never the corpus.
    cands = containment_candidates(
        df, n, k, cand_tau, max_df, id_col, text_col, digest
    ).select("id_a", "id_b").localCheckpoint(eager=False)

    grams = _exploded_grams(df, [id_col], text_col, n).select(
        id_col, _gram_digest(F.col("gram"), digest).alias("gh")
    )
    involved = (
        cands.select(F.col("id_a").alias(id_col))
        .unionByName(cands.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # Pin the candidate-restricted gram table too (3 references: sz + both
    # m-join sides; each would re-run the corpus explode + semi-join).
    # Bounded by |involved docs| x grams/doc — candidate-proportional, the
    # same data the verify joins move anyway.
    g = grams.join(involved, id_col, "left_semi").localCheckpoint(eager=False)
    sz = g.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))

    m = (
        cands.join(g.select(F.col(id_col).alias("id_a"), "gh"), "id_a")
        .join(g.select(F.col(id_col).alias("id_b"), "gh"), ["id_b", "gh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    verified = (
        m.join(sz.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sz.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "cont", F.round(F.col("m") / F.col("sz_a").cast("double"), 6)
        )
        .filter(
            (F.col("cont") >= tau)
            & (
                (F.col("sz_b") > F.col("sz_a"))
                | ((F.col("sz_b") == F.col("sz_a")) & (F.col("id_b") < F.col("id_a")))
            )
        )
    )
    # election: fold into the largest superset, ties to the smallest id —
    # min(struct) argmax (partial-aggregable; no window)
    elected = verified.groupBy("id_a").agg(
        F.min(
            F.struct((-F.col("sz_b")).alias("__neg"), F.col("id_b").alias("__cid"))
        ).alias("w")
    )
    return (
        df.select(id_col)
        .join(
            elected.select(
                F.col("id_a").alias(id_col), F.col("w.__cid").alias("__canon")
            ),
            id_col,
            "left",
        )
        .select(
            id_col,
            F.coalesce(F.col("__canon"), F.col(id_col)).alias("canonical_id"),
        )
    )
