"""Containment (truncation) dedup candidates."""

from __future__ import annotations

from pyspark.sql import functions as F

from gencore_spark.operators.containment import containment_candidates


def test_prefix_truncation_detected_one_directional(spark):
    whole = " ".join(f"alpha{i} beta{i}" for i in range(30))  # 60 words
    half = " ".join(whole.split()[:30])
    other = " ".join(f"gamma{i}" for i in range(40))
    d = spark.createDataFrame(
        [(1, whole), (2, half), (3, other)], "doc_id long, text string"
    )
    out = {(r["id_a"], r["id_b"]): r["est_containment"]
           for r in containment_candidates(d).collect()}
    assert out == {(2, 1): 1.0}  # half in whole; never the reverse


def test_jaccard_would_miss_what_containment_catches(spark):
    # the motivating case: Jaccard(half, whole) ~ 0.5 is far below the
    # near-dup threshold, yet the truncation IS a duplicate
    from gencore_spark.functions.similarity import jaccard_texts

    whole = " ".join(f"tok{i} filler{i}" for i in range(40))
    half = " ".join(whole.split()[:40])
    j = jaccard_texts(half, whole, 5)
    assert j < 0.7  # LSH at the pinned config would not bucket this pair
    d = spark.createDataFrame([(1, whole), (2, half)], "doc_id long, text string")
    got = containment_candidates(d).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(2, 1)]


def test_df_cap_drops_boilerplate_grams(spark):
    # one 8-gram shared by EVERY doc must not pair everything together
    boiler = "one two three four five six seven eight"
    rows = [(i, boiler + " " + " ".join(f"u{i}w{j}" for j in range(12)))
            for i in range(10)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = containment_candidates(d, max_df=5).collect()
    assert out == []  # the shared gram is capped away; bodies are disjoint


def test_short_docs_without_grams_are_silent(spark):
    d = spark.createDataFrame(
        [(1, "too few words here"), (2, "also tiny")], "doc_id long, text string"
    )
    assert containment_candidates(d).count() == 0
