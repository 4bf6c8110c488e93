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


def test_digest_param_xxhash_default_md5_optin(spark):
    # deployment default shuffles 8-byte xxhash64 gram keys; md5 is the
    # oracle-parity opt-in (32-byte hex) — plan-pinned
    d = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(20)))], "doc_id long, text string"
    )
    plan_x = containment_candidates(d)._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan_x and "md5" not in plan_x
    plan_m = containment_candidates(d, digest="md5")._jdf.queryExecution().executedPlan().toString()
    assert "md5" in plan_m


def test_containment_dedup_folds_truncations_into_superset(spark):
    from gencore_spark.operators.containment import containment_dedup

    whole = " ".join(f"alpha{i} beta{i}" for i in range(30))  # 60 words
    half = " ".join(whole.split()[:30])
    quarter = " ".join(whole.split()[:15])
    other = " ".join(f"gamma{i}" for i in range(40))
    d = spark.createDataFrame(
        [(1, whole), (2, half), (3, other), (4, quarter)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["canonical_id"] for r in containment_dedup(d).collect()}
    # half and quarter both fold into the whole (largest superset wins the
    # election even though quarter ⊂ half too); whole and other survive
    assert got == {1: 1, 2: 1, 3: 3, 4: 1}


def test_containment_dedup_recall_on_planted_halves(spark):
    # closed-form corpus: every doc gets a prefix-half twin at +1000 —
    # recall of the (half -> whole) fold must be 1.0
    from gencore_spark.operators.containment import containment_dedup

    rows = []
    for i in range(40):
        words = [f"d{i}w{j}" for j in range(24)]
        rows.append((i, " ".join(words)))
        rows.append((i + 1000, " ".join(words[:12])))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["canonical_id"] for r in containment_dedup(d).collect()}
    assert all(got[i + 1000] == i for i in range(40))   # every half folds
    assert all(got[i] == i for i in range(40))          # every whole survives


def test_containment_dedup_near_identical_removes_exactly_one(spark):
    # mutual containment (same gram set, different ids): the strict
    # (size, id) ladder keeps the smaller id and folds the larger
    from gencore_spark.operators.containment import containment_dedup

    t = " ".join(f"x{i}" for i in range(20))
    d = spark.createDataFrame([(7, t), (3, t)], "doc_id long, text string")
    got = {r["doc_id"]: r["canonical_id"] for r in containment_dedup(d).collect()}
    assert got == {3: 3, 7: 3}
