"""BM25 lexical top-k retrieval."""

from __future__ import annotations

from pyspark.sql import functions as F

from gencore_spark.operators.bm25 import bm25_topk


def _corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "a fast auburn fox vaulted a sleepy hound"),
        (3, "stock markets rallied as tech shares surged today"),
        (4, "the lazy dog slept while the quick fox ran"),
        (5, "completely unrelated text about gardening and tulips"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_self_retrieval_ranks_source_first(spark):
    d = _corpus(spark)
    qs = spark.createDataFrame(
        [(100, "stock markets rallied")], "query_id long, text string"
    )
    out = bm25_topk(d, qs, k=3).collect()
    assert out[0]["rank"] == 1 and out[0]["doc_id"] == 3
    assert out[0]["score"] > 0


def test_rare_terms_outweigh_common(spark):
    d = _corpus(spark)
    # 'the' appears in 2 docs, 'gardening' in 1 -> doc 5 must beat
    # the 'the'-only matches for a query carrying both
    qs = spark.createDataFrame([(1, "the gardening")], "query_id long, text string")
    out = bm25_topk(d, qs, k=5).collect()
    assert out[0]["doc_id"] == 5


def test_topk_partitioning_independent(spark):
    rows = [(i, f"w{i % 17} common shared words plus t{i}") for i in range(300)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    qs = spark.createDataFrame([(1, "common shared w3")], "query_id long, text string")
    a = [(r["rank"], r["doc_id"]) for r in bm25_topk(d.repartition(11), qs, k=7).collect()]
    b = [(r["rank"], r["doc_id"]) for r in bm25_topk(d.coalesce(1), qs, k=7).collect()]
    assert a == b and len(a) == 7


def test_no_match_returns_empty(spark):
    d = _corpus(spark)
    qs = spark.createDataFrame([(1, "zzz qqq xxx")], "query_id long, text string")
    assert bm25_topk(d, qs, k=3).count() == 0


def test_empty_docs_never_match(spark):
    # split('') yields [''] — unfiltered, an empty doc would carry a ''
    # term (tf=1, df polluted) and a whitespace-only query would match it
    rows = [(1, ""), (2, "   "), (3, "real words here")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    qs = spark.createDataFrame(
        [(1, "  "), (2, "real words")], "query_id long, text string"
    )
    out = bm25_topk(d, qs, k=5).collect()
    assert all(r["doc_id"] == 3 for r in out)  # empty docs never surface
    assert {r["query_id"] for r in out} == {2}  # whitespace query matches nothing


def test_query_tf_weighting(spark):
    d = _corpus(spark)
    # repeated query term doubles its contribution under query_tf=True;
    # with set semantics both queries score identically
    q1 = spark.createDataFrame([(1, "gardening")], "query_id long, text string")
    q2 = spark.createDataFrame([(1, "gardening gardening")], "query_id long, text string")
    s_set = bm25_topk(d, q2, k=1).collect()[0]["score"]
    s_one = bm25_topk(d, q1, k=1, query_tf=True).collect()[0]["score"]
    s_two = bm25_topk(d, q2, k=1, query_tf=True).collect()[0]["score"]
    assert abs(s_set - s_one) < 1e-9   # default == tf on a distinct query
    assert abs(s_two - 2 * s_one) < 1e-6
