"""Corpus-duplicated span scrubbing (ExactSubstr-style, gram cover)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gencore_spark.operators.spans import dup_span_scrub


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dup_span_scrub_removes_shared_passage(spark):
    shared = "aa bb cc dd ee ff gg hh ii jj kk ll"  # 12 words, n=8 grams
    docs = _mk(
        spark,
        [
            (1, "one two three " + shared),
            (2, "alpha beta " + shared + " tail words here"),
            (3, "totally unique content with nine words exactly here"),
            (4, "tiny doc"),   # < n words: untouched
            (5, ""),           # empty: 0 words
        ],
    )
    got = {r["doc_id"]: r for r in dup_span_scrub(docs).collect()}
    # the shared passage is scrubbed IN FULL from both holders; boundary
    # grams mix doc-unique words so nothing beyond the passage is covered
    assert got[1]["text_scrub"] == "one two three"
    assert (got[1]["n_words"], got[1]["n_removed"]) == (15, 12)
    assert got[2]["text_scrub"] == "alpha beta tail words here"
    assert (got[2]["n_words"], got[2]["n_removed"]) == (17, 12)
    assert got[3]["n_removed"] == 0
    assert got[4]["text_scrub"] == "tiny doc" and got[4]["n_removed"] == 0
    assert (got[5]["text_scrub"], got[5]["n_words"]) == ("", 0)


def test_dup_span_scrub_self_repeat_does_not_flag(spark):
    """A doc repeating its OWN passage is not a corpus duplicate (distinct
    (gram, doc) collapse before the count) — that case belongs to
    intradoc_line_dedup / repetition_signals."""
    p = "p1 p2 p3 p4 p5 p6 p7 p8"
    docs = _mk(spark, [(1, p + " mid " + p), (2, "unrelated other text")])
    got = {r["doc_id"]: r for r in dup_span_scrub(docs).collect()}
    assert got[1]["n_removed"] == 0
    assert got[1]["text_scrub"] == p + " mid " + p


def test_dup_span_scrub_overlapping_covers_union(spark):
    """Two docs sharing a LONG passage: every interior gram flags, and the
    cover is the union of overlapping extents — removed once, not n times."""
    long_shared = " ".join(f"s{i}" for i in range(20))
    docs = _mk(
        spark,
        [(1, "u1 " + long_shared), (2, long_shared + " v1 v2")],
    )
    got = {r["doc_id"]: r for r in dup_span_scrub(docs).collect()}
    assert got[1]["text_scrub"] == "u1" and got[1]["n_removed"] == 20
    assert got[2]["text_scrub"] == "v1 v2" and got[2]["n_removed"] == 20


def test_dup_span_scrub_min_dup_docs_threshold(spark):
    shared = "q1 q2 q3 q4 q5 q6 q7 q8"
    docs = _mk(spark, [(1, "a " + shared), (2, "b " + shared)])
    at3 = dup_span_scrub(docs, min_dup_docs=3)
    assert at3.agg(F.sum("n_removed")).collect()[0][0] == 0


def test_dup_span_scrub_whitespace_normalized_output(spark):
    docs = _mk(spark, [(1, "  a   b\tc  "), (2, "d e f")])
    got = {r["doc_id"]: r for r in dup_span_scrub(docs).collect()}
    assert got[1]["text_scrub"] == "a b c" and got[1]["n_words"] == 3


def test_dup_span_scrub_null_text_counts_as_empty(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, "some words here")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in dup_span_scrub(docs).collect()}
    assert (got[1]["text_scrub"], got[1]["n_words"], got[1]["n_removed"]) == ("", 0, 0)


def test_dup_span_scrub_large_fully_covered_doc_linear(spark):
    """Adversarial shape from the round-5 review: a large doc whose EVERY
    word is covered by duplicated grams.  The cover filter must be linear
    (array_except index set), not O(words x cover) — with the old
    per-word array_contains scan this 50k-word case was ~2.5e9 interpreted
    comparisons in one task and did not complete in test time."""
    n_words = 50_000
    big = " ".join(f"w{i}" for i in range(n_words))
    docs = _mk(spark, [(1, big), (2, big)])
    got = {r["doc_id"]: r for r in dup_span_scrub(docs).collect()}
    for d in (1, 2):
        assert got[d]["text_scrub"] == ""
        assert got[d]["n_words"] == n_words
        assert got[d]["n_removed"] == n_words
