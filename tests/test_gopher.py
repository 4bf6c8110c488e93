"""Gopher-style document quality rules (textstats.gopher_quality_flags)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gencore_spark.operators.textstats import gopher_quality_flags


def _flags(spark, text):
    d = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return gopher_quality_flags(d).collect()[0]


def test_clean_doc_passes(spark):
    r = _flags(spark, " ".join(f"word{i}" for i in range(60)))
    assert r["passes_gopher"]
    assert r["frac_words_alpha"] == 1.0
    assert r["frac_lines_bullet"] == 0.0 and r["frac_lines_ellipsis"] == 0.0


def test_bullet_heavy_doc_fails(spark):
    body = "\n".join(f"- bullet item number {i} with words" for i in range(20))
    r = _flags(spark, body)
    assert r["frac_lines_bullet"] == 1.0
    assert not r["passes_gopher"]


def test_ellipsis_lines_counted(spark):
    text = "a normal first line with several words here\nteaser line...\nmore..."
    r = _flags(spark, text)
    assert r["frac_lines_ellipsis"] == round(2 / 3, 6)


def test_non_alpha_words_fail_gate(spark):
    r = _flags(spark, " ".join(str(i) * 3 for i in range(80)))
    assert r["frac_words_alpha"] == 0.0
    assert not r["passes_gopher"]


def test_short_doc_fails_word_window(spark):
    r = _flags(spark, "only a handful of words here now")
    assert r["n_tokens"] < 50 and not r["passes_gopher"]


def test_empty_text_is_all_zero(spark):
    r = _flags(spark, "")
    assert (r["n_tokens"], r["mean_word_len"], r["frac_words_alpha"]) == (0, 0.0, 0.0)
    assert not r["passes_gopher"]
