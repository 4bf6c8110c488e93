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


def test_script_mix_detects_scripts(spark):
    from gencore_spark.operators.textstats import script_mix

    rows = [
        (1, "plain english words only here"),
        (2, "今日は良い天気です 世界の皆さん"),
        (3, "привет мир как дела"),
        (4, "mixed latin و عربي نص"),
        (5, "12345 !!! ..."),
        (6, ""),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in script_mix(d).collect()}
    assert out[1]["dominant_script"] == "latin" and out[1]["frac_latin"] == 1.0
    assert out[2]["dominant_script"] == "cjk" and out[2]["frac_cjk"] == 1.0
    assert out[3]["dominant_script"] == "cyrillic"
    assert out[4]["frac_arabic"] > 0 and out[4]["frac_latin"] > 0
    assert out[5]["dominant_script"] == "und" and out[5]["n_chars_nws"] > 0
    assert out[6]["dominant_script"] == "und" and out[6]["n_chars_nws"] == 0
