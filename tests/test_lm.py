"""Bigram-LM perplexity scoring (CCNet-style) and intra-doc line dedup."""

from __future__ import annotations

import math

import pytest

from gencore_spark.operators.lines import intradoc_line_dedup
from gencore_spark.operators.lm import bigram_lm_score


def _expected_self(corpus: dict[int, str], alpha: float = 1.0):
    """Closed-form recompute of the self-trained model in plain Python."""
    toks = {i: [w for w in t.lower().split() if w] for i, t in corpus.items()}
    bgs = {i: list(zip(ws, ws[1:])) for i, ws in toks.items()}
    c12: dict[tuple[str, str], int] = {}
    for pairs in bgs.values():
        for p in pairs:
            c12[p] = c12.get(p, 0) + 1
    c1: dict[str, int] = {}
    for (w1, _), n in c12.items():
        c1[w1] = c1.get(w1, 0) + n
    vocab = len({w for ws in toks.values() for w in ws})
    out = {}
    for i, pairs in bgs.items():
        if not pairs:
            out[i] = (len(toks[i]), 0, None, None)
            continue
        lps = [
            math.log((c12[p] + alpha) / (c1[p[0]] + alpha * vocab))
            for p in pairs
        ]
        avg6 = round(sum(lps) / len(lps), 6)
        out[i] = (len(toks[i]), len(pairs), avg6, round(math.exp(-avg6), 4))
    return out


def test_bigram_lm_matches_closed_form(spark):
    corpus = {
        0: "a b a b a b",
        1: "a b c",
        2: "z z z z",
        3: "only",          # 1 token -> no bigrams, NULL scores
        4: "   ",           # whitespace-only -> 0 tokens
        5: "A B a b",       # casefolded into the a-b mass
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_lm_score(df).collect()}
    want = _expected_self(corpus)
    assert set(got) == set(want)
    for i, (n_tok, n_bg, avg6, ppl) in want.items():
        r = got[i]
        assert (r["n_tokens"], r["n_bigrams"]) == (n_tok, n_bg), i
        if avg6 is None:
            assert r["avg_logprob"] is None and r["perplexity"] is None, i
        else:
            assert r["avg_logprob"] == pytest.approx(avg6, abs=1e-9), i
            assert r["perplexity"] == pytest.approx(ppl, abs=1e-9), i


def test_bigram_lm_ranks_outliers_higher(spark):
    """The quality-filter semantics: a doc made of corpus-common bigrams
    scores LOWER perplexity than a statistical outlier."""
    rows = [(i, "the quick brown fox jumps") for i in range(20)]
    rows.append((99, "zxq qzx xqz zqx qxz"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ppl = {r["doc_id"]: r["perplexity"] for r in bigram_lm_score(df).collect()}
    assert ppl[99] > ppl[0] * 2


def test_bigram_lm_external_train_corpus(spark):
    """CCNet deployment shape: train on a clean corpus, score held-out
    docs.  Fully-unseen contexts hit the smoothed floor P = 1/V exactly."""
    train = spark.createDataFrame(
        [(0, "good clean text"), (1, "good clean text")],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [(10, "good clean"), (11, "weird unseen")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in bigram_lm_score(score, train_df=train).collect()
    }
    vocab = 3  # good, clean, text
    # seen bigram: C12=2, C1(good)=2 -> (2+1)/(2+3)
    assert got[10]["avg_logprob"] == pytest.approx(
        round(math.log(3 / 5), 6), abs=1e-9
    )
    # unseen bigram + unseen context: (0+1)/(0+3) = 1/V
    assert got[11]["avg_logprob"] == pytest.approx(
        round(math.log(1 / vocab), 6), abs=1e-9
    )


def test_bigram_lm_digest_xxhash64_equivalent(spark):
    """The 8-byte-key pipeline mode returns the same scores as the
    string-key oracle mode (collisions are the only divergence channel,
    absent at any testable vocabulary size)."""
    rows = [(i, f"w{i % 7} w{(i + 1) % 7} w{(i * 3) % 7} tail") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r for r in bigram_lm_score(df, digest="words").collect()}
    b = {r["doc_id"]: r for r in bigram_lm_score(df, digest="xxhash64").collect()}
    assert set(a) == set(b)
    for i in a:
        assert a[i]["avg_logprob"] == b[i]["avg_logprob"], i
        assert a[i]["perplexity"] == b[i]["perplexity"], i


def test_bigram_lm_null_text_counts_as_empty(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "a b a b")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in bigram_lm_score(df).collect()}
    assert (got[0]["n_tokens"], got[0]["n_bigrams"]) == (0, 0)
    assert got[0]["avg_logprob"] is None and got[0]["perplexity"] is None
    assert got[1]["n_bigrams"] == 3


def test_bigram_lm_rejects_bad_args(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bigram_lm_score(df, alpha=0.0)
    with pytest.raises(ValueError):
        bigram_lm_score(df, digest="md5")


def test_bigram_lm_hashed_plan_shuffles_longs(spark):
    """Plan shape for the 100TB mode: with digest='xxhash64' the count
    tables key on xxhash64 longs (token strings never reach a join key)."""
    df = spark.createDataFrame([(0, "a b c"), (1, "b c d")],
                               "doc_id long, text string")
    lazy = bigram_lm_score(df, digest="xxhash64", eager=False)
    plan = lazy._jdf.queryExecution().toString()
    assert "xxhash64" in plan
    # and the lazy plan computes the same result as the eager default
    a = {r["doc_id"]: r["avg_logprob"] for r in lazy.collect()}
    b = {r["doc_id"]: r["avg_logprob"] for r in bigram_lm_score(df).collect()}
    assert a == b


def test_intradoc_line_dedup_constructed(spark):
    docs = spark.createDataFrame(
        [
            # promo brackets the body, body line doubled
            (0, "Buy now!\nreal content A\nBuy now!\nreal content A\nend"),
            # indented repeat folds onto the flush first occurrence (trim
            # key), but the ORIGINAL spelling of the first survives
            (1, "  menu  \nmenu\nbody"),
            # no repeats -> unchanged (empty line dropped)
            (2, "one\n\ntwo"),
            # whitespace-only doc survives as an empty row
            (3, " \n  "),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in intradoc_line_dedup(docs).collect()}
    assert got[0]["text_dedup"] == "Buy now!\nreal content A\nend"
    assert (got[0]["n_lines"], got[0]["n_removed"]) == (5, 2)
    assert got[1]["text_dedup"] == "  menu  \nbody"
    assert (got[1]["n_lines"], got[1]["n_removed"]) == (3, 1)
    assert got[2]["text_dedup"] == "one\ntwo"
    assert (got[2]["n_lines"], got[2]["n_removed"]) == (2, 0)
    assert (got[3]["text_dedup"], got[3]["n_lines"], got[3]["n_removed"]) == ("", 0, 0)


def test_intradoc_line_dedup_is_per_document(spark):
    """A line shared ACROSS docs is untouched — that is line_dedup's job."""
    docs = spark.createDataFrame(
        [(0, "shared\nmine"), (1, "shared\nyours")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text_dedup"] for r in intradoc_line_dedup(docs).collect()}
    assert got == {0: "shared\nmine", 1: "shared\nyours"}
