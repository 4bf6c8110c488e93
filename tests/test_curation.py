"""curate_corpus composition: stage ordering, determinism, url path."""

from __future__ import annotations

from pyspark.sql import functions as F

from gencore_spark.operators.curation import curate_corpus
from gencore_spark.operators.textstats import quality_expr, quality_score


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_quality_expr_matches_quality_score(spark):
    d = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again"),
            (2, "!!!??? ... ;;; 123 456 789 000 111 222 333 444 555"),
            (3, "short"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    via_score = {r["doc_id"]: r["quality"] for r in quality_score(d).collect()}
    via_expr = {
        r["doc_id"]: r["q"]
        for r in d.select("doc_id", quality_expr(F.col("text")).alias("q")).collect()
    }
    assert via_expr == via_score


def test_exact_collapse_runs_before_line_dedup(spark):
    # THE ordering property the module docstring pins: a full-document
    # duplicate must NOT turn its own body lines into corpus-duplicated
    # boilerplate.  body appears in two byte-identical docs; after exact
    # collapse it is one doc, so line dedup keeps it.
    body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, "header line\n" + body, "en"),
        (2, "header line\n" + body, "en"),  # byte-identical copy
        (3, "header line\nother content words one two three four five six seven", "en"),
    ]
    out = curate_corpus(_mk_docs(spark, rows), min_quality=0.0, min_tokens=5)
    got = {r["doc_id"] for r in out.collect()}
    assert got == {1, 3}  # copy collapsed to min id; bodies survived
    # and both survivors kept their (10-token) bodies past the gate
    toks = {r["doc_id"]: r["n_tokens"] for r in out.collect()}
    assert toks[1] == 10 and toks[3] == 10  # header evicted, body kept


def test_curate_deterministic_and_shards_train_only(spark):
    rows = [
        (i, f"doc {i} body with enough distinct words " + " ".join(f"w{i}x{j}" for j in range(20)), "en")
        for i in range(400)
    ]
    d = _mk_docs(spark, rows)
    a = curate_corpus(d, token_budget=100).collect()
    b = curate_corpus(d, token_budget=100).collect()
    key = lambda r: r["doc_id"]
    assert sorted(a, key=key) == sorted(b, key=key)
    for r in a:
        if r["split"] == "train":
            assert r["shard_id"] is not None
        else:
            assert r["shard_id"] is None


def test_curate_decontaminates_against_eval(spark):
    shared = " ".join(f"tok{j}" for j in range(12))
    rows = [
        (1, "clean body " + " ".join(f"a{j}" for j in range(12)), "en"),
        (2, "leaky body prefix " + shared, "en"),
    ]
    ev = _mk_docs(spark, [(99, "eval question " + shared, "en")])
    out = curate_corpus(_mk_docs(spark, rows), ev, min_quality=0.0)
    assert {r["doc_id"] for r in out.collect()} == {1}


def test_curate_url_path_collapses_refetches(spark):
    base = " ".join(f"w{j}" for j in range(15))
    rows = [
        (1, "https://EX.org:443/a?utm_x=1", "2024-01-01 00:00:00", base, "en"),
        (2, "https://ex.org/a", "2024-01-02 00:00:00", base + " updated", "en"),
        (3, "https://ex.org/b", "2024-01-01 00:00:00", "other " + base, "en"),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, url string, warc_ts string, text string, lang string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    out = curate_corpus(d, min_quality=0.0)
    # doc 1 and 2 are the same canonical url; the LATEST fetch (doc 2) wins
    assert {r["doc_id"] for r in out.collect()} == {2, 3}


def test_curate_near_dup_flag_collapses_clusters(spark):
    base = " ".join(f"tok{j} word{j} item{j}" for j in range(30))
    rows = [
        (1, base, "en"),
        (2, base + " qq", "en"),       # near-dup of 1 (high Jaccard)
        (3, "totally different " + " ".join(f"z{j}" for j in range(40)), "en"),
    ]
    d = _mk_docs(spark, rows)
    without = {r["doc_id"] for r in curate_corpus(d, min_quality=0.0).collect()}
    with_nd = {r["doc_id"] for r in curate_corpus(d, min_quality=0.0, near_dup=True).collect()}
    assert without == {1, 2, 3}   # exact collapse alone keeps the near-dup
    assert with_nd == {1, 3}      # near-dup collapse elects the min id


def test_curate_containment_flag_folds_truncations(spark):
    # a prefix-half truncation: Jaccard(half, whole) ~ 0.5, so near_dup
    # alone keeps it — containment=True is the stage that folds it
    whole = " ".join(f"alpha{j} beta{j}" for j in range(30))   # 60 words
    half = " ".join(whole.split()[:30])
    other = " ".join(f"gamma{j}" for j in range(40))
    rows = [(1, whole, "en"), (2, half, "en"), (3, other, "en")]
    d = _mk_docs(spark, rows)
    nd_only = {r["doc_id"] for r in
               curate_corpus(d, min_quality=0.0, near_dup=True).collect()}
    att: dict = {}
    both = {r["doc_id"] for r in
            curate_corpus(d, min_quality=0.0, near_dup=True,
                          containment=True, attrition=att).collect()}
    assert nd_only == {1, 2, 3}   # half survives near-dup (the miss case)
    assert both == {1, 3}         # containment folds half into whole
    assert att["after_near_dup"] == 3 and att["after_containment"] == 2


def test_curate_perplexity_gate_evicts_outliers(spark):
    # 10 statistically-typical docs + 1 gibberish outlier; the self-trained
    # bigram LM must rank the outlier's perplexity above the pack and the
    # max_perplexity gate must evict exactly it (default path keeps all)
    common = "the quick brown fox jumps over the lazy dog today"
    # distinct texts (a shared marker suffix) so the exact collapse keeps
    # all ten; the shared bigram mass still dominates the trained model
    rows_uniq = [(i, common + f" marker{i}", "en") for i in range(10)]
    rows_uniq.append((99, "zxq qzx xqz zqx qxz wvu uvw vuw uwv wuv", "en"))
    d = _mk_docs(spark, rows_uniq)
    from gencore_spark.operators.lm import bigram_lm_score

    ppl = {r["doc_id"]: r["perplexity"]
           for r in bigram_lm_score(d).collect()}
    cut = (max(v for k, v in ppl.items() if k != 99) + ppl[99]) / 2
    without = {r["doc_id"] for r in
               curate_corpus(d, min_quality=0.0, min_tokens=5).collect()}
    att: dict = {}
    gated = {r["doc_id"] for r in
             curate_corpus(d, min_quality=0.0, min_tokens=5,
                           max_perplexity=cut, attrition=att).collect()}
    assert without == set(range(10)) | {99}
    assert gated == set(range(10))
    assert att["after_quality_gate"] == 11 and att["after_perplexity"] == 10


def test_curate_perplexity_gate_external_train(spark):
    # CCNet shape: train on a clean reference corpus; a scored doc made of
    # train-corpus bigrams passes, an out-of-distribution doc is evicted
    train = _mk_docs(
        spark,
        [(i, "good clean reference text sample number " + str(i), "en")
         for i in range(5)],
    )
    d = _mk_docs(
        spark,
        [
            (1, "good clean reference text sample number one", "en"),
            (2, "entirely alien vocabulary nowhere near training mass", "en"),
        ],
    )
    from gencore_spark.operators.lm import bigram_lm_score

    ppl = {r["doc_id"]: r["perplexity"]
           for r in bigram_lm_score(d, train_df=train).collect()}
    assert ppl[2] > ppl[1]
    cut = (ppl[1] + ppl[2]) / 2
    got = {r["doc_id"] for r in
           curate_corpus(d, min_quality=0.0, min_tokens=5,
                         max_perplexity=cut, lm_train_df=train).collect()}
    assert got == {1}


def test_curate_domain_cap_limits_spam_domain(spark):
    # 8 docs from a link farm + 2 from a normal site; cap=2 keeps the
    # first two farm docs (ascending id) and everything else
    mk = lambda i, dom: (
        i, f"https://{dom}/p/{i}", "2024-01-01 00:00:00",
        f"doc {i} " + " ".join(f"u{i}w{j}" for j in range(12)), "en",
    )
    rows = [mk(i, "farm.ex.org") for i in range(8)] + [
        mk(100, "ok.ex.org"), mk(101, "ok.ex.org")
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, url string, warc_ts string, text string, lang string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    out = curate_corpus(d, min_quality=0.0, max_docs_per_domain=2)
    assert {r["doc_id"] for r in out.collect()} == {0, 1, 100, 101}


def test_curate_domain_cap_requires_url(spark):
    import pytest as _pytest

    d = _mk_docs(spark, [(1, "some body text with enough words here to pass", "en")])
    with _pytest.raises(ValueError):
        curate_corpus(d, max_docs_per_domain=5)


def test_curation_plan_is_jvm_only(spark):
    # plan contract: the default composition runs no Python in any form —
    # every gate/gram/hash expression stays inside the JVM
    rows = [(i, f"body {i} " + " ".join(f"w{i}x{j}" for j in range(15)), "en")
            for i in range(50)]
    out = curate_corpus(_mk_docs(spark, rows))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_curate_attrition_report(spark):
    rows = (
        [(i, "dup body " + " ".join(f"s{j}" for j in range(15)), "en") for i in range(4)]
        + [(10 + i, f"unique {i} " + " ".join(f"u{i}w{j}" for j in range(15)), "en")
           for i in range(20)]
    )
    d = _mk_docs(spark, rows)
    rep = {}
    out = curate_corpus(d, min_quality=0.0, attrition=rep)
    n_out = out.count()
    assert rep["docs_in"] == 24
    assert rep["after_exact"] == 21          # 4 identical bodies -> 1
    assert rep["after_quality_gate"] == n_out
    assert sum(rep["splits"].values()) == n_out
    assert rep["boilerplate_lines_removed"] == 0
    # untracked stages are absent, not zero
    assert "after_url_dedup" not in rep and "after_decontam" not in rep


def test_curate_no_attrition_leaves_dict_untouched(spark):
    # the default path must not report anything; call-time work is only
    # the packing offsets job (a P-number collect, by design)
    rows = [(1, "body " + " ".join(f"w{j}" for j in range(15)), "en")]
    rep = None
    curate_corpus(_mk_docs(spark, rows))  # attrition defaults to None
    assert rep is None
