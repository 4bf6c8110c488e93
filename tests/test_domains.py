"""Domain stats / blocklist / two-phase per-domain cap."""

from __future__ import annotations

from pyspark.sql import functions as F

from gencore_spark.operators.domains import (
    domain_blocklist_filter,
    domain_cap,
    domain_of,
    domain_stats,
)


def _docs(spark, n=200, domains=4):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("https://d"), (F.col("id") % domains).cast("string"),
            F.lit(".ex.org:8080/p/"), F.col("id").cast("string"),
        ).alias("url"),
        F.concat(F.lit("body text for doc "), F.col("id").cast("string")).alias("text"),
    )


def test_domain_of_strips_port_case_path(spark):
    got = (
        spark.createDataFrame([("HTTPS://Sub.EX.org:443/A/b?q=1#f",)], "url string")
        .select(domain_of(F.col("url")).alias("d"))
        .collect()[0]["d"]
    )
    assert got == "sub.ex.org"


def test_domain_stats_counts(spark):
    out = {r["domain"]: r for r in domain_stats(_docs(spark)).collect()}
    assert set(out) == {f"d{i}.ex.org" for i in range(4)}
    assert all(r["n_docs"] == 50 and r["n_distinct_texts"] == 50 for r in out.values())


def test_blocklist_drops_only_listed(spark):
    blocked = spark.createDataFrame([("d1.ex.org",), ("nope.org",)], "domain string")
    out = domain_blocklist_filter(_docs(spark), blocked)
    assert out.count() == 150
    assert out.filter(F.col("url").contains("d1.ex.org")).count() == 0


def test_domain_cap_keeps_first_n_per_domain(spark):
    out = domain_cap(_docs(spark), cap=10)
    assert out.count() == 40
    kept = sorted(r["doc_id"] for r in out.collect())
    # first 10 of each residue class mod 4 -> ids 0..39
    assert kept == list(range(40))
    assert set(out.columns) == {"doc_id", "url", "text"}


def test_domain_cap_two_phase_matches_naive_across_partitionings(spark):
    d = _docs(spark, n=500, domains=3)
    a = sorted(r["doc_id"] for r in domain_cap(d.repartition(13), cap=25).collect())
    b = sorted(r["doc_id"] for r in domain_cap(d.coalesce(1), cap=25).collect())
    assert a == b and len(a) == 75


def test_domain_cap_mega_domain_is_spread_before_final_window(spark):
    # plan contract: phase 1 aggregates on (domain, source partition) —
    # the shuffle key includes __pid, so a mega-domain never lands whole
    # in one phase-1 task
    d = _docs(spark, n=1000, domains=1).repartition(8)
    plan = domain_cap(d, cap=5)._jdf.queryExecution().executedPlan().toString()
    assert "__pid" in plan.split("Window")[-1] or "__pid" in plan
    out = domain_cap(d, cap=5).collect()
    assert sorted(r["doc_id"] for r in out) == [0, 1, 2, 3, 4]


def test_domain_cap_payload_never_enters_agg_buffer(spark):
    # memory contract: phase 1 collect_lists bare order keys, never the
    # payload row — a text-heavy mega-domain in one input partition must
    # not be buffered whole.  The aggregate subtree must not see `text`.
    d = _docs(spark, n=200, domains=1)
    plan = domain_cap(d, cap=5)._jdf.queryExecution().executedPlan().toString()
    agg_frags = [f for f in plan.split("\n") if "collect_list" in f]
    assert agg_frags and all("text" not in f for f in agg_frags)
    assert "collect_list(struct" not in plan.replace(" ", "")
