"""Corpus splitting (hash_split) and token-budget shard packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from gencore_spark.operators.packing import hash_split, pack_into_token_shards


def test_hash_split_deterministic_and_exhaustive(spark):
    d = spark.range(0, 20_000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(d).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(d).collect()}
    assert a == b  # pure function of the id
    assert set(a.values()) == {"train", "val", "test"}
    n = len(a)
    frac_train = sum(v == "train" for v in a.values()) / n
    frac_val = sum(v == "val" for v in a.values()) / n
    # multiplicative hash over a contiguous id range: equidistribution is
    # good but not perfect — generous tolerances
    assert 0.96 <= frac_train <= 1.0
    assert 0.003 <= frac_val <= 0.03


def test_hash_split_custom_weights(spark):
    d = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    counts = dict(
        hash_split(d, {"a": 0.5, "b": 0.5})
        .groupBy("split").count().collect()
    )
    assert set(counts) == {"a", "b"}
    assert abs(counts["a"] - counts["b"]) < 1_000


def test_hash_split_negative_ids(spark):
    """xxhash-minted ids are negative half the time; pmod must keep the
    bucket in range (a raw % would go negative and always pick 'train')."""
    d = spark.createDataFrame(
        [(-(10**18) - k,) for k in range(2_000)], "doc_id long"
    )
    vals = set(r["split"] for r in hash_split(d).collect())
    assert "val" in vals or "test" in vals


def _reference_pack(rows, budget):
    """Sequential single-machine reference of the packing rule."""
    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
    out, cum = {}, 0
    for doc_id, n in ordered:
        out[doc_id] = cum // budget
        cum += n
    return out


def test_pack_matches_sequential_reference(spark):
    rows = [(i, (i * 37) % 900 + 10) for i in range(500)]
    d = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    got = {
        r["doc_id"]: r["shard_id"]
        for r in pack_into_token_shards(d, 2_000).collect()
    }
    assert got == _reference_pack(rows, 2_000)


def test_pack_independent_of_partitioning(spark):
    rows = [(i, (i * 13) % 500 + 1) for i in range(300)]
    d = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    one = {
        r["doc_id"]: r["shard_id"]
        for r in pack_into_token_shards(d, 1_000, num_partitions=1).collect()
    }
    many = {
        r["doc_id"]: r["shard_id"]
        for r in pack_into_token_shards(
            d.repartition(11), 1_000, num_partitions=7
        ).collect()
    }
    assert one == many


def test_pack_oversized_doc_gets_own_shard(spark):
    d = spark.createDataFrame(
        [(0, 5_000), (1, 100), (2, 100)], "doc_id long, n_tokens int"
    )
    got = {
        r["doc_id"]: r["shard_id"]
        for r in pack_into_token_shards(d, 1_000).collect()
    }
    # order: doc0 (5000) first -> shard 0 alone; doc1 starts at cum 5000
    assert got[0] == 0
    assert got[1] == 5 and got[2] == 5


def test_pack_no_global_single_task_window(spark):
    """The prefix sum must never be a partition-less window (one task)."""
    d = spark.createDataFrame([(0, 10)], "doc_id long, n_tokens int")
    plan = (
        pack_into_token_shards(d, 100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # every Window node must carry a partition spec (_pid)
    for frag in plan.split("Window ")[1:]:
        assert "_pid" in frag.split("\n", 1)[0]


def test_stratified_sample_rates_and_determinism(spark):
    from gencore_spark.operators.packing import stratified_sample

    d = (
        spark.range(0, 30_000)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "lang",
            F.when(F.col("doc_id") % 3 == 0, "en")
            .when(F.col("doc_id") % 3 == 1, "de")
            .otherwise("zz"),
        )
    )
    rates = {"en": 1.0, "de": 0.5}
    out = stratified_sample(d, rates, default_rate=0.1)
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in stratified_sample(d, rates, default_rate=0.1).collect())
    assert a == b  # pure function of the id
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got["en"] == 10_000  # rate 1.0 keeps every row
    assert abs(got["de"] / 10_000 - 0.5) < 0.03
    assert abs(got["zz"] / 10_000 - 0.1) < 0.02


def test_stratified_sample_keeps_split_proportions(spark):
    # the sampling hash is INDEPENDENT of hash_split's bucket, so sampling
    # then splitting keeps each stratum's train/val/test ratios — a
    # downsampled stratum must still reach val and test (the sample-bucket
    # reuse bug starved them to zero)
    from gencore_spark.operators.packing import hash_split, stratified_sample

    d = spark.range(0, 100_000).withColumnRenamed("id", "doc_id").withColumn("lang", F.lit("en"))
    s = hash_split(stratified_sample(d, {"en": 0.5}))
    got = {r["split"]: r["n"] for r in s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(got) == {"train", "val", "test"}
    total = sum(got.values())
    assert abs(total / 100_000 - 0.5) < 0.02
    assert abs(got["train"] / total - 0.98) < 0.005
    assert abs(got["val"] / total - 0.01) < 0.005
    assert abs(got["test"] / total - 0.01) < 0.005


def test_stratified_sample_is_narrow(spark):
    from gencore_spark.operators.packing import stratified_sample

    d = spark.range(0, 100).withColumnRenamed("id", "doc_id").withColumn("lang", F.lit("en"))
    plan = (
        stratified_sample(d, {"en": 0.3})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # a sample must never shuffle


def test_hash_ordered_packing_shuffles_corpus_order(spark):
    from gencore_spark.operators.packing import pack_into_token_shards

    d = spark.range(0, 5_000).withColumnRenamed("id", "doc_id").withColumn(
        "n_tokens", F.lit(100)
    )
    out = pack_into_token_shards(d, token_budget=1000, order_by="hash")
    shard0 = sorted(r["doc_id"] for r in out.filter(F.col("shard_id") == 0).collect())
    # equal sizes -> 10 docs per shard; hash order must not be id order
    assert len(shard0) == 10
    assert shard0 != list(range(10))
    # deterministic + partitioning-independent
    again = pack_into_token_shards(
        d.repartition(17), token_budget=1000, order_by="hash"
    )
    a = sorted((r["doc_id"], r["shard_id"]) for r in out.collect())
    b = sorted((r["doc_id"], r["shard_id"]) for r in again.collect())
    assert a == b


def test_packing_rejects_unknown_order(spark):
    import pytest as _pytest
    from gencore_spark.operators.packing import pack_into_token_shards

    d = spark.range(3).withColumnRenamed("id", "doc_id").withColumn("n_tokens", F.lit(1))
    with _pytest.raises(ValueError):
        pack_into_token_shards(d, token_budget=10, order_by="random")
