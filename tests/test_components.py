"""Connected-components correctness on known graphs (Spark)."""

from pyspark.sql import functions as F

from gencore_spark.operators.components import connected_components


def _cc(spark, edge_list):
    df = spark.createDataFrame(edge_list, ["id_a", "id_b"])
    rows = connected_components(df).collect()
    return {r["rep_id"]: r["cluster_id"] for r in rows}


def test_cc_two_components(spark):
    out = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_chain_collapses(spark):
    # a path graph — worst case for naive label propagation
    edges = [(i, i + 1) for i in range(1, 40)]
    out = _cc(spark, edges)
    assert set(out.values()) == {1}
    assert len(out) == 40


def test_cc_star_and_duplicates(spark):
    edges = [(5, 1), (5, 2), (5, 3), (1, 5), (2, 5), (3, 3)]
    out = _cc(spark, edges)
    # duplicate/reversed edges and self-loops are harmless; all connect via 5
    assert out == {1: 1, 2: 1, 3: 1, 5: 1}


def test_cc_deterministic_min_label(spark):
    out = _cc(spark, [(100, 7), (7, 55), (55, 100), (200, 100)])
    assert set(out.values()) == {7}


def test_cc_handles_negative_ids(spark):
    # xxhash64 ids are full-range signed longs
    out = _cc(spark, [(-5, 3), (3, -1)])
    assert out == {-5: -5, 3: -5, -1: -5}
