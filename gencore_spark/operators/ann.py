"""Similarity search over embedding columns (array<float>).

Three paths, matching the scale guidance:

* ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query
  set against the corpus, dot products via ``F.zip_with``/``F.aggregate``
  (pure JVM, no Python), rank with a window.  The correctness baseline.
* ``lsh_cosine_topk`` — random-hyperplane (sign-LSH) bucketed variant with
  OR-construction banding: each vector hashed to ``bands`` independent
  short codes; candidates restricted to vectors sharing ANY band code,
  then exact re-rank.  The 100TB path: the bucket join replaces the cross
  join, cutting compared pairs by ~2^planes_per_band per band, while
  banding keeps near-neighbor recall high (P(candidate) =
  1 - (1 - p^r)^b with p = 1 - θ/π; ≈ 0.99 at cos 0.95 for r=8, b=8).
* ``ivf_cosine_topk`` — inverted-file variant: a Spark ML KMeans coarse
  quantizer (cosine distance) partitions the corpus into cells; each query
  probes its ``n_probe`` nearest cells and re-ranks exactly inside them.
  Unlike LSH the cell count (and so the candidate fraction ≈ n_probe/n_cells)
  is chosen directly, and the cell assignment doubles as a partitioning key
  for the corpus — at 100 TB the inverted lists live as a parquet table
  partitioned by ``cell``, so a probe reads only n_probe/n_cells of the data
  (partition pruning does the index lookup).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                      lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0),
                            lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0),
                            lambda acc, v: acc + v))
    return dot / (na * nb)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector in the corpus.

    Output: (query_id, neighbor_id, rank) — rank 1 = nearest.  Scores are
    computed in double; ties broken by neighbor id (deterministic).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", _cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _maybe_broadcast(df: DataFrame, n_rows: int | None, max_rows: int):
    """Query-side broadcast, conditional on a caller-known row count — the
    ``attach_pair_payload`` cutover pattern (``verify.py``).  ``None``
    keeps the documented "small query batch" contract (always broadcast);
    a count above ``max_rows`` drops the hint so the bucket/cell equi-join
    plans as a shuffle join and corpus-vs-corpus probes (semantic dedup)
    never rest on a single-executor copy of the query table."""
    if n_rows is None or n_rows <= max_rows:
        return F.broadcast(df)
    return df


def banded_hyperplane_codes_udf(
    dim: int, bands: int, planes_per_band: int, seed: int = 42
):
    """array<float> → array<long> of ``bands`` independent sign-LSH codes.

    OR-construction: a pair is a candidate if ANY band code matches.  With
    per-plane agreement p = 1 - θ/π, P(candidate) = 1 - (1 - p^r)^b; at
    cos=0.90 (θ≈0.451) and r=8, b=12: ≈ 0.985 — versus ≈0.16 for a single
    12-plane code.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, bands * planes_per_band))
    shifts = np.arange(planes_per_band, dtype=np.uint64)
    band_mix = (np.arange(bands, dtype=np.uint64) + np.uint64(1)) << np.uint64(32)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _codes(vec: pd.Series) -> pd.Series:
        mat = np.asarray(vec.tolist(), dtype=np.float64)
        bits = (mat @ planes > 0).astype(np.uint64)
        bits = bits.reshape(len(mat), bands, planes_per_band)
        codes = (bits << shifts[None, None, :]).sum(axis=2) ^ band_mix[None, :]
        return pd.Series(list(codes.view(np.int64)))

    return _codes


class IVFIndex:
    """A built IVF index: tiny centroid matrix + cell-assigned corpus table.

    ``centroids`` is (n_cells, dim) L2-normalized numpy (driver-side — a
    few KB); ``cells`` is a DataFrame (neighbor_id, cv, cell).  When built
    with ``storage_path`` the cells live as a parquet table PARTITIONED BY
    ``cell`` — at 100 TB a probe reads only ~n_probe/n_cells of the corpus
    because partition pruning on the ``cell`` key does the inverted-list
    lookup (the FAISS invlist, expressed as a Spark partitioned table).
    """

    def __init__(self, centroids: np.ndarray, cells: DataFrame):
        self.centroids = centroids
        self.cells = cells


def ivf_build(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
    storage_path: str | None = None,
) -> IVFIndex:
    """BUILD step: train the KMeans coarse quantizer (cosine distance,
    fixed seed — distributed, one pass per Lloyd iteration) and assign
    every corpus vector to its nearest centroid via the JVM-side model
    transform.  This is the expensive one-time cost at 100 TB; probes must
    NOT repeat it (see :func:`ivf_probe`).

    With ``storage_path`` the index persists: cells as cell-partitioned
    parquet + centroids alongside, reloadable via :func:`ivf_load` in a
    later session with no KMeans anywhere in the probe plan.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("fv", array_to_vector("cv"))
    km = KMeans(
        k=n_cells, seed=seed, featuresCol="fv", predictionCol="cell",
        distanceMeasure="cosine", maxIter=max_iter,
    )
    model = km.fit(c)
    cells = model.transform(c).select("neighbor_id", "cv", "cell")
    cents = np.stack([np.asarray(ct) for ct in model.clusterCenters()])
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    if storage_path is not None:
        import os

        spark = corpus.sparkSession
        cells.write.mode("overwrite").partitionBy("cell").parquet(
            os.path.join(storage_path, "cells")
        )
        spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(cents)],
            "cell int, centroid array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(storage_path, "centroids")
        )
        return ivf_load(spark, storage_path)
    return IVFIndex(cents, cells)


def ivf_load(spark, storage_path: str) -> IVFIndex:
    """Load a persisted IVF index — no model object, no KMeans: the probe
    plan is a pruned scan of the cell-partitioned parquet."""
    import os

    rows = (
        spark.read.parquet(os.path.join(storage_path, "centroids"))
        .orderBy("cell")
        .collect()
    )
    cents = np.array([r["centroid"] for r in rows], dtype=np.float64)
    cells = spark.read.parquet(os.path.join(storage_path, "cells")).select(
        "neighbor_id", "cv", "cell"
    )
    return IVFIndex(cents, cells)


def ivf_probe(
    index: IVFIndex,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int | None = None,
    broadcast_max_rows: int = 100_000,
) -> DataFrame:
    """PROBE step: each query visits its ``n_probe`` nearest cells
    (centroid matrix is closure-captured into one vectorized UDF) and
    re-ranks candidates by exact cosine.  Pure probe — never refits the
    quantizer (plan-tested: no KMeans stage), so the 100 TB cost is
    ~n_probe/n_cells of a scan, with partition pruning doing the inverted
    list lookup when the index is storage-backed.

    Same output contract as :func:`cosine_topk`.
    """
    cents_n = index.centroids
    n_probe = min(n_probe, len(cents_n))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_cells(vec: pd.Series) -> pd.Series:
        mat = np.asarray(vec.tolist(), dtype=np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ cents_n.T
        order = np.argsort(-sims, axis=1)[:, :n_probe]
        return pd.Series(list(order.astype(np.int32)))

    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        .withColumn("cell", F.explode(probe_cells(F.col("qv"))))
    )
    scored = (
        index.cells.join(_maybe_broadcast(q, n_queries, broadcast_max_rows), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", _cosine(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Convenience wrapper: :func:`ivf_build` once + :func:`ivf_probe`.

    Expected candidate fraction is ~``n_probe / n_cells``; recall@k is
    tested vs brute force (``test_ann_ivf_topk_recall_vs_brute_force``).
    Misses happen only for true neighbors in a non-probed cell — raise
    ``n_probe`` to trade compute for recall, exactly FAISS's IVF knob.
    For repeated query batches use build/probe directly (the build is the
    expensive step and must amortize).
    """
    index = ivf_build(
        corpus, n_cells=n_cells, id_col=id_col, vec_col=vec_col, seed=seed
    )
    return ivf_probe(
        index, queries, k=k, n_probe=n_probe, id_col=id_col, vec_col=vec_col
    )


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    bands: int = 8,
    planes_per_band: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int | None = None,
    broadcast_max_rows: int = 100_000,
) -> DataFrame:
    """Approximate top-k: banded sign-LSH bucket join + exact re-rank.

    Same output contract as :func:`cosine_topk`; recall@k >= 0.9 on
    clustered corpora at the defaults (pytest
    ``test_ann_lsh_topk_recall_vs_brute_force``).

    ``n_queries`` — exact query-side row count when the caller has one;
    above ``broadcast_max_rows`` the bucket join runs un-broadcast (see
    :func:`_maybe_broadcast`), enabling corpus-vs-corpus probes.
    """
    code = banded_hyperplane_codes_udf(dim, bands, planes_per_band)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        code(F.col(vec_col)).alias("codes"),
    ).select("neighbor_id", "cv", F.explode("codes").alias("bucket"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        code(F.col(vec_col)).alias("codes"),
    ).select("query_id", "qv", F.explode("codes").alias("bucket"))
    scored = (
        c.join(_maybe_broadcast(q, n_queries, broadcast_max_rows), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "cv", "qv")
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cos", _cosine(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
