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
    """Approximate top-k via an IVF (inverted-file) coarse quantizer.

    1. Train KMeans (cosine distance, fixed seed) on the corpus vectors —
       distributed, one pass per Lloyd iteration;
    2. assign every corpus vector to its nearest centroid (``cell``) —
       JVM-side model transform, no Python in the scan;
    3. each query probes its ``n_probe`` nearest cells; candidates are the
       corpus vectors in those cells (equi-join on ``cell``), re-ranked by
       exact cosine.

    Same output contract as :func:`cosine_topk`.  Expected candidate
    fraction is ~``n_probe / n_cells``; recall@k is tested vs brute force
    (``test_ann_ivf_topk_recall_vs_brute_force``).  Misses happen only for
    true neighbors that fall in a non-probed cell — raise ``n_probe`` to
    trade compute for recall, exactly FAISS's IVF knob.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("fv", array_to_vector("cv"))
    km = KMeans(
        k=n_cells, seed=seed, featuresCol="fv", predictionCol="cell",
        distanceMeasure="cosine", maxIter=10,
    )
    model = km.fit(c)
    cells = model.transform(c).select("neighbor_id", "cv", "cell")

    # centroid matrix is tiny (n_cells × dim): closure-captured into one
    # vectorized UDF that emits each query's n_probe nearest cells
    cents = np.stack([np.asarray(ct) for ct in model.clusterCenters()])
    cents_n = cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-12
    )

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
        cells.join(F.broadcast(q), "cell")
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


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    bands: int = 8,
    planes_per_band: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: banded sign-LSH bucket join + exact re-rank.

    Same output contract as :func:`cosine_topk`; recall@k >= 0.9 on
    clustered corpora at the defaults (pytest
    ``test_ann_lsh_topk_recall_vs_brute_force``).
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
        c.join(F.broadcast(q), "bucket")
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
