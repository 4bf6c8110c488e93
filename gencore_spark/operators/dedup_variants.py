"""Deduplication variants over a ``documents``-shaped table
(doc_id, text, lang, source, n_chars).

Each variant is a self-contained operator suitable for a training-data
pipeline, sharing the kernels of the main pages pipeline:

* :func:`exact_dedup` — hash-groupBy on raw text (byte-identical).
* :func:`minhash_lsh_clusters` — char-shingle MinHash + LSH + verify + CC
  (the main pipeline's engine applied to bare documents).
* :func:`simhash_clusters` — SimHash hamming<=d clustering via pigeonhole
  chunk bucketing (hamming<=3 pairs share one of 4 16-bit chunks — exact,
  no LSH probability involved).
* :func:`ngram_jaccard_clusters` — token n-gram Jaccard (word-level
  near-dup, robust to punctuation/casing noise).
* :func:`embedding_cosine_clusters` — near-dup by embedding cosine >= tau
  (semantic dedup), LSH-bucketed candidate generation + exact re-rank.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..config import DEFAULT_CONFIG, DedupConfig
from ..functions.shingle import shingle_hashes
from ..functions.similarity import jaccard
from ..functions.udfs import minhash_udf, signatures_udf
from .exact import normalize_expr
from .components import connected_components
from .lsh import candidate_pairs
from .verify import verify_pairs


def exact_dedup(docs: DataFrame) -> DataFrame:
    """One canonical row per byte-identical text: (canonical_id, fr).

    canonical = min doc_id (deterministic); fr = group size.
    """
    return (
        docs.groupBy(F.xxhash64("text").alias("text_hash"))
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("fr"),
        )
        .select("canonical_id", "fr")
    )


def minhash_lsh_clusters(
    docs: DataFrame, cfg: DedupConfig = DEFAULT_CONFIG
) -> DataFrame:
    """(doc_id, cluster_id) near-dup assignment via the main engine."""
    reps = (
        docs.select(F.col("doc_id").alias("rep_id"), "text")
        .withColumn("norm_text", normalize_expr(F.col("text")))
        .withColumn("sig", signatures_udf(cfg)(F.col("norm_text")))
        .select(
            "rep_id", "norm_text",
            F.col("sig.minhash").alias("minhash"),
            F.col("sig.simhash").alias("simhash"),
        )
    )
    edges, _ = candidate_pairs(reps.select("rep_id", "minhash"), cfg)
    verified = verify_pairs(edges, reps, cfg)
    cc = connected_components(verified.select("id_a", "id_b"), cfg)
    return (
        docs.select(F.col("doc_id").alias("rep_id"))
        .join(cc, "rep_id", "left")
        .select(
            F.col("rep_id").alias("doc_id"),
            F.coalesce("cluster_id", "rep_id").alias("cluster_id"),
        )
    )


def simhash_clusters(
    docs: DataFrame, max_hamming: int = 3, cfg: DedupConfig = DEFAULT_CONFIG
) -> DataFrame:
    """(doc_id, cluster_id) via SimHash hamming <= ``max_hamming``.

    Pigeonhole bucketing: split the 64-bit fingerprint into
    ``max_hamming + 1`` chunks; any pair within hamming d shares at least
    one unchanged chunk, so bucketing by (chunk_idx, chunk_value) has
    RECALL 1.0 by construction (gencore's UMI hamming<=1 grouping has the
    same exactness property, ``cluster.cpp:41-53``).
    """
    n_chunks = max_hamming + 1
    bits = 64 // n_chunks
    sh = docs.select(
        "doc_id", signatures_udf(cfg)(normalize_expr(F.col("text"))).alias("sig")
    ).select("doc_id", F.col("sig.simhash").alias("simhash"))
    chunks = [
        F.struct(
            F.lit(i).alias("chunk_idx"),
            F.shiftrightunsigned("simhash", i * bits).bitwiseAND(
                F.lit((1 << bits) - 1)
            ).alias("chunk_val"),
        )
        for i in range(n_chunks)
    ]
    exploded = sh.select(
        "doc_id", "simhash", F.explode(F.array(*chunks)).alias("c")
    ).select("doc_id", "simhash", "c.chunk_idx", "c.chunk_val")
    a = exploded.select(
        "chunk_idx", "chunk_val",
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sim_a"),
    )
    b = exploded.select(
        "chunk_idx", "chunk_val",
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sim_b"),
    )
    pairs = (
        a.join(b, ["chunk_idx", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))) <= max_hamming
        )
        .select("id_a", "id_b")
        .distinct()
    )
    cc = connected_components(pairs, cfg)
    return (
        docs.select(F.col("doc_id").alias("rep_id"))
        .join(cc, "rep_id", "left")
        .select(
            F.col("rep_id").alias("doc_id"),
            F.coalesce("cluster_id", "rep_id").alias("cluster_id"),
        )
    )


def _token_ngram_jaccard_udf(n: int):
    @F.pandas_udf(T.DoubleType())
    def _j(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.empty(len(ta), dtype=np.float64)
        for i, (x, y) in enumerate(zip(ta, tb)):
            gx = _token_ngrams(x or "", n)
            gy = _token_ngrams(y or "", n)
            out[i] = jaccard(gx, gy)
        return pd.Series(out)

    return _j


def _token_ngrams(text: str, n: int) -> np.ndarray:
    """Hashes of word n-grams: tokens joined by a separator, char-hashed."""
    toks = text.lower().split()
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    if not grams:
        return np.zeros(0, dtype=np.uint64)
    # k > byte-length → shingle_hashes returns one whole-string hash per gram
    return np.unique(
        np.array(
            [shingle_hashes(g, len(g.encode()) + 1)[0] for g in grams],
            dtype=np.uint64,
        )
    )


def ngram_jaccard_clusters(
    docs: DataFrame,
    n: int = 3,
    tau: float = 0.8,
    cfg: DedupConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """(doc_id, cluster_id) via token n-gram Jaccard >= tau.

    Candidates come from the char-shingle LSH (a superset of token-level
    near-dups at these thresholds); verification recomputes Jaccard on the
    token n-gram sets.
    """
    reps = (
        docs.select(F.col("doc_id").alias("rep_id"), "text")
        .withColumn("norm_text", normalize_expr(F.col("text")))
        .withColumn("minhash", minhash_udf(cfg)(F.col("norm_text")))
    )
    edges, _ = candidate_pairs(reps.select("rep_id", "minhash"), cfg)
    a = reps.select(F.col("rep_id").alias("id_a"), F.col("norm_text").alias("ta"))
    b = reps.select(F.col("rep_id").alias("id_b"), F.col("norm_text").alias("tb"))
    verified = (
        edges.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("j", _token_ngram_jaccard_udf(n)(F.col("ta"), F.col("tb")))
        .filter(F.col("j") >= tau)
        .select("id_a", "id_b")
    )
    cc = connected_components(verified, cfg)
    return (
        docs.select(F.col("doc_id").alias("rep_id"))
        .join(cc, "rep_id", "left")
        .select(
            F.col("rep_id").alias("doc_id"),
            F.coalesce("cluster_id", "rep_id").alias("cluster_id"),
        )
    )


def embedding_cosine_clusters(
    vectors: DataFrame,
    tau: float = 0.95,
    dim: int = 64,
    cfg: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster_id): near-dup groups where cosine >= tau.

    Sign-LSH bucket join generates candidates (16-bit codes, multi-probe
    not needed at tau>=0.9 — near-identical vectors share codes w.h.p.),
    exact cosine verifies, CC resolves transitivity.
    """
    from .ann import _cosine, hyperplane_code_udf

    code = hyperplane_code_udf(dim, n_planes=12, seed=cfg.seed)
    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        code(F.col(vec_col)).alias("bucket"),
    )
    a = v.select(F.col("bucket"), F.col("vid").alias("id_a"), F.col("vec").alias("va"))
    b = v.select(F.col("bucket"), F.col("vid").alias("id_b"), F.col("vec").alias("vb"))
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", _cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= tau)
        .select("id_a", "id_b")
        .distinct()
    )
    cc = connected_components(pairs, cfg)
    return (
        vectors.select(F.col(id_col).alias("rep_id"))
        .join(cc, "rep_id", "left")
        .select(
            F.col("rep_id").alias(id_col),
            F.coalesce("cluster_id", "rep_id").alias("cluster_id"),
        )
    )
