"""Stage 4: candidate pair verification.

Reference analog: ``Pair::isDupWith`` (``pair.cpp:307-326``) — a cheap
key-equality test AND'd with a UMI hamming gate — plus the cigar containment
check ``isPartOf`` (``bamutil.cpp:293-336``).

Ours is a three-gate AND, ordered cheap→expensive so the expensive gate runs
on the fewest rows:

1. **SimHash hamming** (pure JVM: ``bit_count(a ^ b)`` — whole-stage
   codegen, no Python) prunes grossly dissimilar pairs;
2. **exact char-shingle Jaccard** >= ``jaccard_threshold`` (vectorized
   pandas UDF; the decisive gate);
3. **LCS** >= ``lcs_min_ratio * min(len)`` (rolling-hash binary search,
   same UDF pass) — the containment analog: rejects bag-of-words collisions
   that share vocabulary but no contiguous run.

Verification only *removes* candidate pairs; the LSH config guarantees the
candidate set already contains >=0.9998 of true pairs at J >= 0.7 (see
DedupConfig recall math), so end-to-end recall stays above the 0.99 gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..config import DedupConfig
from ..functions.shingle import shingle_hashes
from ..functions.similarity import jaccard, lcs_length


def _verify_udf(cfg: DedupConfig):
    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("jaccard", T.DoubleType()),
                T.StructField("lcs", T.IntegerType()),
            ]
        )
    )
    def _verify(ta: pd.Series, tb: pd.Series) -> pd.DataFrame:
        jac = np.empty(len(ta), dtype=np.float64)
        lcs = np.zeros(len(ta), dtype=np.int32)
        k = cfg.shingle_k
        for i, (x, y) in enumerate(zip(ta, tb)):
            x = x or ""
            y = y or ""
            sx = shingle_hashes(x, k)
            sy = shingle_hashes(y, k)
            j = jaccard(sx, sy)
            jac[i] = j
            # LCS is only decision-relevant when Jaccard passed — skip the
            # binary search otherwise (early-exit, cf. group.cpp:231-232)
            if j >= cfg.jaccard_threshold and cfg.lcs_min_ratio > 0:
                lcs[i] = lcs_length(x, y)
        return pd.DataFrame({"jaccard": jac, "lcs": lcs})

    return _verify


def verify_pairs(
    edges: DataFrame, signed: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """edges (id_a, id_b) → verified edges with (jaccard, sim_hamming, lcs).

    ``signed`` must carry (rep_id, norm_text, simhash); it is joined twice
    (the reference's qname-keyed mate lookup, ``cluster.cpp:260-273``).
    """
    side = signed.select("rep_id", "norm_text", "simhash", "minhash")
    a = side.select(
        F.col("rep_id").alias("id_a"),
        F.col("norm_text").alias("text_a"),
        F.col("simhash").alias("sim_a"),
        F.col("minhash").alias("mh_a"),
    )
    b = side.select(
        F.col("rep_id").alias("id_b"),
        F.col("norm_text").alias("text_b"),
        F.col("simhash").alias("sim_b"),
        F.col("minhash").alias("mh_b"),
    )
    joined = edges.join(a, "id_a").join(b, "id_b")

    # gate 0 — MinHash-estimated Jaccard, pure JVM (zip_with over the
    # signature arrays).  With n=128 perms the estimator's std dev at
    # J=0.7 is sqrt(J(1-J)/128) ≈ 0.04, so gating at threshold − 3σ
    # (−0.12) rejects essentially no true pairs while pruning the bulk of
    # false band collisions before any Python runs.
    est = F.aggregate(
        F.zip_with("mh_a", "mh_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(cfg.num_perms)
    joined = (
        joined.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= cfg.jaccard_threshold - 0.12)
        .drop("mh_a", "mh_b")
    )

    # gate 1 — JVM-side popcount, prunes before any Python runs
    gated = joined.withColumn(
        "sim_hamming",
        F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("int"),
    ).filter(F.col("sim_hamming") <= cfg.simhash_max_hamming)

    # explicit repartition: the UDF below is CPU-bound; AQE's byte-based
    # coalescing would starve cores (see with_signatures for rationale)
    gated = gated.repartition(edges.sparkSession.sparkContext.defaultParallelism)

    # gates 2+3 — one vectorized UDF pass
    v = gated.withColumn("v", _verify_udf(cfg)(F.col("text_a"), F.col("text_b")))
    min_len = F.least(F.length("text_a"), F.length("text_b"))
    verified = (
        v.filter(
            (F.col("v.jaccard") >= cfg.jaccard_threshold)
            & (F.col("v.lcs") >= cfg.lcs_min_ratio * min_len)
        )
        .select(
            "id_a",
            "id_b",
            F.col("v.jaccard").alias("jaccard"),
            "sim_hamming",
            F.col("v.lcs").alias("lcs"),
        )
    )
    return verified
