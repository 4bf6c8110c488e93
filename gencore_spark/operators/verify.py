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
from ..functions.similarity import has_common_substring


def _verify_udf(cfg: DedupConfig):
    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("jaccard", T.DoubleType()),
                T.StructField("lcs_ok", T.BooleanType()),
                T.StructField("cont_a", T.DoubleType()),
                T.StructField("cont_b", T.DoubleType()),
            ]
        )
    )
    def _verify(ta: pd.Series, tb: pd.Series) -> pd.DataFrame:
        jac = np.empty(len(ta), dtype=np.float64)
        lcs_ok = np.zeros(len(ta), dtype=bool)
        cont_a = np.empty(len(ta), dtype=np.float64)
        cont_b = np.empty(len(ta), dtype=np.float64)
        k = cfg.shingle_k
        # per-batch shingle memo: anchor-star edges repeat one text
        # thousands of times within a bucket (the skew block)
        memo: dict[str, np.ndarray] = {}

        def sh(t: str) -> np.ndarray:
            # keyed by the string itself: dict equality handles hash
            # collisions, same amortized speed
            s = memo.get(t)
            if s is None:
                s = shingle_hashes(t, k)
                memo[t] = s
            return s

        for i, (x, y) in enumerate(zip(ta, tb)):
            x = x or ""
            y = y or ""
            if x == y:
                jac[i] = 1.0
                lcs_ok[i] = True
                cont_a[i] = cont_b[i] = 1.0
                continue
            sa, sb = sh(x), sh(y)
            na, nb = sa.shape[0], sb.shape[0]
            inter = np.intersect1d(sa, sb, assume_unique=True).shape[0]
            j = inter / max(na + nb - inter, 1)
            # shingle containment of each side in the other — the
            # representative-election signal (isPartOf, bamutil.cpp:293-336):
            # a truncated doc has containment ≈ 1 in its source
            cont_a[i] = inter / na if na else 1.0
            cont_b[i] = inter / nb if nb else 1.0
            jac[i] = j
            if j < cfg.jaccard_threshold or cfg.lcs_min_ratio <= 0:
                # LCS is only decision-relevant when Jaccard passed — skip
                # (early-exit, cf. the reference's quorum break
                # group.cpp:231-232)
                lcs_ok[i] = True
            elif j >= 0.85:
                # bag-of-words false collisions (the gate's only target)
                # cannot reach J 0.85 on char shingles; skip the scan
                lcs_ok[i] = True
            else:
                m = int(cfg.lcs_min_ratio * min(len(x), len(y)))
                lcs_ok[i] = has_common_substring(x, y, m)
        return pd.DataFrame(
            {"jaccard": jac, "lcs_ok": lcs_ok, "cont_a": cont_a, "cont_b": cont_b}
        )

    # nondeterministic marking stops Catalyst from re-inlining the UDF once
    # per struct-field reference (observed: 4 ArrowEvalPython nodes = the
    # kernel executing 4x per pair).  The UDF is pure; this is purely an
    # evaluate-once fence.
    return _verify.asNondeterministic()


def attach_pair_payload(
    pairs: DataFrame,
    payload: DataFrame,
    value_col: str,
    out_a: str,
    out_b: str,
    id_col: str = "rep_id",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Attach a per-item payload column to BOTH sides of candidate pairs
    with each payload value moving at most twice — THE shuffle-byte shape
    for fat payloads (texts, vectors) at the 100 TB design point.

    The naive ``pairs.join(pa, "id_a").join(pb, "id_b")`` duplicates an
    anchor's payload across every one of its (possibly thousands of)
    capped-bucket edges in the first join's shuffle, then ships the pair
    row again in the second.  Instead: explode each pair into its two
    (pair, side, item) rows, attach the payload with ONE join on the item
    id, and fold back to one row per pair with a hash-partitioned
    aggregation.  The explicit ``repartition(3x cores, id_a, id_b)`` both
    feeds the groupBy (hash partitioning satisfies its required
    distribution — no extra exchange) and gives downstream CPU-bound UDFs
    fine enough partitions to balance payload-length skew (measured: with
    exactly `cores` partitions the verify stage scaled at 0.63 efficiency
    2->8 cores; AQE's byte-based coalescing would make it worse).

    ``pairs`` must have (id_a, id_b, *extra_cols); ``payload`` must have
    (id_col, value_col).  Output: (id_a, id_b, *extra_cols, out_a, out_b).
    """
    par = pairs.sparkSession.sparkContext.defaultParallelism * 3
    sides = pairs.select(
        "id_a",
        "id_b",
        *extra_cols,
        F.explode(
            F.array(
                F.struct(F.lit("a").alias("side"), F.col("id_a").alias("rid")),
                F.struct(F.lit("b").alias("side"), F.col("id_b").alias("rid")),
            )
        ).alias("s"),
    ).select("id_a", "id_b", *extra_cols, "s.side", "s.rid")
    vals = payload.select(F.col(id_col).alias("rid"), F.col(value_col).alias("v"))
    # exactly one non-null per (pair, side), so first(ignorenulls) is
    # deterministic — and works for any payload type (string, array, ...)
    return (
        sides.join(vals, "rid")
        .repartition(par, "id_a", "id_b")
        .groupBy("id_a", "id_b")
        .agg(
            F.first(F.when(F.col("side") == "a", F.col("v")), ignorenulls=True).alias(out_a),
            F.first(F.when(F.col("side") == "b", F.col("v")), ignorenulls=True).alias(out_b),
            *[F.first(c).alias(c) for c in extra_cols],
        )
    )


def verify_pairs(
    edges: DataFrame, signed: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """edges (id_a, id_b) → verified edges with (jaccard, sim_hamming, lcs).

    ``signed`` must carry (rep_id, norm_text, simhash); it is joined twice
    (the reference's qname-keyed mate lookup, ``cluster.cpp:260-273``).
    """
    # Join order is deliberate: signatures first (1 KB/side), texts LAST and
    # only for gate survivors — candidate pairs that fail the cheap gates
    # never shuffle their (multi-KB) text payloads at all.
    sig_side = signed.select("rep_id", "simhash", "minhash")
    sa = sig_side.select(
        F.col("rep_id").alias("id_a"),
        F.col("simhash").alias("sim_a"),
        F.col("minhash").alias("mh_a"),
    )
    sb = sig_side.select(
        F.col("rep_id").alias("id_b"),
        F.col("simhash").alias("sim_b"),
        F.col("minhash").alias("mh_b"),
    )
    joined = edges.join(sa, "id_a").join(sb, "id_b")

    # gate 0 — MinHash-estimated Jaccard, pure JVM (zip_with over the
    # signature arrays).  The estimator's std dev at the threshold is
    # sqrt(J(1-J)/num_perms), so gating at threshold − 3σ rejects
    # essentially no true pairs while pruning the bulk of false band
    # collisions before any Python runs.  Computed from cfg (not a
    # literal) so smaller num_perms configs keep the 3σ guarantee.
    j = cfg.jaccard_threshold
    margin = 3.0 * (j * (1.0 - j) / cfg.num_perms) ** 0.5
    est = F.aggregate(
        F.zip_with("mh_a", "mh_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(cfg.num_perms)
    joined = (
        joined.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= j - margin)
        .drop("mh_a", "mh_b")
    )

    # gate 1 — JVM-side popcount
    survivors = joined.withColumn(
        "sim_hamming",
        F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("int"),
    ).filter(F.col("sim_hamming") <= cfg.simhash_max_hamming)

    # now (and only now) fetch texts for the survivors, via the shared
    # explode+fold shape (see attach_pair_payload): each text moves at most
    # twice, never once per candidate edge.
    gated = attach_pair_payload(
        survivors, signed, "norm_text", "text_a", "text_b",
        extra_cols=("sim_hamming",),
    )

    # gates 2+3 — one vectorized UDF pass
    v = gated.withColumn("v", _verify_udf(cfg)(F.col("text_a"), F.col("text_b")))
    verified = (
        v.filter((F.col("v.jaccard") >= cfg.jaccard_threshold) & F.col("v.lcs_ok"))
        .select(
            "id_a",
            "id_b",
            F.col("v.jaccard").alias("jaccard"),
            F.col("v.cont_a").alias("cont_a"),
            F.col("v.cont_b").alias("cont_b"),
            "sim_hamming",
        )
    )
    return verified


def rep_containment(verified: DataFrame) -> DataFrame:
    """(rep_id, containment): each rep's best shingle-containment within any
    verified neighbor — the election score (most-contained wins ties,
    mirroring the reference's representative pick, ``group.cpp:196-267``)."""
    a = verified.select(F.col("id_a").alias("rep_id"), F.col("cont_a").alias("c"))
    b = verified.select(F.col("id_b").alias("rep_id"), F.col("cont_b").alias("c"))
    return a.unionByName(b).groupBy("rep_id").agg(F.max("c").alias("containment"))
