"""Stage 5: connected components — alternating large-star / small-star.

Reference analog: greedy transitive UMI grouping (``cluster.cpp:55-100``) —
gencore absorbs every pair within hamming<=d of the current top UMI and
repeats, which computes exactly the connected components of the
hamming-ball graph.  Ours computes CC of the verified-pair graph with the
large-star/small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) — O(log n) rounds of pure DataFrame
joins/aggregations, no driver-side graph state.

Per-round ops (all equi-joins + groupBy — shuffle on node id):

* large-star: for each node u, m = min(N(u) ∪ {u}); emit (v, m) for every
  neighbor v > u.
* small-star: orient edges (a > b); for each a, m = min(N(a) ∪ {a});
  emit (v, m) for v in N(a) ∪ {a} \\ {m}.

Convergence: the edge multiset fingerprint (count, xor-sum of pair hashes)
is stable across a round.  ``localCheckpoint`` truncates lineage each round
(the one place iterative lineage can blow up a long job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import DEFAULT_CONFIG, DedupConfig


def _large_star(edges: DataFrame) -> DataFrame:
    sym = edges.select("a", "b").unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    mins = sym.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
    return (
        sym.join(mins, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    oriented = edges.select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
    ).filter(F.col("a") != F.col("b"))
    mins = oriented.groupBy("a").agg(F.min("b").alias("m"))
    nbrs = oriented.join(mins, "a")
    to_min = nbrs.filter(F.col("b") != F.col("m")).select(
        F.col("b").alias("a"), F.col("m").alias("b")
    )
    self_to_min = mins.select(F.col("a"), F.col("m").alias("b"))
    return to_min.unionByName(self_to_min).distinct()


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # mod a 1e9 prime before summing: ANSI-safe up to ~9e9 edges
        F.sum(F.pmod(F.xxhash64("a", "b"), F.lit(1000000007))).alias("h"),
    ).collect()[0]
    return int(row["n"] or 0), int(row["h"] or 0)


def connected_components(
    edges: DataFrame, cfg: DedupConfig | None = None,
    assume_distinct: bool = False,
) -> DataFrame:
    """edges (id_a, id_b) → assignment (rep_id, cluster_id).

    ``cluster_id`` is the minimum node id of the component (deterministic,
    resume-stable).  Every node appearing in ``edges`` gets a row; isolated
    nodes are the caller's concern (they keep their own id).

    ``assume_distinct`` — caller attests the edge rows are already unique
    (e.g. they come from a ``distinct()`` candidate set that a verify
    stage only FILTERED): skips the input dedup shuffle.  The output is
    identical either way; duplicates would only inflate intermediate row
    counts, never change the fixpoint.
    """
    cfg = cfg or DEFAULT_CONFIG
    # Node ids are type-agnostic: any hashable + orderable Spark type works
    # (long for table-keyed graphs, struct(hi, lo) for the pipeline's
    # 128-bit doc ids) — the star rounds only group, join, and min() them.
    #
    # Materialize the input ONCE before iterating: every star round
    # references its input 2-3x, so an unmaterialized upstream (e.g. the
    # full signature+verify tree) would be recomputed ~(2-3)^rounds times.
    # Eager localCheckpoint (not lazy persist): truncating the physical
    # plan each cycle keeps per-round stage latency flat — a measured 6x
    # per-round difference on this host versus persist-chained lineage.
    cur = edges.select(
        F.col("id_a").alias("a"),
        F.col("id_b").alias("b"),
    ).filter(F.col("a") != F.col("b"))
    if not assume_distinct:
        cur = cur.distinct()
    # lazy pin + input fingerprint: ONE job materializes the input AND
    # yields the cycle-0 fingerprint, so (a) the former eager-checkpoint
    # barrier job is folded into useful work, and (b) a graph that is
    # ALREADY a star forest (exact-dup-heavy corpora) converges after a
    # single confirming cycle instead of two — the star cycle's fixpoints
    # are exactly the final forests (Kiveris et al.), so "cycle output
    # fingerprint == previous fingerprint" is the same stop criterion
    # whether "previous" is cycle k or the input.
    cur = cur.localCheckpoint(eager=False)
    prev_fp = _fingerprint(cur)

    # Checkpoint + fingerprint FUSED into one job per CYCLE: the checkpoint
    # is lazy and the fingerprint collect is the action that materializes
    # it.  Exactly one cycle per checkpoint, measured (round 6): each star
    # references its input 3-4x, so an unpinned K-cycle chain duplicates
    # the base plan ~12^K times and DRIVER-SIDE CATALYST PLANNING of the
    # lazy checkpoint (Dataset.localCheckpoint compiles the physical plan
    # eagerly) becomes the loop's dominant cost — the prior 2-cycle fusion
    # spent 1.3-3.5s PLANNING each checkpoint (measured on a 6k-edge
    # graph; the fingerprint jobs themselves were 0.1-0.2s), ~7s of a
    # 7.5s query.  Per-cycle pinning keeps every planned tree ~12 leaves
    # (0.1-0.3s) at the price of one extra driver trip per 2 cycles —
    # the 5.2s -> 1.9s trade on the driver-bench CC query.
    for _ in range(cfg.cc_max_iterations):
        # pin after EACH star: both checkpoints are lazy and materialize in
        # the same fingerprint job, but each planned tree is now 3-4 leaves
        # instead of 12 (planning is superlinear in tree size)
        cur = _large_star(cur).localCheckpoint(eager=False)
        cur = _small_star(cur).localCheckpoint(eager=False)
        fp = _fingerprint(cur)
        if fp == prev_fp:
            break
        prev_fp = fp

    # converged: edges form stars (node -> component min). Add the roots.
    assign = cur.select(F.col("a").alias("rep_id"), F.col("b").alias("cluster_id"))
    roots = cur.select(F.col("b").alias("rep_id"), F.col("b").alias("cluster_id"))
    return assign.unionByName(roots).distinct()
