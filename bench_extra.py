"""Per-query isolation harness for optimization work (guide §1.4).

NOT the frozen driver bench (``bench.py``) — this file exists so the round's
before/after evidence can be produced without touching the measured harness:

* times individual ``__spark_entry__.queries()`` entries against the noop
  sink in ONE warm session (same session config + warmup as bench.py's
  per-query loop, so numbers are comparable to BENCH_r*.json "queries");
* optionally dumps ``.explain("formatted")`` per query to a directory
  (``--plans DIR``) for the plans/r06 artifacts;
* ``--reps N`` re-times each query N times in the same session (min +
  list reported) to separate plan-cost changes from host noise.

Usage:
    python bench_extra.py [--reps 3] [--plans plans/r06 --suffix _after] \
        [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("names", nargs="*", help="query names (default: bench list)")
    p.add_argument("--reps", type=int, default=1)
    p.add_argument("--plans", default=None, help="dir to write explain output")
    p.add_argument("--suffix", default="", help="plan filename suffix (_before/_after)")
    args = p.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entry_mod
    from gencore_spark.session import get_spark

    spark = get_spark(
        app_name="bench-extra", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    # same warmup as bench.py's per-query loop: codegen + parquet listing +
    # Arrow worker pool, so the first timed query isn't session startup
    spark.range(1_000_000).selectExpr("bit_xor(xxhash64(id)) s").collect()
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s * 2

    spark.range(100_000).repartition(cpus).select(_warm("id").alias("x")).write.format(
        "noop"
    ).mode("overwrite").save()

    queries = entry_mod.queries()
    names = args.names or [
        "exact_dedup_canonical", "near_dup_clusters", "simhash_dedup_clusters",
        "lsh_candidate_pairs", "connected_components", "token_counts",
        "quality_features", "repetition_signals", "dup_passage_frac",
        "decontam_flags", "pii_scrub_signals", "lm_perplexity",
        "intradoc_line_dedup", "dup_span_scrub", "containment_dedup",
        "corpus_curation_e2e", "ann_cosine_topk", "revenue_by_priority",
        "top_event_per_user",
    ]
    out: dict[str, dict] = {}
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.plans, f"{name}{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
        if args.reps < 1:   # plan-only mode
            out[name] = {"min": None, "reps": []}
            continue
        walls = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(walls), "reps": walls}
        print(f"{name}: min {min(walls)}s  reps {walls}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
