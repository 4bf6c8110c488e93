"""Benchmark harness — prints ONE JSON line:

    {"metric": ..., "value": <sec>, "unit": "sec", "queries": {...},
     "sf": ..., "docs_per_sec": ..., "n_pages": ...}

Headline: the full pages dedup pipeline (normalize → exact prepass →
signatures → LSH candidates → verify → CC → consensus vote) on a seeded
synthetic web-page corpus scaled to the SF tier (600k docs/SF), reading
pre-materialized parquet (generation excluded from timing — it is input,
not workload).  Per-query timings for the operator inventory run at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1).

Scaling-efficiency evidence (local[8] vs local[32]) is produced by
``tools/scaling_bench.py`` → ``BENCH/BASELINE.md``.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "exact_dedup_canonical",
    "near_dup_clusters",
    "simhash_dedup_clusters",
    "lsh_candidate_pairs",
    "connected_components",
    "token_counts",
    "quality_features",
    "ann_cosine_topk",
    "revenue_by_priority",
    "top_event_per_user",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", str(max(2000, int(600_000 * sf)))))

    import subprocess

    import __spark_entry__ as entry_mod
    from gencore_spark import dedup_pages
    from gencore_spark.session import get_spark

    tmp = tempfile.mkdtemp(prefix="gencore_bench_")
    spark = None
    try:
        # materialize the input corpus in a CHILD process (not timed, and a
        # long-lived generation session measurably degrades later stages on
        # this host — keep the timing JVM clean)
        pages_path = os.path.join(tmp, "pages")
        repo = os.path.dirname(os.path.abspath(__file__))
        gen = (
            "import sys; sys.path.insert(0, %r); "
            "from gencore_spark.fixtures import pages_df; "
            "from gencore_spark.session import get_spark; "
            "s = get_spark(app_name='bench-gen', master='local[%d]'); "
            "pages_df(s, %d).write.mode('overwrite').parquet(%r); s.stop()"
            % (repo, cpus, n_pages, pages_path)
        )
        subprocess.run(
            [sys.executable, "-c", gen], check=True, stderr=subprocess.DEVNULL
        )

        spark = get_spark(
            app_name="gencore-bench", master=f"local[{cpus}]",
            shuffle_partitions=cpus,
        )
        pages = spark.read.parquet(pages_path)

        t0 = time.time()
        out = dedup_pages(spark, pages, os.path.join(tmp, "work"),
                          checkpoint="memory")
        n_out = out.count()
        headline = time.time() - t0

        queries = entry_mod.queries()
        per_query: dict[str, float] = {}
        failed: list[str] = []
        for name in BENCH_QUERIES:
            fn = queries.get(name)
            if fn is None:
                continue
            t0 = time.time()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as e:
                # name the failure loudly — a silent -1.0 reads as "fast"
                # in a naive diff of BENCH_r{N}.json files
                print(f"BENCH FAILURE {name}: {e!r}", file=sys.stderr)
                per_query[name] = -1.0
                failed.append(name)
                continue
            per_query[name] = round(time.time() - t0, 3)

        result = {
            "metric": f"pages_dedup_pipeline_sec@{n_pages}docs",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": {"pages_dedup_pipeline": round(headline, 3), **per_query},
            "sf": sf,
            "n_pages": n_pages,
            "n_canonical": n_out,
            "docs_per_sec": round(n_pages / headline, 1),
            "cpus": cpus,
        }
        if failed:
            result["failed_queries"] = failed
        print(json.dumps(result))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        if spark is not None:
            spark.stop()


if __name__ == "__main__":
    main()
