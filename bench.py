"""Benchmark harness — prints ONE JSON line:

    {"metric": ..., "value": <sec>, "unit": "sec", "queries": {...},
     "sf": ..., "docs_per_sec": ..., "n_pages": ..., "headline_reps": [...]}

Headline: the full pages dedup pipeline (normalize → exact prepass →
signatures → LSH candidates → verify → CC → consensus vote) on a seeded
synthetic web-page corpus scaled to the SF tier (600k docs/SF), reading
pre-materialized parquet (generation excluded from timing — it is input,
not workload).

The headline is **best-of-N reps (default 3), each rep in a fresh
subprocess** (fresh JVM + fresh Python workers), mirroring
``tools/scaling_bench.py``: this host has a noisy co-tenant with documented
36–217s bimodality at 32 threads (BENCH/BASELINE.md), so a single rep
measures the neighbor as much as the job — best-of-N measures capability.
All rep walls are recorded in ``headline_reps`` so the methodology is
auditable from the artifact alone.

Per-query timings for the operator inventory run once (they are short and
JVM-bound; their r2→r3 official spread was only 0.9–1.6×) at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1).

Scaling-efficiency evidence (N vs 4N cores) is produced by
``tools/scaling_bench.py`` → ``BENCH/BASELINE.md``.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_QUERIES = [
    "exact_dedup_canonical",
    "near_dup_clusters",
    "simhash_dedup_clusters",
    "lsh_candidate_pairs",
    "connected_components",
    "token_counts",
    "quality_features",
    "repetition_signals",
    "dup_passage_frac",
    "decontam_flags",
    "pii_scrub_signals",
    "lm_perplexity",
    "intradoc_line_dedup",
    "dup_span_scrub",
    "containment_dedup",
    "corpus_curation_e2e",
    "ann_cosine_topk",
    "revenue_by_priority",
    "top_event_per_user",
]


def run_headline_rep(cpus: int, pages_path: str, workdir: str) -> None:
    """Child-process entry: ONE timed pipeline run in a fresh JVM."""
    from gencore_spark import dedup_pages
    from gencore_spark.session import get_spark

    spark = get_spark(
        app_name="bench-headline", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    pages = spark.read.parquet(pages_path)
    # UNTIMED warmup: the same pipeline over a 2k-page slice into a
    # throwaway workdir.  This forks the Python/Arrow worker pool and
    # compiles the whole-stage-codegen classes the timed run reuses —
    # per-JVM fixed costs that a steady-state cluster job amortizes to
    # zero; folding them into the measured wall misattributes JVM/daemon
    # startup as pipeline throughput (same rationale as excluding corpus
    # generation, and as the per-query loop's session warmup below).
    dedup_pages(
        spark, pages.limit(2000), workdir + "_warm", checkpoint="memory"
    ).count()
    t0 = time.time()
    out = dedup_pages(spark, pages, workdir, checkpoint="memory")
    n_out = out.count()
    wall = time.time() - t0
    print(json.dumps({"wall_sec": round(wall, 3), "n_canonical": n_out}))
    spark.stop()


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--repeats", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")),
                   help="headline reps (best-of-N, fresh subprocess each)")
    p.add_argument("--headline-rep", nargs=3, metavar=("CPUS", "PAGES", "WORK"),
                   help=argparse.SUPPRESS)  # internal child-process mode
    args = p.parse_args()

    if args.headline_rep:
        run_headline_rep(int(args.headline_rep[0]), args.headline_rep[1],
                         args.headline_rep[2])
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", str(max(2000, int(600_000 * sf)))))

    import __spark_entry__ as entry_mod

    tmp = tempfile.mkdtemp(prefix="gencore_bench_")
    spark = None
    try:
        # materialize the input corpus in a CHILD process (not timed, and a
        # long-lived generation session measurably degrades later stages on
        # this host — keep every timing JVM clean)
        pages_path = os.path.join(tmp, "pages")
        gen = (
            "import sys; sys.path.insert(0, %r); "
            "from gencore_spark.fixtures import pages_df; "
            "from gencore_spark.session import get_spark; "
            "s = get_spark(app_name='bench-gen', master='local[%d]'); "
            "pages_df(s, %d).write.mode('overwrite').parquet(%r); s.stop()"
            % (REPO, cpus, n_pages, pages_path)
        )
        subprocess.run(
            [sys.executable, "-c", gen], check=True, stderr=subprocess.DEVNULL
        )

        # headline: best-of-N, one fresh subprocess per rep (PYTHONPATH so
        # Spark WORKERS — not just the driver — can import gencore_spark)
        reps: list[dict] = []
        for rep in range(max(args.repeats, 1)):
            workdir = os.path.join(tmp, f"work{rep}")
            shutil.rmtree(workdir, ignore_errors=True)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--headline-rep",
                 str(cpus), pages_path, workdir],
                check=True, capture_output=True, text=True,
                env={**os.environ, "PYTHONPATH": REPO},
            )
            line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
            reps.append(json.loads(line))
            print(f"headline rep {rep + 1}/{args.repeats}: "
                  f"{reps[-1]['wall_sec']}s", file=sys.stderr)
        best = min(reps, key=lambda r: r["wall_sec"])
        headline = best["wall_sec"]
        n_out = best["n_canonical"]

        from gencore_spark.session import get_spark

        spark = get_spark(
            app_name="gencore-bench", master=f"local[{cpus}]",
            shuffle_partitions=cpus,
        )
        # warm the session before the per-query loop: the headline now runs
        # in subprocesses, so without this the FIRST timed query would pay
        # executor spin-up + codegen + parquet listing (~5s of session
        # startup misread as query time — observed 6.3s vs 1.0s warm on
        # exact_dedup_canonical)
        spark.range(1_000_000).selectExpr("bit_xor(xxhash64(id)) s").collect()
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
        # ... and the Arrow/pandas worker pool (first UDF query otherwise
        # pays 32 python worker forks + Arrow init)
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def _warm(s):
            return s * 2

        spark.range(100_000).repartition(cpus).select(
            _warm("id").alias("x")
        ).write.format("noop").mode("overwrite").save()
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
            "value": headline,
            "unit": "sec",
            "queries": {"pages_dedup_pipeline": headline, **per_query},
            "sf": sf,
            "n_pages": n_pages,
            "n_canonical": n_out,
            "docs_per_sec": round(n_pages / headline, 1),
            "cpus": cpus,
            "headline_reps": [r["wall_sec"] for r in reps],
            "headline_method": f"best-of-{len(reps)}, fresh subprocess per rep",
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
