"""GC-configuration A/B at one parallelism level, measured by the
task-metric decomposition (``gencore_spark/plans/metrics_api.py``).

Motivation (BENCH/BASELINE.md, 23:06 UTC decomposed run): going 2→8
cores, JVM GC CPU triples (164→507 CPU-s for identical work) under
``-XX:+UseParallelGC`` with ergonomic thread count (= taskset width) on
the shared 48g local-mode heap — 43% of the total width-CPU inflation
that caps wall-based scaling efficiency.  This harness runs the SAME
leg (8 affinity-bound cores, same pre-generated corpus, fresh JVM per
variant) under candidate GC/heap configs and prints the decomposition
per variant, so the winner is chosen on consumed-CPU evidence rather
than bimodal walls.

Usage:
    PYTHONPATH=/root/repo python tools/gc_ab.py [n_pages] [cores]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VARIANTS: dict[str, dict[str, str]] = {
    # baseline: what rounds 1-4 shipped (fixed 48g local heap, ergonomic
    # GC threads = width) — pinned explicitly so it stays the historical
    # baseline now that get_spark defaults to width-sized heap/GC threads
    "parallel-ergo": {
        "spark.driver.memory": "48g",
        "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
    },
    # what get_spark now ships (width-sized): measure as its own variant
    "shipped": {},
    # fewer GC threads than mutator width: GC work is mostly bounded by
    # live-set copying, not thread count — spare threads just burn CPU
    "parallel-gct4": {
        "spark.driver.extraJavaOptions": "-XX:+UseParallelGC -XX:ParallelGCThreads=4",
    },
    "parallel-gct2": {
        "spark.driver.extraJavaOptions": "-XX:+UseParallelGC -XX:ParallelGCThreads=2",
    },
    # smaller heap: smaller young gen -> more frequent but cheaper
    # scavenges; tests whether the 48g default oversizes the young gen
    "parallel-16g": {"spark.driver.memory": "16g"},
    # heap ladder for the width-proportional policy (a real N-core
    # executor ships ~2g/core; local-mode's fixed 48g is the artifact)
    "parallel-4g": {"spark.driver.memory": "4g"},
    "parallel-8g": {"spark.driver.memory": "8g"},
    "parallel-32g": {"spark.driver.memory": "32g"},
    "parallel-64g": {"spark.driver.memory": "64g"},
    # winner-heap + pinned GC threads: does thread pinning stack with
    # right-sizing at full width?
    "parallel-16g-gct8": {
        "spark.driver.memory": "16g",
        "spark.driver.extraJavaOptions": "-XX:+UseParallelGC -XX:ParallelGCThreads=8",
    },
    # shuffle-partition tail smoothing: at partitions == cores the slowest
    # task of every shuffle stage idles the other slots (measured 0.92
    # slot occupancy at 8 wide vs 0.97 at 2); 2-3x cores lets the
    # scheduler backfill stage tails at the cost of more, smaller tasks.
    # Values assume the default 8-core run (pass cores=8).
    "sp2x": {"spark.sql.shuffle.partitions": "16"},
    "sp3x": {"spark.sql.shuffle.partitions": "24"},
    "sp2x-8g": {
        "spark.sql.shuffle.partitions": "16",
        "spark.driver.memory": "8g",
    },
}


def run_variant(name: str, cores: int, pages_path: str, workdir: str) -> None:
    from gencore_spark import dedup_pages
    from gencore_spark.plans import driver_stage_metrics
    from gencore_spark.session import get_spark

    import time

    extra = {
        "spark.ui.enabled": "true",
        "spark.ui.retainedStages": "4000",
        **VARIANTS[name],
    }
    mem = extra.pop("spark.driver.memory", None)
    if mem:
        os.environ["SPARK_DRIVER_MEMORY"] = mem
    spark = get_spark(
        app_name=f"gcab-{name}", master=f"local[{cores}]",
        shuffle_partitions=cores, extra=extra,
    )
    pages = spark.read.parquet(pages_path)
    n = pages.count()
    # untimed warmup + metric snapshot, mirroring tools/scaling_bench.py:
    # variants are compared on the steady-state window (worker forks and
    # codegen are width-independent fixed cost, not GC/heap signal)
    dedup_pages(spark, pages.limit(2000), workdir + "_warm",
                checkpoint="memory").count()
    m0 = driver_stage_metrics(spark)
    t0 = time.time()
    out = dedup_pages(spark, pages, workdir, checkpoint="memory")
    n_out = out.count()
    wall = time.time() - t0
    m1 = driver_stage_metrics(spark)
    metrics = {
        k: round(m1[k] - m0.get(k, 0), 1) if isinstance(m1[k], float)
        else m1[k] - m0.get(k, 0)
        for k in m1
    }
    print(json.dumps({
        "variant": name, "cores": cores, "n_pages": n, "n_canonical": n_out,
        "wall_sec": round(wall, 2), "docs_per_sec": round(n / wall, 1),
        **metrics,
    }))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--variant":
        run_variant(sys.argv[2], int(sys.argv[3]), sys.argv[4], sys.argv[5])
        return

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    tmp = tempfile.mkdtemp(prefix="gencore_gcab_")
    try:
        pages_path = os.path.join(tmp, "pages")
        gen = (
            "import sys; sys.path.insert(0, %r); "
            "from gencore_spark.fixtures import pages_df; "
            "from gencore_spark.session import get_spark; "
            "s = get_spark(app_name='gcab-gen', master='local[32]'); "
            "pages_df(s, %d).write.mode('overwrite').parquet(%r); s.stop()"
            % (REPO, n_pages, pages_path)
        )
        subprocess.run([sys.executable, "-c", gen], check=True,
                       stderr=subprocess.DEVNULL)
        # pick variants via SPARK_GRAFT_GCAB_VARIANTS="a,b,c" (default all)
        sel = os.environ.get("SPARK_GRAFT_GCAB_VARIANTS")
        names = [n for n in sel.split(",") if n] if sel else list(VARIANTS)
        for name in names:
            workdir = os.path.join(tmp, f"work_{name}")
            shutil.rmtree(workdir, ignore_errors=True)
            proc = subprocess.run(
                ["taskset", "-c", f"0-{cores - 1}", sys.executable,
                 os.path.abspath(__file__), "--variant", name, str(cores),
                 pages_path, workdir],
                check=True, capture_output=True, text=True,
                env={**os.environ, "PYTHONPATH": REPO},
            )
            print([l for l in proc.stdout.splitlines()
                   if l.startswith("{")][-1], flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
