"""Scaling-efficiency evidence: same job, same input, two parallelism levels.

The BASELINE.json north rule requires throughput scaling efficiency >= 0.8
between N and 4N executors.  No real cluster exists in the sandbox, so per
the driver instruction the proxy is ``local[8]`` vs ``local[32]`` on the
SAME materialized input corpus:

    efficiency = (docs_per_sec@32 / docs_per_sec@8) / 4

Each level runs in a fresh SparkSession (sequentially, never concurrently),
reading a pre-materialized parquet corpus so generation cost is excluded.
Results are appended to BENCH/BASELINE.md.

Usage:  PYTHONPATH=/root/repo python tools/scaling_bench.py [n_pages]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEVELS = [8, 32]


def run_level(cores: int, pages_path: str, workdir: str) -> dict:
    from gencore_spark import dedup_pages
    from gencore_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    try:
        pages = spark.read.parquet(pages_path)
        n = pages.count()
        t0 = time.time()
        out = dedup_pages(spark, pages, workdir)
        n_out = out.count()
        wall = time.time() - t0
        return {
            "cores": cores,
            "n_pages": n,
            "n_canonical": n_out,
            "wall_sec": round(wall, 2),
            "docs_per_sec": round(n / wall, 1),
        }
    finally:
        spark.stop()


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
    tmp = tempfile.mkdtemp(prefix="gencore_scaling_")
    try:
        from gencore_spark.fixtures import pages_df
        from gencore_spark.session import get_spark

        spark = get_spark(app_name="scaling-gen", master="local[32]")
        pages_path = os.path.join(tmp, "pages")
        pages_df(spark, n_pages).write.mode("overwrite").parquet(pages_path)
        spark.stop()

        results = []
        for cores in LEVELS:
            workdir = os.path.join(tmp, f"work{cores}")
            results.append(run_level(cores, pages_path, workdir))
            print(json.dumps(results[-1]), flush=True)

        lo, hi = results[0], results[-1]
        ratio = hi["docs_per_sec"] / lo["docs_per_sec"]
        eff = ratio / (LEVELS[-1] / LEVELS[0])
        summary = {
            "n_pages": n_pages,
            "levels": results,
            "speedup": round(ratio, 3),
            "scaling_efficiency": round(eff, 3),
            "target": 0.8,
        }
        print(json.dumps(summary))

        os.makedirs("BENCH", exist_ok=True)
        stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
        with open("BENCH/BASELINE.md", "a") as f:
            f.write(
                f"\n## Scaling run {stamp} — {n_pages} pages\n\n"
                f"| cores | wall (s) | docs/sec |\n|---|---|---|\n"
                + "".join(
                    f"| local[{r['cores']}] | {r['wall_sec']} | {r['docs_per_sec']} |\n"
                    for r in results
                )
                + f"\nspeedup {LEVELS[0]}→{LEVELS[-1]} cores: "
                f"**{ratio:.2f}x**; scaling efficiency: **{eff:.3f}** "
                f"(target ≥ 0.8)\n"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
