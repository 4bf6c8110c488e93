"""Capstone validation run: the full snapshot-mode pipeline at a corpus
size beyond the bench point, with peak-memory evidence.

bench.py measures the 60k-page headline; scaling_bench.py measures the
N→4N law in memory mode.  This tool is the third artifact (r4 VERDICT #5):
ONE full `dedup_pages` run at 600k pages (10× the bench corpus) in the
default `--checkpoint stages` mode — snapshot writes + read-backs included,
i.e. the configuration a production resume-capable job actually runs —
under the width-sized JVM, recording:

* wall seconds + docs/sec,
* peak process-tree RSS (driver JVM + pyspark workers), sampled from
  /proc every 0.5 s by a daemon thread — the "does 600k fit the width-
  sized 16 g heap + Arrow workers" number,
* REPORT.json highlights: n_capped_buckets (skew policy engagements),
  per-stage walls, cluster-size histogram head, dup rate.

Usage:
    PYTHONPATH=/root/repo python tools/validation_run.py [n_pages] [pages_parquet]

If ``pages_parquet`` is given it is read as the corpus (n_pages ignored);
otherwise a fresh fixture corpus of ``n_pages`` (default 600000) is
generated first (generation excluded from the timed window).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _tree_rss_bytes() -> int:
    """Resident-set bytes of this process and every live descendant."""
    children: dict[int, list[int]] = {}
    rss: dict[int, int] = {}
    page = os.sysconf("SC_PAGE_SIZE")
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                parts = f.read().rsplit(") ", 1)[-1].split()
            pid = int(d)
            children.setdefault(int(parts[1]), []).append(pid)
            rss[pid] = int(parts[21]) * page  # field 24 (0-idx 21 post-comm)
        except (OSError, IndexError, ValueError):
            continue
    total, stack = 0, [os.getpid()]
    while stack:
        pid = stack.pop()
        total += rss.get(pid, 0)
        stack.extend(children.get(pid, []))
    return total


class PeakSampler:
    def __init__(self, interval: float = 0.5):
        self.peak = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, args=(interval,), daemon=True)

    def _run(self, interval: float) -> None:
        while not self._stop.is_set():
            self.peak = max(self.peak, _tree_rss_bytes())
            self._stop.wait(interval)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join()


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    pages_path = sys.argv[2] if len(sys.argv) > 2 else None

    from gencore_spark import dedup_pages
    from gencore_spark.session import get_spark

    spark = get_spark(app_name="validation-600k")
    tmp = tempfile.mkdtemp(prefix="gencore_validate_")
    try:
        if pages_path is None:
            from gencore_spark.fixtures import pages_df

            pages_path = os.path.join(tmp, "pages")
            pages_df(spark, n_pages).write.mode("overwrite").parquet(pages_path)
        pages = spark.read.parquet(pages_path)
        n = pages.count()

        workdir = os.path.join(tmp, "work")
        with PeakSampler() as mem:
            t0 = time.time()
            out = dedup_pages(spark, pages, workdir)  # stages (snapshot) mode
            n_out = out.count()
            wall = time.time() - t0

        with open(os.path.join(workdir, "REPORT.json")) as f:
            rep = json.load(f)
        stages = rep.get("stages", {})
        summary = {
            "n_pages": n,
            "n_canonical": n_out,
            "wall_sec": round(wall, 1),
            "docs_per_sec": round(n / wall, 1),
            "peak_tree_rss_gb": round(mem.peak / 2**30, 2),
            "checkpoint": "stages (snapshot writes + read-backs in the timed window)",
            "n_capped_buckets": stages.get("s3_buckets", {}).get("n_capped_buckets"),
            "max_bucket_size": stages.get("s3_buckets", {}).get("max_bucket_size"),
            "dup_rate": stages.get("summary", {}).get("dup_rate"),
            "stage_wall_sec": {
                k: v.get("t_elapsed_sec") for k, v in stages.items()
                if isinstance(v, dict) and "t_elapsed_sec" in v
            },
            "cluster_size_histogram_head": stages.get("lineage", {}).get(
                "cluster_size_histogram", []
            )[:8],
        }
        print(json.dumps(summary))
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
