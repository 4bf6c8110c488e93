"""Executor task-metric totals from the driver UI REST API.

Wall-clock on a shared host measures the co-tenant as much as the job
(BENCH/BASELINE.md documents 36–217s bimodality); the executor task
metrics Spark itself aggregates — CPU time actually consumed by task
code, run time, GC time — are robust to neighbors in a way wall time is
not, and they decompose a leg's cost into task-CPU vs GC vs idle.  This
reads them from the driver's REST API (``/api/v1/applications/<id>/
stages``), which requires ``spark.ui.enabled=true`` on the session
(``get_spark(extra={"spark.ui.enabled": "true"})`` — the default session
disables the UI).

Used by ``tools/scaling_bench.py`` / ``tools/standalone_scaling.py`` to
print per-leg task-metric columns next to the wall-based ones.
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import SparkSession


def driver_stage_metrics(spark: SparkSession) -> dict:
    """Sum executor task metrics over all COMPLETE stages of this app.

    Returns ``{}`` when the UI is disabled or unreachable (callers treat
    the columns as optional), else::

        {"task_cpu_sec": ..., "task_run_sec": ..., "jvm_gc_sec": ...,
         "n_stages": ...}

    ``task_run_sec`` is wall-clock summed over tasks (counts descheduled
    time); ``task_cpu_sec`` is CPU consumed by JVM task code ONLY — no GC,
    no shuffle/netty/compression threads, and NOT the Python workers of a
    pandas UDF stage (the JVM task thread waits on the Arrow socket there,
    so UDF stages show run ≫ cpu by design; the python workers' CPU is in
    the caller's process-tree cpu_sec).  For JVM-only stages,
    run − cpu − gc ≈ time tasks sat on a core slot without progressing —
    the co-tenant-contention signal.
    """
    sc = spark.sparkContext
    base = sc.uiWebUrl
    if not base:
        return {}
    url = f"{base}/api/v1/applications/{sc.applicationId}/stages?status=complete"
    try:
        with urllib.request.urlopen(url, timeout=10) as r:
            stages = json.load(r)
    except Exception:
        return {}
    out = {"task_cpu_sec": 0.0, "task_run_sec": 0.0, "jvm_gc_sec": 0.0}
    for s in stages:
        out["task_cpu_sec"] += s.get("executorCpuTime", 0) / 1e9  # ns
        out["task_run_sec"] += s.get("executorRunTime", 0) / 1e3  # ms
        out["jvm_gc_sec"] += s.get("jvmGcTime", 0) / 1e3  # ms
    return {k: round(v, 1) for k, v in out.items()} | {"n_stages": len(stages)}
