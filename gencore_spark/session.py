"""SparkSession factory with the settings the pipeline assumes.

Local sandbox runs on ``local[N]``; on a real cluster the same builder is
used by ``spark-submit --py-files`` with master/memory supplied externally.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# The non-master settings the pipeline is benchmarked and verified under.
# ONE source of truth: get_spark applies these locally, and the
# spark-submit front door (tools/submit_job.py) applies any of them the
# operator did not explicitly override via --conf — a cluster run must not
# silently diverge from the verified configuration (zstd shuffle codec,
# UTC session tz, AQE skew handling, Arrow batching, broadcast threshold).
PIPELINE_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # zstd over default lz4: web text shuffles are the fat payload and
    # compress ~2x better under zstd, trading cheap CPU for the memory/
    # IO bandwidth that saturates first as cores scale (measured at
    # 300k pages: local[2] 637->506s, local[8] 201->157s, 2->8 scaling
    # efficiency 0.79->0.81)
    "spark.io.compression.codec": "zstd",
    # Throughput collector over default G1: this is a batch pipeline with
    # a high allocation rate (Arrow batches, zstd buffers, UnsafeRow text
    # copies) and no latency SLO — ParallelGC's stop-the-world compaction
    # is the right trade.  Interleaved A/B at 60k pages (3 reps each,
    # fresh JVM per rep, noisy host): best-of walls 84.0s vs 114.3s,
    # means 117.8s vs 130.9s.  Set on BOTH driver and executor so a real
    # cluster run matches the verified local-mode (driver==executor) JVM.
    "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
    "spark.executor.extraJavaOptions": "-XX:+UseParallelGC",
}


def get_spark(
    app_name: str = "gencore-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 2048,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cores}]"
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cores))
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in PIPELINE_CONFS.items():
        b = b.config(k, v)
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
