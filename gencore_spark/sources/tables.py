"""Table IO abstraction: Iceberg when available, parquet fallback.

Reference analog: the BAM open/loop/write plumbing (``gencore.cpp:162-205``,
``gencore.cpp:83-111``) — the one place that knows the storage format.

The production path (BASELINE.json ``north_star``) is Iceberg tables with
snapshot-per-stage checkpointing; the sandbox has no Iceberg runtime jar, so
``TableIO`` probes for the catalog and degrades to directory-of-parquet with
``_SUCCESS`` markers, preserving the same semantics the pipeline relies on:

* **atomic visibility** — a stage snapshot either exists completely (parquet:
  ``_SUCCESS`` present) or is ignored (partial writes are invisible);
* **idempotent overwrite** — re-running a stage replaces the snapshot.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.iceberg = self._probe_iceberg()

    def _probe_iceberg(self) -> bool:
        try:
            self.spark.conf.get("spark.sql.catalog.gencore")
            return True
        except Exception:
            return False

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        if self.iceberg:
            return self.spark.catalog.tableExists(f"gencore.{name}")
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))

    def write(self, df: DataFrame, name: str) -> None:
        if self.iceberg:
            df.writeTo(f"gencore.{name}").createOrReplace()
        else:
            df.write.mode("overwrite").parquet(self._path(name))

    def read(self, name: str) -> DataFrame:
        if self.iceberg:
            return self.spark.read.table(f"gencore.{name}")
        return self.spark.read.parquet(self._path(name))


def load_testdata(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated testdata table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
