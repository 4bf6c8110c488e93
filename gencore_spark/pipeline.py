"""End-to-end near-dup dedup + consensus pipeline with checkpoint/resume.

Stage DAG (each stage materializes one snapshot via
:class:`~gencore_spark.sources.TableIO`; a re-run skips every stage whose
snapshot exists — the resumability the reference gets from its coordinate
watermark, ``gencore.cpp:318-390``, re-expressed as table snapshots):

    pages ──► s1_docs      ids, routing, exact text_hash        (exact.py)
          ──► s2_reps      distinct texts + MinHash/SimHash     (exact.py)
          ──► s3_edges     LSH buckets → candidates → verified  (lsh/verify)
          ──► s4_cc        connected components                 (components)
          ──► s5_canonical consensus vote + bypass re-union     (consensus)

Scale notes (the design is for 10^3 executors / 10^14 bytes):

* html:binary is projected OUT at s1 — no later stage ever reads it
  (column pruning is the single biggest I/O saver; SURVEY.md §4);
* every expensive stage runs on |distinct texts|, not |docs|;
* shuffles: s1 none (narrow), s2 one (groupBy text_hash), s3 two
  (bucket groupBy + pair join) + two hash joins (verify text fetch),
  s4 O(log n) CC rounds, s5 two aggs + one window — all keyed on ids or
  hashes, AQE handles skew inside the cap, the mega-bucket cap handles the
  rest;
* ``localCheckpoint`` truncates CC lineage; stage snapshots truncate
  everything else.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .config import DEFAULT_CONFIG, DedupConfig
from .operators.components import connected_components
from .operators.consensus import consensus_vote
from .operators.exact import (
    distinct_text_reps,
    route,
    with_doc_ids,
    with_signatures,
    with_text_hash,
)
from .operators.lsh import candidate_pairs
from .operators.metrics import RunReport, cluster_size_histogram, partition_lineage
from .operators.verify import verify_pairs
from .sources import TableIO

DOC_COLUMNS = ["doc_id", "url", "warc_ts", "text", "lang", "text_hash", "bypass"]


class DedupPipeline:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        cfg: DedupConfig = DEFAULT_CONFIG,
    ):
        self.spark = spark
        self.cfg = cfg
        self.io = TableIO(spark, workdir)
        self.workdir = workdir
        self.report = RunReport()

    # -- stages ------------------------------------------------------------

    def _stage(self, name: str, build, force: bool) -> DataFrame:
        if not force and self.io.exists(name):
            self.report.stage(name, resumed=True)
            return self.io.read(name)
        df = build()
        self.io.write(df, name)
        out = self.io.read(name)
        self.report.stage(name, rows=out.count(), resumed=False)
        return out

    def run(self, pages: DataFrame, force: bool = False) -> DataFrame:
        cfg = self.cfg

        def build_docs() -> DataFrame:
            main, bypass = route(with_doc_ids(pages), cfg)
            main = with_text_hash(main).withColumn("bypass", F.lit(False))
            bypass = with_text_hash(bypass).withColumn("bypass", F.lit(True))
            # html is dropped HERE and never read again
            return main.unionByName(bypass).select(*DOC_COLUMNS)

        docs = self._stage("s1_docs", build_docs, force)

        def build_reps() -> DataFrame:
            main = docs.filter(~F.col("bypass")).select("doc_id", "text", "text_hash")
            return with_signatures(distinct_text_reps(main, cfg), cfg).select(
                "text_hash", "rep_id", "n_members", "norm_text", "minhash", "simhash"
            )

        reps = self._stage("s2_reps", build_reps, force)

        def build_edges() -> DataFrame:
            signed = reps.select("rep_id", "norm_text", "simhash", "minhash")
            edges, bucket_stats = candidate_pairs(signed, cfg)
            row = bucket_stats.agg(
                F.sum(F.col("capped").cast("int")).alias("capped"),
                F.max("bucket_size").alias("biggest"),
            ).collect()[0]
            self.report.stage(
                "s3_buckets",
                n_capped_buckets=int(row["capped"] or 0),
                max_bucket_size=row["biggest"],
            )
            return verify_pairs(edges, signed, cfg)

        verified = self._stage("s3_edges", build_edges, force)

        def build_cc() -> DataFrame:
            return connected_components(verified.select("id_a", "id_b"), cfg)

        cc = self._stage("s4_cc", build_cc, force)

        def build_canonical() -> DataFrame:
            # every distinct text gets a cluster: CC assignment or itself
            rep_clusters = reps.select("text_hash", "rep_id").join(
                cc, "rep_id", "left"
            ).select(
                "text_hash",
                F.coalesce("cluster_id", "rep_id").alias("cluster_id"),
            )
            main_members = (
                docs.filter(~F.col("bypass"))
                .join(rep_clusters, "text_hash")
                .select("doc_id", "url", "warc_ts", "text", "lang", "text_hash", "cluster_id")
            )
            bypass_members = (
                docs.filter(F.col("bypass"))
                .select(
                    "doc_id", "url", "warc_ts", "text", "lang", "text_hash",
                    F.col("doc_id").alias("cluster_id"),
                )
            )
            members = main_members.unionByName(bypass_members)
            return consensus_vote(members, cfg)

        canonical = self._stage("s5_canonical", build_canonical, force)
        self._finalize(docs, reps, verified, canonical)
        return canonical

    # -- reporting ----------------------------------------------------------

    def _recorded_rows(self, name: str, df) -> int:
        """Row count from the stage record when available (saves a job —
        fixed per-run job latency is the scaling-efficiency tax)."""
        rows = self.report.stages.get(name, {}).get("rows")
        return rows if rows is not None else df.count()

    def _finalize(self, docs, reps, verified, canonical) -> None:
        n_docs = self._recorded_rows("s1_docs", docs)
        n_out = self._recorded_rows("s5_canonical", canonical)
        self.report.stage(
            "summary",
            docs_in=n_docs,
            distinct_texts=self._recorded_rows("s2_reps", reps),
            verified_edges=self._recorded_rows("s3_edges", verified),
            docs_out=n_out,
            dup_rate=round(1.0 - n_out / max(n_docs, 1), 6),
        )
        self.report.stage(
            "lineage",
            canonical_partitions=partition_lineage(canonical),
            cluster_size_histogram=cluster_size_histogram(canonical),
        )
        self.report.write(os.path.join(self.workdir, "REPORT.json"))


def dedup_pages(
    spark: SparkSession,
    pages: DataFrame,
    workdir: str,
    cfg: DedupConfig = DEFAULT_CONFIG,
    force: bool = False,
) -> DataFrame:
    """One-call entry: pages(url, warc_ts, html, text, lang) → canonical."""
    return DedupPipeline(spark, workdir, cfg).run(pages, force=force)
