"""Domain-level curation: per-domain stats, blocklists, per-domain caps.

Every production webtext pipeline gates on the registrable domain before
any text-level work: blocklist joins (C4-style), per-domain document caps
(anti-spam — one link farm must not dominate a training mix), and
per-domain health stats for the crawl report.  The webtext analog of the
reference's per-chromosome accounting (``stats.cpp`` per-contig counters).

Scale shapes:

* ``domain_stats`` — one hash aggregation keyed on domain; distinct texts
  are counted over ``md5(text)`` digests (32-byte fixed movement instead
  of document bytes; md5 so the DuckDB oracle computes the identical
  digest — the same engine-parity adjudication as packing's Knuth hash).
* ``domain_blocklist_filter`` — broadcast LEFT ANTI join (blocklists are
  thousands of rows; the corpus side never shuffles).
* ``domain_cap`` — the textbook two-phase distributed top-N, NOT a naive
  ``row_number() OVER (PARTITION BY domain)``: the naive window lands a
  mega-domain's every row in ONE task (and a link farm IS the case this
  operator exists for).  Phase 1 groups by ``(domain, input partition)``
  — no hot key, a mega-domain spreads over its source partitions — and
  keeps each group's local top-``cap`` via sort+slice inside the
  aggregation buffer.  Phase 2 windows over at most ``cap × P`` rows per
  domain.  The result is identical (each partition's local top-cap is a
  superset of its contribution to the global top-cap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_DOMAIN_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/:?#]+)"


def domain_of(url: Column) -> Column:
    """Lower-cased authority host (no scheme, port, path, or query)."""
    return F.lower(F.regexp_extract(url, _DOMAIN_RE, 1))


def domain_stats(
    df: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Per-domain corpus health: doc count, distinct-text count, mean
    token count (6dp).  One partial-aggregable hash agg."""
    from .textstats import token_count

    return (
        df.select(
            domain_of(F.col(url_col)).alias("domain"),
            F.md5(F.col(text_col)).alias("__digest"),
            token_count(F.col(text_col)).alias("__tok"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("__digest").alias("n_distinct_texts"),
            F.round(F.avg("__tok"), 6).alias("avg_tokens"),
        )
    )


def domain_blocklist_filter(
    df: DataFrame, blocked: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop rows whose domain appears in ``blocked`` (one ``domain`` string
    column).  Broadcast anti-join: the corpus side never shuffles."""
    return (
        df.withColumn("__domain", domain_of(F.col(url_col)))
        .join(
            F.broadcast(
                blocked.select(F.col("domain").alias("__domain")).distinct()
            ),
            "__domain",
            "left_anti",
        )
        .drop("__domain")
    )


def domain_cap(
    df: DataFrame,
    cap: int,
    url_col: str = "url",
    order_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` rows per domain, the first ``cap`` in ascending
    ``order_col`` (pass e.g. a negated quality score to keep the best).

    ``order_col`` must be unique per row (doc_id is) — it is the total
    order that makes the two-phase reduction deterministic.  Output
    columns = input columns.
    """
    payload = list(df.columns)
    d = df.withColumn("__domain", domain_of(F.col(url_col))).withColumn(
        "__pid", F.spark_partition_id()
    )
    # phase 1: local top-cap per (domain, source partition) — sort+slice
    # inside the agg buffer; a group never exceeds one partition's rows
    local_top = d.groupBy("__domain", "__pid").agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(order_col).alias("__o"),
                        F.struct(*payload).alias("row"),
                    )
                )
            ),
            1,
            cap,
        ).alias("__top")
    )
    pruned = local_top.select("__domain", F.explode("__top").alias("__s"))
    # phase 2: global top-cap over <= cap x P candidates per domain
    w = Window.partitionBy("__domain").orderBy(F.col("__s.__o").asc())
    return (
        pruned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .select(*[F.col(f"__s.row.{c}").alias(c) for c in payload])
    )
