"""URL-keyed refetch collapse: keep the latest fetch per canonical URL.

A crawl holds many fetches of the same resource (recrawls, tracking-param
spellings, fragment variants).  Before any text-level dedup it is standard
to collapse to one row per *canonical* URL, keeping the newest fetch — the
URL-keyed sibling of the pipeline's text-keyed exact prepass
(``operators/exact.py::distinct_text_reps``), and the webtext analog of the
reference collapsing read pairs that map to one coordinate key before
clustering (``pair.cpp:307-326``).

Scale shape: one aggregation keyed on the canonical URL with a
min(struct(...)) argmax — partial-aggregable (map-side combine), no window,
no skew cliff when one URL has millions of refetches (each partial keeps
exactly one candidate row).  The struct-typed buffer makes Spark pick
SortAggregate over HashAggregate (per-partition sort on the group key),
which trades a local sort for keeping the argmax a single shuffle; the
plan shape is pinned by ``tests/test_lines_url.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.urlnorm import with_canonical_url


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    keep: str = "latest",
) -> DataFrame:
    """One row per canonical URL: the ``keep="latest"`` (default) or
    ``keep="first"`` ``ts_col`` fetch, ties broken by ascending raw URL
    (deterministic across retries/partitionings).  "latest" is the
    freshness policy (recrawls supersede); "first" is the stability policy
    (a page edited to inject spam after first crawl never replaces the
    clean capture — the choice FineWeb-style pipelines debate).

    Output: ``canonical_url`` + every input column of the winning row.
    """
    if keep not in ("latest", "first"):
        raise ValueError(f"keep must be 'latest' or 'first', got {keep!r}")
    payload = [c for c in df.columns]
    # min(struct(±micros, url, payload)) == arg-extreme(ts, tie-min url):
    # a commutative aggregate, so Spark combines map-side — unlike a
    # row_number window, which must co-locate and sort every fetch of a
    # hot URL in one task
    micros = F.unix_micros(F.col(ts_col))
    key = F.struct(
        # unix_micros, not cast-to-numeric: timestamp→double casts are
        # ANSI-mode-fragile; micros keep full precision
        (-micros if keep == "latest" else micros).alias("ord_ts"),
        F.col(url_col).alias("tie_url"),
        F.struct(*payload).alias("row"),
    )
    # staged form: every crawl record passes through here, and the Column
    # form re-runs its regexes at each of ~8 interpreted references
    return (
        with_canonical_url(df, url_col)
        .groupBy("canonical_url")
        .agg(F.min(key).alias("w"))
        .select("canonical_url", *[F.col(f"w.row.{c}").alias(c) for c in payload])
    )
