"""URL canonicalization — pure JVM column expressions.

A crawl refetches the same resource under many spellings: mixed-case
scheme/host, explicit default ports, fragments, and tracking query
parameters.  Canonicalizing before URL-keyed operations (refetch collapse,
per-site stats, the mirror-key fold in ``operators/consensus.py``) is the
webtext analog of the reference's coordinate normalization before duplex
matching (``pair.cpp:307-326`` folds read orientations to one key the way
this folds url spellings to one key).

Rules — deliberately minimal, order-preserving, and expressible in both
Spark and ANSI-ish SQL so the operator is oracle-checkable:

1. drop the ``#fragment``;
2. lowercase the scheme and authority (never the path/query);
3. strip explicit default ports (``http://h:80`` → ``http://h``,
   ``https://h:443`` → ``https://h``);
4. drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``) and empty params, preserving the order of the rest;
5. drop the ``?`` when no params survive.

No IDN/percent-encoding normalization: those need codec tables, belong in
an ingest library, and are NOT order/byte-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# scheme://authority — everything before the first '/' or '?' after '://'
_HEAD_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?]*)"

_TRACKING_PREFIXES = ("utm_",)
_TRACKING_PARAMS = ("fbclid", "gclid", "msclkid")


def _is_tracking(param: Column) -> Column:
    cond = F.lit(False)
    for p in _TRACKING_PREFIXES:
        cond = cond | param.startswith(p)
    for p in _TRACKING_PARAMS:
        cond = cond | param.startswith(p + "=") | (param == p)
    return cond | (param == "")


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module rules (JVM-side only)."""
    u = F.regexp_replace(url, "#.*", "")  # 1. fragment
    head = F.lower(F.regexp_extract(u, _HEAD_RE, 1))  # 2. lowercase head
    rest = F.substring(u, F.length(head) + 1, F.lit(1 << 30))
    # 3. default ports
    head = (
        F.when(
            head.startswith("http://") & head.endswith(":80"),
            F.substring(head, 1, F.length(head) - 3),
        )
        .when(
            head.startswith("https://") & head.endswith(":443"),
            F.substring(head, 1, F.length(head) - 4),
        )
        .otherwise(head)
    )
    # 4./5. query params: split path at the first '?'
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.when(
        F.length(rest) > F.length(path),
        F.substring(rest, F.length(path) + 2, F.lit(1 << 30)),
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"), lambda p: ~_is_tracking(p)
    )
    q2 = F.array_join(params, "&")
    return F.concat(
        head, path, F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2))
    )


def with_canonical_url(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """Staged-projection twin of :func:`canonical_url` — same rules, same
    bytes out, but each intermediate (de-fragmented url, head, rest, path,
    query, surviving params) is bound to an attribute before reuse.

    Why a second entry point: ``F.filter`` makes the whole expression tree
    CodegenFallback (interpreted), and interpreted eval re-computes every
    NAMED-BUT-INLINED subexpression at each reference — ``head`` alone is
    referenced ~8 times, each re-running two regexes.  Binding the stages
    to columns makes every regex run exactly once per row (CollapseProject
    keeps projections apart when an alias is multiply-referenced and
    non-cheap).  Use this form on the hot path (url-keyed dedup over every
    crawl record); the Column form stays for one-off expressions and as
    the oracle-parity reference.
    """
    u, head0, head, rest, path, query, q2 = (
        f"__cu_{n}" for n in ("u", "head0", "head", "rest", "path", "query", "q2")
    )
    s = df.withColumn(u, F.regexp_replace(F.col(url_col), "#.*", ""))
    s = s.withColumn(head0, F.lower(F.regexp_extract(u, _HEAD_RE, 1)))
    s = s.withColumns(
        {
            head: F.when(
                F.col(head0).startswith("http://") & F.col(head0).endswith(":80"),
                F.substring(head0, 1, F.length(head0) - 3),
            )
            .when(
                F.col(head0).startswith("https://") & F.col(head0).endswith(":443"),
                F.substring(head0, 1, F.length(head0) - 4),
            )
            .otherwise(F.col(head0)),
            rest: F.substring(u, F.length(head0) + 1, F.lit(1 << 30)),
        }
    )
    s = s.withColumn(path, F.regexp_extract(rest, r"^([^?]*)", 1))
    s = s.withColumn(
        query,
        F.when(
            F.length(rest) > F.length(path),
            F.substring(rest, F.length(path) + 2, F.lit(1 << 30)),
        ).otherwise(F.lit("")),
    )
    s = s.withColumn(
        q2,
        F.array_join(F.filter(F.split(query, "&"), lambda p: ~_is_tracking(p)), "&"),
    )
    s = s.withColumn(
        out_col,
        F.concat(
            head,
            path,
            F.when(F.col(q2) == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2)),
        ),
    )
    return s.drop(u, head0, head, rest, path, query, q2)
