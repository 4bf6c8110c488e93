"""BM25 lexical top-k retrieval over the corpus (similarity-search sibling
of ``operators/ann.py``: sparse lexical instead of dense embedding).

The training-data use case is contamination/forensics search: "which
corpus documents score highest against this eval question / this leaked
passage" — the lexical complement to embedding ANN, robust where
embeddings are unavailable or the match is verbatim-ish.

Scoring (Lucene-style BM25, natural log, +1 inside the log so idf > 0):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(q, d) = Σ_{t ∈ q∩d} idf(t) · tf / (tf + k1·(1 - b + b·dl/avgdl))

Query terms are DISTINCT (standard for short queries; query-side tf would
multiply the summand — a documented simplification that keeps the SQL
oracle exact).  Scores round to 6dp BEFORE ranking so JVM/libm last-ulp
``ln`` differences can never flip an ordering the DuckDB oracle sees.

Scale shape:

* postings build = one explode + two hash aggs (tf keyed on (doc, term),
  df keyed on term) — partial-aggregable, the same shape at any corpus;
* corpus scalars (N, avgdl) ride a 1-row broadcast crossJoin, not a
  driver collect;
* query terms broadcast (queries are human-scale; the corpus side never
  shuffles on the join);
* top-k per query is the TWO-PHASE top-N (cf. ``domains.domain_cap``):
  a common query term matches a huge fraction of the corpus, so a naive
  ``row_number() OVER (PARTITION BY query_id)`` would funnel every
  matching doc into one task per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .textstats import token_count


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "text",
    query_tf: bool = False,
) -> DataFrame:
    """(query_id, rank, doc_id, score): the ``k`` best-scoring docs per
    query, rank 1-based by (score desc, doc_id asc) — deterministic.

    ``query_tf=True`` weights each matched term's contribution by its
    frequency IN THE QUERY (the long-query/passage form — relevant for
    leaked-passage forensics where the probe repeats phrases); the default
    treats query terms as a set, the standard short-query form.

    Empty tokens never score: ``F.split`` of an empty/whitespace-only text
    yields ``['']``, which (unfiltered) would give every empty doc a ``''``
    term with tf=1, pollute the df statistics, and let a whitespace query
    term match every empty doc — both explodes filter ``term != ''`` so
    tf/df and dl/avgdl agree that an empty doc has no terms.

    idf is Lucene's ``ln(1 + (N - df + 0.5)/(df + 0.5))`` — strictly
    positive, no floor needed; a probe term absent from the corpus (df
    would be 0) simply matches no postings row and contributes nothing,
    so the df=0 branch is unreachable by construction.
    """
    terms = lambda t: F.split(F.lower(F.trim(t)), r"\s+")
    exploded = corpus.select(
        F.col(id_col), F.explode(terms(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    tf = exploded.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = corpus.select(
        F.col(id_col), token_count(F.col(text_col)).cast("double").alias("dl")
    )
    stats = corpus.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(token_count(F.col(text_col))).alias("avgdl"),
    )
    postings = (
        tf.join(dl, id_col)
        .join(df_t, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            "term",
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * F.col("tf")
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("comp"),
        )
    )
    if query_tf:
        qterms = (
            queries.select(
                F.col(qid_col), F.explode(terms(F.col(qtext_col))).alias("term")
            )
            .filter(F.col("term") != "")
            .groupBy(qid_col, "term")
            .agg(F.count(F.lit(1)).cast("double").alias("qtf"))
        )
    else:
        qterms = queries.select(
            F.col(qid_col),
            F.explode(F.array_distinct(terms(F.col(qtext_col)))).alias("term"),
        ).filter(F.col("term") != "").withColumn("qtf", F.lit(1.0))
    scores = (
        postings.join(F.broadcast(qterms), "term")
        .groupBy(qid_col, id_col)
        .agg(F.round(F.sum(F.col("comp") * F.col("qtf")), 6).alias("score"))
    )
    # two-phase top-k: local slice per (query, source partition), then a
    # window over <= k x P candidates per query
    d = scores.withColumn("__pid", F.spark_partition_id())
    local = d.groupBy(qid_col, "__pid").agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("score")).alias("__neg"),
                        F.col(id_col).alias("__id"),
                        F.col("score").alias("__score"),
                    )
                )
            ),
            1,
            k,
        ).alias("__top")
    )
    pruned = local.select(qid_col, F.explode("__top").alias("__s"))
    w = Window.partitionBy(qid_col).orderBy(
        F.col("__s.__neg").asc(), F.col("__s.__id").asc()
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            qid_col,
            F.col("rank").cast("long").alias("rank"),
            F.col("__s.__id").alias(id_col),
            F.col("__s.__score").alias("score"),
        )
    )
