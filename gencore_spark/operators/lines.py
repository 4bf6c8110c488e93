"""Cross-document line deduplication (CCNet-style boilerplate removal).

Web pages share lines — cookie banners, nav menus, copyright footers —
that survive whole-document dedup because every *document* is unique even
when half its *lines* are corpus-wide boilerplate.  CCNet (Wenzek et al.
2020) removes lines that occur in multiple documents; Dolma and RefinedWeb
ship the same operator.  This is the line-granularity sibling of the
engine's document-level exact dedup (``operators/exact.py``) — the
reference's analog is its per-position (not per-read) consensus model
(``group.cpp:142-175`` votes per base; here we "vote" per line across the
corpus and evict lines the corpus has already seen elsewhere).

Scale shape (the part that must survive 100 TB):

* lines are keyed by ``xxhash64(trim(line))`` so the global occurrence
  count shuffles 8-byte keys, never line text (same 64-bit adjudication as
  ``exact.with_doc_ids``: a collision erroneously evicts a unique line at
  ~1e-7 relative rate at 10^12 distinct lines — acceptable for a cleaning
  filter; the 128-bit swap is mechanical where it is not);
* the count aggregates DISTINCT (doc, line) pairs — a doc repeating its own
  line does not make the line "corpus-duplicated" (CCNet semantics);
* line text moves at most twice: once into the count join (shuffled on the
  hash), once into the per-doc reassembly (shuffled on doc_id) — the same
  ≤2× payload discipline as ``verify.attach_pair_payload``;
* everything is JVM-side builtins (posexplode / groupBy / collect_list of
  (pos, line) structs re-sorted per doc) — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_dup_docs: int = 2,
) -> DataFrame:
    """Remove lines that occur in ``>= min_dup_docs`` distinct documents.

    Returns one row per input document:

    * ``text_dedup`` — the surviving lines re-joined with ``\\n`` in their
      original order ('' when nothing survives);
    * ``n_lines``    — the doc's non-empty line count before dedup;
    * ``n_removed``  — how many of those were evicted as corpus-duplicated.

    Lines empty after ``trim`` are dropped unconditionally (they are
    whitespace, not content, and would otherwise all count as mutual
    duplicates).  The dup key is the *trimmed* line; more aggressive
    normalization (casefold, digit-strip à la CCNet) plugs in by replacing
    the key expression — kept minimal here so the operator is exactly
    SQL-oracle-expressible.
    """
    line = F.col("line")
    lines = (
        df.select(
            id_col,
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
        )
        .where(F.length(F.trim(line)) > 0)
        .select(
            id_col, "pos", "line", F.xxhash64(F.trim(line)).alias("line_key")
        )
    )
    # distinct docs per line: collapse (key, doc) BEFORE counting so a doc
    # repeating its own boilerplate doesn't inflate the corpus count
    docs_per_line = (
        lines.select("line_key", id_col)
        .distinct()
        .groupBy("line_key")
        .agg(F.count(F.lit(1)).alias("n_docs_with_line"))
    )
    flagged = lines.join(docs_per_line, "line_key").withColumn(
        "evict", F.col("n_docs_with_line") >= min_dup_docs
    )
    # collect_list skips NULLs, so the eviction filter rides inside the agg
    # and totals come from the same single pass
    kept_struct = F.when(~F.col("evict"), F.struct("pos", "line"))
    per_doc = flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["line"]
            ),
            "\n",
        ).alias("text_dedup"),
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("evict").cast("int")).alias("n_removed"),
    )
    # docs whose every line was empty/evicted still appear in the output
    return (
        df.select(id_col)
        .distinct()
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
        )
    )


def intradoc_line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove repeated lines WITHIN each document, keeping the first
    occurrence in document order.

    The within-document sibling of :func:`line_dedup`: scraped pages
    repeat their own promo banners / nav blocks several times per page,
    and a template page can be the only holder of its banner corpus-wide
    — so cross-document dedup never fires on it.  Dolma ships this as
    within-document paragraph dedup; the reference's analog is collapsing
    repeated evidence for the same position before voting — the per-base
    consensus tally in ``makeConsensus``
    (``/root/reference/src/group.cpp:320-579``), which folds every read's
    vote for a locus into one counted entry.

    Output mirrors :func:`line_dedup`: (id, ``text_dedup``, ``n_lines``,
    ``n_removed``), with empty-after-trim lines dropped unconditionally
    and the dup key being the trimmed line.

    Scale shape: the entire operator is ONE aggregation keyed on
    (doc_id, line_key) — earliest occurrence via ``min(struct(pos,
    line))``, no window, no self-join — followed by the per-doc
    reassembly groupBy.  Both shuffles are keyed on the doc (or doc +
    8-byte line hash), so a document's lines never fan out across the
    corpus the way :func:`line_dedup`'s corpus-wide counts must; this
    variant is embarrassingly parallel per document.
    """
    line = F.col("line")
    lines = (
        df.select(
            id_col,
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
        )
        .where(F.length(F.trim(line)) > 0)
        .select(
            id_col, "pos", "line", F.xxhash64(F.trim(line)).alias("line_key")
        )
    )
    # one pass: per (doc, key) keep the earliest (pos, line) and count the
    # evicted repeats; min over structs orders by pos first (pos is unique
    # within a doc, so the line payload never decides the min)
    firsts = lines.groupBy(id_col, "line_key").agg(
        F.min(F.struct("pos", "line")).alias("first"),
        (F.count(F.lit(1)) - 1).alias("n_repeats"),
    )
    per_doc = firsts.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("first")), lambda s: s["line"]
            ),
            "\n",
        ).alias("text_dedup"),
        (F.count(F.lit(1)) + F.sum("n_repeats")).alias("n_lines"),
        F.sum("n_repeats").alias("n_removed"),
    )
    return (
        df.select(id_col)
        .distinct()
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
        )
    )
