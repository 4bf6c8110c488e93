"""Deterministic synthetic web-page corpus with planted duplicate structure.

The contract input per BASELINE.json ``input_hint``:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Planted structure (FIXTURES.md §1, mirroring the reference's test material):

* **exact duplicates** — groups of 2-8 rows, identical text, distinct
  url/warc_ts (gencore: PCR duplicates sharing coordinates+UMI).
* **near duplicates** — groups of 2-6 rows differing by seeded token
  substitutions (~1-5%), boilerplate prefix swaps, suffix truncation —
  char-shingle Jaccard concentrated in [0.7, 1.0)
  (gencore: UMI hamming<=d grouping ``cluster.cpp:55-100`` + cigar-prefix
  truncation ``bamutil.cpp:204-255``).
* **mirror variants** — same text under http/https × www/non-www url forms
  (gencore: duplex strand pairing ``cluster.cpp:119-168,246-258``).
* **skew block** — one boilerplate template repeated with a single token edit
  across a large index range → one pathological LSH bucket
  (gencore: low-complexity cluster ``group.cpp:142-175``).
* **uniques** — the majority; must pass through byte-unchanged
  (gencore singleton fast-path ``group.cpp:73-77``).

Everything is a pure function of ``(seed, n_docs, doc index)`` — generation
is embarrassingly parallel (each Spark partition generates its index slice
independently via ``mapInPandas``), which is the only design that scales the
generator itself to 10^12 rows.  Ground truth is closed-form from the index.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

_EPOCH = np.datetime64("2024-01-01T00:00:00")
_LANGS = np.array(["en", "de", "fr", "es", "zh"])
_BOILERPLATE = [
    "cookie notice please accept our terms of service before continuing . ",
    "subscribe to our newsletter for weekly updates delivered to you . ",
    "copyright all rights reserved reproduction prohibited without consent . ",
    "navigation home about products contact privacy imprint sitemap . ",
]


def _vocab(seed: int, size: int = 4096) -> np.ndarray:
    rng = np.random.default_rng(seed ^ 0x5EED)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    lens = rng.integers(3, 10, size=size)
    return np.array(
        ["".join(letters[rng.integers(0, 26, size=n)]) for n in lens]
    )


@dataclass(frozen=True)
class CorpusSpec:
    """Closed-form index layout: [skew | exact | near | mirror | unique]."""

    n_docs: int
    seed: int = 42
    skew_n: int = 0          # filled by corpus_spec
    exact_n: int = 0
    near_n: int = 0
    mirror_n: int = 0

    @property
    def unique_start(self) -> int:
        return self.skew_n + self.exact_n + self.near_n + self.mirror_n


def corpus_spec(n_docs: int, seed: int = 42) -> CorpusSpec:
    """Deterministic layout: ~15% skew, 10% exact, 15% near, 6% mirror."""
    skew = max(min(int(n_docs * 0.15), n_docs // 2), 0)
    if n_docs >= 8000:
        skew = max(skew, 1200)  # guarantee a >1000-row pathological bucket
    exact = int(n_docs * 0.10)
    near = int(n_docs * 0.15)
    mirror = (int(n_docs * 0.06) // 2) * 2  # pairs
    total = skew + exact + near + mirror
    if total > n_docs:
        skew = exact = near = mirror = 0
    return CorpusSpec(
        n_docs=n_docs, seed=seed, skew_n=skew, exact_n=exact,
        near_n=near, mirror_n=mirror,
    )


_EXACT_SIZES = np.array([2, 3, 2, 4, 2, 8, 3, 2, 5, 2])   # cycle, mean 3.3
_NEAR_SIZES = np.array([2, 3, 2, 4, 2, 6, 3, 2])          # cycle, mean 3.0


def _run_of(offset: int, sizes: np.ndarray) -> tuple[int, int]:
    """(group index, rank within group) for position ``offset`` in a layout
    of consecutive runs whose sizes cycle through ``sizes``."""
    cycle = int(sizes.sum())
    ncyc, rem = divmod(offset, cycle)
    bounds = np.cumsum(sizes)
    g = int(np.searchsorted(bounds, rem, side="right"))
    prev = int(bounds[g - 1]) if g > 0 else 0
    return ncyc * len(sizes) + g, rem - prev


def classify(idx: int, spec: CorpusSpec) -> tuple[str, int, int]:
    """Closed-form ground truth: (dup_kind, true_cluster_id, member_rank).

    ``true_cluster_id`` is globally unique across kinds and equals the index
    of the group's first member — which is also the min doc index in the
    group (handy: our CC emits min-id representatives).
    """
    if idx < spec.skew_n:
        return "skew", 0, idx
    off = idx - spec.skew_n
    if off < spec.exact_n:
        g, r = _run_of(off, _EXACT_SIZES)
        return "exact", spec.skew_n + off - r, r
    off -= spec.exact_n
    if off < spec.near_n:
        g, r = _run_of(off, _NEAR_SIZES)
        return "near", spec.skew_n + spec.exact_n + off - r, r
    off -= spec.near_n
    if off < spec.mirror_n:
        return "mirror", spec.skew_n + spec.exact_n + spec.near_n + (off // 2) * 2, off % 2
    return "unique", idx, 0


def _base_words(rng: np.random.Generator, vocab: np.ndarray) -> np.ndarray:
    n_words = int(rng.integers(40, 500))
    return vocab[rng.integers(0, len(vocab), size=n_words)]


def _doc_text(idx: int, spec: CorpusSpec, vocab: np.ndarray) -> str:
    """Text for doc ``idx`` — pure function of (seed, layout, idx)."""
    kind, gid, rank = classify(idx, spec)
    grng = np.random.default_rng((spec.seed << 20) ^ gid)  # group-shared
    words = _base_words(grng, vocab)
    if kind in ("exact", "mirror", "unique"):
        return " ".join(words)
    if kind == "skew":
        # one template, each member substitutes exactly one token
        srng = np.random.default_rng((spec.seed << 21) ^ 0xB10C ^ rank)
        w = words.copy()
        w[int(srng.integers(0, len(w)))] = vocab[int(srng.integers(0, len(vocab)))]
        return " ".join(w)
    # near: member-specific edits, rank 0 is the untouched base
    if rank == 0:
        return " ".join(words)
    mrng = np.random.default_rng((spec.seed << 22) ^ (gid * 131 + rank))
    w = words.copy()
    sub_p = float(mrng.uniform(0.01, 0.05))
    mask = mrng.random(len(w)) < sub_p
    if not mask.any():
        mask[int(mrng.integers(0, len(w)))] = True  # near-dups never identical
    w[mask] = vocab[mrng.integers(0, len(vocab), size=int(mask.sum()))]
    style = int(mrng.integers(0, 3))
    if style == 1:  # suffix truncation <= 15%
        keep = max(8, int(len(w) * float(mrng.uniform(0.85, 0.98))))
        w = w[:keep]
    text = " ".join(w)
    if style == 2:  # boilerplate prefix swap
        text = _BOILERPLATE[int(mrng.integers(0, len(_BOILERPLATE)))] + text
    return text


def _url(idx: int, kind: str, rank: int, rng: np.random.Generator,
         gid: int | None = None) -> str:
    if kind == "near" and gid is not None and gid % 3 == 0:
        # refetch group: ONE url re-crawled at different warc_ts with
        # slightly drifted content — the case that forces doc_id to key on
        # (url, warc_ts); a url-only id would merge distinct texts.
        hrng = np.random.default_rng(0x9EF ^ gid)
        host = f"site{int(hrng.zipf(1.3)) % 997:03d}.example.org"
        return f"https://{host}/d{gid:010d}"
    if kind == "mirror":
        # same page under scheme/www variants (the duplex analog);
        # host derives from the group so both forms share it
        hrng = np.random.default_rng(0x41B ^ (idx - rank))
        host = f"site{int(hrng.zipf(1.3)) % 997:03d}.example.org"
        scheme = "https" if rank == 0 else "http"
        www = "" if rank == 0 else "www."
        return f"{scheme}://{www}{host}/page{idx - rank:010d}"
    host = f"site{int(rng.zipf(1.3)) % 997:03d}.example.org"
    return f"https://{host}/d{idx:010d}"


def generate_rows(indices: np.ndarray, spec: CorpusSpec) -> pd.DataFrame:
    """Generate full rows (pages columns + ground-truth sidecar columns) for
    an arbitrary slice of doc indices.  Partition-order independent."""
    vocab = _vocab(spec.seed)
    urls, texts, kinds, gids, ranks = [], [], [], [], []
    ts = np.empty(len(indices), dtype="datetime64[s]")
    langs = []
    for j, idx in enumerate(indices):
        idx = int(idx)
        kind, gid, rank = classify(idx, spec)
        rng = np.random.default_rng((spec.seed << 24) ^ (idx * 2654435761 % (1 << 31)))
        urls.append(_url(idx, kind, rank, rng, gid))
        texts.append(_doc_text(idx, spec, vocab))
        ts[j] = _EPOCH + np.timedelta64(int(rng.integers(0, 365 * 24 * 3600)), "s")
        grng = np.random.default_rng((spec.seed << 23) ^ gid)
        langs.append("en" if grng.random() < 0.9 else str(_LANGS[int(grng.integers(1, len(_LANGS)))]))
        kinds.append(kind)
        gids.append(gid)
        ranks.append(rank)
    html = [f"<html><body>{t}</body></html>".encode() for t in texts]
    return pd.DataFrame(
        {
            "doc_index": indices.astype(np.int64),
            "url": urls,
            "warc_ts": ts,
            "html": html,
            "text": texts,
            "lang": langs,
            "dup_kind": kinds,
            "true_cluster_id": np.array(gids, dtype=np.int64),
            "member_rank": np.array(ranks, dtype=np.int64),
        }
    )


# ---------------------------------------------------------------- Spark side

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]
TRUTH_COLUMNS = ["doc_index", "url", "dup_kind", "true_cluster_id", "member_rank"]

_FULL_SCHEMA = (
    "doc_index long, url string, warc_ts timestamp, html binary, "
    "text string, lang string, dup_kind string, true_cluster_id long, "
    "member_rank long"
)


def pages_with_truth(spark, n_docs: int, seed: int = 42, partitions: int | None = None):
    """Distributed generation: ``spark.range`` → ``mapInPandas`` slice
    generators.  Scales linearly with executors — no driver-side corpus."""
    spec = corpus_spec(n_docs, seed)
    parts = partitions or max(8, min(256, n_docs // 4000 or 8))

    def gen(batches):
        for pdf in batches:
            yield generate_rows(pdf["id"].to_numpy(), spec)

    return (
        spark.range(0, n_docs, numPartitions=parts)
        .mapInPandas(gen, schema=_FULL_SCHEMA)
    ), spec


def pages_df(spark, n_docs: int, seed: int = 42, partitions: int | None = None):
    df, _ = pages_with_truth(spark, n_docs, seed, partitions)
    return df.select(*PAGES_COLUMNS)
