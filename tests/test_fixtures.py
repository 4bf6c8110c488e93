"""Fixture-corpus invariants: closed-form layout, planted structure."""

import numpy as np

from gencore_spark.fixtures import classify, corpus_spec, generate_rows
from gencore_spark.functions import extract_text, jaccard_texts


def test_layout_partitions_cover_everything():
    spec = corpus_spec(10000)
    kinds = {"skew": 0, "exact": 0, "near": 0, "mirror": 0, "unique": 0}
    for i in range(spec.n_docs):
        kind, gid, rank = classify(i, spec)
        kinds[kind] += 1
        assert 0 <= gid <= i  # group id = first member's index
        if rank == 0 and kind != "skew":
            assert gid == i
    assert kinds["skew"] == spec.skew_n
    assert kinds["exact"] == spec.exact_n
    assert kinds["near"] == spec.near_n
    assert kinds["mirror"] == spec.mirror_n
    assert kinds["skew"] >= 1200  # pathological bucket guaranteed at 10k


def test_generation_is_slice_independent():
    spec = corpus_spec(5000)
    whole = generate_rows(np.arange(100, 140), spec)
    part = generate_rows(np.arange(120, 130), spec)
    a = whole[whole.doc_index.isin(range(120, 130))].reset_index(drop=True)
    b = part.reset_index(drop=True)
    assert a.url.tolist() == b.url.tolist()
    assert a.text.tolist() == b.text.tolist()
    assert a.warc_ts.tolist() == b.warc_ts.tolist()


def test_planted_structure():
    spec = corpus_spec(5000)
    pdf = generate_rows(np.arange(0, 3200), spec)
    # exact groups: identical text, distinct urls
    ex = pdf[pdf.dup_kind == "exact"]
    assert (ex.groupby("true_cluster_id").text.nunique() == 1).all()
    assert (ex.groupby("true_cluster_id").url.nunique() > 1).all()
    # mirror pairs: same text + host, different scheme/www form
    mi = pdf[pdf.dup_kind == "mirror"]
    assert (mi.groupby("true_cluster_id").text.nunique() == 1).all()
    pair = mi[mi.true_cluster_id == mi.true_cluster_id.iloc[0]].sort_values("member_rank")
    assert pair.url.iloc[0].startswith("https://site")
    assert pair.url.iloc[1].startswith("http://www.site")
    # html wraps text byte-identically (the extraction invariant source)
    sample = pdf.head(50)
    for h, t in zip(sample.html, sample.text):
        assert extract_text(h) == t


def test_refetch_groups_share_url_not_ts():
    """Near groups with gid % 3 == 0 are refetches: one url, many fetches.

    Guards the doc_id=(url, warc_ts) contract — a url-only id would merge
    these distinct-text rows."""
    spec = corpus_spec(5000)
    lo = spec.skew_n + spec.exact_n
    pdf = generate_rows(np.arange(lo, lo + 300), spec)
    nr = pdf[pdf.dup_kind == "near"]
    refetch = nr[nr.true_cluster_id % 3 == 0]
    assert len(refetch) > 0
    g = refetch.groupby("true_cluster_id")
    assert (g.url.nunique() == 1).all()          # one url per refetch group
    assert (g.warc_ts.nunique() == g.size()).all()  # every fetch distinct ts
    assert (g.text.nunique() > 1).any()          # content drifted
    other = nr[nr.true_cluster_id % 3 != 0]
    og = other.groupby("true_cluster_id").filter(lambda g: len(g) >= 2)
    assert (og.groupby("true_cluster_id").url.nunique() > 1).all()


def test_near_dup_jaccard_band():
    spec = corpus_spec(5000)
    lo = spec.skew_n + spec.exact_n
    pdf = generate_rows(np.arange(lo, lo + 300), spec)
    nr = pdf[pdf.dup_kind == "near"]
    js = []
    for _, g in nr.groupby("true_cluster_id"):
        ts = g.sort_values("member_rank").text.tolist()
        js += [jaccard_texts(ts[0], t, 5) for t in ts[1:]]
    js = np.array(js)
    assert js.min() > 0.5
    assert (js >= 0.7).mean() > 0.95
    assert js.max() < 1.0  # near-dups are never byte-identical
