"""First-principles pin of the fixture-e2e oracle constants.

``__spark_entry__._FIXTURE_E2E_EXPECTED`` is the literal-VALUES oracle the
driver diffs the full pipeline against on the n=1000 seeded fixture corpus.
This module recomputes that summary WITHOUT the engine — exact all-pairs
char-5-shingle Jaccard (DuckDB inverted-index join) + the LCS gate + plain
union-find + direct vote/mirror accounting over the generator's rows — and
asserts it equals the constants, so the oracle can never drift into
pinning the engine against itself.

It also pins the margin facts that make the probabilistic engine's
agreement with the exact recomputation deterministic:

* no distinct-text pair has Jaccard inside [0.65, 0.72) except pairs the
  criterion decides the same way on both sides of 0.7 — concretely, the
  corpus has a clean gap: max sub-threshold pair ~0.681, min
  supra-threshold pair ~0.712 (LSH recall at 0.712 is 0.99993 per band
  math and the seeded MinHash is deterministic);
* the first-principles clustering equals the PLANTED truth exactly (no
  split or cross-kind merge), so a third independent derivation agrees.
"""

import re
import sys
from collections import Counter

import duckdb
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

N = 1000


@pytest.fixture(scope="module")
def corpus():
    from gencore_spark.fixtures import corpus_spec, generate_rows
    from gencore_spark.functions.textnorm import normalize_for_shingling

    spec = corpus_spec(N)
    rows = generate_rows(np.arange(N), spec)
    rows["nt"] = [normalize_for_shingling(t) for t in rows["text"]]
    return rows


@pytest.fixture(scope="module")
def exact_pairs(corpus):
    """All pairs with exact char-5-shingle Jaccard >= 0.45 (wide enough to
    observe the threshold margin), via a DuckDB inverted-index join."""
    con = duckdb.connect()
    con.register("docs", corpus[["doc_index", "nt"]])
    return con.execute(r"""
        WITH sh AS (
          SELECT DISTINCT doc_index AS id, substring(nt, CAST(i AS INT), 5) AS g
          FROM docs, LATERAL unnest(range(1, greatest(length(nt) - 3, 2))) t(i)
        ),
        sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
        inter AS (SELECT a.id AS ia, b.id AS ib, count(*) AS m
                  FROM sh a JOIN sh b ON a.g = b.g AND a.id < b.id
                  GROUP BY 1, 2)
        SELECT ia, ib, m * 1.0 / (sa.n + sb.n - m) AS j
        FROM inter JOIN sizes sa ON sa.id = ia JOIN sizes sb ON sb.id = ib
        WHERE m * 1.0 / (sa.n + sb.n - m) >= 0.45
    """).df()


def test_threshold_margin_is_clean(exact_pairs):
    js = exact_pairs["j"].to_numpy()
    below = js[js < 0.7]
    above = js[js >= 0.7]
    assert above.size, "corpus lost its planted near-dup pairs"
    # the decision gap around the 0.7 gate: nothing within ~0.02 on either
    # side, so no probabilistic-gate randomness can flip a pair's decision
    assert (not below.size) or below.max() < 0.69, below.max()
    assert above.min() > 0.71, above.min()


def test_fixture_oracle_constants_from_first_principles(corpus, exact_pairs):
    from __spark_entry__ import _FIXTURE_E2E_EXPECTED
    from gencore_spark.config import DEFAULT_CONFIG as cfg
    from gencore_spark.functions.similarity import has_common_substring
    from gencore_spark.functions.textnorm import normalize_for_shingling

    rows = corpus
    texts = rows["text"].tolist()

    # engine pair criterion, recomputed exactly: J >= 0.7 AND
    # (J >= 0.85 or LCS >= lcs_min_ratio * min(len))
    keep = []
    for ia, ib, j in exact_pairs[exact_pairs["j"] >= cfg.jaccard_threshold
                                 ].itertuples(index=False):
        ia, ib = int(ia), int(ib)
        if j < 0.85:
            a = normalize_for_shingling(texts[ia])
            b = normalize_for_shingling(texts[ib])
            if not has_common_substring(
                a, b, int(cfg.lcs_min_ratio * min(len(a), len(b)))
            ):
                continue
        keep.append((ia, ib))

    parent = list(range(N))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in keep:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    rows = rows.assign(comp=[find(i) for i in range(N)])
    rows["mk"] = [
        re.sub(r"/$", "", re.sub(r"^https?://(www\.)?", "", u))
        for u in rows["url"]
    ]

    summary: dict[str, list[int]] = {}
    for _, grp in rows.groupby("comp"):
        kinds = set(grp["dup_kind"])
        assert len(kinds) == 1, f"cross-kind merge: {kinds}"
        # first-principles clustering must equal the PLANTED grouping too
        assert grp["true_cluster_id"].nunique() == 1
        size = len(grp)
        ratio = Counter(grp["text"]).most_common(1)[0][1] / size
        # rr must be winner-independent: every member's mirror-key group
        # has the same size (all-distinct or all-shared in this corpus)
        mc = Counter(grp["mk"])
        rr_candidates = {mc[k] - 1 for k in grp["mk"]}
        assert len(rr_candidates) == 1, f"winner-dependent rr: {dict(mc)}"
        s = summary.setdefault(grp["dup_kind"].iloc[0], [0, 0, 0, 0])
        s[0] += 1
        s[1] += size
        s[2] += rr_candidates.pop()
        s[3] += 1 if ratio < cfg.vote_ratio_threshold else 0

    got = sorted((k, *v) for k, v in summary.items())
    assert got == sorted(_FIXTURE_E2E_EXPECTED), got

    # planted truth is covered with no splits either (third derivation)
    splits = rows.groupby("true_cluster_id")["comp"].nunique()
    assert int((splits > 1).sum()) == 0
