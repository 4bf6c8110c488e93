"""Property-based kernel tests (hypothesis) — the invariants SURVEY.md §5
calls for: estimator bounds, symmetry, idempotence, permutation invariance.
No Spark; bounded example counts keep these fast.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gencore_spark.functions import (
    hamming64,
    jaccard,
    jaccard_texts,
    lcs_length,
    minhash_signature,
    normalize_for_shingling,
    perm_params,
    shingle_hashes,
    simhash,
)

_A, _B = perm_params(128, 42)

texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    min_size=0,
    max_size=400,
)


@settings(max_examples=50, deadline=None)
@given(texts, texts)
def test_jaccard_symmetric_and_bounded(a, b):
    sa, sb = shingle_hashes(a, 5), shingle_hashes(b, 5)
    j1, j2 = jaccard(sa, sb), jaccard(sb, sa)
    assert j1 == j2
    assert 0.0 <= j1 <= 1.0
    assert jaccard(sa, sa) == 1.0


@settings(max_examples=30, deadline=None)
@given(texts)
def test_minhash_identical_docs_estimate_one(t):
    s = shingle_hashes(t, 5)
    sig = minhash_signature(s, _A, _B)
    assert np.array_equal(sig, minhash_signature(s, _A, _B))  # deterministic


@settings(max_examples=30, deadline=None)
@given(texts, texts)
def test_minhash_estimate_tracks_jaccard(a, b):
    sa, sb = shingle_hashes(a, 5), shingle_hashes(b, 5)
    if sa.shape[0] == 0 or sb.shape[0] == 0:
        return
    est = (minhash_signature(sa, _A, _B) == minhash_signature(sb, _A, _B)).mean()
    true = jaccard(sa, sb)
    # 128 perms: |est - J| < 5 sigma_max = 5 * 0.5/sqrt(128) ≈ 0.22
    assert abs(est - true) < 0.25


@settings(max_examples=50, deadline=None)
@given(texts)
def test_normalization_idempotent(t):
    once = normalize_for_shingling(t)
    assert normalize_for_shingling(once) == once
    assert "  " not in once


@settings(max_examples=30, deadline=None)
@given(texts, texts)
def test_lcs_bounds(a, b):
    l = lcs_length(a, b)
    assert 0 <= l <= min(len(a.encode()), len(b.encode()))
    assert lcs_length(a, a) == len(a.encode())
    assert lcs_length(a, b) == lcs_length(b, a)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=20))
def test_simhash_permutation_invariant(vals):
    arr = np.array(sorted(set(vals)), dtype=np.uint64)
    rng = np.random.default_rng(0)
    shuffled = arr.copy()
    rng.shuffle(shuffled)
    # shingle SETS are order-free → simhash must be too
    assert simhash(arr) == simhash(np.sort(shuffled))


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**64 - 1), st.integers(0, 2**64 - 1))
def test_hamming_metric_properties(x, y):
    a = np.array([x], dtype=np.uint64)
    b = np.array([y], dtype=np.uint64)
    d = hamming64(a, b)[0]
    assert 0 <= d <= 64
    assert hamming64(b, a)[0] == d
    assert hamming64(a, a)[0] == 0


@settings(max_examples=20, deadline=None)
@given(texts, st.integers(2, 8))
def test_shingles_deterministic_sorted_unique(t, k):
    s1 = shingle_hashes(t, k)
    s2 = shingle_hashes(t, k)
    assert np.array_equal(s1, s2)
    if s1.shape[0] > 1:
        assert np.all(s1[:-1] < s1[1:])
