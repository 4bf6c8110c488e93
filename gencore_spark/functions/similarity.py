"""Pairwise similarity kernels: exact Jaccard, LCS, containment
(pure numpy, no Spark).

Reference analog: the dup test ``isDupWith`` (``pair.cpp:307-326``) — an AND
of cheap key-equality and a hamming gate — and the cigar-prefix containment
scan ``isPartOf`` (``bamutil.cpp:293-336``) used for representative election.
Ours verifies candidate pairs with exact char-shingle Jaccard + a rolling-hash
longest-common-substring bound.
"""

from __future__ import annotations

import numpy as np

from .shingle import gram_hashes, shingle_hashes


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two *deduplicated* uint64 hash sets."""
    na, nb = a.shape[0], b.shape[0]
    if na == 0 and nb == 0:
        return 1.0
    if na == 0 or nb == 0:
        return 0.0
    inter = np.intersect1d(a, b, assume_unique=True).shape[0]
    return inter / (na + nb - inter)


def jaccard_texts(ta: str, tb: str, k: int) -> float:
    return jaccard(shingle_hashes(ta, k), shingle_hashes(tb, k))


def lcs_length(ta: str, tb: str) -> int:
    """Longest common substring length via binary search on rolling hashes.

    O((n+m) log min(n,m)) with fully vectorized hash computation; a
    Monte-Carlo bound (64-bit hash collisions may overestimate with
    probability ~2**-40 at these sizes) — acceptable as a verify *gate*,
    mirroring the clip-tolerant approximation in the reference's
    ``isPartOf`` (``bamutil.cpp:293-336``).
    """
    a = np.frombuffer(ta.encode("utf-8"), dtype=np.uint8)
    b = np.frombuffer(tb.encode("utf-8"), dtype=np.uint8)
    if a.shape[0] == 0 or b.shape[0] == 0:
        return 0
    lo, hi = 0, min(a.shape[0], b.shape[0])
    # invariant: common substring of length `lo` exists; none of length hi+1
    while lo < hi:
        mid = (lo + hi + 1) // 2
        ha = gram_hashes(a, mid)
        hb = gram_hashes(b, mid)
        if np.intersect1d(ha, hb).shape[0] > 0:
            lo = mid
        else:
            hi = mid - 1
    return lo


def has_common_substring(ta: str, tb: str, min_len: int) -> bool:
    """True iff a common substring of length >= ``min_len`` exists.

    One rolling-hash pass at exactly ``min_len`` — the gate form of
    :func:`lcs_length` (10x cheaper than the full binary search; the verify
    stage only needs the threshold decision, not the exact length).
    """
    if min_len <= 0:
        return True
    a = np.frombuffer(ta.encode("utf-8"), dtype=np.uint8)
    b = np.frombuffer(tb.encode("utf-8"), dtype=np.uint8)
    if a.shape[0] < min_len or b.shape[0] < min_len:
        return False
    ha = gram_hashes(a, min_len)
    hb = gram_hashes(b, min_len)
    return np.intersect1d(ha, hb).shape[0] > 0


def containment(part: np.ndarray, whole: np.ndarray) -> float:
    """|part ∩ whole| / |part| over deduplicated hash sets.

    The reference's ``isPartOf`` prefix-containment analog: a truncated doc
    has containment ≈ 1 in its source even when Jaccard is low.
    """
    if part.shape[0] == 0:
        return 1.0
    inter = np.intersect1d(part, whole, assume_unique=True).shape[0]
    return inter / part.shape[0]
