"""64-bit SimHash fingerprints (pure numpy, no Spark).

Reference analog: the UMI as a compact per-molecule fingerprint compared by
hamming distance <= d (``cluster.cpp:41-53``, ``util.h:228-238``).  Ours is
Charikar SimHash over char-shingle hashes: bit ``i`` of the fingerprint is
the sign of ``sum over shingles of (2*bit_i(shingle) - 1)``.
"""

from __future__ import annotations

import numpy as np

from .shingle import shingle_hashes

_BITS = np.arange(64, dtype=np.uint64)


def simhash(shingles: np.ndarray) -> int:
    """64-bit SimHash of one shingle set (returned as Python int, unsigned)."""
    if shingles.shape[0] == 0:
        return 0
    bits = (shingles[:, None] >> _BITS[None, :]) & np.uint64(1)
    votes = 2 * bits.astype(np.int64).sum(axis=0) - shingles.shape[0]
    fp = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            fp |= np.uint64(1) << np.uint64(i)
    return int(fp)


_CHUNK_ROWS = 512  # cache-blocked: (512, 64) uint64 = 256 KiB stays in L2


def simhash_many(texts: list[str], k: int) -> np.ndarray:
    """SimHash for a batch of texts → (n,) uint64.

    Per-doc numpy loop with one reused (rows, 64) scratch buffer — no fresh
    large allocations in the hot path (see minhash_many for why).
    """
    sets = [shingle_hashes(t if t is not None else "", k) for t in texts]
    n = len(sets)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    max_m = min(max((s.shape[0] for s in sets), default=1), _CHUNK_ROWS)
    buf = np.empty((max(max_m, 1), 64), dtype=np.uint64)
    votes = np.empty(64, dtype=np.int64)
    for i, s in enumerate(sets):
        m = s.shape[0]
        if m == 0:
            continue
        votes[:] = 0
        for s0 in range(0, m, _CHUNK_ROWS):
            chunk = s[s0 : s0 + _CHUNK_ROWS]
            c = chunk.shape[0]
            np.right_shift(chunk[:, None], _BITS[None, :], out=buf[:c])
            np.bitwise_and(buf[:c], np.uint64(1), out=buf[:c])
            votes += buf[:c].sum(axis=0, dtype=np.int64)
        fp_bits = (2 * votes) > m
        out[i] = (fp_bits.astype(np.uint64) << _BITS).sum(dtype=np.uint64)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise popcount(a ^ b) for uint64 arrays (vectorized).

    Reference analog of ``hamming()`` ``util.h:228-238`` on fixed-width keys.
    """
    x = (a ^ b).view(np.uint64)
    cnt = np.zeros(x.shape, dtype=np.int64)
    for shift in range(0, 64, 8):
        cnt += _POPCOUNT_TABLE[(x >> np.uint64(shift)) & np.uint64(0xFF)]
    return cnt


_POPCOUNT_TABLE = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)
