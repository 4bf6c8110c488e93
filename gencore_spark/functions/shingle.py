"""Char k-shingle hashing (pure numpy, no Spark).

Reference analog: the 4-bit base packing + coordinate key derivation
(``bamutil.cpp:148-183``, ``gencore.cpp:296-313``) — the compression step
that turns variable-length row content into fixed-width integer key material.
Ours turns utf-8 text into a set of uint64 k-gram hashes via a vectorized
polynomial rolling hash.
"""

from __future__ import annotations

import numpy as np

# FNV-64 prime as the polynomial base; arithmetic wraps mod 2**64 (numpy
# uint64 overflow is the modulus — deterministic across platforms).
_BASE = np.uint64(1099511628211)
_OFFSET = np.uint64(1469598103934665603)


def shingle_hashes(text: str, k: int) -> np.ndarray:
    """All k-gram hashes of ``text`` (utf-8 bytes), deduplicated + sorted.

    Returns uint64 array.  Texts shorter than ``k`` yield a single hash of
    the whole string (so tiny docs still have a non-empty shingle set).
    """
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    n = b.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    if n < k:
        with np.errstate(over="ignore"):
            h = _OFFSET
            for v in b:
                h = h * _BASE + np.uint64(v)
        return np.array([h], dtype=np.uint64)
    m = n - k + 1
    h = np.full(m, _OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            h *= _BASE
            h += b[i : i + m].astype(np.uint64)
    return np.unique(h)


# modular inverse of _BASE mod 2**64 (B is odd, so invertible); lets us
# normalize windowed prefix sums to a position-independent gram hash.
_BASE_INV = np.uint64(pow(int(_BASE), -1, 1 << 64))

# grow-only cache of ascending powers B^i / B^-i (mod 2**64)
_POW_CACHE: list[np.ndarray] = []


def _powers(n: int) -> tuple[np.ndarray, np.ndarray]:
    if not _POW_CACHE or _POW_CACHE[0].shape[0] < n:
        size = max(n, 4096)
        with np.errstate(over="ignore"):
            p = np.ones(size, dtype=np.uint64)
            np.cumprod(np.full(size - 1, _BASE, dtype=np.uint64), out=p[1:])
            q = np.ones(size, dtype=np.uint64)
            np.cumprod(np.full(size - 1, _BASE_INV, dtype=np.uint64), out=q[1:])
        _POW_CACHE[:] = [p, q]
    return _POW_CACHE[0][:n], _POW_CACHE[1][:n]


def gram_hashes(codes: np.ndarray, length: int) -> np.ndarray:
    """Rolling hashes of every ``length``-gram of a uint8 code array.

    Position- and string-length-independent: equal grams hash equal across
    different strings.  Prefix-power formulation (O(n), fully vectorized);
    used by the LCS binary search in
    :mod:`gencore_spark.functions.similarity`.
    """
    a = codes.astype(np.uint64)
    n = a.shape[0]
    if n < length or length <= 0:
        return np.zeros(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        powers, inv_powers = _powers(n)
        # S[i] = sum_{j<i} a[j] * B^j  (mod 2**64)
        prefix = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(a * powers, out=prefix[1:], dtype=np.uint64)
        m = n - length + 1
        # (S[i+L] - S[i]) = B^i * g(i)  →  g(i) = diff * B^-i depends only on
        # the gram's content.  Salt with (1 + a[i]) add to decorrelate tiny L.
        out = (prefix[length:] - prefix[:m]) * inv_powers[:m]
    return out
