"""Text extraction + normalization (pure functions, no Spark).

Reference analog: UMI extraction / qname normalization
(``bamutil.cpp:23-112``, ``util.h:194-210`` str_keep_valid_sequence) — the
projection that derives the clustering key material from the raw record.

Two distinct functions with distinct contracts:

* ``extract_text(html)`` — recover the page text from the raw ``html:binary``
  column.  The BASELINE.json ``input_hint`` invariant is **byte-identical
  extracted text per url**: for fixture pages built by
  :mod:`gencore_spark.fixtures`, ``extract_text(html) == text`` byte for byte.
  This is a deterministic, locale-free, version-pinned transformation
  (golden-byte tested).

* ``normalize_for_shingling(text)`` — the lossy canonicalization used ONLY as
  shingle input (lowercase, collapse whitespace runs to a single space,
  strip).  It never replaces the stored ``text``.
"""

from __future__ import annotations

import re

_TAG_RE = re.compile(rb"<[^>]*>")
# pinned to Java's non-unicode \s — [ \t\n\x0B\f\r] — so this Python mirror
# and the pipeline's JVM expression (operators.exact.normalize_expr) produce
# byte-identical output
_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


def extract_text(html: bytes) -> str:
    """Strip markup tags from ``html`` bytes; decode utf-8.

    Deterministic and locale-free: a pure byte-regex tag strip, no entity
    decoding, no whitespace rewriting — so the byte-identical invariant is
    checkable by equality.  (A production system would plug trafilatura-style
    extraction here; the contract — bytes in, exact text out — is the same.)
    """
    if html is None:
        return ""
    return _TAG_RE.sub(b"", html).decode("utf-8", errors="replace")


def normalize_for_shingling(text: str) -> str:
    """Lowercase + collapse ASCII-whitespace runs to one space + trim spaces.

    Exactly mirrors the pipeline's JVM expression
    ``trim(regexp_replace(lower(text), '\\s+', ' '))`` — same operation
    order, same (Java, non-unicode) whitespace class, space-only trim.
    """
    if text is None:
        return ""
    return _WS_RE.sub(" ", text.lower()).strip(" ")
