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

# script/style elements carry no page text — their BODIES must go, not just
# their tags (a bare tag-strip would leak javascript/css into the corpus).
# Case-insensitive, dot-matches-newline, lazy up to the matching close tag.
_SCRIPT_STYLE_RE = re.compile(
    rb"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(rb"<[^>]*>")
# the five XML predefined entities, decoded AFTER tag removal so markup
# escaped as text (&lt;b&gt;) never becomes a tag.  &amp; is decoded LAST:
# double-escaped input (&amp;lt;) correctly yields the literal text "&lt;"
# (one level of decoding, per spec), because "&lt;" never substring-matches
# inside "&amp;lt;".
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
)
# pinned to Java's non-unicode \s — [ \t\n\x0B\f\r] — so this Python mirror
# and the pipeline's JVM expression (operators.exact.normalize_expr) produce
# byte-identical output
_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


def extract_text(html: bytes) -> str:
    """Strip script/style bodies + markup tags from ``html`` bytes, decode
    utf-8, then decode the five XML predefined entities.

    Deterministic and locale-free: pure byte-regexes + fixed string
    replacements, no numeric character references, no whitespace rewriting —
    so the byte-identical invariant is checkable by equality.  (A production
    system would plug trafilatura-style extraction here; the contract —
    bytes in, exact text out — is the same.)
    """
    if html is None:
        return ""
    stripped = _TAG_RE.sub(b"", _SCRIPT_STYLE_RE.sub(b"", html))
    text = stripped.decode("utf-8", errors="replace")
    for entity, ch in _ENTITIES:
        if entity in text:
            text = text.replace(entity, ch)
    return text


def normalize_for_shingling(text: str) -> str:
    """Lowercase + collapse ASCII-whitespace runs to one space + trim spaces.

    Exactly mirrors the pipeline's JVM expression
    ``trim(regexp_replace(lower(text), '\\s+', ' '))`` — same operation
    order, same (Java, non-unicode) whitespace class, space-only trim.
    """
    if text is None:
        return ""
    return _WS_RE.sub(" ", text.lower()).strip(" ")
