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
# Entity decoding happens AFTER tag removal so markup escaped as text
# (&lt;b&gt;) never becomes a tag, and in ONE combined left-to-right
# regex pass — the five XML predefined entities plus numeric character
# references (&#NNNN; / &#xHHHH;) together.  A single pass is exactly one
# level of decoding by construction (re.sub never rescans replacement
# output): "&amp;lt;" → "&lt;", "&#38;lt;" → "&lt;", "&amp;#39;" →
# "&#39;" — sequential replace passes would double-decode all three.
_XML_NAMED = {"lt": "<", "gt": ">", "quot": '"', "apos": "'", "amp": "&"}
_ENTITY_RE = re.compile(
    r"&(?:#[xX]([0-9a-fA-F]{1,6})|#([0-9]{1,7})|(lt|gt|quot|apos|amp));"
)
# HTML5 §13.2.5.80 (numeric character reference end state): codepoints in
# the C1 control range decode as their windows-1252 characters — the
# common-web smart-quote/dash case (&#147; → U+201C).  Public spec table;
# 0x81/0x8D/0x8F/0x90/0x9D map to themselves.
_C1_WIN1252 = {
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E, 0x85: 0x2026,
    0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6, 0x89: 0x2030, 0x8A: 0x0160,
    0x8B: 0x2039, 0x8C: 0x0152, 0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019,
    0x93: 0x201C, 0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A, 0x9C: 0x0153,
    0x9E: 0x017E, 0x9F: 0x0178,
}


def _decode_entity(m: re.Match) -> str:
    if m.group(3):
        return _XML_NAMED[m.group(3)]
    cp = int(m.group(1), 16) if m.group(1) else int(m.group(2))
    cp = _C1_WIN1252.get(cp, cp)
    # HTML5: NUL, surrogates, and out-of-range all decode to U+FFFD
    if cp == 0 or 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF:
        return "�"
    return chr(cp)
# pinned to Java's non-unicode \s — [ \t\n\x0B\f\r] — so this Python mirror
# and the pipeline's JVM expression (operators.exact.normalize_expr) produce
# byte-identical output
_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


def extract_text(html: bytes) -> str:
    """Strip script/style bodies + markup tags from ``html`` bytes, decode
    utf-8, then decode numeric character references (``&#8217;`` /
    ``&#x2019;``, one level, HTML5 semantics incl. the windows-1252 C1
    table) and the five XML predefined entities.

    Deterministic and locale-free: pure byte-regexes + fixed string/table
    replacements, no whitespace rewriting — so the byte-identical
    invariant is checkable by equality.  (A production system would plug
    trafilatura-style extraction here; the contract — bytes in, exact
    text out — is the same.)
    """
    if html is None:
        return ""
    stripped = _TAG_RE.sub(b"", _SCRIPT_STYLE_RE.sub(b"", html))
    text = stripped.decode("utf-8", errors="replace")
    if "&" in text:
        text = _ENTITY_RE.sub(_decode_entity, text)
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
