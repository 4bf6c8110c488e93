"""PII detection and redaction signals (emails / IPv4 / phone numbers).

Web-scale training pipelines (C4, Dolma, RefinedWeb, FineWeb) scrub or
flag personally identifiable strings before anything downstream sees the
text.  This is a pure projection — the reference's analog is its
keep-valid normalization projection (``util.h:194-210`` strips invalid
characters record-by-record; here the "invalid" class is PII patterns and
the action is token substitution instead of deletion).

Everything is JVM-side ``regexp_extract_all`` / ``regexp_replace`` —
single pass per pattern, inside whole-stage codegen, no Python, no
shuffle: the operator scales exactly as the parquet scan does.  Patterns
are deliberately written in the common subset of Java regex and RE2
(no backreferences, no lookaround) so the DuckDB oracle can run the
byte-identical expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Common-subset regexes (Java regex == RE2 semantics for these).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# Intl-ish phone: +CC separated triplet/quad groups (conservative — a
# cleaning pipeline prefers precision; broaden per-deployment).
PHONE_RE = r"\+\d{1,2}[ -]\d{3}[ -]\d{3,4}[ -]\d{4}"

_PATTERNS = (("email", EMAIL_RE), ("ipv4", IPV4_RE), ("phone", PHONE_RE))


def _count(text: Column, pattern: str) -> Column:
    return F.coalesce(
        F.size(F.regexp_extract_all(text, F.lit(pattern), 0)), F.lit(0)
    ).cast("long")


def redact(text: Column) -> Column:
    """Replace every PII match with a typed placeholder token.

    Order matters and is part of the contract: emails first (an email
    contains no IP/phone match, but redacting IPs first could split an
    email-like string), then IPv4, then phones.
    """
    out = text
    for name, pattern in _PATTERNS:
        out = F.regexp_replace(out, pattern, f"<{name.upper()}>")
    return out


def pii_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII counts plus a redaction fingerprint.

    Returns ``(id_col, n_emails, n_ipv4, n_phones, redacted_md5)`` —
    the md5 of the redacted text pins the exact substitution behavior
    without shipping the full redacted body through small result sets.
    Callers that want the redacted corpus use :func:`redact` directly as
    a projection.
    """
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        _count(t, EMAIL_RE).alias("n_emails"),
        _count(t, IPV4_RE).alias("n_ipv4"),
        _count(t, PHONE_RE).alias("n_phones"),
        F.md5(redact(t).cast("binary")).alias("redacted_md5"),
    )
