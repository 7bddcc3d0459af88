"""PII scrubbing for training-data curation.

Large-scale corpus pipelines redact personally-identifiable strings
(emails, phone numbers, IP addresses) before training. Everything here is
a pure ``regexp_replace`` / ``regexp_count`` Column projection — JVM-side,
whole-stage codegen, no shuffle, no Python in the hot path.

The regex set is deliberately restricted to syntax with identical
semantics in Java regex (Spark) and RE2 (the DuckDB oracle): character
classes, bounded repetition, ``\\b`` word boundaries. No lookarounds, no
backreferences.

Reference scope note: the reference pipeline stores raw Reddit text with
no redaction (airflow/extraction/extract-from-reddit.py); PII scrubbing
is part of this engine's training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Email addresses — local@domain.tld with the common charset.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

#: North-American-style phone numbers: 555-123-4567 / 555.123.4567.
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"

#: Dotted-quad IPv4 (loose: does not range-check octets).
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

#: Replacement tokens, applied in this order. Email first (its charset
#: overlaps the others), then phone (so its digit runs are consumed
#: before the looser IP pattern can bite a 3-dot phone variant), then IP.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ip", IPV4_RE, "<IP>"),
)


def _col(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def scrub_pii(col: str | Column = "text") -> Column:
    """Redact all PII_RULES matches, in rule order."""
    c = _col(col)
    for _, pattern, token in PII_RULES:
        c = F.regexp_replace(c, pattern, token)
    return c


def pii_counts(col: str | Column = "text") -> list[Column]:
    """One ``n_<kind>`` count column per rule (pre-redaction).

    Counted against the same precedence the scrubber applies: each kind
    is counted on the text with the earlier rules already redacted, so a
    string never tallies under two kinds.
    """
    out = []
    c = _col(col)
    for kind, pattern, token in PII_RULES:
        out.append(F.regexp_count(c, F.lit(pattern)).cast("long").alias(f"n_{kind}"))
        c = F.regexp_replace(c, pattern, token)
    return out
