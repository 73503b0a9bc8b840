"""PII detection / redaction as native Column expressions.

Training-data scrubbing stage (north-star extension; the reference
engine has no PII surface — this sits in the same tier as the dedup /
lang-id / quality operators in the README coverage table).

Patterns are deliberately written in the regex subset shared by Java
(Spark's engine) and RE2 (the DuckDB oracle): character classes,
bounded repetition, ``\\b`` word boundaries — no backreferences, no
lookaround. Counting and redaction are pure ``regexp_count`` /
``regexp_replace`` chains: map-only, zero shuffle at any corpus scale,
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered dict: redaction applies in this order, and ORDER IS THE
# disambiguation rule — the categories can overlap at the edges (an
# ipv4- or phone-shaped local part inside an email, '127.0.0.1@x.com'),
# in which case the earlier pattern claims the span: redaction emits
# one <EMAIL> and no <IPV4>. pii_count() runs each pattern over the
# ORIGINAL text independently, so on such inputs per-category counts
# can exceed the redacted-span count — reconcile against redact_pii's
# output (count the tokens), not against summed pii_counts.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}


def pii_count(col: Column, kind: str) -> Column:
    """Number of matches of one PII category (int)."""
    return F.regexp_count(col, F.lit(PII_PATTERNS[kind]))


def redact_pii(col: Column) -> Column:
    """Replace every PII span with its ``<CATEGORY>`` token."""
    out = col
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out
