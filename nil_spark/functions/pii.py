"""PII detection / scrubbing as pure column expressions.

A training-data pipeline redacts emails, IPv4 addresses, and phone
numbers before any text leaves the ingest tier.  Everything here is
JVM-side `regexp_count` / `regexp_replace` (whole-stage codegen; no
Python in the hot path), so at 100 TB the scrub is a map-only pass
with zero shuffle — it fuses into whatever scan feeds it.

The patterns are written in the common subset of Java regex (Spark)
and RE2 (DuckDB) — `\\b`, `\\d`, bounded repetition — so the oracle
can mirror them byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: emails first (their local/domain parts contain dots and
# digits that the later patterns could clip), then IPs, then phones.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts, keyed ``n_<kind>``."""
    return {
        f"n_{kind}": F.regexp_count(text, F.lit(pat)).cast("long")
        for kind, pat, _ in PII_PATTERNS
    }


def scrub(text: Column) -> Column:
    """Text with every PII match replaced by its placeholder token.

    Spark's regexp_replace replaces ALL occurrences (the DuckDB mirror
    needs the explicit 'g' flag).
    """
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def scrub_sql(expr: str) -> str:
    """DuckDB fragment computing the same scrub (RE2, 'g' flag)."""
    out = expr
    for _, pat, token in PII_PATTERNS:
        # standard-SQL single-quoted literals pass backslashes through
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out
