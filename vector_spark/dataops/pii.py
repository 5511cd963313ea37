"""PII detection + redaction for training-data pipelines.

Regex families (email, IPv4, SSN-shaped, US-phone-shaped, credit-card-
shaped) detected and replaced with typed placeholder tokens — the
standard pre-training scrub. Everything is a pure Column expression
(JVM regexp_count / regexp_replace, codegen'd, zero shuffle, no
Python in the loop), and every pattern is RE2-safe so the DuckDB
oracle replays it verbatim: no backreferences, no lookaround.

Order matters: longer/more-specific shapes are redacted before the
shorter shapes they contain (credit-card before phone, SSN before
phone, phone before IPv4 is moot but kept for clarity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, placeholder) — redaction applies in this order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("cc", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "[CC]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
]


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind match counts on the RAW text (before redaction).

    Counts use the same masking order as redaction so nested shapes
    are attributed once: e.g. the digits inside an already-counted
    credit card are not re-counted as a phone number.
    """
    out: dict[str, Column] = {}
    masked = col
    for name, pat, placeholder in PII_PATTERNS:
        out[name] = F.regexp_count(masked, F.lit(pat))
        masked = F.regexp_replace(masked, pat, placeholder)
    return out


def redact_pii(col: Column) -> Column:
    """Text with every PII match replaced by its placeholder token."""
    out = col
    for _name, pat, placeholder in PII_PATTERNS:
        out = F.regexp_replace(out, pat, placeholder)
    return out


def scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_<kind>..., n_pii, redacted) — one pass, zero shuffle."""
    c = F.col(text_col)
    counts = pii_counts(c)
    total = None
    cols = [F.col(id_col)]
    for name, cnt in counts.items():
        cols.append(cnt.cast("bigint").alias(f"n_{name}"))
        total = cnt if total is None else total + cnt
    cols.append(total.cast("bigint").alias("n_pii"))
    cols.append(redact_pii(c).alias("redacted"))
    return df.select(*cols)


def oracle_exprs() -> list[tuple[str, str, str]]:
    """The (name, RE2 pattern, placeholder) triples for the DuckDB
    twin — same list, single source of truth."""
    return PII_PATTERNS
