"""PII detection/redaction as pure column expressions — the scrub pass
of a training-data pipeline. Patterns are deliberately conservative and
kept to the regex subset that Java (Spark) and RE2 (DuckDB oracle)
interpret identically; a production deployment would extend the set
(names/addresses need ML, out of scope for expression-level scrubbing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# pattern → replacement token; order matters (emails before bare domains)
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
]


def redact_pii(col: Column) -> Column:
    """Chained regexp_replace over every PII class — one codegen'd
    expression, no UDF."""
    out = col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(col: Column) -> dict:
    """{class: count-expression} for monitoring/reporting."""
    return {
        name: F.regexp_count(col, F.lit(pattern))
        for name, pattern, _ in PII_PATTERNS
    }


def scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``<text_col>_redacted`` plus per-class ``pii_<class>``
    counts (counted BEFORE redaction, for the audit trail)."""
    out = df
    for name, expr in pii_counts(F.col(text_col)).items():
        out = out.withColumn(f"pii_{name}", expr.cast("bigint"))
    return out.withColumn(f"{text_col}_redacted", redact_pii(F.col(text_col)))
