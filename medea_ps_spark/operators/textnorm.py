"""Unicode text normalization — the canonicalization stage a web-scale
text pipeline runs BEFORE dedup/fingerprinting/tokenization, so that
byte-different-but-visually-identical strings (composed vs decomposed
accents, full-width forms, ligatures, zero-width joiners) collapse to
one representation. Skipping it silently breaks exact dedup (the same
sentence hashes differently in NFC vs NFD) and inflates vocabularies.

Execution shape for 100 TB:

* Control/zero-width stripping and whitespace squeezing are pure JVM
  ``regexp_replace`` column expressions — whole-stage codegen, free.
* The NFC/NFKC step has no Spark SQL expression, so it is ONE
  Arrow-batched pandas UDF (``pd.Series.str.normalize`` — ICU-grade
  tables from Python's unicodedata, C loop per row). Map-only: no
  shuffle, no collect; composes into the same single-pass plan as the
  quality/fingerprint stages downstream.

Oracle note: DuckDB ships ``nfc_normalize``, so the NFC path is
SQL-oracle-able; NFKC parity is pinned against direct
``unicodedata.normalize`` instead.
"""

from __future__ import annotations

import unicodedata
from typing import Optional

# module-top imports: pandas_udf type hints resolve from module
# globals (round-1 hard rule)
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

#: C0/C1 control characters except tab/newline/carriage-return, plus
#: the zero-width set (ZWSP, ZWNJ, ZWJ, word-joiner, BOM/ZWNBSP) that
#: survives most scrapes and poisons shingle/fingerprint equality.
CONTROL_CHARS_RE = (
    "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F"
    "\\u0080-\\u009F\\u200B\\u200C\\u200D\\u2060\\uFEFF]"
)

NORMAL_FORMS = ("NFC", "NFKC", "NFD", "NFKD")


def strip_control_chars(col: Column) -> Column:
    """Remove C0/C1 controls (except ``\\t``/``\\n``/``\\r``) and
    zero-width characters. Pure JVM regexp — codegen'd."""
    return F.regexp_replace(col, CONTROL_CHARS_RE, "")


def squeeze_whitespace(col: Column) -> Column:
    """Collapse horizontal whitespace runs to one space and 3+ newlines
    to a paragraph break (2), then trim — preserves document structure,
    unlike :func:`..functions.text.normalize` which flattens and
    lowercases for fingerprinting."""
    out = F.regexp_replace(col, "[ \\t\\x0B\\f\\r\\u00A0]+", " ")
    out = F.regexp_replace(out, " ?\\n ?", "\n")
    out = F.regexp_replace(out, "\\n{3,}", "\n\n")
    return F.trim(out)


def unicode_normalize_col(col: Column, form: str = "NFC") -> Column:
    """Unicode-normalize a string column to ``form`` — the one step that
    genuinely needs Python (Spark SQL has no normalization expression).
    Arrow-batched pandas UDF; NULL in → NULL out."""
    if form not in NORMAL_FORMS:
        raise ValueError(f"form must be one of {NORMAL_FORMS}, got {form!r}")

    @F.pandas_udf("string")
    def norm(data: pd.Series) -> pd.Series:
        return data.str.normalize(form)

    return norm(col)


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: Optional[str] = None,
    form: str = "NFC",
    strip_controls: bool = True,
    squeeze: bool = False,
) -> DataFrame:
    """Adds ``out_col`` (default: replace ``text_col`` in place): the
    Unicode-normalized, control-stripped (optionally
    whitespace-squeezed) text. Strip/squeeze run FIRST (JVM-side) so the
    pandas UDF sees the smallest string; normalization is idempotent so
    the order vs squeezing is immaterial for the forms' guarantees."""
    out = out_col or text_col
    col = F.col(text_col)
    if strip_controls:
        col = strip_control_chars(col)
    if squeeze:
        col = squeeze_whitespace(col)
    return df.withColumn(out, unicode_normalize_col(col, form))


def normalization_stats(
    df: DataFrame, text_col: str = "text", form: str = "NFC"
) -> DataFrame:
    """One-row audit BEFORE committing to a full rewrite: how much of
    the corpus is already normalized? Returns (n_rows, n_changed,
    n_nonascii, changed_frac). One scan, one partial+final aggregate —
    the pandas UDF and the comparison both ride the map side."""
    normed = unicode_normalize_col(strip_control_chars(F.col(text_col)), form)
    flags = df.select(
        F.col(text_col).isNotNull().cast("bigint").alias("present"),
        (
            F.col(text_col).isNotNull() & (normed != F.col(text_col))
        ).cast("bigint").alias("changed"),
        (
            F.col(text_col).isNotNull()
            & F.col(text_col).rlike("[^\\x00-\\x7F]")
        ).cast("bigint").alias("nonascii"),
    )
    return flags.agg(
        F.sum("present").alias("n_rows"),
        F.sum("changed").alias("n_changed"),
        F.sum("nonascii").alias("n_nonascii"),
        F.round(
            F.sum("changed") / F.greatest(F.sum("present"), F.lit(1)), 6
        ).alias("changed_frac"),
    )


def python_reference_normalize(
    text: Optional[str],
    form: str = "NFC",
    strip_controls: bool = True,
    squeeze: bool = False,
) -> Optional[str]:
    """Pure-Python reference twin of :func:`normalize_text` for tests
    (regex semantics reproduced with explicit char classes)."""
    import re

    if text is None:
        return None
    if strip_controls:
        text = re.sub(
            "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f"
            "\\u0080-\\u009f\\u200b\\u200c\\u200d\\u2060\\ufeff]",
            "",
            text,
        )
    if squeeze:
        text = re.sub("[ \\t\\x0b\\f\\r\\u00a0]+", " ", text)
        text = re.sub(" ?\\n ?", "\\n", text)
        text = re.sub("\\n{3,}", "\\n\\n", text)
        text = text.strip()
    return unicodedata.normalize(form, text)
