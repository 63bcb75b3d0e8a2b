"""HTML text-extraction operator — turns a raw-markup column into the
clean line-structured text the rest of the engine (normalize → dedup →
quality → tokenize; reference semantics validate the RESULT of this
stage) consumes. See ``functions/html.py`` for the expression layer and
the documented simplifications.

Scale design
------------
* :func:`extract_text` is ONE map-only pass: every step (script/style/
  comment drop, block-tag → newline, tag strip, basic-entity decode,
  whitespace squeeze) is a JVM ``regexp_replace`` chain inside
  whole-stage codegen — no shuffle, no join, no UDF. At 100 TB this is
  scan-bound, exactly like the quality/fingerprint stages it feeds.
* ``full_entities=True`` swaps the entity step for one Arrow-batched
  pandas UDF (``html.unescape``) — still map-only.
* Corpus-level boilerplate removal (nav bars, cookie banners — lines
  repeated across MANY pages) is the existing
  ``operators/linededup.line_dedup`` applied AFTER extraction; the
  block-tag → newline step is what makes that composition meaningful.
* :func:`html_stats` is the audit-before-rewrite: one partial+final
  aggregate, no rows to the driver.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..functions.html import html_to_text


def _squeeze_extracted(col):
    """The extraction-side whitespace squeeze — the same shape as
    ``textnorm.squeeze_whitespace`` but with the edge cleanup done by
    REGEX (strip leading/trailing space/newline runs) instead of
    ``F.trim``: every step is then a pattern both Java regex and RE2
    execute identically, which keeps the DuckDB oracle twin exact."""
    out = F.regexp_replace(col, "[ \\t\\x0B\\f\\r\\u00A0]+", " ")
    out = F.regexp_replace(out, " ?\\n ?", "\n")
    out = F.regexp_replace(out, "\\n{3,}", "\n\n")
    return F.regexp_replace(out, "^[ \\n]+|[ \\n]+$", "")


def extract_text(
    df: DataFrame,
    html_col: str = "text",
    out_col: Optional[str] = None,
    full_entities: bool = False,
    squeeze: bool = True,
) -> DataFrame:
    """Adds ``out_col`` (default: replace ``html_col`` in place) with the
    extracted text. ``squeeze=True`` collapses the whitespace the tag
    removal leaves behind (horizontal runs → one space, 3+ newlines →
    paragraph break, strip leading/trailing space/newline runs) — the
    same shape as ``textnorm.squeeze_whitespace``, see
    :func:`_squeeze_extracted` for why the edge cleanup is regex-based.
    NULL markup → NULL out."""
    out = out_col or html_col
    col = html_to_text(F.col(html_col), full_entities=full_entities)
    if squeeze:
        col = _squeeze_extracted(col)
    return df.withColumn(out, col)


def html_stats(df: DataFrame, html_col: str = "text") -> DataFrame:
    """One-row corpus audit BEFORE committing to a full extraction pass:
    (n_rows, n_with_markup, n_with_script, n_with_entities,
    markup_frac) — decides whether a corpus needs this stage at all.
    One scan, one partial+final aggregate."""
    col = F.col(html_col)
    flags = df.select(
        col.isNotNull().cast("bigint").alias("present"),
        (col.isNotNull() & col.rlike("<[A-Za-z!/]")).cast("bigint").alias(
            "markup"
        ),
        (col.isNotNull() & col.rlike("(?i)<script\\b")).cast("bigint").alias(
            "script"
        ),
        (col.isNotNull() & col.rlike("&[A-Za-z]{2,8};|&#[0-9]{1,7};")).cast(
            "bigint"
        ).alias("entities"),
    )
    return flags.agg(
        F.sum("present").alias("n_rows"),
        F.sum("markup").alias("n_with_markup"),
        F.sum("script").alias("n_with_script"),
        F.sum("entities").alias("n_with_entities"),
        F.round(
            F.sum("markup") / F.greatest(F.sum("present"), F.lit(1)), 6
        ).alias("markup_frac"),
    )


def extract_and_debloat(
    df: DataFrame,
    html_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    min_chars: int = 6,
    full_entities: bool = False,
) -> DataFrame:
    """The composed front door: extract text from markup, then drop
    corpus-repeated boilerplate lines (CCNet-style) with
    ``linededup.line_dedup``. Returns (id_col, n_lines, n_removed,
    text_clean). The extraction expressions fuse into line_dedup's
    explode scans (no materialization barrier between the stages;
    line_dedup itself reads its input twice — count side and rewrite
    side — so at scale persist the extracted relation first if the
    markup parse dominates the scan)."""
    from .linededup import line_dedup

    extracted = extract_text(
        df, html_col=html_col, out_col="_extracted",
        full_entities=full_entities, squeeze=True,
    ).select(F.col(id_col), F.col("_extracted").alias("text"))
    return line_dedup(
        extracted, text_col="text", id_col=id_col,
        min_count=min_count, min_chars=min_chars,
    )
