"""HTML → text extraction — the front-of-pipeline stage of a web-scale
corpus (CommonCrawl WET-style text rendering, trafilatura-lite). The
reference engine validates already-extracted text; a pipeline feeding
it from raw crawl needs this stage first.

Execution shape for 100 TB:

* Script/style/comment removal, block-tag → newline conversion, tag
  stripping, and the common named-entity set are ALL pure JVM
  ``regexp_replace`` column expressions — whole-stage codegen, one
  map-only pass, no UDF, no shuffle. (This is also what makes the
  pipeline SQL-oracle-able: every regex below is RE2-compatible so the
  DuckDB twin runs the same patterns.)
* FULL entity fidelity (the ~2k named entities + numeric
  ``&#123;``/``&#x1f600;`` references) has no SQL expression — that is
  one optional Arrow-batched pandas UDF over Python's
  ``html.unescape`` (see :func:`unescape_entities_full`).

Order of operations is deliberate and load-bearing: entities are
unescaped AFTER tags are stripped, so escaped markup in the text
(``&lt;script&gt;``) renders as literal text instead of becoming a tag
that the stripper would then (wrongly) remove — the classic
double-decode bug, pinned by test.

Known, documented simplifications (shared with most WET extractors):
inline tags are removed with no separator (``<b>G</b>ood`` → "Good"),
a stray unclosed ``<`` is left as-is, and CDATA sections are treated
as ordinary tag soup.
"""

from __future__ import annotations

# module-top imports: pandas_udf type hints resolve from module
# globals (round-1 hard rule)
import html as _pyhtml

import pandas as pd

from pyspark.sql import Column, functions as F

#: elements whose CONTENT is not text — dropped wholesale. Two
#: patterns (not one with a backreference): RE2 — the DuckDB oracle's
#: regex engine — has no backreferences, and these regexes are shared
#: with the SQL twin verbatim.
SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script\s*>"
STYLE_RE = r"(?is)<style\b[^>]*>.*?</style\s*>"

#: HTML comments (non-greedy; conditional comments included).
COMMENT_RE = r"(?s)<!--.*?-->"

#: tags that terminate a visual block — replaced with a newline so the
#: extracted text keeps line structure for downstream line-level ops
#: (boilerplate removal via operators/linededup.py works per line).
BLOCK_BREAK_RE = (
    r"(?i)<(?:br\s*/?|/(?:p|div|li|h[1-6]|tr|table|ul|ol|blockquote|"
    r"pre|section|article|header|footer|head|title|body|nav|aside))\s*>"
)

#: any remaining tag (opening, closing, self-closing, doctype).
ANY_TAG_RE = r"(?s)<[^>]*>"

#: the entity set that covers the overwhelming majority of real pages —
#: (entity, replacement) in application order; ``&amp;`` is LAST so
#: ``&amp;lt;`` decodes to the literal text "&lt;" (single decode).
BASIC_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def strip_script_style(col: Column) -> Column:
    """Remove ``<script>``/``<style>`` elements (content included) and
    HTML comments. Pure JVM regexp — codegen'd."""
    out = F.regexp_replace(col, SCRIPT_RE, "")
    out = F.regexp_replace(out, STYLE_RE, "")
    return F.regexp_replace(out, COMMENT_RE, "")


def block_tags_to_newlines(col: Column) -> Column:
    """Replace block-terminating tags with newlines so paragraphs/list
    items/table rows stay separate lines in the extracted text."""
    return F.regexp_replace(col, BLOCK_BREAK_RE, "\n")


def strip_tags(col: Column) -> Column:
    """Remove every remaining tag (inline tags join their surroundings
    with no separator — block structure was handled before this)."""
    return F.regexp_replace(col, ANY_TAG_RE, "")


def unescape_basic_entities(col: Column) -> Column:
    """Decode :data:`BASIC_ENTITIES` with a chain of literal
    replacements (``&amp;`` last — single-decode semantics). Codegen'd;
    the full-table twin is :func:`unescape_entities_full`."""
    out = col
    for ent, rep in BASIC_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return out


def unescape_entities_full(col: Column) -> Column:
    """Full-fidelity entity decoding (every named entity + decimal/hex
    numeric references) via Python's ``html.unescape`` — ONE
    Arrow-batched pandas UDF, map-only; NULL in → NULL out."""

    @F.pandas_udf("string")
    def unescape(data: pd.Series) -> pd.Series:
        return data.map(lambda s: _pyhtml.unescape(s) if s is not None else None)

    return unescape(col)


def html_to_text(col: Column, full_entities: bool = False) -> Column:
    """The composed extraction expression: drop script/style/comments →
    block tags to newlines → strip remaining tags → unescape entities.
    With ``full_entities=False`` the whole chain is codegen'd JVM
    regexps (and SQL-oracle-able); ``True`` swaps the last step for the
    ``html.unescape`` pandas UDF."""
    out = strip_tags(block_tags_to_newlines(strip_script_style(col)))
    if full_entities:
        return unescape_entities_full(out)
    return unescape_basic_entities(out)


def python_reference_html_to_text(
    text: str | None, full_entities: bool = False
) -> str | None:
    """Pure-Python reference twin of :func:`html_to_text` for tests —
    same patterns via ``re`` (Java/RE2/Python agree on this subset)."""
    import re

    if text is None:
        return None
    out = re.sub(SCRIPT_RE, "", text)
    out = re.sub(STYLE_RE, "", out)
    out = re.sub(r"(?s)<!--.*?-->", "", out)
    out = re.sub(BLOCK_BREAK_RE, "\n", out)
    out = re.sub(r"(?s)<[^>]*>", "", out)
    if full_entities:
        return _pyhtml.unescape(out)
    for ent, rep in BASIC_ENTITIES:
        out = out.replace(ent, rep)
    return out
