"""HTML → text extraction: expression semantics vs the pure-Python
reference, entity-decode ordering (no double decode), full-fidelity
UDF parity with html.unescape, composition with line_dedup, and a
map-only (no Exchange) plan gate."""

from __future__ import annotations

import html as pyhtml

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.functions.html import (
    html_to_text,
    python_reference_html_to_text,
)
from medea_ps_spark.operators.extract import (
    extract_and_debloat,
    extract_text,
    html_stats,
)

PAGES = [
    # plain text — no-op
    ("p0", "just plain text, no markup at all"),
    # full page: script/style/comment content must vanish
    (
        "p1",
        "<html><head><title>T</title><script>var x = '<p>not text</p>';"
        "</script><style>p { color: red }</style></head>"
        "<body><!-- nav --><p>First para</p><p>Second para</p></body></html>",
    ),
    # attributes with > inside quotes are OUT of scope (documented);
    # keep attrs simple here
    ("p2", '<div class="main"><b>G</b>ood <i>text</i></div>'),
    # entities incl. the &amp;lt; single-decode trap
    ("p3", "Fish &amp; chips &lt;b&gt;not bold&lt;/b&gt; &amp;lt;raw"),
    # block structure: li/br/tr become line breaks
    ("p4", "<ul><li>one</li><li>two</li></ul>three<br>four"),
    # case-insensitive, multiline script
    ("p5", "<SCRIPT type='x'>\nline1\nline2\n</SCRIPT>after"),
    # numeric + exotic named entities (full mode only)
    ("p6", "A&#66;C &copy; caf&#233;"),
    ("p7", None),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "doc_id string, text string")


def _vals(df, col="text"):
    return {r["doc_id"]: r[col] for r in df.collect()}


def test_matches_python_reference_basic(pages):
    got = _vals(
        pages.select("doc_id", html_to_text(F.col("text")).alias("text"))
    )
    for doc_id, raw in PAGES:
        assert got[doc_id] == python_reference_html_to_text(raw), doc_id


def test_extract_text_semantics(pages):
    got = _vals(extract_text(pages))
    assert got["p0"] == "just plain text, no markup at all"
    # title survives (it IS text); script/style/comment content gone;
    # the head/body boundary renders as a paragraph break
    assert got["p1"] == "T\n\nFirst para\nSecond para"
    # inline tags join with no separator
    assert got["p2"] == "Good text"
    # &amp;lt; decodes ONCE to literal "&lt;" — not to "<"
    assert got["p3"] == 'Fish & chips <b>not bold</b> &lt;raw'
    assert got["p4"] == "one\ntwo\n\nthree\nfour"
    assert got["p5"] == "after"
    assert got["p7"] is None


def test_full_entities_matches_html_unescape(pages):
    got = _vals(
        pages.select(
            "doc_id",
            html_to_text(F.col("text"), full_entities=True).alias("text"),
        )
    )
    assert got["p6"] == pyhtml.unescape("A&#66;C &copy; caf&#233;")
    # basic set agrees between the codegen chain and html.unescape
    # (nbsp is the one divergence: html.unescape yields  , the
    # basic chain yields ' ' — not planted here)
    assert got["p3"] == python_reference_html_to_text(PAGES[3][1], True)


def test_escaped_markup_never_becomes_tags(spark):
    # the double-decode bug: unescape-then-strip would erase this text
    df = spark.createDataFrame(
        [("d", "&lt;script&gt;alert(1)&lt;/script&gt;")],
        "doc_id string, text string",
    )
    out = _vals(extract_text(df))["d"]
    assert out == "<script>alert(1)</script>"


def test_html_stats(pages):
    row = html_stats(pages).collect()[0].asDict()
    assert row["n_rows"] == 7  # null excluded
    assert row["n_with_markup"] == 4  # p1 p2 p4 p5
    assert row["n_with_script"] == 2  # p1 p5
    assert row["n_with_entities"] == 2  # p3 p6
    assert row["markup_frac"] == round(4 / 7, 6)


def test_extract_and_debloat_composes(spark):
    banner = "<div>accept our cookie policy to continue</div>"
    rows = [
        ("a", f"{banner}<p>unique alpha body text</p>"),
        ("b", f"{banner}<p>unique beta body text</p>"),
        ("c", "<p>unique gamma body text</p>"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r.asDict() for r in extract_and_debloat(df).collect()}
    assert got["a"]["text_clean"] == "unique alpha body text"
    assert got["a"]["n_removed"] == 1
    assert got["c"]["text_clean"] == "unique gamma body text"
    assert got["c"]["n_removed"] == 0


def test_extract_plan_is_map_only(pages):
    plan = extract_text(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
