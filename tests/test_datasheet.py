"""Corpus datasheet: exact values on a hand-built corpus, group
compositions, exact-vs-HLL duplication, token stats, JSON round-trip."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators.datasheet import corpus_datasheet, write_datasheet

ROWS = [
    # (doc_id, text, source, lang, tokens)
    ("a", "one two three", "web", "en", [1, 2, 3]),
    ("b", "one two three", "web", "en", [1, 2, 3]),      # exact dup of a
    ("c", "ONE   two three ", "books", "en", [1, 2]),     # dup after normalize
    ("d", "vier funf", "web", "de", [4, 5]),
    ("e", None, "books", "de", None),                      # null text/tokens
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        ROWS,
        "doc_id string, text string, source string, lang string,"
        " tokens array<int>",
    )


def test_global_and_duplication_exact(corpus):
    sheet = corpus_datasheet(
        corpus,
        source_col="source",
        lang_col="lang",
        tokens_col="tokens",
        exact_dups=True,
    )
    c = sheet["corpus"]
    assert c["n_rows"] == 5
    assert c["n_docs_with_text"] == 4
    assert c["n_distinct_ids"] == 5
    assert c["total_chars"] == 13 + 13 + 16 + 9
    # fingerprints: a/b/c collapse to one normalized form, d its own
    d = sheet["duplication"]
    assert d["method"] == "exact"
    assert d["distinct_fingerprints"] == 2
    # rate among the 4 docs with text
    assert d["duplicate_rate"] == 0.5


def test_group_compositions(corpus):
    sheet = corpus_datasheet(corpus, source_col="source", lang_col="lang")
    src = {s["group"]: s for s in sheet["sources"]}
    assert src["web"]["n_docs"] == 3 and src["books"]["n_docs"] == 2
    assert src["web"]["share"] == 0.6
    langs = {s["group"]: s["n_docs"] for s in sheet["languages"]}
    assert langs == {"en": 3, "de": 2}
    # deterministic ordering: n_docs desc, group asc
    assert [s["group"] for s in sheet["sources"]] == ["web", "books"]


def test_max_groups_truncates(corpus):
    sheet = corpus_datasheet(corpus, source_col="source", max_groups=1)
    assert len(sheet["sources"]) == 1
    assert sheet["sources"][0]["group"] == "web"


def test_token_stats(corpus):
    sheet = corpus_datasheet(corpus, tokens_col="tokens")
    assert sheet["tokens"]["total_tokens"] == 3 + 3 + 2 + 2
    # avg over non-null arrays (Spark avg skips NULL size)
    assert sheet["tokens"]["avg_tokens_per_doc"] == 2.5


def test_hll_duplication_close(corpus):
    sheet = corpus_datasheet(corpus)
    d = sheet["duplication"]
    assert d["method"].startswith("hll")
    assert abs(d["distinct_fingerprints"] - 2) <= 1


def test_length_quantiles_and_roundtrip(corpus, tmp_path):
    sheet = corpus_datasheet(corpus)
    q = sheet["length_quantiles"]
    assert set(q) == {"measure", "p10", "p25", "p50", "p75", "p90", "p99"}
    assert q["measure"] == "n_chars"
    assert q["p10"] <= q["p50"] <= q["p99"]
    out = tmp_path / "sheet.json"
    write_datasheet(sheet, str(out))
    back = json.loads(out.read_text())
    assert back == sheet


def test_token_table_shape(spark):
    """The north-rule table has no text column: duplication falls back
    to token-array fingerprints, quantiles measure tokens."""
    rows = [
        ("a", [1, 2, 3], "web"),
        ("b", [1, 2, 3], "web"),   # exact token dup of a
        ("c", [4, 5], "books"),
        ("d", None, "books"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, source string"
    )
    sheet = corpus_datasheet(
        df, tokens_col="tokens", source_col="source", exact_dups=True
    )
    assert "avg_chars" not in sheet["corpus"]
    d = sheet["duplication"]
    assert d["fingerprint"] == "tokens"
    assert d["distinct_fingerprints"] == 2
    assert d["duplicate_rate"] == round(1 - 2 / 3, 6)  # among 3 with content
    assert sheet["tokens"]["total_tokens"] == 8
    assert sheet["length_quantiles"]["measure"] == "n_tok"
    assert sheet["length_quantiles"]["p50"] in (2, 3)


def test_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id string, text string")
    sheet = corpus_datasheet(df)
    assert sheet["corpus"]["n_rows"] == 0
    assert sheet["duplication"]["duplicate_rate"] == 0.0
