"""Unicode normalization operator (operators/textnorm.py): parity with
unicodedata, DuckDB nfc_normalize cross-check, idempotence, NULL
handling, and the map-only plan gate."""

import unicodedata

import duckdb
import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators import textnorm as TN

# composed/decomposed accents, ligatures, full-width digits, NBSP,
# zero-width chars, controls, CJK dakuten, emoji ZWJ sequence -- all
# via explicit escapes so the fixture is editor-proof
TRICKY = [
    "caf\u00e9 composed vs decomposed cafe\u0301",  # NFC vs e+U+0301
    "\ufb01le \ufb02ow ligatures",                  # fi/fl (NFKC-only)
    "\uff10\uff11\uff12 full-width digits",        # NFKC-only
    "non\u00a0breaking\u00a0space",                 # NBSP (NFKC -> space)
    "zero\u200bwidth\u200cchars\u200d here\u2060\ufeff",
    "ctrl\x00chars\x07kept\ttab\nnewline",
    "\u304c = \u304b\u3099 (dakuten)",             # NFC composes ka+dakuten
    "family: \U0001f468\u200d\U0001f469\u200d\U0001f467",
    "",
    None,
    "plain ascii stays put",
]


@pytest.fixture(scope="module")
def tricky_df(spark):
    rows = [(i, t) for i, t in enumerate(TRICKY)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.mark.parametrize("form", ["NFC", "NFKC"])
def test_matches_pure_python_reference(spark, tricky_df, form):
    got = {
        r["doc_id"]: r["out"]
        for r in TN.normalize_text(
            tricky_df, "text", out_col="out", form=form
        ).collect()
    }
    for i, t in enumerate(TRICKY):
        want = TN.python_reference_normalize(t, form=form)
        assert got[i] == want, (form, i, repr(t))


def test_squeeze_matches_reference(spark, tricky_df):
    messy = tricky_df.withColumn(
        "text", F.concat(F.lit("  x \t y\n\n\n\n z "), F.coalesce("text", F.lit("")))
    )
    got = {
        r["doc_id"]: r["out"]
        for r in TN.normalize_text(
            messy, "text", out_col="out", form="NFC", squeeze=True
        ).collect()
    }
    base = {r["doc_id"]: r["text"] for r in messy.collect()}
    for i, t in base.items():
        assert got[i] == TN.python_reference_normalize(t, form="NFC", squeeze=True)


def test_null_and_empty_passthrough(spark, tricky_df):
    out = {
        r["doc_id"]: r["text"]
        for r in TN.normalize_text(tricky_df, "text").collect()
    }
    assert out[8] == ""
    assert out[9] is None


def test_idempotent(spark, tricky_df):
    once = TN.normalize_text(tricky_df, "text", form="NFKC")
    twice = TN.normalize_text(once, "text", form="NFKC")
    a = [r["text"] for r in once.orderBy("doc_id").collect()]
    b = [r["text"] for r in twice.orderBy("doc_id").collect()]
    assert a == b


def test_duckdb_nfc_parity(spark, tricky_df):
    """DuckDB's nfc_normalize agrees with the Spark NFC path on the raw
    strings (no stripping — isolate the normalization step)."""
    ours = {
        r["doc_id"]: r["out"]
        for r in tricky_df.select(
            "doc_id",
            TN.unicode_normalize_col(F.col("text"), "NFC").alias("out"),
        ).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(TRICKY):
        if t is None:
            assert ours[i] is None
            continue
        want = con.execute("select nfc_normalize(?)", [t]).fetchone()[0]
        assert ours[i] == want, (i, repr(t))


def test_rejects_bad_form(spark, tricky_df):
    with pytest.raises(ValueError, match="form must be one of"):
        TN.normalize_text(tricky_df, "text", form="NFX")


def test_normalization_stats(spark, tricky_df):
    row = TN.normalization_stats(tricky_df, "text", form="NFC").collect()[0]
    # 10 non-null rows; NFC+strip changes the decomposed/zero-width/ctrl
    # rows but not plain ascii / empty
    assert row["n_rows"] == 10
    changed = sum(
        1
        for t in TRICKY
        if t is not None and TN.python_reference_normalize(t, "NFC") != t
    )
    assert row["n_changed"] == changed
    assert row["changed_frac"] == pytest.approx(changed / 10, abs=1e-6)
    assert 0 < row["n_nonascii"] < 10


def test_plan_is_map_only(spark, tricky_df):
    df = TN.normalize_text(tricky_df, "text", form="NFC", squeeze=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan          # no shuffle
    assert "ArrowEvalPython" in plan       # vectorized, not BatchEvalPython
    assert "BatchEvalPython" not in plan
