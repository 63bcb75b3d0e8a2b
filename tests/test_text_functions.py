"""Coverage for the two operators folded out of the driver registry in
round-5 session 16 (text_token_stats → text_extract_html,
events_user_skew → vocab_truncate): token counting stats and the
key-skew diagnostic keep their signal here; the q_ entries stay
callable in __spark_entry__.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from medea_ps_spark.functions.text import (
    regex_token_count,
    token_count,
    whitespace_tokens,
)
from medea_ps_spark.operators.stats import skew_report


def test_token_count_semantics(spark):
    rows = [
        ("a", "one two three"),
        ("b", "  spaced   out  words "),
        ("c", ""),
        ("d", "single"),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    got = {
        r["id"]: (r["n"], r["rx"])
        for r in df.select(
            "id",
            token_count(F.col("text")).alias("n"),
            regex_token_count(F.col("text")).alias("rx"),
        ).collect()
    }
    assert got["a"] == (3, 3)
    assert got["b"][0] == 3  # whitespace runs collapse
    assert got["c"] == (0, 0)  # empty string is NOT one token
    assert got["d"] == (1, 1)
    # regex tokenizer splits punctuation runs off words
    rx = df.where(F.col("id") == "a").select(
        regex_token_count(F.lit("don't stop, now!")).alias("n")
    ).collect()[0]["n"]
    assert rx == 7  # don / ' / t / stop / , / now / !


def test_whitespace_tokens_empty_is_empty_array(spark):
    row = spark.range(1).select(
        whitespace_tokens(F.lit("")).alias("e"),
        whitespace_tokens(F.lit(" a b ")).alias("ab"),
    ).collect()[0]
    assert row["e"] == []
    assert row["ab"] == ["a", "b"]


def test_skew_report(spark):
    rows = (
        [("hot",)] * 6 + [("warm",)] * 3 + [("cool",)] * 1
    )
    df = spark.createDataFrame(rows, "user_id string")
    got = {
        r["key"]: r.asDict() for r in skew_report(df, "user_id", top_n=2).collect()
    }
    assert set(got) == {"hot", "warm"}  # top_n truncates
    assert got["hot"]["n_rows"] == 6 and got["hot"]["rank"] == 1
    assert got["hot"]["share"] == 0.6
    assert got["warm"]["n_rows"] == 3 and got["warm"]["rank"] == 2
    assert got["warm"]["share"] == 0.3


def test_skew_report_tiebreak_is_deterministic(spark):
    df = spark.createDataFrame(
        [("b",), ("a",), ("c",), ("a",), ("b",), ("c",)], "user_id string"
    )
    ranks = {
        r["key"]: r["rank"] for r in skew_report(df, "user_id", top_n=3).collect()
    }
    # equal counts: key asc breaks the tie
    assert ranks == {"a": 1, "b": 2, "c": 3}
