"""Round-5 operators: snapshot table_diff, hashed-feature quality
classifier, incremental (batch-vs-corpus) dedup."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row, functions as F

from medea_ps_spark.operators.dedup import incremental_dedup
from medea_ps_spark.operators.qualitymodel import (
    WEIGHT_SCALE,
    quality_filter,
    quality_score,
)
from medea_ps_spark.operators.tablediff import diff_summary, table_diff


# -- table_diff ----------------------------------------------------------------


def _snapshots(spark):
    old = spark.createDataFrame(
        [
            Row(k=1, a="x", b=10),
            Row(k=2, a="y", b=20),
            Row(k=3, a="z", b=30),
            Row(k=4, a=None, b=40),
            Row(k=5, a="w", b=None),
        ]
    )
    new = spark.createDataFrame(
        [
            Row(k=1, a="x", b=10),      # identical → absent from diff
            Row(k=2, a="Y", b=21),      # changed a AND b
            # k=3 removed
            Row(k=4, a=None, b=40),     # null == null → identical
            Row(k=5, a="w", b=99),      # null → value = changed b
            Row(k=6, a="new", b=60),    # added
        ]
    )
    return old, new


def test_table_diff_detail(spark):
    old, new = _snapshots(spark)
    got = {
        r["k"]: (r["change"], r["changed_cols"])
        for r in table_diff(old, new, ["k"]).collect()
    }
    assert got == {
        2: ("changed", "a,b"),
        3: ("removed", ""),
        5: ("changed", "b"),
        6: ("added", ""),
    }


def test_table_diff_hash_mode_same_keys(spark):
    old, new = _snapshots(spark)
    detail = table_diff(old, new, ["k"], mode="detail")
    hashed = table_diff(old, new, ["k"], mode="hash")
    d = {(r["k"], r["change"]) for r in detail.collect()}
    h = {(r["k"], r["change"]) for r in hashed.collect()}
    assert d == h
    assert all(r["changed_cols"] == "" for r in hashed.collect())


def test_table_diff_compare_col_subset(spark):
    old, new = _snapshots(spark)
    # only column a compared: k=5 (b-only change) drops out of the diff
    got = {r["k"]: r["change"] for r in table_diff(old, new, ["k"], ["a"]).collect()}
    assert got == {2: "changed", 3: "removed", 6: "added"}


def test_diff_summary(spark):
    old, new = _snapshots(spark)
    s = {
        r["change"]: r["n_keys"]
        for r in diff_summary(table_diff(old, new, ["k"])).collect()
    }
    assert s == {"added": 1, "removed": 1, "changed": 2}


# -- quality model -------------------------------------------------------------


def _expected_weight(feature: str) -> int:
    lane = int(hashlib.md5(feature.encode()).hexdigest()[:15], 16)
    return lane % WEIGHT_SCALE - WEIGHT_SCALE // 2


def test_quality_score_matches_reference_hash(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="Alpha  beta GAMMA")])
    row = quality_score(df).collect()[0]
    feats = ["alpha", "beta", "gamma", "alpha beta", "beta gamma"]
    assert row["n_features"] == len(feats)
    assert row["score_milli"] == sum(_expected_weight(f) for f in feats)
    assert row["quality_label"] == (
        "keep" if row["score_milli"] >= 0 else "drop"
    )


def test_quality_score_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text=""), Row(doc_id=2, text="   "), Row(doc_id=3, text=None)]
    )
    for r in quality_score(df).collect():
        assert r["n_features"] == 0
        assert r["score_milli"] == 0
        assert r["quality_label"] == "drop"


def test_quality_filter_agrees_with_labels(spark):
    docs = [Row(doc_id=i, text=f"doc number {i} with words w{i} q{i*7}") for i in range(40)]
    df = spark.createDataFrame(docs)
    labels = {
        r["doc_id"]: r["quality_label"]
        for r in quality_score(df, threshold_milli=50).collect()
    }
    kept = {r["doc_id"] for r in quality_filter(df, threshold_milli=50).collect()}
    assert kept == {i for i, l in labels.items() if l == "keep"}
    assert 0 < len(kept) < len(docs)  # threshold actually separates


# -- incremental dedup ---------------------------------------------------------


def test_incremental_dedup(spark):
    corpus = spark.createDataFrame(
        [Row(doc_id=i, text=f"corpus text {i}") for i in range(10)]
    )
    batch = spark.createDataFrame(
        [
            Row(doc_id=100, text="Corpus  Text 3"),   # normalizes to corpus dup
            Row(doc_id=101, text="brand new one"),
            Row(doc_id=102, text="BRAND NEW ONE"),    # within-batch dup of 101
            Row(doc_id=103, text="another fresh doc"),
        ]
    )
    got = {r["doc_id"] for r in incremental_dedup(batch, corpus).collect()}
    assert got == {101, 103}


def test_incremental_dedup_empty_batch_and_disjoint(spark):
    corpus = spark.createDataFrame(
        [Row(doc_id=i, text=f"corpus text {i}") for i in range(5)]
    )
    empty = corpus.where(F.lit(False))
    assert incremental_dedup(empty, corpus).count() == 0
    disjoint = spark.createDataFrame(
        [Row(doc_id=50, text="x"), Row(doc_id=51, text="y")]
    )
    assert incremental_dedup(disjoint, corpus).count() == 2


def test_quality_score_trained_weights(spark):
    from medea_ps_spark.operators.qualitymodel import quality_score_trained

    df = spark.createDataFrame(
        [Row(doc_id=1, text="good good story"), Row(doc_id=2, text="spam junk")]
    )
    w = {"good": 400, "story": 100, "good good": 50, "spam": -400, "junk": -300}
    rows = {r["doc_id"]: r for r in quality_score_trained(df, w).collect()}
    # doc 1 feats: good, good, story, "good good", "good story"(default 0)
    assert rows[1]["n_features"] == 5
    assert rows[1]["score_milli"] == 400 + 400 + 100 + 50 + 0
    assert rows[1]["quality_label"] == "keep"
    # doc 2 feats: spam, junk, "spam junk"(default 0)
    assert rows[2]["score_milli"] == -700
    assert rows[2]["quality_label"] == "drop"


def test_schema_diff_all_change_kinds(spark):
    from medea_ps_spark.operators.tablediff import schema_diff

    old = spark.createDataFrame(
        [], "a int, b string, c array<int>, d double, e int"
    )
    new_df = spark.createDataFrame(
        [], "a bigint, b string, c array<string>, f string, e int"
    )
    # force a nullability difference on e
    from pyspark.sql.types import (
        IntegerType, StructField, StructType, StringType, LongType, ArrayType, DoubleType,
    )
    new_schema = StructType([
        StructField("a", LongType()),
        StructField("b", StringType()),
        StructField("c", ArrayType(StringType())),
        StructField("f", StringType()),
        StructField("e", IntegerType(), nullable=False),
    ])
    new_df = spark.createDataFrame([], new_schema)
    got = {d["column"]: d for d in schema_diff(old, new_df)}
    assert got["a"]["change"] == "type_changed" and got["a"]["new"] == "bigint"
    assert got["c"]["change"] == "type_changed"  # nested element change
    assert got["d"]["change"] == "removed"
    assert got["f"]["change"] == "added"
    assert got["e"]["change"] == "nullability_changed"
    assert "b" not in got
    assert schema_diff(old, old) == []
    # nested nullability (array containsNull) — invisible to
    # simpleString, must still be caught
    s1 = StructType([StructField("c", ArrayType(IntegerType(), containsNull=False))])
    s2 = StructType([StructField("c", ArrayType(IntegerType(), containsNull=True))])
    nested = schema_diff(
        spark.createDataFrame([], s1), spark.createDataFrame([], s2)
    )
    assert [d["change"] for d in nested] == ["nullability_changed"]
