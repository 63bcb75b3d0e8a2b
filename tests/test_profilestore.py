"""Profile store (operators/profilestore.py): merged histogram counts
== one-shot global histogram (exact), store quantiles vs exact within
t-digest tolerance, stats fold exactness, resume/append == full,
store-as-ReferenceProfile drift detection, runner integration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators import drift as DR
from medea_ps_spark.operators import profilestore as P
from medea_ps_spark.operators.sketches import histogram, token_histogram
from medea_ps_spark.sources import synthetic

SPECS = {
    "ntok": {"column": "n_tok", "lo": 0.0, "hi": 600.0, "nbuckets": 32},
    "tokvals": {"token_array": "tokens", "lo": 0.0, "hi": 50257.0, "nbuckets": 16},
}


@pytest.fixture(scope="module")
def seq_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("prof") / "sequences")
    synthetic.sequences(spark, 5_000, seed=17).write.mode("overwrite").partitionBy(
        "source"
    ).parquet(p)
    return p


@pytest.fixture(scope="module")
def store(spark, seq_path, tmp_path_factory):
    ck = str(tmp_path_factory.mktemp("prof_ck"))
    df = spark.read.parquet(seq_path)
    for r in df.select("source").distinct().collect():
        P.write_partition_profile(
            df.where(F.col("source") == r["source"]), SPECS, ck, r["source"]
        )
    return ck


def test_merged_counts_equal_one_shot_histogram(spark, seq_path, store):
    df = spark.read.parquet(seq_path)
    g = P.global_profile(spark, store)
    one_ntok = DR._counts_vector(histogram(df, "n_tok", 0.0, 600.0, 32), 32)
    assert g["ntok"]["counts"] == [int(x) for x in one_ntok]
    one_tok = DR._counts_vector(token_histogram(df, "tokens", 50257, 16), 16)
    assert g["tokvals"]["counts"] == [int(x) for x in one_tok]
    assert g["ntok"]["n_partitions"] == g["tokvals"]["n_partitions"] > 2


def test_stats_fold_exact_and_quantiles_close(spark, seq_path, store):
    df = spark.read.parquet(seq_path)
    g = P.global_profile(spark, store)["ntok"]
    exact = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("n_tok").alias("mn"),
        F.max("n_tok").alias("mx"),
        F.sum("n_tok").alias("sm"),
    ).collect()[0]
    assert g["n_rows"] == exact["n"]
    assert g["col_min"] == exact["mn"] and g["col_max"] == exact["mx"]
    assert g["col_sum"] == pytest.approx(float(exact["sm"]))
    qs = [0.1, 0.5, 0.9]
    got = dict(P.quantiles_from_store(spark, store, "ntok", qs))
    want = dict(
        zip(qs, (float(x) for x in df.stat.approxQuantile("n_tok", qs, 0.001)))
    )
    span = exact["mx"] - exact["mn"]
    for q in qs:
        assert abs(got[q] - want[q]) < 0.05 * span


def test_partial_store_plus_append_equals_full(spark, seq_path, store):
    parts = sorted(
        r["source"]
        for r in spark.read.parquet(seq_path).select("source").distinct().collect()
    )
    half = parts[: len(parts) // 2]
    g_half = P.global_profile(spark, store, partitions=half)["ntok"]
    g_full = P.global_profile(spark, store)["ntok"]
    assert g_half["n_rows"] < g_full["n_rows"]
    assert sum(g_half["counts"]) == g_half["n_rows"] - g_half["n_null"]
    # overwrite-idempotent: rewriting one partition changes nothing
    df = spark.read.parquet(seq_path)
    P.write_partition_profile(
        df.where(F.col("source") == parts[0]), SPECS, store, parts[0]
    )
    again = P.global_profile(spark, store)["ntok"]
    assert again["counts"] == g_full["counts"]
    assert again["n_rows"] == g_full["n_rows"]


def test_store_as_reference_profile_drives_drift(spark, seq_path, store):
    df = spark.read.parquet(seq_path)
    prof = P.store_reference_profile(spark, store)
    clean = df.limit(1500)
    ok = DR.chi2_drift(clean, prof, "ntok")
    assert ok["pvalue"] > 0.01  # same distribution: no drift flagged
    shifted = df.limit(1500).withColumn("n_tok", F.col("n_tok") * 3)
    bad = DR.chi2_drift(shifted, prof, "ntok")
    assert bad["pvalue"] < 1e-6  # 3x-scaled n_tok: drift


def test_runner_writes_profile_store(spark, seq_path, tmp_path):
    from medea_ps_spark.operators.runner import run_checkpointed_validation
    from medea_ps_spark.plans.compiler import Registry
    from medea_ps_spark.plans.constraints import ConstraintSet, NotNull

    reg = Registry().register(
        ConstraintSet("$start", (NotNull("nn", "doc_id"),))
    )
    ck = str(tmp_path / "ck")
    res = run_checkpointed_validation(
        spark, seq_path, reg, ck, metrics_only=True,
        profile_specs={"ntok": SPECS["ntok"]},
    )
    g = P.global_profile(spark, ck)["ntok"]
    assert g["n_partitions"] == len(res) > 2
    assert g["n_rows"] == sum(m["n_rows"] for m in res.values())
