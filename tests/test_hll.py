"""HLL sketch operators (operators/hll.py): estimate-vs-exact
tolerance, merge == one-shot, cross-partition duplicate excess,
persisted-store resume == full recompute, runner integration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators import hll as H
from medea_ps_spark.sources import synthetic

# DataSketches HLL at lg_k=12 has ~1.6% relative standard error; use a
# generous 5% gate so the tests never flake on sketch variance.
TOL = 0.05


def _rel_err(est: float, exact: int) -> float:
    return abs(est - exact) / max(exact, 1)


@pytest.fixture(scope="module")
def seq_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("hllseq") / "sequences")
    df = synthetic.sequences(spark, 6_000, seed=11)
    df.write.mode("overwrite").partitionBy("source").parquet(p)
    return p


def test_group_sketches_estimate_within_tolerance(spark):
    df = synthetic.sequences(spark, 5_000, seed=3)
    sk = H.group_sketches(df, "doc_id", group_cols=("source",)).collect()
    exact = {
        r["source"]: r["n"]
        for r in df.groupBy("source")
        .agg(F.countDistinct("doc_id").alias("n"))
        .collect()
    }
    assert len(sk) == len(exact) > 1
    for r in sk:
        assert _rel_err(r["distinct_est"], exact[r["source"]]) < TOL


def test_merged_estimate_equals_one_shot(spark):
    df = synthetic.sequences(spark, 5_000, seed=7)
    merged = H.merged_estimate(H.group_sketches(df, "doc_id"))
    one_shot = H.merged_estimate(H.group_sketches(df, "doc_id", group_cols=()))
    # register max-merge: union of group sketches ≈ direct sketch (tiny
    # drift allowed for DataSketches' union target-type promotion)
    assert merged["distinct_est"] == pytest.approx(
        one_shot["distinct_est"], rel=0.02
    )
    exact = df.select("doc_id").distinct().count()
    assert _rel_err(merged["distinct_est"], exact) < TOL
    assert merged["n_rows"] == df.count()


def test_cross_partition_duplicates_surface_in_excess(spark):
    # two disjoint halves → excess ~0; duplicated half → excess ~n/2
    base = spark.range(0, 4_000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        (F.col("id") % 2).cast("string").alias("source"),
    )
    clean = H.merged_estimate(H.group_sketches(base, "doc_id"))
    assert abs(clean["cross_dup_excess"]) < TOL * 4_000
    dup = base.union(
        base.where(F.col("source") == "0").withColumn("source", F.lit("1"))
    )
    dirty = H.merged_estimate(H.group_sketches(dup, "doc_id"))
    assert dirty["cross_dup_excess"] > 2_000 * (1 - 2 * TOL)


def test_all_null_and_empty_groups(spark):
    df = spark.range(0, 100).select(
        F.lit(None).cast("string").alias("doc_id"),
        F.lit("a").alias("source"),
    )
    out = H.merged_estimate(H.group_sketches(df, "doc_id"))
    assert out["n_nonnull"] == 0
    assert out["distinct_est"] == pytest.approx(0.0)


def test_store_resume_matches_full_recompute(spark, seq_path, tmp_path):
    ck = str(tmp_path / "ck")
    df = spark.read.parquet(seq_path)
    parts = sorted(
        r["source"] for r in df.select("source").distinct().collect()
    )
    assert len(parts) > 2
    # "run 1" writes the first two partitions' sketches, "run 2" (after a
    # simulated kill) the rest — the store answer must equal a one-shot
    for i, p in enumerate(parts):
        pdf = df.where(F.col("source") == p)
        H.write_partition_sketch(pdf, "doc_id", ck, p)
        if i == 1:
            mid = H.store_uniqueness(spark, ck)
            assert mid["n_partitions"] == 2
    stored = H.store_uniqueness(spark, ck)
    full = H.merged_estimate(H.group_sketches(df, "doc_id"))
    assert stored["n_partitions"] == len(parts)
    assert stored["distinct_est"] == pytest.approx(
        full["distinct_est"], rel=0.02
    )
    assert stored["n_rows"] == full["n_rows"]
    # reprocessing one partition overwrites, never double-counts
    H.write_partition_sketch(
        df.where(F.col("source") == parts[0]), "doc_id", ck, parts[0]
    )
    again = H.store_uniqueness(spark, ck)
    assert again["distinct_est"] == pytest.approx(
        stored["distinct_est"], rel=1e-9
    )


def test_runner_writes_sketch_store(spark, seq_path, tmp_path):
    from medea_ps_spark.operators.runner import run_checkpointed_validation
    from medea_ps_spark.plans.constraints import ConstraintSet, NotNull
    from medea_ps_spark.plans.compiler import Registry

    reg = Registry().register(
        ConstraintSet("$start", (NotNull("nn", "doc_id"),))
    )
    ck = str(tmp_path / "ckr")
    res = run_checkpointed_validation(
        spark, seq_path, reg, ck,
        metrics_only=True, uniqueness_sketch_col="doc_id",
    )
    out = H.store_uniqueness(spark, ck)
    assert out["n_partitions"] == len(res) > 2
    exact = spark.read.parquet(seq_path).select("doc_id").distinct().count()
    assert _rel_err(out["distinct_est"], exact) < TOL
