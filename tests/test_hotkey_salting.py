"""Hot-key pre-split (VERDICT r3 #4): sessionize_salted and
asof_join_salted must (a) return BIT-IDENTICAL results to their
unsalted twins on adversarial data — boundary-exact gaps, merge chains
through empty buckets, null right payloads, ties — and (b) spread a
planted celebrity key across many tasks instead of one.

Spread evidence: both operators' final stage is co-partitioned on
(key, bucket), so spark_partition_id() on the output (before any
further shuffle) is the id of the task that processed the row; a hot
key spanning B buckets must appear in many distinct partitions, where
the unsalted operator by construction puts it in exactly one.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from medea_ps_spark.operators.asof import asof_join, asof_join_salted
from medea_ps_spark.operators.sessions import (
    SESSION_COL, TS_US_COL, sessionize, sessionize_salted,
)

US = 1_000_000
GAP_S = 100


def _hot_events(spark, n_hot=5000, n_cold_users=50):
    """One celebrity key with n_hot events over ~28 bucket-widths
    (deterministic pseudo-random inter-arrival 0..199s around the
    100s gap, so sessions break and merge adversarially — including
    exactly-at-gap boundaries), plus sparse cold users."""
    base = 1_700_000_000 * US
    hot = spark.range(n_hot).select(
        F.lit("celebrity").alias("user_id"),
        # xxhash-driven gaps land on 0..199s; cumulative via running sum
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(200)) * US).alias("_gap"),
        F.col("id"),
    )
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    hot = hot.select(
        "user_id", (F.lit(base) + F.sum("_gap").over(w)).alias("ts_us")
    )
    cold = spark.range(n_cold_users * 20).select(
        F.concat(F.lit("u"), (F.col("id") % n_cold_users)).alias("user_id"),
        (
            F.lit(base)
            + (F.col("id") * 37 % 5000) * US
            + (F.col("id") % 7) * 250 * US
        ).alias("ts_us"),
    )
    return hot.unionByName(cold).withColumn(
        "value", (F.crc32(F.concat_ws(":", "user_id", "ts_us")) % 100)
        .cast("double")
    )


@pytest.mark.parametrize("bucket_s", [150, 30, 1000])
def test_sessionize_salted_bit_identical(spark, bucket_s):
    """bucket > gap (normal), bucket < gap (sessions span many buckets,
    merge chains through EMPTY buckets), bucket >> gap (few merges)."""
    ev = _hot_events(spark, n_hot=2000).cache()
    want = sessionize(ev, GAP_S, ("user_id",), "ts_us").select(
        "user_id", "ts_us", TS_US_COL, SESSION_COL
    )
    got = sessionize_salted(
        ev, GAP_S, ("user_id",), "ts_us", bucket_seconds=bucket_s
    ).select("user_id", "ts_us", TS_US_COL, SESSION_COL)
    assert want.exceptAll(got).count() == 0
    assert got.exceptAll(want).count() == 0
    ev.unpersist()


@pytest.fixture()
def no_aqe(spark):
    """Pin the AT-SCALE plan shape for the spread probes: AQE coalesces
    the tiny test shuffles into one partition, and auto-broadcast flips
    the (huge at scale, tiny here) event side into the build side —
    either way the probe would measure test-scale artifacts instead of
    the operator's partitioning."""
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)


def test_sessionize_salted_spreads_hot_key(spark, no_aqe):
    ev = _hot_events(spark, n_hot=5000)
    out = sessionize_salted(
        ev, GAP_S, ("user_id",), "ts_us", bucket_seconds=GAP_S * 100
    ).withColumn("_pid", F.spark_partition_id())
    hot = out.where(F.col("user_id") == "celebrity")
    # keep SESSION_COL in the projection (pruning it would let Catalyst
    # drop the windows + (key, bucket) exchange) and count pids
    # CLIENT-SIDE from collected rows: spark_partition_id is
    # nondeterministic, and a distinct() probe can re-evaluate it after
    # its own exchange, measuring the wrong stage
    n_parts = len(
        {r["_pid"] for r in hot.select("_pid", SESSION_COL).collect()}
    )
    # ~5000 events * ~100s mean gap = ~500ks span / 10ks bucket ≈ 50
    # buckets over 8 shuffle partitions: expect full saturation
    assert n_parts >= 6, n_parts
    # and the unsalted operator concentrates the key in ONE task
    base = sessionize(ev, GAP_S, ("user_id",), "ts_us").withColumn(
        "_pid", F.spark_partition_id()
    )
    hot_base = base.where(F.col("user_id") == "celebrity")
    assert (
        len({r["_pid"] for r in hot_base.select("_pid", SESSION_COL).collect()})
        == 1
    )
    # plan gate: the local window partitions by (user_id, _bkt)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_bkt" in plan, plan


def _asof_sides(spark, n_hot=3000):
    base = 1_700_000_000 * US
    left = spark.range(n_hot).select(
        F.lit("celebrity").alias("user_id"),
        (F.lit(base) + F.col("id") * 61 * US).alias("ts_us"),
        F.col("id").alias("event_id"),
    )
    cold_l = spark.range(200).select(
        F.concat(F.lit("u"), (F.col("id") % 20)).alias("user_id"),
        (F.lit(base) + F.col("id") * 301 * US).alias("ts_us"),
        (F.col("id") + 1_000_000).alias("event_id"),
    )
    left = left.unionByName(cold_l)
    # sparse right side: some buckets have no right rows at all; null
    # payloads every 7th row exercise the per-column ignorenulls carry;
    # duplicate (user_id, ts) rows exercise the tiebreak
    right = spark.range(400).select(
        F.when(F.col("id") % 5 < 4, F.lit("celebrity"))
        .otherwise(F.concat(F.lit("u"), F.col("id") % 20))
        .alias("user_id"),
        (F.lit(base) + (F.col("id") % 200) * 997 * US).alias("ts_us"),
        F.when(
            F.col("id") % 7 != 0, (F.col("id") % 83).cast("double")
        ).alias("ref_value"),
        F.col("id").alias("rid"),
    )
    return left, right


@pytest.mark.parametrize("strict", [False, True])
def test_asof_salted_bit_identical(spark, strict):
    left, right = _asof_sides(spark)
    kwargs = dict(
        key_cols=["user_id"], time_col="ts_us", value_cols=["ref_value"],
        strict=strict, tiebreak_cols=["rid"],
    )
    want = asof_join(left, right, **kwargs)
    for bucket_us in (50_000 * US, 997 * US):
        got = asof_join_salted(
            left, right, bucket_width_us=bucket_us, **kwargs
        ).select(*want.columns)
        assert want.exceptAll(got).count() == 0, bucket_us
        assert got.exceptAll(want).count() == 0, bucket_us


def test_asof_salted_spreads_hot_key(spark, no_aqe):
    left, right = _asof_sides(spark, n_hot=5000)
    out = asof_join_salted(
        left, right, key_cols=["user_id"], time_col="ts_us",
        value_cols=["ref_value"], bucket_width_us=5_000 * US,
        tiebreak_cols=["rid"],
    ).withColumn("_pid", F.spark_partition_id())
    # keep the asof output column (so the carry windows aren't pruned)
    # and count pids client-side — see the sessionize spread test
    n_parts = len(
        {
            r["_pid"]
            for r in out.where(F.col("user_id") == "celebrity")
            .select("_pid", "ref_value_asof")
            .collect()
        }
    )
    # 5000 events * 61s spacing = 305ks span / 5ks bucket ≈ 61 buckets
    assert n_parts >= 6, n_parts
    base = asof_join(
        left, right, key_cols=["user_id"], time_col="ts_us",
        value_cols=["ref_value"], tiebreak_cols=["rid"],
    ).withColumn("_pid", F.spark_partition_id())
    assert (
        len(
            {
                r["_pid"]
                for r in base.where(F.col("user_id") == "celebrity")
                .select("_pid", "ref_value_asof")
                .collect()
            }
        )
        == 1
    )
