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


# -- round-5 additions: NULL retention, tie determinism, seeded fuzz --

_NULL_SCHEMA = "user_id string, ts_us long, value double"


def _null_rows():
    """Adversarial null layout: NULL keys with real times, real keys
    with NULL times, a row with both NULL, equal-ts bursts on both —
    the cases ADVICE r4 flagged as silently dropped by a non-null-safe
    stitch join."""
    base = 1_700_000_000 * US
    rows = []
    for uid in ("a", "b", None):
        t = base
        for i in range(40):
            t += (i * 37 % 250) * US  # includes 0-gaps (equal-ts burst)
            rows.append((uid, t, float(i % 7)))
        rows.append((uid, None, 1.0))  # NULL time
        rows.append((uid, None, None))
    rows.append((None, None, None))
    return rows


@pytest.mark.parametrize("bucket_s", [30, 150])
def test_sessionize_salted_retains_null_keys_and_times(spark, bucket_s):
    ev = spark.createDataFrame(_null_rows(), _NULL_SCHEMA)
    want = sessionize(ev, GAP_S, ("user_id",), "ts_us").select(
        "user_id", "ts_us", "value", SESSION_COL
    )
    got = sessionize_salted(
        ev, GAP_S, ("user_id",), "ts_us", bucket_seconds=bucket_s
    ).select("user_id", "ts_us", "value", SESSION_COL)
    # no row lost: the stitch join is null-safe
    assert got.count() == ev.count()
    assert want.exceptAll(got).count() == 0
    assert got.exceptAll(want).count() == 0


def test_asof_salted_retains_null_keys_and_times(spark):
    base = 1_700_000_000 * US
    left = spark.createDataFrame(
        [(u, base + i * 61 * US if i % 9 else None, float(i))
         for u in ("a", None) for i in range(60)],
        "user_id string, ts_us long, lv double",
    )
    right = spark.createDataFrame(
        [(u, base + (i % 20) * 997 * US if i % 5 else None,
          float(i % 13) if i % 7 else None, i)
         for u in ("a", None) for i in range(25)],
        "user_id string, ts_us long, ref_value double, rid int",
    )
    kwargs = dict(key_cols=["user_id"], time_col="ts_us",
                  value_cols=["ref_value"], tiebreak_cols=["rid"])
    want = asof_join(left, right, **kwargs)
    got = asof_join_salted(
        left, right, bucket_width_us=5_000 * US, **kwargs
    ).select(*want.columns)
    assert got.count() == left.count()
    assert want.exceptAll(got).count() == 0
    assert got.exceptAll(want).count() == 0


def test_sessionize_duplicate_ts_ids_deterministic(spark):
    """VERDICT r4 #5: planted duplicate-timestamp events — session ids
    must be stable regardless of input partitioning/order (membership
    depends only on the previous DISTINCT time), and tiebreak_cols is
    accepted for row-order determinism."""
    base = 1_700_000_000 * US
    rows = []
    eid = 0
    for u in ("a", "b"):
        t = base
        for burst in range(6):
            t += (GAP_S * US * 2 if burst % 2 else 10 * US)
            for _ in range(4):  # 4 events at the SAME microsecond
                rows.append((u, t, eid))
                eid += 1
    ev = spark.createDataFrame(rows, "user_id string, ts_us long, event_id long")
    a = sessionize(
        ev, GAP_S, ("user_id",), "ts_us", tiebreak_cols=("event_id",)
    ).select("user_id", "event_id", SESSION_COL)
    b = sessionize(
        ev.repartition(7, "event_id"), GAP_S, ("user_id",), "ts_us",
        tiebreak_cols=("event_id",),
    ).select("user_id", "event_id", SESSION_COL)
    c = sessionize_salted(
        ev.orderBy(F.desc("event_id")), GAP_S, ("user_id",), "ts_us",
        bucket_seconds=GAP_S, tiebreak_cols=("event_id",),
    ).select("user_id", "event_id", SESSION_COL)
    ra = {(r[0], r[1]): r[2] for r in a.collect()}
    rb = {(r[0], r[1]): r[2] for r in b.collect()}
    rc = {(r[0], r[1]): r[2] for r in c.collect()}
    assert ra == rb == rc
    # equal-time events always share a session
    burst_ids = {}
    for (u, e), sid in ra.items():
        burst_ids.setdefault((u, e // 4), set()).add(sid)
    assert all(len(s) == 1 for s in burst_ids.values())


def test_salted_twins_fuzz_bit_identity(spark):
    """VERDICT r4 #7: seeded randomized sweep over gap/bucket combos
    (incl. bucket << gap), equal-ts bursts, null keys/times/payloads —
    ~100 generated key-cases per operator family, asserting exact
    bit-identity between the salted and unsalted twins (the fuzz
    analogue of test_parser_fuzz)."""
    import random

    rng = random.Random(0xC0FFEE)
    base = 1_700_000_000 * US

    for case in range(6):
        gap_s = rng.choice([5, 60, 100])
        bucket_s = rng.choice([1, max(1, gap_s // 2), gap_s * 3, gap_s * 100])
        rows = []
        for k in range(16):  # 6 sweeps x 16 keys ≈ 96 key-cases
            uid = None if k == 15 else f"k{k}"
            t = base + rng.randrange(0, 10**6)
            for _ in range(rng.randrange(1, 50)):
                r = rng.random()
                if r < 0.05:
                    rows.append((uid, None, None))
                    continue
                if r > 0.25:  # 75%: advance; else equal-ts burst
                    t += rng.randrange(0, gap_s * 3 * US + 1)
                rows.append((uid, t,
                             None if rng.random() < 0.1
                             else float(rng.randrange(100))))
        ev = spark.createDataFrame(rows, _NULL_SCHEMA).repartition(5)
        want = sessionize(ev, gap_s, ("user_id",), "ts_us").select(
            "user_id", "ts_us", "value", SESSION_COL
        )
        got = sessionize_salted(
            ev, gap_s, ("user_id",), "ts_us", bucket_seconds=bucket_s
        ).select("user_id", "ts_us", "value", SESSION_COL)
        label = f"case={case} gap={gap_s} bucket={bucket_s}"
        assert want.exceptAll(got).count() == 0, label
        assert got.exceptAll(want).count() == 0, label

    for case in range(4):
        strict = rng.random() < 0.5
        bucket_us = rng.choice([7 * US, 997 * US, 50_000 * US])
        lrows, rrows = [], []
        for k in range(12):
            uid = None if k == 11 else f"k{k}"
            for i in range(rng.randrange(1, 25)):
                ts = (None if rng.random() < 0.05
                      else base + rng.randrange(0, 200_000) * US)
                lrows.append((uid, ts, float(len(lrows))))
            for i in range(rng.randrange(0, 10)):
                ts = (None if rng.random() < 0.05
                      else base + rng.randrange(0, 200) * 997 * US)
                rrows.append((uid, ts,
                              None if rng.random() < 0.2
                              else float(rng.randrange(83)),
                              len(rrows)))
        left = spark.createDataFrame(
            lrows, "user_id string, ts_us long, lv double"
        ).repartition(5)
        right = spark.createDataFrame(
            rrows, "user_id string, ts_us long, ref_value double, rid int"
        ).repartition(5)
        kwargs = dict(key_cols=["user_id"], time_col="ts_us",
                      value_cols=["ref_value"], strict=strict,
                      tiebreak_cols=["rid"])
        want = asof_join(left, right, **kwargs)
        got = asof_join_salted(
            left, right, bucket_width_us=bucket_us, **kwargs
        ).select(*want.columns)
        label = f"case={case} strict={strict} bucket={bucket_us}"
        assert want.exceptAll(got).count() == 0, label
        assert got.exceptAll(want).count() == 0, label
