"""Deterministic hash sampling + sequence packing + repetition signals.

These are training-data-pipeline primitives whose whole value is
determinism under distribution: the SAME rows must be selected / the
SAME chunk layout produced regardless of partition layout, cluster
size, or rerun — properties df.sample() and RNG-based packing lack.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators.packing import pack_assignments, pack_summary
from medea_ps_spark.operators.sampling import (
    rate_threshold,
    sample_deterministic,
    stratified_mixture,
    train_holdout_split,
)


def _docs(spark, n=4000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
        ((F.xxhash64("id") % 400 + 400) % 400 + 16).alias("n_tok"),
    )


def test_sample_rate_and_determinism_under_layout(spark):
    df = _docs(spark)
    s1 = {r["doc_id"] for r in sample_deterministic(df, 0.3, seed=5).collect()}
    # repartitioning must not change membership (df.sample would)
    s2 = {
        r["doc_id"]
        for r in sample_deterministic(df.repartition(17), 0.3, seed=5).collect()
    }
    assert s1 == s2
    assert abs(len(s1) / 4000 - 0.3) < 0.03
    # different seed -> different (but valid-size) sample
    s3 = {r["doc_id"] for r in sample_deterministic(df, 0.3, seed=6).collect()}
    assert s3 != s1


def test_sample_nested_subsets(spark):
    """rate 0.1 ⊂ rate 0.3 ⊂ rate 0.6 at the same seed — the property
    scaling-law ladders need."""
    df = _docs(spark)
    sets = [
        {r["doc_id"] for r in sample_deterministic(df, rate, seed=9).collect()}
        for rate in (0.1, 0.3, 0.6)
    ]
    assert sets[0] <= sets[1] <= sets[2]


def test_sample_edge_rates_and_threshold(spark):
    df = _docs(spark, 100)
    assert sample_deterministic(df, 1.0).count() == 100
    assert sample_deterministic(df, 0.0).count() == 0
    with pytest.raises(ValueError):
        rate_threshold(1.5)
    assert rate_threshold(0.5) == format(int(0.5 * 16 ** 8), "08x")


def test_stratified_mixture_rates(spark):
    df = _docs(spark, 8000)
    samp = stratified_mixture(
        df, {"src0": 1.0, "src1": 0.5, "src3": 0.0},
        strat_col="source", default_rate=0.25, seed=3,
    )
    got = {
        r["source"]: r["n"]
        for r in samp.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert got["src0"] == 2000  # rate 1.0 keeps everything
    assert abs(got["src1"] / 2000 - 0.5) < 0.06
    assert "src3" not in got  # rate 0.0 keeps nothing
    assert abs(got["src2"] / 2000 - 0.25) < 0.06  # default rate


def test_train_holdout_split_disjoint_exhaustive(spark):
    df = _docs(spark)
    train, hold = train_holdout_split(df, holdout_frac=0.1, seed=21)
    t = {r["doc_id"] for r in train.collect()}
    h = {r["doc_id"] for r in hold.collect()}
    assert not (t & h)
    assert len(t) + len(h) == 4000
    assert abs(len(h) / 4000 - 0.1) < 0.03
    # stable membership on rerun (decontamination safety)
    _, hold2 = train_holdout_split(df.repartition(7), holdout_frac=0.1, seed=21)
    assert {r["doc_id"] for r in hold2.collect()} == h


def test_pack_assignments_chunk_invariants(spark):
    df = _docs(spark, 3000)
    asg = pack_assignments(df, max_tokens=4096, shard_chars=1).cache()
    rows = asg.collect()
    # every doc assigned exactly once
    assert len(rows) == 3000
    # reconstruct each shard's stream: offsets must tile the token
    # stream contiguously in order (no gaps, no overlaps)
    by_shard = {}
    for r in rows:
        by_shard.setdefault((r["source"], r["shard"]), []).append(r)
    for key, docs in by_shard.items():
        docs.sort(key=lambda r: r["pack_id"] * 4096 + r["pack_offset"])
        pos = 0
        for d in docs:
            start = d["pack_id"] * 4096 + d["pack_offset"]
            assert start == pos, (key, d)
            end = pos + d["n_tok"] - 1
            assert d["n_chunks_spanned"] == end // 4096 - d["pack_id"] + 1
            pos += d["n_tok"]
    # layout independence: same assignment after a repartition
    asg2 = pack_assignments(df.repartition(13), max_tokens=4096, shard_chars=1)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, asg2.collect()))
    asg.unpersist()


def test_pack_summary_conserves_tokens(spark):
    df = _docs(spark, 2000)
    asg = pack_assignments(df, max_tokens=2048)
    summ = pack_summary(asg)
    total = df.agg(F.sum("n_tok")).collect()[0][0]
    got = summ.agg(
        F.sum("pack_tokens").alias("tok"), F.sum("n_docs").alias("docs")
    ).collect()[0]
    assert got["tok"] == total
    assert got["docs"] == 2000
    # chunks are full by construction: every pack except each shard's
    # last must span to (or past) the chunk boundary
    per_shard_max = {
        (r["source"], r["shard"]): r["m"]
        for r in summ.groupBy("source", "shard")
        .agg(F.max("pack_id").alias("m"))
        .collect()
    }
    for r in summ.collect():
        if r["pack_id"] < per_shard_max[(r["source"], r["shard"])]:
            assert r["pack_tokens"] >= 1  # non-empty interior chunk


def test_pack_rejects_bad_max_tokens(spark):
    with pytest.raises(ValueError):
        pack_assignments(_docs(spark, 10), max_tokens=0)


def test_repetition_features_hand_computed(spark):
    from medea_ps_spark.operators.textquality import repetition_features

    rows = [
        ("all_same", "spam spam spam spam"),
        ("all_distinct", "alpha beta gamma delta"),
        ("half", "red blue red blue"),
        ("empty", "   "),
        ("one", "word"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r for r in repetition_features(df).collect()}
    assert got["all_same"]["dup_word_frac"] == pytest.approx(0.75)
    # bigrams: [spam spam] x3 -> 1 distinct of 3
    assert got["all_same"]["dup_bigram_frac"] == pytest.approx(2 / 3)
    assert got["all_distinct"]["dup_word_frac"] == 0.0
    assert got["all_distinct"]["dup_bigram_frac"] == 0.0
    # red blue red blue: 2 distinct of 4 words; bigrams [red blue,
    # blue red, red blue] -> 2 distinct of 3
    assert got["half"]["dup_word_frac"] == pytest.approx(0.5)
    assert got["half"]["dup_bigram_frac"] == pytest.approx(1 / 3)
    assert got["empty"]["n_words"] == 0
    assert got["empty"]["dup_word_frac"] == 0.0
    assert got["one"]["dup_bigram_frac"] == 0.0


def test_asof_join_hand_computed(spark):
    from medea_ps_spark.operators.asof import asof_join

    rights = spark.createDataFrame(
        [("u1", 10, 1.0, 100), ("u1", 20, 2.0, 101), ("u1", 20, 3.0, 102),
         ("u2", 5, 9.0, 103)],
        "k string, t bigint, v double, rid bigint",
    )
    lefts = spark.createDataFrame(
        [("u1", 9, "a"), ("u1", 10, "b"), ("u1", 25, "c"),
         ("u2", 4, "d"), ("u3", 99, "e")],
        "k string, t bigint, tag string",
    )
    out = asof_join(
        lefts, rights, ["k"], "t", ["v"], tiebreak_cols=["rid"]
    )
    got = {r["tag"]: r["v_asof"] for r in out.collect()}
    assert got["a"] is None        # nothing at-or-before t=9
    assert got["b"] == 1.0         # inclusive: right@10 visible at t=10
    assert got["c"] == 3.0         # tie at t=20 -> larger rid wins
    assert got["d"] is None
    assert got["e"] is None        # key with no right rows at all
    assert out.count() == 5        # left join: every left row survives

    strict = asof_join(
        lefts, rights, ["k"], "t", ["v"], strict=True,
        tiebreak_cols=["rid"],
    )
    gs = {r["tag"]: r["v_asof"] for r in strict.collect()}
    assert gs["b"] is None         # strict: right@10 NOT visible at t=10
    assert gs["c"] == 3.0


def test_asof_join_single_shuffle_no_join_node(spark):
    """The as-of implementation must be union + one keyed window - no
    range-join candidate explosion, no join operator at all."""
    from medea_ps_spark.operators.asof import asof_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value")
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", "value", "event_id")
    out = asof_join(clicks, views, ["user_id"], "ts", ["value"],
                    tiebreak_cols=["event_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_sessionize_hand_computed(spark):
    from medea_ps_spark.operators.sessions import session_stats, sessionize

    rows = [
        ("u1", 0.0, 1.0), ("u1", 100.0, 2.0),      # session 0
        ("u1", 2000.0, 4.0),                        # gap 1900 > 1800 -> s1
        ("u1", 3800.0, 8.0),                        # gap 1800 == gap -> s1 (inclusive, matches session_window)
        ("u1", 5601.0, 16.0),                       # gap 1801 > 1800 -> s2
        ("u2", 50.0, 32.0),                         # own key -> s0
    ]
    df = spark.createDataFrame(rows, "user_id string, t double, value double")
    # numeric time defaults to MICROS engine-wide; these fixtures are
    # seconds, so say so explicitly (ADVICE r3 unit-convention fix)
    sess = sessionize(df, gap_seconds=1800, key_cols=("user_id",),
                      time_col="t", numeric_unit="s")
    got = {(r["user_id"], int(r["t"])): r["session_id"] for r in sess.collect()}
    assert got == {
        ("u1", 0): 0, ("u1", 100): 0, ("u1", 2000): 1,
        ("u1", 3800): 1, ("u1", 5601): 2, ("u2", 50): 0,
    }
    stats = {
        (r["user_id"], r["session_id"]): r
        for r in session_stats(sess, key_cols=("user_id",)).collect()
    }
    s1 = stats[("u1", 1)]
    assert s1["n_events"] == 2
    assert s1["duration_us"] == int(1800 * 1e6)
    assert s1["value_sum"] == 12.0
    assert stats[("u1", 2)]["duration_us"] == 0


def test_sessionize_single_exchange(spark):
    """lag-flag and running-sum windows share (key, time-order): the
    plan must contain exactly one Exchange (and one Sort)."""
    from medea_ps_spark.operators.sessions import session_stats, sessionize

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = session_stats(sessionize(ev, 1800))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Sort ") <= 2, plan


def test_range_join_hand_computed(spark):
    from medea_ps_spark.operators.rangejoin import point_in_interval_join

    points = spark.createDataFrame(
        [("a", 5), ("b", 10), ("c", 99), ("d", 100), ("e", 250), ("f", 999)],
        "pid string, t bigint",
    )
    intervals = spark.createDataFrame(
        [(1, 0, 10), (2, 10, 99), (3, 90, 260)],
        "iid int, s bigint, e bigint",
    )
    got = {
        (r["pid"], r["iid"])
        for r in point_in_interval_join(
            points, intervals, "t", "s", "e", bucket_width=7
        ).collect()
    }
    # inclusive both ends; b lands in two intervals; f in none
    assert got == {
        ("a", 1), ("b", 1), ("b", 2), ("c", 2), ("c", 3), ("d", 3), ("e", 3),
    }
    # keyed variant: same axis values but different key -> no match
    pk = points.withColumn("k", F.lit("x"))
    ik = intervals.withColumn("k", F.lit("y"))
    assert point_in_interval_join(
        pk, ik, "t", "s", "e", bucket_width=7, keys=["k"]
    ).count() == 0


def test_range_join_no_nested_loop_and_guard(spark):
    import pytest as _pytest

    from medea_ps_spark.operators.rangejoin import point_in_interval_join

    points = spark.range(1000).select(F.col("id").alias("t"))
    intervals = spark.createDataFrame(
        [(1, 0, 100), (2, 500, 900)], "iid int, s bigint, e bigint"
    )
    j = point_in_interval_join(points, intervals, "t", "s", "e", 64)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert j.count() == 101 + 401
    # degenerate interval guard fails loudly instead of exploding
    wide = spark.createDataFrame([(1, 0, 10_000_000)], "iid int, s bigint, e bigint")
    with _pytest.raises(Exception, match="buckets"):
        point_in_interval_join(
            points, wide, "t", "s", "e", 64, max_buckets_per_interval=100
        ).count()


def test_kmv_distinct_accuracy_and_merge(spark):
    from medea_ps_spark.operators.sketches import (
        kmv_distinct_estimate,
        kmv_minima,
    )

    df = spark.range(20_000).select(
        (F.col("id") % 5_000).cast("string").alias("v")  # 5000 distinct, 4x dup
    )
    est = kmv_distinct_estimate(df, "v", k=256).collect()[0]
    assert est["k"] == 256
    assert abs(est["est_distinct"] - 5_000) / 5_000 < 0.2
    # mergeability: union of two halves' sketches == sketch of the union
    a = df.where(F.col("v").cast("int") < 2_500)
    b = df.where(F.col("v").cast("int") >= 1_000)  # overlapping halves
    merged = (
        kmv_minima(a, "v", 256).unionByName(kmv_minima(b, "v", 256))
        .distinct().orderBy("hx").limit(256)
    )
    direct = kmv_minima(df, "v", 256)
    assert [r["hx"] for r in merged.collect()] == [
        r["hx"] for r in direct.collect()
    ]


def test_time_rollup_consistency(spark):
    """Every grain must be an exact re-aggregation of the finer one,
    and the whole thing must come from ONE aggregation (grouping sets),
    not one scan per resolution."""
    from medea_ps_spark.operators.rollup import time_rollup

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = time_rollup(ev, ts_col="ts", value_col="value").cache()
    hours = out.where(F.col("grain") == "hour").collect()
    days = {r["day_us"]: r for r in out.where(F.col("grain") == "day").collect()}
    total = out.where(F.col("grain") == "total").collect()
    # day rows == sum of their hour rows
    agg = {}
    for h in hours:
        d = agg.setdefault(h["day_us"], [0, 0.0])
        d[0] += h["n_events"]
        d[1] += h["value_sum"]
    assert set(agg) == set(days)
    for day_us, (n, v) in agg.items():
        assert days[day_us]["n_events"] == n
        assert abs(days[day_us]["value_sum"] - v) < 1e-6
    # total == sum of days == raw count
    assert len(total) == 1
    assert total[0]["n_events"] == ev.count()
    out.unpersist()
    # single-pass: exactly one Exchange (the rollup agg's) on a fresh
    # (uncached, unexecuted) plan — the cache above would wrap it in an
    # InMemoryRelation that prints initial+final AQE plans twice
    fresh = time_rollup(ev, ts_col="ts", value_col="value")
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Expand" in plan  # grouping-set expansion, not multiple scans
    assert plan.count("FileScan") == 1, plan


def test_time_rollup_with_extra_keys(spark):
    from medea_ps_spark.operators.rollup import time_rollup

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = time_rollup(ev, extra_keys=("event_type",))
    per_key_totals = out.where(
        (F.col("grain") == "total") & F.col("event_type").isNotNull()
    ).collect()
    raw = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert {r["event_type"]: r["n_events"] for r in per_key_totals} == raw


def test_ts_micros_units(spark):
    from medea_ps_spark.operators.timeunits import ts_micros

    df = spark.createDataFrame(
        [(1.5, 1500, 1_500_000)], "s double, ms bigint, us bigint"
    )
    got = df.select(
        ts_micros(df, "s", numeric_unit="s").alias("a"),
        ts_micros(df, "ms", numeric_unit="ms").alias("b"),
        ts_micros(df, "us").alias("c"),
    ).collect()[0]
    assert got["a"] == got["b"] == got["c"] == 1_500_000
    import pytest as _pt
    with _pt.raises(ValueError):
        ts_micros(df, "s", numeric_unit="m")


def test_time_rollup_key_grouping_disambiguates_null_keys(spark):
    """A genuine NULL extra-key value vs the key's rolled-away level:
    indistinguishable by NULL-ness, separated by grouping_<k>."""
    from medea_ps_spark.operators.rollup import time_rollup

    base = 1_700_000_000 * 1_000_000
    ev = spark.createDataFrame(
        [(base, 1.0, "a"), (base + 1, 2.0, None)],
        "ts bigint, value double, src string",
    )
    out = time_rollup(ev, extra_keys=("src",), key_grouping=True).collect()
    # ROLLUP is hierarchical (src outermost), so src only rolls away at
    # the grand total — where a REAL null-src per-key total (grouping 0)
    # and the all-sources grand total (grouping 1) both show src=NULL
    null_total = [
        r for r in out if r["src"] is None and r["grain"] == "total"
    ]
    by_flag = {r["grouping_src"]: r for r in null_total}
    assert set(by_flag) == {0, 1}
    assert by_flag[0]["n_events"] == 1 and by_flag[0]["value_sum"] == 2.0
    assert by_flag[1]["n_events"] == 2 and by_flag[1]["value_sum"] == 3.0
    # and the null-src HOUR row is a real group, grouping 0
    hr = [r for r in out if r["src"] is None and r["grain"] == "hour"]
    assert len(hr) == 1 and hr[0]["grouping_src"] == 0


def test_salted_operators_reject_reserved_columns(spark):
    from medea_ps_spark.operators.asof import asof_join_salted
    from medea_ps_spark.operators.sessions import sessionize_salted

    df = spark.createDataFrame(
        [("u", 1, 0)], "user_id string, ts_us bigint, _bkt bigint"
    )
    with pytest.raises(ValueError, match="_bkt"):
        sessionize_salted(df, 10, ("user_id",), "ts_us")
    with pytest.raises(ValueError, match="_bkt"):
        asof_join_salted(df, df.selectExpr("user_id", "ts_us", "1.0 v"),
                         ["user_id"], "ts_us", ["v"], bucket_width_us=10)
