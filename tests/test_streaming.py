"""Structured-Streaming validation tests (rate source + file source,
availableNow trigger so tests are bounded)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.plans.compiler import Registry
from medea_ps_spark.plans.constraints import ConstraintSet, InRange, NotNull, SizeEquals
from medea_ps_spark.streaming.validate_stream import (
    run_foreach_batch,
    windowed_violation_counts,
)
from medea_ps_spark.sources import synthetic


@pytest.fixture(scope="module")
def stream_input(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("stream") / "in")
    df = synthetic.sequences(spark, 2_000, seed=9).withColumn(
        "ts", F.timestamp_seconds(F.lit(1700000000) + F.pmod(F.xxhash64("doc_id"), F.lit(600)))
    )
    df.write.mode("overwrite").parquet(p)
    return p, df.schema


def _compiled(schema):
    reg = Registry()
    reg.register(
        ConstraintSet(
            "$start",
            [
                NotNull("doc_id_not_null", "doc_id"),
                SizeEquals("n_tok_matches", "n_tok", "tokens"),
                InRange("n_tok_bounds", "n_tok", 1, synthetic.MAX_LEN),
            ],
        )
    )
    return reg.compile(schema)


def test_foreach_batch_validation(spark, stream_input, tmp_path):
    path, schema = stream_input
    compiled = _compiled(schema)
    stream = spark.readStream.schema(schema).parquet(path)
    collected = {}

    def sink(batch_df, batch_id):
        collected["n"] = batch_df.count()
        collected["failed"] = batch_df.where(~F.col("passed")).count()

    q = run_foreach_batch(
        stream, compiled, sink, str(tmp_path / "ckpt"), trigger_once=True
    )
    q.awaitTermination(120)
    batch_equiv = spark.read.parquet(path)
    from medea_ps_spark.operators.validator import validate

    want_failed = validate(batch_equiv, compiled).where(~F.col("passed")).count()
    assert collected["n"] == 2_000
    assert collected["failed"] == want_failed > 0


def test_stateful_streaming_dedup(spark, tmp_path):
    """applyInPandasWithState cross-batch duplicate detection."""
    import os

    from medea_ps_spark.streaming.stateful_dedup import streaming_duplicate_ids

    d = str(tmp_path)
    dup = spark.createDataFrame(
        [("a",), ("b",), ("a",), ("c",), ("b",), ("a",)], "doc_id string"
    )
    dup.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "in"))
    stream = spark.readStream.schema("doc_id string").parquet(os.path.join(d, "in"))
    out = streaming_duplicate_ids(stream, buckets=4)
    q = (
        out.writeStream.format("memory")
        .queryName("dups_t")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(d, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        (r["doc_id"], r["n_seen_before"])
        for r in spark.sql("select * from dups_t").collect()
    )
    assert rows == [("a", 1), ("a", 1), ("b", 1)]


def test_windowed_chi2_drift_streaming(spark, tmp_path):
    """Streaming drift monitor: a clean epoch streamed against its own
    profile must not drift; a shifted epoch (n_tok doubled) must."""
    import os

    from medea_ps_spark.operators.drift import build_profile
    from medea_ps_spark.streaming.validate_stream import windowed_chi2_drift

    clean = synthetic.sequences(spark, 8_000, seed=21, clean=True)
    profile = build_profile(
        clean, {"n_tok": {"column": "n_tok", "lo": 0, "hi": 8192, "nbuckets": 16}}
    )
    ts = F.timestamp_seconds(
        F.lit(1700000000) + F.pmod(F.xxhash64("doc_id"), F.lit(240))
    )
    same = synthetic.sequences(spark, 8_000, seed=22, clean=True).withColumn("ts", ts)
    shifted = (
        synthetic.sequences(spark, 8_000, seed=23, clean=True)
        .withColumn("n_tok", (F.col("n_tok") * 2).cast("int"))
        .withColumn("ts", ts)
    )
    results = {}
    for tag, df in (("same", same), ("shifted", shifted)):
        p = os.path.join(str(tmp_path), tag, "in")
        df.write.mode("overwrite").parquet(p)
        stream = spark.readStream.schema(df.schema).parquet(p)
        out = windowed_chi2_drift(
            stream, profile, "n_tok", ts_col="ts", window="5 minutes"
        )
        q = (
            out.writeStream.outputMode("complete")
            .format("memory")
            .queryName(f"drift_{tag}")
            .option("checkpointLocation", os.path.join(str(tmp_path), tag, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        results[tag] = spark.sql(f"select * from drift_{tag}").collect()
    assert results["same"] and all(not r["drifted"] for r in results["same"])
    assert results["shifted"] and all(r["drifted"] for r in results["shifted"])
    assert sum(r["n_rows"] for r in results["same"]) == 8_000


def test_stateful_dedup_state_is_compact_binary(spark):
    """Direct unit test of the state transition: n unique ids must pack
    to exactly 8n state bytes (sorted uint64 hashes), duplicates across
    calls must flag, and the cap must bound state size."""
    import pandas as pd
    import numpy as np

    from medea_ps_spark.streaming.stateful_dedup import make_update

    class StubState:
        def __init__(self):
            self.value = None
            self.hasTimedOut = False

        @property
        def exists(self):
            return self.value is not None

        @property
        def get(self):
            return self.value

        def update(self, v):
            self.value = v

        def setTimeoutDuration(self, ms):
            pass

        def remove(self):
            self.value = None

    update = make_update("doc_id", max_ids_per_bucket=100)
    st = StubState()
    ids1 = [f"id-{i}" for i in range(50)] + ["id-3"]  # one within-batch dup
    out1 = list(update((0,), iter([pd.DataFrame({"doc_id": ids1})]), st))
    assert sum(len(o) for o in out1) == 1 and out1[0]["doc_id"].iloc[0] == "id-3"
    assert len(st.value[0]) == 8 * 50  # exactly 8 bytes per unique id
    arr = np.frombuffer(st.value[0], dtype=np.uint64)
    assert (np.diff(arr.astype(np.float64)) > 0).all()  # sorted, unique

    # cross-call duplicates flag; state stays capped at 100 ids
    ids2 = [f"id-{i}" for i in range(40, 160)]
    out2 = list(update((0,), iter([pd.DataFrame({"doc_id": ids2})]), st))
    flagged = set(pd.concat(out2)["doc_id"])
    assert flagged == {f"id-{i}" for i in range(40, 50)}
    assert len(st.value[0]) <= 8 * 100


def test_windowed_violation_counts_streaming(spark, stream_input, tmp_path):
    path, schema = stream_input
    compiled = _compiled(schema)
    stream = spark.readStream.schema(schema).parquet(path)
    agg = windowed_violation_counts(
        stream, compiled, ts_col="ts", window="5 minutes", partition_col=None
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("viol_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from viol_counts").collect()
    assert sum(r["n_rows"] for r in rows) == 2_000
    assert sum(r["n_failed"] for r in rows) > 0
    assert len(rows) >= 2  # multiple windows over the 600s spread


def test_streaming_sessions_match_batch(spark, tmp_path):
    """Native session_window streaming sessionization must produce the
    SAME per-user session partitioning as the batch operator (same gap
    semantics: a new session starts at diff >= gap)."""
    from medea_ps_spark.operators.sessions import sessionize

    rows = []
    base = 1_700_000_000
    # u1: events at 0s,100s then 2000s (gap 1900 >= 1800) then 3799s
    for off in (0, 100, 2000, 3799):
        rows.append(("u1", base + off, 1.0))
    # u2: single event; u3: two events exactly gap apart -> ONE session
    # (inclusive boundary in both the native session_window and the
    # batch operator)
    rows.append(("u2", base + 50, 2.0))
    rows += [("u3", base, 4.0), ("u3", base + 1800, 8.0)]
    df = spark.createDataFrame(rows, "user_id string, epoch bigint, value double").select(
        "user_id", F.timestamp_seconds("epoch").alias("ts"), "value"
    )
    p = str(tmp_path / "sess_in")
    df.write.mode("overwrite").parquet(p)

    from medea_ps_spark.streaming.validate_stream import streaming_session_stats

    stream = spark.readStream.schema(df.schema).parquet(p)
    out = streaming_session_stats(stream, gap="30 minutes", watermark="2 hours")
    opath = str(tmp_path / "sess_out")
    q = (
        out.writeStream.format("memory").queryName("sess_mem")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("sess_mem").collect()
    stream_sessions = {}
    for r in got:
        stream_sessions.setdefault(r["user_id"], []).append(
            (r["n_events"], r["value_sum"])
        )
    batch = sessionize(df, gap_seconds=1800, key_cols=("user_id",))
    batch_sessions = {}
    for r in batch.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")
    ).collect():
        batch_sessions.setdefault(r["user_id"], []).append((r["n"], r["v"]))
    for u in ("u1", "u2", "u3"):
        assert sorted(stream_sessions[u]) == sorted(batch_sessions[u]), u
    assert len(stream_sessions["u1"]) == 2
    assert len(stream_sessions["u3"]) == 1


def test_streaming_sessions_survive_restart(spark, tmp_path):
    """VERDICT r3 #6: kill/restart recovery. Run the session_window
    query over a file source with a checkpointLocation, stop it, add
    more input (including a row that CONTINUES a session opened before
    the stop — state recovery, not just offset recovery), restart with
    the same checkpoint, and assert the union of emitted session rows
    equals the batch operator on the full input: nothing lost, nothing
    duplicated."""
    from medea_ps_spark.operators.sessions import sessionize
    from medea_ps_spark.streaming.validate_stream import (
        streaming_session_stats,
    )

    base = 1_700_000_000
    schema = "user_id string, ts timestamp, value double"

    def _rows(rows):
        return spark.createDataFrame(
            [(u, off, v) for u, off, v in rows],
            "user_id string, epoch bigint, value double",
        ).select(
            "user_id",
            F.timestamp_seconds(F.col("epoch") + base).alias("ts"),
            "value",
        )

    src = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    sink = str(tmp_path / "out")
    batch_a = [("u1", 0, 1.0), ("u1", 100, 2.0), ("u1", 200, 4.0),
               ("u2", 0, 8.0), ("u2", 50, 16.0)]
    _rows(batch_a).write.mode("append").parquet(src)

    def _start():
        stream = spark.readStream.schema(schema).parquet(src)
        out = streaming_session_stats(
            stream, gap="30 minutes", watermark="1 hour"
        )
        return (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    q = _start()
    q.awaitTermination(120)  # availableNow: drains batch A, then stops

    # batch B: u1@1000 is 800s after u1@200 -> CONTINUES the session
    # opened before the stop; u1@5000/u2@10000 open new sessions; the
    # flush row pushes the global watermark past every real session end
    batch_b = [("u1", 1000, 32.0), ("u1", 5000, 64.0),
               ("u2", 10_000, 128.0), ("flush", 200_000, 0.0)]
    _rows(batch_b).write.mode("append").parquet(src)
    q = _start()  # same checkpoint -> resumes state + offsets
    q.awaitTermination(120)

    got = {
        (r["user_id"], int(r["session_start"].timestamp()) - base,
         r["n_events"], r["value_sum"])
        for r in spark.read.parquet(sink).collect()
        if r["user_id"] != "flush"
    }
    full = _rows(batch_a + batch_b[:-1])
    sess = sessionize(full, gap_seconds=1800, key_cols=("user_id",))
    want = {
        (r["user_id"], int(r["start_us"] // 1_000_000) - base,
         r["n_events"], r["value_sum"])
        for r in sess.groupBy("user_id", "session_id").agg(
            F.min("_ts_us").alias("start_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
        ).collect()
    }
    assert got == want
    # the cross-restart session arrived as ONE row (4 events), proving
    # session state (not just source offsets) survived the restart
    assert ("u1", 0, 4, 39.0) in got
    # and no duplicates from re-emitting finished sessions
    raw = [r for r in spark.read.parquet(sink).collect()
           if r["user_id"] != "flush"]
    assert len(raw) == len(got)


def test_stateful_dedup_survives_restart(spark, tmp_path):
    """VERDICT r4 #6: kill/restart recovery for the custom
    applyInPandasWithState operator. Batch A seeds state, the query
    stops, batch B re-presents an id FIRST SEEN BEFORE THE STOP (state
    recovery, not just offset recovery) plus a fresh in-batch dup;
    restart on the same checkpoint must flag exactly the right dups —
    nothing lost, nothing re-emitted."""
    import os

    from medea_ps_spark.streaming.stateful_dedup import streaming_duplicate_ids

    src = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    sink = str(tmp_path / "out")

    def _start():
        stream = spark.readStream.schema("doc_id string").parquet(src)
        return (
            streaming_duplicate_ids(stream, buckets=4)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    spark.createDataFrame(
        [("a",), ("b",), ("a",), ("c",)], "doc_id string"
    ).coalesce(1).write.mode("append").parquet(src)
    q = _start()
    q.awaitTermination(120)
    assert sorted(
        (r["doc_id"], r["n_seen_before"])
        for r in spark.read.parquet(sink).collect()
    ) == [("a", 1)]

    # batch B: "b" duplicates a PRE-RESTART id; "d" dups within-batch
    spark.createDataFrame(
        [("b",), ("d",), ("d",), ("e",)], "doc_id string"
    ).coalesce(1).write.mode("append").parquet(src)
    q = _start()  # same checkpoint -> state + offsets resume
    q.awaitTermination(120)
    got = sorted(
        (r["doc_id"], r["n_seen_before"])
        for r in spark.read.parquet(sink).collect()
    )
    # "a" NOT re-emitted (offsets recovered), "b" flagged only via
    # recovered state, "d" flagged in-batch; "c"/"e" never flagged
    assert got == [("a", 1), ("b", 1), ("d", 1)]


def test_windowed_chi2_drift_survives_restart(spark, tmp_path):
    """VERDICT r4 #6: kill/restart recovery for the streaming χ² drift
    monitor. Window W1's rows straddle the restart (half before, half
    after), so the final W1 emission proves the windowed-agg STATE
    recovered; W2 arrives wholly after the restart with a shifted
    distribution and must flag drift. Append mode + watermark: each
    window emits exactly once."""
    import os

    from medea_ps_spark.operators.drift import build_profile
    from medea_ps_spark.streaming.validate_stream import windowed_chi2_drift

    clean = synthetic.sequences(spark, 8_000, seed=31, clean=True)
    profile = build_profile(
        clean, {"n_tok": {"column": "n_tok", "lo": 0, "hi": 8192, "nbuckets": 16}}
    )
    base = 1_700_000_000
    def _with_ts(df, off):
        return df.select(
            "n_tok", F.timestamp_seconds(F.lit(base + off)).alias("ts")
        )

    src = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    sink = str(tmp_path / "out")

    def _start():
        stream = spark.readStream.schema("n_tok int, ts timestamp").parquet(src)
        out = windowed_chi2_drift(
            stream, profile, "n_tok", ts_col="ts", window="5 minutes",
            watermark="2 minutes",
        )
        return (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    # batch A: half of W1 (clean sample) — W1 stays open at the stop
    _with_ts(synthetic.sequences(spark, 4_000, seed=32, clean=True), 10) \
        .write.mode("append").parquet(src)
    q = _start()
    q.awaitTermination(120)
    assert spark.read.schema(
        "window struct<start:timestamp,end:timestamp>, n_rows bigint,"
        "chi2_stat double, drifted boolean"
    ).parquet(sink).count() == 0  # nothing finalized yet

    # batch B: W1's second half (clean), W2 wholly shifted, flush row
    shifted = synthetic.sequences(spark, 4_000, seed=33, clean=True) \
        .withColumn("n_tok", (F.col("n_tok") * 2).cast("int"))
    _with_ts(synthetic.sequences(spark, 4_000, seed=34, clean=True), 20) \
        .unionByName(_with_ts(shifted, 310)) \
        .unionByName(_with_ts(spark.createDataFrame([(1,)], "n_tok int"),
                              100_000)) \
        .write.mode("append").parquet(src)
    q = _start()  # same checkpoint -> windowed state resumes
    q.awaitTermination(120)

    rows = {
        int(r["window"]["start"].timestamp()) - base:
        (r["n_rows"], r["drifted"])
        for r in spark.read.parquet(sink).collect()
        if r["n_rows"] < 4_001 * 2 + 1  # drop the flush window if emitted
        and int(r["window"]["start"].timestamp()) - base < 1000
    }
    # exactly one emission per window (5-min windows align to the
    # epoch, so W1 starts at base-200, W2 at base+100); W1 counts BOTH
    # halves (8000 rows -> the pre-restart half survived in state); W2
    # drifted
    assert rows == {-200: (8_000, False), 100: (4_000, True)}, rows


def test_windowed_violation_exemplars_streaming(spark, stream_input, tmp_path):
    """Bounded exemplar sink on a stream: exact per-(window,constraint)
    counts, <= k exemplars from deterministic min-lanes, and the
    STREAMING result must equal the same plan run in batch mode plus a
    pure-Python lane reference."""
    import hashlib

    from medea_ps_spark.streaming.validate_stream import (
        windowed_violation_exemplars,
    )

    K = 4
    path, schema = stream_input
    compiled = _compiled(schema)
    stream = spark.readStream.schema(schema).parquet(path)
    agg = windowed_violation_exemplars(
        stream, compiled, k=K, ts_col="ts", window="5 minutes"
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("viol_ex")
        .option("checkpointLocation", str(tmp_path / "ckpt_ex"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window"]["start"], r["constraint_id"]): r
        for r in spark.sql("select * from viol_ex").collect()
    }
    assert got and all(len(r["exemplars"]) <= K for r in got.values())

    # batch twin on the same data: identical result set
    batch = spark.read.parquet(path)
    bt = {
        (r["window"]["start"], r["constraint_id"]): r
        for r in windowed_violation_exemplars(
            batch, compiled, k=K, ts_col="ts", window="5 minutes"
        ).collect()
    }
    assert set(got) == set(bt)
    for kk in got:
        assert got[kk]["n_violations"] == bt[kk]["n_violations"]
        assert [tuple(e) for e in got[kk]["exemplars"]] == [
            tuple(e) for e in bt[kk]["exemplars"]
        ]

    # pure-Python lane reference over the exploded violations
    from medea_ps_spark.operators.validator import validate, VIOLATIONS_COL

    rows = (
        validate(batch, compiled)
        .select(
            F.window(F.col("ts"), "5 minutes").alias("w"),
            "doc_id",
            F.explode(F.col(VIOLATIONS_COL)).alias("v"),
        )
        .select("w", "doc_id", "v.constraint_id", "v.observed")
        .collect()
    )
    ref = {}
    for r in rows:
        key = hashlib.md5(
            "\x1f".join(
                [
                    r["doc_id"] if r["doc_id"] is not None else "\x00",
                    r["constraint_id"],
                    r["observed"] if r["observed"] is not None else "\x00",
                ]
            ).encode()
        ).hexdigest()
        lane = int(key[:8], 16) % K
        g = ref.setdefault((r["w"]["start"], r["constraint_id"]), [0, {}])
        g[0] += 1
        cur = g[1].get(lane)
        cand = (key, r["doc_id"], r["observed"])
        if cur is None or cand < cur:
            g[1][lane] = cand
    assert set(ref) == set(got)
    for kk, (n, lanes) in ref.items():
        assert got[kk]["n_violations"] == n
        want = [
            (d, o) for _k, d, o in sorted(lanes.values())
        ]
        assert [tuple(e) for e in got[kk]["exemplars"]] == want


def test_windowed_oov_rate_streaming(spark, tmp_path):
    """Stream-static vocab join OOV monitor: per-source token totals and
    OOV counts against a fixed vocabulary dimension."""
    import os

    from medea_ps_spark.streaming.validate_stream import windowed_oov_rate

    ts = F.timestamp_seconds(F.lit(1700000000))
    rows = [
        ("a", "web", [1, 2, 3]),
        ("b", "web", [1, 9, 9, 9]),
        ("c", "books", [2, 3]),
        ("d", "books", None),
        ("e", "books", []),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, tokens array<int>"
    ).withColumn("ts", ts)
    d = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "in"))
    vocab = spark.createDataFrame([(1,), (2,), (3,)], "token_id int")

    stream = spark.readStream.schema(
        "doc_id string, source string, tokens array<int>, ts timestamp"
    ).parquet(os.path.join(d, "in"))
    out = windowed_oov_rate(
        stream, vocab, window="10 minutes", watermark="10 minutes"
    )
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("oov_t")
        .option("checkpointLocation", os.path.join(d, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["source"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
        for r in spark.sql("select * from oov_t").collect()
    }
    # web: 7 tokens, the three 9s are OOV; books: NULL/empty arrays
    # contribute nothing
    assert got == {
        "web": (7, 3, round(3 / 7, 6)),
        "books": (2, 0, 0.0),
    }
