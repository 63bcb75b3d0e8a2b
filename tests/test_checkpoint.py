"""Resume tests (SURVEY.md §5): kill after partition k, restart, verify
manifest skip + identical final verdicts; changed constraint set
invalidates checkpoints."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators.checkpoint import CheckpointedRun, Manifest
from medea_ps_spark.sources import synthetic


@pytest.fixture(scope="module")
def table_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("seq") / "sequences")
    df = synthetic.sequences(spark, 3_000, seed=5)
    df.write.mode("overwrite").partitionBy("source").parquet(p)
    return p


def _process(df, out_dir):
    n = df.count()
    bad = df.where(F.col("n_tok") != F.size("tokens")).count()
    return {"n_rows": n, "n_bad": bad}


def test_run_then_resume_skips_done(spark, table_path, tmp_path):
    ck = str(tmp_path / "ck")
    run1 = CheckpointedRun(spark, table_path, ck, fingerprint="abc")
    res1 = run1.run(_process)
    assert len(res1) == len(run1.partitions()) > 3
    # resume: nothing pending, no partition re-processed
    run2 = CheckpointedRun(spark, table_path, ck, fingerprint="abc")
    assert run2.pending_partitions() == []
    res2 = run2.run(_process)
    assert res2 == {}
    # manifest metrics identical to first run
    assert {k: v.metrics for k, v in run2.manifest.entries.items()} == res1


def test_interrupt_mid_run_resumes_rest(spark, table_path, tmp_path):
    ck = str(tmp_path / "ck2")
    calls = []

    class Boom(Exception):
        pass

    def flaky(df, out_dir):
        if len(calls) == 2:
            raise Boom()
        calls.append(1)
        return _process(df, out_dir)

    run1 = CheckpointedRun(spark, table_path, ck, fingerprint="abc")
    with pytest.raises(Boom):
        run1.run(flaky)
    done_before = [k for k, v in run1.manifest.entries.items() if v.status == "done"]
    assert len(done_before) == 2
    # resume processes only the remainder; union of metrics == full run
    run2 = CheckpointedRun(spark, table_path, ck, fingerprint="abc")
    rest = run2.run(_process)
    assert set(done_before).isdisjoint(rest)
    full = CheckpointedRun(spark, table_path, str(tmp_path / "ck3"), "abc").run(_process)
    combined = {k: v.metrics for k, v in run2.manifest.entries.items()}
    assert combined == full


def test_changed_fingerprint_invalidates(spark, table_path, tmp_path):
    ck = str(tmp_path / "ck4")
    CheckpointedRun(spark, table_path, ck, fingerprint="v1").run(_process)
    run2 = CheckpointedRun(spark, table_path, ck, fingerprint="v2")
    assert len(run2.pending_partitions()) == len(run2.partitions())


def test_changed_data_invalidates_partition(spark, table_path, tmp_path):
    ck = str(tmp_path / "ck5")
    run1 = CheckpointedRun(spark, table_path, ck, fingerprint="x")
    run1.run(_process)
    # touch one partition's data → only that partition pending
    part = run1.partitions()[0]
    pdir = os.path.join(table_path, f"source={part}")
    victim = next(
        os.path.join(pdir, f) for f in os.listdir(pdir) if f.endswith(".parquet")
    )
    with open(victim, "ab") as fh:
        fh.write(b"0")
    run2 = CheckpointedRun(spark, table_path, ck, fingerprint="x")
    assert run2.pending_partitions() == [part]


def test_manifest_roundtrip(tmp_path):
    m = Manifest("r", "t", "source", "fp")
    m2 = Manifest.from_json(m.to_json())
    assert m2.run_id == "r" and m2.fingerprint == "fp"


def test_incremental_rollup_maintenance(spark, tmp_path):
    """VERDICT r3 #5: rollup.py claims per-partition incremental
    maintenance through the checkpoint manifest — prove it end to end.
    Append one partition + dirty another; the second run must
    re-aggregate ONLY those two slices, and the assembled rollup table
    must equal a full recompute over the updated input."""
    from medea_ps_spark.operators.rollup import time_rollup

    base_us = 1_700_000_000 * 1_000_000

    def _events(n, src, offset=0):
        return spark.range(n).select(
            (F.lit(base_us) + (F.col("id") + offset) * 600 * 1_000_000)
            .alias("ts"),
            (F.col("id") % 10).cast("double").alias("value"),
            F.lit(src).alias("source"),
        )

    table = str(tmp_path / "events")
    _events(500, "a").unionByName(_events(400, "b")).write.partitionBy(
        "source"
    ).parquet(table)

    processed = []

    def _proc(df, out_dir):
        processed.append(out_dir.rsplit("source=", 1)[1])
        out = time_rollup(df, ts_col="ts", value_col="value")
        out.write.mode("overwrite").parquet(out_dir)
        return {"n_slices": out.count()}

    ck = str(tmp_path / "ck")
    run1 = CheckpointedRun(spark, table, ck, fingerprint="rollup-v1")
    run1.run(_proc)
    assert sorted(processed) == ["a", "b"]

    # epoch 2: new partition c; append rows into b (dirty); a untouched
    processed.clear()
    _events(300, "c").write.mode("append").partitionBy("source").parquet(table)
    _events(100, "b", offset=10_000).write.mode("append").partitionBy(
        "source"
    ).parquet(table)
    run2 = CheckpointedRun(spark, table, ck, fingerprint="rollup-v1")
    assert sorted(run2.pending_partitions()) == ["b", "c"]
    run2.run(_proc)
    assert sorted(processed) == ["b", "c"]  # a's slice NOT recomputed

    # assembled per-partition slices == full recompute's per-source
    # levels (the cross-partition grand total is, by design, a cheap
    # re-aggregation of the per-source 'total' slices — checked too)
    parts = run2.partitions()
    assembled = None
    for p in parts:
        s = spark.read.parquet(
            os.path.join(ck, "out", f"source={p}")
        ).withColumn("source", F.lit(p))
        assembled = s if assembled is None else assembled.unionByName(s)
    full = time_rollup(
        spark.read.parquet(table), ts_col="ts", value_col="value",
        extra_keys=("source",),
    )
    want = full.where(F.col("source").isNotNull()).select(
        "source", "day_us", "hour_us", "grain", "n_events", "value_sum"
    )
    got = assembled.select(
        "source", "day_us", "hour_us", "grain", "n_events", "value_sum"
    )
    assert want.exceptAll(got).count() == 0
    assert got.exceptAll(want).count() == 0
    # grand total from maintained slices == full recompute's () level
    grand = full.where(
        F.col("source").isNull() & (F.col("grain") == "total")
    ).select("n_events", "value_sum").collect()[0]
    agg = (
        assembled.where(F.col("grain") == "total")
        .agg(F.sum("n_events").alias("n"), F.sum("value_sum").alias("v"))
        .collect()[0]
    )
    assert agg["n"] == grand["n_events"]
    assert abs(agg["v"] - grand["value_sum"]) < 1e-6


def test_metrics_only_mode_counts_table_violations(spark, tmp_path):
    """metrics_only skips the violation-row sink and reports the
    table-level count via the aggregate-only fast paths — equal to the
    row-sink run's metrics for the same constraints. (Own table: the
    module fixture gets a parquet file deliberately corrupted by
    test_changed_data_invalidates_partition.)"""
    from medea_ps_spark.jobs.validate_job import build_registry
    from medea_ps_spark.operators.runner import run_checkpointed_validation
    from medea_ps_spark.sources.synthetic import ALLOWED_SOURCES

    table_path = str(tmp_path / "seq")
    synthetic.sequences(spark, 3_000, seed=7).write.partitionBy(
        "source"
    ).parquet(table_path)
    reg = build_registry(vocab=50257, max_len=128,
                         allowed_sources=ALLOWED_SOURCES)
    m = run_checkpointed_validation(
        spark, table_path, reg, str(tmp_path / "ck_m"), metrics_only=True
    )
    full = run_checkpointed_validation(
        spark, table_path, reg, str(tmp_path / "ck_f")
    )
    assert set(m) == set(full)
    for p in m:
        assert m[p]["n_rows"] == full[p]["n_rows"]
        assert m[p]["n_failed"] == full[p]["n_failed"]
        assert "n_table_violations" in m[p]
        # no violation parquet written in metrics-only mode
        assert not os.path.exists(
            str(tmp_path / "ck_m" / "out" / f"source={p}" / "violations")
        )
        assert os.path.exists(
            str(tmp_path / "ck_f" / "out" / f"source={p}" / "violations")
        )


def test_sink_mode_switch_reprocesses_metrics_only(spark, tmp_path):
    """ADVICE r4: a partition completed metrics-only wrote NO violation
    parquet, so a later row-mode rerun on the SAME checkpoint dir must
    reprocess it (the manifest records the sink per entry) — and once
    rows are materialized, a metrics-only rerun skips everything
    ("rows" covers both modes)."""
    from medea_ps_spark.jobs.validate_job import build_registry
    from medea_ps_spark.operators.runner import run_checkpointed_validation
    from medea_ps_spark.sources.synthetic import ALLOWED_SOURCES

    table_path = str(tmp_path / "seq")
    synthetic.sequences(spark, 3_000, seed=11).write.partitionBy(
        "source"
    ).parquet(table_path)
    reg = build_registry(vocab=50257, max_len=128,
                         allowed_sources=ALLOWED_SOURCES)
    ck = str(tmp_path / "ck")
    m = run_checkpointed_validation(
        spark, table_path, reg, ck, metrics_only=True
    )
    assert m  # every partition processed metrics-only
    for p in m:
        assert not os.path.exists(
            os.path.join(ck, "out", f"source={p}", "violations")
        )
    # row-mode rerun on the SAME dir: metrics-only entries do NOT
    # satisfy it — all partitions reprocess and rows materialize
    full = run_checkpointed_validation(spark, table_path, reg, ck)
    assert set(full) == set(m)
    for p in full:
        assert os.path.exists(
            os.path.join(ck, "out", f"source={p}", "violations")
        )
    # and a metrics-only rerun now skips everything: rows ⊇ metrics
    again = run_checkpointed_validation(
        spark, table_path, reg, ck, metrics_only=True
    )
    assert again == {}
