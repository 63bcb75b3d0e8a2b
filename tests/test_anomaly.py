"""Run-over-run metrics anomaly detection (operators/anomaly.py):
strategy math vs hand-computed values, history-store ordering and
idempotent re-record, missing-metric conservatism, and the checkpoint
integration — manifest totals recorded per run, a planted violation
spike flagged by RateOfChange/KSigma on the next run."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators.anomaly import (
    AbsoluteBounds,
    KSigma,
    RateOfChange,
    check_anomalies,
    load_history,
    metrics_from_manifest,
    record_run_metrics,
)


# ---------------------------------------------------------------------------
# strategies (pure)
# ---------------------------------------------------------------------------


def test_absolute_bounds():
    s = AbsoluteBounds(lo=10, hi=20)
    assert s.evaluate([], 15)[0]
    assert not s.evaluate([], 9)[0]
    assert not s.evaluate([], 21)[0]
    assert AbsoluteBounds(hi=5).evaluate([], -100)[0]


def test_rate_of_change():
    s = RateOfChange(max_increase=1.0, max_decrease=0.5)
    assert s.evaluate([], 99)[0]  # no prior run
    assert s.evaluate([100], 200)[0]  # exactly +100%
    assert not s.evaluate([100], 201)[0]
    assert s.evaluate([100], 50)[0]  # exactly -50%
    assert not s.evaluate([100], 49)[0]
    # zero prev -> absolute change against the same bounds
    assert s.evaluate([0], 0.5)[0]
    assert not s.evaluate([0], 5)[0]
    # negative history values use |prev| as the base
    ok, detail = s.evaluate([-100], -50)
    assert ok and detail["change"] == pytest.approx(0.5)


def test_ksigma():
    hist = [10.0, 12.0, 11.0, 9.0, 13.0]
    mean = sum(hist) / 5
    std = math.sqrt(sum((v - mean) ** 2 for v in hist) / 5)
    s = KSigma(k=2.0, min_history=5)
    assert s.evaluate(hist, mean + 1.9 * std)[0]
    assert not s.evaluate(hist, mean + 2.1 * std)[0]
    # below min_history: always passes
    assert KSigma(k=0.001, min_history=5).evaluate([1.0, 2.0], 999)[0]
    # zero variance: any deviation flags
    assert not KSigma(min_history=3).evaluate([5.0, 5.0, 5.0], 5.1)[0]
    assert KSigma(min_history=3).evaluate([5.0, 5.0, 5.0], 5.0)[0]
    # window: only trailing values considered
    w = KSigma(k=2.0, window=3, min_history=3)
    _, detail = w.evaluate([1000.0, 10.0, 12.0, 11.0], 11.0)
    assert detail["mean"] == pytest.approx(11.0)


# ---------------------------------------------------------------------------
# history store
# ---------------------------------------------------------------------------


def test_history_store_orders_and_rerecords(tmp_path):
    p = str(tmp_path)
    record_run_metrics(p, "run_b", {"n": 1.0})
    record_run_metrics(p, "run_a", {"n": 2.0})  # later despite name order
    record_run_metrics(p, "run_c", {"n": 3.0})
    hist = load_history(p)
    assert [r.run_id for r in hist] == ["run_b", "run_a", "run_c"]
    assert [r.seq for r in hist] == [0, 1, 2]
    # idempotent overwrite keeps the seq slot
    record_run_metrics(p, "run_a", {"n": 20.0}, tags={"v": "2"})
    hist2 = load_history(p)
    assert [r.run_id for r in hist2] == ["run_b", "run_a", "run_c"]
    assert hist2[1].metrics["n"] == 20.0 and hist2[1].tags == {"v": "2"}


def test_check_anomalies_shapes(tmp_path):
    p = str(tmp_path)
    for i, v in enumerate([100.0, 110.0, 90.0, 105.0, 95.0]):
        record_run_metrics(p, f"r{i}", {"rows": v, "extra": 1.0})
    hist = load_history(p)
    verdicts = check_anomalies(
        hist,
        {"rows": 300.0},
        {
            "rows": [RateOfChange(max_increase=0.5), KSigma(k=3, min_history=5)],
            "gone": AbsoluteBounds(lo=0),
        },
    )
    by = {(v["metric"], v["strategy"]): v for v in verdicts}
    assert not by[("rows", "RateOfChange")]["ok"]
    assert not by[("rows", "KSigma")]["ok"]
    assert not by[("gone", "missing_metric")]["ok"]  # conservative
    assert len(verdicts) == 3
    # strategies only see runs that recorded the metric
    verdicts2 = check_anomalies(hist, {"fresh": 1.0},
                                {"fresh": RateOfChange(max_increase=0.1)})
    assert verdicts2[0]["ok"] and verdicts2[0]["detail"]["prev"] is None


# ---------------------------------------------------------------------------
# checkpoint integration (Spark)
# ---------------------------------------------------------------------------


def test_manifest_metrics_and_spike_detection(spark, tmp_path):
    from medea_ps_spark.operators.runner import run_checkpointed_validation
    from medea_ps_spark.plans.compiler import Registry
    from medea_ps_spark.plans.constraints import (
        ConstraintSet,
        InRange,
        Unique,
    )
    from medea_ps_spark.sources import synthetic

    table = str(tmp_path / "seq")
    hist_path = str(tmp_path / "monitor")
    df = synthetic.sequences(spark, 2_000, seed=11)
    df.write.mode("overwrite").partitionBy("source").parquet(table)

    def registry(hi):
        reg = Registry()
        reg.register(
            ConstraintSet(
                "$start",
                [
                    InRange("len_ok", "n_tok", 0, hi),
                    Unique("uniq", "doc_id"),
                ],
            )
        )
        return reg

    # three "clean" epochs: same loose rule, identical data
    for i in range(3):
        ck = str(tmp_path / f"ck{i}")
        run_checkpointed_validation(
            spark, table, registry(10_000), ck, metrics_only=True
        )
        m = metrics_from_manifest(ck)
        assert m["n_rows"] == 2_000 and m["n_failed"] == 0
        assert m["table_violations.uniq"] == 0
        record_run_metrics(hist_path, f"epoch{i}", m)

    # epoch 3: rule tightened so most rows violate -> fail_rate spikes
    ck3 = str(tmp_path / "ck3")
    run_checkpointed_validation(
        spark, table, registry(10), ck3, metrics_only=True
    )
    m3 = metrics_from_manifest(ck3)
    assert m3["n_failed"] > 100
    verdicts = check_anomalies(
        load_history(hist_path),
        m3,
        {
            "fail_rate": RateOfChange(max_increase=0.5),
            "n_rows": RateOfChange(max_increase=0.1, max_decrease=0.1),
            "n_table_violations": AbsoluteBounds(hi=0),
        },
    )
    by = {v["metric"]: v for v in verdicts}
    assert not by["fail_rate"]["ok"]  # 0 -> ~1.0 flagged (zero-prev rule)
    assert by["n_rows"]["ok"]  # row count unchanged
    assert by["n_table_violations"]["ok"]  # uniqueness still clean
