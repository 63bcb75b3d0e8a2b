"""Sampled validation estimator (operators/estimate.py): sampled counts
== exact validation of the same sample, Wilson Column math == the pure
reference, CI coverage of the true population rate on the deterministic
fixture, NULL-key all-or-nothing behavior, layout independence, empty
sample, table-constraint refusal, and a one-Exchange plan gate.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators import validator as V
from medea_ps_spark.operators.estimate import (
    estimated_violation_rates,
    skipped_table_constraints,
    wilson_interval,
)
from medea_ps_spark.operators.sampling import keep_predicate
from medea_ps_spark.plans.compiler import Registry
from medea_ps_spark.plans.constraints import (
    ConstraintSet,
    InRange,
    IsIn,
    NotNull,
    Unique,
)


def _reg(*cs):
    return Registry().register(ConstraintSet("$start", tuple(cs)))


@pytest.fixture(scope="module")
def frame(spark):
    """Deterministic 4000-row frame with known planted violation rates:
    val ∈ [0, 999] (InRange(0, 899) violated by exactly the 10% with
    val >= 900), cat cycling 20 values (IsIn of the first 18 violated
    by exactly 10%), and doc_id never NULL."""
    return spark.range(4000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        (F.col("id") % 1000).alias("val"),
        F.concat(F.lit("c"), (F.col("id") % 20)).alias("cat"),
    )


@pytest.fixture(scope="module")
def compiled(frame):
    reg = _reg(
        NotNull("id_nn", "doc_id"),
        InRange("val_band", "val", 0, 899),
        IsIn("cat_known", "cat", tuple(f"c{i}" for i in range(18))),
    )
    return reg.compile(frame.schema)


def test_wilson_reference_cases():
    # hand-checked anchors: symmetric at v=n/2; clamped at the edges
    # the v=0 / v=n edges cancel center against radius: exact in
    # algebra, 1-ulp off in floats — clamped by the 0/1 guards
    lo, hi = wilson_interval(0, 100)
    assert math.isclose(lo, 0.0, abs_tol=1e-12) and 0.0 < hi < 0.05
    lo, hi = wilson_interval(100, 100)
    assert 0.95 < lo < 1.0 and math.isclose(hi, 1.0, abs_tol=1e-12)
    lo, hi = wilson_interval(50, 100)  # symmetric around 1/2
    assert math.isclose(1.0 - hi, lo)
    assert lo < 0.5 < hi
    assert wilson_interval(0, 0) == (None, None)


@pytest.mark.parametrize("fraction,seed", [(0.5, 42), (0.25, 7), (1.0, 3)])
def test_counts_match_exact_validation_of_the_sample(
    spark, frame, compiled, fraction, seed
):
    est = {
        r["constraint_id"]: r
        for r in estimated_violation_rates(
            frame, compiled, fraction, seed=seed
        ).collect()
    }
    sample = frame.where(keep_predicate(F.col("doc_id"), fraction, seed))
    n = sample.count()
    exact = dict(
        V.violation_rows(V.validate(sample, compiled))
        .groupBy("constraint_id")
        .count()
        .collect()
    )
    assert len(est) == 3
    for cid, r in est.items():
        assert r["n_sampled"] == n
        assert r["n_violations"] == exact.get(cid, 0)
        # Spark-side Wilson columns == the pure-Python reference
        lo, hi = wilson_interval(r["n_violations"], n)
        assert math.isclose(r["ci_lo"], lo, abs_tol=1e-12)
        assert math.isclose(r["ci_hi"], hi, abs_tol=1e-12)
        assert math.isclose(r["est_rate"], r["n_violations"] / n)


def test_ci_covers_true_population_rate(frame, compiled):
    """The planted rates are exact (10% each, 0% for NotNull); on this
    fixed (fraction, seed) the Wilson 95% CI must cover them — fully
    deterministic, so this can never flake."""
    true_rate = {"id_nn": 0.0, "val_band": 0.1, "cat_known": 0.1}
    for r in estimated_violation_rates(
        frame, compiled, 0.3, seed=42
    ).collect():
        t = true_rate[r["constraint_id"]]
        assert r["ci_lo"] <= t <= r["ci_hi"], (r, t)


def test_total_extrapolation(frame, compiled):
    out = estimated_violation_rates(
        frame, compiled, 0.5, seed=42, total_rows=4000
    )
    assert {"est_total_violations", "est_total_lo", "est_total_hi"} <= set(
        out.columns
    )
    r = {x["constraint_id"]: x for x in out.collect()}["val_band"]
    assert math.isclose(r["est_total_violations"], r["est_rate"] * 4000)
    # the planted 10% → 400 violating rows must lie inside the band
    assert r["est_total_lo"] <= 400 <= r["est_total_hi"]


def test_layout_independence(spark, frame, compiled):
    a = sorted(
        estimated_violation_rates(
            frame.repartition(7), compiled, 0.4, seed=5
        ).collect()
    )
    b = sorted(
        estimated_violation_rates(
            frame.repartition(2), compiled, 0.4, seed=5
        ).collect()
    )
    assert a == b


def test_null_keys_move_as_one_block(spark):
    """NULL keys share the constant coordinate md5(str(seed)): the
    whole block is in-sample or out-of-sample together, never split —
    the documented contract for constraints on the key column."""
    df = spark.createDataFrame(
        [(None, 5)] * 8 + [(f"d{i}", 5) for i in range(50)],
        "doc_id string, val int",
    )
    compiled = _reg(
        NotNull("id_nn", "doc_id"), InRange("v", "val", 0, 10)
    ).compile(df.schema)
    for seed in range(10):
        r = {
            x["constraint_id"]: x
            for x in estimated_violation_rates(
                df, compiled, 0.5, seed=seed
            ).collect()
        }["id_nn"]
        assert r["n_violations"] in (0, 8)


def test_empty_sample_yields_null_cis(spark, frame, compiled):
    rows = estimated_violation_rates(
        frame.where(F.lit(False)), compiled, 0.5
    ).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["n_sampled"] == 0 and r["n_violations"] == 0
        assert r["est_rate"] is None
        assert r["ci_lo"] is None and r["ci_hi"] is None


def test_table_constraints_refused_by_default(frame):
    reg = _reg(NotNull("id_nn", "doc_id"), Unique("id_uq", "doc_id"))
    compiled = reg.compile(frame.schema)
    with pytest.raises(ValueError, match="id_uq"):
        estimated_violation_rates(frame, compiled, 0.5)
    out = estimated_violation_rates(
        frame, compiled, 0.5, on_table_constraints="ignore"
    )
    assert [r["constraint_id"] for r in out.collect()] == ["id_nn"]
    assert skipped_table_constraints(compiled) == ["id_uq"]


def test_bad_args(frame, compiled):
    with pytest.raises(ValueError, match="fraction"):
        estimated_violation_rates(frame, compiled, 0.0)
    with pytest.raises(ValueError, match="on_table_constraints"):
        estimated_violation_rates(
            frame, compiled, 0.5, on_table_constraints="warn"
        )


def test_plan_single_aggregate_no_row_shuffle(frame, compiled):
    """The estimator's only Exchange is the final-aggregate exchange of
    K+1 numbers — the sampled DATA rows are never shuffled, and there
    is no join or generator before the aggregate."""
    plan = estimated_violation_rates(
        frame, compiled, 0.5
    )._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange")
    assert n_exchange <= 1, plan
    assert "Join" not in plan, plan
