"""End-to-end spine (SURVEY.md §7 step 2): the BASELINE.json constraint
set over the synthetic sequences table, one DataFrame pass, verdicts +
violation rows, checked against an independent pandas oracle."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from medea_ps_spark.plans.compiler import Registry
from medea_ps_spark.plans.constraints import (
    AnyOf,
    ArrayLenBetween,
    ConstraintSet,
    ElementsInRange,
    InRange,
    IsIn,
    NotNull,
    ReferentialIn,
    SizeEquals,
    Unique,
)
from medea_ps_spark.operators import validator as V
from medea_ps_spark.sources import synthetic

N = 8_000


def baseline_registry() -> Registry:
    reg = Registry()
    reg.register(
        ConstraintSet(
            "$start",
            [
                NotNull("doc_id_not_null", "doc_id"),
                SizeEquals("n_tok_matches", "n_tok", "tokens"),
                InRange("n_tok_bounds", "n_tok", 1, synthetic.MAX_LEN),
                ElementsInRange("tokens_in_vocab", "tokens", 0, synthetic.VOCAB),
                ArrayLenBetween("tokens_not_empty", "tokens", 1, None),
                ReferentialIn(
                    "source_known", "source", dim_values=synthetic.ALLOWED_SOURCES
                ),
                Unique("doc_id_unique", "doc_id"),
            ],
        )
    )
    return reg


@pytest.fixture(scope="module")
def seq_df(spark):
    df = synthetic.sequences(spark, N, seed=42)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def compiled(seq_df):
    return baseline_registry().compile(seq_df.schema)


def oracle(pdf: pd.DataFrame) -> pd.DataFrame:
    """Independent row-level verdict oracle (dual-oracle pattern,
    test/validator-quickCheck/Validator.purs:458-474)."""
    ok_id = pdf.doc_id.notna()
    sizes = pdf.tokens.apply(len)
    ok_size = pdf.n_tok == sizes
    ok_bounds = (pdf.n_tok >= 1) & (pdf.n_tok <= synthetic.MAX_LEN)
    ok_vocab = pdf.tokens.apply(
        lambda t: all(0 <= x < synthetic.VOCAB for x in t)
    )
    ok_nonempty = sizes >= 1
    return pd.DataFrame(
        {
            "doc_id_not_null": ok_id,
            "n_tok_matches": ok_size,
            "n_tok_bounds": ok_bounds,
            "tokens_in_vocab": ok_vocab,
            "tokens_not_empty": ok_nonempty,
        }
    )


def test_row_verdicts_match_oracle(spark, seq_df, compiled):
    validated = V.validate(seq_df, compiled)
    pdf = validated.toPandas()
    want = oracle(pdf)
    got_passed = pdf[V.PASSED_COL]
    want_passed = want.all(axis=1)
    assert (got_passed == want_passed).all()
    # per-constraint: violation ids per row match oracle columns
    for idx, row in pdf.iterrows():
        got_ids = {v["constraint_id"] for v in row[V.VIOLATIONS_COL]}
        want_ids = {c for c in want.columns if not want.loc[idx, c]}
        assert got_ids == want_ids, f"row {idx}: {got_ids} != {want_ids}"


def test_violation_rates_are_seeded(seq_df, compiled):
    rows = V.all_violations(seq_df, compiled, id_column="doc_id")
    counts = {
        r["constraint_id"]: r["n"]
        for r in rows.groupBy("constraint_id").agg(F.count("*").alias("n")).collect()
    }
    # seeded rates from FIXTURES.md §1 (binomial tolerance, N=20k)
    assert 0 < counts.get("doc_id_not_null", 0) < N * 0.002
    assert counts.get("n_tok_matches", 0) > N * 0.0005
    assert counts.get("tokens_in_vocab", 0) > N * 0.0005
    assert counts.get("source_known", 0) > N * 0.0002
    assert counts.get("doc_id_unique", 0) >= 2  # dup pairs both flagged


def test_unique_flags_both_members(spark, compiled):
    df = spark.createDataFrame(
        [("a", [1], 1, "books"), ("a", [2], 1, "books"), ("b", [3], 1, "books")],
        schema="doc_id string, tokens array<int>, n_tok int, source string",
    )
    from medea_ps_spark.plans.constraints import Unique as U

    out = V.unique_violations(df, U("doc_id_unique", "doc_id")).collect()
    assert len(out) == 2 and all(r["constraint_id"] == "doc_id_unique" for r in out)


def test_referential_broadcast_plan(seq_df, compiled):
    c = next(
        c for c in compiled.table_constraints if c.name == "source_known"
    )
    out = V.referential_violations(seq_df, c)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_partition_verdicts(seq_df, compiled):
    validated = V.validate(seq_df, compiled)
    verdicts = V.partition_verdicts(validated, "source").collect()
    assert sum(r["n_rows"] for r in verdicts) == N
    by_src = {r["source"]: r for r in verdicts}
    # Zipf skew: dominant source holds far more than uniform share (5%)
    top = max(r["n_rows"] for r in verdicts)
    assert top > N * 0.35
    for r in verdicts:
        assert r["n_passed"] + r["n_failed"] == r["n_rows"]


def test_determinism_across_parallelism(spark):
    a = synthetic.sequences(spark, 2000, seed=7, num_partitions=2)
    b = synthetic.sequences(spark, 2000, seed=7, num_partitions=16)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_single_pass_plan(seq_df, compiled):
    """Row validation must be one projection over the scan — no shuffle,
    no extra scan (SURVEY.md §7 'Violation-row collection')."""
    validated = V.validate(seq_df, compiled)
    plan = validated._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_violation_count_fast_paths_match_row_paths(spark):
    """unique_violation_count / referential_violation_count (agg-only,
    no join-back / no anti-join) must equal the violation-ROW paths'
    counts exactly — incl. NULL keys (excluded from uniqueness,
    violations for referential)."""
    from medea_ps_spark.operators import validator as V
    from medea_ps_spark.plans.constraints import ReferentialIn, Unique

    rows = [
        ("a", "web"), ("a", "web"), ("a", "books"),   # key a ×3
        ("b", "web"), ("c", None), (None, "bogus"),   # null key + null src
        ("d", "unknown"), ("e", "web"), ("e", "web"), # key e ×2
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    u = Unique("u", "doc_id")
    r = ReferentialIn("r", "source", dim_values=("web", "books"))
    assert V.unique_violation_count(df, u) == V.unique_violations(
        df, u, "doc_id"
    ).count() == 5
    assert V.referential_violation_count(df, r) == V.referential_violations(
        df, r, "doc_id"
    ).count() == 3


def test_partition_verdicts_tolerance(seq_df, compiled):
    """max_fail_rate makes the PARTITION verdict tolerant: strict 0.0
    fails any partition with a bad row (reference semantics); a rate
    above every partition's observed fail share passes all; the verdict
    flips exactly at n_failed/n_rows."""
    import pytest as _pytest

    validated = V.validate(seq_df, compiled)
    strict = {r["source"]: r for r in V.partition_verdicts(validated, "source").collect()}
    for r in strict.values():
        assert r["partition_passed"] == (r["n_failed"] == 0)
    lax = {
        r["source"]: r
        for r in V.partition_verdicts(validated, "source", max_fail_rate=0.999).collect()
    }
    assert all(r["partition_passed"] for r in lax.values())
    # per-partition boundary: rate exactly n_failed/n_rows passes (<=)
    for src, r in strict.items():
        if r["n_failed"] == 0:
            continue
        rate = r["n_failed"] / r["n_rows"]
        at = {
            x["source"]: x
            for x in V.partition_verdicts(validated, "source", max_fail_rate=rate).collect()
        }
        assert at[src]["partition_passed"]
        break
    with _pytest.raises(ValueError):
        V.partition_verdicts(validated, "source", max_fail_rate=1.0)
