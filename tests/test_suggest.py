"""Constraint suggestion (operators/suggest.py): the profile → suggest →
compile → validate closed loop, rule-by-rule emission, and robustness on
randomized frames."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F, types as T

from medea_ps_spark.operators import stats as ST
from medea_ps_spark.operators import validator as V
from medea_ps_spark.operators.suggest import (
    profile_columns,
    suggest_constraints,
    suggestions_rows,
)
from medea_ps_spark.plans.compiler import Registry
from medea_ps_spark.plans.constraints import Unique

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def _seq_df(spark, n=200, null_score_every=7):
    rows = []
    rng = random.Random(11)
    for i in range(n):
        toks = [rng.randrange(0, 1000) for _ in range(rng.randrange(1, 9))]
        rows.append(
            (
                f"d{i:05d}",
                toks,
                len(toks),
                ["web", "books", "code"][i % 3],
                None if i % null_score_every == 0 else round(rng.random(), 6),
            )
        )
    return spark.createDataFrame(rows, SCHEMA)


def _compile(cs, schema):
    return Registry().register(cs).compile(schema, root=cs.name)


def _assert_clean(df, cs):
    """The closed-loop invariant: every suggested constraint holds on
    the data it was profiled from."""
    compiled = _compile(cs, df.schema)
    validated = V.validate(df, compiled)
    assert validated.where(~F.col(V.PASSED_COL)).count() == 0
    for tc in compiled.table_constraints:
        if isinstance(tc, Unique):
            assert V.unique_violations(df, tc).count() == 0


def test_closed_loop_and_rules(spark):
    df = _seq_df(spark)
    cs = suggest_constraints(df, unique_candidates=["doc_id"])
    by_id = {c.name: c for c in cs.constraints}
    # NotNull everywhere except the seeded-null score column
    assert "nn_doc_id" in by_id and "nn_tokens" in by_id and "nn_n_tok" in by_id
    assert "nn_score" not in by_id
    # numeric range on n_tok and score (range even when nulls exist)
    assert by_id["range_n_tok"].lo == 1 and by_id["range_n_tok"].hi == 8
    assert 0.0 <= by_id["range_score"].lo <= by_id["range_score"].hi < 1.0
    # enum on the 3-value source, sorted for determinism
    assert tuple(by_id["enum_source"].values) == ("books", "code", "web")
    # high-cardinality doc_id must NOT be an enum
    assert "enum_doc_id" not in by_id
    # array size + integral element bounds (hi exclusive: max+1)
    assert by_id["len_tokens"].lo == 1 and by_id["len_tokens"].hi == 8
    assert by_id["elems_tokens"].lo >= 0
    assert by_id["elems_tokens"].hi <= 1000
    # declared unique candidate confirmed exactly
    assert "uniq_doc_id" in by_id
    _assert_clean(df, cs)


def test_hll_nominates_unique_without_declaration(spark):
    df = _seq_df(spark)
    cs = suggest_constraints(df)  # no unique_candidates passed
    names = {c.name for c in cs.constraints}
    assert "uniq_doc_id" in names  # HLL nomination + exact confirmation
    assert "uniq_source" not in names  # 3 distinct values over 200 rows


def test_suggestions_catch_planted_violations(spark):
    df = _seq_df(spark)
    cs = suggest_constraints(df, unique_candidates=["doc_id"])
    compiled = _compile(cs, df.schema)
    bad = df.limit(5).select(
        F.lit(None).cast("string").alias("doc_id"),          # nn_doc_id
        F.array(F.lit(-1)).alias("tokens"),                  # elems_tokens lo
        F.lit(99).alias("n_tok"),                            # range_n_tok hi
        F.lit("wiki").alias("source"),                       # enum_source
        F.lit(2.0).alias("score"),                           # range_score hi
    )
    viols = V.violation_rows(V.validate(bad, compiled))
    hit = {r["constraint_id"] for r in viols.collect()}
    assert {
        "nn_doc_id", "elems_tokens", "range_n_tok", "enum_source", "range_score"
    } <= hit
    # planted duplicate trips the table-level Unique
    dup = df.unionByName(df.limit(1))
    uniq = [t for t in compiled.table_constraints if isinstance(t, Unique)][0]
    assert V.unique_violations(dup, uniq).count() == 2  # both members flagged


def test_partition_statsbound_holds_per_partition(spark):
    df = _seq_df(spark)
    cs = suggest_constraints(df, partition_col="source")
    bounds = [c for c in cs.constraints if c.name.startswith("nullrate_")]
    assert {b.column for b in bounds} == {"doc_id", "tokens", "n_tok", "score"}
    v = ST.stats_bound_verdicts(df, bounds, partition_col="source")
    assert v.where(~F.col("passed")).count() == 0
    # the score ceiling is the WORST partition's rate — strictly above 0
    score_hi = [b for b in bounds if b.column == "score"][0].hi
    assert 0.0 < score_hi < 1.0


def test_empty_and_all_null_columns_yield_no_evidence(spark):
    empty = spark.createDataFrame([], SCHEMA)
    assert suggest_constraints(empty).constraints == []
    allnull = spark.createDataFrame(
        [(None, None, None, None, None)] * 3, SCHEMA
    )
    names = {c.name for c in suggest_constraints(allnull).constraints}
    assert names == set()  # no NotNull, no ranges, no enum, no unique


def test_profile_columns_shape(spark):
    df = _seq_df(spark)
    prof = profile_columns(df)
    assert prof["$table"]["n_rows"] == 200
    assert prof["n_tok"]["min"] == 1 and prof["n_tok"]["max"] == 8
    assert prof["score"]["nulls"] > 0
    assert prof["tokens"]["min_size"] == 1 and prof["tokens"]["max_size"] == 8
    assert prof["source"]["approx_distinct"] >= 2


def test_suggestions_rows_rendering(spark):
    df = _seq_df(spark)
    cs = suggest_constraints(df, unique_candidates=["doc_id"])
    rows = suggestions_rows(cs)
    ids = [r["constraint_id"] for r in rows]
    assert ids == sorted(ids) and len(ids) == len(set(ids))
    kinds = {r["kind"] for r in rows}
    assert {"NotNull", "InRange", "IsIn", "ArrayLenBetween",
            "ElementsInRange", "Unique"} <= kinds


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_randomized_closed_loop(spark, seed):
    """Fuzz the loop: random frames (random null patterns, cardinalities,
    ranges, array shapes) — suggestions must always validate clean on
    the frame they came from."""
    rng = random.Random(seed)
    n = rng.randrange(20, 120)
    srcs = [f"s{j}" for j in range(rng.randrange(1, 6))]
    rows = []
    for i in range(n):
        toks = (
            None
            if rng.random() < 0.1
            else [rng.randrange(-50, 5000) for _ in range(rng.randrange(0, 12))]
        )
        rows.append(
            (
                f"d{i}" if rng.random() > 0.05 else None,
                toks,
                rng.randrange(-3, 4000) if rng.random() > 0.2 else None,
                rng.choice(srcs),
                rng.uniform(-1e6, 1e6) if rng.random() > 0.3 else None,
            )
        )
    df = spark.createDataFrame(rows, SCHEMA)
    _assert_clean(df, suggest_constraints(df))
