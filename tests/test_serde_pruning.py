"""Constraint-set serde round-trip + partition-pruning plan gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.plans import serde
from medea_ps_spark.plans.compiler import Registry, fingerprint_set
from medea_ps_spark.plans.constraints import (
    AnyOf, ArrayLenBetween, ConstraintSet, Drift, ElementsInRange, Expr,
    InRange, IsIn, Matches, NotNull, Ref, ReferentialIn, SizeEquals,
    StatsBound, TupleRule, TypeIs, Unique,
)


def full_registry() -> Registry:
    reg = Registry()
    reg.register(
        ConstraintSet(
            "$start",
            [
                NotNull("a", "doc_id"),
                TypeIs("b", "n_tok", types=("int",)),
                IsIn("c", "source", ["x", "y"]),
                InRange("d", "n_tok", 1, 10),
                Matches("e", "doc_id", "^doc-"),
                ArrayLenBetween("f", "tokens", 1, None),
                ElementsInRange("g", "tokens", 0, 100),
                TupleRule("i", "tokens", positions=("x > 0", "true")),
                SizeEquals("j", "n_tok", "tokens"),
                Expr("k", sql="n_tok > 0", observed_sql="n_tok"),
                AnyOf("l", branches=(InRange("m", "n_tok", 0, 1), Ref("n", target="leaf"))),
                Unique("o", "doc_id"),
                ReferentialIn("p", "source", dim_values=["x"]),
                StatsBound("q", "n_tok", agg="max", hi=100),
                Drift("r", "n_tok", test="ks", alpha=0.01),
            ],
        )
    )
    reg.register(ConstraintSet("leaf", [NotNull("z", "source")]))
    return reg


def test_registry_json_roundtrip_preserves_fingerprint():
    reg = full_registry()
    blob = serde.registry_to_json(reg)
    reg2 = serde.registry_from_json(blob)
    assert fingerprint_set(reg, "$start") == fingerprint_set(reg2, "$start")
    # and the round-tripped registry compiles identically
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
        ]
    )
    # compile requires a SparkContext for Column building — checked in
    # the spark test below; here assert graph checks pass
    reg2.check_graph()


def test_roundtripped_registry_validates(spark):
    from medea_ps_spark.operators import validator as V

    reg2 = serde.registry_from_json(serde.registry_to_json(full_registry()))
    df = spark.createDataFrame(
        [("doc-1", [1, 2], 2, "x"), (None, [], 0, "zz")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    out = V.validate(df, reg2.compile(df.schema)).collect()
    assert [r["passed"] for r in out] == [True, False]
    assert any(v["constraint_id"] == "a" for v in out[1]["violations"])


def test_unknown_kind_rejected():
    with pytest.raises(ValueError):
        serde.constraint_from_dict({"kind": "Bogus", "name": "x"})


def test_partition_pruning_reaches_scan(spark, tmp_path):
    """Filters on the partition column must prune directories at plan
    time (the parquet analogue of Iceberg partition pruning)."""
    from medea_ps_spark.sources.synthetic import sequences

    p = str(tmp_path / "t")
    sequences(spark, 3000, seed=13).write.partitionBy("source").parquet(p)
    q = (
        spark.read.parquet(p)
        .where(F.col("source") == "books")
        .select("doc_id")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "books" in plan
    # and the non-partition filter variant must NOT claim pruning
    q2 = spark.read.parquet(p).where(F.col("n_tok") > 5).select("doc_id")
    plan2 = q2._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(n_tok), GreaterThan(n_tok,5)]" in plan2
