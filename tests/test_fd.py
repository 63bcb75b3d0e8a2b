"""FunctionalDependency constraint: violation rows vs a pandas oracle,
NULL semantics (dependent NULL is a value; determinant NULLs group
null-safely), the metrics-only count fast path, compile-time checks,
and serde round-trip."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from medea_ps_spark import errors as E
from medea_ps_spark.plans.compiler import Registry
from medea_ps_spark.plans.constraints import (
    ConstraintSet,
    FunctionalDependency,
    NotNull,
)
from medea_ps_spark.plans.serde import constraint_to_dict, constraint_from_dict
from medea_ps_spark.operators import validator as V


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        # doc 1..3 agree: shard "a" -> src "web"  (clean group)
        ("d1", "a", "web"),
        ("d2", "a", "web"),
        ("d3", "a", "web"),
        # shard "b" maps to two sources (violating group, 3 rows)
        ("d4", "b", "web"),
        ("d5", "b", "wiki"),
        ("d6", "b", "web"),
        # shard "c": NULL dependent next to a value → violating (2 rows)
        ("d7", "c", None),
        ("d8", "c", "code"),
        # shard NULL: grouped null-safely; both NULL dependents → clean
        ("d9", None, None),
        ("d10", None, None),
        # shard "e": only NULL dependents → one distinct value, clean
        ("d11", "e", None),
    ]
    return spark.createDataFrame(rows, "doc_id string, shard string, source string")


FD = FunctionalDependency("shard_fixes_source", determinants=("shard",), dependent="source")


def test_fd_violations_exact(frame):
    got = sorted(
        (r["doc_id"], r["constraint_id"]) for r in V.fd_violations(frame, FD).collect()
    )
    want = sorted((d, "shard_fixes_source") for d in ["d4", "d5", "d6", "d7", "d8"])
    assert got == want


def test_fd_observed_detail(frame):
    obs = {
        r["doc_id"]: r["observed"] for r in V.fd_violations(frame, FD).collect()
    }
    assert obs["d5"] == "b -> wiki (distinct=2)"
    assert obs["d7"] == "c -> null (distinct=2)"


def test_fd_null_determinants_grouped_null_safely(spark):
    # NULL-shard rows with MIXED dependents must be flagged (grouped
    # together like groupBy groups NULLs, not dropped by the join-back)
    df = spark.createDataFrame(
        [("x1", None, "web"), ("x2", None, "wiki")],
        "doc_id string, shard string, source string",
    )
    got = sorted(r["doc_id"] for r in V.fd_violations(df, FD).collect())
    assert got == ["x1", "x2"]


def test_fd_count_fast_path_matches_rows(frame):
    assert V.fd_violation_count(frame, FD) == V.fd_violations(frame, FD).count()
    clean = frame.where(F.col("shard").isin("a", "e") | F.col("shard").isNull())
    assert V.fd_violation_count(clean, FD) == 0


def test_fd_multi_determinant(spark):
    df = spark.createDataFrame(
        [
            ("d1", "a", 1, "web"),
            ("d2", "a", 2, "wiki"),  # different (shard,ver) group → fine
            ("d3", "a", 1, "web"),
            ("d4", "a", 1, "code"),  # violates (a,1)
        ],
        "doc_id string, shard string, ver int, source string",
    )
    c = FunctionalDependency("sv", determinants=("shard", "ver"), dependent="source")
    got = sorted(r["doc_id"] for r in V.fd_violations(df, c).collect())
    assert got == ["d1", "d3", "d4"]
    assert V.fd_violation_count(df, c) == 3


def test_fd_pandas_oracle_randomized(spark):
    import random

    rng = random.Random(99)
    rows = [
        (
            f"d{i}",
            rng.choice(["a", "b", "c", "d", None]),
            rng.choice(["web", "wiki", None]),
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id string, shard string, source string")
    got = sorted(r["doc_id"] for r in V.fd_violations(df, FD).collect())
    pdf = pd.DataFrame(rows, columns=["doc_id", "shard", "source"])
    key = pdf["shard"].fillna("\0NULL")
    dep = pdf["source"].fillna("\0NULL")
    bad_groups = dep.groupby(key).nunique()
    bad = set(bad_groups[bad_groups > 1].index)
    want = sorted(pdf.loc[key.isin(bad), "doc_id"])
    assert got == want


def test_fd_compile_checks(spark):
    df = spark.createDataFrame([("d", "a", "w")], "doc_id string, shard string, source string")
    reg = Registry()
    reg.register(
        ConstraintSet(
            "$start",
            [NotNull("nn", "doc_id"), FD],
        )
    )
    compiled = reg.compile(df.schema)
    assert any(isinstance(c, FunctionalDependency) for c in compiled.table_constraints)

    for bad in (
        FunctionalDependency("no_det", determinants=(), dependent="source"),
        FunctionalDependency("missing", determinants=("nope",), dependent="source"),
        FunctionalDependency("selfdep", determinants=("shard",), dependent="shard"),
    ):
        r = Registry()
        r.register(ConstraintSet("$start", [bad]))
        with pytest.raises(E.SchemaError):
            r.compile(df.schema)


def test_fd_in_all_violations(frame):
    reg = Registry()
    reg.register(ConstraintSet("$start", [NotNull("nn", "doc_id"), FD]))
    compiled = reg.compile(frame.schema)
    rows = V.all_violations(frame, compiled).collect()
    fd_rows = [r for r in rows if r["constraint_id"] == "shard_fixes_source"]
    assert len(fd_rows) == 5


def test_fd_serde_roundtrip():
    d = constraint_to_dict(FD)
    back = constraint_from_dict(d)
    assert back == FD
