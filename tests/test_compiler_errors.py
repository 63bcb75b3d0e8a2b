"""Compile-error taxonomy tests — engine analogues of the reference's
schema-builder fail corpus (/root/reference/conformance/schema-builder/fail/,
error sum type at /root/reference/src/Data/Medea/Loader.purs:17-57)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from medea_ps_spark import errors as E
from medea_ps_spark.plans.compiler import Registry, fingerprint_set
from medea_ps_spark.plans.constraints import (
    AnyOf,
    ArrayLenBetween,
    ConstraintSet,
    ElementsInRange,
    InRange,
    IsIn,
    Matches,
    NotNull,
    Ref,
    ReferentialIn,
    SizeEquals,
    StatsBound,
    TypeIs,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)


def reg_with(*constraints, extra_sets=()):
    r = Registry()
    r.register(ConstraintSet("$start", list(constraints)))
    for s in extra_sets:
        r.register(s)
    return r


def test_duplicate_set_name():  # ≙ duplicate-schemata.medea
    r = Registry()
    r.register(ConstraintSet("$start", []))
    with pytest.raises(E.MultipleSchemaDefinition):
        r.register(ConstraintSet("$start", []))


def test_reserved_name():  # ≙ reserved-redefined.medea
    with pytest.raises(E.SchemaNameReserved):
        Registry().register(ConstraintSet("$boolean", []))


def test_no_start_schema():  # ≙ no-start-schema.medea
    r = Registry()
    r.register(ConstraintSet("other", []))
    with pytest.raises(E.StartSchemaMissing):
        r.compile(SCHEMA)


def test_dangling_ref():  # ≙ missing-schema.medea
    r = reg_with(Ref("r", target="ghost"))
    with pytest.raises(E.MissingSchemaDefinition):
        r.compile(SCHEMA)


def test_self_typing_cycle():  # ≙ self-typing.medea
    r = Registry()
    r.register(ConstraintSet("$start", [Ref("r", target="$start")]))
    with pytest.raises(E.SelfTypingSchema):
        r.compile(SCHEMA)


def test_indirect_cycle():  # ≙ indirect-self-typing.medea
    r = Registry()
    r.register(ConstraintSet("$start", [Ref("r", target="a")]))
    r.register(ConstraintSet("a", [Ref("r", target="b")]))
    r.register(ConstraintSet("b", [Ref("r", target="a")]))
    with pytest.raises(E.SelfTypingSchema):
        r.compile(SCHEMA)


def test_isolated_set():  # ≙ isolated-schemata.medea
    r = Registry()
    r.register(ConstraintSet("$start", []))
    r.register(ConstraintSet("orphan", []))
    with pytest.raises(E.IsolatedSchemata):
        r.compile(SCHEMA)
    r.compile(SCHEMA, allow_isolated=True)  # opt-out works


def test_min_more_than_max():  # ≙ type-length.medea
    r = reg_with(ArrayLenBetween("len", "tokens", 5, 2))
    with pytest.raises(E.MinimumLengthGreaterThanMaximum):
        r.compile(SCHEMA)


def test_duplicate_constraint_name():  # ≙ duplicate-prop.medea
    r = reg_with(NotNull("c", "doc_id"), NotNull("c", "source"))
    with pytest.raises(E.MultiplePropSchemaDefinition):
        r.compile(SCHEMA)


def test_array_constraint_on_scalar():  # ≙ list-spec-without-array-*.medea
    r = reg_with(ElementsInRange("e", "n_tok", 0, 10))
    with pytest.raises(E.ColumnTypeMismatch):
        r.compile(SCHEMA)


def test_matches_on_non_string():  # ≙ stringVals-without-string.medea
    r = reg_with(Matches("m", "n_tok", "^a"))
    with pytest.raises(E.ColumnTypeMismatch):
        r.compile(SCHEMA)


def test_unknown_column():
    r = reg_with(NotNull("c", "nope"))
    with pytest.raises(E.UnknownColumn):
        r.compile(SCHEMA)


def test_type_is(spark):
    r = reg_with(TypeIs("t", "n_tok", types=("int",)))
    r.compile(SCHEMA)
    r2 = reg_with(TypeIs("t", "n_tok", types=("string",)))
    with pytest.raises(E.ColumnTypeMismatch):
        r2.compile(SCHEMA)


def test_empty_anyof():
    r = reg_with(AnyOf("a", branches=()))
    with pytest.raises(E.EmptyLengthSpec):
        r.compile(SCHEMA)


def test_statsbound_bad_agg():
    r = reg_with(StatsBound("s", "n_tok", agg="median"))
    with pytest.raises(E.SchemaError):
        r.compile(SCHEMA)


def test_referential_needs_dim():
    r = reg_with(ReferentialIn("rf", "source"))
    with pytest.raises(E.SchemaError):
        r.compile(SCHEMA)


def test_fingerprint_changes_with_rules():
    r1 = reg_with(NotNull("c", "doc_id"))
    r2 = reg_with(NotNull("c", "doc_id"), InRange("r", "n_tok", 0, 5))
    assert fingerprint_set(r1, "$start") != fingerprint_set(r2, "$start")
    r1b = reg_with(NotNull("c", "doc_id"))
    assert fingerprint_set(r1, "$start") == fingerprint_set(r1b, "$start")


def test_fingerprint_covers_referenced_sets():
    base = ConstraintSet("leaf", [InRange("r", "n_tok", 0, 5)])
    changed = ConstraintSet("leaf", [InRange("r", "n_tok", 0, 6)])
    r1 = reg_with(Ref("r", target="leaf"), extra_sets=[base])
    r2 = reg_with(Ref("r", target="leaf"), extra_sets=[changed])
    assert fingerprint_set(r1, "$start") != fingerprint_set(r2, "$start")
