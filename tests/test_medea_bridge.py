"""Medea→columnar bridge: the columnar verdict must agree with the
reference-semantics JSON validator on the SAME data (rows serialized to
JSON documents) — the strongest dual-oracle available."""

from __future__ import annotations

import json

import pytest

from medea_ps_spark import errors as E
from medea_ps_spark.operators import validator as V
from medea_ps_spark.plans.compiler import Registry
from medea_ps_spark.plans.medea.analysis import load_schema
from medea_ps_spark.plans.medea.bridge import columnar_constraints
from medea_ps_spark.plans.medea.validate import validate_value

SCHEMA_TEXT = """$schema $start
    $type
        $object
    $properties
        $property-name "name"
        $property-schema title
        $property-name "score"
        $property-schema $number
        $property-name "tags"
        $property-schema taglist
        $optional-property

$schema title
    $type
        $string
    $string-values
        "dr"
        "prof"
        "none"

$schema taglist
    $type
        $array
    $min-length 1
    $max-length 3
    $element-type
        $string
"""


@pytest.fixture(scope="module")
def medea_map():
    return load_schema(SCHEMA_TEXT)


ROWS = [
    ("dr", 1.5, ["a"]),          # valid
    ("prof", 2.0, ["a", "b", "c"]),  # valid
    ("none", 0.0, None),         # valid (tags optional → null ok)
    ("king", 1.0, ["a"]),        # enum violation
    (None, 1.0, ["a"]),          # required name missing (null)
    ("dr", None, ["a"]),         # required score missing (null)
    ("dr", 3.0, []),             # min-length violation
    ("dr", 3.0, ["a", "b", "c", "d"]),  # max-length violation
]


def row_to_doc(r):
    d = {}
    if r[0] is not None:
        d["name"] = r[0]
    if r[1] is not None:
        d["score"] = r[1]
    if r[2] is not None:
        d["tags"] = r[2]
    return d


def test_bridge_agrees_with_reference_validator(spark, medea_map):
    df = spark.createDataFrame(
        ROWS, "name string, score double, tags array<string>"
    )
    cset, warnings = columnar_constraints(medea_map, df.schema)
    reg = Registry()
    reg.register(cset)
    compiled = reg.compile(df.schema, root="$start")
    got = V.validate(df, compiled).collect()
    for r, row in zip(got, ROWS):
        want_ok, _err = validate_value(medea_map, row_to_doc(row))
        assert r["passed"] == want_ok, (row, r["violations"], _err)


def test_bridge_emits_expected_constraints(medea_map, spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
        ]
    )
    cset, warnings = columnar_constraints(medea_map, schema)
    names = {c.name for c in cset.constraints}
    assert "name__required" in names and "score__required" in names
    assert any(n.startswith("name__enum") for n in names)
    assert any(n.startswith("tags__len") for n in names)
    assert not any(n.startswith("tags__required") for n in names)  # optional


def test_bridge_rejects_wrong_column_type(medea_map):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("name", T.IntegerType()),  # must be string
            T.StructField("score", T.DoubleType()),
        ]
    )
    with pytest.raises(E.SchemaError):
        columnar_constraints(medea_map, schema)


def test_bridge_closed_object():
    m = load_schema(
        "$schema $start\n    $type\n        $object\n    $properties\n"
        '        $property-name "a"\n        $property-schema $number\n'
    )
    from pyspark.sql import types as T

    ok = T.StructType([T.StructField("a", T.LongType())])
    cset, _ = columnar_constraints(m, ok)
    assert {c.name for c in cset.constraints} == {"a__required"}
    bad = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.LongType())]
    )
    with pytest.raises(E.ColumnTypeMismatch):
        columnar_constraints(m, bad)


def test_bridge_missing_required_column():
    m = load_schema(
        "$schema $start\n    $type\n        $object\n    $properties\n"
        '        $property-name "a"\n'
    )
    from pyspark.sql import types as T

    # NB an extra column would trip the closed-object check FIRST (the
    # reference also reports banned-additional before missing-required,
    # Medea.purs:282-314) — so probe with an empty row shape
    with pytest.raises(E.UnknownColumn):
        columnar_constraints(m, T.StructType([]))
