"""Layer-1 conformance: the reference's parser corpus
(/root/reference/conformance/parser/{pass,fail}; runner at
/root/reference/test/Parser/Parser.purs:11-39). Every pass file must
parse; every fail file must raise a parse-class error
(ParserError, ≙ isParseError in test/TestM.purs:76-78)."""

from __future__ import annotations

import glob
import os

import pytest

from medea_ps_spark import errors as E
from medea_ps_spark.plans.medea.parser import parse_file, parse_specification

CONF = "/root/reference/conformance"

PASS_FILES = sorted(glob.glob(f"{CONF}/parser/pass/*.medea"))
FAIL_FILES = sorted(glob.glob(f"{CONF}/parser/fail/*.medea"))


def _name(p):
    return os.path.basename(p)


@pytest.mark.parametrize("path", PASS_FILES, ids=_name)
def test_parser_pass(path):
    specs = parse_file(path)
    assert len(specs) >= 1


@pytest.mark.parametrize("path", FAIL_FILES, ids=_name)
def test_parser_fail(path):
    with pytest.raises(E.ParserError):
        parse_file(path)


def test_not_utf8_is_distinct():
    with pytest.raises(E.NotUtf8):
        parse_specification(b"\xff\xfe$schema $start\n")


def test_identifier_too_long():
    long = "x" * 33
    with pytest.raises(E.IdentifierTooLong):
        parse_specification(f"$schema {long}\n")


def test_leading_zero_natural():
    with pytest.raises(E.LeadingZero):
        parse_specification(
            "$schema $start\n    $type\n        $array\n    $min-length 03\n"
        )


def test_schemata_roundtrip_shapes():
    """Spot-check the parsed AST for a multi-schema file."""
    specs = parse_file(f"{CONF}/validation/3-tuple.medea")
    assert [s.name for s in specs] == ["$start", "foo", "any"]
    s0 = specs[0]
    assert s0.types == ["$array"]
    assert s0.array is not None and s0.array.tuple_spec == ["foo", "$boolean", "any"]
    assert specs[2].types == [] and specs[2].array is None


def test_object_spec_shape():
    specs = parse_file(f"{CONF}/validation/map-with-2-specified.medea")
    obj = specs[0].obj
    assert obj is not None
    assert [(p.name, p.schema, p.optional) for p in obj.properties] == [
        ("foo", "foo", False),
        ("bazz", None, True),
    ]
    assert obj.additional_allowed and obj.additional_schema == "bar"
