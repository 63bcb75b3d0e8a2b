"""Layer-2 conformance: the reference's schema-builder corpus
(/root/reference/conformance/schema-builder/{pass,fail}; runner at
/root/reference/test/SchemaBuilder/SchemaBuilder.purs:10-30). Fail files
parse but must be rejected by analysis with a schema-class error
(≙ isSchemaError, test/TestM.purs:80-115)."""

from __future__ import annotations

import glob
import os

import pytest

from medea_ps_spark import errors as E
from medea_ps_spark.plans.medea.analysis import compile_schemata, load_schema_from_file
from medea_ps_spark.plans.medea.parser import parse_file

CONF = "/root/reference/conformance"

PASS_FILES = sorted(glob.glob(f"{CONF}/schema-builder/pass/*.medea"))
FAIL_FILES = sorted(glob.glob(f"{CONF}/schema-builder/fail/*.medea"))
VALIDATION_FILES = sorted(glob.glob(f"{CONF}/validation/*.medea"))


def _name(p):
    return os.path.basename(p)


@pytest.mark.parametrize("path", PASS_FILES, ids=_name)
def test_builder_pass(path):
    m = load_schema_from_file(path)
    assert "$start" in m


@pytest.mark.parametrize("path", FAIL_FILES, ids=_name)
def test_builder_fail(path):
    specs = parse_file(path)  # must parse...
    with pytest.raises(E.SchemaError):  # ...but fail analysis
        compile_schemata(specs)


@pytest.mark.parametrize("path", VALIDATION_FILES, ids=_name)
def test_all_validation_schemas_build(path):
    m = load_schema_from_file(path)
    assert "$start" in m


EXPECTED_ERRORS = {
    "duplicate-prop.medea": E.MultiplePropSchemaDefinition,
    "duplicate-schemata.medea": E.MultipleSchemaDefinition,
    "indirect-self-typing.medea": E.SelfTypingSchema,
    "isolated-schemata.medea": E.IsolatedSchemata,
    "missing-additional-prop-schema.medea": E.MissingPropSchemaDefinition,
    # NB: despite the filename, the fixture's dangling ref sits in a
    # $tuple block (the reference only asserts isSchemaError)
    "missing-list-schema.medea": E.MissingTupleSchemaDefinition,
    "missing-prop-schema.medea": E.MissingPropSchemaDefinition,
    "missing-schema.medea": E.MissingSchemaDefinition,
    "missing-tuple-schema.medea": E.MissingTupleSchemaDefinition,
    "no-start-schema.medea": E.StartSchemaMissing,
    "reserved-redefined.medea": E.SchemaNameReserved,
    "self-typing.medea": E.SelfTypingSchema,
    "stringVals-without-string.medea": E.StringSpecWithoutStringType,
    "tuple-spec-without-array.medea": E.TupleSpecWithoutArrayType,
    "type-length.medea": E.MinimumLengthGreaterThanMaximum,
}


@pytest.mark.parametrize(
    "fname,err", sorted(EXPECTED_ERRORS.items()), ids=lambda x: str(x)[:40]
)
def test_builder_fail_exact_error(fname, err):
    """Unique-error-condition mandate (SPEC.md:27-37): each failure class
    must be programmatically distinguishable."""
    specs = parse_file(f"{CONF}/schema-builder/fail/{fname}")
    with pytest.raises(err):
        compile_schemata(specs)
