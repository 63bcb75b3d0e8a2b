"""Typed error taxonomy for the constraint compiler and Medea front-end.

Mirrors the reference's ``LoaderError`` sum type
(/root/reference/src/Data/Medea/Loader.purs:17-57) so that every failure
mode is programmatically distinguishable (SPEC.md "unique error
condition" mandate, /root/reference/SPEC.md:27-37). Each reference
constructor maps to one exception class below; the engine adds a few
constructors of its own for the column-constraint generalization
(schema/column type mismatches against a Spark StructType).
"""

from __future__ import annotations


class MedeaError(Exception):
    """Base class for every compile- or load-time error."""


# ---------------------------------------------------------------------------
# Parse-time errors (reference: ParserError wrapping MedeaParseErr)
# ---------------------------------------------------------------------------


class ParserError(MedeaError):
    """Schema graph file failed to parse (Loader.purs:25).

    Carries (line, message). All syntax-level failures — wrong
    indentation, unknown reserved identifier, missing sigil, leading
    zero, bad string — are ParserError, matching the reference's
    classifier (test/TestM.purs:76-78).
    """

    def __init__(self, message: str, line: int | None = None):
        self.line = line
        super().__init__(f"line {line}: {message}" if line is not None else message)


class NotUtf8(ParserError):
    """Input bytes are not valid UTF-8 (Loader.purs:19)."""


class IdentifierTooLong(ParserError):
    """Identifier exceeded 32 bytes (Loader.purs:21, SPEC.md Identifiers)."""


class LeadingZero(ParserError):
    """Natural number starting with 0 (Parser/Primitive.purs:252-266)."""


class EmptyLengthSpec(ParserError):
    """Array spec with no min/max/element/tuple (Loader.purs:23)."""


class ConflictingSpecRequirements(ParserError):
    """List + tuple specs together, or additional-property-schema without
    additional-properties-allowed (Parser/Spec/Array.purs:50-55,
    Parser/Spec/Object.purs parseSpecification)."""


class EmptyStringValueSpec(ParserError):
    """$string-values with no string lines (Parser/Spec/String.purs:34-41)."""


# ---------------------------------------------------------------------------
# Schema-build (analysis) errors — reference: Analysis.purs via Loader.purs
# ---------------------------------------------------------------------------


class SchemaError(MedeaError):
    """Base for analysis-stage failures (test/TestM.purs:80-115)."""


class StartSchemaMissing(SchemaError):
    """No $start schema (Loader.purs:27, Analysis.purs:174-177)."""


class SelfTypingSchema(SchemaError):
    """Cyclic types-as relation (Loader.purs:29, AcyclicAdjacencyMap DFS)."""


class MultipleSchemaDefinition(SchemaError):
    """Duplicate schema name (Loader.purs:31, Analysis.purs:106-110)."""


class MissingSchemaDefinition(SchemaError):
    """Dangling type reference (Loader.purs:33)."""


class SchemaNameReserved(SchemaError):
    """Non-$start reserved naming identifier (Loader.purs:35)."""


class IsolatedSchemata(SchemaError):
    """Unreferenced non-start schema (Loader.purs:37, Analysis.purs:200-215)."""


class MissingPropSchemaDefinition(SchemaError):
    """Dangling property-schema reference (Loader.purs:39)."""


class MissingListSchemaDefinition(SchemaError):
    """Dangling element-type reference (Loader.purs:41)."""


class MissingTupleSchemaDefinition(SchemaError):
    """Dangling tuple positional reference (Loader.purs:43)."""


class MinimumLengthGreaterThanMaximum(SchemaError):
    """min-length > max-length (Loader.purs:45, Analysis.purs:122-124)."""


class MultiplePropSchemaDefinition(SchemaError):
    """Duplicate property name in one object spec (Loader.purs:48)."""


class PropertySpecWithoutObjectType(SchemaError):
    """$properties but $object not in types (Loader.purs:51)."""


class ListSpecWithoutArrayType(SchemaError):
    """List spec but $array not in types (Loader.purs:53)."""


class TupleSpecWithoutArrayType(SchemaError):
    """Tuple spec but $array not in types (Loader.purs:55)."""


class StringSpecWithoutStringType(SchemaError):
    """$string-values but $string not in types (Loader.purs:57)."""


# ---------------------------------------------------------------------------
# Engine-specific compile errors (no reference counterpart — the column
# generalization needs StructType compatibility checks, SURVEY.md §2B)
# ---------------------------------------------------------------------------


class ColumnTypeMismatch(SchemaError):
    """A constraint targets a column whose Spark type can't satisfy it."""


class UnknownColumn(SchemaError):
    """A constraint references a column absent from the table schema."""


# ---------------------------------------------------------------------------
# Validation-time errors (reference: ValidationError, Medea.purs:108-119).
# In the engine these become constraint_id values on violation rows, not
# exceptions — but the Medea-compat JSON validator raises/tags them.
# ---------------------------------------------------------------------------

# constraint_id vocabulary preserved from the reference error taxonomy
NOT_JSON = "NotJSON"
WRONG_TYPE = "WrongType"
NOT_ONE_OF_OPTIONS = "NotOneOfOptions"
ADDITIONAL_PROP_BANNED = "AdditionalPropFoundButBanned"
REQUIRED_PROP_MISSING = "RequiredPropertyIsMissing"
OUT_OF_BOUNDS_ARRAY_LENGTH = "OutOfBoundsArrayLength"
IMPLEMENTATION_ERROR = "ImplementationError"
