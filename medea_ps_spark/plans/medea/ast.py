"""Raw AST of a parsed Medea schema graph file — IR #1 of the reference
lifecycle (SURVEY.md §3), ≙ Schemata.Specification
(/root/reference/src/Data/Medea/Parser/Spec/Schema.purs:19-25)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class ArraySpec:
    """≙ Parser/Spec/Array.purs Specification."""

    min_length: Optional[int] = None
    max_length: Optional[int] = None
    element_type: Optional[str] = None
    tuple_spec: Optional[List[str]] = None  # [] = empty tuple (unit)


@dataclass
class PropSpec:
    """≙ Parser/Spec/Property.purs Specification."""

    name: str
    schema: Optional[str] = None
    optional: bool = False


@dataclass
class ObjectSpec:
    """≙ Parser/Spec/Object.purs Specification."""

    properties: List[PropSpec] = field(default_factory=list)
    additional_allowed: bool = False
    additional_schema: Optional[str] = None


@dataclass
class SchemaSpec:
    """≙ Parser/Spec/Schema.purs Specification (permutation of blocks)."""

    name: str
    types: List[str] = field(default_factory=list)
    string_vals: List[str] = field(default_factory=list)
    array: Optional[ArraySpec] = None
    obj: Optional[ObjectSpec] = None


PRIMITIVES = ("$null", "$boolean", "$object", "$array", "$number", "$string")

RESERVED = frozenset(
    {
        "$schema", "$start", "$type", "$string-values", "$properties",
        "$property-name", "$property-schema", "$additional-properties-allowed",
        "$additional-property-schema", "$optional-property", "$min-length",
        "$max-length", "$element-type", "$tuple",
    }
    | set(PRIMITIVES)
)
