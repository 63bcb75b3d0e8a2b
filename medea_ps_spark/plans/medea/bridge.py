"""Medea schema → columnar ConstraintSet bridge.

When documents have a fixed tabular shape (one DataFrame column per
top-level object property), a Medea schema can compile straight to the
engine's Catalyst fast path instead of the per-document JSON validator:
this is the concrete realization of SURVEY.md §1.4's mapping table.

``columnar_constraints(schema_map)`` walks the compiled $start graph:

  reference construct                engine constraint emitted
  ---------------------------------- -----------------------------------
  required property                  NotNull(col)
  property schema $string/$number/…  TypeIs(col, compatible spark types)
  custom schema w/ stringVals        IsIn(col, vals)
  custom schema w/ min/max-length    ArrayLenBetween(col, lo, hi)
  custom list element-type (prim)    ElementsSatisfy(col, type-pred)
  typesAs sum over prims             checked statically vs column type
  additionalProps=False              closed-column check at compile

Constructs that need dynamic typing (heterogeneous sums over a single
column, nested objects beyond the struct depth provided) are reported
in ``warnings`` and left to the JSON path — the bridge is sound
(never emits a weaker constraint than the schema demands for what it
does emit) and explicit about what it skipped.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import types as T

from ... import errors as E
from ..constraints import (
    ArrayLenBetween,
    Constraint,
    ConstraintSet,
    ElementsSatisfy,
    IsIn,
    NotNull,
)
from .analysis import ANY, CompiledMedea

_PRIM_TO_SPARK = {
    "string": (T.StringType,),
    "number": (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
               T.FloatType, T.DoubleType, T.DecimalType),
    "boolean": (T.BooleanType,),
    "array": (T.ArrayType,),
    "object": (T.StructType, T.MapType),
    "null": (T.NullType,),
}

_PRIM_ELEM_PRED = {
    "number": "x IS NOT NULL",  # numeric array element: non-null suffices
    "string": "x IS NOT NULL",
    "boolean": "x IS NOT NULL",
}


def _static_type_ok(node, dtype: T.DataType) -> bool:
    if node == ANY:
        return True
    if node[0] == "prim":
        return isinstance(dtype, _PRIM_TO_SPARK.get(node[1], ()))
    return True  # custom: checked recursively


def columnar_constraints(
    m: Dict[str, CompiledMedea],
    df_schema: T.StructType,
    root: str = "$start",
) -> Tuple[ConstraintSet, List[str]]:
    """Compile the root schema's OBJECT spec onto a DataFrame whose
    columns are the object's properties. Raises the reference taxonomy
    for hard incompatibilities; returns (set, warnings) otherwise."""
    scm = m[root]
    # resolve through a pure custom chain (e.g. $start types-as foo)
    seen = set()
    while (
        len(scm.types_as) == 1
        and next(iter(scm.types_as))[0] == "custom"
        and not scm.props
    ):
        ident = next(iter(scm.types_as))[1]
        if ident in seen:
            break
        seen.add(ident)
        scm = m[ident]
    if ("prim", "object") not in scm.types_as and ANY not in scm.types_as:
        raise E.PropertySpecWithoutObjectType(
            f"{root}: bridge target must be an object schema"
        )
    fields = {f.name: f.dataType for f in df_schema.fields}
    out: List[Constraint] = []
    warnings: List[str] = []

    # closed object: DataFrame columns must be a subset of declared props
    if scm.has_prop_spec and not scm.additional_props:
        extra = set(fields) - set(scm.props)
        if extra:
            raise E.ColumnTypeMismatch(
                f"closed object: unexpected columns {sorted(extra)} "
                f"(≙ AdditionalPropFoundButBanned, Medea.purs:303-308)"
            )

    for prop, (node, optional) in scm.props.items():
        if prop not in fields:
            if optional:
                continue
            raise E.UnknownColumn(
                f"required property {prop!r} has no column "
                f"(≙ RequiredPropertyIsMissing)"
            )
        dtype = fields[prop]
        if not optional:
            out.append(NotNull(f"{prop}__required", prop))
        _emit_node(m, node, prop, dtype, out, warnings)
    return ConstraintSet(root, out), warnings


def _emit_node(m, node, col, dtype, out, warnings, depth=0) -> None:
    if depth > 16 or node == ANY:
        return
    if node[0] == "prim":
        if not _static_type_ok(node, dtype):
            raise E.ColumnTypeMismatch(
                f"{col}: column type {dtype.simpleString()} can't satisfy "
                f"${node[1]} (≙ WrongType)"
            )
        return
    # custom schema
    scm = m[node[1]]
    prims = {n[1] for n in scm.types_as if n[0] == "prim"}
    customs = [n for n in scm.types_as if n[0] == "custom"]
    if ANY not in scm.types_as and prims:
        if not any(
            isinstance(dtype, _PRIM_TO_SPARK.get(p, ())) for p in prims
        ) and not customs:
            raise E.ColumnTypeMismatch(
                f"{col}: {dtype.simpleString()} matches none of "
                f"{sorted(prims)} from schema {node[1]!r}"
            )
    if scm.string_vals:
        if not isinstance(dtype, T.StringType):
            raise E.StringSpecWithoutStringType(col)
        out.append(IsIn(f"{col}__enum_{node[1]}", col, list(scm.string_vals)))
    if isinstance(dtype, T.ArrayType):
        if scm.min_len is not None or scm.max_len is not None:
            out.append(
                ArrayLenBetween(
                    f"{col}__len_{node[1]}", col, scm.min_len, scm.max_len
                )
            )
        if scm.array_type is not None and scm.array_type[0] == "list":
            elem = scm.array_type[1]
            if elem[0] == "prim" and elem[1] in _PRIM_ELEM_PRED:
                out.append(
                    ElementsSatisfy(
                        f"{col}__elems_{node[1]}", col,
                        _PRIM_ELEM_PRED[elem[1]],
                    )
                )
            elif elem[0] == "custom":
                inner = m[elem[1]]
                if inner.string_vals and isinstance(
                    dtype.elementType, T.StringType
                ):
                    vals = ", ".join(f"'{v}'" for v in inner.string_vals)
                    out.append(
                        ElementsSatisfy(
                            f"{col}__elems_{node[1]}", col, f"x IN ({vals})"
                        )
                    )
                else:
                    warnings.append(
                        f"{col}: element schema {elem[1]!r} not statically "
                        f"expressible; use the JSON path for it"
                    )
        elif scm.array_type is not None and scm.array_type[0] == "tuple":
            n = len(scm.array_type[1])
            out.append(ArrayLenBetween(f"{col}__tuple_{node[1]}", col, n, n))
            warnings.append(
                f"{col}: tuple positional schemas checked for arity only "
                f"(homogeneous Spark array)"
            )
    for sub in customs:
        _emit_node(m, sub, col, dtype, out, warnings, depth + 1)
