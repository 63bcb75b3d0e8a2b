"""Schema-graph analysis: AST → compiled schema map — IR #2 of the
reference lifecycle, ≙ compileSchemata
(/root/reference/src/Data/Medea/Analysis.purs:94-110) with the complete
check set of SURVEY.md §2B, raising the typed errors of
medea_ps_spark.errors (≙ Loader.purs:17-57).

TypeNode encoding: ("any",) | ("prim", <jsontype>) | ("custom", <name>)
≙ Analysis.purs:48-51.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from ... import errors as E
from .ast import PRIMITIVES, SchemaSpec

ANY = ("any",)
START = "$start"

JSONTYPES = {
    "$null": "null",
    "$boolean": "boolean",
    "$object": "object",
    "$array": "array",
    "$number": "number",
    "$string": "string",
}


def ident_to_node(ident: Optional[str]) -> Tuple:
    """≙ identToNode (Analysis.purs:218-221)."""
    if ident is None:
        return ANY
    if ident in JSONTYPES:
        return ("prim", JSONTYPES[ident])
    return ("custom", ident)


@dataclass
class CompiledMedea:
    """≙ CompiledSchema (Analysis.purs:62-73)."""

    name: str
    types_as: frozenset  # non-empty set of TypeNodes (defaultToAny)
    min_len: Optional[int] = None
    max_len: Optional[int] = None
    array_type: Optional[Tuple] = None  # ("list", node) | ("tuple", [nodes])
    props: Dict[str, Tuple[Tuple, bool]] = field(default_factory=dict)
    additional_props: bool = True
    additional_prop_schema: Tuple = ANY
    string_vals: List[str] = field(default_factory=list)
    has_prop_spec: bool = False


def compile_schema(spec: SchemaSpec) -> CompiledMedea:
    """≙ compileSchema (Analysis.purs:112-161), same check order."""
    name = spec.name
    if name.startswith("$") and name != START:
        raise E.SchemaNameReserved(name)
    a = spec.array
    min_len = a.min_length if a else None
    max_len = a.max_length if a else None
    if min_len is not None and max_len is not None and min_len > max_len:
        raise E.MinimumLengthGreaterThanMaximum(name)
    props: Dict[str, Tuple[Tuple, bool]] = {}
    if spec.obj:
        for p in spec.obj.properties:
            if p.name in props:
                raise E.MultiplePropSchemaDefinition(f"{name}.{p.name}")
            props[p.name] = (ident_to_node(p.schema), p.optional)
    # arrayTypes + tuple-arity folding (Analysis.purs:129,137-138,252-255)
    array_type: Optional[Tuple] = None
    if a is not None:
        if a.element_type is not None:
            array_type = ("list", ident_to_node(a.element_type))
        elif a.tuple_spec is not None:
            array_type = ("tuple", [ident_to_node(t) for t in a.tuple_spec])
            tuple_len = len(a.tuple_spec)
            min_len = min_len if min_len is not None else tuple_len
            max_len = max_len if max_len is not None else tuple_len
    types_as = (
        frozenset(ident_to_node(t) for t in spec.types)
        if spec.types
        else frozenset({ANY})
    )
    out = CompiledMedea(
        name=name,
        types_as=types_as,
        min_len=min_len,
        max_len=max_len,
        array_type=array_type,
        props=props,
        additional_props=spec.obj.additional_allowed if spec.obj else True,
        additional_prop_schema=ident_to_node(
            spec.obj.additional_schema if spec.obj else None
        ),
        string_vals=list(spec.string_vals),
        has_prop_spec=spec.obj is not None,
    )
    # spec/type consistency (Analysis.purs:286-313, same predicates)
    if out.has_prop_spec and ("prim", "object") not in types_as:
        raise E.PropertySpecWithoutObjectType(name)
    has_list_spec = (
        array_type is not None and array_type[0] == "list"
    ) or (array_type is None and (min_len is not None or max_len is not None))
    if has_list_spec and ("prim", "array") not in types_as:
        raise E.ListSpecWithoutArrayType(name)
    if array_type is not None and array_type[0] == "tuple" and (
        ("prim", "array") not in types_as
    ):
        raise E.TupleSpecWithoutArrayType(name)
    if out.string_vals and ("prim", "string") not in types_as:
        raise E.StringSpecWithoutStringType(name)
    return out


def _type_refs(scm: CompiledMedea) -> List[Tuple]:
    return list(scm.types_as)


def _prop_refs(scm: CompiledMedea) -> List[Tuple]:
    return [node for node, _ in scm.props.values()] + [scm.additional_prop_schema]


def _list_refs(scm: CompiledMedea) -> List[Tuple]:
    if scm.array_type and scm.array_type[0] == "list":
        return [scm.array_type[1]]
    return []


def _tuple_refs(scm: CompiledMedea) -> List[Tuple]:
    if scm.array_type and scm.array_type[0] == "tuple":
        return list(scm.array_type[1])
    return []


def compile_schemata(specs: List[SchemaSpec]) -> Dict[str, CompiledMedea]:
    """≙ compileSchemata (Analysis.purs:94-110): fold + whole-graph checks
    in the reference's order."""
    m: Dict[str, CompiledMedea] = {}
    for spec in specs:
        if spec.name in m:
            raise E.MultipleSchemaDefinition(spec.name)
        m[spec.name] = compile_schema(spec)
    if START not in m:
        raise E.StartSchemaMissing()
    _check_dangling(m, _type_refs, E.MissingSchemaDefinition)
    _check_dangling(m, _prop_refs, E.MissingPropSchemaDefinition)
    _check_dangling(m, _list_refs, E.MissingListSchemaDefinition)
    _check_dangling(m, _tuple_refs, E.MissingTupleSchemaDefinition)
    _check_unused(m)
    _check_acyclic(m)
    return m


def _check_dangling(m, get_refs, err) -> None:
    """≙ checkDanglingReferences (Analysis.purs:181-198)."""
    for name, scm in m.items():
        for node in get_refs(scm):
            if node[0] == "custom" and node[1] not in m:
                raise err(f"{node[1]} (referenced by {name})")


def _check_unused(m) -> None:
    """≙ checkUnusedSchemata (Analysis.purs:200-215)."""
    referenced = set()
    for scm in m.values():
        for node in (
            _type_refs(scm) + _prop_refs(scm) + _list_refs(scm) + _tuple_refs(scm)
        ):
            if node[0] == "custom":
                referenced.add(node[1])
    for name in m:
        if name != START and name not in referenced:
            raise E.IsolatedSchemata(name)


def _check_acyclic(m) -> None:
    """Types-as relation must be a DAG — iterative 3-color DFS
    ≙ AcyclicAdjacencyMap.purs:132-178. Edges are types-as ONLY
    (object/array recursion is allowed to be circular)."""
    WHITE, GREY, BLACK = 0, 1, 2
    color = {n: WHITE for n in m}

    def succ(name: str) -> List[str]:
        return [
            node[1]
            for node in m[name].types_as
            if node[0] == "custom" and node[1] in m
        ]

    for start in m:
        if color[start] != WHITE:
            continue
        stack = [(start, 0)]
        color[start] = GREY
        while stack:
            node, i = stack[-1]
            nxt_list = succ(node)
            if i < len(nxt_list):
                stack[-1] = (node, i + 1)
                nxt = nxt_list[i]
                if color[nxt] == GREY:
                    raise E.SelfTypingSchema(f"cycle through {nxt}")
                if color[nxt] == WHITE:
                    color[nxt] = GREY
                    stack.append((nxt, 0))
            else:
                color[node] = BLACK
                stack.pop()


def load_schema(data) -> Dict[str, CompiledMedea]:
    """≙ buildSchema (Loader.purs:65-69): parse + analyze."""
    from .parser import parse_specification

    return compile_schemata(parse_specification(data))


def load_schema_from_file(path: str) -> Dict[str, CompiledMedea]:
    """≙ loadSchemaFromFile (Loader.purs:71-75)."""
    with open(path, "rb") as fh:
        return load_schema(fh.read())
