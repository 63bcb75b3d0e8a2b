"""Medea JSON validation — semantics ported from
/root/reference/src/Data/Medea.purs:146-336 (checkTypes / checkPrim /
checkArray / checkObject / checkCustoms).

Two surfaces:

* :func:`validate` — pure-Python single-document validator, the exact
  semantic twin of the reference driver ``validate`` (Medea.purs:146-153),
  used by the conformance suite and as the per-value kernel below.
* :func:`validate_json_column` — distributed validation of a DataFrame
  column of JSON documents via an Arrow-batched pandas UDF. Dynamic
  recursive JSON against a dynamic schema graph cannot be expressed as
  static Catalyst predicates, so this is the sanctioned Python boundary
  (SURVEY.md §1.4 "dynamic residue"); the hot tokenized-sequence path
  never goes through here.

Error identity follows the reference ValidationError taxonomy
(Medea.purs:108-119), surfaced as constraint_id strings (errors.py).
Alternation accumulates errors with the reference's first-non-empty
Semigroup (Medea.purs:136-141).
"""

from __future__ import annotations

import json
from typing import Dict, Optional, Tuple

import pandas as pd

from ... import errors as E
from .analysis import ANY, CompiledMedea

EMPTY_ERROR = "EmptyError"


class Failure(Exception):
    def __init__(self, err: str, payload: str = ""):
        self.err = err
        self.payload = payload
        super().__init__(f"{err}: {payload}")


def _combine(errs) -> Failure:
    """First non-empty error wins (Semigroup ValidationError)."""
    for e in errs:
        if e.err != EMPTY_ERROR:
            return e
    return errs[0] if errs else Failure(EMPTY_ERROR)


def _typeof(v) -> str:
    """≙ typeOf (JSONType.purs:23-32). bool before int: Python bools are
    ints."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "object"
    raise Failure(E.IMPLEMENTATION_ERROR, f"unexpected python type {type(v)}")


_PRIM_SCHEMA_INFO = {
    "null": "NullSchema",
    "boolean": "BooleanSchema",
    "number": "NumberSchema",
    "string": "StringSchema",
    "array": "ArraySchema",
    "object": "ObjectSchema",
}


def _check_types(v, nodes: frozenset, par: Optional[str], m: Dict[str, CompiledMedea]) -> str:
    """≙ checkTypes = checkAny <|> checkPrim <|> checkCustoms
    (Medea.purs:161-162). Returns the SchemaInformation tag."""
    # checkAny (Medea.purs:164-171)
    if ANY in nodes:
        return "AnySchema"
    errs = []
    try:
        return _check_prim(v, nodes, par, m)
    except Failure as e1:
        errs.append(e1)
    try:
        return _check_customs(v, nodes, m)
    except Failure as e2:
        errs.append(e2)
        raise _combine(errs)


def _check_prim(v, nodes, par, m) -> str:
    """≙ checkPrim (Medea.purs:173-217)."""
    t = _typeof(v)
    if ("prim", t) not in nodes:
        raise Failure(E.NOT_ONE_OF_OPTIONS, json.dumps(v))
    if t == "string" and par is not None:
        vals = m[par].string_vals
        if vals and v not in vals:
            raise Failure(E.NOT_ONE_OF_OPTIONS, json.dumps(v))
    if t == "array":
        if par is None:
            # Fast Path: children validated as Any (Medea.purs:200-205)
            for x in v:
                _check_types(x, frozenset({ANY}), None, m)
        else:
            _check_array(v, par, m)
    elif t == "object":
        if par is None:
            # Fast Path (Medea.purs:212-216)
            for x in v.values():
                _check_types(x, frozenset({ANY}), None, m)
        else:
            _check_object(v, par, m)
    return _PRIM_SCHEMA_INFO[t]


def _check_array(arr, par: str, m) -> None:
    """≙ checkArray + checkTupleLength (Medea.purs:241-280)."""
    cs = m[par]
    n = len(arr)
    if (cs.min_len is not None and n < cs.min_len) or (
        cs.max_len is not None and n > cs.max_len
    ):
        raise Failure(E.OUT_OF_BOUNDS_ARRAY_LENGTH, f"{par}: len={n}")
    if cs.array_type is not None and cs.array_type[0] == "tuple":
        if len(cs.array_type[1]) != n:
            raise Failure(E.OUT_OF_BOUNDS_ARRAY_LENGTH, f"{par}: len={n}")
        pairs = zip(arr, cs.array_type[1])
    elif cs.array_type is not None:  # list
        pairs = ((x, cs.array_type[1]) for x in arr)
    else:
        pairs = ((x, ANY) for x in arr)
    for val, node in pairs:
        _check_types(val, frozenset({node}), None, m)


def _check_object(obj: dict, par: str, m) -> None:
    """≙ checkObject + pairPropertySchemaAndVal + isMatched
    (Medea.purs:282-314)."""
    cs = m[par]
    paired = []
    for prop_name, val in obj.items():
        if prop_name in cs.props:
            paired.append((val, cs.props[prop_name][0]))
        elif cs.additional_props:
            paired.append((val, cs.additional_prop_schema))
        else:
            raise Failure(E.ADDITIONAL_PROP_BANNED, f"{par}.{prop_name}")
    for prop_name, (node, optional) in cs.props.items():
        if prop_name not in obj and not optional:
            raise Failure(E.REQUIRED_PROP_MISSING, f"{par}.{prop_name}")
    for val, node in paired:
        _check_types(val, frozenset({node}), None, m)


def _check_customs(v, nodes, m) -> str:
    """≙ checkCustoms (Medea.purs:316-336): try each custom candidate in
    Ord order; first success wins; errors fold first-non-empty."""
    customs = sorted(n[1] for n in nodes if n[0] == "custom")
    errs = []
    for ident in customs:
        cs = m.get(ident)
        if cs is None:
            raise Failure(E.IMPLEMENTATION_ERROR, f"unknown schema {ident}")
        try:
            _check_types(v, cs.types_as, ident, m)
            return f"UserDefined:{ident}"
        except Failure as e:
            errs.append(e)
    if not errs:
        raise Failure(EMPTY_ERROR)
    raise _combine(errs)


def _annotate(v, nodes: frozenset, par: Optional[str], m) -> dict:
    """Annotated-tree twin of _check_types — returns the input value with
    every node tagged by the schema that validated it
    (≙ ValidatedJSON = Cofree ValidJSONF SchemaInformation,
    Medea.purs:68-106 / ValidJson.purs:14-21). Raises Failure like the
    plain checker. Children of Any-validated containers are AnySchema."""
    # checkAny
    if ANY in nodes:
        return {"schema": "AnySchema", "value": _annotate_children(v, None, m)}
    errs = []
    try:
        return _annotate_prim(v, nodes, par, m)
    except Failure as e1:
        errs.append(e1)
    customs = sorted(n[1] for n in nodes if n[0] == "custom")
    for ident in customs:
        try:
            sub = _annotate(v, m[ident].types_as, ident, m)
            # checkCustom re-tags the whole tree (Medea.purs:330-333 `$>`)
            return _retag(sub, f"UserDefined:{ident}")
        except Failure as e:
            errs.append(e)
    raise _combine(errs)


def _retag(tree: dict, tag: str) -> dict:
    out = {"schema": tag, "value": tree["value"]}
    if isinstance(tree["value"], list):
        out["value"] = [_retag(c, tag) if isinstance(c, dict) and "schema" in c else c for c in tree["value"]]
    elif isinstance(tree["value"], dict):
        out["value"] = {
            k: (_retag(c, tag) if isinstance(c, dict) and "schema" in c else c)
            for k, c in tree["value"].items()
        }
    return out


def _annotate_children(v, node, m):
    if isinstance(v, list):
        return [
            _annotate(x, frozenset({node}) if node else frozenset({ANY}), None, m)
            for x in v
        ]
    if isinstance(v, dict):
        return {
            k: _annotate(x, frozenset({node}) if node else frozenset({ANY}), None, m)
            for k, x in v.items()
        }
    return v


def _annotate_prim(v, nodes, par, m) -> dict:
    t = _typeof(v)
    if ("prim", t) not in nodes:
        raise Failure(E.NOT_ONE_OF_OPTIONS, json.dumps(v))
    if t == "string" and par is not None:
        vals = m[par].string_vals
        if vals and v not in vals:
            raise Failure(E.NOT_ONE_OF_OPTIONS, json.dumps(v))
    schema = _PRIM_SCHEMA_INFO[t]
    if t == "array":
        if par is None:
            return {"schema": schema, "value": _annotate_children(v, None, m)}
        _check_array(v, par, m)  # bounds/arity errors first
        cs = m[par]
        if cs.array_type is None:
            kids = [_annotate(x, frozenset({ANY}), None, m) for x in v]
        elif cs.array_type[0] == "list":
            kids = [
                _annotate(x, frozenset({cs.array_type[1]}), None, m) for x in v
            ]
        else:
            kids = [
                _annotate(x, frozenset({node}), None, m)
                for x, node in zip(v, cs.array_type[1])
            ]
        return {"schema": schema, "value": kids}
    if t == "object":
        if par is None:
            return {"schema": schema, "value": _annotate_children(v, None, m)}
        cs = m[par]
        kids = {}
        for prop_name, val in v.items():
            if prop_name in cs.props:
                node = cs.props[prop_name][0]
            elif cs.additional_props:
                node = cs.additional_prop_schema
            else:
                raise Failure(E.ADDITIONAL_PROP_BANNED, f"{par}.{prop_name}")
            kids[prop_name] = _annotate(val, frozenset({node}), None, m)
        for prop_name, (node, optional) in cs.props.items():
            if prop_name not in v and not optional:
                raise Failure(E.REQUIRED_PROP_MISSING, f"{par}.{prop_name}")
        return {"schema": schema, "value": kids}
    return {"schema": schema, "value": v}


def validate_annotated(m: Dict[str, CompiledMedea], doc: str):
    """≙ validate returning the full annotation tree. (None, error) on
    failure; (tree, None) on success."""
    try:
        v = json.loads(doc)
    except (ValueError, TypeError):
        return None, E.NOT_JSON
    try:
        return _annotate(v, frozenset({("custom", "$start")}), None, m), None
    except Failure as e:
        return None, e.err


def validate(m: Dict[str, CompiledMedea], doc: str) -> Tuple[bool, Optional[str], Optional[str]]:
    """≙ validate (Medea.purs:146-153): JSON text → (valid, error_class,
    schema_info). Seeds with {CustomNode $start}."""
    try:
        v = json.loads(doc)
    except (ValueError, TypeError):
        return False, E.NOT_JSON, None
    try:
        info = _check_types(v, frozenset({("custom", "$start")}), None, m)
        return True, None, info
    except Failure as e:
        return False, e.err, None


def validate_value(m: Dict[str, CompiledMedea], v) -> Tuple[bool, Optional[str]]:
    """Validate an already-parsed JSON value."""
    try:
        _check_types(v, frozenset({("custom", "$start")}), None, m)
        return True, None
    except Failure as e:
        return False, e.err


def validate_from_file(m: Dict[str, CompiledMedea], path: str):
    """≙ validateFromFile (Medea.purs:155-158) — with the INTENDED
    semantics: validates the file's contents. (The reference has a
    known bug validating the path string instead; its own tests bypass
    it, see SURVEY.md §3.)"""
    with open(path, "r", encoding="utf-8") as fh:
        return validate(m, fh.read())


def validate_json_column(df, column: str, schema_source, out_prefix: str = "medea"):
    """Distributed Medea validation of a JSON-string column.

    ``schema_source`` is Medea schema text (or a compiled map). The
    compiled schema graph is tiny and ships to executors inside the UDF
    closure (≙ ReaderT Schema broadcast, Medea.purs:151). Arrow batches
    cross the JVM↔Python boundary once per partition chunk.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import BooleanType, StringType, StructField, StructType

    if isinstance(schema_source, dict):
        compiled = schema_source
    else:
        from .analysis import load_schema

        compiled = load_schema(schema_source)

    out_type = StructType(
        [
            StructField("valid", BooleanType()),
            StructField("error", StringType()),
        ]
    )

    @F.pandas_udf(out_type)
    def _validate_batch(s: pd.Series) -> pd.DataFrame:
        valids, errors_ = [], []
        for doc in s:
            if doc is None:
                valids.append(False)
                errors_.append(E.NOT_JSON)
                continue
            ok, err, _ = validate(compiled, doc)
            valids.append(ok)
            errors_.append(err)
        return pd.DataFrame({"valid": valids, "error": errors_})

    res = df.withColumn("_medea", _validate_batch(F.col(column)))
    return res.withColumn(f"{out_prefix}_valid", F.col("_medea.valid")).withColumn(
        f"{out_prefix}_error", F.col("_medea.error")
    ).drop("_medea")
