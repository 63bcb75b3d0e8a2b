"""Constraint-set (de)serialization: declarative validation configs as
plain JSON/dict data, so rule sets live in config repos / are shipped
over the wire rather than only as Python code. Round-trips every
constraint type; the canonical form matches compiler.fingerprint_set's
encoding (kind + sorted fields)."""

from __future__ import annotations

import json
from typing import Dict, List

from . import constraints as C

_KINDS = {
    cls.__name__: cls
    for cls in (
        C.NotNull, C.TypeIs, C.IsIn, C.InRange, C.Matches, C.ArrayLenBetween,
        C.ElementsInRange, C.ElementsSatisfy, C.TupleRule, C.SizeEquals,
        C.Expr, C.AnyOf, C.Ref, C.When, C.Unique, C.ReferentialIn,
        C.StatsBound, C.Drift, C.FunctionalDependency,
    )
}


def constraint_to_dict(c: C.Constraint) -> Dict:
    d = {"kind": type(c).__name__}
    for k, v in vars(c).items():
        if isinstance(v, (list, tuple)):
            d[k] = [
                constraint_to_dict(x) if isinstance(x, C.Constraint) else x
                for x in v
            ]
        elif isinstance(v, C.Constraint):
            d[k] = constraint_to_dict(v)
        else:
            d[k] = v
    return d


def constraint_from_dict(d: Dict) -> C.Constraint:
    d = dict(d)
    kind = d.pop("kind")
    cls = _KINDS.get(kind)
    if cls is None:
        raise ValueError(f"unknown constraint kind {kind!r}")
    if kind == "AnyOf":
        d["branches"] = tuple(constraint_from_dict(b) for b in d.get("branches", []))
    if kind == "When" and d.get("inner") is not None:
        d["inner"] = constraint_from_dict(d["inner"])
    for k, v in list(d.items()):
        if isinstance(v, list) and k != "branches":
            d[k] = tuple(v) if k in ("types", "positions", "determinants") else v
    return cls(**d)


def set_to_dict(cs: C.ConstraintSet) -> Dict:
    return {
        "name": cs.name,
        "constraints": [constraint_to_dict(c) for c in cs.constraints],
    }


def set_from_dict(d: Dict) -> C.ConstraintSet:
    return C.ConstraintSet(
        d["name"], [constraint_from_dict(c) for c in d["constraints"]]
    )


def registry_to_json(reg) -> str:
    return json.dumps(
        {"version": 1, "sets": [set_to_dict(s) for s in reg._sets.values()]},
        sort_keys=True,
        indent=1,
    )


def registry_from_json(blob: str):
    from .compiler import Registry

    raw = json.loads(blob)
    if raw.get("version") != 1:
        raise ValueError(f"unknown config version {raw.get('version')!r}")
    reg = Registry()
    for s in raw["sets"]:
        reg.register(set_from_dict(s))
    return reg
