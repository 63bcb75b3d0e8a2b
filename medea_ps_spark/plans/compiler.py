"""Constraint-set registry + compiler: DSL → single-pass Spark predicates.

Mirrors the reference's two-stage lifecycle (SURVEY.md §3): a registry of
named sets ≙ the schema graph (Schema.purs:9-10), a compile pass running
the whole-graph checks of Analysis.purs:94-110 (duplicate names, reserved
namespace, dangling refs, DFS acyclicity, min≤max, column/type
compatibility ≙ PropertySpecWithoutObjectType family), then inlining of
named references into flat ``pyspark.sql.Column`` predicates — legal
precisely because the reference relation must be a DAG
(AcyclicAdjacencyMap.purs:132-178).

The compiled form is ONE projection: an array of violation structs plus a
boolean verdict, fully Catalyst-codegen-able; no per-row Python anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

from .. import errors as E
from .constraints import (
    AnyOf,
    ArrayLenBetween,
    Constraint,
    ConstraintSet,
    Drift,
    ElementsInRange,
    ElementsSatisfy,
    Expr,
    InRange,
    FunctionalDependency,
    IsIn,
    Matches,
    NotNull,
    Ref,
    ReferentialIn,
    SizeEquals,
    StatsBound,
    TupleRule,
    TypeIs,
    TABLE_LEVEL,
    Unique,
    When,
)

START = "$start"

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


@dataclass
class CompiledRowConstraint:
    constraint_id: str
    predicate: Column  # TRUE (or NULL for null-tolerant) = pass
    observed: Column  # string expression, evaluated only on violation


@dataclass
class CompiledSet:
    """Flattened, reference-free validation plan for one root set."""

    name: str
    row_constraints: List[CompiledRowConstraint] = dc_field(default_factory=list)
    table_constraints: List[Constraint] = dc_field(default_factory=list)
    fingerprint: str = ""  # canonical hash, used by checkpoint manifests


class Registry:
    """Named ConstraintSets with Medea-graph compile discipline."""

    def __init__(self) -> None:
        self._sets: Dict[str, ConstraintSet] = {}

    def register(self, cs: ConstraintSet) -> "Registry":
        if cs.name in self._sets:
            raise E.MultipleSchemaDefinition(cs.name)
        if cs.name.startswith("$") and cs.name != START:
            raise E.SchemaNameReserved(cs.name)
        self._sets[cs.name] = cs
        return self

    def __contains__(self, name: str) -> bool:
        return name in self._sets

    # -- graph checks (≙ Analysis.purs:94-110) ------------------------------

    def _refs_of(self, cs: ConstraintSet) -> List[str]:
        out: List[str] = []

        def walk(c: Constraint) -> None:
            if isinstance(c, Ref):
                out.append(c.target)
            elif isinstance(c, AnyOf):
                for b in c.branches:
                    walk(b)
            elif isinstance(c, When) and c.inner is not None:
                walk(c.inner)

        for c in cs.constraints:
            walk(c)
        return out

    def check_graph(self, root: str = START, allow_isolated: bool = False) -> None:
        if root not in self._sets:
            raise E.StartSchemaMissing(root)
        # dangling refs (≙ checkDanglingReferences, Analysis.purs:181-198)
        for name, cs in self._sets.items():
            for ref in self._refs_of(cs):
                if ref not in self._sets:
                    raise E.MissingSchemaDefinition(f"{ref} (referenced by {name})")
        # acyclicity via iterative DFS (≙ AcyclicAdjacencyMap.purs:132-178)
        WHITE, GREY, BLACK = 0, 1, 2
        color = {n: WHITE for n in self._sets}
        for start in self._sets:
            if color[start] != WHITE:
                continue
            stack: List[Tuple[str, int]] = [(start, 0)]
            color[start] = GREY
            while stack:
                node, i = stack[-1]
                refs = self._refs_of(self._sets[node])
                if i < len(refs):
                    stack[-1] = (node, i + 1)
                    nxt = refs[i]
                    if color[nxt] == GREY:
                        raise E.SelfTypingSchema(f"cycle through {nxt}")
                    if color[nxt] == WHITE:
                        color[nxt] = GREY
                        stack.append((nxt, 0))
                else:
                    color[node] = BLACK
                    stack.pop()
        # isolated sets (≙ checkUnusedSchemata, Analysis.purs:200-215)
        if not allow_isolated:
            referenced = {r for cs in self._sets.values() for r in self._refs_of(cs)}
            for name in self._sets:
                if name != root and name not in referenced:
                    raise E.IsolatedSchemata(name)

    # -- compile -------------------------------------------------------------

    def compile(
        self,
        schema: T.StructType,
        root: str = START,
        allow_isolated: bool = False,
    ) -> CompiledSet:
        self.check_graph(root=root, allow_isolated=allow_isolated)
        cs = self._sets[root]
        _check_unique_names(cs)
        out = CompiledSet(name=root)
        fields = {f.name: f.dataType for f in schema.fields}
        for c in cs.constraints:
            if isinstance(c, TABLE_LEVEL):
                _check_table_constraint(c, fields)
                out.table_constraints.append(c)
            else:
                _check_row_constraint(c, fields, self)
                pred, obs = self._compile_row(c, fields)
                out.row_constraints.append(
                    CompiledRowConstraint(c.name, _null_tolerant(c, pred), obs)
                )
        out.fingerprint = fingerprint_set(self, root)
        return out

    def _inline_pred(self, name: str, fields: Dict[str, T.DataType]) -> Column:
        """Named set → AND of its row predicates (DAG ⇒ terminates)."""
        cs = self._sets[name]
        preds = []
        for c in cs.constraints:
            if isinstance(c, TABLE_LEVEL):
                raise E.SchemaError(
                    f"set {name!r} used as a Ref target has table-level "
                    f"constraint {c.name!r}; only row-level sets are inlinable"
                )
            _check_row_constraint(c, fields, self)
            pred, _ = self._compile_row(c, fields)
            preds.append(_null_tolerant(c, pred))
        if not preds:
            return F.lit(True)
        acc = preds[0]
        for p in preds[1:]:
            acc = acc & p
        return acc

    def _compile_row(
        self, c: Constraint, fields: Dict[str, T.DataType]
    ) -> Tuple[Column, Column]:
        return _compile_row_constraint(c, fields, self)


def _check_unique_names(cs: ConstraintSet) -> None:
    seen = set()
    for c in cs.constraints:
        if c.name in seen:
            raise E.MultiplePropSchemaDefinition(f"{cs.name}.{c.name}")
        seen.add(c.name)


def _require_column(c: Constraint, col: str, fields: Dict[str, T.DataType]) -> T.DataType:
    if col not in fields:
        raise E.UnknownColumn(f"{c.name}: column {col!r} not in table schema")
    return fields[col]


def _check_row_constraint(
    c: Constraint, fields: Dict[str, T.DataType], reg: Registry
) -> None:
    """Column/type compatibility ≙ the *SpecWithout*Type checks
    (Analysis.purs:286-313) against a static StructType."""
    if isinstance(c, (NotNull, IsIn)):
        _require_column(c, c.column, fields)
    elif isinstance(c, TypeIs):
        dt = _require_column(c, c.column, fields)
        if dt.simpleString() not in set(c.types):
            raise E.ColumnTypeMismatch(
                f"{c.name}: column {c.column!r} is {dt.simpleString()}, "
                f"expected one of {sorted(c.types)}"
            )
    elif isinstance(c, (InRange,)):
        dt = _require_column(c, c.column, fields)
        if not isinstance(dt, _NUMERIC + (T.DateType, T.TimestampType)):
            raise E.ColumnTypeMismatch(f"{c.name}: InRange on non-numeric {dt}")
        if c.lo is not None and c.hi is not None and c.lo > c.hi:
            raise E.MinimumLengthGreaterThanMaximum(c.name)
    elif isinstance(c, Matches):
        dt = _require_column(c, c.column, fields)
        if not isinstance(dt, T.StringType):
            raise E.ColumnTypeMismatch(f"{c.name}: Matches on non-string {dt}")
    elif isinstance(c, (ArrayLenBetween, ElementsInRange, ElementsSatisfy, TupleRule)):
        dt = _require_column(c, c.column, fields)
        if not isinstance(dt, T.ArrayType):
            # ≙ ListSpecWithoutArrayType / TupleSpecWithoutArrayType
            raise E.ColumnTypeMismatch(f"{c.name}: array constraint on {dt}")
        if (
            isinstance(c, ArrayLenBetween)
            and c.lo is not None
            and c.hi is not None
            and c.lo > c.hi
        ):
            raise E.MinimumLengthGreaterThanMaximum(c.name)
    elif isinstance(c, SizeEquals):
        dt_int = _require_column(c, c.column, fields)
        dt_arr = _require_column(c, c.array_column, fields)
        if not isinstance(dt_int, _NUMERIC):
            raise E.ColumnTypeMismatch(f"{c.name}: {c.column!r} not numeric")
        if not isinstance(dt_arr, T.ArrayType):
            raise E.ColumnTypeMismatch(f"{c.name}: {c.array_column!r} not array")
    elif isinstance(c, Expr):
        pass  # deferred to Catalyst analysis
    elif isinstance(c, AnyOf):
        if not c.branches:
            raise E.EmptyLengthSpec(f"{c.name}: AnyOf with no branches")
        for b in c.branches:
            if isinstance(b, TABLE_LEVEL):
                raise E.SchemaError(f"{c.name}: table-level branch in AnyOf")
            _check_row_constraint(b, fields, reg)
    elif isinstance(c, Ref):
        if c.target not in reg:
            raise E.MissingSchemaDefinition(c.target)
    elif isinstance(c, When):
        if not c.condition_sql:
            raise E.SchemaError(f"{c.name}: When needs condition_sql")
        if c.inner is None:
            raise E.SchemaError(f"{c.name}: When needs an inner constraint")
        if isinstance(c.inner, TABLE_LEVEL):
            raise E.SchemaError(
                f"{c.name}: table-level inner in When — scope table "
                f"constraints with their own `where` field instead"
            )
        _check_row_constraint(c.inner, fields, reg)


def _check_table_constraint(c: Constraint, fields: Dict[str, T.DataType]) -> None:
    if isinstance(c, (Unique, StatsBound, Drift)):
        _require_column(c, c.column, fields)
    elif isinstance(c, ReferentialIn):
        _require_column(c, c.column, fields)
        if not c.dim_values and not c.dim_table:
            raise E.SchemaError(f"{c.name}: ReferentialIn needs dim_values or dim_table")
    elif isinstance(c, FunctionalDependency):
        if not c.determinants:
            raise E.SchemaError(f"{c.name}: FunctionalDependency needs determinants")
        for col in c.determinants:
            _require_column(c, col, fields)
        _require_column(c, c.dependent, fields)
        if c.dependent in c.determinants:
            raise E.SchemaError(
                f"{c.name}: dependent {c.dependent!r} is also a determinant"
            )
    if isinstance(c, StatsBound):
        if c.agg not in (
            "min", "max", "avg", "null_rate", "count",
            "quantile", "approx_distinct",
        ):
            raise E.SchemaError(f"{c.name}: unknown agg {c.agg!r}")
        if c.agg == "quantile" and not (
            c.q is not None and 0.0 < c.q < 1.0
        ):
            raise E.SchemaError(
                f"{c.name}: agg='quantile' needs q in (0,1), got {c.q!r}"
            )
        if c.agg == "quantile" and int(c.accuracy) <= 0:
            raise E.SchemaError(
                f"{c.name}: accuracy must be positive, got {c.accuracy!r}"
            )
        if c.agg == "approx_distinct" and not (0.0 < float(c.rsd) < 1.0):
            raise E.SchemaError(
                f"{c.name}: rsd must be in (0,1), got {c.rsd!r}"
            )


def _null_tolerant(c: Constraint, pred: Column) -> Column:
    """SQL CHECK semantics: NULL input passes everything except NotNull
    (nullability is its own constraint, ≙ required-prop vs type split in
    Medea.purs:310-314 vs 173-180)."""
    if isinstance(c, NotNull):
        return pred
    return F.coalesce(pred, F.lit(True))


def _compile_row_constraint(
    c: Constraint, fields: Dict[str, T.DataType], reg: Registry
) -> Tuple[Column, Column]:
    """Returns (pass-predicate, observed-string). The observed expression
    sits in the violation branch of a Catalyst If — it is only evaluated
    on failing rows."""
    if isinstance(c, NotNull):
        return F.col(c.column).isNotNull(), F.lit("null")
    if isinstance(c, TypeIs):
        # static check already done at compile; runtime predicate is true
        return F.lit(True), F.lit(None).cast("string")
    if isinstance(c, IsIn):
        return F.col(c.column).isin(list(c.values)), F.col(c.column).cast("string")
    if isinstance(c, InRange):
        col = F.col(c.column)
        pred = F.lit(True)
        if c.lo is not None:
            pred = pred & (col >= F.lit(c.lo))
        if c.hi is not None:
            pred = pred & (col <= F.lit(c.hi))
        return pred, col.cast("string")
    if isinstance(c, Matches):
        return F.col(c.column).rlike(c.pattern), F.col(c.column).cast("string")
    if isinstance(c, ArrayLenBetween):
        # size only on non-null arrays: under spark.sql.legacy.sizeOfNull
        # size(NULL) is -1 (a fake violation the witness prover can't
        # see); the guard pins NULL-array semantics to "pass via
        # _null_tolerant" on EVERY config — the default behavior and the
        # DuckDB oracle's len(NULL)=NULL
        size = F.when(F.col(c.column).isNotNull(), F.size(F.col(c.column)))
        pred = F.lit(True)
        if c.lo is not None:
            pred = pred & (size >= F.lit(c.lo))
        if c.hi is not None:
            pred = pred & (size <= F.lit(c.hi))
        return pred, size.cast("string")
    if isinstance(c, ElementsInRange):
        def elem_ok(x: Column) -> Column:
            ok = F.lit(True)
            if c.lo is not None:
                ok = ok & (x >= F.lit(c.lo))
            if c.hi is not None:
                ok = ok & (x < F.lit(c.hi))
            return ok

        # Predicate stays forall(col, elem_ok). The r6 session tried
        # array_min/array_max ("tight JVM loops beat the interpreted
        # HOF lambda") and MEASURED it slower on the 24M-row ~512-
        # element tokens table: interleaved A/B, 4 reps each, min
        # 18.6 s (forall) vs 22.9 s (min/max), old faster in every
        # same-window pair. With both bounds set, min+max is TWO full
        # array passes over a memory-bound column while forall is one
        # pass with short-circuit — the extra pass costs more than the
        # per-element interpreter overhead saves (guide §1.1: measure,
        # then decide).
        pred = F.forall(F.col(c.column), elem_ok)
        offending = F.element_at(
            F.filter(F.col(c.column), lambda x: ~F.coalesce(elem_ok(x), F.lit(False))),
            1,
        )
        return pred, offending.cast("string")
    if isinstance(c, ElementsSatisfy):
        pred = F.expr(f"forall({c.column}, x -> ({c.predicate_sql}))")
        offending = F.expr(
            f"element_at(filter({c.column}, "
            f"x -> NOT coalesce(({c.predicate_sql}), false)), 1)"
        )
        return pred, offending.cast("string")
    if isinstance(c, TupleRule):
        n = len(c.positions)
        # null-guarded size: see ArrayLenBetween
        pred = (
            F.when(F.col(c.column).isNotNull(), F.size(F.col(c.column)))
            == F.lit(n)
        )
        for i, psql in enumerate(c.positions):
            if psql.strip().lower() in ("true", ""):
                continue  # ≙ AnyNode positional schema
            x = f"element_at({c.column}, {i + 1})"
            pred = pred & F.coalesce(
                F.expr(psql.replace("x", x)), F.lit(False)
            )
        return pred, F.col(c.column).cast("string")
    if isinstance(c, SizeEquals):
        # null-guarded size: see ArrayLenBetween
        pred = F.col(c.column) == F.when(
            F.col(c.array_column).isNotNull(), F.size(F.col(c.array_column))
        )
        obs = F.concat(
            F.col(c.column).cast("string"),
            F.lit(" != size="),
            F.size(F.col(c.array_column)).cast("string"),
        )
        return pred, obs
    if isinstance(c, Expr):
        obs = (
            F.expr(c.observed_sql).cast("string")
            if c.observed_sql
            else F.lit(None).cast("string")
        )
        return F.expr(c.sql), obs
    if isinstance(c, AnyOf):
        # sum type: pass iff ANY branch passes; all-fail ⇒ one violation
        # under this constraint's id (SURVEY.md §7 "Sum-type semantics")
        preds = []
        cols = []
        for b in c.branches:
            if isinstance(b, Ref):
                preds.append(reg._inline_pred(b.target, fields))
            else:
                p, _ = _compile_row_constraint(b, fields, reg)
                preds.append(_null_tolerant(b, p))
            col = getattr(b, "column", "")
            if col and col not in cols:
                cols.append(col)
        acc = preds[0]
        for p in preds[1:]:
            acc = acc | p
        obs = (
            F.to_json(F.struct(*[F.col(x) for x in cols]))
            if cols
            else F.lit(None).cast("string")
        )
        return acc, obs
    if isinstance(c, Ref):
        return reg._inline_pred(c.target, fields), F.lit(None).cast("string")
    if isinstance(c, When):
        # pass ⟺ condition not satisfied (FALSE/NULL) OR inner passes
        # under its own null-tolerance; the observed expression is the
        # inner's and only evaluates on violating (condition-true) rows.
        cond = F.coalesce(F.expr(c.condition_sql), F.lit(False))
        if isinstance(c.inner, Ref):
            inner_pred = reg._inline_pred(c.inner.target, fields)
            inner_obs = F.lit(None).cast("string")
        else:
            p, inner_obs = _compile_row_constraint(c.inner, fields, reg)
            inner_pred = _null_tolerant(c.inner, p)
        return ~cond | inner_pred, inner_obs
    raise E.SchemaError(f"unknown constraint type {type(c).__name__}")


def encode_constraint(c: Constraint):
    """Canonical JSON-able encoding of one constraint (nested branches
    included) — the unit both `fingerprint_set` and
    plans/evolution.constraint_fingerprints hash."""
    d = {"kind": type(c).__name__}
    for k, v in sorted(vars(c).items()):
        if isinstance(v, (list, tuple)):
            d[k] = [
                encode_constraint(x) if isinstance(x, Constraint) else x
                for x in v
            ]
        elif isinstance(v, Constraint):
            d[k] = encode_constraint(v)
        else:
            d[k] = v
    return d


def fingerprint_set(reg: Registry, root: str) -> str:
    """Canonical hash of the root set + everything reachable from it —
    sorted, version-tagged — so checkpoint manifests invalidate when any
    rule changes (SURVEY.md §7 'Resume correctness')."""
    import hashlib
    import json

    enc = encode_constraint

    reachable = {}
    todo = [root]
    while todo:
        name = todo.pop()
        if name in reachable or name not in reg._sets:
            continue
        cs = reg._sets[name]
        reachable[name] = [enc(c) for c in cs.constraints]
        todo.extend(reg._refs_of(cs))
    blob = json.dumps({"v": 1, "sets": reachable}, sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()
