"""Declarative column-constraint DSL.

This is the column-level generalization of the reference's
``CompiledSchema`` constraint vocabulary
(/root/reference/src/Data/Medea/Analysis.purs:62-73):

    reference field          engine constraint
    ------------------------ ---------------------------------------
    typesAs (sum type)       AnyOf([...]) / Ref("name")
    stringVals               IsIn(column, values)
    minListLen/maxListLen    ArrayLenBetween(column, lo, hi)
    arrayTypes ListType      ElementsSatisfy / ElementsInRange
    arrayTypes TupleType     TupleRule(column, [per-position rules])
    props (required)         NotNull(column) / FieldPresent
    -- (no ref counterpart)  InRange, SizeEquals, Matches, Expr,
                             Unique, ReferentialIn, StatsBound, Drift

Constraints are pure declarative data; compilation to Spark ``Column``
predicates lives in :mod:`medea_ps_spark.plans.compiler` so that the
whole set compiles into ONE single-pass projection (violations array +
verdict) that Catalyst can codegen — no per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Union

Number = Union[int, float]


@dataclass(frozen=True)
class Constraint:
    """Base. ``name`` is the constraint_id reported on violation rows."""

    name: str


# -- row-level constraints (compile to one Column predicate each) -----------


@dataclass(frozen=True)
class NotNull(Constraint):
    """Column must be non-null. ≙ required property, Medea.purs:310-314."""

    column: str = ""


@dataclass(frozen=True)
class TypeIs(Constraint):
    """Column's Spark type must be one of ``types`` (checked at compile
    time against the StructType — the static analogue of the reference's
    runtime typeOf dispatch, JSONType.purs:23-32)."""

    column: str = ""
    types: Sequence[str] = ()  # Spark simpleString names, e.g. "int", "string"


@dataclass(frozen=True)
class IsIn(Constraint):
    """String/value enum. ≙ stringVals, SPEC.md String value specification."""

    column: str = ""
    values: Sequence = ()


@dataclass(frozen=True)
class InRange(Constraint):
    """lo <= col <= hi (either bound optional). No reference counterpart
    (Medea numbers carry no value constraints, TUTORIAL.md:124-129) —
    north-rule generalization."""

    column: str = ""
    lo: Optional[Number] = None
    hi: Optional[Number] = None


@dataclass(frozen=True)
class Matches(Constraint):
    """Regex match on a string column (generalization)."""

    column: str = ""
    pattern: str = ""


@dataclass(frozen=True)
class ArrayLenBetween(Constraint):
    """lo <= size(col) <= hi. ≙ min/max-length, Medea.purs:241-253."""

    column: str = ""
    lo: Optional[int] = None
    hi: Optional[int] = None


@dataclass(frozen=True)
class ElementsInRange(Constraint):
    """Every array element in [lo, hi). ≙ homogeneous list element rule
    (ListType, Medea.purs:254-268) specialized to numeric ranges — the
    tokens-in-[0,vocab) invariant of BASELINE.json."""

    column: str = ""
    lo: Optional[Number] = None
    hi: Optional[Number] = None  # exclusive upper bound


@dataclass(frozen=True)
class ElementsSatisfy(Constraint):
    """Every array element satisfies a SQL boolean expression over ``x``.
    General ListType element rule; compiled with F.forall."""

    column: str = ""
    predicate_sql: str = ""  # e.g. "x IS NOT NULL AND x >= 0"


@dataclass(frozen=True)
class TupleRule(Constraint):
    """Fixed arity + per-position SQL predicates over ``x``.
    ≙ TupleType, Medea.purs:273-280 (arity) + positional checks."""

    column: str = ""
    positions: Sequence[str] = ()  # predicate SQL per index; "true" = any


@dataclass(frozen=True)
class SizeEquals(Constraint):
    """size(array_column) == int_column — the n_tok == size(tokens)
    invariant from BASELINE.json input_hint."""

    column: str = ""  # the int column
    array_column: str = ""


@dataclass(frozen=True)
class Expr(Constraint):
    """Escape hatch: arbitrary SQL boolean expression over row columns."""

    sql: str = ""
    observed_sql: Optional[str] = None


@dataclass(frozen=True)
class AnyOf(Constraint):
    """Sum type: row passes if ANY branch passes. ≙ typesAs alternation
    (Medea.purs:161-162 checkTypes <|>); violation only when all branches
    fail, reported under this constraint's name (SURVEY.md §7)."""

    branches: Sequence[Constraint] = ()


@dataclass(frozen=True)
class Ref(Constraint):
    """Named reference to another registered ConstraintSet — the analogue
    of CustomNode schema references (Analysis.purs:48-51). Inlined at
    compile time; the registry graph must be acyclic (DFS check ≙
    AcyclicAdjacencyMap.purs:132-178)."""

    target: str = ""


@dataclass(frozen=True)
class When(Constraint):
    """Conditional scope (Deequ-style ``.where()``): ``inner`` applies
    only to rows where ``condition_sql`` evaluates TRUE; rows where the
    condition is FALSE or NULL pass unconditionally. ``inner`` may be any
    row-level constraint, including Ref (the whole referenced set becomes
    conditional) or a nested When. Violations are reported under THIS
    constraint's name. No reference counterpart (Medea schemas are
    unconditional) — north-rule generalization: 'sequences from source X
    must satisfy Y' without forking the rule set per source."""

    condition_sql: str = ""
    inner: Optional[Constraint] = None


# -- table-level constraints (need aggregation or a join) --------------------


@dataclass(frozen=True)
class Unique(Constraint):
    """Column values must be unique table-wide (doc_id uniqueness).
    Exact via groupBy/count; approximate monitor via HLL sketch.
    ``where`` (SQL boolean over row columns, optional) scopes the check
    to matching rows — uniqueness is then required only AMONG them."""

    column: str = ""
    where: Optional[str] = None


@dataclass(frozen=True)
class ReferentialIn(Constraint):
    """Column values must appear in a dimension (allowed_sources).
    Compiled to a broadcast left-anti join; salted variant for skew."""

    column: str = ""
    dim_values: Sequence[str] = ()  # inline small dim; or use dim_table
    dim_table: Optional[str] = None  # path/name of dimension table
    dim_column: Optional[str] = None
    where: Optional[str] = None  # SQL row scope; non-matching rows pass


@dataclass(frozen=True)
class FunctionalDependency(Constraint):
    """``determinants`` → ``dependent``: within every determinant group
    there is at most ONE distinct dependent value (NULL counts as a
    value, null-safely) — catches denormalization drift like one doc_id
    mapping to two sources, or a (source, shard) pair carrying mixed
    tokenizer versions. Compiled to one partial+final hash aggregate
    over the determinant key; violating groups join back AQE-style like
    Unique does."""

    determinants: Sequence[str] = ()
    dependent: str = ""
    where: Optional[str] = None  # SQL row scope; non-matching rows pass


@dataclass(frozen=True)
class StatsBound(Constraint):
    """Partition-level bound on an aggregate: agg in {min, max, avg,
    null_rate, count, quantile, approx_distinct} of ``column`` must lie
    in [lo, hi]. ``quantile`` needs ``q`` in (0,1) and evaluates via a
    single-pass mergeable percentile sketch (percentile_approx at
    ``accuracy``) — the scale-right way to bound a p99 at 10^12 rows;
    ``approx_distinct`` is the HLL++ distinct count at relative error
    ``rsd`` (e.g. bound the distinct-source cardinality per
    partition). Both are approximate BY CONTRACT: pick lo/hi with the
    sketch error in mind."""

    column: str = ""
    agg: str = "null_rate"
    lo: Optional[Number] = None
    hi: Optional[Number] = None
    q: Optional[float] = None  # quantile point, only for agg="quantile"
    accuracy: int = 10000  # percentile_approx accuracy knob
    rsd: float = 0.01  # approx_count_distinct relative std deviation


@dataclass(frozen=True)
class Drift(Constraint):
    """Distribution drift vs a reference profile: chi-square (binned) or
    KS, flagged when p-value < alpha."""

    column: str = ""
    test: str = "chi2"  # or "ks"
    alpha: float = 0.001


ROW_LEVEL = (
    NotNull,
    TypeIs,
    IsIn,
    InRange,
    Matches,
    ArrayLenBetween,
    ElementsInRange,
    ElementsSatisfy,
    TupleRule,
    SizeEquals,
    Expr,
    AnyOf,
    Ref,
    When,
)
TABLE_LEVEL = (Unique, ReferentialIn, StatsBound, Drift, FunctionalDependency)


@dataclass
class ConstraintSet:
    """A named set of constraints — ≙ one Medea schema
    (CompiledSchema, Analysis.purs:62-73). Sets reference each other by
    name through Ref/AnyOf; a registry of sets ≙ the schema graph
    (Schema.purs:9-10)."""

    name: str
    constraints: Sequence[Constraint] = field(default_factory=list)
