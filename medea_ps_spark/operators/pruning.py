"""Witness stats + constraint provability — Iceberg-style data skipping
for constraint validation.

Iceberg/Parquet readers skip whole files when column min/max metadata
proves a filter can't match. This module applies the same idea one
level up, to CONSTRAINTS: a handful of generic per-partition aggregates
("witnesses" — null counts, scalar min/max, array-size and
array-element min/max, |n - size(arr)| max) collected ONCE while the
partition is being validated anyway, later PROVE that a newly added
rule cannot have violations in that partition — so constraint-set
evolution (plans/evolution.py) upgrades the partition without touching
its data at all.

Why this matters at 10^12 rows: the evolve path's cost for an added
row-level constraint is one codegen'd scan per completed partition.
With witnesses, "add `InRange('n_tok', 1, 8192)` to a validated 100-TB
table" is a pure manifest edit for every partition whose stored
n_tok min/max already sits inside the bound — zero scans, zero jobs.
Only partitions the stats can't clear (or that predate witness
collection) pay the scan, exactly like file skipping degrades to a
read when stats are absent.

Soundness contract: ``prove_zero_violations(c, w)`` returns True only
when the stored witnesses IMPLY that every row passes ``c`` under the
compiler's exact semantics (plans/compiler.py — NULL passes everything
except NotNull, ElementsInRange's upper bound is exclusive, array_min/
array_max and forall both skip NULL elements, F.size is only applied
to non-null arrays in the witness so legacy sizeOfNull configs cannot
skew it). False means "unknown", never "violating" — the caller falls
back to scanning. NaN witnesses (float columns containing NaN, which
Spark orders above every number) poison the proof and return False.
The seeded fuzz suite (tests/test_pruning.py) checks the implication
against validator.validate on randomized data and rules.

No reference counterpart: medea-ps validates one document at a time
(Medea.purs:146-162) and has no incremental story; this is north-rule
generalization (resumable checkpoint + per-partition metrics).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from ..plans import constraints as C
from ..plans.compiler import Registry, _NUMERIC

# witness-key prefixes (stable — they are persisted in checkpoint
# manifests; changing them orphans stored witnesses, which is safe but
# wasteful: proofs degrade to "unknown" and evolve falls back to scans)
K_NROWS = "n_rows"
K_NULL = "nullcnt."
K_MIN = "min."
K_MAX = "max."
K_SIZEMIN = "sizemin."
K_SIZEMAX = "sizemax."
K_ELEMMIN = "elemmin."
K_ELEMMAX = "elemmax."
K_SIZEEQ = "sizeeq."  # sizeeq.<int_col>.<array_col>
K_DISTINCT = "distinct."


def witness_aggs(
    schema: T.StructType,
    distinct_columns: Sequence[str] = (),
    distinct_cap: int = 64,
    pair_cap: int = 8,
) -> List[Tuple[str, Column]]:
    """The generic witness aggregate set for a table schema, as
    (key, aggregate Column) pairs — ALL of them evaluate in one
    partial+final hash aggregate, so collection rides whatever
    aggregation pass the caller is already running (the checkpointed
    runner appends them to its n_rows/n_failed agg: zero extra scans).

    Per column: null count (every type); min/max for numeric scalars;
    for arrays, size min/max (null-array-guarded) plus element min/max
    when the element type is numeric. For every (numeric scalar,
    array) pair — capped at ``pair_cap`` pairs, schema-ordered — the
    max of |scalar - size(array)| over rows where both are non-null,
    which decides SizeEquals. ``distinct_columns`` (opt-in: collect_set
    holds the full distinct set in aggregation state, so ONLY name
    columns you know are low-cardinality, e.g. the source/partition
    dimension) adds a capped exact distinct-value list for string
    columns, deciding IsIn.
    """
    out: List[Tuple[str, Column]] = [(K_NROWS, F.count(F.lit(1)))]
    numeric_scalars: List[str] = []
    arrays: List[str] = []
    for f in schema.fields:
        col = F.col(f.name)
        out.append(
            (K_NULL + f.name, F.sum(col.isNull().cast("bigint")))
        )
        if isinstance(f.dataType, _NUMERIC):
            numeric_scalars.append(f.name)
            if not isinstance(f.dataType, T.DecimalType):
                # decimals are excluded: casting a 38-digit decimal to
                # double can round DOWN past a bound and fake a proof
                out.append((K_MIN + f.name, F.min(col).cast("double")))
                out.append((K_MAX + f.name, F.max(col).cast("double")))
        elif isinstance(f.dataType, T.ArrayType):
            arrays.append(f.name)
            # guard: only size non-null arrays, so the witness is
            # identical under either sizeOfNull legacy setting
            sz = F.when(col.isNotNull(), F.size(col))
            out.append((K_SIZEMIN + f.name, F.min(sz).cast("double")))
            out.append((K_SIZEMAX + f.name, F.max(sz).cast("double")))
            if isinstance(f.dataType.elementType, _NUMERIC):
                # array_min/array_max skip NULL elements — exactly the
                # rows forall's null-tolerant lambda lets pass
                out.append(
                    (K_ELEMMIN + f.name, F.min(F.array_min(col)).cast("double"))
                )
                out.append(
                    (K_ELEMMAX + f.name, F.max(F.array_max(col)).cast("double"))
                )
    pairs = 0
    for n in numeric_scalars:
        for a in arrays:
            if pairs >= pair_cap:
                break
            both = F.col(n).isNotNull() & F.col(a).isNotNull()
            # 0/1 violation indicator, not an arithmetic difference:
            # `n != size(a)` is EXACTLY the negation of the SizeEquals
            # predicate under Spark's own comparison semantics, so the
            # witness can't be skewed by double rounding or overflow
            bad = (F.col(n) != F.size(F.col(a))).cast("int")
            out.append(
                (f"{K_SIZEEQ}{n}.{a}", F.max(F.when(both, bad)).cast("double"))
            )
            pairs += 1
    for c in distinct_columns:
        f = schema[c]
        if not isinstance(f.dataType, T.StringType):
            raise ValueError(
                f"witness distinct_columns supports string columns only, "
                f"{c!r} is {f.dataType.simpleString()}"
            )
        s = F.collect_set(F.col(c))
        out.append(
            (
                K_DISTINCT + c,
                F.when(F.size(s) <= F.lit(distinct_cap), F.array_sort(s)),
            )
        )
    return out


def collect_witnesses(
    df: DataFrame,
    distinct_columns: Sequence[str] = (),
    distinct_cap: int = 64,
    pair_cap: int = 8,
) -> Dict:
    """Standalone collection: one aggregate pass → JSON-safe witness
    dict. (The checkpointed runner inlines `witness_aggs` into its own
    metrics aggregate instead — same keys, no extra pass.)"""
    pairs = witness_aggs(df.schema, distinct_columns, distinct_cap, pair_cap)
    row = df.agg(
        *[col.alias(f"_w{i}") for i, (_k, col) in enumerate(pairs)]
    ).collect()[0]
    return witnesses_from_row(pairs, row)


def witnesses_from_row(
    pairs: Sequence[Tuple[str, Column]], row, prefix: str = "_w"
) -> Dict:
    """Decode an aggregate Row (aliased ``<prefix><i>`` in pairs order)
    into the persisted witness dict: floats/ints/None, distinct lists
    as plain lists. NaN survives (json emits a NaN token, which
    json.loads round-trips) and is treated as poison by the prover."""
    out: Dict = {}
    for i, (k, _col) in enumerate(pairs):
        v = row[f"{prefix}{i}"]
        if isinstance(v, (list, tuple)):
            v = list(v)
        elif v is not None and not isinstance(v, (int, float, str)):
            v = float(v)
        out[k] = v
    return out


def _num(w: Dict, key: str):
    """(present, value) with NaN poisoned to a non-proving sentinel."""
    if key not in w:
        return False, None
    v = w[key]
    if isinstance(v, float) and math.isnan(v):
        return True, float("nan")
    return True, v


def _range_proof(w: Dict, kmin: str, kmax: str, lo, hi, hi_exclusive=False) -> bool:
    """Zero violations of a [lo, hi] bound on values whose aggregate
    min/max live at kmin/kmax. A None min/max means NO constrained
    values exist in the partition (all NULL, empty arrays, or zero
    rows) — vacuously proven, because NULL passes every non-NotNull
    constraint (compiler._null_tolerant)."""
    has_min, mn = _num(w, kmin)
    has_max, mx = _num(w, kmax)
    if not (has_min and has_max):
        return False
    if mn is None and mx is None:
        return True
    if mn is None or mx is None:
        return False  # inconsistent witness — don't trust it
    if isinstance(mn, float) and math.isnan(mn):
        return False
    if isinstance(mx, float) and math.isnan(mx):
        return False
    # at/beyond 2^53 a bigint→double witness may have rounded past the
    # true extremum — refuse to prove from it. The bound is INCLUSIVE:
    # a true max of 2^53+1 rounds (ties-to-even) to exactly 2^53, so a
    # stored 2^53 can mask a larger true value; any stored |v| < 2^53
    # is exactly representable and therefore exact.
    if abs(mn) >= 2.0**53 or abs(mx) >= 2.0**53:
        return False
    if lo is not None and not (mn >= lo):
        return False
    if hi is not None:
        if hi_exclusive:
            if not (mx < hi):
                return False
        elif not (mx <= hi):
            return False
    return True


def prove_zero_violations(
    c: C.Constraint,
    w: Optional[Dict],
    registry: Optional[Registry] = None,
) -> bool:
    """True ⟺ the witnesses PROVE constraint ``c`` has zero violating
    rows in the partition they were collected from. False = unknown
    (absent witness keys, unsupported constraint kind, NaN-poisoned
    stats, or the stats genuinely straddle the bound) — never a claim
    of violation. ``registry`` is needed only to resolve Ref targets."""
    if not w:
        return False
    if isinstance(c, C.NotNull):
        has, v = _num(w, K_NULL + c.column)
        return has and v == 0
    if isinstance(c, C.TypeIs):
        # static check; the compiled runtime predicate is lit(True).
        # SOUND ONLY because every caller compiles the registry against
        # the live table schema first (evolve does so up front, before
        # any proof) — compile raises UnknownColumn/ColumnTypeMismatch
        # for an invalid TypeIs, so a proof is never consulted for one.
        return True
    if isinstance(c, C.InRange):
        return _range_proof(
            w, K_MIN + c.column, K_MAX + c.column, c.lo, c.hi
        )
    if isinstance(c, C.ArrayLenBetween):
        return _range_proof(
            w, K_SIZEMIN + c.column, K_SIZEMAX + c.column, c.lo, c.hi
        )
    if isinstance(c, C.ElementsInRange):
        return _range_proof(
            w, K_ELEMMIN + c.column, K_ELEMMAX + c.column,
            c.lo, c.hi, hi_exclusive=True,
        )
    if isinstance(c, C.SizeEquals):
        key = f"{K_SIZEEQ}{c.column}.{c.array_column}"
        has, v = _num(w, key)
        if not has:
            return False
        if v is None:
            return True  # no row has both sides non-null ⇒ all pass
        if isinstance(v, float) and math.isnan(v):
            return False
        return v == 0
    if isinstance(c, C.IsIn):
        key = K_DISTINCT + c.column
        if key not in w:
            return False
        seen = w[key]
        if seen is None:  # over the collection cap
            return False
        allowed = {v for v in c.values if isinstance(v, str)}
        return all(s in allowed for s in seen)
    if isinstance(c, C.AnyOf):
        # pass iff ANY branch passes ⇒ one universally-passing branch
        # proves the alternation for every row
        return any(
            prove_zero_violations(b, w, registry) for b in c.branches
        )
    if isinstance(c, C.Ref):
        if registry is None or c.target not in registry:
            return False
        return all(
            prove_zero_violations(rc, w, registry)
            for rc in registry._sets[c.target].constraints
        )
    if isinstance(c, C.When):
        # inner passing unconditionally ⇒ When passes regardless of the
        # condition's truth value on each row
        return (
            c.inner is not None
            and prove_zero_violations(c.inner, w, registry)
        )
    # Matches / ElementsSatisfy / TupleRule / Expr (arbitrary SQL) and
    # every table-level constraint: not decidable from generic stats
    return False


def prove_constraints(
    registry: Registry,
    root: str,
    names: Sequence[str],
    w: Optional[Dict],
) -> Dict[str, bool]:
    """{name: proven} over the named top-level constraints of ``root``
    (missing names map to False — e.g. a delta name no longer in the
    new registry)."""
    by_name = {c.name: c for c in registry._sets[root].constraints}
    return {
        n: prove_zero_violations(by_name[n], w, registry)
        if n in by_name
        else False
        for n in names
    }
