"""Constraint suggestion — profile a table once, emit a ConstraintSet.

The Deequ idea (Schelter et al., "Automating Large-Scale Data Quality
Verification", VLDB 2018, public literature): derive candidate
constraints from observed column statistics, then let the engine enforce
them on every future snapshot. The reference has no profiling notion
(schemata are hand-written, /root/reference/TUTORIAL.md); this is part
of the §2D north-rule generalization — the suggested set feeds straight
into :mod:`plans.compiler` / :mod:`operators.validator`, closing the
loop profile → suggest → compile → validate.

Scale design
------------
* Pass 1 is ONE global hash aggregate over the scan (partial+final, the
  treeAggregate shape): per column min/max/null-count, HLL distinct
  (approx_count_distinct), string lengths, array size/element bounds —
  all columns in the same pass, one 1-row collect.
* Pass 2 runs ONLY if pass 1 nominated candidates, and only over those
  columns: exact ``collect_set`` for enum candidates (bounded — the HLL
  estimate already capped the cardinality) and exact count(distinct)
  for uniqueness candidates, again one aggregate, one 1-row collect.
* Optional pass 3 (``partition_col``) reuses the per-partition
  :func:`operators.stats.column_stats` shape — |partitions| rows — to
  suggest StatsBound null-rate ceilings that hold per partition.
* Nothing else ever reaches the driver; at 100 TB this is 2-3 scans
  with byte-sized results, the same cost as the stats the north rule
  mandates anyway.

Guarantees: every suggested constraint holds on the profiled data
(closed loop — compile + validate yields zero violations), verified by
``tests/test_suggest.py`` including on randomized frames.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, functions as F, types as T

from ..plans.constraints import (
    ArrayLenBetween,
    Constraint,
    ConstraintSet,
    ElementsInRange,
    InRange,
    IsIn,
    NotNull,
    StatsBound,
    Unique,
)

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FRACTIONAL = (T.FloatType, T.DoubleType)
_NUMERIC = _INTEGRAL + _FRACTIONAL


def profile_columns(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    hll_rsd: float = 0.05,
) -> Dict[str, dict]:
    """One-pass per-column profile. Returns ``{col: stats}`` plus a
    ``"$table"`` entry with ``n_rows``. Stats keys depend on dtype:
    always ``nulls`` and ``approx_distinct``; numerics add
    ``min``/``max``; strings add ``min_len``/``max_len``; arrays of
    integral elements add ``min_size``/``max_size``/``elem_min``/
    ``elem_max``."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = [f.name for f in df.schema.fields]
    aggs: List = [F.count(F.lit(1)).alias("$n")]
    for i, c in enumerate(columns):
        dt = fields[c]
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"{i}$nulls"))
        if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
            if isinstance(dt, T.ArrayType):
                aggs += [
                    F.min(F.size(col)).alias(f"{i}$min_size"),
                    F.max(F.size(col)).alias(f"{i}$max_size"),
                ]
                if isinstance(dt.elementType, _INTEGRAL):
                    aggs += [
                        F.min(F.array_min(col)).alias(f"{i}$elem_min"),
                        F.max(F.array_max(col)).alias(f"{i}$elem_max"),
                    ]
            continue  # no distinct sketch over nested values
        aggs.append(
            F.approx_count_distinct(col, rsd=hll_rsd).alias(f"{i}$approx_distinct")
        )
        if isinstance(dt, _NUMERIC):
            aggs += [F.min(col).alias(f"{i}$min"), F.max(col).alias(f"{i}$max")]
        elif isinstance(dt, T.StringType):
            aggs += [
                F.min(F.length(col)).alias(f"{i}$min_len"),
                F.max(F.length(col)).alias(f"{i}$max_len"),
            ]
    row = df.agg(*aggs).collect()[0].asDict()
    out: Dict[str, dict] = {"$table": {"n_rows": row["$n"]}}
    for i, c in enumerate(columns):
        pref = f"{i}$"
        out[c] = {
            k[len(pref):]: v for k, v in row.items() if k.startswith(pref)
        }
    return out


def suggest_constraints(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    *,
    set_name: str = "$start",
    enum_max_distinct: int = 32,
    unique_candidates: Optional[Sequence[str]] = None,
    partition_col: Optional[str] = None,
    null_rate_slack: float = 0.0,
    hll_rsd: float = 0.05,
) -> ConstraintSet:
    """Profile ``df`` and return a :class:`ConstraintSet` of constraints
    that all hold on the profiled data.

    Rules (each constraint id names its rule + column):
      * ``nn_<col>``     NotNull        — observed null count is 0.
      * ``range_<col>``  InRange        — numeric [min, max].
      * ``enum_<col>``   IsIn           — string col whose EXACT distinct
        set (pass 2) has ≤ ``enum_max_distinct`` values; the set is
        sorted for determinism. NULL passes (SQL CHECK semantics) — pair
        with ``nn_`` when nulls were absent.
      * ``len_<col>``    ArrayLenBetween — array size within [min, max].
      * ``elems_<col>``  ElementsInRange — integral array elements within
        [min, max+1) (engine's exclusive upper bound).
      * ``uniq_<col>``   Unique          — table-level; only for columns
        in ``unique_candidates`` (or HLL-nominated when None) whose
        EXACT distinct count (pass 2) equals the row count and which
        contain no NULLs.
      * ``nullrate_<col>`` StatsBound   — with ``partition_col``: per-
        partition null_rate ceiling = worst observed partition's rate
        (+ ``null_rate_slack``), floor 0.

    All-NULL and empty tables yield no evidence → no constraint.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = [f.name for f in df.schema.fields]
    prof = profile_columns(df, columns, hll_rsd=hll_rsd)
    n_rows = prof["$table"]["n_rows"]
    out: List[Constraint] = []
    if n_rows == 0:
        return ConstraintSet(name=set_name, constraints=[])

    # -- pass-2 nominations --------------------------------------------------
    enum_noms: List[str] = []
    uniq_noms: List[str] = []
    for c in columns:
        st, dt = prof[c], fields[c]
        if (
            isinstance(dt, T.StringType)
            and st.get("approx_distinct") is not None
            and st["approx_distinct"] <= math.ceil(enum_max_distinct * (1 + 3 * hll_rsd))
        ):
            enum_noms.append(c)
        nn = n_rows - st["nulls"]
        if unique_candidates is not None:
            if c in unique_candidates:
                uniq_noms.append(c)
        elif (
            not isinstance(dt, (T.ArrayType, T.MapType, T.StructType))
            and st["nulls"] == 0
            and nn > 0
            and st.get("approx_distinct", 0) >= nn * (1 - 3 * hll_rsd)
        ):
            uniq_noms.append(c)

    exact: dict = {}
    if enum_noms or uniq_noms:
        aggs2: List = []
        for c in enum_noms:
            aggs2.append(F.collect_set(F.col(c)).alias(f"set${c}"))
        for c in uniq_noms:
            aggs2.append(F.count_distinct(F.col(c)).alias(f"nd${c}"))
        exact = df.agg(*aggs2).collect()[0].asDict()

    # -- emit ----------------------------------------------------------------
    for c in columns:
        st, dt = prof[c], fields[c]
        if st["nulls"] == 0:
            out.append(NotNull(name=f"nn_{c}", column=c))
        if isinstance(dt, _NUMERIC) and st.get("min") is not None:
            lo, hi = st["min"], st["max"]
            if isinstance(dt, _INTEGRAL):
                lo, hi = int(lo), int(hi)
            else:
                lo, hi = float(lo), float(hi)
            out.append(InRange(name=f"range_{c}", column=c, lo=lo, hi=hi))
        if c in enum_noms:
            vals = sorted(v for v in exact[f"set${c}"] if v is not None)
            if 0 < len(vals) <= enum_max_distinct:
                out.append(IsIn(name=f"enum_{c}", column=c, values=tuple(vals)))
        if isinstance(dt, T.ArrayType) and st.get("min_size") is not None:
            out.append(
                ArrayLenBetween(
                    name=f"len_{c}", column=c,
                    lo=int(st["min_size"]), hi=int(st["max_size"]),
                )
            )
            if st.get("elem_min") is not None:
                out.append(
                    ElementsInRange(
                        name=f"elems_{c}", column=c,
                        lo=int(st["elem_min"]), hi=int(st["elem_max"]) + 1,
                    )
                )
        if (
            c in uniq_noms
            and st["nulls"] == 0
            and exact.get(f"nd${c}") == n_rows
        ):
            out.append(Unique(name=f"uniq_{c}", column=c))

    if partition_col is not None:
        # per-partition null rates, worst partition per column
        rates = (
            df.groupBy(partition_col)
            .agg(
                *[
                    F.avg(F.col(c).isNull().cast("double")).alias(f"r${c}")
                    for c in columns
                    if c != partition_col
                ]
            )
            .agg(
                *[
                    F.max(F.col(f"r${c}")).alias(f"r${c}")
                    for c in columns
                    if c != partition_col
                ]
            )
            .collect()[0]
            .asDict()
        )
        for c in columns:
            if c == partition_col:
                continue
            worst = rates.get(f"r${c}")
            if worst is None:
                continue
            out.append(
                StatsBound(
                    name=f"nullrate_{c}", column=c, agg="null_rate",
                    lo=0.0, hi=min(1.0, worst + null_rate_slack),
                )
            )
    return ConstraintSet(name=set_name, constraints=out)


def suggestions_rows(cs: ConstraintSet) -> List[dict]:
    """Human/driver-readable rendering: one dict per suggestion with
    (constraint_id, kind, column, params) — deterministic order."""
    rows = []
    for c in cs.constraints:
        d = {k: v for k, v in c.__dict__.items() if k != "name"}
        col = d.pop("column", "")
        rows.append(
            {
                "constraint_id": c.name,
                "kind": type(c).__name__,
                "column": col,
                "params": repr(sorted(d.items())),
            }
        )
    return sorted(rows, key=lambda r: r["constraint_id"])
