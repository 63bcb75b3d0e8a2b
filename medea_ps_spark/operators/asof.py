"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks
natively (pandas-on-Spark merge_asof exists but detours through another
API; SQL engines like DuckDB ship ASOF JOIN, which is exactly the twin
used to oracle-check this implementation).

Semantics: for each left row, attach the LATEST right row whose time is
<= the left row's time (or strictly < with ``strict=True``), matched per
key — "what was the reference value when this event happened": feature
lookups at training-example time, config/profile versions in effect at
validation time, last-login at click time.

Spark-first design — union + sorted carry-forward, NOT a join:

1. tag both sides and union them on an aligned schema (right's payload
   columns ride along as ``_rv_*``, null on left rows);
2. ONE window per key ordered by (time, side) with a running frame:
   ``last(_rv_*, ignorenulls=True)`` carries the most recent right
   payload forward onto every subsequent left row;
3. keep left rows, rename carried columns.

Cost: a single hash shuffle of both sides on the key + a sort within
partitions — the same price as any co-keyed join — and the running
frame is streaming (no per-key buffering beyond the sort). A
point-in-time range JOIN instead explodes to |left| × |right-per-key|
candidates before the argmax; this never materializes candidates at
all. Skewed keys behave like any other window partition (salt upstream
if one key dominates).

Tie rule: right rows sort before left rows at equal time (inclusive
as-of), after them with ``strict=True``. Multiple right rows at the
SAME (key, time) are ordered by ``tiebreak_cols`` (latest wins) so the
result is deterministic — pass the right side's unique id there.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

_SIDE = "_asof_side"
_PREFIX = "_rv_"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
    strict: bool = False,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Left as-of join: every left row, plus the latest-right
    ``value_cols`` (renamed ``<col><suffix>``, null when no right row
    precedes)."""
    key_cols = list(key_cols)
    value_cols = list(value_cols)
    tiebreak_cols = list(tiebreak_cols)

    # right rows win ties at equal time unless strict (then they lose)
    r_side, l_side = (1, 0) if strict else (0, 1)
    r = right.select(
        *key_cols,
        F.col(time_col),
        *[F.col(c).alias(f"{_PREFIX}{c}") for c in value_cols],
        *[F.col(c).alias(f"_tb_{c}") for c in tiebreak_cols],
        F.lit(r_side).alias(_SIDE),
    )
    left_payload = [c for c in left.columns if c not in key_cols + [time_col]]
    l = left.select(
        *key_cols,
        F.col(time_col),
        *left_payload,
        F.lit(l_side).alias(_SIDE),
    )
    for c in value_cols:
        l = l.withColumn(f"{_PREFIX}{c}", F.lit(None))
    for c in tiebreak_cols:
        l = l.withColumn(f"_tb_{c}", F.lit(None))
    for c in left_payload:
        r = r.withColumn(c, F.lit(None))
    both = l.unionByName(r.select(*l.columns))

    order = [F.col(time_col).asc(), F.col(_SIDE).asc()] + [
        F.col(f"_tb_{c}").asc_nulls_first() for c in tiebreak_cols
    ]
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.select(
        "*",
        *[
            F.last(F.col(f"{_PREFIX}{c}"), ignorenulls=True)
            .over(w)
            .alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    out = carried.where(F.col(_SIDE) == l_side).drop(
        _SIDE,
        *[f"{_PREFIX}{c}" for c in value_cols],
        *[f"_tb_{c}" for c in tiebreak_cols],
    )
    return out
