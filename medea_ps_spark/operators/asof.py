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
all. Skewed keys: :func:`asof_join_salted` pre-splits the window by
(key, time-bucket) and carries the latest right payload across buckets
through a tiny per-bucket summary — same output, a celebrity key
spreads over span/bucket tasks.

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


def _tagged_union(left, right, key_cols, time_col, value_cols,
                  tiebreak_cols, strict):
    """Aligned union of both sides: right payload rides as ``_rv_*``
    (null on left rows), left payload null on right rows. Returns
    (both, l_side, order_cols)."""
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
    return both, l_side, order


def _strip(carried, l_side, value_cols, tiebreak_cols):
    return carried.where(F.col(_SIDE) == l_side).drop(
        _SIDE,
        *[f"{_PREFIX}{c}" for c in value_cols],
        *[f"_tb_{c}" for c in tiebreak_cols],
    )


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
    both, l_side, order = _tagged_union(
        left, right, key_cols, time_col, value_cols, tiebreak_cols, strict
    )
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
    return _strip(carried, l_side, value_cols, tiebreak_cols)


def asof_join_salted(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    value_cols: Sequence[str],
    bucket_width_us: int,
    suffix: str = "_asof",
    strict: bool = False,
    tiebreak_cols: Sequence[str] = (),
    numeric_unit: str = "us",
) -> DataFrame:
    """Hot-key-safe :func:`asof_join` — identical output, but the
    per-key window is pre-split by (key, time-bucket) so a celebrity
    key spreads over span/bucket_width tasks instead of landing whole
    in one.

    Construction: the same tagged union shuffles ONCE on
    (key, bucket); a local running ``last(ignorenulls)`` carries right
    payloads within each bucket. Cross-bucket carry-in comes from a
    tiny one-row-per-(key, bucket) summary (the bucket's final carried
    payload), windowed per key in bucket order with a 1-bucket-lag
    frame, joined back on the co-partitioned (key, bucket). A left row
    takes its in-bucket carry if any right row precedes it locally,
    else the carry-in. Equal-time rows always share a bucket
    (bucket = floor(time/width)), so strict/tie semantics are decided
    inside the local window exactly as in asof_join.

    ``bucket_width_us`` is in epoch MICROSECONDS (the engine-wide time
    convention — operators/timeunits). Timestamp columns are converted
    internally; numeric columns are read per ``numeric_unit``.

    NULL keys / NULL times are retained exactly like :func:`asof_join`
    (the unsalted window groups NULL keys; NULL times sort first): the
    carry-in join is null-safe on every key plus the bucket, so no row
    is dropped."""
    if bucket_width_us <= 0:
        raise ValueError("bucket_width_us must be positive")
    key_cols = list(key_cols)
    value_cols = list(value_cols)
    tiebreak_cols = list(tiebreak_cols)
    internals = {"_bkt", "_ts_us_salt"} | {
        p + c for c in value_cols for p in ("_loc_", "_fin_", "_cin_")
    }
    reserved = internals & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(
            f"input columns collide with asof_join_salted internals: "
            f"{sorted(reserved)}"
        )
    both, l_side, order = _tagged_union(
        left, right, key_cols, time_col, value_cols, tiebreak_cols, strict
    )
    from medea_ps_spark.operators.timeunits import ts_micros

    # integer div (exact; monotone in time, equal times share a
    # bucket), not floor of a double ratio
    both = both.withColumn(
        "_ts_us_salt", ts_micros(both, time_col, numeric_unit=numeric_unit)
    ).withColumn("_bkt", F.expr(f"_ts_us_salt div {bucket_width_us}"))
    w = (
        Window.partitionBy(*key_cols, "_bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wfull = (
        Window.partitionBy(*key_cols, "_bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    # the base operator's carry is last-NON-NULL per column (a null
    # right payload is skipped), so the salted twin is per-column too:
    # local carry within the bucket + the bucket's final carry (both
    # from the same sort — no extra shuffle), then a per-key window
    # over the tiny bucket summary threads the final carries across
    # buckets (ignorenulls skips buckets with no non-null payload).
    carried = both.select(
        "*",
        *[
            F.last(F.col(f"{_PREFIX}{c}"), ignorenulls=True)
            .over(w)
            .alias(f"_loc_{c}")
            for c in value_cols
        ],
        *[
            F.last(F.col(f"{_PREFIX}{c}"), ignorenulls=True)
            .over(wfull)
            .alias(f"_fin_{c}")
            for c in value_cols
        ],
    )
    summary = carried.groupBy(*key_cols, "_bkt").agg(
        *[F.first(f"_fin_{c}").alias(f"_fin_{c}") for c in value_cols]
    )
    wk = Window.partitionBy(*key_cols).orderBy("_bkt")
    carry_in = summary.select(
        *key_cols,
        "_bkt",
        *[
            F.last(F.col(f"_fin_{c}"), ignorenulls=True)
            .over(wk.rowsBetween(Window.unboundedPreceding, -1))
            .alias(f"_cin_{c}")
            for c in value_cols
        ],
    )
    # NULL-SAFE carry-in join (ADVICE r4): NULL keys (and NULL times,
    # whose bucket is NULL) are matched by the unsalted twin's window
    # partitionBy — which groups NULLs — so the stitch must match them
    # too; eqNullSafe keeps this an equi-join for Catalyst.
    from medea_ps_spark.operators.joinutil import null_safe_join

    joined = null_safe_join(carried, carry_in, key_cols + ["_bkt"])
    final = joined.select(
        "*",
        *[
            F.coalesce(F.col(f"_loc_{c}"), F.col(f"_cin_{c}")).alias(
                f"{c}{suffix}"
            )
            for c in value_cols
        ],
    ).drop(
        "_bkt",
        "_ts_us_salt",
        *[f"_loc_{c}" for c in value_cols],
        *[f"_fin_{c}" for c in value_cols],
        *[f"_cin_{c}" for c in value_cols],
    )
    return _strip(final, l_side, value_cols, tiebreak_cols)
