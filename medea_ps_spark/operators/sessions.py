"""Gap-based sessionization — group an entity's event stream into
sessions separated by ≥ ``gap`` of inactivity, and roll sessions up to
one row each. The standard building block for behavioral training data
(session-level labels, funnel features, per-session aggregates).

Spark-first: the classic two-window formulation, fully expression-level
— a boundary flag (``lag`` over the per-key time order: is this event
more than ``gap`` after the previous one?) and a running sum of flags
that numbers each key's sessions. ONE hash shuffle on the key; both
windows reuse the same partitioning+sort, so Catalyst plans a single
Exchange + single Sort. No state store, no UDF — and unlike
``session_window`` streaming aggregation, the per-EVENT session id
stays available for joining features back.

Skew: a hot key's whole stream lands in one task (inherent to per-key
ordering). For bounded-retention streams that is bounded; for a
pathological key, :func:`sessionize_salted` pre-splits by
(key, time-bucket), sessionizes each bucket locally, and stitches
boundary sessions through a per-(key, bucket) summary — bit-identical
output, hot key spread over span/bucket tasks.

The whole construction (lag + cumsum windows) is bit-identical in
DuckDB, so it's SQL-oracle-able end to end.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from medea_ps_spark.operators.timeunits import ts_micros

SESSION_COL = "session_id"
TS_US_COL = "_ts_us"


def sessionize(
    df: DataFrame,
    gap_seconds: int,
    key_cols: Sequence[str] = ("user_id",),
    time_col: str = "ts",
    numeric_unit: str = "us",
) -> DataFrame:
    """Adds ``session_id`` (0-based per key, ordered by time) and
    ``_ts_us``: a new session starts at the first event and at every
    event MORE than ``gap_seconds`` after its predecessor (an event at
    exactly +gap still joins — the same boundary rule as Spark's native
    ``session_window``, so batch and streaming sessionization agree).
    Ties on time are ordered deterministically only if the caller's
    time values are unique per key (true for microsecond event logs);
    equal-time events always share a session either way.

    Numeric ``time_col`` values are EPOCH MICROSECONDS by default (the
    engine-wide convention, shared with rollup/rangejoin/asof via
    operators/timeunits.ts_micros); pass ``numeric_unit="s"``/``"ms"``
    for other units."""
    key_cols = list(key_cols)
    out = df.withColumn(
        TS_US_COL, ts_micros(df, time_col, numeric_unit=numeric_unit)
    )
    w = Window.partitionBy(*key_cols).orderBy(TS_US_COL)
    prev = F.lag(F.col(TS_US_COL)).over(w)
    new_session = (
        prev.isNull()
        | (F.col(TS_US_COL) - prev > gap_seconds * 1_000_000)
    ).cast("bigint")
    run = Window.partitionBy(*key_cols).orderBy(TS_US_COL).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return out.withColumn(
        SESSION_COL, F.sum(new_session).over(run) - F.lit(1)
    )


def sessionize_salted(
    df: DataFrame,
    gap_seconds: int,
    key_cols: Sequence[str] = ("user_id",),
    time_col: str = "ts",
    bucket_seconds: int | None = None,
    numeric_unit: str = "us",
) -> DataFrame:
    """Hot-key-safe :func:`sessionize` — BIT-IDENTICAL output columns
    (``session_id``, ``_ts_us``), but no single task ever holds a key's
    whole stream.

    Pre-split: events shuffle on (key, time-bucket) and sessionize
    LOCALLY inside each bucket (a celebrity key spanning S seconds
    spreads over S/bucket_seconds tasks). Stitch: a tiny per-
    (key, bucket) summary (min/max ts, local session count) is windowed
    per key in bucket order — the first local session of a bucket merges
    with the previous non-empty bucket's last session iff the boundary
    gap is <= gap (same inclusive rule as sessionize), and a running sum
    of (sessions - merges) renumbers every local id globally. Merge
    chains across any number of buckets (even empty ones) compose
    through the running sum, so the result equals the unsalted operator
    exactly (asserted in tests on random + planted-hot-key data).

    Cost: ONE full-width shuffle of events on (key, bucket) — same
    volume as sessionize's (key) shuffle — plus a NARROW second
    event-cardinality shuffle for the summary branch (Catalyst prunes
    it to (key, ts, bucket) before its exchange, which is why the
    full-width exchange isn't reused: ~24 bytes/row vs the full
    payload), plus tiny summary-window exchanges and a co-partitioned
    join back. Default bucket is 100x the gap (rarely-merging buckets,
    strong spread); any positive width is correct."""
    key_cols = list(key_cols)
    gap_us = gap_seconds * 1_000_000
    bucket_us = (bucket_seconds or gap_seconds * 100) * 1_000_000
    if bucket_us <= 0:
        raise ValueError("bucket_seconds must be positive")
    reserved = {"_bkt", "_lsid", "_m", "_gstart"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"input columns collide with sessionize_salted internals: "
            f"{sorted(reserved)}"
        )

    evt = df.withColumn(
        TS_US_COL, ts_micros(df, time_col, numeric_unit=numeric_unit)
    ).withColumn(
        # integer div (exact; monotone in ts, equal times share a
        # bucket — all the stitch needs), not floor of a double ratio
        "_bkt", F.expr(f"{TS_US_COL} div {bucket_us}")
    )

    w = Window.partitionBy(*key_cols, "_bkt").orderBy(TS_US_COL)
    prev = F.lag(F.col(TS_US_COL)).over(w)
    new_local = (
        prev.isNull() | (F.col(TS_US_COL) - prev > gap_us)
    ).cast("bigint")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    evt = evt.withColumn("_lsid", F.sum(new_local).over(run) - F.lit(1))

    # one row per (key, bucket): partial+final agg on the partitioning
    # the local window just established (no extra event shuffle)
    summary = evt.groupBy(*key_cols, "_bkt").agg(
        F.min(TS_US_COL).alias("_min_ts"),
        F.max(TS_US_COL).alias("_max_ts"),
        (F.max("_lsid") + 1).alias("_s"),
    )
    wk = Window.partitionBy(*key_cols).orderBy("_bkt")
    # NULL lag (first non-empty bucket) compares to NULL -> otherwise 0
    merged = (
        F.when(
            F.col("_min_ts") - F.lag("_max_ts").over(wk) <= gap_us, F.lit(1)
        ).otherwise(F.lit(0))
    )
    gstart = F.coalesce(
        F.sum(F.col("_s") - F.col("_m")).over(
            wk.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    summary = (
        summary.withColumn("_m", merged)
        .withColumn("_gstart", gstart)
        .select(*key_cols, "_bkt", "_m", "_gstart")
    )
    out = evt.join(summary, on=key_cols + ["_bkt"], how="inner")
    out = out.withColumn(
        SESSION_COL, F.col("_gstart") + F.col("_lsid") - F.col("_m")
    )
    return out.drop("_bkt", "_lsid", "_m", "_gstart")


def session_stats(
    sessions: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    value_col: str = "value",
) -> DataFrame:
    """One row per session: bounds (epoch micros), duration, event
    count, value sum — a partial+final hash agg on the
    (key, session_id) grouping the sessionize shuffle co-located."""
    key_cols = list(key_cols)
    return sessions.groupBy(*key_cols, SESSION_COL).agg(
        F.min(TS_US_COL).alias("start_us"),
        F.max(TS_US_COL).alias("end_us"),
        (F.max(TS_US_COL) - F.min(TS_US_COL)).alias("duration_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).alias("value_sum"),
    )
