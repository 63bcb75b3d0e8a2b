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
pathological key, pre-split by (key, time-bucket) and stitch boundary
sessions — the same salting pattern as referential.py.

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
