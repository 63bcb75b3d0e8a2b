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

from medea_ps_spark.operators.joinutil import null_safe_join as _null_safe_join
from medea_ps_spark.operators.timeunits import ts_micros

SESSION_COL = "session_id"
TS_US_COL = "_ts_us"


def sessionize(
    df: DataFrame,
    gap_seconds: int,
    key_cols: Sequence[str] = ("user_id",),
    time_col: str = "ts",
    numeric_unit: str = "us",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Adds ``session_id`` (0-based per key, ordered by time) and
    ``_ts_us``: a new session starts at the first event and at every
    event MORE than ``gap_seconds`` after its predecessor (an event at
    exactly +gap still joins — the same boundary rule as Spark's native
    ``session_window``, so batch and streaming sessionization agree).

    Session MEMBERSHIP is deterministic even with duplicate timestamps
    (equal-time events always share a session: only the first row of an
    equal-time group can carry a boundary flag, and the flag depends on
    the previous DISTINCT time, so every row of the group gets the same
    running sum regardless of intra-group order). ``tiebreak_cols``
    additionally pins the ROW ORDER among equal-time events (pass the
    event's unique id) so downstream order-sensitive consumers — e.g.
    first/last-event-in-session features — are deterministic too, the
    same knob :func:`asof_join` exposes.

    Numeric ``time_col`` values are EPOCH MICROSECONDS by default (the
    engine-wide convention, shared with rollup/rangejoin/asof via
    operators/timeunits.ts_micros — NOTE this default changed from
    seconds in round 4); pass ``numeric_unit="s"``/``"ms"`` for other
    units."""
    key_cols = list(key_cols)
    order = [F.col(TS_US_COL).asc()] + [
        F.col(c).asc_nulls_first() for c in tiebreak_cols
    ]
    out = df.withColumn(
        TS_US_COL, ts_micros(df, time_col, numeric_unit=numeric_unit)
    )
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(F.col(TS_US_COL)).over(w)
    new_session = (
        prev.isNull()
        | (F.col(TS_US_COL) - prev > gap_seconds * 1_000_000)
    ).cast("bigint")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
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
    tiebreak_cols: Sequence[str] = (),
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
    strong spread); any positive width is correct.

    NULL keys and NULL times are retained exactly like the unsalted
    operator (window partitionBy groups NULL keys together; NULL times
    sort first and each start their own session): the stitch join is
    null-safe on every key plus the bucket, so no row is dropped."""
    key_cols = list(key_cols)
    gap_us = gap_seconds * 1_000_000
    bucket_s = bucket_seconds if bucket_seconds is not None \
        else gap_seconds * 100
    bucket_us = bucket_s * 1_000_000
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

    order = [F.col(TS_US_COL).asc()] + [
        F.col(c).asc_nulls_first() for c in tiebreak_cols
    ]
    w = Window.partitionBy(*key_cols, "_bkt").orderBy(*order)
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
    # NULL-SAFE stitch (ADVICE r4): a plain USING join drops rows whose
    # key (or time -> bucket) is NULL, while the unsalted twin's window
    # groups them; eqNullSafe (`<=>`) is still an equi-join key for
    # Catalyst, so this stays a hash/sort-merge join. The summary side
    # is renamed first — it derives from `evt`, and a self-join on raw
    # column references would be silently ambiguous.
    out = _null_safe_join(evt, summary, key_cols + ["_bkt"])
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
