"""Hypertable-style time rollup — multi-resolution continuous
aggregates (hour → day → total) in ONE pass.

Timescale-style hypertables answer "events per hour / per day / overall"
from maintained rollup tables. Spark-first, the read side is a single
``ROLLUP`` grouping-set aggregation: Catalyst expands (day, hour),
(day), () into one partial+final hash agg over one scan — three
resolutions for the price of one, instead of three scans or a
re-aggregation chain. Time keys are integer epoch-microsecond bucket
starts (exact cross-engine arithmetic, no timezone/format drift);
rolled-up levels carry NULL in the finer columns, per SQL semantics,
plus an explicit ``grain`` label.

The write side composes with the engine's checkpoint machinery: rollups
are plain aggregates, so per-partition incremental maintenance =
re-aggregate only partitions the checkpoint manifest marks dirty and
overwrite their rollup slices (operators/checkpoint.py); nothing here
needs bespoke state.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

_US_PER_HOUR = 3_600 * 1_000_000
_US_PER_DAY = 24 * _US_PER_HOUR


def _ts_us(df: DataFrame, ts_col: str) -> Column:
    from pyspark.sql.types import TimestampNTZType, TimestampType

    c = F.col(ts_col)
    dt = df.schema[ts_col].dataType
    if isinstance(dt, TimestampNTZType):
        return F.unix_micros(c.cast("timestamp"))
    if isinstance(dt, TimestampType):
        return F.unix_micros(c)
    return c.cast("bigint")


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    extra_keys: Sequence[str] = (),
) -> DataFrame:
    """(extra_keys..., day_us, hour_us, grain, n_events, value_sum):
    hourly rows plus their daily and total roll-ups from one
    grouping-set aggregation. ``grain`` ∈ {hour, day, total}; bucket
    columns are NULL above their grain."""
    us = _ts_us(df, ts_col)
    day = (F.floor(us / _US_PER_DAY) * _US_PER_DAY).cast("bigint")
    hour = (F.floor(us / _US_PER_HOUR) * _US_PER_HOUR).cast("bigint")
    keyed = df.select(
        *[F.col(k) for k in extra_keys],
        day.alias("day_us"),
        hour.alias("hour_us"),
        F.col(value_col).alias("_v"),
    )
    rolled = keyed.rollup(*extra_keys, "day_us", "hour_us").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("_v").alias("value_sum"),
    )
    grain = (
        F.when(F.col("hour_us").isNotNull(), F.lit("hour"))
        .when(F.col("day_us").isNotNull(), F.lit("day"))
        .otherwise(F.lit("total"))
    )
    # with extra_keys leading, ROLLUP's extra levels are exactly the
    # per-key totals (time rolled away, key kept) and the grand total —
    # both meaningful, both labeled "total" by grain
    out = rolled.withColumn("grain", grain)
    return out.select(
        *extra_keys, "day_us", "hour_us", "grain", "n_events", "value_sum"
    )
