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

from pyspark.sql import DataFrame, functions as F

from medea_ps_spark.operators.timeunits import ts_micros

_US_PER_HOUR = 3_600 * 1_000_000
_US_PER_DAY = 24 * _US_PER_HOUR


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    extra_keys: Sequence[str] = (),
    numeric_unit: str = "us",
    key_grouping: bool = False,
) -> DataFrame:
    """(extra_keys..., day_us, hour_us, grain, n_events, value_sum):
    hourly rows plus their daily and total roll-ups from one
    grouping-set aggregation. ``grain`` ∈ {hour, day, total}; bucket
    columns are NULL above their grain. Numeric ``ts_col`` values are
    epoch micros by default (engine convention — timeunits.ts_micros).

    ``key_grouping=True`` appends a ``grouping_<k>`` (0/1) column per
    extra key: ROLLUP also rolls the extra keys away (per-key totals,
    grand total), and a genuine NULL value in an extra key is otherwise
    indistinguishable from that key's rolled-away level — the same
    ambiguity class the GROUPING()-based ``grain`` fixes for the time
    buckets (ADVICE r3). Off by default to keep the base schema."""
    us = ts_micros(df, ts_col, numeric_unit=numeric_unit)
    day = (F.floor(us / _US_PER_DAY) * _US_PER_DAY).cast("bigint")
    hour = (F.floor(us / _US_PER_HOUR) * _US_PER_HOUR).cast("bigint")
    keyed = df.select(
        *[F.col(k) for k in extra_keys],
        day.alias("day_us"),
        hour.alias("hour_us"),
        F.col(value_col).alias("_v"),
    )
    # grain from GROUPING(), not bucket NULL-ness: rows with NULL ts form
    # a real (NULL, NULL) group at the hour level that NULL-based labeling
    # would silently merge with the ROLLUP subtotal/grand-total rows.
    # grouping() is only valid inside the agg clause, so grain is an agg
    # output. With extra_keys leading, ROLLUP's extra levels are exactly
    # the per-key totals and the grand total — both labeled "total".
    grain = (
        F.when(F.grouping("hour_us") == 0, F.lit("hour"))
        .when(F.grouping("day_us") == 0, F.lit("day"))
        .otherwise(F.lit("total"))
    )
    key_flags = (
        [F.grouping(k).alias(f"grouping_{k}") for k in extra_keys]
        if key_grouping
        else []
    )
    rolled = keyed.rollup(*extra_keys, "day_us", "hour_us").agg(
        grain.alias("grain"),
        *key_flags,
        F.count(F.lit(1)).alias("n_events"),
        F.sum("_v").alias("value_sum"),
    )
    return rolled.select(
        *extra_keys,
        "day_us",
        "hour_us",
        "grain",
        *[f"grouping_{k}" for k in extra_keys if key_grouping],
        "n_events",
        "value_sum",
    )
