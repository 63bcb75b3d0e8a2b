"""Bucketed range join — point-in-interval matching without the
nested-loop trap.

``points.join(intervals, point BETWEEN start AND end)`` has no equi-key,
so Spark plans BroadcastNestedLoopJoin (every point × every interval) —
a scale-killer the moment the interval side outgrows a broadcast. The
classic fix is bucketing: quantize the axis into fixed-width buckets,
explode each interval onto the buckets it covers, map each point to its
single bucket, then EQUI-join on (keys..., bucket) and keep the exact
containment filter. Candidates are bounded by bucket co-residency
instead of the cross product, and the join is an ordinary hash/SMJ the
optimizer can distribute.

Cost model: the interval side is replicated ×(avg_span/bucket_width+1),
the point side not at all — pick ``bucket_width`` near the typical
interval span. Degenerate long intervals replicate many buckets;
``max_buckets_per_interval`` rejects those loudly rather than silently
exploding the shuffle (split such intervals upstream, or raise the
width).

Everything is expression-level (floor-div + sequence + explode), so
the operator is SQL-oracle-able against a plain BETWEEN join.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

_BUCKET = "_range_bucket"


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    keys: Sequence[str] = (),
    max_buckets_per_interval: Optional[int] = 4096,
) -> DataFrame:
    """All (point, interval) pairs with ``start <= point <= end`` (and
    equal ``keys``), as an equi-join on the bucketed axis. Columns of
    both inputs are preserved; axis columns must be numeric — epoch
    micros for time axes (operators/timeunits.ts_micros, the engine
    convention)."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    keys = list(keys)
    p = points.withColumn(
        _BUCKET, F.floor(F.col(point_col) / bucket_width)
    )
    lo = F.floor(F.col(start_col) / bucket_width)
    hi = F.floor(F.col(end_col) / bucket_width)
    if max_buckets_per_interval is not None:
        guard = F.when(
            hi - lo + 1 > max_buckets_per_interval,
            F.raise_error(
                F.concat(
                    F.lit(
                        "interval spans more than "
                        f"{max_buckets_per_interval} buckets of width "
                        f"{bucket_width}; split it or raise bucket_width: "
                    ),
                    F.col(start_col).cast("string"),
                    F.lit(".."),
                    F.col(end_col).cast("string"),
                )
            ),
        ).otherwise(hi)
    else:
        guard = hi
    iv = intervals.withColumn(_BUCKET, F.explode(F.sequence(lo, guard)))
    joined = p.join(iv, on=keys + [_BUCKET], how="inner").where(
        F.col(point_col).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop(_BUCKET)
