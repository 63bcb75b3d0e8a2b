"""Single-pass per-partition column statistics + StatsBound verdicts.

North-rule operator (SURVEY.md §2D row 1): min/max/null-rate/count per
partition in ONE partial+final hash aggregate — Catalyst's hash
aggregation with map-side partial merge is the DataFrame analogue of
treeAggregate. Grouping by the table's physical partition column
(``source``) means the shuffle moves only |groups| × |aggs| rows.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from ..plans.constraints import StatsBound


def column_stats(
    df: DataFrame,
    columns: Sequence[str],
    partition_col: Optional[str] = "source",
) -> DataFrame:
    """One row per partition with min/max/avg/null_rate/count per column.
    Output columns: ``<col>_min``, ``<col>_max``, ``<col>_avg``,
    ``<col>_null_rate``, plus ``n_rows``."""
    aggs: List = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs += [
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
            F.avg(F.col(c).cast("double")).alias(f"{c}_avg"),
            F.avg(F.col(c).isNull().cast("double")).alias(f"{c}_null_rate"),
        ]
    if partition_col:
        return df.groupBy(partition_col).agg(*aggs)
    return df.agg(*aggs)


def stats_bound_verdicts(
    df: DataFrame,
    bounds: Sequence[StatsBound],
    partition_col: str = "source",
) -> DataFrame:
    """Partition-level constraint verdicts: one row per
    (partition, constraint) with observed aggregate + passed flag.
    All bounds evaluate in the SAME single aggregate pass."""
    aggs = []
    for i, b in enumerate(bounds):
        col = F.col(b.column)
        if b.agg == "min":
            a = F.min(col)
        elif b.agg == "max":
            a = F.max(col)
        elif b.agg == "avg":
            a = F.avg(col.cast("double"))
        elif b.agg == "null_rate":
            a = F.avg(col.isNull().cast("double"))
        elif b.agg == "count":
            a = F.count(col)
        elif b.agg == "quantile":
            # single-pass mergeable percentile sketch (partial per task,
            # merged at the partition agg) — bounds a p99 at 10^12 rows
            # without a sort; approximate by contract (±1/accuracy rank).
            # Validate here too: direct operator calls (no Registry
            # compile) must fail with the constraint named, not a
            # TypeError / opaque Spark error.
            if b.q is None or not (0.0 < float(b.q) < 1.0):
                raise ValueError(
                    f"{b.name}: agg='quantile' needs q in (0,1), got {b.q!r}"
                )
            if int(b.accuracy) <= 0:
                raise ValueError(
                    f"{b.name}: accuracy must be positive, got {b.accuracy!r}"
                )
            a = F.percentile_approx(
                col.cast("double"), F.lit(float(b.q)), F.lit(int(b.accuracy))
            )
        elif b.agg == "approx_distinct":
            # HLL++ sketch: kilobytes of state per partition regardless
            # of cardinality; rsd is the contract error
            if not (0.0 < float(b.rsd) < 1.0):
                raise ValueError(
                    f"{b.name}: rsd must be in (0,1), got {b.rsd!r}"
                )
            a = F.approx_count_distinct(col, rsd=float(b.rsd))
        else:
            raise ValueError(f"unknown agg {b.agg}")
        aggs.append(a.cast("double").alias(f"_obs_{i}"))
    agged = df.groupBy(partition_col).agg(*aggs)
    verdict_structs = []
    for i, b in enumerate(bounds):
        obs = F.col(f"_obs_{i}")
        ok = F.lit(True)
        if b.lo is not None:
            ok = ok & (obs >= F.lit(float(b.lo)))
        if b.hi is not None:
            ok = ok & (obs <= F.lit(float(b.hi)))
        verdict_structs.append(
            F.struct(
                F.lit(b.name).alias("constraint_id"),
                obs.alias("observed"),
                F.coalesce(ok, F.lit(False)).alias("passed"),
            )
        )
    exploded = agged.select(
        F.col(partition_col),
        F.explode(F.array(*verdict_structs)).alias("v"),
    )
    return exploded.select(
        partition_col,
        F.col("v.constraint_id").alias("constraint_id"),
        F.col("v.observed").alias("observed"),
        F.col("v.passed").alias("passed"),
    )


def skew_report(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """Key-distribution diagnostic — what you run BEFORE choosing a join
    strategy (broadcast vs salted, see operators/referential.py): the
    ``top_n`` heaviest keys with their row share. One hash-agg over the
    key (map-side partial), then a driver-bound top-k window over the
    (small) distinct-key aggregate joined with a 1-row total.
    Output: (key, n_rows, share, rank)."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = counts.agg(F.sum("n_rows").alias("_total"))
    # top-k via orderBy+limit = TakeOrderedAndProject (per-partition
    # top-k, driver merge) — no single-task global window over what may
    # be billions of distinct keys; the rank window then runs over ≤N rows
    top = counts.orderBy(F.desc("n_rows"), F.asc("key")).limit(top_n)
    w = Window.orderBy(F.desc("n_rows"), F.asc("key"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
            "rank",
        )
    )


def uniqueness_report(
    df: DataFrame, column: str = "doc_id", rsd: float = 0.01
) -> DataFrame:
    """Approximate uniqueness monitor: HLL++ distinct vs total — the
    treeAggregate-style sketch merge (partial HLL per task, merged at
    final agg; no row shuffle at all). Exact duplicate extraction lives
    in operators/validator.py:unique_violations (groupBy path)."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(column).alias("n_nonnull"),
        F.approx_count_distinct(column, rsd=rsd).alias("approx_distinct"),
    ).select(
        "n_rows",
        "n_nonnull",
        "approx_distinct",
        (F.col("n_nonnull") - F.col("approx_distinct")).alias("approx_dup_excess"),
    )
