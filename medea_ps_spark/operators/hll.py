"""Mergeable HLL distinct sketches + the cross-run uniqueness monitor.

North-rule context (SURVEY.md §2D row 2): per-partition doc_id
uniqueness is cheap (one hash agg inside the partition), but GLOBAL
uniqueness over a 10^12-row table normally needs either a full-key
shuffle (exact) or a full rescan per health run (approx). Apache
DataSketches HLL — exposed natively in Spark as ``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``, all JVM-side — removes
both: each partition's scan emits ONE ~2^lg_k-byte binary sketch
(map-side partial merge; no row shuffle at all), sketches are exactly
mergeable in any order, and a persisted sketch is a RESUMABLE artifact:
a checkpointed run (operators/checkpoint.py) stores one sketch per
completed partition next to its manifest entry, and the global
distinct estimate after a kill/resume — or after appending one new
partition to an otherwise-finished table — unions the stored sketches
without rescanning a single completed row.

``approx_count_distinct`` (stats.uniqueness_report) answers the same
question for a one-shot job; this module is the incremental twin whose
intermediate state survives the driver. Cross-PARTITION duplicates —
invisible to any per-partition Unique check — fall out of the same
math: sum(per-partition distinct) - global distinct > 0 within sketch
error means keys repeat across partitions.

Oracle note: the sketch binary is DataSketches-internal, so these are
pytest-verified (estimate-vs-exact tolerance, merge == one-shot,
store resume == full recompute) rather than DuckDB-hashed.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

SKETCH_DIR = "hll"


def group_sketches(
    df: DataFrame,
    column: str,
    group_cols: Sequence[str] = ("source",),
    lg_k: int = 12,
) -> DataFrame:
    """One row per group: (group_cols..., sketch:binary, n_rows,
    n_nonnull, distinct_est). A single partial+final hash aggregate —
    each task merges its rows into a local HLL register set and the
    shuffle moves |groups| sketches, not rows."""
    gb = df.groupBy(*group_cols) if group_cols else df.groupBy()
    out = gb.agg(
        F.hll_sketch_agg(column, F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count(column).alias("n_nonnull"),
    )
    return out.withColumn(
        "distinct_est",
        F.when(F.col("n_nonnull") == 0, F.lit(0)).otherwise(
            F.hll_sketch_estimate("sketch")
        ),
    )


def merged_estimate(sketches: DataFrame, sketch_col: str = "sketch") -> Dict:
    """Union a sketch relation down to one global row:
    {distinct_est, n_rows, n_nonnull, cross_dup_excess}.

    ``cross_dup_excess`` = sum(per-group distinct) - global distinct:
    >~sketch-error means keys repeat ACROSS groups — the signal a
    per-partition Unique check structurally cannot produce. The union
    is a 1-row aggregate over |groups| rows (driver-bounded)."""
    row = (
        sketches.where(F.col(sketch_col).isNotNull())
        .agg(
            F.hll_union_agg(sketch_col, F.lit(True)).alias("u"),
            F.sum("n_rows").alias("n_rows"),
            F.sum("n_nonnull").alias("n_nonnull"),
            F.sum("distinct_est").alias("sum_group_distinct"),
        )
        .select(
            F.when(F.col("u").isNull(), F.lit(0.0))
            .otherwise(F.hll_sketch_estimate("u"))
            .alias("distinct_est"),
            F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows"),
            F.coalesce(F.col("n_nonnull"), F.lit(0)).alias("n_nonnull"),
            F.coalesce(F.col("sum_group_distinct"), F.lit(0.0)).alias(
                "sum_group_distinct"
            ),
        )
        .collect()[0]
    )
    return {
        "distinct_est": float(row["distinct_est"]),
        "n_rows": int(row["n_rows"]),
        "n_nonnull": int(row["n_nonnull"]),
        "cross_dup_excess": float(row["sum_group_distinct"])
        - float(row["distinct_est"]),
    }


def write_partition_sketch(
    df: DataFrame,
    column: str,
    checkpoint_dir: str,
    partition: str,
    lg_k: int = 12,
) -> None:
    """Persist ONE partition's sketch under
    ``<checkpoint_dir>/hll/<partition>/`` — a few-KB parquet written
    once when the partition completes, the durable half of the
    incremental monitor. Overwrite-idempotent (a re-processed partition
    replaces its sketch, never double-counts)."""
    sk = group_sketches(df, column, group_cols=(), lg_k=lg_k).withColumn(
        "partition", F.lit(partition)
    )
    sk.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(checkpoint_dir, SKETCH_DIR, partition)
    )


def store_uniqueness(
    spark: SparkSession, checkpoint_dir: str, partitions: Optional[Sequence[str]] = None
) -> Dict:
    """Global uniqueness from the persisted sketch store ONLY — no
    table scan. After a resume, after appending partitions, or across
    N separate runs that each validated a slice, this is the whole
    10^12-row question answered from |partitions| kilobyte-sized rows.
    ``partitions`` narrows the union (e.g. a time window)."""
    root = os.path.join(checkpoint_dir, SKETCH_DIR)
    if partitions is None:
        partitions = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
        )
    if not partitions:
        return {
            "distinct_est": 0.0,
            "n_rows": 0,
            "n_nonnull": 0,
            "cross_dup_excess": 0.0,
            "n_partitions": 0,
        }
    paths = [os.path.join(root, p) for p in partitions]
    out = merged_estimate(spark.read.parquet(*paths))
    out["n_partitions"] = len(partitions)
    return out
