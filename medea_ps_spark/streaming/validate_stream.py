"""Structured-Streaming validation: the same compiled constraint set
applied to a stream (readStream → one-projection validate → windowed
violation-rate aggregation with watermarks).

The row-level validation plan is IDENTICAL to the batch plan
(operators/validator.py) — a stateless projection, so it attaches to any
streaming source unchanged. Table-level constraints (unique,
referential vs big dims) need state; uniqueness is approximated per
window via approx_count_distinct, and referential uses the broadcast dim
(stream-static join, supported natively by Spark).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..operators.validator import PASSED_COL, VIOLATIONS_COL, validate
from ..plans.compiler import CompiledSet


def validate_stream(stream_df: DataFrame, compiled: CompiledSet) -> DataFrame:
    """Stateless per-row validation on a streaming DataFrame."""
    return validate(stream_df, compiled)


def windowed_violation_counts(
    stream_df: DataFrame,
    compiled: CompiledSet,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    partition_col: Optional[str] = "source",
) -> DataFrame:
    """Per-window (and optionally per-partition) violation metrics with
    late-data handling via watermark — the streaming analogue of
    partition_verdicts."""
    v = validate(stream_df, compiled).withWatermark(ts_col, watermark)
    keys = [F.window(F.col(ts_col), window).alias("window")]
    if partition_col:
        keys.append(F.col(partition_col))
    return v.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((~F.col(PASSED_COL)).cast("bigint")).alias("n_failed"),
        F.sum(F.size(VIOLATIONS_COL).cast("bigint")).alias("n_violations"),
        F.approx_count_distinct("doc_id").alias("approx_distinct_ids"),
    )


def run_foreach_batch(
    stream_df: DataFrame,
    compiled: CompiledSet,
    sink_fn,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """foreachBatch runner: each micro-batch goes through the full batch
    validation (incl. table-level ops that streaming can't express
    natively) and is handed to ``sink_fn(batch_df, batch_id)``."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sink_fn(validate(batch_df, compiled), batch_id)

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
