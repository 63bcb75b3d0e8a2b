"""Distributed per-group top-k — the scale-safe re-rank primitive.

A naive ``Window.partitionBy(group).orderBy(...)`` + ``row_number``
funnels EVERY scored row of a group through one task: for ANN re-rank
that is the whole candidate set (brute force: the whole corpus) per
query, which at 10^12 rows is a single-task bottleneck no matter how
many executors exist.

Two-phase fix with identical output:

1. **Local phase** — tag each row with its physical input partition id
   and run the same ranked window over ``(group, partition_id)``. The
   exchange hash-distributes (group, pid) pairs across ALL tasks, and
   no task ever sees more rows of a group than one input partition
   holds (bounded by ``spark.sql.files.maxPartitionBytes``). Only the
   per-partition top-k survive.
2. **Global phase** — the original window, now over at most
   ``k × n_partitions`` rows per group instead of the full candidate
   set.

Correctness: the global top-k of a group is a subset of the union of
its per-partition top-ks (any row outside every local top-k is beaten
by ≥ k rows in its own partition, hence by ≥ k rows globally). Callers
must pass a TOTAL order (tie-broken by a unique column) so ranks are
deterministic — the same contract the single-window version had.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

_PID = "_topk_pid"
_LOCAL_RANK = "_topk_local_rank"


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group under ``order_cols`` (a total order), with
    ``rank_col`` = 1..k — same output as a single global window, but no
    task ever ranks more than max(input-partition rows, k × n_partitions)
    rows of one group."""
    order_cols = list(order_cols)
    local_w = Window.partitionBy(*group_cols, _PID).orderBy(*order_cols)
    survivors = (
        df.withColumn(_PID, F.spark_partition_id())
        .withColumn(_LOCAL_RANK, F.row_number().over(local_w))
        .where(F.col(_LOCAL_RANK) <= k)
        .drop(_PID, _LOCAL_RANK)
    )
    final_w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return survivors.withColumn(rank_col, F.row_number().over(final_w)).where(
        F.col(rank_col) <= k
    )
