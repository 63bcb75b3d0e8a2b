"""Custom stateful streaming operator: cross-batch ID deduplication via
``applyInPandasWithState`` — the engine's example of a constraint that
needs keyed state (uniqueness over an unbounded stream), per the north
star's Structured-Streaming surface.

State model: per key-group (hash bucket of doc_id), a set of ids seen so
far, capped by ``max_ids_per_bucket`` with a watermark-based timeout so
state is bounded — at 10^12-id scale you shard buckets across
partitions and let the timeout + cap bound memory.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

OUT_SCHEMA = StructType(
    [
        StructField("bucket", LongType()),
        StructField("doc_id", StringType()),
        StructField("n_seen_before", LongType()),
    ]
)
STATE_SCHEMA = StructType([StructField("ids", StringType())])


def streaming_duplicate_ids(
    stream_df: DataFrame,
    id_col: str = "doc_id",
    buckets: int = 64,
    timeout_ms: int = 3_600_000,
    max_ids_per_bucket: int = 1_000_000,
) -> DataFrame:
    """Emits (bucket, doc_id, n_seen_before) for every id already seen in
    a previous row of the stream (n_seen_before >= 1). Keyed by a hash
    bucket of the id so state distributes evenly regardless of skew."""
    keyed = stream_df.where(F.col(id_col).isNotNull()).withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(id_col)), F.lit(buckets))
    )

    def update(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen = set()
        if state.exists:
            (ids_blob,) = state.get
            if ids_blob:
                seen = set(ids_blob.split("\x00"))
        out_bucket, out_id, out_n = [], [], []
        for pdf in batches:
            for doc_id in pdf[id_col]:
                if doc_id in seen:
                    out_bucket.append(key[0])
                    out_id.append(doc_id)
                    out_n.append(1)
                elif len(seen) < max_ids_per_bucket:
                    seen.add(doc_id)
        state.update(("\x00".join(sorted(seen)),))
        state.setTimeoutDuration(timeout_ms)
        if out_id:
            yield pd.DataFrame(
                {"bucket": out_bucket, "doc_id": out_id, "n_seen_before": out_n}
            )

    return keyed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
