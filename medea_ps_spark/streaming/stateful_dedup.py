"""Custom stateful streaming operator: cross-batch ID deduplication via
``applyInPandasWithState`` — the engine's example of a constraint that
needs keyed state (uniqueness over an unbounded stream), per the north
star's Structured-Streaming surface.

State model: per key-group (hash bucket of doc_id), the set of ids seen
so far stored as a SORTED array of 64-bit id hashes packed into ONE
binary blob (8 bytes/id). Compared with keeping the raw ids in a joined
string, the blob is ~an order of magnitude smaller and needs no
re-sort/re-join per micro-batch: membership is a vectorized
``np.isin`` against the decoded array, and the update is a sorted-union
(``np.union1d``). Hash collisions (two distinct ids sharing a 64-bit
hash) mis-flag at ~n²/2⁶⁴ per bucket — ~3e-8 at the 1M-id cap —
acceptable for a duplicate MONITOR; exact uniqueness remains the batch
validator's job. Capped by ``max_ids_per_bucket`` with a
processing-time timeout so state stays bounded; at 10^12-id scale you
shard buckets across partitions and let the timeout + cap bound memory.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType,
)

OUT_SCHEMA = StructType(
    [
        StructField("bucket", LongType()),
        StructField("doc_id", StringType()),
        StructField("n_seen_before", LongType()),
    ]
)
STATE_SCHEMA = StructType([StructField("idhashes", BinaryType())])


def _hash_ids(ids: pd.Series) -> np.ndarray:
    """Stable vectorized 64-bit hash of the id strings (pandas siphash
    with the fixed default key — deterministic across executors)."""
    return pd.util.hash_array(ids.to_numpy(dtype=object)).astype(np.uint64)


def make_update(
    id_col: str = "doc_id",
    timeout_ms: int = 3_600_000,
    max_ids_per_bucket: int = 1_000_000,
):
    """The per-group state transition, exposed for direct unit testing
    with a stub GroupState (the streaming harness covers integration)."""

    def update(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            (blob,) = state.get
            seen = np.frombuffer(bytes(blob), dtype=np.uint64) if blob else np.empty(0, np.uint64)
        else:
            seen = np.empty(0, np.uint64)
        appended = []
        for pdf in batches:
            ids = pdf[id_col]
            h = _hash_ids(ids)
            in_state = np.isin(h, seen)
            if appended:
                in_state |= np.isin(h, np.concatenate(appended))
            in_batch_earlier = pd.Series(h).duplicated(keep="first").to_numpy()
            dup = in_state | in_batch_earlier
            fresh = np.unique(h[~dup])
            room = max_ids_per_bucket - len(seen) - sum(len(a) for a in appended)
            if room > 0 and len(fresh):
                appended.append(fresh[:room])
            if dup.any():
                yield pd.DataFrame(
                    {
                        "bucket": np.full(int(dup.sum()), key[0], dtype=np.int64),
                        "doc_id": ids[dup].to_numpy(),
                        "n_seen_before": np.ones(int(dup.sum()), dtype=np.int64),
                    }
                )
        if appended:
            seen = np.union1d(seen, np.concatenate(appended))
        state.update((seen.tobytes(),))
        state.setTimeoutDuration(timeout_ms)

    return update


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
    return keyed.groupBy("bucket").applyInPandasWithState(
        make_update(id_col, timeout_ms, max_ids_per_bucket),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
