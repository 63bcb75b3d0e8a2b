"""Deterministic global shuffle + training-shard materialization.

The last mile of a training-data pipeline: after dedup/filter/pack, the
corpus must be globally shuffled (so batches are i.i.d.-ish) and written
as N ordered shards that a data loader streams. Requirements at 10^12
rows: the permutation must be REPRODUCIBLE (a seed, not a race),
LAYOUT-INDEPENDENT (re-running after a repartition or resume yields the
same order), and cheap (one shuffle; no driver-side materialization).

Same public trick as this repo's deterministic sampling and LSH oracles
(CLAUDE.md round-3 note): ``md5(seed || key)`` as fixed-width lowercase
hex compares lexicographically == numerically in both Spark and DuckDB,
so the shuffle order, the shard assignment, and every test oracle agree
bit-for-bit across engines. A different ``seed`` (e.g. per epoch) gives
an independent permutation.

Scale shape: ``shuffle_key`` is one projection; shard materialization is
ONE hash-partitioned shuffle keyed by the shard id with an in-task sort
— rows of a shard land in a single task, so each shard directory holds
one internally-ordered file run. No global sort (a range-partitioned
total sort would also work but shuffles comparably and needs sampled
range bounds); the md5 key already randomizes placement, so shards are
balanced by construction (multinomial, ±O(sqrt(n/N))).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

SHARD_COL = "shard"
ORD_COL = "shuffle_key"


def shuffle_key(
    df: DataFrame, seed: int, key_cols: Sequence[str] = ("doc_id",)
) -> DataFrame:
    """Adds ``shuffle_key``: md5 of (seed, *key_cols) — a deterministic,
    layout-independent total order (md5 collisions break ties by the
    concatenated key itself, making the order total for distinct keys)."""
    key = F.concat_ws("\x1f", F.lit(str(seed)), *[F.col(c).cast("string")
                                                  for c in key_cols])
    return df.withColumn(ORD_COL, F.concat(F.md5(key), key))


def assign_shards(
    df: DataFrame,
    n_shards: int,
    seed: int,
    key_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Adds ``shuffle_key`` and ``shard`` (0..n_shards-1). The shard is
    the first 15 hex digits of the row's md5 mod n_shards — a pure
    function of (seed, key), reproducible in SQL as
    ``CAST(('0x' || substr(md5(..),1,15)) AS BIGINT) % n``."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    keyed = shuffle_key(df, seed, key_cols)
    h = F.conv(F.substring(F.col(ORD_COL), 1, 15), 16, 10).cast("bigint")
    return keyed.withColumn(SHARD_COL, (h % F.lit(n_shards)).cast("int"))


def global_shuffle(
    df: DataFrame, seed: int, key_cols: Sequence[str] = ("doc_id",)
) -> DataFrame:
    """The corpus in seeded-permutation order (a range-partitioned total
    sort — use when a SINGLE ordered stream is wanted; prefer
    write_training_shards for N-way loader input)."""
    return shuffle_key(df, seed, key_cols).orderBy(ORD_COL)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    seed: int,
    key_cols: Sequence[str] = ("doc_id",),
) -> dict:
    """Materialize ``path/shard=K/`` parquet directories, each holding
    its rows in the seeded shuffle order. One hash shuffle keyed by the
    shard id + in-task sort; a shard's rows share a task, so its
    directory is one ordered file run. The ``shuffle_key`` column is
    written too, so loaders can cheaply assert the order. Returns a
    small manifest (also written to ``path/_shards_manifest.json``):
    seed, key columns, and per-shard row counts — the reproducibility
    receipt a loader checks before an epoch."""
    import json

    sharded = assign_shards(df, n_shards, seed, key_cols)
    out = sharded.repartition(n_shards, F.col(SHARD_COL)).sortWithinPartitions(
        SHARD_COL, ORD_COL
    )
    out.write.mode("overwrite").partitionBy(SHARD_COL).parquet(path)
    counts = {
        int(r[SHARD_COL]): int(r["n"])
        for r in sharded.groupBy(SHARD_COL)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    manifest = {
        "seed": seed,
        "n_shards": n_shards,
        "key_cols": list(key_cols),
        "counts": {str(k): v for k, v in sorted(counts.items())},
        "n_rows": sum(counts.values()),
    }
    tmp = os.path.join(path, "_shards_manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, sort_keys=True)
    os.replace(tmp, os.path.join(path, "_shards_manifest.json"))
    return manifest


def read_shard(spark, path: str, shard: int) -> DataFrame:
    """One shard back, in its materialized order (parquet preserves
    row-group order within the files of one write task; the
    ``shuffle_key`` column is retained so loaders can assert it)."""
    return spark.read.parquet(os.path.join(path, f"{SHARD_COL}={shard}"))
