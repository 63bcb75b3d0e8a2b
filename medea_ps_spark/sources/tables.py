"""Table IO: Iceberg when available, partitioned parquet fallback.

The engine targets Iceberg tables (BASELINE.json input_hint); the
sandbox has no Iceberg runtime jar, so the layer probes for it once and
degrades to directory-partitioned parquet with the same layout
(partition column = directory key), preserving partition pruning via
Spark's HiveStylePartitioning on read paths.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


@lru_cache(maxsize=1)
def iceberg_available(spark_jars: str = "") -> bool:
    try:
        import importlib.util  # noqa: F401

        from pyspark.sql import SparkSession as S

        s = S.getActiveSession()
        if s is None:
            return False
        s._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.SparkTable"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, path_or_name: str) -> DataFrame:
    """Iceberg table name (catalog.db.tbl) or parquet path/dir."""
    if iceberg_available() and not os.path.exists(path_or_name):
        return spark.read.format("iceberg").load(path_or_name)
    if os.path.isdir(path_or_name) or path_or_name.endswith(".parquet"):
        return spark.read.parquet(path_or_name)
    return spark.read.parquet(path_or_name)


def write_table(
    df: DataFrame,
    path_or_name: str,
    partition_col: Optional[str] = "source",
    mode: str = "overwrite",
) -> None:
    if iceberg_available() and not path_or_name.startswith("/"):
        w = df.writeTo(path_or_name)
        if partition_col:
            w = w.partitionedBy(partition_col)
        w.createOrReplace()
        return
    w = df.write.mode(mode)
    if partition_col:
        w = w.partitionBy(partition_col)
    w.parquet(path_or_name)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table for co-located joins: two tables bucketed
    on the same key with the same bucket count join WITHOUT a shuffle
    (asserted in tests/test_plan_quality.py). At 100 TB this is the
    difference between an O(data) exchange per join and none — bucket
    the fact tables on doc_id at ingest."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table_name)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_col: str,
    num_files: int = 8,
    partition_col: Optional[str] = None,
    mode: str = "overwrite",
) -> None:
    """Zone-map-friendly layout: repartition by range on ``sort_col``
    then sort within partitions before writing, so each parquet
    row-group's min/max statistics cover a NARROW, mostly-disjoint
    value range. Point/range predicates on ``sort_col`` then skip whole
    row groups at scan time (parquet filter pushdown reads only the
    stats) — at 100 TB this is the difference between scanning the
    corpus and scanning a sliver. Verified against actual row-group
    metadata in tests."""
    out = df.repartitionByRange(num_files, sort_col)
    out = out.sortWithinPartitions(sort_col)
    w = out.write.mode(mode)
    if partition_col:
        w = w.partitionBy(partition_col)
    w.parquet(path)


def load_sf_tables(spark: SparkSession, sf_dir: str) -> dict:
    """All driver-provided tables of a scale-factor directory."""
    names = [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
