"""SparkSession factory with scale-oriented defaults.

Defaults encode the plan-quality rules from SURVEY.md §4: AQE on
(runtime re-plan + skew-join), Arrow for every pandas-UDF boundary,
shuffle partitions sized for the sandbox (overridable; on a real
cluster set ≈ 2-3× total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "medea-ps-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    )
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Long repeated columns (the north-star tokens:array<int> table,
        # ~500-2000 elements/row) hit a capacity-reserve churn in the
        # nested-column vectorized parquet reader at the 4096-row default
        # batch: jstack shows executor threads pinned in
        # WritableColumnVector.reserve/OnHeapColumnVector.reserveInternal
        # inside VectorizedRleValuesReader.readIntegersRepeated, and a
        # 767M-token scan measured 244s at batch 4096 vs 3.5s at 1024
        # (local[8], same files; flat scans are unaffected: 0.42s vs
        # 0.42s on lineitem). 1024 rows x ~2k elements still yields
        # ~2M-value child batches - plenty for whole-stage codegen.
        .config("spark.sql.parquet.columnarReaderBatchSize", "1024")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
