"""Multi-dimensional Z-order layout — the write-side clustering that
makes min/max file-skipping work on MORE THAN ONE column at 100 TB.

A table sorted by one column prunes scans on that column only: every
file spans the full range of every OTHER column, so a filter on a
second dimension reads the whole table. Interleaving the bits of
rank-bucketed column values into one Morton (Z) key and range-
partitioning + sorting on it bounds EVERY clustered column's span per
file to a narrow band — the same layout `OPTIMIZE ZORDER BY` produces
in Delta/Iceberg, built here from pure DataFrame ops:

1. **Bucket** each column to an integer 0..2^bits-1 — equi-width from
   a 1-row global min/max aggregate (deterministic, oracle-friendly)
   or rank-based from `approxQuantile` cuts folded with a single
   `F.aggregate` over a literal boundary array (skew-proof; the cut
   list is a bounded driver artifact like the IVF centroids).
2. **Interleave** the bucket bits with shift/and/or integer
   expressions — bits*cols terms, all whole-stage codegen, no UDF.
3. **Lay out** with `repartitionByRange(num_partitions, z)` (Spark
   samples range boundaries — one extra pass, the same cost
   `sortWithinPartitions` alone would pay) then an in-partition sort,
   so parquet row-group stats are tight in every clustered dimension.

The shuffle is exactly one range exchange — identical cost shape to a
plain global sort; the win is read-side: `pruning_stats` measures it
(per-output-partition min/max boxes), and the test asserts a
single-dimension filter on the SECOND column skips most z-ordered
partitions while a linearly-sorted layout reads all of them.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _as_double(col: Column, dtype: T.DataType) -> Column:
    if isinstance(dtype, T.TimestampType):
        return col.cast("double")  # epoch seconds
    if isinstance(dtype, T.DateType):
        return col.cast("timestamp").cast("double")
    if isinstance(dtype, _NUMERIC):
        return col.cast("double")
    raise TypeError(
        f"zorder supports numeric/date/timestamp columns, got {dtype.simpleString()}"
        " (hash-bucketed strings have no range locality to exploit)"
    )


def _width_buckets(
    df: DataFrame, cols: Sequence[str], bits: int
) -> List[Column]:
    """Equi-width bucket ids from ONE global min/max aggregate row."""
    n = 1 << bits
    aggs = []
    for c in cols:
        d = _as_double(F.col(c), df.schema[c].dataType)
        aggs += [F.min(d).alias(f"mn_{c}"), F.max(d).alias(f"mx_{c}")]
    row = df.agg(*aggs).collect()[0]
    out = []
    for c in cols:
        mn, mx = row[f"mn_{c}"], row[f"mx_{c}"]
        d = _as_double(F.col(c), df.schema[c].dataType)
        if mn is None or mx is None or mx == mn:
            out.append(F.lit(0))
            continue
        raw = F.floor((d - F.lit(mn)) / F.lit(mx - mn) * n).cast("long")
        # least() SKIPS nulls (null raw would silently bucket to n-1);
        # route NULL values to bucket 0 explicitly, as documented
        out.append(
            F.when(d.isNull(), F.lit(0)).otherwise(F.least(raw, F.lit(n - 1)))
        )
    return out


def _quantile_buckets(
    df: DataFrame, cols: Sequence[str], bits: int, relative_error: float
) -> List[Column]:
    """Rank-based bucket ids: fold `x >= cut` over a literal cut array
    (one `F.aggregate` per column — codegen'd, no join, no UDF). The
    cut list (2^bits - 1 doubles per column) is a bounded driver-side
    artifact; `approxQuantile` is a single treeAggregate pass."""
    n = 1 << bits
    qs = [i / n for i in range(1, n)]
    prepared = df.select(
        *[
            _as_double(F.col(c), df.schema[c].dataType).alias(c)
            for c in cols
        ]
    )
    all_cuts = prepared.approxQuantile(list(cols), qs, relative_error)
    out = []
    for c, cuts in zip(cols, all_cuts):
        d = _as_double(F.col(c), df.schema[c].dataType)
        if not cuts:
            out.append(F.lit(0))
            continue
        uniq = sorted(set(cuts))
        bounds = F.lit([float(v) for v in uniq])
        out.append(
            F.aggregate(
                bounds,
                F.lit(0).cast("long"),
                lambda acc, b: acc + F.when(d >= b, 1).otherwise(0),
            )
        )
    return out


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits_per_col: int = 8,
    bucketer: str = "quantile",
    relative_error: float = 0.001,
    out_col: str = "_z",
) -> DataFrame:
    """Add the interleaved Morton key for ``cols``.

    ``bits_per_col * len(cols)`` must fit a signed long (≤ 62). The
    interleave is a sum of ``bits*cols`` shift/and terms — one codegen
    projection, no UDF, no shuffle; NULL column values bucket to 0 so
    they cluster together at the low end of the key."""
    if bits_per_col * len(cols) > 62:
        raise ValueError("bits_per_col * len(cols) must be <= 62")
    if bucketer == "width":
        buckets = _width_buckets(df, cols, bits_per_col)
    elif bucketer == "quantile":
        buckets = _quantile_buckets(df, cols, bits_per_col, relative_error)
    else:
        raise ValueError(f"unknown bucketer {bucketer!r}")
    ncols = len(cols)
    terms = []
    for j, b in enumerate(buckets):
        b = F.coalesce(b, F.lit(0)).cast("long")
        for i in range(bits_per_col):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * ncols + j))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return df.withColumn(out_col, z)


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    num_partitions: int,
    bits_per_col: int = 8,
    bucketer: str = "quantile",
    relative_error: float = 0.001,
) -> DataFrame:
    """Rows unchanged, physically re-clustered: one range exchange on
    the Morton key + in-partition sort, ready for `.write.parquet`.
    The key column is dropped — it exists only to steer the layout."""
    keyed = zorder_key(df, cols, bits_per_col, bucketer, relative_error)
    return (
        keyed.repartitionByRange(num_partitions, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def pruning_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-physical-partition min/max box of ``cols`` — the same stats
    a parquet footer would carry per file; the measurable pruning
    surface of a layout. One partial-agg pass, `spark_partition_id()`
    keyed."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("rows"), *aggs)
    )
