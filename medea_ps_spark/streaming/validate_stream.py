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


def windowed_violation_exemplars(
    stream_df: DataFrame,
    compiled: CompiledSet,
    k: int = 8,
    id_column: str = "doc_id",
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming twin of the batch bounded violation sink
    (operators/validator.sample_violation_rows): per event-time window
    and constraint, the EXACT violation count plus at most ``k``
    deterministic exemplar rows — with state bounded by construction.

    Streaming can't rank (no window functions) and ``collect_list``
    state grows with the data — the unbounded-sink problem all over
    again. Instead the exemplars come from ``k`` parallel MIN lanes:
    each violation is assigned a lane by its content hash, and lane i
    keeps ``min(struct(md5_key, id, observed))`` — one fixed-size
    struct of aggregation state per (window, constraint, lane)
    regardless of row count. Deterministic (content-based key and lane,
    same sentinels as the batch sampler) and exact on counts; the
    exemplar SELECTION differs from the batch top-k (per-lane minima
    rather than global k smallest keys), which is fine — both are
    arbitrary-but-deterministic samples.

    Output: (window, constraint_id, n_violations,
    exemplars: array<struct<doc_id,observed>>) ordered by key within
    the array."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    v = validate(stream_df, compiled).withWatermark(ts_col, watermark)
    ex = v.select(
        F.window(F.col(ts_col), window).alias("window"),
        F.col(id_column),
        F.explode(F.col(VIOLATIONS_COL)).alias("v"),
    ).select(
        "window",
        F.col("v.constraint_id").alias("constraint_id"),
        F.col(id_column),
        F.col("v.observed").alias("observed"),
    )
    key = F.md5(
        F.concat(
            F.coalesce(F.col(id_column).cast("string"), F.lit("\x00")),
            F.lit("\x1f"),
            F.col("constraint_id"),
            F.lit("\x1f"),
            F.coalesce(F.col("observed"), F.lit("\x00")),
        )
    )
    lane = F.pmod(
        F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint"), F.lit(k)
    )
    tagged = ex.withColumn("_vkey", key).withColumn("_lane", lane)
    lane_aggs = [
        F.min(
            F.when(
                F.col("_lane") == i,
                F.struct(
                    F.col("_vkey").alias("k"),
                    F.col(id_column).alias("doc_id"),
                    F.col("observed").alias("observed"),
                ),
            )
        ).alias(f"_e{i}")
        for i in range(k)
    ]
    agged = tagged.groupBy("window", "constraint_id").agg(
        F.count(F.lit(1)).alias("n_violations"), *lane_aggs
    )
    lanes = F.sort_array(
        F.array_compact(F.array(*[F.col(f"_e{i}") for i in range(k)]))
    )
    return agged.select(
        "window",
        "constraint_id",
        "n_violations",
        F.transform(
            lanes,
            lambda e: F.struct(
                e["doc_id"].alias("doc_id"), e["observed"].alias("observed")
            ),
        ).alias("exemplars"),
    )


def windowed_oov_rate(
    stream_df: DataFrame,
    vocab_df: DataFrame,
    tokens_col: str = "tokens",
    vocab_col: str = "token_id",
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    partition_col: Optional[str] = "source",
) -> DataFrame:
    """Per-window OOV rate of a token stream against a vocabulary
    dimension (e.g. ``tokenize.bpe_vocab_df``) — the ingest-time twin
    of ``operators/oov.oov_stats``: monitors whether arriving shards
    were tokenized with the vocabulary the pipeline validates against,
    BEFORE they hit the batch table.

    Shape: explode tokens → stream-static LEFT JOIN with the vocab dim
    (natively supported; Spark broadcasts the small side) → windowed
    counts with watermarked late-data handling. No state beyond the
    windowed aggregate; the dim stays a DataFrame (no driver collect,
    unlike the batch operator's bounded mask — a streaming query can't
    re-collect a changing dim per microbatch anyway).

    Output: (window[, partition_col], n_tokens, n_oov, oov_rate).
    Rows with NULL/empty token arrays contribute nothing (rate is per
    TOKEN, not per row)."""
    dim = vocab_df.select(F.col(vocab_col).alias("_vocab_token")).distinct()
    ex = stream_df.withWatermark(ts_col, watermark).select(
        F.col(ts_col),
        *([F.col(partition_col)] if partition_col else []),
        F.explode(F.col(tokens_col)).alias("_tok"),
    )
    joined = ex.join(dim, ex["_tok"] == dim["_vocab_token"], "left")
    keys = [F.window(F.col(ts_col), window).alias("window")]
    if partition_col:
        keys.append(F.col(partition_col))
    return joined.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("_vocab_token").isNull().cast("bigint")).alias("n_oov"),
        F.round(
            F.sum(F.col("_vocab_token").isNull().cast("bigint"))
            / F.greatest(F.count(F.lit(1)), F.lit(1)),
            6,
        ).alias("oov_rate"),
    )


def windowed_chi2_drift(
    stream_df: DataFrame,
    profile,
    name: str,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    alpha: float = 0.001,
) -> DataFrame:
    """Streaming drift monitor: per event-time window, the two-sample
    χ² of the column's bucket distribution against a ReferenceProfile
    (operators/drift.py), computed in ONE streaming aggregation — the
    profile's expected counts are plan literals, the per-bucket observed
    counts are sum((bucket==i)) aggregate lanes, and the statistic +
    verdict are a post-agg projection. No second aggregation (streaming
    allows only one), no state beyond the windowed agg, no UDF.

    Differences from the batch chi2_drift: no sparse-bucket merging
    (data-dependent shape per window can't be a static plan), so use
    profiles with well-populated buckets; dof = nbuckets − 1. The
    drift verdict compares the statistic against the χ² critical value
    at ``alpha`` (computed driver-side by bisection on chi2_sf)."""
    from ..functions.stats_math import chi2_sf
    from ..operators.sketches import bucket_expr

    p = profile.columns[name]
    exp = [float(c) for c in p.counts]
    n_e = sum(exp)
    if n_e <= 0:
        raise ValueError(f"profile {name!r} is empty")
    b = bucket_expr(p.column, p.lo, p.hi, p.nbuckets)
    aggs = [
        F.sum((b == i).cast("bigint")).alias(f"_c{i}")
        for i in range(p.nbuckets)
    ]
    agged = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("window"))
        .agg(*aggs)
    )
    n_o = sum(
        (F.coalesce(F.col(f"_c{i}"), F.lit(0)) for i in range(p.nbuckets)),
        F.lit(0).cast("bigint"),
    ).cast("double")
    k1 = F.sqrt(F.lit(n_e) / n_o)
    k2 = F.sqrt(n_o / F.lit(n_e))
    stat = F.lit(0.0)
    for i in range(p.nbuckets):
        o = F.coalesce(F.col(f"_c{i}"), F.lit(0)).cast("double")
        e = F.lit(exp[i])
        term = F.pow(k1 * o - k2 * e, F.lit(2.0)) / (o + e)
        stat = stat + F.when(o + e > 0, term).otherwise(F.lit(0.0))
    dof = max(1, p.nbuckets - 1)
    # invert chi2_sf at alpha by bisection (driver-side, once)
    lo_c, hi_c = 0.0, 1e6
    for _ in range(200):
        mid = (lo_c + hi_c) / 2.0
        if chi2_sf(mid, dof) > alpha:
            lo_c = mid
        else:
            hi_c = mid
    critical = (lo_c + hi_c) / 2.0
    return agged.select(
        "window",
        n_o.cast("bigint").alias("n_rows"),
        F.round(stat, 4).alias("chi2_stat"),
        (stat > F.lit(critical)).alias("drifted"),
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


def streaming_session_stats(
    stream_df: DataFrame,
    gap: str = "30 minutes",
    key_cols=("user_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
    value_col: str = "value",
) -> DataFrame:
    """Streaming sessionization via Spark's native session_window
    (dynamic gap-merged windows + watermark state eviction) — the
    streaming twin of operators/sessions.sessionize: two events join a
    session iff they are <= gap apart (session_window's inclusive
    boundary, which the batch operator matches), so per-key session
    partitions agree between the two on the same data. Late rows
    beyond the watermark are dropped instead of reopening closed
    sessions."""
    keys = [F.session_window(F.col(ts_col), gap).alias("session")] + [
        F.col(c) for c in key_cols
    ]
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("value_sum"),
        )
        .select(
            *key_cols,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )
