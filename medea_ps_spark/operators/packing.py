"""Sequence packing — assign pre-tokenized documents to fixed-size
training chunks (concat-then-chunk, the GPT-style packing used when a
corpus is flattened into max_len blocks).

Semantics: within a shard, documents are concatenated in a
deterministic, layout-independent order (md5 of the id — the same
hash-order trick the IVF sampler uses) and the token stream is cut into
``max_tokens`` chunks. A document belongs to the chunk where it STARTS
(``pack_id``), at offset ``pack_offset``; ``n_chunks_spanned`` counts
the boundaries it crosses (concat-then-chunk allows straddling — the
alternative best-fit policies need per-bin state and give <1% better
fill at real corpus scale).

Scale design: packing is embarrassingly parallel across shards. The
shard key is the first ``shard_chars`` hex chars of the order key, so
the running-sum window partitions by (stratum, shard) — 16^shard_chars
shards per stratum — and NO window ever sees more than ~n/16^c rows.
At 10^12 rows pick shard_chars=4-5 (65k-1M shards); each shard packs
independently, exactly how a multi-executor cluster wants it. The whole
operator is one shuffle (the window's) of (id, n_tok) pairs — tokens
themselves never move; the chunk assembly that later gathers token
arrays joins on (shard, pack_id), a co-located key.

Everything is expression-level (md5 + window running sum + integer
div): bit-identical in DuckDB, so the operator is SQL-oracle-able.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F


def pack_assignments(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    n_tok_col: str = "n_tok",
    strat_cols: Sequence[str] = ("source",),
    shard_chars: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Per-document chunk assignment:
    (strat_cols..., shard, pack_id, pack_offset, n_chunks_spanned, id,
    n_tok). Deterministic: pure function of (ids, n_toks, seed)."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    okey = F.md5(
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))
    )
    out = df.select(
        *[F.col(c) for c in strat_cols],
        F.col(id_col),
        F.col(n_tok_col).cast("bigint").alias("_n_tok"),
        okey.alias("_okey"),
    ).withColumn("shard", F.substring(F.col("_okey"), 1, shard_chars))
    # n_tok breaks order ties between rows sharing an id (duplicate ids
    # with different lengths exist in real corpora); rows tying on BOTH
    # are interchangeable for every running sum, so the chunk layout is
    # still deterministic
    w = (
        Window.partitionBy(*strat_cols, "shard")
        .orderBy("_okey", "_n_tok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum("_n_tok").over(w)
    # INTEGER `div`, not floor(double /): a large bigint running sum
    # divided in double can round across an integer boundary for
    # non-power-of-2 max_tokens, assigning a boundary doc to the wrong
    # chunk (ADVICE r3). All operands are non-negative, so truncating
    # div == floor div. Zero-length docs span 0 chunks by definition
    # (the div identity needs n_tok >= 1).
    out = (
        out.withColumn("_running", running)
        # 0-based offset of the doc's first token
        .withColumn("_start", F.col("_running") - F.col("_n_tok"))
        .withColumn("pack_id", F.expr(f"_start div {max_tokens}"))
        .withColumn("pack_offset", F.col("_start") % max_tokens)
        .withColumn(
            "n_chunks_spanned",
            F.when(F.col("_n_tok") == 0, F.lit(0)).otherwise(
                F.expr(f"(_running - 1) div {max_tokens}")
                - F.col("pack_id") + 1
            ),
        )
    )
    return out.select(
        *strat_cols, "shard", "pack_id", "pack_offset",
        "n_chunks_spanned", id_col, F.col("_n_tok").alias(n_tok_col),
    )


def pack_summary(
    assignments: DataFrame,
    strat_cols: Sequence[str] = ("source",),
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Chunk-level rollup: (strat..., shard, pack_id, n_docs,
    pack_tokens) — one partial+final hash agg on the co-located key."""
    return assignments.groupBy(*strat_cols, "shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(n_tok_col)).alias("pack_tokens"),
    )
