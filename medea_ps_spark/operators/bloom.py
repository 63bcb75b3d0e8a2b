"""Distributed Bloom filter — the semi-join reduction that makes
steady-state corpus membership checks (incremental dedup,
decontamination pre-filters, referential existence) SHUFFLE-FREE for
the overwhelming majority of rows at 10^12-corpus scale.

The filter is built ONCE over the corpus as a bounded artifact (like
the IVF centroids in operators/ivf.py): each value sets ``num_hashes``
bits chosen by md5 60-bit lanes, the bit positions aggregate into
64-bit words via ``bit_or`` — a partial-agg-bounded shuffle of at most
``num_bits/64`` counter rows per task, never the value stream. The
collected word array (num_bits/8 bytes; 16 MB at 2^27 bits ≈ 1%% FP for
10^7 corpus digests, 128 MB at 2^30 for 10^10) broadcasts to executors
and every probe is a numpy gather inside an Arrow-batched pandas UDF —
no join, no shuffle, no per-row Python.

Bloom guarantees NO false negatives, so ``incremental_dedup_bloom``
is bit-identical to ``dedup.incremental_dedup``: rows the filter
rejects are definitely fresh (skip the join entirely); only the
hit candidates (true dups + the small FP band) go through an exact
confirmation, and because that candidate digest set is tiny it
BROADCASTS — the corpus is reduced map-side by a broadcast semi join
and the confirmation anti join is a broadcast too. Net: the only
shuffle in the whole steady-state dedup is the final min-id keep,
versus the sort-merge anti join of the plain operator.

Hashing is the house md5-lane trick (kmv/LSH/qualitymodel/CMS): 15 hex
chars parse losslessly into a signed BIGINT in both Spark and DuckDB,
so the word table is engine-portable and test-provable. The k probe
positions come from ONE md5 via Kirsch-Mitzenmacher double hashing
(pos_i = (h1 + i·h2) mod m over two 60-bit lanes of the same digest;
Kirsch & Mitzenmacher, ESA'06 — asymptotically the same FP rate as k
independent hashes): one digest per row on build AND probe instead of
k, which keeps the filter's per-row cost at the same one-md5 price the
plain fingerprint anti-join already pays.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.text import fingerprint

_HEX_LANE = 15  # 60 uniform bits, lossless signed BIGINT in Spark + DuckDB


def _lane(digest: Column, start: int) -> Column:
    return F.conv(F.substring(digest, start, _HEX_LANE), 16, 10).cast("long")


def _positions(value: Column, num_hashes: int, num_bits: int, salt: str) -> list:
    """Kirsch-Mitzenmacher: k positions from ONE digest — h1 and h2 are
    disjoint 60-bit lanes of md5(salt:value); pos_i = (h1 + i·h2) mod m.
    Both lanes are reduced mod m first so h1 + (k-1)·h2 stays far below
    signed-64 overflow for any m ≤ 2^30 and any practical k."""
    digest = F.md5(F.concat_ws(":", F.lit(salt), value.cast("string")))
    h1 = _lane(digest, 1) % F.lit(num_bits)
    h2 = _lane(digest, 17) % F.lit(num_bits)
    return [(h1 + F.lit(i) * h2) % F.lit(num_bits) for i in range(num_hashes)]


def bloom_build(
    df: DataFrame,
    column: str,
    num_bits: int = 1 << 27,
    num_hashes: int = 7,
    salt: str = "bloom",
) -> DataFrame:
    """Build the filter as a (word_idx:int, bits:long) word table.

    The explode of ``num_hashes`` positions pipelines into a partial
    ``bit_or`` hash-agg, so each task emits at most ``num_bits/64``
    word rows regardless of input size — the shuffle is bounded by the
    FILTER size, not the data. NULL values are excluded (they cannot be
    looked up; callers keep NULL-key rows on the exact path).

    Word tables MERGE by union + re-``bit_or`` (``bloom_merge``) — the
    union-across-days pattern for a growing corpus."""
    pos = F.explode(
        F.array(*_positions(F.col(column), num_hashes, num_bits, salt))
    ).alias("pos")
    return (
        df.where(F.col(column).isNotNull())
        .select(pos)
        .select(
            F.shiftright(F.col("pos"), 6).cast("int").alias("word_idx"),
            # F.shiftleft only takes a literal shift; SQL's takes a column
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_merge(*tables: DataFrame) -> DataFrame:
    """Merge word tables built with identical (num_bits, num_hashes,
    salt): union + re-bit_or. Exact, associative, commutative."""
    it = iter(tables)
    u = next(it)
    for t in it:
        u = u.unionByName(t)
    return u.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))


def bloom_to_array(table: DataFrame, num_bits: int) -> np.ndarray:
    """Materialize the word table as the dense int64 bit array
    (num_bits/8 bytes). The collect is bounded by the FILTER size
    (≤ num_bits/64 rows), never the corpus."""
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    arr = np.zeros(num_bits // 64, dtype=np.int64)
    pdf = table.toPandas()
    arr[pdf["word_idx"].to_numpy()] = pdf["bits"].to_numpy()
    return arr


def bloom_might_contain(
    df: DataFrame,
    column: str,
    blob: np.ndarray,
    num_hashes: int = 7,
    salt: str = "bloom",
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Probe: adds ``out_col`` (boolean) — False is DEFINITELY absent,
    True is present-or-false-positive. The md5 positions are computed
    JVM-side (whole-stage codegen); the pandas UDF only gathers from
    the broadcast word array — a fully vectorized numpy matrix op per
    Arrow batch, no per-row Python. NULL values probe to NULL."""
    num_bits = int(blob.shape[0]) * 64
    bc = df.sparkSession.sparkContext.broadcast(blob)

    @pandas_udf("boolean")
    def _probe(pos: pd.Series) -> pd.Series:
        words = bc.value
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        mat = np.array(pos.tolist(), dtype=np.int64)  # (n, num_hashes)
        hit = (words[mat >> 6] & (np.int64(1) << (mat & 63))) != 0
        return pd.Series(hit.all(axis=1))

    positions = F.array(*_positions(F.col(column), num_hashes, num_bits, salt))
    probed = F.when(F.col(column).isNull(), F.lit(None).cast("boolean")).otherwise(
        _probe(positions)
    )
    return df.withColumn(out_col, probed)


def optimal_num_hashes(num_bits: int, n_items: int) -> int:
    """k = (m/n) ln 2, the FP-minimizing hash count."""
    return max(1, round(num_bits / max(1, n_items) * math.log(2)))


def incremental_dedup_bloom(
    batch_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int = 1 << 20,
    num_hashes: int = 7,
    salt: str = "bloomdedup",
    blob: Optional[np.ndarray] = None,
) -> DataFrame:
    """``dedup.incremental_dedup`` with a Bloom pre-filter — bit-
    identical output (no false negatives), different plan:

    1. batch rows whose fingerprint the filter rejects are DEFINITELY
       fresh → no join at all (the steady-state majority);
    2. hit candidates (true dups + FP band) are confirmed exactly, but
       the candidate digest set is small enough to BROADCAST: the
       corpus reduces map-side via a broadcast LEFT SEMI join and the
       confirmation is a broadcast LEFT ANTI — no corpus shuffle;
    3. min-id keep within the batch (the one real shuffle), identical
       to the plain operator.

    Pass a prebuilt ``blob`` (from ``bloom_to_array`` over the corpus
    fingerprints — a once-per-corpus artifact, reused across daily
    batches) to skip the build; otherwise it is built here. NULL-text
    rows skip the filter and take the exact path unchanged."""
    bfp = batch_df.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint")
    )
    corpus_fp = corpus_df.select(
        fingerprint(F.col(text_col)).alias("fingerprint")
    )
    if blob is None:
        blob = bloom_to_array(
            bloom_build(corpus_fp, "fingerprint", num_bits, num_hashes, salt),
            num_bits,
        )
    probed = bloom_might_contain(
        bfp, "fingerprint", blob, num_hashes, salt, out_col="_hit"
    )
    # NULL fingerprints probe to NULL: route them with the misses —
    # NULL never equi-joins, so the plain operator keeps them too.
    cand_digests = probed.where(
        F.coalesce(F.col("_hit"), F.lit(False))
    ).select("fingerprint").distinct()
    seen = (
        corpus_fp.join(F.broadcast(cand_digests), "fingerprint", "left_semi")
        .distinct()
    )
    # ONE anti-join instead of definite_fresh UNION confirmed_fresh:
    # Bloom has no false negatives, so a non-hit row's fingerprint
    # cannot be in the corpus — and `seen` ⊆ corpus ∩ candidates —
    # hence probed ANTI seen ≡ the old two-branch union (set-proven in
    # the r6 A/B: identical 1000-row output, 4.58 s → 3.87 s at the
    # 10× fixture). The probe UDF no longer evaluates in two sibling
    # branch subtrees of the union.
    fresh = probed.drop("_hit").join(
        F.broadcast(seen), "fingerprint", "left_anti"
    )
    return (
        fresh.groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, "fingerprint")
    )
