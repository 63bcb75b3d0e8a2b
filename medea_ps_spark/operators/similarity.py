"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exact baseline: broadcast the (small)
  query set against the corpus; one scan, no corpus shuffle.
* LSH-bucketed ANN (random hyperplanes / SRP) — the scale path: sign
  bits of deterministic hyperplane projections form a bucket key;
  candidates are bucket-local, then exact cosine re-ranks. Hyperplanes
  derive from a seeded hash (pure function of (seed, plane, dim)), so
  signatures are reproducible across runs and cluster sizes.
* cosine near-duplicate pairs — embedding-space dedup via the same
  buckets.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from ..functions.vector import cosine, dot, norm
from .topk import topk_per_group


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: broadcast-join queries × corpus, then
    two-phase top-k (operators/topk.py). Corpus never shuffles for the
    scoring; the re-rank shuffles per-corpus-partition top-k survivors
    (≤ k × n_partitions rows/query), never the full scored set through
    one task."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.join(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col(vec_col), F.col("_qvec")).alias("cosine_sim"),
    )
    return topk_per_group(
        scored,
        [query_id_col],
        [F.desc("cosine_sim"), F.asc("neighbor_id")],
        k,
    ).select(query_id_col, "neighbor_id", "cosine_sim", "rank")


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic hyperplanes: standard-normal entries from a seeded
    generator — pure function of (seed, n_planes, dim)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def srp_signature(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    seed: int = 42,
):
    """Signed-random-projection bucket id (int): bit p = sign of
    <v, h_p>. Planes are plan literals; the projection is zip_with +
    aggregate — JVM-side."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("bigint")
    for p in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[p]])
        proj = dot(F.col(vec_col), plane)
        bucket = bucket + F.when(
            proj > 0, F.shiftleft(F.lit(1).cast("bigint"), p)
        ).otherwise(F.lit(0).cast("bigint"))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """ANN: candidates = corpus rows sharing an SRP bucket with the query
    in ANY of n_tables independent tables; exact cosine re-rank on the
    (much smaller) candidate set. Recall grows with n_tables. ALL table
    buckets are computed in one projection and exploded to (t, b) rows,
    so the corpus is scanned ONCE and all tables resolve through a
    single broadcast join — not n_tables scan+join+union branches."""
    cb = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(
            _srp_table_pairs(F.col(vec_col), dim, n_planes, n_tables, seed)
        ).alias("_tb"),
    ).select(id_col, vec_col, F.col("_tb.t").alias("_t"), F.col("_tb.b").alias("_b"))
    qb = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        F.explode(
            _srp_table_pairs(F.col(vec_col), dim, n_planes, n_tables, seed)
        ).alias("_tb"),
    ).select(query_id_col, "_qvec", F.col("_tb.t").alias("_t"), F.col("_tb.b").alias("_b"))
    cand = cb.join(F.broadcast(qb), ["_t", "_b"]).select(
        query_id_col, id_col, vec_col, "_qvec"
    )
    cand = cand.dropDuplicates([query_id_col, id_col])
    scored = cand.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col(vec_col), F.col("_qvec")).alias("cosine_sim"),
    )
    return topk_per_group(
        scored,
        [query_id_col],
        [F.desc("cosine_sim"), F.asc("neighbor_id")],
        k,
    ).select(query_id_col, "neighbor_id", "cosine_sim", "rank")


def _srp_on(vec, dim: int, n_planes: int, seed: int):
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("bigint")
    for p in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[p]])
        proj = dot(vec, plane)
        bucket = bucket + F.when(
            proj > 0, F.shiftleft(F.lit(1).cast("bigint"), p)
        ).otherwise(F.lit(0).cast("bigint"))
    return bucket


def _srp_table_pairs(vec, dim: int, n_planes: int, n_tables: int, seed: int):
    """array<struct<t,b>> — the row's bucket in EVERY table, computed in
    one projection so the source is scanned ONCE and the per-table
    bucket join becomes a single join keyed by (t, b). (The loop-and-
    union alternative scans the corpus n_tables times.)"""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                _srp_on(vec, dim, n_planes, seed + 1000 * t).alias("b"),
            )
            for t in range(n_tables)
        ]
    )


def cosine_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    exact: bool = False,
    max_bucket_size: Optional[int] = 1000,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, sim ≥ threshold).
    exact=True does the full O(n²) self-join (small n / oracle parity);
    default uses SRP buckets for candidates, each capped at
    ``max_bucket_size`` rows (same guard as dedup's LSH): a degenerate
    bucket — zero/near-zero embeddings, boilerplate-duplicated vectors —
    would otherwise make the self-join quadratic in the bucket. Vectors
    dropped by the cap are near-identical en masse; exact dedup on a
    vector fingerprint is the right tool for those."""
    from .dedup import _cap_buckets

    v = df.select(F.col(id_col), F.col(vec_col))

    def flat(joined) -> DataFrame:
        return joined.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{vec_col}").alias("_va"),
            F.col(f"b.{vec_col}").alias("_vb"),
        )

    if exact:
        a, b = v.alias("a"), v.alias("b")
        pairs = flat(a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
    else:
        # one scan: every table's bucket exploded to (t, b) rows, capped
        # per (table, bucket), then ONE bucket-local self-join
        bt = v.select(
            F.col(id_col),
            F.col(vec_col),
            F.explode(
                _srp_table_pairs(F.col(vec_col), dim, n_planes, n_tables, seed)
            ).alias("_tb"),
        ).select(
            id_col, vec_col,
            F.col("_tb.t").alias("_t"), F.col("_tb.b").alias("_b"),
        )
        bt = _cap_buckets(bt, ["_t", "_b"], max_bucket_size)
        a, b = bt.alias("a"), bt.alias("b")
        p = flat(
            a.join(
                b,
                (F.col("a._t") == F.col("b._t"))
                & (F.col("a._b") == F.col("b._b"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
        )
        pairs = p.dropDuplicates(["id_a", "id_b"])
    out = pairs.select(
        "id_a", "id_b", cosine(F.col("_va"), F.col("_vb")).alias("cosine_sim")
    )
    return out.where(F.col("cosine_sim") >= threshold)
