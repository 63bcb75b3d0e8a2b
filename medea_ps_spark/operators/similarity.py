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
    # hoist the vector norms to once per ROW (corpus and query side)
    # instead of once per (corpus, query) PAIR inside cosine():
    # cosine = dot/(norm_a*norm_b) with the same operand order, so the
    # result is bit-identical while the norm aggregates drop from
    # |corpus|×|queries| to |corpus|+|queries| (guide §1.2 step 2)
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    scored = corpus.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("_cn")
    ).join(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        (dot(F.col(vec_col), F.col("_qvec"))
         / (F.col("_cn") * F.col("_qn"))).alias("cosine_sim"),
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
    return _srp_on(F.col(vec_col), dim, n_planes, seed)


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
    # norms hoisted to once per row BEFORE the table explode (so each
    # is computed once, not n_tables× or once per candidate pair) —
    # cosine = dot/(norm_a*norm_b) in the same operand order, so
    # re-rank scores are bit-identical (guide §1.2 step 2)
    cb = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        norm(F.col(vec_col)).alias("_cn"),
        F.explode(
            _srp_table_pairs(vec_col, dim, n_planes, n_tables, seed)
        ).alias("_tb"),
    ).select(id_col, vec_col, "_cn",
             F.col("_tb.t").alias("_t"), F.col("_tb.b").alias("_b"))
    qb = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        norm(F.col(vec_col)).alias("_qn"),
        F.explode(
            _srp_table_pairs(vec_col, dim, n_planes, n_tables, seed)
        ).alias("_tb"),
    ).select(query_id_col, "_qvec", "_qn",
             F.col("_tb.t").alias("_t"), F.col("_tb.b").alias("_b"))
    cand = cb.join(F.broadcast(qb), ["_t", "_b"]).select(
        query_id_col, id_col, vec_col, "_qvec", "_cn", "_qn"
    )
    cand = cand.dropDuplicates([query_id_col, id_col])
    scored = cand.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        (dot(F.col(vec_col), F.col("_qvec"))
         / (F.col("_cn") * F.col("_qn"))).alias("cosine_sim"),
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
        # ONE array literal per plane (pyspark >= 3.4 lit(list)): a
        # single Literal node instead of CreateArray over `dim` scalar
        # literals — same values, same zip_with/aggregate fold order,
        # bit-identical projections; cuts plan size and the py4j
        # build cost by ~dim× (guide §1.2 step 2 / §7.2 plan size).
        plane = F.lit([float(x) for x in planes[p]])
        proj = dot(vec, plane)
        bucket = bucket + F.when(
            proj > 0, F.shiftleft(F.lit(1).cast("bigint"), p)
        ).otherwise(F.lit(0).cast("bigint"))
    return bucket


def _fmt_double(x: float) -> str:
    """Exact round-trip Spark SQL double literal: repr() is the
    shortest decimal that parses back to the same IEEE double, and
    Spark's parser (Java Double.parseDouble) is correctly rounded —
    identical bits to F.lit(float)."""
    return repr(float(x)) + "D"


def _srp_table_pairs_sql(
    vec_sql: str, dim: int, n_planes: int, n_tables: int, seed: int
) -> str:
    """The ENTIRE multi-table SRP signature as ONE SQL string for a
    single F.expr call. Semantically identical to the Column form
    (same zip_with/aggregate fold order per plane, so bit-identical
    projections and buckets) but ~300 pyspark lambda/Column
    constructions collapse into one py4j round trip — the Column build
    alone cost ~2-4 s per query at 36 planes (guide §1.2 step 2)."""
    planes_by_t = {
        t: _hyperplanes(dim, n_planes, seed + 1000 * t)
        for t in range(n_tables)
    }

    # NB (measured, this round): an unrolled get()/*/+ variant of the
    # dot — guarded by size(vec)=dim with this HOF form as fallback —
    # REGRESSED ann_lsh 1.5s -> 8.5-9.4s: codegen emits BOTH CASE
    # branches (~2x36x64 terms/side), blowing the generated-method
    # budget and falling back to interpreting the whole giant
    # projection. The HOF fold stays.
    structs = []
    for t in range(n_tables):
        terms = []
        for p in range(n_planes):
            lit = "array(" + ",".join(
                _fmt_double(x) for x in planes_by_t[t][p]
            ) + ")"
            proj = (
                f"aggregate(zip_with({vec_sql}, {lit}, "
                "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
                "0.0D, (acc, x) -> acc + x)"
            )
            terms.append(
                f"(CASE WHEN {proj} > 0.0D THEN {1 << p}L ELSE 0L END)"
            )
        bucket = "CAST(0 AS BIGINT) + " + " + ".join(terms)
        structs.append(f"named_struct('t', {t}, 'b', {bucket})")
    return "array(" + ", ".join(structs) + ")"


def _srp_table_pairs(vec_col_name: str, dim: int, n_planes: int,
                     n_tables: int, seed: int):
    """array<struct<t,b>> — the row's bucket in EVERY table, computed in
    one projection so the source is scanned ONCE and the per-table
    bucket join becomes a single join keyed by (t, b). (The loop-and-
    union alternative scans the corpus n_tables times.) Takes the
    column NAME (not a Column): the expression is built as one SQL
    string — see _srp_table_pairs_sql."""
    return F.expr(
        _srp_table_pairs_sql(
            f"`{vec_col_name}`", dim, n_planes, n_tables, seed
        )
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

    # per-row norm hoisted ahead of the self-join: cosine =
    # dot/(norm_a*norm_b) in the same operand order → bit-identical
    # sims, but norms are computed n times instead of once per pair
    v = df.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("_nm")
    )

    def flat(joined) -> DataFrame:
        return joined.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{vec_col}").alias("_va"),
            F.col(f"b.{vec_col}").alias("_vb"),
            F.col("a._nm").alias("_na"),
            F.col("b._nm").alias("_nb"),
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
            F.col("_nm"),
            F.explode(
                _srp_table_pairs(vec_col, dim, n_planes, n_tables, seed)
            ).alias("_tb"),
        ).select(
            id_col, vec_col, "_nm",
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
        "id_a", "id_b",
        (dot(F.col("_va"), F.col("_vb"))
         / (F.col("_na") * F.col("_nb"))).alias("cosine_sim"),
    )
    return out.where(F.col("cosine_sim") >= threshold)
