"""IVF (inverted-file) ANN: a k-means coarse quantizer assigns each
vector to its nearest centroid's list; queries probe only the
``n_probe`` nearest lists and re-rank exactly. The scale path for
embedding search when SRP-LSH recall/bucket balance isn't enough
(similarity.py holds the LSH variant; brute_force_topk is the exact
baseline).

Spark-first design: centroids are trained driver-side on a bounded
sample (numpy Lloyd iterations — centroids are tiny, k×dim), then
shipped as plan literals; list assignment is k dot-product expressions
+ greatest() — whole-stage codegen, no UDF, no shuffle beyond the final
per-query top-k.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from ..functions.vector import cosine, dot, norm
from .topk import topk_per_group


def train_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    sample: int = 10_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Lloyd k-means on a driver-side sample (normalized vectors →
    spherical k-means, appropriate for cosine).

    The sample is drawn by ordering on a content hash and taking the
    top ``sample`` rows (TakeOrderedAndProject: per-partition top-k +
    driver merge, no full sort). Unlike ``.limit()`` — which drains
    whichever partitions answer first and trains the quantizer on one
    stratum of a partitioned table — the hash order is independent of
    partition layout, so the sample is uniform AND deterministic."""
    rows = (
        df.select(vec_col)
        .where(F.col(vec_col).isNotNull())
        .orderBy(F.xxhash64(F.col(vec_col), F.lit(seed)))
        .limit(sample)
        .collect()
    )
    x = np.array([r[0] for r in rows], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for j in range(len(cent)):
            members = x[assign == j]
            if len(members):
                c = members.mean(axis=0)
                cent[j] = c / max(np.linalg.norm(c), 1e-12)
    return cent


def _assign_expr(vec, centroids: np.ndarray):
    """argmax over centroid dot products as a pure expression: a struct
    array (sim, idx) reduced with array_max (lexicographic)."""
    entries = [
        F.struct(
            # one Literal array node per centroid (lit(list)) — same
            # values/fold order as the CreateArray form, far smaller
            # plan and ~dim× fewer py4j calls per build
            dot(vec, F.lit([float(v) for v in c])).alias("sim"),
            F.lit(i).alias("idx"),
        )
        for i, c in enumerate(centroids)
    ]
    return F.array_max(F.array(*entries))["idx"]


def assign_lists(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Adds ``ivf_list`` — the coarse cell id. At scale, write the table
    partitioned/bucketed by this column so probes prune files."""
    return df.withColumn("ivf_list", _assign_expr(F.col(vec_col), centroids))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Probe the n_probe nearest lists per query, exact cosine re-rank.
    The corpus join key is the (int) list id; queries are broadcast with
    their probe lists exploded."""
    dim = int(centroids.shape[1])
    c = assign_lists(corpus, centroids, vec_col).withColumn(
        # per-row norm hoisted out of the per-pair cosine (same operand
        # order → bit-identical scores; see similarity.py)
        "_cn", norm(F.col(vec_col))
    )
    # per-query probe lists: top-n_probe centroids as an array expression
    entries = [
        F.struct(
            dot(F.col("_qvec"), F.lit([float(v) for v in cc])).alias("sim"),
            F.lit(i).alias("idx"),
        )
        for i, cc in enumerate(centroids)
    ]
    probes = F.slice(
        F.reverse(F.array_sort(F.array(*entries))), 1, n_probe
    )
    q = (
        queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"),
                       norm(F.col(vec_col)).alias("_qn"))
        .withColumn("_probe", F.explode(F.transform(probes, lambda s: s["idx"])))
    )
    cand = c.join(F.broadcast(q), c["ivf_list"] == q["_probe"])
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
