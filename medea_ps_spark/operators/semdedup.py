"""Semantic deduplication (SemDeDup-style) over an embedding column.

Public algorithm (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", 2023): k-means-cluster the
embeddings, compare pairs ONLY within a cluster, connect pairs above a
cosine threshold into duplicate groups, and keep one representative per
group — the paper keeps the member with the LOWEST cosine similarity to
its cluster centroid (the "outlier" retains the most information).

No reference counterpart (/root/reference validates one JSON document at
a time); this is §2E training-data-pipeline mandate territory, composing
three existing scale-safe pieces rather than introducing new machinery:

* coarse clustering — operators/ivf.py's quantizer: centroids trained
  driver-side on a bounded hash-ordered sample, shipped as plan
  literals; assignment is k dot-product expressions (codegen, no UDF);
* candidate pairs — cluster-local equi-self-join (never a cross join);
  each cluster capped at ``max_cluster_size`` rows like every other
  similarity self-join in this repo (dedup.py `_cap_buckets`), so one
  degenerate mega-cluster cannot go quadratic;
* duplicate groups — operators/dedup_cluster.connected_components
  (pointer-doubling min-label propagation, O(log n) rounds over the
  small near-dup edge set, not the corpus).

At 10^12 rows the dominant cost is the one corpus scan that assigns
clusters + the intra-cluster join whose input is bounded by
``k_clusters × max_cluster_size²`` pairs; everything downstream touches
only the near-dup population.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..functions.vector import cosine, dot, norm
from .dedup import _cap_buckets
from .dedup_cluster import connected_components
from .ivf import assign_lists
from .topk import topk_per_group


def centroid_similarity(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Adds ``ivf_list`` (assigned cluster) and ``centroid_sim`` (cosine
    to the assigned centroid) in one codegen projection: the struct-array
    argmax used for assignment already carries the winning dot product,
    and centroids are unit-norm, so cosine = dot / |v|."""
    entries = [
        F.struct(
            dot(F.col(vec_col), F.lit([float(v) for v in c])).alias("sim"),
            F.lit(i).alias("idx"),
        )
        for i, c in enumerate(centroids)
    ]
    best = F.array_max(F.array(*entries))
    return df.withColumn("_best", best).select(
        "*",
        F.col("_best")["idx"].alias("ivf_list"),
        (
            F.col("_best")["sim"]
            / F.greatest(norm(F.col(vec_col)), F.lit(1e-12))
        ).alias("centroid_sim"),
    ).drop("_best")


def semantic_pairs(
    df: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.95,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    max_cluster_size: Optional[int] = 10_000,
) -> DataFrame:
    """Within-cluster near-dup pairs (id_a < id_b, cosine_sim >=
    threshold, cluster). The self-join key is the int cluster id — an
    equi-join, bucket-local exactly like the LSH pair generators; rows
    beyond ``max_cluster_size`` per cluster are dropped from pairing
    (deterministic hash order) and therefore always survive dedup —
    the conservative direction."""
    c = assign_lists(
        df.select(F.col(id_col), F.col(vec_col)), centroids, vec_col
    )
    c = _cap_buckets(c, ["ivf_list"], max_cluster_size)
    a, b = c.alias("a"), c.alias("b")
    pairs = a.join(
        b,
        (F.col("a.ivf_list") == F.col("b.ivf_list"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.col("a.ivf_list").alias("cluster"),
        cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")).alias(
            "cosine_sim"
        ),
    )
    return pairs.where(F.col("cosine_sim") >= threshold)


def semantic_dedup(
    df: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.95,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    keep: str = "min_centroid_sim",
    max_cluster_size: Optional[int] = 10_000,
) -> DataFrame:
    """Tags every row with its semantic-duplicate group and keep
    verdict: ``sem_group`` (min member id; own id when unduplicated) and
    ``sem_keep`` (TRUE for the group's one representative).

    ``keep`` picks the representative per group:
      * ``min_centroid_sim`` — the paper's policy: the member FARTHEST
        from its cluster centroid (ties: min id);
      * ``max_centroid_sim`` — the most typical member (ties: min id);
      * ``min_id``          — cheapest/deterministic, no extra scoring.

    Filter ``sem_keep`` for survivors. Group representatives are found
    with the house two-phase top-k (operators/topk.py), never a
    single-task global window."""
    if keep not in ("min_centroid_sim", "max_centroid_sim", "min_id"):
        raise ValueError(f"unknown keep policy {keep!r}")
    pairs = semantic_pairs(
        df, centroids, threshold, id_col, vec_col, max_cluster_size
    )
    comp = connected_components(pairs).withColumnRenamed("node", id_col)
    tagged = df.join(comp, on=id_col, how="left").withColumn(
        "sem_group", F.coalesce(F.col("component"), F.col(id_col))
    ).drop("component")
    if keep == "min_id":
        return tagged.withColumn(
            "sem_keep", F.col(id_col) == F.col("sem_group")
        )
    scored = centroid_similarity(tagged, centroids, vec_col)
    order = (
        [F.asc("centroid_sim"), F.asc(id_col)]
        if keep == "min_centroid_sim"
        else [F.desc("centroid_sim"), F.asc(id_col)]
    )
    reps = topk_per_group(
        scored.select(F.col("sem_group"), F.col("centroid_sim"), F.col(id_col)),
        ["sem_group"],
        order,
        1,
    ).select(F.col("sem_group"), F.col(id_col).alias("_rep_id"))
    return (
        tagged.join(reps, on="sem_group", how="left")
        .withColumn(
            "sem_keep",
            F.coalesce(F.col(id_col) == F.col("_rep_id"), F.lit(True)),
        )
        .drop("_rep_id")
    )
