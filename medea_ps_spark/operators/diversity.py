"""Diversity-aware subset selection (MMR) over an embedding column.

Public algorithm: Maximal Marginal Relevance (Carbonell & Goldstein,
SIGIR 1998) — greedily pick the item maximizing
``lam * quality - (1 - lam) * max_sim_to_already_selected`` — the
standard redundancy-penalized selection used by training-data curation
pipelines to keep a quality-ranked corpus from collapsing onto its most
duplicated modes (the selection-side complement of semdedup.py, which
*removes* near-duplicates; MMR *chooses* a k-subset that is both good
and spread out).

No reference counterpart (/root/reference validates one JSON document at
a time); this is §2E training-data-pipeline mandate territory.

Greedy MMR is inherently sequential, so the 10^12-row scale path shards
it the same way every similarity op in this repo does:

* **coarse cells** — operators/ivf.py's quantizer (centroids trained
  driver-side on a bounded hash-ordered sample, shipped as plan
  literals; assignment is k dot-product codegen expressions, no UDF);
* **per-cell quotas** — k apportioned to cells proportionally to cell
  mass (largest-remainder, deterministic tie-break, capacity-capped
  with iterative redistribution) from ONE |cells|-row count aggregate;
  diversity ACROSS cells is delivered by the quota spread, diversity
  WITHIN a cell by the greedy penalty;
* **bounded candidate pools** — each cell's pool is its top
  ``oversample × quota`` rows by quality via topk.topk_per_group (the
  two-phase house pattern: no task ever ranks more than one input
  partition of a cell), hard-capped at ``max_pool``;
* **one Arrow batch per cell** — the only Python boundary is a single
  ``applyInPandas`` over the pooled survivors (pool × dim floats per
  cell, vectorized numpy inside — never per-row Python, per
  input_hint).

Output is bit-identical under any input partitioning: the pandas worker
re-sorts its pool on (quality desc, id asc) before the greedy walk, and
every tie in the greedy argmax resolves to that order.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
from pyspark.sql import DataFrame, functions as F

from .ivf import assign_lists
from .topk import topk_per_group

LIST_COL = "ivf_list"


def apportion_quotas(
    k: int, sizes: Dict[int, int]
) -> Dict[int, int]:
    """Largest-remainder (Hamilton) apportionment of ``k`` selection
    slots across cells proportional to cell size, capped at each cell's
    capacity. For ``k <= total`` a proportional share never exceeds
    capacity, so this is one pass; for ``k > total`` every cell
    saturates (everything is selected). The loop re-apportions over
    unsaturated cells until every slot is placed or all are full — at
    most |cells| rounds, all driver-side over a |cells|-sized dict.
    Deterministic: fractional-remainder ties break on ascending cell id.
    """
    if k < 0:
        raise ValueError("k must be non-negative")
    quotas = {c: 0 for c in sizes}
    remaining = k
    while remaining > 0:
        free = {c: sizes[c] - quotas[c] for c in sizes if sizes[c] > quotas[c]}
        if not free:
            break
        weight = sum(sizes[c] for c in free)
        raw = {c: remaining * sizes[c] / weight for c in free}
        base = {c: min(int(raw[c]), free[c]) for c in free}
        placed = sum(base.values())
        leftover = remaining - placed
        # distribute the integer leftover by largest fractional part
        by_frac = sorted(
            free, key=lambda c: (-(raw[c] - int(raw[c])), c)
        )
        for c in by_frac:
            if leftover <= 0:
                break
            if base[c] < free[c]:
                base[c] += 1
                leftover -= 1
        if sum(base.values()) == 0:
            break  # nothing placeable this round (all capped)
        for c, b in base.items():
            quotas[c] += b
        remaining = k - sum(quotas.values())
    return quotas


def greedy_mmr(
    ids: List, vecs: np.ndarray, quality: np.ndarray, quota: int, lam: float
) -> List[Tuple[int, float]]:
    """Pure-numpy greedy MMR over one candidate pool, assumed already
    sorted by (quality desc, id asc). Returns [(pool_index, score), ...]
    in selection order. Quality is min-max scaled within the pool so it
    shares the cosine's [0, 1] scale (constant pools scale to 1.0);
    similarity is cosine over row-normalized vectors (zero vectors get
    norm 1 so they contribute similarity 0, not NaN).
    """
    n = len(ids)
    if n == 0 or quota <= 0:
        return []
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0.0] = 1.0
    unit = vecs / norms[:, None]
    qlo, qhi = float(quality.min()), float(quality.max())
    qs = (
        np.ones(n) if qhi == qlo else (quality - qlo) / (qhi - qlo)
    )
    selected: List[Tuple[int, float]] = []
    max_sim = np.zeros(n)
    picked = np.zeros(n, dtype=bool)
    for _ in range(min(quota, n)):
        score = lam * qs - (1.0 - lam) * max_sim
        score[picked] = -np.inf
        # argmax returns the FIRST max — with the pool pre-sorted on
        # (quality desc, id asc) that makes every tie deterministic
        i = int(np.argmax(score))
        selected.append((i, float(score[i])))
        picked[i] = True
        max_sim = np.maximum(max_sim, unit @ unit[i])
    return selected


def mmr_select(
    df: DataFrame,
    centroids: np.ndarray,
    k: int,
    quality_col: str,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    lam: float = 0.7,
    oversample: int = 4,
    max_pool: int = 10_000,
) -> DataFrame:
    """Select ``k`` rows maximizing quality while penalizing redundancy.

    Returns (id_col, ivf_list, quality_col double, mmr_rank, mmr_score):
    ``mmr_rank`` is the 1-based selection order within the row's cell,
    ``mmr_score`` the MMR objective at the moment of selection.

    ``lam=1.0`` degenerates to per-cell top-quality (= topk_per_group
    under the same quotas); ``lam=0.0`` to pure farthest-point spread.
    Rows with NULL embedding or NULL id are excluded up front (greedy
    needs a total order and a vector for every candidate).
    """
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    if oversample < 1:
        raise ValueError("oversample must be >= 1")
    base = df.where(
        F.col(vec_col).isNotNull() & F.col(id_col).isNotNull()
    )
    assigned = assign_lists(base, centroids, vec_col)
    sizes = {
        int(r[LIST_COL]): int(r["n"])
        for r in assigned.groupBy(LIST_COL).agg(
            F.count("*").alias("n")
        ).collect()
    }
    quotas = apportion_quotas(k, sizes)
    max_quota = max(quotas.values(), default=0)
    if max_quota == 0:
        schema = (
            f"{id_col} {df.schema[id_col].dataType.simpleString()}, "
            f"{LIST_COL} int, {quality_col} double, "
            "mmr_rank int, mmr_score double"
        )
        return df.sparkSession.createDataFrame([], schema)
    pool_k = min(max_pool, max(max_quota, oversample * max_quota))
    pool = topk_per_group(
        assigned.select(
            F.col(id_col),
            F.col(LIST_COL),
            F.col(quality_col).cast("double").alias(quality_col),
            F.col(vec_col),
        ),
        [LIST_COL],
        [F.desc(quality_col), F.asc(id_col)],
        k=pool_k,
        rank_col="_pool_rank",
    ).drop("_pool_rank")

    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, {LIST_COL} int, {quality_col} double, "
        "mmr_rank int, mmr_score double"
    )

    def pick(pdf: "pd.DataFrame") -> "pd.DataFrame":
        cell = int(pdf[LIST_COL].iloc[0])
        quota = quotas.get(cell, 0)
        # re-establish the total order regardless of arrival order
        pdf = pdf.sort_values(
            [quality_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        vecs = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
        chosen = greedy_mmr(
            list(pdf[id_col]),
            vecs,
            pdf[quality_col].to_numpy(dtype=np.float64),
            quota,
            lam,
        )
        idx = [i for i, _ in chosen]
        return pd.DataFrame(
            {
                id_col: pdf[id_col].iloc[idx].to_numpy(),
                LIST_COL: cell,
                quality_col: pdf[quality_col].iloc[idx].to_numpy(),
                "mmr_rank": np.arange(1, len(idx) + 1, dtype=np.int32),
                "mmr_score": [s for _, s in chosen],
            }
        )

    return pool.groupBy(LIST_COL).applyInPandas(pick, schema=out_schema)


def selection_audit(
    df: DataFrame,
    selected: DataFrame,
    centroids: np.ndarray,
    quality_col: str,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Audit ANY selection (MMR, top-k, random) against the corpus it
    came from, per IVF cell: coverage, captured quality mass, and the
    selection's internal redundancy — without ever joining selected
    pairs. Redundancy uses the unit-vector identity
    ``Σ_{i≠j} u_i·u_j = |Σu|² − n``: the mean pairwise cosine of the
    selected set falls out of ONE elementwise vector sum (via
    embdrift.group_centroids on the selection), so the audit is two
    aggregates and a broadcast membership join regardless of corpus
    size. Output per cell: n_total, n_selected, quality_share
    (selected Σquality / cell Σquality), mean_pairwise_cos (NULL for
    cells with <2 selected).
    """
    from .embdrift import group_centroids

    base = assign_lists(
        df.where(F.col(vec_col).isNotNull() & F.col(id_col).isNotNull()),
        centroids,
        vec_col,
    )
    sel_ids = selected.select(F.col(id_col)).distinct()
    flagged = base.join(
        F.broadcast(sel_ids.withColumn("_sel", F.lit(1))), id_col, "left"
    )
    per_cell = flagged.groupBy(LIST_COL).agg(
        F.count("*").alias("n_total"),
        F.sum(F.coalesce(F.col("_sel"), F.lit(0))).cast("bigint")
        .alias("n_selected"),
        F.sum(F.col(quality_col).cast("double")).alias("_q_all"),
        F.sum(
            F.when(F.col("_sel") == 1, F.col(quality_col).cast("double"))
            .otherwise(F.lit(0.0))
        ).alias("_q_sel"),
    )
    sel_cents = group_centroids(
        flagged.where(F.col("_sel") == 1),
        vec_col=vec_col,
        group_col=LIST_COL,
        normalize=True,
    ).select(
        F.col(LIST_COL),
        F.col("n_vectors").alias("_n_sel_vec"),
        F.col("centroid"),
    )
    norm_sq = F.aggregate(
        F.transform(F.col("centroid"), lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n = F.col("_n_sel_vec").cast("double")
    redundancy = sel_cents.select(
        F.col(LIST_COL),
        F.when(
            F.col("_n_sel_vec") >= 2,
            (n * n * norm_sq - n) / (n * (n - F.lit(1.0))),
        ).alias("mean_pairwise_cos"),
    )
    return (
        per_cell.join(redundancy, LIST_COL, "left")
        .select(
            F.col(LIST_COL),
            "n_total",
            "n_selected",
            F.round(
                F.when(
                    F.col("_q_all") != 0, F.col("_q_sel") / F.col("_q_all")
                ),
                6,
            ).alias("quality_share"),
            F.round(F.col("mean_pairwise_cos"), 6).alias(
                "mean_pairwise_cos"
            ),
        )
    )
