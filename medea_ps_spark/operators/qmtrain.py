"""In-engine training of the hashed linear quality classifier —
distributed logistic regression over the same hashing-trick features
``operators/qualitymodel.py`` scores with. Closes the loop: label a
small seed set (e.g. wiki = keep, random crawl = drop — the CCNet /
GPT-3 Appendix-A / DCLM recipe), train HERE, then gate the 100-TB
corpus with the learned weights in one map-only scoring pass.

Scale design (the part that matters at 10^12 docs)
--------------------------------------------------
* The design matrix is materialized ONCE: ``(id, bucket, x, y)`` with
  ``x = count/n_features`` (fastText-style mean), REPARTITIONED BY id
  and persisted. Every iteration reuses that partitioning:

  - margin: the weight lookup is a BROADCAST hash join against the
    tiny (n_buckets+1)-row weight relation — broadcast joins preserve
    the streamed side's partitioning (a Python-UDF lookup in the same
    spot would not, forcing a doc-sized shuffle; pinned by the plan
    gate) — then ``groupBy(id)`` over the id-partitioned cache: NO
    exchange.
  - residual ⋈ X: both sides id-partitioned — NO exchange.
  - gradient: ``groupBy(bucket)`` — the ONE real shuffle per
    iteration, bounded by ``n_buckets × tasks`` after map-side partial
    aggregation, never by corpus size. ``n_buckets + 1`` rows reach
    the driver (the bias rides as a synthetic always-on bucket
    ``n_buckets``, so bias gradient and bias margin need no separate
    path).

  One Spark action per iteration; driver work is an O(n_buckets)
  numpy update.
* Scoring a trained model is ONE map-only pass (no join, no shuffle):
  features → buckets → flat numpy gather-sum per Arrow batch.

This is plain batch gradient descent (optionally with L2), not an
optimizer zoo — deliberate: every step is deterministic given the
input (float partial-sum order wobbles a last ulp across layouts, as
everywhere in Spark; tests compare against the numpy reference at
1e-6 and assert decisions exactly).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from .qualitymodel import hashed_features, hashed_token_features

_HEX_LANE = 15


def feature_buckets(feats, n_buckets: int):
    """array<string> features → array<int> hash buckets (md5 60-bit
    lane mod n_buckets) — pure codegen, shared by training and
    scoring so a trained model is portable across both paths."""
    return F.transform(
        feats,
        lambda f: (
            F.conv(F.substring(F.md5(f), 1, _HEX_LANE), 16, 10).cast("long")
            % n_buckets
        ).cast("int"),
    )


@dataclass
class TrainedQualityModel:
    """Learned weights: ``w[bucket]`` for 0..n_buckets-1 plus the bias
    at index ``n_buckets``. ``losses`` holds per-iteration train
    log-loss when tracking was enabled (else empty)."""

    weights: np.ndarray
    n_buckets: int
    losses: list

    @property
    def bias(self) -> float:
        return float(self.weights[self.n_buckets])

    def weights_df(self, spark) -> DataFrame:
        """(bucket, weight) table — persistable next to a checkpoint
        manifest; bias is the row bucket == n_buckets."""
        rows = [(int(i), float(w)) for i, w in enumerate(self.weights)]
        return spark.createDataFrame(rows, "bucket int, weight double")


def _design_matrix(
    df: DataFrame,
    text_col: str,
    label_col: str,
    id_col: str,
    n_buckets: int,
    tokens_col: Optional[str],
    partitions: Optional[int],
) -> DataFrame:
    feats = (
        hashed_token_features(F.col(tokens_col))
        if tokens_col is not None
        else hashed_features(F.col(text_col))
    )
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).cast("double").alias("y"),
        F.size(feats).alias("nf"),
        F.explode(feature_buckets(feats, n_buckets)).alias("bucket"),
    ).where(F.col("nf") > 0)
    x = (
        exploded.groupBy("id", "y", "nf", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "id",
            "bucket",
            (F.col("c") / F.col("nf")).alias("x"),
            "y",
        )
    )
    # the synthetic bias bucket: one always-on feature per doc
    bias_rows = df.select(
        F.col(id_col).alias("id"),
        F.lit(n_buckets).cast("int").alias("bucket"),
        F.lit(1.0).alias("x"),
        F.col(label_col).cast("double").alias("y"),
    )
    out = x.unionByName(bias_rows)
    nparts = partitions or out.sparkSession.sparkContext.defaultParallelism
    return out.repartition(nparts, "id")


def _weights_df(spark, w: np.ndarray) -> DataFrame:
    """The iteration's weight vector as an (bucket, w) relation — tiny
    (n_buckets+1 rows), broadcast into the margin join. A broadcast
    HASH JOIN (not a Python-UDF lookup) is load-bearing here: it
    preserves the streamed side's id-partitioning, so the margin
    groupBy needs no exchange — an ArrowEvalPython node in the same
    spot reports unknown partitioning and forces a doc-sized shuffle
    per iteration (observed; see the plan-gate test)."""
    return spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(w)], "bucket int, w double"
    )


def _margin_and_residual(xmat: DataFrame, w_df: DataFrame) -> DataFrame:
    j = xmat.join(F.broadcast(w_df), "bucket")
    margins = j.groupBy("id").agg(
        F.sum(F.col("x") * F.col("w")).alias("m"),
        F.first("y").alias("y"),
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m")))
    return margins.select("id", "y", "m", (p - F.col("y")).alias("r"))


def gradient_plan(
    xmat: DataFrame, w_df: DataFrame, loss_bucket: Optional[int] = None
) -> DataFrame:
    """The per-iteration plan: margins (broadcast weight join + id
    groupBy) → residuals → join back to the id-partitioned design
    matrix → per-bucket gradient sums. Exposed for the plan-quality
    test (exactly one shuffle Exchange: the n_buckets-bounded groupBy
    at the end).

    ``loss_bucket`` (VERDICT r5 #2): when set to the BIAS bucket id,
    the per-doc train log-loss term rides the same aggregate — each
    doc has exactly one bias row, so summing the loss term over rows
    of that bucket sums it once per doc, and the iteration needs ONE
    job instead of a separate loss collect."""
    mr = _margin_and_residual(xmat, w_df)
    if loss_bucket is not None:
        # stable softplus(-z): max(0,-z) + log1p(exp(-|z|))
        z = (F.col("y") * 2 - 1) * F.col("m")
        lt = F.greatest(-z, F.lit(0.0)) + F.log1p(F.exp(-F.abs(z)))
        resid = mr.select("id", "r", lt.alias("_lt"))
    else:
        resid = mr.select("id", "r")
    aggs = [
        F.sum(F.col("x") * F.col("r")).alias("g"),
        F.count(F.lit(1)).alias("n"),
    ]
    if loss_bucket is not None:
        aggs.append(
            F.sum(
                F.when(F.col("bucket") == loss_bucket, F.col("_lt"))
            ).alias("lsum")
        )
    return xmat.join(resid, "id").groupBy("bucket").agg(*aggs)


def train_quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    tokens_col: Optional[str] = None,
    n_buckets: int = 4096,
    n_iter: int = 30,
    lr: float = 2.0,
    l2: float = 0.0,
    track_loss: bool = False,
    partitions: Optional[int] = None,
) -> TrainedQualityModel:
    """Fit logistic weights over hashed unigram+bigram buckets.

    ``label_col`` must be 0/1 (drop/keep). ``lr`` is scaled by 1/n_docs
    internally (the gradient below is a SUM, not a mean). ``l2`` adds
    ``l2 * w`` to the gradient (bias exempt). ``track_loss=True`` runs
    one extra small aggregate per iteration to record train log-loss.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    spark = df.sparkSession
    xmat = _design_matrix(
        df, text_col, label_col, id_col, n_buckets, tokens_col, partitions
    )
    xmat = xmat.persist()
    n_docs = xmat.where(F.col("bucket") == n_buckets).count()
    if n_docs == 0:
        xmat.unpersist()
        raise ValueError("no trainable rows (all docs empty or filtered)")

    w = np.zeros(n_buckets + 1, dtype=np.float64)
    losses: list = []
    try:
        for _ in range(n_iter):
            w_df = _weights_df(spark, w)
            # track_loss folds the log-loss into the SAME n_buckets-row
            # aggregate via the bias bucket (one job/iteration, not
            # two — VERDICT r5 #2); loss = bias-bucket lsum / n_docs
            grad_rows = gradient_plan(
                xmat, w_df, loss_bucket=n_buckets if track_loss else None
            ).collect()
            g = np.zeros(n_buckets + 1, dtype=np.float64)
            for row in grad_rows:
                g[row["bucket"]] = row["g"]
                if track_loss and row["bucket"] == n_buckets:
                    losses.append(float(row["lsum"]) / n_docs)
            if l2:
                reg = l2 * w
                reg[n_buckets] = 0.0
                g = g + n_docs * reg
            w = w - (lr / n_docs) * g
    finally:
        xmat.unpersist()
    return TrainedQualityModel(weights=w, n_buckets=n_buckets, losses=losses)


def score_with_model(
    df: DataFrame,
    model: TrainedQualityModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: Optional[str] = None,
    threshold: float = 0.5,
) -> DataFrame:
    """Score every document with a trained model: (id_col, score in
    (0,1), quality_label keep/drop). ONE map-only Arrow pass — buckets
    are computed codegen-side; the weight gather-sum is a vectorized
    pandas UDF over the bucket arrays (flat concatenate + np.add
    .reduceat, no per-token Python). Empty/NULL docs score the bare
    bias and label accordingly."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(model.weights)
    nb = model.n_buckets

    @F.pandas_udf("double")
    def margin(buckets: pd.Series) -> pd.Series:
        w = bc.value
        arrs = buckets.tolist()
        lens = np.array(
            [0 if a is None else len(a) for a in arrs], dtype=np.int64
        )
        out = np.full(len(arrs), w[nb], dtype=np.float64)
        total = int(lens.sum())
        if total:
            flat = np.concatenate(
                [
                    np.asarray(a, dtype=np.int64)
                    for a in arrs
                    if a is not None and len(a)
                ]
            )
            sums = np.add.reduceat(
                w[flat], np.concatenate(([0], np.cumsum(lens[lens > 0])[:-1]))
            )
            nz = lens > 0
            out[nz] += sums / lens[nz]
        return pd.Series(out)

    feats = (
        hashed_token_features(F.col(tokens_col))
        if tokens_col is not None
        else hashed_features(F.col(text_col))
    )
    m = margin(feature_buckets(feats, nb))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
    return df.select(
        F.col(id_col),
        score.alias("score"),
        F.when(score >= F.lit(threshold), F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("quality_label"),
    )


def threshold_for_keep_rate(
    scored: DataFrame, keep_rate: float, rel_err: float = 1e-4
) -> float:
    """The DCLM-style gate: the score threshold that keeps roughly the
    top ``keep_rate`` fraction of documents — one mergeable
    approx-quantile sketch pass over the scored table (no sort, no
    collect of rows). Re-score with ``score_with_model(...,
    threshold=...)`` or filter ``score >= threshold`` downstream."""
    if not 0.0 < keep_rate < 1.0:
        raise ValueError(f"keep_rate must be in (0,1), got {keep_rate}")
    q = scored.stat.approxQuantile("score", [1.0 - keep_rate], rel_err)
    return float(q[0])


def python_reference_train(
    docs: list,
    n_buckets: int,
    n_iter: int = 30,
    lr: float = 2.0,
    l2: float = 0.0,
) -> np.ndarray:
    """Pure-numpy reference twin for tests: ``docs`` is a list of
    (bucket_list, y). Bias at index n_buckets. Identical math to
    :func:`train_quality_classifier` (sum gradient, lr/n scaling,
    bias-exempt L2)."""
    n = len(docs)
    rows = []
    for buckets, y in docs:
        xs: dict = {n_buckets: 1.0}
        if buckets:
            # count-then-divide, matching the engine's c/nf exactly
            # (repeated += 1/nf walks a different float path)
            counts: dict = {}
            for b in buckets:
                counts[b] = counts.get(b, 0) + 1
            for b, c in counts.items():
                xs[b] = c / len(buckets)
        rows.append((xs, float(y)))
    w = np.zeros(n_buckets + 1, dtype=np.float64)
    for _ in range(n_iter):
        g = np.zeros_like(w)
        for xs, y in rows:
            m = sum(w[b] * v for b, v in xs.items())
            r = 1.0 / (1.0 + np.exp(-m)) - y
            for b, v in xs.items():
                g[b] += v * r
        if l2:
            reg = l2 * w
            reg[n_buckets] = 0.0
            g = g + n * reg
        w = w - (lr / n) * g
    return w
