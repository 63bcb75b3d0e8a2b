"""Per-group embedding centroids and centroid drift — the
embedding-space member of the source-comparison family (vocab.py =
lexical overlap, divergence.py = token-distribution distance, this =
semantic direction).

A group's (direction) centroid is the mean of its row-normalized
embeddings; cosine between centroids is the standard cheap probe for
"did source X's content drift between snapshots" and "which sources
are semantically close" — used before reaching for pairwise ANN,
which costs a candidate join instead of one aggregate.

Scale shape: ONE corpus scan — normalize each vector in a codegen
expression, posexplode to (group, pos, val), partial+final hash-agg to
|groups| × dim mean cells (the shuffle carries only those partials,
never the vectors), reassemble the centroid array with an
array_sort-by-pos transform. Everything downstream (pairwise cosine,
snapshot deltas) runs on the |groups|-row centroid relation. No UDFs
anywhere (input_hint: no per-row Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.vector import dot, norm

_EPS = 1e-12


def _safe_cosine(a, b):
    # a zero centroid (perfectly antipodal group) has no direction:
    # clamp the norms so ANSI mode doesn't raise DIVIDE_BY_ZERO and
    # the comparison degrades to similarity 0 instead
    return dot(a, b) / (
        F.greatest(norm(a), F.lit(_EPS)) * F.greatest(norm(b), F.lit(_EPS))
    )


def group_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    group_col: str = "source",
    normalize: bool = True,
) -> DataFrame:
    """(group_col, centroid array<double>, n_vectors). With
    ``normalize=True`` (default) each vector is scaled to unit norm
    first, so the centroid is a pure direction summary and its own
    norm measures the group's angular coherence (1.0 = all vectors
    parallel). Zero vectors get norm clamped to eps — they contribute
    a zero direction rather than NaNs. NULL vectors are excluded.

    Assumes a fixed embedding dimension per table (the input_hint
    contract): with ragged arrays, positions beyond a short vector
    would silently average over fewer rows. Enforce up front with a
    SizeEquals constraint (plans/constraints.py) when provenance is
    untrusted."""
    v = F.col(vec_col)
    # materialize the norm as its own column so it computes once per
    # row, not once per element inside the transform lambda
    base = df.where(v.isNotNull()).select(
        F.col(group_col),
        v,
        (
            F.greatest(norm(v), F.lit(_EPS)) if normalize else F.lit(1.0)
        ).alias("_nrm"),
    )
    unit = F.transform(v, lambda x: x.cast("double") / F.col("_nrm"))
    ex = base.select(
        F.col(group_col), F.posexplode(unit).alias("pos", "val")
    )
    cells = ex.groupBy(group_col, "pos").agg(
        F.avg("val").alias("mean"), F.count("*").alias("n")
    )
    return cells.groupBy(group_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mean"))),
            lambda s: s["mean"],
        ).alias("centroid"),
        F.max("n").alias("n_vectors"),
    )


def centroid_cosine_pairs(
    centroids: DataFrame, group_col: str = "source", cache: bool = True
) -> DataFrame:
    """Pairwise cosine between group centroids (g_a < g_b): the
    cheap |groups|²-row semantic-proximity matrix. Output:
    (g_a, g_b, cosine_sim rounded 6 dp, n_a, n_b)."""
    c = centroids.select(
        F.col(group_col).alias("g"), "centroid",
        F.col("n_vectors").alias("n"),
    )
    if cache:
        c = c.persist()
    a = c.select(
        F.col("g").alias("g_a"), F.col("centroid").alias("_ca"),
        F.col("n").alias("n_a"),
    )
    b = c.select(
        F.col("g").alias("g_b"), F.col("centroid").alias("_cb"),
        F.col("n").alias("n_b"),
    )
    return (
        a.join(b)
        .where(F.col("g_a") < F.col("g_b"))
        .select(
            "g_a", "g_b",
            F.round(
                _safe_cosine(F.col("_ca"), F.col("_cb")), 6
            ).alias("cosine_sim"),
            "n_a", "n_b",
        )
    )


def centroid_drift_between(
    centroids_a: DataFrame,
    centroids_b: DataFrame,
    group_col: str = "source",
) -> DataFrame:
    """Same-group centroid comparison BETWEEN two snapshots: cosine of
    the two directions plus both coherence norms. Only groups present
    in both snapshots appear. Output: (group_col, cosine_sim,
    coherence_a, coherence_b, n_a, n_b) — cosine near 1.0 means the
    source's semantic direction held; a coherence drop flags the group
    spreading out even when the mean direction is stable."""
    a = centroids_a.select(
        F.col(group_col), F.col("centroid").alias("_ca"),
        F.col("n_vectors").alias("n_a"),
    )
    b = centroids_b.select(
        F.col(group_col), F.col("centroid").alias("_cb"),
        F.col("n_vectors").alias("n_b"),
    )
    return a.join(b, group_col).select(
        group_col,
        F.round(_safe_cosine(F.col("_ca"), F.col("_cb")), 6).alias("cosine_sim"),
        F.round(norm(F.col("_ca")), 6).alias("coherence_a"),
        F.round(norm(F.col("_cb")), 6).alias("coherence_b"),
        "n_a",
        "n_b",
    )
