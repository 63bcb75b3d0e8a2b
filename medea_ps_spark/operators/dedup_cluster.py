"""Near-duplicate clustering: connected components over the pair graph
produced by minhash/simhash/cosine near-dup detection, yielding one
canonical (min-id) representative per duplicate cluster.

Spark-first algorithm: iterative min-label propagation (a.k.a.
"hash-to-min" / large-star, the standard DataFrame-only connected
components — no GraphFrames dependency):

  label(v) <- min(label(v), min over neighbors' labels)

repeated until fixpoint. Each iteration is one shuffle on the edge key;
the iteration count is O(log(diameter)), and dedup-pair graphs have
tiny diameters (dup clusters are near-cliques), so 3-5 iterations
close. At 10^12-row scale the edge set is the (small) near-dup
population, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    max_iterations: int = 10,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``;
    component = min node id of its connected component."""
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .unionByName(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
        .distinct()
    )
    labels = edges.select(F.col("a").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    for _ in range(max_iterations):
        # candidate: min neighbor label
        nbr = (
            edges.join(labels, edges["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
        )
        # pointer doubling: component <- component(component) — turns the
        # O(diameter) neighbor walk into O(log n) total iterations
        x, y = new_labels.alias("x"), new_labels.alias("y")
        new_labels = (
            x.join(y, F.col("x.component") == F.col("y.node"), "left")
            .select(
                F.col("x.node").alias("node"),
                F.least(
                    F.col("x.component"),
                    F.coalesce(F.col("y.component"), F.col("x.component")),
                ).alias("component"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels.localCheckpoint(eager=True) if changed else new_labels
        if not changed:
            break
    return labels.select("node", "component")


def canonicalize(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 10,
) -> DataFrame:
    """Adds ``canonical_id``: the min id of the row's duplicate cluster
    (its own id when it has no near-duplicates), and ``is_canonical``.
    One broadcast-ish join against the (small) component map."""
    comp = connected_components(pairs, max_iterations)
    return (
        df.join(
            comp.withColumnRenamed("node", id_col), on=id_col, how="left"
        )
        .withColumn("canonical_id", F.coalesce("component", F.col(id_col)))
        .drop("component")
        .withColumn("is_canonical", F.col(id_col) == F.col("canonical_id"))
    )


def dedup_by_clusters(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Survivors: one (min-id) representative per near-dup cluster."""
    out = canonicalize(df, pairs, id_col)
    return out.where(F.col("is_canonical")).drop("canonical_id", "is_canonical")
