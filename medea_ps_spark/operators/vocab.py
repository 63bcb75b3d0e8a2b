"""Cross-group vocabulary overlap via KMV (k-minimum-values) sketches.

"How much does the token vocabulary of source A overlap source B?" is a
standard corpus-curation diagnostic (domain relatedness, contamination
triage, mixture design). Exact per-source distinct-token sets are
unbounded state at 10^12 sequences; the KMV sketch bounds every source
to its k smallest distinct hashes, and the classic k-minima union
estimator (Beyer et al., SIGMOD 2007: the k smallest of A∪B are all
present in sketch(A) ∪ sketch(B), and the fraction of them lying in
BOTH sketches estimates |A∩B| / |A∪B|) turns two sketches into a
Jaccard estimate — exact whenever a source's true vocabulary is under k.

Deterministic by construction (md5 of the value, no RNG), which makes
the WHOLE estimator SQL-oracle-able: DuckDB computes bit-identical md5
hex (the repo's round-2 trick), identical k-minima, identical estimate.

Scale shape: the corpus is touched ONCE (explode + map-side partial
distinct + two-phase per-group top-k — no task ranks more than one
input partition of a group, topk.py's house pattern); everything after
operates on |groups| × k rows, so the pair join, membership flags, and
re-rank are driver-trivial no matter the corpus size. With G groups the
pair stage is G² × 2k rows — at G in the thousands, still tiny; persist
the minima relation before pairing so the corpus scan is not repeated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .topk import topk_per_group


def kmv_group_minima(
    df: DataFrame,
    column: str,
    group_col: str,
    k: int = 100,
    salt: str = "kmv",
) -> DataFrame:
    """Per-group KMV sketch: the k smallest DISTINCT 8-hex-char md5
    hashes of ``column`` within each ``group_col`` value. Same hash
    recipe as sketches.kmv_minima (md5 of value + salt, first 8 hex
    chars) so sketches of the same column merge across the two APIs.
    Output: (group_col, hx, rn) with rn = 1..k ascending by hash."""
    hx = F.substring(
        F.md5(
            F.concat_ws(":", F.col(column).cast("string"), F.lit(salt))
        ),
        1,
        8,
    )
    base = (
        df.where(F.col(column).isNotNull())
        .select(F.col(group_col), hx.alias("hx"))
        .distinct()
    )
    return topk_per_group(base, [group_col], [F.asc("hx")], k, rank_col="rn")


def token_vocab_minima(
    df: DataFrame,
    token_col: str = "tokens",
    group_col: str = "source",
    k: int = 100,
    salt: str = "kmv",
) -> DataFrame:
    """KMV vocabulary sketch per group over an array<int> token column.
    The explode is map-side and feeds straight into the partial distinct
    — no full token stream ever shuffles, only distinct hashes."""
    ex = df.select(F.col(group_col), F.explode(F.col(token_col)).alias("_tok"))
    return kmv_group_minima(ex, "_tok", group_col, k, salt)


def kmv_jaccard_between(
    minima_a: DataFrame,
    minima_b: DataFrame,
    group_col: str = "source",
    k: int = 100,
    cache: bool = True,
) -> DataFrame:
    """Same-group vocabulary Jaccard BETWEEN two sketch relations —
    the snapshot-drift variant of :func:`kmv_jaccard_pairs` ("did
    source X's vocabulary move between yesterday's corpus and
    today's?"). Because KMV sketches are tiny (k rows per group) and
    mergeable, persist each snapshot's `kmv_group_minima` output (a
    natural profilestore artifact) and diff sketches forever after
    without touching either corpus again.

    Only groups present in BOTH relations are compared (a group with
    no counterpart has nothing to drift against). Same estimator as
    the pairwise form: k smallest of the union, fraction present in
    both sketches. Output: (group_col, k_used, n_shared, jaccard_est).
    """
    a = minima_a.select(
        F.col(group_col).alias("g"), "hx",
        F.lit(1).alias("in_a"), F.lit(0).alias("in_b"),
    )
    b = minima_b.select(
        F.col(group_col).alias("g"), "hx",
        F.lit(0).alias("in_a"), F.lit(1).alias("in_b"),
    )
    if cache:
        # each sketch is referenced twice (group list + union side);
        # persisting the tiny |groups| x k relations keeps the
        # corpus-scanning derivations single-execution
        a, b = a.persist(), b.persist()
    both = (
        a.select("g").distinct().join(b.select("g").distinct(), "g")
    )
    memb = (
        a.unionByName(b)
        .join(F.broadcast(both), "g")
        .groupBy("g", "hx")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("g").orderBy("hx")
    ranked = memb.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )
    return (
        ranked.groupBy("g")
        .agg(
            F.count("*").cast("bigint").alias("k_used"),
            F.sum(
                F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1)
                .otherwise(0)
            ).cast("bigint").alias("n_shared"),
        )
        .withColumn(
            "jaccard_est",
            F.round(
                F.col("n_shared").cast("double")
                / F.col("k_used").cast("double"),
                6,
            ),
        )
        .withColumnRenamed("g", group_col)
    )


def kmv_jaccard_pairs(
    minima: DataFrame,
    group_col: str = "source",
    k: int = 100,
    cache: bool = True,
) -> DataFrame:
    """Pairwise Jaccard estimates from a kmv_group_minima relation.

    For each unordered group pair (g_a < g_b): union the two sketches,
    keep the k smallest distinct hashes (a valid sketch of the union),
    and count how many of them sit in BOTH input sketches. Returns
    (g_a, g_b, k_used, n_shared, jaccard_est) with
    ``jaccard_est = n_shared / k_used`` rounded to 6 dp; ``k_used < k``
    means both vocabularies were under k and the estimate is exact.
    NULL group keys never form a pair (SQL ``<`` semantics), matching
    the oracle. All stages after the sketch touch ≤ |pairs| × 2k rows.

    The sketch relation is referenced three times (group list + both
    pair sides); ``cache=True`` (default) persists it — |groups| × k
    tiny rows — so the corpus-scanning sketch derivation runs ONCE
    instead of three times. Pass ``cache=False`` if the caller already
    materialized the sketches (e.g. read back from a profile store).
    """
    m = minima.select(F.col(group_col).alias("g"), "hx")
    if cache:
        m = m.persist()
    gs = m.select("g").distinct()
    pairs = (
        gs.select(F.col("g").alias("g_a"))
        .join(gs.select(F.col("g").alias("g_b")))
        .where(F.col("g_a") < F.col("g_b"))
    )
    ua = pairs.join(m, F.col("g_a") == F.col("g")).select(
        "g_a", "g_b", "hx",
        F.lit(1).alias("in_a"), F.lit(0).alias("in_b"),
    )
    ub = pairs.join(m, F.col("g_b") == F.col("g")).select(
        "g_a", "g_b", "hx",
        F.lit(0).alias("in_a"), F.lit(1).alias("in_b"),
    )
    memb = (
        ua.unionByName(ub)
        .groupBy("g_a", "g_b", "hx")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    # each (g_a, g_b) holds <= 2k distinct hashes: a plain ranked window
    # is safe here (the two-phase pattern already bounded the sketch)
    w = Window.partitionBy("g_a", "g_b").orderBy("hx")
    ranked = memb.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )
    return (
        ranked.groupBy("g_a", "g_b")
        .agg(
            F.count("*").cast("bigint").alias("k_used"),
            F.sum(
                F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1)
                .otherwise(0)
            ).cast("bigint").alias("n_shared"),
        )
        .withColumn(
            "jaccard_est",
            F.round(
                F.col("n_shared").cast("double")
                / F.col("k_used").cast("double"),
                6,
            ),
        )
    )
