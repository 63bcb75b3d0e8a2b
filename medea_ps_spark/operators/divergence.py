"""Pairwise Jensen–Shannon divergence between per-group token
distributions — "how far apart are my sources?" as a matrix.

drift.py answers "did THIS column move vs a frozen reference profile"
(chi², KS, PSI); this module answers the mixture-design question:
pairwise distributional distance between the corpus's own groups
(sources, shards, snapshots) over the token-id distribution. JSD is the
standard choice (symmetric, bounded [0, ln 2], defined even where one
side has zero mass — unlike KL, which needs smoothing hacks).

Scale shape mirrors vocab.py: the corpus is touched ONCE (explode →
partial-aggregated (group, bucket) counts: the shuffle carries at most
|groups| × n_buckets rows, never the token stream); every later stage —
totals, the pair expansion, the divergence sum — runs over that bounded
relation. With G groups and B buckets the pair stage is O(G² × B):
bucket tokens (``n_buckets``) and/or restrict the pair set before
computing a matrix over thousands of groups.

Fully deterministic, pure JVM aggregates (no UDF), so the whole
estimator is reproducible by the DuckDB oracle term-for-term (ln and
double division agree bit-for-bit; results are rounded to 6 dp on both
sides per house convention).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

EPS_NONE = 0.0  # JSD needs no smoothing: zero-mass terms contribute 0


def token_bucket_counts(
    df: DataFrame,
    token_col: str = "tokens",
    group_col: str = "source",
    n_buckets: Optional[int] = None,
) -> DataFrame:
    """(group, bucket, cnt) token-id histogram per group. With
    ``n_buckets`` the token id is folded by pmod (sign-safe for
    out-of-vocab negatives); without, the bucket IS the token id —
    only sane when the vocabulary is bounded (state is |groups|×vocab).
    One map-side partial agg; only (group, bucket) partials shuffle."""
    tok = F.explode(F.col(token_col)).alias("_tok")
    ex = df.select(F.col(group_col), tok)
    bucket = (
        F.pmod(F.col("_tok"), F.lit(n_buckets)) if n_buckets is not None
        else F.col("_tok")
    )
    return (
        ex.select(F.col(group_col), bucket.cast("bigint").alias("bucket"))
        .groupBy(group_col, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def column_bucket_counts(
    df: DataFrame,
    column: str,
    group_col: str = "source",
    n_buckets: Optional[int] = None,
) -> DataFrame:
    """token_bucket_counts' scalar-column twin: (group, bucket, cnt)
    over any categorical or integral column, so js_divergence_pairs /
    jsd_contributions work on e.g. the lang or n_tok distribution per
    source. With ``n_buckets`` the value is hash-folded (sign-safe
    pmod of a 64-bit hash — works for strings too); without, the
    bucket is the raw value (only sane for low-cardinality columns).
    NULL values are excluded (they have no bucket on either side)."""
    v = F.col(column)
    # no-fold branch keeps the raw value (any type groups fine);
    # casting strings to bigint would raise under ANSI mode
    bucket = (
        F.pmod(F.xxhash64(v), F.lit(n_buckets)) if n_buckets is not None
        else v
    )
    return (
        df.where(v.isNotNull())
        .select(F.col(group_col), bucket.alias("bucket"))
        .groupBy(group_col, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def _pair_bucket_terms(
    counts: DataFrame, group_col: str = "source", cache: bool = True
) -> DataFrame:
    """(g_a, g_b, bucket, p, q, term) for every unordered group pair
    and every bucket with mass on either side: the per-bucket JSD
    contribution ``0.5 p ln(p/m) + 0.5 q ln(q/m)`` with m=(p+q)/2 —
    non-negative by the log-sum inequality, summing to the pair's JSD.

    The count relation is referenced four times (totals + group list +
    both pair sides); ``cache=True`` persists it — |groups| × buckets
    bounded rows — so the corpus-scanning histogram runs ONCE.
    """
    c = counts.select(
        F.col(group_col).alias("g"), "bucket", F.col("cnt").cast("double")
        .alias("cnt")
    )
    if cache:
        c = c.persist()
    tot = c.groupBy("g").agg(F.sum("cnt").alias("tot"))
    gs = c.select("g").distinct()
    pairs = (
        gs.select(F.col("g").alias("g_a"))
        .join(gs.select(F.col("g").alias("g_b")))
        .where(F.col("g_a") < F.col("g_b"))
    )
    ua = pairs.join(c, F.col("g_a") == F.col("g")).select(
        "g_a", "g_b", "bucket",
        F.col("cnt").alias("ca"), F.lit(0.0).alias("cb"),
    )
    ub = pairs.join(c, F.col("g_b") == F.col("g")).select(
        "g_a", "g_b", "bucket",
        F.lit(0.0).alias("ca"), F.col("cnt").alias("cb"),
    )
    joint = (
        ua.unionByName(ub)
        .groupBy("g_a", "g_b", "bucket")
        .agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
    )
    withtot = (
        joint.join(
            F.broadcast(tot.select(F.col("g").alias("g_a"),
                                   F.col("tot").alias("tot_a"))),
            "g_a",
        )
        .join(
            F.broadcast(tot.select(F.col("g").alias("g_b"),
                                   F.col("tot").alias("tot_b"))),
            "g_b",
        )
    )
    p = F.col("ca") / F.col("tot_a")
    q = F.col("cb") / F.col("tot_b")
    mmid = (p + q) / F.lit(2.0)
    term = (
        F.when(p > 0, F.lit(0.5) * p * F.log(p / mmid)).otherwise(F.lit(0.0))
        + F.when(q > 0, F.lit(0.5) * q * F.log(q / mmid)).otherwise(
            F.lit(0.0)
        )
    )
    return withtot.select(
        "g_a", "g_b", "bucket",
        p.alias("p"), q.alias("q"), term.alias("term"),
    )


_LN2 = 0.6931471805599453


def js_divergence_pairs(
    counts: DataFrame, group_col: str = "source", cache: bool = True
) -> DataFrame:
    """Pairwise JSD from a token_bucket_counts relation.

    For each unordered group pair (g_a < g_b), with p and q the two
    normalized bucket distributions and m = (p + q) / 2:
    ``jsd = 0.5 Σ p ln(p/m) + 0.5 Σ q ln(q/m)`` (zero-mass terms
    contribute nothing — no smoothing constant to tune). Returns
    (g_a, g_b, n_buckets_union, jsd, jsd_norm) with jsd_norm = jsd/ln 2
    in [0, 1], both rounded to 6 dp. NULL group keys never form a pair.
    """
    return (
        _pair_bucket_terms(counts, group_col, cache=cache)
        .groupBy("g_a", "g_b")
        .agg(
            F.count("*").cast("bigint").alias("n_buckets_union"),
            F.sum("term").alias("_jsd"),
        )
        .select(
            "g_a",
            "g_b",
            "n_buckets_union",
            F.round(F.col("_jsd"), 6).alias("jsd"),
            F.round(F.col("_jsd") / F.lit(_LN2), 6).alias("jsd_norm"),
        )
    )


def jsd_contributions(
    counts: DataFrame,
    group_col: str = "source",
    top_n: int = 10,
    cache: bool = True,
) -> DataFrame:
    """Drill-down for a hot pair: the top_n buckets contributing most
    to each pair's JSD (which token ranges drove the divergence).
    Two-phase per-(pair) top-k via topk.topk_per_group — each pair has
    at most |buckets| rows, but the pair COUNT can be large, so the
    ranked window still gets the house scale treatment. Output:
    (g_a, g_b, bucket, p, q, term, rank), term/p/q rounded to 6 dp,
    ties broken on ascending bucket id.
    """
    from .topk import topk_per_group

    t = _pair_bucket_terms(counts, group_col, cache=cache)
    top = topk_per_group(
        t,
        ["g_a", "g_b"],
        [F.desc("term"), F.asc("bucket")],
        k=top_n,
        rank_col="rank",
    )
    return top.select(
        "g_a", "g_b", "bucket",
        F.round(F.col("p"), 6).alias("p"),
        F.round(F.col("q"), 6).alias("q"),
        F.round(F.col("term"), 6).alias("term"),
        "rank",
    )


def source_divergence_matrix(
    df: DataFrame,
    token_col: str = "tokens",
    group_col: str = "source",
    n_buckets: Optional[int] = 512,
) -> DataFrame:
    """One-call pairwise JSD matrix over the token distribution."""
    return js_divergence_pairs(
        token_bucket_counts(df, token_col, group_col, n_buckets), group_col
    )
