"""Deterministic hash sampling — reproducible corpus subsetting and
domain mixing for training-data pipelines.

``df.sample()`` draws from a per-partition RNG: the selected set changes
with partition layout, cluster size, and retry history, which breaks
resumable runs (a re-run after a checkpoint restore must sample the SAME
rows) and ablation comparisons. Hash sampling instead makes the keep
decision a PURE FUNCTION of (key, seed): a row is kept iff the first 8
hex chars of md5(key ':' seed) fall below rate · 16^8. That gives:

* layout-independence — same sample on 1 executor or 1000;
* nested subsets — rate 0.1 is a strict subset of rate 0.2 at the same
  seed (threshold grows monotonically), enabling scaling-law ladders;
* disjoint splits — train/holdout from complementary threshold ranges.

The comparison stays on FIXED-WIDTH lowercase hex strings: md5 is
bit-identical in Spark and DuckDB, and on equal-length hex strings
lexicographic order == numeric order, so the whole operator is
SQL-oracle-able (same trick as dedup.py's md5 LSH mode). Everything is
a single codegen'd projection — no shuffle, no UDF, no RNG state.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, functions as F

_HEX_SPAN = 16 ** 8  # first 8 md5 hex chars = 32 uniform bits


def rate_threshold(rate: float) -> str:
    """8-char lowercase hex threshold for a keep-rate in [0, 1]."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return format(min(int(rate * _HEX_SPAN), _HEX_SPAN - 1) if rate < 1.0
                  else _HEX_SPAN - 1, "08x")


def hash_bucket(key: Column, seed: int = 42) -> Column:
    """The row's 8-hex-char sample coordinate (fixed width, lowercase)."""
    return F.substring(
        F.md5(F.concat_ws(":", key.cast("string"), F.lit(str(seed)))), 1, 8
    )


def keep_predicate(key: Column, rate: float, seed: int = 42) -> Column:
    """Boolean keep column: pure function of (key, seed, rate)."""
    if rate >= 1.0:
        return F.lit(True)
    if rate <= 0.0:
        return F.lit(False)
    return hash_bucket(key, seed) < F.lit(rate_threshold(rate))


def sample_deterministic(
    df: DataFrame, rate: float, key_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Keep a deterministic ~rate fraction keyed on ``key_col``."""
    return df.where(keep_predicate(F.col(key_col), rate, seed))


def stratified_mixture(
    df: DataFrame,
    rates: Dict[str, float],
    strat_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 42,
    default_rate: float = 0.0,
) -> DataFrame:
    """Domain-mixing sampler: per-stratum keep rates (e.g. up-weight
    wiki, down-weight web) as ONE case-expression predicate — no
    per-stratum scans, no shuffle; the Zipf-skewed stratum column never
    becomes a join or aggregation key."""
    pred = keep_predicate(F.col(key_col), default_rate, seed)
    for value, rate in sorted(rates.items()):
        pred = F.when(
            F.col(strat_col) == value,
            keep_predicate(F.col(key_col), rate, seed),
        ).otherwise(pred)
    return df.where(pred)


def train_holdout_split(
    df: DataFrame,
    holdout_frac: float = 0.01,
    key_col: str = "doc_id",
    seed: int = 42,
) -> Tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive, deterministic split: holdout = buckets
    below the threshold, train = the rest. Safe for decontamination-
    style holdouts because membership is stable under re-runs, resumes,
    and repartitioning."""
    pred = keep_predicate(F.col(key_col), holdout_frac, seed)
    return df.where(~pred), df.where(pred)


def temperature_rates(
    df: DataFrame,
    alpha: float = 0.5,
    strat_col: str = "source",
    target_rows: Optional[int] = None,
) -> Dict[str, float]:
    """Per-stratum keep rates that realize a temperature-``alpha``
    mixture (multilingual-sampling standard, XLM-R / mT5: target share
    q_i ∝ n_i^alpha — alpha=1 keeps natural proportions, alpha→0
    approaches uniform) by SUBSAMPLING ONLY (every rate ≤ 1).

    The result keeps the largest corpus consistent with the mixture:
    total T = min_i(n_i / q_i), rate_i = q_i·T / n_i — the scarcest
    stratum (after tempering) is kept whole at rate 1.0. Pass
    ``target_rows`` to shrink T further (rates scale linearly).

    Driver-side by design: one groupBy(strat_col).count() action whose
    result is bounded by the number of strata (hundreds, not rows) —
    the same bounded-collect pattern as the sketch operators. Feed the
    returned dict straight into :func:`stratified_mixture`."""
    if alpha < 0.0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = {
        r[0]: r[1]
        for r in df.where(F.col(strat_col).isNotNull())
        .groupBy(strat_col)
        .count()
        .collect()
    }
    if not counts:
        return {}
    weights = {s: float(n) ** alpha for s, n in counts.items()}
    wsum = sum(weights.values())
    shares = {s: w / wsum for s, w in weights.items()}
    total = min(counts[s] / shares[s] for s in counts)
    if target_rows is not None:
        if target_rows <= 0:
            raise ValueError(f"target_rows must be positive, got {target_rows}")
        total = min(total, float(target_rows))
    return {s: min(shares[s] * total / counts[s], 1.0) for s in counts}


def repeat_mixture(
    df: DataFrame,
    factors: Dict[str, float],
    strat_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 42,
    default_factor: float = 1.0,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Deterministic FRACTIONAL up/down-sampling by repetition — the
    data-mixing complement of :func:`stratified_mixture` for factors
    above 1.0 (e.g. wiki ×3.4, web ×0.6, the Pile/LLaMA-style epoch
    weighting). A row with factor f appears floor(f) times, plus once
    more iff its md5 coordinate falls below frac(f) — so expected
    multiplicity is exactly f, realized multiplicity is a pure function
    of (key, seed), and the same seed nests: raising a factor only ADDS
    copies. Emitted copies carry 0-based ``epoch_col`` so downstream
    shuffle/sharding can spread repeats across epochs.

    Map-only: one case-expression for the copy count, one
    ``explode(sequence(...))`` — no shuffle, no UDF, no RNG state; the
    Zipf-skewed stratum column never becomes a join or aggregation
    key. Fixed-width md5-hex threshold keeps it SQL-oracle-able."""
    for s, f in factors.items():
        if f < 0.0:
            raise ValueError(f"factor for {s!r} must be >= 0, got {f}")
    if default_factor < 0.0:
        raise ValueError(f"default_factor must be >= 0, got {default_factor}")

    def n_copies(f: float) -> Column:
        whole, frac = int(f), f - int(f)
        extra = keep_predicate(F.col(key_col), frac, seed).cast("int")
        return F.lit(whole) + (extra if frac > 0.0 else F.lit(0))

    copies = n_copies(default_factor)
    for value, f in sorted(factors.items()):
        copies = F.when(F.col(strat_col) == value, n_copies(f)).otherwise(
            copies
        )
    return (
        df.withColumn("_n_copies", copies)
        .where(F.col("_n_copies") > 0)
        .withColumn(
            epoch_col,
            F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1)),
        )
        .drop("_n_copies")
    )


def stratified_exact_sample(
    df: DataFrame,
    n_per_stratum: int,
    strata_cols: Sequence[str] = ("source",),
    key_col: str = "doc_id",
    seed: int = 42,
    rank_col: Optional[str] = None,
) -> DataFrame:
    """EXACTLY min(n, |stratum|) rows per stratum — rate-based sampling
    can't hit a quota (a 0.1% stratum under-fills, a 40% one over-
    fills), but eval sets, per-domain audits, and balanced fine-tuning
    mixes need exact per-domain counts.

    Selection order is the same pure (key, seed) md5 coordinate as
    `sample_deterministic` (tie-broken by the key itself → total
    order), so the chosen set is layout-independent, rerun-stable, and
    NESTED: the n=1000 sample of a stratum is a strict subset of its
    n=2000 sample at the same seed — scaling ladders for free. The
    ranked window rides `topk_per_group` (two-phase: per-input-
    partition then over k·n_partitions survivors), so a 10^11-row web
    stratum never funnels through one task the way a naive
    `row_number() OVER (PARTITION BY source)` would.

    Fixed-width lowercase md5-hex order == numeric order in both Spark
    and DuckDB, so the operator is SQL-oracle-able verbatim."""
    from .topk import topk_per_group

    if n_per_stratum <= 0:
        raise ValueError(f"n_per_stratum must be positive, got {n_per_stratum}")
    out = topk_per_group(
        df,
        list(strata_cols),
        [hash_bucket(F.col(key_col), seed), F.col(key_col)],
        n_per_stratum,
        rank_col=rank_col or "_strat_rank",
    )
    return out if rank_col else out.drop("_strat_rank")
