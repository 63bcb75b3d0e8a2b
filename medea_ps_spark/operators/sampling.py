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


def _budget_case(
    budgets: Dict[str, int], strat_col: str, default_budget: int
) -> Column:
    """Per-row token budget as one case expression (bigint)."""
    col = F.lit(int(default_budget)).cast("bigint")
    for value, b in sorted(budgets.items()):
        col = (
            F.when(F.col(strat_col) == value, F.lit(int(b)).cast("bigint"))
            .otherwise(col)
        )
    return col


def _shard_ledger(
    df: DataFrame,
    strat_col: str,
    key_col: str,
    n_tok_col: str,
    seed: int,
    shard_chars: int,
) -> Dict[object, list]:
    """Driver-side shard ledger for the token-budget sampler: one
    bounded aggregate — |strata| x 16^shard_chars rows, never data
    rows — of per-(stratum, shard) token sums, returned as
    {stratum: [(shard, sum)] sorted by shard}. Lexicographic shard
    order == numeric order (fixed-width lowercase md5 hex — the house
    trick), so a prefix scan over each stratum's list yields every
    shard's exclusive token offset in the stratum's global sample
    order."""
    if not 1 <= shard_chars <= 8:
        raise ValueError(f"shard_chars must be in [1,8], got {shard_chars}")
    from pyspark.sql.types import StringType

    if not isinstance(df.schema[strat_col].dataType, StringType):
        # the driver-built ledger/keep frames are string-typed; a
        # non-string stratum would coerce in the join and silently
        # mismatch — refuse instead
        raise TypeError(
            f"{strat_col!r} must be a string column, got "
            f"{df.schema[strat_col].dataType.simpleString()}"
        )
    sums = (
        df.select(
            F.col(strat_col).alias("_strat"),
            F.substring(
                hash_bucket(F.col(key_col), seed), 1, shard_chars
            ).alias("_shard"),
            F.col(n_tok_col).cast("bigint").alias("_n_tok"),
        )
        .groupBy("_strat", "_shard")
        .agg(F.sum("_n_tok").alias("_sum"), F.min("_n_tok").alias("_min"))
        .collect()
    )
    # a negative token count would make the stratum's running sum
    # non-monotone, which unsounds the keep/drop shard classification
    # (a 'drop' shard could dip back under the budget) — the min rides
    # the same aggregate, so the guard costs nothing
    neg = [r["_strat"] for r in sums if r["_min"] is not None and r["_min"] < 0]
    if neg:
        raise ValueError(
            f"negative {n_tok_col} values in strata {sorted(set(map(str, neg)))[:5]}"
        )
    per_strat: Dict[object, list] = {}
    for r in sums:
        per_strat.setdefault(r["_strat"], []).append(
            (r["_shard"], r["_sum"] or 0)
        )
    return {s: sorted(shards) for s, shards in per_strat.items()}


def _check_budgets(budgets: Dict[str, int], default_budget: int) -> None:
    for s, b in budgets.items():
        if b < 0:
            raise ValueError(f"budget for {s!r} must be >= 0, got {b}")
    if default_budget < 0:
        raise ValueError(f"default_budget must be >= 0, got {default_budget}")


def _classify_shards(
    ledger: Dict[object, list],
    budgets: Dict[str, int],
    default_budget: int,
):
    """Classify every (stratum, shard) against the stratum's budget:

    * keep — offset + shard_sum < budget: every row's tokens-before is
      strictly below the budget, the whole shard is selected with NO
      per-row cumsum;
    * drop — offset >= budget: no row can be selected;
    * boundary — the (usually single) shard per stratum where the
      running total crosses the budget; only these rows need the
      within-shard window.

    Returns (keep_pairs, boundary) with boundary = {(strat, shard): offset}.
    """
    keep_pairs: list = []
    boundary: Dict[tuple, int] = {}
    for strat, shards in ledger.items():
        budget = (
            budgets.get(strat, default_budget)
            if strat is not None
            else default_budget
        )
        offset = 0
        for shard, ssum in shards:
            if offset + ssum < budget:
                keep_pairs.append((strat, shard))
            elif offset >= budget:
                pass  # fully dropped
            else:
                boundary[(strat, shard)] = offset
            offset += ssum
    return keep_pairs, boundary


def token_budget_assignments(
    df: DataFrame,
    budgets: Dict[str, int],
    strat_col: str = "source",
    key_col: str = "doc_id",
    n_tok_col: str = "n_tok",
    seed: int = 42,
    shard_chars: int = 2,
    default_budget: int = 0,
) -> DataFrame:
    """Audit view of the token-budget mixture sampler: every input row
    with its deterministic sample coordinate, exact exclusive running
    token count (``tok_before``) within its stratum, and the
    ``selected`` verdict (``tok_before < budget`` — documents are taken
    in md5-coordinate order until the budget is consumed; the document
    that CROSSES the budget is included, so selected tokens are >= the
    budget whenever the stratum has enough).

    Scale design — the naive version is a running sum over ONE window
    per stratum, i.e. a single task holding a whole web-scale domain.
    Instead the md5 coordinate's first ``shard_chars`` hex chars shard
    each stratum into 16^c independent runs (packing.py's pattern);
    per-shard token sums are a bounded aggregate, their lexicographic
    prefix (driver-side, |strata| x 16^c entries) broadcasts back as
    each shard's exclusive offset, and the per-row cumsum window
    partitions by (stratum, shard) — no window ever sees more than
    ~n/16^c rows. At 10^12 rows pick shard_chars=4-5.

    Determinism: selection is a pure function of (key, n_tok, seed) —
    layout-independent, rerun-stable, and NESTED across budgets (the
    50B-token sample is a strict prefix of the 100B one at the same
    seed). Rows with NULL ``n_tok`` are never selected (they cannot be
    budgeted); NULL strata fall to ``default_budget``. Everything is
    md5-hex + window arithmetic: bit-identical in DuckDB, so the
    operator is SQL-oracle-able.
    """
    from pyspark.sql import Window

    _check_budgets(budgets, default_budget)
    ledger = _shard_ledger(
        df, strat_col, key_col, n_tok_col, seed, shard_chars
    )
    # exact exclusive offset for EVERY shard (the audit view reports
    # the true tok_before everywhere; token_budget_sample() below is
    # the plan that skips the window for decided shards)
    offs_rows = []
    for strat, shards in ledger.items():
        off = 0
        for shard, ssum in shards:
            offs_rows.append((strat, shard, off))
            off += ssum
    spark = df.sparkSession
    offs_df = spark.createDataFrame(
        offs_rows, schema="_off_strat string, _off_shard string, _off bigint"
    )
    tagged = df.withColumn(
        "sample_coord", hash_bucket(F.col(key_col), seed)
    ).withColumn("sample_shard", F.substring("sample_coord", 1, shard_chars))
    joined = tagged.join(
        F.broadcast(offs_df),
        tagged[strat_col].eqNullSafe(offs_df["_off_strat"])
        & (tagged["sample_shard"] == offs_df["_off_shard"]),
    ).drop("_off_strat", "_off_shard")
    w = (
        Window.partitionBy(strat_col, "sample_shard")
        .orderBy("sample_coord", key_col, F.col(n_tok_col).cast("bigint"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col(n_tok_col).cast("bigint")).over(w)
    budget = _budget_case(budgets, strat_col, default_budget)
    return (
        joined.withColumn(
            "tok_before",
            F.col("_off") + running - F.col(n_tok_col).cast("bigint"),
        )
        .withColumn("selected", F.col("tok_before") < budget)
        .drop("_off")
    )


def token_budget_sample(
    df: DataFrame,
    budgets: Dict[str, int],
    strat_col: str = "source",
    key_col: str = "doc_id",
    n_tok_col: str = "n_tok",
    seed: int = 42,
    shard_chars: int = 2,
    default_budget: int = 0,
) -> DataFrame:
    """Token-budget mixture sampling — "give me 50B tokens of web,
    30B of books, all of wiki" — the unit real pretraining mixtures are
    specified in (docs are variable-length; a doc-rate mixture misses
    token targets by whatever the length distribution does that day).
    Selects documents per stratum in deterministic md5-coordinate order
    until the stratum's token budget is consumed (the crossing document
    is included); strata absent from ``budgets`` get
    ``default_budget`` (0 = dropped — a mixture is a statement of what
    you want, not a default keep).

    Plan (the reason this isn't just ``token_budget_assignments`` +
    filter): the driver-side shard ledger classifies every
    (stratum, shard) as fully-kept / fully-dropped / boundary, so

    * fully-kept shards pass through a broadcast LEFT SEMI join — a
      map-side hash probe, NO shuffle, NO window — and that is ~all of
      the selected data (boundary shards are 1/16^c of each stratum);
    * only boundary-shard rows (one shard per stratum in the common
      case) pay the within-shard cumsum window, whose partition is
      bounded by the shard size.

    The union costs a second scan of the source relation (the shard
    predicate is a computed md5 column, so it cannot prune parquet),
    but at 100 TB a second columnar scan is far cheaper than the
    alternative — a full-table shuffle into window partitions. Output
    is exactly the ``selected`` rows of :func:`token_budget_assignments`
    (proven bit-identical in tests), with the original schema.
    """
    from pyspark.sql import Window

    _check_budgets(budgets, default_budget)
    ledger = _shard_ledger(
        df, strat_col, key_col, n_tok_col, seed, shard_chars
    )
    keep_pairs, boundary = _classify_shards(ledger, budgets, default_budget)
    spark = df.sparkSession
    cols = df.columns
    coord = hash_bucket(F.col(key_col), seed)
    # a NULL token count cannot be budgeted — such rows are never
    # selected (matches token_budget_assignments, whose NULL tok_before
    # fails the < budget predicate); filtered here so the interior
    # branch agrees with the window branch
    tagged = (
        df.where(F.col(n_tok_col).isNotNull())
        .withColumn("_coord", coord)
        .withColumn("_shard", F.substring("_coord", 1, shard_chars))
    )
    empty = spark.createDataFrame([], df.schema)

    if keep_pairs:
        keep_df = spark.createDataFrame(
            keep_pairs, schema=f"{strat_col} string, _shard string"
        )
        interior = tagged.join(
            F.broadcast(keep_df),
            [tagged[strat_col].eqNullSafe(keep_df[strat_col]),
             tagged["_shard"] == keep_df["_shard"]],
            "leftsemi",
        ).select(*cols)
    else:
        interior = empty

    if boundary:
        b_pred = F.lit(False)
        offset = F.lit(0).cast("bigint")
        for (strat, shard), off in sorted(
            boundary.items(), key=lambda kv: (str(kv[0][0]), kv[0][1])
        ):
            cond = (
                F.col(strat_col).isNull()
                if strat is None
                else (F.col(strat_col) == strat)
            ) & (F.col("_shard") == shard)
            b_pred = b_pred | cond
            offset = F.when(
                cond, F.lit(int(off)).cast("bigint")
            ).otherwise(offset)
        w = (
            Window.partitionBy(strat_col, "_shard")
            .orderBy("_coord", key_col, F.col(n_tok_col).cast("bigint"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        budget = _budget_case(budgets, strat_col, default_budget)
        bnd = (
            tagged.where(b_pred)
            .withColumn(
                "_tok_before",
                offset
                + F.sum(F.col(n_tok_col).cast("bigint")).over(w)
                - F.col(n_tok_col).cast("bigint"),
            )
            .where(F.col("_tok_before") < budget)
            .select(*cols)
        )
    else:
        bnd = empty

    return interior.unionByName(bnd)


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
