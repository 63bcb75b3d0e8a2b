"""Sampled (approximate) validation — confidence-bounded per-constraint
violation-rate estimates from a deterministic hash sample.

At 10^12 rows a full validation pass is a committed expense; the
operational question before launching one is usually "roughly how
broken is this table, and which rules?". This module answers it from a
deterministic p-fraction sample in ONE scan of the sampled rows:

* the sample is the house md5-threshold predicate
  (operators/sampling.py `keep_predicate`) — a pure function of
  (key, seed), so it is layout/cluster-size independent, resumable,
  nested across rates, pushed into the scan as a plain filter, and
  SQL-oracle-able (fixed-width lowercase hex compares
  lexicographically == numerically in both Spark and DuckDB);
* per-constraint violation counts ride ONE partial+final hash
  aggregate over the sample (one 0/1 indicator per row constraint —
  no explode, no shuffle of data rows, the aggregate exchanges K+1
  numbers);
* the single aggregate row is unpivoted with `stack` and Wilson score
  intervals are attached as plain Column expressions, so the whole
  estimator is a Catalyst plan end-to-end and a DuckDB oracle can
  reproduce it bit-for-bit (after the house 6-dp rounding).

Estimates cover ROW-LEVEL constraints only: a table-level check
(Unique, ReferentialIn with a dim table, FunctionalDependency) is a
property of the WHOLE key population — a uniqueness rate measured on a
p-fraction sample is biased low by ~p (birthday effect) and cannot be
corrected without the full key set, so extrapolating it would be
quietly wrong. ``on_table_constraints`` makes the caller choose:
"error" (default) refuses a compiled set that has any, "ignore" skips
them (the skipped names are in the returned frame's metadata-free
contract — callers that print reports should list them; the CLI does).

NULL sample keys: `hash_bucket` builds the coordinate with
``concat_ws``, which skips NULL, so every NULL-key row shares the ONE
constant coordinate md5(str(seed)) — they enter or leave the sample
TOGETHER. Constraints about the key column itself (e.g. NotNull on the
id) are therefore all-or-nothing in-sample; their estimates are exact
0 or a block, not a binomial draw. Documented rather than hidden: an
id-keyed sampler fundamentally cannot randomize rows without ids.

No reference counterpart (medea-ps validates one document at a time,
Medea.purs:146-162); this generalizes the north rule's per-partition
metrics toward Deequ-style approximate checks.
"""

from __future__ import annotations

import math
from typing import List, Optional

from pyspark.sql import DataFrame, functions as F

from ..plans.compiler import CompiledSet
from .sampling import keep_predicate

_EST_SCHEMA = (
    "constraint_id string, n_sampled bigint, n_violations bigint, "
    "est_rate double, ci_lo double, ci_hi double"
)


def wilson_interval(v: int, n: int, z: float = 1.96):
    """Pure-Python Wilson score interval (lo, hi) for v successes in n
    trials — the reference the Column expressions below must agree
    with (tests assert equality to 1e-12). Returns (None, None) when
    n == 0."""
    if n <= 0:
        return None, None
    z2 = z * z
    phat = v / n
    denom = 1.0 + z2 / n
    center = phat + z2 / (2.0 * n)
    rad = math.sqrt((phat * (1.0 - phat) + z2 / (4.0 * n)) / n)
    lo = max(0.0, (center - z * rad) / denom)
    hi = min(1.0, (center + z * rad) / denom)
    return lo, hi


def estimated_violation_rates(
    df: DataFrame,
    compiled: CompiledSet,
    fraction: float,
    key_col: str = "doc_id",
    seed: int = 42,
    z: float = 1.96,
    total_rows: Optional[int] = None,
    on_table_constraints: str = "error",
) -> DataFrame:
    """Estimate each ROW constraint's violation rate from a
    deterministic ``fraction`` hash sample keyed on ``key_col``.

    Returns one row per row-level constraint:
    ``(constraint_id, n_sampled, n_violations, est_rate, ci_lo,
    ci_hi)`` where [ci_lo, ci_hi] is the Wilson score interval at
    ``z`` (1.96 ≙ 95%). With ``total_rows`` (e.g. from the table
    snapshot's metadata — never computed here, that would be the scan
    this operator exists to avoid) three more columns extrapolate:
    ``est_total_violations``, ``est_total_lo``, ``est_total_hi``.
    When the sample is empty the rate/CI columns are NULL, not 0 —
    "no evidence" is not "no violations".

    One job: sample filter (pushed to the scan) → one partial+final
    hash aggregate → 1-row unpivot + CI expressions. No UDFs, no row
    shuffle, no collect.
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    if on_table_constraints not in ("error", "ignore"):
        raise ValueError(
            "on_table_constraints must be 'error' or 'ignore', "
            f"got {on_table_constraints!r}"
        )
    if compiled.table_constraints and on_table_constraints == "error":
        names = ", ".join(t.name for t in compiled.table_constraints)
        raise ValueError(
            "sampled estimation is undefined for table-level constraints "
            f"({names}): a rate measured on a sample of the key population "
            "is biased and cannot be extrapolated. Pass "
            "on_table_constraints='ignore' to estimate the row-level "
            "constraints only."
        )

    rcs = compiled.row_constraints
    spark = df.sparkSession
    if not rcs:
        # keep the schema contract identical to the non-empty path so
        # callers can union results regardless of constraint count
        schema = _EST_SCHEMA
        if total_rows is not None:
            schema += (
                ", est_total_violations double, est_total_lo double, "
                "est_total_hi double"
            )
        return spark.createDataFrame([], schema)

    sample = df.where(keep_predicate(F.col(key_col), fraction, seed))
    # violation indicator == validate()'s semantics: a NULL predicate
    # (null-tolerant pass) is NOT a violation
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.coalesce(  # sum over an empty sample is NULL, report 0 seen
            F.sum((~F.coalesce(rc.predicate, F.lit(True))).cast("bigint")),
            F.lit(0).cast("bigint"),
        ).alias(f"_v{i}")
        for i, rc in enumerate(rcs)
    ]
    one = sample.agg(*aggs)

    def _q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    stack_args = ", ".join(
        f"{_q(rc.constraint_id)}, _v{i}" for i, rc in enumerate(rcs)
    )
    long = one.select(
        F.expr(
            f"stack({len(rcs)}, {stack_args}) "
            "as (constraint_id, n_violations)"
        ),
        F.col("_n").alias("n_sampled"),
    )

    n = F.col("n_sampled").cast("double")
    v = F.col("n_violations").cast("double")
    z2 = z * z
    phat = v / n
    denom = F.lit(1.0) + F.lit(z2) / n
    center = phat + F.lit(z2) / (F.lit(2.0) * n)
    rad = F.sqrt((phat * (F.lit(1.0) - phat) + F.lit(z2) / (F.lit(4.0) * n)) / n)
    nonempty = F.col("n_sampled") > 0
    out = long.select(
        "constraint_id",
        "n_sampled",
        "n_violations",
        F.when(nonempty, phat).alias("est_rate"),
        F.when(
            nonempty, F.greatest(F.lit(0.0), (center - F.lit(z) * rad) / denom)
        ).alias("ci_lo"),
        F.when(
            nonempty, F.least(F.lit(1.0), (center + F.lit(z) * rad) / denom)
        ).alias("ci_hi"),
    )
    if total_rows is not None:
        t = F.lit(float(total_rows))
        out = out.select(
            "*",
            (F.col("est_rate") * t).alias("est_total_violations"),
            (F.col("ci_lo") * t).alias("est_total_lo"),
            (F.col("ci_hi") * t).alias("est_total_hi"),
        )
    return out


def skipped_table_constraints(compiled: CompiledSet) -> List[str]:
    """Names a report should list as NOT covered by the estimate."""
    return [t.name for t in compiled.table_constraints]
