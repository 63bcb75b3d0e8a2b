"""Single-pass DataFrame validation.

The reference validates one JSON document at a time with backtracking
alternation and fail-fast first-error semantics
(/root/reference/src/Data/Medea.purs:146-162). The engine diverges by
design (SURVEY.md §4): one declarative projection over the whole table
computes EVERY constraint per row, collecting all violations into an
array column — Catalyst whole-stage-codegens the lot, and the scan stays
single-pass. Violation rows (doc_id, constraint_id, observed) are the
distributed analogue of the reference's typed ValidationError values
(Medea.purs:108-119).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, functions as F

from ..plans.compiler import CompiledSet
from ..plans.constraints import FunctionalDependency, ReferentialIn, Unique

VIOLATIONS_COL = "violations"
PASSED_COL = "passed"


def _scoped(df: DataFrame, c) -> DataFrame:
    """Apply a table constraint's optional ``where`` row scope: rows not
    matching (or NULL) are exempt from the check entirely. Pure filter —
    Catalyst pushes it into the scan, so a narrow scope PRUNES the
    aggregate/join input rather than post-filtering it."""
    where = getattr(c, "where", None)
    return df.where(F.expr(where)) if where else df


def validate(df: DataFrame, compiled: CompiledSet) -> DataFrame:
    """Append ``violations: array<struct<constraint_id,observed>>`` and
    ``passed: boolean`` in one projection (no shuffle, no extra scan)."""
    entries = [
        F.when(
            ~rc.predicate,
            F.struct(
                F.lit(rc.constraint_id).alias("constraint_id"),
                rc.observed.alias("observed"),
            ),
        )
        for rc in compiled.row_constraints
    ]
    if entries:
        viol = F.array_compact(F.array(*entries))
    else:
        viol = F.expr(
            "CAST(array() AS array<struct<constraint_id:string,observed:string>>)"
        )
    return df.withColumn(VIOLATIONS_COL, viol).withColumn(
        PASSED_COL, F.size(F.col(VIOLATIONS_COL)) == 0
    )


def verdict_only(df: DataFrame, compiled: CompiledSet) -> DataFrame:
    """Cheaper plan when violation detail isn't needed: passed = AND of
    predicates (short-circuiting boolean expr, no struct/array alloc)."""
    pred = F.lit(True)
    for rc in compiled.row_constraints:
        pred = pred & F.coalesce(rc.predicate, F.lit(True))
    return df.withColumn(PASSED_COL, pred)


def strip_verdicts(validated: DataFrame) -> DataFrame:
    """Drop the verdict/violation columns — ≙ toJSONValue stripping
    annotations from the validated tree (Medea.purs:83-95)."""
    return validated.drop(VIOLATIONS_COL, PASSED_COL)


def violation_rows(validated: DataFrame, id_column: str = "doc_id") -> DataFrame:
    """Explode the violations array → (doc_id, constraint_id, observed).
    ≙ F.explode of the reference's error taxonomy (SURVEY.md §1.4)."""
    v = F.explode(F.col(VIOLATIONS_COL)).alias("v")
    return validated.select(F.col(id_column), v).select(
        F.col(id_column),
        F.col("v.constraint_id").alias("constraint_id"),
        F.col("v.observed").alias("observed"),
    )


def unique_violations(
    df: DataFrame, c: Unique, id_column: str = "doc_id"
) -> DataFrame:
    """Exact duplicate detection. groupBy + count over the key column —
    a partial+final hash aggregate (map-side combine, one shuffle of the
    distinct keys only), then the duplicate-key set joins back to tag
    the offending rows. The dup set is USUALLY tiny (~0.1% of keys) but
    unbounded in the worst case — at 10^12 rows even 0.1% is 10^9 keys,
    far past any broadcast threshold — so the join strategy is left to
    AQE, which converts to broadcast at runtime when the measured size
    allows and falls back to a shuffled join when it doesn't."""
    df = _scoped(df, c)
    dups = (
        df.where(F.col(c.column).isNotNull())
        .groupBy(c.column)
        .agg(F.count(F.lit(1)).alias("_dup_count"))
        .where(F.col("_dup_count") > 1)
    )
    return (
        df.join(dups, on=c.column, how="inner")
        .select(
            F.col(id_column),
            F.lit(c.name).alias("constraint_id"),
            F.concat(
                F.col(c.column).cast("string"),
                F.lit(" (count="),
                F.col("_dup_count").cast("string"),
                F.lit(")"),
            ).alias("observed"),
        )
    )


def referential_violations(
    df: DataFrame,
    c: ReferentialIn,
    id_column: str = "doc_id",
    dim: Optional[DataFrame] = None,
) -> DataFrame:
    """Broadcast left-anti join against the allowed-values dimension.
    Broadcast ⇒ no shuffle of the fact side, so source skew (Zipf) is
    irrelevant; the salted path in operators/referential.py covers dims
    too big to broadcast."""
    df = _scoped(df, c)
    spark = df.sparkSession
    dim_col = c.dim_column or c.column
    if dim is None:
        if c.dim_values:
            dim = spark.createDataFrame(
                [(v,) for v in c.dim_values], schema=f"{dim_col} string"
            )
        else:
            dim = spark.read.parquet(c.dim_table)
    anti = df.join(
        F.broadcast(dim.select(F.col(dim_col).alias(c.column)).distinct()),
        on=c.column,
        how="left_anti",
    )
    return anti.select(
        F.col(id_column),
        F.lit(c.name).alias("constraint_id"),
        F.coalesce(F.col(c.column).cast("string"), F.lit("null")).alias("observed"),
    )


def _fd_group_distinct(df: DataFrame, c: FunctionalDependency) -> DataFrame:
    """Per-determinant-group (size, null-safe distinct dependent count):
    distinct non-null dependents + 1 if the group has any NULL — NULL is
    a value under FD semantics, matching groupBy's null grouping. One
    partial+final hash aggregate on the determinant key."""
    dep = F.col(c.dependent)
    return (
        df.groupBy(*c.determinants)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            (
                F.countDistinct(dep)
                + F.max(dep.isNull().cast("int"))
            ).alias("_n_dep"),
        )
    )


def fd_violations(
    df: DataFrame, c: FunctionalDependency, id_column: str = "doc_id"
) -> DataFrame:
    """Every row of every determinant group holding >1 distinct
    dependent value (NULL counted, null-safely). Same scale shape as
    :func:`unique_violations` — one hash agg of the determinant keys,
    then the (usually tiny, worst-case unbounded) bad-group set joins
    back under AQE's runtime strategy choice; the join is null-safe so
    NULL determinant values are grouped exactly as the aggregate
    grouped them."""
    from .joinutil import null_safe_join

    df = _scoped(df, c)
    bad = (
        _fd_group_distinct(df, c)
        .where(F.col("_n_dep") > 1)
        .select(*c.determinants, "_n_dep")
    )
    tagged = null_safe_join(df, bad, list(c.determinants))
    return tagged.select(
        F.col(id_column),
        F.lit(c.name).alias("constraint_id"),
        F.concat(
            F.concat_ws(
                ",",
                *[
                    F.coalesce(F.col(d).cast("string"), F.lit("null"))
                    for d in c.determinants
                ],
            ),
            F.lit(" -> "),
            F.coalesce(F.col(c.dependent).cast("string"), F.lit("null")),
            F.lit(" (distinct="),
            F.col("_n_dep").cast("string"),
            F.lit(")"),
        ).alias("observed"),
    )


def fd_violation_count(df: DataFrame, c: FunctionalDependency) -> int:
    """COUNT of :func:`fd_violations` rows without the join-back — sum
    of group sizes over violating groups, one aggregate pass (the
    metrics-only fast path, same trick as unique_violation_count)."""
    row = (
        _fd_group_distinct(_scoped(df, c), c)
        .where(F.col("_n_dep") > 1)
        .agg(F.coalesce(F.sum("_n"), F.lit(0)).alias("n"))
        .collect()[0]
    )
    return int(row["n"])


def unique_violation_count(df: DataFrame, c: Unique) -> int:
    """COUNT of :func:`unique_violations` rows without the join-back:
    every row whose key appears >1 times == sum of group sizes over
    duplicated keys. One pruned-column scan + one partial+final agg of
    the distinct keys — at metrics-only scale (10^12 rows, violation
    rows sampled/sunk separately) this halves the uniqueness cost."""
    row = (
        _scoped(df, c).where(F.col(c.column).isNotNull())
        .groupBy(c.column)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > 1)
        .agg(F.coalesce(F.sum("_n"), F.lit(0)).alias("n"))
        .collect()[0]
    )
    return int(row["n"])


def referential_violation_count(df: DataFrame, c: ReferentialIn) -> int:
    """COUNT of :func:`referential_violations` rows for a literal-valued
    dimension: the anti-join collapses to a row predicate (NULL or not
    in the allowed set), so the count is ONE aggregate over a
    pruned-column scan — no join, no shuffle. Falls back to the
    anti-join count for table-backed dims."""
    if not c.dim_values:
        return referential_violations(df, c).count()
    bad = ~F.coalesce(F.col(c.column).isin(list(c.dim_values)), F.lit(False))
    row = _scoped(df, c).agg(
        F.coalesce(F.sum(bad.cast("bigint")), F.lit(0)).alias("n")
    ).collect()[0]
    return int(row["n"])


def all_violations(
    df: DataFrame,
    compiled: CompiledSet,
    id_column: str = "doc_id",
) -> DataFrame:
    """Row-level + table-level violations as one DataFrame
    (doc_id, constraint_id, observed)."""
    parts: List[DataFrame] = [
        violation_rows(validate(df, compiled), id_column=id_column)
    ]
    for c in compiled.table_constraints:
        if isinstance(c, Unique):
            parts.append(unique_violations(df, c, id_column=id_column))
        elif isinstance(c, ReferentialIn):
            parts.append(referential_violations(df, c, id_column=id_column))
        elif isinstance(c, FunctionalDependency):
            parts.append(fd_violations(df, c, id_column=id_column))
        # StatsBound / Drift are partition-level → operators/stats.py,
        # operators/drift.py
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_VPID = "_vio_pid"
_VKEY = "_vio_key"
_VLRANK = "_vio_lrank"
_VLCNT = "_vio_lcnt"


def sample_violation_rows(
    viol: DataFrame, id_column: str = "doc_id", limit: int = 1000
) -> DataFrame:
    """Bound a violation stream to ``limit`` deterministic exemplar rows
    per constraint WITHOUT losing the exact totals: output columns are
    ``(id, constraint_id, observed, rank, n_total)`` where ``rank`` is
    1..limit under a content-based md5 order and ``n_total`` is the
    EXACT violation count for that constraint.

    Why it exists: the full violation sink is output-unbounded — one
    broken rule over 10^12 rows emits 10^12 violation rows, and writing
    them costs more than the validation did. Capping per constraint
    keeps the sink O(constraints x limit) no matter how wrong the data
    is, while the counts keep the metrics exact.

    Scale design (one pass, no second scan, bounded state):

    1. Local phase — rank rows within each (constraint_id, input
       partition) cell under the md5 key and count the cell with a
       window over the SAME hash exchange. Only rows with local rank <=
       limit survive; the cell's count rides ONLY its rank-1 survivor.
    2. Global phase — re-rank the <= limit x n_partitions survivors per
       constraint; the exact total is the sum of the <= n_partitions
       cell counts carried by rank-1 rows. (A cell with any violations
       always has a rank-1 survivor, so no count is lost.)

    The order key is md5 over the row content (id, constraint_id,
    observed — NULLs sentineled), so the exemplar set and ranks are
    layout-independent (the same fixed-width-hex trick the sampling and
    LSH operators use, BENCH/BASELINE.md) and reproducible in ANSI SQL
    for the DuckDB oracle. Window-function ORDER nulls need no care:
    the key is never NULL by construction.
    """
    from pyspark.sql import Window

    if limit < 1:
        raise ValueError(f"limit must be >= 1, got {limit}")
    key = F.md5(
        F.concat(
            F.coalesce(F.col(id_column).cast("string"), F.lit("\x00")),
            F.lit("\x1f"),
            F.col("constraint_id"),
            F.lit("\x1f"),
            F.coalesce(F.col("observed"), F.lit("\x00")),
        )
    )
    cell = Window.partitionBy("constraint_id", _VPID)
    per_constraint = Window.partitionBy("constraint_id")
    local = (
        viol.withColumn(_VKEY, key)
        .withColumn(_VPID, F.spark_partition_id())
        .withColumn(_VLRANK, F.row_number().over(cell.orderBy(_VKEY)))
        .withColumn(_VLCNT, F.count(F.lit(1)).over(cell))
        .where(F.col(_VLRANK) <= limit)
    )
    return (
        local.withColumn(
            "n_total",
            F.sum(F.when(F.col(_VLRANK) == 1, F.col(_VLCNT))).over(
                per_constraint
            ),
        )
        .withColumn("rank", F.row_number().over(per_constraint.orderBy(_VKEY)))
        .where(F.col("rank") <= limit)
        .select(
            F.col(id_column),
            F.col("constraint_id"),
            F.col("observed"),
            F.col("rank"),
            F.col("n_total").cast("bigint").alias("n_total"),
        )
    )


def sampled_violations(
    df: DataFrame,
    compiled: CompiledSet,
    id_column: str = "doc_id",
    limit: int = 1000,
) -> DataFrame:
    """:func:`all_violations` bounded by :func:`sample_violation_rows` —
    the sink for routine 10^12-row runs where violation EXEMPLARS (for
    triage) plus exact per-constraint counts (for metrics/anomaly
    detection) are wanted, but a full row sink would be write-bound on
    bad data."""
    return sample_violation_rows(
        all_violations(df, compiled, id_column=id_column),
        id_column=id_column,
        limit=limit,
    )


def partition_verdicts(
    validated: DataFrame,
    partition_col: str = "source",
    max_fail_rate: float = 0.0,
) -> DataFrame:
    """Per-partition pass/fail rollup — single partial+final hash agg.
    ≙ the reference's one-document verdict, lifted to Iceberg-partition
    granularity (SURVEY.md §1.4 last row).

    ``max_fail_rate`` (default 0.0 = the strict reference semantics)
    makes the PARTITION verdict tolerant: the partition passes when
    n_failed/n_rows <= max_fail_rate — the operational contract for
    10^12-row tables where a handful of bad rows should quarantine the
    rows (violation sink), not fail the whole partition. Row-level
    verdicts are unaffected."""
    if not (0.0 <= max_fail_rate < 1.0):
        raise ValueError(
            f"max_fail_rate must be in [0, 1), got {max_fail_rate}"
        )
    n_failed = F.sum((~F.col(PASSED_COL)).cast("bigint"))
    n_rows = F.count(F.lit(1))
    # compare the RATE itself (n_failed/n_rows <= threshold), not
    # n_failed <= threshold*n_rows: the latter breaks the documented
    # contract at the boundary ((f/n)*n can round below f in doubles)
    return validated.groupBy(partition_col).agg(
        n_rows.alias("n_rows"),
        F.sum(F.col(PASSED_COL).cast("bigint")).alias("n_passed"),
        n_failed.alias("n_failed"),
        F.sum(F.size(F.col(VIOLATIONS_COL)).cast("bigint")).alias("n_violations"),
        (
            n_failed.cast("double") / n_rows.cast("double")
            <= F.lit(float(max_fail_rate))
        ).alias("partition_passed"),
    )
