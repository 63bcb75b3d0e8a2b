"""End-to-end validation runner: the orchestration that ties the engine
together — row-level validation, table-level checks, per-partition
verdicts + stats, drift tests, violation-row output, checkpoint
manifest. This is the distributed analogue of the reference's
``validate`` driver (Medea.purs:146-153) lifted to a whole table.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.compiler import CompiledSet, Registry
from ..plans.constraints import Drift, StatsBound
from . import validator as V
from .checkpoint import CheckpointedRun
from .drift import ReferenceProfile, drift_verdicts
from .stats import column_stats, stats_bound_verdicts


@dataclass
class ValidationReport:
    verdicts: DataFrame
    violations: DataFrame
    stats: Optional[DataFrame] = None
    stats_verdicts: Optional[DataFrame] = None
    drift: List[Dict] = field(default_factory=list)


def run_validation(
    df: DataFrame,
    registry: Registry,
    id_column: str = "doc_id",
    partition_col: str = "source",
    stats_columns: Optional[List[str]] = None,
    profile: Optional[ReferenceProfile] = None,
    root: str = "$start",
) -> ValidationReport:
    """One logical pass over the table: the row-level projection feeds
    both the violation explode and the partition rollup; table-level
    checks add their (small) joins/aggs; drift tests run over bucket
    sketches."""
    compiled = registry.compile(df.schema, root=root)
    validated = V.validate(df, compiled)
    report = ValidationReport(
        verdicts=V.partition_verdicts(validated, partition_col),
        violations=V.all_violations(df, compiled, id_column=id_column),
    )
    if stats_columns:
        report.stats = column_stats(df, stats_columns, partition_col)
    bounds = [c for c in compiled.table_constraints if isinstance(c, StatsBound)]
    if bounds:
        report.stats_verdicts = stats_bound_verdicts(df, bounds, partition_col)
    drifts = [c for c in compiled.table_constraints if isinstance(c, Drift)]
    if drifts and profile is not None:
        report.drift = drift_verdicts(
            df,
            profile,
            [{"name": c.column, "test": c.test} for c in drifts],
            alpha=drifts[0].alpha,
        )
    return report


def run_checkpointed_validation(
    spark: SparkSession,
    table_path: str,
    registry: Registry,
    checkpoint_dir: str,
    id_column: str = "doc_id",
    partition_col: str = "source",
    root: str = "$start",
    metrics_only: bool = False,
    uniqueness_sketch_col: Optional[str] = None,
) -> Dict[str, Dict]:
    """Partition-at-a-time validation with resume: violations are
    written per partition (immutable once done), metrics land in the
    manifest. Re-running after a failure or data/rule change processes
    only what's needed.

    ``metrics_only=True`` skips the violation-row sink and counts
    table-level violations with the aggregate-only fast paths
    (validator.unique_violation_count / referential_violation_count —
    no join-back, no anti-join): the mode for routine 10^12-row health
    runs, ~2x cheaper on the table-check phase. The sink mode is
    recorded PER MANIFEST ENTRY (ADVICE r4): re-running WITHOUT the
    flag reprocesses partitions that completed metrics-only (their
    violation rows were never written) and materializes the rows, while
    partitions that already completed in row mode stay skipped in
    either mode ("rows" is a superset of "metrics").

    ``uniqueness_sketch_col`` names a key column (e.g. ``doc_id``) whose
    per-partition HLL sketch is persisted next to the manifest when the
    partition completes (operators/hll.py) — afterwards
    ``hll.store_uniqueness(spark, checkpoint_dir)`` answers GLOBAL
    (cross-partition, cross-resume) uniqueness from the stored sketches
    alone, no rescan of completed data. Written in both sink modes
    (a sketch is a metrics artifact); overwrite-idempotent on
    reprocess."""
    from ..plans.compiler import fingerprint_set
    from ..plans.constraints import FunctionalDependency, ReferentialIn, Unique
    from . import hll as H

    fp = fingerprint_set(registry, root)
    ck = CheckpointedRun(
        spark, table_path, checkpoint_dir, fingerprint=fp,
        partition_col=partition_col,
    )

    def process(pdf: DataFrame, out_dir: str) -> Dict:
        compiled = registry.compile(pdf.schema, root=root)
        validated = V.validate(pdf, compiled)
        n_table = 0
        if metrics_only:
            for c in compiled.table_constraints:
                if isinstance(c, Unique):
                    n_table += V.unique_violation_count(pdf, c)
                elif isinstance(c, ReferentialIn):
                    n_table += V.referential_violation_count(pdf, c)
                elif isinstance(c, FunctionalDependency):
                    n_table += V.fd_violation_count(pdf, c)
        else:
            viol = V.all_violations(pdf, compiled, id_column=id_column)
            viol.write.mode("overwrite").parquet(
                os.path.join(out_dir, "violations")
            )
        if uniqueness_sketch_col:
            part = os.path.basename(out_dir).split("=", 1)[1]
            H.write_partition_sketch(
                pdf, uniqueness_sketch_col, checkpoint_dir, part
            )
        agg = validated.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((~F.col(V.PASSED_COL)).cast("bigint")).alias("n_failed"),
        ).collect()[0]
        out = {"n_rows": agg["n_rows"], "n_failed": agg["n_failed"]}
        if metrics_only:
            out["n_table_violations"] = n_table
        return out

    return ck.run(process, sink="metrics" if metrics_only else "rows")
