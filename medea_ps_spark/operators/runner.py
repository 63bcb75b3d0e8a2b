"""End-to-end validation runner: the orchestration that ties the engine
together — row-level validation, table-level checks, per-partition
verdicts + stats, drift tests, violation-row output, checkpoint
manifest. This is the distributed analogue of the reference's
``validate`` driver (Medea.purs:146-153) lifted to a whole table.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.compiler import CompiledSet, Registry
from ..plans.constraints import Drift, StatsBound
from . import pruning as PR
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
    violation_limit: Optional[int] = None,
    uniqueness_sketch_col: Optional[str] = None,
    profile_specs: Optional[Dict[str, Dict]] = None,
    clean_output: Optional[str] = None,
    store_witnesses: bool = True,
    witness_distinct_columns: Optional[Sequence[str]] = None,
    backfill_witnesses: bool = False,
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

    ``violation_limit=N`` (exclusive with ``metrics_only``) selects the
    "sampled" sink: per partition, at most N deterministic exemplar
    rows PER CONSTRAINT land in ``violations_sample`` parquet
    (validator.sample_violation_rows — md5-keyed, layout-independent)
    together with exact per-constraint totals, which also land in the
    manifest metrics as ``violation_counts``. This bounds the sink to
    O(constraints x N) per partition even when a broken rule flags
    every row — the full row sink on 10^12 bad rows would be
    write-bound — while keeping counts exact for monitoring
    (operators/anomaly.metrics_from_manifest). Resume coverage:
    "rows" > "sampled" > "metrics" (checkpoint._SINK_RANK) — a sampled
    rerun skips row-mode partitions, a row-mode rerun reprocesses
    sampled ones.

    ``clean_output`` writes each partition's PASSING rows (verdict
    columns stripped) to ``<clean_output>/<partition_col>=<p>/`` — the
    quarantine flow: violations go to the sink, survivors become the
    validated training table, both partition-at-a-time and immutable
    once the partition completes. Works under every sink mode (the row
    predicate is the same); like the stores, missing clean partitions
    are BACKFILLED on a resume that adds the flag.

    ``uniqueness_sketch_col`` names a key column (e.g. ``doc_id``) whose
    per-partition HLL sketch is persisted next to the manifest when the
    partition completes (operators/hll.py) — afterwards
    ``hll.store_uniqueness(spark, checkpoint_dir)`` answers GLOBAL
    (cross-partition, cross-resume) uniqueness from the stored sketches
    alone, no rescan of completed data. Written in both sink modes
    (a sketch is a metrics artifact); overwrite-idempotent on
    reprocess.

    ``profile_specs`` (same spec shape as drift.build_profile) persists
    each completed partition's distribution profile — histogram counts,
    t-digest, column stats — the same way (operators/profilestore.py):
    global quantiles/histograms and corpus-vs-new-partition drift then
    come from the store with no rescan.

    ``store_witnesses`` (default ON) records each completed partition's
    generic witness stats (operators/pruning.py — null counts, scalar
    min/max, array size/element min/max, SizeEquals indicators) in its
    manifest entry. Collection is free: the witness aggregates ride the
    SAME n_rows/n_failed aggregation pass, adding zero scans and zero
    shuffles. They pay off at evolve time: an added constraint the
    stored witnesses prove violation-free upgrades the partition with
    NO data scan at all (constraint-level data skipping).
    ``witness_distinct_columns`` opts named low-cardinality string
    columns into capped exact distinct lists (decides IsIn proofs);
    collect_set state grows with cardinality, so never name an
    id-like column here.

    ``backfill_witnesses=True`` additionally collects witnesses for
    already-completed partitions that predate witness storage — one
    full (pruned) scan per such partition, so it is an EXPLICIT opt-in:
    the default keeps "resume of a completed checkpoint" a metadata-only
    no-op even on pre-witness manifests (witness collection is only free
    on partitions being processed anyway). Without the backfill, a later
    evolve simply can't prove constraints on those partitions and falls
    back to the scan path — correct, just less skippable."""
    from ..plans.compiler import fingerprint_set
    from ..plans.evolution import constraint_fingerprints
    from . import hll as H

    if metrics_only and violation_limit is not None:
        raise ValueError(
            "metrics_only and violation_limit are exclusive sink modes"
        )
    if violation_limit is not None and violation_limit < 1:
        raise ValueError(f"violation_limit must be >= 1, got {violation_limit}")
    fp = fingerprint_set(registry, root)
    ck = CheckpointedRun(
        spark, table_path, checkpoint_dir, fingerprint=fp,
        partition_col=partition_col,
    )
    # per-constraint hashes ride along so a later rule edit can evolve
    # (plans/evolution.py) instead of invalidating everything
    ck.manifest.constraint_fps = constraint_fingerprints(registry, root)

    def process(pdf: DataFrame, out_dir: str) -> Dict:
        compiled = registry.compile(pdf.schema, root=root)
        validated = V.validate(pdf, compiled)
        table_counts: Dict[str, int] = {}
        violation_counts: Optional[Dict[str, int]] = None
        if metrics_only:
            table_counts = _table_violation_counts(
                pdf, compiled.table_constraints
            )
            # this (re)process superseded whatever row/sample parquet an
            # earlier fingerprint/snapshot left here
            _rm_dir(os.path.join(out_dir, "violations"))
            _rm_dir(os.path.join(out_dir, "violations_sample"))
        elif violation_limit is not None:
            samp = V.sampled_violations(
                pdf, compiled, id_column=id_column, limit=violation_limit
            )
            sdir = os.path.join(out_dir, "violations_sample")
            samp.write.mode("overwrite").parquet(sdir)
            # exact counts come back from the (bounded: <= limit x
            # constraints rows) sample itself — no second data scan
            violation_counts = _counts_from_sample(spark, sdir)
            # a mode switch must not leave the OTHER sink's stale
            # parquet (possibly from a superseded rule set) beside the
            # fresh one — consumers glob out/*/violations*
            _rm_dir(os.path.join(out_dir, "violations"))
        else:
            viol = V.all_violations(pdf, compiled, id_column=id_column)
            viol.write.mode("overwrite").parquet(
                os.path.join(out_dir, "violations")
            )
            _rm_dir(os.path.join(out_dir, "violations_sample"))
        if clean_output:
            pdir = os.path.basename(out_dir)
            V.strip_verdicts(validated.where(F.col(V.PASSED_COL))).write.mode(
                "overwrite"
            ).parquet(os.path.join(clean_output, pdir))
        if uniqueness_sketch_col:
            part = os.path.basename(out_dir).split("=", 1)[1]
            H.write_partition_sketch(
                pdf, uniqueness_sketch_col, checkpoint_dir, part
            )
        if profile_specs:
            from . import profilestore as P

            part = os.path.basename(out_dir).split("=", 1)[1]
            P.write_partition_profile(pdf, profile_specs, checkpoint_dir, part)
        aggs = [
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((~F.col(V.PASSED_COL)).cast("bigint")).alias("n_failed"),
        ]
        wpairs = []
        if store_witnesses:
            # witness aggregates ride the SAME pass — no extra scan
            wpairs = PR.witness_aggs(
                pdf.schema,
                distinct_columns=witness_distinct_columns or (),
            )
            aggs += [col.alias(f"_w{i}") for i, (_k, col) in enumerate(wpairs)]
        agg = validated.agg(*aggs).collect()[0]
        out = {"n_rows": agg["n_rows"], "n_failed": agg["n_failed"]}
        if store_witnesses:
            out["witnesses"] = PR.witnesses_from_row(wpairs, agg)
        if metrics_only:
            out["n_table_violations"] = sum(table_counts.values())
            out["table_violations"] = table_counts
        elif violation_limit is not None:
            out["violation_counts"] = violation_counts
            out["n_table_violations"] = sum(
                n
                for c, n in violation_counts.items()
                if c in {t.name for t in compiled.table_constraints}
            )
            out["violation_limit"] = violation_limit
        return out

    sink = "rows"
    if metrics_only:
        sink = "metrics"
    elif violation_limit is not None:
        sink = "sampled"
    results = ck.run(process, sink=sink, min_violation_limit=violation_limit)
    if uniqueness_sketch_col or profile_specs or clean_output or backfill_witnesses:
        # the explicitly-requested store/clean flags must not be silent
        # no-ops on an already-completed checkpoint: partitions that
        # resume SKIPPED (so process() never ran) but are missing the
        # requested artifact get it backfilled here — one pruned scan
        # per missing artifact only, never a rescan of partitions that
        # have it. Witnesses are NOT in this set by default: they ride
        # free on processing but cost a full scan to backfill, so a
        # plain resume of a pre-witness checkpoint stays metadata-only
        # unless backfill_witnesses is passed.
        _backfill_artifacts(
            spark, ck, uniqueness_sketch_col, profile_specs, clean_output,
            registry, root, partition_col,
            store_witnesses=backfill_witnesses,
            witness_distinct_columns=witness_distinct_columns,
        )
    return results


def _backfill_artifacts(
    spark, ck, uniqueness_sketch_col, profile_specs, clean_output,
    registry, root, partition_col,
    store_witnesses: bool = False,
    witness_distinct_columns: Optional[Sequence[str]] = None,
) -> None:
    from . import hll as H

    manifest_dirty = False
    for p, e in sorted(ck.manifest.entries.items()):
        if e.status != "done" or e.fingerprint != ck.manifest.fingerprint:
            continue
        pdir = f"{partition_col}={p}"
        need_sketch = uniqueness_sketch_col and not os.path.isdir(
            os.path.join(ck.checkpoint_dir, H.SKETCH_DIR, p)
        )
        need_profile = False
        if profile_specs:
            from . import profilestore as P

            need_profile = not os.path.isdir(
                os.path.join(ck.checkpoint_dir, P.PROFILE_DIR, p)
            )
        need_clean = clean_output and not os.path.isdir(
            os.path.join(clean_output, pdir)
        )
        need_witness = store_witnesses and "witnesses" not in e.metrics
        if not (need_sketch or need_profile or need_clean or need_witness):
            continue
        df = spark.read.parquet(
            os.path.join(ck.table_path, pdir)
        ).withColumn(partition_col, F.lit(p))
        if need_sketch:
            H.write_partition_sketch(
                df, uniqueness_sketch_col, ck.checkpoint_dir, p
            )
        if need_profile:
            from . import profilestore as P

            P.write_partition_profile(df, profile_specs, ck.checkpoint_dir, p)
        if need_clean:
            compiled = registry.compile(df.schema, root=root)
            validated = V.validate(df, compiled)
            V.strip_verdicts(validated.where(F.col(V.PASSED_COL))).write.mode(
                "overwrite"
            ).parquet(os.path.join(clean_output, pdir))
        if need_witness:
            e.metrics["witnesses"] = PR.collect_witnesses(
                df, distinct_columns=witness_distinct_columns or ()
            )
            manifest_dirty = True
    if manifest_dirty:
        ck._save()


def _rm_dir(path: str) -> None:
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path)


def _counts_from_sample(spark: SparkSession, sample_dir: str) -> Dict[str, int]:
    """Per-constraint exact totals carried by a ``violations_sample``
    parquet (every exemplar row repeats its constraint's ``n_total``).
    The read is bounded by limit x constraints rows. Constraints with
    zero violations are (correctly) absent."""
    rows = (
        spark.read.parquet(sample_dir)
        .groupBy("constraint_id")
        .agg(F.max("n_total").alias("n"))
        .collect()
    )
    return {r["constraint_id"]: int(r["n"]) for r in rows}


def _table_violation_counts(df: DataFrame, table_constraints) -> Dict[str, int]:
    """Aggregate-only per-constraint table-violation counts — the
    metrics-mode fast paths, keyed by constraint name so evolution can
    drop/recompute individual entries."""
    from ..plans.constraints import FunctionalDependency, ReferentialIn, Unique

    out: Dict[str, int] = {}
    for c in table_constraints:
        if isinstance(c, Unique):
            out[c.name] = V.unique_violation_count(df, c)
        elif isinstance(c, ReferentialIn):
            out[c.name] = V.referential_violation_count(df, c)
        elif isinstance(c, FunctionalDependency):
            out[c.name] = V.fd_violation_count(df, c)
    return out


def evolve_checkpointed_validation(
    spark: SparkSession,
    table_path: str,
    registry: Registry,
    checkpoint_dir: str,
    id_column: str = "doc_id",
    partition_col: str = "source",
    root: str = "$start",
    metrics_only: bool = False,
    violation_limit: Optional[int] = None,
    store_witnesses: bool = True,
    witness_distinct_columns: Optional[Sequence[str]] = None,
    backfill_witnesses: bool = False,
) -> Dict:
    """Apply an EDITED constraint set to an existing checkpointed run by
    re-doing only the delta's work (plans/evolution.py) instead of the
    blanket fingerprint invalidation:

    * removed/changed constraints: their violation rows are dropped from
      each completed partition's parquet by constraint_id — no
      recompute;
    * added/changed constraints: per completed partition, each is first
      tested against the entry's stored witness stats
      (operators/pruning.py): a constraint the witnesses PROVE
      violation-free is skipped outright — when the whole delta is
      proven additions, the upgrade touches no data at all (manifest
      edit only; reported under ``"proven"``). Unproven constraints
      re-run ALONE (one subset compile), their rows merged into the
      sink — the unchanged K-1 table checks (each a shuffle at 10^12
      rows) never re-execute;
    * per-row verdict metrics (n_rows/n_failed): recomputed with one
      shuffle-free scan only when a ROW-level constraint is touched
      AND the touch isn't a fully-proven addition (a proven-added
      constraint flags no row, so the stored verdict counts are
      already exact), reused otherwise;
    * metrics-only entries adjust their per-constraint count map the
      same way;
    * sampled entries merge their exemplar parquet like row entries
      (touched constraints' exemplars drop, delta constraints re-sample
      ALONE at the entry's own recorded ``violation_limit``) and
      rebuild ``violation_counts`` from the merged, bounded sample.

    Partitions whose snapshot changed, whose entry predates
    per-constraint fingerprints, or whose sink artifacts are torn fall
    back to full reprocessing via :func:`run_checkpointed_validation`
    (which also handles the remainder + first runs). Returns
    ``{"delta": ..., "upgraded": {part: metrics},
    "reprocessed": {part: metrics}}``. Crash-safe: the violation-merge
    filter includes ADDED names, so replaying an interrupted upgrade is
    idempotent, and entries flip to the new fingerprint one atomic
    manifest write at a time."""
    import time

    from ..plans import evolution as EV
    from ..plans.compiler import fingerprint_set
    from .checkpoint import (
        MANIFEST_NAME, Manifest, _SINK_RANK, _atomic_write, snapshot_id_for,
    )

    new_fp = fingerprint_set(registry, root)
    new_fps = EV.constraint_fingerprints(registry, root)
    manifest_path = os.path.join(checkpoint_dir, MANIFEST_NAME)
    upgraded: Dict[str, Dict] = {}
    proven: Dict[str, List[str]] = {}
    delta_out: Optional[Dict] = None

    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            man = Manifest.from_json(fh.read())
        if man.fingerprint != new_fp and man.constraint_fps:
            # compile the NEW set against the table schema up front
            # (footer-only read — no data scan): a fully-proven delta
            # otherwise never compiles, so an invalid edit (TypeIs on a
            # wrong-typed or missing column, lo > hi, ...) would be
            # silently "proven" instead of raising the same
            # ColumnTypeMismatch/UnknownColumn a from-scratch run does
            done_parts = sorted(
                p for p, e in man.entries.items() if e.status == "done"
            )
            if done_parts:
                p0 = done_parts[0]
                registry.compile(
                    spark.read.parquet(
                        os.path.join(table_path, f"{partition_col}={p0}")
                    )
                    .withColumn(partition_col, F.lit(p0))
                    .schema,
                    root=root,
                )
            delta = EV.constraint_delta(man.constraint_fps, new_fps)
            delta_out = delta.to_dict()
            touched_table = [
                n for n in delta.touched
                if (man.constraint_fps.get(n) or new_fps[n])["level"] == "table"
            ]
            touched_row = [
                n for n in delta.touched
                if (man.constraint_fps.get(n) or new_fps[n])["level"] == "row"
            ]
            rerun_row = [
                n for n in delta.rerun if new_fps[n]["level"] == "row"
            ]
            added = set(delta.added)
            # witnesses differ per partition, so the subset registry is
            # built per distinct unproven-name set (cached — partitions
            # usually agree)
            sub_cache: Dict[frozenset, Optional[Registry]] = {}
            # an in-place upgrade is only worth doing for entries whose
            # sink COVERS this call's requested mode — anything below it
            # (e.g. sampled entries under a rows-mode evolve, or a
            # larger requested violation_limit) gets fully reprocessed
            # by the pass below anyway, so upgrading first would be
            # discarded work
            if metrics_only:
                want = _SINK_RANK["metrics"]
            elif violation_limit is not None:
                want = _SINK_RANK["sampled"]
            else:
                want = _SINK_RANK["rows"]
            for p, e in sorted(man.entries.items()):
                pdir = f"{partition_col}={p}"
                if (
                    e.status != "done"
                    or e.fingerprint != man.fingerprint
                    or e.snapshot_id != snapshot_id_for(table_path, pdir)
                    or _SINK_RANK.get(e.sink, -1) < want
                    or (
                        violation_limit is not None
                        and e.sink == "sampled"
                        and int(e.metrics.get("violation_limit") or 0)
                        < violation_limit
                    )
                ):
                    continue  # full reprocess below
                # constraint-level data skipping: delta constraints the
                # stored witnesses prove violation-free don't re-run
                proofs = PR.prove_constraints(
                    registry, root, rerun_row, e.metrics.get("witnesses")
                )
                p_proven = sorted(n for n, ok in proofs.items() if ok)
                unproven = [n for n in delta.rerun if n not in set(p_proven)]
                key = frozenset(unproven)
                if key not in sub_cache:
                    sub_cache[key] = (
                        EV.subset_registry(registry, root, unproven)
                        if unproven
                        else None
                    )
                sub = sub_cache[key]
                sub_has_table = any(
                    new_fps[n]["level"] == "table" for n in unproven
                )
                # the sink only changes if rows may drop (removed /
                # changed) or new checks actually run; the verdict
                # counts only change if a touched row constraint is
                # anything other than a proven addition
                rewrite_sink = bool(
                    delta.removed or delta.changed or unproven
                )
                recompute_verdicts = any(
                    not (n in added and n in set(p_proven))
                    for n in touched_row
                )
                if _upgrade_partition(
                    spark, table_path, checkpoint_dir, p, e, delta, sub,
                    touched_table, registry, root, id_column, partition_col,
                    rewrite_sink=rewrite_sink,
                    recompute_verdicts=recompute_verdicts,
                    sub_has_table=sub_has_table,
                ):
                    e.fingerprint = new_fp
                    e.finished_at = time.time()
                    upgraded[p] = e.metrics
                    if p_proven:
                        proven[p] = p_proven
                    _atomic_write(manifest_path, man.to_json())
            man.fingerprint = new_fp
            man.constraint_fps = new_fps
            _atomic_write(manifest_path, man.to_json())

    reprocessed = run_checkpointed_validation(
        spark, table_path, registry, checkpoint_dir,
        id_column=id_column, partition_col=partition_col, root=root,
        metrics_only=metrics_only, violation_limit=violation_limit,
        store_witnesses=store_witnesses,
        witness_distinct_columns=witness_distinct_columns,
        backfill_witnesses=backfill_witnesses,
    )
    return {
        "delta": delta_out,
        "upgraded": upgraded,
        "proven": proven,
        "reprocessed": reprocessed,
    }


def _upgrade_partition(
    spark, table_path, checkpoint_dir, p, entry, delta, sub,
    touched_table, registry, root, id_column, partition_col,
    rewrite_sink: bool = True,
    recompute_verdicts: Optional[bool] = None,
    sub_has_table: bool = True,
) -> bool:
    """One completed partition, delta-only. Returns False when the
    entry's artifacts can't support an in-place upgrade (torn sink dir,
    pre-evolution metrics without a per-constraint map) — the caller
    then leaves it pending for full reprocessing.

    ``rewrite_sink=False`` / ``recompute_verdicts=False`` are the
    witness-proof fast paths (the caller established that the delta
    can't change the sink or the verdict counts): the partition's DATA
    is then never read — the lazy ``df()`` below only materializes on
    a path that actually needs it, so a fully-proven delta costs zero
    Spark jobs here."""
    import shutil

    pdir = f"{partition_col}={p}"
    _df_box: List[DataFrame] = []

    def df() -> DataFrame:
        if not _df_box:
            _df_box.append(
                spark.read.parquet(os.path.join(table_path, pdir)).withColumn(
                    partition_col, F.lit(p)
                )
            )
        return _df_box[0]

    if recompute_verdicts is None:
        recompute_verdicts = delta.touches_row_level
    if entry.sink == "rows":
        viol_dir = os.path.join(checkpoint_dir, "out", pdir, "violations")
        if not os.path.isdir(viol_dir):
            return False
        if rewrite_sink:
            keep = spark.read.parquet(viol_dir).where(
                ~F.col("constraint_id").isin(delta.touched)
            )
            if sub is not None:
                sub_compiled = sub.compile(df().schema, root=root)
                merged = keep.unionByName(
                    V.all_violations(df(), sub_compiled, id_column=id_column)
                )
            else:
                merged = keep
            tmp = viol_dir + "_new"
            merged.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(viol_dir)
            os.replace(tmp, viol_dir)
    elif entry.sink == "sampled":
        sdir = os.path.join(checkpoint_dir, "out", pdir, "violations_sample")
        limit = entry.metrics.get("violation_limit")
        if not os.path.isdir(sdir) or not limit:
            return False  # torn sink / pre-limit metrics: full reprocess
        if rewrite_sink:
            keep = spark.read.parquet(sdir).where(
                ~F.col("constraint_id").isin(delta.touched)
            )
            if sub is not None:
                sub_compiled = sub.compile(df().schema, root=root)
                merged = keep.unionByName(
                    V.sampled_violations(
                        df(), sub_compiled, id_column=id_column,
                        limit=int(limit),
                    )
                )
            else:
                merged = keep
            tmp = sdir + "_new"
            merged.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(sdir)
            os.replace(tmp, sdir)
            counts = _counts_from_sample(spark, sdir)
            entry.metrics["violation_counts"] = counts
            table_names = {
                t.name
                for t in registry.compile(
                    df().schema, root=root
                ).table_constraints
            }
            entry.metrics["n_table_violations"] = sum(
                n for c, n in counts.items() if c in table_names
            )
    else:  # metrics-only entry
        counts = entry.metrics.get("table_violations")
        if counts is None:
            if touched_table:
                return False  # pre-evolution manifest: can't adjust counts
            # row-only delta: table metrics are untouched by definition
        else:
            counts = dict(counts)
            for n in delta.touched:
                counts.pop(n, None)
            if sub is not None and sub_has_table:
                sub_compiled = sub.compile(df().schema, root=root)
                counts.update(
                    _table_violation_counts(df(), sub_compiled.table_constraints)
                )
            entry.metrics["table_violations"] = counts
            entry.metrics["n_table_violations"] = sum(counts.values())
    if recompute_verdicts:
        compiled = registry.compile(df().schema, root=root)
        agg = (
            V.validate(df(), compiled)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum((~F.col(V.PASSED_COL)).cast("bigint")).alias("n_failed"),
            )
            .collect()[0]
        )
        entry.metrics["n_rows"] = agg["n_rows"]
        entry.metrics["n_failed"] = agg["n_failed"]
    return True
