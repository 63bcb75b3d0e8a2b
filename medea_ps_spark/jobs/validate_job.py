"""spark-submit entry point (north_star: "launched via spark-submit
--py-files"):

    spark-submit --py-files medea_ps_spark.zip \
        medea_ps_spark/jobs/validate_job.py \
        --input /path/to/sequences --checkpoint /path/to/ck \
        [--partition-col source] [--vocab 50257] [--max-len 8192]

Runs the BASELINE constraint set over the input table with
checkpoint/resume and prints a JSON metrics summary. ``--history DIR``
additionally records the run's totals in a metrics history and reports
run-over-run anomaly verdicts (operators/anomaly.py).
"""

from __future__ import annotations

import argparse
import json


def build_registry(vocab: int, max_len: int, allowed_sources):
    from medea_ps_spark.plans.compiler import Registry
    from medea_ps_spark.plans.constraints import (
        ArrayLenBetween, ConstraintSet, ElementsInRange, InRange, NotNull,
        ReferentialIn, SizeEquals, Unique,
    )

    reg = Registry()
    reg.register(
        ConstraintSet(
            "$start",
            [
                NotNull("doc_id_not_null", "doc_id"),
                SizeEquals("n_tok_matches", "n_tok", "tokens"),
                InRange("n_tok_bounds", "n_tok", 1, max_len),
                ElementsInRange("tokens_in_vocab", "tokens", 0, vocab),
                ArrayLenBetween("tokens_not_empty", "tokens", 1, None),
                ReferentialIn("source_known", "source", dim_values=allowed_sources),
                Unique("doc_id_unique", "doc_id"),
            ],
        )
    )
    return reg


def parse_profile_specs(items):
    """``--profile`` values → drift.build_profile spec dict.
    ``name=column:lo:hi[:nbuckets]`` (numeric) or
    ``name=@tokens_col:vocab[:nbuckets]`` (token-value histogram)."""
    specs = {}
    for it in items or []:
        name, sep, rest = it.partition("=")
        if not sep or not name or not rest:
            raise ValueError(f"--profile needs name=spec, got {it!r}")
        if rest.startswith("@"):
            parts = rest[1:].split(":")
            if len(parts) not in (2, 3):
                raise ValueError(
                    f"--profile token spec is @col:vocab[:nbuckets], got {it!r}"
                )
            spec = {"token_array": parts[0], "lo": 0, "hi": int(parts[1])}
            if len(parts) == 3:
                spec["nbuckets"] = int(parts[2])
        else:
            parts = rest.split(":")
            if len(parts) not in (3, 4):
                raise ValueError(
                    f"--profile numeric spec is col:lo:hi[:nbuckets], got {it!r}"
                )
            spec = {
                "column": parts[0],
                "lo": float(parts[1]),
                "hi": float(parts[2]),
            }
            if len(parts) == 4:
                spec["nbuckets"] = int(parts[3])
        specs[name] = spec
    return specs or None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--partition-col", default="source")
    ap.add_argument("--vocab", type=int, default=50257)
    ap.add_argument("--max-len", type=int, default=8192)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument(
        "--metrics-only", action="store_true",
        help="skip the violation-row sink; count table-level "
             "violations with the aggregate-only fast paths",
    )
    ap.add_argument(
        "--violation-limit", type=int, default=None,
        help="sampled sink: write at most N deterministic exemplar "
             "violation rows per constraint per partition "
             "(violations_sample parquet) plus exact per-constraint "
             "counts in the manifest — bounds sink size on arbitrarily "
             "bad data; exclusive with --metrics-only",
    )
    ap.add_argument(
        "--evolve", action="store_true",
        help="if the constraint set changed since the checkpoint was "
             "written, upgrade completed partitions in place by "
             "re-running only the added/changed constraints "
             "(plans/evolution.py) instead of reprocessing everything",
    )
    ap.add_argument(
        "--clean-output", default=None, metavar="DIR",
        help="also write each partition's PASSING rows (verdicts "
             "stripped) to DIR/<partition>/ — the quarantine flow: "
             "violations to the sink, survivors become the validated "
             "training table; immutable per completed partition, "
             "backfilled on resume if missing",
    )
    ap.add_argument(
        "--profile", action="append", default=None, metavar="SPEC",
        help="persist each completed partition's distribution profile "
             "next to the manifest (operators/profilestore.py) for "
             "rescan-free global quantiles/drift. Repeatable. SPEC is "
             "name=column:lo:hi[:nbuckets] for a numeric histogram + "
             "t-digest, or name=@tokens_col:vocab[:nbuckets] for a "
             "token-value histogram. Not applied on --evolve upgrades "
             "(completed partitions keep their stored profiles)",
    )
    ap.add_argument(
        "--uniqueness-sketch", default=None, metavar="COLUMN",
        help="persist a per-partition HLL sketch of COLUMN next to the "
             "manifest (operators/hll.py) — global distinct/duplicate "
             "checks after resume/append are then answered from the "
             "sketch store with no rescan of completed partitions",
    )
    ap.add_argument(
        "--estimate", type=float, default=None, metavar="FRACTION",
        help="approximate mode: instead of the full checkpointed run, "
             "estimate each ROW constraint's violation rate from a "
             "deterministic FRACTION hash sample (operators/estimate.py) "
             "and print per-constraint Wilson 95%% intervals — the "
             "'how broken is this table' answer in one sampled scan "
             "before committing to the 10^12-row job. Table-level "
             "constraints are listed as skipped (sample-biased). "
             "No checkpoint is read or written",
    )
    ap.add_argument(
        "--estimate-seed", type=int, default=42,
        help="hash-sample seed for --estimate (same seed = same rows, "
             "any cluster size or layout)",
    )
    ap.add_argument(
        "--no-witness-stats", action="store_true",
        help="skip recording per-partition witness stats (pruning.py) "
             "in the manifest. They default ON because collection rides "
             "the existing metrics aggregate (zero extra scans) and a "
             "later --evolve uses them to PROVE added constraints "
             "violation-free per partition, skipping those rescans",
    )
    ap.add_argument(
        "--backfill-witnesses", action="store_true",
        help="also collect witness stats for completed partitions that "
             "predate witness storage — ONE FULL SCAN per such "
             "partition, so it is opt-in: without it, a plain resume of "
             "a pre-witness checkpoint stays metadata-only and --evolve "
             "simply can't skip-prove on those partitions (it falls "
             "back to the normal delta scan)",
    )
    ap.add_argument(
        "--witness-distinct", default=None, metavar="COLS",
        help="comma-separated LOW-CARDINALITY string columns whose "
             "capped exact distinct-value lists join the witness stats "
             "(enables IsIn proofs on --evolve). collect_set state "
             "grows with cardinality — never name an id-like column",
    )
    ap.add_argument(
        "--history", default=None,
        help="metrics-history directory (operators/anomaly.py): after "
             "the run, derive this run's totals from the checkpoint "
             "manifest, check them against the recorded history "
             "(RateOfChange + KSigma on fail_rate/n_rows), append them "
             "under --run-id, and include the anomaly verdicts in the "
             "output JSON",
    )
    ap.add_argument(
        "--run-id", default=None,
        help="history key for --history (default: derived from the "
             "checkpoint fingerprint + run count)",
    )
    ap.add_argument(
        "--datasheet", default=None, metavar="PATH",
        help="also write a corpus data-card JSON (size/composition/"
             "duplication/quantiles; operators/datasheet.py) for the "
             "input table to PATH — a few bounded aggregate passes, "
             "text- and token-table aware",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from medea_ps_spark.operators.runner import (
        evolve_checkpointed_validation,
        run_checkpointed_validation,
    )
    from medea_ps_spark.sources.synthetic import ALLOWED_SOURCES

    spark = SparkSession.builder.appName("medea-validate").getOrCreate()
    reg = build_registry(args.vocab, args.max_len, ALLOWED_SOURCES)
    witness_kw = {
        "store_witnesses": not args.no_witness_stats,
        "witness_distinct_columns": (
            args.witness_distinct.split(",") if args.witness_distinct else None
        ),
        "backfill_witnesses": args.backfill_witnesses,
    }
    if args.estimate is not None:
        from pyspark.sql import functions as F

        from medea_ps_spark.operators.estimate import (
            estimated_violation_rates,
            skipped_table_constraints,
        )

        # reading the table ROOT keeps the partition column (directory
        # layout), which the compiled set may reference
        df = spark.read.parquet(args.input)
        compiled = reg.compile(df.schema)
        est = estimated_violation_rates(
            df,
            compiled,
            fraction=args.estimate,
            key_col=args.id_col,
            seed=args.estimate_seed,
            on_table_constraints="ignore",
        )
        rows = {
            r["constraint_id"]: {
                "n_sampled": r["n_sampled"],
                "n_violations": r["n_violations"],
                "est_rate": r["est_rate"],
                "ci_lo": r["ci_lo"],
                "ci_hi": r["ci_hi"],
            }
            for r in est.withColumn(
                "est_rate", F.round("est_rate", 6)
            ).withColumn("ci_lo", F.round("ci_lo", 6)).withColumn(
                "ci_hi", F.round("ci_hi", 6)
            ).collect()
        }
        print(
            json.dumps(
                {
                    "estimate": rows,
                    "fraction": args.estimate,
                    "seed": args.estimate_seed,
                    "skipped_table_constraints": skipped_table_constraints(
                        compiled
                    ),
                },
                sort_keys=True,
            )
        )
        spark.stop()
        return
    if args.evolve:
        out = evolve_checkpointed_validation(
            spark,
            args.input,
            reg,
            args.checkpoint,
            id_column=args.id_col,
            partition_col=args.partition_col,
            metrics_only=args.metrics_only,
            violation_limit=args.violation_limit,
            **witness_kw,
        )
        result = {
            "delta": out["delta"],
            "upgraded": out["upgraded"],
            "proven": out["proven"],
            "partitions": out["reprocessed"],
        }
    else:
        metrics = run_checkpointed_validation(
            spark,
            args.input,
            reg,
            args.checkpoint,
            id_column=args.id_col,
            partition_col=args.partition_col,
            metrics_only=args.metrics_only,
            violation_limit=args.violation_limit,
            uniqueness_sketch_col=args.uniqueness_sketch,
            profile_specs=parse_profile_specs(args.profile),
            clean_output=args.clean_output,
            **witness_kw,
        )
        result = {"partitions": metrics}
    if args.history:
        result["anomalies"] = _monitor(args)
    if args.datasheet:
        from medea_ps_spark.operators.datasheet import (
            corpus_datasheet,
            write_datasheet,
        )

        sheet = corpus_datasheet(
            spark.read.parquet(args.input),
            text_col="text",
            id_col=args.id_col,
            source_col=args.partition_col,
            lang_col="lang",
            tokens_col="tokens",
        )
        write_datasheet(sheet, args.datasheet)
        result["datasheet"] = args.datasheet
    print(json.dumps(result, sort_keys=True))
    spark.stop()


def _monitor(args) -> list:
    """Record this run's manifest totals in the metrics history and
    return the anomaly verdicts vs the runs before it (driver-side pure
    Python over already-reduced scalars)."""
    from medea_ps_spark.operators.anomaly import (
        KSigma,
        RateOfChange,
        check_anomalies,
        load_history,
        metrics_from_manifest,
        record_run_metrics,
    )

    history = load_history(args.history)
    metrics = metrics_from_manifest(args.checkpoint)
    run_id = args.run_id or f"run{len(history):06d}"
    verdicts = check_anomalies(
        history,
        metrics,
        {
            "fail_rate": [RateOfChange(max_increase=1.0), KSigma(k=4.0)],
            "n_rows": RateOfChange(max_increase=2.0, max_decrease=0.5),
        },
    )
    record_run_metrics(args.history, run_id, metrics)
    return verdicts


if __name__ == "__main__":
    main()
