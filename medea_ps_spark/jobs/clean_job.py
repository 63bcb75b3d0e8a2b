"""spark-submit entry point for the corpus-cleaning pipeline:

    spark-submit --py-files medea_ps_spark.zip \
        medea_ps_spark/jobs/clean_job.py \
        --input /path/to/corpus --output /path/to/clean \
        [--text-col text] [--id-col doc_id] \
        [--langs en,fr] [--lang-col lang] \
        [--no-near-dup] [--minhash-threshold 0.7]

Runs exact dedup → near-dup clustering → quality filter → language
filter (operators/pipeline.py), writes the surviving corpus as parquet,
and prints the single-action audit report as one JSON line.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--langs", default=None,
                    help="comma-separated allowed languages")
    ap.add_argument("--lang-col", default=None,
                    help="existing language column (else heuristic lang ID)")
    ap.add_argument("--no-near-dup", action="store_true")
    ap.add_argument("--minhash-threshold", type=float, default=0.7)
    ap.add_argument("--eval-set", default=None,
                    help="parquet path of a benchmark/eval corpus; "
                         "training docs sharing any k-gram are dropped")
    ap.add_argument("--contamination-k", type=int, default=8)
    ap.add_argument("--scrub-pii", action="store_true",
                    help="redact emails/phones/IPs/SSNs in survivors")
    ap.add_argument("--partition-col", default=None,
                    help="partition the output parquet by this column")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from medea_ps_spark.operators.pipeline import clean_corpus

    spark = SparkSession.builder.appName("medea-clean").getOrCreate()
    df = spark.read.parquet(args.input)
    eval_df = spark.read.parquet(args.eval_set) if args.eval_set else None
    clean, rep = clean_corpus(
        df,
        text_col=args.text_col,
        id_col=args.id_col,
        allowed_langs=args.langs.split(",") if args.langs else None,
        near_dup=not args.no_near_dup,
        minhash_threshold=args.minhash_threshold,
        lang_col=args.lang_col,
        eval_df=eval_df,
        contamination_k=args.contamination_k,
        scrub_pii=args.scrub_pii,
    )
    writer = clean.write.mode("overwrite")
    if args.partition_col:
        writer = writer.partitionBy(args.partition_col)
    writer.parquet(args.output)
    print(json.dumps(
        {
            "input_rows": rep.input_rows,
            "after_exact_dedup": rep.after_exact_dedup,
            "after_near_dedup": rep.after_near_dedup,
            "after_decontamination": rep.after_decontamination,
            "after_quality": rep.after_quality,
            "after_language": rep.after_language,
            "pii_redacted_rows": rep.pii_redacted_rows,
            "stages": rep.stages,
            "output": args.output,
        },
        sort_keys=True,
    ))
    spark.stop()


if __name__ == "__main__":
    main()
