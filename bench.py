"""Benchmark harness. Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline metric: validated sequences/sec on the BASELINE.json-shaped
tokenized-sequence table (full constraint set: verdicts + violation
rows + uniqueness + referential), measured at two parallelism levels
(local[N/4] and local[N]) to evidence the north rule's two-cluster-size
scaling criterion; plus per-query wall times for the operator families
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
MEDEA_BENCH_SEQ_ROWS (default 300000), MEDEA_BENCH_SCALING=0 to skip the
small-parallelism run.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SEQ_ROWS = int(os.environ.get("MEDEA_BENCH_SEQ_ROWS", "300000"))
RUN_SCALING = os.environ.get("MEDEA_BENCH_SCALING", "1") != "0"
SEQ_MAX_LEN = 2048  # bench sequence-length cap (mean ~512 tokens/row)
SEQ_PATH = "/tmp/medea_bench_sequences"


def _session(cores: int):
    from medea_ps_spark.session import get_spark

    return get_spark(
        app_name=f"medea-bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(8, cores),
        extra_conf={"spark.sql.files.maxPartitionBytes": "32m"},
    )


def _materialize_input(spark):
    """Input parquet (not timed): BASELINE-shaped sequences, partitioned
    by source like the Iceberg layout."""
    from medea_ps_spark.sources import synthetic

    if not os.path.exists(os.path.join(SEQ_PATH, "_SUCCESS")):
        shutil.rmtree(SEQ_PATH, ignore_errors=True)
        df = synthetic.sequences(
            spark, SEQ_ROWS, seed=42, max_len=SEQ_MAX_LEN, num_partitions=CPUS * 2
        )
        df.write.mode("overwrite").partitionBy("source").parquet(SEQ_PATH)


def _seq_registry():
    from medea_ps_spark.plans.compiler import Registry
    from medea_ps_spark.plans.constraints import (
        ArrayLenBetween, ConstraintSet, ElementsInRange, InRange, NotNull,
        ReferentialIn, SizeEquals, Unique,
    )
    from medea_ps_spark.sources import synthetic

    reg = Registry()
    reg.register(
        ConstraintSet(
            "$start",
            [
                NotNull("doc_id_not_null", "doc_id"),
                SizeEquals("n_tok_matches", "n_tok", "tokens"),
                InRange("n_tok_bounds", "n_tok", 1, synthetic.MAX_LEN),
                ElementsInRange("tokens_in_vocab", "tokens", 0, synthetic.VOCAB),
                ArrayLenBetween("tokens_not_empty", "tokens", 1, None),
                ReferentialIn("source_known", "source",
                              dim_values=synthetic.ALLOWED_SOURCES),
                Unique("doc_id_unique", "doc_id"),
            ],
        )
    )
    return reg


def _validate_job(spark) -> dict:
    """The headline job: full validation → verdict counts + violation
    rows + partition verdicts, one action."""
    from pyspark.sql import functions as F
    from medea_ps_spark.operators import validator as V

    df = spark.read.parquet(SEQ_PATH)
    compiled = _seq_registry().compile(df.schema)
    viol = V.all_violations(df, compiled, id_column="doc_id")
    n_viol = viol.count()
    validated = V.validate(df, compiled)
    verd = V.partition_verdicts(validated, "source").collect()
    return {
        "rows": int(sum(r["n_rows"] for r in verd)),
        "violations": int(n_viol),
    }


def timed(fn, *args):
    t0 = time.time()
    out = fn(*args)
    return time.time() - t0, out


def bench_queries(spark) -> dict:
    import __spark_entry__ as em

    picks = [
        "validate_violations", "validate_verdicts", "partition_stats",
        "histogram_n_chars", "drift_chi2", "medea_validate_events",
        "dedup_exact", "dedup_minhash_lsh", "ann_topk", "text_quality",
        "lineitem_pricing", "orders_by_segment",
    ]
    qs = em.queries()
    out = {}
    for name in picks:
        t0 = time.time()
        n = qs[name](spark, SF_DIR).count()
        out[name] = round(time.time() - t0, 3)
        _ = n
    return out


def main():
    results = {}
    scaling = {}

    # -- scaling evidence: same job, N/4 then N cores (fresh JVMs)
    if RUN_SCALING:
        small = max(2, CPUS // 4)
        spark_small = _session(small)
        _materialize_input(spark_small)
        _validate_job(spark_small)  # warm (JIT/codegen), untimed
        t_small, _ = timed(_validate_job, spark_small)
        spark_small.stop()
        scaling[f"local{small}_sec"] = round(t_small, 3)
        scaling[f"local{small}_rows_per_sec"] = round(SEQ_ROWS / t_small, 1)

    spark = _session(CPUS)
    _materialize_input(spark)
    _validate_job(spark)  # warm
    t_big, info = timed(_validate_job, spark)
    rows_per_sec = SEQ_ROWS / t_big
    results["seq_validate_full"] = round(t_big, 3)
    if RUN_SCALING:
        small = max(2, CPUS // 4)
        t_small = scaling[f"local{small}_sec"]
        eff = (t_small / t_big) / (CPUS / small)
        scaling[f"local{CPUS}_sec"] = round(t_big, 3)
        scaling[f"local{CPUS}_rows_per_sec"] = round(rows_per_sec, 1)
        scaling["efficiency"] = round(eff, 3)

    results.update(bench_queries(spark))
    spark.stop()

    print(
        json.dumps(
            {
                "metric": "validated_sequences_per_sec",
                "value": round(rows_per_sec, 1),
                "unit": "sec",
                "queries": results,
                "sf": SF_DIR,
                "seq_rows": SEQ_ROWS,
                "violations": info["violations"],
                "scaling": scaling,
            }
        )
    )


if __name__ == "__main__":
    main()
