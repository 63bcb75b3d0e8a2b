"""Extra measurement harness for the optimization round (guide §1).

NOT part of the frozen driver bench (bench.py). Three modes:

  python bench_extra.py sweep [q1,q2,...]
      Per-query isolation for the bench.py sweep picks: splits each
      query into DataFrame CONSTRUCTION (python/py4j), PLANNING
      (explain trigger), and EXECUTION (count, min over 3 attempts —
      the bench.py statistic), so fixed-floor vs data cost is visible.
      Writes JSON to BENCH/extra_sweep.json.

  python bench_extra.py plans [q1,q2,...] [--out plans/r06 --suffix _before]
      Captures .explain("formatted") for each query to
      plans/r06/<query><suffix>.txt.

  python bench_extra.py validate24m [--rows N]
      The headline job (bench.py _row_validate_job shape) on the /tmp
      24M fixture at local[$SPARK_GRAFT_CPUS]: noop-isolated stages —
      raw tokens scan, verdict-only, full validate projection + agg.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_EXTRA_CONF
("k=v,k2=v2" extra session confs for A/B experiments).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")


def _session():
    from medea_ps_spark.session import get_spark

    extra = {"spark.sql.files.maxPartitionBytes": "64m"}
    for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k.strip()] = v.strip()
    return get_spark(
        app_name="medea-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(8, CPUS),
        extra_conf=extra,
    )


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def sweep(names=None):
    import __spark_entry__ as em

    spark = _session()
    qs = em.queries()
    picks = names or [
        "validate_violations", "validate_verdicts", "partition_stats",
        "drift_chi2", "medea_validate_events",
        "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
        "ann_topk", "ann_lsh", "text_quality",
        "stats_bounds", "vocab_truncate", "seq_validation",
        "events_asof", "events_sessions_detail", "seq_packing",
        "validate_estimate", "text_repetition", "events_in_windows",
        "kmv_distinct", "events_rollup", "text_lm_score",
        "table_diff", "quality_model", "dedup_incremental",
        "token_contamination", "token_span_dedup",
        "validate_violations_sample", "dsir_resample",
        "token_budget_sample", "text_normalize",
        "source_vocab_overlap", "source_divergence",
        "text_extract_html",
    ]
    out = {}
    for name in picks:
        spark.sparkContext.setJobDescription(f"extra:{name}")
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        t_build = time.time() - t0
        t0 = time.time()
        df._jdf.queryExecution().executedPlan()  # analysis+optimize+plan
        t_plan = time.time() - t0
        runs = []
        for _ in range(3):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)  # bench.py rebuilds each attempt
            df.count()
            runs.append(round(time.time() - t0, 3))
        out[name] = {
            "build": round(t_build, 3),
            "plan": round(t_plan, 3),
            "count_runs": runs,
            "count_min": min(runs),
        }
        print(f"{name:28s} build={t_build:6.2f} plan={t_plan:6.2f} "
              f"runs={runs}", flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH", "extra_sweep.json")
    with open(path, "w") as fh:
        json.dump({"sf": SF_DIR, "cpus": CPUS, "queries": out}, fh, indent=1)
    print("WROTE", path)
    spark.stop()


def plans(names, out_dir="plans/r06", suffix="_before"):
    import __spark_entry__ as em

    spark = _session()
    qs = em.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        p = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(p, "w") as fh:
            fh.write(txt)
        print("WROTE", p, flush=True)
    spark.stop()


def validate24m(rows=24_000_000):
    from pyspark.sql import functions as F

    spark = _session()
    path = f"/tmp/medea_bench_sequences_{rows}"
    rec = {}

    def timed(tag, fn, reps=2):
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            t = time.time() - t0
            best = t if best is None else min(best, t)
        rec[tag] = round(best, 2)
        print(f"{tag:24s} {best:7.2f}s", flush=True)

    df = spark.read.parquet(path)
    spark.sparkContext.setJobDescription("scan tokens only")
    timed("scan_tokens_sum_size",
          lambda: df.select(F.sum(F.size("tokens"))).collect())
    spark.sparkContext.setJobDescription("scan all cols noop")
    timed("scan_all_noop", lambda: _noop(df))

    import bench  # frozen harness: reuse the exact job definitions

    spark.sparkContext.setJobDescription("row_validate_job")
    timed("row_validate_job", lambda: bench._row_validate_job(spark, rows))
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    mode = args[0] if args else "sweep"
    names = args[1].split(",") if len(args) > 1 else None
    if mode == "sweep":
        sweep(names)
    elif mode == "plans":
        suffix = "_before"
        out_dir = "plans/r06"
        for a in sys.argv[1:]:
            if a.startswith("--suffix="):
                suffix = a.split("=", 1)[1]
            if a.startswith("--out="):
                out_dir = a.split("=", 1)[1]
        plans(names or [], out_dir, suffix)
    elif mode == "validate24m":
        rows = 24_000_000
        for a in sys.argv[1:]:
            if a.startswith("--rows="):
                rows = int(a.split("=", 1)[1])
        validate24m(rows)
    else:
        raise SystemExit(f"unknown mode {mode}")
