"""Scaling diagnosis: time the validation job at several parallelism
levels / configurations to locate the bottleneck."""

import sys
import time

sys.path.insert(0, "/root/repo")

from medea_ps_spark.session import get_spark  # noqa: E402


def job(spark, mode):
    from medea_ps_spark.operators import validator as V
    import bench as B

    df = spark.read.parquet(B.SEQ_PATH)
    compiled = B._seq_registry().compile(df.schema)
    if mode == "rowsonly":
        validated = V.validate(df, compiled)
        return V.partition_verdicts(validated, "source").collect()
    return V.all_violations(df, compiled, id_column="doc_id").count()


def main():
    for cores in (8, 32):
        spark = get_spark(
            app_name=f"diag{cores}",
            master=f"local[{cores}]",
            shuffle_partitions=max(8, cores),
            extra_conf={"spark.sql.files.maxPartitionBytes": "32m"},
        )
        for mode in ("rowsonly", "full"):
            t0 = time.time()
            job(spark, mode)
            warm = time.time() - t0
            t0 = time.time()
            job(spark, mode)
            t = time.time() - t0
            print(f"RES cores={cores} mode={mode} warm={warm:.2f} sec={t:.2f}",
                  flush=True)
        spark.stop()


if __name__ == "__main__":
    main()
