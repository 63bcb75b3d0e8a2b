"""Driver-contract smoke tests: entry() runs, every oracle key has a
query, Spark results are well-formed at sf0.001."""

from __future__ import annotations

import pytest

import __spark_entry__ as em


def test_oracle_keys_subset_of_queries():
    qs, os_ = em.queries(), em.oracle_sql()
    assert set(os_) <= set(qs)
    # EVERY query carries a DuckDB oracle: minhash/simhash via
    # hash_fn="md5", ann_lsh via literal-plane SQL twins, ann_ivf via
    # the committed quantizer artifact (centroids as SQL literals),
    # seq_* via the committed fixture parquet, clustering via recursive
    # CTEs
    rows_only = set(qs) - set(os_)
    assert rows_only == set()


def test_entry_runs(spark):
    df = em.entry(spark)
    rows = df.collect()
    assert {f.name for f in df.schema.fields} == {
        "doc_id", "constraint_id", "observed"
    }
    assert len(rows) >= 0


@pytest.mark.parametrize("name", sorted(em.queries()))
def test_each_query_returns_dataframe(spark, name):
    df = em.queries()[name](spark, "/root/testdata/sf0.001")
    assert df.columns  # schema resolvable without execution


def test_runner_end_to_end(spark, tmp_path):
    from medea_ps_spark.operators.runner import (
        run_checkpointed_validation, run_validation,
    )
    from medea_ps_spark.sources import synthetic
    from medea_ps_spark.jobs.validate_job import build_registry

    reg = build_registry(synthetic.VOCAB, synthetic.MAX_LEN, synthetic.ALLOWED_SOURCES)
    df = synthetic.sequences(spark, 3000, seed=11)
    report = run_validation(df, reg, stats_columns=["n_tok"])
    assert report.verdicts.count() > 3
    assert report.violations.count() > 0
    assert report.stats is not None and report.stats.count() > 3
    # checkpointed variant over a written table
    path = str(tmp_path / "tbl")
    df.write.partitionBy("source").parquet(path)
    metrics = run_checkpointed_validation(
        spark, path, reg, str(tmp_path / "ck")
    )
    assert sum(m["n_rows"] for m in metrics.values()) == 3000
