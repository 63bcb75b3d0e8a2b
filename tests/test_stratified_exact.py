"""Exact-quota stratified sampling: quotas, layout independence,
nesting, and DuckDB oracle parity of the md5-order selection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators.sampling import stratified_exact_sample


@pytest.fixture(scope="module")
def corpus(spark):
    # strata of very different sizes: web 700, wiki 250, code 40, tiny 3
    rows = []
    for src, n in (("web", 700), ("wiki", 250), ("code", 40), ("tiny", 3)):
        rows += [(f"{src}-{i}", src) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id string, source string")


def test_exact_quotas_and_underfull_stratum(corpus):
    got = (
        stratified_exact_sample(corpus, 50, ("source",), "doc_id")
        .groupBy("source")
        .count()
        .collect()
    )
    counts = {r["source"]: r["count"] for r in got}
    assert counts == {"web": 50, "wiki": 50, "code": 40, "tiny": 3}


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_layout_independence(corpus):
    a = _ids(stratified_exact_sample(corpus.repartition(1), 25))
    b = _ids(stratified_exact_sample(corpus.repartition(13, "doc_id"), 25))
    assert a == b and len(a) == 25 + 25 + 25 + 3


def test_nested_subsets(corpus):
    small = set(_ids(stratified_exact_sample(corpus, 5)))
    big = set(_ids(stratified_exact_sample(corpus, 12)))
    assert small < big


def test_rank_col_and_validation(corpus):
    ranked = stratified_exact_sample(corpus, 4, rank_col="pick")
    rows = ranked.where(F.col("source") == "wiki").collect()
    assert sorted(r["pick"] for r in rows) == [1, 2, 3, 4]
    with pytest.raises(ValueError):
        stratified_exact_sample(corpus, 0)


def test_duckdb_oracle_parity(corpus):
    duckdb = pytest.importorskip("duckdb")
    got = sorted(
        map(tuple, stratified_exact_sample(corpus, 17, seed=7).collect())
    )
    con = duckdb.connect()
    con.register("corpus", corpus.toPandas())
    want = sorted(
        tuple(t)
        for t in con.execute(
            """
            SELECT doc_id, source FROM (
              SELECT doc_id, source,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY substr(md5(doc_id || ':7'), 1, 8), doc_id
                     ) AS rk
              FROM corpus
            ) WHERE rk <= 17
            """
        ).fetchall()
    )
    assert got == want
