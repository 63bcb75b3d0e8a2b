"""Incremental (batch-vs-corpus) MinHash near-dup: cross-pair parity
with the one-shot self-join, persisted-index path, fresh/reject split,
bucket-cap behavior, and a no-cartesian plan gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators import dedup as DD
from medea_ps_spark.operators import neardup as ND

DOCS = "/root/testdata/sf0.001/documents.parquet"
PARAMS = dict(num_hashes=32, bands=8, shingle_k=3, seed=42)


@pytest.fixture(scope="module")
def corpus(spark):
    df = (
        spark.read.parquet(DOCS)
        .where(F.col("doc_id") % 3 != 0)
        .select("doc_id", "text")
    )
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def batch(spark, corpus):
    """Fresh docs (doc_id % 3 == 0) + planted near-copies of 5 corpus
    docs (one word appended → high but <1 Jaccard), ids offset by 10^6."""
    fresh = (
        spark.read.parquet(DOCS)
        .where(F.col("doc_id") % 3 == 0)
        .select("doc_id", "text")
    )
    copies = (
        corpus.orderBy("doc_id")
        .limit(5)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzzencore")).alias("text"),
        )
    )
    df = fresh.union(copies)
    df.cache().count()
    return df


def test_matches_one_shot_cross_pairs(spark, corpus, batch):
    """Incremental == the one-shot self-join over batch∪corpus,
    restricted to (batch, corpus) cross pairs."""
    inc = {
        (r["batch_id"], r["corpus_id"]): r["jaccard"]
        for r in ND.incremental_near_duplicates(
            batch, corpus, threshold=0.5, **PARAMS
        ).collect()
    }
    full = DD.minhash_near_duplicates(
        batch.union(corpus), threshold=0.5, **PARAMS
    ).collect()
    b_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    c_ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    want = {}
    for r in full:
        a, b, j = r["id_a"], r["id_b"], r["jaccard"]
        if a in b_ids and b in c_ids:
            want[(a, b)] = j
        elif b in b_ids and a in c_ids:
            want[(b, a)] = j
    assert set(inc) == set(want) and len(inc) >= 5
    for k, j in inc.items():
        assert j == pytest.approx(want[k], rel=1e-12)


def test_persisted_index_path_identical(spark, corpus, batch, tmp_path):
    idx_path = str(tmp_path / "lsh_index")
    ND.corpus_lsh_index(corpus, **PARAMS).write.parquet(idx_path)
    loaded = spark.read.parquet(idx_path)
    via_index = ND.incremental_near_duplicates(
        batch, corpus, threshold=0.5, corpus_index=loaded, **PARAMS
    )
    direct = ND.incremental_near_duplicates(
        batch, corpus, threshold=0.5, **PARAMS
    )
    assert sorted(map(tuple, via_index.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # the probe plan must be a real equi-join, never a cartesian fallback
    plan = via_index._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fresh_and_matches_partition_batch(spark, corpus, batch):
    fresh, matches = ND.incremental_near_dedup(
        batch, corpus, threshold=0.5, **PARAMS
    )
    hit = {r["batch_id"] for r in matches.select("batch_id").collect()}
    kept = {r["doc_id"] for r in fresh.select("doc_id").collect()}
    allb = {r["doc_id"] for r in batch.select("doc_id").collect()}
    assert hit | kept == allb and not (hit & kept)
    # every planted near-copy is caught
    assert {i for i in hit if i >= 1_000_000} == {
        r["doc_id"] + 1_000_000
        for r in corpus.orderBy("doc_id").limit(5).collect()
    }


@pytest.fixture(scope="module")
def eval_set(spark, corpus):
    """Benchmark set: 5 near-copies of corpus docs (one word appended)
    + 3 unrelated probes, under a differently-named id column."""
    near = (
        corpus.orderBy("doc_id")
        .limit(5)
        .select(
            (F.col("doc_id") + 2_000_000).alias("eval_id"),
            F.concat(F.col("text"), F.lit(" zzzeval")).alias("text"),
        )
    )
    fresh = spark.createDataFrame(
        [
            (2_900_001, "completely unrelated benchmark question one two three"),
            (2_900_002, "another unrelated benchmark prompt four five six"),
            (2_900_003, "third unrelated eval item seven eight nine"),
        ],
        ["eval_id", "text"],
    )
    df = near.union(fresh)
    df.cache().count()
    return df


def test_fuzzy_contamination_catches_planted_near_matches(
    spark, corpus, eval_set
):
    planted = {
        r["doc_id"] for r in corpus.orderBy("doc_id").limit(5).collect()
    }
    rep = ND.fuzzy_contamination_check(
        corpus, eval_set, eval_id_col="eval_id", threshold=0.5, **PARAMS
    ).collect()
    got = {r["doc_id"] for r in rep}
    assert planted <= got  # every planted near-copy is flagged
    by_id = {r["doc_id"]: r for r in rep}
    for d in planted:
        r = by_id[d]
        assert 0.5 <= r["max_jaccard"] < 1.0
        assert d + 2_000_000 in r["eval_ids"]
        assert r["n_eval_matches"] == len(r["eval_ids"])
    # report jaccard agrees with the role-flipped incremental matches
    pairs = {
        (m["batch_id"], m["corpus_id"]): m["jaccard"]
        for m in ND.incremental_near_duplicates(
            corpus,
            eval_set.withColumnRenamed("eval_id", "doc_id"),
            threshold=0.5,
            **PARAMS,
        ).collect()
    }
    for r in rep:
        want = max(pairs[(r["doc_id"], e)] for e in r["eval_ids"])
        assert r["max_jaccard"] == pytest.approx(want, rel=1e-12)


def test_fuzzy_decontaminate_partitions_corpus(spark, corpus, eval_set):
    clean, report = ND.fuzzy_decontaminate(
        corpus,
        eval_set.withColumnRenamed("eval_id", "doc_id"),
        threshold=0.5,
        **PARAMS,
    )
    bad = {r["doc_id"] for r in report.select("doc_id").collect()}
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    allc = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    assert bad | kept == allc and not (bad & kept)
    assert clean.columns == corpus.columns
    # unrelated eval probes contaminate nothing: every flagged doc is a plant
    assert bad == {
        r["doc_id"] for r in corpus.orderBy("doc_id").limit(5).collect()
    }
    # equi-join plan, never a cartesian fallback on the corpus stream
    plan = clean._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucket_cap_drops_degenerate_corpus_bucket(spark):
    boiler = spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        F.lit("the same exact boilerplate text repeated verbatim").alias("text"),
    )
    probe = spark.createDataFrame(
        [(999, "the same exact boilerplate text repeated verbatim")],
        ["doc_id", "text"],
    )
    # corpus bucket of 50 identical docs exceeds the cap and is dropped
    # at index build → no candidates survive the probe
    idx = ND.corpus_lsh_index(boiler, max_bucket_size=10, **PARAMS)
    assert idx.count() == 0
    got = ND.incremental_near_duplicates(
        probe, boiler, threshold=0.5, corpus_index=idx, **PARAMS
    )
    assert got.count() == 0
