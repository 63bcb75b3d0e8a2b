"""IVF ANN recall + per-partition drift verdicts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators import drift as D
from medea_ps_spark.operators import ivf as IVF
from medea_ps_spark.operators import similarity as SIM
from medea_ps_spark.sources import synthetic

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def test_ivf_topk_recall(spark):
    emb = spark.read.parquet(EMB).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    cent = IVF.train_centroids(emb, k=8, sample=600, iters=8)
    assert cent.shape[1] == 64
    queries = emb.limit(10).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = SIM.brute_force_topk(emb, queries, k=3)
    approx = IVF.ivf_topk(emb, queries, cent, k=3, n_probe=3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall
    # full probe == exact
    full = IVF.ivf_topk(emb, queries, cent, k=3, n_probe=len(cent))
    f = {(r["query_id"], r["neighbor_id"]) for r in full.collect()}
    assert f == e


def test_centroid_sample_is_unbiased_across_strata(spark):
    """A per-source-partitioned corpus: two well-separated vector
    strata, each in its own partition(s). A first-partitions .limit()
    sample would train the quantizer on ONE stratum; the hash-ordered
    sample must see both — detectable because k-means then places
    centroids near both strata."""
    import numpy as np

    n = 400
    jit = (F.col("id") % 97).cast("double") / 1000.0  # distinct per row
    a = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*([F.lit(1.0)] + [F.lit(0.0)] * 6 + [jit])).alias("embedding"),
    )
    b = spark.range(n, 2 * n).select(
        F.col("id").alias("vec_id"),
        F.array(*([jit] + [F.lit(0.0)] * 6 + [F.lit(-1.0)])).alias("embedding"),
    )
    # repartition(1) each → stratum A occupies the first partition(s),
    # exactly the layout that biased the old .limit() draw
    df = a.repartition(1).union(b.repartition(1))
    cent = IVF.train_centroids(df, k=2, sample=n, iters=6, seed=3)
    has_a = any(c[0] > 0.9 for c in cent)
    has_b = any(c[7] < -0.9 for c in cent)
    assert has_a and has_b, cent


def test_assignment_balances_and_is_deterministic(spark):
    emb = spark.read.parquet(EMB).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    cent = IVF.train_centroids(emb, k=8, sample=600, iters=8, seed=7)
    a1 = IVF.assign_lists(emb, cent).groupBy("ivf_list").count().collect()
    a2 = IVF.assign_lists(emb, cent).groupBy("ivf_list").count().collect()
    assert sorted(map(tuple, a1)) == sorted(map(tuple, a2))
    assert len(a1) >= 4  # vectors spread over multiple lists


def test_per_partition_drift_flags_only_shifted(spark):
    clean = synthetic.sequences(spark, 30_000, seed=4, clean=True)
    prof = D.build_profile(
        clean, {"n_tok": {"column": "n_tok", "lo": 1, "hi": synthetic.MAX_LEN}}
    )
    fresh = synthetic.sequences(spark, 30_000, seed=5, clean=True)
    # shift ONE partition's n_tok
    shifted = fresh.withColumn(
        "n_tok",
        F.when(
            F.col("source") == "books",
            F.least(
                (F.col("n_tok") * 1.6).cast("int"), F.lit(synthetic.MAX_LEN)
            ),
        ).otherwise(F.col("n_tok")),
    )
    verdicts = D.chi2_drift_by_partition(shifted, prof, "n_tok", "source")
    flagged = {v["partition"] for v in verdicts if v.get("drifted")}
    assert "books" in flagged
    big = {v["partition"] for v in verdicts if v.get("n", 0) > 1500}
    assert flagged & big == {"books"}  # no false flags on well-sampled parts
