"""Product-quantization ANN (operators/pq.py): codebook serde, encode
parity vs a pure-numpy reference, ADC score parity, recall vs the exact
brute-force baseline, layout independence, NULL handling, plan gates."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators import pq as PQ
from medea_ps_spark.operators import ivf as IVF
from medea_ps_spark.operators import similarity as SIM

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(EMB).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def codebook(emb):
    # these synthetic embeddings are near-uniform (no cluster structure
    # — the hard case for PQ): numpy probe shows m=16/ksub=64 gives ADC
    # recall@5 ≈ 0.6 and ≈ 0.96 after a 20-deep exact rerank
    return PQ.train_pq(emb, m=16, ksub=64, sample=500, iters=10, seed=7)


@pytest.fixture(scope="module")
def queries(emb):
    return emb.orderBy("vec_id").limit(10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_codebook_serde_roundtrip():
    rng = np.random.default_rng(0)
    cb = PQ.PQCodebook(rng.standard_normal((4, 16, 8)).astype(np.float32))
    back = PQ.PQCodebook.from_bytes(cb.to_bytes())
    assert back.m == 4 and back.ksub == 16 and back.dsub == 8 and back.dim == 32
    np.testing.assert_array_equal(back.centroids, cb.centroids)


def test_train_validates_args(emb):
    with pytest.raises(ValueError, match="not divisible"):
        PQ.train_pq(emb, m=7, ksub=16, sample=200)
    with pytest.raises(ValueError, match="exceeds sample"):
        PQ.train_pq(emb, m=8, ksub=512, sample=100)


def _pure_python_encode(vec, cb):
    """Independent per-row reference: normalize, per-subspace argmin of
    squared L2 distance computed the naive way."""
    x = np.asarray(vec, dtype=np.float64)
    x = x / max(np.linalg.norm(x), 1e-12)
    code = []
    for j in range(cb.m):
        xs = x[j * cb.dsub : (j + 1) * cb.dsub]
        d2 = [float(((xs - c) ** 2).sum()) for c in cb.centroids[j].astype(np.float64)]
        code.append(int(np.argmin(d2)))
    return code


def test_encode_matches_pure_python_reference(emb, codebook):
    got = {
        r["vec_id"]: r["pq_code"]
        for r in PQ.encode_pq(emb.limit(50), codebook).collect()
    }
    raw = {r["vec_id"]: r["embedding"] for r in emb.limit(50).collect()}
    for vid, vec in raw.items():
        assert got[vid] == _pure_python_encode(vec, codebook), vid


def test_adc_score_parity(emb, codebook, queries):
    """adc_score == sum over subspaces of <q_sub, codeword> computed
    independently in numpy."""
    res = PQ.pq_topk(
        PQ.encode_pq(emb, codebook), queries, codebook, k=3
    ).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], float) for r in emb.collect()}
    for r in res:
        q = vecs[r["query_id"]]
        q = q / max(np.linalg.norm(q), 1e-12)
        code = _pure_python_encode(vecs[r["neighbor_id"]], codebook)
        want = sum(
            float(
                q[j * codebook.dsub : (j + 1) * codebook.dsub]
                @ codebook.centroids[j][code[j]].astype(np.float64)
            )
            for j in range(codebook.m)
        )
        assert r["adc_score"] == pytest.approx(want, rel=1e-9)


def test_pq_recall_vs_brute_force(emb, codebook, queries):
    exact = SIM.brute_force_topk(emb, queries, k=5)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx = PQ.pq_topk(PQ.encode_pq(emb, codebook), queries, codebook, k=5)
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(e & a) / len(e) >= 0.5, (len(e & a), len(e))
    # exact re-rank of a 4x ADC shortlist recovers most of the remainder
    shortlist = PQ.pq_topk(PQ.encode_pq(emb, codebook), queries, codebook, k=20)
    rr = PQ.pq_rerank(shortlist, emb, queries, k=5)
    r = {(x["query_id"], x["neighbor_id"]) for x in rr.collect()}
    assert len(e & r) / len(e) >= 0.8, (len(e & r), len(e))
    # self-hit: every query's own vector is its cosine top-1 after rerank
    top1 = {x["query_id"]: x["neighbor_id"] for x in rr.collect() if x["rank"] == 1}
    hits = sum(1 for qid, nid in top1.items() if qid == nid)
    assert hits >= 7, top1


def test_ivf_pq_recall_and_plan(emb, codebook, queries):
    cent = IVF.train_centroids(emb, k=8, sample=500, iters=8, seed=7)
    res = PQ.ivf_pq_topk(
        emb, queries, cent, codebook, k=5, n_probe=4, rerank_factor=4
    )
    exact = SIM.brute_force_topk(emb, queries, k=5)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in res.collect()}
    assert len(e & a) / len(e) >= 0.55, (len(e & a), len(e))
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # ADC-only mode returns the approximate ranking directly
    adc_only = PQ.ivf_pq_topk(
        emb, queries, cent, codebook, k=5, n_probe=8, rerank_factor=None
    )
    assert adc_only.columns == ["query_id", "neighbor_id", "adc_score", "rank"]
    full_probe = {(r["query_id"], r["neighbor_id"]) for r in adc_only.collect()}
    # probing every cell == the exhaustive ADC scan
    exhaustive = PQ.pq_topk(PQ.encode_pq(emb, codebook), queries, codebook, k=5)
    assert full_probe == {
        (r["query_id"], r["neighbor_id"]) for r in exhaustive.collect()
    }


def test_layout_independence(emb, codebook, queries):
    codes = PQ.encode_pq(emb, codebook)
    a = PQ.pq_topk(codes.repartition(2), queries, codebook, k=5)
    b = PQ.pq_topk(codes.repartition(13, "vec_id"), queries, codebook, k=5)
    ra = [(r["query_id"], r["rank"], r["neighbor_id"]) for r in a.collect()]
    rb = [(r["query_id"], r["rank"], r["neighbor_id"]) for r in b.collect()]
    assert sorted(ra) == sorted(rb)


def test_null_vectors_skipped(spark, codebook):
    rows = [(1, [0.1] * 64), (2, None), (3, [0.2] * 64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    coded = PQ.encode_pq(df, codebook).collect()
    by_id = {r["vec_id"]: r["pq_code"] for r in coded}
    assert by_id[2] is None and by_id[1] is not None
    q = spark.createDataFrame(
        [(1, [0.1] * 64)], "query_id long, embedding array<double>"
    )
    res = PQ.pq_topk(PQ.encode_pq(df, codebook), q, codebook, k=5).collect()
    assert {r["neighbor_id"] for r in res} == {1, 3}


def test_encode_plan_is_map_only(emb, codebook):
    df = PQ.encode_pq(emb, codebook)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_partitioned_layout_prunes_probe_scan(spark, emb, codebook, tmp_path):
    """The docstring's scale claim, proven: an encoded corpus written
    partitionBy('ivf_list') turns the probe filter into parquet
    PARTITION pruning — the scan reads only n_probe cells' files."""
    cent = IVF.train_centroids(emb, k=8, sample=500, iters=8, seed=7)
    path = str(tmp_path / "pq_table")
    PQ.encode_pq(
        IVF.assign_lists(emb, cent), codebook
    ).write.partitionBy("ivf_list").parquet(path)
    table = spark.read.parquet(path)
    probed = table.where(F.col("ivf_list").isin([0, 3]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # partition filters are pushed; no per-row filter on ivf_list remains
    assert "PartitionFilters: [ivf_list" in plan.replace("\n", " ") or (
        "PartitionFilters" in plan and "ivf_list" in plan
    ), plan
    # and the pruned scan really reads a subset
    n_all = table.count()
    n_probed = probed.count()
    assert 0 < n_probed < n_all
    # pruned candidates still produce the same top-k as filtering in
    # memory (layout change never changes results)
    mem = {
        r["vec_id"]
        for r in PQ.encode_pq(IVF.assign_lists(emb, cent), codebook)
        .where(F.col("ivf_list").isin([0, 3]))
        .select("vec_id")
        .collect()
    }
    disk = {r["vec_id"] for r in probed.select("vec_id").collect()}
    assert mem == disk
