"""Embedding centroid drift: numpy parity, coherence semantics,
snapshot comparison, partitioning invariance, plan shape."""

from __future__ import annotations

import numpy as np
import pytest

from medea_ps_spark.operators.embdrift import (
    centroid_cosine_pairs,
    centroid_drift_between,
    group_centroids,
)

DIM = 6


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "source string, embedding array<double>"
    )


def _np_centroid(vecs, normalize=True):
    m = np.asarray(vecs, dtype=np.float64)
    if normalize:
        n = np.linalg.norm(m, axis=1)
        n[n == 0.0] = 1e-12
        m = m / n[:, None]
    return m.mean(axis=0)


def test_centroids_match_numpy(spark):
    rng = np.random.default_rng(5)
    rows, by_g = [], {}
    for i in range(60):
        g = f"s{i % 3}"
        v = rng.normal(0, 1, DIM)
        rows.append((g, [float(x) for x in v]))
        by_g.setdefault(g, []).append(v)
    got = {
        r["source"]: (np.array(r["centroid"]), r["n_vectors"])
        for r in group_centroids(_df(spark, rows)).collect()
    }
    assert set(got) == set(by_g)
    for g, vecs in by_g.items():
        cent, n = got[g]
        assert n == len(vecs)
        np.testing.assert_allclose(cent, _np_centroid(vecs), atol=1e-12)


def test_coherence_semantics(spark):
    # parallel vectors -> coherence (centroid norm) == 1; antipodal -> 0
    z = [0.0] * (DIM - 1)
    rows = [("par", [1.0] + z), ("par", [2.0] + z),
            ("anti", [1.0] + z), ("anti", [-3.0] + z)]
    cents = group_centroids(_df(spark, rows))
    drift = centroid_drift_between(cents, cents)
    got = {r["source"]: r for r in drift.collect()}
    assert got["par"]["coherence_a"] == pytest.approx(1.0)
    assert got["anti"]["coherence_a"] == pytest.approx(0.0, abs=1e-9)
    assert got["par"]["cosine_sim"] == pytest.approx(1.0)  # self-compare


def test_pairwise_and_drift_match_numpy(spark):
    rng = np.random.default_rng(11)
    snap_a, snap_b, ref_a, ref_b = [], [], {}, {}
    for g, shift in [("x", 0.0), ("y", 0.4), ("z", 2.0)]:
        base = rng.normal(0, 1, DIM)
        for _ in range(30):
            va = base + rng.normal(0, 0.2, DIM)
            vb = base + shift + rng.normal(0, 0.2, DIM)
            snap_a.append((g, [float(t) for t in va]))
            snap_b.append((g, [float(t) for t in vb]))
            ref_a.setdefault(g, []).append(va)
            ref_b.setdefault(g, []).append(vb)
    ca = group_centroids(_df(spark, snap_a))
    cb = group_centroids(_df(spark, snap_b))
    # pairwise within snapshot A
    pair = {
        (r["g_a"], r["g_b"]): r["cosine_sim"]
        for r in centroid_cosine_pairs(ca).collect()
    }
    for (a, b), got in pair.items():
        na, nb = _np_centroid(ref_a[a]), _np_centroid(ref_a[b])
        exp = float(na @ nb / (np.linalg.norm(na) * np.linalg.norm(nb)))
        assert got == pytest.approx(round(exp, 6), abs=1e-6)
    # drift between snapshots: bigger planted shift -> lower cosine
    drift = {
        r["source"]: r["cosine_sim"]
        for r in centroid_drift_between(ca, cb).collect()
    }
    assert drift["x"] > drift["y"] > drift["z"]
    assert drift["x"] == pytest.approx(1.0, abs=0.01)


def test_partitioning_invariance_and_nulls(spark):
    rng = np.random.default_rng(3)
    rows = [
        (f"s{i % 4}", [float(x) for x in rng.normal(0, 1, DIM)])
        for i in range(80)
    ] + [("s0", None)]
    a = group_centroids(_df(spark, rows)).collect()
    b = group_centroids(_df(spark, rows).repartition(7)).collect()
    ka = {r["source"]: (r["centroid"], r["n_vectors"]) for r in a}
    kb = {r["source"]: (r["centroid"], r["n_vectors"]) for r in b}
    assert set(ka) == set(kb)
    assert ka["s0"][1] == 20  # the NULL vector row is excluded
    for g in ka:
        np.testing.assert_allclose(ka[g][0], kb[g][0], atol=1e-12)


def test_plan_no_udf_one_explode(spark):
    rows = [("a", [1.0] * DIM), ("b", [2.0] * DIM)]
    plan = (
        group_centroids(_df(spark, rows))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Generate posexplode" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2  # partial+final cells
