"""Semantic dedup (operators/semdedup.py): pair parity vs a numpy
within-cluster oracle, the paper's min-centroid-sim keep policy, group
tagging, cap conservatism, and a no-cartesian plan gate."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators.semdedup import (
    centroid_similarity,
    semantic_dedup,
    semantic_pairs,
)

DIM = 8

# two well-separated unit centroids
CENTROIDS = np.zeros((2, DIM))
CENTROIDS[0, 0] = 1.0
CENTROIDS[1, 1] = 1.0


def _vec(base: int, jitter: float, scale: float = 1.0):
    """Unit-ish vector near CENTROIDS[base] with a deterministic nudge
    of size ``jitter`` in a fixed off-axis direction."""
    v = CENTROIDS[base].copy()
    v[2 + base] += jitter
    v = v / np.linalg.norm(v)
    return [float(x) for x in (v * scale)]


ROWS = [
    # cluster 0: d1~d2 near-identical; d3 same cluster but far
    ("d1", _vec(0, 0.01)),
    ("d2", _vec(0, 0.02)),
    ("d3", _vec(0, 0.8)),
    # cluster 1: d4~d5~d6 a triple group
    ("d4", _vec(1, 0.00)),
    ("d5", _vec(1, 0.015)),
    ("d6", _vec(1, 0.03)),
    # cluster 1 singleton, far from the triple
    ("d7", _vec(1, 0.9)),
]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        ROWS, "doc_id string, embedding array<double>"
    )


def _numpy_pairs(threshold):
    ids = [r[0] for r in ROWS]
    X = np.array([r[1] for r in ROWS])
    assign = (X @ CENTROIDS.T).argmax(axis=1)
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if assign[i] != assign[j]:
                continue
            cos = X[i] @ X[j] / (np.linalg.norm(X[i]) * np.linalg.norm(X[j]))
            if cos >= threshold:
                out.add(tuple(sorted((ids[i], ids[j]))))
    return out


def test_pairs_match_numpy_oracle(frame):
    got = {
        (r.id_a, r.id_b)
        for r in semantic_pairs(frame, CENTROIDS, threshold=0.98).collect()
    }
    want = _numpy_pairs(0.98)
    assert got == want
    assert ("d1", "d2") in got and ("d4", "d5") in got
    # cross-cluster comparisons never happen even at threshold 0
    got0 = {
        (r.id_a, r.id_b)
        for r in semantic_pairs(frame, CENTROIDS, threshold=-1.0).collect()
    }
    assert got0 == {
        (a, b) for a, b in got0 if {a, b} <= {"d1", "d2", "d3"}
        or {a, b} <= {"d4", "d5", "d6", "d7"}
    }


def test_keep_policy_min_centroid_sim(frame):
    out = semantic_dedup(frame, CENTROIDS, threshold=0.98).collect()
    by_id = {r.doc_id: r for r in out}
    # groups: {d1,d2} -> sem_group d1; {d4,d5,d6} -> d4; singles keep
    assert by_id["d1"].sem_group == "d1" and by_id["d2"].sem_group == "d1"
    assert {by_id[d].sem_group for d in ("d4", "d5", "d6")} == {"d4"}
    # paper policy: keep the member FARTHEST from the centroid — the one
    # with the LARGEST jitter (d2 in pair, d6 in triple)
    assert by_id["d2"].sem_keep and not by_id["d1"].sem_keep
    assert by_id["d6"].sem_keep
    assert not by_id["d4"].sem_keep and not by_id["d5"].sem_keep
    # singletons always survive
    assert by_id["d3"].sem_keep and by_id["d7"].sem_keep
    # exactly one survivor per group
    assert sum(r.sem_keep for r in out) == 4


def test_keep_policies_alternatives(frame):
    out = semantic_dedup(
        frame, CENTROIDS, threshold=0.98, keep="max_centroid_sim"
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id["d1"].sem_keep and by_id["d4"].sem_keep  # least jitter
    out2 = semantic_dedup(
        frame, CENTROIDS, threshold=0.98, keep="min_id"
    ).collect()
    by2 = {r.doc_id: r for r in out2}
    assert by2["d1"].sem_keep and by2["d4"].sem_keep
    with pytest.raises(ValueError):
        semantic_dedup(frame, CENTROIDS, keep="nope")


def test_cap_drops_pairing_not_rows(frame):
    # cluster 1 has 4 members > cap=3 -> its pairs vanish; cluster 0
    # (3 members) still pairs; capped rows all survive dedup
    pairs = semantic_pairs(
        frame, CENTROIDS, threshold=0.98, max_cluster_size=3
    ).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {("d1", "d2")}
    out = semantic_dedup(
        frame, CENTROIDS, threshold=0.98, max_cluster_size=3
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert all(by_id[d].sem_keep for d in ("d4", "d5", "d6", "d7"))


def test_centroid_similarity_values(frame):
    rows = centroid_similarity(frame, CENTROIDS).collect()
    by_id = {r.doc_id: r for r in rows}
    assert by_id["d1"].ivf_list == 0 and by_id["d4"].ivf_list == 1
    # d4 sits exactly on its centroid
    assert by_id["d4"].centroid_sim == pytest.approx(1.0, abs=1e-9)
    assert by_id["d2"].centroid_sim < by_id["d1"].centroid_sim < 1.0


def test_no_cartesian_in_plan(frame):
    plan = (
        semantic_pairs(frame, CENTROIDS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
