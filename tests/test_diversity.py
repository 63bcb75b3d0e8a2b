"""MMR diversity selection: quota apportionment, pure-numpy parity,
partitioning invariance, and the lam=1 top-quality degeneration."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators.diversity import (
    apportion_quotas,
    greedy_mmr,
    mmr_select,
)
from medea_ps_spark.operators.ivf import assign_lists

DIM = 8


def _centroids():
    # three well-separated unit directions
    c = np.zeros((3, DIM))
    c[0, 0] = 1.0
    c[1, 1] = 1.0
    c[2, 2] = 1.0
    return c


def _rows(n=90, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        cell = i % 3
        v = rng.normal(0, 0.15, DIM)
        v[cell] += 1.0
        rows.append(
            (
                f"doc{i:04d}",
                [float(x) for x in v],
                float(rng.uniform(0, 1)),
            )
        )
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, embedding array<double>, quality double"
    )


def _reference_select(rows, centroids, k, lam, oversample=4, max_pool=10_000):
    """Driver-side reimplementation of the sharded plan: same
    assignment, same quotas, same pools, same greedy."""
    cents = np.asarray(centroids, dtype=np.float64)
    by_cell = {}
    for doc_id, vec, q in rows:
        v = np.asarray(vec)
        cell = int(np.argmax(cents @ v))
        by_cell.setdefault(cell, []).append((doc_id, v, q))
    sizes = {c: len(v) for c, v in by_cell.items()}
    quotas = apportion_quotas(k, sizes)
    max_quota = max(quotas.values(), default=0)
    pool_k = min(max_pool, max(max_quota, oversample * max_quota))
    out = {}
    for cell, members in by_cell.items():
        members.sort(key=lambda t: (-t[2], t[0]))
        pool = members[:pool_k]
        vecs = np.stack([m[1] for m in pool])
        quality = np.array([m[2] for m in pool])
        chosen = greedy_mmr(
            [m[0] for m in pool], vecs, quality, quotas.get(cell, 0), lam
        )
        for rank, (i, score) in enumerate(chosen, start=1):
            out[pool[i][0]] = (cell, rank, score)
    return out


def test_apportion_proportional_and_capped():
    assert apportion_quotas(10, {0: 50, 1: 30, 2: 20}) == {0: 5, 1: 3, 2: 2}
    # a cell whose proportional share rounds to zero gets zero
    # (coverage across cells is proportional by contract, not uniform)
    q = apportion_quotas(10, {0: 100, 1: 2, 2: 100})
    assert q == {0: 5, 1: 0, 2: 5}
    # k == total and k > total: everything selected
    assert apportion_quotas(7, {0: 3, 1: 4}) == {0: 3, 1: 4}
    assert apportion_quotas(99, {0: 3, 1: 4}) == {0: 3, 1: 4}
    assert apportion_quotas(0, {0: 3}) == {0: 0}
    with pytest.raises(ValueError):
        apportion_quotas(-1, {0: 3})


def test_apportion_deterministic_tiebreak():
    # equal sizes, odd k: the leftover slot goes to the smallest cell id
    assert apportion_quotas(3, {0: 10, 1: 10}) == {0: 2, 1: 1}


@pytest.mark.parametrize("lam", [0.0, 0.5, 1.0])
def test_mmr_matches_reference(spark, lam):
    rows = _rows()
    cents = _centroids()
    got = {
        r["doc_id"]: (r["ivf_list"], r["mmr_rank"], r["mmr_score"])
        for r in mmr_select(
            _df(spark, rows), cents, k=18, quality_col="quality", lam=lam
        ).collect()
    }
    exp = _reference_select(rows, cents, k=18, lam=lam)
    assert set(got) == set(exp)
    for doc, (cell, rank, score) in exp.items():
        gcell, grank, gscore = got[doc]
        assert (gcell, grank) == (cell, rank)
        assert gscore == pytest.approx(score, abs=1e-9)


def test_partitioning_invariance(spark):
    rows = _rows(seed=11)
    cents = _centroids()
    a = mmr_select(
        _df(spark, rows), cents, k=12, quality_col="quality"
    ).collect()
    b = mmr_select(
        _df(spark, rows).repartition(7), cents, k=12, quality_col="quality"
    ).collect()
    key = lambda r: r["doc_id"]
    assert sorted(a, key=key) == sorted(b, key=key)


def test_lam1_is_top_quality(spark):
    rows = _rows(seed=3)
    cents = _centroids()
    df = _df(spark, rows)
    sel = mmr_select(df, cents, k=15, quality_col="quality", lam=1.0)
    got = {r["doc_id"] for r in sel.collect()}
    # expected: per-cell top-quota by quality under the same quotas
    assigned = assign_lists(df, cents, "embedding")
    sizes = {
        int(r["ivf_list"]): int(r["n"])
        for r in assigned.groupBy("ivf_list").agg(F.count("*").alias("n")).collect()
    }
    quotas = apportion_quotas(15, sizes)
    exp = set()
    for cell, quota in quotas.items():
        members = [
            (r["quality"], r["doc_id"])
            for r in assigned.where(F.col("ivf_list") == cell).collect()
        ]
        members.sort(key=lambda t: (-t[0], t[1]))
        exp |= {d for _, d in members[:quota]}
    assert got == exp


def test_diversity_beats_pure_topk_on_planted_redundancy(spark):
    """A cluster of 20 near-identical high-quality docs plus mid-quality
    docs spread over orthogonal directions: pure top-quality (lam=1)
    fills its quota with clones, diversity-weighted MMR does not."""
    rng = np.random.default_rng(0)
    rows = []
    base = rng.normal(0, 0.02, DIM)
    base[0] += 1.0
    for i in range(20):  # clones, quality ~0.9, all along e0
        v = base + rng.normal(0, 0.005, DIM)
        rows.append((f"clone{i:02d}", [float(x) for x in v], 0.9 + i * 1e-4))
    for i in range(20):  # spread, quality 0.6, orthogonal dims e3..e7
        v = rng.normal(0, 0.02, DIM)
        v[3 + i % 5] += 1.0
        rows.append((f"spread{i:02d}", [float(x) for x in v], 0.6))
    cents = _centroids()

    def n_clones(lam):
        sel = mmr_select(
            _df(spark, rows), cents, k=10, quality_col="quality", lam=lam
        ).collect()
        assert len(sel) == 10
        return sum(1 for r in sel if r["doc_id"].startswith("clone"))

    diverse, greedy_quality = n_clones(0.3), n_clones(1.0)
    assert diverse < greedy_quality  # redundancy penalty bites
    assert diverse <= 3  # ~one clone representative is enough


def test_null_rows_excluded_and_k_overflow(spark):
    rows = _rows(n=9, seed=5)
    df = _df(spark, rows).unionByName(
        _df(
            spark,
            [("nullvec", None, 0.99)],
        )
    )
    sel = mmr_select(df, _centroids(), k=100, quality_col="quality")
    got = {r["doc_id"] for r in sel.collect()}
    assert got == {r[0] for r in rows}  # all 9 real rows, null excluded


def test_selection_audit_matches_numpy(spark):
    from medea_ps_spark.operators.diversity import selection_audit

    rows = _rows(n=60, seed=13)
    cents = _centroids()
    df = _df(spark, rows)
    sel = mmr_select(df, cents, k=12, quality_col="quality", lam=0.5)
    audit = {
        r["ivf_list"]: r
        for r in selection_audit(
            df, sel, cents, quality_col="quality"
        ).collect()
    }
    # numpy reference: same assignment, same metrics
    cnp = np.asarray(cents)
    sel_ids = {r["doc_id"] for r in sel.collect()}
    by_cell = {}
    for doc_id, vec, q in rows:
        cell = int(np.argmax(cnp @ np.asarray(vec)))
        by_cell.setdefault(cell, []).append((doc_id, np.asarray(vec), q))
    assert set(audit) == set(by_cell)
    for cell, members in by_cell.items():
        got = audit[cell]
        chosen = [(d, v, q) for d, v, q in members if d in sel_ids]
        assert got["n_total"] == len(members)
        assert got["n_selected"] == len(chosen)
        q_share = sum(q for _, _, q in chosen) / sum(q for _, _, q in members)
        assert got["quality_share"] == pytest.approx(q_share, abs=1e-6)
        if len(chosen) >= 2:
            units = np.stack([v / np.linalg.norm(v) for _, v, _ in chosen])
            sims = units @ units.T
            n = len(chosen)
            exp = (sims.sum() - n) / (n * (n - 1))  # mean off-diagonal
            assert got["mean_pairwise_cos"] == pytest.approx(exp, abs=1e-6)
        else:
            assert got["mean_pairwise_cos"] is None


def test_audit_redundancy_orders_mmr_below_topk(spark):
    """The audit's redundancy metric must rank a diversity-weighted
    selection below pure top-quality on the clone fixture."""
    from medea_ps_spark.operators.diversity import selection_audit

    rng = np.random.default_rng(1)
    rows = []
    base = rng.normal(0, 0.02, DIM)
    base[0] += 1.0
    for i in range(15):
        v = base + rng.normal(0, 0.005, DIM)
        rows.append((f"clone{i:02d}", [float(x) for x in v], 0.9 + i * 1e-4))
    for i in range(15):
        v = rng.normal(0, 0.02, DIM)
        v[3 + i % 3] += 1.0
        rows.append((f"spread{i:02d}", [float(x) for x in v], 0.6))
    cents = _centroids()
    df = _df(spark, rows)

    def redundancy(lam):
        sel = mmr_select(df, cents, k=8, quality_col="quality", lam=lam)
        rows_ = selection_audit(df, sel, cents, "quality").collect()
        vals = [
            r["mean_pairwise_cos"] for r in rows_
            if r["mean_pairwise_cos"] is not None and r["n_selected"] >= 2
        ]
        return max(vals) if vals else 0.0

    assert redundancy(0.3) < redundancy(1.0)
