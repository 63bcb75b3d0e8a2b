"""KMV vocabulary overlap: exactness under k, estimator parity with a
pure-python reimplementation, null-group exclusion, and DuckDB twin."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators.vocab import (
    kmv_group_minima,
    kmv_jaccard_pairs,
    token_vocab_minima,
)


def _hx(value, salt="kmv"):
    return hashlib.md5(f"{value}:{salt}".encode()).hexdigest()[:8]


def _py_pairs(vocabs, k):
    """Reference estimator over {group: set(token)}."""
    sketches = {
        g: sorted(_hx(t) for t in vs)[:k] for g, vs in vocabs.items()
    }
    out = {}
    for a in sorted(vocabs):
        for b in sorted(vocabs):
            if not (a < b):
                continue
            union = sorted(set(sketches[a]) | set(sketches[b]))[:k]
            shared = sum(
                1 for h in union if h in set(sketches[a]) and h in set(sketches[b])
            )
            out[(a, b)] = (len(union), shared)
    return out


def _seq_df(spark, data):
    return spark.createDataFrame(
        data, "source string, tokens array<int>"
    )


def test_exact_when_vocab_under_k(spark):
    data = [
        ("a", [1, 2, 3, 4]),
        ("a", [3, 4, 5]),
        ("b", [4, 5, 6]),
        ("c", [100, 101]),
    ]
    minima = token_vocab_minima(_seq_df(spark, data), k=64)
    got = {
        (r["g_a"], r["g_b"]): (r["k_used"], r["n_shared"], r["jaccard_est"])
        for r in kmv_jaccard_pairs(minima, k=64).collect()
    }
    # under k the sketch is the full set: estimates are exact Jaccard
    assert got[("a", "b")][1] / got[("a", "b")][0] == pytest.approx(2 / 6)
    assert got[("a", "c")][1] == 0 and got[("a", "c")][2] == 0.0
    assert got[("b", "c")][1] == 0
    assert got[("a", "b")][2] == pytest.approx(round(2 / 6, 6))


def test_estimator_matches_python_reference(spark):
    data = []
    for g, lo, hi in [("a", 0, 400), ("b", 200, 600), ("c", 300, 450)]:
        toks = list(range(lo, hi))
        for i in range(0, len(toks), 37):
            data.append((g, toks[i : i + 37]))
    k = 50  # vocab (400) >> k: genuinely approximate
    minima = token_vocab_minima(_seq_df(spark, data), k=k)
    got = {
        (r["g_a"], r["g_b"]): (r["k_used"], r["n_shared"])
        for r in kmv_jaccard_pairs(minima, k=k).collect()
    }
    vocabs = {"a": set(range(0, 400)), "b": set(range(200, 600)),
              "c": set(range(300, 450))}
    assert got == _py_pairs(vocabs, k)
    # and the estimate is in the neighborhood of the true Jaccard
    true_ab = len(vocabs["a"] & vocabs["b"]) / len(vocabs["a"] | vocabs["b"])
    est_ab = got[("a", "b")][1] / got[("a", "b")][0]
    assert abs(est_ab - true_ab) < 0.2


def test_null_group_never_pairs(spark):
    data = [("a", [1, 2]), (None, [1, 2, 3]), ("b", [2, 3])]
    minima = token_vocab_minima(_seq_df(spark, data), k=16)
    pairs = kmv_jaccard_pairs(minima, k=16).collect()
    assert {(r["g_a"], r["g_b"]) for r in pairs} == {("a", "b")}


def test_partitioning_invariance(spark):
    data = [("s%d" % (i % 4), [i, i * 3 % 97, i * 7 % 89]) for i in range(200)]
    a = kmv_jaccard_pairs(
        token_vocab_minima(_seq_df(spark, data), k=20), k=20
    ).collect()
    b = kmv_jaccard_pairs(
        token_vocab_minima(_seq_df(spark, data).repartition(7), k=20), k=20
    ).collect()
    key = lambda r: (r["g_a"], r["g_b"])
    assert sorted(a, key=key) == sorted(b, key=key)


def test_duckdb_twin(spark, tmp_path):
    """The exact SQL the driver oracle uses reproduces the estimator
    hash-for-hash (md5 parity across engines)."""
    data = []
    for g, lo, hi in [("x", 0, 150), ("y", 100, 260)]:
        toks = list(range(lo, hi))
        for i in range(0, len(toks), 23):
            data.append((g, toks[i : i + 23]))
    df = _seq_df(spark, data)
    p = str(tmp_path / "seq.parquet")
    df.write.parquet(p)
    k = 40
    got = sorted(
        (
            (r["g_a"], r["g_b"], r["k_used"], r["n_shared"], r["jaccard_est"])
            for r in kmv_jaccard_pairs(
                token_vocab_minima(df, k=k), k=k
            ).collect()
        )
    )
    sql = f"""
        WITH ex AS (
          SELECT source AS g,
                 substr(md5(CAST(tok AS VARCHAR) || ':kmv'), 1, 8) AS hx
          FROM (SELECT source, unnest(tokens) AS tok
                FROM read_parquet('{p}/*.parquet'))
          WHERE tok IS NOT NULL
        ),
        m AS (
          SELECT g, hx FROM (
            SELECT g, hx,
                   row_number() OVER (PARTITION BY g ORDER BY hx) AS rn
            FROM (SELECT DISTINCT g, hx FROM ex)
          ) WHERE rn <= {k}
        ),
        gs AS (SELECT DISTINCT g FROM m),
        pairs AS (SELECT a.g AS g_a, b.g AS g_b
                  FROM gs a JOIN gs b ON a.g < b.g),
        u AS (
          SELECT p.g_a, p.g_b, m.hx, 1 AS in_a, 0 AS in_b
          FROM pairs p JOIN m ON m.g = p.g_a
          UNION ALL
          SELECT p.g_a, p.g_b, m.hx, 0 AS in_a, 1 AS in_b
          FROM pairs p JOIN m ON m.g = p.g_b
        ),
        memb AS (
          SELECT g_a, g_b, hx, max(in_a) AS in_a, max(in_b) AS in_b
          FROM u GROUP BY g_a, g_b, hx
        ),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY g_a, g_b ORDER BY hx)
                   AS rn
          FROM memb
        )
        SELECT g_a, g_b,
               CAST(count(*) AS BIGINT) AS k_used,
               CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_shared,
               round(CAST(sum(CASE WHEN in_a = 1 AND in_b = 1
                              THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS jaccard_est
        FROM ranked WHERE rn <= {k}
        GROUP BY g_a, g_b
        ORDER BY g_a, g_b
    """
    exp = duckdb.sql(sql).fetchall()
    assert got == [tuple(r) for r in exp]


def test_jaccard_between_snapshots(spark):
    from medea_ps_spark.operators.vocab import kmv_jaccard_between

    snap_a = [("a", [1, 2, 3, 4]), ("b", [10, 11]), ("only_a", [7])]
    snap_b = [("a", [3, 4, 5, 6]), ("b", [10, 11]), ("only_b", [9])]
    k = 32
    ma = token_vocab_minima(_seq_df(spark, snap_a), k=k)
    mb = token_vocab_minima(_seq_df(spark, snap_b), k=k)
    got = {
        r["source"]: (r["k_used"], r["n_shared"], r["jaccard_est"])
        for r in kmv_jaccard_between(ma, mb, k=k).collect()
    }
    # groups without a counterpart are not compared
    assert set(got) == {"a", "b"}
    # under k the estimate is exact: a {1,2,3,4} vs {3,4,5,6} -> 2/6
    assert got["a"] == (6, 2, round(2 / 6, 6))
    assert got["b"] == (2, 2, 1.0)  # identical vocabulary


def test_jaccard_between_matches_pairwise_on_disjoint_labels(spark):
    """Relabelling snapshot B's groups and using the PAIRWISE form
    must agree with the between-form (same estimator)."""
    from medea_ps_spark.operators.vocab import kmv_jaccard_between

    k = 25
    data_a = [("g", list(range(0, 300, 3)))]
    data_b = [("g", list(range(0, 300, 5)))]
    ma = token_vocab_minima(_seq_df(spark, data_a), k=k)
    mb = token_vocab_minima(_seq_df(spark, data_b), k=k)
    between = kmv_jaccard_between(ma, mb, k=k).collect()[0]
    pair = kmv_jaccard_pairs(
        ma.selectExpr("'x' AS source", "hx", "rn").unionByName(
            mb.selectExpr("'y' AS source", "hx", "rn")
        ),
        k=k,
    ).collect()[0]
    assert (between["k_used"], between["n_shared"]) == (
        pair["k_used"], pair["n_shared"]
    )
