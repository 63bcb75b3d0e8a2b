"""Pairwise JSD: identical/disjoint bounds, pure-python parity,
bucket folding sign-safety, partitioning invariance, DuckDB twin."""

from __future__ import annotations

import math

import duckdb
import pytest

from medea_ps_spark.operators.divergence import (
    js_divergence_pairs,
    source_divergence_matrix,
    token_bucket_counts,
)

LN2 = math.log(2.0)


def _seq_df(spark, data):
    return spark.createDataFrame(data, "source string, tokens array<int>")


def _py_jsd(ca, cb):
    """Reference JSD from two {bucket: count} dicts."""
    ta, tb = sum(ca.values()), sum(cb.values())
    s = 0.0
    for b in set(ca) | set(cb):
        p = ca.get(b, 0) / ta
        q = cb.get(b, 0) / tb
        m = (p + q) / 2
        if p > 0:
            s += 0.5 * p * math.log(p / m)
        if q > 0:
            s += 0.5 * q * math.log(q / m)
    return s


def test_identical_distributions_zero(spark):
    data = [("a", [1, 2, 3, 1]), ("b", [2, 1, 1, 3])]
    out = source_divergence_matrix(_seq_df(spark, data), n_buckets=None).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["g_a"], r["g_b"]) == ("a", "b")
    assert r["jsd"] == pytest.approx(0.0, abs=1e-9)


def test_disjoint_distributions_ln2(spark):
    data = [("a", [1, 1, 2]), ("b", [10, 11, 11])]
    r = source_divergence_matrix(_seq_df(spark, data), n_buckets=None).collect()[0]
    assert r["jsd"] == pytest.approx(round(LN2, 6))
    assert r["jsd_norm"] == pytest.approx(1.0)
    assert r["n_buckets_union"] == 4


def test_matches_python_reference(spark):
    import numpy as np

    rng = np.random.default_rng(42)
    data, dists = [], {}
    for g, scale in [("x", 5.0), ("y", 9.0), ("z", 5.2)]:
        toks = rng.geometric(1 / scale, size=3000).astype(int).tolist()
        dists[g] = {}
        for t in toks:
            dists[g][t] = dists[g].get(t, 0) + 1
        for i in range(0, len(toks), 100):
            data.append((g, toks[i : i + 100]))
    got = {
        (r["g_a"], r["g_b"]): r["jsd"]
        for r in source_divergence_matrix(
            _seq_df(spark, data), n_buckets=None
        ).collect()
    }
    for (a, b), jsd in got.items():
        assert jsd == pytest.approx(round(_py_jsd(dists[a], dists[b]), 6), abs=2e-6)
    # similar scales are closer than dissimilar ones
    assert got[("x", "z")] < got[("x", "y")]


def test_bucket_fold_sign_safe(spark):
    # negative (out-of-vocab) tokens fold like pmod, not C-style %
    data = [("a", [-5, -5, 3]), ("b", [507, 507, 3])]
    counts = token_bucket_counts(_seq_df(spark, data), n_buckets=512)
    rows = {(r["source"], r["bucket"]): r["cnt"] for r in counts.collect()}
    assert rows[("a", 507)] == 2  # pmod(-5, 512) == 507
    r = js_divergence_pairs(counts).collect()[0]
    assert r["jsd"] == pytest.approx(0.0, abs=1e-9)


def test_partitioning_invariance(spark):
    data = [("s%d" % (i % 3), [i % 40, (i * 7) % 40]) for i in range(300)]
    a = source_divergence_matrix(_seq_df(spark, data), n_buckets=64).collect()
    b = source_divergence_matrix(
        _seq_df(spark, data).repartition(7), n_buckets=64
    ).collect()
    key = lambda r: (r["g_a"], r["g_b"])
    assert sorted(a, key=key) == sorted(b, key=key)


def test_duckdb_twin(spark, tmp_path):
    import numpy as np

    rng = np.random.default_rng(7)
    data = []
    for g, scale in [("x", 4.0), ("y", 8.0), ("z", 4.1)]:
        toks = rng.geometric(1 / scale, size=2000).astype(int).tolist()
        for i in range(0, len(toks), 83):
            data.append((g, toks[i : i + 83]))
    df = _seq_df(spark, data)
    p = str(tmp_path / "seq.parquet")
    df.write.parquet(p)
    B = 32
    got = sorted(
        (r["g_a"], r["g_b"], r["n_buckets_union"], r["jsd"], r["jsd_norm"])
        for r in source_divergence_matrix(df, n_buckets=B).collect()
    )
    sql = f"""
        WITH c AS (
          SELECT source AS g, ((tok % {B}) + {B}) % {B} AS bucket,
                 CAST(count(*) AS DOUBLE) AS cnt
          FROM (SELECT source, unnest(tokens) AS tok
                FROM read_parquet('{p}/*.parquet'))
          GROUP BY 1, 2
        ),
        tot AS (SELECT g, sum(cnt) AS tot FROM c GROUP BY g),
        gs AS (SELECT DISTINCT g FROM c),
        pairs AS (SELECT a.g AS g_a, b.g AS g_b
                  FROM gs a JOIN gs b ON a.g < b.g),
        u AS (
          SELECT p.g_a, p.g_b, c.bucket, c.cnt AS ca, 0.0 AS cb
          FROM pairs p JOIN c ON c.g = p.g_a
          UNION ALL
          SELECT p.g_a, p.g_b, c.bucket, 0.0 AS ca, c.cnt AS cb
          FROM pairs p JOIN c ON c.g = p.g_b
        ),
        joint AS (
          SELECT g_a, g_b, bucket, sum(ca) AS ca, sum(cb) AS cb
          FROM u GROUP BY 1, 2, 3
        ),
        terms AS (
          SELECT j.g_a, j.g_b,
                 (CASE WHEN j.ca > 0 THEN 0.5 * (j.ca / ta.tot)
                       * ln((j.ca / ta.tot)
                            / ((j.ca / ta.tot + j.cb / tb.tot) / 2))
                       ELSE 0.0 END)
               + (CASE WHEN j.cb > 0 THEN 0.5 * (j.cb / tb.tot)
                       * ln((j.cb / tb.tot)
                            / ((j.ca / ta.tot + j.cb / tb.tot) / 2))
                       ELSE 0.0 END) AS term
          FROM joint j
          JOIN tot ta ON ta.g = j.g_a
          JOIN tot tb ON tb.g = j.g_b
        )
        SELECT g_a, g_b, CAST(count(*) AS BIGINT) AS n_buckets_union,
               round(sum(term), 6) AS jsd,
               round(sum(term) / ln(2.0), 6) AS jsd_norm
        FROM terms GROUP BY g_a, g_b ORDER BY g_a, g_b
    """
    exp = [tuple(r) for r in duckdb.sql(sql).fetchall()]
    assert len(got) == len(exp) == 3
    for g, e in zip(got, exp):
        assert g[:3] == e[:3]
        assert g[3] == pytest.approx(e[3], abs=1e-6)
        assert g[4] == pytest.approx(e[4], abs=1e-6)


def test_jsd_contributions_sum_and_rank(spark):
    from medea_ps_spark.operators.divergence import (
        jsd_contributions,
        token_bucket_counts,
    )

    data = [("a", [1, 1, 1, 2, 3]), ("b", [1, 2, 2, 2, 4])]
    counts = token_bucket_counts(_seq_df(spark, data), n_buckets=None)
    contrib = sorted(
        jsd_contributions(counts, top_n=10).collect(),
        key=lambda r: r["rank"],
    )
    pair = js_divergence_pairs(counts).collect()[0]
    # terms are non-negative, ranked descending, and sum to the JSD
    terms = [r["term"] for r in contrib]
    assert all(t >= 0 for t in terms)
    assert terms == sorted(terms, reverse=True)
    assert sum(terms) == pytest.approx(pair["jsd"], abs=5e-6)
    # a bucket with mass on only one side (3 or 4) dominates
    assert contrib[0]["bucket"] in (3, 4)
    # top_n truncation
    top2 = jsd_contributions(counts, top_n=2).collect()
    assert len(top2) == 2
    assert {r["rank"] for r in top2} == {1, 2}


def test_column_bucket_counts_scalar_and_string(spark):
    from medea_ps_spark.operators.divergence import column_bucket_counts

    df = spark.createDataFrame(
        [("a", "en", 10), ("a", "en", 12), ("a", "de", 11),
         ("b", "en", 10), ("b", "fr", 99), ("b", None, 10)],
        "source string, lang string, n_tok int",
    )
    # raw string categories: identical lang mix -> small JSD, NULL excluded
    lang_counts = column_bucket_counts(df, "lang")
    rows = {(r["source"], r["bucket"]): r["cnt"] for r in lang_counts.collect()}
    assert rows[("a", "en")] == 2 and ("b", None) not in rows
    jsd = js_divergence_pairs(lang_counts).collect()[0]
    assert 0.0 < jsd["jsd"] < LN2
    # hash-folded integral column: deterministic fold, full pipeline runs
    ncounts = column_bucket_counts(df, "n_tok", n_buckets=8)
    assert all(0 <= r["bucket"] < 8 for r in ncounts.collect())
    out = js_divergence_pairs(ncounts).collect()
    assert len(out) == 1 and out[0]["jsd"] >= 0.0
