"""Stats, sketches, drift — SURVEY.md §7 steps 4-6."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from medea_ps_spark.functions.stats_math import chi2_sf, kolmogorov_sf, ks_2samp_pvalue
from medea_ps_spark.operators import drift as D
from medea_ps_spark.operators import sketches as SK
from medea_ps_spark.operators import stats as ST
from medea_ps_spark.operators.referential import salted_anti_join
from medea_ps_spark.plans.constraints import StatsBound
from medea_ps_spark.sources import synthetic


@pytest.fixture(scope="module")
def seq_df(spark):
    df = synthetic.sequences(spark, 10_000, seed=42)
    df.cache().count()
    return df


# -- stats -------------------------------------------------------------------


def test_column_stats_matches_pandas(spark, seq_df):
    got = {r["source"]: r for r in ST.column_stats(seq_df, ["n_tok"], "source").collect()}
    pdf = seq_df.toPandas()
    for src, g in pdf.groupby("source"):
        r = got[src]
        assert r["n_rows"] == len(g)
        assert r["n_tok_min"] == g.n_tok.min()
        assert r["n_tok_max"] == g.n_tok.max()
        assert abs(r["n_tok_avg"] - g.n_tok.mean()) < 1e-9


def test_stats_single_pass_plan(seq_df):
    # numeric-only stats must stay in (whole-stage) HashAggregate
    out = ST.column_stats(seq_df, ["n_tok"], "source")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # partial->final agg exchange only
    assert "HashAggregate" in plan and "SortAggregate" not in plan
    # string min/max legally falls back to Sort/ObjectHashAggregate
    # (immutable agg buffer) — still a single exchange
    out2 = ST.column_stats(seq_df, ["n_tok", "doc_id"], "source")
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("Exchange") <= 2


def test_stats_bounds(spark, seq_df):
    v = ST.stats_bound_verdicts(
        seq_df,
        [
            StatsBound("null_rate_ok", "doc_id", agg="null_rate", hi=0.01),
            StatsBound("ntok_max_ok", "n_tok", agg="max", hi=1),  # must fail
        ],
        "source",
    ).collect()
    by = {(r["source"], r["constraint_id"]): r for r in v}
    assert all(r["passed"] for (s, c), r in by.items() if c == "null_rate_ok")
    assert not any(r["passed"] for (s, c), r in by.items() if c == "ntok_max_ok")


def test_uniqueness_report(spark, seq_df):
    r = ST.uniqueness_report(seq_df, "doc_id").collect()[0]
    exact = seq_df.select("doc_id").where(F.col("doc_id").isNotNull()).distinct().count()
    assert r["n_rows"] == 10_000
    assert abs(r["approx_distinct"] - exact) / exact < 0.05


# -- stats math ---------------------------------------------------------------


def test_chi2_sf_reference_values():
    # classic table values
    assert abs(chi2_sf(3.841, 1) - 0.05) < 2e-3
    assert abs(chi2_sf(18.307, 10) - 0.05) < 2e-3
    assert chi2_sf(0.0, 5) == 1.0
    assert chi2_sf(1000.0, 5) < 1e-100


def test_kolmogorov_sf_reference_values():
    assert abs(kolmogorov_sf(1.36) - 0.049) < 2e-3
    assert kolmogorov_sf(0.3) > 0.99
    assert kolmogorov_sf(3.0) < 1e-6


# -- t-digest ------------------------------------------------------------------


def test_tdigest_quantiles_close_to_numpy():
    rng = np.random.default_rng(0)
    vals = rng.lognormal(3.0, 1.0, size=50_000)
    d = SK.TDigest.from_values(vals, compression=200)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        got = d.quantile(q)
        want = float(np.quantile(vals, q))
        assert abs(got - want) / want < 0.05, (q, got, want)


def test_tdigest_merge_equals_whole():
    rng = np.random.default_rng(1)
    a, b = rng.normal(0, 1, 20_000), rng.normal(5, 2, 20_000)
    merged = SK.TDigest.from_values(a, 200).merge(SK.TDigest.from_values(b, 200))
    whole = np.concatenate([a, b])
    for q in (0.1, 0.5, 0.9):
        got = merged.quantile(q)
        want = float(np.quantile(whole, q))
        assert abs(got - want) < 0.15, (q, got, want)


def test_tdigest_codec_roundtrip():
    d = SK.TDigest.from_values(np.arange(1000.0), 100)
    d2 = SK.TDigest.from_bytes(d.to_bytes())
    assert np.allclose(d.means, d2.means) and np.allclose(d.weights, d2.weights)
    assert d2.compression == 100


def test_distributed_quantiles(spark, seq_df):
    qs = SK.quantiles(seq_df, "n_tok", [0.5, 0.9], "source")
    pdf = seq_df.select("n_tok").toPandas()
    for q, got in qs:
        want = float(pdf.n_tok.quantile(q))
        assert abs(got - want) / max(want, 1) < 0.08, (q, got, want)


# -- histogram + drift ----------------------------------------------------------


def test_histogram_total(spark, seq_df):
    h = SK.histogram(seq_df, "n_tok", 1, synthetic.MAX_LEN, 32)
    assert h.agg(F.sum("bucket_count")).collect()[0][0] == 10_000


def test_drift_clean_vs_shifted(spark):
    clean = synthetic.sequences(spark, 20_000, seed=1, clean=True)
    prof = D.build_profile(
        clean,
        {
            "n_tok": {"column": "n_tok", "lo": 1, "hi": synthetic.MAX_LEN},
            "token_values": {"token_array": "tokens", "lo": 0, "hi": synthetic.VOCAB},
        },
    )
    # same distribution, different seed → must NOT flag
    same = synthetic.sequences(spark, 20_000, seed=2, clean=True)
    verdicts = D.drift_verdicts(
        same, prof,
        [{"name": "n_tok", "test": "chi2"}, {"name": "n_tok", "test": "ks"},
         {"name": "token_values", "test": "chi2", "token_array": True}],
        alpha=0.001,
    )
    assert not any(v["drifted"] for v in verdicts), verdicts
    # shifted epoch (+20% n_tok → clip) → MUST flag (FIXTURES.md §3)
    shifted = same.withColumn(
        "n_tok", F.least((F.col("n_tok") * 1.2).cast("int"), F.lit(synthetic.MAX_LEN))
    )
    verdicts = D.drift_verdicts(
        shifted, prof,
        [{"name": "n_tok", "test": "chi2"}, {"name": "n_tok", "test": "ks"}],
        alpha=0.001,
    )
    assert all(v["drifted"] for v in verdicts), verdicts


def test_profile_json_roundtrip(spark):
    clean = synthetic.sequences(spark, 2_000, seed=1, clean=True)
    prof = D.build_profile(clean, {"n_tok": {"column": "n_tok", "lo": 1, "hi": 8192}})
    prof2 = D.ReferenceProfile.from_json(prof.to_json())
    assert prof2.columns["n_tok"].counts == prof.columns["n_tok"].counts


# -- salted anti-join -------------------------------------------------------------


def test_salted_inner_join_matches_plain(spark, seq_df):
    from medea_ps_spark.operators.referential import salted_inner_join

    dim = synthetic.allowed_sources(spark)
    plain = seq_df.join(dim, "source", "inner")
    salted = salted_inner_join(seq_df, dim, "source", salt_buckets=8)
    assert salted.count() == plain.count()
    a = {tuple(r) for r in plain.select("doc_id", "license_ok").collect()}
    b = {tuple(r) for r in salted.select("doc_id", "license_ok").collect()}
    assert a == b


def test_salted_anti_join_matches_plain(spark, seq_df):
    dim = synthetic.allowed_sources(spark)
    plain = seq_df.join(dim.select("source"), "source", "left_anti")
    salted = salted_anti_join(seq_df, dim, "source", id_column="doc_id")
    assert salted.count() == plain.count()
    got = {r["doc_id"] for r in salted.select("doc_id").collect()}
    want = {r["doc_id"] for r in plain.select("doc_id").collect()}
    assert got == want
