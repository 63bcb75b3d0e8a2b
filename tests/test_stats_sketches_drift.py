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


# -- Count-Min sketch ---------------------------------------------------------


@pytest.fixture(scope="module")
def zipf_words(spark):
    """~6K word occurrences over ~330 distinct words, Zipf-ish: word_i
    appears ceil(600/i) times. Deterministic."""
    rows = []
    for i in range(1, 331):
        rows.extend([(f"w{i:03d}",)] * (600 // i + 1))
    return spark.createDataFrame(rows, "word string")


def _true_counts(df):
    return {
        r["word"]: r["n"]
        for r in df.groupBy("word").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_cms_never_underestimates_and_error_bounded(spark, zipf_words):
    depth, width = 4, 1024
    sk = SK.count_min_sketch(zipf_words, "word", depth, width)
    est = {
        r["item"]: r["est"]
        for r in SK.cms_estimate(sk, zipf_words, "word", depth, width).collect()
    }
    true = _true_counts(zipf_words)
    n_total = sum(true.values())
    assert set(est) == set(true)
    overs = []
    for w, t in true.items():
        assert est[w] >= t, f"CMS underestimated {w}: {est[w]} < {t}"
        overs.append(est[w] - t)
    # ε = e/width bound: P(over > εN) ≤ e^-depth per item; with 330
    # items and depth 4 none should exceed it (generous ×1 bound).
    eps_n = math.e / width * n_total
    assert max(overs) <= eps_n, (max(overs), eps_n)


def test_cms_merge_equals_whole(spark, zipf_words):
    depth, width = 4, 512
    # exact split: hash parity (every occurrence of a word goes one side)
    a = zipf_words.where(F.crc32(F.col("word")) % 2 == 0)
    b = zipf_words.where(F.crc32(F.col("word")) % 2 == 1)
    merged = SK.cms_merge(
        SK.count_min_sketch(a, "word", depth, width),
        SK.count_min_sketch(b, "word", depth, width),
    )
    whole = SK.count_min_sketch(zipf_words, "word", depth, width)
    m = {(r["depth_row"], r["cell"]): r["c"] for r in merged.collect()}
    w = {(r["depth_row"], r["cell"]): r["c"] for r in whole.collect()}
    assert m == w


def test_cms_counter_table_bit_identical_in_duckdb(spark, zipf_words):
    """The md5-lane cells make the sketch engine-portable: DuckDB
    rebuilds the identical counter table from the same rows."""
    duckdb = pytest.importorskip("duckdb")
    depth, width, salt = 3, 256, "cms"
    got = sorted(
        (r["depth_row"], r["cell"], r["c"])
        for r in SK.count_min_sketch(
            zipf_words, "word", depth, width, salt
        ).collect()
    )
    pdf = zipf_words.toPandas()
    con = duckdb.connect()
    con.register("words", pdf)
    want = sorted(
        tuple(t)
        for t in con.execute(
            f"""
            WITH cells AS (
              SELECT r AS depth_row,
                     CAST(('0x' || substr(
                        md5('{salt}' || ':' || r || ':' || word), 1, 15
                     ))::BIGINT % {width} AS INT) AS cell
              FROM words, range(0, {depth}) t(r)
            )
            SELECT depth_row, cell, count(*) AS c
            FROM cells GROUP BY 1, 2
            """
        ).fetchall()
    )
    assert got == want


def test_cms_heavy_hitters_finds_true_top(spark, zipf_words):
    top = SK.cms_heavy_hitters(zipf_words, "word", k=10, depth=4, width=2048)
    got = [r["item"] for r in top.collect()]
    true = _true_counts(zipf_words)
    true_top10 = [
        w for w, _ in sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    ]
    assert got == true_top10


def test_cms_token_array_mode(spark):
    df = spark.createDataFrame(
        [(1, [5, 5, 7]), (2, [7, None, 9]), (3, None)],
        "id int, tokens array<int>",
    )
    sk = SK.count_min_sketch(df, "tokens", 2, 64, explode_arrays=True)
    items = spark.createDataFrame([(5,), (7,), (9,), (11,)], "item int")
    est = {
        r["item"]: r["est"]
        for r in SK.cms_estimate(sk, items, "item", 2, 64).collect()
    }
    assert est[5] >= 2 and est[7] >= 2 and est[9] >= 1
    assert est[11] >= 0  # absent item still gets a (possibly 0) estimate


def test_stats_bound_quantile_and_approx_distinct(spark, seq_df):
    """The sketch-backed aggs: quantile (percentile_approx) vs a numpy
    exact quantile within sketch tolerance, approx_distinct (HLL++) vs
    the exact distinct count within rsd tolerance — both bound-checked
    through the same verdict path as the exact aggs."""
    import numpy as np

    pdf = seq_df.select("source", "n_tok", "doc_id").toPandas()
    v = ST.stats_bound_verdicts(
        seq_df,
        [
            StatsBound("p95_ntok", "n_tok", agg="quantile", q=0.95, hi=1e12),
            StatsBound(
                "docs_card", "doc_id", agg="approx_distinct", lo=1, rsd=0.02
            ),
            StatsBound(
                "p50_must_fail", "n_tok", agg="quantile", q=0.5, hi=-1
            ),
        ],
        "source",
    ).collect()
    by = {(r["source"], r["constraint_id"]): r for r in v}
    for src, g in pdf.groupby("source"):
        obs = by[(src, "p95_ntok")]["observed"]
        vals = g["n_tok"].to_numpy().astype(float)
        # percentile_approx returns an actual ELEMENT near the target
        # rank — assert its empirical rank lands in a generous band
        # around 0.95 (small groups quantize the rank coarsely)
        assert obs in set(vals), (src, obs)
        assert np.mean(vals <= obs) >= 0.90, (src, obs)
        assert np.mean(vals < obs) <= 0.99, (src, obs)
        assert by[(src, "p95_ntok")]["passed"]
        nd = by[(src, "docs_card")]["observed"]
        exact_d = g["doc_id"].dropna().nunique()
        assert abs(nd - exact_d) / max(exact_d, 1) < 0.1, (src, nd, exact_d)
        assert by[(src, "docs_card")]["passed"]
        assert not by[(src, "p50_must_fail")]["passed"]


def test_stats_bound_quantile_needs_q():
    from medea_ps_spark.errors import SchemaError
    from medea_ps_spark.plans.compiler import Registry
    from medea_ps_spark.plans.constraints import ConstraintSet
    import pyspark.sql.types as T

    schema = T.StructType([T.StructField("n_tok", T.IntegerType())])
    for bad_q in (None, 0.0, 1.0, 1.5):
        reg = Registry().register(
            ConstraintSet(
                "$start",
                [StatsBound("b", "n_tok", agg="quantile", q=bad_q, hi=1)],
            )
        )
        with pytest.raises(SchemaError):
            reg.compile(schema)
    # serde round-trips the sketch fields
    from medea_ps_spark.plans import serde

    c = StatsBound("b", "n_tok", agg="quantile", q=0.99, accuracy=500, hi=9)
    assert serde.constraint_from_dict(serde.constraint_to_dict(c)) == c


def test_stats_bound_sketch_aggs_validate_on_direct_call(spark, seq_df):
    """Operator-level validation (no Registry.compile in the path):
    missing q / bad accuracy / bad rsd raise ValueError naming the
    constraint instead of TypeError or an opaque Spark error."""
    for bad in (
        StatsBound("b", "n_tok", agg="quantile", hi=1),
        StatsBound("b", "n_tok", agg="quantile", q=1.5, hi=1),
        StatsBound("b", "n_tok", agg="quantile", q=0.5, accuracy=0, hi=1),
        StatsBound("b", "doc_id", agg="approx_distinct", rsd=0.0, lo=1),
    ):
        with pytest.raises(ValueError, match="b:"):
            ST.stats_bound_verdicts(seq_df, [bad], "source")


# ---------------------------------------------------------------------------
# PSI (population stability index)
# ---------------------------------------------------------------------------


def test_psi_math_reference():
    # identical counts -> exactly 0, any eps
    same = np.array([5.0, 10.0, 85.0])
    assert D._psi_from_counts(same, same * 3, eps=1e-4) == 0.0
    # hand-checked two-bucket case, no flooring in play:
    # p_o=(0.5,0.5), p_e=(0.25,0.75) -> .25*ln2 + (-.25)*ln(2/3)
    obs = np.array([50.0, 50.0])
    exp = np.array([25.0, 75.0])
    want = 0.25 * math.log(2.0) + (-0.25) * math.log(0.5 / 0.75)
    assert D._psi_from_counts(obs, exp, eps=1e-12) == pytest.approx(want, rel=1e-12)
    # an empty observed bucket is finite thanks to the eps floor
    got = D._psi_from_counts(np.array([0.0, 100.0]), exp, eps=1e-4)
    assert math.isfinite(got) and got > 0.25
    # bands
    assert D.psi_band(0.05) == "stable"
    assert D.psi_band(0.2) == "moderate"
    assert D.psi_band(0.9) == "major"
    assert D.psi_band(float("nan")) == "undefined"


def test_psi_clean_vs_shifted(spark):
    clean = synthetic.sequences(spark, 20_000, seed=1, clean=True)
    prof = D.build_profile(
        clean, {"n_tok": {"column": "n_tok", "lo": 1, "hi": synthetic.MAX_LEN}}
    )
    same = synthetic.sequences(spark, 20_000, seed=2, clean=True)
    ok = D.psi_drift(same, prof, "n_tok")
    assert ok["band"] == "stable" and not ok["drifted"], ok
    shifted = same.withColumn(
        "n_tok",
        F.least((F.col("n_tok") * 1.5).cast("int"), F.lit(synthetic.MAX_LEN)),
    )
    bad = D.psi_drift(shifted, prof, "n_tok")
    assert bad["drifted"] and bad["band"] == "major", bad
    # and via the drift_verdicts front door, mixed with chi2
    verdicts = D.drift_verdicts(
        shifted, prof,
        [{"name": "n_tok", "test": "psi"}, {"name": "n_tok", "test": "chi2"}],
    )
    assert all(v["drifted"] for v in verdicts), verdicts
    # magnitude-vs-significance: PSI of the same-distribution epoch is
    # far below even the moderate band (chi2 p-values would eventually
    # flag ANY difference at scale; PSI stays scale-free)
    assert ok["stat"] < 0.02


def test_psi_by_partition_flags_only_shifted_source(spark):
    clean = synthetic.sequences(spark, 40_000, seed=3, clean=True)
    prof = D.build_profile(
        clean, {"n_tok": {"column": "n_tok", "lo": 1, "hi": synthetic.MAX_LEN}}
    )
    cur = synthetic.sequences(spark, 40_000, seed=4, clean=True)
    # plant the shift in ONE source only
    cur = cur.withColumn(
        "n_tok",
        F.when(
            F.col("source") == "web-2025",
            F.least((F.col("n_tok") * 1.5).cast("int"), F.lit(synthetic.MAX_LEN)),
        ).otherwise(F.col("n_tok")),
    )
    verdicts = D.psi_drift_by_partition(cur, prof, "n_tok", "source")
    by_src = {v["partition"]: v for v in verdicts}
    assert by_src["web-2025"]["drifted"], by_src["web-2025"]
    # the dominant unshifted sources stay clean (skip tiny tail sources
    # whose sampling noise is legitimate)
    big_clean = [
        v for v in verdicts
        if v["partition"] != "web-2025" and v.get("n", 0) >= 2000
    ]
    assert big_clean and not any(v["drifted"] for v in big_clean), big_clean


def test_psi_spark_matches_numpy_exactly(spark):
    """The Spark side only produces bucket counts; PSI math must equal a
    direct numpy computation on pandas-derived counts bit-for-bit."""
    clean = synthetic.sequences(spark, 10_000, seed=5, clean=True)
    prof = D.build_profile(
        clean, {"n_tok": {"column": "n_tok", "lo": 1, "hi": synthetic.MAX_LEN}}
    )
    cur = synthetic.sequences(spark, 10_000, seed=6, clean=True)
    got = D.psi_drift(cur, prof, "n_tok")
    p = prof.columns["n_tok"]
    pdf = cur.select("n_tok").toPandas()
    width = (p.hi - p.lo) / p.nbuckets
    idx = np.clip(
        np.floor((pdf["n_tok"].to_numpy(float) - p.lo) / width), 0, p.nbuckets - 1
    ).astype(int)
    obs = np.bincount(idx, minlength=p.nbuckets).astype(float)
    want = D._psi_from_counts(obs, np.array(p.counts, float), eps=1e-4)
    assert got["stat"] == want
