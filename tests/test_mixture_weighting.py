"""Temperature mixture rates and deterministic fractional repetition
(operators/sampling.py): closed-form math vs hand computation,
feasibility (all rates <= 1, scarcest stratum kept whole), realized
mixture within sampling tolerance, repeat multiplicity as a pure
function of (key, seed), nesting, and a DuckDB parity check for the
explode path."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators.sampling import (
    rate_threshold,
    repeat_mixture,
    stratified_mixture,
    temperature_rates,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # 3 strata with very different sizes: 6000 web / 900 wiki / 100 code
    rows = (
        [(f"w{i}", "web") for i in range(6000)]
        + [(f"k{i}", "wiki") for i in range(900)]
        + [(f"c{i}", "code") for i in range(100)]
    )
    return spark.createDataFrame(rows, "doc_id string, source string")


def _expected_rates(counts, alpha, target_rows=None):
    weights = {s: n**alpha for s, n in counts.items()}
    wsum = sum(weights.values())
    shares = {s: w / wsum for s, w in weights.items()}
    total = min(counts[s] / shares[s] for s in counts)
    if target_rows is not None:
        total = min(total, target_rows)
    return {s: min(shares[s] * total / counts[s], 1.0) for s in counts}


COUNTS = {"web": 6000, "wiki": 900, "code": 100}


def test_temperature_rates_match_closed_form(corpus):
    for alpha in (0.0, 0.3, 0.5, 1.0):
        got = temperature_rates(corpus, alpha=alpha)
        want = _expected_rates(COUNTS, alpha)
        assert got.keys() == want.keys()
        for s in want:
            assert got[s] == pytest.approx(want[s], rel=1e-12), (alpha, s)
        # feasible by construction; the scarcest tempered stratum is whole
        assert max(got.values()) == pytest.approx(1.0)
        assert all(0.0 <= r <= 1.0 for r in got.values())


def test_temperature_rates_alpha_extremes(corpus):
    # alpha=1 keeps natural proportions → every rate 1.0 (no-op mixture)
    assert temperature_rates(corpus, alpha=1.0) == pytest.approx(
        {"web": 1.0, "wiki": 1.0, "code": 1.0}
    )
    # alpha=0 → uniform target: the smallest stratum caps the corpus
    got = temperature_rates(corpus, alpha=0.0)
    assert got["code"] == pytest.approx(1.0)
    assert got["web"] == pytest.approx(100 / 6000)
    assert got["wiki"] == pytest.approx(100 / 900)


def test_temperature_rates_target_rows_scales(corpus):
    full = temperature_rates(corpus, alpha=0.5)
    total_full = sum(full[s] * COUNTS[s] for s in COUNTS)
    half = temperature_rates(corpus, alpha=0.5, target_rows=int(total_full // 2))
    for s in COUNTS:
        assert half[s] == pytest.approx(full[s] * (total_full // 2) / total_full, rel=1e-9)


def test_temperature_mixture_realized_shares(corpus):
    alpha = 0.5
    rates = temperature_rates(corpus, alpha=alpha)
    out = (
        stratified_mixture(corpus, rates, seed=7)
        .groupBy("source")
        .count()
        .collect()
    )
    got = {r["source"]: r["count"] for r in out}
    for s, n in COUNTS.items():
        # binomial tolerance: 4 sigma
        exp = rates[s] * n
        sigma = (n * rates[s] * (1 - rates[s])) ** 0.5
        assert abs(got.get(s, 0) - exp) <= 4 * sigma + 1, s


def test_temperature_rates_validation(corpus):
    with pytest.raises(ValueError):
        temperature_rates(corpus, alpha=-0.1)
    with pytest.raises(ValueError):
        temperature_rates(corpus, alpha=0.5, target_rows=0)


def test_repeat_mixture_multiplicity_and_expectation(spark):
    df = spark.createDataFrame(
        [(f"d{i}", "wiki") for i in range(4000)]
        + [(f"e{i}", "web") for i in range(4000)],
        "doc_id string, source string",
    )
    out = repeat_mixture(df, {"wiki": 2.4, "web": 0.6}, seed=11)
    per_doc = {
        (r["doc_id"], r["source"]): r["n"]
        for r in out.groupBy("doc_id", "source").agg(F.count("*").alias("n")).collect()
    }
    wiki_n = [per_doc.get((f"d{i}", "wiki"), 0) for i in range(4000)]
    web_n = [per_doc.get((f"e{i}", "web"), 0) for i in range(4000)]
    assert set(wiki_n) <= {2, 3} and set(web_n) <= {0, 1}
    assert sum(wiki_n) / 4000 == pytest.approx(2.4, abs=0.05)
    assert sum(web_n) / 4000 == pytest.approx(0.6, abs=0.05)
    # epochs are 0-based and dense per copy
    epochs = (
        out.where(F.col("doc_id") == "d0").select("epoch").orderBy("epoch").collect()
    )
    assert [r["epoch"] for r in epochs] == list(range(len(epochs)))


def test_repeat_mixture_deterministic_and_nested(spark):
    df = spark.createDataFrame(
        [(f"d{i}", "wiki") for i in range(2000)], "doc_id string, source string"
    )

    def multiset(factor):
        out = repeat_mixture(df, {"wiki": factor}, seed=5)
        return {
            r["doc_id"]: r["n"]
            for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
        }

    a1 = multiset(1.3)
    a2 = multiset(1.3)
    assert a1 == a2  # pure function of (key, seed)
    b = multiset(1.7)
    # raising the fractional part only ADDS copies (nested thresholds)
    assert all(b[d] >= a1.get(d, 0) for d in b)
    # repartitioned input → same multiset
    out_re = repeat_mixture(df.repartition(13), {"wiki": 1.3}, seed=5)
    c = {
        r["doc_id"]: r["n"]
        for r in out_re.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert c == a1


def test_repeat_mixture_duckdb_parity(spark):
    """The realized copy count must equal the SQL twin: floor(f) +
    (md5 coordinate < threshold(frac))."""
    df = spark.createDataFrame(
        [(f"d{i}", "wiki" if i % 3 else "web") for i in range(900)],
        "doc_id string, source string",
    )
    factors, seed = {"wiki": 2.25, "web": 0.75}, 9
    got = {
        r["doc_id"]: r["n"]
        for r in repeat_mixture(df, factors, seed=seed)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    pdf = df.toPandas()
    thr_wiki = rate_threshold(0.25)
    thr_web = rate_threshold(0.75)
    want = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"""
        SELECT doc_id,
               CASE WHEN source = 'wiki'
                    THEN 2 + CASE WHEN substr(md5(doc_id || ':{seed}'), 1, 8)
                                       < '{thr_wiki}' THEN 1 ELSE 0 END
                    ELSE 0 + CASE WHEN substr(md5(doc_id || ':{seed}'), 1, 8)
                                       < '{thr_web}' THEN 1 ELSE 0 END
               END AS n
        FROM pdf
        """
        ).fetchall()
        if r[1] > 0
    }
    assert got == want


def test_repeat_mixture_plan_is_map_only(spark):
    """Factor application + copy explode must be a single map-side
    pipeline: no Exchange, no join, no aggregation — the stratum
    column never becomes a shuffle key."""
    df = spark.range(1000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "wiki").otherwise("web").alias("source"),
    )
    out = repeat_mixture(df, {"wiki": 2.5, "web": 0.5}, seed=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan and "HashAggregate" not in plan


def test_repeat_mixture_validation(spark):
    df = spark.createDataFrame([("a", "s")], "doc_id string, source string")
    with pytest.raises(ValueError):
        repeat_mixture(df, {"s": -1.0})
    with pytest.raises(ValueError):
        repeat_mixture(df, {"s": 1.0}, default_factor=-0.5)
