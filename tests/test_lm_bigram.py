"""Interpolated-bigram LM scoring + CCNet quantile bucketing
(operators/lmscore.py round-5 additions): pure-Python reference parity,
frozen-profile OOV behavior, token-native twin, bucketing semantics,
and the 100-TB plan gates (pre-aggregated join input, broadcast model
relations, sketch-only thresholds)."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators.lmscore import (
    bigram_counts,
    bigram_lm_scores,
    quantile_buckets,
    unigram_counts,
)


def _py_bigram_bits(doc_words, ref_docs, lam=0.75, alpha=1.0):
    """Independent reference: interpolated-bigram bits/token for ONE
    document against a reference corpus (list of word lists)."""
    uni = Counter(w for d in ref_docs for w in d)
    bi = Counter(
        (a, b) for d in ref_docs for a, b in zip(d, d[1:])
    )
    ctx = Counter()
    for (a, _b), n in bi.items():
        ctx[a] += n
    N = sum(uni.values())
    V = len(uni)
    bits = 0.0
    trans = list(zip(doc_words, doc_words[1:]))
    for a, b in trans:
        p_bi = (bi[(a, b)] + alpha) / (ctx[a] + alpha * (V + 1))
        p_uni = (uni[b] + alpha) / (N + alpha * (V + 1))
        bits += -math.log2(lam * p_bi + (1 - lam) * p_uni)
    return bits / len(trans), len(trans)


_DOCS = [
    ("d1", "the cat sat on the mat"),
    ("d2", "the cat ran"),
    ("d3", "a dog sat"),
    ("d4", "solo"),  # 1 term: no transitions, absent from output
    ("d5", None),  # NULL text: absent
    ("d6", "the the the the"),  # repeated transition (weighted path)
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_DOCS, "doc_id string, text string")


def test_self_scored_matches_python_reference(docs):
    ref_words = [t.split() for _i, t in _DOCS if t and len(t.split()) >= 1]
    out = {
        r["doc_id"]: r
        for r in bigram_lm_scores(docs, lam=0.75).collect()
    }
    assert set(out) == {"d1", "d2", "d3", "d6"}
    for did, text in _DOCS:
        words = text.split() if text else []
        if len(words) < 2:
            assert did not in out
            continue
        bits, ntr = _py_bigram_bits(words, ref_words, lam=0.75)
        assert out[did]["n_transitions"] == ntr
        assert out[did]["bits_per_token"] == pytest.approx(bits, abs=1e-10)
        assert out[did]["ppl"] == pytest.approx(2.0 ** bits, rel=1e-10)


def test_repeated_transition_weighting(docs):
    # d6 = "the the the the": one distinct transition with count 3 —
    # the weighted mean must equal the plain mean of 3 identical terms,
    # i.e. -log2 p(the|the) exactly
    ref_words = [t.split() for _i, t in _DOCS if t]
    bits, _ = _py_bigram_bits(["the"] * 4, ref_words, lam=0.75)
    row = (
        bigram_lm_scores(docs, lam=0.75)
        .where(F.col("doc_id") == "d6")
        .collect()[0]
    )
    assert row["n_transitions"] == 3
    assert row["bits_per_token"] == pytest.approx(bits, abs=1e-10)


def test_frozen_reference_oov(spark):
    ref = spark.createDataFrame(
        [("r1", "alpha beta alpha gamma")], "doc_id string, text string"
    )
    new = spark.createDataFrame(
        [("n1", "alpha beta"), ("n2", "zeta eta")],  # n2 fully OOV
        "doc_id string, text string",
    )
    uni = unigram_counts(ref)
    bi = bigram_counts(ref)
    out = {
        r["doc_id"]: r
        for r in bigram_lm_scores(
            new, reference_unigram=uni, reference_bigram=bi, lam=0.5
        ).collect()
    }
    ref_words = [["alpha", "beta", "alpha", "gamma"]]
    for did, words in [("n1", ["alpha", "beta"]), ("n2", ["zeta", "eta"])]:
        bits, _ = _py_bigram_bits(words, ref_words, lam=0.5)
        assert out[did]["bits_per_token"] == pytest.approx(bits, abs=1e-10)
    # fully-OOV doc must score strictly worse than the in-vocab one
    assert out["n2"]["bits_per_token"] > out["n1"]["bits_per_token"]


def test_lam_extremes_and_validation(docs, spark):
    # lam=0: pure unigram over transitions — independent of the bigram
    # table entirely (compare against a reference with EMPTY bigrams)
    full = bigram_lm_scores(docs, lam=0.0).collect()
    uni = unigram_counts(docs)
    empty_bi = bigram_counts(
        spark.createDataFrame([("x", "one")], "doc_id string, text string")
    ).limit(0)
    nobi = bigram_lm_scores(
        docs, reference_unigram=uni, reference_bigram=empty_bi, lam=0.0
    ).collect()
    a = {r["doc_id"]: r["bits_per_token"] for r in full}
    b = {r["doc_id"]: r["bits_per_token"] for r in nobi}
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)
    with pytest.raises(ValueError, match="lam"):
        bigram_lm_scores(docs, lam=1.5)
    with pytest.raises(ValueError, match="both"):
        bigram_lm_scores(docs, reference_unigram=uni)


def test_token_native_path_matches_text_twin(spark):
    rows = [("t1", [7, 3, 7, 9]), ("t2", [3, 3]), ("t3", [5])]
    toks = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>"
    )
    texts = spark.createDataFrame(
        [(i, " ".join(str(t) for t in ts)) for i, ts in rows],
        "doc_id string, text string",
    )
    via_tokens = {
        r["doc_id"]: r
        for r in bigram_lm_scores(toks, tokens_col="tokens").collect()
    }
    via_text = {
        r["doc_id"]: r for r in bigram_lm_scores(texts).collect()
    }
    assert set(via_tokens) == set(via_text) == {"t1", "t2"}
    for k in via_tokens:
        assert via_tokens[k]["n_transitions"] == via_text[k]["n_transitions"]
        assert via_tokens[k]["bits_per_token"] == pytest.approx(
            via_text[k]["bits_per_token"], abs=1e-12
        )


def test_bigram_counts_shape(docs):
    got = {
        (r["w1"], r["w2"]): r["n"] for r in bigram_counts(docs).collect()
    }
    assert got[("the", "cat")] == 2
    assert got[("the", "the")] == 3
    assert ("solo", "solo") not in got


# ---------------------------------------------------------------- buckets


def test_quantile_buckets_terciles(spark):
    df = spark.createDataFrame(
        [(str(i), float(i)) for i in range(1, 10)], "id string, v double"
    )
    labeled, thr = quantile_buckets(df, "v", accuracy=100000)
    t = thr.collect()[0]
    q1, q2 = t["q_1"], t["q_2"]
    # thresholds are actual data elements near the tercile ranks
    assert q1 in {float(i) for i in range(1, 10)} and q1 < q2
    assert 2.0 <= q1 <= 4.0 and 5.0 <= q2 <= 7.0
    got = {r["id"]: r["bucket"] for r in labeled.collect()}
    for i in range(1, 10):
        expect = "head" if i <= q1 else ("middle" if i <= q2 else "tail")
        assert got[str(i)] == expect
    assert set(got.values()) == {"head", "middle", "tail"}


def test_quantile_buckets_per_group_and_nulls(spark):
    rows = [("a", float(i)) for i in range(1, 10)] + [
        ("b", float(i * 100)) for i in range(1, 10)
    ] + [("a", None)]
    df = spark.createDataFrame(rows, "src string, v double")
    labeled, thr = quantile_buckets(
        df, "v", group_cols=["src"], accuracy=100000
    )
    t = {r["src"]: (r["q_1"], r["q_2"]) for r in thr.collect()}
    # per-group thresholds live in each group's OWN value range — NULLs
    # are ignored by the sketch
    assert 1.0 <= t["a"][0] < t["a"][1] <= 9.0
    assert 100.0 <= t["b"][0] < t["b"][1] <= 900.0
    # group b's values are all in group a's "tail" range but must be
    # bucketed against group b's OWN thresholds
    for r in labeled.collect():
        if r["v"] is None:
            assert r["bucket"] is None
        else:
            q1, q2 = t[r["src"]]
            assert r["bucket"] == (
                "head" if r["v"] <= q1 else "middle" if r["v"] <= q2 else "tail"
            )


def test_quantile_buckets_validation(spark):
    df = spark.createDataFrame([("x", 1.0)], "id string, v double")
    with pytest.raises(ValueError, match="labels"):
        quantile_buckets(df, "v", cuts=(0.5,), labels=("a", "b", "c"))
    with pytest.raises(ValueError, match="increasing"):
        quantile_buckets(df, "v", cuts=(0.7, 0.3), labels=("a", "b", "c"))
    with pytest.raises(ValueError, match="increasing"):
        quantile_buckets(df, "v", cuts=(0.0, 0.5), labels=("a", "b", "c"))
    with pytest.raises(ValueError, match="already exists"):
        quantile_buckets(
            df.withColumn("bucket", F.lit("x")), "v"
        )
    with pytest.raises(ValueError, match="collide"):
        quantile_buckets(df.withColumn("q_1", F.lit(1)), "v")


def test_frozen_thresholds_deployment(spark):
    """The CCNet deployment mode: thresholds computed once, then NEW
    data is labeled against the persisted relation (no recompute)."""
    train = spark.createDataFrame(
        [(str(i), float(i)) for i in range(1, 10)], "id string, v double"
    )
    _labeled, thr = quantile_buckets(train, "v", accuracy=100000)
    new = spark.createDataFrame(
        [("n1", 2.0), ("n2", 5.0), ("n3", 99.0)], "id string, v double"
    )
    joined = new.crossJoin(F.broadcast(thr))
    lab = joined.withColumn(
        "bucket",
        F.when(F.col("v") <= F.col("q_1"), "head")
        .when(F.col("v") <= F.col("q_2"), "middle")
        .otherwise("tail"),
    )
    got = {r["id"]: r["bucket"] for r in lab.collect()}
    assert got == {"n1": "head", "n2": "middle", "n3": "tail"}


# ------------------------------------------------------------- plan gates


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bigram_join_input_is_preaggregated(spark):
    """Same gate as the unigram scorer (VERDICT r4 #4): the scoring
    joins must consume distinct (doc, w1, w2) pairs with local counts,
    never raw transition occurrences."""
    import re

    df = spark.createDataFrame(
        [(str(i), "a b c a b") for i in range(50)],
        "doc_id string, text string",
    )
    scored = bigram_lm_scores(df)
    scored.collect()  # round-3 lesson: AQE finalizes the SAME DataFrame
    plan = _plan_of(scored)
    assert re.search(
        r"HashAggregate\(keys=\[doc_id#\d+, w1#\d+, w2#\d+\]", plan
    ), plan
    # the count-weighted mean consumes the local counts
    assert re.search(r"sum\(\(cast\(_k#\d+L as double\) \* LOG2", plan), plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_quantile_buckets_plan_is_sketch_and_broadcast(spark):
    """Thresholds must be a mergeable percentile_approx aggregate (no
    global sort) joined back as a broadcast — at 100 TB a window-rank
    or sort-based ntile here would be the bottleneck."""
    df = spark.createDataFrame(
        [(str(i), "s" + str(i % 3), float(i)) for i in range(100)],
        "id string, src string, v double",
    )
    labeled, _thr = quantile_buckets(df, "v", group_cols=["src"])
    plan = _plan_of(labeled)
    assert "approx_percentile" in plan or "percentile_approx" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "Sort " not in plan and "Window" not in plan, plan
