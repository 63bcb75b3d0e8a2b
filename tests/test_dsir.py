"""DSIR importance resampling (operators/dsir.py): log-ratio weights
vs a pure-Python reference, the lmscore identity, deterministic Gumbel
keys, without-replacement top-k semantics, the fraction/threshold path,
and plan gates (pre-aggregated scoring join, two-phase selection)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pytest
from pyspark.sql import Row, functions as F

from medea_ps_spark.operators import dsir
from medea_ps_spark.operators.lmscore import unigram_counts, unigram_lm_scores

ALPHA = 1.0

CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "stock market prices fell sharply today"),
    (3, "the dog sat on the log"),
    (4, "buy cheap pills online now now now"),
    (5, "a cat and a dog sat together"),
    (6, "click here to win win win"),
    (7, "the mat was sat on by the cat"),
    (8, ""),
    (9, None),
    (10, "quantum flux capacitor zorp blag"),
]
TARGET = [
    (101, "the cat sat on the mat"),
    (102, "the dog and the cat sat"),
    (103, "a mat for the dog"),
]


def _words(text):
    t = re.sub(r"\s+", " ", text or "").strip()
    return t.split(" ") if t else []


def ref_log_ratios(corpus, target, alpha=ALPHA):
    tc = Counter(w for _i, t in target for w in _words(t))
    rc = Counter(w for _i, t in corpus for w in _words(t))
    tN, tV = sum(tc.values()), len(tc)
    rN, rV = sum(rc.values()), len(rc)
    out = {}
    for i, t in corpus:
        ws = _words(t)
        if not ws:
            continue
        lr = sum(
            c
            * (
                math.log((tc.get(w, 0) + alpha) / (tN + alpha * (tV + 1)))
                - math.log((rc.get(w, 0) + alpha) / (rN + alpha * (rV + 1)))
            )
            for w, c in Counter(ws).items()
        )
        out[i] = (len(ws), lr)
    return out


def ref_gumbel(doc_id, seed):
    h = hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:15]
    u = (int(h, 16) + 0.5) / 16**15
    return -math.log(-math.log(u))


@pytest.fixture(scope="module")
def frames(spark):
    c = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    t = spark.createDataFrame(TARGET, "doc_id bigint, text string")
    return c, t


def test_log_ratios_match_python_reference(frames):
    c, t = frames
    got = {
        r["doc_id"]: (r["n_tokens"], r["log_ratio"])
        for r in dsir.dsir_log_ratios(c, unigram_counts(t)).collect()
    }
    want = ref_log_ratios(CORPUS, TARGET)
    assert set(got) == set(want)  # empty/NULL docs dropped
    for i, (n, lr) in want.items():
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(lr, abs=1e-9)


def test_log_ratio_equals_lmscore_identity(frames):
    # log_ratio == n_tokens * ln2 * (bits_raw - bits_target): the two
    # modules share tokenization, smoothing, and the OOV bucket
    c, t = frames
    tcounts = unigram_counts(t)
    lr = {
        r["doc_id"]: r["log_ratio"]
        for r in dsir.dsir_log_ratios(c, tcounts).collect()
    }
    bt = {
        r["doc_id"]: r["bits_per_token"]
        for r in unigram_lm_scores(c, reference=tcounts).collect()
    }
    br = {
        r["doc_id"]: (r["bits_per_token"], r["n_tokens"])
        for r in unigram_lm_scores(c).collect()
    }
    for i in lr:
        bits_r, n = br[i]
        want = n * math.log(2) * (bits_r - bt[i])
        assert lr[i] == pytest.approx(want, abs=1e-9)


def test_gumbel_key_matches_formula(spark):
    df = spark.range(1, 50).select(F.col("id").alias("doc_id"))
    got = {
        r["doc_id"]: r["g"]
        for r in df.select(
            "doc_id", dsir.gumbel_key(F.col("doc_id"), seed=7).alias("g")
        ).collect()
    }
    for i, g in got.items():
        assert g == pytest.approx(ref_gumbel(i, 7), abs=1e-12)


def test_gumbel_key_null_matches_duckdb_twin(spark):
    """NULL keys: Spark's concat_ws SKIPS NULLs, so gumbel_key(NULL)
    hashes just the seed string. The DuckDB oracle must use concat_ws
    too (`x || ':s'` would be NULL and sort last) — pin the parity on
    the exact twin expression."""
    import duckdb

    seed = 7
    got = (
        spark.range(1)
        .select(
            dsir.gumbel_key(F.lit(None).cast("string"), seed=seed).alias("g")
        )
        .collect()[0]["g"]
    )
    want = duckdb.sql(
        f"""
        SELECT -ln(-ln(
          (CAST(('0x' || substr(md5(
             concat_ws(':', CAST(NULL AS VARCHAR), '{seed}')
           ), 1, 15)) AS BIGINT) + 0.5) / 1152921504606846976.0
        )) AS g
        """
    ).fetchone()[0]
    assert got == pytest.approx(want, abs=1e-12)
    # and it equals md5 of the bare seed string, i.e. NULL was skipped
    bare = -math.log(
        -math.log(
            (int(hashlib.md5(f"{seed}".encode()).hexdigest()[:15], 16) + 0.5)
            / 16**15
        )
    )
    assert got == pytest.approx(bare, abs=1e-12)


def test_resample_deterministic_and_ranked(frames):
    c, t = frames
    a = dsir.dsir_resample(c, t, k=4, seed=11).collect()
    b = dsir.dsir_resample(c, t, k=4, seed=11).collect()
    # selection (ids, ranks, counts) is exactly deterministic; log_ratio
    # is a float SUM whose partial-agg merge order can differ between
    # two executions of the same plan (last-ulp wobble observed on this
    # host) — compare it approximately, everything else exactly, same
    # convention as test_sample_fraction_* (r5 s10)
    assert [r["rank"] for r in a] == [r["rank"] for r in b]
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert [r["n_tokens"] for r in a] == [r["n_tokens"] for r in b]
    for ra, rb in zip(a, b):
        assert ra["log_ratio"] == pytest.approx(rb["log_ratio"], rel=1e-12)
    assert [r["rank"] for r in sorted(a, key=lambda r: r["rank"])] == [
        1, 2, 3, 4,
    ]
    assert len({r["doc_id"] for r in a}) == 4  # without replacement
    # ranks agree with the reference keys
    want = ref_log_ratios(CORPUS, TARGET)
    keys = {i: lr + ref_gumbel(i, 11) for i, (_n, lr) in want.items()}
    expect = sorted(keys, key=lambda i: (-keys[i], i))[:4]
    got = [r["doc_id"] for r in sorted(a, key=lambda r: r["rank"])]
    assert got == expect


def test_target_like_docs_outweigh_junk(frames):
    c, t = frames
    lr = {
        r["doc_id"]: r["log_ratio"]
        for r in dsir.dsir_log_ratios(c, unigram_counts(t)).collect()
    }
    # every doc built from target vocabulary outweighs every doc of
    # words the target has never seen
    target_like = {1, 3, 5, 7}
    junk = {2, 4, 6, 10}
    assert min(lr[i] for i in target_like) > max(lr[j] for j in junk)


def test_sample_fraction_is_top_by_key(frames):
    c, t = frames
    out = dsir.dsir_sample_fraction(c, t, 0.5, seed=11).collect()
    want = ref_log_ratios(CORPUS, TARGET)
    keys = {i: lr + ref_gumbel(i, 11) for i, (_n, lr) in want.items()}
    m = len(out)
    assert 0 < m < len(keys)
    expect = set(sorted(keys, key=lambda i: (-keys[i], i))[:m])
    assert {r["doc_id"] for r in out} == expect


def test_sample_fraction_accepts_precomputed_ratios(frames):
    c, t = frames
    ratios = dsir.dsir_log_ratios(c, unigram_counts(t))
    out = dsir.dsir_sample_fraction(
        c, t, 0.5, seed=11, ratios=ratios
    ).collect()
    direct = dsir.dsir_sample_fraction(c, t, 0.5, seed=11).collect()
    # membership is md5-key-exact; log_ratio is a float sum whose
    # addend order differs between the precomputed and inline plan
    # shapes, so it may wobble by ulps — compare it approximately
    out, direct = sorted(out), sorted(direct)
    assert [(r["doc_id"], r["n_tokens"]) for r in out] == [
        (r["doc_id"], r["n_tokens"]) for r in direct
    ]
    for a, b in zip(out, direct):
        assert a["log_ratio"] == pytest.approx(b["log_ratio"], rel=1e-12)


def test_bad_args(frames):
    c, t = frames
    with pytest.raises(ValueError, match="k must be positive"):
        dsir.dsir_resample(c, t, k=0)
    for f in (0.0, 1.0, -0.2, 1.5):
        with pytest.raises(ValueError, match="fraction"):
            dsir.dsir_sample_fraction(c, t, f)


def test_empty_corpus_fraction_path(spark, frames):
    _c, t = frames
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert dsir.dsir_sample_fraction(empty, t, 0.5).count() == 0


def test_plan_preaggregated_join_and_two_phase_topk(frames):
    c, t = frames
    df = dsir.dsir_resample(c, t, k=4, seed=11)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # scoring join consumes the pre-aggregated (doc, word) counts, not
    # raw token occurrences: an Aggregate sits BELOW the first profile
    # join on the corpus side (VERDICT r4 #4 contract, shared with
    # lmscore)
    assert "count(1)" in plan.lower() or "Aggregate" in plan
    joins = plan.find("Join")
    agg_below = plan.find("Aggregate", joins)
    assert joins != -1 and agg_below != -1
    # two-phase selection: two ranked windows (local over
    # spark_partition_id, global), never one global sort of all docs
    assert plan.count("row_number") >= 2
    assert "SPARK_PARTITION_ID" in plan or "spark_partition_id" in plan
