"""Token-id-native corpus operators (operators/tokenops.py): planted
contamination and duplicate spans, NULL/short-row edges, a seeded
randomized sweep vs a pure-Python oracle, DuckDB parity on the
committed sequences fixture, and plan gates (broadcast probe, no
corpus-side shuffle)."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators.tokenops import (
    token_contamination,
    token_duplicate_span_stats,
    token_duplicate_spans,
    token_repetition_stats,
    token_shingles,
)

FIXTURE = "/root/repo/tests/fixtures/sequences_small.parquet"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("a", [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]),
        ("b", [100, 1, 2, 3, 4, 5, 6, 7, 8, 200]),
        ("c", [5, 5, 5, 5, 5, 5, 5, 5, 5]),  # within-doc repeats
        ("d", []),
        ("e", None),
    ]
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>")


def test_contamination_planted(spark, corpus):
    ev = spark.createDataFrame(
        [("q1", [1, 2, 3, 4, 5, 6, 7, 8])], "eid string, tokens array<int>"
    )
    got = {
        r["doc_id"]: (r["n_contaminated_shingles"], r["contaminated"])
        for r in token_contamination(corpus, ev, k=8).collect()
    }
    assert got == {
        "a": (1, True),
        "b": (1, True),
        "c": (0, False),
        "d": (0, False),
        "e": (0, False),
    }


def test_contamination_counts_distinct_overlaps(spark):
    # doc sharing TWO distinct eval 2-grams, one of them twice
    df = spark.createDataFrame(
        [("t", [1, 2, 9, 1, 2, 9, 3, 4])], "doc_id string, tokens array<int>"
    )
    ev = spark.createDataFrame(
        [("q", [1, 2]), ("r", [3, 4])], "eid string, tokens array<int>"
    )
    row = token_contamination(df, ev, k=2).collect()[0]
    assert row["n_contaminated_shingles"] == 2 and row["contaminated"]


def test_duplicate_spans_planted(corpus):
    got = {
        (r["doc_id"], r["span_start"]): (r["span_end"], r["span_len"])
        for r in token_duplicate_spans(corpus, k=4).collect()
    }
    # a and b share the run 1..8 → one merged span each; c's constant
    # run duplicates within-doc (suffix-array semantics)
    assert got == {
        ("a", 0): (7, 8),
        ("b", 1): (8, 8),
        ("c", 0): (8, 9),
    }


def test_span_stats_cover_all_rows(corpus):
    got = {
        r["doc_id"]: (r["n_tok"], r["n_spans"], r["dup_tokens"], r["dup_frac"])
        for r in token_duplicate_span_stats(corpus, k=4).collect()
    }
    assert got["a"] == (10, 1, 8, 0.8)
    assert got["c"] == (9, 1, 9, 1.0)
    assert got["d"] == (0, 0, 0, 0.0)
    assert got["e"] == (0, 0, 0, 0.0)


def test_repetition_stats_planted(corpus):
    got = {r["doc_id"]: r.asDict() for r in token_repetition_stats(corpus).collect()}
    assert got["a"]["dup_token_frac"] == 0.0
    assert got["c"]["dup_token_frac"] == pytest.approx(1 - 1 / 9, abs=1e-6)
    assert got["c"]["dup_bigram_frac"] == pytest.approx(1 - 1 / 8, abs=1e-6)
    assert got["d"]["dup_token_frac"] == 0.0
    assert got["e"]["dup_token_frac"] == 0.0  # NULL tokens → zeros


def _py_dup_frac(seq, n):
    grams = [tuple(seq[i : i + n]) for i in range(len(seq) - n + 1)]
    if not grams:
        return 0.0
    return round(1.0 - len(set(grams)) / len(grams), 6)


def test_repetition_stats_randomized_vs_python(spark):
    rng = random.Random(42)
    rows = []
    for i in range(60):
        n = rng.randint(0, 40)
        vocab = rng.choice([2, 5, 1000])  # small vocab → heavy repeats
        rows.append((f"r{i}", [rng.randrange(vocab) for _ in range(n)]))
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = {r["doc_id"]: r.asDict() for r in token_repetition_stats(df).collect()}
    for doc_id, seq in rows:
        g = got[doc_id]
        assert g["n_tok"] == len(seq)
        assert g["dup_token_frac"] == pytest.approx(
            _py_dup_frac(seq, 1), abs=1e-6
        ), doc_id
        assert g["dup_bigram_frac"] == pytest.approx(
            _py_dup_frac(seq, 2), abs=1e-6
        ), doc_id
        assert g["dup_trigram_frac"] == pytest.approx(
            _py_dup_frac(seq, 3), abs=1e-6
        ), doc_id


def test_fixture_parity_with_duckdb(spark):
    """token_duplicate_span_stats on the committed sequences fixture
    (plus a deterministically planted duplicated slice: md5-selected
    docs re-id'd — the fixture's own doc_id dups carry different
    arrays) must match an independent DuckDB islands query."""
    k = 8
    base = spark.read.parquet(FIXTURE)
    planted = (
        base.where((F.md5("doc_id").like("00%")) & (F.col("n_tok") >= k))
        .withColumn("doc_id", F.concat("doc_id", F.lit("~dup")))
    )
    df = base.unionByName(planted)
    got = {
        r["doc_id"]: (r["n_tok"], r["n_spans"], r["dup_tokens"])
        for r in token_duplicate_span_stats(df, k=k)
        .where(F.col("dup_tokens") > 0)
        .collect()
    }
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in duckdb.sql(
            f"""
        WITH corpus AS (
          SELECT doc_id, tokens, n_tok FROM read_parquet('{FIXTURE}')
          UNION ALL
          SELECT doc_id || '~dup', tokens, n_tok
          FROM read_parquet('{FIXTURE}')
          WHERE md5(doc_id) LIKE '00%' AND n_tok >= {k}
        ), pos AS (
          SELECT doc_id, u.pos, u.g FROM (
            SELECT doc_id,
                   unnest(list_transform(
                     range(1, greatest(len(tokens)-{k}+2, 1)),
                     i -> {{'pos': i-1,
                            'g': array_to_string(tokens[i:i+{k}-1], ',')}}
                   )) AS u
            FROM corpus)
        ), dup AS (
          SELECT g FROM pos GROUP BY g HAVING count(*) >= 2
        ), hits AS (
          SELECT doc_id, pos FROM pos JOIN dup USING (g)
        ), flagged AS (
          SELECT doc_id, pos,
                 CASE WHEN lag(pos) OVER w IS NULL
                        OR pos - lag(pos) OVER w > {k}
                      THEN 1 ELSE 0 END AS newflag
          FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ), spans AS (
          SELECT doc_id,
                 max(pos) - min(pos) + {k} AS span_len
          FROM (SELECT doc_id, pos,
                       sum(newflag) OVER (PARTITION BY doc_id
                                          ORDER BY pos) AS span_id
                FROM flagged)
          GROUP BY doc_id, span_id
        )
        SELECT s.doc_id, any_value(t.n_tok), count(*),
               CAST(sum(s.span_len) AS INT)
        FROM spans s JOIN corpus t USING (doc_id)
        GROUP BY s.doc_id
        """
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_contamination_plan_is_broadcast_no_corpus_shuffle(spark):
    """The eval probe must be a broadcast hash join and the corpus side
    must reach it scan→explode with no Exchange in between; the only
    shuffle is the per-doc hit count (keyed on the primary key)."""
    df = spark.read.parquet(FIXTURE)
    ev = df.where(F.col("n_tok") >= 12).limit(50).select(
        F.slice("tokens", 3, 8).alias("tokens")
    )
    out = token_contamination(df, ev, k=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # exactly TWO hash shuffles in the whole job — the post-probe
    # per-doc distinct and the hit count (both over the tiny hit set,
    # keyed on the primary key); the probe join and the join back to
    # the input are both broadcast, so the corpus scan never shuffles
    assert plan.count("Exchange hashpartitioning") == 2


def test_unigram_lm_scores_token_native_matches_text_twin(spark):
    """Scoring the id array must equal scoring the space-joined decimal
    text — same (doc, term, count) relation, same rationals."""
    from medea_ps_spark.operators.lmscore import unigram_lm_scores

    df = spark.read.parquet(FIXTURE).limit(500).cache()
    tok = {
        r["doc_id"]: (r["n_tokens"], r["bits_per_token"])
        for r in unigram_lm_scores(df, tokens_col="tokens").collect()
    }
    txt_df = df.select(
        "doc_id", F.concat_ws(" ", F.col("tokens").cast("array<string>")).alias("text")
    )
    txt = {
        r["doc_id"]: (r["n_tokens"], r["bits_per_token"])
        for r in unigram_lm_scores(txt_df, text_col="text").collect()
    }
    df.unpersist()
    assert tok.keys() == txt.keys() and len(tok) > 0
    for d in tok:
        assert tok[d][0] == txt[d][0]
        assert tok[d][1] == pytest.approx(txt[d][1], rel=1e-12)


def test_quality_score_token_native_python_oracle(spark):
    """Token-native hashed-feature scoring vs a hashlib re-computation
    of the md5 60-bit-lane integer weights."""
    import hashlib

    from medea_ps_spark.operators.qualitymodel import (
        WEIGHT_SCALE,
        quality_score,
    )

    rows = [("a", [7, 42, 7]), ("b", [123456]), ("c", []), ("d", None)]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = {
        r["doc_id"]: (r["n_features"], r["score_milli"], r["quality_label"])
        for r in quality_score(df, tokens_col="tokens").collect()
    }

    def w(feat: str) -> int:
        lane = int(hashlib.md5(feat.encode()).hexdigest()[:15], 16)
        return lane % WEIGHT_SCALE - WEIGHT_SCALE // 2

    for doc_id, toks in rows:
        toks = toks or []
        feats = [str(t) for t in toks] + [
            f"{toks[i]},{toks[i+1]}" for i in range(len(toks) - 1)
        ]
        score = sum(w(f) for f in feats)
        label = (
            "drop"
            if not feats
            else ("keep" if score * WEIGHT_SCALE >= 0 else "drop")
        )
        assert got[doc_id] == (len(feats), score, label), doc_id


def _py_duplicate_span_stats(rows, k, min_count=2):
    """Pure-Python reference: corpus k-gram counts → duplicated
    positions → island merge (new span when pos - prev > k)."""
    from collections import Counter

    grams = Counter()
    per_row = {}
    for doc_id, toks in rows:
        toks = toks or []
        gs = [tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        per_row.setdefault(doc_id, []).append((len(toks), gs))
        grams.update(gs)
    out = {}
    for doc_id, row_list in per_row.items():
        # positions pool across rows sharing a doc_id (window semantics)
        positions = sorted(
            {
                pos
                for _, gs in row_list
                for pos, g in enumerate(gs)
                if grams[g] >= min_count
            }
        )
        spans = []
        for pos in positions:
            if spans and pos - spans[-1][1] <= k:
                spans[-1][1] = pos
            else:
                spans.append([pos, pos])
        n_spans = len(spans)
        dup_tokens = sum(e - s + k for s, e in spans)
        for n_tok, _ in row_list:
            frac = 0.0 if n_tok == 0 else round(dup_tokens / n_tok, 6)
            out.setdefault(doc_id, []).append(
                (n_tok, n_spans, dup_tokens, frac)
            )
    return out


def test_duplicate_span_stats_fuzz_vs_python(spark):
    """Seeded randomized corpora (tiny vocab → organic duplicate
    k-grams, planted shared runs, empty/short rows, duplicate doc_ids)
    must match the pure-Python reference exactly."""
    import random

    rng = random.Random(1234)
    for trial in range(6):
        k = rng.choice([2, 3, 4])
        vocab = rng.choice([3, 6, 50])
        rows = []
        shared = [rng.randrange(vocab) for _ in range(k + rng.randint(0, 3))]
        for i in range(rng.randint(20, 60)):
            n = rng.randint(0, 25)
            toks = [rng.randrange(vocab) for _ in range(n)]
            if rng.random() < 0.3 and n >= 2:
                at = rng.randrange(max(1, n - 1))
                toks = toks[:at] + shared + toks[at:]
            # occasional duplicate doc_id (fixture-realistic)
            doc = f"t{trial}_d{i if rng.random() > 0.1 else max(0, i - 1)}"
            rows.append((doc, toks))
        df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
        got = {}
        for r in token_duplicate_span_stats(df, k=k).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["n_tok"], r["n_spans"], r["dup_tokens"], r["dup_frac"])
            )
        want = _py_duplicate_span_stats(rows, k)
        assert got.keys() == want.keys(), trial
        for d in got:
            assert sorted(got[d]) == sorted(want[d]), (trial, d)


def test_contamination_fuzz_vs_python(spark):
    """Seeded randomized train/eval corpora (tiny vocab, duplicate
    doc_ids pooling, NULL/short rows) must match a set-based Python
    reference: distinct overlapping k-grams per doc_id."""
    import random

    rng = random.Random(777)
    for trial in range(4):
        k = rng.choice([2, 3])
        vocab = rng.choice([4, 8])
        train = []
        for i in range(rng.randint(20, 50)):
            n = rng.randint(0, 15)
            doc = f"t{trial}_d{i if rng.random() > 0.15 else max(0, i - 1)}"
            train.append((doc, [rng.randrange(vocab) for _ in range(n)]))
        evals = [
            (f"e{j}", [rng.randrange(vocab) for _ in range(rng.randint(0, 6))])
            for j in range(rng.randint(1, 5))
        ]
        df = spark.createDataFrame(train, "doc_id string, tokens array<int>")
        ev = spark.createDataFrame(evals, "eid string, tokens array<int>")
        got = {}
        for r in token_contamination(df, ev, k=k).collect():
            got.setdefault(r["doc_id"], set()).add(
                (r["n_contaminated_shingles"], r["contaminated"])
            )
        ev_grams = {
            tuple(t[i : i + k])
            for _, t in evals
            for i in range(len(t) - k + 1)
        }
        pooled = {}
        for doc, toks in train:
            grams = {
                tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)
            }
            pooled.setdefault(doc, set()).update(grams & ev_grams)
        for doc, _ in train:
            n = len(pooled[doc])
            assert got[doc] == {(n, n > 0)}, (trial, doc)


def test_dup_spans_plan_shuffles_hashes_only(spark):
    """The duplicate-detection aggregation must shuffle md5 digests,
    never token arrays: every hashpartitioning Exchange's input schema
    is free of the tokens column, and the dup-hash probe is broadcast."""
    df = spark.read.parquet(FIXTURE)
    out = token_duplicate_spans(df, k=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "tokens" not in line, line


def test_shingles_guardrails(spark):
    with pytest.raises(ValueError):
        token_shingles(F.col("x"), 0)
    with pytest.raises(ValueError):
        token_duplicate_spans(
            spark.createDataFrame([("a", [1])], "doc_id string, tokens array<int>"),
            min_count=1,
        )
