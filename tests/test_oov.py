"""Vocabulary truncation / OOV remap: pure-Python reference parity,
deterministic top-K boundary (count desc, token asc), NULL handling,
dense vs sorted membership paths, layout independence, and a map-only
plan gate on the rewrite pass."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators.oov import (
    oov_stats,
    token_frequencies,
    top_vocab,
    vocab_truncate,
)

ROWS = [
    ("a", [1, 1, 1, 2, 2, 3]),
    ("b", [1, 2, 3, 4, 5]),
    ("c", [2, 4, 4, 9]),
    ("d", []),
    ("e", None),
    ("f", [7, 7, 3]),
]
# counts: 1->4, 2->4, 4->3, 3->3, 7->2, 5->1, 9->1


def _reference(rows, k, unk):
    counts = Counter(t for _, toks in rows if toks for t in toks)
    kept = {
        t for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    }
    out = {}
    for doc, toks in rows:
        if toks is None:
            out[doc] = (None, 0)
        else:
            new = [t if t in kept else unk for t in toks]
            out[doc] = (new, sum(1 for t in toks if t not in kept))
    return kept, out


@pytest.fixture(scope="module")
def seqs(spark):
    return spark.createDataFrame(ROWS, "doc_id string, tokens array<int>")


def _by_id(df):
    return {r["doc_id"]: (r["tokens"], r["n_oov"]) for r in df.collect()}


def test_frequencies_and_topk_boundary(seqs):
    freq = {r["token"]: r["c"] for r in token_frequencies(seqs).collect()}
    assert freq == {1: 4, 2: 4, 3: 3, 4: 3, 5: 1, 7: 2, 9: 1}
    # k=3 boundary is a tie between 3 and 4 (both c=3): token asc wins
    top = {r["token"] for r in top_vocab(seqs, 3).collect()}
    assert top == {1, 2, 3}


@pytest.mark.parametrize("k", [1, 3, 4, 100])
def test_matches_reference(seqs, k):
    kept, ref = _reference(ROWS, k, unk=0)
    got = _by_id(vocab_truncate(seqs, k=k, unk_id=0))
    for doc, (toks, n_oov) in ref.items():
        assert got[doc] == (toks, n_oov), (doc, k)


def test_null_elements_are_oov(spark):
    df = spark.createDataFrame(
        [("x", [1, None, 1])], "doc_id string, tokens array<int>"
    )
    got = _by_id(vocab_truncate(df, k=1, unk_id=-1))
    assert got["x"] == ([1, -1, 1], 1)


def test_out_col_appends(seqs):
    out = vocab_truncate(seqs, k=2, unk_id=0, out_col="tokens_trunc")
    assert out.columns == ["doc_id", "tokens", "tokens_trunc", "n_oov"]
    row = {r["doc_id"]: r for r in out.collect()}["b"]
    assert row["tokens"] == [1, 2, 3, 4, 5]  # original untouched
    assert row["tokens_trunc"] == [1, 2, 0, 0, 0]


def test_sorted_membership_path(spark):
    # one kept id beyond the dense-mask bound forces searchsorted mode
    huge = 1 << 28
    df = spark.createDataFrame(
        [("x", [huge, huge, 5, 6]), ("y", [huge, 5, 5])],
        "doc_id string, tokens array<int>",
    )
    got = _by_id(vocab_truncate(df, k=2, unk_id=0))
    # counts: huge->3, 5->3 (tie: 5 wins asc, both kept at k=2), 6 oov
    assert got["x"] == ([huge, huge, 5, 0], 1)
    assert got["y"] == ([huge, 5, 5], 0)


def test_oov_stats(seqs):
    out = vocab_truncate(seqs, k=3, unk_id=0)
    row = oov_stats(out).collect()[0].asDict()
    # kept {1,2,3}: oov occurrences = 4(4) is wrong — count: a:0, b:2
    # (4,5), c:3 (4,4,9), f:2 (7,7) => 7 of 18 tokens
    assert row["total_tokens"] == 18
    assert row["total_oov"] == 7
    assert row["oov_rate"] == round(7 / 18, 6)


def test_layout_independence(seqs):
    a = _by_id(vocab_truncate(seqs, k=3, unk_id=0))
    b = _by_id(vocab_truncate(seqs.repartition(7, "doc_id"), k=3, unk_id=0))
    assert a == b


def test_rewrite_plan_is_map_only(seqs):
    out = vocab_truncate(seqs, k=3, unk_id=0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_k_validation(seqs):
    with pytest.raises(ValueError):
        top_vocab(seqs, 0)
