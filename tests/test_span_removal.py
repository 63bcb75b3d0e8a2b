"""ExactSubstr dedup ACTION half (tokenops.remove_token_spans /
token_duplicate_spans_excess / dedup_token_spans): planted rewrites,
keep-first exemption semantics, a seeded randomized sweep vs a pure-
Python reference, layout independence, and a map-side-rewrite plan
gate."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators.tokenops import (
    dedup_token_spans,
    remove_token_spans,
    token_duplicate_spans_excess,
)


def _rows(df, id_col="doc_id"):
    return {
        r[id_col]: (r["tokens"], r.get("n_tok"), r.get("removed_tokens"))
        for r in (row.asDict() for row in df.collect())
    }


# ---------------------------------------------------------------- rewrite


def test_remove_token_spans_planted(spark):
    df = spark.createDataFrame(
        [
            ("a", list(range(10)), 10),
            ("b", [5, 6, 7], 3),
            ("c", [], 0),
            ("d", None, 0),
        ],
        "doc_id string, tokens array<int>, n_tok int",
    )
    spans = spark.createDataFrame(
        [
            ("a", 2, 4),
            ("a", 3, 6),  # overlaps the first -> union [2,6]
            ("a", 9, 50),  # out-of-range tail clamps by construction
            ("b", 100, 200),  # entirely out of range: no-op
        ],
        "doc_id string, span_start int, span_end int",
    )
    got = _rows(remove_token_spans(df, spans))
    assert got["a"] == ([0, 1, 7, 8], 4, 6)
    assert got["b"] == ([5, 6, 7], 3, 0)
    assert got["c"] == ([], 0, 0)
    assert got["d"] == (None, 0, 0)


def test_remove_token_spans_whole_doc_yields_empty_array(spark):
    df = spark.createDataFrame(
        [("a", [1, 2, 3], 3)], "doc_id string, tokens array<int>, n_tok int"
    )
    spans = spark.createDataFrame(
        [("a", 0, 2)], "doc_id string, span_start int, span_end int"
    )
    got = _rows(remove_token_spans(df, spans))
    assert got["a"] == ([], 0, 3)  # empty array, NOT null


def test_remove_token_spans_conservation_and_extra_columns(spark):
    df = spark.createDataFrame(
        [("a", [9, 8, 7, 6, 5], 5, "web")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    spans = spark.createDataFrame(
        [("a", 1, 2)], "doc_id string, span_start int, span_end int"
    )
    out = remove_token_spans(df, spans)
    r = out.collect()[0]
    assert r["source"] == "web"  # passthrough columns survive
    assert r["n_tok"] + r["removed_tokens"] == 5
    assert r["tokens"] == [9, 6, 5]


# --------------------------------------------------- keep-first exemption


def test_excess_spans_exempt_corpus_first_occurrence(spark):
    # docs a and b share tokens 1..8; "a" is the corpus-first occurrence
    # (min (doc_id, pos)) so only b's copy is an excess span.
    df = spark.createDataFrame(
        [
            ("a", [1, 2, 3, 4, 5, 6, 7, 8, 99]),
            ("b", [50, 1, 2, 3, 4, 5, 6, 7, 8]),
        ],
        "doc_id string, tokens array<int>",
    )
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in token_duplicate_spans_excess(df, k=8).collect()
    }
    assert spans == {("b", 1, 8)}


def test_excess_within_doc_repeat_keeps_first(spark):
    base = [1, 2, 3, 4]
    df = spark.createDataFrame(
        [("a", base + [77] + base)], "doc_id string, tokens array<int>"
    )
    spans = {
        (r["span_start"], r["span_end"])
        for r in token_duplicate_spans_excess(df, k=4).collect()
    }
    assert spans == {(5, 8)}  # the second copy only


def test_dedup_token_spans_end_to_end(spark):
    df = spark.createDataFrame(
        [
            ("a", [1, 2, 3, 4, 5, 6, 7, 8, 99], 9),
            ("b", [50, 1, 2, 3, 4, 5, 6, 7, 8], 9),
            ("c", [10, 11, 12], 3),
        ],
        "doc_id string, tokens array<int>, n_tok int",
    )
    got = _rows(dedup_token_spans(df, k=8))
    assert got["a"] == ([1, 2, 3, 4, 5, 6, 7, 8, 99], 9, 0)
    assert got["b"] == ([50], 1, 8)
    assert got["c"] == ([10, 11, 12], 3, 0)


def test_dedup_validates_args(spark):
    df = spark.createDataFrame([("a", [1])], "doc_id string, tokens array<int>")
    with pytest.raises(ValueError):
        token_duplicate_spans_excess(df, k=0)
    with pytest.raises(ValueError):
        token_duplicate_spans_excess(df, min_count=1)


# ------------------------------------------------------- python reference


def _py_dedup(docs: dict[str, list[int]], k: int) -> dict[str, list[int]]:
    """Pure-Python reference: hash every k-gram, exempt the min (id,pos)
    occurrence per duplicated hash, cover the rest with [pos, pos+k-1],
    delete covered positions."""
    occ: dict[str, list[tuple[str, int]]] = {}
    for d in sorted(docs):
        toks = docs[d] or []
        for p in range(len(toks) - k + 1):
            h = hashlib.md5(
                ",".join(str(t) for t in toks[p : p + k]).encode()
            ).hexdigest()
            occ.setdefault(h, []).append((d, p))
    covered: dict[str, set[int]] = {d: set() for d in docs}
    for h, lst in occ.items():
        if len(lst) < 2:
            continue
        keeper = min(lst)
        for d, p in lst:
            if (d, p) == keeper:
                continue
            covered[d].update(range(p, p + k))
    return {
        d: [t for i, t in enumerate(docs[d] or []) if i not in covered[d]]
        if docs[d] is not None
        else None
        for d in docs
    }


def test_dedup_fuzz_vs_python_reference(spark):
    rng = random.Random(1234)
    k = 4
    for trial in range(6):
        # small vocab + planted shared slices force collisions
        docs: dict[str, list[int] | None] = {}
        shared = [rng.randrange(50) for _ in range(rng.randint(k, 9))]
        for i in range(12):
            toks = [rng.randrange(50) for _ in range(rng.randint(0, 20))]
            if rng.random() < 0.5:
                at = rng.randint(0, len(toks))
                toks = toks[:at] + shared + toks[at:]
            docs[f"d{i:02d}"] = toks
        docs["dnull"] = None
        expect = _py_dedup(docs, k)
        df = spark.createDataFrame(
            list(docs.items()), "doc_id string, tokens array<int>"
        )
        got = {
            r["doc_id"]: r["tokens"]
            for r in dedup_token_spans(df, k=k, n_tok_col=None).collect()
        }
        assert got == expect, f"trial {trial}"


def test_dedup_layout_independence(spark):
    rng = random.Random(77)
    shared = list(range(30, 38))
    rows = [
        (f"d{i}", [rng.randrange(40) for _ in range(10)] + shared)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    a = _rows(dedup_token_spans(df.repartition(1), k=8, n_tok_col=None))
    b = _rows(dedup_token_spans(df.repartition(13, "tokens"), k=8, n_tok_col=None))
    assert a == b


def test_every_duplicated_kgram_survives_somewhere(spark):
    # per-k-gram guarantee: after dedup, each originally-duplicated
    # k-gram still occurs at least once in the corpus (the exempted
    # occurrence may only lose tokens to NEIGHBOURING spans; with
    # non-overlapping planted copies it survives whole).
    k = 5
    phrase = [7, 8, 9, 10, 11]
    df = spark.createDataFrame(
        [
            ("a", [1, 2] + phrase + [3, 4]),
            ("b", [5, 6] + phrase),
            ("c", phrase + [12]),
        ],
        "doc_id string, tokens array<int>",
    )
    out = {
        r["doc_id"]: r["tokens"]
        for r in dedup_token_spans(df, k=k, n_tok_col=None).collect()
    }
    joined = [
        out[d][i : i + k]
        for d in out
        for i in range(max(0, len(out[d]) - k + 1))
    ]
    assert phrase in joined
    assert sum(1 for g in joined if g == phrase) == 1


# ---------------------------------------------------------------- plan


def test_rewrite_is_single_project_after_one_join(spark):
    df = spark.createDataFrame(
        [("a", list(range(12)), 12)],
        "doc_id string, tokens array<int>, n_tok int",
    )
    spans = spark.createDataFrame(
        [("a", 0, 3)], "doc_id string, span_start int, span_end int"
    )
    plan = remove_token_spans(df, spans)._jdf.queryExecution().executedPlan().toString()
    # no per-position explode and no nested-loop join: the rewrite is
    # expression-only after a single keyed join
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Generate" not in plan  # no explode in the rewrite path
