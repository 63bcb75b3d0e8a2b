"""Duplicate-span detection (Lee et al. 2022 hashed-n-gram
approximation): planted spans, merge semantics, edge cases, a DuckDB
oracle sweep on the sf documents table, and span-cover correctness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators.dupspans import (
    duplicate_span_stats,
    duplicate_spans,
)

SHARED = "the quick brown fox jumps over the lazy dog"  # 9 tokens


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("d1", f"alpha starts here {SHARED} then alpha continues onward"),
        ("d2", f"{SHARED} beta unique middle part {SHARED}"),
        ("d3", "totally unrelated words nothing shared at all"),
        ("d4", ""),  # empty doc
        ("d5", "tiny doc"),  # shorter than k
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def _spans(df):
    return {
        (r["doc_id"], r["span_start"]): (r["span_end"], r["span_len"])
        for r in df.collect()
    }


def test_planted_shared_substring(corpus):
    got = _spans(duplicate_spans(corpus, k=5))
    # d1: SHARED occupies tokens 3..11 (9 tokens)
    assert got[("d1", 3)] == (11, 9)
    # d2: SHARED at 0..8 and again at 13..21 — two separate spans
    assert got[("d2", 0)] == (8, 9)
    assert got[("d2", 13)] == (21, 9)
    assert len(got) == 3  # d3/d4/d5 contribute nothing


def test_adjacent_ngrams_merge_into_one_span(spark):
    # one 12-token duplicated region must come back as ONE span, not 8
    text = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12"
    df = spark.createDataFrame(
        [("x", f"pre {text} post"), ("y", f"{text} tail words here")],
        "doc_id string, text string",
    )
    got = _spans(duplicate_spans(df, k=5))
    assert got[("x", 1)] == (12, 12)
    assert got[("y", 0)] == (11, 12)
    assert len(got) == 2


def test_within_document_repeat_counts(spark):
    # the duplicate occurs twice in the SAME doc — still detected
    df = spark.createDataFrame(
        [("solo", "z1 z2 z3 z4 z5 filler words go here z1 z2 z3 z4 z5")],
        "doc_id string, text string",
    )
    got = _spans(duplicate_spans(df, k=5))
    assert got[("solo", 0)] == (4, 5) and got[("solo", 9)] == (13, 5)


def test_stats_rollup_covers_all_docs(corpus):
    got = {r["doc_id"]: r.asDict() for r in
           duplicate_span_stats(corpus, k=5).collect()}
    assert set(got) == {"d1", "d2", "d3", "d4", "d5"}
    assert got["d1"]["n_spans"] == 1 and got["d1"]["dup_tokens"] == 9
    assert got["d2"]["n_spans"] == 2 and got["d2"]["dup_tokens"] == 18
    assert got["d2"]["dup_frac"] == pytest.approx(18 / 22, abs=1e-6)
    assert got["d3"]["n_spans"] == 0 and got["d3"]["dup_frac"] == 0.0
    assert got["d4"]["n_tok"] == 0 and got["d4"]["dup_frac"] == 0.0
    assert got["d5"]["n_spans"] == 0


def test_validation_and_layout_independence(corpus):
    with pytest.raises(ValueError):
        duplicate_spans(corpus, k=0)
    with pytest.raises(ValueError):
        duplicate_spans(corpus, min_count=1)
    a = sorted(map(tuple, duplicate_spans(corpus.repartition(1), k=5).collect()))
    b = sorted(map(tuple,
                   duplicate_spans(corpus.repartition(7, "doc_id"), k=5,
                                   broadcast_dups=False).collect()))
    assert a == b


def test_duckdb_oracle_on_sf_documents(spark):
    """Full sweep on sf0.001 documents at k=4 (the table has ~1k
    duplicated 4-grams) — spans must match DuckDB bit-for-bit."""
    sf = "/root/testdata/sf0.001"
    k = 4
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = sorted(map(tuple, duplicate_spans(docs, k=k).collect()))

    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    want = con.sql(f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN length(norm) = 0 THEN [] ELSE string_split(norm, ' ') END AS tk
  FROM (SELECT doc_id, trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g')) AS norm
        FROM '{sf}/documents.parquet')
), g AS (
  SELECT doc_id, generate_subscripts(gs, 1) - 1 AS pos, md5(unnest(gs)) AS h
  FROM (SELECT doc_id,
          CASE WHEN len(tk) >= {k}
               THEN list_transform(range(1, len(tk) - {k} + 2),
                                   i -> array_to_string(tk[i:i+{k}-1], ' '))
               ELSE [] END AS gs
        FROM t)
), dup AS (
  SELECT h FROM g GROUP BY h HAVING count(*) >= 2
), hits AS (
  SELECT doc_id, pos FROM g WHERE h IN (SELECT h FROM dup)
), m AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL OR pos - lag(pos) OVER w > {k}
              THEN 1 ELSE 0 END AS new
  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), s AS (
  SELECT doc_id, pos,
         sum(new) OVER (PARTITION BY doc_id ORDER BY pos) AS span
  FROM m
)
SELECT doc_id, min(pos)::int AS span_start, (max(pos) + {k} - 1)::int AS span_end,
       (max(pos) - min(pos) + {k})::int AS span_len
FROM s GROUP BY doc_id, span ORDER BY doc_id, span_start
""").fetchall()
    assert got == [tuple(r) for r in want]
    assert len(got) > 50  # the sweep found real spans


def test_spans_cover_every_duplicated_ngram(spark):
    """Correctness invariant of the approximation: every k-gram that
    occurs >= 2 times corpus-wide lies inside some reported span."""
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").limit(100)
    k = 4
    spans = duplicate_spans(docs, k=k).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    import collections

    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    grams = collections.Counter()
    positions = []
    for d, t in texts.items():
        toks = t.lower().split()
        for i in range(len(toks) - k + 1):
            g = " ".join(toks[i : i + k])
            grams[g] += 1
            positions.append((d, i, g))
    for d, i, g in positions:
        if grams[g] >= 2:
            assert any(s <= i and i + k - 1 <= e for s, e in by_doc[d]), (
                d, i, g,
            )
