"""Corpus-level line dedup (CCNet-style boilerplate removal): planted
fixtures, policy semantics, edge cases, and a DuckDB oracle sweep."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators.linededup import duplicated_lines, line_dedup

BOILER = "subscribe to our newsletter today"
MENU = "home about contact privacy"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("d1", f"unique alpha content one\n{BOILER}\nmore alpha text"),
        ("d2", f"{BOILER}\nunique beta content two\n{MENU}"),
        ("d3", f"{MENU}\nunique gamma content three\n{BOILER}"),
        ("d4", "entirely unique document body"),
        ("d5", f"{BOILER}"),  # doc that is ONLY boilerplate
        ("d6", "hi\nok\nunique zeta content"),  # short lines are exempt
        ("d7", "hi\nok\nunique eta content"),
        ("d8", None),  # null text
        ("d9", f"  {BOILER.upper()}  \nunique theta content"),  # normalization
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_removes_every_copy_by_default(corpus):
    got = _by_id(line_dedup(corpus))
    assert set(got) == {f"d{i}" for i in range(1, 10)}
    assert got["d1"]["text_clean"] == "unique alpha content one\nmore alpha text"
    assert got["d1"]["n_lines"] == 3 and got["d1"]["n_removed"] == 1
    # d2/d3 lose both boilerplate lines
    assert got["d2"]["text_clean"] == "unique beta content two"
    assert got["d3"]["text_clean"] == "unique gamma content three"
    # fully-boilerplate doc is retained, empty
    assert got["d5"]["text_clean"] == "" and got["d5"]["n_removed"] == 1
    # null text -> one empty (exempt) line
    assert got["d8"]["text_clean"] == "" and got["d8"]["n_removed"] == 0
    # case/whitespace-insensitive matching removes the shouted copy
    assert got["d9"]["text_clean"] == "unique theta content"


def test_short_lines_exempt(corpus):
    got = _by_id(line_dedup(corpus))
    # "hi"/"ok" duplicate across d6/d7 but are below min_chars
    assert got["d6"]["text_clean"] == "hi\nok\nunique zeta content"
    assert got["d7"]["n_removed"] == 0
    # lowering the bar removes them
    strict = _by_id(line_dedup(corpus, min_chars=1))
    assert strict["d6"]["text_clean"] == "unique zeta content"
    assert strict["d6"]["n_removed"] == 2


def test_keep_first_retains_canonical_copy(corpus):
    got = _by_id(line_dedup(corpus, keep_first=True))
    # BOILER's canonical copy is (d1, line 1); MENU's is (d2, line 2)
    assert got["d1"]["text_clean"] == (
        f"unique alpha content one\n{BOILER}\nmore alpha text"
    )
    assert got["d2"]["text_clean"] == f"unique beta content two\n{MENU}"
    assert got["d3"]["text_clean"] == "unique gamma content three"
    assert got["d5"]["text_clean"] == "" and got["d5"]["n_removed"] == 1


def test_min_count_threshold(corpus):
    # BOILER appears 5x, MENU 2x: min_count=3 keeps MENU everywhere
    got = _by_id(line_dedup(corpus, min_count=3))
    assert got["d2"]["text_clean"] == f"unique beta content two\n{MENU}"
    assert got["d3"]["text_clean"] == f"{MENU}\nunique gamma content three"
    with pytest.raises(ValueError):
        line_dedup(corpus, min_count=1)


def test_duplicated_lines_diagnostic(corpus):
    rows = duplicated_lines(corpus).collect()
    by_line = {r["line"]: r for r in rows}
    assert by_line[BOILER]["n_copies"] == 5 and by_line[BOILER]["n_docs"] == 5
    assert by_line[MENU]["n_copies"] == 2 and by_line[MENU]["n_docs"] == 2
    assert list(by_line) == [BOILER, MENU]  # heaviest first
    assert duplicated_lines(corpus, top=1).count() == 1


def test_layout_independence(corpus):
    a = sorted(map(tuple, line_dedup(corpus.repartition(1)).collect()))
    b = sorted(map(tuple, line_dedup(corpus.repartition(7, "doc_id")).collect()))
    assert a == b


def _duck_line_dedup(rows, min_count=2, min_chars=6, keep_first=False):
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    keep_extra = "OR rn = 1" if keep_first else ""
    return con.sql(f"""
WITH l AS (
  SELECT doc_id, generate_subscripts(ls, 1) - 1 AS line_no, unnest(ls) AS line
  FROM (SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls FROM docs)
), h AS (
  SELECT doc_id, line_no, line,
         CASE WHEN length(norm) >= {min_chars} THEN md5(norm) END AS h
  FROM (SELECT *, trim(regexp_replace(lower(line), '\\s+', ' ', 'g')) AS norm FROM l)
), dup AS (
  SELECT h FROM h WHERE h IS NOT NULL GROUP BY h HAVING count(*) >= {min_count}
), k AS (
  SELECT doc_id, line_no, line,
         (h IS NULL OR h NOT IN (SELECT h FROM dup) {keep_extra}) AS keep
  FROM (SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id, line_no) AS rn FROM h)
)
SELECT doc_id, count(*)::int AS n_lines,
       sum(CASE WHEN NOT keep THEN 1 ELSE 0 END)::int AS n_removed,
       coalesce(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY line_no), '') AS text_clean
FROM k GROUP BY doc_id ORDER BY doc_id
""").fetchall()


@pytest.mark.parametrize("keep_first", [False, True])
def test_duckdb_oracle_parity(spark, corpus, keep_first):
    got = sorted(
        map(tuple, line_dedup(corpus, keep_first=keep_first).collect())
    )
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    want = _duck_line_dedup(rows, keep_first=keep_first)
    assert got == [tuple(r) for r in want]


def test_duckdb_oracle_on_sf_documents(spark):
    """Real-table sweep: chunk sf0.001 documents into 4-token lines
    (they ship single-line) and require bit-identical cleaned text."""
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    from medea_ps_spark.functions.text import normalize, whitespace_tokens

    toks = whitespace_tokens(normalize(F.col("text")))
    n = F.size(toks)
    ml = F.when(n == 0, F.lit("")).otherwise(
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.ceil(n / F.lit(4.0)).cast("int") - 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i * 4 + 1, 4)),
            ),
            "\n",
        )
    )
    chunked = docs.select("doc_id", ml.alias("text"))
    got = sorted(map(tuple, line_dedup(chunked).collect()))

    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    want = con.sql(f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN length(norm) = 0 THEN [] ELSE string_split(norm, ' ') END AS tk
  FROM (SELECT doc_id, trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g')) AS norm
        FROM '{sf}/documents.parquet')
), l AS (
  SELECT doc_id, generate_subscripts(ls, 1) - 1 AS line_no, unnest(ls) AS line
  FROM (SELECT doc_id,
          CASE WHEN len(tk) = 0 THEN ['']
               ELSE list_transform(range(0, CAST(ceil(len(tk) / 4.0) AS INT)),
                                   i -> array_to_string(tk[i*4+1:i*4+4], ' '))
          END AS ls
        FROM t)
), h AS (
  SELECT doc_id, line_no, line,
         CASE WHEN length(line) >= 6 THEN md5(line) END AS h
  FROM l
), dup AS (
  SELECT h FROM h WHERE h IS NOT NULL GROUP BY h HAVING count(*) >= 2
)
SELECT doc_id, count(*)::int AS n_lines,
       sum(CASE WHEN h IS NOT NULL AND h IN (SELECT h FROM dup) THEN 1 ELSE 0 END)::int AS n_removed,
       coalesce(string_agg(CASE WHEN h IS NULL OR h NOT IN (SELECT h FROM dup) THEN line END,
                           chr(10) ORDER BY line_no), '') AS text_clean
FROM h GROUP BY doc_id ORDER BY doc_id
""").fetchall()
    assert got == [tuple(r) for r in want]
    assert sum(r[2] for r in got) > 0  # the sweep actually removed lines
