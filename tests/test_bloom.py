"""Distributed Bloom filter + bloom-prefiltered incremental dedup."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators import bloom as B
from medea_ps_spark.operators.dedup import incremental_dedup


@pytest.fixture(scope="module")
def member_words(spark):
    rows = [(f"member-{i}",) for i in range(2000)]
    return spark.createDataFrame(rows, "w string")


def _blob(spark, df, num_bits=1 << 16, k=5):
    return B.bloom_to_array(B.bloom_build(df, "w", num_bits, k), num_bits)


def test_bloom_no_false_negatives(spark, member_words):
    blob = _blob(spark, member_words)
    probed = B.bloom_might_contain(member_words, "w", blob, 5)
    assert probed.where(~F.col("bloom_hit")).count() == 0


def test_bloom_fp_rate_within_theory(spark, member_words):
    num_bits, k, n = 1 << 16, 5, 2000
    blob = _blob(spark, member_words, num_bits, k)
    absent = spark.createDataFrame(
        [(f"absent-{i}",) for i in range(5000)], "w string"
    )
    fp = B.bloom_might_contain(absent, "w", blob, k).where(
        F.col("bloom_hit")
    ).count()
    # theoretical FP ≈ (1 - e^{-kn/m})^k ≈ 0.00012 here; allow 20× slack
    assert fp / 5000 < 0.0025, fp


def test_bloom_null_probes_to_null(spark):
    df = spark.createDataFrame([("a",), (None,)], "w string")
    blob = _blob(spark, df.where(F.col("w").isNotNull()))
    rows = {r["w"]: r["bloom_hit"] for r in B.bloom_might_contain(df, "w", blob, 5).collect()}
    assert rows["a"] is True and rows[None] is None


def test_bloom_merge_equals_whole(spark, member_words):
    num_bits, k = 1 << 14, 4
    a = member_words.where(F.crc32("w") % 2 == 0)
    b = member_words.where(F.crc32("w") % 2 == 1)
    merged = B.bloom_merge(
        B.bloom_build(a, "w", num_bits, k), B.bloom_build(b, "w", num_bits, k)
    )
    whole = B.bloom_build(member_words, "w", num_bits, k)
    assert np.array_equal(
        B.bloom_to_array(merged, num_bits), B.bloom_to_array(whole, num_bits)
    )


def test_bloom_word_table_bit_identical_in_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    num_bits, k, salt = 1 << 12, 3, "bloom"
    df = spark.createDataFrame([(f"v{i}",) for i in range(300)], "w string")
    got = sorted(
        (r["word_idx"], r["bits"])
        for r in B.bloom_build(df, "w", num_bits, k, salt).collect()
    )
    con = duckdb.connect()
    con.register("vals", df.toPandas())
    want = sorted(
        tuple(t)
        for t in con.execute(
            f"""
            WITH lanes AS (
              SELECT ('0x' || substr(md5('{salt}' || ':' || w), 1, 15))::BIGINT
                       % {num_bits} AS h1,
                     ('0x' || substr(md5('{salt}' || ':' || w), 17, 15))::BIGINT
                       % {num_bits} AS h2
              FROM vals
            ), pos AS (
              SELECT (h1 + i * h2) % {num_bits} AS p
              FROM lanes, range(0, {k}) t(i)
            )
            SELECT CAST(p // 64 AS INT) AS word_idx,
                   bit_or(CASE WHEN p % 64 = 63 THEN -9223372036854775808
                          ELSE CAST(1 AS BIGINT) << CAST(p % 64 AS INT)
                          END) AS bits
            FROM pos GROUP BY 1
            """
        ).fetchall()
    )
    assert got == want


@pytest.fixture(scope="module")
def dedup_frames(spark):
    rng = random.Random(7)
    corpus = [(i, f"corpus doc {i} body {rng.randint(0, 9)}") for i in range(1500)]
    batch = []
    for i in range(400):
        if i % 3 == 0:  # recrawl of an existing doc (normalized-equal text)
            j = rng.randrange(1500)
            batch.append((10_000 + i, corpus[j][1]))
        elif i % 3 == 1:  # fresh
            batch.append((10_000 + i, f"fresh doc {i}"))
        else:  # within-batch dup pair
            batch.append((10_000 + i, f"batch dup {i % 10}"))
    batch.append((99_999, None))  # NULL text takes the exact path
    cdf = spark.createDataFrame(corpus, "doc_id int, text string")
    bdf = spark.createDataFrame(batch, "doc_id int, text string")
    return bdf, cdf


def test_incremental_dedup_bloom_bit_identical(spark, dedup_frames):
    bdf, cdf = dedup_frames
    plain = sorted(map(tuple, incremental_dedup(bdf, cdf).collect()))
    fast = sorted(
        map(tuple, B.incremental_dedup_bloom(bdf, cdf, num_bits=1 << 16).collect())
    )
    assert fast == plain and len(plain) > 0


def test_incremental_dedup_bloom_prebuilt_blob_reused(spark, dedup_frames):
    bdf, cdf = dedup_frames
    from medea_ps_spark.functions.text import fingerprint

    corpus_fp = cdf.select(fingerprint(F.col("text")).alias("fingerprint"))
    blob = B.bloom_to_array(
        B.bloom_build(corpus_fp, "fingerprint", 1 << 16, 7, "bloomdedup"), 1 << 16
    )
    plain = sorted(map(tuple, incremental_dedup(bdf, cdf).collect()))
    fast = sorted(
        map(
            tuple,
            B.incremental_dedup_bloom(
                bdf, cdf, num_bits=1 << 16, blob=blob
            ).collect(),
        )
    )
    assert fast == plain


def test_incremental_dedup_bloom_randomized(spark):
    rng = random.Random(123)
    for trial in range(3):
        corpus = [(i, f"c{rng.randint(0, 200)}") for i in range(300)]
        batch = [(1000 + i, f"c{rng.randint(0, 400)}") for i in range(150)]
        cdf = spark.createDataFrame(corpus, "doc_id int, text string")
        bdf = spark.createDataFrame(batch, "doc_id int, text string")
        plain = sorted(map(tuple, incremental_dedup(bdf, cdf).collect()))
        fast = sorted(
            map(
                tuple,
                B.incremental_dedup_bloom(bdf, cdf, num_bits=1 << 14).collect(),
            )
        )
        assert fast == plain, f"trial {trial}"


def test_optimal_num_hashes():
    assert B.optimal_num_hashes(1 << 20, 100_000) == round(
        (1 << 20) / 100_000 * 0.6931471805599453
    )
    assert B.optimal_num_hashes(64, 10**9) == 1
