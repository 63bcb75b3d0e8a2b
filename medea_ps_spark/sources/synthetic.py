"""Deterministic, fully distributed synthetic fixtures (FIXTURES.md).

Everything derives from ``spark.range(n)`` + ``xxhash64`` so generation
is a pure function of (seed, n) — identical values at any parallelism
level (local[8] vs local[32] produce byte-identical tables), no driver
data, no Python RNG. That property is what makes the two-cluster-size
scaling benchmark and resume tests meaningful.

Shape matches BASELINE.json input_hint exactly:
(doc_id:string, tokens:array<int>, n_tok:int, source:string).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

VOCAB = 50257
MAX_LEN = 8192

ALLOWED_SOURCES: List[str] = [
    "web-2025", "books", "code", "wiki", "news", "forums", "papers",
    "patents", "legal", "medical", "reviews", "social", "subtitles",
    "recipes", "manuals", "mail-lists", "qa-sites", "transcripts",
    "stories", "reference",
]


def _u(seed: int, salt: str, *cols: Column) -> Column:
    """Uniform double in [0,1), a pure function of (seed, salt, cols)."""
    h = F.xxhash64(F.lit(seed), F.lit(salt), *cols)
    return (F.pmod(h, F.lit(1 << 30)).cast("double")) / F.lit(float(1 << 30))


def _hit(seed: int, salt: str, rate_per_million: int, *cols: Column) -> Column:
    """Deterministic boolean with probability rate_per_million / 1e6."""
    h = F.xxhash64(F.lit(seed), F.lit(salt), *cols)
    return F.pmod(h, F.lit(1_000_000)) < F.lit(rate_per_million)


def sequences(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    vocab: int = VOCAB,
    max_len: int = MAX_LEN,
    clean: bool = False,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """The primary tokenized-sequence table with seeded violation rates
    (FIXTURES.md §1): ~0.1% duplicate doc_id, ~0.05% null doc_id,
    ~0.2% out-of-range token, ~0.1% empty tokens, ~0.2% n_tok mismatch,
    ~0.1% unknown source, Zipf-skewed source. ``clean=True`` disables
    all injected violations (reference-profile epochs)."""
    df = spark.range(0, n_rows, numPartitions=num_partitions)
    i = F.col("id")

    # -- length: skewed toward short sequences, clipped to [1, max_len]
    u_len = _u(seed, "len", i)
    n_gen = (F.lit(1) + F.floor(F.lit(max_len - 1) * F.pow(u_len, F.lit(3.0)))).cast(
        "int"
    )

    # -- tokens: per-position hash into [0, vocab)
    tokens = F.transform(
        F.sequence(F.lit(1), n_gen),
        lambda j: F.pmod(F.xxhash64(F.lit(seed), F.lit("tok"), i, j), F.lit(vocab)).cast(
            "int"
        ),
    )

    if not clean:
        # ~0.2% rows: one token pushed out of range
        bad_tok = _hit(seed, "badtok", 2000, i)
        bad_pos = F.pmod(F.xxhash64(F.lit(seed), F.lit("badpos"), i), n_gen.cast("bigint")) + 1
        tokens = F.when(
            bad_tok,
            F.transform(
                tokens,
                lambda x, j: F.when(
                    (j + 1) == bad_pos, F.lit(vocab + 17).cast("int")
                ).otherwise(x),
            ),
        ).otherwise(tokens)
        # ~0.1% rows: empty array
        tokens = F.when(_hit(seed, "empty", 1000, i), F.expr("array()").cast("array<int>")).otherwise(tokens)

    n_tok = F.size(tokens)
    if not clean:
        # ~0.2% rows: n_tok off by k in [1,5]
        off = _hit(seed, "ntok", 2000, i)
        k = (F.pmod(F.xxhash64(F.lit(seed), F.lit("ntokk"), i), F.lit(5)) + 1).cast("int")
        n_tok = F.when(off, n_tok + k).otherwise(n_tok)
    n_tok = n_tok.cast("int")

    # -- doc_id with seeded duplicates + nulls
    base_id = F.format_string("doc-%012d", i)
    if not clean:
        dup = _hit(seed, "dup", 1000, i) & (i > 100)
        back = F.pmod(F.xxhash64(F.lit(seed), F.lit("dupback"), i), F.lit(100)) + 1
        doc_id = F.when(dup, F.format_string("doc-%012d", i - back)).otherwise(base_id)
        doc_id = F.when(_hit(seed, "nullid", 500, i), F.lit(None)).otherwise(doc_id)
    else:
        doc_id = base_id

    # -- source: Zipf-ish skew over the allowed dimension
    u_src = _u(seed, "src", i)
    src_idx = F.least(
        F.floor(F.lit(len(ALLOWED_SOURCES)) * F.pow(u_src, F.lit(4.0))),
        F.lit(len(ALLOWED_SOURCES) - 1),
    ).cast("int")
    src_arr = F.array(*[F.lit(s) for s in ALLOWED_SOURCES])
    source = F.element_at(src_arr, src_idx + 1)
    if not clean:
        source = F.when(_hit(seed, "badsrc", 1000, i), F.lit("mystery-src")).otherwise(
            source
        )

    return df.select(
        doc_id.alias("doc_id"),
        tokens.alias("tokens"),
        n_tok.alias("n_tok"),
        source.alias("source"),
    )


def allowed_sources(spark: SparkSession) -> DataFrame:
    """Referential dimension (FIXTURES.md §2)."""
    rows = [(s, s not in ("legal", "medical")) for s in ALLOWED_SOURCES]
    return spark.createDataFrame(rows, schema="source string, license_ok boolean")


def write_partitioned(
    df: DataFrame, path: str, partition_col: str = "source", fmt: str = "parquet"
) -> None:
    """Iceberg-style layout fallback: parquet partitioned by source.
    (Iceberg runtime jar is absent in-sandbox; sources/tables.py detects
    and prefers format('iceberg') when available.)"""
    df.write.mode("overwrite").partitionBy(partition_col).format(fmt).save(path)
