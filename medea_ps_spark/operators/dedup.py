"""Deduplication operators for training-data pipelines — exact,
MinHash+LSH, SimHash, and n-gram Jaccard. All signature computation is
JVM-side SQL expressions (transform/array_min/aggregate over xxhash64);
no Python in the hot path. The LSH designs follow the standard
shingle→minhash→band→bucket-join construction (Broder; Leskovec et al.,
Mining of Massive Datasets ch.3).

Scale notes (100 TB):
* exact: one hash-agg over md5 fingerprints — shuffle carries
  (fingerprint, doc_id) only, not text.
* minhash-lsh: signatures are ~H×8 bytes/doc; the band-bucket shuffle
  carries (band, bucket-hash, id); candidate verification joins only
  within buckets. Super-frequent shingles can be frequency-capped
  upstream with a document-frequency filter.
* simhash: 64-bit fingerprints; near-dup candidates via band equality
  (4×16-bit) then Hamming verify — integers end to end.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import fingerprint, normalize, whitespace_tokens, word_shingles


# -- exact ---------------------------------------------------------------------


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, canonical_id, fingerprint) for every row whose normalized
    text also appears under a smaller id — the kept copy is min(id) per
    fingerprint. One shuffle on the 16-byte fingerprint."""
    fp = df.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint")
    )
    canon = fp.groupBy("fingerprint").agg(
        F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_copies")
    )
    return (
        fp.join(canon, "fingerprint")
        .where(F.col(id_col) != F.col("canonical_id"))
        .select(id_col, "canonical_id", "fingerprint")
    )


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Survivors after exact dedup (keep min-id per fingerprint) — a
    groupBy+min plus a self-semi-join, no full-row shuffle of text."""
    w = F.row_number().over(
        Window.partitionBy(fingerprint(F.col(text_col))).orderBy(F.col(id_col))
    )
    return df.withColumn("_rn", w).where(F.col("_rn") == 1).drop("_rn")


# -- minhash + LSH ----------------------------------------------------------------


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sig: array<bigint>) — sig[i] = min over shingles of
    xxhash64(seed, i, shingle). Entirely JVM-side: transform + array_min
    over the shingle array, one pass, no shuffle."""
    sh = word_shingles(F.col(text_col), k=shingle_k).alias("_sh")
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("_sh"),
                    lambda s: F.xxhash64(F.lit(seed), F.lit(i), s),
                )
            )
            for i in range(num_hashes)
        ]
    )
    return (
        df.select(F.col(id_col), sh)
        .where(F.size("_sh") > 0)
        .select(F.col(id_col), sig.alias("sig"))
    )


def minhash_lsh_candidates(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) sharing ≥1 LSH band bucket.
    Shuffle = (band, bucket, id) triples; the join is bucket-local."""
    buckets = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """Full pipeline: minhash → band buckets → candidates → verify with
    the exact shingle-set Jaccard (array_intersect/array_union — JVM).
    Returns (id_a, id_b, jaccard) with jaccard ≥ threshold."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signature(df, text_col, id_col, num_hashes, shingle_k, seed)
    cand = minhash_lsh_candidates(sigs, id_col, bands, rows_per_band)
    shing = df.select(
        F.col(id_col),
        F.array_distinct(word_shingles(F.col(text_col), k=shingle_k)).alias("_sh"),
    )
    j = (
        cand.join(shing.withColumnRenamed(id_col, "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
        .join(shing.withColumnRenamed(id_col, "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")),
        )
    )
    return j.where(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


# -- simhash -----------------------------------------------------------------------


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(id, simhash: bigint). Per doc: hash each token to 64 bits; bit b
    of the fingerprint is 1 iff more than half the tokens have bit b
    set. Expressed as aggregate over a sequence of bit positions — all
    codegen, no UDF."""
    toks = whitespace_tokens(normalize(F.col(text_col)))
    # materialize token hashes once, then sum 64 per-bit majority votes
    # (bit positions are Python ints — static expression tree, codegen'd)
    hashed = df.select(
        F.col(id_col),
        F.transform(toks, lambda t: F.xxhash64(F.lit(seed), t)).alias("_th"),
    )
    th = F.col("_th")
    n = F.size(th)
    sig = F.lit(0).cast("bigint")

    def bit_set(bb: int):
        # NB: a one-arg lambda is required — pyspark treats two-parameter
        # lambdas (incl. default args) as (element, index) HOFs
        return lambda h: F.shiftright(h, bb).bitwiseAND(F.lit(1)) == 1

    for b in range(bits):
        ones = F.size(F.filter(th, bit_set(b)))
        sig = sig + F.when(
            ones * 2 > n, F.lit(1 << b).cast("bigint") if b < 63 else F.lit(-(1 << 63)).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return hashed.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-dups with Hamming(simhash) ≤ max_hamming. Candidates via
    4×16-bit band equality (pigeonhole: ≤3 differing bits ⇒ ≥1 equal
    band), verified with bit_count(xor)."""
    sigs = simhash(df, text_col, id_col, seed=seed)
    bands = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bucket"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", "bb.band", "bb.bucket")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# -- n-gram Jaccard (exact, for modest candidate sets / oracle parity) ---------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: Optional[int] = None,
) -> DataFrame:
    """Exact all-pairs Jaccard via the inverted index: explode distinct
    shingles, self-join on shingle, count common, divide by union. The
    shuffle key is the shingle; ``max_shingle_df`` drops stop-shingles
    (document frequency cap) to bound the quadratic blowup at scale."""
    sh = df.select(
        F.col(id_col),
        F.array_distinct(word_shingles(F.col(text_col), k=shingle_k)).alias("_sh"),
    ).where(F.size("_sh") > 0)
    sizes = sh.select(F.col(id_col), F.size("_sh").alias("n_sh"))
    inv = sh.select(F.col(id_col), F.explode("_sh").alias("shingle"))
    if max_shingle_df is not None:
        keep = inv.groupBy("shingle").count().where(F.col("count") <= max_shingle_df)
        inv = inv.join(keep.select("shingle"), "shingle")
    a, b = inv.alias("a"), inv.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n_sh", "n_a")
    sb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n_sh", "n_b")
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
