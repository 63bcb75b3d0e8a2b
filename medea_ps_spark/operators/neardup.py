"""Incremental (batch-vs-corpus) MinHash near-duplicate detection.

`dedup.minhash_near_duplicates` answers the one-shot question "which
pairs inside THIS table are near-dups" with a self-join. The
steady-state ingest question is different: a daily batch of B rows
arrives next to a corpus of N >> B rows, and re-running the self-join
over N+B (re-hashing 100 TB to admit 100 GB) is the classic
accidentally-quadratic pipeline. This module splits the LSH index from
the probe, mirroring how `dedup.incremental_dedup` split exact dedup:

* `corpus_lsh_index(corpus)` — one scan of the corpus producing its
  (band, bucket, id) relation; a persistable artifact (parquet next to
  the checkpoint manifest) that an append-only corpus extends by
  indexing ONLY each admitted batch and appending.
* `incremental_near_duplicates(batch, corpus, index)` — scans the
  BATCH only: batch band buckets equi-join the index on (band,bucket)
  — with the batch side orders of magnitude smaller, AQE broadcasts
  it, so the corpus index is never shuffled — then candidates verify
  with the exact shingle Jaccard by joining the two text sides on
  their (few) candidate ids.
* `incremental_near_dedup(...)` — the admit/reject wrapper returning
  (fresh_batch, matches), same shape as `incremental_dedup`.

Bucket-size capping (`dedup._cap_buckets`) applies to the CORPUS index
at build time — a degenerate boilerplate bucket would otherwise match
every future batch row against thousands of corpus rows forever.

Same-batch near-dups are a separate (tiny) self-join question the
caller can run with `minhash_near_duplicates(batch)`; this operator
deliberately answers only batch-vs-corpus, so admitted rows can be
indexed and appended without re-deriving anything.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame, functions as F

from .dedup import (
    _cap_buckets,
    minhash_lsh_candidates,
    minhash_signature,
    word_shingles,
)


def _band_buckets(
    sigs: DataFrame,
    id_col: str,
    bands: int,
    rows_per_band: int,
    hash_fn: str,
) -> DataFrame:
    """(id, band, bucket) triples — one explode, no shuffle. Identical
    banding math to `minhash_lsh_candidates` so an index built here is
    probe-compatible with signatures hashed anywhere."""

    def bucket_of(b: int):
        sl = F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
        if hash_fn == "md5":
            return F.md5(F.encode(F.concat_ws("|", sl), "utf-8"))
        return F.xxhash64(sl)

    return sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), bucket_of(b).alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def corpus_lsh_index(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    seed: int = 42,
    max_bucket_size: Optional[int] = 1000,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """The corpus's (id, band, bucket) LSH relation — ONE corpus scan,
    persistable, appendable (index each admitted batch with the same
    params and union/append; no historical row is ever re-read). The
    bucket cap drops degenerate buckets at build time; string bucket
    ids under hash_fn="md5" keep the artifact engine-portable."""
    sigs = minhash_signature(
        corpus, text_col, id_col, num_hashes, shingle_k, seed, hash_fn
    )
    bb = _band_buckets(sigs, id_col, bands, num_hashes // bands, hash_fn)
    return _cap_buckets(bb, ["band", "bucket"], max_bucket_size)


def incremental_near_duplicates(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.7,
    seed: int = 42,
    max_bucket_size: Optional[int] = 1000,
    hash_fn: str = "xxhash64",
    corpus_index: Optional[DataFrame] = None,
) -> DataFrame:
    """(batch_id, corpus_id, jaccard ≥ threshold) — every batch doc
    near-matching any corpus doc. Scans the batch; the corpus is
    touched only through ``corpus_index`` (pass the persisted relation;
    built on the fly from ``corpus`` when None) plus a candidate-id
    join back to corpus text for the exact-Jaccard verify, which
    touches one corpus row per CANDIDATE, not per corpus row."""
    if corpus_index is None:
        corpus_index = corpus_lsh_index(
            corpus, text_col, id_col, num_hashes, bands,
            shingle_k, seed, max_bucket_size, hash_fn,
        )
    sigs_b = minhash_signature(
        batch, text_col, id_col, num_hashes, shingle_k, seed, hash_fn
    )
    bb_b = _band_buckets(sigs_b, id_col, bands, num_hashes // bands, hash_fn)
    cand = (
        bb_b.withColumnRenamed(id_col, "batch_id")
        .join(
            corpus_index.withColumnRenamed(id_col, "corpus_id"),
            ["band", "bucket"],
        )
        .select("batch_id", "corpus_id")
        .distinct()
    )
    sh_b = batch.select(
        F.col(id_col).alias("batch_id"),
        F.array_distinct(word_shingles(F.col(text_col), k=shingle_k)).alias("sh_b"),
    )
    sh_c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.array_distinct(word_shingles(F.col(text_col), k=shingle_k)).alias("sh_c"),
    )
    return (
        cand.join(sh_b, "batch_id")
        .join(sh_c, "corpus_id")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_b", "sh_c")).cast("double")
            / F.size(F.array_union("sh_b", "sh_c")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("batch_id", "corpus_id", "jaccard")
    )


def fuzzy_contamination_check(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.6,
    seed: int = 42,
    max_bucket_size: Optional[int] = 1000,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Fuzzy (near-duplicate) decontamination of a training corpus
    against an eval/benchmark set — the Jaccard-similarity complement
    of `dedup.contamination_check`'s exact-shingle test (GPT-3 App. A
    uses exact n-gram collision; later corpora also drop documents
    NEAR-matching an eval item, which exact collision misses after
    light paraphrase/reformatting).

    Output: one row per CONTAMINATED corpus doc — (id, max_jaccard,
    n_eval_matches, eval ids list) with jaccard >= threshold; join back
    left-anti (or use :func:`fuzzy_decontaminate`) to drop them.

    Scale shape (why this is not just `minhash_near_duplicates` over
    the union): the corpus is the 10^12-row side and is SCANNED ONCE
    (signature + band explode, map-only); the eval set is thousands of
    rows, so its band index AND its shingle sets broadcast — every join
    here is a broadcast hash probe on the corpus stream, no corpus
    shuffle until the final per-doc max over the (tiny) candidate set.
    This is `incremental_near_duplicates` with the roles flipped:
    batch=corpus, corpus=eval."""
    matches = incremental_near_duplicates(
        corpus,
        eval_df.withColumnRenamed(eval_id_col, id_col),
        text_col, id_col, num_hashes, bands, shingle_k,
        threshold, seed, max_bucket_size, hash_fn,
    )
    return (
        matches.groupBy(F.col("batch_id").alias(id_col))
        .agg(
            F.max("jaccard").alias("max_jaccard"),
            F.count(F.lit(1)).alias("n_eval_matches"),
            F.sort_array(F.collect_list("corpus_id")).alias("eval_ids"),
        )
    )


def fuzzy_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.6,
    **kw,
) -> Tuple[DataFrame, DataFrame]:
    """(clean_corpus, contamination_report): corpus rows with no eval
    near-match, plus the evidence rows from
    :func:`fuzzy_contamination_check`. The reject filter is a left-anti
    join on the (small) contaminated-id set."""
    report = fuzzy_contamination_check(
        corpus, eval_df, text_col, id_col, threshold=threshold, **kw
    )
    clean = corpus.join(
        report.select(id_col), id_col, "left_anti"
    )
    return clean, report


def incremental_near_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    corpus_index: Optional[DataFrame] = None,
    **kw,
) -> Tuple[DataFrame, DataFrame]:
    """(fresh_batch, matches): batch rows with NO near-match in the
    corpus (admit + index + append these), and the match evidence.
    The reject filter is a left-anti join on the batch's own (small)
    match-id set — no second corpus touch."""
    matches = incremental_near_duplicates(
        batch, corpus, text_col, id_col,
        threshold=threshold, corpus_index=corpus_index, **kw,
    )
    hit_ids = matches.select(F.col("batch_id").alias(id_col)).distinct()
    fresh = batch.join(hit_ids, id_col, "left_anti")
    return fresh, matches
