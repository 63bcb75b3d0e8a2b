"""Duplicate-span detection — find the maximal token ranges of each
document that also occur elsewhere in the corpus (Lee et al.,
"Deduplicating Training Data Makes Language Models Better", ACL 2022).
The paper's ExactSubstr uses a suffix array; the standard distributed
approximation (used here) hashes overlapping k-token n-grams, finds
n-grams occurring more than once corpus-wide, and merges the duplicated
positions of each document into maximal spans — every exact duplicate
substring of >= k tokens is covered by such a span.

The reference engine (juspay/medea-ps) has no corpus-level text
operators (`src/Data/Medea/Loader.purs:71-75`); this belongs to the
mandated training-data-pipeline family.

All hashing/windowing is JVM-side SQL; no Python in the hot path.

Scale notes (100 TB):
* n-gram hashes never carry text: the global duplicate-detection
  aggregation shuffles (16-byte md5, partial count) rows — one shuffle,
  map-side combined.
* the surviving duplicate-hash relation (count >= min_count) is small
  (only repeated k-grams); with ``broadcast_dups=True`` it is
  explicitly broadcast, so the per-token position rows are NEVER
  shuffled — they explode, hash, probe the broadcast set, and only the
  *duplicated* positions (again small) reach the per-document window.
* span merging is a per-document window (partitionBy doc_id): documents
  are bounded in size, so no celebrity-key risk on a primary key.
* memory bound: if the duplicate-hash set is too big to broadcast, pass
  ``broadcast_dups=False`` for a sort-merge join under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import normalize, whitespace_tokens


def _ngram_positions(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """(id, pos, h): md5 of each k-token shingle of the normalized
    text, with its 0-based start-token position."""
    toks = whitespace_tokens(normalize(F.col(text_col)))
    n = F.size(toks)
    grams = F.when(
        n < k, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(k)]
            ),
        )
    )
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tok"),
        F.posexplode(grams).alias("pos", "_g"),
    ).select(id_col, "n_tok", "pos", F.md5(F.col("_g")).alias("_h"))


def duplicated_positions(
    pos: DataFrame,
    id_col: str = "doc_id",
    min_count: int = 2,
    broadcast_dups: bool = True,
) -> DataFrame:
    """From an n-gram position relation ``(id_col, pos, _h)`` keep the
    positions whose hash occurs >= ``min_count`` times corpus-wide.
    Shared by the text (:func:`duplicate_spans`) and token-id
    (``tokenops.token_duplicate_spans``) variants — the duplicate-hash
    relation is small (only repeated k-grams) and is broadcast by
    default so the position rows never shuffle."""
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    dup = (
        pos.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") >= min_count)
        .select("_h")
    )
    if broadcast_dups:
        dup = F.broadcast(dup)
    return pos.join(dup, "_h").select(id_col, "pos")


def merge_duplicate_positions(
    hits: DataFrame, id_col: str, k: int
) -> DataFrame:
    """Merge duplicated k-gram start positions ``(id_col, pos)`` into
    maximal spans ``(id_col, span_start, span_end, span_len)`` — the
    gaps-and-islands pass shared by the text and token-id variants.
    Per-document window only: documents are bounded, no celebrity-key
    risk on a primary key."""
    # gaps-and-islands: with fixed-width intervals [pos, pos+k-1] the
    # interval end is monotone in pos, so a lag suffices — a new span
    # starts when this n-gram neither overlaps nor touches the previous
    w = Window.partitionBy(id_col).orderBy("pos")
    return (
        hits.withColumn("_prev", F.lag("pos").over(w))
        .withColumn(
            "_new",
            (F.col("_prev").isNull() | (F.col("pos") - F.col("_prev") > k))
            .cast("int"),
        )
        .withColumn("_span", F.sum("_new").over(w))
        .groupBy(id_col, "_span")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
        )
        .select(
            id_col,
            F.col("span_start").cast("int").alias("span_start"),
            F.col("span_end").cast("int").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("int")
            .alias("span_len"),
        )
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_count: int = 2,
    broadcast_dups: bool = True,
) -> DataFrame:
    """Maximal duplicated token spans per document:

        (id_col, span_start, span_end, span_len)

    A k-token n-gram is *duplicated* when its normalized form occurs
    >= ``min_count`` times corpus-wide (any position, any document —
    within-document repeats count, exactly as a suffix array would see
    them). Overlapping and token-adjacent duplicated n-grams merge into
    one span; ``span_start``/``span_end`` are inclusive 0-based token
    indices, so ``span_len = span_end - span_start + 1 >= k``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pos = _ngram_positions(df, text_col, id_col, k)
    hits = duplicated_positions(
        pos, id_col, min_count=min_count, broadcast_dups=broadcast_dups
    )
    return merge_duplicate_positions(hits, id_col, k)


def duplicate_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_count: int = 2,
    broadcast_dups: bool = True,
) -> DataFrame:
    """Per-document roll-up of :func:`duplicate_spans`:

        (id_col, n_tok, n_spans, dup_tokens, dup_frac)

    ``dup_frac`` is the fraction of the document's tokens covered by a
    duplicated span (the quantity Lee et al. report per corpus); every
    input document appears, with zeros when nothing is duplicated.
    """
    spans = duplicate_spans(
        df, text_col, id_col, k=k, min_count=min_count,
        broadcast_dups=broadcast_dups,
    )
    toks = df.select(
        F.col(id_col),
        F.size(whitespace_tokens(normalize(F.col(text_col))))
        .cast("int")
        .alias("n_tok"),
    )
    return span_coverage_stats(spans, toks, id_col)


def span_coverage_stats(
    spans: DataFrame, ntok_df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Roll spans up per document against ``ntok_df = (id_col, n_tok)``:
    every input document appears, with zeros when nothing is duplicated
    — shared by the text and token-id variants."""
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_spans"),
        F.sum("span_len").cast("int").alias("dup_tokens"),
    )
    return ntok_df.join(per_doc, id_col, "left").select(
        id_col,
        "n_tok",
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        F.when(F.col("n_tok") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.coalesce("dup_tokens", F.lit(0)).cast("double")
                / F.col("n_tok"),
                6,
            )
        )
        .alias("dup_frac"),
    )
