"""Corpus-level line/paragraph deduplication (CCNet-style boilerplate
removal; Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", LREC 2020, §4.1 — duplicated paragraphs
are removed across the whole corpus, which strips headers, navigation
menus, cookie banners and other boilerplate that per-document filters
can't see).

The reference engine (juspay/medea-ps) has no corpus-level text
operators at all (`src/Data/Medea/Loader.purs:71-75` reads one file);
this is part of the mandated training-data-pipeline family.

Everything is JVM-side SQL expressions (split/posexplode/md5/window);
no Python in the hot path.

Scale notes (100 TB):
* line explosion is pipelined (no shuffle); the duplicate-line table is
  built by ONE hash aggregation whose shuffle carries 16-byte md5 keys
  with map-side partial counts — never the line text.
* only hashes with count >= min_count survive the HAVING, so the
  relation joined back to the lines is bounded by the number of
  DISTINCT duplicated lines (boilerplate is heavy-tailed: this is tiny
  relative to the corpus). AQE typically broadcasts it; the join then
  adds no shuffle of the exploded lines.
* document reassembly is one shuffle keyed by doc_id — same key space
  as the input, no skew beyond document size itself (documents are
  bounded; there is no celebrity-key risk on a primary key).
* `keep_first` canonical-copy mode resolves the survivor with the SAME
  aggregation (min struct(doc_id, line_no)) — no extra pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import normalize


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    min_chars: int = 6,
    keep_first: bool = False,
) -> DataFrame:
    """Remove lines whose normalized form appears >= ``min_count`` times
    across the whole corpus; return one row per input document:

        (id_col, n_lines, n_removed, text_clean)

    * Lines shorter than ``min_chars`` after normalization (lowercase,
      collapse whitespace, trim) are exempt — never counted and never
      removed (blank separators and one-word lines stay put).
    * ``keep_first=False`` (default, CCNet behavior): EVERY copy of a
      duplicated line is dropped — boilerplate removal.
    * ``keep_first=True``: the canonical copy — smallest
      (doc_id, line_no) — survives; only the other copies are dropped.
    * Documents whose every line is removed are retained with
      ``text_clean = ''`` so downstream joins never lose ids.

    Null text is treated as ''. Line numbering is 0-based.
    """
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    txt = F.coalesce(F.col(text_col), F.lit(""))
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(txt, "\n", -1)).alias("line_no", "line"),
    ).withColumn("_norm", normalize(F.col("line")))
    lines = lines.withColumn(
        "_h",
        F.when(F.length("_norm") >= min_chars, F.md5(F.col("_norm"))),
    ).drop("_norm")

    # one hash-agg over the 16-byte keys; HAVING keeps only duplicated
    # lines, so `dup` is small and AQE can broadcast the join below
    dup = (
        lines.where(F.col("_h").isNotNull())
        .groupBy("_h")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.min(F.struct(F.col(id_col), F.col("line_no"))).alias("_first"),
        )
        .where(F.col("_c") >= min_count)
        .select("_h", "_first")
        .withColumnRenamed("_h", "_dup_h")
    )

    joined = lines.join(dup, lines["_h"] == dup["_dup_h"], "left")
    keep = F.col("_dup_h").isNull()
    if keep_first:
        keep = keep | (
            (F.col(f"_first.{id_col}") == F.col(id_col))
            & (F.col("_first.line_no") == F.col("line_no"))
        )
    kept_flag = joined.select(
        F.col(id_col), "line_no", "line", keep.alias("_keep")
    )

    rebuilt = kept_flag.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum((~F.col("_keep")).cast("int")).alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_keep"),
                            F.struct(F.col("line_no"), F.col("line")),
                        )
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text_clean"),
    )
    return rebuilt.select(
        id_col,
        F.col("n_lines").cast("int").alias("n_lines"),
        F.col("n_removed").cast("int").alias("n_removed"),
        "text_clean",
    )


def duplicated_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    min_chars: int = 6,
    top: int | None = None,
) -> DataFrame:
    """Diagnostic twin: the corpus's duplicated lines themselves —
    (line, n_copies, n_docs), heaviest first. ``top`` bounds the result
    with a TakeOrdered-style limit (no full sort materialization).
    One aggregation; the shuffle carries (md5, partial counts) and one
    exemplar line per key via F.first."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    lines = df.select(
        F.col(id_col),
        F.explode(F.split(txt, "\n", -1)).alias("line"),
    ).withColumn("_norm", normalize(F.col("line")))
    agg = (
        lines.where(F.length("_norm") >= min_chars)
        .groupBy(F.md5(F.col("_norm")).alias("_h"))
        .agg(
            F.first("_norm").alias("line"),
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct(id_col).alias("n_docs"),
        )
        .where(F.col("n_copies") >= min_count)
        .select("line", "n_copies", "n_docs")
    )
    out = agg.orderBy(F.desc("n_copies"), "line")
    return out.limit(top) if top is not None else out
