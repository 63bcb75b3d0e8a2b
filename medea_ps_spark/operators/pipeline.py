"""End-to-end training-corpus cleaning pipeline — the composition a
100 TB data-curation job runs: exact dedup → near-dup clustering →
quality filter → language filter, emitting the clean corpus plus an
audit report of what each stage removed (so the pipeline is a
first-class, inspectable operator rather than a notebook).

Single-action audit: every stage is expressed as a boolean KEEP flag on
one flagged DataFrame (row-local predicates AND a left join against the
small near-dup component map), so ALL per-stage survivor counts come
from ONE aggregation pass instead of one full-lineage count per stage —
at 100 TB that's one corpus scan for the audit, not five. The only
internal actions left are the connected-components iterations, which
run over the (tiny) near-dup edge set, not the corpus.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import fingerprint
from .dedup import minhash_near_duplicates
from .dedup_cluster import connected_components
from .textquality import language_scores, quality_features

_INTERNAL_COLS = (
    "n_chars_q", "n_tokens", "n_tokens_bpe", "punct_ratio",
    "stopword_ratio", "mean_token_len", "quality_ok", "lang_guess",
    "n_contaminated_shingles", "contaminated",
    "pii_email", "pii_phone", "pii_ipv4", "pii_ssn",
    "n_words", "dup_word_frac", "dup_bigram_frac",
)
_FLAG_COLS = (
    "_keep_exact", "_keep_near", "_keep_decontam", "_keep_quality",
    "_keep_rep", "_keep_lang",
)


@dataclass
class CleaningReport:
    input_rows: int = 0
    after_exact_dedup: int = 0
    after_near_dedup: int = 0
    after_decontamination: int = 0
    after_quality: int = 0
    after_repetition: int = 0
    after_language: int = 0
    pii_redacted_rows: int = 0
    stages: List[Dict] = field(default_factory=list)


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    allowed_langs: Optional[List[str]] = None,
    near_dup: bool = True,
    minhash_threshold: float = 0.7,
    lang_col: Optional[str] = None,
    eval_df: Optional[DataFrame] = None,
    contamination_k: int = 8,
    scrub_pii: bool = False,
    max_dup_word_frac: Optional[float] = None,
    max_dup_bigram_frac: Optional[float] = None,
) -> tuple:
    """Returns (clean_df, CleaningReport). Stage survivorship is encoded
    as cumulative flag columns; the report is ONE aggregation job.

    Optional stages: ``eval_df`` drops training docs sharing any
    ``contamination_k``-gram with the benchmark set (decontamination);
    ``max_dup_word_frac`` / ``max_dup_bigram_frac`` drop repetition-
    dominated docs (Gopher-style boilerplate filters, pure expressions);
    ``scrub_pii`` redacts email/phone/IP/SSN in the surviving text and
    reports how many rows were touched."""
    w = Window.partitionBy(fingerprint(F.col(text_col))).orderBy(F.col(id_col))
    flagged = df.withColumn("_keep_exact", F.row_number().over(w) == 1)

    if near_dup:
        survivors = flagged.where(F.col("_keep_exact")).drop("_keep_exact")
        pairs = minhash_near_duplicates(
            survivors, text_col, id_col, threshold=minhash_threshold
        )
        comp = connected_components(pairs).withColumnRenamed(
            "node", id_col
        ).withColumnRenamed("component", "_canon")
        # the component map is the near-dup population — usually tiny
        # relative to the corpus, but unbounded in the worst case, so
        # leave the join strategy to AQE (converts to broadcast when the
        # runtime size allows) instead of forcing a driver broadcast
        flagged = flagged.join(comp, on=id_col, how="left")
        flagged = flagged.withColumn(
            "_keep_near",
            F.col("_keep_exact")
            & (F.col("_canon").isNull() | (F.col("_canon") == F.col(id_col))),
        ).drop("_canon")
    else:
        flagged = flagged.withColumn("_keep_near", F.col("_keep_exact"))

    if eval_df is not None:
        from .dedup import contamination_check

        flagged = contamination_check(
            flagged, eval_df, text_col, id_col,
            eval_text_col=text_col, shingle_k=contamination_k,
        )
        flagged = flagged.withColumn(
            "_keep_decontam", F.col("_keep_near") & ~F.col("contaminated")
        )
    else:
        flagged = flagged.withColumn("_keep_decontam", F.col("_keep_near"))

    flagged = quality_features(flagged, text_col).withColumn(
        "_keep_quality", F.col("_keep_decontam") & F.col("quality_ok")
    )

    if max_dup_word_frac is not None or max_dup_bigram_frac is not None:
        from .textquality import repetition_features

        flagged = repetition_features(flagged, text_col)
        rep_ok = F.lit(True)
        if max_dup_word_frac is not None:
            rep_ok = rep_ok & (F.col("dup_word_frac") <= max_dup_word_frac)
        if max_dup_bigram_frac is not None:
            rep_ok = rep_ok & (F.col("dup_bigram_frac") <= max_dup_bigram_frac)
        flagged = flagged.withColumn(
            "_keep_rep", F.col("_keep_quality") & rep_ok
        )
    else:
        flagged = flagged.withColumn("_keep_rep", F.col("_keep_quality"))

    if allowed_langs:
        col = lang_col
        if col is None:
            flagged = language_scores(flagged, text_col)
            col = "lang_guess"
        flagged = flagged.withColumn(
            "_keep_lang", F.col("_keep_rep") & F.col(col).isin(allowed_langs)
        )
    else:
        flagged = flagged.withColumn("_keep_lang", F.col("_keep_rep"))

    if scrub_pii:
        from ..functions.redact import redact_pii

        flagged = flagged.withColumn("_redacted", redact_pii(F.col(text_col)))
        flagged = flagged.withColumn(
            "_was_redacted", F.col("_keep_lang") & (F.col("_redacted") != F.col(text_col))
        )

    # -- the audit: ONE aggregation pass over the flagged corpus
    aggs = [F.count(F.lit(1)).alias("n_input")] + [
        F.sum(F.col(c).cast("bigint")).alias(c) for c in _FLAG_COLS
    ]
    if scrub_pii:
        aggs.append(
            F.sum(F.col("_was_redacted").cast("bigint")).alias("_n_redacted")
        )
    counts = flagged.agg(*aggs).collect()[0]

    def _n(key: str) -> int:
        # sum() over an empty input is NULL, not 0 — an empty corpus
        # must yield a zeroed report, not a TypeError
        v = counts[key]
        return 0 if v is None else int(v)

    rep = CleaningReport(
        input_rows=_n("n_input"),
        after_exact_dedup=_n("_keep_exact"),
        after_near_dedup=_n("_keep_near"),
        after_decontamination=_n("_keep_decontam"),
        after_quality=_n("_keep_quality"),
        after_repetition=_n("_keep_rep"),
        after_language=_n("_keep_lang"),
        pii_redacted_rows=_n("_n_redacted") if scrub_pii else 0,
    )
    rep.stages = [
        {"stage": "exact_dedup", "removed": rep.input_rows - rep.after_exact_dedup},
        {"stage": "near_dedup", "removed": rep.after_exact_dedup - rep.after_near_dedup},
        {"stage": "decontamination",
         "removed": rep.after_near_dedup - rep.after_decontamination},
        {"stage": "quality",
         "removed": rep.after_decontamination - rep.after_quality},
        {"stage": "repetition",
         "removed": rep.after_quality - rep.after_repetition},
        {"stage": "language",
         "removed": rep.after_repetition - rep.after_language},
    ]
    if scrub_pii:
        rep.stages.append(
            {"stage": "pii_scrub", "redacted_rows": rep.pii_redacted_rows}
        )

    out = flagged.where(F.col("_keep_lang"))
    if scrub_pii:
        out = out.withColumn(text_col, F.col("_redacted")).drop(
            "_redacted", "_was_redacted"
        )
    drop = [c for c in _INTERNAL_COLS + _FLAG_COLS if c in out.columns]
    return out.drop(*drop), rep
