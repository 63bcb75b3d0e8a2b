"""End-to-end training-corpus cleaning pipeline — the composition a
100 TB data-curation job runs: exact dedup → near-dup clustering →
quality filter → language filter, emitting the clean corpus plus an
audit report of what each stage removed (so the pipeline is a
first-class, inspectable operator rather than a notebook).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, functions as F

from .dedup import dedup_exact, minhash_near_duplicates
from .dedup_cluster import dedup_by_clusters
from .textquality import language_scores, quality_features


@dataclass
class CleaningReport:
    input_rows: int = 0
    after_exact_dedup: int = 0
    after_near_dedup: int = 0
    after_quality: int = 0
    after_language: int = 0
    stages: List[Dict] = field(default_factory=list)


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    allowed_langs: Optional[List[str]] = None,
    near_dup: bool = True,
    minhash_threshold: float = 0.7,
    lang_col: Optional[str] = None,
) -> tuple:
    """Returns (clean_df, CleaningReport). Each stage is lazily
    composed; counts force one action per stage boundary (acceptable:
    the audit itself is a requirement)."""
    rep = CleaningReport(input_rows=df.count())

    out = dedup_exact(df, text_col, id_col)
    rep.after_exact_dedup = out.count()
    rep.stages.append(
        {"stage": "exact_dedup", "removed": rep.input_rows - rep.after_exact_dedup}
    )

    if near_dup:
        pairs = minhash_near_duplicates(
            out, text_col, id_col, threshold=minhash_threshold
        )
        out = dedup_by_clusters(out, pairs.select("id_a", "id_b"), id_col)
        rep.after_near_dedup = out.count()
        rep.stages.append(
            {
                "stage": "near_dedup",
                "removed": rep.after_exact_dedup - rep.after_near_dedup,
            }
        )
    else:
        rep.after_near_dedup = rep.after_exact_dedup

    out = quality_features(out, text_col).where(F.col("quality_ok"))
    rep.after_quality = out.count()
    rep.stages.append(
        {"stage": "quality", "removed": rep.after_near_dedup - rep.after_quality}
    )

    if allowed_langs:
        col = lang_col
        if col is None:
            out = language_scores(out, text_col)
            col = "lang_guess"
        out = out.where(F.col(col).isin(allowed_langs))
    rep.after_language = out.count()
    rep.stages.append(
        {"stage": "language", "removed": rep.after_quality - rep.after_language}
    )
    drop = [
        c for c in (
            "n_chars_q", "n_tokens", "n_tokens_bpe", "punct_ratio",
            "stopword_ratio", "mean_token_len", "quality_ok", "lang_guess",
        )
        if c in out.columns
    ]
    return out.drop(*drop), rep
