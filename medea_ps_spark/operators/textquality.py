"""Text-analysis operators for training-data pipelines: language ID
(stopword n-gram heuristic), quality scoring, token counting, document
fingerprinting. Pure SQL expressions over functions/text.py —
codegen'd, no UDFs — except :func:`compression_features`, where the
signal (a DEFLATE pass) is not expressible in Spark SQL and rides an
Arrow-batched pandas UDF (zlib is C inside the worker; the batch
transfer is the only Python-boundary cost)."""

from __future__ import annotations

# module-top imports: pandas_udf type hints resolve from module
# globals (round-1 hard rule)
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..functions.text import (
    fingerprint,
    punct_ratio,
    regex_token_count,
    stopword_ratio,
    token_count,
    whitespace_tokens,
)

# small function-word lists per language for the heuristic language ID
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "that", "with", "for"],
    "es": ["el", "la", "los", "las", "que", "de", "y", "en", "por", "una"],
    "fr": ["le", "la", "les", "des", "une", "est", "que", "dans", "pour", "avec"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "für"],
    "zh": ["的", "是", "在", "了", "我", "有", "和", "不", "人", "这"],
}


def _marker_hits(toks, markers):
    return F.size(F.filter(toks, lambda t: t.isin(markers)))


def language_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``lang_guess``: argmax over per-language function-word hit
    counts ('und' when nothing matches). For zh (no whitespace
    segmentation) characters are matched with contains()."""
    toks = whitespace_tokens(F.lower(F.col(text_col)))
    scores = []
    for lang, markers in LANG_MARKERS.items():
        if lang == "zh":
            s = sum(
                (F.when(F.col(text_col).contains(m), 1).otherwise(0))
                for m in markers
            )
        else:
            s = _marker_hits(toks, markers)
        scores.append(F.struct(s.cast("int").alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    guess = F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    return df.withColumn("lang_guess", guess)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword features + a composite
    quality_ok flag (heuristics in the C4/Gopher-rules spirit)."""
    out = (
        df.withColumn("n_chars_q", F.length(F.col(text_col)))
        .withColumn("n_tokens", token_count(F.col(text_col)))
        .withColumn("n_tokens_bpe", regex_token_count(F.col(text_col)))
        .withColumn("punct_ratio", punct_ratio(F.col(text_col)))
        .withColumn("stopword_ratio", stopword_ratio(F.col(text_col)))
        .withColumn(
            "mean_token_len",
            F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
                F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
                .cast("double")
                / F.col("n_tokens")
            ),
        )
    )
    ok = (
        (F.col("n_tokens") >= 5)
        & (F.col("punct_ratio") <= 0.3)
        & (F.col("mean_token_len").between(2.0, 12.0))
    )
    return out.withColumn("quality_ok", ok)


def fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, fingerprint) — md5 of normalized text (exact-dedup key)."""
    return df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint"))


def rolling_hash_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", window: int = 8
) -> DataFrame:
    """Winnowing-style content fingerprint: min xxhash64 over a rolling
    window of word shingles — robust to small local edits, JVM-side."""
    from ..functions.text import word_shingles

    sh = word_shingles(F.col(text_col), k=window)
    minhash = F.array_min(F.transform(sh, lambda s: F.xxhash64(s)))
    return df.select(F.col(id_col), minhash.alias("content_fingerprint"))


def _zlib_ratio_series(data: "pd.Series", level: int) -> "pd.Series":
    import zlib

    def one(b):
        if b is None or len(b) == 0:
            return None
        return len(zlib.compress(b, level)) / len(b)

    return data.map(one)


def compression_features(
    df: DataFrame, text_col: str = "text", level: int = 6
) -> DataFrame:
    """Adds ``zlib_ratio`` = compressed-bytes / raw-bytes of the UTF-8
    text (zlib level ``level``). The standard entropy-proxy quality
    signal: very LOW ratios flag templated / boilerplate / repeated
    text that n-gram duplicate fractions miss (long-period repetition),
    ratios near or above 1.0 flag random or binary junk; natural prose
    sits in a stable mid band. NULL/empty text → NULL.

    Execution: one Arrow-batched pandas UDF over the encoded bytes —
    DEFLATE has no Spark SQL expression, so this is the sanctioned
    slow-path pattern (vectorized batch transfer, zlib's C loop per
    row, no shuffle; the plan stays a single map stage). The ratio is
    deterministic for a fixed zlib version/level, which the tests pin
    against direct ``zlib.compress`` calls."""
    if not 0 <= level <= 9:
        raise ValueError(f"level must be in [0,9], got {level}")

    @F.pandas_udf("double")
    def ratio(data: pd.Series) -> pd.Series:
        return _zlib_ratio_series(data, level)

    return df.withColumn(
        "zlib_ratio", ratio(F.encode(F.col(text_col), "UTF-8"))
    )


def token_compression_features(
    df: DataFrame, tokens_col: str = "tokens", level: int = 6
) -> DataFrame:
    """Token-native twin of :func:`compression_features` for the
    north-rule ``tokens:array<int>`` payload: ``tok_zlib_ratio`` =
    compressed / raw bytes of the little-endian int32 token stream.
    Repeated spans, cycled boilerplate, and low-entropy token loops
    compress far below natural token streams — a repetition signal
    that needs no detokenization. NULL/empty arrays → NULL."""
    if not 0 <= level <= 9:
        raise ValueError(f"level must be in [0,9], got {level}")

    @F.pandas_udf("double")
    def ratio(toks: pd.Series) -> pd.Series:
        import numpy as np
        import zlib

        def one(a):
            if a is None or len(a) == 0:
                return None
            b = np.asarray(a, dtype="<i4").tobytes()
            return len(zlib.compress(b, level)) / len(b)

        return toks.map(one)

    return df.withColumn("tok_zlib_ratio", ratio(F.col(tokens_col)))


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals — the standard filters for
    template/boilerplate-generated text in a training corpus:

    * ``dup_word_frac``  — 1 − |distinct words| / |words|
    * ``dup_bigram_frac`` — 1 − |distinct word bigrams| / |bigrams|

    High values mean the document is dominated by repeated phrases
    (keyword stuffing, scraped menus, log spam). Pure array expressions
    over the normalized whitespace tokenization (functions/text.py) —
    codegen'd, no UDF, no shuffle."""
    from ..functions.text import normalize, word_shingles

    toks = whitespace_tokens(normalize(F.col(text_col)))
    n = F.size(toks)
    bi = word_shingles(F.col(text_col), k=2)
    nb = F.size(bi)
    dup_frac = lambda arr, cnt: F.when(cnt == 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(arr)).cast("double") / cnt
    )
    return (
        df.withColumn("n_words", n)
        .withColumn("dup_word_frac", dup_frac(toks, n))
        .withColumn("dup_bigram_frac", dup_frac(bi, nb))
    )
