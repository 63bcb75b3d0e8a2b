"""Column-expression helpers for text processing — all JVM-side
(pyspark.sql.functions), no Python UDFs: these run inside whole-stage
codegen in the 100 TB hot path."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# a BPE-ish tokenizer regex: words, numbers, punctuation runs
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"

STOPWORDS_EN = [
    "the", "of", "and", "to", "in", "is", "that", "it", "was", "for",
    "on", "are", "as", "with", "his", "they", "at", "be", "this", "have",
]


def normalize(col: Column) -> Column:
    """Lowercase + collapse whitespace + trim — canonical text form for
    fingerprinting/dedup."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def whitespace_tokens(col: Column) -> Column:
    """Whitespace tokenization; empty string → empty array (split('')
    would give [''])."""
    return F.when(
        F.length(F.trim(col)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(col), r"\s+"))


def token_count(col: Column) -> Column:
    return F.size(whitespace_tokens(col))


def regex_token_count(col: Column) -> Column:
    """BPE-ish token count via regexp extraction (JVM-side)."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_REGEX), F.lit(0)))


def word_shingles(col: Column, k: int = 3) -> Column:
    """k-word shingles of the normalized text: array<string> of
    space-joined k-grams, built with transform over index positions —
    pure SQL expressions, no UDF."""
    toks = whitespace_tokens(normalize(col))
    n = F.size(toks)
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(k)]
            ),
        )
    )


def punct_ratio(col: Column) -> Column:
    clean = F.regexp_replace(col, r"[A-Za-z0-9\s]", "")
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        F.length(clean).cast("double") / F.length(col)
    )


def stopword_ratio(col: Column) -> Column:
    toks = whitespace_tokens(F.lower(col))
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS_EN)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(toks)
    )


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalize(col))
