"""Unigram-LM quality scoring — the perplexity-proxy filter used in
public LLM-data pipelines (CCNet/Wenzek et al. 2020 filter corpora by
language-model perplexity; Brown et al. GPT-3 App. A uses a quality
classifier the same way). A full KenLM is out of scope for a SQL
engine, but the unigram bits-per-token score captures the same
"gibberish / boilerplate scores badly" signal and is exactly
reproducible cross-engine — so it is driver-oracle-able, unlike any
neural scorer.

Model: Laplace-smoothed unigram over a reference corpus —
``p(w) = (c(w) + a) / (N + a * (V + 1))`` with one shared OOV bucket
(c = 0). A document's score is its mean negative log2 probability
(bits/token); ``ppl = 2^bits`` is the standard exp form.

Scale design (10^12 tokens):
- the frequency table comes from ONE explode + groupBy (map-side
  combine: shuffle carries distinct words per partition, not tokens);
- scoring pre-aggregates to distinct (doc, word) pairs with a local
  count BEFORE the join (partial+final hash agg), then joins those
  pairs — not raw token occurrences — to the freq table on the word;
  the join input is strictly smaller than the token stream (docs
  repeat words heavily), and Catalyst/AQE broadcasts the freq side
  whenever the vocab fits. One groupBy(doc) count-weighted mean
  after. Nothing is driver-side; smoothing constants (N, V) ride as
  plan literals via a 1-row cross-join, the same pattern the drift
  operators use.
- self-scoring (reference == corpus) has no OOV by construction;
  scoring AGAINST a frozen reference profile (the CCNet setup: score
  new crawl against trusted-corpus LM) hits the OOV bucket for unseen
  words — both paths share one implementation.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

_WORDS = "_lm_words"


def _words(text_col: str):
    """Whitespace tokens of whitespace-normalized text — identical to
    the engine's token_count tokenization (functions/text.py) and to
    the DuckDB oracle's string_split(regexp_replace(...))."""
    norm = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return F.when(F.length(norm) == 0, F.array().cast("array<string>")) \
        .otherwise(F.split(norm, " "))


def _terms(text_col: str, tokens_col: Optional[str]):
    """The term array to score: whitespace words of ``text_col``, or —
    token-native path — the pre-tokenized id array ``tokens_col`` cast
    to strings (ids join and count exactly like words; NULL arrays act
    like empty text)."""
    if tokens_col is not None:
        return F.col(tokens_col).cast("array<string>")
    return _words(text_col)


def unigram_counts(
    df: DataFrame,
    text_col: str = "text",
    tokens_col: Optional[str] = None,
) -> DataFrame:
    """(word, n) corpus frequency table — explode + partial/final agg;
    the shuffle carries per-partition distinct words only. Pass
    ``tokens_col`` to build the table over pre-tokenized id arrays."""
    return (
        df.select(F.explode(_terms(text_col, tokens_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def unigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    reference: Optional[DataFrame] = None,
    alpha: float = 1.0,
    tokens_col: Optional[str] = None,
) -> DataFrame:
    """(id, n_tokens, bits_per_token, ppl) per non-empty document.

    ``reference`` is a (word, n) table from :func:`unigram_counts`;
    None means self-scoring (the corpus is its own reference — no OOV).
    ``alpha`` is the Laplace constant. bits_per_token is the mean
    negative log2 Laplace probability; ppl = 2^bits. Pass
    ``tokens_col`` to score pre-tokenized id arrays instead of text
    (the token-native path for the north-rule sequence table; a
    reference built with the same ``tokens_col`` composes)."""
    freq = (
        reference
        if reference is not None
        else unigram_counts(df, text_col, tokens_col=tokens_col)
    )
    totals = freq.agg(
        F.sum("n").cast("double").alias("_N"),
        F.count(F.lit(1)).cast("double").alias("_V"),
    )
    # PRE-AGGREGATE before the scoring join (VERDICT r4 #4): a document
    # repeats words, so joining raw token occurrences to the freq table
    # shuffles one row per occurrence (10^12 at corpus scale). Reducing
    # to distinct (doc, word) pairs with a local count first is a
    # partial+final hash agg whose join input is strictly smaller —
    # natural-language docs repeat heavily — and the per-doc score
    # becomes the count-weighted mean, the same rational number.
    toks = (
        df.select(
            F.col(id_col),
            F.explode(_terms(text_col, tokens_col)).alias("word"),
        )
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("_k"))
    )
    joined = toks.join(freq, on="word", how="left").select(
        id_col,
        F.col("_k"),
        F.coalesce(F.col("n"), F.lit(0)).cast("double").alias("_c"),
    )
    # smoothing denominator N + a*(V+1): V+1 buckets (vocab + OOV)
    logp = F.log2(
        (F.col("_c") + F.lit(float(alpha)))
        / (F.col("_N") + F.lit(float(alpha)) * (F.col("_V") + 1.0))
    )
    scored = (
        joined.crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum("_k").alias("n_tokens"),
            (-(F.sum(F.col("_k") * logp) / F.sum("_k"))).alias(
                "bits_per_token"
            ),
        )
    )
    return scored.select(
        id_col,
        "n_tokens",
        "bits_per_token",
        F.pow(F.lit(2.0), F.col("bits_per_token")).alias("ppl"),
    )
