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

from typing import Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, functions as F

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


def _transitions(terms: Column) -> Column:
    """``array<struct<w1,w2>>`` of ADJACENT term pairs, one per
    transition (order preserved, duplicates kept); fewer than 2 terms
    (or NULL) yields an empty array.

    Deliberately ``arrays_zip(slice, slice)`` and NOT a
    transform-over-index-sequence lambda: ``terms`` is usually a
    computed expression (the token-native path is a whole-array cast),
    and a ``element_at(terms, i)`` inside a lambda re-evaluates that
    full-array expression PER INDEX — O(len²) per row, interpreted
    (HOFs don't codegen), measured pinning executors in
    Cast.nullSafeEval on 512-token rows. The zip-of-slices form
    evaluates ``terms`` twice per row total and stays inside
    whole-stage codegen."""
    n = F.coalesce(F.size(terms), F.lit(0))
    return F.when(
        n < 2, F.array().cast("array<struct<w1:string,w2:string>>")
    ).otherwise(
        F.arrays_zip(
            F.slice(terms, 1, n - 1).alias("w1"),
            F.slice(terms, 2, n - 1).alias("w2"),
        )
    )


def bigram_counts(
    df: DataFrame,
    text_col: str = "text",
    tokens_col: Optional[str] = None,
) -> DataFrame:
    """(w1, w2, n) corpus bigram-frequency table — the order-2 twin of
    :func:`unigram_counts`. One explode + partial/final hash agg; the
    shuffle carries distinct bigrams per partition, not transitions."""
    return (
        df.select(
            F.explode(_transitions(_terms(text_col, tokens_col))).alias("_t")
        )
        .select(F.col("_t.w1").alias("w1"), F.col("_t.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    reference_unigram: Optional[DataFrame] = None,
    reference_bigram: Optional[DataFrame] = None,
    alpha: float = 1.0,
    lam: float = 0.75,
    tokens_col: Optional[str] = None,
) -> DataFrame:
    """Interpolated-bigram LM score per document — the sharper
    perplexity-proxy filter (CCNet scores with a KenLM n-gram model; an
    interpolated bigram is the SQL-expressible analogue that stays
    exactly reproducible cross-engine, unlike a binary KenLM blob).

    Model: over each document's transitions ``(w1, w2)``,

        p(w2 | w1) = lam * p_bi(w2 | w1) + (1 - lam) * p_uni(w2)

    with Laplace-``alpha`` smoothing and one shared OOV bucket in each
    component: ``p_bi = (c(w1,w2)+a) / (c(w1,·)+a*(V+1))`` where
    ``c(w1,·)`` is w1's CONTEXT count (sum of its bigram counts, so
    p_bi(·|w1) is a proper distribution) and ``p_uni`` is exactly
    :func:`unigram_lm_scores`'s term. Returns one row per document with
    >= 2 terms: ``(id_col, n_transitions, bits_per_token, ppl)`` where
    bits_per_token is the mean -log2 p over transitions and
    ``ppl = 2^bits``. Documents with < 2 terms have no transitions and
    are absent — union the unigram scorer for them if needed.

    ``reference_unigram`` / ``reference_bigram`` are (word, n) /
    (w1, w2, n) tables from the two count builders; pass BOTH or
    NEITHER (None/None self-scores, the corpus is its own reference).

    Scale shape (10^12 tokens): identical to the unigram path —
    transitions pre-aggregate to distinct (doc, w1, w2) local counts
    BEFORE any join (the join input is strictly smaller than the
    transition stream), all three model relations (bigram, per-context
    totals derived from it, unigram) are vocab-sized and broadcast
    whenever they fit, smoothing constants ride one 1-row broadcast
    cross-join, and the final groupBy(doc) is the count-weighted mean.
    """
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if (reference_unigram is None) != (reference_bigram is None):
        raise ValueError(
            "pass both reference_unigram and reference_bigram or neither "
            "— mixing a frozen profile with a self-built one would score "
            "against inconsistent vocabularies"
        )
    uni = (
        reference_unigram
        if reference_unigram is not None
        else unigram_counts(df, text_col, tokens_col=tokens_col)
    )
    bi = (
        reference_bigram
        if reference_bigram is not None
        else bigram_counts(df, text_col, tokens_col=tokens_col)
    )
    # context totals derived from the bigram table itself so that
    # p_bi(. | w1) sums to 1 over the V+1 smoothing buckets
    ctx = bi.groupBy("w1").agg(F.sum("n").alias("_cc"))
    totals = uni.agg(
        F.sum("n").cast("double").alias("_N"),
        F.count(F.lit(1)).cast("double").alias("_V"),
    )
    pairs = (
        df.select(
            F.col(id_col),
            F.explode(_transitions(_terms(text_col, tokens_col))).alias("_t"),
        )
        .select(
            id_col,
            F.col("_t.w1").alias("w1"),
            F.col("_t.w2").alias("w2"),
        )
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("_k"))
    )
    joined = (
        pairs.join(
            bi.select("w1", "w2", F.col("n").alias("_cb")),
            on=["w1", "w2"],
            how="left",
        )
        .join(ctx, on="w1", how="left")
        .join(
            uni.select(F.col("word").alias("w2"), F.col("n").alias("_cu")),
            on="w2",
            how="left",
        )
        .crossJoin(F.broadcast(totals))
    )
    a = F.lit(float(alpha))
    vbuckets = a * (F.col("_V") + 1.0)
    p_bi = (F.coalesce(F.col("_cb"), F.lit(0)).cast("double") + a) / (
        F.coalesce(F.col("_cc"), F.lit(0)).cast("double") + vbuckets
    )
    p_uni = (F.coalesce(F.col("_cu"), F.lit(0)).cast("double") + a) / (
        F.col("_N") + vbuckets
    )
    p = F.lit(float(lam)) * p_bi + F.lit(1.0 - float(lam)) * p_uni
    scored = joined.groupBy(id_col).agg(
        F.sum("_k").alias("n_transitions"),
        (-(F.sum(F.col("_k") * F.log2(p)) / F.sum("_k"))).alias(
            "bits_per_token"
        ),
    )
    return scored.select(
        id_col,
        "n_transitions",
        "bits_per_token",
        F.pow(F.lit(2.0), F.col("bits_per_token")).alias("ppl"),
    )


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    cuts: Sequence[float] = (1.0 / 3.0, 2.0 / 3.0),
    labels: Sequence[str] = ("head", "middle", "tail"),
    group_cols: Sequence[str] = (),
    accuracy: int = 10000,
    out_col: str = "bucket",
) -> Tuple[DataFrame, DataFrame]:
    """CCNet-style quantile bucketing (Wenzek et al. 2020 split each
    language's crawl into head/middle/tail by perplexity terciles):
    label every row by which quantile band of ``value_col`` it falls
    in, optionally per group (CCNet groups by language; the north-rule
    table groups by ``source``).

    Returns ``(labeled_df, thresholds_df)``: the input plus a string
    ``out_col`` (row belongs to band i when
    ``thr[i-1] < value <= thr[i]``, open-ended at both extremes; NULL
    value → NULL bucket), and the per-group threshold relation
    ``(group_cols..., q_1..q_len(cuts))`` so callers can persist the
    cut points (scoring NEW data against FROZEN thresholds is the CCNet
    deployment mode — join that stored relation instead of recomputing).

    Scale shape: thresholds come from ONE ``percentile_approx``
    aggregate (a mergeable sketch — partial+final agg, no sort, no
    collect; per-group state is bounded by group cardinality), joined
    back as a broadcast (the threshold relation has one row per group),
    and the labeling is a codegen'd CASE chain. Nothing is driver-side.
    """
    if len(labels) != len(cuts) + 1:
        raise ValueError(
            f"need len(cuts)+1 labels, got {len(cuts)} cuts "
            f"and {len(labels)} labels"
        )
    fcuts = [float(c) for c in cuts]
    if any(not 0.0 < c < 1.0 for c in fcuts) or sorted(fcuts) != fcuts or len(
        set(fcuts)
    ) != len(fcuts):
        raise ValueError(
            f"cuts must be strictly increasing within (0, 1), got {cuts}"
        )
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    clash = [f"q_{i + 1}" for i in range(len(fcuts)) if f"q_{i + 1}" in df.columns]
    if clash:
        raise ValueError(
            f"input columns {clash} collide with the threshold names"
        )
    gcols = list(group_cols)
    thr_cols = [
        F.percentile_approx(value_col, F.lit(c), F.lit(int(accuracy))).alias(
            f"q_{i + 1}"
        )
        for i, c in enumerate(fcuts)
    ]
    thresholds = (
        df.groupBy(*gcols).agg(*thr_cols) if gcols else df.agg(*thr_cols)
    )
    joined = (
        df.join(F.broadcast(thresholds), on=gcols, how="left")
        if gcols
        else df.crossJoin(F.broadcast(thresholds))
    )
    v = F.col(value_col)
    label: Column = F.lit(labels[-1])
    for i in range(len(fcuts) - 1, -1, -1):
        label = F.when(v <= F.col(f"q_{i + 1}"), F.lit(labels[i])).otherwise(
            label
        )
    labeled = joined.withColumn(
        out_col, F.when(v.isNotNull(), label)
    ).drop(*[f"q_{i + 1}" for i in range(len(fcuts))])
    return labeled, thresholds
