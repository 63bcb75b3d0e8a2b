"""Hashed-feature linear quality classifier — a fastText/DCLM-style
model-based quality filter, the standard "train a cheap linear
classifier, score every document, keep the top band" step of an LLM
data pipeline (CCNet / GPT-3 Appendix A / DCLM all gate on one).

The MODEL here is a hashed linear scorer: each feature (unigram and
word-bigram of the normalized text) hashes to a weight, and the
document score is the mean feature weight. Weights come from the
feature's md5 — in production you'd broadcast a trained weight table
keyed by the same bucket ids; the hashing-trick plumbing (feature
extraction → bucket → weight lookup → mean) is identical and is what
this operator exercises at scale.

Scale design
------------
* Everything is a column expression over the scan — tokenize, shingle,
  hash, weigh, and sum run inside whole-stage codegen; NO shuffle, NO
  UDF, NO vocabulary join. At 100 TB this is a single map-only pass.
* Weights and scores stay in exact integer milli-units (md5 60-bit lane
  → conv(hex,16,10) % scale), so partial sums are order-independent and
  bit-identical across engines — the float division happens once at the
  end, if the caller asks for it.
* A trained model drops in by replacing ``_feature_weight`` with a
  broadcast map lookup (element_at over a literal map, still codegen).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import normalize, whitespace_tokens, word_shingles

# 15 hex chars = 60 bits: parses losslessly into a signed BIGINT in both
# Spark (conv(x, 16, 10)) and DuckDB (('0x' || x)::BIGINT).
_HEX_LANE = 15

# weights live in [-scale/2, scale/2) milli-units
WEIGHT_SCALE = 1000


def _feature_weight(feat: Column, scale: int = WEIGHT_SCALE) -> Column:
    """Deterministic integer weight for one feature string: the md5
    60-bit lane folded into [-scale/2, scale/2)."""
    lane = F.conv(F.substring(F.md5(feat), 1, _HEX_LANE), 16, 10).cast("long")
    return (lane % F.lit(scale)) - F.lit(scale // 2)


def hashed_features(text: Column) -> Column:
    """Unigrams + word-bigrams of the normalized text — the classic
    fastText feature set, as one array<string> column. NULL text maps
    to an empty feature set (not NULL — size(NULL) is -1 in Spark)."""
    feats = F.concat(whitespace_tokens(normalize(text)), word_shingles(text, 2))
    return F.coalesce(feats, F.array().cast("array<string>"))


def hashed_token_features(tokens: Column) -> Column:
    """Token-native feature set: id unigrams + id bigrams of a
    pre-tokenized ``array<int>`` column (same hashing-trick plumbing,
    no text). NULL arrays map to an empty feature set."""
    from .tokenops import token_shingles

    unis = F.transform(tokens, lambda t: t.cast("string"))
    feats = F.concat(unis, token_shingles(tokens, 2))
    return F.coalesce(feats, F.array().cast("array<string>"))


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_milli: int = 0,
    tokens_col: str | None = None,
) -> DataFrame:
    """Score every document with the hashed linear model.

    Output columns (all exact integers except nothing — no floats):
      id_col, n_features, score_milli (sum of integer feature weights),
      quality_label ('keep' when the MEAN weight ≥ threshold_milli /
      WEIGHT_SCALE, else 'drop'; empty docs are 'drop').

    The label compare is done in cross-multiplied integer space
    (score_milli * WEIGHT_SCALE >= threshold_milli * n_features) so the
    verdict is exact — no float rounding anywhere.

    Pass ``tokens_col`` to score pre-tokenized id arrays instead of
    text (id unigram+bigram features; identical downstream math).
    """
    feats = (
        hashed_token_features(F.col(tokens_col))
        if tokens_col is not None
        else hashed_features(F.col(text_col))
    )
    weights = F.transform(feats, lambda f: _feature_weight(f))
    score = F.aggregate(
        weights, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    n_feat = F.size(feats)
    keep = (score * F.lit(WEIGHT_SCALE)) >= (F.lit(threshold_milli) * n_feat)
    return df.select(
        F.col(id_col),
        n_feat.alias("n_features"),
        score.alias("score_milli"),
        F.when(n_feat == 0, F.lit("drop"))
        .when(keep, F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("quality_label"),
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    threshold_milli: int = 0,
) -> DataFrame:
    """Rows of ``df`` whose quality_label is 'keep' — the filter stage a
    curation pipeline composes after scoring. The keep predicate is
    evaluated inline on the scan (no join-back, no shuffle): one
    map-only pass that preserves df's schema."""
    feats = hashed_features(F.col(text_col))
    weights = F.transform(feats, lambda f: _feature_weight(f))
    score = F.aggregate(
        weights, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    n_feat = F.size(feats)
    keep = (n_feat > 0) & (
        (score * F.lit(WEIGHT_SCALE)) >= (F.lit(threshold_milli) * n_feat)
    )
    return df.where(keep)


def quality_score_trained(
    df: DataFrame,
    weights_milli: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    default_milli: int = 0,
    threshold_milli: int = 0,
) -> DataFrame:
    """The trained-model variant: feature weights come from a small
    learned table (feature string → integer milli-weight) instead of
    the hash fold. The table ships to every task as a literal MAP
    expression (Spark broadcasts task binaries once per executor), so
    scoring is STILL a map-only pass — no join, no shuffle; unseen
    features take ``default_milli`` (the hashing-trick fallback would
    be `_feature_weight` instead — swap the coalesce arm to taste).

    Vocabulary budget: a literal map is the right call up to ~10^5
    entries (fastText-style quality models are typically 10^3-10^4
    n-grams); beyond that, pivot to the broadcast-join form.
    """
    if not weights_milli:
        raise ValueError("weights_milli must be a non-empty dict")
    pairs = []
    for k, v in weights_milli.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(int(v)).cast("long"))
    wmap = F.create_map(*pairs)
    feats = hashed_features(F.col(text_col))
    weights = F.transform(
        feats,
        lambda f: F.coalesce(
            F.element_at(wmap, f), F.lit(int(default_milli)).cast("long")
        ),
    )
    score = F.aggregate(
        weights, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    n_feat = F.size(feats)
    keep = (score * F.lit(WEIGHT_SCALE)) >= (F.lit(threshold_milli) * n_feat)
    return df.select(
        F.col(id_col),
        n_feat.alias("n_features"),
        score.alias("score_milli"),
        F.when(n_feat == 0, F.lit("drop"))
        .when(keep, F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("quality_label"),
    )
