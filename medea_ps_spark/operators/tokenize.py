"""BPE tokenizer — train on the corpus, encode text → token ids at
scale (Sennrich et al., "Neural Machine Translation of Rare Words with
Subword Units", ACL 2016; merge-rank encoding as popularized by GPT-2,
Radford et al. 2019).

The engine's validation/dedup/packing/scoring operators all consume a
``tokens:array<int>`` payload; this module is the stage that PRODUCES
it from raw text, completing the pipeline (clean → tokenize → validate
→ pack → shard).

Scale design (10^12 documents):

* **Training input is the word-frequency table, not the corpus.** BPE
  training consumes word → count (Sennrich's algorithm is defined on
  exactly that dict), so the distributed part is ONE regexp pretokenize
  + explode + partial/final hash agg — the shuffle carries distinct
  words per partition, not tokens. The driver sees only the top
  ``max_words`` rows (TakeOrdered: count desc, word asc — a bounded,
  deterministic collect), and Zipf's law makes that cap cheap: the tail
  it drops is singleton junk that would never win a merge anyway. The
  merge loop itself is pure Python over ≤ max_words short strings.
* **Encoding is map-only.** The merges/vocab ship to executors once
  (task closure — a few hundred KB for a 64Ki vocab), each task
  pretokenizes with the same regex and encodes word-by-word with a
  per-task word→ids cache: Zipf again — a handful of thousand distinct
  words cover almost every occurrence, so the sequential merge loop
  runs once per DISTINCT word per task, not once per token. Arrow
  batches in/out (``mapInPandas``), zero shuffles, zero driver traffic;
  the plan is a single ``MapInPandas`` over the scan (plan-gated).
* **Encoded ids are validation-ready**: ``bpe_vocab_df`` gives the
  (token_id, token) table for `ReferentialIn`-style vocab-membership
  checks, and every id is < len(vocab), so
  ``ElementsInRange(0, vocab_size)`` holds by construction.

Determinism: training breaks pair-count ties lexicographically and the
driver collect is totally ordered, so the same corpus + params give the
same model on any cluster size or layout; encoding is a pure function
of (model, text). No RNG anywhere.

No reference counterpart: medea-ps (src/Data/Medea.purs) validates
documents and has no tokenizer; this belongs to the mandated
training-data-pipeline family (token-producing stage for the
``tokens:array<int>`` payload the north rule validates).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..functions.text import TOKEN_REGEX

_EOW = "</w>"  # end-of-word marker, a symbol of its own (Sennrich)
_UNK = "<unk>"  # id 0; emitted for characters unseen in training

_PRETOKEN_RE = re.compile(TOKEN_REGEX)
_WS_RE = re.compile(r"\s+")


def _pretokenize(text: Optional[str], lowercase: bool) -> List[str]:
    """The Python twin of the engine's JVM-side pretokenizer
    (functions/text.py TOKEN_REGEX over whitespace-normalized text):
    words / digit runs / punctuation runs. NULL → no tokens."""
    if text is None:
        return []
    if lowercase:
        text = text.lower()
    return _PRETOKEN_RE.findall(_WS_RE.sub(" ", text).strip())


@dataclass
class BPEModel:
    """A trained BPE tokenizer: ``merges`` in training order (their
    index is the merge rank — lower merges first) and the symbol → id
    ``vocab`` (id 0 is the unk token; base symbols next, sorted;
    merged symbols after, in merge order; duplicate surface strings
    share the first id)."""

    merges: List[Tuple[str, str]]
    vocab: Dict[str, int]
    lowercase: bool = True
    ranks: Dict[Tuple[str, str], int] = field(init=False, repr=False)

    def __post_init__(self) -> None:
        self.ranks = {pair: i for i, pair in enumerate(self.merges)}

    @property
    def unk_id(self) -> int:
        return self.vocab[_UNK]

    def to_json(self) -> str:
        return json.dumps(
            {
                "merges": [list(p) for p in self.merges],
                "vocab": self.vocab,
                "lowercase": self.lowercase,
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "BPEModel":
        d = json.loads(s)
        return cls(
            merges=[tuple(p) for p in d["merges"]],
            vocab=d["vocab"],
            lowercase=d["lowercase"],
        )

    def encode_word(self, word: str) -> List[int]:
        """Greedy lowest-rank merging of the word's symbol sequence
        (chars + end-of-word marker) — the standard rank-driven BPE
        apply. Unseen symbols map to the unk id."""
        syms = list(word) + [_EOW]
        while len(syms) > 1:
            best: Optional[Tuple[str, str]] = None
            best_rank = len(self.merges)
            for i in range(len(syms) - 1):
                r = self.ranks.get((syms[i], syms[i + 1]))
                if r is not None and r < best_rank:
                    best, best_rank = (syms[i], syms[i + 1]), r
            if best is None:
                break
            merged: List[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    merged.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            syms = merged
        unk = self.unk_id
        return [self.vocab.get(s, unk) for s in syms]

    def decode_ids(self, ids: List[int]) -> str:
        """ids → text (pretokens joined by single spaces; the word
        boundary is the end-of-word marker). Unk ids decode to the unk
        token surface."""
        by_id: Dict[int, str] = {}
        for s, i in self.vocab.items():
            by_id.setdefault(i, s)
        return (
            "".join(by_id.get(i, _UNK) for i in ids)
            .replace(_EOW, " ")
            .strip()
        )


def word_counts(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, n) corpus pretoken-frequency table — the distributed half
    of BPE training. One regexp pretokenize + explode + partial/final
    hash agg; the shuffle carries distinct words per partition."""
    col = F.col(text_col)
    if lowercase:
        col = F.lower(col)
    toks = F.regexp_extract_all(
        F.trim(F.regexp_replace(col, r"\s+", " ")),
        F.lit(TOKEN_REGEX),
        F.lit(0),
    )
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_bpe(
    corpus: DataFrame,
    text_col: str = "text",
    num_merges: int = 256,
    max_words: int = 100_000,
    min_pair_count: int = 2,
    lowercase: bool = True,
) -> BPEModel:
    """Train a BPE model on ``corpus``. The corpus-sized work is one
    word-count aggregate; the driver collects only the top
    ``max_words`` (count desc, word asc — deterministic) and runs the
    merge loop on that dict. Training stops early when the best
    remaining pair's weighted count drops below ``min_pair_count``
    (merging singleton noise would memorize the sample)."""
    if num_merges <= 0:
        raise ValueError(f"num_merges must be positive, got {num_merges}")
    if max_words <= 0:
        raise ValueError(f"max_words must be positive, got {max_words}")
    rows = (
        word_counts(corpus, text_col, lowercase)
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    freqs: Dict[Tuple[str, ...], int] = {}
    base: set = {_EOW}
    for r in rows:
        syms = tuple(list(r["word"]) + [_EOW])
        freqs[syms] = freqs.get(syms, 0) + int(r["n"])
        base.update(r["word"])

    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: Dict[Tuple[str, str], int] = {}
        for syms, n in freqs.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
        if not pair_counts:
            break
        # max count, lexicographically-smallest pair tiebreak: total
        # order ⇒ the model is a pure function of the word table
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        a, b = best[0]
        merges.append((a, b))
        nxt: Dict[Tuple[str, ...], int] = {}
        for syms, n in freqs.items():
            out: List[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + n
        freqs = nxt

    vocab: Dict[str, int] = {_UNK: 0}
    for s in sorted(base):
        vocab.setdefault(s, len(vocab))
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    return BPEModel(merges=merges, vocab=vocab, lowercase=lowercase)


def bpe_encode(
    df: DataFrame,
    model: BPEModel,
    text_col: str = "text",
    out_col: str = "token_ids",
    batch_hint: int = 0,
) -> DataFrame:
    """Append ``out_col: array<int>`` — the BPE ids of ``text_col``.
    Map-only: the model rides the task closure, each task keeps a
    word → ids cache across its Arrow batches (Zipf makes the hit rate
    high, so the merge loop runs per distinct word, not per token).
    NULL text → NULL ids (distinguishable from a present-but-empty
    text's empty array)."""
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField(out_col, T.ArrayType(T.IntegerType()), True)]
    )
    blob = model.to_json()
    lowercase = model.lowercase

    def encode_batches(
        it: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        m = BPEModel.from_json(blob)
        cache: Dict[str, List[int]] = {}

        def enc(text: Optional[str]):
            if text is None:
                return None
            ids: List[int] = []
            for w in _pretokenize(text, lowercase):
                got = cache.get(w)
                if got is None:
                    got = m.encode_word(w)
                    cache[w] = got
                ids.extend(got)
            return ids

        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = pdf[text_col].map(enc)
            yield pdf

    return df.mapInPandas(encode_batches, schema=out_schema)


def bpe_decode(
    df: DataFrame,
    model: BPEModel,
    ids_col: str = "token_ids",
    out_col: str = "decoded_text",
) -> DataFrame:
    """Append ``out_col: string`` — the surface form of ``ids_col``
    (pretokens joined by spaces; lossless up to the pretokenizer's
    whitespace normalization). Map-only, same closure pattern as
    :func:`bpe_encode`."""
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.StringType(), True)]
    )
    blob = model.to_json()

    def decode_batches(
        it: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        m = BPEModel.from_json(blob)

        def dec(ids):
            if ids is None:
                return None
            return m.decode_ids(list(ids))

        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = pdf[ids_col].map(dec)
            yield pdf

    return df.mapInPandas(decode_batches, schema=out_schema)


def bpe_vocab_df(spark: SparkSession, model: BPEModel) -> DataFrame:
    """(token_id, token) vocabulary table — the broadcastable dimension
    for vocab-membership validation (`ReferentialIn` on exploded ids)
    and for id → surface joins. Duplicate surface strings (two merges
    can produce the same concatenation) keep the FIRST id, matching
    :meth:`BPEModel.encode_word`'s lookup."""
    first: Dict[int, str] = {}
    for s, i in sorted(model.vocab.items(), key=lambda kv: kv[1]):
        first.setdefault(i, s)
    return spark.createDataFrame(
        [(i, s) for i, s in sorted(first.items())],
        schema="token_id int, token string",
    )
