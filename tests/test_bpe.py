"""BPE tokenizer tests — training vs an independent pure-Python
reference, encode/decode parity, determinism across layouts, and the
map-only plan gate."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators import tokenize as TK
from medea_ps_spark.operators.tokenize import (
    BPEModel,
    bpe_decode,
    bpe_encode,
    bpe_vocab_df,
    train_bpe,
    word_counts,
)

# ---------------------------------------------------------------- #
# independent reference implementation (naive, no sharing with the   #
# operator beyond the public pretokenizer regex)                     #
# ---------------------------------------------------------------- #

EOW = "</w>"


def ref_train(word_freqs, num_merges, min_pair_count=2):
    freqs = {tuple(list(w) + [EOW]): n for w, n in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        pc = {}
        for syms, n in freqs.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + n
        if not pc:
            break
        best_pair, best_n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best_n < min_pair_count:
            break
        merges.append(best_pair)
        a, b = best_pair
        out = {}
        for syms, n in freqs.items():
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            out[tuple(ns)] = out.get(tuple(ns), 0) + n
        freqs = out
    return merges


def ref_encode_word(word, merges):
    syms = list(word) + [EOW]
    for a, b in merges:  # rank order == training order
        while True:
            for i in range(len(syms) - 1):
                if (syms[i], syms[i + 1]) == (a, b):
                    syms = syms[:i] + [a + b] + syms[i + 2:]
                    break
            else:
                break
    return syms


CORPUS = [
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest",
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string"
    ).repartition(3)


@pytest.fixture(scope="module")
def model(corpus_df):
    return train_bpe(corpus_df, num_merges=10, min_pair_count=2)


def _ref_word_freqs():
    wf = {}
    for line in CORPUS:
        for w in re.findall(TK.TOKEN_REGEX, line.lower()):
            wf[w] = wf.get(w, 0) + 1
    return wf


def test_word_counts_match_python(spark, corpus_df):
    got = {
        r["word"]: r["n"] for r in word_counts(corpus_df).collect()
    }
    assert got == _ref_word_freqs()


def test_training_matches_reference(model):
    assert model.merges == ref_train(_ref_word_freqs(), 10)
    # the classic Sennrich corpus: 'est</w>' must become one symbol
    assert "est" + EOW in model.vocab


def test_training_deterministic_across_layouts(spark, corpus_df):
    m1 = train_bpe(corpus_df, num_merges=10)
    m2 = train_bpe(corpus_df.repartition(7), num_merges=10)
    m3 = train_bpe(corpus_df.coalesce(1), num_merges=10)
    assert m1.merges == m2.merges == m3.merges
    assert m1.vocab == m2.vocab == m3.vocab


def test_encode_matches_reference(spark, corpus_df, model):
    out = {
        r["doc_id"]: r["token_ids"]
        for r in bpe_encode(corpus_df, model).collect()
    }
    for i, line in enumerate(CORPUS):
        want = []
        for w in re.findall(TK.TOKEN_REGEX, line.lower()):
            want.extend(
                model.vocab.get(s, model.unk_id)
                for s in ref_encode_word(w, model.merges)
            )
        assert out[i] == want, f"doc {i}"


def test_encode_deterministic_across_layouts(spark, corpus_df, model):
    a = sorted(
        bpe_encode(corpus_df, model).collect(),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        bpe_encode(corpus_df.repartition(5), model).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [r["token_ids"] for r in a] == [r["token_ids"] for r in b]


def test_roundtrip_decode(spark, corpus_df, model):
    coded = bpe_encode(corpus_df, model)
    back = {
        r["doc_id"]: r["decoded_text"]
        for r in bpe_decode(coded, model).collect()
    }
    for i, line in enumerate(CORPUS):
        want = " ".join(re.findall(TK.TOKEN_REGEX, line.lower()))
        assert back[i] == want


def test_oov_null_and_empty(spark, model):
    df = spark.createDataFrame(
        [(0, "low"), (1, "QQZZ low"), (2, None), (3, ""), (4, "   ")],
        "doc_id int, text string",
    )
    rows = {
        r["doc_id"]: r["token_ids"]
        for r in bpe_encode(df, model).collect()
    }
    # OOV chars ('q', 'z' unseen) map to unk; the in-vocab word is intact
    assert model.unk_id in rows[1]
    assert rows[1][-len(rows[0]):] == rows[0]
    assert rows[2] is None  # NULL text → NULL ids
    assert rows[3] == [] and rows[4] == []  # empty/blank → empty array


def test_ids_within_vocab_and_vocab_df(spark, corpus_df, model):
    vdf = bpe_vocab_df(spark, model)
    vocab_ids = {r["token_id"] for r in vdf.collect()}
    assert vocab_ids == set(range(len(vocab_ids)))  # dense 0..V-1
    used = (
        bpe_encode(corpus_df, model)
        .select(F.explode("token_ids").alias("tid"))
        .distinct()
        .collect()
    )
    assert {r["tid"] for r in used} <= vocab_ids


def test_model_serde_roundtrip(spark, corpus_df, model):
    m2 = BPEModel.from_json(model.to_json())
    assert m2.merges == model.merges and m2.vocab == model.vocab
    a = bpe_encode(corpus_df, model).collect()
    b = bpe_encode(corpus_df, m2).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_min_pair_count_stops_early(spark):
    df = spark.createDataFrame(
        [(0, "ab"), (1, "cd")], "doc_id int, text string"
    )
    m = train_bpe(df, num_merges=50, min_pair_count=2)
    assert m.merges == []  # every pair occurs once — below the floor
    m1 = train_bpe(df, num_merges=50, min_pair_count=1)
    assert len(m1.merges) > 0


def test_max_words_cap_is_deterministic(spark):
    rows = [(i, f"w{i:03d}") for i in range(50)] + [(99, "zzz zzz zzz")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    m1 = train_bpe(df, num_merges=5, max_words=3, min_pair_count=1)
    m2 = train_bpe(
        df.repartition(9), num_merges=5, max_words=3, min_pair_count=1
    )
    assert m1.merges == m2.merges and m1.vocab == m2.vocab


def test_bad_args(spark, corpus_df, model):
    with pytest.raises(ValueError, match="num_merges"):
        train_bpe(corpus_df, num_merges=0)
    with pytest.raises(ValueError, match="max_words"):
        train_bpe(corpus_df, max_words=0)
    with pytest.raises(ValueError, match="already exists"):
        bpe_encode(corpus_df, model, out_col="text")


def test_encode_plan_is_map_only(spark, model):
    # fresh (un-repartitioned) input: the encode itself must add no
    # Exchange — it is a single MapInPandas over the scan
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string"
    )
    plan = (
        bpe_encode(df, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan, plan
