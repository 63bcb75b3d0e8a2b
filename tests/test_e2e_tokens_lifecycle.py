"""End-to-end training-data lifecycle over one synthetic text corpus:

    raw text --train_bpe--> model --bpe_encode--> north-rule table
    (doc_id, tokens:array<int>, n_tok, source) --checkpointed
    validation (vocab bound, n_tok==size, unique ids, source dim)
    + quarantine--> clean table --exact dedup--> --ExactSubstr span
    dedup--> --pack_assignments--> --write_training_shards--> shards

Every stage is asserted against the previous one (token conservation,
planted-violation routing, duplicate elimination, decode round-trip,
shard manifest counts), proving the engine's operators COMPOSE into the
pipeline the north rule describes — not just pass in isolation.
Deterministic end to end: seeded corpus, deterministic BPE, md5-keyed
dedup/packing/shuffle.
"""

from __future__ import annotations

import json
import os
import random

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators.dedup import dedup_exact
from medea_ps_spark.operators.packing import pack_assignments
from medea_ps_spark.operators.runner import run_checkpointed_validation
from medea_ps_spark.operators.shards import read_shard, write_training_shards
from medea_ps_spark.operators.tokenize import (
    bpe_decode,
    bpe_encode,
    bpe_vocab_df,
    train_bpe,
)
from medea_ps_spark.operators.tokenops import dedup_token_spans
from medea_ps_spark.plans.compiler import Registry
from medea_ps_spark.plans.constraints import (
    ConstraintSet,
    ElementsInRange,
    NotNull,
    ReferentialIn,
    SizeEquals,
    Unique,
)

WORDS = [
    f"w{i:03d}" for i in range(160)
] + ["alpha", "beta", "gamma", "delta", "memo", "risk", "loan", "rate"]
BOILER = "this message is confidential please delete if received in error"
SOURCES = ["web", "books"]


def _corpus_rows():
    rng = random.Random(20260819)
    rows = []
    for i in range(200):
        n = rng.randint(5, 30)
        words = [WORDS[rng.randrange(len(WORDS))] for _ in range(n)]
        text = " ".join(words)
        if i % 7 == 0:  # ~29 docs carry the boilerplate tail
            text = text + " " + BOILER
        rows.append((f"doc{i:04d}", text, SOURCES[i % 2]))
    # exact duplicate pair (dup2 must lose to dup1 on id order)
    dup_text = "alpha beta gamma delta " * 3
    rows.append(("dup1", dup_text, "web"))
    rows.append(("dup2", dup_text, "books"))
    # the doc whose tokens get poisoned post-encode
    rows.append(("poison", "loan rate memo risk alpha beta", "web"))
    return rows


@pytest.fixture(scope="module")
def lifecycle(spark, tmp_path_factory):
    """Run the whole pipeline once; individual tests assert stages."""
    base = tmp_path_factory.mktemp("e2e")
    corpus = spark.createDataFrame(
        _corpus_rows(), "doc_id string, text string, source string"
    )

    # 1. tokenizer: trained on the corpus it will encode
    model = train_bpe(corpus, num_merges=80, min_pair_count=2)
    vocab_size = len(model.vocab)

    # 2. encode -> the exact north-rule input shape
    encoded = bpe_encode(corpus, model, out_col="tokens")
    table = encoded.select(
        "doc_id",
        "tokens",
        F.size("tokens").cast("int").alias("n_tok"),
        "source",
    )
    # 3. plant one out-of-vocab token (simulates a corrupt shard)
    bad_id = vocab_size + 7
    table = table.withColumn(
        "tokens",
        F.when(
            F.col("doc_id") == "poison",
            F.concat(F.col("tokens"), F.array(F.lit(bad_id))),
        ).otherwise(F.col("tokens")),
    ).withColumn("n_tok", F.size("tokens").cast("int"))

    table_path = str(base / "tokens_table")
    table.write.partitionBy("source").parquet(table_path)

    # 4. checkpointed validation + quarantine (clean_output)
    reg = Registry()
    reg.register(
        ConstraintSet(
            "$start",
            [
                NotNull("id_present", "doc_id"),
                NotNull("tokens_present", "tokens"),
                ElementsInRange("tokens_in_vocab", "tokens", 0, vocab_size),
                SizeEquals("n_tok_consistent", "n_tok", "tokens"),
                Unique("unique_doc", "doc_id"),
                ReferentialIn("known_source", "source", dim_values=SOURCES),
            ],
        )
    )
    ck = str(base / "ck")
    clean_dir = str(base / "clean")
    metrics = run_checkpointed_validation(
        spark,
        table_path,
        reg,
        ck,
        id_column="doc_id",
        partition_col="source",
        clean_output=clean_dir,
    )
    clean = spark.read.parquet(clean_dir)

    # 5. exact dedup on the token arrays (comma-joined id signature)
    sig = F.concat_ws(",", F.col("tokens").cast("array<string>"))
    exact = (
        dedup_exact(clean.withColumn("_sig", sig), text_col="_sig")
        .drop("_sig")
    )

    # 6. ExactSubstr span dedup (keep corpus-first boilerplate copy)
    spanfree = dedup_token_spans(exact, k=8)

    # 7. packing + 8. shards
    packed = pack_assignments(spanfree, max_tokens=128)
    shard_dir = str(base / "shards")
    manifest = write_training_shards(
        spanfree.drop("removed_tokens"), shard_dir, n_shards=4, seed=9
    )

    return {
        "spark": spark,
        "corpus": corpus,
        "model": model,
        "vocab_size": vocab_size,
        "bad_id": bad_id,
        "table": spark.read.parquet(table_path),
        "ck": ck,
        "metrics": metrics,
        "clean": clean,
        "exact": exact,
        "spanfree": spanfree,
        "packed": packed,
        "shard_dir": shard_dir,
        "manifest": manifest,
        "table_path": table_path,
        "reg": reg,
    }


def test_validation_routes_only_the_poisoned_doc(lifecycle):
    spark = lifecycle["spark"]
    viol = spark.read.parquet(
        os.path.join(lifecycle["ck"], "out", "source=web", "violations")
    )
    rows = {(r["doc_id"], r["constraint_id"]) for r in viol.collect()}
    assert rows == {("poison", "tokens_in_vocab")}
    # books partition is fully clean: no violations parquet rows
    m = lifecycle["metrics"]
    assert m["web"]["n_failed"] == 1
    assert m["books"]["n_failed"] == 0
    assert sum(v["n_rows"] for v in m.values()) == 203


def test_quarantine_clean_table_excludes_poison_only(lifecycle):
    clean_ids = {r["doc_id"] for r in lifecycle["clean"].select("doc_id").collect()}
    table_ids = {r["doc_id"] for r in lifecycle["table"].select("doc_id").collect()}
    assert table_ids - clean_ids == {"poison"}
    assert len(clean_ids) == 202


def test_resume_is_metadata_only_noop(lifecycle):
    again = run_checkpointed_validation(
        lifecycle["spark"],
        lifecycle["table_path"],
        lifecycle["reg"],
        lifecycle["ck"],
        id_column="doc_id",
        partition_col="source",
        clean_output=None,
    )
    assert again == {}


def test_every_clean_token_resolves_in_the_vocab_dim(lifecycle):
    vocab = bpe_vocab_df(lifecycle["spark"], lifecycle["model"])
    misses = (
        lifecycle["clean"]
        .select(F.explode("tokens").alias("token_id"))
        .join(F.broadcast(vocab), "token_id", "left_anti")
        .count()
    )
    assert misses == 0
    assert vocab.count() == lifecycle["vocab_size"]


def test_exact_dedup_drops_the_planted_duplicate(lifecycle):
    ids = {r["doc_id"] for r in lifecycle["exact"].select("doc_id").collect()}
    assert "dup1" in ids and "dup2" not in ids
    assert len(ids) == 201


def test_span_dedup_keeps_one_boilerplate_copy(lifecycle):
    model = lifecycle["model"]
    boiler_ids = []
    for w in BOILER.split():
        boiler_ids.extend(model.encode_word(w))
    k = len(boiler_ids)
    assert k >= 8

    def count_occurrences(df):
        toks = F.col("tokens")
        n = F.coalesce(F.size(toks), F.lit(0))
        hits = F.when(n < k, F.lit(0)).otherwise(
            F.size(
                F.filter(
                    F.sequence(F.lit(1), n - F.lit(k - 1)),
                    lambda i: F.slice(toks, i, k)
                    == F.array(*[F.lit(t) for t in boiler_ids]),
                )
            )
        )
        return df.agg(F.sum(hits)).collect()[0][0]

    before = count_occurrences(lifecycle["exact"])
    after = count_occurrences(lifecycle["spanfree"])
    assert before >= 25  # planted on ~29 docs
    assert after == 1  # exactly the corpus-first copy survives
    # conservation: per-row n_tok tracks the rewritten array, and the
    # corpus-wide token count before == after + removed
    bad = (
        lifecycle["spanfree"]
        .where(F.col("n_tok") != F.size("tokens"))
        .count()
    )
    assert bad == 0
    pre = lifecycle["exact"].agg(F.sum(F.size("tokens"))).collect()[0][0]
    post = lifecycle["spanfree"].agg(
        F.sum("n_tok"), F.sum("removed_tokens")
    ).collect()[0]
    assert post[0] + post[1] == pre


def test_decode_round_trips_the_normalized_text(lifecycle):
    sample = lifecycle["corpus"].where(F.col("doc_id") == "doc0001")
    enc = bpe_encode(sample, lifecycle["model"], out_col="ids")
    dec = bpe_decode(enc, lifecycle["model"], ids_col="ids")
    r = dec.select("text", "decoded_text").collect()[0]
    # lossless up to the pretokenizer (letter/digit boundaries split)
    from medea_ps_spark.operators.tokenize import _pretokenize

    norm = " ".join(_pretokenize(r["text"], lowercase=True))
    assert r["decoded_text"] == norm


def test_packing_conserves_tokens_and_respects_chunk_size(lifecycle):
    src = lifecycle["spanfree"].agg(F.sum("n_tok")).collect()[0][0]
    packed = lifecycle["packed"]
    assert packed.agg(F.sum("n_tok")).collect()[0][0] == src
    assert packed.agg(F.max("pack_offset")).collect()[0][0] < 128
    assert packed.where(F.col("n_chunks_spanned") < 0).count() == 0
    assert packed.count() == lifecycle["spanfree"].count()


def test_shards_cover_the_deduped_table_exactly(lifecycle):
    man = lifecycle["manifest"]
    n = lifecycle["spanfree"].count()
    assert man["n_rows"] == n == sum(man["counts"].values())
    disk = json.load(
        open(os.path.join(lifecycle["shard_dir"], "_shards_manifest.json"))
    )
    assert disk == man
    # one shard read back: ordered by the seeded shuffle key, ids subset
    s0 = read_shard(lifecycle["spark"], lifecycle["shard_dir"], 0)
    rows = s0.collect()
    assert len(rows) == man["counts"]["0"]
    keys = [r["shuffle_key"] for r in rows]
    assert keys == sorted(keys)
    all_ids = {
        r["doc_id"]
        for k in range(4)
        for r in read_shard(lifecycle["spark"], lifecycle["shard_dir"], k)
        .select("doc_id")
        .collect()
    }
    spanfree_ids = {
        r["doc_id"] for r in lifecycle["spanfree"].select("doc_id").collect()
    }
    assert all_ids == spanfree_ids
