"""Near-dup clustering (connected components), quantile drift, and the
corpus-cleaning pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators import dedup_cluster as DC
from medea_ps_spark.operators.drift import quantile_drift
from medea_ps_spark.operators.pipeline import clean_corpus
from medea_ps_spark.sources import synthetic


def test_connected_components_basic(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a bigint, id_b bigint",
    )
    comp = {r["node"]: r["component"] for r in DC.connected_components(pairs).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
    assert comp[20] == comp[21] == comp[22] == comp[23] == 20


def test_connected_components_chain_converges(spark):
    # long path graph exercises multi-iteration propagation
    n = 40
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a bigint, id_b bigint"
    )
    comp = {r["node"]: r["component"] for r in DC.connected_components(pairs).collect()}
    assert set(comp.values()) == {0}


def test_canonicalize_and_dedup(spark):
    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id bigint, text string"
    )
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a bigint, id_b bigint")
    out = DC.canonicalize(df, pairs)
    canon = {r["doc_id"]: r["canonical_id"] for r in out.collect()}
    assert canon == {0: 0, 1: 1, 2: 2, 3: 0, 4: 4, 5: 0}
    kept = {r["doc_id"] for r in DC.dedup_by_clusters(df, pairs).collect()}
    assert kept == {0, 1, 2, 4}


def test_quantile_drift(spark):
    clean = synthetic.sequences(spark, 20_000, seed=8, clean=True)
    from medea_ps_spark.operators.sketches import quantiles

    ref = dict(quantiles(clean, "n_tok", [0.5, 0.9, 0.99]))
    same = synthetic.sequences(spark, 20_000, seed=9, clean=True)
    v = quantile_drift(same, ref, "n_tok", rel_tolerance=0.25)
    assert not v["drifted"], v
    shifted = same.withColumn(
        "n_tok", (F.col("n_tok") * 2).cast("int")
    )
    v2 = quantile_drift(shifted, ref, "n_tok", rel_tolerance=0.25)
    assert v2["drifted"], v2


def test_clean_corpus_decontamination_and_pii(spark):
    bench_q = ("which planet in the solar system has the largest number "
               "of confirmed natural satellites orbiting it today")
    rows = [
        (0, f"web page discussing {bench_q} and other astronomy trivia"),
        (1, "a long clean document about growing tomatoes in a greenhouse "
            "with drip irrigation and proper winter ventilation"),
        (2, "another clean text mentioning contact me at bob@example.com "
            "for the full gardening schedule with friends and family"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    evals = spark.createDataFrame([(100, bench_q)], "doc_id bigint, text string")
    clean, rep = clean_corpus(
        df, near_dup=False, eval_df=evals, contamination_k=8, scrub_pii=True
    )
    kept = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert 0 not in kept                       # contaminated doc dropped
    assert set(kept) == {1, 2}
    assert "<EMAIL>" in kept[2] and "bob@example.com" not in kept[2]
    assert rep.after_near_dedup - rep.after_decontamination == 1
    assert rep.pii_redacted_rows == 1
    assert {"stage": "decontamination", "removed": 1} in rep.stages
    assert clean.columns == ["doc_id", "text"]


def test_clean_corpus_pipeline(spark):
    import random as _random

    words = (
        "mountain river castle engine garden window planet bridge forest "
        "anchor lantern marble copper violet thunder harbor meadow falcon "
        "ember quartz willow saddle compass barrel canyon timber velvet "
        "mirror orchid pepper"
    ).split()
    rng = _random.Random(99)
    base = []
    for i in range(20):
        # distinct word content per doc so only PLANTED pairs are near-dups
        body = " ".join(rng.sample(words, k=12) + ["the", "and", "with", "for"])
        base.append((i, f"the story of {body} is told with care and for detail"))
    dups = [(100 + i, base[i][1]) for i in range(5)]  # exact dups
    near = [(200 + i, base[i][1].replace("story", "tale")) for i in range(5)]
    junk = [(300, "x"), (301, "!!! ??? ..."), (302, "a b c")]  # fail quality
    spanish = [(400, "el perro y la gata viven en la casa de una familia feliz "
                     "cerca de la playa durante el verano con los abuelos")]
    df = spark.createDataFrame(
        base + dups + near + junk + spanish, "doc_id bigint, text string"
    )
    clean, rep = clean_corpus(
        df, allowed_langs=["en"], minhash_threshold=0.5
    )
    assert rep.input_rows == 34
    assert rep.after_exact_dedup == 29  # 5 exact dups gone
    assert rep.after_near_dedup <= 29 - 4  # most near-dups clustered away
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert not kept & {100, 101, 102, 103, 104}  # exact dups removed
    assert not kept & {300, 301, 302}  # junk removed
    assert 400 not in kept  # spanish removed
    assert set(range(20)) <= kept | {200, 201, 202, 203, 204}  # originals survive
    assert clean.columns == ["doc_id", "text"]


def test_clean_corpus_empty_input(spark):
    """Empty corpus => zeroed CleaningReport, not a TypeError (sum()
    over zero rows is NULL)."""
    df = spark.createDataFrame([], "doc_id bigint, text string")
    clean, rep = clean_corpus(df, allowed_langs=["en"], near_dup=False)
    assert rep.input_rows == 0
    assert rep.after_exact_dedup == 0
    assert rep.after_language == 0
    assert clean.count() == 0


def test_clean_corpus_repetition_stage(spark):
    """Opt-in Gopher repetition filter drops boilerplate-dominated docs
    between the quality and language stages, and the audit counts it."""
    good = [
        (i, "a genuinely varied sentence about topic number %d with many "
            "distinct interesting words like %s and %s for the test" % (
                i, f"alpha{i}", f"beta{i}"))
        for i in range(10)
    ]
    spammy = [(100, ("buy now " * 40).strip()),
              (101, ("spam spam wonderful spam " * 15).strip())]
    df = spark.createDataFrame(good + spammy, "doc_id bigint, text string")
    clean, rep = clean_corpus(
        df, near_dup=False, max_dup_word_frac=0.5,
    )
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert not kept & {100, 101}
    assert set(range(10)) <= kept
    stages = {s["stage"]: s for s in rep.stages}
    assert stages["repetition"]["removed"] == 2
    assert rep.after_repetition == rep.after_quality - 2
    # default (no thresholds) leaves the stage as a no-op
    _, rep2 = clean_corpus(df, near_dup=False)
    assert {s["stage"]: s for s in rep2.stages}["repetition"]["removed"] == 0
