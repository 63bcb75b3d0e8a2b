"""Training-data pipeline operators: dedup family, ANN, text analysis,
multimodal plumbing — with independent pandas/duckdb-free oracles."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators import dedup as DD
from medea_ps_spark.operators import multimodal as MM
from medea_ps_spark.operators import similarity as SIM
from medea_ps_spark.operators import textquality as TQ

DOCS = "/root/testdata/sf0.001/documents.parquet"
EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(DOCS)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(EMB)
    df.cache().count()
    return df


# -- helpers: python oracles ---------------------------------------------------


def py_norm(t: str) -> str:
    return " ".join(t.lower().split())


def py_shingles(t: str, k: int = 3):
    toks = py_norm(t).split()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def py_jaccard(a: set, b: set) -> float:
    return len(a & b) / len(a | b) if a | b else 0.0


# -- exact dedup ---------------------------------------------------------------


def test_exact_duplicates_oracle(spark, docs):
    got = DD.exact_duplicates(docs, "text", "doc_id").collect()
    pdf = docs.select("doc_id", "text").toPandas()
    pdf["fp"] = pdf.text.map(py_norm)
    canon = pdf.groupby("fp").doc_id.min()
    want = {
        (r.doc_id, canon[r.fp])
        for r in pdf.itertuples()
        if r.doc_id != canon[r.fp]
    }
    assert {(r["doc_id"], r["canonical_id"]) for r in got} == want
    # survivors + dups == all rows
    kept = DD.dedup_exact(docs, "text", "doc_id").count()
    assert kept + len(want) == docs.count()


# -- ngram jaccard ----------------------------------------------------------------


def test_ngram_jaccard_matches_python(spark, docs):
    sub = docs.limit(80)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.ngram_jaccard_pairs(sub, "text", "doc_id", 3, 0.2).collect()
    }
    pdf = sub.select("doc_id", "text").toPandas()
    sh = {r.doc_id: py_shingles(r.text) for r in pdf.itertuples()}
    want = {}
    for a, b in itertools.combinations(sorted(sh), 2):
        if not sh[a] or not sh[b]:
            continue
        j = py_jaccard(sh[a], sh[b])
        if j >= 0.2:
            want[(a, b)] = j
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


# -- minhash LSH -------------------------------------------------------------------


def test_dedup_exact_keep_order_policy(spark):
    """keep_order selects WHICH duplicate survives — keep the
    highest-quality copy instead of the min id."""
    rows = [
        (1, "same text here", 0.2),
        (2, "same text here", 0.9),  # best copy — must survive
        (3, "same text here", 0.5),
        (4, "a different document", 0.1),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, q double")
    default = {r["doc_id"] for r in DD.dedup_exact(df).collect()}
    assert default == {1, 4}  # min-id policy unchanged
    best = {
        r["doc_id"]
        for r in DD.dedup_exact(
            df, keep_order=[F.desc("q"), F.asc("doc_id")]
        ).collect()
    }
    assert best == {2, 4}


def test_minhash_lsh_finds_planted_near_dups(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far away "
        "into the deep green forest while the hunter watches quietly from afar"
    )
    rows = [(f"d{i}", base + f" variant token{i}") for i in range(10)]
    rows += [(f"u{i}", f"completely different text number {i} with unrelated "
              f"words like banana spaceship quantum {i * 17} puzzle") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = DD.minhash_near_duplicates(
        df, num_hashes=32, bands=8, threshold=0.6
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # all planted near-dup pairs found, no cross-group false positives
    assert all(a.startswith("d") == b.startswith("d") for a, b in got)
    d_pairs = {p for p in got if p[0].startswith("d")}
    assert len(d_pairs) >= 40  # of 45 possible — LSH at s~0.9 recalls ~all
    # verified jaccard values are exact
    for r in pairs:
        assert 0.6 <= r["jaccard"] <= 1.0


def test_minhash_md5_and_xxhash_agree_on_verified_pairs(spark):
    """The md5 (oracle-checkable) and xxhash64 (scale) variants may
    differ in candidate RECALL, but every emitted pair is verified with
    exact Jaccard — on a high-similarity planted corpus both must
    surface the identical verified pair set with identical values."""
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest while the hunter watches"
    )
    rows = [(f"d{i}", base + f" tail{i}") for i in range(8)]
    rows += [(f"u{i}", f"unrelated text {i} about {i*13} submarines and "
              f"volcano {i*7} gardens") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    def pairs(fn):
        got = DD.minhash_near_duplicates(
            df, num_hashes=32, bands=8, threshold=0.6, hash_fn=fn
        ).collect()
        return {(r["id_a"], r["id_b"]): round(r["jaccard"], 9) for r in got}
    assert pairs("md5") == pairs("xxhash64")


def test_minhash_jaccard_estimate_unbiased(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    b = "alpha beta gamma delta epsilon zeta eta theta lambda mu " * 3
    df = spark.createDataFrame([("a", a), ("b", b)], "doc_id string, text string")
    sigs = {r["doc_id"]: r["sig"] for r in DD.minhash_signature(df, num_hashes=128).collect()}
    est = np.mean([x == y for x, y in zip(sigs["a"], sigs["b"])])
    true_j = py_jaccard(py_shingles(a), py_shingles(b))
    assert abs(est - true_j) < 0.15


def test_minhash_lsh_bucket_cap_bounds_degenerate_corpus(spark):
    """A boilerplate corpus (one text repeated n times) puts every doc
    in the same band buckets; uncapped, the candidate join is n²/2.
    With max_bucket_size the candidate count must stay O(n), and
    distinct planted near-dups must still pair."""
    boiler = "this exact boilerplate footer appears on every single page " * 3
    planted = (
        "a genuinely unique research abstract about sparse attention kernels "
        "and their throughput on long sequence lengths in production racks"
    )
    n = 200
    rows = [(f"b{i:04d}", boiler) for i in range(n)]
    rows += [("p0", planted), ("p1", planted + " extra trailing words here")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    sigs = DD.minhash_signature(df, num_hashes=32)
    uncapped = DD.minhash_lsh_candidates(sigs, bands=8, rows_per_band=4)
    capped = DD.minhash_lsh_candidates(
        sigs, bands=8, rows_per_band=4, max_bucket_size=50
    )
    assert uncapped.count() >= n * (n - 1) // 2  # quadratic without the cap
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert len(got) <= 4 * n  # O(n), not O(n²)
    assert ("p0", "p1") in got  # planted pair survives the cap


def test_simhash_bucket_cap_bounds_degenerate_corpus(spark):
    boiler = "identical legal disclaimer text repeated across the corpus " * 3
    n = 150
    planted = (
        "unique discussion of columnar shuffle formats in modern distributed "
        "query engines and their cache behavior " * 2
    )
    rows = [(f"b{i:04d}", boiler) for i in range(n)]
    rows += [("p0", planted), ("p1", planted + " now")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    capped = DD.simhash_near_duplicates(
        df, max_hamming=4, max_bucket_size=50
    )
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert len(got) <= 4 * n
    assert ("p0", "p1") in got


# -- simhash -----------------------------------------------------------------------


def test_simhash_hamming_properties(spark):
    rows = [
        ("a", "the quick brown fox jumps over the lazy dog " * 5),
        ("b", "the quick brown fox jumps over the lazy cat " * 5),
        ("c", "totally unrelated content about quantum chromodynamics and "
              "lattice gauge theory simulations on supercomputers"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    sigs = {r["doc_id"]: r["simhash"] for r in DD.simhash(df).collect()}
    ham_ab = bin((sigs["a"] ^ sigs["b"]) & (2**64 - 1)).count("1")
    ham_ac = bin((sigs["a"] ^ sigs["c"]) & (2**64 - 1)).count("1")
    # similar texts land closer in simhash space than dissimilar ones
    assert ham_ab < ham_ac
    # determinism
    sigs2 = {r["doc_id"]: r["simhash"] for r in DD.simhash(df).collect()}
    assert sigs == sigs2


def test_simhash_near_duplicates_banding_guarantee(spark):
    """4×16-bit bands guarantee candidate generation for Hamming ≤ 3
    (pigeonhole); exact duplicates must always pair."""
    text = "the quick brown fox jumps over the lazy dog " * 4
    other = "unrelated quantum chromodynamics lattice gauge theory words"
    df = spark.createDataFrame(
        [("a", text), ("b", text), ("c", other)], "doc_id string, text string"
    )
    pairs = DD.simhash_near_duplicates(df, max_hamming=3).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert ("a", "b") in got
    assert all({p[0], p[1]} != {"a", "c"} and {p[0], p[1]} != {"b", "c"} for p in got)


# -- embedding similarity -------------------------------------------------------------


def np_topk(pdf, qid, k):
    vecs = np.stack(pdf.embedding.values).astype(np.float64)
    ids = pdf.vec_id.values
    q = vecs[ids.tolist().index(qid)]
    sims = vecs @ q / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    order = sorted(zip(-sims, ids), key=lambda t: (t[0], t[1]))
    return [(int(i), float(-s)) for s, i in order[:k]]


def test_brute_force_topk_matches_numpy(spark, emb):
    queries = emb.limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = SIM.brute_force_topk(emb, queries, k=4).collect()
    pdf = emb.select("vec_id", "embedding").toPandas()
    for qid in [r["query_id"] for r in queries.collect()]:
        want = np_topk(pdf, qid, 4)
        g = sorted(
            [r for r in got if r["query_id"] == qid], key=lambda r: r["rank"]
        )
        assert [r["neighbor_id"] for r in g] == [i for i, _ in want]
        for r, (_, s) in zip(g, want):
            assert abs(r["cosine_sim"] - s) < 1e-9


def test_lsh_topk_recall(spark, emb):
    queries = emb.limit(10).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = SIM.brute_force_topk(emb, queries, k=3)
    approx = SIM.lsh_topk(emb, queries, k=3, n_planes=6, n_tables=6)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall  # 6 tables × 6 planes on random data


def test_cosine_near_duplicates_planted(spark):
    rng = np.random.default_rng(3)
    base = rng.standard_normal(64)
    rows = [(0, (base + 0.01 * rng.standard_normal(64)).tolist()),
            (1, (base + 0.01 * rng.standard_normal(64)).tolist())]
    rows += [(i, rng.standard_normal(64).tolist()) for i in range(2, 40)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<float>",
    )
    got = SIM.cosine_near_duplicates(df, threshold=0.9, exact=True).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {(0, 1)}
    got_lsh = SIM.cosine_near_duplicates(
        df, threshold=0.9, n_planes=4, n_tables=6
    ).collect()
    assert (0, 1) in {(r["id_a"], r["id_b"]) for r in got_lsh}


# -- text quality / langid --------------------------------------------------------------


def test_quality_features_oracle(spark, docs):
    out = TQ.quality_features(docs.limit(50)).collect()
    for r in out:
        toks = r["text"].split()
        assert r["n_tokens"] == len(toks)
        stripped = "".join(r["text"].split())
        if toks:
            assert abs(r["mean_token_len"] - len(stripped) / len(toks)) < 1e-9


def test_language_scores(spark):
    rows = [
        ("e", "the cat and the dog went to the park with a ball"),
        ("s", "el perro y la gata que viven en la casa de una familia"),
        ("f", "le chien est dans la maison avec une balle pour les enfants"),
        ("d", "der hund und die katze sind nicht mit ein kind für immer"),
        ("z", "我是一个人，这不是我的错"),
        ("u", "zzz qqq xxx vvv"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r["lang_guess"] for r in TQ.language_scores(df).collect()}
    assert got == {"e": "en", "s": "es", "f": "fr", "d": "de", "z": "zh", "u": "und"}


def test_fingerprints_ignore_whitespace_case(spark):
    df = spark.createDataFrame(
        [("a", "Hello   World"), ("b", "hello world"), ("c", "other")],
        "doc_id string, text string",
    )
    fps = {r["doc_id"]: r["fingerprint"] for r in TQ.fingerprints(df).collect()}
    assert fps["a"] == fps["b"] != fps["c"]


# -- multimodal plumbing -------------------------------------------------------------------


def test_multimodal_feature_extraction(spark):
    media = MM.synthetic_media(spark, 50)
    feats = MM.extract_features(media).collect()
    assert len(feats) == 50
    by_id = {r["media_id"]: r for r in feats}
    assert all(len(r["features"]) == 16 for r in feats)
    # deterministic: same payload → same features
    feats2 = {r["media_id"]: r["features"] for r in MM.extract_features(media).collect()}
    assert feats2 == {k: v["features"] for k, v in by_id.items()}


def test_multimodal_strict_decoder_raises(spark):
    media = MM.synthetic_media(spark, 3)
    out = MM.extract_features(media, decoder=MM.strict_decoder)
    with pytest.raises(Exception, match="NotImplementedError|media decoding"):
        out.collect()


def test_png_metadata_jvm_parse(spark):
    rows = [
        ("p1", MM.synthetic_png(640, 480)),
        ("p2", MM.synthetic_png(31337, 1, bit_depth=16, color_type=2)),
        ("junk", b"\x89PNGnope not a real signature tail padding"),
        ("short", b"\x89P"),
        ("wav", MM.synthetic_wav(2, 44100)),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r["media_id"]: r for r in MM.png_metadata(df).collect()}
    assert got["p1"]["png_ok"] and (got["p1"]["png_width"], got["p1"]["png_height"]) == (640, 480)
    assert got["p2"]["png_ok"] and got["p2"]["png_width"] == 31337
    assert got["p2"]["png_bit_depth"] == 16 and got["p2"]["png_color_type"] == 2
    for bad in ("junk", "short", "wav"):
        assert not got[bad]["png_ok"] and got[bad]["png_width"] is None


def test_wav_metadata_jvm_parse(spark):
    rows = [
        ("w1", MM.synthetic_wav(2, 44100, bits_per_sample=16)),
        ("w2", MM.synthetic_wav(1, 16000, bits_per_sample=24)),
        ("png", MM.synthetic_png(8, 8)),
        ("junk", b"RIFFxxxxWAVEnot-fmt"),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r["media_id"]: r for r in MM.wav_metadata(df).collect()}
    assert got["w1"]["wav_ok"]
    assert (got["w1"]["wav_channels"], got["w1"]["wav_sample_rate"],
            got["w1"]["wav_bits_per_sample"]) == (2, 44100, 16)
    assert (got["w2"]["wav_channels"], got["w2"]["wav_sample_rate"],
            got["w2"]["wav_bits_per_sample"]) == (1, 16000, 24)
    assert not got["png"]["wav_ok"] and not got["junk"]["wav_ok"]


def test_resize_plan_math(spark):
    rows = [
        ("wide", MM.synthetic_png(640, 480)),
        ("tall", MM.synthetic_png(100, 400)),
        ("small", MM.synthetic_png(100, 50)),   # under max_side: no upscale
        ("junk", b"not a png"),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r["media_id"]: r for r in MM.resize_plan(df, max_side=256).collect()}
    assert (got["wide"]["resize_w"], got["wide"]["resize_h"]) == (256, 192)
    assert (got["tall"]["resize_w"], got["tall"]["resize_h"]) == (64, 256)
    assert (got["small"]["resize_w"], got["small"]["resize_h"]) == (100, 50)
    assert got["junk"]["resize_w"] is None


def test_sample_frames_fanout(spark):
    media = MM.synthetic_media(spark, 30)  # kinds cycle image/audio/video
    frames = MM.sample_frames(media, every_ms=1000, max_frames=8).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    videos = {r["media_id"]: r for r in media.collect() if r["kind"] == "video"}
    assert set(by_id) == set(videos)  # only video rows fan out
    for mid, rows in by_id.items():
        dur = videos[mid]["duration_ms"]
        want = min(dur // 1000 + 1, 8)
        assert len(rows) == want, (mid, dur)
        idxs = sorted(r["frame_idx"] for r in rows)
        assert idxs == list(range(want))
        assert all(r["ts_ms"] == r["frame_idx"] * 1000 for r in rows)
    # deterministic fake frames
    again = MM.sample_frames(media, every_ms=1000, max_frames=8).collect()
    assert sorted((r["media_id"], r["frame_idx"], bytes(r["frame_bytes"]))
                  for r in frames) == sorted(
        (r["media_id"], r["frame_idx"], bytes(r["frame_bytes"])) for r in again)


def test_png_header_decoder_in_feature_path(spark):
    """The real bytes-level decoder plugged into the mapInPandas path:
    features carry the parsed dimensions; non-PNG payloads raise."""
    rows = [("a", MM.synthetic_png(128, 64)), ("b", MM.synthetic_png(1, 99999))]
    df = spark.createDataFrame(rows, "media_id string, payload binary").select(
        "media_id", F.lit("image").alias("kind"), "payload"
    )
    feats = {r["media_id"]: r["features"]
             for r in MM.extract_features(df, decoder=MM.png_header_decoder).collect()}
    assert feats["a"][:4] == [128.0, 64.0, 8.0, 6.0]
    assert feats["b"][:2] == [1.0, 99999.0]
    bad = spark.createDataFrame(
        [("x", b"not a png")], "media_id string, payload binary"
    ).select("media_id", F.lit("image").alias("kind"), "payload")
    with pytest.raises(Exception, match="not a PNG|ValueError"):
        MM.extract_features(bad, decoder=MM.png_header_decoder).collect()


def test_sample_frames_null_duration_and_payload(spark):
    """A video row with NULL duration_ms (pandas float NaN) or NULL
    payload must not fail the batch — it samples a single frame at
    t=0 (regression: int(NaN) raised ValueError)."""
    rows = [
        ("v_null_dur", "video", b"payloadbytes" * 4, None),
        ("v_null_pay", "video", None, 3000),
        ("v_ok", "video", b"abcdef" * 8, 2500),
        ("img", "image", b"\x89PNG", 0),
    ]
    media = spark.createDataFrame(
        rows, "media_id string, kind string, payload binary, duration_ms int"
    )
    frames = MM.sample_frames(media, every_ms=1000, max_frames=8).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id["v_null_dur"]) == 1  # dur=0 -> one frame at t=0
    assert len(by_id["v_null_pay"]) == 4  # 0,1000,2000,3000
    assert all(bytes(r["frame_bytes"]) == b"" for r in by_id["v_null_pay"])
    assert len(by_id["v_ok"]) == 3
    assert "img" not in by_id


def test_topk_per_group_matches_single_window(spark):
    """Two-phase top-k must be bit-identical to the naive single-window
    rank, across many input partitions and with ties broken by the
    unique id column."""
    from pyspark.sql import Window

    from medea_ps_spark.operators.topk import topk_per_group

    rows = [
        (f"g{i % 7}", f"id{i:04d}", float((i * 37) % 50))  # dup scores -> ties
        for i in range(2000)
    ]
    df = spark.createDataFrame(
        rows, "grp string, item string, score double"
    ).repartition(13)
    order = [F.desc("score"), F.asc("item")]
    got = topk_per_group(df, ["grp"], order, 5).select(
        "grp", "item", "score", "rank"
    )
    w = Window.partitionBy("grp").orderBy(*order)
    want = (
        df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("grp", "item", "score", "rank")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # k larger than any group: everything survives, ranks still dense
    all_got = topk_per_group(df, ["grp"], order, 10_000)
    assert all_got.count() == 2000


def test_cosine_srp_bucket_cap_bounds_degenerate_corpus(spark):
    """VERDICT r2 item 2: n near-identical embeddings collapse into one
    SRP bucket in every table; uncapped, the self-join is n²/2. With
    max_bucket_size the candidate count must stay O(n), and a planted
    near-dup pair with a distinct direction must still be found."""
    rng = np.random.default_rng(11)
    base = rng.standard_normal(64)
    n = 300
    # boilerplate cluster: tiny jitter keeps all copies in one bucket
    rows = [
        (i, (base + 1e-4 * rng.standard_normal(64)).tolist()) for i in range(n)
    ]
    planted = rng.standard_normal(64)
    rows += [
        (1000, planted.tolist()),
        (1001, (planted + 0.01 * rng.standard_normal(64)).tolist()),
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<float>",
    )
    uncapped = SIM.cosine_near_duplicates(
        df, threshold=0.99, n_planes=4, n_tables=4, max_bucket_size=None
    )
    assert uncapped.count() >= n * (n - 1) // 2  # quadratic without the cap
    capped = SIM.cosine_near_duplicates(
        df, threshold=0.99, n_planes=4, n_tables=4, max_bucket_size=50
    )
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert len(got) <= 4 * n  # O(n), not O(n²)
    assert (1000, 1001) in got  # planted pair survives the cap


def test_ngram_jaccard_df_cap_default_bounds_blowup(spark):
    """VERDICT r3 #7: the stop-shingle DF cap is now the DEFAULT.
    Degenerate corpus — every doc shares one boilerplate sentence — the
    shared shingles would join S^2 candidate rows; with the cap they
    drop from the index and only genuinely-similar pairs survive."""
    n = 60
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("common boilerplate header line here "),
            F.lit("unique"), F.col("id").cast("string"),
            F.lit(" body "), F.lit("tail"), F.col("id").cast("string"),
        ).alias("text"),
    )
    capped = DD.ngram_jaccard_pairs(
        docs, "text", "doc_id", shingle_k=3, threshold=0.1,
        max_shingle_df=10,
    )
    uncapped = DD.ngram_jaccard_pairs(
        docs, "text", "doc_id", shingle_k=3, threshold=0.1,
        max_shingle_df=None,
    )
    # uncapped: the boilerplate makes every pair >= threshold (S^2);
    # capped: the shared shingles leave the index, no pair survives
    assert uncapped.count() == n * (n - 1) // 2
    assert capped.count() == 0
    # the DEFAULT signature is the capped path (explicit None opts out)
    import inspect
    from medea_ps_spark.operators.dedup import ngram_jaccard_pairs
    assert (
        inspect.signature(ngram_jaccard_pairs)
        .parameters["max_shingle_df"].default == 1000
    )


def test_unigram_lm_scores_hand_computed(spark):
    """Self-scored Laplace bits/token checked against a numpy
    recomputation, and the CCNet-style property: a doc of corpus-common
    words scores fewer bits than a doc of rare words."""
    import math

    from medea_ps_spark.operators.lmscore import (
        unigram_counts, unigram_lm_scores,
    )

    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat"),
         (1, "the the the the"),
         (2, "zyx qwv plk mnb"),
         (3, "   "),          # whitespace-only: excluded
         (4, None)],          # null text: excluded
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in unigram_lm_scores(docs).collect()}
    assert set(out) == {0, 1, 2}
    # corpus: the×6 cat sat on mat×1... plus doc2's 4 singletons
    counts = {"the": 6, "cat": 1, "sat": 1, "on": 1, "mat": 1,
              "zyx": 1, "qwv": 1, "plk": 1, "mnb": 1}
    N, V = sum(counts.values()), len(counts)
    def bits(words):
        return -sum(
            math.log2((counts[w] + 1) / (N + (V + 1))) for w in words
        ) / len(words)
    for d, words in {
        0: "the cat sat on the mat".split(),
        1: "the the the the".split(),
        2: "zyx qwv plk mnb".split(),
    }.items():
        assert abs(out[d]["bits_per_token"] - bits(words)) < 1e-9, d
        assert out[d]["n_tokens"] == len(words)
        assert abs(out[d]["ppl"] - 2 ** bits(words)) < 1e-6
    # common-word doc beats rare-word doc
    assert out[1]["bits_per_token"] < out[2]["bits_per_token"]


def test_unigram_lm_reference_scoring_oov(spark):
    """Scoring AGAINST a frozen reference (the CCNet setup): unseen
    words hit the shared OOV bucket (c=0) instead of erroring, and
    score strictly worse than any in-vocab word."""
    import math

    from medea_ps_spark.operators.lmscore import (
        unigram_counts, unigram_lm_scores,
    )

    ref_corpus = spark.createDataFrame(
        [(0, "alpha beta alpha gamma")], "doc_id int, text string"
    )
    ref = unigram_counts(ref_corpus)  # alpha:2 beta:1 gamma:1
    new = spark.createDataFrame(
        [(10, "alpha alpha"), (11, "unseen unseen")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in
           unigram_lm_scores(new, reference=ref).collect()}
    N, V = 4, 3
    p_alpha = (2 + 1) / (N + (V + 1))
    p_oov = (0 + 1) / (N + (V + 1))
    assert abs(out[10]["bits_per_token"] + math.log2(p_alpha)) < 1e-9
    assert abs(out[11]["bits_per_token"] + math.log2(p_oov)) < 1e-9
    assert out[11]["bits_per_token"] > out[10]["bits_per_token"]
