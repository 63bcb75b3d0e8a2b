"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship validation pipeline at sf0.001.
``queries()`` — one entry per operator family from SURVEY.md §2
(constraint validation, stats, uniqueness, referential, histogram,
drift, Medea-language validation, dedup family, ANN, text analysis,
sampling/packing/as-of, plus general agg/join breadth).
``oracle_sql()`` — matching DuckDB SQL for EVERY entry (50/50): the
hash-seeded operators are made SQL-reproducible via md5 modes, literal
SRP planes, the committed IVF quantizer artifact, fixed-width-hex
sampling thresholds, window running sums, and DuckDB's native ASOF
JOIN.

Column names and value roundings are aligned pairwise between the Spark
plans and the SQL so the driver's order-insensitive value-hash matches.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from medea_ps_spark.functions.vector import cosine
from medea_ps_spark.operators.fanout import fan_out
from medea_ps_spark.operators import validator as V
from medea_ps_spark.operators import dedup as DD
from medea_ps_spark.operators import similarity as SIM
from medea_ps_spark.plans.compiler import Registry
from medea_ps_spark.plans.constraints import (
    ConstraintSet,
    Expr,
    InRange,
    IsIn,
    Matches,
    NotNull,
    ReferentialIn,
    Unique,
    When,
)

SF_DEFAULT = "/root/testdata/sf0.001"

ALLOWED_LANGS = ["en", "es", "de", "fr"]  # zh intentionally excluded → violations
ALLOWED_SRC = [f"src{i}" for i in range(16)]  # src16..19 → referential violations
NCHARS_HI = 300  # docs longer than this violate → non-trivial verdicts
ZH_CHARS_HI = 150  # tighter cap, scoped to lang='zh' via When


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# size-adaptive spread for single-row-group test inputs (guide §2.5):
# the ANN/LM queries pipeline very heavy narrow work (interpreted HOF
# dot products, word explode+hash) into the scan task; the spread only
# pays once the input is big enough to amortize the exchange (measured
# crossover between ~0.9 MB and ~3.9 MB plan-stat sizes — see
# OPTIMIZATION_r06.md; 2 MB sits between with ≥2x margin each way)
_FAN_MIN_BYTES = 2 << 20


def _emb(spark, sf_dir):
    return fan_out(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
            "embedding", F.col("embedding").cast("array<double>")
        ),
        min_bytes=_FAN_MIN_BYTES,
    )


def _registry() -> Registry:
    """The flagship ConstraintSet over the documents corpus — one
    constraint per Medea-generalization family (SURVEY.md §1.4)."""
    reg = Registry()
    reg.register(
        ConstraintSet(
            "$start",
            [
                NotNull("doc_id_not_null", "doc_id"),
                Expr(
                    "n_chars_consistent",
                    sql="n_chars = length(text)",
                    observed_sql="concat(cast(n_chars as string), ' != ', cast(length(text) as string))",
                ),
                InRange("n_chars_bounds", "n_chars", 1, NCHARS_HI),
                IsIn("lang_allowed", "lang", ALLOWED_LANGS),
                Matches("source_format", "source", r"^src[0-9]+$"),
                # conditional scope (Deequ-style .where()): zh docs get a
                # tighter length cap; FALSE/NULL-lang rows are exempt
                When(
                    "zh_n_chars_cap",
                    "lang = 'zh'",
                    InRange("_inner", "n_chars", None, ZH_CHARS_HI),
                ),
                ReferentialIn("source_known", "source", dim_values=ALLOWED_SRC),
                Unique("doc_id_unique", "doc_id"),
            ],
        )
    )
    return reg


def _validated(spark, sf_dir):
    df = _docs(spark, sf_dir)
    compiled = _registry().compile(df.schema)
    return df, compiled


# SQL predicates mirroring the compiled constraints (for oracles)
_P_NCHARS = f"(n_chars >= 1 AND n_chars <= {NCHARS_HI})"
_P_LANG = "lang IN ('en','es','de','fr')"
_P_SRC_FMT = "regexp_matches(source, '^src[0-9]+$')"
_SRC_LIST = ",".join(f"'{s}'" for s in ALLOWED_SRC)
_P_SRC_KNOWN = f"source IN ({_SRC_LIST})"
# When('zh_n_chars_cap') FAIL condition: scope true AND inner fails
_P_ZH_FAIL = (
    f"(coalesce(lang = 'zh', FALSE) "
    f"AND NOT coalesce(n_chars <= {ZH_CHARS_HI}, TRUE))"
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full validation of the sf0.001 documents corpus —
    row-level + table-level violation rows in one pipeline."""
    df, compiled = _validated(spark, SF_DEFAULT)
    return V.all_violations(df, compiled, id_column="doc_id")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_validate_violations(spark, sf_dir):
    df, compiled = _validated(spark, sf_dir)
    return V.all_violations(df, compiled, id_column="doc_id").select(
        "doc_id", "constraint_id", "observed"
    )


def q_validate_verdicts(spark, sf_dir):
    df, compiled = _validated(spark, sf_dir)
    validated = V.validate(df, compiled)
    return V.partition_verdicts(validated, "source").select(
        "source", "n_rows", "n_passed", "n_failed", "n_violations"
    )


def q_partition_stats(spark, sf_dir):
    df = _docs(spark, sf_dir)
    return df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.avg(F.col("n_chars").cast("double")), 4).alias("avg_chars"),
        F.sum(F.col("doc_id").isNull().cast("bigint")).alias("n_null_ids"),
    )


def q_referential_violations(spark, sf_dir):
    df, compiled = _validated(spark, sf_dir)
    c = next(c for c in compiled.table_constraints if c.name == "source_known")
    return V.referential_violations(df, c, id_column="doc_id").select(
        "doc_id", "observed"
    )


def q_histogram_n_chars(spark, sf_dir):
    from medea_ps_spark.operators.sketches import histogram

    df = _docs(spark, sf_dir)
    return histogram(df, "n_chars", 0, 800, 16).select(
        "bucket", "bucket_count"
    )


def q_drift_chi2(spark, sf_dir):
    """Two-sample χ² AND PSI between even/odd doc_id halves over
    n_chars buckets — fully in SQL aggregation (the sketch path). PSI
    follows operators/drift._psi_from_counts exactly: a 16-bucket spine
    (absent buckets count 0), proportions floored at 1e-4, renormalized,
    Σ(p1−p2)·ln(p1/p2). All post-sketch relations are ≤16 rows; the two
    crossJoins are 1-row broadcast totals."""
    from medea_ps_spark.operators.sketches import bucket_expr

    df = _docs(spark, sf_dir)
    h0 = (
        df.withColumn("bucket", bucket_expr("n_chars", 0, 800, 16))
        .groupBy("bucket")
        .agg(
            F.sum((F.col("doc_id") % 2 == 0).cast("bigint")).alias("o1"),
            F.sum((F.col("doc_id") % 2 == 1).cast("bigint")).alias("o2"),
        )
    )
    spine = spark.range(16).select(F.col("id").cast("int").alias("bucket"))
    h = spine.join(h0, "bucket", "left").select(
        "bucket",
        F.coalesce("o1", F.lit(0)).alias("o1"),
        F.coalesce("o2", F.lit(0)).alias("o2"),
    )
    tot = h.agg(F.sum("o1").alias("n1"), F.sum("o2").alias("n2"))
    terms = h.crossJoin(tot).select(
        "o1", "o2", "n1", "n2",
        F.greatest(
            F.col("o1").cast("double") / F.col("n1"), F.lit(1e-4)
        ).alias("p1"),
        F.greatest(
            F.col("o2").cast("double") / F.col("n2"), F.lit(1e-4)
        ).alias("p2"),
    )
    norm = terms.agg(F.sum("p1").alias("s1"), F.sum("p2").alias("s2"))
    q1 = F.col("p1") / F.col("s1")
    q2 = F.col("p2") / F.col("s2")
    return (
        terms.crossJoin(norm)
        .select(
            F.when(
                F.col("o1") + F.col("o2") > 0,
                F.pow(
                    F.sqrt(F.col("n2") / F.col("n1")) * F.col("o1")
                    - F.sqrt(F.col("n1") / F.col("n2")) * F.col("o2"),
                    F.lit(2.0),
                )
                / (F.col("o1") + F.col("o2")),
            ).alias("cterm"),
            ((q1 - q2) * F.log(q1 / q2)).alias("pterm"),
        )
        .agg(
            F.round(F.sum("cterm"), 4).alias("chi2_stat"),
            F.round(F.sum("pterm"), 6).alias("psi"),
        )
    )


def q_drift_chi2_by_source(spark, sf_dir):
    """Per-PARTITION drift: the same two-sample χ² computed per source
    in ONE grouped aggregation (north star: per-partition verdicts)."""
    from medea_ps_spark.operators.sketches import bucket_expr

    df = _docs(spark, sf_dir)
    h = (
        df.withColumn("bucket", bucket_expr("n_chars", 0, 800, 16))
        .groupBy("source", "bucket")
        .agg(
            # NB: source == doc_id % 20 in this corpus, so a plain
            # even/odd id split is constant per source; split on id//20
            F.sum((F.floor(F.col("doc_id") / 20) % 2 == 0).cast("bigint")).alias("o1"),
            F.sum((F.floor(F.col("doc_id") / 20) % 2 == 1).cast("bigint")).alias("o2"),
        )
    )
    tot = h.groupBy("source").agg(
        F.sum("o1").alias("n1"), F.sum("o2").alias("n2")
    )
    return (
        h.join(tot, "source")
        .where((F.col("o1") + F.col("o2") > 0) & (F.col("n1") > 0) & (F.col("n2") > 0))
        .select(
            "source",
            (
                F.pow(
                    F.sqrt(F.col("n2") / F.col("n1")) * F.col("o1")
                    - F.sqrt(F.col("n1") / F.col("n2")) * F.col("o2"),
                    F.lit(2.0),
                )
                / (F.col("o1") + F.col("o2"))
            ).alias("term"),
        )
        .groupBy("source")
        .agg(F.round(F.sum("term"), 4).alias("chi2_stat"))
    )


def q_ks_stat(spark, sf_dir):
    """Binned KS distance between the n_chars distributions of lang=en
    vs lang=es — windowed cumulative sums, one agg + one window."""
    from pyspark.sql import Window
    from medea_ps_spark.operators.sketches import bucket_expr

    df = _docs(spark, sf_dir)
    h = (
        df.where(F.col("lang").isin("en", "es"))
        .withColumn("bucket", bucket_expr("n_chars", 0, 800, 32))
        .groupBy("bucket")
        .agg(
            F.sum((F.col("lang") == "en").cast("bigint")).alias("c_en"),
            F.sum((F.col("lang") == "es").cast("bigint")).alias("c_es"),
        )
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cdf = h.select(
        (F.sum("c_en").over(w)).alias("cum_en"),
        (F.sum("c_es").over(w)).alias("cum_es"),
    )
    tot = cdf.agg(F.max("cum_en").alias("n_en"), F.max("cum_es").alias("n_es"))
    return (
        cdf.crossJoin(tot)
        .select(
            F.abs(
                F.col("cum_en") / F.col("n_en") - F.col("cum_es") / F.col("n_es")
            ).alias("d")
        )
        .agg(F.round(F.max("d"), 6).alias("ks_stat"))
    )


MEDEA_EVENT_SCHEMA = """$schema $start
    $type
        $object
    $properties
        $property-name "k"
        $property-schema $number
"""


def q_medea_validate_events(spark, sf_dir):
    """The Medea language running distributed: validate events.props
    (JSON) against a Medea schema via the Arrow-batched validator."""
    from medea_ps_spark.plans.medea.validate import validate_json_column

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = validate_json_column(ev, "props", MEDEA_EVENT_SCHEMA)
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("medea_valid").cast("bigint")).alias("n_valid"),
    )


def q_dedup_exact(spark, sf_dir):
    """Exact-dedup canonical mapping over normalized-text fingerprints:
    per fingerprint the kept (min) doc_id and copy count — nonzero
    output even on a dup-free corpus, dup rows when present."""
    df = _docs(spark, sf_dir)
    return (
        DD_fingerprints(df)
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_distinct_texts"),
            F.sum(F.col("n_copies") - 1).alias("n_duplicates"),
            F.round(F.avg("canonical_id"), 4).alias("avg_canonical_id"),
        )
    )


def DD_fingerprints(df):
    from medea_ps_spark.functions.text import fingerprint

    return df.select(F.col("doc_id"), fingerprint(F.col("text")).alias("fingerprint"))


def q_dedup_incremental(spark, sf_dir):
    """Steady-state dedup: a synthetic ingest batch (re-crawled copies
    of corpus docs under new ids + genuinely new ' v2' docs, the latter
    planted twice for within-batch dups) anti-joined against the corpus
    fingerprint set — survivors are exactly the fresh texts, one per
    fingerprint (min-id keep). EXECUTES bloom.incremental_dedup_bloom
    — the Bloom-prefiltered plan (broadcast word-array probe, broadcast
    confirmation joins, no corpus shuffle), bit-identical to
    dedup.incremental_dedup because Bloom has no false negatives
    (equality proven in tests/test_bloom.py); the oracle SQL is the
    plain anti-join semantics, so this row driver-verifies the bloom
    path the way referential_salted covers the salted referential."""
    from medea_ps_spark.operators.bloom import incremental_dedup_bloom

    df = _docs(spark, sf_dir)
    recrawl = df.where(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1000000)
    )
    fresh_a = (
        df.where(F.col("doc_id") % 5 == 1)
        .withColumn("doc_id", F.col("doc_id") + F.lit(2000000))
        .withColumn("text", F.concat(F.col("text"), F.lit(" v2")))
    )
    fresh_b = (
        df.where(F.col("doc_id") % 5 == 1)
        .withColumn("doc_id", F.col("doc_id") + F.lit(3000000))
        .withColumn("text", F.concat(F.col("text"), F.lit(" v2")))
    )
    batch = recrawl.unionByName(fresh_a).unionByName(fresh_b)
    return incremental_dedup_bloom(batch, df, "text", "doc_id", num_bits=1 << 22)


def q_dedup_ngram_jaccard(spark, sf_dir):
    df = _docs(spark, sf_dir).where(F.col("doc_id") < 120)
    pairs = DD.ngram_jaccard_pairs(df, "text", "doc_id", shingle_k=3, threshold=0.12)
    return pairs.select(
        "id_a", "id_b", F.round(F.col("jaccard"), 6).alias("jaccard")
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH end to end WITH a full SQL oracle: hash_fn="md5"
    makes signature lanes + band buckets bit-identical in DuckDB (min
    over fixed-width hex == numeric min), so the driver verifies the
    whole shingle→minhash→band→bucket-join→exact-Jaccard pipeline, not
    just row counts. The xxhash64 default stays the scale path (unit-
    tested); 8 bands × 4 rows puts the s-curve threshold at ~0.6 for
    the tiny-vocab synthetic corpus."""
    df = fan_out(_docs(spark, sf_dir).where(F.col("doc_id") < 400))
    pairs = DD.minhash_near_duplicates(
        df, num_hashes=32, bands=8, threshold=0.35, shingle_k=3,
        hash_fn="md5",
    )
    return pairs.select(
        "id_a", "id_b", F.round(F.col("jaccard"), 6).alias("jaccard")
    )


def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs WITH a full SQL oracle: hash_fn="md5"
    gives 60-bit SQL-reproducible fingerprints, and max_hamming == the
    banding guarantee (4) makes the output banding-independent
    (pigeonhole: every pair within Hamming 4 shares a probe bucket), so
    DuckDB verifies fingerprints AND the pair set with a plain
    hamming-radius self-join. The xxhash64 default stays the scale path."""
    df = _docs(spark, sf_dir).where(F.col("doc_id") < 500)
    return DD.simhash_near_duplicates(df, max_hamming=4, hash_fn="md5")


def q_ann_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.where(F.col("vec_id") >= 8)
    topk = SIM.brute_force_topk(corpus, queries, k=3)
    return topk.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("cosine_sim"), 4).alias("cosine_sim"),
        "rank",
    )


def q_embedding_near_dups(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    pairs = SIM.cosine_near_duplicates(
        emb.where(F.col("vec_id") < 200), threshold=0.25, exact=True
    )
    return pairs.select(
        "id_a", "id_b", F.round(F.col("cosine_sim"), 4).alias("cosine_sim")
    )


def q_ann_lsh(spark, sf_dir):
    """SRP-LSH ANN with a FULL SQL oracle: the hyperplanes are a pure
    function of the seed, so the oracle embeds the same planes as
    literals and DuckDB reproduces buckets, candidate join, and the
    exact re-rank (see _ann_lsh_sql). Recall vs exact is unit-tested."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = SIM.lsh_topk(
        emb.where(F.col("vec_id") >= 8), queries, k=3, n_planes=6, n_tables=6
    )
    return topk.select(
        "query_id", "neighbor_id",
        F.round(F.col("cosine_sim"), 4).alias("cosine_sim"), "rank",
    )


IVF_CENTROIDS_PATH = "/root/repo/tests/fixtures/ivf_centroids.json"


def _ivf_centroids():
    """Committed coarse quantizer (scripts/make_ivf_centroids.py) — a
    versioned artifact, as in production. Fixed centroids make the
    partial-probe IVF path deterministic and SQL-oracle-checkable."""
    import json

    import numpy as np

    with open(IVF_CENTROIDS_PATH) as f:
        return np.array(json.load(f), dtype=np.float64)


def q_ann_ivf(spark, sf_dir):
    """IVF-bucketed ANN with the COMMITTED quantizer: list assignment,
    probe selection (n_probe=3), and exact re-rank — the oracle embeds
    the same centroids as SQL literals and reproduces all three."""
    from medea_ps_spark.operators import ivf as IVF

    emb = _emb(spark, sf_dir)
    cent = _ivf_centroids()
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = IVF.ivf_topk(
        emb.where(F.col("vec_id") >= 8), queries, cent, k=3, n_probe=3
    )
    return topk.select(
        "query_id", "neighbor_id",
        F.round(F.col("cosine_sim"), 4).alias("cosine_sim"), "rank",
    )


def q_embedding_dedup_clusters(spark, sf_dir):
    """Semantic-dedup composition: exact cosine near-dup pairs →
    connected components → (node, component) canonical map. Oracle:
    the same pair graph in SQL + a recursive-CTE transitive closure."""
    from medea_ps_spark.operators.dedup_cluster import connected_components

    emb = _emb(spark, sf_dir)
    pairs = SIM.cosine_near_duplicates(
        emb.where(F.col("vec_id") < 200), threshold=0.25, exact=True
    )
    return connected_components(pairs.select("id_a", "id_b")).select(
        "node", "component"
    )


def q_token_budget_sample(spark, sf_dir):
    """Token-budget mixture sampling over the tokenized-sequence
    fixture — "60k tokens of web-2025, 25k of books, 15k of code, all
    of wiki, drop the rest": documents are selected per source in
    deterministic md5-coordinate order until the source's token budget
    is consumed (the crossing doc included), the unit real pretraining
    mixtures are specified in. The executed plan is the boundary-branch
    one (operators/sampling.py:token_budget_sample): fully-kept shards
    pass a broadcast LEFT SEMI join with NO window; only the one
    boundary shard per source pays the within-shard cumsum — no
    full-table shuffle. The oracle reproduces the selection with a
    global per-source window cumsum; fixed-width lowercase md5-hex
    order == numeric order in both engines, so membership matches
    bit-for-bit."""
    from medea_ps_spark.operators.sampling import token_budget_sample

    df = spark.read.parquet(SEQ_FIXTURE)
    budgets = {
        "web-2025": 60_000, "books": 25_000, "code": 15_000,
        "wiki": 10**9,
    }
    return token_budget_sample(df, budgets, shard_chars=2).select(
        "source", "doc_id", "n_tok"
    )


def q_text_token_stats(spark, sf_dir):
    from medea_ps_spark.functions.text import token_count

    df = _docs(spark, sf_dir)
    return df.groupBy("lang").agg(
        F.sum(token_count(F.col("text")).cast("bigint")).alias("total_tokens"),
        F.round(F.avg(token_count(F.col("text")).cast("double")), 4).alias(
            "avg_tokens"
        ),
    )


def q_text_quality(spark, sf_dir):
    from medea_ps_spark.operators.textquality import quality_features

    df = quality_features(_docs(spark, sf_dir))
    return df.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("quality_ok").cast("bigint")).alias("n_quality_ok"),
        F.round(F.avg("punct_ratio"), 6).alias("avg_punct_ratio"),
    )


def q_text_en_markers(spark, sf_dir):
    """Language-ID signal: English function-word hits vs labeled lang."""
    from medea_ps_spark.functions.text import whitespace_tokens

    df = _docs(spark, sf_dir)
    en = ["the", "and", "of", "to", "is", "that", "with", "for"]
    hits = F.size(
        F.filter(whitespace_tokens(F.lower(F.col("text"))), lambda t: t.isin(en))
    )
    return df.groupBy("lang").agg(
        F.sum(hits.cast("bigint")).alias("en_hits"),
        F.sum((hits > 0).cast("bigint")).alias("docs_with_en_hits"),
    )


# planted unicode suffixes keyed by doc_id % 6 — shared between the
# Spark query and the DuckDB twin (embedded as UTF-8 literals in the
# SQL). Covers: no-op ASCII, NFC composition (combining acute,
# dakuten), already-NFC passthrough, zero-width strip, C0-control strip.
_NORM_SUFFIXES = [
    "",
    " cafe\u0301",       # e + combining acute -> e-acute under NFC
    " caf\u00e9",        # already composed: normalization no-op
    " zero\u200bwidth",  # ZWSP stripped
    " ctrl\u0007bell",   # C0 control stripped
    " \u304b\u3099na",  # ka + dakuten -> ga under NFC
]

# RE2 twin of textnorm.CONTROL_CHARS_RE for the DuckDB oracle
_NORM_STRIP_RE2 = (
    "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F"
    "\\x{0080}-\\x{009F}\\x{200B}-\\x{200D}\\x{2060}\\x{FEFF}]"
)


def q_text_normalize(spark, sf_dir):
    """Unicode normalization under the oracle: deterministic unicode
    suffixes planted by doc_id % 6 onto the (ASCII) corpus, then the
    REAL operator — textnorm.normalize_text (control/zero-width strip
    JVM regex + NFC via the Arrow-batched pandas UDF). The DuckDB twin
    replants with the same CASE and runs regexp_replace (RE2 class
    above) + nfc_normalize, pinning the full normalized strings."""
    from medea_ps_spark.operators.textnorm import normalize_text

    df = _docs(spark, sf_dir)
    suffix = F.element_at(
        F.array(*[F.lit(s) for s in _NORM_SUFFIXES]),
        (F.col("doc_id") % 6).cast("int") + 1,
    )
    planted = df.withColumn("text", F.concat(F.col("text"), suffix))
    out = normalize_text(planted, "text", out_col="norm_text", form="NFC")
    return out.select(
        "doc_id",
        "norm_text",
        (F.col("norm_text") != F.col("text")).alias("changed"),
    )


# planted HTML wrappers keyed by doc_id % 6 — shared between the Spark
# query and the DuckDB twin (no single quotes, so they embed verbatim
# in the SQL literal). Covers: plain passthrough, full page with
# script/style/comment + title/head block breaks, inline tags,
# entity decoding (incl. the &amp;lt; single-decode trap), list-item
# breaks, and <br> variants.
_HTML_PRE = [
    "",
    "<html><head><title>Doc Title</title><script>var x = 1 < 2;"
    "</script><style>p { color: red }</style></head><body><p>",
    '<div class="main"><b>',
    "",
    "<ul><li>",
    "intro<br/>",
]
_HTML_POST = [
    "",
    "</p></body></html>",
    "</b><!-- hidden comment --></div>",
    " &amp; more &lt;i&gt;escaped&lt;/i&gt;&nbsp;end",
    "</li><li>second item</li></ul>",
    "<br>outro",
]


def q_text_extract_html(spark, sf_dir):
    """HTML → text extraction under the oracle (functions/html.py +
    operators/extract.py): deterministic markup templates planted by
    doc_id % 6 around the corpus text, then the REAL operator —
    extract_text (script/style/comment drop, block-tag → newline,
    tag strip, basic-entity decode, whitespace squeeze; every step a
    codegen JVM regex). The DuckDB twin replants with the same CASE
    and runs the identical RE2 patterns + replace chain, pinning the
    full extracted strings. Replaces the text_token_stats row —
    token counting stays pytest-covered (tests/test_text_functions.py)
    and q_text_token_stats stays callable."""
    from medea_ps_spark.operators.extract import extract_text

    df = _docs(spark, sf_dir)
    mod = (F.col("doc_id") % 6).cast("int") + 1
    pre = F.element_at(F.array(*[F.lit(s) for s in _HTML_PRE]), mod)
    post = F.element_at(F.array(*[F.lit(s) for s in _HTML_POST]), mod)
    planted = df.withColumn("html", F.concat(pre, F.col("text"), post))
    out = extract_text(planted, html_col="html", out_col="extracted")
    return out.select(
        "doc_id",
        "extracted",
        F.length("extracted").cast("int").alias("n_chars_out"),
    )


def q_text_fingerprints(spark, sf_dir):
    df = _docs(spark, sf_dir)
    return (
        DD_fingerprints(df)
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct(F.col("fingerprint")).alias("n_distinct"),
        )
    )


SAMPLE_LIMIT = 25


def q_validate_violations_sample(spark, sf_dir):
    """Bounded violation-exemplar sink over the flagship constraint set
    (validator.sample_violation_rows): at most SAMPLE_LIMIT
    deterministic md5-keyed exemplar rows per constraint, with the
    EXACT per-constraint total riding the same shuffle — the sink shape
    for 10^12-row runs where a broken rule would otherwise make the
    write cost dominate. Layout-independent by construction (content-
    based order key), which is what makes the DuckDB window-function
    oracle bit-reproducible."""
    df, compiled = _validated(spark, sf_dir)
    return V.sampled_violations(
        df, compiled, id_column="doc_id", limit=SAMPLE_LIMIT
    ).select("doc_id", "constraint_id", "observed", "rank", "n_total")


def q_events_top_users(spark, sf_dir):
    """Aggregate top-k: top-2 users by total value per event type —
    two-phase top-k (operators/topk.py) so the rank never funnels all
    (event_type, user_id) totals through one task per event type."""
    from medea_ps_spark.operators.topk import topk_per_group

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    totals = ev.groupBy("event_type", "user_id").agg(
        F.sum("value").alias("total_value")
    )
    return topk_per_group(
        totals,
        ["event_type"],
        [F.desc("total_value"), F.asc("user_id")],
        2,
    ).select(
        "event_type", "user_id",
        F.round("total_value", 2).alias("total_value"), "rank",
    )


def q_events_props_health(spark, sf_dir):
    """JSON-ingest front door: from_json with quarantine routing —
    per-event-type parse health (a malformed/non-object props value
    quarantines the row instead of failing the job)."""
    from medea_ps_spark.sources.jsonl import parse_health

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return parse_health(ev, "props", "k double", partition_col="event_type")


def q_events_user_skew(spark, sf_dir):
    """Key-skew diagnostic: top-10 heaviest user_ids with row share —
    the report that drives broadcast-vs-salted join choices."""
    from medea_ps_spark.operators.stats import skew_report

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return skew_report(ev, "user_id", top_n=10)


def q_contamination(spark, sf_dir):
    """Benchmark decontamination: training docs (doc_id ≥ 20) sharing
    any 8-gram with the 'eval set' (doc_id < 20); eval shingles
    broadcast, corpus never shuffles."""
    df = _docs(spark, sf_dir)
    ev = df.where(F.col("doc_id") < 20)
    tr = df.where((F.col("doc_id") >= 20) & (F.col("doc_id") < 400))
    out = DD.contamination_check(tr, ev, shingle_k=8)
    return out.where(F.col("contaminated")).select(
        "doc_id", "n_contaminated_shingles"
    )


def q_text_pii_scrub(spark, sf_dir):
    """PII scrub audit: deterministic PII is planted into every 7th doc
    (the synthetic corpus contains none), then detected + redacted with
    pure expressions; per-source counts prove the patterns fire and the
    redacted text differs exactly where they did."""
    from medea_ps_spark.functions.redact import scrub

    df = _docs(spark, sf_dir).withColumn(
        "text2",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 555-867-5309 from 10.0.0.1"),
            ),
        ).otherwise(F.col("text")),
    )
    out = scrub(df, "text2")
    return out.groupBy("source").agg(
        F.sum("pii_email").alias("n_emails"),
        F.sum("pii_phone").alias("n_phones"),
        F.sum("pii_ipv4").alias("n_ips"),
        F.sum((F.col("text2_redacted") != F.col("text2")).cast("bigint")).alias(
            "n_docs_redacted"
        ),
    )


def q_corpus_clean(spark, sf_dir):
    """Corpus-cleaning composition (exact dedup → quality filter) with
    full SQL oracle — per-stage survivor counts. (The near-dup stage is
    xxhash-seeded and certified separately.)"""
    from medea_ps_spark.operators.dedup import dedup_exact
    from medea_ps_spark.operators.textquality import quality_features

    df = _docs(spark, sf_dir)
    n_input = df.select(F.count(F.lit(1)).alias("x"))
    deduped = dedup_exact(df, "text", "doc_id")
    quality = quality_features(deduped).where(F.col("quality_ok"))
    return (
        n_input.crossJoin(
            deduped.select(F.count(F.lit(1)).alias("n_after_dedup"))
        )
        .crossJoin(quality.select(F.count(F.lit(1)).alias("n_after_quality")))
        .select(
            F.col("x").alias("n_input"), "n_after_dedup", "n_after_quality"
        )
    )


def q_lineitem_pricing(spark, sf_dir):
    """TPC-H Q1-style rollup — engine breadth + bench headline."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_orders_by_segment(spark, sf_dir):
    """Broadcast join breadth: orders × customer revenue by segment."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


def q_table_diff(spark, sf_dir):
    """Snapshot reconciliation (operators/tablediff.py): diff the orders
    table against a deterministically perturbed next-day snapshot —
    %97 keys deleted, %89 priorities rewritten, %91 statuses rewritten,
    %101 keys re-ingested under shifted ids — and emit the per-key
    change verdicts with the sorted changed-column list."""
    from medea_ps_spark.operators.tablediff import table_diff

    old = spark.read.parquet(f"{sf_dir}/orders.parquet")
    new = (
        old.where(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_orderpriority",
            F.when(
                F.col("o_orderkey") % 89 == 0,
                F.concat(F.lit("X-"), F.col("o_orderpriority")),
            ).otherwise(F.col("o_orderpriority")),
        )
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 91 == 0, F.lit("X")).otherwise(
                F.col("o_orderstatus")
            ),
        )
        .unionByName(
            old.where(F.col("o_orderkey") % 101 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(1000000000)
            )
        )
    )
    return table_diff(
        old,
        new,
        ["o_orderkey"],
        ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
         "o_orderpriority"],
    )


def q_quality_model(spark, sf_dir):
    """Hashed-feature linear quality classifier
    (operators/qualitymodel.py): fastText-style unigram+bigram hashing
    scorer over documents — exact integer milli-unit weights/sums so the
    verdicts reproduce bit-identically in the SQL oracle."""
    from medea_ps_spark.operators.qualitymodel import quality_score

    df = _docs(spark, sf_dir)
    out = quality_score(df, "text", "doc_id", threshold_milli=0)
    return out.select(
        "doc_id",
        F.col("n_features").cast("bigint").alias("n_features"),
        "score_milli",
        "quality_label",
    )


def q_text_lm_score(spark, sf_dir):
    """Unigram + interpolated-bigram LM quality scoring
    (operators/lmscore.py) — the perplexity-proxy filter of
    CCNet-style pipelines, self-scored over the documents corpus.
    Round-5 session 12 folded the new order-2 scorer INTO this row
    (same composition pattern as token_span_dedup): both scorers run
    side by side and the DuckDB twin reproduces the transition
    extraction (zip of adjacent slices), the per-context proper
    distribution, and the lam-interpolated probability term-for-term.
    Laplace-smoothed bits/token + ppl are exact rationals through
    log2/avg, so both scorers reproduce in DuckDB to 4 decimals.
    Docs with < 2 terms have no transitions: NULL bigram columns."""
    from medea_ps_spark.operators.lmscore import (
        bigram_lm_scores,
        unigram_lm_scores,
    )

    df = fan_out(_docs(spark, sf_dir), min_bytes=_FAN_MIN_BYTES)
    uni = unigram_lm_scores(df, "text", "doc_id", alpha=1.0)
    bi = bigram_lm_scores(
        df, "text", "doc_id", alpha=1.0, lam=0.75
    ).select(
        "doc_id",
        "n_transitions",
        F.round("bits_per_token", 4).alias("bi_bits_per_token"),
        F.round("ppl", 3).alias("bi_ppl"),
    )
    return uni.join(bi, on="doc_id", how="left").select(
        "doc_id", "n_tokens",
        F.round("bits_per_token", 4).alias("bits_per_token"),
        F.round("ppl", 3).alias("ppl"),
        "n_transitions", "bi_bits_per_token", "bi_ppl",
    )


_DSIR_SEED = 11
_DSIR_K = 100


def q_dsir_resample(spark, sf_dir):
    """DSIR importance resampling (operators/dsir.py; Xie et al.
    NeurIPS 2023): the k=100 documents Gumbel-top-k-sampled without
    replacement ∝ exp(log-likelihood ratio) toward an English target
    profile (lang='en') under the engine's unigram machinery. The
    Gumbel draw is the house md5 60-bit-lane uniform, so selection is
    deterministic and the DuckDB twin reproduces profile, ratio, draw,
    and rank term-for-term. Folds events_top_users (r5 s9): the
    two-phase top-k primitive this selection runs on is the same
    operator (operators/topk.py), still plan-gated by
    test_plan_quality.py::test_events_top_users_is_two_phase_topk and
    exercised grouped by events_user_skew/ann_* rows."""
    from medea_ps_spark.operators.dsir import dsir_resample

    docs = _docs(spark, sf_dir)
    target = docs.where(F.col("lang") == "en")
    out = dsir_resample(
        docs, target, k=_DSIR_K, seed=_DSIR_SEED, text_col="text",
        id_col="doc_id",
    )
    return out.select(
        "rank", "doc_id", "n_tokens",
        F.round("log_ratio", 6).alias("log_ratio"),
    )


# Committed BASELINE-shaped fixture (scripts/make_seq_fixture.py):
# 20k rows, seed 42, max_len 128, every seeded violation class present.
# A single parquet FILE so Spark and the DuckDB oracle read the exact
# same bytes — this is what makes the hot path oracle-checkable.
SEQ_FIXTURE = "/root/repo/tests/fixtures/sequences_small.parquet"
SEQ_FIXTURE_MAX_LEN = 128

from medea_ps_spark.sources.synthetic import ALLOWED_SOURCES as _SEQ_SOURCES

_SEQ_SRC_LIST = ",".join(f"'{s}'" for s in _SEQ_SOURCES)


def q_seq_validation(spark, sf_dir):
    """The BASELINE.json hot path — per-source pass/fail verdicts over
    the committed tokenized-sequence fixture, full row-constraint set
    (NotNull, SizeEquals, InRange, ElementsInRange, ArrayLenBetween)."""
    from medea_ps_spark.sources import synthetic
    from medea_ps_spark.jobs.validate_job import build_registry

    df = spark.read.parquet(SEQ_FIXTURE)
    compiled = build_registry(
        synthetic.VOCAB, SEQ_FIXTURE_MAX_LEN, synthetic.ALLOWED_SOURCES
    ).compile(df.schema)
    validated = V.validate(df, compiled)
    return V.partition_verdicts(validated, "source").select(
        "source", "n_rows", "n_passed", "n_failed", "n_violations",
        "partition_passed",
    )


def q_seq_token_histogram(spark, sf_dir):
    """Token-VALUE distribution sketch over the sequence fixture —
    explode pipelined into a partial agg (shuffle = nbuckets rows/task)."""
    from medea_ps_spark.operators.sketches import token_histogram
    from medea_ps_spark.sources import synthetic

    df = spark.read.parquet(SEQ_FIXTURE)
    return token_histogram(df, "tokens", vocab=synthetic.VOCAB, nbuckets=32)


def q_token_contamination(spark, sf_dir):
    """Token-native GPT-3-Appendix-A decontamination over the sequence
    fixture (operators/tokenops.py): the 'benchmark' set is the 8-token
    slice (positions 3..10) of every row whose md5(doc_id) starts '00'
    (deterministic ~1/256 sample; md5 is bit-identical in Spark and
    DuckDB — the house oracle trick); flagged rows are the leaked
    originals. The eval shingle set is broadcast, so the corpus side
    never shuffles before the per-doc hit count (plan-gated in
    test_tokenops)."""
    from medea_ps_spark.operators.tokenops import token_contamination

    df = fan_out(spark.read.parquet(SEQ_FIXTURE))
    ev = df.where(
        F.md5("doc_id").like("00%") & (F.size("tokens") >= 10)
    ).select(F.slice("tokens", 3, 8).alias("tokens"))
    return (
        token_contamination(df, ev, k=8)
        .where(F.col("contaminated"))
        .select("doc_id", "source", "n_contaminated_shingles")
    )


def q_token_span_dedup(spark, sf_dir):
    """Token-native ExactSubstr dedup END TO END (Lee et al. ACL 2022;
    operators/tokenops.dedup_token_spans): detect duplicated 8-gram
    spans, exempt each gram's corpus-first occurrence (min (doc_id,
    pos)), DELETE the excess spans from the token arrays — detection,
    keep-first exemption, islands merge and the expression-only rewrite
    all under one oracle. Corpus = the sequence fixture restricted to
    unique doc_ids (the fixture's id dups carry different arrays, which
    makes pooled-span removal ill-defined) plus a deterministically
    planted duplicated slice (md5(doc_id) LIKE '0%' rows re-id'd
    '~dup'). Emits every row's post-dedup length, removed count and an
    md5 of the rewritten array, pinning exact content. Replaces the
    r5-s6 `token_dup_spans` detection-stats row — detection keeps its
    DuckDB parity check in tests/test_tokenops.py and still executes
    inside this query."""
    from pyspark.sql import Window

    from medea_ps_spark.operators.tokenops import dedup_token_spans

    base = spark.read.parquet(SEQ_FIXTURE)
    uniq = (
        base.withColumn(
            "_c", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
        )
        .where(F.col("_c") == 1)
        .select("doc_id", "tokens")
    )
    planted = uniq.where(
        F.md5("doc_id").like("0%") & (F.size("tokens") >= 8)
    ).withColumn("doc_id", F.concat("doc_id", F.lit("~dup")))
    corpus = uniq.unionByName(planted)
    out = dedup_token_spans(corpus, k=8, n_tok_col=None)
    return out.select(
        "doc_id",
        F.coalesce(F.size("tokens"), F.lit(0)).cast("int").alias("n_tok_after"),
        F.col("removed_tokens"),
        F.md5(
            F.concat_ws(",", F.col("tokens").cast("array<string>"))
        ).alias("tok_md5"),
    )


def q_vocab_truncate(spark, sf_dir):
    """Vocabulary truncation / OOV remap (operators/oov.py) over the
    sequence fixture: corpus top-20000 token ids by the deterministic
    (count desc, token asc) total order — the fixture's near-uniform
    counts make the K-boundary tie-heavy, so the total order IS the
    thing under test — every other occurrence rewritten to the unk id
    in ONE broadcast-mask mapInPandas pass (no join, no shuffle).
    Emits an md5 pin of each rewritten array plus the per-row OOV
    count; the DuckDB twin recomputes the top-K and maps via a
    LEFT JOIN over lateral-unnested positions. Replaces the
    events_user_skew row — skew_report stays pytest-covered
    (tests/test_text_functions.py) and q_events_user_skew stays
    callable."""
    from medea_ps_spark.operators.oov import vocab_truncate

    df = spark.read.parquet(SEQ_FIXTURE)
    out = vocab_truncate(
        df, k=20000, unk_id=-999999, out_col="tokens_trunc"
    )
    return out.select(
        "doc_id",
        "source",
        F.when(F.col("tokens_trunc").isNull(), F.lit(None).cast("string"))
        .otherwise(
            F.md5(
                F.concat_ws(",", F.col("tokens_trunc").cast("array<string>"))
            )
        )
        .alias("tok_md5"),
        F.col("n_oov").cast("int").alias("n_oov"),
    )


def q_quantiles_tdigest(spark, sf_dir):
    """t-digest quantiles, driver-visible: per-source digests merged and
    queried, then CHECKED — for each p the estimate's empirical rank
    must sit within 0.02 of p (the t-digest guarantee at compression
    200), alongside the exact percentile for value comparison. A broken
    digest flips rank_ok and fails the driver hash."""
    from medea_ps_spark.operators.sketches import quantiles

    ps = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    df = _docs(spark, sf_dir)
    est = quantiles(df, "n_chars", ps, partition_col="source", compression=200)
    col = F.col("n_chars").cast("double")
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, (p, e) in enumerate(est):
        aggs.append(
            F.sum((col <= F.lit(float(e))).cast("bigint")).alias(f"le_{i}")
        )
        aggs.append(F.percentile(col, F.lit(p)).alias(f"ex_{i}"))
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"CAST({p}D AS DOUBLE), round(ex_{i}, 4), "
        f"abs(le_{i} / CAST(n AS DOUBLE) - {p}D) <= 0.02D"
        for i, (p, _) in enumerate(est)
    )
    return wide.selectExpr(
        f"stack({len(est)}, {stack}) AS (p, q_exact, rank_ok)"
    )


# quantile-drift reference profile: values chosen with wide margins
# around the synthetic documents table's stable n_chars quantiles
# (~176/300/419/490 at every SF) so the drift verdicts are robust to
# t-digest estimation error: 0.25/0.5 are clear non-drifts, 0.75/0.9
# clear drifts at rel_tolerance=0.25.
_QDRIFT_REF = {0.25: 180.0, 0.5: 300.0, 0.75: 280.0, 0.9: 700.0}
_QDRIFT_TOL = 0.25


def q_quantile_drift(spark, sf_dir):
    """drift.quantile_drift driver-visible (VERDICT r2 item 7): the
    t-digest quantile-shift monitor runs against a fixed reference
    profile, then each verdict row is CHECKED two ways — rank_ok ties
    the t-digest estimate to the data (empirical rank within 0.02 of p),
    and drifted must match the oracle's exact-quantile drift decision."""
    from medea_ps_spark.operators.drift import quantile_drift

    df = _docs(spark, sf_dir)
    rep = quantile_drift(
        df, _QDRIFT_REF, "n_chars", rel_tolerance=_QDRIFT_TOL
    )
    col = F.col("n_chars").cast("double")
    items = sorted(_QDRIFT_REF.items())
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, (p, _ref) in enumerate(items):
        obs = rep["quantiles"][p]["observed"]
        aggs.append(
            F.sum((col <= F.lit(float(obs))).cast("bigint")).alias(f"le_{i}")
        )
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"CAST({p}D AS DOUBLE), CAST({ref}D AS DOUBLE), "
        f"abs(le_{i} / CAST(n AS DOUBLE) - {p}D) <= 0.02D, "
        f"{str(rep['quantiles'][p]['rel_change'] > _QDRIFT_TOL).upper()}"
        for i, (p, ref) in enumerate(items)
    )
    return wide.selectExpr(
        f"stack({len(items)}, {stack}) AS (p, ref, rank_ok, drifted)"
    )


def q_text_repetition(spark, sf_dir):
    """Gopher-style repetition signals (dup word / dup bigram fraction)
    per document — pure array expressions, no UDF."""
    from medea_ps_spark.operators.textquality import repetition_features

    df = repetition_features(_docs(spark, sf_dir))
    return df.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.round("dup_word_frac", 6).alias("dup_word_frac"),
        F.round("dup_bigram_frac", 6).alias("dup_bigram_frac"),
    )


# deterministic-sampling query params (shared with the oracles)
_MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
_MIX_DEFAULT = 0.1
_MIX_SEED = 7
_SPLIT_FRAC = 0.05
_SPLIT_SEED = 11


def q_mixture_sample(spark, sf_dir):
    """Deterministic domain-mixing sampler: per-source keep rates as a
    pure hash predicate (md5-hex threshold — layout/cluster-size
    independent, SQL-oracle-able). Verified by per-source count + key
    checksum of the SELECTED SET, not just its size."""
    from medea_ps_spark.operators.sampling import stratified_mixture

    df = _docs(spark, sf_dir)
    samp = stratified_mixture(
        df, _MIX_RATES, "source", "doc_id",
        seed=_MIX_SEED, default_rate=_MIX_DEFAULT,
    )
    return samp.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("doc_id").alias("sum_doc_id"),
    )


_EST_FRAC = 0.5
_EST_SEED = 13
_EST_Z = 1.96
_EST_Z2 = _EST_Z * _EST_Z  # embedded via repr on BOTH sides — same double


def q_validate_estimate(spark, sf_dir):
    """Sampled (approximate) validation: per-row-constraint violation
    counts and Wilson 95% intervals estimated from a deterministic md5
    hash sample of the flagship corpus (operators/estimate.py) — one
    sampled scan, one hash aggregate, CI math as Column expressions.
    Table-level constraints (source_known, doc_id_unique) are skipped
    by design (a sampled uniqueness rate is birthday-biased) and keep
    their own driver rows. Folds mixture_sample (r5 s8): membership
    here is decided by the SAME sampling.keep_predicate md5-hex
    coordinate, so the house deterministic-sampling trick stays
    oracle-verified end-to-end; the stratified per-source mixture path
    keeps its coverage in test_sampling_packing.py."""
    from medea_ps_spark.operators.estimate import estimated_violation_rates

    df, compiled = _validated(spark, sf_dir)
    est = estimated_violation_rates(
        df, compiled, _EST_FRAC, key_col="doc_id", seed=_EST_SEED,
        z=_EST_Z, on_table_constraints="ignore",
    )
    return est.select(
        "constraint_id", "n_sampled", "n_violations",
        F.round("est_rate", 6).alias("est_rate"),
        F.round("ci_lo", 6).alias("ci_lo"),
        F.round("ci_hi", 6).alias("ci_hi"),
    )


def q_sample_split(spark, sf_dir):
    """Deterministic train/holdout split: disjoint + exhaustive by
    construction; the checksum proves both sides agree on MEMBERSHIP."""
    from medea_ps_spark.operators.sampling import train_holdout_split

    df = _docs(spark, sf_dir)
    train, hold = train_holdout_split(
        df, holdout_frac=_SPLIT_FRAC, key_col="doc_id", seed=_SPLIT_SEED
    )
    return (
        train.select(F.lit("train").alias("split"), "doc_id")
        .unionByName(hold.select(F.lit("holdout").alias("split"), "doc_id"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("doc_id").alias("sum_doc_id"),
        )
    )


def q_fd_check(spark, sf_dir):
    """Functional-dependency constraint (shard → label) over customer
    with planted mislabels (c_custkey % 911 == 0 rows get label 'XX'):
    the violating groups are exactly the shards containing a planted
    row, and EVERY member row of those shards is emitted. EXECUTES
    plans.constraints.FunctionalDependency via validator.fd_violations
    (one determinant-key hash agg with a null-safe distinct dependent
    count, violating groups joined back null-safely)."""
    from medea_ps_spark.operators import validator as VV
    from medea_ps_spark.plans.constraints import FunctionalDependency

    df = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(
            F.col("c_custkey").cast("long").alias("id"),
            (F.col("c_custkey") % 300).cast("long").alias("shard"),
        )
        .withColumn(
            "label",
            F.when(F.col("id") % 911 == 0, F.lit("XX")).otherwise(
                F.substring(F.md5(F.col("shard").cast("string")), 1, 4)
            ),
        )
    )
    c = FunctionalDependency(
        "shard_label_fd", determinants=("shard",), dependent="label"
    )
    return VV.fd_violations(df, c, id_column="id")


def q_seq_packing(spark, sf_dir):
    """Concat-then-chunk sequence packing over the committed fixture:
    md5-ordered shard-local running sums cut the token stream into
    8192-token chunks; the rollup (per-chunk doc count + token count)
    pins the full assignment against the DuckDB window oracle."""
    from medea_ps_spark.operators.packing import pack_assignments, pack_summary

    df = spark.read.parquet(SEQ_FIXTURE).where(
        F.col("doc_id").isNotNull() & F.col("n_tok").isNotNull()
    )
    asg = pack_assignments(
        df, max_tokens=8192, id_col="doc_id", n_tok_col="n_tok",
        strat_cols=("source",), shard_chars=1, seed=42,
    )
    return pack_summary(asg, strat_cols=("source",)).select(
        "source", "shard", "pack_id", "n_docs", "pack_tokens"
    )


def q_events_asof(spark, sf_dir):
    """Point-in-time join: each click event gets the value of the
    user's latest view event at-or-before the click — the as-of
    operator Spark lacks natively, verified against DuckDB's built-in
    ASOF JOIN. Runs the SALTED implementation (asof.py:asof_join_salted,
    bit-identical to asof_join by test) so the hot-key-safe path — the
    one a 100-TB run would use — is what the driver oracle certifies
    (VERDICT r4 #2); 1-day time buckets spread any celebrity key."""
    from medea_ps_spark.operators.asof import asof_join_salted

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    # pre-reduce views to ONE row per (user_id, ts) — arg-max by
    # event_id — because DuckDB's ASOF JOIN makes an unspecified choice
    # among tied right rows; reducing identically on both sides pins
    # the tie semantics (ADVICE r3)
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("value"))
    )
    out = asof_join_salted(clicks, views, ["user_id"], "ts", ["value"],
                           bucket_width_us=86_400 * 1_000_000,
                           suffix="_view")
    return out.select(
        "event_id", "user_id",
        F.round("value", 2).alias("value"),
        F.round("value_view", 2).alias("view_value"),
    )


def q_events_sessions_detail(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) + per-session
    rollup via operators/sessions.py — one row per session with exact
    integer-µs bounds/durations (this subsumes round 2's summary-level
    ``events_sessions``, folded here for the driver's 50-row cap)."""
    from medea_ps_spark.operators.sessions import (
        session_stats, sessionize_salted,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # the SALTED implementation (sessions.py:sessionize_salted,
    # bit-identical to sessionize by test) carries the driver oracle
    # for the hot-key-safe path a 100-TB run would use (VERDICT r4 #2)
    sess = sessionize_salted(ev, gap_seconds=1800, key_cols=("user_id",))
    return session_stats(sess, key_cols=("user_id",)).select(
        "user_id", "session_id", "start_us", "duration_us", "n_events",
        F.round("value_sum", 2).alias("value_sum"),
    )


# fixed literal maintenance windows over January 2024 (epoch micros) —
# identical VALUES list on the oracle side, no engine time functions
_RJ_BASE = 1_704_067_200  # 2024-01-01T00:00:00Z
_RJ_WINDOWS = [
    (
        i,
        (_RJ_BASE + i * 3 * 86_400) * 1_000_000,
        (_RJ_BASE + i * 3 * 86_400 + (i + 1) * 6 * 3_600) * 1_000_000,
    )
    for i in range(10)
]


def q_events_in_windows(spark, sf_dir):
    """Bucketed range join (operators/rangejoin.py): events matched to
    the literal maintenance windows containing their timestamp — an
    equi-join on quantized buckets + exact containment filter, never a
    BroadcastNestedLoopJoin. Oracle: plain BETWEEN join."""
    from medea_ps_spark.operators.rangejoin import point_in_interval_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    iv = spark.createDataFrame(
        _RJ_WINDOWS, "window_id int, start_us bigint, end_us bigint"
    )
    j = point_in_interval_join(
        ev, iv, "ts_us", "start_us", "end_us",
        bucket_width=6 * 3_600 * 1_000_000,
    )
    return j.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 2).alias("value_sum"),
    )


def q_events_rollup(spark, sf_dir):
    """Hypertable-style continuous aggregate: hour→day→total event
    rollups from ONE grouping-set pass (operators/rollup.py), verified
    against DuckDB's ROLLUP."""
    from medea_ps_spark.operators.rollup import time_rollup

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = time_rollup(ev, ts_col="ts", value_col="value")
    return out.select(
        "day_us", "hour_us", "grain", "n_events",
        F.round("value_sum", 2).alias("value_sum"),
    )


def q_kmv_distinct(spark, sf_dir):
    """KMV distinct sketch (operators/sketches.py): deterministic
    md5-based k-minimum-values estimator — the sketch state AND the
    estimate reproduce exactly in DuckDB (HLL registers cannot), and
    the row checks the estimate against the exact distinct count."""
    from medea_ps_spark.operators.sketches import kmv_distinct_estimate

    df = _docs(spark, sf_dir)
    est = kmv_distinct_estimate(df, "doc_id", k=256)
    exact = df.where(F.col("doc_id").isNotNull()).agg(
        F.countDistinct("doc_id").alias("exact_distinct")
    )
    return est.crossJoin(exact).select(
        "k", "kth_hex", "est_distinct", "exact_distinct",
        (
            F.abs(F.col("est_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            < 0.2
        ).alias("rel_ok"),
    )


def q_seq_unique_violations(spark, sf_dir):
    """Table-level uniqueness over the sequence fixture (seeded ~0.1%
    duplicate doc_ids): groupBy dup-key extraction + broadcast-back."""
    from medea_ps_spark.plans.constraints import Unique

    df = spark.read.parquet(SEQ_FIXTURE)
    out = V.unique_violations(df, Unique("doc_id_unique", "doc_id"), "doc_id")
    return out.select("doc_id", "observed")


def q_seq_referential_violations(spark, sf_dir):
    """Referential check of the fixture's source column against the
    allowed-sources dimension (broadcast anti-join; seeded ~0.1%
    unknown-source rows)."""
    from medea_ps_spark.plans.constraints import ReferentialIn
    from medea_ps_spark.sources import synthetic

    df = spark.read.parquet(SEQ_FIXTURE)
    c = ReferentialIn("source_known", "source",
                      dim_values=synthetic.ALLOWED_SOURCES)
    return V.referential_violations(df, c, "doc_id").select(
        "doc_id", "observed"
    )


def q_dedup_cluster_canon(spark, sf_dir):
    """Near-dup clustering, driver-visible: exact n-gram Jaccard pairs →
    connected components (iterative min-label propagation + pointer
    doubling) → (node, component). Oracle: DuckDB recursive-CTE
    transitive closure over the SAME pair graph."""
    from medea_ps_spark.operators.dedup_cluster import connected_components

    df = _docs(spark, sf_dir).where(F.col("doc_id") < 200)
    pairs = DD.ngram_jaccard_pairs(df, "text", "doc_id", shingle_k=3,
                                   threshold=0.03)
    return connected_components(pairs).select("node", "component")


def q_stats_bounds(spark, sf_dir):
    """StatsBound partition verdicts: every bound evaluated in ONE
    grouped aggregate pass, exploded to (source, constraint, observed,
    passed) rows."""
    from medea_ps_spark.operators.stats import stats_bound_verdicts
    from medea_ps_spark.plans.constraints import StatsBound

    bounds = [
        StatsBound("n_chars_min_ok", "n_chars", agg="min", lo=1),
        StatsBound("n_chars_avg_band", "n_chars", agg="avg", lo=100, hi=250),
        StatsBound("doc_id_null_rate", "doc_id", agg="null_rate", hi=0.0),
    ]
    df = _docs(spark, sf_dir)
    out = stats_bound_verdicts(df, bounds, partition_col="source")
    return out.select(
        "source", "constraint_id",
        F.round(F.col("observed"), 6).alias("observed"), "passed",
    )


def q_referential_salted(spark, sf_dir):
    """The SKEW path of the referential check: salted shuffle anti-join
    (shuffle_hash hint, dim exploded ×salt) — must emit exactly the same
    violation rows as the broadcast path's oracle."""
    from medea_ps_spark.operators.referential import salted_anti_join

    df = _docs(spark, sf_dir)
    dim = spark.createDataFrame([(s,) for s in ALLOWED_SRC], "source string")
    bad = salted_anti_join(
        df, dim, "source", id_column="doc_id", salt_buckets=8,
        force_shuffle=True,
    )
    return bad.select(
        "doc_id",
        F.coalesce(F.col("source").cast("string"), F.lit("null")).alias(
            "observed"
        ),
    )


def q_source_vocab_overlap(spark, sf_dir):
    """Cross-source token-vocabulary Jaccard via per-source KMV
    sketches and the k-minima union estimator (Beyer et al. SIGMOD'07):
    the corpus is scanned once (explode -> map-side partial distinct ->
    two-phase per-group top-k), every later stage runs over
    |sources| x k rows. Deterministic md5 hashing (the round-2 trick)
    makes the WHOLE estimator reproducible in the DuckDB oracle —
    exact Jaccard whenever a source's vocabulary is under k.
    operators/vocab.py."""
    from medea_ps_spark.operators.vocab import (
        kmv_jaccard_pairs,
        token_vocab_minima,
    )

    df = spark.read.parquet(SEQ_FIXTURE)
    minima = token_vocab_minima(df, "tokens", "source", k=100)
    return kmv_jaccard_pairs(minima, "source", k=100)


def q_source_divergence(spark, sf_dir):
    """Pairwise Jensen-Shannon divergence between the sources' token
    distributions (mixture-design complement of the profile-based
    chi2/KS/PSI drift rows): one corpus scan into (source, bucket)
    partial-agg counts, then an O(|sources|^2 x buckets) pair stage
    over that bounded relation — pure JVM aggregates, reproduced
    term-for-term by the oracle. operators/divergence.py."""
    from medea_ps_spark.operators.divergence import source_divergence_matrix

    df = spark.read.parquet(SEQ_FIXTURE)
    return source_divergence_matrix(
        df, "tokens", "source", n_buckets=128
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """50 entries — the driver's CORRECTNESS harness records at most 50
    rows (r03 recorded exactly the first 50 of 54), so four twins were
    folded into their siblings (VERDICT r3 #1): ann_ivf_fullprobe (==
    ann_topk SQL; fullprobe==exact asserted in test_ivf_topk_recall),
    events_sessions / events_hourly (strictly weaker summaries of
    events_sessions_detail / events_rollup), unique_violations (0-row
    documents twin of the seeded seq_unique_violations). The round-3
    additions sit in the first half so a cap can never drop them.

    Round 5 folded three more grouping/composition twins to make room
    for three new first-class operators at the same slots:
    histogram_n_chars → (seq_token_histogram keeps the histogram
    signal; q_histogram_n_chars stays for the plan-quality test),
    drift_chi2_by_source → (drift_chi2 + ks_stat keep the drift
    signal; the per-partition grouping stays pytest-covered), and
    quantile_drift → (quantiles_tdigest keeps the t-digest signal;
    drift.quantile_drift stays covered by test_cluster_pipeline). The
    newcomers: table_diff (snapshot reconciliation), quality_model
    (hashed-feature linear classifier), dedup_incremental
    (batch-vs-corpus steady-state dedup).

    Round-5 session 3 folded sample_split → mixture_sample (the split
    is the complementary threshold range of the SAME md5 coordinate
    mixture_sample verifies; disjoint/exhaustive/stability stay in
    test_sampling_packing.py) to make room for fd_check — the new
    FunctionalDependency table-level constraint under the oracle.

    Round-5 session 6 folded the two generic TPC-H breadth demos
    (lineitem_pricing, orders_by_segment — tied to no SURVEY §2 row;
    the functions stay, orders_by_segment keeps its broadcast plan
    gate in test_plan_quality) to make room for the token-id-native
    operators on the north-rule payload: token_contamination (GPT-3
    App.-A decontamination on token 8-grams) and token_dup_spans
    (Lee-et-al. ExactSubstr span coverage on token ids).

    Round-5 session 7 folded array_ops_check (array-length/element
    semantics remain driver-covered by seq_validation and the
    tokens-in-vocab rows, and pytest-covered in the conformance suite)
    to make room for validate_violations_sample — the bounded
    violation-exemplar sink (capped md5-keyed exemplars + exact
    per-constraint totals in one shuffle) under the oracle.

    Round-5 session 11 upgraded token_dup_spans → token_span_dedup:
    the detection-stats row became the full keep-first ExactSubstr
    DEDUP (detection + corpus-first exemption + islands merge + the
    expression-only array rewrite, operators/tokenops.py) — detection
    still executes inside the query and keeps its own DuckDB parity
    test in test_tokenops.py.

    Round-5 session 8 folded mixture_sample → validate_estimate: the
    estimator's sample membership is the SAME keep_predicate md5-hex
    coordinate mixture_sample verified, so the deterministic-sampling
    trick stays under the oracle, now composed with the validator and
    Wilson-interval Column math; the stratified per-source mixture
    stays covered by test_sampling_packing.py.

    Round-5 session 9 folded events_top_users → dsir_resample: both
    run the SAME two-phase top-k primitive (operators/topk.py — the
    grouped plan gate test_events_top_users_is_two_phase_topk still
    calls q_events_top_users directly), and dsir_resample additionally
    puts the unigram-profile ratio weighting and the md5-lane Gumbel
    draw under the oracle.

    Round-5 session 13 folded embedding_dedup_clusters →
    token_budget_sample: the CC clustering it exercised stays
    driver-covered by dedup_cluster_canon (same pointer-doubling
    operator) and the cosine pair source by embedding_near_dups;
    the composition itself stays covered by test_semdedup /
    test_dedup_cluster (q_embedding_dedup_clusters remains callable).
    The incoming row puts the token-budget mixture sampler's sharded
    prefix-sum selection under the oracle.

    Round-5 session 14 folded text_en_markers → text_normalize: the
    English-marker counting stays pytest-covered via
    textquality.language_scores (test_dedup_similarity_text.py::
    test_language_scores uses the same function-word hit expressions;
    q_text_en_markers remains callable). The incoming row plants
    deterministic unicode suffixes (doc_id % 6: decomposed accent,
    composed no-op, zero-width, C0 control, dakuten) and runs the REAL
    textnorm.normalize_text operator (JVM strip + Arrow NFC UDF)
    against a DuckDB regexp_replace + nfc_normalize twin that pins the
    full normalized strings.

    Round-5 session 15 folded two cross-table twins for two new
    cross-source operators: seq_referential_violations →
    source_vocab_overlap (the referential check stays driver-covered
    by referential_violations + referential_salted on documents and
    inside seq_validation's source gate; q_ stays callable) and
    seq_token_histogram → source_divergence (token bucketing is a
    strict subset of divergence.token_bucket_counts, and the histogram
    signal stays driver-covered by histogram paths in drift_chi2 /
    quantiles_tdigest; q_ stays callable). The newcomers put the KMV
    k-minima-union vocabulary Jaccard (operators/vocab.py) and the
    pairwise token-distribution JSD matrix (operators/divergence.py)
    under the oracle.

    Round-5 session 16 folded two diagnostics for two new pipeline
    stages: text_token_stats → text_extract_html (token counting
    stays pytest-covered in tests/test_text_functions.py and inside
    the text_quality row's stats; q_ stays callable) and
    events_user_skew → vocab_truncate (skew_report keeps its own
    pytest coverage incl. tie determinism; the two-phase top-k
    primitive it demos stays driver-covered via dsir_resample). The
    newcomers put HTML → text extraction (functions/html.py RE2-safe
    regex chain + entity decode, planted-markup oracle pinning full
    extracted strings) and vocabulary truncation / OOV remap
    (operators/oov.py broadcast-mask rewrite with the deterministic
    (count desc, token asc) top-K boundary) under the oracle."""
    return {
        "validate_violations": q_validate_violations,
        "validate_verdicts": q_validate_verdicts,
        "partition_stats": q_partition_stats,
        "referential_violations": q_referential_violations,
        "referential_salted": q_referential_salted,
        "dedup_incremental": q_dedup_incremental,
        "drift_chi2": q_drift_chi2,
        "table_diff": q_table_diff,
        "ks_stat": q_ks_stat,
        "medea_validate_events": q_medea_validate_events,
        "events_in_windows": q_events_in_windows,
        "kmv_distinct": q_kmv_distinct,
        "events_rollup": q_events_rollup,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "ann_topk": q_ann_topk,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "embedding_near_dups": q_embedding_near_dups,
        "token_budget_sample": q_token_budget_sample,
        "text_extract_html": q_text_extract_html,
        "text_quality": q_text_quality,
        "text_normalize": q_text_normalize,
        "text_fingerprints": q_text_fingerprints,
        "corpus_clean": q_corpus_clean,
        "contamination": q_contamination,
        "text_pii_scrub": q_text_pii_scrub,
        "validate_violations_sample": q_validate_violations_sample,
        "dsir_resample": q_dsir_resample,
        "events_props_health": q_events_props_health,
        "vocab_truncate": q_vocab_truncate,
        "token_contamination": q_token_contamination,
        "token_span_dedup": q_token_span_dedup,
        "text_lm_score": q_text_lm_score,
        "seq_validation": q_seq_validation,
        "source_divergence": q_source_divergence,
        "seq_unique_violations": q_seq_unique_violations,
        "source_vocab_overlap": q_source_vocab_overlap,
        "dedup_cluster_canon": q_dedup_cluster_canon,
        "stats_bounds": q_stats_bounds,
        "quantiles_tdigest": q_quantiles_tdigest,
        "quality_model": q_quality_model,
        "text_repetition": q_text_repetition,
        "validate_estimate": q_validate_estimate,
        "fd_check": q_fd_check,
        "seq_packing": q_seq_packing,
        "events_asof": q_events_asof,
        "events_sessions_detail": q_events_sessions_detail,
    }


# ---------------------------------------------------------------------------
# oracles (DuckDB SQL on the same parquet views)
# ---------------------------------------------------------------------------

_NORM = "regexp_replace(lower(text), '\\s+', ' ', 'g')"
_FP = f"md5(trim({_NORM}))"
_TOKS = "string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')"
_NTOK = f"(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_TOKS}) END)"

_VIOL_SQL = f"""
SELECT doc_id, 'doc_id_not_null' AS constraint_id, 'null' AS observed
  FROM documents WHERE doc_id IS NULL
UNION ALL
SELECT doc_id, 'n_chars_consistent',
       concat(CAST(n_chars AS VARCHAR), ' != ', CAST(length(text) AS VARCHAR))
  FROM documents WHERE NOT coalesce(n_chars = length(text), TRUE)
UNION ALL
SELECT doc_id, 'n_chars_bounds', CAST(n_chars AS VARCHAR)
  FROM documents WHERE NOT coalesce({_P_NCHARS}, TRUE)
UNION ALL
SELECT doc_id, 'lang_allowed', CAST(lang AS VARCHAR)
  FROM documents WHERE NOT coalesce({_P_LANG}, TRUE)
UNION ALL
SELECT doc_id, 'source_format', CAST(source AS VARCHAR)
  FROM documents WHERE NOT coalesce({_P_SRC_FMT}, TRUE)
UNION ALL
SELECT doc_id, 'zh_n_chars_cap', CAST(n_chars AS VARCHAR)
  FROM documents WHERE {_P_ZH_FAIL}
UNION ALL
SELECT doc_id, 'source_known', coalesce(CAST(source AS VARCHAR), 'null')
  FROM documents WHERE source NOT IN ({_SRC_LIST}) OR source IS NULL
UNION ALL
SELECT d.doc_id, 'doc_id_unique',
       concat(CAST(d.doc_id AS VARCHAR), ' (count=', CAST(g.cnt AS VARCHAR), ')')
  FROM documents d
  JOIN (SELECT doc_id, count(*) cnt FROM documents
         WHERE doc_id IS NOT NULL GROUP BY doc_id HAVING count(*) > 1) g
    ON d.doc_id = g.doc_id
"""

_ROW_FAIL = (
    f"(doc_id IS NULL OR NOT coalesce(n_chars = length(text), TRUE) OR "
    f"NOT coalesce({_P_NCHARS}, TRUE) OR NOT coalesce({_P_LANG}, TRUE) OR "
    f"NOT coalesce({_P_SRC_FMT}, TRUE) OR {_P_ZH_FAIL})"
)
_N_VIOL = (
    f"(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END + "
    f"CASE WHEN NOT coalesce(n_chars = length(text), TRUE) THEN 1 ELSE 0 END + "
    f"CASE WHEN NOT coalesce({_P_NCHARS}, TRUE) THEN 1 ELSE 0 END + "
    f"CASE WHEN NOT coalesce({_P_LANG}, TRUE) THEN 1 ELSE 0 END + "
    f"CASE WHEN NOT coalesce({_P_SRC_FMT}, TRUE) THEN 1 ELSE 0 END + "
    f"CASE WHEN {_P_ZH_FAIL} THEN 1 ELSE 0 END)"
)

_BUCKET = (
    "CAST(least(greatest(CAST(floor((CAST(n_chars AS DOUBLE) - 0.0) / {w}) "
    "AS BIGINT), 0), {top}) AS INT)"
)

_SHINGLES = (
    "list_transform(generate_series(1, greatest(len(_toks)-2, 0)), "
    "i -> concat_ws(' ', _toks[i], _toks[i+1], _toks[i+2]))"
)


def _shingles_sql(k: int) -> str:
    """DuckDB twin of word_shingles(k) over a ``_toks`` list column."""
    terms = ", ".join(f"_toks[i+{j}]" for j in range(k))
    return (
        f"list_transform(generate_series(1, greatest(len(_toks)-{k-1}, 0)), "
        f"i -> concat_ws(' ', {terms}))"
    )


def _ngram_pairs_sql(id_cap: int, threshold: float,
                     max_shingle_df: int = 1000) -> str:
    """Exact 3-gram Jaccard pair graph over documents with doc_id <
    ``id_cap`` at jaccard >= ``threshold`` — the inverted-index
    construction mirrored in SQL (columns id_a, id_b, jaccard),
    including the default stop-shingle DF cap (dropped from the index
    only; sizes keep counting them, exactly like the Spark side)."""
    return f"""
            WITH d AS (
              SELECT doc_id, list_distinct({_SHINGLES}) AS sh FROM (
                SELECT doc_id, string_split(trim({_NORM}), ' ') AS _toks
                FROM documents WHERE doc_id < {id_cap}
              ) WHERE len(_toks) >= 3
            ),
            sz AS (SELECT doc_id, len(sh) AS n_sh FROM d WHERE len(sh) > 0),
            inv0 AS (SELECT doc_id, unnest(sh) AS shingle FROM d),
            keep AS (
              SELECT shingle FROM inv0 GROUP BY shingle
              HAVING count(*) <= {max_shingle_df}
            ),
            inv AS (SELECT doc_id, inv0.shingle FROM inv0
                    JOIN keep ON inv0.shingle = keep.shingle),
            com AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
              FROM inv a JOIN inv b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   CAST(n_common AS DOUBLE)
                     / (sa.n_sh + sb.n_sh - n_common) AS jaccard
            FROM com
            JOIN sz sa ON sa.doc_id = id_a
            JOIN sz sb ON sb.doc_id = id_b
            WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common)
                  >= {threshold}
    """

_DOT = "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"
_NRM = lambda s: f"sqrt(list_dot_product({s}.embedding::DOUBLE[], {s}.embedding::DOUBLE[]))"
_COS = f"({_DOT} / ({_NRM('a')} * {_NRM('b')}))"

_PUNCT_RATIO = (
    "(CASE WHEN length(text) = 0 THEN 0.0 ELSE "
    "CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) "
    "/ length(text) END)"
)
_MEAN_TOK_LEN = (
    f"(CASE WHEN {_NTOK} = 0 THEN 0.0 ELSE "
    f"CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / {_NTOK} END)"
)
_QUALITY_OK = (
    f"({_NTOK} >= 5 AND {_PUNCT_RATIO} <= 0.3 "
    f"AND {_MEAN_TOK_LEN} BETWEEN 2.0 AND 12.0)"
)

_EN_LIST = "['the','and','of','to','is','that','with','for']"
_EN_HITS = (
    "len(list_filter(string_split(regexp_replace(trim(lower(text)), "
    f"'\\s+', ' ', 'g'), ' '), t -> list_contains({_EN_LIST}, t)))"
)


_ANN_EXACT_SQL = f"""
    WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
                WHERE vec_id < 8),
         c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 8),
    scored AS (
      SELECT a.query_id, b.vec_id AS neighbor_id, {_COS} AS sim
      FROM (SELECT query_id, embedding FROM q) a(query_id, embedding),
           c b
    ),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, round(sim, 4) AS cosine_sim, rank
    FROM ranked WHERE rank <= 3
"""


def _ann_lsh_sql(n_planes: int = 6, n_tables: int = 6, dim: int = 64,
                 seed: int = 42, k: int = 3) -> str:
    """SQL twin of q_ann_lsh: the SRP hyperplanes are a pure function of
    the seed (np.random.default_rng), so the SAME planes are embedded
    here as full-precision literals — DuckDB reproduces the bucket
    signatures, the any-table candidate join, and the exact re-rank."""
    from medea_ps_spark.operators.similarity import _hyperplanes

    def bucket_expr(side: str, t: int) -> str:
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        terms = []
        for p in range(n_planes):
            lit = "[" + ",".join(repr(float(x)) for x in planes[p]) + "]"
            terms.append(
                f"(CASE WHEN list_dot_product({side}.e, {lit}::DOUBLE[]) > 0 "
                f"THEN {1 << p} ELSE 0 END)"
            )
        return " + ".join(terms)

    c_buckets = ", ".join(f"{bucket_expr('c', t)} AS b{t}" for t in range(n_tables))
    q_buckets = ", ".join(f"{bucket_expr('q', t)} AS b{t}" for t in range(n_tables))
    any_match = " OR ".join(f"cb.b{t} = qb.b{t}" for t in range(n_tables))
    return f"""
        WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS e
                   FROM embeddings WHERE vec_id >= 8),
             q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS e
                   FROM embeddings WHERE vec_id < 8),
        cb AS (SELECT c.vec_id, c.e, {c_buckets} FROM c),
        qb AS (SELECT q.query_id, q.e, {q_buckets} FROM q),
        cand AS (
          SELECT DISTINCT qb.query_id, cb.vec_id,
                 list_dot_product(cb.e, qb.e)
                   / (sqrt(list_dot_product(cb.e, cb.e))
                      * sqrt(list_dot_product(qb.e, qb.e))) AS sim
          FROM cb JOIN qb ON {any_match}
        ),
        ranked AS (
          SELECT query_id, vec_id AS neighbor_id, sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, vec_id ASC) AS rank
          FROM cand
        )
        SELECT query_id, neighbor_id, round(sim, 4) AS cosine_sim, rank
        FROM ranked WHERE rank <= {k}
    """


def _ann_ivf_sql(n_probe: int = 3, k: int = 3) -> str:
    """SQL twin of q_ann_ivf with the committed centroids as literals.
    Tie-break parity with ivf.py: assignment uses array_max over
    struct(sim, idx) (ties → larger idx) and probes use
    reverse(array_sort) (ties → larger idx first), so both ORDER BY
    sim DESC, cid DESC."""
    cent = _ivf_centroids()
    vals = ", ".join(
        f"({i}, [{','.join(repr(float(x)) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(cent)
    )
    return f"""
        WITH cent(cid, cv) AS (VALUES {vals}),
        corpus AS (SELECT vec_id, embedding::DOUBLE[] AS e
                   FROM embeddings WHERE vec_id >= 8),
        queries AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS e
                    FROM embeddings WHERE vec_id < 8),
        assign AS (
          SELECT vec_id, e, cid AS ivf_list FROM (
            SELECT c.vec_id, c.e, ct.cid,
                   row_number() OVER (
                     PARTITION BY c.vec_id
                     ORDER BY list_dot_product(c.e, ct.cv) DESC, ct.cid DESC
                   ) AS rn
            FROM corpus c, cent ct
          ) WHERE rn = 1
        ),
        probes AS (
          SELECT query_id, e, cid AS probe FROM (
            SELECT q.query_id, q.e, ct.cid,
                   row_number() OVER (
                     PARTITION BY q.query_id
                     ORDER BY list_dot_product(q.e, ct.cv) DESC, ct.cid DESC
                   ) AS rn
            FROM queries q, cent ct
          ) WHERE rn <= {n_probe}
        ),
        scored AS (
          SELECT p.query_id, a.vec_id AS neighbor_id,
                 list_dot_product(a.e, p.e)
                   / (sqrt(list_dot_product(a.e, a.e))
                      * sqrt(list_dot_product(p.e, p.e))) AS sim
          FROM assign a JOIN probes p ON a.ivf_list = p.probe
        ),
        ranked AS (
          SELECT query_id, neighbor_id, sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, neighbor_id ASC)
                   AS rank
          FROM scored
        )
        SELECT query_id, neighbor_id, round(sim, 4) AS cosine_sim, rank
        FROM ranked WHERE rank <= {k}
    """


def oracle_sql() -> dict[str, str]:
    from medea_ps_spark.operators.sampling import rate_threshold

    w16 = 800.0 / 16
    w32 = 800.0 / 32
    b16 = _BUCKET.format(w=w16, top=15)
    b32 = _BUCKET.format(w=w32, top=31)
    return {
        "validate_violations": _VIOL_SQL,
        "validate_verdicts": f"""
            SELECT source,
                   count(*) AS n_rows,
                   CAST(sum(CASE WHEN NOT {_ROW_FAIL} THEN 1 ELSE 0 END) AS BIGINT) AS n_passed,
                   CAST(sum(CASE WHEN {_ROW_FAIL} THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
                   CAST(sum({_N_VIOL}) AS BIGINT) AS n_violations
            FROM documents GROUP BY source
        """,
        "partition_stats": """
            SELECT lang, count(*) AS n_rows,
                   min(n_chars) AS min_chars, max(n_chars) AS max_chars,
                   round(avg(CAST(n_chars AS DOUBLE)), 4) AS avg_chars,
                   CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_ids
            FROM documents GROUP BY lang
        """,
        "referential_violations": f"""
            SELECT doc_id, coalesce(CAST(source AS VARCHAR), 'null') AS observed
            FROM documents WHERE source NOT IN ({_SRC_LIST}) OR source IS NULL
        """,
        "dedup_incremental": f"""
            WITH batch AS (
              SELECT doc_id + 1000000 AS doc_id, text
                FROM documents WHERE doc_id % 5 = 0
              UNION ALL
              SELECT doc_id + 2000000, text || ' v2'
                FROM documents WHERE doc_id % 5 = 1
              UNION ALL
              SELECT doc_id + 3000000, text || ' v2'
                FROM documents WHERE doc_id % 5 = 1
            ),
            bfp AS (SELECT doc_id, {_FP} AS fingerprint FROM batch),
            seen AS (SELECT DISTINCT {_FP} AS fingerprint FROM documents),
            fresh AS (
              SELECT * FROM bfp b
              WHERE NOT EXISTS (SELECT 1 FROM seen s
                                 WHERE s.fingerprint = b.fingerprint)
            )
            SELECT min(doc_id) AS doc_id, fingerprint
            FROM fresh GROUP BY fingerprint
        """,
        "drift_chi2": f"""
            WITH h0 AS (
              SELECT {b16} AS bucket,
                     CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS o1,
                     CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS o2
              FROM documents GROUP BY 1
            ), spine AS (SELECT CAST(x AS INT) AS bucket FROM range(16) t(x)),
            h AS (
              SELECT s.bucket, coalesce(o1, 0) AS o1, coalesce(o2, 0) AS o2
              FROM spine s LEFT JOIN h0 ON s.bucket = h0.bucket
            ), t AS (SELECT sum(o1) n1, sum(o2) n2 FROM h),
            terms AS (
              SELECT o1, o2, n1, n2,
                     greatest(CAST(o1 AS DOUBLE)/n1, 1e-4) AS p1,
                     greatest(CAST(o2 AS DOUBLE)/n2, 1e-4) AS p2
              FROM h, t
            ), norm AS (SELECT sum(p1) AS s1, sum(p2) AS s2 FROM terms)
            SELECT round(sum(CASE WHEN o1 + o2 > 0 THEN
                     pow(sqrt(CAST(n2 AS DOUBLE)/n1)*o1
                         - sqrt(CAST(n1 AS DOUBLE)/n2)*o2, 2) / (o1+o2)
                   END), 4) AS chi2_stat,
                   round(sum((p1/s1 - p2/s2) * ln((p1/s1)/(p2/s2))), 6) AS psi
            FROM terms, norm
        """,
        "table_diff": """
            WITH new AS (
              SELECT o_orderkey, o_custkey,
                     CASE WHEN o_orderkey % 91 = 0 THEN 'X'
                          ELSE o_orderstatus END AS o_orderstatus,
                     o_totalprice, o_orderdate,
                     CASE WHEN o_orderkey % 89 = 0 THEN 'X-' || o_orderpriority
                          ELSE o_orderpriority END AS o_orderpriority
                FROM orders WHERE o_orderkey % 97 <> 0
              UNION ALL
              SELECT o_orderkey + 1000000000, o_custkey, o_orderstatus,
                     o_totalprice, o_orderdate, o_orderpriority
                FROM orders WHERE o_orderkey % 101 = 0
            ),
            j AS (
              SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
                     o.o_orderkey IS NULL AS is_added,
                     n.o_orderkey IS NULL AS is_removed,
                     array_to_string(list_sort(list_filter([
                       CASE WHEN o.o_custkey IS DISTINCT FROM n.o_custkey
                            THEN 'o_custkey' END,
                       CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                            THEN 'o_orderstatus' END,
                       CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                            THEN 'o_totalprice' END,
                       CASE WHEN o.o_orderdate IS DISTINCT FROM n.o_orderdate
                            THEN 'o_orderdate' END,
                       CASE WHEN o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
                            THEN 'o_orderpriority' END
                     ], x -> x IS NOT NULL)), ',') AS diffs
                FROM orders o FULL OUTER JOIN new n
                  ON o.o_orderkey = n.o_orderkey
            )
            SELECT o_orderkey,
                   CASE WHEN is_added THEN 'added'
                        WHEN is_removed THEN 'removed'
                        ELSE 'changed' END AS change,
                   CASE WHEN is_added OR is_removed THEN ''
                        ELSE diffs END AS changed_cols
            FROM j
            WHERE is_added OR is_removed OR diffs <> ''
        """,
        "ks_stat": f"""
            WITH h AS (
              SELECT {b32} AS bucket,
                     CAST(sum(CASE WHEN lang='en' THEN 1 ELSE 0 END) AS BIGINT) AS c_en,
                     CAST(sum(CASE WHEN lang='es' THEN 1 ELSE 0 END) AS BIGINT) AS c_es
              FROM documents WHERE lang IN ('en','es') GROUP BY 1
            ), cdf AS (
              SELECT sum(c_en) OVER (ORDER BY bucket) AS cum_en,
                     sum(c_es) OVER (ORDER BY bucket) AS cum_es
              FROM h
            ), t AS (SELECT max(cum_en) n_en, max(cum_es) n_es FROM cdf)
            SELECT round(max(abs(CAST(cum_en AS DOUBLE)/n_en
                                 - CAST(cum_es AS DOUBLE)/n_es)), 6) AS ks_stat
            FROM cdf, t
        """,
        "medea_validate_events": """
            SELECT event_type, count(*) AS n_events,
                   CAST(sum(CASE WHEN json_valid(props)
                             AND json_type(props::JSON) = 'OBJECT'
                             AND json_type(props::JSON, '$.k') IN ('BIGINT','UBIGINT','DOUBLE')
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
            FROM events GROUP BY event_type
        """,
        "dedup_exact": f"""
            WITH fp AS (SELECT doc_id, {_FP} AS fingerprint FROM documents),
            g AS (SELECT fingerprint, min(doc_id) AS canonical_id,
                         count(*) AS n_copies
                  FROM fp GROUP BY fingerprint)
            SELECT count(*) AS n_distinct_texts,
                   CAST(sum(n_copies - 1) AS BIGINT) AS n_duplicates,
                   round(avg(canonical_id), 4) AS avg_canonical_id
            FROM g
        """,
        "dedup_ngram_jaccard": f"""
            SELECT id_a, id_b, round(jaccard, 6) AS jaccard
            FROM ({_ngram_pairs_sql(120, 0.12)})
        """,
        "dedup_minhash_lsh": f"""
            WITH d AS (
              SELECT doc_id, {_SHINGLES} AS sh FROM (
                SELECT doc_id, string_split(trim({_NORM}), ' ') AS _toks
                FROM documents WHERE doc_id < 400
              ) WHERE len(_toks) >= 3
            ),
            d2 AS (SELECT doc_id, sh, list_distinct(sh) AS shd
                   FROM d WHERE len(sh) > 0),
            sigs AS (
              SELECT doc_id,
                     list_transform(generate_series(0, 31), i ->
                       list_min(list_transform(sh, s ->
                         md5(concat('42:', CAST(i AS VARCHAR), '|', s))))) AS sig
              FROM d2
            ),
            buckets AS (
              SELECT doc_id, band,
                     md5(array_to_string(sig[band*4+1 : band*4+4], '|'))
                       AS bucket
              FROM sigs,
                   (SELECT unnest(generate_series(0, 7)) AS band)
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM buckets a JOIN buckets b
                ON a.band = b.band AND a.bucket = b.bucket
               AND a.doc_id < b.doc_id
            ),
            j AS (
              SELECT id_a, id_b,
                     CAST(len(list_intersect(sa.shd, sb.shd)) AS DOUBLE)
                       / len(list_distinct(list_concat(sa.shd, sb.shd)))
                       AS jaccard
              FROM cand
              JOIN d2 sa ON sa.doc_id = id_a
              JOIN d2 sb ON sb.doc_id = id_b
            )
            SELECT id_a, id_b, round(jaccard, 6) AS jaccard
            FROM j WHERE jaccard >= 0.35
        """,
        "dedup_simhash": f"""
            WITH toks AS (
              SELECT doc_id, string_split(trim({_NORM}), ' ') AS tl
              FROM documents WHERE doc_id < 500
            ),
            hh AS (
              SELECT doc_id, len(tl) AS n,
                     ('0x' || substr(md5(concat('42|', tok)), 1, 15))::BIGINT
                       AS h
              FROM (SELECT doc_id, tl, unnest(tl) AS tok FROM toks)
            ),
            bits AS (
              SELECT doc_id, bs.b,
                     CASE WHEN 2 * sum((h >> bs.b) & 1) > max(n)
                          THEN (1::BIGINT << bs.b) ELSE 0 END AS bitval
              FROM hh, (SELECT unnest(generate_series(0, 59)) AS b) bs
              GROUP BY doc_id, bs.b
            ),
            sigs AS (
              SELECT doc_id, CAST(sum(bitval) AS BIGINT) AS s
              FROM bits GROUP BY doc_id
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming
            FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.s, b.s)) <= 4
        """,
        "dedup_cluster_canon": f"""
            WITH RECURSIVE pairs AS ({_ngram_pairs_sql(200, 0.03)}),
            bidir AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION
              SELECT id_b AS a, id_a AS b FROM pairs
            ),
            reach(a, b) AS (
              SELECT a, b FROM bidir
              UNION
              SELECT r.a, e.b FROM reach r JOIN bidir e ON r.b = e.a
            )
            SELECT a AS node, least(a, min(b)) AS component
            FROM reach GROUP BY a
        """,
        "stats_bounds": """
            WITH s AS (
              SELECT source,
                     min(n_chars) AS min_nc,
                     avg(CAST(n_chars AS DOUBLE)) AS avg_nc,
                     avg(CASE WHEN doc_id IS NULL THEN 1.0 ELSE 0.0 END)
                       AS nullrate
              FROM documents GROUP BY source
            )
            SELECT source, 'n_chars_min_ok' AS constraint_id,
                   round(CAST(min_nc AS DOUBLE), 6) AS observed,
                   (min_nc >= 1) AS passed
            FROM s
            UNION ALL
            SELECT source, 'n_chars_avg_band', round(avg_nc, 6),
                   (avg_nc >= 100 AND avg_nc <= 250) FROM s
            UNION ALL
            SELECT source, 'doc_id_null_rate', round(nullrate, 6),
                   (nullrate <= 0.0) FROM s
        """,
        "ann_topk": _ANN_EXACT_SQL,
        # full-probe IVF must reproduce exact brute-force top-k no
        # matter where the (seeded) k-means centroids landed
        "embedding_near_dups": f"""
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round({_COS}, 4) AS cosine_sim
            FROM (SELECT * FROM embeddings WHERE vec_id < 200) a
            JOIN (SELECT * FROM embeddings WHERE vec_id < 200) b
              ON a.vec_id < b.vec_id
            WHERE {_COS} >= 0.25
        """,
        "ann_lsh": _ann_lsh_sql(),
        "ann_ivf": _ann_ivf_sql(),
        "token_budget_sample": f"""
            WITH cum AS (
              SELECT source, doc_id, n_tok,
                     sum(CAST(n_tok AS BIGINT)) OVER (
                         PARTITION BY source
                         ORDER BY substr(md5(concat_ws(':', doc_id, '42')),
                                         1, 8),
                                  doc_id, CAST(n_tok AS BIGINT)
                         ROWS UNBOUNDED PRECEDING)
                       - CAST(n_tok AS BIGINT) AS tok_before
              FROM read_parquet('{SEQ_FIXTURE}')
              WHERE n_tok IS NOT NULL
            )
            SELECT source, doc_id, n_tok FROM cum
            WHERE tok_before < CASE source
                WHEN 'web-2025' THEN 60000
                WHEN 'books' THEN 25000
                WHEN 'code' THEN 15000
                WHEN 'wiki' THEN 1000000000
                ELSE 0 END
        """,
        "text_extract_html": f"""
            WITH planted AS (
              SELECT doc_id,
                     CASE CAST(doc_id % 6 AS INT)
                       WHEN 1 THEN '<html><head><title>Doc Title</title><script>var x = 1 < 2;</script><style>p {{ color: red }}</style></head><body><p>'
                       WHEN 2 THEN '<div class="main"><b>'
                       WHEN 4 THEN '<ul><li>'
                       WHEN 5 THEN 'intro<br/>'
                       ELSE '' END
                     || text ||
                     CASE CAST(doc_id % 6 AS INT)
                       WHEN 1 THEN '</p></body></html>'
                       WHEN 2 THEN '</b><!-- hidden comment --></div>'
                       WHEN 3 THEN ' &amp; more &lt;i&gt;escaped&lt;/i&gt;&nbsp;end'
                       WHEN 4 THEN '</li><li>second item</li></ul>'
                       WHEN 5 THEN '<br>outro'
                       ELSE '' END AS html
              FROM documents
            ), stripped AS (
              SELECT doc_id,
                regexp_replace(
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(
                        regexp_replace(html,
                          '(?is)<script\\b[^>]*>.*?</script\\s*>', '', 'g'),
                        '(?is)<style\\b[^>]*>.*?</style\\s*>', '', 'g'),
                      '(?s)<!--.*?-->', '', 'g'),
                    '(?i)<(?:br\\s*/?|/(?:p|div|li|h[1-6]|tr|table|ul|ol|blockquote|pre|section|article|header|footer|head|title|body|nav|aside))\\s*>',
                    chr(10), 'g'),
                  '(?s)<[^>]*>', '', 'g') AS t
              FROM planted
            ), unescaped AS (
              SELECT doc_id,
                replace(replace(replace(replace(replace(replace(replace(
                  t, '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                  '&#39;', chr(39)), '&apos;', chr(39)), '&nbsp;', ' '),
                  '&amp;', '&') AS t
              FROM stripped
            ), squeezed AS (
              SELECT doc_id,
                regexp_replace(
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(t,
                        '[ \\t\\x0B\\f\\r\\x{{00A0}}]+', ' ', 'g'),
                      ' ?\\n ?', chr(10), 'g'),
                    '\\n{{3,}}', chr(10) || chr(10), 'g'),
                  '^[ \\n]+|[ \\n]+$', '', 'g') AS extracted
              FROM unescaped
            )
            SELECT doc_id, extracted,
                   CAST(length(extracted) AS INT) AS n_chars_out
            FROM squeezed
        """,
        "text_quality": f"""
            SELECT source, count(*) AS n_docs,
                   CAST(sum(CASE WHEN {_QUALITY_OK} THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_ok,
                   round(avg({_PUNCT_RATIO}), 6) AS avg_punct_ratio
            FROM documents GROUP BY source
        """,
        "text_normalize": f"""
            WITH p AS (
              SELECT doc_id,
                     text || CASE CAST(doc_id % 6 AS INT)
                       WHEN 0 THEN '{_NORM_SUFFIXES[0]}'
                       WHEN 1 THEN '{_NORM_SUFFIXES[1]}'
                       WHEN 2 THEN '{_NORM_SUFFIXES[2]}'
                       WHEN 3 THEN '{_NORM_SUFFIXES[3]}'
                       WHEN 4 THEN '{_NORM_SUFFIXES[4]}'
                       ELSE '{_NORM_SUFFIXES[5]}'
                     END AS text
              FROM documents
            ), n AS (
              SELECT doc_id, text,
                     nfc_normalize(regexp_replace(
                       text, '{_NORM_STRIP_RE2}', '', 'g')) AS norm_text
              FROM p
            )
            SELECT doc_id, norm_text, norm_text <> text AS changed FROM n
        """,
        "text_fingerprints": f"""
            SELECT count(*) AS n_docs,
                   count(DISTINCT {_FP}) AS n_distinct
            FROM documents
        """,
        "validate_violations_sample": f"""
            WITH v AS ({_VIOL_SQL}),
            k AS (
              SELECT doc_id, constraint_id, observed,
                     md5(concat(
                       coalesce(CAST(doc_id AS VARCHAR), chr(0)), chr(31),
                       constraint_id, chr(31),
                       coalesce(observed, chr(0)))) AS vkey
              FROM v
            ),
            r AS (
              SELECT doc_id, constraint_id, observed,
                     CAST(row_number() OVER (
                       PARTITION BY constraint_id ORDER BY vkey) AS INT)
                       AS rank,
                     CAST(count(*) OVER (PARTITION BY constraint_id)
                       AS BIGINT) AS n_total
              FROM k
            )
            SELECT doc_id, constraint_id, observed, rank, n_total
            FROM r WHERE rank <= {SAMPLE_LIMIT}
        """,
        "dsir_resample": f"""
            WITH norm AS (
              SELECT doc_id, lang,
                     trim(regexp_replace(text, '\\s+', ' ', 'g')) AS t
              FROM documents
            ),
            cw0 AS (
              SELECT doc_id, unnest(string_split(t, ' ')) AS word
              FROM norm WHERE length(t) > 0
            ),
            cw AS (
              SELECT doc_id, word, CAST(count(*) AS BIGINT) AS k
              FROM cw0 GROUP BY doc_id, word
            ),
            tfreq AS (
              SELECT word, CAST(count(*) AS BIGINT) AS n
              FROM (
                SELECT unnest(string_split(t, ' ')) AS word
                FROM norm WHERE lang = 'en' AND length(t) > 0
              ) GROUP BY word
            ),
            rfreq AS (
              SELECT word, CAST(sum(k) AS BIGINT) AS n FROM cw GROUP BY word
            ),
            ttot AS (
              SELECT CAST(sum(n) AS DOUBLE) AS N,
                     CAST(count(*) AS DOUBLE) AS V FROM tfreq
            ),
            rtot AS (
              SELECT CAST(sum(n) AS DOUBLE) AS N,
                     CAST(count(*) AS DOUBLE) AS V FROM rfreq
            ),
            sc AS (
              -- log_ratio = sum k * (ln p_target - ln p_raw), Laplace
              -- alpha=1 with a shared OOV bucket per profile — mirrors
              -- dsir.dsir_log_ratios term-for-term
              SELECT cw.doc_id, CAST(sum(cw.k) AS BIGINT) AS n_tokens,
                     sum(cw.k * (
                       ln((coalesce(tf.n, 0) + 1.0)
                          / (ttot.N + 1.0 * (ttot.V + 1)))
                     - ln((rf.n + 1.0)
                          / (rtot.N + 1.0 * (rtot.V + 1)))
                     )) AS lr
              FROM cw
              LEFT JOIN tfreq tf USING (word)
              JOIN rfreq rf USING (word), ttot, rtot
              GROUP BY cw.doc_id
            ),
            g AS (
              -- deterministic standard Gumbel from the md5 60-bit lane:
              -- u = (lane + 0.5) / 2^60, key = lr - ln(-ln u)
              SELECT doc_id, n_tokens, lr,
                     lr - ln(-ln(
                       (CAST(('0x' || substr(md5(
                          concat_ws(':', CAST(doc_id AS VARCHAR),
                                    '{_DSIR_SEED}')
                        ), 1, 15)) AS BIGINT) + 0.5)
                       / 1152921504606846976.0
                     )) AS gk
              FROM sc
            ),
            ranked AS (
              SELECT doc_id, n_tokens, lr,
                     row_number() OVER (ORDER BY gk DESC, doc_id ASC)
                       AS rank
              FROM g
            )
            SELECT rank, doc_id, n_tokens, round(lr, 6) AS log_ratio
            FROM ranked WHERE rank <= {_DSIR_K}
        """,
        "events_props_health": """
            SELECT event_type, count(*) AS n_rows,
                   CAST(sum(CASE WHEN props IS NULL
                                  OR NOT (json_valid(props)
                                          AND json_type(props::JSON) = 'OBJECT')
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
                   round(avg(CASE WHEN props IS NULL
                                  OR NOT (json_valid(props)
                                          AND json_type(props::JSON) = 'OBJECT')
                             THEN 1.0 ELSE 0.0 END), 6) AS quarantine_rate
            FROM events GROUP BY event_type
        """,
        "vocab_truncate": f"""
            WITH base AS (
              SELECT row_number() OVER () AS rid, doc_id, source, tokens
              FROM read_parquet('{SEQ_FIXTURE}')
            ), freq AS (
              SELECT t, count(*) AS c
              FROM (SELECT unnest(tokens) AS t FROM base) GROUP BY t
            ), topk AS (
              SELECT t FROM freq ORDER BY c DESC, t ASC LIMIT 20000
            ), ex AS (
              SELECT rid, unnest(tokens) AS x,
                     unnest(range(1, len(tokens) + 1)) AS pos
              FROM base
            ), mapped AS (
              SELECT e.rid, e.pos,
                     CASE WHEN tk.t IS NULL THEN -999999 ELSE e.x END AS nx,
                     CASE WHEN tk.t IS NULL THEN 1 ELSE 0 END AS oov
              FROM ex e LEFT JOIN topk tk ON e.x = tk.t
            ), agg AS (
              SELECT rid,
                     md5(string_agg(CAST(nx AS VARCHAR), ',' ORDER BY pos))
                       AS tok_md5,
                     CAST(sum(oov) AS INT) AS n_oov
              FROM mapped GROUP BY rid
            )
            SELECT b.doc_id, b.source,
                   CASE WHEN b.tokens IS NULL THEN NULL
                        WHEN len(b.tokens) = 0 THEN md5('')
                        ELSE a.tok_md5 END AS tok_md5,
                   CAST(coalesce(a.n_oov, 0) AS INT) AS n_oov
            FROM base b LEFT JOIN agg a USING (rid)
        """,
        "corpus_clean": f"""
            WITH ranked AS (
              SELECT doc_id, text,
                     row_number() OVER (PARTITION BY {_FP}
                                        ORDER BY doc_id) AS rn
              FROM documents
            ), deduped AS (SELECT doc_id, text FROM ranked WHERE rn = 1)
            SELECT (SELECT count(*) FROM documents) AS n_input,
                   (SELECT count(*) FROM deduped) AS n_after_dedup,
                   (SELECT count(*) FROM deduped WHERE {_QUALITY_OK})
                     AS n_after_quality
        """,
        "contamination": f"""
            WITH ev AS (
              SELECT DISTINCT unnest(list_distinct({_shingles_sql(8)}))
                       AS shingle
              FROM (SELECT string_split(trim({_NORM}), ' ') AS _toks
                    FROM documents WHERE doc_id < 20)
            ),
            tr AS (
              SELECT doc_id, unnest(list_distinct({_shingles_sql(8)}))
                       AS shingle
              FROM (SELECT doc_id, string_split(trim({_NORM}), ' ') AS _toks
                    FROM documents WHERE doc_id >= 20 AND doc_id < 400)
            )
            SELECT tr.doc_id,
                   CAST(count(*) AS BIGINT) AS n_contaminated_shingles
            FROM tr JOIN ev USING (shingle)
            GROUP BY tr.doc_id
        """,
        "text_pii_scrub": """
            WITH injected AS (
              SELECT source,
                     CASE WHEN doc_id % 7 = 0
                          THEN concat(text, ' contact user',
                                      CAST(doc_id AS VARCHAR),
                                      '@example.com or 555-867-5309 from 10.0.0.1')
                          ELSE text END AS text2
              FROM documents
            ), counted AS (
              SELECT source, text2,
                len(regexp_extract_all(text2,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS e,
                len(regexp_extract_all(text2,
                  '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b')) AS p,
                len(regexp_extract_all(text2,
                  '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS i,
                regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                  text2,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                  '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g'),
                  '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
                  '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g') AS red
              FROM injected
            )
            SELECT source,
                   CAST(sum(e) AS BIGINT) AS n_emails,
                   CAST(sum(p) AS BIGINT) AS n_phones,
                   CAST(sum(i) AS BIGINT) AS n_ips,
                   CAST(sum(CASE WHEN red <> text2 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_docs_redacted
            FROM counted GROUP BY source
        """,
        "token_contamination": f"""
            WITH ev AS (
              SELECT DISTINCT array_to_string(tokens[3:10], ',') AS g
              FROM read_parquet('{SEQ_FIXTURE}')
              WHERE md5(doc_id) LIKE '00%' AND len(tokens) >= 10
            ), tr AS (
              SELECT doc_id, unnest(list_distinct(list_transform(
                       range(1, greatest(len(tokens)-8+2, 1)),
                       i -> array_to_string(tokens[i:i+7], ',')))) AS g
              FROM read_parquet('{SEQ_FIXTURE}')
            ), hits AS (
              SELECT doc_id,
                     CAST(count(*) AS BIGINT) AS n_contaminated_shingles
              FROM (SELECT DISTINCT t.doc_id, t.g
                    FROM tr t JOIN ev USING (g))
              GROUP BY doc_id
            )
            SELECT d.doc_id, d.source, h.n_contaminated_shingles
            FROM read_parquet('{SEQ_FIXTURE}') d JOIN hits h USING (doc_id)
        """,
        "token_span_dedup": f"""
            WITH uniq AS (
              SELECT doc_id, tokens FROM read_parquet('{SEQ_FIXTURE}')
              QUALIFY count(*) OVER (PARTITION BY doc_id) = 1
            ), corpus AS (
              SELECT doc_id, tokens FROM uniq
              UNION ALL
              SELECT doc_id || '~dup', tokens FROM uniq
              WHERE md5(doc_id) LIKE '0%' AND len(tokens) >= 8
            ), pos AS (
              SELECT doc_id, u.pos, u.g FROM (
                SELECT doc_id,
                       unnest(list_transform(
                         range(1, greatest(len(tokens)-8+2, 1)),
                         i -> {{'pos': i-1,
                                'g': array_to_string(tokens[i:i+7], ',')}}
                       )) AS u
                FROM corpus)
            ), dup AS (
              SELECT g FROM pos GROUP BY g HAVING count(*) >= 2
            ),
            -- excess = every occurrence but the corpus-first (keeper =
            -- min (doc_id, pos) per duplicated gram)
            excess AS (
              SELECT doc_id, pos FROM (
                SELECT doc_id, pos,
                       row_number() OVER (PARTITION BY g
                                          ORDER BY doc_id, pos) AS rn
                FROM pos JOIN dup USING (g))
              WHERE rn > 1
            ),
            -- covered token positions: union of [pos, pos+7] — the
            -- islands merge produces exactly this set, so the oracle
            -- skips the merge and unions intervals directly
            covered AS (
              SELECT DISTINCT doc_id, pos + d AS p
              FROM excess, range(0, 8) AS r(d)
            ), tokpos AS (
              SELECT doc_id, u.i, u.t FROM (
                SELECT doc_id,
                       unnest(list_transform(
                         range(1, coalesce(len(tokens), 0) + 1),
                         i -> {{'i': i-1, 't': tokens[i]}})) AS u
                FROM corpus)
            ), kept AS (
              SELECT tp.doc_id, tp.i, tp.t
              FROM tokpos tp LEFT JOIN covered c
                ON tp.doc_id = c.doc_id AND tp.i = c.p
              WHERE c.doc_id IS NULL
            ), newtok AS (
              SELECT doc_id, list(t ORDER BY i) AS toks,
                     count(*) AS n
              FROM kept GROUP BY doc_id
            )
            SELECT c.doc_id,
                   CAST(coalesce(n.n, 0) AS INT) AS n_tok_after,
                   CAST(coalesce(len(c.tokens), 0) - coalesce(n.n, 0)
                        AS INT) AS removed_tokens,
                   md5(coalesce(array_to_string(n.toks, ','), ''))
                     AS tok_md5
            FROM corpus c LEFT JOIN newtok n USING (doc_id)
        """,
        "text_lm_score": """
            WITH norm AS (
              SELECT doc_id,
                     trim(regexp_replace(text, '\\s+', ' ', 'g')) AS t
              FROM documents
            ),
            t0 AS (
              SELECT doc_id, unnest(string_split(t, ' ')) AS word
              FROM norm WHERE length(t) > 0
            ),
            -- mirror the engine's pre-aggregated scoring join (VERDICT
            -- r4 #4): distinct (doc, word) pairs with local counts, a
            -- count-weighted mean after — same rationals as avg over
            -- occurrences
            t AS (
              SELECT doc_id, word, CAST(count(*) AS BIGINT) AS k
              FROM t0 GROUP BY doc_id, word
            ),
            freq AS (
              SELECT word, CAST(sum(k) AS BIGINT) AS n FROM t GROUP BY word
            ),
            tot AS (
              SELECT CAST(sum(n) AS DOUBLE) AS N,
                     CAST(count(*) AS DOUBLE) AS V
              FROM freq
            ),
            sc AS (
              SELECT doc_id,
                     CAST(sum(k) AS BIGINT) AS n_tokens,
                     -(sum(k * log2((f.n + 1.0)
                                    / (tot.N + 1.0 * (tot.V + 1))))
                       / sum(k)) AS bits
              FROM t JOIN freq f USING (word), tot
              GROUP BY doc_id
            ),
            -- interpolated bigram (lmscore.bigram_lm_scores): the
            -- transition stream is the zip of adjacent slices, the
            -- scoring join input is pre-aggregated (doc, w1, w2)
            -- pairs, p_bi is a proper per-context distribution
            -- (context totals summed from the bigram table), and
            -- p = lam*p_bi + (1-lam)*p_uni with lam = 0.75
            bw AS (
              SELECT doc_id, string_split(t, ' ') AS ws
              FROM norm WHERE length(t) > 0
            ),
            btr AS (
              SELECT doc_id,
                     unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)]))
                       AS tr
              FROM bw
            ),
            bp AS (
              SELECT doc_id, tr[1] AS w1, tr[2] AS w2,
                     CAST(count(*) AS BIGINT) AS k
              FROM btr GROUP BY doc_id, tr[1], tr[2]
            ),
            bfreq AS (
              SELECT w1, w2, CAST(sum(k) AS BIGINT) AS n
              FROM bp GROUP BY w1, w2
            ),
            ctx AS (
              SELECT w1, CAST(sum(n) AS BIGINT) AS cc
              FROM bfreq GROUP BY w1
            ),
            bsc AS (
              SELECT bp.doc_id,
                     CAST(sum(bp.k) AS BIGINT) AS n_transitions,
                     -(sum(bp.k * log2(
                         0.75 * ((coalesce(bf.n, 0) + 1.0)
                                 / (coalesce(cx.cc, 0)
                                    + 1.0 * (tot.V + 1)))
                       + 0.25 * ((coalesce(f2.n, 0) + 1.0)
                                 / (tot.N + 1.0 * (tot.V + 1)))
                       )) / sum(bp.k)) AS bbits
              FROM bp
              LEFT JOIN bfreq bf ON bp.w1 = bf.w1 AND bp.w2 = bf.w2
              LEFT JOIN ctx cx ON bp.w1 = cx.w1
              LEFT JOIN freq f2 ON bp.w2 = f2.word, tot
              GROUP BY bp.doc_id
            )
            SELECT sc.doc_id, sc.n_tokens,
                   round(sc.bits, 4) AS bits_per_token,
                   round(pow(2.0, sc.bits), 3) AS ppl,
                   bsc.n_transitions,
                   round(bsc.bbits, 4) AS bi_bits_per_token,
                   round(pow(2.0, bsc.bbits), 3) AS bi_ppl
            FROM sc LEFT JOIN bsc ON sc.doc_id = bsc.doc_id
        """,
        "seq_validation": f"""
            WITH t AS (
              SELECT source,
                     CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END
                   + CASE WHEN NOT (n_tok = len(tokens)) THEN 1 ELSE 0 END
                   + CASE WHEN NOT (n_tok BETWEEN 1 AND {SEQ_FIXTURE_MAX_LEN})
                          THEN 1 ELSE 0 END
                   + CASE WHEN len(list_filter(tokens,
                              x -> NOT (x >= 0 AND x < 50257))) > 0
                          THEN 1 ELSE 0 END
                   + CASE WHEN len(tokens) < 1 THEN 1 ELSE 0 END AS nv
              FROM read_parquet('{SEQ_FIXTURE}')
            )
            SELECT source, count(*) AS n_rows,
                   CAST(sum(CASE WHEN nv = 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_passed,
                   CAST(sum(CASE WHEN nv > 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_failed,
                   CAST(sum(nv) AS BIGINT) AS n_violations,
                   (sum(CASE WHEN nv > 0 THEN 1 ELSE 0 END) = 0)
                     AS partition_passed
            FROM t GROUP BY source
        """,
        "source_divergence": f"""
            WITH c AS (
              SELECT source AS g, ((tok % 128) + 128) % 128 AS bucket,
                     CAST(count(*) AS DOUBLE) AS cnt
              FROM (SELECT source, unnest(tokens) AS tok
                    FROM read_parquet('{SEQ_FIXTURE}'))
              GROUP BY 1, 2
            ),
            tot AS (SELECT g, sum(cnt) AS tot FROM c GROUP BY g),
            gs AS (SELECT DISTINCT g FROM c),
            pairs AS (SELECT a.g AS g_a, b.g AS g_b
                      FROM gs a JOIN gs b ON a.g < b.g),
            u AS (
              SELECT p.g_a, p.g_b, c.bucket, c.cnt AS ca, 0.0 AS cb
              FROM pairs p JOIN c ON c.g = p.g_a
              UNION ALL
              SELECT p.g_a, p.g_b, c.bucket, 0.0 AS ca, c.cnt AS cb
              FROM pairs p JOIN c ON c.g = p.g_b
            ),
            joint AS (
              SELECT g_a, g_b, bucket, sum(ca) AS ca, sum(cb) AS cb
              FROM u GROUP BY 1, 2, 3
            ),
            terms AS (
              SELECT j.g_a, j.g_b,
                     (CASE WHEN j.ca > 0 THEN 0.5 * (j.ca / ta.tot)
                           * ln((j.ca / ta.tot)
                                / ((j.ca / ta.tot + j.cb / tb.tot) / 2))
                           ELSE 0.0 END)
                   + (CASE WHEN j.cb > 0 THEN 0.5 * (j.cb / tb.tot)
                           * ln((j.cb / tb.tot)
                                / ((j.ca / ta.tot + j.cb / tb.tot) / 2))
                           ELSE 0.0 END) AS term
              FROM joint j
              JOIN tot ta ON ta.g = j.g_a
              JOIN tot tb ON tb.g = j.g_b
            )
            SELECT g_a, g_b,
                   CAST(count(*) AS BIGINT) AS n_buckets_union,
                   round(sum(term), 6) AS jsd,
                   round(sum(term) / ln(2.0), 6) AS jsd_norm
            FROM terms GROUP BY g_a, g_b
        """,
        "seq_unique_violations": f"""
            SELECT d.doc_id,
                   concat(CAST(d.doc_id AS VARCHAR), ' (count=',
                          CAST(g.cnt AS VARCHAR), ')') AS observed
            FROM read_parquet('{SEQ_FIXTURE}') d
            JOIN (SELECT doc_id, count(*) AS cnt
                  FROM read_parquet('{SEQ_FIXTURE}')
                  WHERE doc_id IS NOT NULL
                  GROUP BY doc_id HAVING count(*) > 1) g
              ON d.doc_id = g.doc_id
        """,
        "source_vocab_overlap": f"""
            WITH ex AS (
              SELECT source AS g,
                     substr(md5(CAST(tok AS VARCHAR) || ':kmv'), 1, 8)
                       AS hx
              FROM (SELECT source, unnest(tokens) AS tok
                    FROM read_parquet('{SEQ_FIXTURE}'))
              WHERE tok IS NOT NULL
            ),
            m AS (
              SELECT g, hx FROM (
                SELECT g, hx,
                       row_number() OVER (PARTITION BY g ORDER BY hx)
                         AS rn
                FROM (SELECT DISTINCT g, hx FROM ex)
              ) WHERE rn <= 100
            ),
            gs AS (SELECT DISTINCT g FROM m),
            pairs AS (SELECT a.g AS g_a, b.g AS g_b
                      FROM gs a JOIN gs b ON a.g < b.g),
            u AS (
              SELECT p.g_a, p.g_b, m.hx, 1 AS in_a, 0 AS in_b
              FROM pairs p JOIN m ON m.g = p.g_a
              UNION ALL
              SELECT p.g_a, p.g_b, m.hx, 0 AS in_a, 1 AS in_b
              FROM pairs p JOIN m ON m.g = p.g_b
            ),
            memb AS (
              SELECT g_a, g_b, hx, max(in_a) AS in_a, max(in_b) AS in_b
              FROM u GROUP BY g_a, g_b, hx
            ),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY g_a, g_b
                                           ORDER BY hx) AS rn
              FROM memb
            )
            SELECT g_a, g_b,
                   CAST(count(*) AS BIGINT) AS k_used,
                   CAST(sum(CASE WHEN in_a = 1 AND in_b = 1
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
                   round(CAST(sum(CASE WHEN in_a = 1 AND in_b = 1
                                  THEN 1 ELSE 0 END) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) AS jaccard_est
            FROM ranked WHERE rn <= 100
            GROUP BY g_a, g_b
        """,
        "quantiles_tdigest": """
            WITH q AS (
              SELECT quantile_cont(CAST(n_chars AS DOUBLE),
                                   [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS qs
              FROM documents
            )
            SELECT CAST(ps.p AS DOUBLE) AS p,
                   round(qs[ps.i], 4) AS q_exact,
                   TRUE AS rank_ok
            FROM q, (VALUES (1, 0.1), (2, 0.25), (3, 0.5),
                            (4, 0.75), (5, 0.9), (6, 0.99)) ps(i, p)
        """,
        "referential_salted": f"""
            SELECT doc_id, coalesce(CAST(source AS VARCHAR), 'null') AS observed
            FROM documents WHERE source NOT IN ({_SRC_LIST}) OR source IS NULL
        """,
        "quality_model": f"""
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN length(trim({_NORM})) = 0
                          THEN CAST([] AS VARCHAR[])
                          ELSE string_split(trim({_NORM}), ' ') END AS toks
              FROM documents
            ), feats AS (
              SELECT doc_id,
                     list_concat(
                       toks,
                       CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[])
                            ELSE list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i+1]) END
                     ) AS fs
              FROM t
            ), scored AS (
              SELECT doc_id,
                     CAST(len(fs) AS BIGINT) AS n_features,
                     CAST(coalesce(list_sum(list_transform(fs,
                       f -> ('0x' || substr(md5(f), 1, 15))::BIGINT % 1000 - 500
                     )), 0) AS BIGINT) AS score_milli
              FROM feats
            )
            SELECT doc_id, n_features, score_milli,
                   CASE WHEN n_features = 0 THEN 'drop'
                        WHEN score_milli * 1000 >= 0 THEN 'keep'
                        ELSE 'drop' END AS quality_label
            FROM scored
        """,
        "text_repetition": f"""
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN length(trim({_NORM})) = 0
                          THEN CAST([] AS VARCHAR[])
                          ELSE string_split(trim({_NORM}), ' ') END AS toks
              FROM documents
            ), b AS (
              SELECT doc_id, toks,
                     list_transform(range(1, len(toks)),
                                    i -> toks[i] || ' ' || toks[i+1]) AS bi
              FROM t
            )
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_words,
                   round(CASE WHEN len(toks) = 0 THEN 0.0
                         ELSE 1.0 - len(list_distinct(toks))
                                    / CAST(len(toks) AS DOUBLE) END,
                         6) AS dup_word_frac,
                   round(CASE WHEN len(bi) = 0 THEN 0.0
                         ELSE 1.0 - len(list_distinct(bi))
                                    / CAST(len(bi) AS DOUBLE) END,
                         6) AS dup_bigram_frac
            FROM b
        """,
        "validate_estimate": f"""
            WITH s AS (
              SELECT * FROM documents
              WHERE substr(md5(concat_ws(':', CAST(doc_id AS VARCHAR),
                                         '{_EST_SEED}')), 1, 8)
                    < '{rate_threshold(_EST_FRAC)}'
            ), a AS (
              SELECT count(*) AS n,
                CAST(sum(CASE WHEN doc_id IS NULL
                              THEN 1 ELSE 0 END) AS BIGINT) AS v0,
                CAST(sum(CASE WHEN NOT coalesce(n_chars = length(text), TRUE)
                              THEN 1 ELSE 0 END) AS BIGINT) AS v1,
                CAST(sum(CASE WHEN NOT coalesce({_P_NCHARS}, TRUE)
                              THEN 1 ELSE 0 END) AS BIGINT) AS v2,
                CAST(sum(CASE WHEN NOT coalesce({_P_LANG}, TRUE)
                              THEN 1 ELSE 0 END) AS BIGINT) AS v3,
                CAST(sum(CASE WHEN NOT coalesce({_P_SRC_FMT}, TRUE)
                              THEN 1 ELSE 0 END) AS BIGINT) AS v4,
                CAST(sum(CASE WHEN {_P_ZH_FAIL}
                              THEN 1 ELSE 0 END) AS BIGINT) AS v5
              FROM s
            ), l AS (
              SELECT 'doc_id_not_null' AS constraint_id, n, v0 AS v FROM a
              UNION ALL SELECT 'n_chars_consistent', n, v1 FROM a
              UNION ALL SELECT 'n_chars_bounds', n, v2 FROM a
              UNION ALL SELECT 'lang_allowed', n, v3 FROM a
              UNION ALL SELECT 'source_format', n, v4 FROM a
              UNION ALL SELECT 'zh_n_chars_cap', n, v5 FROM a
            ), w AS (
              SELECT constraint_id, n, v,
                     CAST(v AS DOUBLE) / CAST(n AS DOUBLE) AS phat,
                     CAST(n AS DOUBLE) AS nd
              FROM l
            )
            SELECT constraint_id,
                   n AS n_sampled,
                   v AS n_violations,
                   round(phat, 6) AS est_rate,
                   round(greatest(0.0,
                     ((phat + {_EST_Z2!r} / (2.0 * nd))
                      - {_EST_Z!r} * sqrt((phat * (1.0 - phat)
                                           + {_EST_Z2!r} / (4.0 * nd)) / nd))
                     / (1.0 + {_EST_Z2!r} / nd)), 6) AS ci_lo,
                   round(least(1.0,
                     ((phat + {_EST_Z2!r} / (2.0 * nd))
                      + {_EST_Z!r} * sqrt((phat * (1.0 - phat)
                                           + {_EST_Z2!r} / (4.0 * nd)) / nd))
                     / (1.0 + {_EST_Z2!r} / nd)), 6) AS ci_hi
            FROM w
        """,
        "fd_check": """
            WITH f AS (
              SELECT CAST(c_custkey AS BIGINT) AS id,
                     CAST(c_custkey % 300 AS BIGINT) AS shard,
                     CASE WHEN c_custkey % 911 = 0 THEN 'XX'
                          ELSE substr(md5(CAST(CAST(c_custkey % 300 AS BIGINT)
                                               AS VARCHAR)), 1, 4)
                     END AS label
              FROM customer
            ), g AS (
              SELECT shard,
                     COUNT(DISTINCT label)
                       + MAX(CASE WHEN label IS NULL THEN 1 ELSE 0 END) AS n_dep
              FROM f GROUP BY shard
            )
            SELECT f.id,
                   'shard_label_fd' AS constraint_id,
                   CAST(f.shard AS VARCHAR) || ' -> ' || COALESCE(f.label, 'null')
                     || ' (distinct=' || CAST(g.n_dep AS VARCHAR) || ')' AS observed
            FROM f JOIN g USING (shard)
            WHERE g.n_dep > 1
        """,
        "events_in_windows": """
            WITH w(window_id, start_us, end_us) AS (VALUES {windows}),
            e AS (
              SELECT event_id, user_id, value, epoch_us(ts) AS ts_us
              FROM events
            )
            SELECT w.window_id,
                   count(*) AS n_events,
                   count(DISTINCT e.user_id) AS n_users,
                   round(sum(e.value), 2) AS value_sum
            FROM e JOIN w
              ON e.ts_us BETWEEN w.start_us AND w.end_us
            GROUP BY 1
        """.format(
            windows=", ".join(f"({i}, {s}, {e})" for i, s, e in _RJ_WINDOWS)
        ),
        "events_rollup": """
            WITH b AS (
              SELECT CAST(floor(epoch_us(ts) / 86400000000.0)
                          * 86400000000 AS BIGINT) AS day_us,
                     CAST(floor(epoch_us(ts) / 3600000000.0)
                          * 3600000000 AS BIGINT) AS hour_us,
                     value
              FROM events
            )
            SELECT day_us, hour_us,
                   CASE WHEN GROUPING(hour_us) = 0 THEN 'hour'
                        WHEN GROUPING(day_us) = 0 THEN 'day'
                        ELSE 'total' END AS grain,
                   count(*) AS n_events,
                   round(sum(value), 2) AS value_sum
            FROM b GROUP BY ROLLUP (day_us, hour_us)
        """,
        "kmv_distinct": """
            WITH h AS (
              SELECT DISTINCT
                     substr(md5(CAST(doc_id AS VARCHAR) || ':kmv'), 1, 8)
                       AS hx
              FROM documents WHERE doc_id IS NOT NULL
            ), m AS (
              SELECT hx FROM h ORDER BY hx LIMIT 256
            ), kth AS (
              SELECT CAST(count(*) AS BIGINT) AS k, max(hx) AS kth_hex
              FROM m
            ), ex AS (
              SELECT CAST(count(DISTINCT doc_id) AS BIGINT)
                       AS exact_distinct
              FROM documents WHERE doc_id IS NOT NULL
            ), est AS (
              -- under-full sketch (k < 256) holds every distinct hash:
              -- exact count, not the (k-1)/frac estimator (matches
              -- kmv_distinct_estimate's ADVICE-r3 small-input rule)
              SELECT k, kth_hex,
                     CASE WHEN k < 256 THEN CAST(k AS DOUBLE)
                          ELSE round((k - 1) / (('0x' || kth_hex)::BIGINT
                                                / 4294967296.0), 4)
                     END AS est_distinct
              FROM kth
            )
            SELECT k, kth_hex, est_distinct, exact_distinct,
                   abs(est_distinct - exact_distinct)
                     / exact_distinct < 0.2 AS rel_ok
            FROM est, ex
        """,
        "events_sessions_detail": """
            WITH flagged AS (
              SELECT user_id, value, epoch_us(ts) AS ts_us,
                     CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                  > 1800 * 1000000
                          THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
            ), numbered AS (
              SELECT user_id, value, ts_us,
                     CAST(SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts_us
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) - 1 AS BIGINT) AS session_id
              FROM flagged
            )
            SELECT user_id, session_id,
                   min(ts_us) AS start_us,
                   max(ts_us) - min(ts_us) AS duration_us,
                   count(*) AS n_events,
                   round(sum(value), 2) AS value_sum
            FROM numbered GROUP BY 1, 2
        """,
        "events_asof": """
            WITH clicks AS (
              SELECT event_id, user_id, ts, value FROM events
              WHERE event_type = 'click'
            ), views AS (
              -- one row per (user_id, ts), arg-max by event_id: pins
              -- ASOF tie semantics identically to the Spark side
              SELECT user_id, ts, arg_max(value, event_id) AS value
              FROM events WHERE event_type = 'view'
              GROUP BY 1, 2
            )
            SELECT c.event_id, c.user_id,
                   round(c.value, 2) AS value,
                   round(v.value, 2) AS view_value
            FROM clicks c ASOF LEFT JOIN views v
              ON c.user_id = v.user_id AND c.ts >= v.ts
        """,
        "seq_packing": f"""
            WITH base AS (
              SELECT source, doc_id, CAST(n_tok AS BIGINT) AS n_tok,
                     md5(CAST(doc_id AS VARCHAR) || ':42') AS okey
              FROM read_parquet('{SEQ_FIXTURE}')
              WHERE doc_id IS NOT NULL AND n_tok IS NOT NULL
            ), asg AS (
              -- integer // (not floor of a double quotient): exact
              -- chunk boundaries for any max_tokens (ADVICE r3)
              SELECT source, substr(okey, 1, 1) AS shard, n_tok,
                     CAST((SUM(n_tok) OVER w - n_tok) // 8192
                          AS BIGINT) AS pack_id
              FROM base
              WINDOW w AS (PARTITION BY source, substr(okey, 1, 1)
                           ORDER BY okey, n_tok
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW)
            )
            SELECT source, shard, pack_id, count(*) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS pack_tokens
            FROM asg GROUP BY 1, 2, 3
        """,
        # Every queries() entry above carries a DuckDB oracle — zero
        # rows-only entries (test_entry_contract asserts this).
    }
