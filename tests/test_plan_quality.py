"""Physical-plan quality gates (SURVEY.md §4): pushdown, pruning,
broadcast, codegen — asserted on .explain output so regressions that
silently de-optimize the 100 TB plan fail CI."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_to_parquet(spark):
    # other test modules may have cached this path → InMemoryTableScan
    # would (legitimately) replace the FileScan; test the scan itself
    spark.catalog.clearCache()
    df = spark.read.parquet(f"{SF}/documents.parquet").where(
        F.col("doc_id") < 120
    ).select("doc_id", "text")
    plan = plan_of(df)
    assert "PushedFilters" in plan and "LessThan(doc_id,120)" in plan


def test_column_pruning_reaches_scan(spark):
    spark.catalog.clearCache()
    df = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    plan = plan_of(df)
    # ReadSchema must not contain text (the wide column)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "text" not in read_schema[0]


def test_validation_plan_prunes_and_pushes(spark):
    """The flagship validation reads only the constraint columns and
    keeps the row pass shuffle-free."""
    from medea_ps_spark.operators import validator as V

    df, compiled = em._validated(spark, SF)
    validated = V.validate(df.select("doc_id", "n_chars", "text", "lang", "source"), compiled)
    plan = plan_of(validated)
    assert "Exchange" not in plan
    # '*(n)' marks whole-stage-codegen'd operators in toString()
    assert "*(" in plan


def test_referential_join_is_broadcast(spark):
    df = em.q_referential_violations(spark, SF)
    assert "BroadcastHashJoin" in plan_of(df)


def test_orders_join_is_broadcast(spark):
    df = em.q_orders_by_segment(spark, SF)
    assert "BroadcastHashJoin" in plan_of(df)


def test_unique_violation_join_left_to_aqe(spark):
    """VERDICT r2 item 3: the dup-key join must NOT carry a forced
    broadcast hint (the dup set is unbounded — 0.1% of 10^12 keys is
    10^9). With a tiny dup set AQE converts to broadcast at runtime;
    with broadcast disabled the same code must fall back to a shuffled
    join — a hard-coded F.broadcast would ignore the threshold."""
    from medea_ps_spark.operators import validator as V
    from medea_ps_spark.plans.constraints import Unique

    few_rows = [(f"d{i:04d}", i) for i in range(2000)] + [("d0000", -1)]
    few_dups = spark.createDataFrame(few_rows, "doc_id string, n bigint")
    small = V.unique_violations(few_dups, Unique("u", "doc_id"), "doc_id")
    # collect() (not count(), which builds a separate query execution)
    # finalizes THIS DataFrame's adaptive plan
    assert len(small.collect()) == 2
    final = plan_of(small)  # post-execution: AQE's final plan
    assert "BroadcastHashJoin" in final, final  # tiny dup set -> broadcast

    rows = [(f"d{i % 500:04d}", i) for i in range(5000)]  # every key dup'd
    dup_heavy = spark.createDataFrame(rows, "doc_id string, n bigint")
    for key in ("spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.autoBroadcastJoinThreshold"):
        spark.conf.set(key, "-1")
    try:
        out = V.unique_violations(dup_heavy, Unique("u", "doc_id"), "doc_id")
        assert len(out.collect()) == 5000
        final = plan_of(out)
        assert "BroadcastHashJoin" not in final, final
        assert "SortMergeJoin" in final or "ShuffledHashJoin" in final, final
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_histogram_is_two_phase_agg(spark):
    df = em.q_histogram_n_chars(spark, SF)
    plan = plan_of(df)
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "SortMergeJoin" not in plan


def test_bucketed_join_has_no_exchange(spark):
    """Co-located join: same key, same bucket count ⇒ no shuffle on
    either side (SURVEY.md §4 partitioning row)."""
    from medea_ps_spark.sources.tables import write_bucketed
    from medea_ps_spark.sources.synthetic import sequences

    a = sequences(spark, 2000, seed=31).select("doc_id", "n_tok")
    b = sequences(spark, 2000, seed=31).select("doc_id", "source")
    write_bucketed(a, "bq_a", "doc_id", num_buckets=8)
    write_bucketed(b, "bq_b", "doc_id", num_buckets=8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bq_a").join(spark.table("bq_b"), "doc_id")
        plan = plan_of(j)
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bq_a")
        spark.sql("DROP TABLE IF EXISTS bq_b")


def test_minhash_signature_no_shuffle(spark):
    from medea_ps_spark.operators.dedup import minhash_signature

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sigs = minhash_signature(docs, num_hashes=16)
    assert "Exchange" not in plan_of(sigs)


def test_seq_fixture_queries_join_strategies(spark):
    """Hot-path table checks keep their scale-safe join shapes:
    referential = broadcast anti-join (no fact shuffle), uniqueness =
    hash-agg + broadcast-back (no sort-merge join anywhere)."""
    ref = em.q_seq_referential_violations(spark, SF)
    assert "BroadcastHashJoin" in plan_of(ref)
    assert "SortMergeJoin" not in plan_of(ref)
    uniq = em.q_seq_unique_violations(spark, SF)
    uniq.collect()
    # dup-key join is AQE-decided: the fixture's dup set is tiny, so the
    # FINAL adaptive plan must have converted it to broadcast
    assert "BroadcastHashJoin" in plan_of(uniq)


def test_ivf_list_layout_prunes_partitions(spark, tmp_path):
    """The IVF scale path: corpus written partitioned by ivf_list means
    a probe of n_probe lists scans ONLY those partitions — the filter
    must land in the scan's PartitionFilters, not a post-scan Filter."""
    import numpy as np
    from medea_ps_spark.operators import ivf as IVF

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    cent = IVF.train_centroids(emb, k=4, sample=500, iters=4, seed=5)
    path = str(tmp_path / "ivf_corpus")
    IVF.assign_lists(emb, cent).write.partitionBy("ivf_list").parquet(path)
    spark.catalog.clearCache()
    probed = spark.read.parquet(path).where(F.col("ivf_list").isin([0, 2]))
    plan = plan_of(probed)
    part_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part_lines and "ivf_list" in part_lines[0], plan


def test_write_sorted_rowgroups_are_zone_map_prunable(spark, tmp_path):
    """write_sorted must produce row groups whose min/max stats on the
    sort column are narrow and non-overlapping across files, so a range
    predicate can skip whole row groups — checked against the actual
    parquet footer metadata, not the plan."""
    import glob

    import pyarrow.parquet as pq

    from medea_ps_spark.sources.tables import write_sorted
    from medea_ps_spark.sources.synthetic import sequences

    df = sequences(spark, 20_000, seed=17).select("doc_id", "n_tok")
    path = str(tmp_path / "sorted")
    write_sorted(df.where(F.col("doc_id").isNotNull()), path, "n_tok",
                 num_files=4)
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.row_group(rg).num_columns)
                if md.row_group(rg).column(i).path_in_schema == "n_tok"
            )
            spans.append((col.statistics.min, col.statistics.max))
    assert len(spans) >= 4
    spans.sort()
    # prunability = DISJOINT spans (equal-frequency ranges are wide at
    # the tail of a skewed column — that's fine; what matters is that a
    # point/range predicate overlaps few row groups)
    overlaps = sum(
        1 for (a0, a1), (b0, b1) in zip(spans, spans[1:]) if a1 >= b0
    )
    assert overlaps <= len(spans) // 4, spans


def test_clean_corpus_audit_is_one_job(spark):
    """The cleaning report must come from ONE aggregation pass (stage
    flags + single agg), not one full-lineage count per stage — at
    100 TB each extra count is a corpus scan."""
    from medea_ps_spark.operators.pipeline import clean_corpus

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sc = spark.sparkContext
    group = "clean-corpus-audit-gate"
    # AQE legitimately splits one action into per-shuffle-stage jobs;
    # disable it so job count == action count (what the gate is about:
    # no per-stage lineage re-execution)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup(group, "audit job count")
    try:
        _, rep = clean_corpus(docs, near_dup=False, allowed_langs=["en"],
                              lang_col="lang")
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        assert len(jobs) == 1, f"audit ran {len(jobs)} jobs: {jobs}"
    finally:
        sc.setJobGroup("", "")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert rep.input_rows > 0
    assert rep.after_language <= rep.after_quality <= rep.after_exact_dedup


def test_ann_rerank_is_two_phase_topk(spark):
    """VERDICT r2 item 1: the ANN re-rank must not hash-partition all
    scored rows by query_id alone (one task per query). The two-phase
    shape = a local window keyed by (query_id, _topk_pid) — the exchange
    spreads (query, partition) pairs across all tasks — then the global
    window over the ≤ k×partitions survivors."""
    import re

    for q in (em.q_ann_topk, em.q_ann_lsh, em.q_ann_ivf):
        plan = plan_of(q(spark, SF))
        assert plan.count("Window") >= 2, plan
        # the first (deepest) exchange feeding a window must carry the
        # salt column alongside query_id
        parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
        salted = [p for p in parts if "_topk_pid" in p and "query_id" in p]
        assert salted, plan
        # and no exchange may partition the full scored set by query_id
        # alone BELOW the salted one (string order: executed plans print
        # top-down, the salted exchange appears after/below the final
        # query_id-only exchange that ranks the survivors)
        assert plan.rindex("_topk_pid") > plan.index("hashpartitioning"), plan


def test_events_top_users_is_two_phase_topk(spark):
    plan = plan_of(em.q_events_top_users(spark, SF))
    assert plan.count("Window") >= 2, plan
    assert "_topk_pid" in plan, plan


def test_sampling_is_shuffle_free_filter(spark):
    """Hash sampling must stay a pure codegen'd scan+filter: no
    exchange, no UDF — the keep decision is an md5 expression."""
    from medea_ps_spark.operators.sampling import stratified_mixture

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    samp = stratified_mixture(
        docs, {"src0": 1.0, "src1": 0.5}, default_rate=0.1
    )
    plan = plan_of(samp)
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "*(" in plan  # whole-stage codegen


def test_packing_is_single_shuffle(spark):
    """pack_assignments = one exchange (the running-sum window's own
    (strat, shard) partitioning); tokens never shuffle, only
    (id, n_tok, key) tuples."""
    from medea_ps_spark.operators.packing import pack_assignments
    from medea_ps_spark.sources.synthetic import sequences

    seq = sequences(spark, 5000, seed=13)
    asg = pack_assignments(seq.where(F.col("doc_id").isNotNull()
                                     & F.col("n_tok").isNotNull()),
                           max_tokens=4096)
    plan = plan_of(asg)
    assert plan.count("Exchange") == 1, plan
    # the window's exchange must be keyed by (source, shard)
    assert "hashpartitioning(source" in plan, plan


def test_lsh_family_single_scan(spark):
    """Multi-table SRP-LSH must compute every table's bucket in one
    projection (exploded (t,b) rows), not loop scan+join+union per
    table: the ANN query reads the embeddings file exactly twice
    (corpus side + query side), the near-dup self-join exactly twice
    (the two join sides) — not 2x or 8x that."""
    from medea_ps_spark.operators.similarity import cosine_near_duplicates

    spark.catalog.clearCache()
    plan = plan_of(em.q_ann_lsh(spark, SF))
    assert plan.count("FileScan parquet") == 2, plan

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    nd = cosine_near_duplicates(emb, threshold=0.9, n_planes=4, n_tables=4)
    assert plan_of(nd).count("FileScan parquet") == 2, plan_of(nd)


def test_sessionize_salted_event_shuffle_is_bucketed(spark):
    """Hot-key sessionize: the FULL event volume must shuffle exactly
    once, on (key, bucket) — never on the bare key (that would re-
    concentrate the hot key). The only other hash exchange carries the
    one-row-per-(key, bucket) summary."""
    from medea_ps_spark.operators.sessions import sessionize_salted

    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = sessionize_salted(ev, 1800, ("user_id",), "ts",
                            bucket_seconds=6 * 3600)
    plan = plan_of(out)
    # the event-volume window partitions by (user_id, _bkt)
    assert "windowspecdefinition(user_id" in plan and "_bkt" in plan, plan
    # 3 hash exchanges total: full-width events on (user_id, _bkt), the
    # COLUMN-PRUNED (key, ts, bkt) summary branch on the same key (the
    # pruning is why the full exchange isn't reused — and why the
    # second shuffle is narrow), and the tiny per-key summary window
    n_hash = plan.count("Exchange hashpartitioning")
    assert n_hash <= 3, plan
    bucketed = [
        seg for seg in plan.split("Exchange hashpartitioning(")[1:]
        if seg[: seg.index(")")].find("_bkt") >= 0
    ]
    assert 1 <= len(bucketed) <= 2, plan
    # every window over raw events is bucket-split: no window sorts on
    # the bare key below the aggregate (grep the Sort specs)
    for seg in plan.split("Sort [")[1:]:
        spec = seg[: seg.index("]")]
        if "user_id" in spec and "_ts_us" in spec:
            assert "_bkt" in spec, plan


def test_asof_salted_no_candidate_explosion(spark):
    """Hot-key as-of: still NO join node on the event path (the union +
    window construction), buckets partition every window over the full
    volume, and the only joins are the tiny carry-in attach."""
    from medea_ps_spark.operators.asof import asof_join_salted

    ev = spark.read.parquet(f"{SF}/events.parquet")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", "value", "event_id"
    )
    out = asof_join_salted(
        clicks, views, ["user_id"], "ts", ["value"],
        bucket_width_us=6 * 3600 * 1_000_000, tiebreak_cols=["event_id"],
    )
    plan = plan_of(out)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # full-volume windows all run per (user_id, _bkt)
    assert "windowspecdefinition(user_id" in plan and "_bkt" in plan, plan
    # the union of both sides shuffles once, bucketed
    bucketed = [
        seg for seg in plan.split("Exchange hashpartitioning(")[1:]
        if seg[: seg.index(")")].find("_bkt") >= 0
    ]
    assert len(bucketed) <= 2, plan


def test_lmscore_join_input_is_preaggregated(spark):
    """VERDICT r4 #4: the unigram-LM scoring join must consume distinct
    (doc, word) pairs with local counts — NOT raw token occurrences
    (10^12 rows at corpus scale). Gate: a (doc_id, word)-keyed
    aggregate sits between the explode and the word join, and the
    post-join aggregate is the count-weighted mean (sum(_k * logp))."""
    import re

    from medea_ps_spark.operators.lmscore import unigram_lm_scores

    spark.catalog.clearCache()
    df = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(unigram_lm_scores(df, "text", "doc_id"))
    # pre-aggregation feeding the scoring join
    assert re.search(r"HashAggregate\(keys=\[doc_id#\d+L?, word#", plan), plan
    # weighted-mean aggregate consumes the local counts
    assert re.search(r"sum\(\(cast\(_k#\d+L as double\) \* LOG2", plan), plan
    # freq side broadcasts (counts move, not text)
    assert "BroadcastHashJoin" in plan, plan


def test_quality_model_is_map_only(spark):
    """Round-5 hashed-feature classifier: tokenize→hash→weigh→sum must
    all live in ONE codegen'd projection over the scan — any Exchange
    or join here would be a 100 TB regression."""
    spark.catalog.clearCache()
    plan = plan_of(em.q_quality_model(spark, SF))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    # (higher-order-function lambdas are CodegenFallback in Spark, so
    # the Project sits outside a WholeStageCodegen span — the gates
    # that matter are: no shuffle, no join, 2-column pruned scan)
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan, plan


def test_table_diff_is_single_outer_join(spark):
    """Snapshot diff: one full-outer equi-join on the key, never a
    nested-loop/cartesian plan; the changed-cols CASE chain stays in
    the projection."""
    spark.catalog.clearCache()
    plan = plan_of(em.q_table_diff(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "FullOuter" in plan, plan


def test_dedup_incremental_is_anti_join_on_digests(spark):
    """Batch-vs-corpus dedup: the corpus side reduces to DISTINCT
    16-byte fingerprints (partial agg) before a LEFT ANTI join — no
    text bytes move through the shuffle."""
    import re

    spark.catalog.clearCache()
    plan = plan_of(em.q_dedup_incremental(spark, SF))
    assert "LeftAnti" in plan, plan
    # corpus side pre-aggregated to distinct fingerprints
    assert re.search(r"HashAggregate\(keys=\[fingerprint#\d+\]", plan), plan
    # only digests cross the anti-join shuffle: no text column survives
    # past the fingerprint projections into an exchange
    for seg in plan.split("Exchange hashpartitioning(")[1:]:
        assert not seg[: seg.index(")")].startswith("text#"), plan


def test_cms_build_is_bounded_partial_agg_and_probe_is_broadcast(spark):
    """Count-Min build: explode pipelines into a partial hash-agg, so
    the one shuffle carries ≤ depth×width counter rows per task, never
    the token stream. Probe: the sketch side broadcasts — the item side
    must not shuffle for the join."""
    from medea_ps_spark.operators import sketches as SK

    df = spark.read.parquet(f"{SF}/documents.parquet").select("lang")
    sk = SK.count_min_sketch(df, "lang", depth=4, width=256)
    plan = plan_of(sk)
    assert plan.count("HashAggregate") >= 2, plan  # partial + final
    assert plan.count("Exchange") == 1, plan

    est = SK.cms_estimate(sk, df, "lang", depth=4, width=256)
    eplan = plan_of(est)
    assert "BroadcastHashJoin" in eplan or "BroadcastExchange" in eplan, eplan
    assert "SortMergeJoin" not in eplan, eplan


def test_violation_sample_two_exchanges_one_scan(spark):
    """sample_violation_rows adds exactly TWO hash exchanges to a
    row-level violation stream — (constraint_id, input-partition) for
    the local rank/count phase, then (constraint_id) for the global
    re-rank — and derives counts from the same shuffle, so the data is
    scanned exactly once."""
    from medea_ps_spark.operators import validator as V

    spark.catalog.clearCache()
    df, compiled = em._validated(spark, SF)
    viol = V.violation_rows(V.validate(df, compiled))
    plan = plan_of(V.sample_violation_rows(viol, limit=5))
    segs = [
        seg[: seg.index(")")]
        for seg in plan.split("Exchange hashpartitioning(")[1:]
    ]
    assert len(segs) == 2, plan
    assert sum("_vio_pid" in s for s in segs) == 1, plan
    assert all("constraint_id" in s for s in segs), plan
    assert plan.count("Scan parquet") == 1, plan


def test_vocab_minima_is_two_phase_topk_over_one_explode(spark):
    """The KMV sketch derivation must be: one explode -> partial
    distinct -> two-phase per-group top-k. No cartesian anywhere."""
    from medea_ps_spark.operators.vocab import token_vocab_minima

    df = spark.read.parquet("/root/repo/tests/fixtures/sequences_small.parquet")
    plan = plan_of(token_vocab_minima(df, k=50))
    assert plan.count("Generate explode") == 1, plan
    assert "_topk_pid" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # partial+final distinct: two HashAggregates before the windows
    assert plan.count("HashAggregate") >= 2, plan


def test_vocab_pairs_reuse_cached_sketch(spark):
    """kmv_jaccard_pairs references the sketch three times; with the
    default cache=True the corpus-scanning derivation must appear as
    an InMemory reuse, not three explode subtrees."""
    from medea_ps_spark.operators.vocab import (
        kmv_jaccard_pairs,
        token_vocab_minima,
    )

    df = spark.read.parquet("/root/repo/tests/fixtures/sequences_small.parquet")
    out = kmv_jaccard_pairs(token_vocab_minima(df, k=30), k=30)
    plan = plan_of(out)
    # every reference to the sketch must resolve to a cache scan (the
    # explode text below InMemoryRelation is the cached relation's
    # description, not live execution); exact site counts are brittle
    # (Spark's cache manager also substitutes plan-equal subtrees)
    assert plan.count("InMemoryTableScan") >= 3, plan
    assert "CartesianProduct" not in plan, plan


def test_divergence_counts_cached_and_totals_broadcast(spark):
    """The (group,bucket) histogram must compute once (cached reuse)
    and the per-group totals join must be a broadcast."""
    from medea_ps_spark.operators.divergence import source_divergence_matrix

    df = spark.read.parquet("/root/repo/tests/fixtures/sequences_small.parquet")
    plan = plan_of(source_divergence_matrix(df, n_buckets=64))
    # reuse sites: totals, group list, and both pair sides
    assert plan.count("InMemoryTableScan") >= 4, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
