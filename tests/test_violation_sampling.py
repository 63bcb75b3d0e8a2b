"""Bounded violation-exemplar sink (validator.sample_violation_rows /
sampled_violations, runner violation_limit="sampled" sink): at most N
deterministic md5-keyed exemplar rows per constraint, exact totals
riding the same shuffle, layout-independent output, sink-mode lattice
(rows > sampled > metrics), and evolution over sampled entries.
"""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.jobs.validate_job import build_registry
from medea_ps_spark.operators import validator as V
from medea_ps_spark.operators.runner import (
    evolve_checkpointed_validation,
    run_checkpointed_validation,
)
from medea_ps_spark.sources import synthetic
from medea_ps_spark.sources.synthetic import ALLOWED_SOURCES

LIMIT = 7


def _registry():
    return build_registry(vocab=50257, max_len=128,
                          allowed_sources=ALLOWED_SOURCES)


@pytest.fixture(scope="module")
def seq_df(spark):
    # max_len=128 in the registry vs the generator's default → plenty of
    # n_tok_bounds violations on top of the seeded ~0.1-0.2% rates
    return synthetic.sequences(spark, 3_000, seed=33)


def _key(doc_id, constraint_id, observed):
    blob = "\x1f".join(
        [
            doc_id if doc_id is not None else "\x00",
            constraint_id,
            observed if observed is not None else "\x00",
        ]
    )
    return hashlib.md5(blob.encode()).hexdigest()


def _expected(viol_rows, limit):
    """Pure-Python reference: per constraint, sort by (md5 key), take
    ``limit``, rank 1.., n_total = full count."""
    by_c = {}
    for r in viol_rows:
        by_c.setdefault(r["constraint_id"], []).append(r)
    out = set()
    for cid, rows in by_c.items():
        rows = sorted(rows, key=lambda r: _key(r["doc_id"], cid, r["observed"]))
        for rank, r in enumerate(rows[:limit], start=1):
            out.add((r["doc_id"], cid, r["observed"], rank, len(rows)))
    return out


def test_sample_matches_python_reference(spark, seq_df):
    compiled = _registry().compile(seq_df.schema, root="$start")
    full = V.all_violations(seq_df, compiled).collect()
    assert len(full) > 5 * LIMIT  # the cap actually bites
    got = {
        tuple(r)
        for r in V.sampled_violations(seq_df, compiled, limit=LIMIT).collect()
    }
    assert got == _expected(full, LIMIT)


def test_layout_independent(spark, seq_df):
    """The exemplar set, ranks, and totals must not depend on the input
    partitioning (content-based order key + two-phase rank)."""
    compiled = _registry().compile(seq_df.schema, root="$start")
    a = V.sampled_violations(
        seq_df.repartition(13, "doc_id"), compiled, limit=LIMIT
    ).collect()
    b = V.sampled_violations(seq_df.coalesce(1), compiled, limit=LIMIT).collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}


def test_totals_exact_under_tiny_limit(spark, seq_df):
    """limit=1 keeps one exemplar per constraint but n_total stays the
    exact full count (counts ride rank-1 survivors of every cell)."""
    compiled = _registry().compile(seq_df.schema, root="$start")
    full = V.all_violations(seq_df, compiled)
    true_counts = {
        r["constraint_id"]: r["n"]
        for r in full.groupBy("constraint_id").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    one = V.sampled_violations(seq_df, compiled, limit=1).collect()
    assert len(one) == len(true_counts)
    assert {r["constraint_id"]: r["n_total"] for r in one} == true_counts
    assert all(r["rank"] == 1 for r in one)


def test_limit_validation(spark, seq_df):
    compiled = _registry().compile(seq_df.schema, root="$start")
    with pytest.raises(ValueError):
        V.sampled_violations(seq_df, compiled, limit=0).collect()


# -- runner integration --------------------------------------------------------


@pytest.fixture(scope="module")
def table_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("vsamp") / "sequences")
    synthetic.sequences(spark, 3_000, seed=33).write.mode(
        "overwrite"
    ).partitionBy("source").parquet(p)
    return p


def test_runner_sampled_sink(spark, table_path, tmp_path):
    ck = str(tmp_path / "ck")
    reg = _registry()
    res = run_checkpointed_validation(
        spark, table_path, reg, ck, violation_limit=LIMIT
    )
    assert len(res) > 2
    # full-run ground truth for counts, per partition
    ck_rows = str(tmp_path / "ck_rows")
    run_checkpointed_validation(spark, table_path, reg, ck_rows)
    for p, m in res.items():
        sdir = os.path.join(ck, "out", f"source={p}", "violations_sample")
        assert os.path.isdir(sdir)
        assert not os.path.exists(
            os.path.join(ck, "out", f"source={p}", "violations")
        )
        samp = spark.read.parquet(sdir)
        per_c = {
            r["constraint_id"]: (r["n"], r["nt"])
            for r in samp.groupBy("constraint_id")
            .agg(F.count(F.lit(1)).alias("n"), F.max("n_total").alias("nt"))
            .collect()
        }
        true_counts = {
            r["constraint_id"]: r["n"]
            for r in spark.read.parquet(
                os.path.join(ck_rows, "out", f"source={p}", "violations")
            )
            .groupBy("constraint_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        for cid, n_true in true_counts.items():
            n_samp, n_tot = per_c[cid]
            assert n_samp == min(LIMIT, n_true)
            assert n_tot == n_true
        # manifest metrics mirror the exact counts
        assert m["violation_counts"] == true_counts
        assert m["violation_limit"] == LIMIT
        assert "n_table_violations" in m
    # the anomaly monitor lifts the per-constraint exact counts from
    # sampled-sink manifests: violation_counts.<name> totals over
    # partitions equal the full-run ground truth
    from medea_ps_spark.operators.anomaly import metrics_from_manifest

    lifted = metrics_from_manifest(ck)
    global_true = {}
    for p in res:
        for cid, n in res[p]["violation_counts"].items():
            global_true[cid] = global_true.get(cid, 0) + n
    for cid, n in global_true.items():
        assert lifted[f"violation_counts.{cid}"] == float(n)
    assert lifted["n_violations"] == float(sum(global_true.values()))


def test_metrics_only_and_limit_exclusive(spark, table_path, tmp_path):
    with pytest.raises(ValueError):
        run_checkpointed_validation(
            spark, table_path, _registry(), str(tmp_path / "ck"),
            metrics_only=True, violation_limit=5,
        )
    with pytest.raises(ValueError):
        run_checkpointed_validation(
            spark, table_path, _registry(), str(tmp_path / "ck"),
            violation_limit=0,
        )


def test_sink_lattice(spark, table_path, tmp_path):
    """rows > sampled > metrics: a rerun asking for MORE than an entry
    materialized reprocesses it; asking for less (or equal) skips."""
    ck = str(tmp_path / "ck")
    reg = _registry()
    first = run_checkpointed_validation(
        spark, table_path, reg, ck, violation_limit=LIMIT
    )
    assert first
    # metrics request: sampled entries cover it → all skipped
    assert run_checkpointed_validation(
        spark, table_path, reg, ck, metrics_only=True
    ) == {}
    # sampled request again: covered → skipped
    assert run_checkpointed_validation(
        spark, table_path, reg, ck, violation_limit=LIMIT
    ) == {}
    # smaller limit: the recorded limit's exemplars are a superset and
    # counts are exact → covered, skipped
    assert run_checkpointed_validation(
        spark, table_path, reg, ck, violation_limit=max(1, LIMIT - 4)
    ) == {}
    # LARGER limit: the extra exemplars were never materialized →
    # everything reprocesses at the new limit
    bigger = run_checkpointed_validation(
        spark, table_path, reg, ck, violation_limit=LIMIT + 5
    )
    assert set(bigger) == set(first)
    assert all(m["violation_limit"] == LIMIT + 5 for m in bigger.values())
    # rows request: NOT covered → everything reprocesses, rows appear —
    # and the superseded sample parquet is removed (no stale siblings)
    full = run_checkpointed_validation(spark, table_path, reg, ck)
    assert set(full) == set(first)
    for p in full:
        assert os.path.isdir(os.path.join(ck, "out", f"source={p}", "violations"))
        assert not os.path.exists(
            os.path.join(ck, "out", f"source={p}", "violations_sample")
        )
    # and sampled request is now covered by rows entries
    assert run_checkpointed_validation(
        spark, table_path, reg, ck, violation_limit=LIMIT
    ) == {}


def test_evolve_sampled_equals_scratch(spark, table_path, tmp_path):
    """Evolution over sampled entries: touched constraints' exemplars
    drop, delta re-samples alone at the recorded limit, counts rebuild —
    result identical to a from-scratch sampled run under the new set."""
    from tests.test_evolution import REG_V1, REG_V2

    ck_evo = str(tmp_path / "ck_evo")
    ck_new = str(tmp_path / "ck_new")
    r1 = run_checkpointed_validation(
        spark, table_path, REG_V1(), ck_evo, violation_limit=LIMIT
    )
    assert len(r1) > 2
    out = evolve_checkpointed_validation(
        spark, table_path, REG_V2(), ck_evo, violation_limit=LIMIT
    )
    assert sorted(out["upgraded"]) == sorted(r1)
    assert out["reprocessed"] == {}
    scratch = run_checkpointed_validation(
        spark, table_path, REG_V2(), ck_new, violation_limit=LIMIT
    )
    read = lambda ck: {
        tuple(r)
        for r in spark.read.parquet(
            os.path.join(ck, "out", "*", "violations_sample")
        ).collect()
    }
    assert read(ck_evo) == read(ck_new)
    assert out["upgraded"] == scratch
    # idempotent
    again = evolve_checkpointed_validation(
        spark, table_path, REG_V2(), ck_evo, violation_limit=LIMIT
    )
    assert again["upgraded"] == {} and again["reprocessed"] == {}


def test_parse_profile_specs():
    """--profile CLI grammar → drift.build_profile spec dicts."""
    from medea_ps_spark.jobs.validate_job import parse_profile_specs

    assert parse_profile_specs(None) is None
    assert parse_profile_specs(
        ["ntok=n_tok:0:8192:32", "tok=@tokens:50257", "nc=n_chars:0:800"]
    ) == {
        "ntok": {"column": "n_tok", "lo": 0.0, "hi": 8192.0, "nbuckets": 32},
        "tok": {"token_array": "tokens", "lo": 0, "hi": 50257},
        "nc": {"column": "n_chars", "lo": 0.0, "hi": 800.0},
    }
    for bad in ("noeq", "x=", "x=@t", "x=c:1", "x=c:1:2:3:4", "=c:1:2"):
        with pytest.raises(ValueError):
            parse_profile_specs([bad])


def test_evolve_skips_upgrades_the_reprocess_would_discard(
    spark, table_path, tmp_path
):
    """An evolve call whose requested sink is NOT covered by the
    completed entries must not burn work upgrading them in place — the
    final reprocess pass redoes those partitions under the new set, so
    they belong in 'reprocessed' only (never both)."""
    from tests.test_evolution import REG_V1, REG_V2

    # sampled checkpoint, then evolve in ROWS mode (default)
    ck = str(tmp_path / "ck_rows_evo")
    r1 = run_checkpointed_validation(
        spark, table_path, REG_V1(), ck, violation_limit=LIMIT
    )
    out = evolve_checkpointed_validation(spark, table_path, REG_V2(), ck)
    assert out["upgraded"] == {}
    assert sorted(out["reprocessed"]) == sorted(r1)
    for p in out["reprocessed"]:
        assert os.path.isdir(os.path.join(ck, "out", f"source={p}", "violations"))
        assert not os.path.exists(
            os.path.join(ck, "out", f"source={p}", "violations_sample")
        )
    # sampled checkpoint, evolve at a LARGER limit: same story
    ck2 = str(tmp_path / "ck_lim_evo")
    r2 = run_checkpointed_validation(
        spark, table_path, REG_V1(), ck2, violation_limit=LIMIT
    )
    out2 = evolve_checkpointed_validation(
        spark, table_path, REG_V2(), ck2, violation_limit=LIMIT + 5
    )
    assert out2["upgraded"] == {}
    assert sorted(out2["reprocessed"]) == sorted(r2)
    assert all(
        m["violation_limit"] == LIMIT + 5 for m in out2["reprocessed"].values()
    )


def test_store_flags_backfill_completed_checkpoint(spark, table_path, tmp_path):
    """--uniqueness-sketch/--profile on an ALREADY-completed checkpoint
    must not be silent no-ops: missing artifacts are backfilled for
    done partitions even though process() never runs."""
    from medea_ps_spark.operators import hll as H
    from medea_ps_spark.operators import profilestore as P

    ck = str(tmp_path / "ck")
    reg = _registry()
    first = run_checkpointed_validation(spark, table_path, reg, ck)
    assert first
    again = run_checkpointed_validation(
        spark, table_path, reg, ck,
        uniqueness_sketch_col="doc_id",
        profile_specs={"ntok": {"column": "n_tok", "lo": 0, "hi": 8192}},
    )
    assert again == {}  # nothing reprocessed...
    for p in first:  # ...yet every artifact exists
        assert os.path.isdir(os.path.join(ck, H.SKETCH_DIR, p))
        assert os.path.isdir(os.path.join(ck, P.PROFILE_DIR, p))
    u = H.store_uniqueness(spark, ck)
    assert u["n_partitions"] == len(first)
    assert u["n_rows"] == sum(m["n_rows"] for m in first.values())


def test_anomaly_lift_suppressed_on_mixed_sink_manifest(tmp_path):
    """violation_counts totals must not be published from a manifest
    where only SOME entries carry the map (partial sum ≠ corpus
    total)."""
    import time

    from medea_ps_spark.operators.anomaly import metrics_from_manifest
    from medea_ps_spark.operators.checkpoint import (
        Manifest, PartitionEntry, _atomic_write,
    )

    man = Manifest("run", "t", "source", "fp")
    man.entries["a"] = PartitionEntry(
        "a", "s1", "fp", status="done", sink="sampled",
        metrics={"n_rows": 10, "n_failed": 2, "violation_limit": 5,
                 "violation_counts": {"c1": 2}},
        finished_at=time.time(),
    )
    man.entries["b"] = PartitionEntry(
        "b", "s2", "fp", status="done", sink="rows",
        metrics={"n_rows": 10, "n_failed": 1}, finished_at=time.time(),
    )
    _atomic_write(str(tmp_path / "manifest.json"), man.to_json())
    m = metrics_from_manifest(str(tmp_path))
    assert "n_violations" not in m
    assert not any(k.startswith("violation_counts.") for k in m)
    # all-sampled manifest DOES publish
    man.entries["b"].sink = "sampled"
    man.entries["b"].metrics["violation_counts"] = {"c1": 3, "c2": 1}
    man.entries["b"].metrics["violation_limit"] = 5
    _atomic_write(str(tmp_path / "manifest.json"), man.to_json())
    m2 = metrics_from_manifest(str(tmp_path))
    assert m2["n_violations"] == 6.0
    assert m2["violation_counts.c1"] == 5.0 and m2["violation_counts.c2"] == 1.0


def test_clean_output_quarantine_flow(spark, table_path, tmp_path):
    """clean_output writes exactly the passing rows (verdicts stripped),
    per partition; a resume that ADDS the flag backfills missing clean
    partitions without reprocessing; reruns leave completed clean
    partitions untouched."""
    ck = str(tmp_path / "ck")
    clean_dir = str(tmp_path / "clean")
    reg = _registry()
    res = run_checkpointed_validation(
        spark, table_path, reg, ck, violation_limit=LIMIT,
        clean_output=clean_dir,
    )
    assert res
    df = spark.read.parquet(table_path)
    compiled = reg.compile(df.schema, root="$start")
    want = V.validate(df, compiled).where(F.col(V.PASSED_COL))
    got = spark.read.parquet(clean_dir)
    assert got.count() == want.count() == sum(
        m["n_rows"] - m["n_failed"] for m in res.values()
    )
    assert set(got.columns) == set(df.columns)  # verdicts stripped
    a = {r["doc_id"] for r in got.select("doc_id").collect()}
    b = {r["doc_id"] for r in want.select("doc_id").collect()}
    assert a == b
    # flag added AFTER completion → backfill, no reprocess
    ck2 = str(tmp_path / "ck2")
    clean2 = str(tmp_path / "clean2")
    run_checkpointed_validation(spark, table_path, reg, ck2)
    again = run_checkpointed_validation(
        spark, table_path, reg, ck2, clean_output=clean2
    )
    assert again == {}
    assert spark.read.parquet(clean2).count() == want.count()
